# %% [markdown]
# # Multi-chip sharded search
#
# TPU-first walkthrough (no reference-notebook counterpart — the
# reference is single-GPU): run the core search over a
# `jax.sharding.Mesh`, sharding either the candidate grid (top-K merged
# across devices) or the starting-pixel rows. The same code runs on one
# chip, a TPU pod slice, or — as here — whatever devices the process
# sees (under `pytest` this is the 8-device virtual CPU mesh).

# %%
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import numpy as np

from kbmod_tpu.ops.search import core_search
from kbmod_tpu.parallel.sharded import build_mesh, sharded_core_search

print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")

# %% [markdown]
# ## A small stack with one bright object

# %%
T, H, W = 6, 40, 48
rng = np.random.default_rng(9)
times = np.linspace(0.0, 1.0, T)
psi = rng.normal(0, 0.1, (T, H, W)).astype(np.float32)
phi = np.full((T, H, W), 4.0, dtype=np.float32)
x0, y0, vx, vy = 10, 12, 8.0, 3.0
for t in range(T):
    psi[t, int(y0 + vy * times[t]), int(x0 + vx * times[t])] += 4.0
valid = np.ones((T, H, W), dtype=bool)

vel = rng.uniform(2.0, 10.0, 64).astype(np.float32)
ang = rng.uniform(-0.6, 0.6, 64).astype(np.float32)
vxs, vys = (np.cos(ang) * vel).astype(np.float32), (np.sin(ang) * vel).astype(np.float32)
vxs[0], vys[0] = vx, vy  # make sure the true trajectory is in the grid

# %% [markdown]
# ## Candidate-sharded search
#
# The velocity grid is split across the mesh; each device searches every
# pixel against its candidate shard and the per-pixel top-K is merged
# with an all-gather over ICI.

# %%
mesh = build_mesh()
kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, results_per_pixel=4,
          min_obs=4, min_lh=2.0)
res_sharded = sharded_core_search(
    psi, phi, valid, times, vxs, vys, mesh, shard_mode="candidates", **kw)

# %% [markdown]
# ## Identical to the single-device search

# %%
res_single = core_search(psi, phi, valid, times, vxs, vys, **kw)
np.testing.assert_allclose(res_sharded["lh"], res_single["lh"], rtol=1e-5, atol=1e-5)
best = int(np.argmax(res_sharded["lh"]))
print(f"best lh {res_sharded['lh'][best]:.1f} at "
      f"({res_sharded['x'][best]}, {res_sharded['y'][best]}) "
      f"v=({res_sharded['vx'][best]:.1f}, {res_sharded['vy'][best]:.1f})")

# %% [markdown]
# ## Pixel-sharded mode
#
# For very wide images, shard the starting-pixel rows instead — no
# cross-device merge is needed (each pixel's top-K lives on one device).

# %%
res_pix = sharded_core_search(
    psi, phi, valid, times, vxs, vys, mesh, shard_mode="pixels", **kw)
np.testing.assert_allclose(res_pix["lh"], res_single["lh"], rtol=1e-5, atol=1e-5)
print("sharded search matches the single-device search in both modes")
