"""BASELINE.md measurement config 3 gate: 64 x 2048^2 uint8-encoded search.

Runs the encoded Pallas kernel over the full frame (timed), then validates
a 128x128 starting-pixel window exactly against the XLA encoded kernel
(per-pixel top-K only depends on that pixel, so a window comparison is a
sound spot check at survey scale).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas_encoded

rng = np.random.default_rng(3)
T, H, W, C, K = 64, 2048, 2048, 4096, 8
psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)  # ~0.4% masked zeros
phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
times = np.linspace(0, 8, T)
vel = rng.uniform(2, 100, C).astype(np.float32)
ang = rng.uniform(-0.4, 0.4, C).astype(np.float32)
dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(np.cos(ang) * vel, np.sin(ang) * vel, times))
psi_j, phi_j = jnp.asarray(psi_c), jnp.asarray(phi_c)

def run_full():
    lh, idx = search_topk_pallas_encoded(
        psi_j, phi_j, dxs, dys, jnp.float32(10), jnp.float32(0), em,
        x_min=0, x_max=W, y_min=0, y_max=H, k_results=K,
    )
    return lh, idx

t0 = time.time()
lh, idx = run_full()
_ = float(np.asarray(lh[0, 0, 0]))
print("pallas compile+first", time.time() - t0, flush=True)
t0 = time.time()
lh, idx = run_full()
_ = float(np.asarray(lh[0, 0, 0]))
dt = time.time() - t0
print("pallas run", dt, "evals/s", H * W * C / dt, flush=True)

x0, x1, y0, y1 = 512, 640, 512, 640
t0 = time.time()
ref_lh, ref_idx = search_topk_shift(
    psi_j, phi_j, jnp.zeros((1, 1, 1), jnp.uint8), dxs, dys,
    jnp.float32(10), jnp.float32(0), encode_meta=em,
    x_min=x0, x_max=x1, y_min=y0, y_max=y1, k_results=K,
)
ref_lh = np.asarray(ref_lh)
print("xla window", time.time() - t0, flush=True)

win_lh = np.asarray(lh[:, y0:y1, x0:x1])
win_idx = np.asarray(idx[:, y0:y1, x0:x1])
ref_idx = np.asarray(ref_idx)
np.testing.assert_allclose(win_lh, ref_lh, rtol=1e-5, atol=1e-5)
mism = win_idx != ref_idx
ties = 0
for k, i, j in np.argwhere(mism):
    assert win_lh[k, i, j] == ref_lh[k, i, j], f"non-tie idx mismatch {(k,i,j)}"
    ties += 1
print(f"WINDOW EXACT ({mism.size} checked, {ties} tie-permutations)", flush=True)
