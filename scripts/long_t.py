"""T=256 (beyond the reference's MAX_NUM_IMAGES=200 cap) encoded search on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas_encoded

rng = np.random.default_rng(2)
T, H, W, C, K = 256, 1024, 1024, 256, 8
psi_c = jnp.asarray(rng.integers(1, 256, (T, H, W), dtype=np.uint8))
phi_c = jnp.asarray(rng.integers(1, 256, (T, H, W), dtype=np.uint8))
em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
times = np.linspace(0, 30, T)
vel = rng.uniform(0.5, 30, C).astype(np.float32)
ang = rng.uniform(-0.4, 0.4, C).astype(np.float32)
dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(np.cos(ang) * vel, np.sin(ang) * vel, times))

t0 = time.time()
lh, idx = search_topk_pallas_encoded(
    psi_c, phi_c, dxs, dys, jnp.float32(100), jnp.float32(0), em,
    x_min=0, x_max=W, y_min=0, y_max=H, k_results=K,
)
_ = float(np.asarray(lh[0, 0, 0]))
print("compile+first", time.time() - t0, flush=True)
t0 = time.time()
lh, idx = search_topk_pallas_encoded(
    psi_c, phi_c, dxs, dys, jnp.float32(100), jnp.float32(0), em,
    x_min=0, x_max=W, y_min=0, y_max=H, k_results=K,
)
_ = float(np.asarray(lh[0, 0, 0]))
dt = time.time() - t0
print(f"run {dt:.2f}s  {H*W*C/dt:.3e} evals/s at T={T}", flush=True)

x0, x1, y0, y1 = 500, 564, 500, 564
ref_lh, _ = search_topk_shift(
    psi_c, phi_c, jnp.zeros((1, 1, 1), jnp.uint8), dxs, dys,
    jnp.float32(100), jnp.float32(0), encode_meta=em,
    x_min=x0, x_max=x1, y_min=y0, y_max=y1, k_results=K,
)
np.testing.assert_allclose(np.asarray(lh[:, y0:y1, x0:x1]), np.asarray(ref_lh), rtol=1e-5, atol=1e-5)
print("T=256 WINDOW EXACT", flush=True)
