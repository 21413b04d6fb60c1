"""Row-tile sweep for the encoded Pallas kernel on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from kbmod_tpu.ops.search import trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas_encoded

rng = np.random.default_rng(42)
T, H, W, C, K = 20, 1024, 1024, 512, 8
psi_c = jnp.asarray(rng.integers(1, 256, (T, H, W), dtype=np.uint8))
phi_c = jnp.asarray(rng.integers(1, 256, (T, H, W), dtype=np.uint8))
em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
times = np.linspace(0, 4, T)
vel = rng.uniform(5, 120, C).astype(np.float32)
ang = rng.uniform(-0.3, 0.3, C).astype(np.float32)
dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(np.cos(ang) * vel, np.sin(ang) * vel, times))
kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=K)

for rt in [64, 96, 128, 160]:
    try:
        t0 = time.time()
        lh, _ = search_topk_pallas_encoded(psi_c, phi_c, dxs, dys, jnp.float32(0), jnp.float32(0), em, row_tile=rt, **kw)
        _ = float(np.asarray(lh[0, 0, 0]))
        print(f"rt={rt} compile+first {time.time()-t0:.1f}", flush=True)
        for _ in range(2):
            t0 = time.time()
            lh, _ = search_topk_pallas_encoded(psi_c, phi_c, dxs, dys, jnp.float32(0), jnp.float32(0), em, row_tile=rt, **kw)
            _ = float(np.asarray(lh[0, 0, 0]))
            dt = time.time() - t0
            print(f"rt={rt} run {dt:.4f} evals/s {H*W*C/dt:.3e}", flush=True)
    except Exception as e:
        print(f"rt={rt} FAILED: {str(e)[:200]}", flush=True)
