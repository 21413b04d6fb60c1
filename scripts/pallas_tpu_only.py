"""Run only the Pallas kernel on TPU for the bisect configs; save outputs."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from kbmod_tpu.ops.search import trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas

def data():
    rng = np.random.default_rng(5)
    T, H, W = 4, 64, 256
    psi = rng.normal(0, 1, (T, H, W)).astype(np.float32)
    phi = rng.uniform(0.5, 2, (T, H, W)).astype(np.float32)
    valid = np.ones((T, H, W), np.uint8)
    times = np.arange(T) * 1.0
    return psi, phi, valid, times

configs = {
    "zero": (np.zeros(3, np.float32), np.zeros(3, np.float32)),
    "vy": (np.zeros(3, np.float32), np.array([1.0, -2.0, 3.0], np.float32)),
    "vx": (np.array([1.0, -2.0, 3.0], np.float32), np.zeros(3, np.float32)),
    "both": (np.array([1.5, -2.5, 3.0], np.float32), np.array([0.5, 2.0, -1.0], np.float32)),
}
psi, phi, valid, times = data()
out = {}
for name, (vxs, vys) in configs.items():
    dxs, dys = trajectory_offsets(vxs, vys, times)
    t0 = time.time()
    lh, idx = search_topk_pallas(
        jnp.asarray(psi), jnp.asarray(phi), jnp.asarray(valid),
        jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
        x_min=0, x_max=256, y_min=0, y_max=64, k_results=2,
    )
    out[f"{name}_lh"] = np.asarray(lh)
    out[f"{name}_idx"] = np.asarray(idx)
    print(name, "done", time.time() - t0, flush=True)
np.savez("/tmp/pallas_tpu_out.npz", **out)
print("saved", flush=True)
