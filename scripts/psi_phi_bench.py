"""psi/phi build throughput on TPU (BASELINE.md metric: GB/s)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from kbmod_tpu.core.psf import PSF
from kbmod_tpu.ops.psi_phi import _psi_phi_from_sci_var

rng = np.random.default_rng(1)
T, H, W = 50, 2048, 2048
sci = jnp.asarray(rng.normal(10, 2, (T, H, W)).astype(np.float32))
var = jnp.asarray(rng.uniform(1, 4, (T, H, W)).astype(np.float32))
psf = jnp.asarray(PSF.make_gaussian_kernel(1.4), dtype=jnp.float32)
print("psf", psf.shape, flush=True)

def run():
    psi, phi = _psi_phi_from_sci_var(sci, var, psf)
    return float(np.asarray(psi[0, 0, 0]))

t0 = time.time(); run(); print("compile+first", time.time() - t0, flush=True)
in_bytes = T * H * W * 4 * 2
out_bytes = T * H * W * 4 * 2
for _ in range(3):
    t0 = time.time(); run(); dt = time.time() - t0
    print(f"run {dt:.3f}s  io {(in_bytes+out_bytes)/dt/1e9:.1f} GB/s  "
          f"{T*H*W/dt/1e9:.2f} Gpix/s", flush=True)
