"""Stamp-coadd throughput on TPU: 50k trajectories x 20 times x 21x21."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from kbmod_tpu.ops.stamps import batched_coadds

rng = np.random.default_rng(7)
T, H, W, R = 20, 1024, 1024, 50000
sci = rng.normal(10, 2, (T, H, W)).astype(np.float32)
var = rng.uniform(1, 4, (T, H, W)).astype(np.float32)
times = np.linspace(0, 4, T).astype(np.float32)
xs = rng.integers(20, W - 20, R).astype(np.int32)
ys = rng.integers(20, H - 20, R).astype(np.int32)
vxs = rng.uniform(-5, 5, R).astype(np.float32)
vys = rng.uniform(-5, 5, R).astype(np.float32)

t0 = time.time()
out = batched_coadds(sci, var, times, xs, ys, vxs, vys, 10, ["mean", "median", "sum"])
v = float(np.asarray(out["mean"][0, 0, 0]))
print("compile+first", time.time() - t0, flush=True)
t0 = time.time()
out = batched_coadds(sci, var, times, xs, ys, vxs, vys, 10, ["mean", "median", "sum"])
v = float(np.asarray(out["mean"][-1, 0, 0]))
dt = time.time() - t0
print(f"run {dt:.2f}s  {R/dt:.0f} stamps/s (3 coadds each)", flush=True)
