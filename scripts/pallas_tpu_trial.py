"""Real-TPU trial of the Pallas search kernel: correctness vs the XLA
kernel on a small case, then bench-size timing."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas


def main():
    rng = np.random.default_rng(5)
    T, H, W, C, K = 6, 256, 256, 16, 4
    psi = jnp.asarray(rng.normal(0, 1, (T, H, W)).astype(np.float32))
    phi = jnp.asarray(rng.uniform(0.5, 2, (T, H, W)).astype(np.float32))
    valid = jnp.ones((T, H, W), jnp.uint8)
    times = np.arange(T) * 0.4
    vxs = rng.uniform(-20, 20, C).astype(np.float32)
    vys = rng.uniform(-20, 20, C).astype(np.float32)
    dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(vxs, vys, times))
    kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=K)
    t0 = time.time()
    r_lh, r_idx = search_topk_shift(psi, phi, valid, dxs, dys, jnp.float32(0), jnp.float32(0), **kw)
    r_lh.block_until_ready()
    _ = np.asarray(r_lh[0, 0, 0])
    print("xla small done", time.time() - t0, flush=True)
    t0 = time.time()
    p_lh, p_idx = search_topk_pallas(psi, phi, valid, dxs, dys, jnp.float32(0), jnp.float32(0), **kw)
    _ = np.asarray(p_lh[0, 0, 0])
    print("pallas small done", time.time() - t0, flush=True)
    r_lh, p_lh, r_idx, p_idx = (np.asarray(a) for a in (r_lh, p_lh, r_idx, p_idx))
    print("small correctness: lh maxdiff", np.abs(r_lh - p_lh).max(), "idx mismatches", (r_idx != p_idx).sum(), flush=True)

    T, H, W, C, K = 20, 1024, 1024, 512, 8
    psi = jnp.asarray(rng.normal(0, 1, (T, H, W)).astype(np.float32))
    phi = jnp.asarray(rng.uniform(0.5, 2, (T, H, W)).astype(np.float32))
    valid = jnp.ones((T, H, W), jnp.uint8)
    times = np.linspace(0, 4, T)
    vel = rng.uniform(5, 120, C).astype(np.float32)
    ang = rng.uniform(-0.3, 0.3, C).astype(np.float32)
    dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(np.cos(ang) * vel, np.sin(ang) * vel, times))
    kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=K)

    def run():
        lh, _ = search_topk_pallas(psi, phi, valid, dxs, dys, jnp.float32(0), jnp.float32(0), **kw)
        return float(np.asarray(lh[0, 0, 0]))

    t0 = time.time()
    run()
    print("pallas compile+first", time.time() - t0, flush=True)
    for _ in range(3):
        t0 = time.time()
        run()
        dt = time.time() - t0
        print("pallas run", dt, "evals/s", H * W * C / dt, flush=True)


if __name__ == "__main__":
    main()
