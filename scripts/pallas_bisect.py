"""Bisect the Pallas kernel's hardware correctness: zero-velocity (DMA
plumbing only), vy-only (sublane roll), vx-only (lane roll)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas


def check(label, vxs, vys):
    rng = np.random.default_rng(5)
    T, H, W, K = 4, 64, 256, 2
    psi = jnp.asarray(rng.normal(0, 1, (T, H, W)).astype(np.float32))
    phi = jnp.asarray(rng.uniform(0.5, 2, (T, H, W)).astype(np.float32))
    valid = jnp.ones((T, H, W), jnp.uint8)
    times = np.arange(T) * 1.0
    dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(vxs, vys, times))
    kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=K)
    t0 = time.time()
    r_lh, r_idx = search_topk_shift(psi, phi, valid, dxs, dys, jnp.float32(0), jnp.float32(0), **kw)
    p_lh, p_idx = search_topk_pallas(psi, phi, valid, dxs, dys, jnp.float32(0), jnp.float32(0), **kw)
    r_lh, p_lh = np.asarray(r_lh), np.asarray(p_lh)
    r_idx, p_idx = np.asarray(r_idx), np.asarray(p_idx)
    print(
        f"{label}: maxdiff {np.abs(r_lh - p_lh).max():.6f} idx_mismatch {(r_idx != p_idx).sum()}"
        f" t={time.time() - t0:.1f}s",
        flush=True,
    )


def main():
    check("zero-velocity", np.zeros(3, np.float32), np.zeros(3, np.float32))
    check("vy-only", np.zeros(3, np.float32), np.array([1.0, -2.0, 3.0], np.float32))
    check("vx-only", np.array([1.0, -2.0, 3.0], np.float32), np.zeros(3, np.float32))
    check("both", np.array([1.5, -2.5, 3.0], np.float32), np.array([0.5, 2.0, -1.0], np.float32))


if __name__ == "__main__":
    main()
