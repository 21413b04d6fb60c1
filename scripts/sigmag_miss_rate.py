"""Quantify the default in-kernel sigma-G approximation (VERDICT r2 #5).

The default search mode ranks an over-provisioned top-(F*K) pool by
UNCLIPPED likelihood, then re-ranks the pool by clipped likelihood; a
candidate that sigma-G clipping would promote past the pool boundary is
missed. KB_SIGMAG_MODE=exact gates clipping inside the kernel
(reference kernels.cu:77-147 semantics) at ~T log T per eval.

This script measures the miss rate on realistic fake surveys across
outlier rates and KB_SIGMAG_TOPK_FACTOR values:

  miss rate = fraction of (pixel, slot) result rows in the exact mode's
  final top-K whose (candidate, pixel) pair is absent from the default
  mode's final top-K.

Run: python scripts/sigmag_miss_rate.py  (any backend; ~2 min on CPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the CPU backend (env vars alone are not enough under the axon
# sitecustomize, which initializes JAX at interpreter start): this is a
# statistics measurement, identical on every backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping
from kbmod_tpu.search import generate_psi, generate_phi
from kbmod_tpu.ops.search import core_search
from kbmod_tpu.search import Trajectory


def _injected(rng, W, H):
    return Trajectory(
        x=int(rng.uniform(20, W - 20)),
        y=int(rng.uniform(20, H - 20)),
        vx=float(rng.uniform(-12, 12)),
        vy=float(rng.uniform(-12, 12)),
        flux=float(rng.uniform(120, 350)),
    )


def build_stack(outlier_frac, seed):
    """A fake survey slice: noise + 25 moving objects + transient
    artifacts (bright single-epoch outliers) at ``outlier_frac`` of
    pixels per image — the regime sigma-G clipping exists for."""
    rng = np.random.default_rng(seed)
    T, H, W = 20, 200, 200
    times = create_fake_times(T, 57130.0, 5, 0.01, 1)
    ds = FakeDataSet(W, H, times, noise_level=2.0, psf_val=0.8, use_seed=seed)
    objects = [_injected(rng, W, H) for _ in range(25)]
    for trj in objects:
        ds.insert_object(trj)
    stack = ds.stack_py
    sci = np.array(stack.sci)
    if outlier_frac > 0:
        n_out = int(outlier_frac * H * W)
        for t in range(T):
            yy = rng.integers(0, H, n_out)
            xx = rng.integers(0, W, n_out)
            sci[t, yy, xx] += rng.uniform(50, 400, n_out)
    return (
        sci,
        np.array(stack.var),
        [np.asarray(p) for p in stack.psfs],
        np.asarray(stack.zeroed_times),
        objects,
    )


def run_mode(sci, var, psfs, times, mode, factor):
    import jax.numpy as jnp

    os.environ["KB_SIGMAG_MODE"] = mode
    os.environ["KB_SIGMAG_TOPK_FACTOR"] = str(factor)
    T, H, W = sci.shape
    psi = jnp.stack([generate_psi(sci[t], var[t], psfs[t]) for t in range(T)])
    phi = jnp.stack([generate_phi(var[t], psfs[t]) for t in range(T)])
    valid = jnp.asarray((np.isfinite(sci) & np.isfinite(var)).astype(np.uint8))
    psi = jnp.where(jnp.isnan(psi), 0.0, psi)
    phi = jnp.where(jnp.isnan(phi), 0.0, phi)
    rng = np.random.default_rng(7)
    n_v = 15
    vel = np.linspace(-14, 14, n_v)
    vxs = np.repeat(vel, n_v).astype(np.float32)
    vys = np.tile(vel, n_v).astype(np.float32)
    coeff = SigmaGClipping.find_sigma_g_coeff(25, 75)
    res = core_search(
        psi, phi, valid, times, vxs, vys, 0, W, 0, H, 8,
        min_obs=10, min_lh=10.0, do_sigmag=True,
        sgl_L=0.25, sgl_H=0.75, sigmag_coeff=coeff,
    )
    return res


def result_keys(res, lh_min=-1e30):
    """Set of (pixel, candidate) identity for kept rows above lh_min."""
    keep = res["lh"] > lh_min
    return set(
        zip(
            (res["y"][keep].astype(np.int64) << 20 | res["x"][keep].astype(np.int64)).tolist(),
            np.round(res["vx"][keep], 3).tolist(),
            np.round(res["vy"][keep], 3).tolist(),
        )
    )


def recovered(res, objects):
    """How many injected objects appear in the result rows (within 2 px
    of start position and 20% velocity)."""
    keep = res["lh"] > -1e30
    x, y = res["x"][keep], res["y"][keep]
    vx, vy = res["vx"][keep], res["vy"][keep]
    n = 0
    for trj in objects:
        close = (np.abs(x - trj.x) <= 2) & (np.abs(y - trj.y) <= 2)
        vok = (np.abs(vx - trj.vx) <= max(2.0, 0.2 * abs(trj.vx))) & (
            np.abs(vy - trj.vy) <= max(2.0, 0.2 * abs(trj.vy))
        )
        n += bool(np.any(close & vok))
    return n


def main():
    factors = [1, 2, 4, 8]
    fracs = [0.0, 0.001, 0.01, 0.05]
    header = (
        f"{'outliers':>9} | {'rows(exact)':>11} | {'objs':>5} | "
        + " | ".join(f"F={f} miss/strong/objs" for f in factors)
    )
    print(header)
    rows = []
    for frac in fracs:
        sci, var, psfs, times, objects = build_stack(frac, seed=42)
        exact = run_mode(sci, var, psfs, times, "exact", 4)
        ek = result_keys(exact)
        # "Strong" rows: comfortably detectable candidates.
        ek_strong = result_keys(exact, lh_min=15.0)
        rec_e = recovered(exact, objects)
        cells = []
        for f in factors:
            dflt = run_mode(sci, var, psfs, times, "overprovision", f)
            dk = result_keys(dflt)
            m = len(ek - dk) / max(len(ek), 1)
            ms = len(ek_strong - dk) / max(len(ek_strong), 1)
            rec_d = recovered(dflt, objects)
            cells.append(f"{m:7.3%}/{ms:7.3%}/{rec_d:2d}")
        rows.append((frac, len(ek), rec_e, cells))
        print(f"{frac:>9} | {len(ek):>11} | {rec_e:>5} | " + " | ".join(cells))
    os.environ.pop("KB_SIGMAG_MODE", None)
    os.environ.pop("KB_SIGMAG_TOPK_FACTOR", None)
    return rows


if __name__ == "__main__":
    main()
