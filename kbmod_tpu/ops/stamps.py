"""Batched on-device stamp extraction and coaddition.

The reference extracts stamps per trajectory with numba loops and coadds
with torch (src/kbmod/core/stamp_utils.py:241-343, filters/
stamp_filters.py:72-168). Here the whole (results x times) batch is one
gather on device, and the coadds reduce on device so only (R, S, S) coadd
images return to host.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius",))
def _gather_stamps(imgs, xs, ys, radius):
    """imgs: (T, H, W) float32; xs, ys: (R, T) int32 stamp centers.

    Returns stamps: (R, T, S, S) float32 with NaN outside the image.

    Formulated as (S, S) slice-gathers from a NaN-padded image (vmapped
    dynamic_slice lowers to one lax.gather with slice sizes): the NaN
    border supplies out-of-image pixels, and slice starts are always
    in-bounds so no clamping can shift a stamp. An elementwise gather of
    all R*T*S*S pixels is ~an order of magnitude slower on TPU.
    """
    T, H, W = imgs.shape
    S = 2 * radius + 1
    pad = S
    imgs_p = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad)), constant_values=jnp.nan)
    # Starts in padded coordinates; clip only guards absurd centers far
    # outside the image (their whole slice then reads the NaN border).
    r0 = jnp.clip(ys - radius + pad, 0, H + pad)
    c0 = jnp.clip(xs - radius + pad, 0, W + pad)

    def one(img_t, cy, cx):
        return jax.lax.dynamic_slice(img_t, (cy, cx), (S, S))

    per_traj = jax.vmap(one, in_axes=(0, 0, 0))  # over T
    return jax.vmap(per_traj, in_axes=(None, 0, 0))(imgs_p, r0, c0)


@jax.jit
def _coadd_sum(stamps, valid):
    data = jnp.where(valid[:, :, None, None], stamps, jnp.nan)
    return jnp.nansum(data, axis=1)


@jax.jit
def _coadd_mean(stamps, valid):
    data = jnp.where(valid[:, :, None, None], stamps, jnp.nan)
    good = jnp.isfinite(data)
    count = jnp.sum(good, axis=1)
    total = jnp.nansum(data, axis=1)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


@jax.jit
def _coadd_median(stamps, valid):
    """NaN-ignoring median along the time axis via sort (NaNs sort last).

    Uses the *lower* median for even counts, matching torch.nanmedian which
    the reference's coadd_median wraps (stamp_utils.py:300-303)."""
    data = jnp.where(valid[:, :, None, None], stamps, jnp.nan)
    sorted_vals = jnp.sort(data, axis=1)  # NaNs go to the end
    count = jnp.sum(jnp.isfinite(data), axis=1)  # (R, S, S)
    idx = jnp.maximum((count - 1) // 2, 0)
    med = jnp.take_along_axis(sorted_vals, idx[:, None, :, :], axis=1)[:, 0]
    return jnp.where(count > 0, med, 0.0)


@jax.jit
def _coadd_weighted(stamps, var_stamps, valid):
    data_ok = (
        valid[:, :, None, None]
        & jnp.isfinite(stamps)
        & jnp.isfinite(var_stamps)
        & (var_stamps != 0.0)
    )
    weights = jnp.where(data_ok, 1.0 / jnp.where(data_ok, var_stamps, 1.0), 0.0)
    weighted_sum = jnp.sum(jnp.where(data_ok, stamps, 0.0) * weights, axis=1)
    sum_w = jnp.sum(weights, axis=1)
    return weighted_sum / jnp.where(sum_w == 0.0, 1e24, sum_w)


def batched_coadds(
    sci,
    var,
    zeroed_times,
    xs,
    ys,
    vxs,
    vys,
    radius,
    coadd_types,
    obs_valid=None,
    chunk=4096,
):
    """Compute coadded stamps for many trajectories on device.

    Parameters
    ----------
    sci, var : (T, H, W) float32 arrays (NaN = masked).
    zeroed_times : (T,) times.
    xs, ys, vxs, vys : (R,) trajectory parameters.
    radius : stamp radius.
    coadd_types : list of 'sum' | 'mean' | 'median' | 'weighted'.
    obs_valid : optional (R, T) bool — times to include per trajectory.

    Returns
    -------
    dict mapping coadd type -> (R, S, S) numpy float32, plus key
    'all_stamps' when requested in coadd_types ((R, T, S, S)).
    """
    sci = jnp.asarray(np.ascontiguousarray(sci), dtype=jnp.float32)
    need_var = "weighted" in coadd_types
    var_j = jnp.asarray(np.ascontiguousarray(var), dtype=jnp.float32) if need_var else None

    times = np.asarray(zeroed_times, dtype=np.float64)
    n = len(xs)
    S = 2 * radius + 1
    out = {c: np.zeros((n, S, S), dtype=np.float32) for c in coadd_types if c != "all_stamps"}
    if "all_stamps" in coadd_types:
        out["all_stamps"] = np.zeros((n, len(times), S, S), dtype=np.float32)

    kinds = tuple(c for c in coadd_types if c != "all_stamps")
    want_all = "all_stamps" in coadd_types

    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        # Batch sizes are compile keys: bucket the chunk's row count to a
        # power of two (>= 64, <= chunk) so differently-sized result sets
        # share one _coadd_chunk executable instead of re-compiling the
        # (T, H, W) gather program per run (ops/search._bucket_rows has
        # the survey-scale war story). Pad rows repeat row `lo` with an
        # all-False validity mask and are sliced off after the fetch.
        nb = 64
        while nb < m:
            nb *= 2
        nb = min(nb, chunk)
        idx = np.arange(lo, lo + nb)
        idx[m:] = lo
        # Stamp centers: int(x + v*t + 0.5) truncation (stamp_utils.py:202).
        cx = (np.asarray(xs, dtype=np.float64)[idx][:, None] + times[None, :] * np.asarray(vxs, dtype=np.float64)[idx][:, None] + 0.5).astype(np.int32)
        cy = (np.asarray(ys, dtype=np.float64)[idx][:, None] + times[None, :] * np.asarray(vys, dtype=np.float64)[idx][:, None] + 0.5).astype(np.int32)
        if obs_valid is not None:
            valid_np = np.asarray(obs_valid, dtype=bool)[idx]
        else:
            valid_np = np.ones((nb, len(times)), dtype=bool)
        valid_np[m:] = False
        valid = jnp.asarray(valid_np)
        # One fused jit per chunk: the gather, the shared masking, and all
        # requested reductions run in one dispatch; one device->host fetch.
        res = _coadd_chunk(
            sci, var_j, jnp.asarray(cx), jnp.asarray(cy), valid,
            radius=radius, kinds=kinds, want_all=want_all,
        )
        res = jax.device_get(res)
        for ctype in kinds:
            out[ctype][lo:hi] = res[ctype][:m]
        if want_all:
            out["all_stamps"][lo:hi] = np.nan_to_num(res["all_stamps"][:m], nan=0.0)
    return out


@partial(jax.jit, static_argnames=("radius", "kinds", "want_all"))
def _coadd_chunk(sci, var_j, cx, cy, valid, *, radius, kinds, want_all):
    stamps = _gather_stamps(sci, cx, cy, radius)
    res = {}
    for ctype in kinds:
        if ctype == "sum":
            res["sum"] = _coadd_sum(stamps, valid)
        elif ctype == "mean":
            res["mean"] = _coadd_mean(stamps, valid)
        elif ctype == "median":
            res["median"] = _coadd_median(stamps, valid)
        elif ctype == "weighted":
            var_stamps = _gather_stamps(var_j, cx, cy, radius)
            res["weighted"] = _coadd_weighted(stamps, var_stamps, valid)
    if want_all:
        res["all_stamps"] = stamps
    return res
