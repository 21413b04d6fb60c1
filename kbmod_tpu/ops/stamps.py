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
    """
    T, H, W = imgs.shape
    S = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    rows = ys[:, :, None] + offs[None, None, :]  # (R, T, S)
    cols = xs[:, :, None] + offs[None, None, :]  # (R, T, S)
    row_ok = (rows >= 0) & (rows < H)
    col_ok = (cols >= 0) & (cols < W)
    rows_c = jnp.clip(rows, 0, H - 1)
    cols_c = jnp.clip(cols, 0, W - 1)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :, None, None]
    flat_idx = (tt * H + rows_c[:, :, :, None]) * W + cols_c[:, :, None, :]
    vals = imgs.reshape(-1)[flat_idx]  # (R, T, S, S)
    ok = row_ok[:, :, :, None] & col_ok[:, :, None, :]
    return jnp.where(ok, vals, jnp.nan)


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

    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        # Stamp centers: int(x + v*t + 0.5) truncation (stamp_utils.py:202).
        cx = (np.asarray(xs[lo:hi], dtype=np.float64)[:, None] + times[None, :] * np.asarray(vxs[lo:hi], dtype=np.float64)[:, None] + 0.5).astype(np.int32)
        cy = (np.asarray(ys[lo:hi], dtype=np.float64)[:, None] + times[None, :] * np.asarray(vys[lo:hi], dtype=np.float64)[:, None] + 0.5).astype(np.int32)
        stamps = _gather_stamps(sci, jnp.asarray(cx), jnp.asarray(cy), radius)
        if obs_valid is not None:
            valid = jnp.asarray(np.asarray(obs_valid[lo:hi], dtype=bool))
        else:
            valid = jnp.ones((hi - lo, len(times)), dtype=bool)
        for ctype in coadd_types:
            if ctype == "sum":
                out["sum"][lo:hi] = np.asarray(_coadd_sum(stamps, valid))
            elif ctype == "mean":
                out["mean"][lo:hi] = np.asarray(_coadd_mean(stamps, valid))
            elif ctype == "median":
                out["median"][lo:hi] = np.asarray(_coadd_median(stamps, valid))
            elif ctype == "weighted":
                var_stamps = _gather_stamps(var_j, jnp.asarray(cx), jnp.asarray(cy), radius)
                out["weighted"][lo:hi] = np.asarray(_coadd_weighted(stamps, var_stamps, valid))
            elif ctype == "all_stamps":
                out["all_stamps"][lo:hi] = np.nan_to_num(np.asarray(stamps), nan=0.0)
    return out
