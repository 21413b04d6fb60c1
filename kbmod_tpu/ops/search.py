"""The core trajectory-scoring kernels (TPU-native shift-and-stack search).

The reference scores candidates with one CUDA thread per starting pixel,
gathering psi/phi along the trajectory per time step
(src/kbmod/search/kernels/kernels.cu:154-332). That access pattern is
irregular for a TPU.

TPU-native reformulation
------------------------
Starting pixels are integers, so the predicted index factorizes:

    floor(x + vx * t + 0.5) == x + floor(vx * t + 0.5)

i.e. each (candidate, time) pair shifts the *whole image* by one integer
offset (dy, dx) that is independent of the starting pixel. Scoring candidate
c is therefore a sum of T uniformly-shifted images:

    lh_image[c] = sum_t shift(psi[t], dy[c,t], dx[c,t])   (+ same for phi)

A uniform 2D shift of a row-major image is a *single contiguous 1D slice* of
the flattened (T*H*W) stack: element (i, j) of the shifted image lives at
flat[t*H*W + (y0+i+dy)*W + (x0+j+dx)] — the row-wrap and out-of-bounds
pixels are exactly the ones masked out analytically with iota row/col masks.
So the hot loop is: one dynamic-slice per plane per (c, t), a mask multiply,
and an accumulate — dense contiguous VPU work at HBM bandwidth, no gathers.

Offsets are precomputed on host in float64 (the reference computes
double-precision `floor(x + vx*t + 0.5)`; kernels.cu:33-35), so device code
never rounds positions.

Top-K per pixel is maintained as a K-slot sorted insertion (bubble pass) in
the candidate scan carry, mirroring the reference's per-thread insertion sort
(kernels.cu:322-330) but vectorized over all pixels at once.
"""

import logging
import os
import time
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

logger = logging.getLogger("kbmod.search")

FLT_MAX = float(np.finfo(np.float32).max)


# ----------------------------------------------------------------------
# Host-side offset precomputation
# ----------------------------------------------------------------------

def snap_vy_rows(vys, zeroed_times, max_row_error=0.75):
    """Quantize vy onto a lattice so rounded per-time row sequences
    collapse into few classes, with a bounded sub-pixel error.

    The uniform (exact-row) kernel plan engages only when many candidates
    share an identical rounded row sequence ``floor(vy*t + 0.5)`` — true
    for normalized grids (235 classes at BASELINE config 3) but not for
    long-baseline physical grids (the 12-day default grid has ~9k classes
    and falls back to the ~40%-slower spread plan; docs/STATUS.md
    "Measured no-go"). Snapping vy to multiples of
    ``q = 2*max_row_error/t_max`` collapses the class count to
    ``row_reach_span / (2*max_row_error)`` (e.g. ~±330 px reach, 0.75 px
    error -> ~440 classes) while every candidate's row position moves at
    most ``max_row_error`` px at the last observation — below the 0.5 px
    the rounding itself already introduces at typical grid resolutions.

    Column offsets (vx) are untouched: the kernel handles per-candidate
    column motion exactly, only rows need grouping. The snapped vy IS the
    searched (and reported) velocity, so results stay self-consistent.
    Opt-in via KB_SNAP_ROW_ERROR (StackSearch.search_all) or by calling
    this on a generator's velocity arrays.

    Returns
    -------
    (snapped, num_classes) : (np.ndarray float32 of vy, int)
    """
    vys = np.asarray(vys, dtype=np.float64)
    t_max = float(np.max(zeroed_times)) if len(np.asarray(zeroed_times)) else 0.0
    if t_max <= 0.0 or max_row_error <= 0.0:
        return vys.astype(np.float32), len(np.unique(vys.astype(np.float32)))
    q = 2.0 * float(max_row_error) / t_max
    snapped = (np.round(vys / q) * q).astype(np.float32)
    return snapped, len(np.unique(snapped))


def trajectory_offsets(vxs, vys, times):
    """Integer pixel offsets floor(v * t + 0.5) for each (candidate, time).

    Computed in float64 after rounding velocities to float32 (the reference
    stores Trajectory velocities as C floats; common.h:57-58).

    Returns
    -------
    (dxs, dys) : np.ndarray int32 of shape (C, T)
    """
    vxs = np.asarray(vxs, dtype=np.float32).astype(np.float64)
    vys = np.asarray(vys, dtype=np.float32).astype(np.float64)
    times = np.asarray(times, dtype=np.float64)
    dxs = np.floor(vxs[:, None] * times[None, :] + 0.5).astype(np.int32)
    dys = np.floor(vys[:, None] * times[None, :] + 0.5).astype(np.int32)
    return dxs, dys


def predict_index(pos0, vel0, time):
    """Reference-parity predicted pixel index (kernels.cu:33-35)."""
    return int(np.floor(np.float64(pos0) + np.float64(np.float32(vel0)) * np.float64(time) + 0.5))


# ----------------------------------------------------------------------
# Gather-based exact evaluation (reference semantics, used for curves,
# single-trajectory eval, and re-scoring search winners)
# ----------------------------------------------------------------------

class EncodedPlanes(NamedTuple):
    """Quantized psi/phi code planes + decode metadata, accepted by the
    winner-eval / curve gathers in place of decoded float planes.

    At survey scale, materializing decoded (T, H, W) float32 psi/phi (+ a
    validity plane) costs ~9x the uint8 codes' HBM (~15 GB at 100x4k x4k,
    which cannot coexist with the packed kernel stream on one chip).
    Gathering the codes and decoding per-sample keeps evaluation memory at
    the codes' footprint. Decode semantics match
    ``PsiPhiArray.decoded_psi_phi`` (psi_phi_array_ds.h:40-47: code 0 =
    masked, value = (code - 1) * scale + min); the validity mask is exact,
    values agree with decoded-plane gathers to one float32 ulp (XLA may
    contract the decode's multiply-add into an fma differently across
    fusions).
    """

    psi_codes: jax.Array  # (T, H, W) uint8 or uint16
    phi_codes: jax.Array  # (T, H, W) same dtype
    em: jax.Array         # (4,) float32: psi_min, psi_scale, phi_min, phi_scale

    @property
    def shape(self):
        return self.psi_codes.shape

    def decode_full(self):
        """Materialize the decoded (psi, phi, valid) planes (the memory-
        heavy path; only for consumers that need whole planes, e.g. the
        exact sigma-G kernel)."""
        pc = jnp.asarray(self.psi_codes)
        fc = jnp.asarray(self.phi_codes)
        em = jnp.asarray(self.em, dtype=jnp.float32)
        valid = (pc != 0).astype(jnp.uint8)
        psi = jnp.where(pc == 0, 0.0, (pc.astype(jnp.float32) - 1.0) * em[1] + em[0])
        phi = jnp.where(fc == 0, 0.0, (fc.astype(jnp.float32) - 1.0) * em[3] + em[2])
        return psi, phi, valid


def _traj_sample_indices(shape, xs, ys, dxs, dys):
    """Per-(trajectory, time) sample coordinates: in-bounds mask plus
    (t*H + y, x) 2-level indices (the row index stays < T*H, so the gather
    is int32-safe even when T*H*W exceeds 2^31 at survey scale)."""
    T, H, W = shape
    px = xs[:, None] + dxs
    py = ys[:, None] + dys
    inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    return inb, tt * H + pyc, pxc


@jax.jit
def _gather_curves_idx(psi, phi, valid, xs, ys, cidx, dxs_tab, dys_tab):
    """Index-based variant of :func:`_gather_curves`: per-row offsets are
    looked up ON DEVICE from the (C, T) trajectory-offset tables by the
    rows' candidate indices. The winner re-scoring previously built and
    uploaded dense (N, T) offset arrays per chunk — ~210 MB through the
    tunnel for a 262144-row chunk, 18-26 s per survey tile, attributed by
    KB_TIMING — while the same offsets are rows of the ~13 MB (C, T)
    table the kernel dispatch already derives. Bit-identical samples (the
    table IS trajectory_offsets' host float64 output)."""
    return _gather_curves.__wrapped__(psi, phi, valid, xs, ys, dxs_tab[cidx], dys_tab[cidx])


@jax.jit
def _gather_curves(psi, phi, valid, xs, ys, dxs, dys):
    """Gather per-time psi/phi values along trajectories.

    psi, phi: (T, H, W) float32 zero-filled at masked; valid: (T, H, W)
    uint8. Alternatively psi may be an :class:`EncodedPlanes` (phi and
    valid are then ignored — pass None): the codes are gathered and decoded
    per-sample (exact validity; values to 1 float32 ulp of the
    decoded-plane gather).
    xs, ys: (N,) int32 starting pixels; dxs, dys: (N, T) int32 offsets.

    Returns psi_v, phi_v: (N, T) float32 (0 where invalid) and ok: (N, T) bool.
    """
    if isinstance(psi, EncodedPlanes):
        planes = psi
        inb, row, col = _traj_sample_indices(planes.psi_codes.shape, xs, ys, dxs, dys)
        T, H, W = planes.psi_codes.shape
        pc = planes.psi_codes.reshape(T * H, W)[row, col]
        fc = planes.phi_codes.reshape(T * H, W)[row, col]
        em = jnp.asarray(planes.em, dtype=jnp.float32)
        ok = inb & (pc != 0)
        psi_v = jnp.where(ok, (pc.astype(jnp.float32) - 1.0) * em[1] + em[0], 0.0)
        phi_v = jnp.where(
            ok & (fc != 0), (fc.astype(jnp.float32) - 1.0) * em[3] + em[2], 0.0
        )
        return psi_v, phi_v, ok
    T, H, W = psi.shape
    px = xs[:, None] + dxs
    py = ys[:, None] + dys
    inb = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)
    tt = jnp.arange(T, dtype=jnp.int32)[None, :]
    flat_idx = (tt * H + pyc) * W + pxc
    ok = inb & (valid.reshape(-1)[flat_idx] > 0)
    psi_v = jnp.where(ok, psi.reshape(-1)[flat_idx], 0.0)
    phi_v = jnp.where(ok, phi.reshape(-1)[flat_idx], 0.0)
    return psi_v, phi_v, ok


def _bucket_rows(n, cap):
    """Gather batch sizes are compile keys: bucket a chunk's row count to
    the next power of two (>= 1024, <= cap) so differently-sized remainder
    chunks share ONE _gather_curves executable. Without this, every
    survey tile's winner re-scoring retraced the gather for its unique
    remainder size and re-compiled the (T, 4k, 4k) gather program per tile
    (30-90 s each on a single-core host) — the dominant per-tile cost the
    round-5 full-grid gate exposed."""
    b = 1024
    while b < n:
        b *= 2
    return min(b, cap)


def _gather_curves_padded(psi, phi, valid, times, xs, ys, vxs, vys, lo, hi, cap):
    """One bucketed _gather_curves call for rows [lo, hi): pads the batch
    to the bucketed size (repeating row ``lo`` — clamped/in-bounds math
    makes any row safe). Returns the PADDED device arrays plus the real
    row count m; callers reduce on device at the padded (bucketed) shape —
    so the reductions share executables too — and slice host-side."""
    m = hi - lo
    nb = _bucket_rows(m, cap)
    sl = slice(lo, hi)
    xs_c, ys_c = xs[sl], ys[sl]
    vxs_c = np.asarray(vxs[sl], dtype=np.float32)
    vys_c = np.asarray(vys[sl], dtype=np.float32)
    if nb != m:
        pad = nb - m
        xs_c = np.concatenate([xs_c, np.full(pad, xs_c[0], np.int32)])
        ys_c = np.concatenate([ys_c, np.full(pad, ys_c[0], np.int32)])
        vxs_c = np.concatenate([vxs_c, np.full(pad, vxs_c[0], np.float32)])
        vys_c = np.concatenate([vys_c, np.full(pad, vys_c[0], np.float32)])
    dxs, dys = trajectory_offsets(vxs_c, vys_c, times)
    psi_v, phi_v, ok = _gather_curves(
        psi, phi, valid, jnp.asarray(xs_c), jnp.asarray(ys_c),
        jnp.asarray(dxs), jnp.asarray(dys),
    )
    return psi_v, phi_v, ok, m


def evaluate_trajectories(psi, phi, valid, times, xs, ys, vxs, vys, chunk=262144):
    """Exact evaluation of a list of trajectories (reference semantics of
    evaluateTrajectory without sigma-G; kernels.cu:154-197).

    Returns a dict of numpy arrays: psi_sum, phi_sum, obs_count, lh, flux.
    """
    xs = np.asarray(xs, dtype=np.int32)
    ys = np.asarray(ys, dtype=np.int32)
    n = len(xs)
    out = {k: np.zeros(n, dtype=np.float32) for k in ("psi_sum", "phi_sum", "lh", "flux")}
    out["obs_count"] = np.zeros(n, dtype=np.int32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        psi_v, phi_v, ok, m = _gather_curves_padded(
            psi, phi, valid, times, xs, ys, vxs, vys, lo, hi, chunk
        )
        psi_sum = np.asarray(jnp.sum(psi_v, axis=1))[:m]
        phi_sum = np.asarray(jnp.sum(phi_v, axis=1))[:m]
        obs = np.asarray(jnp.sum(ok, axis=1, dtype=jnp.int32))[:m]
        good = phi_sum > 0
        out["psi_sum"][lo:hi] = psi_sum
        out["phi_sum"][lo:hi] = phi_sum
        out["obs_count"][lo:hi] = obs
        out["lh"][lo:hi] = np.where(good, psi_sum / np.sqrt(phi_sum, where=good, out=np.ones_like(phi_sum)), -1.0)
        out["flux"][lo:hi] = np.where(good, psi_sum / np.where(good, phi_sum, 1.0), -1.0)
    return out


def _curves_and_stats(psi, phi, valid, times, xs, ys, vxs, vys, chunk=262144):
    """One chunked gather serving both the trajectory statistics (identical
    ops to evaluate_trajectories) and the per-time curves + validity needed
    by the sigma-G re-scoring — the sigma-G assembly previously gathered
    the same curves three times."""
    xs = np.asarray(xs, dtype=np.int32)
    ys = np.asarray(ys, dtype=np.int32)
    n = len(xs)
    T = len(np.asarray(times))
    psi_c = np.zeros((n, T), dtype=np.float32)
    phi_c = np.zeros((n, T), dtype=np.float32)
    ok_c = np.zeros((n, T), dtype=np.float32)
    out = {k: np.zeros(n, dtype=np.float32) for k in ("psi_sum", "phi_sum", "lh", "flux")}
    out["obs_count"] = np.zeros(n, dtype=np.int32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        psi_v, phi_v, ok, m = _gather_curves_padded(
            psi, phi, valid, times, xs, ys, vxs, vys, lo, hi, chunk
        )
        psi_sum = np.asarray(jnp.sum(psi_v, axis=1))[:m]
        phi_sum = np.asarray(jnp.sum(phi_v, axis=1))[:m]
        obs = np.asarray(jnp.sum(ok, axis=1, dtype=jnp.int32))[:m]
        good = phi_sum > 0
        out["psi_sum"][lo:hi] = psi_sum
        out["phi_sum"][lo:hi] = phi_sum
        out["obs_count"][lo:hi] = obs
        out["lh"][lo:hi] = np.where(good, psi_sum / np.sqrt(phi_sum, where=good, out=np.ones_like(phi_sum)), -1.0)
        out["flux"][lo:hi] = np.where(good, psi_sum / np.where(good, phi_sum, 1.0), -1.0)
        psi_c[lo:hi] = np.asarray(psi_v)[:m]
        phi_c[lo:hi] = np.asarray(phi_v)[:m]
        ok_c[lo:hi] = np.asarray(ok)[:m]
    return psi_c, phi_c, ok_c, out


def _eval_by_index_chunked(
    psi, phi, valid, xs, ys, cidx, dxs_tab, dys_tab, chunk, want_curves, T
):
    """Shared chunk driver for the index-based winner re-scoring: bucketed
    batches (compile-key discipline, :func:`_bucket_rows`), device offset
    lookup (:func:`_gather_curves_idx`), stats always, curves when the
    sigma-G re-scoring needs them."""
    xs = np.asarray(xs, dtype=np.int32)
    ys = np.asarray(ys, dtype=np.int32)
    cidx = np.asarray(cidx, dtype=np.int32)
    n = len(xs)
    out = {k: np.zeros(n, dtype=np.float32) for k in ("psi_sum", "phi_sum", "lh", "flux")}
    out["obs_count"] = np.zeros(n, dtype=np.int32)
    curves = None
    if want_curves:
        curves = (
            np.zeros((n, T), dtype=np.float32),
            np.zeros((n, T), dtype=np.float32),
            np.zeros((n, T), dtype=np.float32),
        )
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        nb = _bucket_rows(m, chunk)
        idx = np.arange(lo, lo + nb)
        idx[m:] = lo
        psi_v, phi_v, ok = _gather_curves_idx(
            psi, phi, valid, jnp.asarray(xs[idx]), jnp.asarray(ys[idx]),
            jnp.asarray(cidx[idx]), dxs_tab, dys_tab,
        )
        psi_sum = np.asarray(jnp.sum(psi_v, axis=1))[:m]
        phi_sum = np.asarray(jnp.sum(phi_v, axis=1))[:m]
        obs = np.asarray(jnp.sum(ok, axis=1, dtype=jnp.int32))[:m]
        good = phi_sum > 0
        out["psi_sum"][lo:hi] = psi_sum
        out["phi_sum"][lo:hi] = phi_sum
        out["obs_count"][lo:hi] = obs
        out["lh"][lo:hi] = np.where(good, psi_sum / np.sqrt(phi_sum, where=good, out=np.ones_like(phi_sum)), -1.0)
        out["flux"][lo:hi] = np.where(good, psi_sum / np.where(good, phi_sum, 1.0), -1.0)
        if want_curves:
            curves[0][lo:hi] = np.asarray(psi_v)[:m]
            curves[1][lo:hi] = np.asarray(phi_v)[:m]
            curves[2][lo:hi] = np.asarray(ok)[:m]
    if want_curves:
        return curves[0], curves[1], curves[2], out
    return out


def extract_psi_phi_curves(psi, phi, valid, times, xs, ys, vxs, vys):
    """Per-time psi/phi curves with 0.0 at invalid samples, matching
    extract_joint_psi_phi_curve (stack_search.cpp:14-31).

    Returns (psi_curves, phi_curves): numpy (N, T) float32.
    """
    dxs, dys = trajectory_offsets(vxs, vys, times)
    psi_v, phi_v, _ = _gather_curves(
        psi, phi, valid,
        jnp.asarray(np.asarray(xs, dtype=np.int32)),
        jnp.asarray(np.asarray(ys, dtype=np.int32)),
        jnp.asarray(dxs), jnp.asarray(dys),
    )
    return np.asarray(psi_v), np.asarray(phi_v)


# ----------------------------------------------------------------------
# Sigma-G clipped re-scoring (parity with the in-kernel GPU filter)
# ----------------------------------------------------------------------

def sigmag_bounds_indices(num_values, sgl0, sgl1):
    """The reference's nonstandard percentile indexing
    (SigmaGFilteredIndicesCU, kernels.cu:93-127): index of percentile q in a
    sorted array of n values is clamp(int(ceil(n*q) + 0.001) - 1, 0, n-1)."""
    sgl0 = max(sgl0, 0.0001)
    sgl1 = min(sgl1, 0.9999)

    def pct(q):
        idx = int(np.ceil(num_values * q) + 0.001) - 1
        return min(max(idx, 0), num_values - 1)

    return pct(sgl0), pct(0.5), pct(sgl1)


def clipped_sigmag_scores(psi_v, phi_v, ok, sgl_L, sgl_H, coeff, width=2.0):
    """Recompute (lh, flux) after the reference's in-kernel sigma-G clipping
    (kernels.cu:213-241), vectorized over N trajectories.

    psi_v, phi_v: (N, T) per-time values (anything at invalid slots), ok:
    (N, T) bool validity. The light curve is psi/phi over the *valid* samples
    only, compacted in time order; clipping keeps the sorted values within
    [median - width*sigma_g, median + width*sigma_g] using the reference's
    scan-from-median rules: from index 0 up to (exclusive) the median keep
    values >= min_value once reached; from median+1 keep the contiguous run
    of values <= max_value.

    Returns (new_lh, new_flux, new_psi_sum, new_phi_sum) as numpy arrays.
    The caller is responsible for only applying these where the unclipped
    result passed the min_obs / min_lh gates (kernels.cu:201-203).
    """
    psi_v = np.asarray(psi_v, dtype=np.float32)
    phi_v = np.asarray(phi_v, dtype=np.float32)
    ok = np.asarray(ok, dtype=bool)
    N, T = psi_v.shape

    # Compact the valid samples in time order, padded with +inf so they sort
    # to the tail; `n` counts valid samples per row.
    n = ok.sum(axis=1)
    lc = np.where(ok & (phi_v != 0), psi_v / np.where(phi_v != 0, phi_v, 1.0), np.where(ok, 0.0, np.inf))
    order = np.argsort(lc, axis=1, kind="stable")  # valid entries first (inf last)
    vals = np.take_along_axis(lc, order, axis=1)
    psi_sorted = np.take_along_axis(np.where(ok, psi_v, 0.0), order, axis=1)
    phi_sorted = np.take_along_axis(np.where(ok, phi_v, 0.0), order, axis=1)

    # The reference's percentile indexing: clamp(ceil(n*q + eps) - 1, 0, n-1).
    sgl_L_c = max(sgl_L, 0.0001)
    sgl_H_c = min(sgl_H, 0.9999)

    def pct_idx(q):
        # Reference indexing: int(ceil(n*q) + 0.001) - 1 — the epsilon sits
        # OUTSIDE the ceil (guards float-to-int truncation only).
        idx = np.floor(np.ceil(n * q) + 0.001).astype(int) - 1
        return np.clip(idx, 0, np.maximum(n - 1, 0))

    iL = pct_idx(sgl_L_c)
    iM = pct_idx(0.5)
    iH = pct_idx(sgl_H_c)
    rows = np.arange(N)
    safe = n > 0
    vL = vals[rows, iL]
    vM = vals[rows, iM]
    vH = vals[rows, iH]
    sigma_g = coeff * (vH - vL)
    min_value = vM - width * sigma_g
    max_value = vM + width * sigma_g

    # start = first index in [0, iM) with vals >= min_value (else iM);
    # since vals is sorted, that's count of vals < min_value clamped at iM.
    cols = np.arange(T)[None, :]
    start = np.minimum((vals < min_value[:, None]).sum(axis=1), iM)
    # end-1 = last index >= iM with the contiguous run vals <= max_value:
    # first index > iM with vals > max_value, minus one.
    gt_max = (vals > max_value[:, None]) & (cols > iM[:, None])
    end = np.where(gt_max.any(axis=1), gt_max.argmax(axis=1), np.minimum(n, T))
    end = np.minimum(end, n)

    keep = (cols >= start[:, None]) & (cols < end[:, None])
    new_psi = np.where(safe, (psi_sorted * keep).sum(axis=1, dtype=np.float32), 0.0)
    new_phi = np.where(safe, (phi_sorted * keep).sum(axis=1, dtype=np.float32), 0.0)

    good = new_phi > 0
    new_lh = np.where(good, new_psi / np.sqrt(np.where(good, new_phi, 1.0)), -1.0).astype(np.float32)
    new_flux = np.where(good, new_psi / np.where(good, new_phi, 1.0), -1.0).astype(np.float32)
    return new_lh, new_flux, new_psi.astype(np.float32), new_phi.astype(np.float32)


def _clipped_scores_jnp(psi_v, phi_v, ok, sgl_L, sgl_H, coeff, width=2.0):
    """jnp twin of clipped_sigmag_scores (identical semantics, traceable):
    returns (new_lh, new_flux) for (N, T) curves with (N, T) validity."""
    N, T = psi_v.shape
    n = jnp.sum(ok, axis=1).astype(jnp.int32)
    lc = jnp.where(
        ok & (phi_v != 0),
        psi_v / jnp.where(phi_v != 0, phi_v, 1.0),
        jnp.where(ok, 0.0, jnp.inf),
    )
    order = jnp.argsort(lc, axis=1, stable=True)
    vals = jnp.take_along_axis(lc, order, axis=1)
    psi_sorted = jnp.take_along_axis(jnp.where(ok, psi_v, 0.0), order, axis=1)
    phi_sorted = jnp.take_along_axis(jnp.where(ok, phi_v, 0.0), order, axis=1)

    sgl_L_c = max(float(sgl_L), 0.0001)
    sgl_H_c = min(float(sgl_H), 0.9999)

    def pct_idx(q):
        idx = jnp.floor(jnp.ceil(n * q) + 0.001).astype(jnp.int32) - 1
        return jnp.clip(idx, 0, jnp.maximum(n - 1, 0))

    iL, iM, iH = pct_idx(sgl_L_c), pct_idx(0.5), pct_idx(sgl_H_c)
    rows = jnp.arange(N)
    vL = vals[rows, iL]
    vM = vals[rows, iM]
    vH = vals[rows, iH]
    sigma_g = coeff * (vH - vL)
    min_value = vM - width * sigma_g
    max_value = vM + width * sigma_g
    cols = jnp.arange(T)[None, :]
    start = jnp.minimum(jnp.sum(vals < min_value[:, None], axis=1), iM)
    gt_max = (vals > max_value[:, None]) & (cols > iM[:, None])
    end = jnp.where(gt_max.any(axis=1), jnp.argmax(gt_max, axis=1), jnp.minimum(n, T))
    end = jnp.minimum(end, n)
    keep = (cols >= start[:, None]) & (cols < end[:, None])
    safe = n > 0
    new_psi = jnp.where(safe, jnp.sum(psi_sorted * keep, axis=1), 0.0)
    new_phi = jnp.where(safe, jnp.sum(phi_sorted * keep, axis=1), 0.0)
    good = new_phi > 0
    new_lh = jnp.where(good, new_psi / jnp.sqrt(jnp.where(good, new_phi, 1.0)), -1.0)
    new_flux = jnp.where(good, new_psi / jnp.where(good, new_phi, 1.0), -1.0)
    return new_lh, new_flux


@partial(
    jax.jit,
    static_argnames=(
        "x_min", "x_max", "y_min", "y_max", "k_results",
        "sgl_L", "sgl_H", "width",
    ),
)
def _sigmag_exact_tile(
    psi, phi, valid, dxs, dys, min_obs, min_lh, sigmag_coeff, cand_idx0,
    *, x_min, x_max, y_min, y_max, k_results, sgl_L, sgl_H, width=2.0,
    cand_valid=None,
):
    """Exact in-kernel sigma-G top-K for one pixel tile: every candidate's
    score is its CLIPPED likelihood (insertion gated on it), exactly the
    reference GPU flow (kernels.cu:184-241, 318-330). ~T log T per eval —
    use for modest tiles / opt-in exact mode."""
    T, H, W = psi.shape
    SH = y_max - y_min
    SW = x_max - x_min
    N = SH * SW

    W2 = max(W, SW)
    L = SH * W2
    pad = (SH + H + 2) * W2
    total = T * H * W2 + 2 * pad

    def flat(a, dtype):
        a = a.astype(dtype)
        if W2 > W:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, W2 - W)))
        z = jnp.zeros((pad,), dtype=dtype)
        return jnp.concatenate([z, a.reshape(-1), z])

    psi_f = flat(psi, jnp.float32)
    phi_f = flat(phi, jnp.float32)
    val_f = flat(valid, jnp.uint8)

    ii = lax.broadcasted_iota(jnp.int32, (SH, 1), 0)
    jj = lax.broadcasted_iota(jnp.int32, (1, SW), 1)

    def curves(dy, dx):
        """(N, T) psi/phi curves + validity for every tile pixel."""

        def one_t(t):
            oy = jnp.int32(y_min) + dy[t]
            ox = jnp.int32(x_min) + dx[t]
            start = jnp.clip(pad + t * H * W2 + oy * W2 + ox, 0, total - L)
            ps = lax.dynamic_slice(psi_f, (start,), (L,)).reshape(SH, W2)[:, :SW]
            fs = lax.dynamic_slice(phi_f, (start,), (L,)).reshape(SH, W2)[:, :SW]
            vs = lax.dynamic_slice(val_f, (start,), (L,)).reshape(SH, W2)[:, :SW]
            m = (ii >= -oy) & (ii < H - oy) & (jj >= -ox) & (jj < W - ox) & (vs > 0)
            return jnp.where(m, ps, 0.0), jnp.where(m, fs, 0.0), m

        ps, fs, ms = jax.vmap(one_t)(jnp.arange(T, dtype=jnp.int32))
        # (T, SH, SW) -> (N, T)
        return (
            ps.reshape(T, N).T,
            fs.reshape(T, N).T,
            ms.reshape(T, N).T,
        )

    def cand_step(carry, inp):
        top_lh, top_idx = carry
        dy, dx, cidx, cok = inp
        psi_v, phi_v, okv = curves(dy, dx)
        psi_sum = jnp.sum(psi_v, axis=1)
        phi_sum = jnp.sum(phi_v, axis=1)
        obs = jnp.sum(okv, axis=1).astype(jnp.float32)
        lh_unclipped = jnp.where(phi_sum > 0, psi_sum / jnp.sqrt(jnp.maximum(phi_sum, 1e-30)), -1.0)
        clipped_lh, _ = _clipped_scores_jnp(
            psi_v, phi_v, okv, sgl_L, sgl_H, sigmag_coeff, width
        )
        # Pre-gates (kernels.cu:201-203) then the insertion gate on the
        # clipped score (kernels.cu:318-330).
        pre = (obs >= min_obs) & (obs > 0) & (lh_unclipped >= min_lh)
        ins = pre & (clipped_lh >= min_lh) & (cok != 0)
        new = jnp.where(ins, clipped_lh, -jnp.inf).reshape(SH, SW)
        newi = jnp.full((SH, SW), cidx, dtype=jnp.int32)
        for k in range(k_results):
            better = new > top_lh[k]
            cur_lh = top_lh[k]
            cur_idx = top_idx[k]
            top_lh = top_lh.at[k].set(jnp.where(better, new, cur_lh))
            top_idx = top_idx.at[k].set(jnp.where(better, newi, cur_idx))
            new = jnp.where(better, cur_lh, new)
            newi = jnp.where(better, cur_idx, newi)
        return (top_lh, top_idx), None

    C = dxs.shape[0]
    top_lh0 = jnp.full((k_results, SH, SW), -FLT_MAX, dtype=jnp.float32)
    top_idx0 = jnp.full((k_results, SH, SW), -1, dtype=jnp.int32)
    cidx = cand_idx0 + jnp.arange(C, dtype=jnp.int32)
    cok = (
        jnp.ones((C,), dtype=jnp.int32)
        if cand_valid is None
        else jnp.asarray(cand_valid).astype(jnp.int32).reshape(C)
    )
    (top_lh, top_idx), _ = lax.scan(cand_step, (top_lh0, top_idx0), (dys, dxs, cidx, cok))
    return top_lh, top_idx


def search_topk_sigmag_exact(
    psi, phi, valid, dxs, dys, min_obs, min_lh, sigmag_coeff,
    *, x_min, x_max, y_min, y_max, k_results, sgl_L, sgl_H,
    row_tile=256, cand_offset=0,
):
    """Exact-sigma-G top-K over the full search window, row-tiled to bound
    the per-candidate (N, T) curve memory. Returns (K, SH, SW) arrays with
    CLIPPED likelihoods, matching the reference GPU kernel bit-for-bit in
    ranking semantics."""
    SH = y_max - y_min
    lhs, idxs = [], []
    for y0 in range(y_min, y_max, int(row_tile)):
        y1 = min(y_max, y0 + int(row_tile))
        lh_t, idx_t = _sigmag_exact_tile(
            jnp.asarray(psi), jnp.asarray(phi), jnp.asarray(valid),
            jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(min_obs), jnp.float32(min_lh), jnp.float32(sigmag_coeff),
            jnp.int32(cand_offset),
            x_min=int(x_min), x_max=int(x_max), y_min=int(y0), y_max=int(y1),
            k_results=int(k_results), sgl_L=float(sgl_L), sgl_H=float(sgl_H),
        )
        lhs.append(np.asarray(lh_t))
        idxs.append(np.asarray(idx_t))
    return np.concatenate(lhs, axis=1), np.concatenate(idxs, axis=1)


def sigmag_filtered_indices(values, sgl0, sgl1, sigmag_coeff, width):
    """Test-compat shim mirroring kernel_helpers.cpp:86-106: return the kept
    *original* indices after sigma-G filtering a single value array."""
    values = np.asarray(values, dtype=np.float32)
    n = len(values)
    if n == 0:
        return np.array([], dtype=int)
    order = np.argsort(values, kind="stable")
    vals = values[order]
    iL, iM, iH = sigmag_bounds_indices(n, sgl0, sgl1)
    sigma_g = sigmag_coeff * (vals[iH] - vals[iL])
    min_value = vals[iM] - width * sigma_g
    max_value = vals[iM] + width * sigma_g
    start = 0
    while start < iM and vals[start] < min_value:
        start += 1
    end = iM + 1
    while end < n and vals[end] <= max_value:
        end += 1
    return np.sort(order[start:end])


# ----------------------------------------------------------------------
# The shift-and-accumulate top-K search kernel
# ----------------------------------------------------------------------

def search_topk_core(
    psi,
    phi,
    valid,
    dxs,
    dys,
    min_obs,
    min_lh,
    x_min,
    y_min,
    cand_offset,
    *,
    sh,
    sw,
    k_results,
    gate_min_obs=True,
    gate_min_lh=False,
    unroll=1,
    cand_valid=None,
    has_masked=True,
    encode_meta=None,
    reduce_fn=None,
):
    """The shift-and-accumulate top-K kernel body (trace-time bounds are
    dynamic so it composes with shard_map pixel/candidate sharding).

    ``reduce_fn`` (optional) is applied to the per-candidate partial sums
    (psi_sum, phi_sum, obs) after the time loop and before gating/top-K —
    the hook time sharding uses to psum partial sums across a mesh axis
    (the per-candidate statistic is a pure sum over T, so it factorizes
    exactly over a time-sharded stack).

    ``has_masked=False`` (static) skips the validity-plane reads entirely —
    valid for stacks with no masked pixels, saving a third of the HBM
    traffic in the hot loop.

    ``encode_meta`` (traced 4-vector [psi_min, psi_scale, phi_min,
    phi_scale]) switches to the quantized path: psi/phi are uint8/uint16
    code arrays (code 0 = masked, exactly the reference's encoding,
    psi_phi_array_ds.h:40-47) decoded in-register after each slice —
    halving (uint16) or quartering (uint8) the hot-loop HBM traffic, with
    validity derived from the codes (no separate plane).

    Parameters
    ----------
    psi, phi : (T, H, W) float32, zero-filled at masked pixels.
    valid : (T, H, W) uint8 validity plane.
    dxs, dys : (C, T) int32 per-candidate per-time integer offsets.
    min_obs, min_lh : traced scalars for the insertion gates (GPU-path
        semantics, kernels.cu:318-320). ``gate_min_obs=False`` reproduces
        the CPU path which inserts everything
        (cpu_search_algorithms.cpp:69-86).
    x_min, y_min : traced int32 — search-region origin (may be negative).
    cand_offset : traced int32 — global index of this shard's candidate 0.
    sh, sw : static search-region height/width.
    k_results : static results per pixel.
    cand_valid : optional (C,) bool — False marks padding candidates.

    Returns
    -------
    top_lh : (K, SH, SW) float32 — best likelihoods (empty = -FLT_MAX).
    top_idx : (K, SH, SW) int32 — global candidate indices (empty = -1).
    """
    T, H, W = psi.shape
    SH, SW = sh, sw

    # When the search region is wider than the image (x pixel buffers), pad
    # zero columns on the right so rows of the flattened stack are at least
    # SW wide; the in-bounds masks still test against the true W.
    W2 = max(W, SW)

    L = SH * W2  # slice length per plane per time step
    pad = (SH + H + 2) * W2
    total = T * H * W2 + 2 * pad

    def flat(a, dtype):
        a = a.astype(dtype)
        if W2 > W:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, W2 - W)))
        z = jnp.zeros((pad,), dtype=dtype)
        return jnp.concatenate([z, a.reshape(-1), z])

    encoded = encode_meta is not None
    if encoded:
        code_dtype = psi.dtype
        psi_f = flat(psi, code_dtype)
        phi_f = flat(phi, code_dtype)
        val_f = None
        psi_min, psi_scale, phi_min, phi_scale = (
            encode_meta[0], encode_meta[1], encode_meta[2], encode_meta[3]
        )
    else:
        psi_f = flat(psi, jnp.float32)
        phi_f = flat(phi, jnp.float32)
        val_f = flat(valid, jnp.uint8) if has_masked else None

    ii = lax.broadcasted_iota(jnp.int32, (SH, 1), 0)
    jj = lax.broadcasted_iota(jnp.int32, (1, SW), 1)

    def accumulate(dy, dx):
        """Sum shifted psi/phi/valid over all T for one candidate."""

        def tbody(t, acc):
            psi_s, phi_s, obs = acc
            oy = y_min + dy[t]
            ox = x_min + dx[t]
            start = jnp.clip(pad + t * H * W2 + oy * W2 + ox, 0, total - L)
            ps = lax.dynamic_slice(psi_f, (start,), (L,)).reshape(SH, W2)[:, :SW]
            fs = lax.dynamic_slice(phi_f, (start,), (L,)).reshape(SH, W2)[:, :SW]
            # In-bounds masks: row i valid iff 0 <= y_min + i + dy < H.
            m = (ii >= -oy) & (ii < H - oy) & (jj >= -ox) & (jj < W - ox)
            if encoded:
                # Accumulate raw code sums; codes are small integers so the
                # f32 sums are exact. Decoding ((v-1)*scale + min, 0=masked)
                # is affine, so it is applied once after the loop — the same
                # formulation as the Pallas encoded kernel, keeping the two
                # paths bitwise consistent.
                m = m & (ps != 0) & (fs != 0)
                mf = jnp.where(m, 1.0, 0.0)
                psc = jnp.where(m, ps.astype(jnp.float32), 0.0)
                fsc = jnp.where(m, fs.astype(jnp.float32), 0.0)
                return (psi_s + psc, phi_s + fsc, obs + mf)
            if has_masked:
                vs = lax.dynamic_slice(val_f, (start,), (L,)).reshape(SH, W2)[:, :SW]
                mf = jnp.where(m, vs.astype(jnp.float32), 0.0)
            else:
                mf = m.astype(jnp.float32)
            return (psi_s + ps * mf, phi_s + fs * mf, obs + mf)

        zeros = jnp.zeros((SH, SW), dtype=jnp.float32)
        psi_s, phi_s, obs = lax.fori_loop(0, T, tbody, (zeros, zeros, zeros), unroll=unroll)
        if encoded:
            psi_s = psi_scale * psi_s + (psi_min - psi_scale) * obs
            phi_s = phi_scale * phi_s + (phi_min - phi_scale) * obs
        return psi_s, phi_s, obs

    def cand_step(carry, inp):
        top_lh, top_idx = carry
        dy, dx, cidx, c_ok = inp
        psi_s, phi_s, obs = accumulate(dy, dx)
        if reduce_fn is not None:
            psi_s, phi_s, obs = reduce_fn(psi_s, phi_s, obs)
        lh = jnp.where(phi_s > 0, psi_s / jnp.sqrt(phi_s), -1.0)
        ok = jnp.broadcast_to(c_ok, lh.shape)
        if gate_min_obs:
            ok &= obs >= min_obs
        if gate_min_lh:
            ok &= lh >= min_lh
        new = jnp.where(ok, lh, -jnp.inf)
        newi = jnp.full(lh.shape, cidx, dtype=jnp.int32)
        # Sorted K-slot insertion (vectorized bubble; kernels.cu:322-330).
        for k in range(k_results):
            better = new > top_lh[k]
            cur_lh = top_lh[k]
            cur_idx = top_idx[k]
            top_lh = top_lh.at[k].set(jnp.where(better, new, cur_lh))
            top_idx = top_idx.at[k].set(jnp.where(better, newi, cur_idx))
            new = jnp.where(better, cur_lh, new)
            newi = jnp.where(better, cur_idx, newi)
        return (top_lh, top_idx), None

    C = dxs.shape[0]
    top_lh0 = jnp.full((k_results, SH, SW), -FLT_MAX, dtype=jnp.float32)
    top_idx0 = jnp.full((k_results, SH, SW), -1, dtype=jnp.int32)
    cidx = cand_offset + jnp.arange(C, dtype=jnp.int32)
    c_ok = jnp.ones((C,), dtype=bool) if cand_valid is None else cand_valid
    (top_lh, top_idx), _ = lax.scan(cand_step, (top_lh0, top_idx0), (dys, dxs, cidx, c_ok))
    return top_lh, top_idx


@partial(
    jax.jit,
    static_argnames=(
        "x_min", "x_max", "y_min", "y_max", "k_results", "gate_min_obs", "gate_min_lh", "unroll", "has_masked",
    ),
)
def search_topk_shift(
    psi,
    phi,
    valid,
    dxs,
    dys,
    min_obs,
    min_lh,
    *,
    x_min,
    x_max,
    y_min,
    y_max,
    k_results,
    gate_min_obs=True,
    gate_min_lh=False,
    unroll=1,
    has_masked=True,
    encode_meta=None,
):
    """Single-device entry for the top-K search (see search_topk_core)."""
    return search_topk_core(
        psi,
        phi,
        valid,
        dxs,
        dys,
        min_obs,
        min_lh,
        jnp.int32(x_min),
        jnp.int32(y_min),
        jnp.int32(0),
        sh=y_max - y_min,
        sw=x_max - x_min,
        k_results=k_results,
        gate_min_obs=gate_min_obs,
        gate_min_lh=gate_min_lh,
        unroll=unroll,
        has_masked=has_masked,
        encode_meta=encode_meta,
    )


def merge_topk(top_lh, top_idx, k_results):
    """Merge stacked per-shard top-K maps (M, SH, SW) into global top-K by
    per-pixel stable sort on descending lh; ties keep shard order (shards
    hold ascending candidate ranges, matching sequential insertion)."""
    order = jnp.argsort(-top_lh, axis=0, stable=True)
    lh_sorted = jnp.take_along_axis(top_lh, order, axis=0)
    idx_sorted = jnp.take_along_axis(top_idx, order, axis=0)
    return lh_sorted[:k_results], idx_sorted[:k_results]


# ----------------------------------------------------------------------
# Orchestration: full core search producing a struct-of-arrays result set
# ----------------------------------------------------------------------

def core_search(
    psi,
    phi,
    valid,
    times,
    vxs,
    vys,
    x_min,
    x_max,
    y_min,
    y_max,
    results_per_pixel,
    min_obs=0,
    min_lh=0.0,
    do_sigmag=False,
    sgl_L=0.25,
    sgl_H=0.75,
    sigmag_coeff=-1.0,
    gate_min_obs=True,
    gate_min_lh=None,
    kernel=None,
    psi_codes=None,
    phi_codes=None,
    encode_meta=None,
    packed_provider=None,
    compact_min_lh=None,
):
    """Run the full top-K search and assemble per-result statistics.

    ``gate_min_lh=None`` (default) gates top-K insertion at min_lh only in
    sigma-G mode (matching kernels.cu:318-320); ``True`` forces the gate —
    post-filter results are identical (the gate uses the same ``>=`` as
    ``filter_by_likelihood``) but the maps leave sub-threshold slots empty,
    which is what lets the device-side compaction in :func:`_fetch_topk`
    engage at survey scale.

    Returns a dict of numpy arrays (x, y, vx, vy, lh, flux, obs_count) laid
    out pixel-major with K entries per pixel (reference layout,
    kernels.cu:286), with empty slots carrying lh = -FLT_MAX, matching
    searchFilterImages' initialization (kernels.cu:293-301).

    When ``do_sigmag`` is set, candidate scores are recomputed with the
    reference's in-kernel sigma-G clipping. The clipped score is computed for
    the surviving top-K per pixel with an over-provisioned K (so that
    clipping-induced reordering is captured), mirroring kernels.cu:213-241.
    """
    if isinstance(psi, EncodedPlanes) and psi_codes is None:
        # Callers may pass the code planes once (as the eval planes) and
        # let the kernel arguments derive from them.
        psi_codes, phi_codes = psi.psi_codes, psi.phi_codes
        encode_meta = psi.em
    T, H, W = psi.shape
    SH, SW = y_max - y_min, x_max - x_min
    num_cand = len(vxs)
    k = int(results_per_pixel)

    # With sigma-G the clipped lh decides the final top-K. The default mode
    # over-provisions: search the top 4K by UNCLIPPED lh, then re-rank that
    # pool by clipped lh. This is an APPROXIMATION — clipping away
    # negative-psi outliers can RAISE a score, so a candidate outside the
    # unclipped top-4K can in principle belong in the clipped top-K
    # (kernels.cu:318-330 gates on clipped lh over all candidates). It is
    # exact whenever <= 4K candidates per pixel pass the min_lh pre-gate or
    # clipping does not promote past the pool boundary; KB_SIGMAG_MODE=exact
    # selects the reference-exact (~T log T per eval) kernel instead.
    # KB_SIGMAG_TOPK_FACTOR tunes the pool size.
    if gate_min_lh is None:
        gate_min_lh = bool(do_sigmag)
    sigmag_mode = os.environ.get("KB_SIGMAG_MODE", "overprovision") if do_sigmag else ""
    over = int(os.environ.get("KB_SIGMAG_TOPK_FACTOR", "4"))
    k_search = min(num_cand, over * k if (do_sigmag and sigmag_mode != "exact") else k)
    k_search = max(k_search, k)

    dxs, dys = trajectory_offsets(vxs, vys, times)
    escalate = _SigmaGEscalation(do_sigmag, sigmag_mode, over, k, num_cand)
    encoded = encode_meta is not None and psi_codes is not None
    has_masked = (not encoded) and bool(np.asarray(jnp.min(jnp.asarray(valid))) == 0)

    # Kernel selection: the fused VMEM-resident Pallas kernel on TPU (the
    # XLA formulation elsewhere); overridable via KB_SEARCH_KERNEL=xla|pallas.
    if kernel is None:
        default = "pallas" if jax.default_backend() == "tpu" else "xla"
        kernel = os.environ.get("KB_SEARCH_KERNEL", default)
    def _topk_maps(k_search, sigmag_mode):
        """One kernel dispatch at the given pool depth / mode."""
        kernel_kwargs = dict(
            x_min=int(x_min),
            x_max=int(x_max),
            y_min=int(y_min),
            y_max=int(y_max),
            k_results=int(k_search),
            gate_min_obs=gate_min_obs,
            gate_min_lh=bool(gate_min_lh),
            has_masked=has_masked,
        )
        if sigmag_mode == "exact":
            # Reference-exact in-kernel sigma-G: every candidate scored and
            # gated by its clipped lh (kernels.cu:184-241). Runs on the decoded
            # planes (valid for encoded stacks too; EncodedPlanes callers pay
            # the full decode here — the exact kernel needs whole planes).
            psi_x, phi_x, valid_x = (
                psi.decode_full() if isinstance(psi, EncodedPlanes) else (psi, phi, valid)
            )
            top_lh, top_idx = search_topk_sigmag_exact(
                psi_x, phi_x, valid_x, dxs, dys, min_obs, min_lh, sigmag_coeff,
                x_min=int(x_min), x_max=int(x_max), y_min=int(y_min), y_max=int(y_max),
                k_results=int(k_search), sgl_L=sgl_L, sgl_H=sgl_H,
            )
        elif encoded:
            # Quantized hot path: stream the uint8/uint16 codes directly.
            args = (
                jnp.asarray(psi_codes),
                jnp.asarray(phi_codes),
                jnp.zeros((1, 1, 1), jnp.uint8),
                jnp.asarray(dxs),
                jnp.asarray(dys),
                jnp.float32(min_obs),
                jnp.float32(min_lh),
            )
            if kernel == "pallas":
                from kbmod_tpu.ops.search_pallas import (
                    search_topk_pallas_encoded,
                    search_topk_pallas_packed,
                )

                interpret = jax.default_backend() != "tpu"
                kw = {k: v for k, v in kernel_kwargs.items() if k != "has_masked"}
                done = False
                if packed_provider is not None:
                    # Survey-scale path: reuse the cached interleaved word
                    # stream instead of re-packing per call.
                    words_r, pad_rows = packed_provider()
                    codes = psi_codes  # shape/dtype only — never fetch
                    try:
                        # Host offsets stay host-side: the dispatcher needs
                        # them concrete for grouping plans and bounds checks.
                        top_lh, top_idx = search_topk_pallas_packed(
                            words_r, np.asarray(dxs, np.int32), np.asarray(dys, np.int32),
                            jnp.float32(min_obs), jnp.float32(min_lh),
                            jnp.asarray(np.asarray(encode_meta, dtype=np.float32)),
                            shape=codes.shape, bits=8 * codes.dtype.itemsize,
                            pad_rows=pad_rows, interpret=interpret, **kw,
                        )
                        done = True
                    except ValueError:
                        # Stream packed for a smaller window (extended bounds):
                        # fall back to the in-wrapper packing.
                        pass
                if not done:
                    top_lh, top_idx = search_topk_pallas_encoded(
                        jnp.asarray(psi_codes), jnp.asarray(phi_codes),
                        jnp.asarray(dxs), jnp.asarray(dys),
                        jnp.float32(min_obs), jnp.float32(min_lh),
                        jnp.asarray(np.asarray(encode_meta, dtype=np.float32)),
                        interpret=interpret, **kw,
                    )
            else:
                kernel_kwargs["encode_meta"] = jnp.asarray(np.asarray(encode_meta, dtype=np.float32))
                top_lh, top_idx = search_topk_shift(*args, **kernel_kwargs)
        else:
            args = (
                jnp.asarray(psi),
                jnp.asarray(phi),
                jnp.asarray(valid),
                jnp.asarray(dxs),
                jnp.asarray(dys),
                jnp.float32(min_obs),
                jnp.float32(min_lh),
            )
            if kernel == "pallas":
                from kbmod_tpu.ops.search_pallas import search_topk_pallas

                interpret = jax.default_backend() != "tpu"
                top_lh, top_idx = search_topk_pallas(*args, interpret=interpret, **kernel_kwargs)
            else:
                top_lh, top_idx = search_topk_shift(*args, **kernel_kwargs)
        return top_lh, top_idx

    timing = bool(os.environ.get("KB_TIMING"))
    t0 = time.perf_counter()
    top_lh, top_idx = _topk_maps(k_search, sigmag_mode)
    if timing:
        # Force the (lazy) kernel dispatch to completion so the stage walls
        # attribute correctly (a 1-element fetch; block_until_ready does
        # not block through the axon tunnel).
        float(np.asarray(top_lh[0, 0, 0]))
        logger.info(f"KB_TIMING core_search kernel: {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()
    refine_fn = None
    if escalate.enabled:
        refine_fn = partial(
            exact_refine_pixels, psi=psi, phi=phi, valid=valid, times=times,
            vxs=vxs, vys=vys, k=k, min_obs=min_obs, min_lh=min_lh,
            sgl_L=sgl_L, sgl_H=sgl_H, sigmag_coeff=sigmag_coeff,
        )
    results, _ = assemble_core_results(
        top_lh, top_idx, psi, phi, valid, times, vxs, vys,
        k=k, k_search=k_search, x_min=x_min, y_min=y_min, SH=SH, SW=SW,
        min_obs=min_obs, min_lh=min_lh, do_sigmag=do_sigmag,
        sgl_L=sgl_L, sgl_H=sgl_H, sigmag_coeff=sigmag_coeff,
        warn_on_churn=not escalate.enabled, refine_fn=refine_fn,
        compact_min_lh=compact_min_lh,
    )
    if timing:
        logger.info(f"KB_TIMING core_search assemble: {time.perf_counter() - t0:.2f}s")
    return results


def estimate_search_hbm(
    T, H, W,
    *,
    encode_num_bytes=1,
    k_search=8,
    tile_rows=256,
    gather_chunk=262144,
    fetch_band=1 << 25,
):
    """The written HBM budget of a production tiled search (bytes).

    Every device-resident term of the survey path is accounted for, so the
    4k gate's fit is arithmetic in the code rather than folklore
    (VERDICT r4 weak #7; the class of OOM patched by the banded
    :func:`_fetch_topk` is exactly a term that was missing from the
    mental model). Components, encoded (uint8/uint16) path:

    * ``packed_stream`` — the interleaved kernel word stream
      (:func:`kbmod_tpu.ops.search_pallas.packed_stream_bytes`): the
      dominant term, ~8.3 GB at 100 x 4096^2 uint8.
    * ``code_planes``  — psi/phi code planes kept on device for the
      EncodedPlanes winner re-scoring (2 * T*H*W * nb).
    * ``topk_maps``    — per-tile (K', rows, W) lh/idx maps, x2 for the
      transient sort/merge copies XLA materializes.
    * ``fetch_bands``  — the banded compaction's intermediates
      (mask + nonzero scatter ~ 4 arrays of one band).
    * ``gather_curves``— one winner re-scoring chunk (psi, phi, ok
      curves of gather_chunk x T).

    Float (unencoded) path: the flattened psi/phi/valid copies the XLA
    kernel builds replace the packed stream and code planes.

    Returns a dict with the component breakdown plus ``"total"``.
    """
    nb = 4 if encode_num_bytes in (-1, 4) else int(encode_num_bytes)
    parts = {}
    if encode_num_bytes in (1, 2):
        from kbmod_tpu.ops.search_pallas import packed_stream_bytes

        parts["packed_stream"] = packed_stream_bytes(T, H, W, itemsize=nb)
        parts["code_planes"] = 2 * T * H * W * nb
    else:
        # search_topk_core flattens psi/phi (f32) + valid (u8) with 2*pad.
        pad = (min(tile_rows, H) + H + 2) * W
        parts["float_planes"] = (4 + 4 + 1) * (T * H * W + 2 * pad)
    parts["topk_maps"] = 2 * 2 * k_search * min(tile_rows, H) * W * 4
    parts["fetch_bands"] = 4 * fetch_band * 4
    parts["gather_curves"] = 3 * gather_chunk * T * 4
    parts["total"] = sum(parts.values())
    return parts


def _fetch_topk(top_lh, top_idx, band=1 << 25):
    """Bring (K, SH, SW) top-K maps to the host.

    Empty slots (idx == -1, lh == -FLT_MAX — searchFilterImages'
    initialization, kernels.cu:293-301) usually dominate after gating, so
    when the maps live on-device the real entries are compacted there and
    the dense maps rebuilt host-side: device->host traffic drops from the
    full maps (e.g. 1GB at 4k x 4k x K=8) to just the survivors. Exactly
    equivalent to a dense fetch.
    """
    if isinstance(top_lh, np.ndarray) or not hasattr(top_lh, "device"):
        return np.asarray(top_lh), np.asarray(top_idx)
    shape = top_lh.shape
    total = int(top_lh.size)
    mask = (top_idx >= 0).reshape(-1)
    n = int(jnp.sum(mask))
    if 4 * n >= total or total < 1 << 16:
        return np.asarray(top_lh), np.asarray(top_idx)
    # Compact in flat BANDS: nonzero's scatter/cumsum internals allocate
    # several times the mask size, which OOMs a survey-scale full-frame
    # map (K x 4k x 4k = 134M slots) sharing HBM with the packed kernel
    # stream. Banding caps the intermediates (~2^25 elements per band)
    # without changing the result; positions are gathered with clamped
    # indices so no padded copy of the maps is ever made.
    lh_flat = top_lh.reshape(-1)
    idx_flat = top_idx.reshape(-1)
    lh_np = np.full(total, -FLT_MAX, dtype=np.float32)
    idx_np = np.full(total, -1, dtype=np.int32)
    for lo in range(0, total, band):
        hi = min(lo + band, total)
        blen = hi - lo
        m_b = mask[lo:hi]
        n_b = int(jnp.sum(m_b))
        if n_b == 0:
            continue
        # Power-of-two bucket bounds retraces of the static-size nonzero.
        size = min(blen, 1 << max(10, int(n_b - 1).bit_length()))
        pos = jnp.nonzero(m_b, size=size, fill_value=blen)[0]
        safe = jnp.minimum(pos, blen - 1)
        pos_np = np.asarray(pos)
        lh_v = np.asarray(lh_flat[lo:hi][safe])
        idx_v = np.asarray(idx_flat[lo:hi][safe])
        keep = pos_np < blen
        lh_np[lo + pos_np[keep]] = lh_v[keep]
        idx_np[lo + pos_np[keep]] = idx_v[keep]
    return lh_np.reshape(shape), idx_np.reshape(shape)


def assemble_core_results(
    top_lh, top_idx, psi, phi, valid, times, vxs, vys,
    *, k, k_search, x_min, y_min, SH, SW, min_obs, min_lh,
    do_sigmag=False, sgl_L=0.25, sgl_H=0.75, sigmag_coeff=-1.0,
    curves_fn=None, eval_fn=None, warn_on_churn=True, refine_fn=None,
    compact_min_lh=None,
):
    """Turn (K', SH, SW) top-K maps into the pixel-major struct-of-arrays
    result set, re-scoring the winners exactly (flux/obs and, with
    sigma-G, the clipped likelihoods + per-pixel re-rank back to K).

    ``curves_fn`` / ``eval_fn`` default to the single-device gathers; the
    sharded path substitutes mesh-sharded versions so the winner
    re-scoring is not a single-chip bottleneck at survey scale.

    ``compact_min_lh`` (opt-in) drops rows whose KERNEL likelihood fails
    that bound before assembly, skipping the dense per-slot arrays
    entirely: at survey scale the empty/sub-threshold slots dominate
    (>90% of 134M slots at 4k), and every caller of the raw result set
    applies ``filter_by_likelihood(min_lh)`` immediately, so with
    ``compact_min_lh == min_lh`` the post-filter rows are identical to
    the dense assembly's (sigma-G clipping can still lower a kept row's
    final lh below the bound afterward — exactly as in the dense layout —
    so the caller's filter still applies).

    Returns ``(results, pool_tail_frac)`` — the second value is the sigma-G
    pool-boundary churn diagnostic (0.0 when no over-provisioned re-rank
    ran), which drives the auto-escalation loop in :func:`core_search`.
    ``warn_on_churn`` keeps the log warning for callers that do not
    escalate.
    """
    # With the default (single-device) gathers, re-score winners by
    # CANDIDATE INDEX: the (C, T) offset tables upload once (~13 MB at the
    # full default grid) instead of dense per-row (N, T) offsets per chunk
    # (~210 MB each through the tunnel — the dominant survey-tile cost,
    # see _gather_curves_idx). Callers that pass custom curves_fn/eval_fn
    # (the sharded path) keep the velocity-based contract.
    use_idx = curves_fn is None and eval_fn is None
    if curves_fn is None:
        curves_fn = _curves_and_stats
    if eval_fn is None:
        eval_fn = evaluate_trajectories

    timing = bool(os.environ.get("KB_TIMING"))
    t0 = time.perf_counter()
    top_lh, top_idx = _fetch_topk(top_lh, top_idx)  # (K', SH, SW) numpy
    if timing:
        logger.info(f"KB_TIMING assemble fetch_topk: {time.perf_counter() - t0:.2f}s")
        t0 = time.perf_counter()

    # Pixel-major layout: result[(i*SW + j)*K + k].
    kidx = np.transpose(top_idx, (1, 2, 0)).reshape(-1)  # (SH*SW*K',)
    klh = np.transpose(top_lh, (1, 2, 0)).reshape(-1)

    # The over-provisioned sigma-G re-rank needs the dense (n_pix, K')
    # pools; compaction then happens after it instead (below).
    compact_early = compact_min_lh is not None and not (do_sigmag and k_search > k)
    if compact_early:
        sel = np.nonzero((kidx >= 0) & (klh >= float(compact_min_lh)))[0]
        kidx = kidx[sel]
        klh = klh[sel]
        pix = sel // k_search
        xs_all = (pix % SW + x_min).astype(np.int32)
        ys_all = (pix // SW + y_min).astype(np.int32)
    else:
        jjg, iig = np.meshgrid(np.arange(SW), np.arange(SH))
        xs_all = np.repeat((jjg + x_min).reshape(-1), k_search).astype(np.int32)
        ys_all = np.repeat((iig + y_min).reshape(-1), k_search).astype(np.int32)

    filled = kidx >= 0
    vx_arr = np.zeros(len(kidx), dtype=np.float32)
    vy_arr = np.zeros(len(kidx), dtype=np.float32)
    vx_arr[filled] = np.asarray(vxs, dtype=np.float32)[kidx[filled]]
    vy_arr[filled] = np.asarray(vys, dtype=np.float32)[kidx[filled]]

    # Re-evaluate the winners exactly for flux / obs_count (and the sigma-G
    # clipped scores when enabled). Slots whose kernel lh already fails the
    # min_lh cut are skipped: every caller (stack_search.cpp:262-266
    # semantics) filters them out immediately after, so their flux/obs are
    # never observed — and at survey scale this cuts the winner re-scoring
    # from every (pixel, K) slot to just the survivors.
    flux = np.zeros(len(kidx), dtype=np.float32)
    obs = np.zeros(len(kidx), dtype=np.int32)
    lh = klh.copy()
    filled &= klh >= float(min_lh)
    if timing:
        logger.info(
            f"KB_TIMING assemble host-compact: {time.perf_counter() - t0:.2f}s "
            f"({int(filled.sum())} rows to re-score)"
        )
        t0 = time.perf_counter()
    if filled.any():
        f_idx = np.nonzero(filled)[0]
        if use_idx:
            dxs_t, dys_t = trajectory_offsets(vxs, vys, times)
            dxs_tab, dys_tab = jnp.asarray(dxs_t), jnp.asarray(dys_t)
            # 524288-row chunks: ~630 MB of gather buffers (inside the HBM
            # budget next to the packed stream) and half the dispatch
            # round-trips of the former 262144 at survey keep rates.
            res = _eval_by_index_chunked(
                psi, phi, valid, xs_all[f_idx], ys_all[f_idx], kidx[f_idx],
                dxs_tab, dys_tab, 524288, do_sigmag, len(np.asarray(times)),
            )
            if do_sigmag:
                psi_v, phi_v, okg, stats = res
            else:
                stats = res
        elif do_sigmag:
            # One gather serves the stats and the clipped re-scoring.
            psi_v, phi_v, okg, stats = curves_fn(
                psi, phi, valid, times, xs_all[f_idx], ys_all[f_idx], vx_arr[f_idx], vy_arr[f_idx]
            )
        else:
            stats = eval_fn(
                psi, phi, valid, times, xs_all[f_idx], ys_all[f_idx], vx_arr[f_idx], vy_arr[f_idx]
            )
        flux[f_idx] = stats["flux"]
        obs[f_idx] = stats["obs_count"]
        # Use the kernel-pass lh (authoritative for ranking); fall back to the
        # recomputed value for slots the kernel marked as unscored.
        if do_sigmag:
            new_lh, new_flux, _, _ = clipped_sigmag_scores(psi_v, phi_v, okg, sgl_L, sgl_H, sigmag_coeff)
            # Gates before clipping (kernels.cu:201-203): clipping only
            # applies where obs/lh passed; otherwise score is unchanged.
            passed = (stats["obs_count"] >= min_obs) & (stats["lh"] >= min_lh)
            lh[f_idx] = np.where(passed, new_lh, lh[f_idx])
            flux[f_idx] = np.where(passed, new_flux, flux[f_idx])
            # Post-clip insertion gate (kernels.cu:318-320).
            drop = passed & (new_lh < min_lh)
            lh[f_idx] = np.where(drop, -FLT_MAX, lh[f_idx])

    results = {
        "x": xs_all,
        "y": ys_all,
        "vx": vx_arr,
        "vy": vy_arr,
        "lh": lh.astype(np.float32),
        "flux": flux,
        "obs_count": obs,
    }
    if timing:
        logger.info(f"KB_TIMING assemble rescore: {time.perf_counter() - t0:.2f}s")

    tail_frac = 0.0
    if do_sigmag and k_search > k:
        # Re-rank within each pixel by clipped lh and keep only K per pixel.
        n_pix = SH * SW
        lh_px = results["lh"].reshape(n_pix, k_search)
        order = np.argsort(-lh_px, axis=1, kind="stable")[:, :k]
        if warn_on_churn:
            tail_frac = _warn_on_pool_tail_churn(order, lh_px, k, k_search)
        else:
            tail_frac = sigmag_pool_tail_fraction(order, lh_px, k, k_search)
        kept_real = np.take_along_axis(lh_px, order, axis=1) > -FLT_MAX
        flat = (np.arange(n_pix)[:, None] * k_search + order).reshape(-1)
        results = {key: val[flat] for key, val in results.items()}
        if refine_fn is not None:
            # Re-score a pixel exactly when the pool boundary is suspect:
            # (a) the clipped re-rank CHANGED the kept top-K membership
            #     (a kept slot from outside the unclipped top-K), or
            # (b) boundary inversion: the pool is full and the kept K-th
            #     clipped lh fell BELOW the pool's minimum unclipped lh —
            #     an out-of-pool candidate (unclipped lh just under the
            #     pool floor) could clip upward past the kept set.
            membership_changed = ((order >= k) & kept_real).any(axis=1)
            klh_px = klh.reshape(n_pix, k_search)
            real_slots = klh_px > -FLT_MAX / 2
            pool_full = real_slots.all(axis=1)
            pool_floor = np.where(real_slots, klh_px, FLT_MAX).min(axis=1)
            kept_clipped = np.take_along_axis(lh_px, order, axis=1)
            kept_floor = np.where(kept_real, kept_clipped, FLT_MAX).min(axis=1)
            inverted = pool_full & (kept_floor < pool_floor)
            flagged = np.nonzero(membership_changed | inverted)[0]
            if len(flagged):
                results = refine_fn(results, flagged)

    if compact_min_lh is not None and not compact_early:
        keepm = results["lh"] >= float(compact_min_lh)
        results = {key: val[keepm] for key, val in results.items()}

    return results, tail_frac


def sigmag_pool_tail_fraction(order, lh_px, k, k_search):
    """Diagnostic for the over-provisioned sigma-G mode: the fraction of
    kept rows that clipping promoted out of the pool's bottom quartile.

    The pool holds the top ``k_search`` candidates per pixel by UNCLIPPED
    lh (slot index = unclipped rank); a kept row whose slot sits in the
    pool's tail means clipping re-ordered aggressively there — and a
    candidate just OUTSIDE the pool could plausibly have been promoted
    past the boundary too (the documented approximation;
    docs/STATUS.md's measured miss rates rise with exactly this churn).
    """
    kept = order[:, :k]
    real = np.take_along_axis(lh_px, kept, axis=1) > -FLT_MAX
    n_real = int(real.sum())
    if n_real == 0:
        return 0.0
    tail_start = k_search - max(k_search // 4, 1)
    return float(((kept >= tail_start) & real).sum()) / n_real


def _warn_on_pool_tail_churn(order, lh_px, k, k_search, threshold=0.01):
    frac = sigmag_pool_tail_fraction(order, lh_px, k, k_search)
    if frac > threshold:
        import logging

        logging.getLogger("kbmod.search").warning(
            "sigma-G re-rank promoted %.2f%% of kept rows from the bottom "
            "quartile of the %d-deep unclipped pool — the pool boundary is "
            "active and results may miss clipped-promoted candidates. "
            "Consider raising KB_SIGMAG_TOPK_FACTOR or KB_SIGMAG_MODE=exact "
            "(miss-rate table: docs/STATUS.md).",
            100.0 * frac,
            k_search,
        )
    return frac


class _SigmaGEscalation:
    """Gate for the sigma-G pixel-exact refinement pass.

    The default sigma-G mode ranks each pixel's top ``over*K`` candidates
    by UNCLIPPED lh and re-ranks that pool by clipped lh — an approximation
    that can miss candidates clipping would promote past the pool boundary
    (docs/STATUS.md's miss-rate table). When enabled (the default;
    KB_SIGMAG_AUTO=0 restores warn-only behavior), any pixel whose kept
    top-K membership was CHANGED by the clipped re-rank is re-scored
    against every candidate with the reference-exact clipping
    (:func:`exact_refine_pixels`) — clipping demonstrably mattered there,
    so the boundary is suspect. Cost scales with the fraction of flagged
    pixels (~the churn diagnostic), not with the frame.

    Residual gap, documented: a pixel where clipping did not reorder the
    kept K at all is never flagged, yet an out-of-pool candidate could
    still clip upward past it (requires a promotion with zero in-pool
    churn). KB_SIGMAG_MODE=exact remains the sound fallback.
    """

    def __init__(self, do_sigmag, sigmag_mode, over, k, num_cand):
        self.enabled = (
            bool(do_sigmag)
            and sigmag_mode != "exact"
            and int(over) * int(k) < int(num_cand)  # full pool is already exact
            and os.environ.get("KB_SIGMAG_AUTO", "1") != "0"
        )


def exact_refine_pixels(
    results, pix_idx, *, psi, phi, valid, times, vxs, vys, k,
    min_obs, min_lh, sgl_L, sgl_H, sigmag_coeff, curves_fn=None,
    max_chunk=1 << 20,
):
    """Re-score the flagged pixels against EVERY candidate with the
    reference-exact clipped gating (kernels.cu:184-241 semantics: clip when
    the unclipped result passes min_obs/min_lh, insert by the final lh),
    replacing their K rows in the pixel-major ``results`` dict.

    ``pix_idx`` are flat pixel indices into the (SH*SW, K) row layout.
    ``curves_fn`` defaults to the single-device gather; the sharded path
    passes its mesh-sharded version.
    """
    if curves_fn is None:
        curves_fn = _curves_and_stats
    vxs = np.asarray(vxs, dtype=np.float32).reshape(-1)
    vys = np.asarray(vys, dtype=np.float32).reshape(-1)
    C = len(vxs)
    xs_pix = results["x"].reshape(-1, k)[pix_idx, 0]
    ys_pix = results["y"].reshape(-1, k)[pix_idx, 0]

    import logging

    logging.getLogger("kbmod.search").info(
        "sigma-G pool boundary active on %d pixels — re-scoring them "
        "against all %d candidates with exact clipping.", len(pix_idx), C,
    )

    pix_chunk = max(1, max_chunk // C)
    for lo in range(0, len(pix_idx), pix_chunk):
        chunk = pix_idx[lo : lo + pix_chunk]
        P = len(chunk)
        xs = np.repeat(xs_pix[lo : lo + pix_chunk], C)
        ys = np.repeat(ys_pix[lo : lo + pix_chunk], C)
        vx = np.tile(vxs, P)
        vy = np.tile(vys, P)
        psi_v, phi_v, ok, stats = curves_fn(psi, phi, valid, times, xs, ys, vx, vy)
        clipped_lh, clipped_flux, _, _ = clipped_sigmag_scores(
            psi_v, phi_v, ok, sgl_L, sgl_H, sigmag_coeff
        )
        passed = (stats["obs_count"] >= min_obs) & (stats["lh"] >= min_lh)
        final_lh = np.where(passed, clipped_lh, stats["lh"])
        final_flux = np.where(passed, clipped_flux, stats["flux"])
        insertable = (stats["obs_count"] >= min_obs) & (final_lh >= min_lh)
        final_lh = np.where(insertable, final_lh, -FLT_MAX).reshape(P, C)
        # Top-K by (clipped lh desc, candidate index asc) — the kernels'
        # tie order.
        order = np.argsort(-final_lh, axis=1, kind="stable")[:, :k]
        top_lh = np.take_along_axis(final_lh, order, axis=1)
        real = top_lh > -FLT_MAX
        rows = (np.asarray(chunk)[:, None] * k + np.arange(k)[None, :]).reshape(-1)
        flat_order = (np.arange(P)[:, None] * C + order).reshape(-1)
        results["lh"][rows] = top_lh.reshape(-1)
        results["flux"][rows] = np.where(real, final_flux[flat_order].reshape(P, k), 0.0).reshape(-1)
        results["vx"][rows] = np.where(real, vxs[order], 0.0).reshape(-1)
        results["vy"][rows] = np.where(real, vys[order], 0.0).reshape(-1)
        results["obs_count"][rows] = np.where(
            real, stats["obs_count"].reshape(P, C)[np.arange(P)[:, None], order], 0
        ).reshape(-1)
    return results
