"""Pallas TPU kernel for the shift-and-accumulate trajectory search.

The XLA formulation (ops/search.py) materializes the psi/phi/obs
accumulators in HBM every time step — 3x more HBM traffic than the
inputs themselves. These kernels keep the accumulators, and the per-pixel
top-K lists, resident in VMEM across the whole time loop and candidate
scan; HBM traffic drops to just the shifted input reads (ring-buffered
DMAs).

Two variants share the structure: the float kernel streams psi/phi/valid
planes; the encoded kernel streams uint8/uint16 quantized codes packed
into one interleaved int32 word stream with in-register decode and
integer accumulation (2-4 bytes per sample instead of 9 — the direct
throughput multiplier for an HBM-bound kernel, and the layout that fits
survey-scale stacks in HBM).

Work decomposition
------------------
grid = (row_tiles, candidates); the candidate axis iterates innermost so
the output top-K block for a row tile stays in VMEM while every candidate
streams through. Per (tile, candidate, time): the row shift (t, dy) is a
row-aligned 2D DMA from the (rows, W2) zero-padded stack; the column
shift dx is applied in-register with a dynamic lane rotate
(pltpu.roll). Out-of-bounds and masked contributions are removed with
iota masks plus the validity plane — identical semantics to the XLA path.
Per-candidate per-time offsets ride in one scalar-prefetched SMEM table
(rows|ox|oy packed: Mosaic lane-pads SMEM arrays to 128 columns, so the
padding is paid once); candidate sets whose table exceeds the SMEM budget
are processed in chunks joined by a sort-free stable top-K merge.

The kernel reproduces the reference CUDA searchFilterImages
(kernels.cu:252-332): insertion gated on min_obs (and min_lh when the
sigma-G prefilter is on), lh = -1 for phi_sum <= 0, empty top-K slots at
-FLT_MAX, per-pixel sorted insertion.
"""

import functools
import os
import typing

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = float(np.finfo(np.float32).max)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# SMEM budget (bytes) for the scalar-prefetched per-candidate offset table
# (rows|ox|oy packed as one (C, 3T) int32 array; SMEM is ~1MB total and
# Mosaic lane-pads SMEM arrays to 128 columns, so padding is paid once).
# Candidate sets whose table exceeds this are processed in chunks with a
# stable top-K merge between chunks — semantics identical to one pass,
# since within-chunk rank-insert and the chunk-ordered stable sort both
# keep arrival order on exact ties.
_SMEM_TABLE_BYTES = 384 * 1024


def _round_up_int(x, m):
    return ((x + m - 1) // m) * m


def _cand_chunk(C, T):
    per_cand = _round_up_int(3 * int(T), 128) * 4
    return max(8, min(int(C), _SMEM_TABLE_BYTES // per_cand))


def _origins(y_min, x_min, y_origin, x_origin):
    """Search-window origins for the offset tables. The static y_min/x_min
    define the output geometry; traced overrides (pixels-mode sharding
    passes a per-shard row origin derived from the mesh axis index) shift
    where the window reads without retracing."""
    oy0 = jnp.int32(y_min) if y_origin is None else jnp.asarray(y_origin, jnp.int32)
    ox0 = jnp.int32(x_min) if x_origin is None else jnp.asarray(x_origin, jnp.int32)
    return oy0, ox0


def _cok_table(C, cand_valid, cand_offset, chunk_offset=0):
    """(C, 2) int32 scalar-prefetch table: [validity, global candidate
    index]. Carrying the index as int32 keeps it exact for any candidate
    count (an f32 scalar is exact only to 2^24). cand_offset may be a
    traced scalar (the sharded path derives it from the mesh axis index);
    chunk_offset is always a Python int."""
    ok = (
        jnp.ones((C,), dtype=jnp.int32)
        if cand_valid is None
        else cand_valid.astype(jnp.int32).reshape(C)
    )
    idx = jnp.arange(chunk_offset, chunk_offset + C, dtype=jnp.int32)
    if not (isinstance(cand_offset, int) and cand_offset == 0):
        idx = idx + jnp.asarray(cand_offset, dtype=jnp.int32)
    return jnp.stack([ok, idx], axis=1)


def _lane_roll_left(x, amt, width):
    """Cyclic left-roll along the lane axis by a traced ``amt`` of either
    sign. Mosaic's dynamic lane rotate silently mis-rotates NEGATIVE
    amounts when the lane count is not a power of two (positive amounts
    are exact for any multiple of 128) — normalize to the equivalent
    non-negative amount. ``width`` is x.shape[1] (static)."""
    a = lax.rem(lax.rem(-amt, width) + width, width)
    return pltpu.roll(x, a, 1)


def _merge_pair(lh_a, idx_a, lh_b, idx_b, K):
    """Per-pixel merge of two descending-sorted top-K maps into the
    canonical (lh desc, candidate-idx asc) order.

    Sort-free: both inputs are already sorted, so each element's merged
    rank is its own index plus the count of dominating elements in the
    other list. Exact likelihood ties rank by ascending candidate index —
    identical to arrival order when candidates are processed in index
    order (every ungrouped path), and order-independent for the grouped
    kernel, whose processing order is a velocity sort. K^2 elementwise
    compares beat a (2K, H, W) sort by a wide margin on TPU.
    """
    ki = jnp.arange(K, dtype=jnp.int32)
    b_beats_a = (lh_b[None] > lh_a[:, None]) | (
        (lh_b[None] == lh_a[:, None]) & (idx_b[None] < idx_a[:, None])
    )
    rank_a = ki[:, None, None] + jnp.sum(b_beats_a, axis=1, dtype=jnp.int32)
    rank_b = ki[:, None, None] + jnp.sum(~b_beats_a.swapaxes(0, 1), axis=1, dtype=jnp.int32)
    # Scatter-by-onehot: merged ranks are a permutation of 0..2K-1, so each
    # output slot r < K matches exactly one source element.
    hit_a = rank_a[None] == ki[:, None, None, None]  # (r, i, SH, SW)
    hit_b = rank_b[None] == ki[:, None, None, None]
    out_lh = jnp.sum(jnp.where(hit_a, lh_a[None], 0.0), axis=1) + jnp.sum(
        jnp.where(hit_b, lh_b[None], 0.0), axis=1
    )
    out_idx = jnp.sum(jnp.where(hit_a, idx_a[None], 0), axis=1) + jnp.sum(
        jnp.where(hit_b, idx_b[None], 0), axis=1
    )
    return out_lh, out_idx


def _merge_pair_banded(lh_a, idx_a, lh_b, idx_b, K, max_elems=32 * 1024 * 1024):
    """Row-banded :func:`_merge_pair`: the sort-free merge materializes
    (K, K, SH, SW) compare tensors, which at survey scale (4k x 4k frames,
    hundreds of table chunks) exceeds HBM. A fori_loop merges one row band
    at a time (intermediates bounded to ``max_elems`` elements) straight
    into the output via dynamic_update_slice — no padded/transposed input
    copies — producing identical output. A ragged final band is merged
    separately so the loop bands stay static-shaped."""
    K_, SH, SW = lh_a.shape
    band = max(8, min(SH, max_elems // max(1, K * K * SW)))
    nb_full = SH // band
    if nb_full * band == SH and nb_full <= 1:
        return _merge_pair(lh_a, idx_a, lh_b, idx_b, K)

    def body(i, carry):
        out_lh, out_idx = carry
        r0 = i * band

        def sl(x):
            return lax.dynamic_slice_in_dim(x, r0, band, axis=1)

        ml, mi = _merge_pair(sl(lh_a), sl(idx_a), sl(lh_b), sl(idx_b), K)
        return (
            lax.dynamic_update_slice_in_dim(out_lh, ml, r0, axis=1),
            lax.dynamic_update_slice_in_dim(out_idx, mi, r0, axis=1),
        )

    out_lh, out_idx = lax.fori_loop(
        0, nb_full, body, (jnp.zeros_like(lh_a), jnp.zeros_like(idx_a))
    )
    tail = SH - nb_full * band
    if tail:
        ml, mi = _merge_pair(
            lh_a[:, -tail:], idx_a[:, -tail:], lh_b[:, -tail:], idx_b[:, -tail:], K
        )
        out_lh = lax.dynamic_update_slice_in_dim(out_lh, ml, SH - tail, axis=1)
        out_idx = lax.dynamic_update_slice_in_dim(out_idx, mi, SH - tail, axis=1)
    return out_lh, out_idx


def _search_kernel(
    # Scalar-prefetch arrays (SMEM, full arrays indexed by the grid)
    tbl_ref,  # (C, 3T) int32: [source row | x offset | y offset] per time
    cok_ref,  # (C, 2) int32: [validity (padding = 0), global candidate index]
    scalars_ref,  # (4,) float32: [min_obs, min_lh, unused, total_rows]
    # HBM inputs: zero-padded stacks shaped (rows, W2)
    psi_hbm,
    phi_hbm,
    val_hbm,
    # outputs (VMEM blocks, revisited across the candidate axis)
    top_lh_ref,  # (K, TH, SW)
    top_idx_ref,  # (K, TH, SW)
    # scratch
    psi_buf,  # (2, TH, W2) f32
    phi_buf,  # (2, TH, W2) f32
    val_buf,  # (2, TH, W2) u8
    sems,  # DMA sems (2, 3)
    *,
    T,
    H,
    W,
    W2,
    TH,
    SW,
    K,
    gate_min_obs,
    gate_min_lh,
    has_masked,
):
    ty = pl.program_id(0)
    c = pl.program_id(1)
    tile_row0 = ty * TH

    @pl.when(c == 0)
    def _init_topk():
        top_lh_ref[...] = jnp.full((K, TH, SW), -FLT_MAX, dtype=jnp.float32)
        top_idx_ref[...] = jnp.full((K, TH, SW), -1, dtype=jnp.int32)

    min_obs = scalars_ref[0]
    min_lh = scalars_ref[1]
    total_rows = scalars_ref[3].astype(jnp.int32)

    TB = TH + 8  # DMA block: TH rows + sublane-alignment slack

    def row_for(t):
        """Sublane-aligned DMA start and the residual shift."""
        r = jnp.clip(tbl_ref[c, t] + tile_row0, 0, total_rows - TB)
        r8 = pl.multiple_of((r // 8) * 8, 8)
        return r8, r - r8

    def dma(slot, t):
        r8, _ = row_for(t)
        copies = [
            pltpu.make_async_copy(psi_hbm.at[pl.ds(r8, TB), :], psi_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(phi_hbm.at[pl.ds(r8, TB), :], phi_buf.at[slot], sems.at[slot, 1]),
        ]
        if has_masked:
            copies.append(
                pltpu.make_async_copy(val_hbm.at[pl.ds(r8, TB), :], val_buf.at[slot], sems.at[slot, 2])
            )
        return copies

    def dma_start(slot, t):
        for cp in dma(slot, t):
            cp.start()

    def dma_wait(slot, t):
        for cp in dma(slot, t):
            cp.wait()

    ii = lax.broadcasted_iota(jnp.int32, (TH, SW), 0)
    jj = lax.broadcasted_iota(jnp.int32, (TH, SW), 1)

    def shift_tile(tile, rshift, ox):
        """Rows [rshift, rshift+TH) and columns [ox, ox+SW) of the
        (TB, W2) tile via dynamic sublane/lane rotates (wrapped positions
        are masked by the caller). Rotate amounts are kept non-negative:
        hardware dynamic rotates mishandle negative shifts on the sublane
        dimension."""
        tile = pltpu.roll(tile, TB - rshift, 0)[:TH]
        return _lane_roll_left(tile, ox, W2)[:, :SW]

    def run(acc_psi, acc_phi, acc_obs):
        acc_psi[...] = jnp.zeros((TH, SW), dtype=jnp.float32)
        acc_phi[...] = jnp.zeros((TH, SW), dtype=jnp.float32)
        acc_obs[...] = jnp.zeros((TH, SW), dtype=jnp.float32)

        dma_start(0, 0)

        def tbody(t, _):
            slot = t % 2

            @pl.when(t + 1 < T)
            def _prefetch():
                dma_start((t + 1) % 2, t + 1)

            dma_wait(slot, t)

            oy = tbl_ref[c, 2 * T + t] + tile_row0
            ox = tbl_ref[c, T + t]
            _, rshift = row_for(t)
            ps = shift_tile(psi_buf[slot], rshift, ox)
            fs = shift_tile(phi_buf[slot], rshift, ox)
            # In-bounds masks: row i valid iff 0 <= oy + i < H; col j valid
            # iff 0 <= ox + j < W. (These also kill lane-rotate wrap-around:
            # wrapped positions have intended source cols outside [0, W).)
            m = (ii >= -oy) & (ii < H - oy) & (jj >= -ox) & (jj < W - ox)
            if has_masked:
                # Widen before the rotate: Mosaic's dynamic_rotate has no
                # 8-bit support.
                m = m & (shift_tile(val_buf[slot].astype(jnp.int32), rshift, ox) != 0)
            mf = jnp.where(m, jnp.float32(1.0), jnp.float32(0.0))
            acc_psi[...] = acc_psi[...] + ps * mf
            acc_phi[...] = acc_phi[...] + fs * mf
            acc_obs[...] = acc_obs[...] + mf
            return 0

        lax.fori_loop(0, T, tbody, 0)

        phi_sum = acc_phi[...]
        psi_sum = acc_psi[...]
        obs = acc_obs[...]
        lh = jnp.where(phi_sum > 0, psi_sum * lax.rsqrt(jnp.maximum(phi_sum, 1e-30)), -1.0)

        ok = jnp.full((TH, SW), cok_ref[c, 0] != 0)
        if gate_min_obs:
            ok &= obs >= min_obs
        if gate_min_lh:
            ok &= lh >= min_lh
        new = jnp.where(ok, lh, -jnp.inf)
        # Global candidate index rides in the int32 table (exact for any C,
        # unlike an f32 scalar which is exact only to 2^24).
        newi = jnp.full((TH, SW), cok_ref[c, 1], dtype=jnp.int32)
        # Sorted K-slot insertion as a vectorized rank-insert: the new entry
        # lands at rank p = #(existing >= new); entries below shift down one
        # slot. Likelihoods match the reference bubble (kernels.cu:322-330)
        # exactly; the only divergence is the ordering of *exactly equal*
        # likelihoods (the bubble reverses equal pairs during displacement
        # cascades; the rank-insert preserves arrival order).
        top = top_lh_ref[...]
        topi = top_idx_ref[...]
        p = jnp.sum((top >= new[None]).astype(jnp.int32), axis=0)  # (TH, SW)
        kidx = lax.broadcasted_iota(jnp.int32, (K, TH, SW), 0)
        # K == 1 has no slots to displace (and top[:-1] would be a
        # zero-size vector, which Mosaic rejects).
        shifted = top if K == 1 else jnp.concatenate([top[:1], top[:-1]], axis=0)
        shiftedi = topi if K == 1 else jnp.concatenate([topi[:1], topi[:-1]], axis=0)
        at_p = kidx == p[None]
        below = kidx > p[None]
        top_lh_ref[...] = jnp.where(at_p, new[None], jnp.where(below, shifted, top))
        top_idx_ref[...] = jnp.where(at_p, newi[None], jnp.where(below, shiftedi, topi))

    pl.run_scoped(
        run,
        acc_psi=pltpu.VMEM((TH, SW), jnp.float32),
        acc_phi=pltpu.VMEM((TH, SW), jnp.float32),
        acc_obs=pltpu.VMEM((TH, SW), jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "x_min", "x_max", "y_min", "y_max", "k_results",
        "gate_min_obs", "gate_min_lh", "has_masked", "row_tile", "interpret",
    ),
)
def search_topk_pallas(
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
    has_masked=True,
    row_tile=None,
    interpret=False,
    cand_offset=0,
    cand_valid=None,
    x_origin=None,
    y_origin=None,
):
    """Pallas version of ops.search.search_topk_shift — identical outputs.

    psi, phi: (T, H, W) float32 zero-filled; valid: (T, H, W) uint8.
    dxs, dys: (C, T) int32. Returns (top_lh, top_idx) as (K, SH, SW).
    """
    T, H, W = psi.shape
    C = dxs.shape[0]
    SH = y_max - y_min
    SW = x_max - x_min
    K = int(k_results)

    W2 = _round_up(max(W, SW), 128)
    if row_tile is None:
        # Pick the largest row tile fitting the VMEM budget: top-K output
        # blocks (2 * K * TH * SW * 4B) + double-buffered DMA slabs
        # (2 * (TH+8) * W2 * 9B) + accumulators (3 * TH * SW * 4B).
        # Mosaic double-buffers the revisited output blocks, so stay well
        # under the 16MB scoped-vmem limit.
        budget = 7 * 1024 * 1024
        per_row = 2 * K * SW * 4 + 2 * W2 * 9 + 3 * SW * 4
        row_tile = max(8, min(_round_up(SH, 8), (budget // per_row) // 8 * 8, 256))
    TH = int(row_tile)
    n_ty = pl.cdiv(SH, TH)
    SH_pad = n_ty * TH

    # Row padding: any (t, dy, tile) combination with a partially-valid
    # window must land inside the padded stack (plus sublane slack).
    pad_rows = _round_up(SH_pad + H + 16, 8)
    total_rows = T * H + 2 * pad_rows

    def to_rows(a, dtype):
        a = a.astype(dtype)
        if W2 > W:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, W2 - W)))
        z = jnp.zeros((pad_rows, W2), dtype=dtype)
        return jnp.concatenate([z, a.reshape(T * H, W2), z], axis=0)

    psi_r = to_rows(psi, jnp.float32)
    phi_r = to_rows(phi, jnp.float32)
    val_r = to_rows(valid, jnp.uint8) if has_masked else jnp.zeros((8, W2), jnp.uint8)

    # Per-candidate per-time scalars.
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    oy0, ox0 = _origins(y_min, x_min, y_origin, x_origin)
    oy = oy0 + dys.astype(jnp.int32)  # (C, T)
    ox = ox0 + dxs.astype(jnp.int32)
    rows = pad_rows + t_idx * H + oy  # source row at tile row 0

    cok = _cok_table(C, cand_valid, cand_offset)

    kernel = functools.partial(
        _search_kernel,
        T=T, H=H, W=W, W2=W2, TH=TH, SW=SW, K=K,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, has_masked=has_masked,
    )

    CC = _cand_chunk(C, T)
    tbl = jnp.concatenate([rows, ox, oy], axis=1)  # (C, 3T)

    def call_chunk(tbl_c, cok_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_ty, tbl_c.shape[0]),
            in_specs=[
                # Force HBM: under ANY the compiler may pick VMEM for small
                # stacks, where dynamic row slices need sublane alignment.
                pl.BlockSpec(memory_space=pltpu.HBM),  # psi rows
                pl.BlockSpec(memory_space=pltpu.HBM),  # phi rows
                pl.BlockSpec(memory_space=pltpu.HBM),  # valid rows
            ],
            out_specs=(
                pl.BlockSpec((K, TH, SW), lambda ty, c, *prefetch: (0, ty, 0)),
                pl.BlockSpec((K, TH, SW), lambda ty, c, *prefetch: (0, ty, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, TH + 8, W2), jnp.float32),
                pltpu.VMEM((2, TH + 8, W2), jnp.float32),
                pltpu.VMEM((2, TH + 8, W2), jnp.uint8),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )
        bytes_per_step = TH * W2 * (9 if has_masked else 8)
        cost = pl.CostEstimate(
            flops=2 * tbl_c.shape[0] * T * SH_pad * SW,
            bytes_accessed=tbl_c.shape[0] * T * bytes_per_step * n_ty,
            transcendentals=tbl_c.shape[0] * SH_pad * SW,
        )
        scalars = jnp.stack(
            [
                jnp.float32(min_obs),
                jnp.float32(min_lh),
                jnp.float32(0.0),
                jnp.float32(total_rows),
            ]
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((K, SH_pad, SW), jnp.float32),
                jax.ShapeDtypeStruct((K, SH_pad, SW), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(tbl_c, cok_c, scalars, psi_r, phi_r, val_r)

    if C <= CC:
        top_lh, top_idx = call_chunk(tbl, cok)
    else:
        # Candidate tables exceed the SMEM budget: pad to a whole number of
        # chunks (padding marked invalid) and merge per-pixel top-K maps
        # chunk by chunk. The cok table carries global indices, so chunks
        # need no offset bookkeeping.
        n_chunks = pl.cdiv(C, CC)
        pad = n_chunks * CC - C
        tbl_p = jnp.pad(tbl, ((0, pad), (0, 0)))
        cok_p = jnp.pad(cok, ((0, pad), (0, 0)))
        top_lh = top_idx = None
        for ci in range(n_chunks):
            sl = slice(ci * CC, (ci + 1) * CC)
            lh_c, idx_c = call_chunk(tbl_p[sl], cok_p[sl])
            if top_lh is None:
                top_lh, top_idx = lh_c, idx_c
            else:
                top_lh, top_idx = _merge_pair_banded(top_lh, top_idx, lh_c, idx_c, K)

    return top_lh[:, :SH, :], top_idx[:, :SH, :]


def _search_kernel_encoded(
    tbl_ref,  # (C, 3T) int32: [source word-row | x offset | y offset] per time
    cok_ref,  # (C, 2) int32: [validity, global candidate index]
    scalars_ref,  # (8,) f32: [min_obs, min_lh, unused, total_rows,
    #              psi_min, psi_scale, phi_min, phi_scale]
    words_hbm,  # (rows, W4) int32: interleaved psi/phi codes
    *refs,  # COLS lh outputs, COLS idx outputs, then scratch
    T,
    H,
    W,
    W4,
    COLS,
    BITS,
    TH,
    SW4,
    K,
    DD,
    gate_min_obs,
    gate_min_lh,
    bounds_masks=True,
):
    """Quantized-codes variant of _search_kernel.

    The uint8/uint16 psi/phi codes (0 = masked; value = (code-1)*scale+min,
    the reference encoding, psi_phi_array_ds.h:40-47) ride in ONE stream of
    int32 words, each word interleaving psi and phi for COLS adjacent image
    columns (u8: [psi_j, phi_j, psi_j1, phi_j1]; u16: [psi_j, phi_j]). The
    hot-loop DMAs move 2-4 bytes per (psi, phi) sample instead of 9 (the
    float path with its validity plane) — a direct throughput multiplier
    for this HBM-bound kernel, and the layout that fits survey-scale
    stacks in HBM. The single interleaved stream also needs one dynamic
    lane roll per (time, column-class) instead of two per stream, which
    matters because at u8 traffic the kernel becomes VPU-issue-bound.

    Columns are processed in COLS interleaved classes (output column
    j = COLS*w + k lives in class k at word w). For a column shift ox the
    source of class k is class (k+ox) mod COLS rolled by (k+ox)//COLS
    words — uniform over the tile, so each class costs one roll + two
    scalar shift/mask extracts per time step. Outputs stay class-packed;
    the host wrapper interleaves them back.
    """
    out_lh = refs[:COLS]
    out_idx = refs[COLS : 2 * COLS]
    word_buf, sems = refs[2 * COLS :]

    ty = pl.program_id(0)
    c = pl.program_id(1)
    tile_row0 = ty * TH
    CODE_MASK = (1 << BITS) - 1

    @pl.when(c == 0)
    def _init_topk():
        for k in range(COLS):
            out_lh[k][...] = jnp.full((K, TH, SW4), -FLT_MAX, dtype=jnp.float32)
            out_idx[k][...] = jnp.full((K, TH, SW4), -1, dtype=jnp.int32)

    min_obs = scalars_ref[0]
    min_lh = scalars_ref[1]
    total_rows = scalars_ref[3].astype(jnp.int32)
    psi_min = scalars_ref[4]
    psi_scale = scalars_ref[5]
    phi_min = scalars_ref[6]
    phi_scale = scalars_ref[7]

    TB = TH + 8

    def row_for(t):
        r = jnp.clip(tbl_ref[c, t] + tile_row0, 0, total_rows - TB)
        r8 = pl.multiple_of((r // 8) * 8, 8)
        return r8, r - r8

    def dma(slot, t):
        r8, _ = row_for(t)
        return pltpu.make_async_copy(
            words_hbm.at[pl.ds(r8, TB), :], word_buf.at[slot], sems.at[slot]
        )

    ii = lax.broadcasted_iota(jnp.int32, (TH, SW4), 0)
    jw = lax.broadcasted_iota(jnp.int32, (TH, SW4), 1)

    def run(acc_psi, acc_phi, acc_obs):
        # Integer code sums: psi_val = (code-1)*scale + min is affine in the
        # code, so Σ over valid samples decodes once per pixel after the T
        # loop (Σpsi = scale*Σcode + (min-scale)*obs) — the hot loop is pure
        # int32 select/add, which is what the VPU-bound kernel needs. Code
        # sums stay far below int32 range (T * 65535).
        acc_psi[...] = jnp.zeros((COLS, TH, SW4), dtype=jnp.int32)
        acc_phi[...] = jnp.zeros((COLS, TH, SW4), dtype=jnp.int32)
        acc_obs[...] = jnp.zeros((COLS, TH, SW4), dtype=jnp.int32)

        # Ring-buffered DMAs DD deep: per-step tiles are small, so the DMA
        # issue latency (not bandwidth) is what double-buffering exposes.
        for d in range(DD - 1):
            dma(d, d).start()

        def tbody(t, _):
            slot = t % DD

            @pl.when(t + DD - 1 < T)
            def _prefetch():
                dma((t + DD - 1) % DD, t + DD - 1).start()

            dma(slot, t).wait()

            oy = tbl_ref[c, 2 * T + t] + tile_row0
            ox = tbl_ref[c, T + t]
            _, rshift = row_for(t)
            # Row shift once per step (non-negative sublane rotate).
            pw = pltpu.roll(word_buf[slot], TB - rshift, 0)[:TH]
            row_ok = (ii >= -oy) & (ii < H - oy)
            for k in range(COLS):
                # Source class/word-shift for output class k (floor-mod for
                # negative ox; the difference is an exact COLS multiple so
                # truncating division equals floor).
                if COLS == 1:
                    wk = _lane_roll_left(pw, ox, W4)[:, :SW4]
                    shift = 0
                else:
                    sk = lax.rem(lax.rem(k + ox, COLS) + COLS, COLS)
                    dw = (k + ox - sk) // COLS
                    wk = _lane_roll_left(pw, dw, W4)[:, :SW4]
                    shift = sk * (2 * BITS)
                pc = lax.shift_right_logical(wk, shift) & CODE_MASK
                fc = lax.shift_right_logical(wk, shift + BITS) & CODE_MASK
                if bounds_masks:
                    j = COLS * jw + k  # output column in search space
                    m = row_ok & (j >= -ox) & (j < W - ox) & (pc > 0) & (fc > 0)
                else:
                    # Guard-padded stream: out-of-bounds reads land on zero
                    # words, and zero codes self-exclude — code validity is
                    # the only mask needed.
                    m = (pc > 0) & (fc > 0)
                zero = jnp.int32(0)
                acc_psi[k] = acc_psi[k] + jnp.where(m, pc, zero)
                acc_phi[k] = acc_phi[k] + jnp.where(m, fc, zero)
                acc_obs[k] = acc_obs[k] + jnp.where(m, jnp.int32(1), zero)
            return 0

        lax.fori_loop(0, T, tbody, 0)

        for k in range(COLS):
            obs = acc_obs[k].astype(jnp.float32)
            psi_sum = psi_scale * acc_psi[k].astype(jnp.float32) + (psi_min - psi_scale) * obs
            phi_sum = phi_scale * acc_phi[k].astype(jnp.float32) + (phi_min - phi_scale) * obs
            lh = jnp.where(phi_sum > 0, psi_sum * lax.rsqrt(jnp.maximum(phi_sum, 1e-30)), -1.0)
            ok = jnp.full((TH, SW4), cok_ref[c, 0] != 0)
            if gate_min_obs:
                ok &= obs >= min_obs
            if gate_min_lh:
                ok &= lh >= min_lh
            new = jnp.where(ok, lh, -jnp.inf)
            newi = jnp.full((TH, SW4), cok_ref[c, 1], dtype=jnp.int32)
            top = out_lh[k][...]
            topi = out_idx[k][...]
            p = jnp.sum((top >= new[None]).astype(jnp.int32), axis=0)
            kidx = lax.broadcasted_iota(jnp.int32, (K, TH, SW4), 0)
            shifted = top if K == 1 else jnp.concatenate([top[:1], top[:-1]], axis=0)
            shiftedi = topi if K == 1 else jnp.concatenate([topi[:1], topi[:-1]], axis=0)
            at_p = kidx == p[None]
            below = kidx > p[None]
            out_lh[k][...] = jnp.where(at_p, new[None], jnp.where(below, shifted, top))
            out_idx[k][...] = jnp.where(at_p, newi[None], jnp.where(below, shiftedi, topi))

    pl.run_scoped(
        run,
        acc_psi=pltpu.VMEM((COLS, TH, SW4), jnp.int32),
        acc_phi=pltpu.VMEM((COLS, TH, SW4), jnp.int32),
        acc_obs=pltpu.VMEM((COLS, TH, SW4), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "x_min", "x_max", "y_min", "y_max", "k_results",
        "gate_min_obs", "gate_min_lh", "row_tile", "interpret",
    ),
)
def search_topk_pallas_encoded(
    psi_codes,
    phi_codes,
    dxs,
    dys,
    min_obs,
    min_lh,
    encode_meta,
    *,
    x_min,
    x_max,
    y_min,
    y_max,
    k_results,
    gate_min_obs=True,
    gate_min_lh=False,
    row_tile=None,
    interpret=False,
    cand_offset=0,
    cand_valid=None,
    x_origin=None,
    y_origin=None,
):
    """Pallas search over quantized psi/phi code stacks — identical outputs
    to search_topk_shift with encode_meta (the XLA encoded path).

    psi_codes, phi_codes: (T, H, W) uint8 or uint16 (0 = masked);
    encode_meta: (4,) f32 [psi_min, psi_scale, phi_min, phi_scale].
    """
    T, H, W = psi_codes.shape
    C = dxs.shape[0]
    SH = y_max - y_min
    SW = x_max - x_min
    K = int(k_results)

    if psi_codes.dtype == jnp.uint8:
        COLS, BITS = 2, 8
    elif psi_codes.dtype == jnp.uint16:
        COLS, BITS = 1, 16
    else:
        raise ValueError(f"encoded search needs uint8/uint16 codes, got {psi_codes.dtype}")

    cok = _cok_table(C, cand_valid, cand_offset)
    em = jnp.asarray(encode_meta, dtype=jnp.float32).reshape(4)

    if _use_paired(psi_codes.dtype, T):
        # uint8 fast path: dual-parity streams + packed 16-bit sums.
        SW4 = pl.cdiv(SW, 2)
        W4 = _round_up(max(pl.cdiv(W, 2), SW4), 128)
        if row_tile is None:
            row_tile = _paired_row_tile(SH, SW4, W4, K, min(int(T), 4))
        TH = int(row_tile)
        n_ty = pl.cdiv(SH, TH)
        SH_pad = n_ty * TH
        pad_rows = _round_up(SH_pad + H + 16, 8)
        ROWS1 = _round_up(T * H + 2 * pad_rows, 8)
        extra = ROWS1 - (T * H + 2 * pad_rows)

        s0, s1 = _interleave_words_paired(psi_codes, phi_codes, W4)
        z_lo = jnp.zeros((pad_rows, W4), dtype=jnp.int32)
        z_hi = jnp.zeros((pad_rows + extra, W4), dtype=jnp.int32)
        words_r = jnp.concatenate(
            [z_lo, s0.reshape(T * H, W4), z_hi, z_lo, s1.reshape(T * H, W4), z_hi],
            axis=0,
        )

        t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        oy0, ox0 = _origins(y_min, x_min, y_origin, x_origin)
        oy = oy0 + dys.astype(jnp.int32)
        ox = ox0 + dxs.astype(jnp.int32)
        rows = pad_rows + t_idx * H + oy
        return _run_paired_search(
            words_r, rows, ox, oy, cok, em, min_obs, min_lh,
            T=T, H=H, W=W, W4=W4, TH=TH, SW4=SW4, K=K,
            SH=SH, SW=SW, SH_pad=SH_pad, n_ty=n_ty, ROWS1=ROWS1,
            gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, interpret=interpret,
        )

    SW4 = pl.cdiv(SW, COLS)
    W4 = _round_up(max(pl.cdiv(W, COLS), SW4), 128)
    Wp = W4 * COLS

    if row_tile is None:
        row_tile = _encoded_row_tile(SH, SW4, COLS, W4, K)
    TH = int(row_tile)
    n_ty = pl.cdiv(SH, TH)
    SH_pad = n_ty * TH

    pad_rows = _round_up(SH_pad + H + 16, 8)

    # One interleaved stream: each int32 word carries [psi, phi] for COLS
    # adjacent columns (u8: psi_j, phi_j, psi_j+1, phi_j+1 little-endian).
    words = _interleave_words(psi_codes, phi_codes, W4, COLS)
    z = jnp.zeros((pad_rows, W4), dtype=jnp.int32)
    words_r = jnp.concatenate([z, words.reshape(T * H, W4), z], axis=0)

    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    oy0, ox0 = _origins(y_min, x_min, y_origin, x_origin)
    oy = oy0 + dys.astype(jnp.int32)
    ox = ox0 + dxs.astype(jnp.int32)
    rows = pad_rows + t_idx * H + oy

    return _run_encoded_search(
        words_r, rows, ox, oy, cok, em, min_obs, min_lh,
        T=T, H=H, W=W, W4=W4, COLS=COLS, BITS=BITS, TH=TH, SW4=SW4, K=K,
        SH=SH, SW=SW, SH_pad=SH_pad, n_ty=n_ty, pad_rows=pad_rows,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, interpret=interpret,
    )


def _encoded_row_tile(SH, SW4, COLS, W4, K):
    # VMEM budget: class-packed top-K blocks + double-buffered word
    # slabs + 3 class-packed accumulators (see search_topk_pallas).
    budget = 7 * 1024 * 1024
    per_row = 2 * K * SW4 * COLS * 4 + 16 * W4 + 3 * SW4 * COLS * 4
    return max(8, min(_round_up(SH, 8), (budget // per_row) // 8 * 8, 256))


def _interleave_words(psi_codes, phi_codes, W4, COLS):
    """(T, H, W) psi/phi codes -> (T, H, W4) int32 interleaved words."""
    T, H, W = psi_codes.shape
    Wp = W4 * COLS
    inter = jnp.stack([psi_codes, phi_codes], axis=-1).reshape(T, H, 2 * W)
    if Wp > W:
        inter = jnp.pad(inter, ((0, 0), (0, 0), (0, 2 * (Wp - W))))
    return lax.bitcast_convert_type(inter.reshape(T, H, W4, 2 * COLS), jnp.int32)


def _run_encoded_search(
    words_r, rows, ox, oy, cok, em, min_obs, min_lh,
    *, T, H, W, W4, COLS, BITS, TH, SW4, K, SH, SW, SH_pad, n_ty, pad_rows,
    gate_min_obs, gate_min_lh, interpret, bounds_masks=True,
):
    C = rows.shape[0]
    total_rows = int(words_r.shape[0])  # includes any inter-plane guards

    DD = min(int(T), 4)
    kernel = functools.partial(
        _search_kernel_encoded,
        T=T, H=H, W=W, W4=W4, COLS=COLS, BITS=BITS, TH=TH, SW4=SW4, K=K, DD=DD,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
        bounds_masks=bounds_masks,
    )

    CC = _cand_chunk(C, T)
    tbl = jnp.concatenate([rows, ox, oy], axis=1)  # (C, 3T)

    def call_chunk(tbl_c, cok_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_ty, tbl_c.shape[0]),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # interleaved code words
            ],
            out_specs=tuple(
                pl.BlockSpec((K, TH, SW4), lambda ty, c, *prefetch: (0, ty, 0))
                for _ in range(2 * COLS)
            ),
            scratch_shapes=[
                pltpu.VMEM((DD, TH + 8, W4), jnp.int32),
                pltpu.SemaphoreType.DMA((DD,)),
            ],
        )
        cost = pl.CostEstimate(
            flops=2 * tbl_c.shape[0] * T * SH_pad * SW,
            bytes_accessed=tbl_c.shape[0] * T * TH * W4 * 4 * n_ty,
            transcendentals=tbl_c.shape[0] * SH_pad * SW,
        )
        out_shapes = tuple(
            jax.ShapeDtypeStruct((K, SH_pad, SW4), jnp.float32) for _ in range(COLS)
        ) + tuple(jax.ShapeDtypeStruct((K, SH_pad, SW4), jnp.int32) for _ in range(COLS))
        scalars = jnp.concatenate(
            [
                jnp.stack(
                    [
                        jnp.float32(min_obs),
                        jnp.float32(min_lh),
                        jnp.float32(0.0),
                        jnp.float32(total_rows),
                    ]
                ),
                em,
            ]
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(tbl_c, cok_c, scalars, words_r)
        # Interleave class-packed outputs: output column j = COLS*w + k.
        if COLS == 1:
            return outs[0], outs[1]
        lh_i = jnp.stack(outs[:COLS], axis=-1).reshape(K, SH_pad, SW4 * COLS)
        idx_i = jnp.stack(outs[COLS:], axis=-1).reshape(K, SH_pad, SW4 * COLS)
        return lh_i, idx_i

    if C <= CC:
        top_lh, top_idx = call_chunk(tbl, cok)
    else:
        n_chunks = pl.cdiv(C, CC)
        pad = n_chunks * CC - C
        tbl_p = jnp.pad(tbl, ((0, pad), (0, 0)))
        cok_p = jnp.pad(cok, ((0, pad), (0, 0)))
        top_lh = top_idx = None
        for ci in range(n_chunks):
            sl = slice(ci * CC, (ci + 1) * CC)
            lh_c, idx_c = call_chunk(tbl_p[sl], cok_p[sl])
            if top_lh is None:
                top_lh, top_idx = lh_c, idx_c
            else:
                top_lh, top_idx = _merge_pair_banded(top_lh, top_idx, lh_c, idx_c, K)

    return top_lh[:, :SH, :SW], top_idx[:, :SH, :SW]


def _use_paired(dtype, T):
    """uint8 stacks with T <= 257 route to the paired kernel (packed
    16-bit field sums stay exact while T * 255 <= 65535). Opt out with
    KB_PAIRED_KERNEL=0 (read at trace time)."""
    import os

    return (
        dtype == jnp.uint8
        and int(T) <= 257
        and os.environ.get("KB_PAIRED_KERNEL", "1") != "0"
    )


def _search_kernel_paired(
    tbl_ref,  # (C, 3T) int32: [source word-row | x offset | y offset] per time
    cok_ref,  # (C, 2) int32: [validity, global candidate index]
    scalars_ref,  # (8,) f32: [min_obs, min_lh, unused, unused,
    #              psi_min, psi_scale, phi_min, phi_scale]
    words_hbm,  # (2*ROWS1, W4) int32: parity-0 stream, then the stream
    #             shifted one column (parity-1)
    out_lh0,
    out_lh1,
    out_idx0,
    out_idx1,
    word_buf,  # (DD, TH+8, W4) int32 scratch
    sems,  # DMA sems (DD,)
    *,
    T,
    H,
    W,
    W4,
    TH,
    SW4,
    K,
    DD,
    ROWS1,
    gate_min_obs,
    gate_min_lh,
    bounds_masks=True,
):
    """uint8 fast path: dual-parity streams + 16-bit-field packed sums.

    Improvements over _search_kernel_encoded (measured VPU-issue-bound):

    * The word stream is stored twice, the second copy shifted one image
      column (2x HBM for the codes — still 8x smaller than the float
      path). Any column shift ox then reads stream (ox mod 2) rolled by
      floor(ox / 2) whole words: ONE dynamic lane roll per time step
      instead of one per column class, and no in-register byte swizzle.
    * psi codes for two adjacent columns are summed as packed 16-bit
      fields of one int32 (likewise phi and the obs indicator): one add
      covers two columns. Field sums stay exact while T * 255 <= 65535,
      i.e. T <= 257 (the wrapper falls back to the classic kernel above
      that).
    * Validity is free: the packer zeroes BOTH codes of a pair when
      either is 0 (the reference gates on psi AND phi valid,
      kernels.cu:184), so masked samples self-exclude from the packed
      sums and the obs indicator derives from the psi field alone.

    Output layout matches the classic COLS=2 kernel: class-packed
    (even/odd output columns), interleaved back by the host wrapper.
    """
    ty = pl.program_id(0)
    c = pl.program_id(1)
    tile_row0 = ty * TH

    @pl.when(c == 0)
    def _init_topk():
        for ref in (out_lh0, out_lh1):
            ref[...] = jnp.full((K, TH, SW4), -FLT_MAX, dtype=jnp.float32)
        for ref in (out_idx0, out_idx1):
            ref[...] = jnp.full((K, TH, SW4), -1, dtype=jnp.int32)

    min_obs = scalars_ref[0]
    min_lh = scalars_ref[1]
    psi_min = scalars_ref[4]
    psi_scale = scalars_ref[5]
    phi_min = scalars_ref[6]
    phi_scale = scalars_ref[7]

    TB = TH + 8

    def row_for(t):
        ox = tbl_ref[c, T + t]
        par = lax.rem(lax.rem(ox, 2) + 2, 2)  # floor mod: 0 or 1
        r = jnp.clip(tbl_ref[c, t] + tile_row0, 0, ROWS1 - TB) + par * ROWS1
        r8 = pl.multiple_of((r // 8) * 8, 8)
        return r8, r - r8

    def dma(slot, t):
        r8, _ = row_for(t)
        return pltpu.make_async_copy(
            words_hbm.at[pl.ds(r8, TB), :], word_buf.at[slot], sems.at[slot]
        )

    ii = lax.broadcasted_iota(jnp.int32, (TH, SW4), 0)
    # Even output column per word: j0 = 2 * w (class 1 is j0 + 1).
    jj0 = 2 * lax.broadcasted_iota(jnp.int32, (TH, SW4), 1)

    PAIR_ONES = jnp.int32(0x00FF00FF)
    FIELD_ONES = jnp.int32(0x00010001)
    LO16 = jnp.int32(0x0000FFFF)
    HI16 = jnp.int32(-65536)  # 0xFFFF0000

    def run(acc_psi, acc_phi, acc_obs):
        acc_psi[...] = jnp.zeros((TH, SW4), dtype=jnp.int32)
        acc_phi[...] = jnp.zeros((TH, SW4), dtype=jnp.int32)
        acc_obs[...] = jnp.zeros((TH, SW4), dtype=jnp.int32)

        for d in range(DD - 1):
            dma(d, d).start()

        def tbody(t, _):
            slot = t % DD

            @pl.when(t + DD - 1 < T)
            def _prefetch():
                dma((t + DD - 1) % DD, t + DD - 1).start()

            dma(slot, t).wait()

            oy = tbl_ref[c, 2 * T + t] + tile_row0
            ox = tbl_ref[c, T + t]
            par = lax.rem(lax.rem(ox, 2) + 2, 2)
            # Stream-1 word w holds columns (2w-1, 2w), so odd shifts roll
            # by (ox+1)/2 words; even shifts use stream 0 and ox/2. Exact:
            # ox + par is even.
            dw = (ox + par) // 2
            _, rshift = row_for(t)
            pw = pltpu.roll(word_buf[slot], TB - rshift, 0)[:TH]
            wk = _lane_roll_left(pw, dw, W4)[:, :SW4]
            if bounds_masks:
                # Bounds mask, int32 per 16-bit field: output column j
                # valid iff 0 <= j + ox < W and its source row is inside
                # the image. Masked pairs are already zero in the stream,
                # so bounds are the ONLY mask needed.
                row_ok = (ii >= -oy) & (ii < H - oy)
                v0 = (jj0 >= -ox) & (jj0 < W - ox)
                v1 = (jj0 >= -ox - 1) & (jj0 < W - ox - 1)
                m = jnp.where(v0 & row_ok, LO16, 0) | jnp.where(v1 & row_ok, HI16, 0)
                wm = wk & m
            else:
                # Guard-padded stream: every out-of-bounds read lands on a
                # zero word (zero rows between planes, zero column slack),
                # and zero code pairs self-exclude from the sums and the
                # obs indicator — bit-identical results, no mask work.
                wm = wk
            pv = wm & PAIR_ONES  # psi codes: bits 0-7 and 16-23
            fv = lax.shift_right_logical(wm, 8) & PAIR_ONES  # phi codes
            acc_psi[...] = acc_psi[...] + pv
            acc_phi[...] = acc_phi[...] + fv
            # Per-field valid indicator: (v + 255) has bit 8 set iff v > 0.
            ind = lax.shift_right_logical(pv + PAIR_ONES, 8) & FIELD_ONES
            acc_obs[...] = acc_obs[...] + ind
            return 0

        lax.fori_loop(0, T, tbody, 0)

        for k, (lh_ref, idx_ref) in enumerate(((out_lh0, out_idx0), (out_lh1, out_idx1))):
            if k == 0:
                psi_c = acc_psi[...] & LO16
                phi_c = acc_phi[...] & LO16
                obs_i = acc_obs[...] & LO16
            else:
                psi_c = lax.shift_right_logical(acc_psi[...], 16)
                phi_c = lax.shift_right_logical(acc_phi[...], 16)
                obs_i = lax.shift_right_logical(acc_obs[...], 16)
            obs = obs_i.astype(jnp.float32)
            psi_sum = psi_scale * psi_c.astype(jnp.float32) + (psi_min - psi_scale) * obs
            phi_sum = phi_scale * phi_c.astype(jnp.float32) + (phi_min - phi_scale) * obs
            lh = jnp.where(phi_sum > 0, psi_sum * lax.rsqrt(jnp.maximum(phi_sum, 1e-30)), -1.0)
            ok = jnp.full((TH, SW4), cok_ref[c, 0] != 0)
            if gate_min_obs:
                ok &= obs >= min_obs
            if gate_min_lh:
                ok &= lh >= min_lh
            new = jnp.where(ok, lh, -jnp.inf)
            newi = jnp.full((TH, SW4), cok_ref[c, 1], dtype=jnp.int32)
            top = lh_ref[...]
            topi = idx_ref[...]
            p = jnp.sum((top >= new[None]).astype(jnp.int32), axis=0)
            kidx = lax.broadcasted_iota(jnp.int32, (K, TH, SW4), 0)
            shifted = top if K == 1 else jnp.concatenate([top[:1], top[:-1]], axis=0)
            shiftedi = topi if K == 1 else jnp.concatenate([topi[:1], topi[:-1]], axis=0)
            at_p = kidx == p[None]
            below = kidx > p[None]
            lh_ref[...] = jnp.where(at_p, new[None], jnp.where(below, shifted, top))
            idx_ref[...] = jnp.where(at_p, newi[None], jnp.where(below, shiftedi, topi))

    pl.run_scoped(
        run,
        acc_psi=pltpu.VMEM((TH, SW4), jnp.int32),
        acc_phi=pltpu.VMEM((TH, SW4), jnp.int32),
        acc_obs=pltpu.VMEM((TH, SW4), jnp.int32),
    )


def _interleave_words_paired(psi_codes, phi_codes, W4):
    """(T, H, W) uint8 psi/phi codes -> two (T, H, W4) int32 streams:
    parity-0 word w packs columns (2w, 2w+1); parity-1 word w packs
    (2w-1, 2w) — shifted DOWN one column so that for odd shifts ox every
    needed (odd, even) source pair, including the one containing column
    0, exists in the stream. When stream 1 would need one word beyond W4
    (even W with W/2 == W4), its overflow pair (W-1, W) is OR-folded onto
    word 0's leading zero bytes — the kernel's cyclic lane roll reads
    word W/2 as word 0, and the bounds masks ensure each byte class of
    word 0 is only ever read in the role that holds real data. Pairs
    where either code is 0 are zeroed entirely (the search gates on psi
    AND phi valid, kernels.cu:184)."""
    T, H, W = psi_codes.shape
    both = (psi_codes != 0) & (phi_codes != 0)
    psi_m = jnp.where(both, psi_codes, 0).astype(jnp.uint8)
    phi_m = jnp.where(both, phi_codes, 0).astype(jnp.uint8)

    def pack(p, f):
        Wc = p.shape[2]
        inter = jnp.stack([p, f], axis=-1).reshape(T, H, 2 * Wc)
        total = 4 * W4  # bytes per row
        if 2 * Wc <= total:
            inter = jnp.pad(inter, ((0, 0), (0, 0), (0, total - 2 * Wc)))
        else:
            # Wrap overflow bytes onto the leading zeros (cyclic roll).
            head = inter[..., :total]
            tail = inter[..., total:]
            tail = jnp.pad(tail, ((0, 0), (0, 0), (0, total - tail.shape[-1])))
            inter = head | tail
        return lax.bitcast_convert_type(inter.reshape(T, H, W4, 4), jnp.int32)

    s0 = pack(psi_m, phi_m)
    zcol = jnp.zeros((T, H, 1), dtype=jnp.uint8)
    s1 = pack(
        jnp.concatenate([zcol, psi_m], axis=2),
        jnp.concatenate([zcol, phi_m], axis=2),
    )
    return s0, s1


def _paired_row_tile(SH, SW4, W4, K, DD):
    budget = 7 * 1024 * 1024
    # Outputs: 2 classes x (lh + idx) x (K, TH, SW4) f32/i32; DMA ring
    # DD x (TH+8, W4) i32; 3 packed accumulators (TH, SW4) i32.
    per_row = 2 * 2 * K * SW4 * 4 + DD * W4 * 4 + 3 * SW4 * 4
    return max(8, min(_round_up(SH, 8), (budget // per_row) // 8 * 8, 256))


def _run_paired_search(
    words_r, rows, ox, oy, cok, em, min_obs, min_lh,
    *, T, H, W, W4, TH, SW4, K, SH, SW, SH_pad, n_ty, ROWS1,
    gate_min_obs, gate_min_lh, interpret, bounds_masks=True,
):
    C = rows.shape[0]
    DD = min(int(T), 4)
    kernel = functools.partial(
        _search_kernel_paired,
        T=T, H=H, W=W, W4=W4, TH=TH, SW4=SW4, K=K, DD=DD, ROWS1=ROWS1,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
        bounds_masks=bounds_masks,
    )

    CC = _cand_chunk(C, T)
    tbl = jnp.concatenate([rows, ox, oy], axis=1)  # (C, 3T)

    def call_chunk(tbl_c, cok_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_ty, tbl_c.shape[0]),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=tuple(
                pl.BlockSpec((K, TH, SW4), lambda ty, c, *prefetch: (0, ty, 0))
                for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((DD, TH + 8, W4), jnp.int32),
                pltpu.SemaphoreType.DMA((DD,)),
            ],
        )
        cost = pl.CostEstimate(
            flops=2 * tbl_c.shape[0] * T * SH_pad * SW,
            bytes_accessed=tbl_c.shape[0] * T * TH * W4 * 4 * n_ty,
            transcendentals=tbl_c.shape[0] * SH_pad * SW,
        )
        out_shapes = tuple(
            jax.ShapeDtypeStruct((K, SH_pad, SW4), jnp.float32) for _ in range(2)
        ) + tuple(jax.ShapeDtypeStruct((K, SH_pad, SW4), jnp.int32) for _ in range(2))
        scalars = jnp.concatenate(
            [
                jnp.stack(
                    [
                        jnp.float32(min_obs),
                        jnp.float32(min_lh),
                        jnp.float32(0.0),
                        jnp.float32(0.0),
                    ]
                ),
                em,
            ]
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(tbl_c, cok_c, scalars, words_r)
        lh_i = jnp.stack(outs[:2], axis=-1).reshape(K, SH_pad, SW4 * 2)
        idx_i = jnp.stack(outs[2:], axis=-1).reshape(K, SH_pad, SW4 * 2)
        return lh_i, idx_i

    if C <= CC:
        top_lh, top_idx = call_chunk(tbl, cok)
    else:
        n_chunks = pl.cdiv(C, CC)
        pad = n_chunks * CC - C
        tbl_p = jnp.pad(tbl, ((0, pad), (0, 0)))
        cok_p = jnp.pad(cok, ((0, pad), (0, 0)))
        top_lh = top_idx = None
        for ci in range(n_chunks):
            sl = slice(ci * CC, (ci + 1) * CC)
            lh_c, idx_c = call_chunk(tbl_p[sl], cok_p[sl])
            if top_lh is None:
                top_lh, top_idx = lh_c, idx_c
            else:
                top_lh, top_idx = _merge_pair_banded(top_lh, top_idx, lh_c, idx_c, K)

    return top_lh[:, :SH, :SW], top_idx[:, :SH, :SW]


# ---------------------------------------------------------------------------
# Grouped paired kernel: candidate-group DMA reuse
# ---------------------------------------------------------------------------
#
# The per-candidate kernels above re-stream the row window for EVERY
# candidate: at survey scale (4k-wide stacks force a 16-row tile, so each
# DMA moves TH+8 rows for TH useful ones) the window traffic is the
# bottleneck. Candidates with similar vy read almost the same rows at every
# time step, so the grouped kernel sorts candidates by net row motion,
# packs G of them into a group whose per-time row spread is <= S, and DMAs
# ONE (TH+8+S)-row window (both column-parity streams) per (tile, group,
# time) — amortizing the window over G candidates. Each candidate keeps its
# own (TH, SW4) packed accumulators in VMEM; per-candidate row/parity
# selection is a single sublane roll over the stacked two-stream buffer.
#
# Processing order is the velocity sort, not candidate order, so top-K
# insertion (and _merge_pair) break exact likelihood ties by ascending
# global candidate index — equal to arrival order of the per-candidate
# kernels and the XLA path, making results order-independent.


def _plan_groups(dys_np, G, S):
    """Sort candidates by net row motion and pack consecutive candidates
    into groups of <= G whose per-time row spread is <= S.

    Returns ``(order, starts)``: ``order`` is the (C,) processing
    permutation; ``starts`` the first slot of each group within it.
    """
    dys_np = np.asarray(dys_np)
    C, T = dys_np.shape
    key = dys_np[:, -1]
    order = np.argsort(key, kind="stable").astype(np.int32)
    d_last = key[order]
    # Greedy pass on the last-time offsets: for linear trajectories the
    # spread at any t is bounded by the last-time spread + 2 (floor
    # jitter), so a last-time bound of S-2 guarantees S overall.
    bound = max(int(S) - 2, 0)
    starts = [0]
    for i in range(1, C):
        if i - starts[-1] >= G or d_last[i] - d_last[starts[-1]] > bound:
            starts.append(i)
    starts = np.asarray(starts, dtype=np.int64)
    # Exact verification over every time step (arbitrary dys inputs need
    # not be linear): split any violating group into singletons.
    d = dys_np[order]
    gmin = np.minimum.reduceat(d, starts, axis=0)
    gmax = np.maximum.reduceat(d, starts, axis=0)
    bad = (gmax - gmin).max(axis=1) > S
    if bad.any():
        ends = np.append(starts[1:], C)
        new_starts = []
        for gi in range(len(starts)):
            if bad[gi]:
                new_starts.extend(range(int(starts[gi]), int(ends[gi])))
            else:
                new_starts.append(int(starts[gi]))
        starts = np.asarray(new_starts, dtype=np.int64)
    return order, starts


def _plan_groups_uniform(dys_np, G):
    """Group candidates whose per-time row offsets are IDENTICAL (row
    classes). Real survey grids (velocity x angle lattices, e.g. the
    reference's 257x129 default, configuration.py:196-207) collapse to a
    few hundred distinct row sequences, so nearly every group is full —
    and a uniform group lets the kernel hoist the window slice + sublane
    roll out of the per-candidate loop and run spread-0 (minimal) window
    DMAs. Groups never span two classes; padding slots mirror the last
    member as usual, so every group is uniform by construction.

    Returns ``(order, starts)`` like :func:`_plan_groups`.
    """
    dys_np = np.ascontiguousarray(np.asarray(dys_np, dtype=np.int32))
    C, T = dys_np.shape
    view = dys_np.view([("", dys_np.dtype)] * T).reshape(C)
    _, inv = np.unique(view, return_inverse=True)
    # Stable sort keeps same-class candidates in ascending-index order
    # (tie ranking is index-based, so results are order-independent).
    order = np.argsort(inv, kind="stable").astype(np.int32)
    cls_sorted = inv[order]
    cls_starts = np.flatnonzero(np.r_[True, cls_sorted[1:] != cls_sorted[:-1]])
    cls_ends = np.append(cls_starts[1:], C)
    starts = np.concatenate(
        [np.arange(int(s), int(e), int(G)) for s, e in zip(cls_starts, cls_ends)]
    )
    return order, starts.astype(np.int64)


def _bounds_free(ox, oy, *, W, H, W4, SW4, SH_pad, geom, row_slack, cols=2,
                 paired=True):
    """True when every read of an encoded kernel — including lane-roll
    wrap-around and the sublane window slack — lands either inside the
    image or on the stream's zero padding (inter-plane guard rows, column
    slack words, or the end pads), so the mask-free kernel variant is
    exact. ``ox``/``oy`` are the concrete per-(candidate, time) offsets
    including the window origin; ``row_slack`` is the extra window height
    beyond the row tile (8 for the per-candidate kernels, 8 + spread for
    the grouped one). ``paired`` selects the dual-parity word-shift math;
    otherwise the per-class kernel's conservative class-shift range is
    used (``cols`` column classes per word)."""
    ox = np.asarray(ox)
    oy = np.asarray(oy)
    if ox.size == 0:
        return True
    img_w4 = -(-int(W) // int(cols))
    if paired:
        par = np.mod(ox, 2)
        dw = (ox + par) // 2
        dw_lo, dw_hi = int(dw.min()), int(dw.max())
        # Stream 1 (the one-column-shifted copy) occupies ONE word more
        # than stream 0, so a left wrap may only reach down to word
        # img_w4 + 1 — hence the -1 on the wrap budget.
        wrap_budget = int(W4) - img_w4 - 1
    else:
        # Class shifts dw = (k + ox - sk) // cols over k in [0, cols).
        dw_lo = (int(ox.min()) - (int(cols) - 1)) // int(cols)
        dw_hi = (int(ox.max()) + (int(cols) - 1)) // int(cols)
        wrap_budget = int(W4) - img_w4
    col_ok = (
        int(W4) - img_w4 >= 128  # rules out the stream-1 overflow fold
        and dw_lo >= -wrap_budget
        and dw_hi <= int(W4) - int(SW4)
    )
    above = max(0, 7 - int(oy.min()))
    below = max(0, int(oy.max()) + int(SH_pad) + int(row_slack) - int(H))
    row_ok = above <= geom.row_guard and below <= geom.row_guard
    return bool(col_ok and row_ok)


_PLAN_CACHE = {}


def _plan_groups_cached(dys_np, G, S, max_entries=8, uniform=False):
    """Small content-keyed cache around :func:`_plan_groups` /
    :func:`_plan_groups_uniform` — repeated searches over the same
    trajectory set (the steady-state production pattern) pay the
    O(C log C) sort and spread verification once."""
    import hashlib

    dys_np = np.ascontiguousarray(dys_np)
    key = (
        hashlib.sha1(dys_np).hexdigest(),
        dys_np.shape,
        str(dys_np.dtype),
        int(G),
        int(S),
        bool(uniform),
    )
    hit = _PLAN_CACHE.get(key)
    if hit is None:
        hit = _plan_groups_uniform(dys_np, G) if uniform else _plan_groups(dys_np, G, S)
        if len(_PLAN_CACHE) >= max_entries:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = hit
    return hit


def _grouped_tables(order, starts, G, dxs_np, dys_np, oy0, ox0, pad_rows, H,
                    cand_valid=None, cand_offset=0):
    """Build the grouped kernel's host-side tables.

    Returns ``(tbl, grp, cok)``: ``tbl`` (NG*G, 2T) int32 [ox | oy] per
    slot (padding slots mirror the group's last member so their roll
    amounts stay in range; their validity bit is 0); ``grp`` (NG, T) the
    per-group minimum source row; ``cok`` (NG*G, 2) validity + global
    candidate index.
    """
    C, T = dys_np.shape
    NG = len(starts)
    ends = np.append(starts[1:], C)
    sizes = ends - starts
    offs = np.arange(G)[None, :]
    # Padding slots clamp to the group's LAST member, keeping their roll
    # amounts inside the group window; their validity bit is 0.
    slot_pos = starts[:, None] + np.minimum(offs, sizes[:, None] - 1)
    src = order[slot_pos]  # (NG, G)
    slot_ok = (offs < sizes[:, None]).astype(np.int32)
    if cand_valid is not None:
        slot_ok = slot_ok * np.asarray(cand_valid).astype(np.int32)[src]

    flat = src.reshape(-1)
    ox = (int(ox0) + dxs_np[flat].astype(np.int64)).astype(np.int32)  # (NG*G, T)
    oy = (int(oy0) + dys_np[flat].astype(np.int64)).astype(np.int32)
    tbl = np.concatenate([ox, oy], axis=1)  # (NG*G, 2T)
    t_idx = np.arange(T, dtype=np.int64)[None, :]
    rows = (pad_rows + t_idx * H + oy.astype(np.int64)).astype(np.int32)
    grp = rows.reshape(NG, G, T).min(axis=1)
    idxg = (flat.astype(np.int64) + int(cand_offset)).astype(np.int32)
    cok = np.stack([slot_ok.reshape(-1), idxg], axis=1).astype(np.int32)
    return tbl, grp, cok


def _grouped_tables_fast(order, starts, G, dxs_np, dys_np, oy0, ox0, pad_rows, H,
                         W4, TBG, cand_valid=None, cand_offset=0, TH=None,
                         uniform=False):
    """Host-resolved grouped tables for the fast-tables kernel variant.

    Returns ``(tbl, grp8, cok, margins)``: ``tbl`` (NG*G, 3T) int32
    ``[lane_amount | row_residual | parity_base]`` per slot/time (all
    kernel scalar math pre-applied, lane amounts pre-normalized for the
    non-pow2 rotate quirk), ``grp8`` (NG, T) the 8-aligned group base
    rows, ``cok`` as in :func:`_grouped_tables`, and ``(grp8_min,
    grp8_max, rsub_max)`` for the caller's clip-freedom check.

    With ``uniform`` (requires a :func:`_plan_groups_uniform` plan), the
    row residual — identical across a uniform group's slots and always
    < 8 relative to the group's 8-aligned DMA base — moves to the group
    table: returns ``tbl`` (NG*G, T) packing ``lane_amount | parity <<
    16`` per slot/time and ``grp8`` (NG, 2T) ``[dma_base8 |
    row_residual]``."""
    C, T = dys_np.shape
    NG = len(starts)
    ends = np.append(starts[1:], C)
    sizes = ends - starts
    offs = np.arange(G)[None, :]
    slot_pos = starts[:, None] + np.minimum(offs, sizes[:, None] - 1)
    src = order[slot_pos]  # (NG, G)
    slot_ok = (offs < sizes[:, None]).astype(np.int32)
    if cand_valid is not None:
        slot_ok = slot_ok * np.asarray(cand_valid).astype(np.int32)[src]

    flat = src.reshape(-1)
    ox = (int(ox0) + dxs_np[flat].astype(np.int64))  # (NG*G, T)
    oy = (int(oy0) + dys_np[flat].astype(np.int64))
    t_idx = np.arange(T, dtype=np.int64)[None, :]
    rows = pad_rows + t_idx * H + oy  # (NG*G, T)
    grp = rows.reshape(NG, G, T).min(axis=1)
    grp8 = (grp // 8) * 8  # floor-align (grp >= 0 checked by caller)

    par = ox % 2  # non-negative (numpy % with positive divisor)
    dw = (ox + par) // 2  # exact (ox + par is even)
    aln = (-dw) % int(W4)
    rsub = rows - grp8.reshape(NG, 1, T).repeat(G, axis=1).reshape(NG * G, T)
    idxg = (flat.astype(np.int64) + int(cand_offset)).astype(np.int32)
    cok = np.stack([slot_ok.reshape(-1), idxg], axis=1).astype(np.int32)
    margins = (int(grp8.min()), int(grp8.max()), int(rsub.max()))
    if uniform:
        # Uniform plan: every slot of a group shares rows (padding slots
        # mirror a member, so they share too), so the residual is the
        # shared row mod 8. Move it to the group table and pack the slot
        # table as lane | parity<<16.
        rsub_g = rsub.reshape(NG, G, T)
        if (rsub_g != rsub_g[:, :1]).any() or rsub.max() >= 8:
            raise ValueError("uniform grouped tables require a uniform plan")
        rs_g = rsub_g[:, 0]  # (NG, T), all values in [0, 8)
        tbl = (aln | (par << 16)).astype(np.int32)  # (NG*G, T)
        grp_u = np.concatenate([grp8, rs_g], axis=1).astype(np.int32)  # (NG, 2T)
        return tbl, grp_u, cok, margins
    pbase = par * int(TBG)
    if TH is not None:
        # "win" tables: fold the 8-aligned residual into the base so the
        # kernel slices the minimal TH+8 rows.
        base = pbase + (rsub // 8) * 8
        rs = rsub % 8
    else:
        base, rs = pbase, rsub
    tbl = np.concatenate([aln, rs, base], axis=1).astype(np.int32)
    return tbl, grp8.astype(np.int32), cok, margins


def _search_kernel_paired_grouped(
    tbl_ref,  # (NGC*G, 2T) int32: [x offset | y offset] per slot/time
    grp_ref,  # (NGC, T) int32: group-minimum source row (no tile offset)
    cok_ref,  # (NGC*G, 2) int32: [validity, global candidate index]
    scalars_ref,  # (8,) f32: [min_obs, min_lh, unused, unused,
    #              psi_min, psi_scale, phi_min, phi_scale]
    words_hbm,  # (2*ROWS1, W4) int32: parity-0 stream then parity-1 stream
    out_lh0,
    out_lh1,
    out_idx0,
    out_idx1,
    word_buf,  # (DD, 2*TBG, W4) int32: both streams' group windows stacked
    sems,  # DMA sems (DD, 2)
    *,
    T,
    H,
    HG,
    W,
    W4,
    TH,
    SW4,
    K,
    DD,
    S,
    G,
    ROWS1,
    pad_rows,
    gate_min_obs,
    gate_min_lh,
    bounds_masks=True,
    fast_tables=False,
    slice_mode="roll",
    FLUSH=0,
    idx16=False,
    uniform=False,
):
    """Candidate-grouped variant of _search_kernel_paired (see the module
    comment above): one dual-stream window DMA per (tile, group, time)
    serves G candidates; per-candidate state is G packed accumulator
    triples. Top-K insertion breaks exact ties by ascending candidate
    index (reference semantics up to equal-lh ordering, kernels.cu:322-330
    — identical to the per-candidate kernels' arrival order).

    ``FLUSH`` (static) removes the T <= 257 cap: every FLUSH time steps
    the packed 16-bit field sums are unpacked into wide per-candidate
    int32 accumulators and reset, so field sums never overflow (FLUSH *
    255 <= 65535). The flush runs once per FLUSH steps — its cost is
    amortized to nothing — and the sums are associative, so results are
    bit-identical to the capped kernel.

    With ``fast_tables`` the host pre-resolves all per-slot scalar math
    (column parity, word shift, normalized lane-roll amount, in-window row
    residual) into the SMEM tables — valid only when the stream is
    guard-padded (no bounds masks) and the window clip provably never
    binds; ``grp_ref`` then carries the 8-aligned group base rows.
    ``slice_mode="half"`` additionally replaces the full stacked-buffer
    sublane roll by a dynamic slice of the one parity half the slot needs
    (half the roll input).

    ``uniform`` (implies ``fast_tables``) runs a :func:`_plan_groups_uniform`
    plan: every slot of a group shares its per-time rows, so the kernel
    slices + sublane-rolls the two parity halves ONCE per (tile, group,
    time) — static TH+8 windows at the buffer base, spread S=0 — and the
    per-candidate loop only selects a parity half, lane-rolls it, and
    accumulates. ``grp_ref`` is (NGC, 2T) ``[dma_base8 | row_residual]``;
    ``tbl_ref`` is (NGC*G, T) packing ``lane_amount | parity << 16``."""
    TBG = TH + 8 + S
    ty = pl.program_id(0)
    pg = pl.program_id(1)
    tile_row0 = ty * TH

    # Candidate indices in the top-K lists: uint16 with sentinel 0xFFFF for
    # empty slots when every global index fits (halves the output VMEM
    # footprint — the binding constraint on the row tile / ring depth);
    # int32 with sentinel -1 otherwise. The wrapper converts back.
    idx_dtype = jnp.uint16 if idx16 else jnp.int32
    idx_empty = (1 << 16) - 1 if idx16 else -1

    @pl.when(pg == 0)
    def _init_topk():
        for ref in (out_lh0, out_lh1):
            ref[...] = jnp.full((K, TH, SW4), -FLT_MAX, dtype=jnp.float32)
        for ref in (out_idx0, out_idx1):
            ref[...] = jnp.full((K, TH, SW4), idx_empty, dtype=idx_dtype)

    min_obs = scalars_ref[0]
    min_lh = scalars_ref[1]
    psi_min = scalars_ref[4]
    psi_scale = scalars_ref[5]
    phi_min = scalars_ref[6]
    phi_scale = scalars_ref[7]

    if uniform:
        assert fast_tables and not bounds_masks

    if fast_tables:
        assert not bounds_masks, "fast tables require the guard-padded stream"

        def base_for(t):
            return pl.multiple_of(grp_ref[pg, t] + tile_row0, 8)

    else:

        def base_for(t):
            r = jnp.clip(grp_ref[pg, t] + tile_row0, 0, ROWS1 - TBG)
            return pl.multiple_of((r // 8) * 8, 8)

    def dma(slot, t):
        r8 = base_for(t)
        return [
            pltpu.make_async_copy(
                words_hbm.at[pl.ds(r8, TBG), :],
                word_buf.at[slot, pl.ds(0, TBG)],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                words_hbm.at[pl.ds(r8 + ROWS1, TBG), :],
                word_buf.at[slot, pl.ds(TBG, TBG)],
                sems.at[slot, 1],
            ),
        ]

    ii = lax.broadcasted_iota(jnp.int32, (TH, SW4), 0)
    jj0 = 2 * lax.broadcasted_iota(jnp.int32, (TH, SW4), 1)

    PAIR_ONES = jnp.int32(0x00FF00FF)
    FIELD_ONES = jnp.int32(0x00010001)
    LO16 = jnp.int32(0x0000FFFF)
    HI16 = jnp.int32(-65536)  # 0xFFFF0000

    def run(acc_psi, acc_phi, acc_obs, acc_wide=None, pw_scr=None):
        for gi in range(G):
            acc_psi[gi] = jnp.zeros((TH, SW4), dtype=jnp.int32)
            acc_phi[gi] = jnp.zeros((TH, SW4), dtype=jnp.int32)
            acc_obs[gi] = jnp.zeros((TH, SW4), dtype=jnp.int32)
        if FLUSH:
            acc_wide[...] = jnp.zeros((G, 6, TH, SW4), dtype=jnp.int32)

        for d in range(DD - 1):
            for cp in dma(d, d):
                cp.start()

        def tbody(t, _):
            slot = t % DD

            @pl.when(t + DD - 1 < T)
            def _prefetch():
                for cp in dma((t + DD - 1) % DD, t + DD - 1):
                    cp.start()

            for cp in dma(slot, t):
                cp.wait()

            r8 = base_for(t)
            buf = None
            if uniform:
                # Shared rows: slice + sublane-roll each parity half ONCE
                # for the whole group. The slice bases are STATIC (the
                # group's residual is its shared row mod 8 < 8).
                rs = grp_ref[pg, T + t]
                SLu = TH + 8
                pw0 = pltpu.roll(word_buf[slot, :SLu], SLu - rs, 0)[:TH]
                pw1 = pltpu.roll(word_buf[slot, TBG : TBG + SLu], SLu - rs, 0)[:TH]
                if slice_mode == "uslice":
                    # Parity select via a dynamic sublane slice of the
                    # stacked halves (reads only the half it needs).
                    pw_scr[:TH] = pw0
                    pw_scr[TH:] = pw1
            elif not (fast_tables and slice_mode == "half"):
                buf = word_buf[slot]  # (2*TBG, W4)
            for gi in range(G):
                ci = pg * G + gi
                if uniform:
                    v = tbl_ref[ci, t]
                    aln = lax.rem(v, jnp.int32(1 << 16))
                    if slice_mode == "uslice":
                        pbase = lax.shift_right_logical(v, 16) * TH
                        pw = pw_scr[pl.ds(pl.multiple_of(pbase, 8), TH)]
                    else:
                        pw = jnp.where(v >= (1 << 16), pw1, pw0)
                    wm = pltpu.roll(pw, aln, 1)[:, :SW4]
                elif fast_tables:
                    # Host-resolved tables: normalized lane amount, row
                    # residual, 8-aligned slice base. In "win" mode the
                    # base already folds the parity half AND the 8-aligned
                    # residual, so the slice is the minimal TH+8 rows; in
                    # "half" mode it is the parity half (TBG rows).
                    aln = tbl_ref[ci, t]
                    rs = tbl_ref[ci, T + t]
                    base = tbl_ref[ci, 2 * T + t]
                    if slice_mode in ("half", "win"):
                        SL = TBG if slice_mode == "half" else TH + 8
                        win = word_buf[slot, pl.ds(pl.multiple_of(base, 8), SL)]
                        pw = pltpu.roll(win, SL - rs, 0)[:TH]
                    else:
                        pw = pltpu.roll(buf, 2 * TBG - (base + rs), 0)[:TH]
                    wm = pltpu.roll(pw, aln, 1)[:, :SW4]
                else:
                    ox = tbl_ref[ci, t]
                    oy = tbl_ref[ci, T + t] + tile_row0
                    par = lax.rem(lax.rem(ox, 2) + 2, 2)
                    row_i = pad_rows + t * HG + oy
                    # Start row inside the stacked buffer: the candidate's
                    # residual within the group window, plus TBG to land in
                    # the parity-1 half for odd column shifts. Clipped so the
                    # sublane roll amount stays positive even for windows the
                    # bounds masks fully reject.
                    rshift = jnp.clip(row_i - r8 + par * TBG, 0, 2 * TBG - 1)
                    pw = pltpu.roll(buf, 2 * TBG - rshift, 0)[:TH]
                    dw = (ox + par) // 2
                    wk = _lane_roll_left(pw, dw, W4)[:, :SW4]
                    if bounds_masks:
                        row_ok = (ii >= -oy) & (ii < H - oy)
                        v0 = (jj0 >= -ox) & (jj0 < W - ox)
                        v1 = (jj0 >= -ox - 1) & (jj0 < W - ox - 1)
                        m = jnp.where(v0 & row_ok, LO16, 0) | jnp.where(v1 & row_ok, HI16, 0)
                        wm = wk & m
                    else:
                        # Guard-padded stream: OOB reads land on zeros, which
                        # self-exclude (see _search_kernel_paired).
                        wm = wk
                pv = wm & PAIR_ONES
                fv = lax.shift_right_logical(wm, 8) & PAIR_ONES
                acc_psi[gi] = acc_psi[gi] + pv
                acc_phi[gi] = acc_phi[gi] + fv
                ind = lax.shift_right_logical(pv + PAIR_ONES, 8) & FIELD_ONES
                acc_obs[gi] = acc_obs[gi] + ind

            if FLUSH:
                # Drain the packed fields into the wide accumulators before
                # they can overflow (every FLUSH steps; FLUSH * 255 fits
                # 16 bits). Amortized cost ~0.
                @pl.when(lax.rem(t, FLUSH) == FLUSH - 1)
                def _flush():
                    for gi in range(G):
                        for q, accq in enumerate((acc_psi, acc_phi, acc_obs)):
                            v = accq[gi]
                            acc_wide[gi, 2 * q] = acc_wide[gi, 2 * q] + (v & LO16)
                            acc_wide[gi, 2 * q + 1] = acc_wide[
                                gi, 2 * q + 1
                            ] + lax.shift_right_logical(v, 16)
                            accq[gi] = jnp.zeros((TH, SW4), dtype=jnp.int32)

            return 0

        lax.fori_loop(0, T, tbody, 0)

        for gi in range(G):
            ci = pg * G + gi
            for k, (lh_ref, idx_ref) in enumerate(
                ((out_lh0, out_idx0), (out_lh1, out_idx1))
            ):
                if FLUSH:
                    # Residual packed sums (steps since the last flush) plus
                    # the drained wide totals.
                    if k == 0:
                        psi_c = acc_wide[gi, 0] + (acc_psi[gi] & LO16)
                        phi_c = acc_wide[gi, 2] + (acc_phi[gi] & LO16)
                        obs_i = acc_wide[gi, 4] + (acc_obs[gi] & LO16)
                    else:
                        psi_c = acc_wide[gi, 1] + lax.shift_right_logical(acc_psi[gi], 16)
                        phi_c = acc_wide[gi, 3] + lax.shift_right_logical(acc_phi[gi], 16)
                        obs_i = acc_wide[gi, 5] + lax.shift_right_logical(acc_obs[gi], 16)
                elif k == 0:
                    psi_c = acc_psi[gi] & LO16
                    phi_c = acc_phi[gi] & LO16
                    obs_i = acc_obs[gi] & LO16
                else:
                    psi_c = lax.shift_right_logical(acc_psi[gi], 16)
                    phi_c = lax.shift_right_logical(acc_phi[gi], 16)
                    obs_i = lax.shift_right_logical(acc_obs[gi], 16)
                obs = obs_i.astype(jnp.float32)
                psi_sum = psi_scale * psi_c.astype(jnp.float32) + (psi_min - psi_scale) * obs
                phi_sum = phi_scale * phi_c.astype(jnp.float32) + (phi_min - phi_scale) * obs
                lh = jnp.where(phi_sum > 0, psi_sum * lax.rsqrt(jnp.maximum(phi_sum, 1e-30)), -1.0)
                ok = jnp.full((TH, SW4), cok_ref[ci, 0] != 0)
                if gate_min_obs:
                    ok &= obs >= min_obs
                if gate_min_lh:
                    ok &= lh >= min_lh
                new = jnp.where(ok, lh, -jnp.inf)
                newi32 = jnp.full((TH, SW4), cok_ref[ci, 1], dtype=jnp.int32)
                newi = newi32.astype(idx_dtype)
                top = lh_ref[...]
                topi = idx_ref[...]
                # Rank-insert with the canonical tie rule: existing entries
                # stay above the newcomer when strictly better OR equal
                # with a smaller candidate index. The tie compare widens to
                # int32 — the VPU has no unsigned 16-bit vector compare
                # (zero-extension keeps the unsigned order).
                topi_c = topi.astype(jnp.int32) if idx16 else topi
                above = (top > new[None]) | ((top == new[None]) & (topi_c < newi32[None]))
                p = jnp.sum(above.astype(jnp.int32), axis=0)
                kidx = lax.broadcasted_iota(jnp.int32, (K, TH, SW4), 0)
                shifted = top if K == 1 else jnp.concatenate([top[:1], top[:-1]], axis=0)
                shiftedi = topi if K == 1 else jnp.concatenate([topi[:1], topi[:-1]], axis=0)
                at_p = kidx == p[None]
                below = kidx > p[None]
                lh_ref[...] = jnp.where(at_p, new[None], jnp.where(below, shifted, top))
                idx_ref[...] = jnp.where(at_p, newi[None], jnp.where(below, shiftedi, topi))

    scratch = dict(
        acc_psi=pltpu.VMEM((G, TH, SW4), jnp.int32),
        acc_phi=pltpu.VMEM((G, TH, SW4), jnp.int32),
        acc_obs=pltpu.VMEM((G, TH, SW4), jnp.int32),
    )
    if FLUSH:
        scratch["acc_wide"] = pltpu.VMEM((G, 6, TH, SW4), jnp.int32)
    if uniform and slice_mode == "uslice":
        scratch["pw_scr"] = pltpu.VMEM((2 * TH, W4), jnp.int32)
    pl.run_scoped(run, **scratch)


def _grouped_row_tile(SH, SW4, W4, K, DD, G, S, wide=False, idx16=False,
                      uniform=False):
    """Largest row tile whose grouped-kernel VMEM footprint (double-buffered
    output blocks + G accumulator triples + the DMA ring + the wide T>257
    accumulators when ``wide`` + the uniform variant's stacked parity
    scratch) fits."""
    budget = 13 * 1024 * 1024
    acc_arrays = 3 + (6 if wide else 0)
    idx_bytes = 2 if idx16 else 4
    for TH in (64, 48, 32, 24, 16, 8):
        TBG = TH + 8 + S
        total = (
            2 * 2 * K * TH * SW4 * (4 + idx_bytes)
            + acc_arrays * G * TH * SW4 * 4
            + DD * 2 * TBG * W4 * 4
            + (2 * TH * W4 * 4 if uniform else 0)
        )
        if total <= budget:
            return min(TH, _round_up(SH, 8))
    return 8


def _grouped_cand_chunk(NG, T, G, tcols=2):
    """Groups per kernel call under the SMEM table budget (tbl is lane-
    padded to 128 columns per slot; cok costs one padded row per slot).
    ``tcols`` is the number of per-time table columns (2 for the offset
    tables, 3 for the host-resolved fast tables, 1 for the uniform
    variant whose group table carries 3T columns instead of T)."""
    per_slot = (_round_up_int(int(tcols) * int(T), 128) + 128) * 4
    grp_cols = 2 * int(T) if int(tcols) == 1 else int(T)
    per_group = G * per_slot + _round_up_int(grp_cols, 128) * 4
    return max(1, min(int(NG), _SMEM_TABLE_BYTES // per_group))


def _grouped_device_tables(
    order, starts, G, S, dxs_np, dys_np, oy0, ox0, pad_rows, HG, W4, TBG, TH,
    SH, ROWS1, bounds_masks, cand_valid, cand_offset, T, uniform=False,
):
    """Build the grouped kernel's chunk-padded DEVICE tables plus the
    (fast_tables, slice_mode, NGC, n_chunks, uniform) decisions they
    encode.

    Fast-tables variant: the host pre-resolves the per-slot scalar math
    and the kernel slices only the parity half it needs. Applies when the
    stream is guarded (no masks) and the window clip provably never binds
    for any tile. ``uniform`` requires a uniform plan (and implies fast
    tables); it falls back to the regular fast path when the clip-freedom
    margins fail.
    """
    import os

    fast_tables = False
    slice_mode = os.environ.get("KB_GROUPED_SLICE", "win")
    if not bounds_masks and os.environ.get("KB_GROUPED_V2", "1") != "0":
        fast_kw = dict(cand_valid=cand_valid, cand_offset=cand_offset)
        tbl_f, grp8, cok_f, (g8_min, g8_max, rs_max) = _grouped_tables_fast(
            order, starts, G, dxs_np, dys_np, oy0, ox0, pad_rows,
            HG, W4, TBG, TH=TH if (slice_mode == "win" or uniform) else None,
            uniform=uniform, **fast_kw,
        )
        if not uniform and slice_mode == "win" and (rs_max // 8) * 8 + TH + 8 > TBG:
            # The minimal window cannot cover this spread; use the full
            # parity half instead.
            slice_mode = "half"
            tbl_f, grp8, cok_f, _ = _grouped_tables_fast(
                order, starts, G, dxs_np, dys_np, oy0, ox0,
                pad_rows, HG, W4, TBG, **fast_kw,
            )
        fast_tables = (
            g8_min >= 0
            and g8_max + (pl.cdiv(SH, TH) - 1) * TH + TBG <= ROWS1
            and rs_max + TH <= TBG
        )
    if fast_tables:
        tbl, grp, cok = tbl_f, grp8, cok_f
    else:
        uniform = False
        tbl, grp, cok = _grouped_tables(
            order, starts, G, dxs_np, dys_np, oy0, ox0, pad_rows, HG,
            cand_valid=cand_valid, cand_offset=cand_offset,
        )
    uniform = uniform and fast_tables
    NG = grp.shape[0]

    NGC = _grouped_cand_chunk(
        NG, T, G, tcols=1 if uniform else (3 if fast_tables else 2)
    )
    n_chunks = pl.cdiv(NG, NGC)
    # Pad to whole chunks with invalid groups (windows pinned at row 0).
    gpad = n_chunks * NGC - NG
    if gpad:
        tbl = np.concatenate([tbl, np.zeros((gpad * G, tbl.shape[1]), np.int32)], axis=0)
        grp = np.concatenate([grp, np.zeros((gpad, grp.shape[1]), np.int32)], axis=0)
        cok = np.concatenate([cok, np.zeros((gpad * G, 2), np.int32)], axis=0)
    return (
        jnp.asarray(tbl), jnp.asarray(grp), jnp.asarray(cok),
        fast_tables, slice_mode, NGC, n_chunks, uniform,
    )


_TABLE_CACHE = {}


def _grouped_device_tables_cached(
    order, starts, G, S, dxs_np, dys_np, oy0, ox0, pad_rows, HG, W4, TBG, TH,
    SH, ROWS1, bounds_masks, cand_valid, cand_offset, T, max_entries=4,
    uniform=False,
):
    """Content-keyed cache of :func:`_grouped_device_tables`, holding the
    tables ON DEVICE so repeated searches over the same grid (the
    steady-state production pattern) skip both the numpy build and the
    host->device upload."""
    import hashlib
    import os

    dxs_np = np.ascontiguousarray(dxs_np)
    dys_np = np.ascontiguousarray(dys_np)
    key = (
        hashlib.sha1(dxs_np).hexdigest(),
        hashlib.sha1(dys_np).hexdigest(),
        dys_np.shape,
        None if cand_valid is None
        else hashlib.sha1(np.ascontiguousarray(cand_valid)).hexdigest(),
        int(cand_offset), int(G), int(S), int(oy0), int(ox0), int(pad_rows),
        int(HG), int(W4), int(TBG), int(TH), int(SH), int(ROWS1),
        bool(bounds_masks),
        os.environ.get("KB_GROUPED_SLICE", "win"),
        os.environ.get("KB_GROUPED_V2", "1"),
        jax.default_backend(),
        # The plan identity (starts) is derived from dys/G/S but cheap to pin.
        len(starts),
        bool(uniform),
    )
    hit = _TABLE_CACHE.get(key)
    if hit is None or hit[0].is_deleted():
        hit = _grouped_device_tables(
            order, starts, G, S, dxs_np, dys_np, oy0, ox0, pad_rows, HG, W4,
            TBG, TH, SH, ROWS1, bounds_masks, cand_valid, cand_offset, T,
            uniform=uniform,
        )
        if len(_TABLE_CACHE) >= max_entries:
            _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
        _TABLE_CACHE[key] = hit
    return hit


def search_topk_paired_grouped(
    words_r,
    dxs,
    dys,
    min_obs,
    min_lh,
    encode_meta,
    *,
    shape,
    pad_rows,
    x_min,
    x_max,
    y_min,
    y_max,
    k_results,
    gate_min_obs=True,
    gate_min_lh=False,
    row_tile=None,
    interpret=False,
    cand_offset=0,
    cand_valid=None,
    group_size=8,
    spread=8,
    _plan=None,
):
    """Candidate-grouped paired search over a pre-packed dual-parity uint8
    word stream (from :func:`pack_psi_phi_words`). Identical outputs to
    :func:`search_topk_pallas_packed` (ties ordered by candidate index,
    which equals that kernel's arrival order). Requires concrete (host)
    ``dxs``/``dys`` — the grouping plan is data-dependent. ``_plan`` is
    the dispatcher's precomputed ``(order, starts)`` (avoids planning
    twice)."""
    import os

    T, H, W = (int(v) for v in shape)
    dxs_np = np.asarray(dxs, dtype=np.int32)
    dys_np = np.asarray(dys, dtype=np.int32)
    C = dxs_np.shape[0]
    SH = y_max - y_min
    SW = x_max - x_min
    K = int(k_results)
    G = int(group_size)
    S = int(spread)

    geom = _norm_geom(pad_rows)
    pad_rows = geom.pad_rows

    # Stripe guard: run oversized searches in disjoint row stripes
    # (output rows are independent; concatenated results are identical).
    # Two bounds, the stricter wins:
    #   * HBM — a full-frame 4k search's top-K maps (K, SH, SW) cost
    #     ~1 GB apiece and the chunk loop keeps several live (carry
    #     double-buffers + the current chunk + merge scratch) beside the
    #     multi-GB word stream.
    #   * per-execution work — one XLA program scanning the full survey
    #     grid over a full 4k frame runs for minutes; bounding the
    #     slot-steps per dispatch keeps each program short (tolerant of
    #     RPC/tunnel execution deadlines, measured to kill the TPU worker
    #     past ~90 s here, and a finer interrupt/checkpoint grain).
    if SH >= 512:
        stream_bytes = int(words_r.size) * 4
        map_bytes = 2 * K * SH * (-(-SW // 2) * 2) * 4  # lh f32 + idx i32
        budget = float(os.environ.get("KB_HBM_BUDGET_GB", "12.5")) * 2**30
        avail = budget - stream_bytes
        n_mem = (
            int(np.ceil(6 * map_bytes / avail))
            if avail > 0 and 6 * map_bytes > avail
            else 1
        )
        max_steps = float(os.environ.get("KB_MAX_EXEC_SLOTSTEPS", "1e13"))
        n_work = (
            int(np.ceil(float(C) * SH * SW * T / max_steps)) if max_steps > 0 else 1
        )
        # Best-effort: stripes no finer than 256 rows (a finer split would
        # need a candidate axis; at 256 rows even extreme T/C configs stay
        # well under the ~90 s execution ceiling measured on v5e).
        n_str = min(max(n_mem, n_work), SH // 256)
        if n_str > 1:
            rows = -(-SH // n_str)
            rows = _round_up(rows, 8)
            outs = []
            for y0 in range(y_min, y_max, rows):
                outs.append(
                    search_topk_paired_grouped(
                        words_r, dxs, dys, min_obs, min_lh, encode_meta,
                        shape=shape, pad_rows=geom,
                        x_min=x_min, x_max=x_max,
                        y_min=y0, y_max=min(y0 + rows, y_max),
                        k_results=k_results,
                        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                        row_tile=row_tile, interpret=interpret,
                        cand_offset=cand_offset, cand_valid=cand_valid,
                        group_size=group_size, spread=spread, _plan=_plan,
                    )
                )
            return (
                jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1),
            )
    HG = H + geom.row_guard
    SW4 = pl.cdiv(SW, 2)
    W4 = words_r.shape[1]
    base_rows = T * HG + 2 * pad_rows
    ROWS1 = _round_up(base_rows, 8)
    if words_r.shape[0] != 2 * ROWS1:
        raise ValueError("grouped search needs the dual-parity uint8 stream")
    if W4 < _round_up(max(pl.cdiv(W, 2), SW4), 128):
        raise ValueError(
            f"packed stream W4={W4} too narrow for this search window; "
            f"repack with sw_max >= {SW}"
        )

    FLUSH = 0 if T <= 257 else 255
    DD = max(1, min(int(T), int(os.environ.get("KB_GROUPED_DD", "2"))))
    # uint16 candidate indices (opt-in): halves that output's VMEM.
    # Measured performance-neutral on v5e at the default tiles (the 16-bit
    # relayouts in the rank-insert cost about what the headroom returns;
    # docs/STATUS.md), so the canonical int32 path stays the default.
    idx16 = (
        os.environ.get("KB_GROUPED_IDX16", "0") == "1"
        and int(cand_offset) + C - 1 < (1 << 16) - 1
        and int(cand_offset) >= 0
    )
    row_tile_explicit = row_tile is not None
    if row_tile is None:
        row_tile = _grouped_row_tile(
            SH, SW4, W4, K, DD, G, S, wide=bool(FLUSH), idx16=idx16
        )
    TH = int(row_tile)
    n_ty = pl.cdiv(SH, TH)
    SH_pad = n_ty * TH
    if pad_rows < _round_up(SH_pad + H + 16 + S, 8):
        raise ValueError(
            f"packed stream pad_rows={pad_rows} too small; repack with sh_max >= {SH}"
        )

    order, starts = _plan_groups(dys_np, G, S) if _plan is None else _plan
    bounds_masks = not _bounds_free(
        int(x_min) + dxs_np, int(y_min) + dys_np,
        W=W, H=H, W4=W4, SW4=SW4, SH_pad=SH_pad, geom=geom, row_slack=8 + S,
    )

    # Uniform (exact-row) plan: real survey grids (velocity x angle
    # lattices) collapse to a few hundred distinct row sequences, so
    # groups whose members share EVERY per-time row cover ~98% of the
    # default grid. The uniform kernel hoists the window slice + sublane
    # roll out of the per-candidate loop and runs spread-0 windows; worth
    # it unless the class structure is too ragged (slot overhead bound).
    # NOTE: parallel/sharded.py mirrors this engagement logic per shard
    # (global decision over the mesh) — keep the two in sync.
    uniform = False
    if (
        os.environ.get("KB_GROUPED_UNIFORM", "1") != "0"
        and os.environ.get("KB_GROUPED_V2", "1") != "0"
    ):
        # Note: judged on the uniform plan's OWN spread-0 geometry — a
        # stream that needs masks at S=8 can still be guard-free at S=0.
        # Wider groups amortize the shared subroll and the window DMA
        # over more candidates (measured +12% at G=16 vs 8 on the default
        # survey grid), so prefer the widest uniform G whose padding-slot
        # overhead stays bounded relative to the spread plan's slots.
        slots_spread = len(starts) * G
        G_wide = int(os.environ.get("KB_GROUP_G_UNIFORM", "16"))
        for G_u in dict.fromkeys((G_wide, G)):
            order_u, starts_u = _plan_groups_cached(dys_np, G_u, 0, uniform=True)
            if len(starts_u) * G_u > max(1.25 * slots_spread, slots_spread + 2 * G_u):
                continue
            S_u = 0
            TH_u = TH if row_tile_explicit else int(
                _grouped_row_tile(
                    SH, SW4, W4, K, DD, G_u, S_u,
                    wide=bool(FLUSH), idx16=idx16, uniform=True,
                )
            )
            n_ty_u = pl.cdiv(SH, TH_u)
            SH_pad_u = n_ty_u * TH_u
            if pad_rows >= _round_up(SH_pad_u + H + 16 + S_u, 8) and _bounds_free(
                int(x_min) + dxs_np, int(y_min) + dys_np,
                W=W, H=H, W4=W4, SW4=SW4, SH_pad=SH_pad_u, geom=geom,
                row_slack=8 + S_u,
            ):
                uniform = True
                bounds_masks = False
                order, starts = order_u, starts_u
                S, TH, n_ty, SH_pad = S_u, TH_u, n_ty_u, SH_pad_u
                G = G_u
                break
    TBG = TH + 8 + S

    # Device-table construction is content-cached: steady-state production
    # runs (and benchmarks) repeat the same grid over the same window, and
    # the host-side table build + upload (~tens of MB for the default
    # survey grid) would otherwise sit in every call's critical path.
    tbl_j, grp_j, cok_j, fast_tables, slice_mode, NGC, n_chunks, uniform = (
        _grouped_device_tables_cached(
            order, starts, G, S, dxs_np, dys_np,
            int(y_min), int(x_min), pad_rows, HG, W4, TBG, TH,
            int(SH), ROWS1, bounds_masks,
            None if cand_valid is None else np.asarray(cand_valid),
            int(cand_offset), T, uniform=uniform,
        )
    )

    top_lh, top_idx = _paired_grouped_jit(
        words_r, tbl_j, grp_j, cok_j,
        jnp.asarray(encode_meta, dtype=jnp.float32).reshape(4),
        jnp.float32(min_obs), jnp.float32(min_lh),
        T=T, H=H, HG=HG, W=W, W4=W4, TH=TH, SW4=SW4, K=K, DD=DD, S=S, G=G,
        ROWS1=ROWS1, pad_rows=pad_rows, SH_pad=SH_pad, n_ty=n_ty,
        NGC=NGC, n_chunks=n_chunks,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, interpret=interpret,
        bounds_masks=bounds_masks,
        fast_tables=fast_tables,
        slice_mode=(
            ("uwhere" if os.environ.get("KB_UNIFORM_SEL", "slice") == "where" else "uslice")
            if uniform
            else (slice_mode if fast_tables else "roll")
        ),
        FLUSH=FLUSH, idx16=idx16, uniform=uniform,
        scan_chunks=int(os.environ.get("KB_GROUPED_SCAN_CHUNKS", "8")),
    )
    return top_lh[:, :SH, :SW], top_idx[:, :SH, :SW]


@functools.partial(
    jax.jit,
    static_argnames=(
        "T", "H", "HG", "W", "W4", "TH", "SW4", "K", "DD", "S", "G",
        "ROWS1", "pad_rows", "SH_pad", "n_ty", "NGC", "n_chunks",
        "gate_min_obs", "gate_min_lh", "interpret", "bounds_masks",
        "fast_tables", "slice_mode", "FLUSH", "idx16", "uniform",
        "scan_chunks",
    ),
)
def _paired_grouped_jit(words_r, tbl, grp, cok, em, min_obs, min_lh, **statics):
    return _paired_grouped_traced(
        words_r, tbl, grp, cok, em, min_obs, min_lh, **statics
    )


def _paired_grouped_traced(
    words_r, tbl, grp, cok, em, min_obs, min_lh,
    *, T, H, HG, W, W4, TH, SW4, K, DD, S, G, ROWS1, pad_rows, SH_pad, n_ty,
    NGC, n_chunks, gate_min_obs, gate_min_lh, interpret, bounds_masks=True,
    fast_tables=False, slice_mode="roll", FLUSH=0, idx16=False, uniform=False,
    scan_chunks=None,
):
    """Traced body of the grouped search: also called from inside
    shard_map programs (parallel/sharded.py), where the tables arrive as
    mesh-sharded per-device slices."""
    kernel = functools.partial(
        _search_kernel_paired_grouped,
        T=T, H=H, HG=HG, W=W, W4=W4, TH=TH, SW4=SW4, K=K, DD=DD, S=S, G=G,
        ROWS1=ROWS1, pad_rows=pad_rows,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
        bounds_masks=bounds_masks,
        fast_tables=fast_tables, slice_mode=slice_mode, FLUSH=FLUSH,
        idx16=idx16, uniform=uniform,
    )
    idx_dtype = jnp.uint16 if idx16 else jnp.int32
    TBG = TH + 8 + S

    def call_chunk(tbl_c, grp_c, cok_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_ty, grp_c.shape[0]),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=tuple(
                pl.BlockSpec((K, TH, SW4), lambda ty, c, *prefetch: (0, ty, 0))
                for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((DD, 2 * TBG, W4), jnp.int32),
                pltpu.SemaphoreType.DMA((DD, 2)),
            ],
        )
        n_slots = grp_c.shape[0] * G
        cost = pl.CostEstimate(
            flops=2 * n_slots * T * SH_pad * (SW4 * 2),
            bytes_accessed=grp_c.shape[0] * T * 2 * TBG * W4 * 4 * n_ty,
            transcendentals=n_slots * SH_pad * SW4 * 2,
        )
        out_shapes = tuple(
            jax.ShapeDtypeStruct((K, SH_pad, SW4), jnp.float32) for _ in range(2)
        ) + tuple(jax.ShapeDtypeStruct((K, SH_pad, SW4), idx_dtype) for _ in range(2))
        scalars = jnp.concatenate(
            [
                jnp.stack(
                    [
                        jnp.asarray(min_obs, jnp.float32),
                        jnp.asarray(min_lh, jnp.float32),
                        jnp.float32(0.0),
                        jnp.float32(0.0),
                    ]
                ),
                em,
            ]
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(tbl_c, grp_c, cok_c, scalars, words_r)
        lh_i = jnp.stack(outs[:2], axis=-1).reshape(K, SH_pad, SW4 * 2)
        idx_i = jnp.stack(outs[2:], axis=-1).reshape(K, SH_pad, SW4 * 2)
        if idx16:
            # Back to the canonical int32 indices with -1 empties.
            idx_i = jnp.where(
                idx_i == (1 << 16) - 1, jnp.int32(-1), idx_i.astype(jnp.int32)
            )
        return lh_i, idx_i

    # Many-chunk searches (full 4k frames over the full survey grid span
    # ~180 SMEM table chunks) roll the chunk loop into a fori_loop: ONE
    # pallas_call in the program (compile time and HLO size stay O(1)) and
    # provably one live chunk-output buffer beside the carried top-K.
    # The carry starts as a kernel-empty map (-FLT_MAX, -1), which the
    # tie-ranked merge treats as a bit-exact no-op, so the rolled loop
    # produces the unrolled path's results exactly.
    if scan_chunks is None:
        scan_chunks = int(os.environ.get("KB_GROUPED_SCAN_CHUNKS", "8"))
    if n_chunks > max(1, int(scan_chunks)):
        def chunk_body(ci, carry):
            top_lh, top_idx = carry
            tbl_c = lax.dynamic_slice_in_dim(tbl, ci * NGC * G, NGC * G, 0)
            grp_c = lax.dynamic_slice_in_dim(grp, ci * NGC, NGC, 0)
            cok_c = lax.dynamic_slice_in_dim(cok, ci * NGC * G, NGC * G, 0)
            lh_c, idx_c = call_chunk(tbl_c, grp_c, cok_c)
            return _merge_pair_banded(top_lh, top_idx, lh_c, idx_c, K)

        init = (
            jnp.full((K, SH_pad, SW4 * 2), -FLT_MAX, dtype=jnp.float32),
            jnp.full((K, SH_pad, SW4 * 2), -1, dtype=jnp.int32),
        )
        return lax.fori_loop(0, n_chunks, chunk_body, init)

    top_lh = top_idx = None
    for ci in range(n_chunks):
        gsl = slice(ci * NGC, (ci + 1) * NGC)
        ssl = slice(ci * NGC * G, (ci + 1) * NGC * G)
        lh_c, idx_c = call_chunk(tbl[ssl], grp[gsl], cok[ssl])
        if top_lh is None:
            top_lh, top_idx = lh_c, idx_c
        else:
            top_lh, top_idx = _merge_pair_banded(top_lh, top_idx, lh_c, idx_c, K)
    return top_lh, top_idx


class PackGeom(typing.NamedTuple):
    """Geometry of a packed word stream. Returned by
    :func:`pack_psi_phi_words` and passed back to the search wrappers as
    the (static, hashable) ``pad_rows`` argument. ``row_guard`` zero rows
    separate adjacent time planes and ``col_slack`` zero words pad each
    row past the image — sized so every out-of-bounds read lands on
    zeros, which lets the paired kernels drop their bounds masks entirely
    (zero code pairs self-exclude from the sums and the obs indicator,
    so results are bit-identical)."""

    pad_rows: int
    row_guard: int = 0
    col_slack: int = 0


def _norm_geom(pad_rows):
    """Accept a plain int (legacy guardless streams) or a PackGeom."""
    if isinstance(pad_rows, PackGeom):
        return pad_rows
    return PackGeom(int(pad_rows), 0, 0)


def canonical_pack_guards(min_row_guard, min_col_slack):
    """Bucket request-driven guard sizes onto the coarse lattice
    {256, 512, 1024, ...}.

    Stream shapes are compile keys: every distinct (row_guard, col_slack)
    produces a distinct packed-stream shape and therefore a distinct
    compiled executable — before bucketing, the pipeline, the gate
    scripts, and the benches each derived slightly different guards for
    the SAME search and re-compiled the same 4k kernels per script
    (300-460 s each on a v5e, uncacheable across the fleet of entry
    points). Bucketing collapses every search over the same stack with a
    similar reach onto ONE canonical stream shape, so the persistent
    compile cache serves them all. Explicitly-passed guard sizes bypass
    this (tests/debugging); the production resolution
    (PsiPhiArray.packed_words) and the survey scripts route through it.
    """
    def _bucket(v):
        b = 256  # the floor the old resolution used (max(256, request))
        while b < v:
            b *= 2
        return b

    # Deliberately no image-size cap: capping below the request would
    # disengage the mask-free fast path on small fixtures whose reach
    # exceeds the frame (the old resolution also floored at 256
    # regardless of image size).
    return _bucket(int(min_row_guard)), _bucket(int(min_col_slack))


def auto_pack_guards(dxs, dys):
    """Canonical guard sizes for a concrete trajectory reach: the minimum
    row/column guards that keep every read of the mask-free kernel
    variants on guard zeros (reach + the kernels' window spread), bucketed
    by :func:`canonical_pack_guards` so same-stack searches share one
    stream shape/executable."""
    min_guard = int(np.abs(np.asarray(dys)).max()) + 56
    min_slack = int(np.abs(np.asarray(dxs)).max()) // 2 + 56
    return canonical_pack_guards(min_guard, min_slack)


def _pack_guards(H, W, COLS, SW4, row_guard, col_slack):
    """Resolve the packer's guard sizes (env defaults, caps, rounding) and
    the resulting padded row width. Guards wider than the image cover only
    all-out-of-bounds windows, which the masked fallback handles — the
    defaults cap at the image size so small stacks don't balloon."""
    import os

    if row_guard is None:
        row_guard = min(int(os.environ.get("KB_PACK_GUARD", "256")), _round_up_int(H, 8))
    if col_slack is None:
        col_slack = min(
            int(os.environ.get("KB_PACK_COLSLACK", "256")),
            _round_up_int(pl.cdiv(W, COLS), 128),
        )
    row_guard = _round_up_int(int(row_guard), 8) if row_guard else 0
    col_slack = _round_up_int(int(col_slack), 128) if col_slack else 0
    W4 = _round_up(max(pl.cdiv(W, COLS) + col_slack, SW4), 128)
    return row_guard, col_slack, W4


def packed_stream_bytes(T, H, W, itemsize=1, sw_max=None, sh_max=None,
                        row_guard=None, col_slack=None, paired=None):
    """Exact device size in bytes of :func:`pack_psi_phi_words`'s output
    for a (T, H, W) code stack — the dominant HBM term at survey scale
    (~8.3 GB for 100 x 4096^2 uint8 with the default guards), used by the
    written HBM budget (:func:`kbmod_tpu.ops.search.estimate_search_hbm`).

    Mirrors the layout arithmetic of the packer itself: guard resolution
    via :func:`_pack_guards`, ``pad_rows`` upper bound, the dual-parity
    doubling for the uint8 paired layout.
    """
    import os

    COLS = 2 if itemsize == 1 else 1
    sw_max = W if sw_max is None else int(sw_max)
    sh_max = H if sh_max is None else int(sh_max)
    SW4 = pl.cdiv(sw_max, COLS)
    pad_rows = _round_up(sh_max + 256 + H + 16, 8)
    row_guard, col_slack, W4 = _pack_guards(H, W, COLS, SW4, row_guard, col_slack)
    if paired is None:
        paired = itemsize == 1 and os.environ.get("KB_PAIRED_KERNEL", "1") != "0"
    HG = H + row_guard
    if paired:
        ROWS1 = _round_up(T * HG + 2 * pad_rows, 8)
        return 2 * ROWS1 * W4 * 4
    return (T * HG + 2 * pad_rows) * W4 * 4


def pack_psi_phi_words(
    psi_codes, phi_codes, sw_max=None, sh_max=None, t_chunk=8,
    row_guard=None, col_slack=None,
):
    """Pack quantized psi/phi code stacks into the kernel's interleaved
    int32 word stream with bounded device memory.

    The in-wrapper packing of search_topk_pallas_encoded materializes
    several stack-sized temporaries at once — fine at bench scale, OOM at
    survey scale (100 x 4k x 4k u8 is 3.4GB per temporary). This packer
    streams host chunks of ``t_chunk`` time planes through the interleave,
    so peak device memory is one output stream plus one chunk.

    Returns ``(words_r, geom)`` for :func:`search_topk_pallas_packed`
    (``geom`` is a :class:`PackGeom`; legacy callers that treat it as the
    ``pad_rows`` value still work — it is passed back whole).
    ``sw_max``/``sh_max`` bound the search window sizes the packed stream
    will be used with (default: the image dimensions).

    ``row_guard``/``col_slack`` (uint8 paired layout only) insert zero
    guard rows between time planes and zero words past each row so that
    searches whose row/column reach fits inside them run the mask-free
    kernel variant (~20% faster at survey scale; the wrapper checks the
    actual trajectory reach per call and keeps the masked variant when it
    doesn't fit). Defaults come from KB_PACK_GUARD / KB_PACK_COLSLACK
    (256 each); pass 0 to disable the padding.
    """
    import os

    # Device-resident codes (the streaming quantized build) slice on
    # device below; only coerce hostward when given lists/other hosts.
    if not isinstance(psi_codes, (np.ndarray, jax.Array)):
        psi_codes = np.asarray(psi_codes)
    if not isinstance(phi_codes, (np.ndarray, jax.Array)):
        phi_codes = np.asarray(phi_codes)
    T, H, W = psi_codes.shape
    if psi_codes.dtype == np.uint8:
        COLS = 2
    elif psi_codes.dtype == np.uint16:
        COLS = 1
    else:
        raise ValueError(f"encoded search needs uint8/uint16 codes, got {psi_codes.dtype}")
    sw_max = W if sw_max is None else int(sw_max)
    sh_max = H if sh_max is None else int(sh_max)
    SW4 = pl.cdiv(sw_max, COLS)
    # Upper bound over any row_tile choice (row tiles cap at 256).
    pad_rows = _round_up(sh_max + 256 + H + 16, 8)

    row_guard, col_slack, W4 = _pack_guards(H, W, COLS, SW4, row_guard, col_slack)

    # The dual-parity layout serves both the per-candidate paired kernel
    # (T <= 257) and the grouped kernel, whose FLUSH stage removes the T
    # cap — so pack it for ANY uint8 stack (the T > 257 per-class
    # fallback reads parity 0 of the same stream).
    if psi_codes.dtype == np.uint8 and os.environ.get("KB_PAIRED_KERNEL", "1") != "0":
        HG = H + row_guard
        # Dual-parity layout for the paired kernel: stream 0, then the
        # one-column-shifted stream, each zero-padded to ROWS1 rows so
        # parity selection preserves 8-row DMA alignment. The stream is
        # assembled with donated in-place updates — peak device memory is
        # one stream plus one chunk (a concat would double it, which OOMs
        # at survey scale).
        ROWS1 = _round_up(T * HG + 2 * pad_rows, 8)

        pack = jax.jit(
            lambda p, f: tuple(
                s.reshape(-1, W4) for s in _interleave_words_paired(p, f, W4)
            )
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def upd2(buf, s0_c, s1_c, row0):
            buf = lax.dynamic_update_slice(buf, s0_c, (row0, jnp.int32(0)))
            return lax.dynamic_update_slice(
                buf, s1_c, (row0 + jnp.int32(ROWS1), jnp.int32(0))
            )

        words_r = jnp.zeros((2 * ROWS1, W4), dtype=jnp.int32)
        for t0 in range(0, T, int(t_chunk)):
            t1 = min(T, t0 + int(t_chunk))
            s0_c, s1_c = pack(jnp.asarray(psi_codes[t0:t1]), jnp.asarray(phi_codes[t0:t1]))
            # With guard rows the per-chunk planes are not contiguous in
            # the stream; update plane by plane within the chunk.
            if row_guard:
                for ti in range(t0, t1):
                    o = (ti - t0) * H
                    words_r = upd2(
                        words_r, s0_c[o : o + H], s1_c[o : o + H],
                        jnp.int32(pad_rows + ti * HG),
                    )
            else:
                words_r = upd2(words_r, s0_c, s1_c, jnp.int32(pad_rows + t0 * H))
        return words_r, PackGeom(pad_rows, row_guard, col_slack)

    # Per-class (single-stream) layout: uint16 codes, or uint8 with
    # T > 257. The same guard geometry applies (zero rows between planes,
    # zero slack words past each row), enabling the mask-free kernel
    # variant when a search's trajectory reach fits.
    pack = jax.jit(
        lambda p, f: _interleave_words(p, f, W4, COLS).reshape(-1, W4),
        static_argnames=(),
    )
    guard = jnp.zeros((row_guard, W4), dtype=jnp.int32)
    parts = [jnp.zeros((pad_rows, W4), dtype=jnp.int32)]
    for t0 in range(0, T, int(t_chunk)):
        t1 = min(T, t0 + int(t_chunk))
        chunk = pack(jnp.asarray(psi_codes[t0:t1]), jnp.asarray(phi_codes[t0:t1]))
        if row_guard:
            for ti in range(t1 - t0):
                parts.append(chunk[ti * H : (ti + 1) * H])
                parts.append(guard)
        else:
            parts.append(chunk)
    parts.append(parts[0])
    words_r = jnp.concatenate(parts, axis=0)
    return words_r, PackGeom(pad_rows, row_guard, col_slack)


_DEDUP_CACHE = {}


def _dedup_plan_cached(dxs_np, dys_np, min_factor, max_entries=8):
    """Content-keyed cache around :func:`_dedup_plan` (same rationale as
    :func:`_plan_groups_cached`: steady-state searches reuse one grid)."""
    import hashlib

    dxs_np = np.ascontiguousarray(dxs_np)
    dys_np = np.ascontiguousarray(dys_np)
    key = (
        hashlib.sha1(dxs_np).hexdigest(),
        hashlib.sha1(dys_np).hexdigest(),
        dxs_np.shape,
        str(dxs_np.dtype),
        dys_np.shape,
        str(dys_np.dtype),
        float(min_factor),
    )
    if key not in _DEDUP_CACHE:
        if len(_DEDUP_CACHE) >= max_entries:
            _DEDUP_CACHE.pop(next(iter(_DEDUP_CACHE)))
        _DEDUP_CACHE[key] = _dedup_plan(dxs_np, dys_np, min_factor)
    return _DEDUP_CACHE[key]


def _dedup_plan(dxs_np, dys_np, min_factor):
    """Collapse candidates whose rounded pixel-offset sequences are
    identical into offset classes.

    Distinct (vx, vy) pairs frequently round to the same integer offsets —
    the reference's default survey grid (configuration.py:196-207) has
    33,153 candidates but only ~23k distinct offset sequences over a
    4-day baseline — yet the reference scores every duplicate from scratch
    (kernels.cu:252-332 loops all trajectories). Scoring depends on the
    offsets alone, so each class is searched once and the top-K maps are
    expanded back to original candidate indices afterwards
    (:func:`_expand_topk_classes`).

    Returns ``None`` when C/n_classes < min_factor, else
    ``(u_dxs, u_dys, members, counts)`` with classes ordered by FIRST
    OCCURRENCE so the kernel's tie ordering by class index agrees with
    tie ordering by each class's minimum original index; ``members`` is
    (n_classes, max_count) int32, -1 padded, each row the class's original
    candidate indices ascending.
    """
    C, T = dys_np.shape
    dd = np.concatenate(
        [dxs_np.astype(np.int32, copy=False), dys_np.astype(np.int32, copy=False)],
        axis=1,
    )
    _, first_idx, inv = np.unique(dd, axis=0, return_index=True, return_inverse=True)
    n = len(first_idx)
    if n == C or C < min_factor * n:
        return None
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    cls = rank[inv.reshape(-1)]  # per-candidate class id, first-occurrence order
    counts = np.bincount(cls, minlength=n).astype(np.int32)
    members = np.full((n, int(counts.max())), -1, dtype=np.int32)
    by_cls = np.argsort(cls, kind="stable")  # class-major, index-ascending
    starts = np.cumsum(counts) - counts
    cols = np.arange(C) - starts[cls[by_cls]]
    members[cls[by_cls], cols] = by_cls
    reps = first_idx[order]
    return (
        np.ascontiguousarray(dxs_np[reps]),
        np.ascontiguousarray(dys_np[reps]),
        members,
        counts,
    )


def _expand_topk_classes(top_lh, top_idx, members, row_band=None):
    """Expand per-pixel top-K OFFSET-CLASS maps into top-K ORIGINAL-candidate
    maps (inverse of :func:`_dedup_plan`). BIT-EXACT, ties included.

    Each class slot (lh, class) expands to that class's members — all with
    the identical lh, ascending index order — and the merged per-pixel
    stream is sorted by (lh desc, idx asc), the per-candidate kernels'
    exact ordering, THEN truncated back to K. Exactness: a candidate of a
    class OUTSIDE the kernel's top-K classes cannot belong to the true
    top-K — each of the K better-ranked classes contributes at least its
    minimum member strictly ahead of it (higher lh, or equal lh and a
    smaller index, by the first-occurrence class ordering) — and likewise
    a class's (K+1)-th member trails K of its own, so per-class
    contributions clip to K and the dense (K, min(M, K)) merge is exact.
    """
    K, SH, SW = top_lh.shape
    n = members.shape[0]
    Km = min(members.shape[1], K)
    # Class -1 (empty slot) indexes the sentinel tail row: all members -1.
    members_j = jnp.asarray(
        np.concatenate([members[:, :Km], np.full((1, Km), -1, np.int32)])
    )
    int_max = np.int32(np.iinfo(np.int32).max)
    # Band rows so each dense (K*Km, rows*SW) intermediate stays <= 2^24
    # elements (64 MB at f32). exp_lh, key_idx, and both lax.sort outputs
    # are live at once, so total peak is ~4x that (~256 MB) — well inside
    # the KB_HBM_BUDGET_GB accounting the stripe guard uses.
    if row_band is None:
        row_band = max(8, (1 << 24) // max(K * Km * SW, 1))
    out_lh, out_idx = [], []
    for y0 in range(0, SH, row_band):
        rows = top_lh[:, y0 : y0 + row_band].shape[1]
        lh = top_lh[:, y0 : y0 + row_band].reshape(K, 1, -1)
        idx = top_idx[:, y0 : y0 + row_band].reshape(K, -1)
        mem = members_j[jnp.where(idx >= 0, idx, n)]  # (K, P, Km)
        mem = jnp.transpose(mem, (0, 2, 1))  # (K, Km, P)
        exp_lh = jnp.where(mem >= 0, lh, -FLT_MAX).reshape(K * Km, -1)
        key_idx = jnp.where(mem >= 0, mem, int_max).reshape(K * Km, -1)
        # (lh desc, idx asc): sort ascending on (-lh, idx); empties last.
        neg_s, idx_s = lax.sort((-exp_lh, key_idx), dimension=0, num_keys=2, is_stable=True)
        out_lh.append((-neg_s[:K]).reshape(K, rows, SW))
        out_idx.append(jnp.where(idx_s[:K] == int_max, -1, idx_s[:K]).reshape(K, rows, SW))
    if len(out_lh) == 1:
        return out_lh[0], out_idx[0]
    return jnp.concatenate(out_lh, axis=1), jnp.concatenate(out_idx, axis=1)


def search_topk_pallas_packed(
    words_r,
    dxs,
    dys,
    min_obs,
    min_lh,
    encode_meta,
    **kwargs,
):
    """Packed-stream search dispatcher: the candidate-grouped paired kernel
    when it applies (uint8 dual-parity stream, concrete offsets, a grouping
    plan that actually amortizes the window DMAs), else the per-candidate
    jitted kernel. Identical outputs either way (exact likelihood ties
    order by candidate index = the per-candidate kernels' arrival order)."""
    import os

    concrete = (
        kwargs.get("x_origin") is None
        and kwargs.get("y_origin") is None
        and not any(
            isinstance(v, jax.core.Tracer)
            for v in (dxs, dys, kwargs.get("cand_valid"), kwargs.get("cand_offset", 0))
        )
    )
    if (
        concrete
        and os.environ.get("KB_DEDUP_CANDIDATES", "1") != "0"
        and kwargs.get("cand_valid") is None
        and not kwargs.get("cand_offset", 0)
    ):
        # Offset-class dedup: distinct (vx, vy) that round to identical
        # pixel-offset sequences score identically, so search each class
        # once and expand the maps back to original candidate indices.
        dedup = _dedup_plan_cached(
            np.asarray(dxs, np.int32),
            np.asarray(dys, np.int32),
            float(os.environ.get("KB_DEDUP_MIN_FACTOR", "1.1")),
        )
        if dedup is not None:
            u_dxs, u_dys, members, counts = dedup
            top_lh, top_idx = search_topk_pallas_packed(
                words_r, u_dxs, u_dys, min_obs, min_lh, encode_meta, **kwargs
            )
            return _expand_topk_classes(top_lh, top_idx, members)
    paired = False
    paired_stream = False
    if concrete:
        T, H, W = (int(v) for v in kwargs["shape"])
        geom = _norm_geom(kwargs["pad_rows"])
        base_rows = T * (H + geom.row_guard) + 2 * geom.pad_rows
        paired_stream = (
            kwargs.get("bits") == 8
            and os.environ.get("KB_PAIRED_KERNEL", "1") != "0"
            and words_r.shape[0] == 2 * _round_up(base_rows, 8)
        )
        # The per-candidate paired kernel keeps the T <= 257 field-sum
        # cap; the GROUPED kernel removes it by flushing into wide
        # accumulators, so long stacks stay on the fast path.
        paired = paired_stream and _use_paired(jnp.uint8, T)
    if (
        paired_stream
        and os.environ.get("KB_GROUPED", "1") != "0"
        # A caller-tuned row_tile or explicit mask choice targets the
        # per-candidate kernel, whose VMEM budget differs — honor it there.
        and kwargs.get("row_tile") is None
        and "bounds_masks" not in kwargs
    ):
        G = int(os.environ.get("KB_GROUP_G", "8"))
        S = int(os.environ.get("KB_GROUP_S", "8"))
        dys_np = np.asarray(dys, dtype=np.int32)
        C = dys_np.shape[0]
        order, starts = _plan_groups_cached(dys_np, G, S)
        # Only worth it when groups actually fill (sparse plans would pay
        # G-way unrolled compute on mostly-invalid slots).
        if len(starts) * G <= max(1.6 * C, C + 4 * G):
            kw = {
                k: v
                for k, v in kwargs.items()
                if k not in ("bits", "x_origin", "y_origin", "row_tile")
            }
            return search_topk_paired_grouped(
                words_r, np.asarray(dxs, np.int32), dys_np,
                min_obs, min_lh, encode_meta,
                group_size=G, spread=S, _plan=(order, starts), **kw,
            )
    if concrete:
        # Same stripe guard as the grouped path (which stripes internally):
        # bound the per-candidate kernels' live top-K maps and the work per
        # XLA program by splitting oversized searches into independent row
        # stripes. Identical results (output rows are independent).
        SH_d = int(kwargs["y_max"]) - int(kwargs["y_min"])
        SW_d = int(kwargs["x_max"]) - int(kwargs["x_min"])
        if SH_d >= 512:
            K_d = int(kwargs["k_results"])
            C_d = int(np.asarray(dys).shape[0])
            stream_bytes = int(words_r.size) * 4
            map_bytes = 2 * K_d * SH_d * (-(-SW_d // 2) * 2) * 4
            budget = float(os.environ.get("KB_HBM_BUDGET_GB", "12.5")) * 2**30
            avail = budget - stream_bytes
            n_mem = (
                int(np.ceil(6 * map_bytes / avail))
                if avail > 0 and 6 * map_bytes > avail
                else 1
            )
            max_steps = float(os.environ.get("KB_MAX_EXEC_SLOTSTEPS", "1e13"))
            n_work = (
                int(np.ceil(float(C_d) * SH_d * SW_d * T / max_steps))
                if max_steps > 0
                else 1
            )
            n_str = min(max(n_mem, n_work), SH_d // 256)
            if n_str > 1:
                rows = _round_up(-(-SH_d // n_str), 8)
                y_min0, y_max0 = int(kwargs["y_min"]), int(kwargs["y_max"])
                outs = []
                for y0 in range(y_min0, y_max0, rows):
                    kw = dict(kwargs)
                    kw["y_min"], kw["y_max"] = y0, min(y0 + rows, y_max0)
                    outs.append(
                        search_topk_pallas_packed(
                            words_r, dxs, dys, min_obs, min_lh, encode_meta, **kw
                        )
                    )
                return (
                    jnp.concatenate([o[0] for o in outs], axis=1),
                    jnp.concatenate([o[1] for o in outs], axis=1),
                )
    if concrete and "bounds_masks" not in kwargs:
        # Per-candidate kernels, concrete offsets: still pick the mask-free
        # variant when every read lands on the stream's zero guards
        # (paired and per-class/u16 layouts alike).
        COLS = 2 if paired else 32 // (2 * int(kwargs["bits"]))
        SH = int(kwargs["y_max"]) - int(kwargs["y_min"])
        SW = int(kwargs["x_max"]) - int(kwargs["x_min"])
        SW4 = pl.cdiv(SW, COLS)
        W4 = words_r.shape[1]
        if paired:
            TH = int(
                kwargs.get("row_tile")
                or _paired_row_tile(SH, SW4, W4, int(kwargs["k_results"]), min(T, 4))
            )
        else:
            TH = int(
                kwargs.get("row_tile")
                or _encoded_row_tile(SH, SW4, COLS, W4, int(kwargs["k_results"]))
            )
        SH_pad = pl.cdiv(SH, TH) * TH
        kwargs["bounds_masks"] = not _bounds_free(
            int(kwargs["x_min"]) + np.asarray(dxs, np.int64),
            int(kwargs["y_min"]) + np.asarray(dys, np.int64),
            W=W, H=H, W4=W4, SW4=SW4, SH_pad=SH_pad, geom=geom, row_slack=8,
            cols=COLS, paired=paired,
        )
    return _search_topk_pallas_packed_jit(
        words_r, dxs, dys, min_obs, min_lh, encode_meta, **kwargs
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape", "bits", "pad_rows",
        "x_min", "x_max", "y_min", "y_max", "k_results",
        "gate_min_obs", "gate_min_lh", "row_tile", "interpret", "bounds_masks",
    ),
)
def _search_topk_pallas_packed_jit(
    words_r,
    dxs,
    dys,
    min_obs,
    min_lh,
    encode_meta,
    *,
    shape,
    bits,
    pad_rows,
    x_min,
    x_max,
    y_min,
    y_max,
    k_results,
    gate_min_obs=True,
    gate_min_lh=False,
    row_tile=None,
    interpret=False,
    cand_offset=0,
    cand_valid=None,
    x_origin=None,
    y_origin=None,
    bounds_masks=True,
):
    """search_topk_pallas_encoded over a pre-packed word stream from
    :func:`pack_psi_phi_words` (survey-scale entry: no stack-sized
    temporaries). ``shape`` = (T, H, W) of the code stacks; ``bits`` = 8
    or 16. ``pad_rows`` is the packer's PackGeom (or a legacy plain int =
    guardless stream). ``bounds_masks=False`` selects the mask-free paired
    kernel — only valid when the caller proved every out-of-bounds read
    lands on the stream's zero guards (:func:`_bounds_free`)."""
    T, H, W = shape
    C = dxs.shape[0]
    SH = y_max - y_min
    SW = x_max - x_min
    K = int(k_results)
    COLS = 32 // (2 * int(bits))
    BITS = int(bits)
    SW4 = pl.cdiv(SW, COLS)
    W4 = words_r.shape[1]
    geom = _norm_geom(pad_rows)
    pad_rows = geom.pad_rows
    HG = H + geom.row_guard

    # Dual-parity streams (the uint8 paired layout) are twice as tall as
    # the single-stream layout; detect by row count.
    base_rows = T * HG + 2 * pad_rows
    paired = BITS == 8 and words_r.shape[0] == 2 * _round_up(base_rows, 8)
    if paired and int(T) > 257:
        # The per-candidate paired kernel's packed 16-bit sums cap at
        # T = 257 (the GROUPED kernel's FLUSH handles longer stacks).
        # Parity 0 of the dual stream IS the per-class single stream (its
        # both-codes-zeroed pairs are exactly what the per-class kernel's
        # validity gate excludes anyway), so slice and fall through.
        words_r = words_r[: _round_up(base_rows, 8)]
        paired = False

    if W4 < _round_up(max(pl.cdiv(W, COLS), SW4), 128):
        raise ValueError(
            f"packed stream W4={W4} too narrow for this search window; "
            f"repack with sw_max >= {SW}"
        )

    if row_tile is None:
        row_tile = (
            _paired_row_tile(SH, SW4, W4, K, min(int(T), 4))
            if paired
            else _encoded_row_tile(SH, SW4, COLS, W4, K)
        )
    TH = int(row_tile)
    n_ty = pl.cdiv(SH, TH)
    SH_pad = n_ty * TH
    if pad_rows < _round_up(SH_pad + H + 16, 8):
        raise ValueError(
            f"packed stream pad_rows={pad_rows} too small; repack with sh_max >= {SH}"
        )

    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    oy0, ox0 = _origins(y_min, x_min, y_origin, x_origin)
    oy = oy0 + dys.astype(jnp.int32)
    ox = ox0 + dxs.astype(jnp.int32)
    rows = pad_rows + t_idx * HG + oy
    cok = _cok_table(C, cand_valid, cand_offset)
    em = jnp.asarray(encode_meta, dtype=jnp.float32).reshape(4)
    if paired:
        return _run_paired_search(
            words_r, rows, ox, oy, cok, em, min_obs, min_lh,
            T=T, H=H, W=W, W4=W4, TH=TH, SW4=SW4, K=K,
            SH=SH, SW=SW, SH_pad=SH_pad, n_ty=n_ty,
            ROWS1=_round_up(base_rows, 8),
            gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, interpret=interpret,
            bounds_masks=bounds_masks,
        )
    return _run_encoded_search(
        words_r, rows, ox, oy, cok, em, min_obs, min_lh,
        T=T, H=H, W=W, W4=W4, COLS=COLS, BITS=BITS, TH=TH, SW4=SW4, K=K,
        SH=SH, SW=SW, SH_pad=SH_pad, n_ty=n_ty, pad_rows=pad_rows,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, interpret=interpret,
        bounds_masks=bounds_masks,
    )
