"""Sharded (multi-chip) search over a jax.sharding.Mesh.

Sharding strategy (SURVEY.md §5.8 / §7):
* psi/phi stay replicated per device (even a 100 x 4k x 4k int8 stack is a
  few GB) — the default survey velocity grid implies halos wider than any
  reasonable tile, so candidate/pixel sharding beats H-sharding with halo
  exchange.
* "candidates" mode shards the velocity grid: each device scans its
  candidate chunk over all pixels, then the per-pixel top-K maps are
  all-gathered over ICI and merged with one stable sort.
* "pixels" mode shards starting-pixel rows: each device scans all
  candidates over its row block; outputs concatenate with no merge.
* The psi/phi build shards the convolution over the time axis
  (data-parallel conv) and all-gathers the result.

Multi-host slices compose transparently: build the mesh from
jax.devices() after jax.distributed.initialize and the same shard_map
programs run with XLA inserting ICI/DCN collectives.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# The replication-check kwarg was renamed check_rep -> check_vma.
_CHECK_KW = "check_vma" if "check_vma" in inspect.signature(_shard_map).parameters else "check_rep"


def shard_map(f=None, **kwargs):
    kwargs[_CHECK_KW] = kwargs.pop("check_rep", kwargs.pop("check_vma", False))
    if f is None:
        return lambda fn: _shard_map(fn, **kwargs)
    return _shard_map(f, **kwargs)

from kbmod_tpu.ops.search import search_topk_core, merge_topk, trajectory_offsets

AXIS = "shard"


def build_mesh(num_devices=None, devices=None):
    """A 1D device mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (AXIS,))


def _pad_to_multiple(arr, multiple, axis=0, fill=0):
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(arr, pad_widths, constant_values=fill), n


def _build_shard_tables(
    plans, G, S, dxs_p, dys_p, cand_valid, oy0, ox0, pad_rows, HG, W4, TBG,
    TH, n_ty, ROWS1, bounds_masks, n_dev, NG_max, T, uniform=False,
):
    """Per-shard grouped tables stacked into dense (n_dev, ...) arrays,
    plus the (fast_tables, slice_mode, NGC, n_chunks) decisions. Fast-table
    eligibility must hold for EVERY shard — all shards share one kernel.

    With ``uniform`` (requires uniform per-shard plans and a guard-free
    stream), builds the exact-row variant's tables instead; returns None
    when any shard's clip-freedom margins fail so the caller can fall
    back to the spread-plan flow."""
    import os

    from kbmod_tpu.ops.search_pallas import (
        _grouped_cand_chunk,
        _grouped_tables,
        _grouped_tables_fast,
    )

    if uniform:
        shard_tables = []
        for sl, order, starts in plans:
            tbl, grp, cok, (g8_min, g8_max, rs_max) = _grouped_tables_fast(
                order, starts, G, dxs_p[sl], dys_p[sl], oy0, ox0,
                pad_rows, HG, W4, TBG, TH=TH, uniform=True,
                cand_valid=cand_valid[sl], cand_offset=sl.start,
            )
            if not (
                g8_min >= 0
                and g8_max + (n_ty - 1) * TH + TBG <= ROWS1
                and rs_max + TH <= TBG
            ):
                return None
            shard_tables.append((tbl, grp, cok))
        NGC = _grouped_cand_chunk(NG_max, T, G, tcols=1)
        n_chunks = pl.cdiv(NG_max, NGC)
        NG_pad = n_chunks * NGC
        tbls = np.zeros((n_dev, NG_pad * G, T), np.int32)
        grps = np.zeros((n_dev, NG_pad, 2 * T), np.int32)
        coks = np.zeros((n_dev, NG_pad * G, 2), np.int32)
        for s, (tbl, grp, cok) in enumerate(shard_tables):
            ng = grp.shape[0]
            tbls[s, : ng * G] = tbl
            grps[s, :ng] = grp
            coks[s, : ng * G] = cok
        return tbls, grps, coks, True, "uslice", NGC, n_chunks

    fast_tables = False
    slice_mode = os.environ.get("KB_GROUPED_SLICE", "win")
    shard_tables = None
    if not bounds_masks and os.environ.get("KB_GROUPED_V2", "1") != "0":
        shard_tables = []
        ok_all = True
        for sl, order, starts in plans:
            tbl, grp, cok, (g8_min, g8_max, rs_max) = _grouped_tables_fast(
                order, starts, G, dxs_p[sl], dys_p[sl], oy0, ox0,
                pad_rows, HG, W4, TBG,
                TH=TH if slice_mode == "win" else None,
                cand_valid=cand_valid[sl], cand_offset=sl.start,
            )
            ok_all &= (
                g8_min >= 0
                and g8_max + (n_ty - 1) * TH + TBG <= ROWS1
                and rs_max + TH <= TBG
                and (slice_mode != "win" or (rs_max // 8) * 8 + TH + 8 <= TBG)
            )
            shard_tables.append((tbl, grp, cok))
        fast_tables = ok_all
    if not fast_tables:
        shard_tables = [
            _grouped_tables(
                order, starts, G, dxs_p[sl], dys_p[sl], oy0, ox0,
                pad_rows, HG,
                cand_valid=cand_valid[sl], cand_offset=sl.start,
            )
            for sl, order, starts in plans
        ]

    NGC = _grouped_cand_chunk(NG_max, T, G, tcols=3 if fast_tables else 2)
    n_chunks = pl.cdiv(NG_max, NGC)
    NG_pad = n_chunks * NGC

    tbls = np.zeros((n_dev, NG_pad * G, (3 if fast_tables else 2) * T), np.int32)
    grps = np.zeros((n_dev, NG_pad, T), np.int32)
    coks = np.zeros((n_dev, NG_pad * G, 2), np.int32)
    for s, (tbl, grp, cok) in enumerate(shard_tables):
        ng = grp.shape[0]
        tbls[s, : ng * G] = tbl
        grps[s, :ng] = grp
        coks[s, : ng * G] = cok
    return tbls, grps, coks, fast_tables, slice_mode, NGC, n_chunks


_SHARD_TABLE_CACHE = {}


def _shard_tables_cached(
    plans, G, S, dxs_p, dys_p, cand_valid, oy0, ox0, pad_rows, HG, W4, TBG,
    TH, n_ty, ROWS1, bounds_masks, n_dev, NG_max, T, max_entries=6,
    uniform=False,
):
    """Content-keyed cache of :func:`_build_shard_tables` — repeated
    sharded searches over the same grid skip the per-shard numpy builds
    (the same steady-state pattern the single-device dispatcher caches).
    A ``None`` build result (uniform margins failed) is cached too."""
    import hashlib
    import os

    key = (
        hashlib.sha1(np.ascontiguousarray(dxs_p)).hexdigest(),
        hashlib.sha1(np.ascontiguousarray(dys_p)).hexdigest(),
        dys_p.shape,
        hashlib.sha1(np.ascontiguousarray(cand_valid)).hexdigest(),
        int(G), int(S), int(oy0), int(ox0), int(pad_rows), int(HG),
        int(W4), int(TBG), int(TH), int(n_ty), int(ROWS1),
        bool(bounds_masks), int(n_dev), int(NG_max), bool(uniform),
        os.environ.get("KB_GROUPED_SLICE", "win"),
        os.environ.get("KB_GROUPED_V2", "1"),
    )
    if key not in _SHARD_TABLE_CACHE:
        hit = _build_shard_tables(
            plans, G, S, dxs_p, dys_p, cand_valid, oy0, ox0, pad_rows, HG,
            W4, TBG, TH, n_ty, ROWS1, bounds_masks, n_dev, NG_max, T,
            uniform=uniform,
        )
        if len(_SHARD_TABLE_CACHE) >= max_entries:
            _SHARD_TABLE_CACHE.pop(next(iter(_SHARD_TABLE_CACHE)))
        _SHARD_TABLE_CACHE[key] = hit
    return _SHARD_TABLE_CACHE[key]


def _sharded_paired_grouped(
    dxs, dys, mesh, *,
    x_min, x_max, y_min, y_max, k_results,
    min_obs, min_lh, gate_min_obs, gate_min_lh,
    psi_codes, phi_codes, encode_meta, packed_provider=None,
):
    """Candidate-sharded search through the grouped guard-padded paired
    kernel: the word stream is packed once (replicated); each shard's
    candidate slice is planned into groups host-side and its tables ride
    into shard_map as mesh-sharded arrays. Returns (top_lh, top_idx)
    numpy arrays, or None when the grouped kernel does not apply (wrong
    dtype/T, KB_GROUPED=0, or a sparse grouping plan)."""
    import os

    from kbmod_tpu.ops.search_pallas import (
        _bounds_free,
        _grouped_cand_chunk,
        _grouped_row_tile,
        _grouped_tables,
        _grouped_tables_fast,
        _norm_geom,
        _paired_grouped_traced,
        _plan_groups,
        _plan_groups_cached,
        _round_up,
        pack_psi_phi_words,
    )

    codes = np.asarray(psi_codes)
    T, H, W = codes.shape
    # Any T: the grouped kernel flushes its packed field sums into wide
    # accumulators past 257 images (search_pallas FLUSH).
    if codes.dtype != np.uint8 or os.environ.get("KB_PAIRED_KERNEL", "1") == "0":
        return None
    if os.environ.get("KB_GROUPED", "1") == "0":
        return None

    n_dev = mesh.devices.size
    SH = y_max - y_min
    SW = x_max - x_min
    K = int(k_results)
    G = int(os.environ.get("KB_GROUP_G", "8"))
    S = int(os.environ.get("KB_GROUP_S", "8"))

    dxs_p, _ = _pad_to_multiple(np.asarray(dxs, np.int32), n_dev)
    dys_p, _ = _pad_to_multiple(np.asarray(dys, np.int32), n_dev)
    C = np.asarray(dxs).shape[0]
    cand_valid = np.zeros(dxs_p.shape[0], dtype=np.int32)
    cand_valid[:C] = 1
    c_local = dxs_p.shape[0] // n_dev

    # Per-shard grouping plans (the candidate split is deterministic).
    plans = []
    total_groups = 0
    for s in range(n_dev):
        sl = slice(s * c_local, (s + 1) * c_local)
        order, starts = _plan_groups(dys_p[sl], G, S)
        plans.append((sl, order, starts))
        total_groups += len(starts)
    if total_groups * G > max(1.6 * dxs_p.shape[0], dxs_p.shape[0] + 4 * G * n_dev):
        return None

    if packed_provider is not None:
        words_r, geom = packed_provider()
    else:
        words_r, geom = pack_psi_phi_words(codes, np.asarray(phi_codes))
    geom = _norm_geom(geom)
    HG = H + geom.row_guard
    pad_rows = geom.pad_rows
    W4 = words_r.shape[1]
    SW4 = pl.cdiv(SW, 2)
    if W4 < _round_up(max(pl.cdiv(W, 2), SW4), 128):
        return None
    ROWS1 = _round_up(T * HG + 2 * pad_rows, 8)
    if words_r.shape[0] != 2 * ROWS1:
        return None

    DD = max(1, min(T, int(os.environ.get("KB_GROUPED_DD", "2"))))
    idx16 = (
        os.environ.get("KB_GROUPED_IDX16", "0") == "1"
        and dxs_p.shape[0] - 1 < (1 << 16) - 1
    )
    TH = _grouped_row_tile(SH, SW4, W4, K, DD, G, S, wide=T > 257, idx16=idx16)
    n_ty = pl.cdiv(SH, TH)
    SH_pad = n_ty * TH
    if pad_rows < _round_up(SH_pad + H + 16 + S, 8):
        return None

    bounds_masks = not _bounds_free(
        int(x_min) + dxs_p[cand_valid.astype(bool)],
        int(y_min) + dys_p[cand_valid.astype(bool)],
        W=W, H=H, W4=W4, SW4=SW4, SH_pad=SH_pad, geom=geom, row_slack=8 + S,
    )

    # Uniform (exact-row) upgrade, mirroring the single-device
    # dispatcher: when every shard's slice collapses into row classes
    # with bounded padding overhead AND the stream stays guard-free at
    # the spread-0 geometry, all shards run the uniform kernel (the
    # shard_map body is one kernel, so the decision is global).
    uniform = False
    built = None
    if (
        os.environ.get("KB_GROUPED_UNIFORM", "1") != "0"
        and os.environ.get("KB_GROUPED_V2", "1") != "0"
    ):
        slots_spread = total_groups * G
        G_wide = int(os.environ.get("KB_GROUP_G_UNIFORM", "16"))
        for G_u in dict.fromkeys((G_wide, G)):
            plans_u, total_u = [], 0
            for s in range(n_dev):
                sl = slice(s * c_local, (s + 1) * c_local)
                order_u, starts_u = _plan_groups_cached(
                    dys_p[sl], G_u, 0, uniform=True
                )
                plans_u.append((sl, order_u, starts_u))
                total_u += len(starts_u)
            if total_u * G_u > max(
                1.25 * slots_spread, slots_spread + 2 * G_u * n_dev
            ):
                continue
            S_u = 0
            TH_u = _grouped_row_tile(
                SH, SW4, W4, K, DD, G_u, S_u, wide=T > 257, idx16=idx16,
                uniform=True,
            )
            n_ty_u = pl.cdiv(SH, TH_u)
            SH_pad_u = n_ty_u * TH_u
            if pad_rows < _round_up(SH_pad_u + H + 16 + S_u, 8):
                continue
            if not _bounds_free(
                int(x_min) + dxs_p[cand_valid.astype(bool)],
                int(y_min) + dys_p[cand_valid.astype(bool)],
                W=W, H=H, W4=W4, SW4=SW4, SH_pad=SH_pad_u, geom=geom,
                row_slack=8 + S_u,
            ):
                continue
            NG_max_u = max(len(st) for _, _, st in plans_u)
            TBG_u = TH_u + 8 + S_u
            built = _shard_tables_cached(
                plans_u, G_u, S_u, dxs_p, dys_p, cand_valid, int(y_min),
                int(x_min), pad_rows, HG, W4, TBG_u, TH_u, n_ty_u, ROWS1,
                False, n_dev, NG_max_u, T, uniform=True,
            )
            if built is None:
                continue
            uniform = True
            bounds_masks = False
            G, S, TH, n_ty, SH_pad, TBG = G_u, S_u, TH_u, n_ty_u, SH_pad_u, TBG_u
            break

    if not uniform:
        NG_max = max(len(starts) for _, _, starts in plans)
        TBG = TH + 8 + S
        built = _shard_tables_cached(
            plans, G, S, dxs_p, dys_p, cand_valid, int(y_min), int(x_min),
            pad_rows, HG, W4, TBG, TH, n_ty, ROWS1, bounds_masks, n_dev,
            NG_max, T,
        )
    tbls, grps, coks, fast_tables, slice_mode, NGC, n_chunks = built

    statics = dict(
        T=T, H=H, HG=HG, W=W, W4=W4, TH=TH, SW4=SW4, K=K, DD=DD, S=S, G=G,
        ROWS1=ROWS1, pad_rows=pad_rows, SH_pad=SH_pad, n_ty=n_ty,
        NGC=NGC, n_chunks=n_chunks,
        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
        interpret=jax.default_backend() != "tpu", bounds_masks=bounds_masks,
        fast_tables=fast_tables,
        slice_mode=(
            ("uwhere" if os.environ.get("KB_UNIFORM_SEL", "slice") == "where" else "uslice")
            if uniform
            else (slice_mode if fast_tables else "roll")
        ),
        FLUSH=0 if T <= 257 else 255, idx16=idx16, uniform=uniform,
        scan_chunks=int(os.environ.get("KB_GROUPED_SCAN_CHUNKS", "8")),
    )
    em = jnp.asarray(np.asarray(encode_meta, np.float32).reshape(4))
    min_obs = jnp.float32(min_obs)
    min_lh = jnp.float32(min_lh)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(words_rep, tbl_s, grp_s, cok_s):
        local_lh, local_idx = _paired_grouped_traced(
            words_rep, tbl_s[0], grp_s[0], cok_s[0], em, min_obs, min_lh,
            **statics,
        )
        all_lh = jax.lax.all_gather(local_lh, AXIS, axis=0)
        all_idx = jax.lax.all_gather(local_idx, AXIS, axis=0)
        all_lh = all_lh.reshape((-1,) + all_lh.shape[2:])
        all_idx = all_idx.reshape((-1,) + all_idx.shape[2:])
        return merge_topk(all_lh, all_idx, K)

    with mesh:
        top_lh, top_idx = jax.jit(run)(
            words_r, jnp.asarray(tbls), jnp.asarray(grps), jnp.asarray(coks)
        )
    return np.asarray(top_lh)[:, :SH, :SW], np.asarray(top_idx)[:, :SH, :SW]


def sharded_search_topk(
    psi,
    phi,
    valid,
    dxs,
    dys,
    mesh,
    *,
    x_min,
    x_max,
    y_min,
    y_max,
    k_results,
    min_obs=0.0,
    min_lh=0.0,
    gate_min_obs=True,
    gate_min_lh=False,
    shard_mode="candidates",
    unroll=1,
    kernel="xla",
    psi_codes=None,
    phi_codes=None,
    encode_meta=None,
    packed_provider=None,
):
    """Run the top-K search sharded over a mesh.

    ``kernel="pallas"`` runs the fused Pallas kernel per shard (candidates
    mode only; the float variant, or the encoded one when
    psi_codes/phi_codes/encode_meta are given). Returns (top_lh, top_idx)
    as (K, SH, SW) numpy arrays identical to the single-device kernel's
    output.
    """
    n_dev = mesh.devices.size
    SH = y_max - y_min
    SW = x_max - x_min

    dxs = np.asarray(dxs, dtype=np.int32)
    dys = np.asarray(dys, dtype=np.int32)
    C = dxs.shape[0]

    encoded = kernel == "pallas" and psi_codes is not None and encode_meta is not None

    if shard_mode == "candidates" and encoded:
        # Preferred path: the grouped guard-padded paired kernel with one
        # replicated pre-packed word stream and host-planned per-shard
        # candidate groups. Falls through to the generic path when it
        # does not apply (non-uint8 codes, T > 257, KB_GROUPED=0, ...).
        out = _sharded_paired_grouped(
            dxs, dys, mesh,
            x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
            k_results=k_results, min_obs=min_obs, min_lh=min_lh,
            gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
            psi_codes=psi_codes, phi_codes=phi_codes, encode_meta=encode_meta,
            packed_provider=packed_provider,
        )
        if out is not None:
            return out

    min_obs = jnp.float32(min_obs)
    min_lh = jnp.float32(min_lh)

    if shard_mode == "candidates":
        dxs_p, _ = _pad_to_multiple(dxs, n_dev)
        dys_p, _ = _pad_to_multiple(dys, n_dev)
        cand_valid = np.zeros(dxs_p.shape[0], dtype=bool)
        cand_valid[:C] = True
        c_local = dxs_p.shape[0] // n_dev

        bounds = dict(x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max, k_results=k_results)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(), P()),
            check_rep=False,
        )
        def run(psi_r, phi_r, valid_r, dxs_s, dys_s, cval_s):
            offset = jax.lax.axis_index(AXIS) * c_local
            if kernel == "pallas":
                from kbmod_tpu.ops.search_pallas import (
                    search_topk_pallas,
                    search_topk_pallas_encoded,
                )

                interpret = jax.default_backend() != "tpu"
                if encoded:
                    local_lh, local_idx = search_topk_pallas_encoded(
                        psi_r, phi_r, dxs_s, dys_s, min_obs, min_lh,
                        jnp.asarray(np.asarray(encode_meta, dtype=np.float32)),
                        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                        cand_offset=offset.astype(jnp.int32), cand_valid=cval_s,
                        interpret=interpret, **bounds,
                    )
                else:
                    local_lh, local_idx = search_topk_pallas(
                        psi_r, phi_r, valid_r, dxs_s, dys_s, min_obs, min_lh,
                        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                        cand_offset=offset.astype(jnp.int32), cand_valid=cval_s,
                        interpret=interpret, **bounds,
                    )
            else:
                local_lh, local_idx = search_topk_core(
                    psi_r, phi_r, valid_r, dxs_s, dys_s, min_obs, min_lh,
                    jnp.int32(x_min), jnp.int32(y_min), offset.astype(jnp.int32),
                    sh=SH, sw=SW, k_results=k_results,
                    gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                    unroll=unroll, cand_valid=cval_s,
                )
            # Gather every shard's top-K and merge to the global top-K.
            all_lh = jax.lax.all_gather(local_lh, AXIS, axis=0)  # (n, K, SH, SW)
            all_idx = jax.lax.all_gather(local_idx, AXIS, axis=0)
            all_lh = all_lh.reshape((-1,) + all_lh.shape[2:])
            all_idx = all_idx.reshape((-1,) + all_idx.shape[2:])
            return merge_topk(all_lh, all_idx, k_results)

        if encoded:
            in0, in1 = jnp.asarray(psi_codes), jnp.asarray(phi_codes)
            in2 = jnp.zeros((1, 1, 1), jnp.uint8)
        else:
            in0, in1, in2 = jnp.asarray(psi), jnp.asarray(phi), jnp.asarray(valid)
        with mesh:
            top_lh, top_idx = jax.jit(run)(
                in0, in1, in2,
                jnp.asarray(dxs_p), jnp.asarray(dys_p), jnp.asarray(cand_valid),
            )
        return np.asarray(top_lh), np.asarray(top_idx)

    if shard_mode == "pixels":
        # Shard the output rows; each device scans all candidates over its
        # row block (Pallas kernels take the per-shard row origin as a
        # traced value, so one trace serves every shard).
        rows_per = math.ceil(SH / n_dev)
        SH_pad = rows_per * n_dev

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(None, AXIS, None), P(None, AXIS, None)),
            check_rep=False,
        )
        def run(psi_r, phi_r, valid_r, dxs_r, dys_r):
            local_y_min = jnp.int32(y_min) + jax.lax.axis_index(AXIS).astype(jnp.int32) * rows_per
            if kernel == "pallas":
                from kbmod_tpu.ops.search_pallas import (
                    search_topk_pallas,
                    search_topk_pallas_encoded,
                )

                interpret = jax.default_backend() != "tpu"
                bounds_p = dict(
                    x_min=x_min, x_max=x_max, y_min=0, y_max=rows_per,
                    k_results=k_results,
                )
                if encoded:
                    return search_topk_pallas_encoded(
                        psi_r, phi_r, dxs_r, dys_r, min_obs, min_lh,
                        jnp.asarray(np.asarray(encode_meta, dtype=np.float32)),
                        gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                        y_origin=local_y_min, interpret=interpret, **bounds_p,
                    )
                return search_topk_pallas(
                    psi_r, phi_r, valid_r, dxs_r, dys_r, min_obs, min_lh,
                    gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                    y_origin=local_y_min, interpret=interpret, **bounds_p,
                )
            return search_topk_core(
                psi_r, phi_r, valid_r, dxs_r, dys_r, min_obs, min_lh,
                jnp.int32(x_min), local_y_min, jnp.int32(0),
                sh=rows_per, sw=SW, k_results=k_results,
                gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh, unroll=unroll,
            )

        if encoded:
            in0, in1 = jnp.asarray(psi_codes), jnp.asarray(phi_codes)
            in2 = jnp.zeros((1, 1, 1), jnp.uint8)
        else:
            in0, in1, in2 = jnp.asarray(psi), jnp.asarray(phi), jnp.asarray(valid)
        with mesh:
            top_lh, top_idx = jax.jit(run)(
                in0, in1, in2, jnp.asarray(dxs), jnp.asarray(dys),
            )
        return np.asarray(top_lh)[:, :SH, :], np.asarray(top_idx)[:, :SH, :]

    if shard_mode == "time":
        # Capacity mode for stacks too long (T) for one chip's HBM: each
        # device holds a contiguous slice of the time axis and accumulates
        # its local (psi_sum, phi_sum, obs) partials per candidate; a psum
        # over the mesh completes the exact per-candidate statistics before
        # gating and top-K insertion (replicated on every device). The
        # statistic is a pure sum over T, so the result is bit-identical to
        # the single-device XLA kernel. XLA kernel only — the fused Pallas
        # kernels compute likelihoods internally and do not factorize.
        if kernel != "xla":
            raise ValueError("shard_mode='time' supports only kernel='xla'")
        use_codes = psi_codes is not None and encode_meta is not None
        in0 = jnp.asarray(psi_codes) if use_codes else jnp.asarray(psi)
        in1 = jnp.asarray(phi_codes) if use_codes else jnp.asarray(phi)
        T = in0.shape[0]
        t_per = math.ceil(T / n_dev)
        # Padding timesteps contribute nothing: valid=0 (float path) or
        # code 0 = masked (encoded path); their dx/dy entries stay 0.
        def pad_t(a, axis):
            width = [(0, 0)] * a.ndim
            width[axis] = (0, t_per * n_dev - T)
            return np.pad(np.asarray(a), width)

        in0 = jnp.asarray(pad_t(in0, 0))
        in1 = jnp.asarray(pad_t(in1, 0))
        in2 = (
            jnp.zeros((1, 1, 1), jnp.uint8) if use_codes
            else jnp.asarray(pad_t(np.asarray(valid), 0))
        )
        dxs_p = jnp.asarray(pad_t(dxs, 1))
        dys_p = jnp.asarray(pad_t(dys, 1))
        em = (
            jnp.asarray(np.asarray(encode_meta, dtype=np.float32))
            if use_codes else None
        )

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P() if use_codes else P(AXIS),
                      P(None, AXIS), P(None, AXIS)),
            out_specs=(P(), P()),
            check_rep=False,
        )
        def run(psi_t, phi_t, valid_t, dxs_t, dys_t):
            def psum_partials(psi_s, phi_s, obs):
                stacked = jnp.stack([psi_s, phi_s, obs])
                psi_s, phi_s, obs = jax.lax.psum(stacked, AXIS)
                return psi_s, phi_s, obs

            return search_topk_core(
                psi_t, phi_t, valid_t, dxs_t, dys_t, min_obs, min_lh,
                jnp.int32(x_min), jnp.int32(y_min), jnp.int32(0),
                sh=SH, sw=SW, k_results=k_results,
                gate_min_obs=gate_min_obs, gate_min_lh=gate_min_lh,
                unroll=unroll, encode_meta=em, reduce_fn=psum_partials,
            )

        with mesh:
            top_lh, top_idx = jax.jit(run)(in0, in1, in2, dxs_p, dys_p)
        return np.asarray(top_lh), np.asarray(top_idx)

    raise ValueError(f"Unknown shard_mode {shard_mode}")


def sharded_sigmag_exact_topk(
    psi,
    phi,
    valid,
    dxs,
    dys,
    mesh,
    *,
    x_min,
    x_max,
    y_min,
    y_max,
    k_results,
    min_obs=0.0,
    min_lh=0.0,
    sigmag_coeff=-1.0,
    sgl_L=0.25,
    sgl_H=0.75,
    row_tile=256,
):
    """Reference-exact in-kernel sigma-G search sharded over candidates.

    Each shard scores its candidate slice by CLIPPED likelihood with the
    exact kernel (ops.search._sigmag_exact_tile, kernels.cu:184-241
    semantics), then the per-pixel top-K maps are all-gathered and merged
    — identical to the single-device exact kernel, since per-candidate
    clipped gating is independent of the shard split.
    """
    from kbmod_tpu.ops.search import _sigmag_exact_tile

    n_dev = mesh.devices.size
    SH = y_max - y_min

    dxs_p, _ = _pad_to_multiple(np.asarray(dxs, dtype=np.int32), n_dev)
    dys_p, _ = _pad_to_multiple(np.asarray(dys, dtype=np.int32), n_dev)
    C = np.asarray(dxs).shape[0]
    cand_valid = np.zeros(dxs_p.shape[0], dtype=np.int32)
    cand_valid[:C] = 1
    c_local = dxs_p.shape[0] // n_dev

    min_obs = jnp.float32(min_obs)
    min_lh = jnp.float32(min_lh)
    coeff = jnp.float32(sigmag_coeff)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def run(psi_r, phi_r, valid_r, dxs_s, dys_s, cval_s):
        offset = (jax.lax.axis_index(AXIS) * c_local).astype(jnp.int32)
        tiles_lh, tiles_idx = [], []
        # Row tiling bounds the per-candidate (N, T) curve memory; the
        # Python loop unrolls into the traced program.
        for y0 in range(y_min, y_max, int(row_tile)):
            y1 = min(y_max, y0 + int(row_tile))
            lh_t, idx_t = _sigmag_exact_tile(
                psi_r, phi_r, valid_r, dxs_s, dys_s,
                min_obs, min_lh, coeff, offset,
                x_min=int(x_min), x_max=int(x_max), y_min=int(y0), y_max=int(y1),
                k_results=int(k_results), sgl_L=float(sgl_L), sgl_H=float(sgl_H),
                cand_valid=cval_s,
            )
            tiles_lh.append(lh_t)
            tiles_idx.append(idx_t)
        local_lh = jnp.concatenate(tiles_lh, axis=1)
        local_idx = jnp.concatenate(tiles_idx, axis=1)
        all_lh = jax.lax.all_gather(local_lh, AXIS, axis=0)
        all_idx = jax.lax.all_gather(local_idx, AXIS, axis=0)
        all_lh = all_lh.reshape((-1,) + all_lh.shape[2:])
        all_idx = all_idx.reshape((-1,) + all_idx.shape[2:])
        return merge_topk(all_lh, all_idx, k_results)

    with mesh:
        top_lh, top_idx = jax.jit(run)(
            jnp.asarray(psi), jnp.asarray(phi), jnp.asarray(valid),
            jnp.asarray(dxs_p), jnp.asarray(dys_p), jnp.asarray(cand_valid),
        )
    return np.asarray(top_lh), np.asarray(top_idx)


def sharded_psi_phi_build(sci, var, psf, mesh):
    """Build psi/phi for a (T, H, W) stack sharded over the time axis (one
    shared PSF); returns replicated (psi, phi, valid) device arrays."""
    from kbmod_tpu.ops.psi_phi import _psi_phi_from_sci_var

    T = sci.shape[0]
    n_dev = mesh.devices.size
    sci_p, _ = _pad_to_multiple(np.asarray(sci, dtype=np.float32), n_dev, fill=np.nan)
    var_p, _ = _pad_to_multiple(np.asarray(var, dtype=np.float32), n_dev, fill=np.nan)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    def run(sci_s, var_s, psf_r):
        psi_s, phi_s = _psi_phi_from_sci_var(sci_s, var_s, psf_r)
        ok = jnp.isfinite(psi_s) & jnp.isfinite(phi_s)
        psi_z = jnp.where(ok, psi_s, 0.0)
        phi_z = jnp.where(ok, phi_s, 0.0)
        return (
            jax.lax.all_gather(psi_z, AXIS, axis=0, tiled=True),
            jax.lax.all_gather(phi_z, AXIS, axis=0, tiled=True),
            jax.lax.all_gather(ok.astype(jnp.uint8), AXIS, axis=0, tiled=True),
        )

    with mesh:
        psi, phi, valid = jax.jit(run)(jnp.asarray(sci_p), jnp.asarray(var_p), jnp.asarray(psf))
    return psi[:T], phi[:T], valid[:T]


def _sharded_gather_curves(psi, phi, valid, xs, ys, dxs, dys, mesh):
    """Mesh-sharded twin of ops.search._gather_curves: trajectories are
    sharded over devices (planes replicated), so the winner re-scoring is
    not a single-chip bottleneck at survey scale."""
    from kbmod_tpu.ops.search import _gather_curves

    n_dev = mesh.devices.size
    n = xs.shape[0]
    xs_p, _ = _pad_to_multiple(np.asarray(xs, np.int32), n_dev)
    ys_p, _ = _pad_to_multiple(np.asarray(ys, np.int32), n_dev)
    dxs_p, _ = _pad_to_multiple(np.asarray(dxs, np.int32), n_dev)
    dys_p, _ = _pad_to_multiple(np.asarray(dys, np.int32), n_dev)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    def run(psi_r, phi_r, valid_r, xs_s, ys_s, dxs_s, dys_s):
        psi_v, phi_v, ok = _gather_curves(psi_r, phi_r, valid_r, xs_s, ys_s, dxs_s, dys_s)
        # Replicate the (small) winner curves so every process can fetch
        # them — P(AXIS) outputs are non-addressable across hosts.
        return (
            jax.lax.all_gather(psi_v, AXIS, axis=0, tiled=True),
            jax.lax.all_gather(phi_v, AXIS, axis=0, tiled=True),
            jax.lax.all_gather(ok, AXIS, axis=0, tiled=True),
        )

    with mesh:
        psi_v, phi_v, ok = jax.jit(run)(
            jnp.asarray(psi), jnp.asarray(phi), jnp.asarray(valid),
            jnp.asarray(xs_p), jnp.asarray(ys_p), jnp.asarray(dxs_p), jnp.asarray(dys_p),
        )
    return np.asarray(psi_v)[:n], np.asarray(phi_v)[:n], np.asarray(ok)[:n]


def make_sharded_evaluators(mesh):
    """(curves_fn, eval_fn) drop-ins for assemble_core_results that shard
    the winner re-scoring gathers over the mesh."""

    def curves_fn(psi, phi, valid, times, xs, ys, vxs, vys):
        psi_v, phi_v, ok = _sharded_gather_curves(
            psi, phi, valid, xs, ys, *trajectory_offsets(vxs, vys, times), mesh
        )
        okb = ok.astype(bool)
        psi_sum = np.where(okb, psi_v, 0.0).sum(axis=1, dtype=np.float32)
        phi_sum = np.where(okb, phi_v, 0.0).sum(axis=1, dtype=np.float32)
        obs = okb.sum(axis=1).astype(np.int32)
        good = phi_sum > 0
        stats = {
            "psi_sum": psi_sum,
            "phi_sum": phi_sum,
            "obs_count": obs,
            "lh": np.where(good, psi_sum / np.sqrt(np.where(good, phi_sum, 1.0)), -1.0),
            "flux": np.where(good, psi_sum / np.where(good, phi_sum, 1.0), -1.0),
        }
        return psi_v, phi_v, ok, stats

    def eval_fn(psi, phi, valid, times, xs, ys, vxs, vys):
        _, _, _, stats = curves_fn(psi, phi, valid, times, xs, ys, vxs, vys)
        return stats

    return curves_fn, eval_fn


def sharded_core_search(
    psi,
    phi,
    valid,
    times,
    vxs,
    vys,
    mesh,
    *,
    x_min,
    x_max,
    y_min,
    y_max,
    results_per_pixel,
    min_obs=0,
    min_lh=0.0,
    gate_min_obs=True,
    shard_mode="candidates",
    kernel="xla",
    psi_codes=None,
    phi_codes=None,
    encode_meta=None,
    packed_provider=None,
    do_sigmag=False,
    sgl_L=0.25,
    sgl_H=0.75,
    sigmag_coeff=-1.0,
):
    """Sharded equivalent of ops.search.core_search: returns the
    pixel-major struct-of-arrays results.

    With ``do_sigmag`` the sharded search uses the same over-provisioned
    top-K + clipped re-rank as the single-device path (each shard keeps
    its own over-provisioned pool, so the merged pool equals the
    single-device pool exactly); the winner re-scoring gathers run
    mesh-sharded. KB_SIGMAG_MODE=exact routes to the candidate-sharded
    reference-exact kernel (clipped gating is per-candidate, so the
    merged shard top-Ks equal the single-device exact result).
    """
    import os

    from kbmod_tpu.ops.search import assemble_core_results

    SH, SW = y_max - y_min, x_max - x_min
    k = int(results_per_pixel)
    num_cand = len(vxs)
    sigmag_mode = os.environ.get("KB_SIGMAG_MODE", "overprovision") if do_sigmag else ""
    over = int(os.environ.get("KB_SIGMAG_TOPK_FACTOR", "4"))
    k_search = max(
        min(num_cand, over * k if (do_sigmag and sigmag_mode != "exact") else k), k
    )

    dxs, dys = trajectory_offsets(vxs, vys, times)

    def _topk_maps(k_search, sigmag_mode):
        if sigmag_mode == "exact":
            return sharded_sigmag_exact_topk(
                psi, phi, valid, dxs, dys, mesh,
                x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
                k_results=k_search, min_obs=float(min_obs), min_lh=float(min_lh),
                sigmag_coeff=sigmag_coeff, sgl_L=sgl_L, sgl_H=sgl_H,
            )
        return sharded_search_topk(
            psi, phi, valid, dxs, dys, mesh,
            x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
            k_results=k_search, min_obs=float(min_obs), min_lh=float(min_lh),
            gate_min_obs=gate_min_obs, gate_min_lh=bool(do_sigmag),
            shard_mode=shard_mode, kernel=kernel,
            psi_codes=psi_codes, phi_codes=phi_codes, encode_meta=encode_meta,
            packed_provider=packed_provider,
        )

    from functools import partial

    from kbmod_tpu.ops.search import _SigmaGEscalation, exact_refine_pixels

    curves_fn, eval_fn = make_sharded_evaluators(mesh)
    escalate = _SigmaGEscalation(do_sigmag, sigmag_mode, over, k, num_cand)
    refine_fn = None
    if escalate.enabled:
        refine_fn = partial(
            exact_refine_pixels, psi=psi, phi=phi, valid=valid, times=times,
            vxs=vxs, vys=vys, k=k, min_obs=min_obs, min_lh=min_lh,
            sgl_L=sgl_L, sgl_H=sgl_H, sigmag_coeff=sigmag_coeff,
            curves_fn=curves_fn,
        )
    top_lh, top_idx = _topk_maps(k_search, sigmag_mode)
    results, _ = assemble_core_results(
        top_lh, top_idx, psi, phi, valid, times, vxs, vys,
        k=k, k_search=k_search, x_min=x_min, y_min=y_min, SH=SH, SW=SW,
        min_obs=min_obs, min_lh=min_lh, do_sigmag=do_sigmag,
        sgl_L=sgl_L, sgl_H=sgl_H, sigmag_coeff=sigmag_coeff,
        curves_fn=curves_fn, eval_fn=eval_fn,
        warn_on_churn=not escalate.enabled, refine_fn=refine_fn,
    )
    return results
