"""Candidate-grouped paired kernel: exactness vs the per-candidate packed
kernel (reference semantics per kernels.cu:252-332), including multi-row-tile
geometry, search windows, exact likelihood ties, sparse grouping plans, and
the dispatcher's routing decisions."""

import numpy as np
import jax.numpy as jnp
import pytest

from kbmod_tpu.ops.search import trajectory_offsets
from kbmod_tpu.ops.search_pallas import (
    _plan_groups,
    _search_topk_pallas_packed_jit,
    pack_psi_phi_words,
    search_topk_paired_grouped,
    search_topk_pallas_packed,
)

EM = np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32)


def _stack(rng, T, H, W):
    psi = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    phi = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    return psi, phi


def _both(words_r, pad_rows, shape, dxs, dys, **kw):
    em = jnp.asarray(EM)
    ref = _search_topk_pallas_packed_jit(
        words_r, jnp.asarray(dxs), jnp.asarray(dys),
        jnp.float32(kw.pop("min_obs", 2)), jnp.float32(0), em,
        shape=shape, pad_rows=pad_rows, bits=8, interpret=True, **kw,
    )
    grp = search_topk_paired_grouped(
        words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em,
        shape=shape, pad_rows=pad_rows, interpret=True, **kw,
    )
    return ref, grp


class TestGroupedKernel:
    def test_full_frame_exact(self):
        rng = np.random.default_rng(3)
        T, H, W, C = 6, 40, 52, 37
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-7, 7, C).astype(np.float32)
        vys = rng.uniform(-7, 7, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        ref, grp = _both(
            words_r, pad_rows, (T, H, W), dxs, dys,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=4,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    def test_multi_row_tile_exact(self):
        # Forces several row tiles (row_tile=8): the per-candidate oy must
        # fold the tile origin into both the roll and the bounds masks.
        rng = np.random.default_rng(4)
        T, H, W, C = 5, 48, 40, 21
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-5, 5, C).astype(np.float32)
        vys = rng.uniform(-5, 5, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.5)
        ref, grp = _both(
            words_r, pad_rows, (T, H, W), dxs, dys,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3, row_tile=8,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    def test_window_exact(self):
        rng = np.random.default_rng(5)
        T, H, W, C = 6, 40, 52, 33
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-6, 6, C).astype(np.float32)
        vys = rng.uniform(-6, 6, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        ref, grp = _both(
            words_r, pad_rows, (T, H, W), dxs, dys,
            x_min=5, x_max=33, y_min=7, y_max=31, k_results=3,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    def test_exact_ties_match_arrival_order(self):
        # Duplicated trajectories produce exactly equal likelihoods; the
        # grouped kernel processes in velocity-sorted order but must rank
        # ties by candidate index = the per-candidate kernels' arrival
        # order (reference insertion semantics up to equal-lh ordering).
        rng = np.random.default_rng(6)
        T, H, W = 6, 40, 52
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        base_vx = rng.uniform(-6, 6, 8).astype(np.float32)
        base_vy = rng.uniform(-6, 6, 8).astype(np.float32)
        vxs = np.repeat(base_vx, 3)
        vys = np.repeat(base_vy, 3)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        ref, grp = _both(
            words_r, pad_rows, (T, H, W), dxs, dys,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=4,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    def test_cand_valid_and_offset(self):
        rng = np.random.default_rng(7)
        T, H, W, C = 5, 32, 40, 19
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-4, 4, C).astype(np.float32)
        vys = rng.uniform(-4, 4, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.5)
        cand_valid = (np.arange(C) % 3 != 0)
        kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
                  cand_valid=cand_valid, cand_offset=100)
        em = jnp.asarray(EM)
        ref = _search_topk_pallas_packed_jit(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(1), jnp.float32(0), em,
            shape=(T, H, W), pad_rows=pad_rows, bits=8, interpret=True,
            cand_valid=jnp.asarray(cand_valid), cand_offset=100,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
        )
        grp = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(1), jnp.float32(0), em,
            shape=(T, H, W), pad_rows=pad_rows, interpret=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))


class TestGroupPlanning:
    def test_spread_bound_holds(self):
        rng = np.random.default_rng(8)
        C, T = 200, 12
        dys = np.cumsum(rng.integers(-2, 3, (C, T)), axis=1).astype(np.int32)
        order, starts = _plan_groups(dys, G=8, S=8)
        assert sorted(order.tolist()) == list(range(C))
        d = dys[order]
        ends = np.append(starts[1:], C)
        for a, b in zip(starts, ends):
            assert b - a <= 8
            assert (d[a:b].max(axis=0) - d[a:b].min(axis=0)).max() <= 8

    def test_singleton_split_on_violation(self):
        # Candidates whose mid-path spread exceeds the last-time spread.
        dys = np.array(
            [[0, 50, 0], [0, -50, 0], [0, 0, 0], [0, 1, 1]], dtype=np.int32
        )
        order, starts = _plan_groups(dys, G=4, S=4)
        d = dys[order]
        ends = np.append(starts[1:], len(dys))
        for a, b in zip(starts, ends):
            assert (d[a:b].max(axis=0) - d[a:b].min(axis=0)).max() <= 4


class TestLongStacks:
    """T > 257: the grouped kernel's FLUSH stage drains the packed 16-bit
    field sums into wide accumulators, so long stacks stay on the grouped
    fast path with bit-exact results (VERDICT r2 #2)."""

    def test_flush_exact_at_t260(self):
        # All-saturated codes: without the flush the 16-bit field sums
        # would overflow at t = 258 (260 * 255 > 65535).
        rng = np.random.default_rng(11)
        T, H, W, C = 260, 24, 32, 9
        psi_c = np.full((T, H, W), 255, dtype=np.uint8)
        phi_c = np.full((T, H, W), 255, dtype=np.uint8)
        # Sprinkle structure + masked pixels so obs varies.
        psi_c[::3, 5:9, 7:12] = 0
        phi_c[::3, 5:9, 7:12] = 0
        psi_c[1::2] = rng.integers(0, 256, psi_c[1::2].shape, dtype=np.uint8)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-0.5, 0.5, C).astype(np.float32)
        vys = rng.uniform(-0.5, 0.5, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.linspace(0, 8, T))
        # Reference: the per-class kernel (exact for any T).
        ref, grp = _both(
            words_r, pad_rows, (T, H, W), dxs, dys,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    def test_dispatcher_routes_long_stack_to_grouped(self):
        # T = 300 via the public dispatcher: must route to the grouped
        # kernel (not the per-class fallback) and match it.
        import kbmod_tpu.ops.search_pallas as sp_mod

        rng = np.random.default_rng(12)
        T, H, W, C = 300, 16, 24, 8
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-0.3, 0.3, C).astype(np.float32)
        vys = rng.uniform(-0.3, 0.3, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.linspace(0, 6, T))
        em = jnp.asarray(EM)
        kw = dict(shape=(T, H, W), bits=8, pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)

        taken = {"n": 0}
        orig = sp_mod.search_topk_paired_grouped

        def spy(*a, **k):
            taken["n"] += 1
            return orig(*a, **k)

        sp_mod.search_topk_paired_grouped = spy
        try:
            out = search_topk_pallas_packed(
                words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
            )
        finally:
            sp_mod.search_topk_paired_grouped = orig
        assert taken["n"] == 1

        grp = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em,
            **{k: v for k, v in kw.items() if k != "bits"},
        )
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(grp[1]))


class TestDispatcher:
    def test_routes_grouped_and_matches(self):
        rng = np.random.default_rng(9)
        T, H, W, C = 6, 40, 52, 24
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-6, 6, C).astype(np.float32)
        vys = rng.uniform(-6, 6, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        kw = dict(shape=(T, H, W), bits=8, pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=4)
        em = jnp.asarray(EM)
        out = search_topk_pallas_packed(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        ref = _search_topk_pallas_packed_jit(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(2), jnp.float32(0), em, **kw
        )
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))

    def test_traced_offsets_fall_back(self):
        # Under jit the offsets are tracers; the dispatcher must route to
        # the per-candidate jitted kernel rather than fail.
        import jax

        rng = np.random.default_rng(10)
        T, H, W, C = 5, 32, 40, 9
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-4, 4, C).astype(np.float32)
        vys = rng.uniform(-4, 4, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.5)
        kw = dict(shape=(T, H, W), bits=8, pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        em = jnp.asarray(EM)

        @jax.jit
        def run(dxs_j, dys_j):
            return search_topk_pallas_packed(
                words_r, dxs_j, dys_j, jnp.float32(1), jnp.float32(0), em, **kw
            )

        out = run(jnp.asarray(dxs), jnp.asarray(dys))
        ref = _search_topk_pallas_packed_jit(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(1), jnp.float32(0), em, **kw
        )
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))


class TestRingDepth:
    def test_deeper_dma_ring_exact(self, monkeypatch):
        """KB_GROUPED_DD deepens the window-DMA ring (latency hiding on
        narrow images); results must be bit-identical at any depth."""
        rng = np.random.default_rng(21)
        T, H, W, C = 7, 48, 60, 33
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-6, 6, C).astype(np.float32)
        vys = rng.uniform(-6, 6, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        kw = dict(shape=(T, H, W), pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=4)
        em = jnp.asarray(EM)
        base = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        for dd in ("3", "4"):
            monkeypatch.setenv("KB_GROUPED_DD", dd)
            got = search_topk_paired_grouped(
                words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
            )
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(base[0]))
            np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(base[1]))


class TestIdx16:
    def _inputs(self):
        rng = np.random.default_rng(31)
        T, H, W, C = 6, 40, 56, 29
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-6, 6, C).astype(np.float32)
        vys = rng.uniform(-6, 6, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        kw = dict(shape=(T, H, W), pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=4)
        return words_r, dxs, dys, kw

    def test_u16_indices_match_i32(self, monkeypatch):
        """uint16 top-K indices (the default when every global candidate
        index fits) must reproduce the int32 path bit-for-bit, including
        -1 empties."""
        words_r, dxs, dys, kw = self._inputs()
        em = jnp.asarray(EM)
        monkeypatch.setenv("KB_GROUPED_IDX16", "0")
        ref = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(9.0), em,
            gate_min_lh=True, **kw,
        )
        monkeypatch.setenv("KB_GROUPED_IDX16", "1")
        got = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(9.0), em,
            gate_min_lh=True, **kw,
        )
        assert np.asarray(got[1]).dtype == np.int32
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        assert (np.asarray(got[1]) == -1).any()  # empties survive conversion

    def test_large_candidate_offset_falls_back_to_i32(self, monkeypatch):
        """Even with u16 indices requested, global indices past uint16
        range must route to the int32 path and come back correct."""
        monkeypatch.setenv("KB_GROUPED_IDX16", "1")
        words_r, dxs, dys, kw = self._inputs()
        em = jnp.asarray(EM)
        base = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw,
        )
        off = 70_000
        got = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em,
            cand_offset=off, **kw,
        )
        bi, gi = np.asarray(base[1]), np.asarray(got[1])
        np.testing.assert_array_equal(gi[bi >= 0], bi[bi >= 0] + off)
        np.testing.assert_array_equal(gi[bi < 0], -1)


class TestScanChunks:
    def test_scan_chunk_loop_matches_unrolled(self, monkeypatch):
        """The rolled (fori_loop) chunk loop — used when a search spans
        many SMEM table chunks, e.g. full 4k frames over the full survey
        grid — must produce the unrolled Python loop's results exactly."""
        import kbmod_tpu.ops.search_pallas as sp

        rng = np.random.default_rng(41)
        T, H, W, C = 5, 40, 48, 64
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-6, 6, C).astype(np.float32)
        vys = rng.uniform(-6, 6, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        kw = dict(
            shape=(T, H, W), pad_rows=pad_rows, interpret=True,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
        )
        em = jnp.asarray(EM)

        # A tiny SMEM table budget forces one group per chunk (many
        # chunks); the caches would otherwise serve tables sized for the
        # real budget.
        monkeypatch.setattr(sp, "_SMEM_TABLE_BYTES", 4 * 512)
        monkeypatch.setattr(sp, "_TABLE_CACHE", {})
        monkeypatch.setenv("KB_GROUPED_SCAN_CHUNKS", "999999")
        ref = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        monkeypatch.setenv("KB_GROUPED_SCAN_CHUNKS", "1")
        got = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


class TestRowStripes:
    def test_hbm_stripe_split_matches_whole(self, monkeypatch):
        """The HBM-budget row-stripe split (full-frame surveys whose top-K
        maps + stream exceed the budget) must equal the single-call path
        exactly — output rows are independent."""
        rng = np.random.default_rng(42)
        T, H, W, C = 3, 1024, 48, 40
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-4, 4, C).astype(np.float32)
        vys = rng.uniform(-4, 4, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        em = jnp.asarray(EM)
        kw = dict(
            shape=(T, H, W), pad_rows=pad_rows, interpret=True,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=2,
        )
        ref = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        # Budget between stream and stream + 6 maps -> a real split.
        stream_gb = words_r.size * 4 / 2**30
        maps_gb = 2 * 2 * H * W * 4 / 2**30
        monkeypatch.setenv("KB_HBM_BUDGET_GB", str(stream_gb + 3 * maps_gb))
        got = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


class TestRowStripesPerCandidate:
    def test_per_candidate_stripe_split_matches_whole(self, monkeypatch):
        """The dispatcher-level stripe guard must also cover the
        per-candidate kernels (forced here via an explicit row_tile, which
        bypasses the grouped route) with identical results."""
        rng = np.random.default_rng(43)
        T, H, W, C = 3, 1024, 48, 24
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-4, 4, C).astype(np.float32)
        vys = rng.uniform(-4, 4, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        em = jnp.asarray(EM)
        kw = dict(
            shape=(T, H, W), pad_rows=pad_rows, bits=8, interpret=True,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=2, row_tile=8,
        )
        ref = search_topk_pallas_packed(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(2), jnp.float32(0), em, **kw
        )
        stream_gb = words_r.size * 4 / 2**30
        maps_gb = 2 * 2 * H * W * 4 / 2**30
        monkeypatch.setenv("KB_HBM_BUDGET_GB", str(stream_gb + 3 * maps_gb))
        got = search_topk_pallas_packed(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(2), jnp.float32(0), em, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


class TestBandedMerge:
    def test_banded_merge_matches_unbanded(self):
        """The row-banded chunk merge (bounded intermediates for 4k-frame
        full-grid searches) must equal the one-shot merge exactly."""
        from kbmod_tpu.ops.search_pallas import _merge_pair, _merge_pair_banded

        rng = np.random.default_rng(40)
        K, SH, SW = 4, 37, 24

        def topk(seed):
            r = np.random.default_rng(seed)
            lh = -np.sort(-r.normal(0, 1, (K, SH, SW)).astype(np.float32), axis=0)
            idx = r.integers(0, 500, (K, SH, SW), dtype=np.int32)
            return jnp.asarray(lh), jnp.asarray(idx)

        lh_a, idx_a = topk(1)
        lh_b, idx_b = topk(2)
        ref = _merge_pair(lh_a, idx_a, lh_b, idx_b, K)
        # tiny max_elems forces many bands (incl. a ragged final band)
        got = _merge_pair_banded(lh_a, idx_a, lh_b, idx_b, K, max_elems=K * K * SW * 8)
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))


class TestUniformGroups:
    """Exact-row (uniform) grouping: survey lattices (velocity x angle,
    e.g. the reference's 257x129 default grid, configuration.py:196-207)
    collapse to a few hundred distinct row sequences, so groups whose
    members share EVERY per-time row cover ~98% of the grid. The uniform
    kernel hoists the window slice + sublane roll out of the
    per-candidate loop and runs spread-0 windows; results stay
    bit-identical to the per-candidate packed kernel."""

    def _lattice(self, T, n_vx=14, vy_set=(-2.0, 0.0, 3.0)):
        vy = np.array(vy_set, dtype=np.float32)
        vx = np.linspace(-6, 6, n_vx).astype(np.float32)
        vv, yy = np.meshgrid(vx, vy, indexing="ij")
        dxs, dys = trajectory_offsets(
            vv.ravel(), yy.ravel(), np.arange(T, dtype=np.float64) * 0.5
        )
        return np.asarray(dxs, np.int32), np.asarray(dys, np.int32)

    def test_plan_uniform_groups_never_span_classes(self):
        from kbmod_tpu.ops.search_pallas import _plan_groups_uniform

        dxs, dys = self._lattice(T=6, n_vx=21, vy_set=(-3.0, -1.0, 0.0, 2.0))
        C = dys.shape[0]
        order, starts = _plan_groups_uniform(dys, G=8)
        assert sorted(order.tolist()) == list(range(C))
        d = dys[order]
        ends = np.append(starts[1:], C)
        for a, b in zip(starts, ends):
            assert b - a <= 8
            # every member of a group shares every per-time row
            assert (d[a:b] == d[a]).all()

    def _spy(self, monkeypatch):
        import kbmod_tpu.ops.search_pallas as sp_mod

        seen = {}
        orig = sp_mod._search_kernel_paired_grouped

        def spy(*a, **k):
            seen.update(uniform=k.get("uniform"), S=k.get("S"),
                        slice_mode=k.get("slice_mode"))
            return orig(*a, **k)

        monkeypatch.setattr(sp_mod, "_search_kernel_paired_grouped", spy)
        return seen

    @pytest.mark.parametrize("sel", ["slice", "where"])
    def test_uniform_engaged_and_exact(self, monkeypatch, sel):
        monkeypatch.setenv("KB_UNIFORM_SEL", sel)
        seen = self._spy(monkeypatch)
        rng = np.random.default_rng(31)
        T, H, W = 5, 24, 40
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        dxs, dys = self._lattice(T, n_vx=10, vy_set=(-2.0, 1.0))
        kw = dict(shape=(T, H, W), pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        em = jnp.asarray(EM)
        grp = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        assert seen["uniform"] is True
        assert seen["S"] == 0
        assert seen["slice_mode"] == ("uslice" if sel == "slice" else "uwhere")
        ref = _search_topk_pallas_packed_jit(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(2), jnp.float32(0), em, bits=8, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    def test_ragged_grid_falls_back(self, monkeypatch):
        # A random-velocity grid has ~no repeated row sequences: the
        # uniform plan would blow up the slot count, so the dispatcher
        # must keep the spread plan.
        seen = self._spy(monkeypatch)
        rng = np.random.default_rng(32)
        T, H, W, C = 6, 24, 40, 24
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vxs = rng.uniform(-6, 6, C).astype(np.float32)
        vys = rng.uniform(-6, 6, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.4)
        search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), jnp.asarray(EM),
            shape=(T, H, W), pad_rows=pad_rows, interpret=True,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
        )
        assert seen["uniform"] is False

    def test_env_gate_disables_uniform(self, monkeypatch):
        monkeypatch.setenv("KB_GROUPED_UNIFORM", "0")
        seen = self._spy(monkeypatch)
        rng = np.random.default_rng(33)
        T, H, W = 5, 24, 40
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        dxs, dys = self._lattice(T, n_vx=10, vy_set=(-2.0, 1.0))
        search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), jnp.asarray(EM),
            shape=(T, H, W), pad_rows=pad_rows, interpret=True,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
        )
        assert seen["uniform"] is False

    def test_uniform_flush_long_stack(self, monkeypatch):
        # T > 257 on the uniform path: FLUSH drains the packed field sums
        # with rows shared group-wide. All-saturated codes overflow the
        # 16-bit fields at t = 258 without the flush.
        seen = self._spy(monkeypatch)
        T, H, W = 260, 16, 24
        rng = np.random.default_rng(34)
        psi_c = np.full((T, H, W), 255, dtype=np.uint8)
        phi_c = np.full((T, H, W), 255, dtype=np.uint8)
        psi_c[1::2] = rng.integers(0, 256, psi_c[1::2].shape, dtype=np.uint8)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        vy = np.array([-0.2, 0.1], dtype=np.float32)
        vx = np.linspace(-0.3, 0.3, 5).astype(np.float32)
        vv, yy = np.meshgrid(vx, vy, indexing="ij")
        dxs, dys = trajectory_offsets(vv.ravel(), yy.ravel(), np.linspace(0, 8, T))
        dxs, dys = np.asarray(dxs, np.int32), np.asarray(dys, np.int32)
        kw = dict(shape=(T, H, W), pad_rows=pad_rows, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        em = jnp.asarray(EM)
        grp = search_topk_paired_grouped(
            words_r, dxs, dys, jnp.float32(2), jnp.float32(0), em, **kw
        )
        assert seen["uniform"] is True
        ref = _search_topk_pallas_packed_jit(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(2), jnp.float32(0), em, bits=8, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
