"""Pallas search kernel exactness tests (interpret mode on CPU) against
the XLA reference kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
from kbmod_tpu.ops.search_pallas import search_topk_pallas


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(99)
    T, H, W = 5, 40, 48
    times = np.arange(T) * 0.35
    psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
    phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
    for t in range(T):
        bad = rng.uniform(size=(H, W)) < 0.07
        psi[t][bad] = np.nan
        phi[t][bad] = np.nan
    arr = PsiPhiArray()
    fill_psi_phi_array(arr, -1, psi, phi, times)
    psi_z, phi_z, valid = arr.decoded_psi_phi()
    vxs = np.array([0.0, 2.5, -3.0, 5.3, 1.7, -0.8], dtype=np.float32)
    vys = np.array([0.0, -2.0, 3.5, 1.4, -4.1, 2.2], dtype=np.float32)
    return psi_z, phi_z, valid, times, vxs, vys, (T, H, W)


def _run_both(data, k, bounds=None, min_obs=0.0, gate_min_obs=True, row_tile=16):
    psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
    if bounds is None:
        bounds = (0, W, 0, H)
    x_min, x_max, y_min, y_max = bounds
    dxs, dys = trajectory_offsets(vxs, vys, times)
    common = dict(
        x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
        k_results=k, gate_min_obs=gate_min_obs,
    )
    ref_lh, ref_idx = search_topk_shift(
        jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
        jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(min_obs), jnp.float32(0.0),
        **common,
    )
    pal_lh, pal_idx = search_topk_pallas(
        jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
        jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(min_obs), jnp.float32(0.0),
        interpret=True, row_tile=row_tile, **common,
    )
    return (np.asarray(ref_lh), np.asarray(ref_idx)), (np.asarray(pal_lh), np.asarray(pal_idx))


def _assert_idx_match_modulo_ties(ref_lh, pal_lh, ref_idx, pal_idx):
    """Indices must agree except at exact-tie slots: the reference bubble
    and the rank-insert order exactly-equal likelihoods differently, so a
    differing index is acceptable only when both kernels report the
    identical likelihood there."""
    mism = ref_idx != pal_idx
    for k, i, j in np.argwhere(mism):
        assert ref_lh[k, i, j] == pal_lh[k, i, j], f"non-tie idx mismatch at {(k, i, j)}"


class TestPallasMatchesXLA:
    def test_full_image(self, data):
        (ref_lh, ref_idx), (pal_lh, pal_idx) = _run_both(data, k=3)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)
        _assert_idx_match_modulo_ties(ref_lh, pal_lh, ref_idx, pal_idx)

    def test_uneven_tile(self, data):
        # SH=40 with row_tile=16 -> padded rows exercised.
        (ref_lh, ref_idx), (pal_lh, pal_idx) = _run_both(data, k=2, row_tile=16)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)

    def test_reduced_bounds(self, data):
        (ref_lh, _), (pal_lh, _) = _run_both(data, k=2, bounds=(5, 30, 4, 25), row_tile=8)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)

    def test_extended_bounds(self, data):
        _, _, _, _, _, _, (T, H, W) = data
        (ref_lh, _), (pal_lh, _) = _run_both(data, k=2, bounds=(-4, W + 4, -6, H + 2), row_tile=16)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)

    def test_min_obs_gate(self, data):
        (ref_lh, _), (pal_lh, _) = _run_both(data, k=2, min_obs=5.0)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)

    def test_candidate_padding(self, data):
        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        dxs, dys = trajectory_offsets(vxs, vys, times)
        # Pad with junk candidates marked invalid; results must be unchanged.
        dxs_p = np.concatenate([dxs, dxs[:2]])
        dys_p = np.concatenate([dys, dys[:2]])
        cand_valid = np.array([True] * len(vxs) + [False, False])
        ref_lh, ref_idx = search_topk_shift(
            jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
        )
        pal_lh, pal_idx = search_topk_pallas(
            jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
            jnp.asarray(dxs_p), jnp.asarray(dys_p), jnp.float32(0), jnp.float32(0),
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
            interpret=True, row_tile=16, cand_valid=jnp.asarray(cand_valid),
        )
        np.testing.assert_allclose(np.asarray(pal_lh), np.asarray(ref_lh), rtol=1e-5, atol=1e-5)
        _assert_idx_match_modulo_ties(np.asarray(ref_lh), np.asarray(pal_lh), np.asarray(ref_idx), np.asarray(pal_idx))


class TestPallasEncoded:
    def _encoded_data(self, num_bytes):
        rng = np.random.default_rng(123)
        T, H, W = 5, 40, 48
        times = np.arange(T) * 0.35
        psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        for t in range(T):
            bad = rng.uniform(size=(H, W)) < 0.07
            psi[t][bad] = np.nan
            phi[t][bad] = np.nan
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, num_bytes, psi, phi, times)
        meta = arr.meta
        em = np.array(
            [meta.psi_min_val, meta.psi_scale, meta.phi_min_val, meta.phi_scale],
            dtype=np.float32,
        )
        vxs = np.array([0.0, 2.5, -3.0, 5.3, 1.7, -0.8], dtype=np.float32)
        vys = np.array([0.0, -2.0, 3.5, 1.4, -4.1, 2.2], dtype=np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        return arr, em, dxs, dys, (T, H, W)

    @pytest.mark.parametrize("num_bytes", [1, 2])
    @pytest.mark.parametrize("bounds", [None, (5, 30, 4, 25), (-4, 52, -6, 42)])
    def test_matches_xla_encoded(self, num_bytes, bounds):
        from kbmod_tpu.ops.search_pallas import search_topk_pallas_encoded

        arr, em, dxs, dys, (T, H, W) = self._encoded_data(num_bytes)
        if bounds is None:
            bounds = (0, W, 0, H)
        x_min, x_max, y_min, y_max = bounds
        common = dict(x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max, k_results=3)
        ref_lh, ref_idx = search_topk_shift(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi), jnp.zeros((1, 1, 1), jnp.uint8),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(2.0), jnp.float32(0.0),
            encode_meta=jnp.asarray(em), **common,
        )
        pal_lh, pal_idx = search_topk_pallas_encoded(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(2.0), jnp.float32(0.0),
            jnp.asarray(em), interpret=True, row_tile=16, **common,
        )
        ref_lh, pal_lh = np.asarray(ref_lh), np.asarray(pal_lh)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)
        _assert_idx_match_modulo_ties(ref_lh, pal_lh, np.asarray(ref_idx), np.asarray(pal_idx))

    def test_core_search_pallas_encoded(self):
        from kbmod_tpu.ops.search import core_search

        arr, em, dxs, dys, (T, H, W) = self._encoded_data(1)
        vxs = np.array([0.0, 2.5, -3.0, 5.3, 1.7, -0.8], dtype=np.float32)
        vys = np.array([0.0, -2.0, 3.5, 1.4, -4.1, 2.2], dtype=np.float32)
        psi_z, phi_z, valid = arr.decoded_psi_phi()
        times = np.arange(T) * 0.35
        common = dict(min_obs=2, min_lh=0.0, psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em)
        ref = core_search(psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 3,
                          kernel="xla", **common)
        out = core_search(psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 3,
                          kernel="pallas", **common)
        np.testing.assert_allclose(out["lh"], ref["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(out["x"], ref["x"])
        np.testing.assert_array_equal(out["obs_count"], ref["obs_count"])

    @pytest.mark.parametrize("num_bytes", [1, 2])
    def test_odd_width(self, num_bytes):
        """W not a multiple of the words-per-column packing."""
        from kbmod_tpu.ops.search_pallas import search_topk_pallas_encoded

        rng = np.random.default_rng(7)
        T, H, W = 4, 24, 47
        times = np.arange(T) * 0.5
        psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, num_bytes, psi, phi, times)
        meta = arr.meta
        em = np.array(
            [meta.psi_min_val, meta.psi_scale, meta.phi_min_val, meta.phi_scale],
            dtype=np.float32,
        )
        vxs = np.array([1.3, -2.1, 0.0], dtype=np.float32)
        vys = np.array([-0.7, 1.9, 0.0], dtype=np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        common = dict(x_min=-2, x_max=W + 1, y_min=0, y_max=H, k_results=2)
        ref_lh, _ = search_topk_shift(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi), jnp.zeros((1, 1, 1), jnp.uint8),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            encode_meta=jnp.asarray(em), **common,
        )
        pal_lh, _ = search_topk_pallas_encoded(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            jnp.asarray(em), interpret=True, row_tile=8, **common,
        )
        np.testing.assert_allclose(np.asarray(pal_lh), np.asarray(ref_lh), rtol=1e-5, atol=1e-5)


class TestCandidateChunking:
    """When the (C, T) offset tables exceed the SMEM budget the wrappers
    split candidates into chunks and merge top-K maps; results must be
    unchanged."""

    def test_float_kernel_chunked(self, data, monkeypatch):
        import kbmod_tpu.ops.search_pallas as sp

        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        # 9 candidates, chunks of 4 -> 3 chunks (last one padded).
        vxs9 = np.concatenate([vxs, vxs[:3] + 0.51]).astype(np.float32)
        vys9 = np.concatenate([vys, vys[:3] - 0.27]).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs9, vys9, times)
        common = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=4)
        ref_lh, ref_idx = search_topk_shift(
            jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0), **common,
        )
        monkeypatch.setattr(sp, "_SMEM_TABLE_BYTES", 4 * 512)
        pal_lh, pal_idx = sp.search_topk_pallas(
            jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            interpret=True, row_tile=16, **common,
        )
        ref_lh, pal_lh = np.asarray(ref_lh), np.asarray(pal_lh)
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)
        _assert_idx_match_modulo_ties(ref_lh, pal_lh, np.asarray(ref_idx), np.asarray(pal_idx))

    def test_encoded_kernel_chunked(self, monkeypatch):
        import kbmod_tpu.ops.search_pallas as sp

        rng = np.random.default_rng(5)
        T, H, W = 4, 24, 32
        times = np.arange(T) * 0.4
        psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, 1, psi, phi, times)
        meta = arr.meta
        em = np.array(
            [meta.psi_min_val, meta.psi_scale, meta.phi_min_val, meta.phi_scale],
            dtype=np.float32,
        )
        vxs = rng.uniform(-3, 3, 7).astype(np.float32)
        vys = rng.uniform(-3, 3, 7).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        common = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        ref_lh, _ = search_topk_shift(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi), jnp.zeros((1, 1, 1), jnp.uint8),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            encode_meta=jnp.asarray(em), **common,
        )
        monkeypatch.setattr(sp, "_SMEM_TABLE_BYTES", 3 * 512)
        pal_lh, _ = sp.search_topk_pallas_encoded(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            jnp.asarray(em), interpret=True, row_tile=8, **common,
        )
        np.testing.assert_allclose(np.asarray(pal_lh), np.asarray(ref_lh), rtol=1e-5, atol=1e-5)


class TestPackedEntry:
    @pytest.mark.parametrize("num_bytes", [1, 2])
    def test_prepacked_matches_inline(self, num_bytes):
        from kbmod_tpu.ops.search_pallas import (
            pack_psi_phi_words,
            search_topk_pallas_encoded,
            search_topk_pallas_packed,
        )

        rng = np.random.default_rng(31)
        T, H, W = 6, 24, 40
        times = np.arange(T) * 0.3
        psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, num_bytes, psi, phi, times)
        m = arr.meta
        em = np.array([m.psi_min_val, m.psi_scale, m.phi_min_val, m.phi_scale], np.float32)
        vxs = rng.uniform(-3, 3, 5).astype(np.float32)
        vys = rng.uniform(-3, 3, 5).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        common = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        inline_lh, inline_idx = search_topk_pallas_encoded(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            jnp.asarray(em), interpret=True, row_tile=8, **common,
        )
        words_r, pad_rows = pack_psi_phi_words(arr.psi, arr.phi, t_chunk=2)
        packed_lh, packed_idx = search_topk_pallas_packed(
            words_r, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(0), jnp.float32(0), jnp.asarray(em),
            shape=(T, H, W), bits=8 * num_bytes, pad_rows=pad_rows,
            interpret=True, row_tile=8, **common,
        )
        np.testing.assert_array_equal(np.asarray(packed_lh), np.asarray(inline_lh))
        np.testing.assert_array_equal(np.asarray(packed_idx), np.asarray(inline_idx))

    def test_window_too_wide_raises(self):
        from kbmod_tpu.ops.search_pallas import pack_psi_phi_words, search_topk_pallas_packed

        rng = np.random.default_rng(3)
        T, H, W = 2, 16, 32
        psi_c = rng.integers(1, 255, (T, H, W), dtype=np.uint8)
        # Guardless stream: column slack would otherwise legitimately
        # widen the stream enough to serve this oversized window.
        words_r, pad_rows = pack_psi_phi_words(psi_c, psi_c, row_guard=0, col_slack=0)
        em = np.zeros(4, np.float32)
        dxs = np.zeros((2, T), np.int32)
        with pytest.raises(ValueError):
            search_topk_pallas_packed(
                jnp.asarray(words_r), jnp.asarray(dxs), jnp.asarray(dxs),
                jnp.float32(0), jnp.float32(0), jnp.asarray(em),
                shape=(T, H, W), bits=8, pad_rows=pad_rows,
                x_min=-200, x_max=W + 200, y_min=0, y_max=H, k_results=2,
                interpret=True,
            )


class TestStackSearchPackedPath:
    def test_encoded_stack_pallas_matches_xla(self, monkeypatch):
        from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
        from kbmod_tpu.search import StackSearch, Trajectory

        times = create_fake_times(6, t0=57130.0, obs_per_day=3)
        ds = FakeDataSet(40, 44, times, use_seed=44)
        ds.insert_object(Trajectory(x=18, y=20, vx=3.0, vy=-2.0, flux=400.0))
        stack = ds.stack_py
        cands = [
            Trajectory(vx=vx, vy=vy)
            for vx in np.linspace(1.0, 5.0, 4)
            for vy in np.linspace(-4.0, 0.0, 4)
        ]

        def run(kern, num_bytes):
            monkeypatch.setenv("KB_SEARCH_KERNEL", kern)
            monkeypatch.setenv("KB_SHARDED", "0")
            s = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, num_bytes)
            s.set_min_obs(4)
            s.search_all(cands, True)
            return s.results.get_arrays(), s.psi_phi_array

        ref, _ = run("xla", 1)
        got, arr = run("pallas", 1)
        # The packed stream was built and cached on the array.
        assert arr._packed is not None
        np.testing.assert_allclose(got["lh"], ref["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["x"], ref["x"])
        np.testing.assert_array_equal(got["y"], ref["y"])


class TestPairedKernelLimits:
    def test_t_beyond_257_uses_classic_kernel_exactly(self):
        """uint8 stacks taller than the packed-16-bit-sum bound (T > 257)
        must route to the per-class kernel and stay exact."""
        import jax.numpy as jnp

        from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
        from kbmod_tpu.ops.search_pallas import _use_paired, search_topk_pallas_encoded

        assert _use_paired(jnp.uint8, 257)
        assert not _use_paired(jnp.uint8, 258)
        assert not _use_paired(jnp.uint16, 8)

        rng = np.random.default_rng(5)
        T, H, W, C = 260, 10, 12, 3
        psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
        phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
        em = np.array([-3.0, 6.0 / 254, 0.05, 2.0 / 254], dtype=np.float32)
        times = np.arange(T) * 0.01
        dxs, dys = trajectory_offsets(
            rng.uniform(-2, 2, C).astype(np.float32),
            rng.uniform(-2, 2, C).astype(np.float32),
            times,
        )
        common = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=2)
        ref_lh, _ = search_topk_shift(
            jnp.asarray(psi_c), jnp.asarray(phi_c), jnp.zeros((1, 1, 1), jnp.uint8),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            encode_meta=jnp.asarray(em), **common,
        )
        pal_lh, _ = search_topk_pallas_encoded(
            jnp.asarray(psi_c), jnp.asarray(phi_c), jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(0), jnp.float32(0), jnp.asarray(em),
            interpret=True, row_tile=8, **common,
        )
        np.testing.assert_allclose(np.asarray(pal_lh), np.asarray(ref_lh), rtol=2e-5, atol=2e-5)


class TestKEqualsOne:
    @pytest.mark.parametrize("encoded", [False, True])
    def test_k1_matches_xla(self, encoded):
        """results_per_pixel=1 must work in every kernel variant (the
        rank-insert displacement slice is empty at K=1)."""
        import jax.numpy as jnp

        from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
        from kbmod_tpu.ops.search_pallas import (
            search_topk_pallas,
            search_topk_pallas_encoded,
        )

        rng = np.random.default_rng(8)
        T, H, W, C = 5, 16, 20, 6
        times = np.arange(T) * 0.4
        dxs, dys = trajectory_offsets(
            rng.uniform(-3, 3, C).astype(np.float32),
            rng.uniform(-3, 3, C).astype(np.float32), times)
        common = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=1)
        if encoded:
            psi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
            phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
            em = np.array([-3.0, 6.0 / 254, 0.05, 2.0 / 254], np.float32)
            ref, _ = search_topk_shift(
                jnp.asarray(psi_c), jnp.asarray(phi_c), jnp.zeros((1, 1, 1), jnp.uint8),
                jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
                encode_meta=jnp.asarray(em), **common)
            pal, _ = search_topk_pallas_encoded(
                jnp.asarray(psi_c), jnp.asarray(phi_c), jnp.asarray(dxs), jnp.asarray(dys),
                jnp.float32(0), jnp.float32(0), jnp.asarray(em),
                interpret=True, row_tile=8, **common)
        else:
            psi = jnp.asarray(rng.normal(0, 1, (T, H, W)).astype(np.float32))
            phi = jnp.asarray(rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32))
            valid = jnp.ones((T, H, W), jnp.uint8)
            ref, _ = search_topk_shift(
                psi, phi, valid, jnp.asarray(dxs), jnp.asarray(dys),
                jnp.float32(0), jnp.float32(0), **common)
            pal, _ = search_topk_pallas(
                psi, phi, valid, jnp.asarray(dxs), jnp.asarray(dys),
                jnp.float32(0), jnp.float32(0), interpret=True, row_tile=8, **common)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-5, atol=1e-5)
