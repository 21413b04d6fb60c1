"""Exactness tests for the shift-and-accumulate search kernel against the
gather-based reference evaluation (and brute force numpy)."""

import numpy as np
import pytest

from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
from kbmod_tpu.ops.search import (
    core_search,
    evaluate_trajectories,
    trajectory_offsets,
    sigmag_filtered_indices,
)

FLT_MIN = -float(np.finfo(np.float32).max)


def brute_force_eval(psi_list, phi_list, times, x, y, vx, vy):
    """Scalar reference evaluation: sum valid psi/phi at predicted pixels."""
    T = len(psi_list)
    H, W = psi_list[0].shape
    psi_sum, phi_sum, obs = 0.0, 0.0, 0
    vx32 = np.float64(np.float32(vx))
    vy32 = np.float64(np.float32(vy))
    for t in range(T):
        px = int(np.floor(x + vx32 * times[t] + 0.5))
        py = int(np.floor(y + vy32 * times[t] + 0.5))
        if 0 <= px < W and 0 <= py < H:
            pv, fv = psi_list[t][py, px], phi_list[t][py, px]
            if np.isfinite(pv) and np.isfinite(fv):
                psi_sum += np.float32(pv)
                phi_sum += np.float32(fv)
                obs += 1
    lh = psi_sum / np.sqrt(phi_sum) if phi_sum > 0 else -1.0
    flux = psi_sum / phi_sum if phi_sum > 0 else -1.0
    return lh, flux, obs


def make_random_psi_phi(rng, T, H, W, mask_frac=0.1):
    psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
    phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
    for t in range(T):
        bad = rng.uniform(size=(H, W)) < mask_frac
        psi[t][bad] = np.nan
        phi[t][bad] = np.nan
    return psi, phi


class TestSearchKernelExactness:
    def setup_method(self):
        self.rng = np.random.default_rng(101)
        self.T, self.H, self.W = 6, 18, 22
        self.times = np.arange(self.T) * 0.3
        self.psi, self.phi = make_random_psi_phi(self.rng, self.T, self.H, self.W)
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, -1, self.psi, self.phi, self.times)
        self.psi_z, self.phi_z, self.valid = arr.decoded_psi_phi()

    def _full_scores(self, vxs, vys, x_min, x_max, y_min, y_max):
        """All (pixel, candidate) lh scores via the gather path."""
        SH, SW = y_max - y_min, x_max - x_min
        C = len(vxs)
        lh = np.zeros((SH, SW, C), dtype=np.float32)
        obs = np.zeros((SH, SW, C), dtype=np.int32)
        for c in range(C):
            xs = np.tile(np.arange(x_min, x_max), SH)
            ys = np.repeat(np.arange(y_min, y_max), SW)
            stats = evaluate_trajectories(
                self.psi_z, self.phi_z, self.valid, self.times,
                xs, ys, np.full(len(xs), vxs[c]), np.full(len(xs), vys[c]),
            )
            lh[:, :, c] = stats["lh"].reshape(SH, SW)
            obs[:, :, c] = stats["obs_count"].reshape(SH, SW)
        return lh, obs

    def _check_topk(self, vxs, vys, x_min, x_max, y_min, y_max, k, min_obs=0, gate=True):
        res = core_search(
            self.psi_z, self.phi_z, self.valid, self.times, vxs, vys,
            x_min, x_max, y_min, y_max, k, min_obs=min_obs, gate_min_obs=gate,
        )
        lh_all, obs_all = self._full_scores(vxs, vys, x_min, x_max, y_min, y_max)
        if gate:
            lh_all = np.where(obs_all >= min_obs, lh_all, FLT_MIN)
        SH, SW = y_max - y_min, x_max - x_min
        got_lh = res["lh"].reshape(SH * SW, k)
        exp = -np.sort(-lh_all.reshape(SH * SW, -1), axis=1)[:, :k]
        exp = np.where(exp <= FLT_MIN / 2, FLT_MIN, exp)
        got = np.where(got_lh <= FLT_MIN / 2, FLT_MIN, got_lh)
        np.testing.assert_allclose(got, exp, rtol=2e-5, atol=1e-5)

    def test_topk_basic(self):
        vxs = np.array([0.0, 1.5, -2.0, 3.3, 0.7], dtype=np.float32)
        vys = np.array([0.0, -1.0, 2.5, 0.4, -3.1], dtype=np.float32)
        self._check_topk(vxs, vys, 0, self.W, 0, self.H, k=3)

    def test_topk_with_min_obs(self):
        vxs = np.array([0.0, 4.5, -6.0], dtype=np.float32)
        vys = np.array([2.0, -4.0, 5.5], dtype=np.float32)
        self._check_topk(vxs, vys, 0, self.W, 0, self.H, k=2, min_obs=self.T)

    def test_topk_reduced_bounds(self):
        vxs = np.array([1.0, -1.0], dtype=np.float32)
        vys = np.array([0.5, -0.5], dtype=np.float32)
        self._check_topk(vxs, vys, 4, 15, 3, 12, k=2)

    def test_topk_extended_bounds(self):
        """Starting pixels outside the image (negative and beyond height)."""
        vxs = np.array([2.0, -2.0, 0.0], dtype=np.float32)
        vys = np.array([3.0, -3.0, 1.0], dtype=np.float32)
        self._check_topk(vxs, vys, -3, self.W, -4, self.H + 4, k=2)

    def test_matches_brute_force_single(self):
        """Gather evaluation matches the scalar brute-force loop."""
        for (x, y, vx, vy) in [(5, 7, 1.2, -0.8), (0, 0, 3.0, 3.0), (21, 17, -2.5, 1.0)]:
            stats = evaluate_trajectories(
                self.psi_z, self.phi_z, self.valid, self.times, [x], [y], [vx], [vy]
            )
            lh, flux, obs = brute_force_eval(self.psi, self.phi, self.times, x, y, vx, vy)
            assert stats["obs_count"][0] == obs
            np.testing.assert_allclose(stats["lh"][0], lh, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(stats["flux"][0], flux, rtol=1e-5, atol=1e-6)


class TestQuantizedSearch:
    def test_encoded_search_recovers_object(self):
        """uint8/uint16 encoding still recovers a bright injected object."""
        rng = np.random.default_rng(5)
        T, H, W = 8, 32, 32
        times = np.arange(T) * 0.25
        psi = [rng.normal(0, 0.3, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [np.full((H, W), 1.0, dtype=np.float32) for _ in range(T)]
        # Inject a moving bright source at (x=6, y=9) with v=(4, 2).
        for t in range(T):
            px = int(np.floor(6 + 4.0 * times[t] + 0.5))
            py = int(np.floor(9 + 2.0 * times[t] + 0.5))
            psi[t][py, px] += 20.0

        for num_bytes in (1, 2):
            arr = PsiPhiArray()
            fill_psi_phi_array(arr, num_bytes, psi, phi, times)
            psi_z, phi_z, valid = arr.decoded_psi_phi()
            vxs = np.array([0.0, 4.0, -4.0, 2.0], dtype=np.float32)
            vys = np.array([0.0, 2.0, 2.0, 4.0], dtype=np.float32)
            res = core_search(psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 1)
            best = np.argmax(res["lh"])
            assert res["x"][best] == 6
            assert res["y"][best] == 9
            assert res["vx"][best] == 4.0
            assert res["vy"][best] == 2.0


class TestSigmaGIndices:
    def test_no_outliers_keeps_all(self):
        values = np.array([1.0, 1.1, 0.9, 1.05, 0.95], dtype=np.float32)
        kept = sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0)
        assert set(kept) == set(range(5))

    def test_outlier_removed(self):
        values = np.array([1.0, 1.1, 0.9, 1.05, 0.95, 50.0], dtype=np.float32)
        kept = sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0)
        assert 5 not in kept
        assert len(kept) == 5

    def test_low_outlier_removed(self):
        values = np.array([1.0, 1.1, 0.9, 1.05, 0.95, -50.0], dtype=np.float32)
        kept = sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0)
        assert 5 not in kept


class TestSigmagFilteredIndicesParity:
    """The reference's GPU shim cases (tests/test_filtering.py:11-104)."""

    def test_all_same(self):
        inds = sigmag_filtered_indices([1.0] * 20, 0.25, 0.75, 0.7413, 2.0)
        assert len(inds) == 20

    def test_no_outliers(self):
        values = [-1.0, -1.0, -1.0, 0.0, 1.0, 2.0, 2.0, 2.0, 3.1]
        assert len(sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0)) == len(values)

    def test_one_outlier(self):
        values = [-1.0, -1.0, -1.0, 0.0, 1.0, 2.0, 2.0, 2.0, 5.46]
        inds = list(sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0))
        assert len(inds) == len(values) - 1
        assert all(i in inds for i in range(8)) and 8 not in inds
        assert len(sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 3.0)) == len(values)

    def test_other_bounds(self):
        values = [-1.0, -1.0, -1.0, 0.0, 1.0, 2.0, 2.0, 2.0, 3.85]
        inds = list(sigmag_filtered_indices(values, 0.15, 0.85, 0.4824, 2.0))
        assert len(inds) == len(values)
        values[0] = -1.9
        inds = list(sigmag_filtered_indices(values, 0.15, 0.85, 0.4824, 2.0))
        assert len(inds) == len(values) - 1
        assert 0 not in inds and all(i in inds for i in range(1, 9))

    def test_two_outliers(self):
        values = [1.6, 0.0, 1.0, 0.0, -1.5, 0.5, 1000.1, 0.0, 0.0, -5.2, -0.1]
        inds = list(sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0))
        assert len(inds) == len(values) - 2
        for idx in inds:
            assert -1.631 <= values[idx] <= 1.631
        assert len(sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 20.0)) == len(values) - 1

    def test_three_outliers(self):
        values = [5.0] + [3.0] * 12 + [10.95, -1.50] + [7.0] * 12 + [-0.95, 7.0]
        inds = list(sigmag_filtered_indices(values, 0.25, 0.75, 0.7413, 2.0))
        assert len(inds) == len(values) - 3
        for i in range(29):
            assert (i in inds) == (i not in (13, 14, 27))

    def test_empty(self):
        assert len(sigmag_filtered_indices([], 0.25, 0.75, 0.7413, 2.0)) == 0


class TestModuleBindings:
    """The module-level names the reference binds from C++
    (image_utils_cpp.cpp:179-196, cpu_search_algorithms.cpp:127-131)."""

    def test_convolve_and_psf_helpers(self):
        from kbmod_tpu.search import (
            convolve_image, convolve_image_cpu, convolve_image_gpu,
            square_psf_values, generate_psi, generate_phi,
        )

        rng = np.random.default_rng(2)
        img = rng.normal(10, 1, (16, 16)).astype(np.float32)
        var = rng.uniform(1, 2, (16, 16)).astype(np.float32)
        psf = np.full((3, 3), 1.0 / 9.0, dtype=np.float32)
        out = convolve_image(img, psf)
        assert out.shape == img.shape
        np.testing.assert_allclose(convolve_image_cpu(img, psf), out)
        np.testing.assert_allclose(convolve_image_gpu(img, psf), out)
        np.testing.assert_allclose(square_psf_values(psf), psf**2)

        psi = generate_psi(img, var, psf)
        phi = generate_phi(var, psf)
        np.testing.assert_allclose(psi, convolve_image(img / var, psf), rtol=1e-5)
        np.testing.assert_allclose(phi, convolve_image(1.0 / var, psf**2), rtol=1e-5)

    def test_read_psi_phi_struct(self):
        from kbmod_tpu.search import PsiPhi, PsiPhiArray, fill_psi_phi_array

        rng = np.random.default_rng(3)
        psi = [rng.normal(0, 1, (8, 8)).astype(np.float32)]
        phi = [rng.uniform(1, 2, (8, 8)).astype(np.float32)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, -1, psi, phi, [0.0])
        pp = arr.read_psi_phi(0, 3, 4)
        assert isinstance(pp, PsiPhi)
        np.testing.assert_allclose(pp.psi, psi[0][3, 4], rtol=1e-6)
        np.testing.assert_allclose(pp.phi, phi[0][3, 4], rtol=1e-6)
        # Tuple-compat: unpacking still works.
        p, f = arr.read_psi_phi(0, 3, 4)
        assert p == pp.psi and f == pp.phi
        assert np.isnan(arr.read_psi_phi(0, 100, 0).psi)

    def test_evaluate_trajectory_cpu(self):
        from kbmod_tpu.search import (
            PsiPhiArray, Trajectory, evaluate_trajectory_cpu, fill_psi_phi_array,
        )

        T, H, W = 4, 12, 12
        psi = [np.full((H, W), float(t + 1), dtype=np.float32) for t in range(T)]
        phi = [np.full((H, W), 2.0, dtype=np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, -1, psi, phi, np.arange(T, dtype=float))
        trj = Trajectory(x=5, y=5, vx=0.0, vy=0.0)
        evaluate_trajectory_cpu(arr, trj)
        assert trj.obs_count == T
        np.testing.assert_allclose(trj.lh, (1 + 2 + 3 + 4) / np.sqrt(8.0), rtol=1e-6)
        np.testing.assert_allclose(trj.flux, 10.0 / 8.0, rtol=1e-6)

    def test_search_cpu_only(self):
        from kbmod_tpu.search import (
            PsiPhiArray, Trajectory, TrajectoryList, fill_psi_phi_array, search_cpu_only,
        )
        from kbmod_tpu.search.stack_search import _SearchParams

        rng = np.random.default_rng(4)
        T, H, W = 4, 10, 10
        psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [rng.uniform(1, 2, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, -1, psi, phi, np.arange(T, dtype=float))

        params = _SearchParams()
        params.x_start_min, params.x_start_max = 0, W
        params.y_start_min, params.y_start_max = 0, H
        params.results_per_pixel = 5

        cands = TrajectoryList([Trajectory(vx=0.0, vy=0.0), Trajectory(vx=1.0, vy=0.0)])
        results = TrajectoryList(0)
        search_cpu_only(arr, params, cands, results)
        # min(rpp=5, 2 candidates) per pixel, ungated.
        assert len(results) == H * W * 2


class TestFetchTopkCompaction:
    """_fetch_topk: the device->host compaction of top-K maps must be
    exactly equivalent to a dense fetch in every regime."""

    def _maps(self, rng, n_real, K=4, SH=128, SW=256):
        from kbmod_tpu.ops.search import FLT_MAX

        lh = np.full((K, SH, SW), -FLT_MAX, np.float32)
        idx = np.full((K, SH, SW), -1, np.int32)
        if n_real:
            sel = rng.choice(K * SH * SW, n_real, replace=False)
            lh.reshape(-1)[sel] = rng.normal(5, 2, n_real).astype(np.float32)
            idx.reshape(-1)[sel] = rng.integers(0, 1000, n_real)
        return lh, idx

    @pytest.mark.parametrize("n_real", [0, 1, 500, 5000])
    def test_sparse_exact(self, n_real):
        import jax.numpy as jnp

        from kbmod_tpu.ops.search import _fetch_topk

        rng = np.random.default_rng(3 + n_real)
        lh, idx = self._maps(rng, n_real)
        out_lh, out_idx = _fetch_topk(jnp.asarray(lh), jnp.asarray(idx))
        np.testing.assert_array_equal(out_lh, lh)
        np.testing.assert_array_equal(out_idx, idx)

    def test_dense_fallback_exact(self):
        import jax.numpy as jnp

        from kbmod_tpu.ops.search import _fetch_topk

        rng = np.random.default_rng(9)
        lh = rng.normal(0, 1, (4, 128, 256)).astype(np.float32)
        idx = rng.integers(0, 100, (4, 128, 256)).astype(np.int32)
        out_lh, out_idx = _fetch_topk(jnp.asarray(lh), jnp.asarray(idx))
        np.testing.assert_array_equal(out_lh, lh)
        np.testing.assert_array_equal(out_idx, idx)

    @pytest.mark.parametrize("band", [1 << 12, 1 << 14, 60_000])
    def test_banded_exact(self, band):
        """The banded compaction (memory cap for survey-scale full-frame
        maps) must match a dense fetch band-for-band: real entries
        straddling band edges, empty bands, and a non-power-of-two tail."""
        import jax.numpy as jnp

        from kbmod_tpu.ops.search import _fetch_topk

        rng = np.random.default_rng(17)
        lh, idx = self._maps(rng, n_real=3000)
        # Force one fully-empty band and entries hugging band edges.
        flat_idx = idx.reshape(-1)
        flat_idx[band : 2 * band] = -1
        lh.reshape(-1)[band : 2 * band] = np.float32(-3.4028235e38)
        flat_idx[band - 1] = 7
        flat_idx[2 * band] = 8
        lh.reshape(-1)[band - 1] = 1.5
        lh.reshape(-1)[2 * band] = 2.5
        out_lh, out_idx = _fetch_topk(jnp.asarray(lh), jnp.asarray(idx), band=band)
        np.testing.assert_array_equal(out_lh, lh)
        np.testing.assert_array_equal(out_idx, idx)
