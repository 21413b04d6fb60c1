"""Sigma-G clipping tests: the vectorized clipped re-scoring against a
direct per-row reference, and the matrix clipper (modeled on the
reference's tests/test_sigma_g_filter.py)."""

import numpy as np

from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping, apply_clipped_sigma_g
from kbmod_tpu.ops.search import clipped_sigmag_scores, sigmag_bounds_indices, sigmag_filtered_indices
from kbmod_tpu.results import Results
from kbmod_tpu.search import Trajectory


def reference_clipped_scores(psi_v, phi_v, ok, sgl_L, sgl_H, coeff, width=2.0):
    """Direct per-row transcription of the CUDA scan rules
    (kernels.cu:77-147, 213-241) used to validate the vectorized path."""
    N, T = psi_v.shape
    new_psi = np.zeros(N, dtype=np.float32)
    new_phi = np.zeros(N, dtype=np.float32)
    for i in range(N):
        psi_i = psi_v[i][ok[i]].astype(np.float32)
        phi_i = phi_v[i][ok[i]].astype(np.float32)
        n = len(psi_i)
        if n == 0:
            continue
        lc = np.where(phi_i != 0, psi_i / phi_i, 0.0)
        order = np.argsort(lc, kind="stable")
        vals = lc[order]
        iL, iM, iH = sigmag_bounds_indices(n, sgl_L, sgl_H)
        sigma_g = coeff * (vals[iH] - vals[iL])
        min_value = vals[iM] - width * sigma_g
        max_value = vals[iM] + width * sigma_g
        start = 0
        while start < iM and vals[start] < min_value:
            start += 1
        end = iM + 1
        while end < n and vals[end] <= max_value:
            end += 1
        keep = order[start:end]
        new_psi[i] = np.sum(psi_i[keep], dtype=np.float32)
        new_phi[i] = np.sum(phi_i[keep], dtype=np.float32)
    good = new_phi > 0
    lh = np.where(good, new_psi / np.sqrt(np.where(good, new_phi, 1.0)), -1.0)
    flux = np.where(good, new_psi / np.where(good, new_phi, 1.0), -1.0)
    return lh.astype(np.float32), flux.astype(np.float32), new_psi, new_phi


class TestClippedScores:
    def test_vectorized_matches_reference(self):
        rng = np.random.default_rng(17)
        N, T = 50, 12
        psi = rng.normal(1.0, 0.5, (N, T)).astype(np.float32)
        phi = rng.uniform(0.5, 2.0, (N, T)).astype(np.float32)
        ok = rng.uniform(size=(N, T)) > 0.2
        # Inject outliers.
        psi[rng.uniform(size=(N, T)) < 0.1] *= 50.0
        got = clipped_sigmag_scores(psi, phi, ok, 0.25, 0.75, 0.7413)
        exp = reference_clipped_scores(psi, phi, ok, 0.25, 0.75, 0.7413)
        for g, e in zip(got, exp):
            np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-5)

    def test_all_invalid_row(self):
        psi = np.ones((2, 5), dtype=np.float32)
        phi = np.ones((2, 5), dtype=np.float32)
        ok = np.array([[True] * 5, [False] * 5])
        lh, flux, psum, fsum = clipped_sigmag_scores(psi, phi, ok, 0.25, 0.75, 0.7413)
        assert lh[1] == -1.0
        assert psum[1] == 0.0
        assert lh[0] > 0


class TestSigmaGClipping:
    def test_coeff(self):
        # 25/75 percentiles of a Gaussian are at -/+0.6745 sigma.
        coeff = SigmaGClipping.find_sigma_g_coeff(25, 75)
        assert np.isclose(coeff, 1.0 / (2 * 0.67449), rtol=1e-4)

    def test_matrix_clipping(self):
        rng = np.random.default_rng(8)
        clipper = SigmaGClipping()
        lh = rng.normal(10.0, 1.0, (20, 16)).astype(np.float32)
        lh[3, 5] = 100.0  # outlier
        lh[7, 2] = -80.0
        valid = clipper.compute_clipped_sigma_g_matrix(lh)
        assert not valid[3, 5]
        assert not valid[7, 2]
        # The ~2 sigma window keeps roughly 95% of Gaussian samples.
        assert valid.sum() > 0.85 * 20 * 16

    def test_single_curve(self):
        clipper = SigmaGClipping()
        lh = np.array([10.0, 10.5, 9.5, 10.2, 100.0])
        keep = clipper.compute_clipped_sigma_g(lh)
        assert 4 not in keep

    def test_clip_negative(self):
        clipper = SigmaGClipping(clip_negative=True)
        lh = np.array([[-5.0, 10.0, 10.5, 9.5, 10.2, 30.0]], dtype=np.float32)
        valid = clipper.compute_clipped_sigma_g_matrix(lh)
        assert not valid[0, 0]

    def test_apply_to_results(self):
        trjs = [Trajectory(x=i, y=i, lh=10.0, obs_count=8) for i in range(3)]
        results = Results.from_trajectories(trjs)
        rng = np.random.default_rng(4)
        psi = rng.normal(5.0, 0.3, (3, 8)).astype(np.float32)
        phi = np.ones((3, 8), dtype=np.float32)
        psi[1, 3] = 500.0  # outlier to be clipped
        results.add_psi_phi_data(psi, phi)
        clipper = SigmaGClipping()
        apply_clipped_sigma_g(clipper, results)
        assert "obs_valid" in results.colnames
        assert not results["obs_valid"][1][3]
        # The outlier is clipped; some normal scatter may also fall outside
        # the narrow IQR-derived window.
        assert 4 <= results["obs_count"][1] <= 7
        assert results["obs_count"][0] >= 4
