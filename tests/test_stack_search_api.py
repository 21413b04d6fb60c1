"""StackSearch result-management and curve-extraction API tests
(reference behavior: tests/test_stack_search_results.py)."""

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.search import StackSearch, Trajectory


@pytest.fixture()
def search():
    times = create_fake_times(6, t0=57130.0)
    ds = FakeDataSet(30, 40, times, use_seed=101)
    stack = ds.stack_py
    return StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)


class TestPsiPhiLifecycle:
    def test_preload_unload(self, search):
        assert not search.psi_phi_array_on_gpu()
        search.preload_psi_phi_array()
        assert search.psi_phi_array_on_gpu()
        search.unload_psi_phi_array()
        assert not search.psi_phi_array_on_gpu()


class TestSetGetResults:
    def test_set_get_clear(self, search):
        assert len(search.get_results(0, 10)) == 0

        search.set_results([Trajectory(i, i, 0.0, 0.0) for i in range(10)])
        results = search.get_results(0, 10)
        assert len(results) == 10
        assert [r.x for r in results] == list(range(10))

        # Run past the end.
        assert len(search.get_results(0, 100)) == 10
        # Subsets, including one aligned with the end.
        sub = search.get_results(2, 2)
        assert [r.x for r in sub] == [2, 3]
        tail = search.get_results(8, 2)
        assert [r.x for r in tail] == [8, 9]
        # Zero count is an error.
        with pytest.raises(RuntimeError):
            search.get_results(0, 0)

        search.clear_results()
        assert len(search.get_all_results()) == 0


class TestPsiPhiCurves:
    def test_curves_known_values(self):
        num_times, height, width = 5, 5, 4
        times = np.arange(num_times, dtype=np.float32)
        sci = [np.full((height, width), float(i), dtype=np.float32) for i in range(num_times)]
        var = [np.full((height, width), 0.1, dtype=np.float32) for _ in range(num_times)]
        psfs = [np.array([[1.0]], dtype=np.float32) for _ in range(num_times)]
        search = StackSearch(sci, var, psfs, times - times[0], -1)

        psi_phi = search.get_all_psi_phi_curves([Trajectory(x=2, y=2, vx=0.0, vy=0.0)])
        assert psi_phi.shape == (1, 2 * num_times)
        np.testing.assert_allclose(
            psi_phi[0, :num_times], [float(i) / 0.1 for i in range(num_times)], rtol=1e-5
        )
        np.testing.assert_allclose(psi_phi[0, num_times:], [10.0] * num_times, rtol=1e-5)

    def test_curves_from_fake_objects(self, search):
        trjs = [Trajectory(x=10, y=10, vx=1.0, vy=0.5), Trajectory(x=5, y=20, vx=-0.5, vy=1.0)]
        curves = search.get_all_psi_phi_curves(trjs)
        assert curves.shape == (2, 12)
        # phi = conv(1/var, psf^2) is positive for clean pixels.
        assert np.all(curves[:, 6:] > 0.0)


class TestCpuGpuPathSemantics:
    """Reference divergence: the CPU path keeps min(rpp, n_candidates) per
    pixel with no insertion gating, while the GPU path always keeps rpp
    slots gated by min_obs (cpu_search_algorithms.cpp:99 vs kernels.cu:286)."""

    def _make(self):
        times = create_fake_times(6, t0=57130.0)
        ds = FakeDataSet(24, 24, times, use_seed=31)
        ds.insert_object(Trajectory(x=12, y=12, vx=2.0, vy=1.0, flux=400.0))
        stack = ds.stack_py
        return StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)

    def test_cpu_keeps_min_rpp_candidates(self):
        search = self._make()
        search.set_results_per_pixel(8)
        search.set_min_lh(-1e20)
        cands = [Trajectory(vx=2.0, vy=1.0), Trajectory(vx=0.0, vy=0.0), Trajectory(vx=-1.0, vy=0.5)]
        search.search_all(cands, False)
        # 24*24 pixels x min(8, 3) candidates.
        assert search.get_number_total_results() == 24 * 24 * 3

        search.search_all(cands, True)
        # The GPU path fills rpp slots but empties are filtered by lh.
        assert search.get_number_total_results() <= 24 * 24 * 8

    def test_paths_agree_on_best(self):
        search = self._make()
        search.set_min_obs(4)
        cands = [Trajectory(vx=vx, vy=vy) for vx in [1.0, 2.0, 3.0] for vy in [0.0, 1.0, 2.0]]
        search.search_all(cands, True)
        best_gpu = search.get_results(0, 1)[0]
        search.search_all(cands, False)
        best_cpu = search.get_results(0, 1)[0]
        assert (best_gpu.x, best_gpu.y) == (best_cpu.x, best_cpu.y) == (12, 12)
        np.testing.assert_allclose(best_gpu.lh, best_cpu.lh, rtol=1e-5)
