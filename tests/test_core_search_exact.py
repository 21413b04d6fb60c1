"""Exact-recovery test: inject a single object into a fake stack, search a
velocity grid including the true velocity, assert the top result is exact.

Modeled on the reference's tests/test_core_search_exact.py:16-60.
"""

import numpy as np

from kbmod_tpu.fake_data.fake_data_creator import make_fake_image_stack, image_stack_add_fake_object
from kbmod_tpu.search import StackSearch, Trajectory


class TestCoreSearchExact:
    def setup_method(self):
        self.num_times = 20
        self.width = 150
        self.height = 100
        times = 57130.2 + np.arange(self.num_times) / self.num_times
        rng = np.random.default_rng(2023)
        self.stack = make_fake_image_stack(self.height, self.width, times, noise_level=2.0, psf_val=0.5, rng=rng)
        # True object: starts (45, 60), velocity (11.5, -3.2) px/day, bright.
        self.x0, self.y0 = 45, 60
        self.vx, self.vy = 11.5, -3.2
        image_stack_add_fake_object(self.stack, self.x0, self.y0, self.vx, self.vy, flux=500.0)

    def _search(self, encode_bytes=-1, on_gpu=True):
        search = StackSearch(
            self.stack.sci,
            self.stack.var,
            self.stack.psfs,
            self.stack.zeroed_times,
            encode_bytes,
        )
        # A grid of candidate velocities including the true one.
        candidates = []
        for dvx in np.linspace(-4, 4, 11):
            for dvy in np.linspace(-4, 4, 11):
                candidates.append(Trajectory(vx=self.vx + dvx, vy=self.vy + dvy))
        search.set_min_obs(0)
        search.set_min_lh(1e-6)
        search.search_all(candidates, on_gpu)
        return search

    def _assert_recovered(self, search):
        best = search.get_results(0, 1)[0]
        assert best.x == self.x0
        assert best.y == self.y0
        assert np.isclose(best.vx, self.vx, atol=1e-4)
        assert np.isclose(best.vy, self.vy, atol=1e-4)
        assert best.obs_count == self.num_times
        assert best.lh > 50.0

    def test_exact_recovery_float(self):
        self._assert_recovered(self._search(-1, on_gpu=True))

    def test_exact_recovery_cpu_path(self):
        self._assert_recovered(self._search(-1, on_gpu=False))

    def test_exact_recovery_uint16(self):
        self._assert_recovered(self._search(2, on_gpu=True))

    def test_exact_recovery_uint8(self):
        self._assert_recovered(self._search(1, on_gpu=True))

    def test_single_trajectory_eval(self):
        search = StackSearch(
            self.stack.sci, self.stack.var, self.stack.psfs, self.stack.zeroed_times, -1
        )
        trj = search.search_linear_trajectory(self.x0, self.y0, self.vx, self.vy)
        assert trj.obs_count == self.num_times
        assert trj.lh > 50.0
        assert trj.flux > 100.0
