"""StackSearch start-bounds and configuration-guard tests (reference
behavior: tests/test_search.py:169-305)."""

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import (
    image_stack_add_fake_object,
    make_fake_image_stack,
)
from kbmod_tpu.search import StackSearch, Trajectory
from kbmod_tpu.trajectory_generator import KBMODV1Search


IMG_COUNT = 10
DIM_Y, DIM_X = 40, 30
FLUX = 250.0


def make_search(x=17, y=12, vx=21.0, vy=16.0):
    times = np.array([i / IMG_COUNT for i in range(IMG_COUNT)])
    rng = np.random.default_rng(100)
    stack = make_fake_image_stack(DIM_Y, DIM_X, times, noise_level=4.0, psf_val=1.0, rng=rng)
    image_stack_add_fake_object(stack, x, y, vx, vy, flux=FLUX)
    return StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times)


@pytest.fixture(scope="module")
def candidates():
    return list(KBMODV1Search(25, 5.0, 40.0, 25, 0.0, 1.5))


class TestStartBounds:
    def test_extended_bounds(self, candidates):
        search = make_search()
        search.set_results_per_pixel(5)
        search.set_start_bounds_x(-10, DIM_X + 10)
        search.set_start_bounds_y(-10, DIM_Y + 10)
        assert search.compute_max_results() == (DIM_X + 20) * (DIM_Y + 20) * 5

        search.search_all(candidates, True)
        expected = 5 * (DIM_X + 20) * (DIM_Y + 20)
        results = search.get_results(0, 10 * expected)
        assert 0 < len(results) <= expected
        best = results[0]
        assert abs(best.x - 17) <= 1 and abs(best.y - 12) <= 1

    def test_reduced_bounds(self, candidates):
        search = make_search()
        search.set_results_per_pixel(10)
        search.set_start_bounds_x(5, DIM_X - 5)
        search.set_start_bounds_y(5, DIM_Y - 5)
        assert search.compute_max_results() == (DIM_X - 10) * (DIM_Y - 10) * 10

        search.search_all(candidates, True)
        expected = 10 * (DIM_X - 10) * (DIM_Y - 10)
        results = search.get_results(0, 10 * expected)
        # Every searched pixel keeps rpp results (plenty of candidates pass
        # the default filters).
        assert len(results) == expected
        best = results[0]
        assert abs(best.x - 17) <= 1 and abs(best.y - 12) <= 1

    def test_off_chip_start(self, candidates):
        search = make_search(x=-3, y=12, vx=25.0, vy=10.0)
        search.set_start_bounds_x(-10, DIM_X + 10)
        search.set_start_bounds_y(-10, DIM_Y + 10)
        search.search_all(candidates, True)
        best = search.get_results(0, 10)[0]
        assert abs(best.x - (-3)) <= 1 and abs(best.y - 12) <= 1
        assert abs(best.vx / 25.0 - 1) < 0.15 and abs(best.vy / 10.0 - 1) < 0.15

    def test_invalid_bounds_raise(self):
        search = make_search()
        with pytest.raises(RuntimeError):
            search.set_start_bounds_x(6, 5)
        with pytest.raises(RuntimeError):
            search.set_start_bounds_y(-1, -5)


class TestConfigGuards:
    def test_sigmag_config_validation(self):
        search = make_search()
        search.enable_gpu_sigmag_filter([0.25, 0.75], 0.5, 1.0)
        for bad in ([0.25], [0.75, 0.25], [-0.01, 0.75], [0.75, 1.10]):
            with pytest.raises(RuntimeError):
                search.enable_gpu_sigmag_filter(bad, 0.5, 1.0)
        with pytest.raises(RuntimeError):
            search.enable_gpu_sigmag_filter([0.25, 0.75], -0.5, 1.0)

    def test_set_min_obs_bounds(self):
        search = make_search()
        search.set_min_obs(1)
        search.set_min_obs(IMG_COUNT)
        with pytest.raises(RuntimeError):
            search.set_min_obs(-1)
        with pytest.raises(RuntimeError):
            search.set_min_obs(IMG_COUNT + 1)


class TestManyImages:
    def test_no_time_cap(self):
        """The reference caps GPU searches at MAX_NUM_IMAGES=200 images
        (common.h:31); the streamed time loop removes the cap."""
        num_times = 250
        times = np.array([i / num_times for i in range(num_times)])
        stack = make_fake_image_stack(12, 10, times, noise_level=1.0, psf_val=1.0)
        image_stack_add_fake_object(stack, 5, 6, 1.0, -1.0, flux=100.0)
        search = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times)
        search.set_min_obs(100)
        search.search_all([Trajectory(vx=1.0, vy=-1.0), Trajectory(vx=0.0, vy=0.0)], True)
        best = search.get_results(0, 1)[0]
        assert (best.x, best.y) == (5, 6)
        assert best.obs_count == num_times
