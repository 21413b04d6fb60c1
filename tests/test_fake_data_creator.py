"""Fake-data generator tests (reference: tests/test_fake_data_creator.py)."""

import os
import tempfile

import numpy as np
import pytest

from kbmod_tpu.core.image_stack_py import ImageStackPy
from kbmod_tpu.core.psf import PSF
from kbmod_tpu.fake_data.fake_data_creator import (
    FakeDataSet,
    create_fake_times,
    image_stack_add_fake_object,
    image_stack_add_random_masks,
    make_fake_image_stack,
)
from kbmod_tpu.search import Trajectory


class TestFakeTimes:
    def test_night_cadence(self):
        times = np.asarray(create_fake_times(10, t0=57130.0, obs_per_day=3,
                                             intra_night_gap=0.01, inter_night_gap=2))
        assert len(times) == 10
        assert times[0] == 57130.0
        # Within a night: 0.01-day gaps; between nights: >= 1 day.
        np.testing.assert_allclose(times[1] - times[0], 0.01)
        np.testing.assert_allclose(times[2] - times[1], 0.01)
        assert times[3] - times[2] > 1.0
        assert np.all(np.diff(times) > 0)


class TestFakeStack:
    def test_make_fake_image_stack(self):
        stack = make_fake_image_stack(40, 30, np.arange(5, dtype=float),
                                      noise_level=2.0, psf_val=0.5,
                                      rng=np.random.default_rng(5))
        assert (stack.height, stack.width, stack.num_times) == (40, 30, 5)
        # Noise statistics roughly match.
        assert abs(float(np.nanmean(stack.sci[0]))) < 0.5
        assert abs(float(np.nanstd(stack.sci[0])) - 2.0) < 0.5
        np.testing.assert_allclose(stack.var[0], 4.0)

    def test_random_masks(self):
        stack = make_fake_image_stack(40, 30, np.arange(3, dtype=float),
                                      rng=np.random.default_rng(5))
        image_stack_add_random_masks(stack, 0.2, rng=np.random.default_rng(6))
        fracs = stack.get_masked_fractions()
        assert np.all(fracs > 0.1) and np.all(fracs < 0.3)

    def test_add_fake_object_masked_pixel(self):
        num_times, height, width = 5, 200, 300
        sci = np.zeros((num_times, height, width))
        var = np.ones((num_times, height, width))
        sci[3][66, 53] = np.nan
        var[3][66, 53] = np.nan
        psfs = [PSF.make_gaussian_kernel(0.5) for _ in range(num_times)]
        stack = ImageStackPy(np.arange(num_times, dtype=float), sci, var, psfs=psfs)

        image_stack_add_fake_object(stack, 50, 60, 1.0, 2.0, flux=100.0)
        for t in range(num_times):
            px = int(50 + t + 0.5)
            py = int(60 + 2.0 * t + 0.5)
            if t == 3:
                assert np.isnan(stack.sci[t][66, 53])
            else:
                assert 50.0 < stack.sci[t][py, px] < 100.0
            assert stack.sci[t][30, 40] == pytest.approx(0.0)

    def test_add_fake_object_quadratic(self):
        num_times, height, width = 5, 200, 300
        stack = ImageStackPy(
            np.arange(num_times, dtype=float),
            np.zeros((num_times, height, width)),
            np.ones((num_times, height, width)),
            psfs=[PSF.make_gaussian_kernel(0.5) for _ in range(num_times)],
        )
        image_stack_add_fake_object(stack, 50, 60, 1.0, 2.0, ax=1.1, ay=-0.5, flux=100.0)
        for t in range(num_times):
            px = int(50 + t + 0.5 * 1.1 * t * t + 0.5)
            py = int(60 + 2.0 * t + 0.5 * (-0.5) * t * t + 0.5)
            assert 50.0 < stack.sci[t][py, px] < 100.0
            assert stack.sci[t][30, 40] == pytest.approx(0.0)


class TestFakeDataSet:
    def test_create_and_reset(self):
        ds = FakeDataSet(30, 40, create_fake_times(4, 57130.0), use_seed=11)
        assert ds.stack_py.num_times == 4
        ds.insert_object(Trajectory(x=10, y=20, vx=1.0, vy=0.0, flux=300.0))
        assert len(ds.trajectories) == 1
        bright = float(ds.stack_py.sci[0][20, 10])
        assert bright > 50.0
        ds.reset()
        assert len(ds.trajectories) == 0
        assert abs(float(ds.stack_py.sci[0][20, 10])) < 50.0

    def test_bounds_check(self):
        ds = FakeDataSet(30, 40, create_fake_times(4, 57130.0), use_seed=11)
        assert ds.trajectory_is_within_bounds(Trajectory(x=10, y=20, vx=0.0, vy=0.0))
        assert not ds.trajectory_is_within_bounds(Trajectory(x=-5, y=20, vx=0.0, vy=0.0))
        # Leaves the chip by the last time.
        assert not ds.trajectory_is_within_bounds(Trajectory(x=29, y=20, vx=500.0, vy=0.0))

    def test_insert_random_object(self):
        ds = FakeDataSet(30, 40, create_fake_times(4, 57130.0), use_seed=11)
        trj = ds.insert_random_object(250.0)
        assert ds.trajectory_is_within_bounds(trj)
        assert trj.flux == 250.0

    def test_save_work_unit(self):
        ds = FakeDataSet(20, 24, create_fake_times(3, 57130.0), use_seed=11)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "fake_wu.fits")
            ds.save_fake_data_to_work_unit(path)
            from kbmod_tpu.work_unit import WorkUnit

            back = WorkUnit.from_fits(path)
            assert back.im_stack.num_times == 3
            np.testing.assert_allclose(back.im_stack.sci[0], ds.stack_py.sci[0], rtol=1e-6)
