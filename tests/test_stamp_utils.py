"""Stamp extraction / coadd tests (modeled on the reference's
tests/test_stamp_utils.py)."""

import numpy as np
import pytest

from kbmod_tpu.core.stamp_utils import (
    extract_stamp,
    extract_stamp_stack,
    extract_curve_values,
    coadd_sum,
    coadd_mean,
    coadd_median,
    coadd_weighted,
    create_stamps_from_image_stack,
)
from kbmod_tpu.fake_data.fake_data_creator import make_fake_image_stack
from kbmod_tpu.ops.stamps import batched_coadds
from kbmod_tpu.search import Trajectory


class TestExtractStamp:
    def setup_method(self):
        self.img = np.arange(100, dtype=np.float32).reshape(10, 10)

    def test_center(self):
        stamp = extract_stamp(self.img, 5, 5, 2)
        assert stamp.shape == (5, 5)
        assert stamp[2, 2] == self.img[5, 5]

    def test_edge_nan_padding(self):
        stamp = extract_stamp(self.img, 0, 0, 2)
        assert np.isnan(stamp[0, 0])
        assert stamp[2, 2] == self.img[0, 0]
        assert np.isnan(stamp[:, :2]).all()
        assert np.isnan(stamp[:2, :]).all()

    def test_fully_outside(self):
        stamp = extract_stamp(self.img, 50, 50, 2)
        assert np.isnan(stamp).all()

    def test_stack_and_mask(self):
        imgs = np.stack([self.img + 100 * t for t in range(4)])
        stamps = extract_stamp_stack(imgs, [5] * 4, [5] * 4, 1, to_include=[0, 2])
        assert stamps.shape == (2, 3, 3)
        assert stamps[1, 1, 1] == self.img[5, 5] + 200


class TestCurveValues:
    def test_basic_and_oob(self):
        imgs = np.stack([np.full((8, 8), float(t)) for t in range(3)])
        vals = extract_curve_values(imgs, [2, 3, 100], [2, 3, 3])
        assert vals[0] == 0.0
        assert vals[1] == 1.0
        assert np.isnan(vals[2])

    def test_matrix_form(self):
        imgs = np.stack([np.full((8, 8), float(t)) for t in range(3)])
        x = np.array([[1, 2, 3], [4, 5, -1]])
        y = np.array([[1, 2, 3], [4, 5, 5]])
        vals = extract_curve_values(imgs, x, y)
        assert vals.shape == (2, 3)
        assert np.isnan(vals[1, 2])


class TestCoadds:
    def setup_method(self):
        self.stack = np.array(
            [
                [[1.0, 2.0], [3.0, np.nan]],
                [[3.0, np.nan], [5.0, np.nan]],
                [[5.0, 4.0], [7.0, np.nan]],
            ],
            dtype=np.float32,
        )

    def test_sum(self):
        out = coadd_sum(self.stack)
        np.testing.assert_allclose(out, [[9.0, 6.0], [15.0, 0.0]])

    def test_mean(self):
        out = coadd_mean(self.stack)
        np.testing.assert_allclose(out, [[3.0, 3.0], [5.0, 0.0]])

    def test_median_lower(self):
        # Even-count pixels take the lower median (torch semantics).
        stack = np.array([[[1.0]], [[2.0]], [[3.0]], [[4.0]]], dtype=np.float32)
        assert coadd_median(stack)[0, 0] == 2.0
        assert coadd_median(self.stack)[0, 0] == 3.0
        assert coadd_median(self.stack)[1, 1] == 0.0

    def test_weighted(self):
        var = np.array(
            [
                [[1.0, 1.0], [1.0, 1.0]],
                [[1.0, 1.0], [2.0, 1.0]],
                [[1.0, 2.0], [1.0, 1.0]],
            ],
            dtype=np.float32,
        )
        out = coadd_weighted(self.stack, var)
        np.testing.assert_allclose(out[0, 0], 3.0)
        np.testing.assert_allclose(out[0, 1], (2.0 + 4.0 / 2.0) / 1.5)
        np.testing.assert_allclose(out[1, 1], 0.0)


class TestBatchedCoaddsDevice:
    def test_matches_host_coadds(self):
        rng = np.random.default_rng(6)
        stack = make_fake_image_stack(40, 44, np.arange(6) * 0.3, rng=rng)
        trj = Trajectory(x=20, y=18, vx=4.0, vy=-2.0)
        host_stamps = np.asarray(create_stamps_from_image_stack(stack, trj, 5))

        out = batched_coadds(
            stack.stacked_sci(), stack.stacked_var(), stack.zeroed_times,
            [trj.x], [trj.y], [trj.vx], [trj.vy], 5,
            ["sum", "mean", "median", "weighted", "all_stamps"],
        )
        np.testing.assert_allclose(out["sum"][0], coadd_sum(host_stamps), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["mean"][0], coadd_mean(host_stamps), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["median"][0], coadd_median(host_stamps), rtol=1e-5, atol=1e-5)
        assert out["all_stamps"].shape == (1, 6, 11, 11)
        np.testing.assert_allclose(out["all_stamps"][0], np.nan_to_num(host_stamps), rtol=1e-5, atol=1e-5)

    def test_obs_valid_subset(self):
        rng = np.random.default_rng(7)
        stack = make_fake_image_stack(30, 30, np.arange(4) * 0.5, rng=rng)
        trj = Trajectory(x=15, y=15, vx=0.0, vy=0.0)
        valid = np.array([[True, False, True, False]])
        out = batched_coadds(
            stack.stacked_sci(), stack.stacked_var(), stack.zeroed_times,
            [trj.x], [trj.y], [trj.vx], [trj.vy], 3, ["mean"], obs_valid=valid,
        )
        host_stamps = np.asarray(create_stamps_from_image_stack(stack, trj, 3, to_include=valid[0]))
        np.testing.assert_allclose(out["mean"][0], coadd_mean(host_stamps), rtol=1e-5, atol=1e-5)
