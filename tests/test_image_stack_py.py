"""ImageStackPy / LayeredImagePy tests (reference: tests/test_image_stack_py.py
behavior; module kbmod_tpu/core/image_stack_py.py)."""

import numpy as np
import pytest

from kbmod_tpu.core.image_stack_py import ImageStackPy, LayeredImagePy
from kbmod_tpu.core.psf import PSF


def make_stack(n=4, h=10, w=12, seed=0):
    rng = np.random.default_rng(seed)
    times = 57130.0 + 0.05 * np.arange(n)
    sci = [rng.normal(10.0, 1.0, (h, w)).astype(np.float32) for _ in range(n)]
    var = [rng.uniform(1.0, 2.0, (h, w)).astype(np.float32) for _ in range(n)]
    return ImageStackPy(times=times, sci=sci, var=var)


class TestConstruction:
    def test_basic(self):
        stack = make_stack()
        assert len(stack) == 4
        assert stack.num_times == 4
        assert (stack.height, stack.width) == (10, 12)
        assert stack.npixels == 120
        assert stack.total_pixels == 480
        np.testing.assert_allclose(stack.zeroed_times, [0.0, 0.05, 0.1, 0.15])

    def test_empty(self):
        stack = ImageStackPy()
        assert len(stack) == 0
        assert stack.height == -1

    def test_validation_errors(self):
        times = [1.0, 2.0]
        img = np.ones((4, 4), dtype=np.float32)
        with pytest.raises(ValueError):
            ImageStackPy(times=times, sci=[img], var=[img, img])
        with pytest.raises(ValueError):
            ImageStackPy(times=times, sci=[img, img], var=[img])
        with pytest.raises(ValueError):
            ImageStackPy(times=times, sci=None, var=[img, img])

    def test_mask_applied(self):
        times = [0.0]
        sci = [np.ones((4, 4), dtype=np.float32)]
        var = [np.ones((4, 4), dtype=np.float32)]
        mask = [np.zeros((4, 4))]
        mask[0][1, 2] = 1
        stack = ImageStackPy(times=times, sci=sci, var=var, mask=mask)
        assert np.isnan(stack.sci[0][1, 2])
        assert np.isnan(stack.var[0][1, 2])
        assert stack.num_masked_pixels()[0] == 1

    def test_psf_normalization(self):
        stack = make_stack()
        # Default PSFs are identity kernels.
        for p in stack.psfs:
            np.testing.assert_allclose(p, [[1.0]])
        stack2 = ImageStackPy(
            times=[0.0], sci=[np.ones((4, 4))], var=[np.ones((4, 4))],
            psfs=[PSF.make_gaussian_kernel(1.0)],
        )
        assert stack2.psfs[0].shape[0] % 2 == 1


class TestOperations:
    def test_get_mask_and_fractions(self):
        stack = make_stack()
        stack.sci[1][0, 0] = np.nan
        assert stack.get_mask(1)[0, 0]
        assert not stack.get_mask(0)[0, 0]
        fracs = stack.get_masked_fractions()
        assert fracs[1] == pytest.approx(1.0 / 120)
        with pytest.raises(IndexError):
            stack.get_mask(9)

    def test_scale_images_magnitude(self):
        stack = make_stack()
        before_sci = stack.sci[0].copy()
        before_var = stack.var[0].copy()
        stack.scale_images(2.5, is_magnitude=True)  # flux scale = 10
        np.testing.assert_allclose(stack.sci[0], before_sci / 10.0, rtol=1e-6)
        np.testing.assert_allclose(stack.var[0], before_var / 100.0, rtol=1e-6)

    def test_scale_images_flux_vector(self):
        stack = make_stack(n=2)
        before = [s.copy() for s in stack.sci]
        stack.scale_images(np.array([2.0, 4.0]), is_magnitude=False)
        np.testing.assert_allclose(stack.sci[0], before[0] / 2.0, rtol=1e-6)
        np.testing.assert_allclose(stack.sci[1], before[1] / 4.0, rtol=1e-6)
        with pytest.raises(ValueError):
            stack.scale_images(np.ones(5), is_magnitude=False)

    def test_append_and_filter(self):
        stack = make_stack(n=3)
        stack.append_image(57131.0, np.ones((10, 12)), np.ones((10, 12)))
        assert len(stack) == 4
        stack.filter_images(np.array([True, False, True, True]))
        assert len(stack) == 3
        np.testing.assert_allclose(stack.times, [57130.0, 57130.1, 57131.0])

    def test_append_layered_image(self):
        stack = make_stack(n=1)
        layer = LayeredImagePy(np.ones((10, 12)), np.ones((10, 12)), time=57140.0)
        assert (layer.width, layer.height) == (12, 10)
        stack.append_layered_image(layer)
        assert len(stack) == 2
        assert stack.times[-1] == 57140.0

    def test_bounds_masking(self):
        stack = make_stack()
        stack.sci[0][2, 3] = 1e25
        stack.mask_by_science_bounds(min_val=-1e20, max_val=1e20)
        assert np.isnan(stack.sci[0][2, 3])
        stack.var[1][4, 4] = 0.0
        stack.mask_by_variance_bounds()
        assert np.isnan(stack.sci[1][4, 4])

    def test_sort_by_time(self):
        rng = np.random.default_rng(1)
        times = [3.0, 1.0, 2.0]
        sci = [np.full((4, 4), float(i)) for i in range(3)]
        var = [np.ones((4, 4)) for _ in range(3)]
        stack = ImageStackPy(times=times, sci=sci, var=var)
        stack.sort_by_time()
        np.testing.assert_allclose(stack.times, [1.0, 2.0, 3.0])
        assert stack.sci[0][0, 0] == 1.0  # image originally at index 1
        np.testing.assert_allclose(stack.zeroed_times, [0.0, 1.0, 2.0])

    def test_copy_and_eq(self):
        stack = make_stack()
        dup = stack.copy()
        assert dup == stack
        dup.sci[0][0, 0] += 1.0
        assert dup != stack

    def test_get_matched_obstimes(self):
        stack = make_stack()
        got = stack.get_matched_obstimes([57130.05, 57139.0])
        np.testing.assert_array_equal(got, [1, -1])

    def test_validate(self):
        stack = make_stack()
        assert stack.validate()
        stack.sci[0][:, :] = np.nan
        assert not stack.validate(masked_fraction=0.5)

    def test_stacked_views(self):
        stack = make_stack()
        assert stack.stacked_sci().shape == (4, 10, 12)
        assert stack.stacked_var().shape == (4, 10, 12)
