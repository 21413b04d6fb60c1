"""PSF and masked-convolution tests (modeled on the reference's
tests/test_psf.py and test_python_parity.py)."""

import numpy as np
import pytest

from kbmod_tpu.core.psf import PSF, convolve_psf_and_image


def brute_force_masked_convolve(image, kernel, scale_by_masked=True):
    """Independent O(N*k^2) reference implementation of the masked
    convolution semantics (zero-padded correlation, unmasked-fraction
    rescale, NaN remask)."""
    H, W = image.shape
    r = kernel.shape[0] // 2
    out = np.full_like(image, np.nan, dtype=np.float64)
    ktotal = kernel.sum()
    for i in range(H):
        for j in range(W):
            if not np.isfinite(image[i, j]):
                continue
            acc = 0.0
            used = 0.0
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    ii, jj = i + di, j + dj
                    kv = kernel[di + r, dj + r]
                    if 0 <= ii < H and 0 <= jj < W and np.isfinite(image[ii, jj]):
                        acc += kv * image[ii, jj]
                        used += kv
            if scale_by_masked:
                acc *= ktotal / max(used, 1e-24)
            out[i, j] = acc
    return out


class TestPSF:
    def test_gaussian_kernel(self):
        psf = PSF.from_gaussian(1.0)
        assert psf.width == 7
        assert psf.radius == 3
        assert psf.kernel.shape == (7, 7)
        assert np.isclose(psf.kernel.sum(), 1.0, atol=1e-6)
        # Symmetric and peaked at the center.
        assert np.allclose(psf.kernel, psf.kernel.T)
        assert psf.kernel[3, 3] == psf.kernel.max()

    def test_scalar_constructor(self):
        psf = PSF(0.5)
        assert psf.width == 3

    def test_invalid_kernels(self):
        with pytest.raises(ValueError):
            PSF(np.ones((2, 2)))  # even width
        with pytest.raises(ValueError):
            PSF(np.ones((3, 4)))  # not square
        with pytest.raises(ValueError):
            PSF(-np.ones((3, 3)))  # negative
        with pytest.raises(ValueError):
            PSF(np.full((3, 3), np.nan))  # non-finite

    def test_normalization(self):
        psf = PSF(np.full((3, 3), 2.0))
        assert np.isclose(psf.kernel.sum(), 1.0)


class TestMaskedConvolve:
    def test_identity_kernel(self):
        rng = np.random.default_rng(42)
        img = rng.normal(0, 1, (16, 16)).astype(np.float32)
        out = convolve_psf_and_image(img, np.array([[1.0]], dtype=np.float32))
        assert np.allclose(out, img, atol=1e-6)

    def test_matches_brute_force_no_mask(self):
        rng = np.random.default_rng(7)
        img = rng.normal(0, 1, (12, 15)).astype(np.float32)
        kernel = PSF.make_gaussian_kernel(0.8)
        out = convolve_psf_and_image(img, kernel)
        expected = brute_force_masked_convolve(img.astype(np.float64), kernel.astype(np.float64))
        assert np.allclose(out, expected, atol=1e-4)

    def test_matches_brute_force_with_mask(self):
        rng = np.random.default_rng(8)
        img = rng.normal(0, 1, (12, 12)).astype(np.float32)
        img[3, 4] = np.nan
        img[0, 0] = np.nan
        img[7, 7:10] = np.nan
        kernel = PSF.make_gaussian_kernel(1.0)
        out = convolve_psf_and_image(img, kernel)
        expected = brute_force_masked_convolve(img.astype(np.float64), kernel.astype(np.float64))
        # NaNs preserved at masked pixels.
        assert np.array_equal(np.isnan(out), np.isnan(img))
        finite = np.isfinite(expected)
        assert np.allclose(out[finite], expected[finite], atol=1e-4)

    def test_no_scale_by_masked(self):
        rng = np.random.default_rng(9)
        img = rng.normal(0, 1, (10, 10)).astype(np.float32)
        img[5, 5] = np.nan
        kernel = PSF.make_gaussian_kernel(0.6)
        out = convolve_psf_and_image(img, kernel, scale_by_masked=False)
        expected = brute_force_masked_convolve(
            img.astype(np.float64), kernel.astype(np.float64), scale_by_masked=False
        )
        finite = np.isfinite(expected)
        assert np.allclose(out[finite], expected[finite], atol=1e-4)

    def test_in_place(self):
        img = np.ones((8, 8), dtype=np.float32)
        result = convolve_psf_and_image(img, PSF.make_gaussian_kernel(0.7), in_place=True)
        assert result is img
