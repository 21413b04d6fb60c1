"""Point Spread Function representation and masked convolution.

API-compatible with the reference's ``kbmod.core.psf`` (src/kbmod/core/
psf.py), with the torch conv2d path replaced by a JAX/XLA convolution
(kbmod_tpu.ops.convolve).
"""

import numpy as np

from kbmod_tpu.ops.convolve import convolve_psf_and_image


class PSF:
    """A Point Spread Function: an odd-width square, non-negative, normalized
    2D kernel.

    Attributes
    ----------
    kernel : np.ndarray
        A 2D numpy array representing the PSF.
    width : int
        The width of the PSF kernel.
    radius : int
        The radius of the PSF kernel.
    """

    def __init__(self, kernel):
        if np.isscalar(kernel):
            # A scalar is the standard deviation of a Gaussian kernel.
            kernel = self.make_gaussian_kernel(kernel)
        kernel = np.asanyarray(kernel, dtype=np.float32)
        if kernel.ndim != 2 or kernel.shape[0] != kernel.shape[1]:
            raise ValueError(f"PSF kernel must be a 2D square array (shape={kernel.shape}).")

        self.width = kernel.shape[0]
        if self.width % 2 == 0:
            raise ValueError(f"PSF kernel must have an odd width (width={self.width}).")
        self.radius = (self.width - 1) // 2

        if np.any(kernel < 0):
            raise ValueError("PSF kernel values must be non-negative.")
        if not np.all(np.isfinite(kernel)):
            raise ValueError("PSF kernel values must be finite.")

        self.kernel = kernel
        self._normalize()

    @property
    def shape(self):
        return self.kernel.shape

    @staticmethod
    def make_gaussian_kernel(stddev, normalize=True):
        """Create a symmetric Gaussian kernel with radius = int(3 * stddev)
        (matching reference psf.py:64-74)."""
        if stddev < 0:
            raise ValueError("Standard deviation must be non-negative.")
        radius = int(3 * stddev)
        ax = np.arange(-radius, radius + 1)
        xx, yy = np.meshgrid(ax, ax)
        kernel = np.exp(-0.5 * (xx**2 + yy**2) / stddev**2)
        if normalize:
            kernel /= np.sum(kernel)
        return kernel.astype(np.float32)

    @classmethod
    def from_gaussian(cls, stddev):
        return cls(cls.make_gaussian_kernel(stddev))

    def copy(self):
        return PSF(self.kernel.copy())

    def _normalize(self):
        self.kernel /= np.sum(self.kernel)

    def convolve_image(self, image, scale_by_masked=True, in_place=False, device=None):
        """Masked 2D convolution of ``image`` with this PSF kernel."""
        return convolve_psf_and_image(
            image,
            self.kernel,
            scale_by_masked=scale_by_masked,
            in_place=in_place,
            device=device,
        )


__all__ = ["PSF", "convolve_psf_and_image"]
