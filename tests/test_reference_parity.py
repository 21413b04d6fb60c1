"""Direct parity against the reference implementation's pure-Python core.

Loads the reference's torch-based masked convolution
(/root/reference/src/kbmod/core/psf.py) standalone and checks our JAX
implementation matches to ~1e-4 — the analog of the reference's own
tests/test_python_parity.py.
"""

import importlib.util
import os

import numpy as np
import pytest

REF_PSF = "/root/reference/src/kbmod/core/psf.py"

requires_reference = pytest.mark.skipif(
    not os.path.isfile(REF_PSF), reason="reference implementation not available"
)


def _load_reference_psf():
    spec = importlib.util.spec_from_file_location("ref_psf", REF_PSF)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@requires_reference
class TestConvolutionParity:
    def setup_method(self):
        self.ref = _load_reference_psf()

    def _compare(self, image, kernel, scale_by_masked=True):
        from kbmod_tpu.ops.convolve import convolve_psf_and_image

        expected = self.ref.convolve_psf_and_image(
            image.copy(), kernel, scale_by_masked=scale_by_masked, device="cpu"
        )
        got = convolve_psf_and_image(image.copy(), kernel, scale_by_masked=scale_by_masked)
        assert np.array_equal(np.isnan(expected), np.isnan(got))
        finite = np.isfinite(expected)
        np.testing.assert_allclose(got[finite], expected[finite], rtol=1e-4, atol=1e-4)

    def test_unmasked(self):
        rng = np.random.default_rng(11)
        image = rng.normal(0, 1, (32, 40)).astype(np.float32)
        kernel = self.ref.PSF.make_gaussian_kernel(1.2)
        self._compare(image, kernel)

    def test_masked(self):
        rng = np.random.default_rng(12)
        image = rng.normal(0, 1, (24, 24)).astype(np.float32)
        image[rng.uniform(size=(24, 24)) < 0.1] = np.nan
        kernel = self.ref.PSF.make_gaussian_kernel(0.8)
        self._compare(image, kernel)
        self._compare(image, kernel, scale_by_masked=False)

    def test_gaussian_kernel_parity(self):
        from kbmod_tpu.core.psf import PSF

        for std in (0.5, 1.0, 1.4, 2.3):
            ref_k = self.ref.PSF.make_gaussian_kernel(std)
            our_k = PSF.make_gaussian_kernel(std)
            np.testing.assert_allclose(our_k, ref_k, rtol=1e-6)

    def test_psi_phi_parity(self):
        """Our psi/phi generation vs the reference's shift_and_stack math
        (replicated here with the reference's own convolution)."""
        from kbmod_tpu.ops.psi_phi import generate_psi_phi_images

        rng = np.random.default_rng(13)
        sci = rng.normal(0, 2, (28, 28)).astype(np.float32)
        var = rng.uniform(1.0, 4.0, (28, 28)).astype(np.float32)
        sci[3, 4] = np.nan
        var[10, 10] = 0.0
        kernel = self.ref.PSF.make_gaussian_kernel(1.0)

        # Reference math (shift_and_stack.py:28-45) with reference conv.
        valid = ~(np.isnan(sci) | np.isnan(var) | (var <= 0.0))
        psi_raw = np.full_like(sci, np.nan)
        phi_raw = np.full_like(sci, np.nan)
        psi_raw[valid] = sci[valid] / var[valid]
        phi_raw[valid] = 1.0 / var[valid]
        ref_psi = self.ref.convolve_psf_and_image(psi_raw, kernel, device="cpu")
        ref_phi = self.ref.convolve_psf_and_image(phi_raw, kernel**2, device="cpu")

        psi, phi = generate_psi_phi_images(sci, var, kernel)
        assert np.array_equal(np.isnan(ref_psi), np.isnan(psi))
        finite = np.isfinite(ref_psi)
        np.testing.assert_allclose(psi[finite], ref_psi[finite], rtol=1e-4, atol=1e-4)
        finite = np.isfinite(ref_phi)
        np.testing.assert_allclose(phi[finite], ref_phi[finite], rtol=1e-4, atol=1e-4)
