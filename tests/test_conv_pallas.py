"""Fused Pallas psi/phi build vs the XLA masked-conv path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kbmod_tpu.core.psf import PSF
from kbmod_tpu.ops.conv_pallas import psi_phi_conv_pallas
from kbmod_tpu.ops.psi_phi import _psi_phi_from_sci_var


@pytest.mark.parametrize("hw", [(40, 48), (33, 50)])
@pytest.mark.parametrize("sigma", [1.0, 1.4])
def test_matches_xla(hw, sigma):
    rng = np.random.default_rng(9)
    T = 3
    H, W = hw
    sci = rng.normal(10, 2, (T, H, W)).astype(np.float32)
    var = rng.uniform(1, 4, (T, H, W)).astype(np.float32)
    bad = rng.uniform(size=(T, H, W)) < 0.06
    sci[bad] = np.nan
    var[rng.uniform(size=(T, H, W)) < 0.03] = np.nan
    psf = PSF.make_gaussian_kernel(sigma)

    ref_psi, ref_phi = _psi_phi_from_sci_var(
        jnp.asarray(sci), jnp.asarray(var), jnp.asarray(psf, dtype=jnp.float32)
    )
    pal_psi, pal_phi = psi_phi_conv_pallas(
        jnp.asarray(sci), jnp.asarray(var), jnp.asarray(psf, dtype=jnp.float32),
        row_tile=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(pal_psi), np.asarray(ref_psi), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal_phi), np.asarray(ref_phi), rtol=1e-5, atol=1e-5)
    # NaN masks line up exactly.
    np.testing.assert_array_equal(np.isnan(np.asarray(pal_psi)), np.isnan(np.asarray(ref_psi)))


def test_identity_psf():
    rng = np.random.default_rng(3)
    sci = rng.normal(5, 1, (2, 16, 24)).astype(np.float32)
    var = rng.uniform(1, 2, (2, 16, 24)).astype(np.float32)
    psf = np.array([[1.0]], dtype=np.float32)
    psi, phi = psi_phi_conv_pallas(
        jnp.asarray(sci), jnp.asarray(var), jnp.asarray(psf), row_tile=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(psi), sci / var, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(phi), 1.0 / var, rtol=1e-6)
