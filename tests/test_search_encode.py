"""Quantized (uint8/uint16) search-path tests (modeled on the reference's
tests/test_search_encode.py): the code-streaming kernel must agree exactly
with searching the decoded planes."""

import numpy as np
import jax.numpy as jnp
import pytest

from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
from kbmod_tpu.ops.search import core_search, search_topk_shift, trajectory_offsets


@pytest.fixture(scope="module", params=[1, 2])
def encoded(request):
    rng = np.random.default_rng(55)
    T, H, W = 6, 20, 24
    times = np.arange(T) * 0.4
    psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
    phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
    for t in range(T):
        bad = rng.uniform(size=(H, W)) < 0.05
        psi[t][bad] = np.nan
        phi[t][bad] = np.nan
    arr = PsiPhiArray()
    fill_psi_phi_array(arr, request.param, psi, phi, times)
    return arr, times


class TestEncodedSearch:
    def test_codes_match_decoded_search(self, encoded):
        arr, times = encoded
        T = arr.get_num_times()
        H, W = arr.get_height(), arr.get_width()
        vxs = np.array([0.0, 2.5, -3.0, 1.2], dtype=np.float32)
        vys = np.array([1.0, -2.0, 0.5, 3.1], dtype=np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        meta = arr.meta

        # Reference: search the decoded planes.
        psi_z, phi_z, valid = arr.decoded_psi_phi()
        ref_lh, ref_idx = search_topk_shift(
            jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=2,
        )

        # Encoded: stream the codes with in-register decode.
        enc_lh, enc_idx = search_topk_shift(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi), jnp.zeros((1, 1, 1), jnp.uint8),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=2,
            encode_meta=jnp.asarray(
                np.array([meta.psi_min_val, meta.psi_scale, meta.phi_min_val, meta.phi_scale], np.float32)
            ),
        )
        np.testing.assert_allclose(np.asarray(enc_lh), np.asarray(ref_lh), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(enc_idx), np.asarray(ref_idx))

    def test_core_search_encoded_path(self, encoded):
        arr, times = encoded
        H, W = arr.get_height(), arr.get_width()
        vxs = np.array([0.0, 2.5, -3.0], dtype=np.float32)
        vys = np.array([1.0, -2.0, 0.5], dtype=np.float32)
        psi_z, phi_z, valid = arr.decoded_psi_phi()
        meta = arr.meta
        enc = core_search(
            psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 2,
            psi_codes=arr.psi, phi_codes=arr.phi,
            encode_meta=(meta.psi_min_val, meta.psi_scale, meta.phi_min_val, meta.phi_scale),
        )
        ref = core_search(psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 2)
        np.testing.assert_allclose(enc["lh"], ref["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(enc["obs_count"], ref["obs_count"])
