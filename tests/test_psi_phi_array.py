"""PsiPhiArray packing/encoding tests (modeled on the reference's
tests/test_psi_phi_array.py)."""

import numpy as np

from kbmod_tpu.core.psf import PSF
from kbmod_tpu.ops.psi_phi import (
    PsiPhiArray,
    fill_psi_phi_array,
    fill_psi_phi_array_from_image_arrays,
    compute_scale_params_from_image_vect,
    encode_uint_scalar,
    decode_uint_scalar,
    generate_psi_phi_images,
)


class TestEncoding:
    def test_scale_params(self):
        imgs = [np.array([[1.0, 2.0], [3.0, np.nan]]), np.array([[0.5, 5.0], [np.nan, 4.0]])]
        mn, mx, scale = compute_scale_params_from_image_vect(imgs, 1)
        assert mn == 0.5
        assert mx == 5.0
        assert np.isclose(scale, 4.5 / 255.0)

    def test_scale_params_no_encoding(self):
        imgs = [np.array([[1.0, 2.0]])]
        mn, mx, scale = compute_scale_params_from_image_vect(imgs, -1)
        assert scale == 1.0

    def test_encode_decode_roundtrip(self):
        mn, mx, scale = 0.0, 10.0, 10.0 / 255.0
        for v in [0.0, 0.5, 3.3, 9.9, 10.0]:
            enc = encode_uint_scalar(v, mn, mx, scale)
            assert enc >= 1.0
            dec = decode_uint_scalar(np.floor(enc), mn, scale)
            assert abs(dec - v) <= scale

    def test_encode_invalid(self):
        assert encode_uint_scalar(np.nan, 0.0, 10.0, 0.1) == 0.0
        assert encode_uint_scalar(np.inf, 0.0, 10.0, 0.1) == 0.0
        assert np.isnan(decode_uint_scalar(0.0, 0.0, 0.1))


class TestPsiPhiArray:
    def _make(self, num_bytes):
        T, H, W = 3, 5, 6
        rng = np.random.default_rng(17)
        psi = [rng.uniform(-1, 3, (H, W)).astype(np.float32) for _ in range(T)]
        phi = [rng.uniform(0.1, 2, (H, W)).astype(np.float32) for _ in range(T)]
        psi[1][2, 3] = np.nan
        phi[1][2, 3] = np.nan
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, num_bytes, psi, phi, np.arange(T) * 0.1)
        return arr, psi, phi

    def test_float_layout(self):
        arr, psi, phi = self._make(-1)
        assert arr.get_num_times() == 3
        assert arr.get_height() == 5
        assert arr.get_width() == 6
        assert arr.get_num_bytes() == 4
        p, f = arr.read_psi_phi(0, 1, 2)
        assert np.isclose(p, psi[0][1, 2])
        assert np.isclose(f, phi[0][1, 2])
        # Masked pixel reads NaN.
        p, f = arr.read_psi_phi(1, 2, 3)
        assert np.isnan(p) and np.isnan(f)
        # Out of bounds reads NaN.
        p, f = arr.read_psi_phi(0, -1, 0)
        assert np.isnan(p)
        p, f = arr.read_psi_phi(0, 0, 100)
        assert np.isnan(p)

    def test_encoded_roundtrip_uint8(self):
        arr, psi, phi = self._make(1)
        assert arr.get_num_bytes() == 1
        # Every valid value decodes within one quantization step.
        p, f = arr.read_psi_phi(0, 1, 2)
        assert abs(p - psi[0][1, 2]) <= arr.get_psi_scale()
        assert abs(f - phi[0][1, 2]) <= arr.get_phi_scale()
        # Masked stays masked.
        p, f = arr.read_psi_phi(1, 2, 3)
        assert np.isnan(p) and np.isnan(f)

    def test_encoded_roundtrip_uint16(self):
        arr, psi, phi = self._make(2)
        assert arr.get_num_bytes() == 2
        p, f = arr.read_psi_phi(2, 4, 5)
        assert abs(p - psi[2][4, 5]) <= arr.get_psi_scale()
        assert abs(f - phi[2][4, 5]) <= arr.get_phi_scale()

    def test_read_times(self):
        arr, _, _ = self._make(-1)
        assert np.isclose(arr.read_time(1), 0.1)

    def test_packed_words_guard_resize(self, monkeypatch):
        """packed_words re-packs (once) when a search requests larger
        guards than the cached stream carries — wide grids (e.g. the
        12-day default, ~790 px column reach) need bigger zero guards for
        the mask-free kernel variants — and honors env overrides."""
        monkeypatch.delenv("KB_PACK_GUARD", raising=False)
        monkeypatch.delenv("KB_PACK_COLSLACK", raising=False)
        arr, _, _ = self._make(1)
        w0, g0 = arr.packed_words()
        assert arr.packed_words()[0] is w0  # cached
        w1, g1 = arr.packed_words(min_row_guard=g0.row_guard + 8,
                                  min_col_slack=g0.col_slack + 128)
        assert w1 is not w0
        assert g1.row_guard >= g0.row_guard + 8
        assert g1.col_slack >= g0.col_slack + 128
        # A smaller (covered) request reuses the bigger stream.
        assert arr.packed_words(min_row_guard=8, min_col_slack=128)[0] is w1
        # Env overrides win: no re-pack even for a larger request.
        monkeypatch.setenv("KB_PACK_GUARD", "256")
        monkeypatch.setenv("KB_PACK_COLSLACK", "256")
        assert arr.packed_words(min_row_guard=10_000, min_col_slack=10_000)[0] is w1

    def test_packed_words_canonical_buckets(self, monkeypatch):
        """Request-driven guards land on the canonical {256, 512, 1024,...}
        lattice: stream shapes are compile keys, so near-identical searches
        (pipeline vs gate scripts vs benches) must resolve to ONE shape for
        the persistent compile cache to serve them all."""
        from kbmod_tpu.ops.search_pallas import auto_pack_guards, canonical_pack_guards

        monkeypatch.delenv("KB_PACK_GUARD", raising=False)
        monkeypatch.delenv("KB_PACK_COLSLACK", raising=False)
        # Bucketing covers every request and is piecewise constant.
        assert canonical_pack_guards(1, 1) == (256, 256)
        assert canonical_pack_guards(204, 411) == (256, 512)
        assert canonical_pack_guards(256, 512) == (256, 512)
        assert canonical_pack_guards(257, 513) == (512, 1024)
        # The reach-derived helper: the default 1.35-day survey grid
        # (dx reach 710, dy reach ~148) resolves to the production
        # pipeline's (256, 512) stream shape.
        vel = np.linspace(92.0, 526.0, 257)
        ang = np.linspace(-np.pi / 15.0, np.pi / 15.0, 129)
        vv, aa = np.meshgrid(vel, ang, indexing="ij")
        times = np.linspace(0.0, 1.35, 10)
        dxs = np.floor((vv * np.cos(aa)).ravel()[:, None] * times[None, :] + 0.5)
        dys = np.floor((vv * np.sin(aa)).ravel()[:, None] * times[None, :] + 0.5)
        assert auto_pack_guards(dxs, dys) == (256, 512)
        # packed_words routes requests through the same lattice.
        arr, _, _ = self._make(1)
        _, g = arr.packed_words(min_row_guard=204, min_col_slack=411)
        assert (g.row_guard, g.col_slack) == (256, 512)


class TestGeneratePsiPhi:
    def test_from_sci_var(self):
        rng = np.random.default_rng(3)
        sci = rng.normal(0, 1, (10, 10)).astype(np.float32)
        var = np.full((10, 10), 4.0, dtype=np.float32)
        var[5, 5] = 0.0  # zero variance must be masked
        sci[2, 2] = np.nan
        psf = PSF.make_gaussian_kernel(0.5)
        psi, phi = generate_psi_phi_images(sci, var, psf)
        assert np.isnan(psi[5, 5]) and np.isnan(phi[5, 5])
        assert np.isnan(psi[2, 2]) and np.isnan(phi[2, 2])
        # With a flat variance, phi = (1/var) * sum(psf^2) everywhere valid
        # (phi convolves with the unnormalized squared kernel, and the
        # masked-fraction rescale keeps a constant field constant).
        good = np.isfinite(phi)
        expected = 0.25 * float(np.sum(psf.astype(np.float64) ** 2))
        assert np.allclose(phi[good], expected, atol=1e-5)

    def test_fill_from_image_arrays(self):
        rng = np.random.default_rng(4)
        T, H, W = 4, 8, 8
        sci = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        var = [np.full((H, W), 2.0, dtype=np.float32) for _ in range(T)]
        psfs = [PSF.make_gaussian_kernel(0.5) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array_from_image_arrays(arr, -1, sci, var, psfs, np.arange(T) * 0.1)
        assert arr.get_num_times() == T
        psi_expected, phi_expected = generate_psi_phi_images(sci[0], var[0], psfs[0])
        p, f = arr.read_psi_phi(0, 3, 3)
        assert np.isclose(p, psi_expected[3, 3], atol=1e-5)
        assert np.isclose(f, phi_expected[3, 3], atol=1e-5)


class TestStreamingEncodedBuild:
    """The device-streaming quantized build (fill_psi_phi_array_streaming)
    must produce the same codes and meta as the legacy host-side encode.
    On the CPU/XLA conv path both routes share one conv computation, so
    equality is exact."""

    def _stack(self, seed, T=10, H=12, W=14, mixed_psfs=False):
        rng = np.random.default_rng(seed)
        sci = [rng.normal(0, 2, (H, W)).astype(np.float32) for _ in range(T)]
        var = [rng.uniform(0.5, 4.0, (H, W)).astype(np.float32) for _ in range(T)]
        sci[1][3, 4] = np.nan
        var[2][5, 6] = np.nan
        var[3][0, 0] = 0.0  # zero variance must mask
        if mixed_psfs:
            # Interleave two kernel sizes so the PSF groups are
            # NON-contiguous index sets (exercises the scatter).
            psfs = [
                PSF.make_gaussian_kernel(0.5 if i % 2 else 1.0) for i in range(T)
            ]
        else:
            psfs = [PSF.make_gaussian_kernel(0.7)] * T
        return sci, var, psfs

    def _compare(self, num_bytes, mixed_psfs, monkeypatch, batch_bytes=None):
        from kbmod_tpu.ops.psi_phi import fill_psi_phi_array_streaming

        sci, var, psfs = self._stack(11, mixed_psfs=mixed_psfs)
        times = np.arange(len(sci)) * 0.1
        if batch_bytes is not None:
            monkeypatch.setenv("KB_CONV_BATCH_BYTES", str(batch_bytes))

        ref = PsiPhiArray()
        monkeypatch.setenv("KB_DEVICE_ENCODE", "0")
        fill_psi_phi_array_from_image_arrays(ref, num_bytes, sci, var, psfs, times)

        got = PsiPhiArray()
        fill_psi_phi_array_streaming(got, num_bytes, sci, var, psfs, times)

        assert got.psi.dtype == ref.psi.dtype
        np.testing.assert_array_equal(np.asarray(got.psi), np.asarray(ref.psi))
        np.testing.assert_array_equal(np.asarray(got.phi), np.asarray(ref.phi))
        for f in ("psi_min_val", "psi_max_val", "psi_scale",
                  "phi_min_val", "phi_max_val", "phi_scale",
                  "num_bytes", "block_size", "num_times", "height", "width"):
            assert np.isclose(getattr(got.meta, f), getattr(ref.meta, f), rtol=1e-6), f
        assert got.valid is None

    def test_uint8_single_psf(self, monkeypatch):
        self._compare(1, mixed_psfs=False, monkeypatch=monkeypatch)

    def test_uint16_single_psf(self, monkeypatch):
        self._compare(2, mixed_psfs=False, monkeypatch=monkeypatch)

    def test_uint8_mixed_psfs(self, monkeypatch):
        self._compare(1, mixed_psfs=True, monkeypatch=monkeypatch)

    def test_uint8_small_chunks_tail_padding(self, monkeypatch):
        # Force batch=3 (3 * 4 planes * 12*14 * 4B = 8064B) so a 10-image
        # group splits 3+3+3+1 and the tail pads by repeating an index.
        self._compare(1, mixed_psfs=False, monkeypatch=monkeypatch,
                      batch_bytes=3 * 4 * 12 * 14 * 4)

    def test_dispatch_uses_streaming_by_default(self, monkeypatch):
        sci, var, psfs = self._stack(12)
        times = np.arange(len(sci)) * 0.1
        arr = PsiPhiArray()
        fill_psi_phi_array_from_image_arrays(arr, 1, sci, var, psfs, times)
        ref = PsiPhiArray()
        monkeypatch.setenv("KB_DEVICE_ENCODE", "0")
        fill_psi_phi_array_from_image_arrays(ref, 1, sci, var, psfs, times)
        np.testing.assert_array_equal(np.asarray(arr.psi), np.asarray(ref.psi))
