"""BINTABLE + tiled-image (CompImageHDU) codec tests: roundtrips through
our writer/reader, RICE bitstream edge cases, and quantized-float
semantics (the layouts astropy/CFITSIO produce for the reference's
WorkUnit files; work_unit.py:1062-1147)."""

import numpy as np
import pytest

from kbmod_tpu.io.rice import rice_decode, rice_encode
from kbmod_tpu.io.comp_image import compress_image, decompress_image
from kbmod_tpu.io.fits_io import (
    BinTableHDU,
    HDUList,
    ImageHDU,
    make_comp_image_hdu,
    read_fits,
    write_fits,
)


class TestRice:
    @pytest.mark.parametrize("bytepix", [1, 2, 4])
    def test_roundtrip_random(self, bytepix):
        rng = np.random.default_rng(3)
        lim = 2 ** (8 * bytepix - 1)
        vals = rng.integers(-lim, lim, 257, dtype=np.int64).astype(np.int32)
        if bytepix < 4:
            vals = (vals % (2 * lim) - lim).astype(np.int32)
        out = rice_decode(rice_encode(vals, bytepix), len(vals), bytepix)
        np.testing.assert_array_equal(out, vals)

    def test_roundtrip_constant(self):
        vals = np.full(100, 42, dtype=np.int32)
        enc = rice_encode(vals, 4)
        np.testing.assert_array_equal(rice_decode(enc, 100, 4), vals)
        # Constant blocks collapse to fs=0 markers: tiny stream.
        assert len(enc) < 4 + 4

    def test_roundtrip_ramp_and_noise(self):
        rng = np.random.default_rng(5)
        vals = (np.arange(1000) * 3 + rng.integers(-5, 5, 1000)).astype(np.int32)
        np.testing.assert_array_equal(rice_decode(rice_encode(vals, 4), 1000, 4), vals)

    def test_high_entropy_direct_blocks(self):
        rng = np.random.default_rng(7)
        vals = rng.integers(-(2**30), 2**30, 64, dtype=np.int64).astype(np.int32)
        np.testing.assert_array_equal(rice_decode(rice_encode(vals, 4), 64, 4), vals)

    def test_known_vector(self):
        # Hand-decodable stream: first value 5 (raw int32 BE), then one
        # all-zero-diff block (fs code 0 in 5 bits).
        data = (5).to_bytes(4, "big", signed=True) + bytes([0b00000000])
        np.testing.assert_array_equal(rice_decode(data, 32, 4), np.full(32, 5, np.int32))


class TestCompImage:
    def _roundtrip(self, data, **kw):
        cards, cols = compress_image(data, **kw)
        out, hdr = decompress_image(cards, cols)
        return out, hdr

    @pytest.mark.parametrize("ctype", ["RICE_1", "GZIP_1", "GZIP_2", "NOCOMPRESS"])
    def test_int_lossless(self, ctype):
        rng = np.random.default_rng(11)
        img = rng.integers(-100, 4000, (17, 23)).astype(np.int32)
        out, hdr = self._roundtrip(img, compression_type=ctype, tile_rows=4)
        np.testing.assert_array_equal(out, img)
        assert hdr["BITPIX"] == 32

    @pytest.mark.parametrize("ctype", ["GZIP_1", "GZIP_2"])
    def test_float_gzip_lossless(self, ctype):
        rng = np.random.default_rng(12)
        img = rng.normal(0, 100, (9, 33)).astype(np.float32)
        img[3, 4] = np.nan
        out, _ = self._roundtrip(img, compression_type=ctype, tile_rows=3)
        np.testing.assert_array_equal(out, img)

    def test_float_rice_quantized(self):
        rng = np.random.default_rng(13)
        img = rng.normal(50, 10, (20, 31)).astype(np.float32)
        img[0, 0] = np.nan
        img[7, 7] = np.nan
        out, _ = self._roundtrip(img, compression_type="RICE_1", quantize_level=-0.01)
        # Quantized to 0.01 steps: within half a quantum.
        finite = np.isfinite(img)
        assert np.isnan(out[~finite]).all()
        np.testing.assert_allclose(out[finite], img[finite], atol=0.0051)

    def test_mask_int8(self):
        img = (np.arange(64).reshape(8, 8) % 3 == 0).astype(np.int8)
        out, _ = self._roundtrip(img.astype(np.uint8), compression_type="RICE_1")
        np.testing.assert_array_equal(out, img)

    def test_dithered_quantization_self_consistent(self):
        """SUBTRACTIVE_DITHER_1 decode inverts our spec-matched encode."""
        from kbmod_tpu.io.comp_image import _tile_rand, NULL_VALUE

        rng = np.random.default_rng(14)
        img = rng.normal(0, 5, (4, 64)).astype(np.float64)
        scale, zero, zdither0 = 0.01, -20.0, 77
        cards, cols = compress_image(img.astype(np.float32), compression_type="RICE_1",
                                     quantize_level=-scale, tile_rows=1)
        # Re-quantize by hand with dithering and decode through the codec.
        tiles, zs, zz = [], [], []
        for itile in range(4):
            tile = img[itile]
            rnd = _tile_rand(itile, zdither0, tile.size)
            ints = np.round((tile - zero) / scale + rnd - 0.5).astype(np.int64)
            from kbmod_tpu.io.rice import rice_encode

            tiles.append(np.frombuffer(rice_encode(ints, 4), np.uint8))
            zs.append(scale)
            zz.append(zero)
        cards = dict(cards)
        cards.update(ZQUANTIZ="SUBTRACTIVE_DITHER_1", ZDITHER0=zdither0)
        cols = {"COMPRESSED_DATA": tiles,
                "ZSCALE": np.asarray(zs), "ZZERO": np.asarray(zz)}
        out, _ = decompress_image(cards, cols)
        np.testing.assert_allclose(out, img, atol=scale / 2 + 1e-9)


class TestBinTableFile:
    def test_bintable_roundtrip_through_file(self, tmp_path):
        rng = np.random.default_rng(21)
        cols = {
            "name": ["alpha", "b", "gamma-ray"],
            "flux": rng.normal(0, 1, 3).astype(np.float64),
            "count": np.array([1, 2, 3], dtype=np.int32),
            "good": np.array([True, False, True]),
            "blob": [np.arange(5, dtype=np.int32), np.arange(2, dtype=np.int32),
                     np.zeros(0, dtype=np.int32)],
        }
        hdus = HDUList([ImageHDU(), BinTableHDU(columns=cols, name="META")])
        path = str(tmp_path / "t.fits")
        write_fits(path, hdus)
        back = read_fits(path)
        bt = back["META"]
        assert bt.columns["name"] == cols["name"]
        np.testing.assert_allclose(bt.columns["flux"], cols["flux"])
        np.testing.assert_array_equal(bt.columns["count"], cols["count"])
        np.testing.assert_array_equal(bt.columns["good"], cols["good"])
        for a, b in zip(bt.columns["blob"], cols["blob"]):
            np.testing.assert_array_equal(a, b)

    def test_comp_image_roundtrip_through_file(self, tmp_path):
        rng = np.random.default_rng(22)
        img = rng.normal(10, 3, (16, 40)).astype(np.float32)
        img[5, 5] = np.nan
        hdus = HDUList([
            ImageHDU(),
            make_comp_image_hdu(img, name="SCI_0", header_extra={"MJD": 57130.5}),
        ])
        path = str(tmp_path / "c.fits")
        write_fits(path, hdus)
        back = read_fits(path)
        sci = back["SCI_0"]
        assert sci.header["MJD"] == 57130.5
        finite = np.isfinite(img)
        assert np.isnan(np.asarray(sci.data)[~finite]).all()
        np.testing.assert_allclose(np.asarray(sci.data)[finite], img[finite], atol=0.0051)


class TestNativeRiceCodec:
    """The C codec must produce bit-identical streams/decodes to the
    pure-Python reference implementation."""

    def _py_codec(self):
        import importlib

        import kbmod_tpu.io.rice as rice_mod

        return rice_mod

    @pytest.mark.parametrize("bytepix", [1, 2, 4])
    def test_native_matches_python(self, bytepix):
        from kbmod_tpu import native

        if not native.available():
            pytest.skip("no compiler for the native library")
        import kbmod_tpu.io.rice as rice_mod

        rng = np.random.default_rng(17)
        lim = 2 ** (8 * bytepix - 1)
        cases = [
            rng.integers(-lim, lim, 1000).astype(np.int32),
            np.full(77, 13, np.int32),
            (np.arange(500) * 7 % (2 * lim) - lim).astype(np.int32),
            rng.integers(-3, 3, 333).astype(np.int32).cumsum().astype(np.int32),
        ]
        for vals in cases:
            if bytepix < 4:
                vals = ((vals.astype(np.int64) + lim) % (2 * lim) - lim).astype(np.int32)
            enc_c = native.rice_encode(vals, bytepix)
            # Force the pure-Python paths for comparison.
            import unittest.mock as mock

            with mock.patch.object(native, "available", return_value=False):
                enc_py = rice_mod.rice_encode(vals, bytepix)
                dec_py_of_c = rice_mod.rice_decode(enc_c, len(vals), bytepix)
            assert enc_c == enc_py  # identical bitstreams
            dec_c_of_py = native.rice_decode(enc_py, len(vals), bytepix)
            np.testing.assert_array_equal(dec_c_of_py, vals)
            np.testing.assert_array_equal(dec_py_of_c, vals)
