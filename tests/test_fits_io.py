"""FITS reader/writer tests for kbmod_tpu.io.fits_io."""

import os
import tempfile

import numpy as np
import pytest

from kbmod_tpu.io import fits_io
from kbmod_tpu.table import Table


class TestFitsRoundtrip:
    def test_image_hdus(self):
        rng = np.random.default_rng(3)
        primary = fits_io.ImageHDU(name="PRIMARY")
        primary.header["OBSID"] = "test_123"
        primary.header["MJD"] = 57130.25
        primary.header["FLAG"] = True
        sci = fits_io.ImageHDU(rng.normal(0, 1, (16, 20)).astype(np.float32), name="SCI_0")
        mask = fits_io.ImageHDU(np.arange(320, dtype=np.int32).reshape(16, 20), name="MASK_0")
        small = fits_io.ImageHDU(np.arange(256, dtype=np.uint8).reshape(16, 16), name="U8")
        dbl = fits_io.ImageHDU(rng.normal(size=(4, 4)), name="DBL")

        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "test.fits")
            fits_io.write_fits(path, [primary, sci, mask, small, dbl])
            hdus = fits_io.read_fits(path)
            assert len(hdus) == 5
            assert hdus[0].header["OBSID"] == "test_123"
            assert hdus[0].header["MJD"] == 57130.25
            assert hdus[0].header["FLAG"] is True
            np.testing.assert_allclose(hdus["SCI_0"].data, sci.data, rtol=1e-7)
            np.testing.assert_array_equal(hdus["MASK_0"].data, mask.data)
            np.testing.assert_array_equal(hdus["U8"].data, small.data)
            np.testing.assert_allclose(hdus["DBL"].data, dbl.data)

    def test_file_is_standard_blocks(self):
        """The file must be a multiple of 2880 bytes and start with SIMPLE."""
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "test.fits")
            fits_io.write_fits(path, [fits_io.ImageHDU(np.ones((3, 5), dtype=np.float32), name="X")])
            raw = open(path, "rb").read()
            assert len(raw) % 2880 == 0
            assert raw[:6] == b"SIMPLE"

    def test_long_string(self):
        hdu = fits_io.ImageHDU(name="CFG")
        text = "line1\nline2: [1, 2, 3]\n" * 40 + "tail with 'quotes' & symbols #/="
        hdu.set_long_string("YAMLCFG", text)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "t.fits")
            fits_io.write_fits(path, [fits_io.ImageHDU(name="PRIMARY"), hdu])
            hdus = fits_io.read_fits(path)
            assert hdus["CFG"].get_long_string("YAMLCFG") == text

    def test_table_hdu(self):
        table = Table({"a": np.arange(5), "b": np.array(["x", "y", "z", "w", "v"], dtype=object)})
        table.meta["note"] = "hello"
        hdu = fits_io.TableHDU(table, name="META")
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "t.fits")
            fits_io.write_fits(path, [fits_io.ImageHDU(name="PRIMARY"), hdu])
            hdus = fits_io.read_fits(path)
            out = hdus["META"].to_table()
            np.testing.assert_array_equal(out["a"], table["a"])
            assert list(out["b"]) == ["x", "y", "z", "w", "v"]
            assert out.meta["note"] == "hello"

    def test_header_string_escaping(self):
        hdu = fits_io.ImageHDU(name="PRIMARY")
        hdu.header["NAME"] = "it's quoted"
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "t.fits")
            fits_io.write_fits(path, [hdu])
            hdus = fits_io.read_fits(path)
            assert hdus[0].header["NAME"] == "it's quoted"

    def test_missing_hdu_lookup(self):
        hdus = fits_io.HDUList([fits_io.ImageHDU(name="PRIMARY")])
        with pytest.raises(KeyError):
            hdus["NOPE"]
        assert "PRIMARY" in hdus
        assert "NOPE" not in hdus


def _card(key, value=None, string=False):
    if value is None:
        return f"{key:<80}"[:80].encode()
    if string:
        v = f"'{value}'"
        return f"{key:<8}= {v:<20}"[:80].ljust(80).encode()
    if isinstance(value, bool):
        value = "T" if value else "F"
    return f"{key:<8}= {value:>20}"[:80].ljust(80).encode()


def _pad_block(b):
    return b + b" " * ((-len(b)) % 2880)


def _pad_data(b):
    return b + b"\0" * ((-len(b)) % 2880)


class TestForeignFitsFiles:
    """Files the reference tools produce (astropy conventions) must read
    correctly: unsigned-16-bit images (BZERO=32768) and heap-bearing
    binary tables must not desync the HDU stream (round-1 advisor)."""

    def test_unsigned_int16_bzero(self, tmp_path):
        import numpy as np
        from kbmod_tpu.io.fits_io import read_fits

        vals = np.array([[0, 1, 32767], [32768, 40000, 65535]], dtype=np.uint16)
        stored = (vals.astype(np.int64) - 32768).astype(">i2")
        hdr = (
            _card("SIMPLE", True) + _card("BITPIX", 16) + _card("NAXIS", 2)
            + _card("NAXIS1", 3) + _card("NAXIS2", 2)
            + _card("BZERO", 32768) + _card("BSCALE", 1) + _card("END")
        )
        path = tmp_path / "u16.fits"
        path.write_bytes(_pad_block(hdr) + _pad_data(stored.tobytes()))
        hdus = read_fits(str(path))
        out = np.asarray(hdus[0].data)
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, vals)

    def test_heap_bintable_keeps_stream_in_sync(self, tmp_path):
        import numpy as np
        from kbmod_tpu.io.fits_io import read_fits

        # Primary (no data) + BINTABLE with a 100-byte heap + IMAGE HDU.
        primary = _pad_block(
            _card("SIMPLE", True) + _card("BITPIX", 8) + _card("NAXIS", 0)
            + _card("EXTEND", True) + _card("END")
        )
        row_bytes, nrows, heap_len = 8, 3, 100
        table_data = bytes(range(row_bytes)) * nrows
        heap = b"\x55" * heap_len
        bintable = _pad_block(
            _card("XTENSION", "BINTABLE", string=True) + _card("BITPIX", 8)
            + _card("NAXIS", 2) + _card("NAXIS1", row_bytes) + _card("NAXIS2", nrows)
            + _card("PCOUNT", heap_len) + _card("GCOUNT", 1) + _card("TFIELDS", 1)
            + _card("TFORM1", "8B", string=True) + _card("TTYPE1", "blob", string=True)
            + _card("END")
        ) + _pad_data(table_data + heap)
        img = np.arange(6, dtype=">f4").reshape(2, 3)
        image = _pad_block(
            _card("XTENSION", "IMAGE", string=True) + _card("BITPIX", -32)
            + _card("NAXIS", 2) + _card("NAXIS1", 3) + _card("NAXIS2", 2)
            + _card("PCOUNT", 0) + _card("GCOUNT", 1)
            + _card("EXTNAME", "SCI_0", string=True) + _card("END")
        ) + _pad_data(img.tobytes())
        path = tmp_path / "mixed.fits"
        path.write_bytes(primary + bintable + image)
        hdus = read_fits(str(path))
        assert len(hdus) == 3
        assert hdus[2].name == "SCI_0"
        np.testing.assert_array_equal(np.asarray(hdus[2].data), img.astype("=f4"))
        assert hdus[1].heap == heap
