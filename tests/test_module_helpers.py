"""Module-level helper functions mirroring the reference's public API:
work_unit.add_image_data_to_hdul / read_image_data_from_hdul /
image_metadata_table_to_hdu / hdu_to_image_metadata_table (reference
work_unit.py:1062-1309) and image_collection.pack_table / unpack_table
(reference image_collection.py:38-99)."""

import numpy as np
import pytest

from kbmod_tpu.io.fits_io import HDUList
from kbmod_tpu.image_collection import pack_table, unpack_table
from kbmod_tpu.table import Table
from kbmod_tpu.wcs_utils import make_fake_wcs
from kbmod_tpu.work_unit import (
    add_image_data_to_hdul,
    hdu_to_image_metadata_table,
    image_metadata_table_to_hdu,
    read_image_data_from_hdul,
)


class TestImageDataHelpers:
    @pytest.mark.parametrize("compression", ["GZIP_1", "RICE_1", "NOCOMPRESS"])
    def test_round_trip(self, compression):
        rng = np.random.default_rng(4)
        sci = rng.normal(5, 2, (32, 40)).astype(np.float32)
        var = rng.uniform(1, 2, (32, 40)).astype(np.float32)
        sci[3, 4] = np.nan
        mask = np.zeros((32, 40))
        mask[10, 11] = 1
        wcs = make_fake_wcs(25.0, -7.5, 32, 40)
        psf = np.ones((3, 3), np.float32) / 9.0

        hdul = []
        add_image_data_to_hdul(
            hdul, 0, sci, var, mask, 58000.25, psf_kernel=psf, wcs=wcs,
            compression_type=compression,
        )
        assert [h.name for h in hdul] == ["SCI_0", "VAR_0", "MSK_0", "PSF_0"]
        sci2, var2, mask2, t2, psf2, wcs2 = read_image_data_from_hdul(HDUList(hdul), 0)
        assert t2 == 58000.25
        # Masked + nonfinite pixels come back masked (auto-applied).
        assert np.isnan(sci2[10, 11]) and np.isnan(var2[10, 11])
        assert np.isnan(sci2[3, 4])
        ok = np.isfinite(sci2)
        tol = 1e-6 if compression != "RICE_1" else 0.02
        np.testing.assert_allclose(sci2[ok], sci[ok], atol=tol, rtol=tol)
        np.testing.assert_allclose(psf2, psf)
        assert wcs2 is not None

    def test_defaults(self):
        sci = np.ones((8, 8), np.float32)
        hdul = []
        add_image_data_to_hdul(hdul, 3, sci, sci, np.zeros((8, 8)), 60000.0,
                               compression_type="NOCOMPRESS")
        sci2, var2, mask2, t2, psf2, wcs2 = read_image_data_from_hdul(HDUList(hdul), 3)
        np.testing.assert_array_equal(psf2, [[1.0]])
        assert wcs2 is None


class TestMetadataTableHelpers:
    def test_wcs_and_object_columns(self):
        wcs = make_fake_wcs(10.0, 20.0, 64, 64)
        meta = Table({
            "data_loc": ["a.fits", "b.fits"],
            "per_image_wcs": [wcs, None],
            "geocentric_distance": [1.0, 2.0],
            "all_none": [None, None],
        })
        hdu = image_metadata_table_to_hdu(meta, layer_name="IMG_META")
        back = hdu_to_image_metadata_table(hdu)
        assert back["per_image_wcs"][0] is not None
        assert back["per_image_wcs"][1] is None
        assert list(back["data_loc"]) == ["a.fits", "b.fits"]
        np.testing.assert_allclose(back["geocentric_distance"], [1.0, 2.0])
        # All-None object columns are dropped (reference behavior).
        assert "all_none" not in back.colnames


class TestPackUnpackTable:
    def test_round_trip(self):
        t = Table({"a": [1, 1, 1], "b": [1, 2, 3], "c": ["x", "x", "x"]})
        pack_table(t)
        assert t.meta["is_packed"]
        assert sorted(t.meta["shared_cols"]) == ["a", "c"]
        assert t.colnames == ["b"]
        unpack_table(t)
        assert sorted(t.colnames) == ["a", "b", "c"]
        assert list(t["a"]) == [1, 1, 1]
        assert list(t["c"]) == ["x", "x", "x"]
        assert not t.meta["is_packed"]

    def test_unpack_not_packed_is_noop(self):
        t = Table({"a": [1, 2]})
        unpack_table(t)
        assert t.colnames == ["a"]


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
