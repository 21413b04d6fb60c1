"""WorkUnit behavior tests (reference: tests/test_work_unit.py) beyond the
IO/geometry cases in test_end_to_end.py / test_work_unit_geom.py."""

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.table import Table
from kbmod_tpu.work_unit import WorkUnit, create_image_metadata


def make_work(n=5):
    ds = FakeDataSet(24, 20, create_fake_times(n, 59000.0), use_seed=8)
    return ds.get_work_unit()


class TestCreateImageMetadata:
    def test_empty(self):
        meta = create_image_metadata(3, data=None)
        assert len(meta) == 3
        for col in ("data_loc", "ebd_wcs", "geocentric_distance", "per_image_wcs"):
            assert col in meta.colnames

    def test_from_table(self):
        data = Table({"uri": ["f1", "f2", "f3"], "geocentric_distance": [1.0, 2.0, 3.0]})
        meta = create_image_metadata(3, data)
        assert len(meta) == 3
        assert "uri" in meta.colnames
        np.testing.assert_array_equal(meta["geocentric_distance"], [1.0, 2.0, 3.0])
        assert all(v is None for v in meta["per_image_wcs"])

    def test_validation(self):
        with pytest.raises(ValueError):
            create_image_metadata(-1, None)
        data = Table({"uri": ["f1", "f2", "f3"]})
        with pytest.raises(ValueError):
            create_image_metadata(2, data)


class TestApplyColorScale:
    def test_scales_by_filter(self):
        ds = FakeDataSet(16, 16, create_fake_times(5, 59000.0), use_seed=2)
        stack = ds.stack_py
        org_sci = [s.copy() for s in stack.sci]
        org_var = [v.copy() for v in stack.var]
        meta = Table({"filter": ["r", "r", "g", "g", "r"]})
        work = WorkUnit(im_stack=stack, config=SearchConfiguration(), org_image_meta=meta)

        color_scale = {"g": 0.0, "r": 2.5 * np.log10(2.0)}
        work.apply_color_scale(color_scale)
        np.testing.assert_allclose(
            np.asarray(work.org_img_meta["color_scale"], dtype=float),
            [0.752575, 0.752575, 0.0, 0.0, 0.752575],
            rtol=1e-5,
        )
        for i, f in enumerate(meta["filter"]):
            if f == "r":
                np.testing.assert_allclose(work.im_stack.sci[i], org_sci[i] / 2.0, rtol=1e-6)
                np.testing.assert_allclose(work.im_stack.var[i], org_var[i] / 4.0, rtol=1e-6)
            else:
                np.testing.assert_allclose(work.im_stack.sci[i], org_sci[i], rtol=1e-6)

    def test_missing_filter_raises(self):
        ds = FakeDataSet(8, 8, create_fake_times(2, 59000.0), use_seed=2)
        meta = Table({"filter": ["r", "g"]})
        work = WorkUnit(im_stack=ds.stack_py, config=SearchConfiguration(), org_image_meta=meta)
        with pytest.raises(ValueError):
            work.apply_color_scale({"z": 1.0})


class TestDisorderObstimes:
    @pytest.mark.parametrize(
        "times",
        [
            [59001.0, 59003.0, 59005.0, 59007.0, 59009.0],
            [59000.0, 59001.0, 59002.0, 59003.0, 59004.0],
            [59000.0, 59004.0, 59002.0, 59001.0, 59004.0],  # duplicates
            [59000.0, 59001.62, 59002.0, 59001.62, 59002.8],  # duplicates
        ],
    )
    def test_disorder(self, times):
        ds = FakeDataSet(12, 12, create_fake_times(5, 59000.0), use_seed=4)
        ds.stack_py.times = np.asarray(times, dtype=float)
        ds.stack_py.zeroed_times = ds.stack_py.times - ds.stack_py.times[0]
        work = WorkUnit(im_stack=ds.stack_py, config=SearchConfiguration())
        work._per_image_indices[3] = [3, 4]
        original_indices = [tuple(sorted(g)) for g in work._per_image_indices]

        np.random.seed(0)
        obstimes = np.array(work.get_all_obstimes())
        work.disorder_obstimes()
        new_times = np.array(work.get_all_obstimes())

        assert not np.array_equal(new_times, obstimes)
        assert new_times.min() >= obstimes.min()
        spread = max(obstimes.max() - obstimes.min(), 5)
        assert new_times.max() <= obstimes.max() + spread
        # Sorted ascending and sharing-structure preserved.
        assert np.array_equal(sorted(new_times), new_times)
        assert sorted(np.unique(obstimes, return_counts=True)[1]) == sorted(
            np.unique(new_times, return_counts=True)[1]
        )
        assert sorted(original_indices) == sorted(tuple(sorted(g)) for g in work._per_image_indices)

    def test_empty_raises(self):
        work = make_work(1)
        work.im_stack.times = np.array([])
        work._obstimes = None
        with pytest.raises(ValueError):
            work.disorder_obstimes()


class TestObservatory:
    def test_default_is_rubin(self):
        work = make_work()
        loc = np.asarray(work.observatory, dtype=float)
        # Geocentric position magnitude ~ Earth radius (meters).
        assert 6.3e6 < np.linalg.norm(loc) < 6.4e6

    def test_custom_roundtrip(self, tmp_path):
        work = make_work(2)
        work.observatory = (1000.0, 2000.0, 3000.0)
        path = str(tmp_path / "wu.fits")
        work.to_fits(path)
        back = WorkUnit.from_fits(path)
        np.testing.assert_allclose(np.asarray(back.observatory, dtype=float), [1000.0, 2000.0, 3000.0])


class TestInvalidPositionFormat:
    def test_bad_output_format(self):
        work = make_work(2)
        from kbmod_tpu.wcs_utils import make_fake_wcs

        work.wcs = make_fake_wcs(200.0, -7.0, 24, 20)
        with pytest.raises(ValueError):
            work.image_positions_to_original_icrs([0], [(1.0, 2.0)], output_format="bananas")


class TestReferenceFormat:
    """Single-file interop with the reference's on-disk layout
    (work_unit.py:489-682): our writer emits it, our reader loads it,
    and a byte-level hand-assembled file in that layout loads too."""

    def _work_with_wcs(self, n=4):
        from kbmod_tpu.wcs_utils import make_fake_wcs

        ds = FakeDataSet(24, 20, create_fake_times(n, 59000.0), use_seed=8)
        wu = ds.get_work_unit()
        wu.wcs = make_fake_wcs(200.6, -7.8, 24, 20, deg_per_pixel=0.001)
        wu.config.set("results_per_pixel", 6)
        return wu

    @pytest.mark.parametrize("ctype", ["GZIP_1", "RICE_1"])
    def test_roundtrip(self, tmp_path, ctype):
        wu = self._work_with_wcs()
        # Mask a pixel so the MSK layer carries information.
        wu.im_stack.sci[1][3, 4] = np.nan
        path = str(tmp_path / "ref.wu")
        wu.to_fits(path, format="reference", compression_type=ctype)
        back = WorkUnit.from_fits(path)
        assert back.im_stack.num_times == wu.im_stack.num_times
        assert back.config["results_per_pixel"] == 6
        assert back.wcs is not None
        np.testing.assert_allclose(back.wcs.crval, wu.wcs.crval)
        np.testing.assert_allclose(
            back.im_stack.times, wu.im_stack.times, rtol=0, atol=1e-8
        )
        atol = 0 if ctype == "GZIP_1" else 0.0051
        for t in range(wu.im_stack.num_times):
            a, b = np.asarray(back.im_stack.sci[t]), np.asarray(wu.im_stack.sci[t])
            finite = np.isfinite(b)
            assert (np.isfinite(a) == finite).all()
            np.testing.assert_allclose(a[finite], b[finite], atol=atol, rtol=0 if atol else 1e-6)

    def test_primary_layout_matches_reference(self, tmp_path):
        """The written file carries the reference's exact header keys and
        HDU names (NUMIMG/REPRJCTD/OBS_LAT in PRIMARY; KBMOD_CONFIG and
        IMG_META BINTABLEs; SCI_i as tile-compressed BINTABLEs)."""
        from kbmod_tpu.io.fits_io import read_fits

        wu = self._work_with_wcs()
        path = str(tmp_path / "layout.wu")
        wu.to_fits(path, format="reference")
        hdus = read_fits(path)
        pri = hdus[0].header
        for key in ("NUMIMG", "NCON", "REPRJCTD", "REPFRAME", "BARY",
                    "OBS_LAT", "OBS_LON", "OBS_ELEV", "CRVAL1", "CRPIX1"):
            assert key in pri, key
        assert "KBMOD_CONFIG" in hdus and "IMG_META" in hdus
        sci = hdus["SCI_0"]
        assert "MJD" in sci.header and "NIND" in sci.header and "IND_0" in sci.header
        assert sci.header.get("ZIMAGE") or sci.data is not None

    def test_config_reference_table_roundtrip(self):
        cfg = SearchConfiguration()
        cfg.set("num_obs", 17)
        cfg.set("cluster_type", "position")
        hdu = cfg.to_reference_hdu()
        back = SearchConfiguration.from_hdu(hdu)
        assert back["num_obs"] == 17
        assert back["cluster_type"] == "position"
        assert back["results_per_pixel"] == cfg["results_per_pixel"]

    def test_observatory_geodetic_roundtrip(self, tmp_path):
        from kbmod_tpu.geom.geodesy import geocentric_to_geodetic

        wu = self._work_with_wcs()
        path = str(tmp_path / "obs.wu")
        wu.to_fits(path, format="reference")
        back = WorkUnit.from_fits(path)
        np.testing.assert_allclose(back.observatory, wu.observatory, atol=1e-3)
        lat, lon, elev = geocentric_to_geodetic(*back.observatory)
        assert -31 < lat < -29  # Cerro Pachon
        assert -72 < lon < -70
