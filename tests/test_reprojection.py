"""Reprojection tests (modeled on the reference's tests/
test_reprojection.py): resampling correctness, mosaicking, and the EBD
frame path."""

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.geom.wcs import WCS
from kbmod_tpu.ops.reproject import compute_source_coordinates, resample_layer
from kbmod_tpu.reprojection import reproject_work_unit
from kbmod_tpu.reprojection_utils import (
    correct_parallax_geometrically,
    correct_parallax_geometrically_vectorized,
    invert_correct_parallax_vectorized,
    fit_barycentric_wcs,
)
from kbmod_tpu.wcs_utils import make_fake_wcs


class TestResample:
    def test_identity_reprojection(self):
        rng = np.random.default_rng(1)
        wcs = make_fake_wcs(45.0, 10.0, 32, 40)
        sci = rng.normal(0, 1, (32, 40)).astype(np.float32)
        var = np.full((32, 40), 2.0, dtype=np.float32)
        coords = compute_source_coordinates(wcs, wcs, (32, 40))
        sci_r, var_r, good = resample_layer(sci, var, coords)
        assert np.all(good)
        np.testing.assert_allclose(sci_r, sci, atol=1e-4)
        np.testing.assert_allclose(var_r, var, atol=1e-4)

    def test_shifted_reprojection(self):
        """A WCS shifted by exactly 3 pixels shifts the image by 3 pixels."""
        rng = np.random.default_rng(2)
        deg_pp = 0.5 / 3600.0
        wcs_a = make_fake_wcs(45.0, 10.0, 32, 40, deg_pp)
        wcs_b = wcs_a.copy()
        wcs_b.crpix = wcs_b.crpix + np.array([3.0, 0.0])  # shift x by 3 px
        sci = rng.normal(0, 1, (32, 40)).astype(np.float32)
        var = np.full((32, 40), 2.0, dtype=np.float32)
        coords = compute_source_coordinates(wcs_a, wcs_b, (32, 40))
        sci_r, var_r, good = resample_layer(sci, var, coords)
        # Output pixel (y, x) samples source pixel (y, x - 3).
        np.testing.assert_allclose(sci_r[:, 3:], sci[:, :-3], atol=1e-3)
        assert not np.any(good[:, :3])

    def test_mask_propagation(self):
        rng = np.random.default_rng(3)
        wcs = make_fake_wcs(45.0, 10.0, 20, 20)
        sci = rng.normal(0, 1, (20, 20)).astype(np.float32)
        sci[10, 10] = np.nan
        var = np.full((20, 20), 2.0, dtype=np.float32)
        coords = compute_source_coordinates(wcs, wcs, (20, 20))
        sci_r, _, good = resample_layer(sci, var, coords)
        assert not good[10, 10]
        assert np.isnan(sci_r[10, 10])


class TestReprojectWorkUnit:
    def _make_work(self, n=6, shared_wcs=True):
        times = create_fake_times(n, t0=57130.2, obs_per_day=2)
        ds = FakeDataSet(48, 64, times, use_seed=31)
        work = ds.get_work_unit()
        deg_pp = 0.5 / 3600.0
        for i in range(n):
            # Slightly shifted per-image WCSes.
            wcs = make_fake_wcs(45.0, 10.0, 48, 64, deg_pp)
            wcs.crpix = wcs.crpix + np.array([0.5 * i, 0.25 * i])
            work.org_img_meta["per_image_wcs"][i] = wcs
        return work

    def test_reproject_original_frame(self):
        work = self._make_work()
        common = make_fake_wcs(45.0, 10.0, 48, 64, 0.5 / 3600.0)
        result = reproject_work_unit(work, common, frame="original")
        assert result.reprojected
        assert result.reprojection_frame == "original"
        # Two images share each obstime (obs_per_day=2 with the same t?) --
        # in this cadence each time is unique, so layers == images.
        assert result.im_stack.num_times == work.im_stack.num_times
        assert result.im_stack.width == 64
        # Data preserved where the footprint is valid.
        assert np.isfinite(result.im_stack.sci[0]).sum() > 0.5 * 48 * 64

    def test_reproject_mosaic(self):
        """Images with identical obstimes are mosaicked into one layer."""
        times = [57130.2, 57130.2, 57130.5]
        ds = FakeDataSet(32, 32, times, use_seed=13)
        work = ds.get_work_unit()
        deg_pp = 0.5 / 3600.0
        # Two disjoint chips at the same time + one later image.
        w0 = make_fake_wcs(45.0, 10.0, 32, 32, deg_pp)
        w1 = make_fake_wcs(45.0, 10.0, 32, 32, deg_pp)
        w1.crpix = w1.crpix + np.array([32.0, 0.0])
        w2 = make_fake_wcs(45.0, 10.0, 32, 32, deg_pp)
        work.org_img_meta["per_image_wcs"][0] = w0
        work.org_img_meta["per_image_wcs"][1] = w1
        work.org_img_meta["per_image_wcs"][2] = w2

        common = make_fake_wcs(45.0, 10.0, 32, 64, deg_pp)
        common.crpix = common.crpix + np.array([16.0, 0.0])
        result = reproject_work_unit(work, common, frame="original")
        assert result.im_stack.num_times == 2
        assert result._per_image_indices[0] == [0, 1]
        # Both chips contribute valid pixels to the first mosaic layer.
        assert np.isfinite(result.im_stack.sci[0]).sum() > 1000

    def test_reproject_twice_raises(self):
        work = self._make_work()
        common = make_fake_wcs(45.0, 10.0, 48, 64, 0.5 / 3600.0)
        result = reproject_work_unit(work, common)
        with pytest.raises(ValueError):
            reproject_work_unit(result, common)

    def test_reproject_ebd_frame(self):
        work = self._make_work()
        work.barycentric_distance = 40.0
        common = make_fake_wcs(45.0, 10.0, 48, 64, 0.5 / 3600.0)
        result = reproject_work_unit(work, common, frame="ebd")
        assert result.reprojection_frame == "ebd"
        assert result.barycentric_distance == 40.0
        assert result.org_img_meta["ebd_wcs"][0] is not None


class TestParallaxCorrection:
    def test_roundtrip(self):
        ra = np.array([200.0, 201.0, 44.0])
        dec = np.array([-7.0, -6.5, 12.0])
        mjds = np.array([57130.2, 57131.2, 57132.2])
        corrected, dists = correct_parallax_geometrically_vectorized(ra, dec, mjds, 40.0)
        assert np.all(np.isfinite(corrected.ra_deg))
        assert np.all(dists > 38.0)
        back = invert_correct_parallax_vectorized(corrected, mjds)
        np.testing.assert_allclose(back.ra_deg, ra, atol=1e-8)
        np.testing.assert_allclose(back.dec_deg, dec, atol=1e-8)

    def test_no_solution_inside_earth_orbit(self):
        corrected, dists = correct_parallax_geometrically_vectorized([200.0], [-7.0], [57130.2], 0.5)
        assert np.isnan(corrected.ra_deg[0]) or np.isfinite(dists[0]) is False

    def test_fit_barycentric_wcs(self):
        wcs = make_fake_wcs(200.0, -7.0, 200, 200, 0.5 / 3600.0)
        ebd_wcs, geo_dist = fit_barycentric_wcs(wcs, 200, 200, 40.0, 57130.2)
        assert 38.5 < geo_dist < 41.5
        # The fitted WCS maps the same pixels to the corrected positions.
        ra, dec = wcs.pixel_to_world_values(100.0, 100.0)
        corrected, _ = correct_parallax_geometrically_vectorized([ra], [dec], [57130.2], 40.0)
        x, y = ebd_wcs.world_to_pixel_values(corrected.ra_deg[0], corrected.dec_deg[0])
        assert abs(x - 100.0) < 0.2
        assert abs(y - 100.0) < 0.2


class TestParallaxGoldenValues:
    """The reference's equinox golden case (tests/test_reprojection_utils.py:52):
    an object at 50 AU whose parallax-corrected position is exactly
    (ra=90, dec=obliquity). The reference computes with astropy + DE432s;
    the self-contained ephemeris here (geometric J2000 solar series +
    Keplerian giant-planet barycenter offset) agrees to ~0.1 arcsec."""

    def test_equinox_golden(self):
        from datetime import datetime, timezone

        def mjd(iso):
            dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
            return (dt - datetime(1858, 11, 17, tzinfo=timezone.utc)).total_seconds() / 86400.0

        out, dist = correct_parallax_geometrically_vectorized(
            np.array([88.74513571, 91.24261107]),
            np.array([23.43426475, 23.43437467]),
            np.array([mjd("2023-03-20T16:00:00"), mjd("2023-09-24T04:00:00")]),
            50.0,
        )
        np.testing.assert_allclose(np.array(out.ra.deg), [90.0, 90.0], atol=2e-4)
        np.testing.assert_allclose(
            np.array(out.dec.deg), [23.43952556, 23.43952556], atol=1e-4
        )
        np.testing.assert_allclose(dist, 50.0013, atol=2e-3)

    def test_sun_barycenter_magnitude(self):
        from kbmod_tpu.geom.ecliptic import sun_barycentric_position

        # The Sun's barycentric offset stays within ~2 solar radii (0.01 AU
        # scale, Jupiter-dominated).
        off = sun_barycentric_position(np.linspace(51544.5, 51544.5 + 365 * 30, 50))
        r = np.linalg.norm(off, axis=-1)
        assert np.all(r < 0.02)
        assert np.any(r > 0.004)


class TestScalarParallaxAPIs:
    def test_geometric_alias(self):
        out, s = correct_parallax_geometrically((88.74513571, 23.43426475), 60023.6667, None, 50.0)
        assert abs(float(np.asarray(out.ra_deg)) - 90.0) < 0.01
        assert 49.0 < s < 51.0

    def test_minimizer_matches_geometric(self):
        from kbmod_tpu.reprojection_utils import correct_parallax_with_minimizer

        geo, s_geo = correct_parallax_geometrically((88.74513571, 23.43426475), 60023.6667, None, 50.0)
        mini, s_min = correct_parallax_with_minimizer((88.74513571, 23.43426475), 60023.6667, None, 50.0)
        np.testing.assert_allclose(float(np.asarray(mini.ra_deg)), float(np.asarray(geo.ra_deg)), atol=1e-4)
        np.testing.assert_allclose(s_min, s_geo, atol=1e-4)

    def test_minimizer_inside_earth_orbit(self):
        from kbmod_tpu.reprojection_utils import correct_parallax_with_minimizer

        # d = 0.5 AU has no geometric solution; the minimizer still returns
        # a best-effort range.
        out, s = correct_parallax_with_minimizer((90.0, 0.0), 60000.0, None, 0.5)
        assert np.isfinite(s) and s >= 0.0

    def test_module_level_position_inverse(self):
        from kbmod_tpu.reprojection_utils import image_positions_to_original_icrs
        from kbmod_tpu.wcs_utils import make_fake_wcs

        wcs = make_fake_wcs(200.0, -7.0, 64, 64)
        out = image_positions_to_original_icrs(
            [0], [(10.0, 20.0)], wcs, [wcs], [60000.0],
            reprojection_frame="original", output_format="xy",
        )
        assert len(out) == 1
        np.testing.assert_allclose(out[0], (10.0, 20.0), atol=1e-6)

        ebd = image_positions_to_original_icrs(
            [0], [(10.0, 20.0)], wcs, [wcs], [60000.0],
            reprojection_frame="ebd", barycentric_distance=40.0,
            output_format="radec", filter_in_frame=False,
        )
        ra, dec = ebd[0]
        ra0, dec0 = wcs.pixel_to_world_values(10.0, 20.0)
        assert 0 < abs(ra - float(ra0)) < 1.0

        with pytest.raises(ValueError):
            image_positions_to_original_icrs([0], [(1, 2)], wcs, [wcs], [60000.0],
                                             input_format="bananas")


class TestTopocentricParallax:
    """Topocentric observer support: GMST against the Meeus 12.a golden,
    precession against the textbook 100-year star drift, diurnal parallax
    magnitude, and exact correct/invert round-trips with a site."""

    def test_gmst_meeus_golden(self):
        from kbmod_tpu.geom.ecliptic import gmst_deg

        # Meeus, Astronomical Algorithms, example 12.a:
        # 1987 April 10, 0h UT -> GMST = 13h 10m 46.3668s.
        got = gmst_deg(46895.0)
        exp = (13 + 10 / 60 + 46.3668 / 3600) * 15.0
        assert abs(got - exp) * 3600 < 0.01  # arcsec

    def test_precession_star_drift(self):
        from kbmod_tpu.geom.ecliptic import itrs_to_j2000, gmst_deg

        # A vector pinned in the rotating frame at the reference epoch,
        # mapped to J2000 at epoch ~2100, must show the classic precession
        # drift: ra ~ +1.2816 deg, dec ~ +0.5566 deg for a J2000 (0, 0)
        # star viewed from the mean-of-date frame (inverse direction).
        mjd = 88069.0  # ~2100.0
        # Invert GMST so only precession remains.
        g = np.deg2rad(gmst_deg(mjd))
        v_tod = np.array([np.cos(-g), np.sin(-g), 0.0])
        out = itrs_to_j2000(v_tod, mjd)[0]
        ra = np.degrees(np.arctan2(out[1], out[0])) % 360
        dec = np.degrees(np.arcsin(out[2]))
        # TOD x-axis seen in J2000: ra ~ -1.2816 + 360, dec ~ -0.5566.
        assert abs(ra - (360 - 1.2816)) < 0.01
        assert abs(dec - (-0.5566)) < 0.01

    def test_diurnal_parallax_magnitude(self):
        from kbmod_tpu.reprojection_utils import correct_parallax_geometrically_vectorized
        from kbmod_tpu.geom.wcs import SkyCoordLite

        mjd = 60000.25
        ra, dec = 150.0, -20.0
        d = 5.0
        geo, s_geo = correct_parallax_geometrically_vectorized([ra], [dec], [mjd], d, None)
        site = (6378137.0, 0.0, 0.0)  # equatorial site
        topo, s_topo = correct_parallax_geometrically_vectorized([ra], [dec], [mjd], d, site)
        sep = SkyCoordLite(geo.ra_deg, geo.dec_deg).separation_deg(
            SkyCoordLite(topo.ra_deg, topo.dec_deg)
        )[0] * 3600
        # Same observed LOS interpreted from two observer positions ~1
        # Earth radius apart: the barycentric positions differ by up to
        # R_earth / distance ~ 8.8"/d = 1.76" at 5 AU (zero only if the
        # offset is parallel to the LOS).
        assert 0.05 < sep < 2.0
        # And the two corrections differ from each other measurably.
        assert abs(float(s_geo[0]) - float(s_topo[0])) < 0.01  # AU, tiny range change

    def test_topocentric_roundtrip(self):
        from kbmod_tpu.reprojection_utils import (
            correct_parallax_geometrically_vectorized,
            invert_correct_parallax_vectorized,
        )
        from kbmod_tpu.work_unit import RUBIN_LOCATION_M
        from kbmod_tpu.geom.wcs import SkyCoordLite

        rng = np.random.default_rng(5)
        ra = rng.uniform(0, 360, 20)
        dec = rng.uniform(-80, 80, 20)
        mjds = rng.uniform(59000, 61000, 20)
        corr, dists = correct_parallax_geometrically_vectorized(
            ra, dec, mjds, 8.0, RUBIN_LOCATION_M
        )
        back = invert_correct_parallax_vectorized(corr, mjds, RUBIN_LOCATION_M)
        sep = SkyCoordLite(ra, dec).separation_deg(back) * 3600
        assert np.nanmax(sep) < 1e-6  # arcsec: exact inverse with same site

    def test_site_changes_inversion(self):
        from kbmod_tpu.reprojection_utils import (
            correct_parallax_geometrically_vectorized,
            invert_correct_parallax_vectorized,
        )
        from kbmod_tpu.work_unit import RUBIN_LOCATION_M
        from kbmod_tpu.geom.wcs import SkyCoordLite

        corr, _ = correct_parallax_geometrically_vectorized([10.0], [5.0], [60123.6], 3.0, RUBIN_LOCATION_M)
        with_site = invert_correct_parallax_vectorized(corr, [60123.6], RUBIN_LOCATION_M)
        without = invert_correct_parallax_vectorized(corr, [60123.6], None)
        sep = with_site.separation_deg(without) * 3600
        assert sep[0] > 0.05  # the topocentric term is material
