"""WCS round-trip and ecliptic-angle tests (modeled on the reference's
tests/test_wcs_utils.py)."""

import numpy as np

from kbmod_tpu.geom.wcs import WCS
from kbmod_tpu.geom.ecliptic import (
    equatorial_to_ecliptic,
    ecliptic_to_equatorial,
    earth_position_equatorial,
)
from kbmod_tpu.wcs_utils import (
    calc_ecliptic_angle,
    serialize_wcs,
    deserialize_wcs,
    make_fake_wcs,
    wcs_fits_equal,
)


class TestWCS:
    def setup_method(self):
        self.wcs = make_fake_wcs(200.5, -7.5, 2000, 4000, 0.26 / 3600.0)

    def test_center_maps_to_crval(self):
        # 0-based center pixel = crpix - 1.
        ra, dec = self.wcs.pixel_to_world_values(4000 / 2.0 - 0.5, 2000 / 2.0 - 0.5)
        assert np.isclose(ra, 200.5, atol=1e-9)
        assert np.isclose(dec, -7.5, atol=1e-9)

    def test_roundtrip_pixels(self):
        rng = np.random.default_rng(11)
        xs = rng.uniform(0, 3999, 50)
        ys = rng.uniform(0, 1999, 50)
        ra, dec = self.wcs.pixel_to_world_values(xs, ys)
        xs2, ys2 = self.wcs.world_to_pixel_values(ra, dec)
        np.testing.assert_allclose(xs2, xs, atol=1e-6)
        np.testing.assert_allclose(ys2, ys, atol=1e-6)

    def test_pixel_scale(self):
        step_deg = self.wcs.pixel_scale_deg()
        assert np.isclose(step_deg * 3600.0, 0.26, rtol=1e-6)
        # One pixel step is ~0.26 arcsec on the sky.
        c0 = self.wcs.pixel_to_world(100, 100)
        c1 = self.wcs.pixel_to_world(101, 100)
        assert np.isclose(c0.separation_deg(c1) * 3600.0, 0.26, rtol=1e-3)

    def test_serialize_roundtrip(self):
        s = serialize_wcs(self.wcs)
        wcs2 = deserialize_wcs(s)
        assert wcs_fits_equal(self.wcs, wcs2)
        assert deserialize_wcs("") is None
        assert serialize_wcs(None) == ""

    def test_from_header_pc_style(self):
        header = {
            "CRPIX1": 10.0, "CRPIX2": 20.0,
            "CRVAL1": 15.0, "CRVAL2": -5.0,
            "CDELT1": -1e-4, "CDELT2": 1e-4,
        }
        wcs = WCS.from_header(header)
        assert np.isclose(wcs.cd[0, 0], -1e-4)
        assert np.isclose(wcs.cd[1, 1], 1e-4)


class TestEcliptic:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        ra = rng.uniform(0, 360, 100)
        dec = rng.uniform(-89, 89, 100)
        lon, lat = equatorial_to_ecliptic(ra, dec)
        ra2, dec2 = ecliptic_to_equatorial(lon, lat)
        np.testing.assert_allclose(ra2, ra, atol=1e-9)
        np.testing.assert_allclose(dec2, dec, atol=1e-9)

    def test_equator_points(self):
        # The vernal equinox is on both equators.
        lon, lat = equatorial_to_ecliptic(0.0, 0.0)
        assert np.isclose(lat, 0.0, atol=1e-9)
        assert np.isclose(lon, 0.0, atol=1e-9)
        # The north ecliptic pole is at dec = 90 - obliquity ~ 66.56.
        lon, lat = equatorial_to_ecliptic(270.0, 66.56070555555555)
        assert np.isclose(lat, 90.0, atol=1e-4)

    def test_ecliptic_angle_near_equator(self):
        # A field on the ecliptic: the ecliptic runs mostly along -x for a
        # north-up, east-left WCS (RA increases along the ecliptic).
        wcs = make_fake_wcs(0.0, 0.0, 1000, 1000, 1.0 / 3600.0)
        ang = calc_ecliptic_angle(wcs, center_pixel=(500, 500))
        # The angle should be finite and near pi (east = -x direction).
        assert np.isfinite(ang)
        assert abs(abs(ang) - np.pi) < 0.6

    def test_earth_position_magnitude(self):
        pos = earth_position_equatorial(60000.0)
        r = np.linalg.norm(pos)
        assert 0.98 < r < 1.02  # ~1 AU
