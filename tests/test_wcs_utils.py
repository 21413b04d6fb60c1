"""WCS round-trip and ecliptic-angle tests (modeled on the reference's
tests/test_wcs_utils.py)."""

import numpy as np
import pytest

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


class TestSipWcs:
    """SIP distortion (RA---TAN-SIP): DECam-scale coefficients, forward
    parity with an independent polynomial evaluation, inverse roundtrip
    < 1e-3 px (the reference gets this via astropy, wcs_utils.py:57-166)."""

    def _decam_like_header(self, with_inverse=False):
        # Realistic DECam chip: ~0.263"/px, quadratic+cubic distortion.
        hdr = {
            "CTYPE1": "RA---TAN-SIP", "CTYPE2": "DEC--TAN-SIP",
            "CRPIX1": 1024.5, "CRPIX2": 2048.5,
            "CRVAL1": 200.615, "CRVAL2": -7.789,
            "CD1_1": -7.28e-5, "CD1_2": 2.2e-7,
            "CD2_1": 1.9e-7, "CD2_2": 7.29e-5,
            "NAXIS1": 2048, "NAXIS2": 4096,
            "A_ORDER": 3,
            "A_2_0": 1.9e-6, "A_1_1": -4.8e-7, "A_0_2": 2.3e-6,
            "A_3_0": -5.2e-10, "A_2_1": 1.1e-10, "A_1_2": -6.0e-11, "A_0_3": 2.4e-10,
            "B_ORDER": 3,
            "B_2_0": -2.4e-6, "B_1_1": 7.1e-7, "B_0_2": -1.8e-6,
            "B_3_0": 3.3e-10, "B_2_1": -8.8e-11, "B_1_2": 4.1e-10, "B_0_3": -1.6e-10,
        }
        if with_inverse:
            # First-order inverse guesses; Newton refines the rest.
            hdr.update({
                "AP_ORDER": 2, "AP_2_0": -1.9e-6, "AP_1_1": 4.8e-7, "AP_0_2": -2.3e-6,
                "BP_ORDER": 2, "BP_2_0": 2.4e-6, "BP_1_1": -7.1e-7, "BP_0_2": 1.8e-6,
            })
        return hdr

    def test_forward_matches_independent_polynomial(self):
        from kbmod_tpu.geom.wcs import WCS

        hdr = self._decam_like_header()
        w = WCS.from_header(hdr)
        assert w.sip is not None
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 2047, 50)
        y = rng.uniform(0, 4095, 50)
        ra, dec = w.pixel_to_world_values(x, y)

        # Independent evaluation: SIP polynomial then the undistorted TAN.
        u = x + 1.0 - hdr["CRPIX1"]
        v = y + 1.0 - hdr["CRPIX2"]
        du = sum(hdr[f"A_{i}_{j}"] * u**i * v**j
                 for i in range(4) for j in range(4 - i) if f"A_{i}_{j}" in hdr)
        dv = sum(hdr[f"B_{i}_{j}"] * u**i * v**j
                 for i in range(4) for j in range(4 - i) if f"B_{i}_{j}" in hdr)
        plain = WCS.from_header({k: v2 for k, v2 in hdr.items()
                                 if not k.startswith(("A_", "B_"))} | {
                                     "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN"})
        ra2, dec2 = plain.pixel_to_world_values(
            (u + du) - 1.0 + hdr["CRPIX1"], (v + dv) - 1.0 + hdr["CRPIX2"]
        )
        np.testing.assert_allclose(ra, ra2, atol=1e-10)
        np.testing.assert_allclose(dec, dec2, atol=1e-10)

    @pytest.mark.parametrize("with_inverse", [False, True])
    def test_roundtrip_under_milli_pixel(self, with_inverse):
        from kbmod_tpu.geom.wcs import WCS

        w = WCS.from_header(self._decam_like_header(with_inverse))
        rng = np.random.default_rng(4)
        x = rng.uniform(0, 2047, 200)
        y = rng.uniform(0, 4095, 200)
        ra, dec = w.pixel_to_world_values(x, y)
        xr, yr = w.world_to_pixel_values(ra, dec)
        assert np.max(np.abs(xr - x)) < 1e-3
        assert np.max(np.abs(yr - y)) < 1e-3

    def test_header_round_trip_preserves_sip(self):
        from kbmod_tpu.geom.wcs import WCS

        w = WCS.from_header(self._decam_like_header(True))
        w2 = WCS.from_header(w.to_header())
        assert w == w2
        assert w2.sip.has_inverse

    def test_distortion_is_material(self):
        """The SIP terms move corner positions by several pixels (guards
        against the coefficients silently not being applied)."""
        from kbmod_tpu.geom.wcs import WCS

        hdr = self._decam_like_header()
        w_sip = WCS.from_header(hdr)
        plain_hdr = {k: v for k, v in hdr.items() if not k.startswith(("A_", "B_"))}
        plain_hdr["CTYPE1"], plain_hdr["CTYPE2"] = "RA---TAN", "DEC--TAN"
        w_tan = WCS.from_header(plain_hdr)
        ra1, dec1 = w_sip.pixel_to_world_values(0.0, 0.0)
        x2, y2 = w_tan.world_to_pixel_values(ra1, dec1)
        assert np.hypot(x2 - 0.0, y2 - 0.0) > 5.0


class TestStrictHeaders:
    def test_missing_crpix_raises(self):
        from kbmod_tpu.geom.wcs import WCS

        hdr = {"CRVAL1": 200.0, "CRVAL2": -7.0, "CD1_1": 1e-4, "CD2_2": 1e-4}
        with pytest.raises(ValueError, match="CRPIX"):
            WCS.from_header(hdr)
        # Permissive mode keeps the old fill-with-zero behavior.
        w = WCS.from_header(hdr, strict=False)
        assert w.crpix[0] == 0.0

    def test_unsupported_projection_raises(self):
        from kbmod_tpu.geom.wcs import WCS

        hdr = {"CTYPE1": "RA---AIT", "CTYPE2": "DEC--AIT",
               "CRPIX1": 1.0, "CRPIX2": 1.0, "CRVAL1": 0.0, "CRVAL2": 0.0}
        with pytest.raises(ValueError, match="projection"):
            WCS.from_header(hdr)

    def test_dimm_shape_interop(self):
        from kbmod_tpu.geom.wcs import WCS

        hdr = {"CRPIX1": 1.0, "CRPIX2": 1.0, "CRVAL1": 10.0, "CRVAL2": 5.0,
               "CD1_1": -1e-4, "CD2_2": 1e-4, "DIMM1": 300, "DIMM2": 200}
        w = WCS.from_header(hdr)
        assert w.array_shape == (200, 300)
        assert w.pixel_shape == (300, 200)
