"""Equatorial <-> ecliptic coordinate rotations and a low-precision solar
ephemeris (used for barycentric/parallax geometry without astropy).

All angles in degrees unless noted. The ecliptic frame uses the J2000 mean
obliquity; the solar position uses the standard low-precision algorithm
(accurate to ~0.01 deg, plenty for reflex-correction geometry whose
dominant uncertainty is the guessed barycentric distance).
"""

import math

import numpy as np

# J2000 mean obliquity of the ecliptic (IAU 2006), degrees.
OBLIQUITY_DEG = 23.439279444444445
_EPS = math.radians(OBLIQUITY_DEG)
_COS_EPS = math.cos(_EPS)
_SIN_EPS = math.sin(_EPS)

AU_KM = 149597870.7


def equatorial_to_ecliptic(ra_deg, dec_deg):
    """(RA, Dec) -> ecliptic (lon, lat), all degrees. Vectorized."""
    ra = np.radians(np.asarray(ra_deg, dtype=float))
    dec = np.radians(np.asarray(dec_deg, dtype=float))
    x = np.cos(dec) * np.cos(ra)
    y = np.cos(dec) * np.sin(ra)
    z = np.sin(dec)
    # Rotate about the x-axis by +obliquity.
    ye = _COS_EPS * y + _SIN_EPS * z
    ze = -_SIN_EPS * y + _COS_EPS * z
    lon = np.degrees(np.arctan2(ye, x)) % 360.0
    lat = np.degrees(np.arcsin(np.clip(ze, -1.0, 1.0)))
    return lon, lat


def ecliptic_to_equatorial(lon_deg, lat_deg):
    """Ecliptic (lon, lat) -> (RA, Dec), all degrees. Vectorized."""
    lon = np.radians(np.asarray(lon_deg, dtype=float))
    lat = np.radians(np.asarray(lat_deg, dtype=float))
    x = np.cos(lat) * np.cos(lon)
    ye = np.cos(lat) * np.sin(lon)
    ze = np.sin(lat)
    y = _COS_EPS * ye - _SIN_EPS * ze
    z = _SIN_EPS * ye + _COS_EPS * ze
    ra = np.degrees(np.arctan2(y, x)) % 360.0
    dec = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    return ra, dec


def sun_position_ecliptic(mjd):
    """Geometric ecliptic longitude (deg) and distance (AU) of the Sun at
    the given MJD (UTC). Low-precision (Meeus-style) series."""
    mjd = np.asarray(mjd, dtype=float)
    # Days from J2000.0 (JD 2451545.0 = MJD 51544.5).
    n = mjd - 51544.5
    # Mean longitude and mean anomaly of the Sun (deg).
    L = (280.460 + 0.9856474 * n) % 360.0
    g = np.radians((357.528 + 0.9856003 * n) % 360.0)
    lon = L + 1.915 * np.sin(g) + 0.020 * np.sin(2 * g)
    dist = 1.00014 - 0.01671 * np.cos(g) - 0.00014 * np.cos(2 * g)
    return lon % 360.0, dist


def earth_position_ecliptic(mjd):
    """Heliocentric ecliptic (x, y, z) of the Earth in AU at MJD (UTC).

    The Earth is opposite the Sun's geocentric direction; latitude ~0."""
    lon, dist = sun_position_ecliptic(mjd)
    lon_e = np.radians((np.asarray(lon) + 180.0) % 360.0)
    x = dist * np.cos(lon_e)
    y = dist * np.sin(lon_e)
    z = np.zeros_like(x)
    return np.stack([x, y, z], axis=-1)


def radec_unit_vector(ra_deg, dec_deg):
    """Unit vector(s) in equatorial cartesian coordinates."""
    ra = np.radians(np.asarray(ra_deg, dtype=float))
    dec = np.radians(np.asarray(dec_deg, dtype=float))
    return np.stack([np.cos(dec) * np.cos(ra), np.cos(dec) * np.sin(ra), np.sin(dec)], axis=-1)


def unit_vector_radec(vec):
    """Cartesian (..., 3) -> (ra_deg, dec_deg)."""
    vec = np.asarray(vec, dtype=float)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    r = np.sqrt(x * x + y * y + z * z)
    ra = np.degrees(np.arctan2(y, x)) % 360.0
    dec = np.degrees(np.arcsin(np.clip(z / r, -1.0, 1.0)))
    return ra, dec


def ecliptic_vec_to_equatorial_vec(vec):
    """Rotate cartesian ecliptic coords to equatorial."""
    vec = np.asarray(vec, dtype=float)
    x = vec[..., 0]
    ye = vec[..., 1]
    ze = vec[..., 2]
    y = _COS_EPS * ye - _SIN_EPS * ze
    z = _SIN_EPS * ye + _COS_EPS * ze
    return np.stack([x, y, z], axis=-1)


def earth_position_equatorial(mjd):
    """Heliocentric equatorial (x, y, z) of the Earth in AU at MJD."""
    return ecliptic_vec_to_equatorial_vec(earth_position_ecliptic(mjd))
