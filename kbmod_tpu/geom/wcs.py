"""A self-contained gnomonic (TAN) World Coordinate System.

The reference relies on astropy.wcs (src/kbmod/wcs_utils.py); kbmod_tpu
implements the TAN projection directly: FITS-standard CRPIX/CRVAL/CD
keywords, 0-based pixel API matching astropy's ``origin=0`` convention.
Supports vectorized pixel<->world transforms in numpy (used on host) — the
on-device reprojection kernel consumes the same math in JAX
(kbmod_tpu.ops.reproject).
"""

import math

import numpy as np

DEG2RAD = math.pi / 180.0
RAD2DEG = 180.0 / math.pi


class WCS:
    """TAN-projection WCS.

    Parameters
    ----------
    crpix : (2,) float
        Reference pixel (1-based, FITS convention: crpix[0] = x/col axis).
    crval : (2,) float
        Reference sky position (RA, Dec) in degrees.
    cd : (2, 2) float
        The CD matrix in degrees/pixel: [dRA-like xi; dDec-like eta] =
        CD @ [u; v] with u, v relative pixels.
    shape : (2,) int or None
        Optional (height, width) of the image (naxis2, naxis1).
    """

    def __init__(self, crpix, crval, cd, shape=None):
        self.crpix = np.asarray(crpix, dtype=float)
        self.crval = np.asarray(crval, dtype=float)
        self.cd = np.asarray(cd, dtype=float).reshape(2, 2)
        self.array_shape = tuple(int(s) for s in shape) if shape is not None else None

    # --- astropy-compatible aliases ---

    @property
    def pixel_shape(self):
        """(width, height) like astropy's pixel_shape."""
        if self.array_shape is None:
            return None
        return (self.array_shape[1], self.array_shape[0])

    @property
    def cd_inv(self):
        return np.linalg.inv(self.cd)

    def copy(self):
        return WCS(self.crpix.copy(), self.crval.copy(), self.cd.copy(), self.array_shape)

    def deepcopy(self):
        return self.copy()

    # --- transforms (0-based pixels) ---

    def pixel_to_world_values(self, x, y):
        """(x, y) 0-based pixels -> (ra, dec) degrees. Vectorized."""
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        u = x + 1.0 - self.crpix[0]
        v = y + 1.0 - self.crpix[1]
        xi = (self.cd[0, 0] * u + self.cd[0, 1] * v) * DEG2RAD
        eta = (self.cd[1, 0] * u + self.cd[1, 1] * v) * DEG2RAD

        ra0 = self.crval[0] * DEG2RAD
        dec0 = self.crval[1] * DEG2RAD
        cos_d0 = math.cos(dec0)
        sin_d0 = math.sin(dec0)

        # Standard gnomonic de-projection:
        #   tan(dra) = xi / (cos d0 - eta sin d0)
        #   tan(dec) = (sin d0 + eta cos d0) cos(dra) / (cos d0 - eta sin d0)
        den = cos_d0 - eta * sin_d0
        dra = np.arctan2(xi, den)
        ra = (ra0 + dra) % (2 * math.pi)
        dec = np.arctan((sin_d0 + eta * cos_d0) * np.cos(dra) / den)
        return ra * RAD2DEG, dec * RAD2DEG

    def world_to_pixel_values(self, ra, dec):
        """(ra, dec) degrees -> (x, y) 0-based pixels. Vectorized."""
        ra = np.asarray(ra, dtype=float) * DEG2RAD
        dec = np.asarray(dec, dtype=float) * DEG2RAD
        ra0 = self.crval[0] * DEG2RAD
        dec0 = self.crval[1] * DEG2RAD
        dra = ra - ra0
        cos_dec = np.cos(dec)
        sin_dec = np.sin(dec)
        cos_d0 = math.cos(dec0)
        sin_d0 = math.sin(dec0)
        den = sin_dec * sin_d0 + cos_dec * cos_d0 * np.cos(dra)
        xi = cos_dec * np.sin(dra) / den * RAD2DEG
        eta = (sin_dec * cos_d0 - cos_dec * sin_d0 * np.cos(dra)) / den * RAD2DEG
        inv = self.cd_inv
        u = inv[0, 0] * xi + inv[0, 1] * eta
        v = inv[1, 0] * xi + inv[1, 1] * eta
        return u + self.crpix[0] - 1.0, v + self.crpix[1] - 1.0

    # astropy-style conveniences used throughout the pipeline
    def pixel_to_world(self, x, y):
        ra, dec = self.pixel_to_world_values(x, y)
        return SkyCoordLite(ra, dec)

    def world_to_pixel(self, coord):
        return self.world_to_pixel_values(coord.ra_deg, coord.dec_deg)

    # --- pixel scale ---

    def pixel_scale_deg(self):
        """Approximate pixel scale in degrees/pixel (sqrt of |det CD|)."""
        return math.sqrt(abs(np.linalg.det(self.cd)))

    # --- header round trip ---

    def to_header(self):
        header = {
            "WCSAXES": 2,
            "CTYPE1": "RA---TAN",
            "CTYPE2": "DEC--TAN",
            "CRPIX1": float(self.crpix[0]),
            "CRPIX2": float(self.crpix[1]),
            "CRVAL1": float(self.crval[0]),
            "CRVAL2": float(self.crval[1]),
            "CD1_1": float(self.cd[0, 0]),
            "CD1_2": float(self.cd[0, 1]),
            "CD2_1": float(self.cd[1, 0]),
            "CD2_2": float(self.cd[1, 1]),
            "CUNIT1": "deg",
            "CUNIT2": "deg",
            "RADESYS": "ICRS",
        }
        if self.array_shape is not None:
            header["NAXIS1"] = int(self.array_shape[1])
            header["NAXIS2"] = int(self.array_shape[0])
        return header

    @classmethod
    def from_header(cls, header):
        """Build from a FITS-like header dict. Accepts CD or CDELT+PC
        keyword styles."""
        get = header.get if hasattr(header, "get") else header.__getitem__
        crpix = [float(get("CRPIX1", 0.0)), float(get("CRPIX2", 0.0))]
        crval = [float(get("CRVAL1", 0.0)), float(get("CRVAL2", 0.0))]
        if "CD1_1" in header:
            cd = [
                [float(get("CD1_1", 0.0)), float(get("CD1_2", 0.0))],
                [float(get("CD2_1", 0.0)), float(get("CD2_2", 0.0))],
            ]
        else:
            cdelt1 = float(get("CDELT1", 1.0))
            cdelt2 = float(get("CDELT2", 1.0))
            pc11 = float(get("PC1_1", 1.0))
            pc12 = float(get("PC1_2", 0.0))
            pc21 = float(get("PC2_1", 0.0))
            pc22 = float(get("PC2_2", 1.0))
            cd = [[cdelt1 * pc11, cdelt1 * pc12], [cdelt2 * pc21, cdelt2 * pc22]]
        shape = None
        if "NAXIS1" in header and "NAXIS2" in header:
            shape = (int(get("NAXIS2")), int(get("NAXIS1")))
        return cls(crpix, crval, cd, shape)

    def __eq__(self, other):
        if not isinstance(other, WCS):
            return NotImplemented
        return (
            np.allclose(self.crpix, other.crpix)
            and np.allclose(self.crval, other.crval)
            and np.allclose(self.cd, other.cd)
        )

    def __repr__(self):
        return f"WCS(crpix={self.crpix.tolist()}, crval={self.crval.tolist()}, cd={self.cd.tolist()})"


class SkyCoordLite:
    """A minimal sky-coordinate holder (degrees), vectorized."""

    def __init__(self, ra_deg, dec_deg):
        self.ra_deg = np.asarray(ra_deg, dtype=float)
        self.dec_deg = np.asarray(dec_deg, dtype=float)

    @property
    def ra(self):
        return _Angle(self.ra_deg)

    @property
    def dec(self):
        return _Angle(self.dec_deg)

    def separation_deg(self, other):
        """Angular separation in degrees (Vincenty formula)."""
        l1 = self.ra_deg * DEG2RAD
        b1 = self.dec_deg * DEG2RAD
        l2 = other.ra_deg * DEG2RAD
        b2 = other.dec_deg * DEG2RAD
        dl = l2 - l1
        num = np.hypot(np.cos(b2) * np.sin(dl), np.cos(b1) * np.sin(b2) - np.sin(b1) * np.cos(b2) * np.cos(dl))
        den = np.sin(b1) * np.sin(b2) + np.cos(b1) * np.cos(b2) * np.cos(dl)
        return np.arctan2(num, den) * RAD2DEG

    def __len__(self):
        return self.ra_deg.size

    def __repr__(self):
        return f"SkyCoordLite(ra={self.ra_deg}, dec={self.dec_deg})"


class _Angle:
    """Tiny astropy-Angle-alike exposing .deg / .rad / .arcsec."""

    def __init__(self, deg):
        self._deg = np.asarray(deg, dtype=float)

    @property
    def deg(self):
        return self._deg

    @property
    def degree(self):
        return self._deg

    @property
    def rad(self):
        return self._deg * DEG2RAD

    @property
    def arcsec(self):
        return self._deg * 3600.0

    def __repr__(self):
        return f"Angle({np.array2string(np.atleast_1d(self._deg), precision=6)} deg)"

    def __float__(self):
        return float(self._deg)

    def __array__(self, dtype=None):
        return np.asarray(self._deg, dtype=dtype)
