"""Geometry: WCS (gnomonic/TAN), coordinate transforms, ephemerides, and
reprojection — self-contained (no astropy)."""
