"""Fixture factory that rebuilds FITS files from *real* serialized DECam
headers.

The reference ships ~60 real Rubin-Science-Pipelines imdiff headers (DEEP
B1a field) as a tar.bz2'd ecsv of (filename, hdu, keyword, value, format)
rows and reconstructs mock HDULists from them for standardizer tests
(reference: tests/utils/mock_fits.py:26-228, tests/data/
decam_imdiff_headers.ecsv.tar.bz2). This module plays the same role for
kbmod_tpu, but targets our own FITS stack (kbmod_tpu.io.fits_io): it
parses the archive with a minimal space-delimited ecsv reader, groups
cards per file/HDU, and emits HDULists (or on-disk FITS files) with
spoofed image data so the KBMODV1 standardizer sees genuine instrument
headers — WCS with SIP terms, DECam observatory cards, Rubin mask planes —
rather than idealized synthetic ones.

The archive itself is read from the reference checkout at test time; tests
must skip when it is absent.
"""

import csv
import io
import tarfile
from pathlib import Path

import numpy as np

from kbmod_tpu.io import fits_io

__all__ = ["RealDecamHeaderFactory", "REAL_HEADERS_ARCHIVE"]

REAL_HEADERS_ARCHIVE = Path("/root/reference/tests/data/decam_imdiff_headers.ecsv.tar.bz2")

_CASTS = {"int": int, "float": float, "str": str, "bool": lambda v: v == "True"}


def _iter_card_rows(archive_path):
    """Yield (filename, hdu_index, keyword, value, format) tuples from the
    serialized-header archive (ecsv: comment header + space-delimited body
    with quoted fields)."""
    with tarfile.open(archive_path, "r:bz2") as archive:
        member = next(n for n in archive.getnames() if n.endswith(".ecsv"))
        text = archive.extractfile(member).read().decode()
    lines = [ln for ln in text.splitlines() if ln and not ln.startswith("#")]
    reader = csv.reader(lines, delimiter=" ", quotechar='"')
    names = next(reader)
    for row in reader:
        rec = dict(zip(names, row))
        yield rec["filename"], int(rec["hdu"]), rec["keyword"], rec["value"], rec["format"]


class RealDecamHeaderFactory:
    """Builds kbmod_tpu HDULists from serialized real DECam imdiff headers.

    Each source file has 16 HDUs: PRIMARY, IMAGE/MASK/VARIANCE images, and
    12 BINTABLEs of pipeline by-products our standardizers never read. Data
    arrays are spoofed (zeros); headers are the real thing.

    Parameters
    ----------
    archive_path : path-like, optional
        The serialized-header archive. Defaults to the reference checkout's
        copy; pass another path to use a local snapshot.
    """

    def __init__(self, archive_path=REAL_HEADERS_ARCHIVE):
        per_file = {}
        for fname, hdu_idx, key, value, fmt in _iter_card_rows(archive_path):
            cast = _CASTS.get(fmt, str)
            try:
                parsed = cast(value)
            except ValueError:
                parsed = value
            per_file.setdefault(fname, {}).setdefault(hdu_idx, {})[key] = parsed
        self.filenames = sorted(per_file)
        self._headers = per_file
        self._cursor = 0

    def __len__(self):
        return len(self.filenames)

    def get_hdulist(self, idx, spoof_data=True, use_header_dimensions=False):
        """HDUList for the idx-th serialized file (wraps modulo the count).

        With ``spoof_data`` the three image extensions get zero-filled
        arrays — 5x5 by default, or the true NAXIS1/2 dimensions when
        ``use_header_dimensions`` is set (needed when WCS pixel<->sky
        round-trips must land inside the image bounds).
        """
        headers = self._headers[self.filenames[idx % len(self.filenames)]]
        hdus = fits_io.HDUList()
        for hdu_idx in sorted(headers):
            header = dict(headers[hdu_idx])
            if hdu_idx == 0:
                hdu = fits_io.PrimaryHDU(header=header)
                hdu.header.setdefault("EXTNAME", "PRIMARY")
            elif str(header.get("XTENSION", "")).strip().upper() == "BINTABLE":
                hdu = fits_io.BinTableHDU(header=header)
            else:
                hdu = fits_io.ImageHDU(header=header)
            hdus.append(hdu)

        if spoof_data:
            img_header = hdus["IMAGE"].header
            if use_header_dimensions:
                shape = (int(img_header.get("NAXIS2", 5)), int(img_header.get("NAXIS1", 5)))
            else:
                shape = (5, 5)
            hdus["IMAGE"].data = np.zeros(shape, dtype=np.float32)
            hdus["VARIANCE"].data = np.ones(shape, dtype=np.float32)
            hdus["MASK"].data = np.zeros(shape, dtype=np.int32)
        return hdus

    def get_next(self, spoof_data=True, use_header_dimensions=False):
        """Next HDUList in sequence (wraps around after the last file)."""
        hdul = self.get_hdulist(self._cursor, spoof_data, use_header_dimensions)
        self._cursor = (self._cursor + 1) % len(self.filenames)
        return hdul

    def write_fits(self, path, idx, use_header_dimensions=False):
        """Write the idx-th file to disk with spoofed data so path-based
        ingestion (Standardizer.get / ImageCollection.fromTargets) can run
        on real headers.

        Our writer emits standard 8-char keys only, so HIERARCH-style long
        keys from the real headers are dropped; BINTABLE extensions keep
        their EXTNAMEs but carry no rows. Neither is consulted by the
        standardizers.
        """
        hdus = self.get_hdulist(idx, spoof_data=True, use_header_dimensions=use_header_dimensions)
        out = fits_io.HDUList()
        for hdu in hdus:
            header = {k: v for k, v in hdu.header.items() if len(k) <= 8 and v is not None}
            if isinstance(hdu, fits_io.BinTableHDU):
                out.append(fits_io.BinTableHDU(header={"EXTNAME": hdu.name}))
            else:
                clean = fits_io.ImageHDU(data=hdu.data, header=header)
                out.append(clean)
        fits_io.write_fits(path, out)
        return path
