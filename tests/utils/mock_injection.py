"""A mock of LSST's VisitInjectTask (reference: tests/utils/mock_injection.py)
for exercising inject_sources_into_ic without the LSST stack: renders each
catalog source as a Gaussian spot into a copy of the exposure, raising
RuntimeError when nothing lands in bounds (the real task's behavior)."""

import copy
import types

import numpy as np


class MockVisitInjectTask:
    def __init__(self, config=None, psf_std=1.0, zero_point=27.0):
        self.config = config
        self.psf_std = psf_std
        self.zero_point = zero_point

    def run(self, injection_catalogs, input_exposure, psf=None, photo_calib=None, wcs=None):
        exposure = copy.deepcopy(input_exposure)
        arr = exposure.image.array
        H, W = arr.shape
        kb_wcs = wcs._wcs if hasattr(wcs, "_wcs") else wcs

        ras = np.asarray(injection_catalogs["ra"], dtype=float)
        decs = np.asarray(injection_catalogs["dec"], dtype=float)
        mags = np.asarray(injection_catalogs["mag"], dtype=float)
        xs, ys = kb_wcs.world_to_pixel_values(ras, decs)

        n_rendered = 0
        for x, y, mag in zip(np.atleast_1d(xs), np.atleast_1d(ys), np.atleast_1d(mags)):
            if not (0 <= x < W and 0 <= y < H):
                continue
            flux = 10.0 ** (-0.4 * (mag - self.zero_point))
            yy, xx = np.mgrid[0:H, 0:W]
            spot = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * self.psf_std**2))
            arr += (flux * spot / spot.sum()).astype(arr.dtype)
            n_rendered += 1
        if n_rendered == 0:
            raise RuntimeError("No sources were injected (all out of bounds).")

        out_cat = injection_catalogs.copy()
        return types.SimpleNamespace(output_exposure=exposure, output_catalog=out_cat)
