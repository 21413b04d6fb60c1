"""A mock LSST Butler stack (installs fake ``lsst.daf.butler`` modules) so
the ButlerStandardizer can be exercised without the LSST pipelines —
mirroring the reference's tests/utils/mock_butler.py approach."""

import sys
import types
import uuid

import numpy as np

from kbmod_tpu.wcs_utils import make_fake_wcs


class MockImagePlane:
    def __init__(self, array):
        self.array = array


class MockMaskPlane(MockImagePlane):
    def getMaskPlaneDict(self):
        return {"BAD": 0, "SAT": 1, "EDGE": 4, "NO_DATA": 8, "SUSPECT": 7, "UNMASKEDNAN": 15}


class MockDate:
    def __init__(self, mjd):
        self._mjd = mjd

    def get(self):
        return self._mjd


class MockVisitInfo:
    def __init__(self, mjd):
        self.date = MockDate(mjd)


class MockInfo:
    def __init__(self, mjd):
        self._visit_info = MockVisitInfo(mjd)

    def getVisitInfo(self):
        return self._visit_info


class MockSkyWcs:
    def __init__(self, wcs):
        self._wcs = wcs

    def getFitsMetadata(self):
        header = self._wcs.to_header()

        class _Meta:
            def toDict(self_inner):
                return header

        return _Meta()


class MockFilter:
    bandLabel = "r"


class MockExposure:
    """Mimics a Rubin Exposure: image/variance/mask planes + info."""

    def __init__(self, shape=(32, 36), mjd=57130.5, seed=0):
        rng = np.random.default_rng(seed)
        self.image = MockImagePlane(rng.normal(0, 1, shape).astype(np.float32))
        self.variance = MockImagePlane(np.full(shape, 4.0, dtype=np.float32))
        mask = np.zeros(shape, dtype=np.int32)
        mask[2, 3] = 1  # BAD bit
        self.mask = MockMaskPlane(mask)
        self._info = MockInfo(mjd)
        self._wcs = make_fake_wcs(200.0, -7.0, shape[0], shape[1], 0.26 / 3600.0)

    def getInfo(self):
        return self._info

    def getWcs(self):
        return MockSkyWcs(self._wcs)

    def getFilter(self):
        return MockFilter()

    def getPsf(self):
        return None


class MockDatasetRef:
    def __init__(self, exposure):
        self.id = uuid.uuid4()
        self.dataId = {"visit": 12345, "detector": 42}
        self._exposure = exposure


class MockButler:
    """get(ref) returns the mock exposure."""

    def __init__(self):
        self.registry = types.SimpleNamespace(queryDatasets=lambda *a, **k: [])

    def get(self, ref, **kwargs):
        if isinstance(ref, MockDatasetRef):
            return ref._exposure
        raise KeyError(ref)


def install_mock_lsst():
    """Register fake lsst.daf.butler modules so the optional-import gate in
    kbmod_tpu.standardizers.butler_standardizer passes."""
    lsst = types.ModuleType("lsst")
    daf = types.ModuleType("lsst.daf")
    butler_mod = types.ModuleType("lsst.daf.butler")
    butler_mod.Butler = MockButler
    butler_mod.DatasetRef = MockDatasetRef
    lsst.daf = daf
    daf.butler = butler_mod
    sys.modules.setdefault("lsst", lsst)
    sys.modules.setdefault("lsst.daf", daf)
    sys.modules["lsst.daf.butler"] = butler_mod
    return butler_mod
