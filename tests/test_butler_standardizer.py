"""ButlerStandardizer tests against the mock LSST stack (modeled on the
reference's tests/test_butlerstd.py + tests/utils/mock_butler.py)."""

import numpy as np

from tests.utils.mock_butler import MockButler, MockDatasetRef, MockExposure, install_mock_lsst

install_mock_lsst()

from kbmod_tpu.standardizers.butler_standardizer import ButlerStandardizer  # noqa: E402


class TestButlerStandardizer:
    def setup_method(self):
        self.butler = MockButler()
        self.exposure = MockExposure()
        self.ref = MockDatasetRef(self.exposure)
        self.std = ButlerStandardizer(self.ref, butler=self.butler)

    def test_metadata(self):
        meta = self.std.standardizeMetadata()
        assert abs(meta["mjd_mid"][0] - 57130.5) < 1e-6
        assert abs(meta["ra"][0] - 200.0) < 0.01
        assert meta["filter"][0] == "r"
        assert meta["visit"][0] == 12345

    def test_images(self):
        sci = self.std.standardizeScienceImage()[0]
        var = self.std.standardizeVarianceImage()[0]
        mask = self.std.standardizeMaskImage()[0]
        assert sci.shape == (32, 36)
        assert np.allclose(var, 4.0)
        assert mask[2, 3]  # BAD pixel masked (and grown)
        assert mask[5, 6]

    def test_to_layered_image(self):
        layered = self.std.toLayeredImage()
        assert len(layered) == 1
        assert layered[0].sci.shape == (32, 36)
        assert abs(layered[0].time - 57130.5) < 1e-6

    def test_psf_fallback(self):
        psf = self.std.standardizePSF()[0]
        assert psf.ndim == 2
        assert np.isclose(psf.sum(), 1.0, atol=1e-5)
