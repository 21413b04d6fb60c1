"""Tests that run the reference project's *real* data files through the
pipeline: data/demo_image.fits and data/small/*.fits from the reference
checkout (legacy DECam layout: primary header + science/mask/variance
extensions, single injected fake object — reference data/readme.txt), plus
standardizer tests on real serialized DECam imdiff headers.

Everything in here skips cleanly if the reference checkout is absent.
"""

import os
import tempfile
from pathlib import Path

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.core.image_stack_py import ImageStackPy
from kbmod_tpu.core.psf import PSF
from kbmod_tpu.results import Results
from kbmod_tpu.run_search import SearchRunner
from kbmod_tpu.util_functions import load_deccam_layered_image
from kbmod_tpu.work_unit import WorkUnit

from utils.real_headers import REAL_HEADERS_ARCHIVE, RealDecamHeaderFactory

REF_DATA = Path("/root/reference/data")

needs_ref_data = pytest.mark.skipif(
    not (REF_DATA / "demo_image.fits").exists(), reason="reference data checkout not present"
)
needs_header_archive = pytest.mark.skipif(
    not REAL_HEADERS_ARCHIVE.exists(), reason="serialized DECam header archive not present"
)


def load_small_stack():
    """The reference's 10 64x64 DECam-layout files as one ImageStackPy."""
    psf = PSF.make_gaussian_kernel(1.0)
    stack = ImageStackPy()
    for path in sorted((REF_DATA / "small").glob("*.fits")):
        layered = load_deccam_layered_image(path, psf)
        stack.append_layered_image(layered)
    stack.sort_by_time()
    return stack


@needs_ref_data
class TestDemoImage:
    """data/demo_image.fits: a single 256x256 frame with one fake object."""

    def test_load(self):
        img = load_deccam_layered_image(REF_DATA / "demo_image.fits", PSF.make_gaussian_kernel(1.0))
        assert img.sci.shape == (256, 256)
        assert img.var.shape == (256, 256)
        assert img.time == pytest.approx(57130.19921875)
        # Science values are finite wherever unmasked, variance positive.
        valid = ~np.isnan(img.sci)
        assert valid.sum() > 0.9 * img.sci.size
        assert np.all(img.var[~np.isnan(img.var)] > 0)

    def test_psi_phi_sane(self):
        from kbmod_tpu.ops.psi_phi import generate_psi_phi_from_image_stack

        img = load_deccam_layered_image(REF_DATA / "demo_image.fits", PSF.make_gaussian_kernel(1.0))
        stack = ImageStackPy()
        stack.append_layered_image(img)
        psi, phi = generate_psi_phi_from_image_stack(stack)
        psi = np.asarray(psi)[0]
        phi = np.asarray(phi)[0]
        valid = ~np.isnan(psi)
        assert valid.sum() > 0.9 * psi.size
        assert np.all(phi[~np.isnan(phi)] > 0)
        # The injected object should stand out: max psi/sqrt(phi) over the
        # frame is a strong single-frame SNR.
        snr = psi[valid] / np.sqrt(phi[valid])
        assert np.nanmax(snr) > 5.0


@needs_ref_data
class TestSmallStackEndToEnd:
    """The 10-image data/small stack through the full SearchRunner."""

    def test_stack_loads(self):
        stack = load_small_stack()
        assert len(stack) == 10
        assert stack.sci[0].shape == (64, 64)
        assert np.all(np.diff(stack.times) >= 0)
        assert stack.zeroed_times[0] == 0.0

    def test_run_search(self):
        stack = load_small_stack()
        config = SearchConfiguration()
        config.set("generator_config", {
            "name": "VelocityGridSearch",
            "vx_steps": 21, "min_vx": -10.0, "max_vx": 10.0,
            "vy_steps": 21, "min_vy": -10.0, "max_vy": 10.0,
        })
        config.set("num_obs", 5)
        config.set("lh_level", 8.0)
        config.set("do_clustering", True)
        config.set("coadds", ["mean"])
        config.set("stamp_radius", 5)

        with tempfile.TemporaryDirectory() as tmp:
            config.set("result_filename", os.path.join(tmp, "small_res.ecsv"))
            config.set("save_config", True)
            work = WorkUnit(im_stack=stack, config=config)
            results = SearchRunner().run_search_from_work_unit(work)

            assert len(results) >= 1
            assert np.all(np.isfinite(results["likelihood"]))
            assert np.all(results["obs_count"] >= 5)
            assert results["coadd_mean"][0].shape == (11, 11)

            # Output files: results + config provenance, both readable back.
            assert os.path.exists(os.path.join(tmp, "small_res.ecsv"))
            loaded = Results.read_table(os.path.join(tmp, "small_res.ecsv"))
            assert len(loaded) == len(results)
            np.testing.assert_allclose(
                np.asarray(loaded["likelihood"], dtype=float),
                np.asarray(results["likelihood"], dtype=float),
                rtol=1e-6,
            )
            prov = os.path.join(tmp, "small_res_provenance", "small_res_config.yaml")
            assert os.path.exists(prov)

    def test_work_unit_round_trip(self):
        stack = load_small_stack()
        work = WorkUnit(im_stack=stack, config=SearchConfiguration())
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "small.fits")
            work.to_fits(path)
            loaded = WorkUnit.from_fits(path, show_progress=False)
            assert len(loaded.im_stack) == 10
            np.testing.assert_allclose(loaded.im_stack.times, stack.times)
            np.testing.assert_allclose(
                np.nan_to_num(loaded.im_stack.sci[0]), np.nan_to_num(stack.sci[0]), rtol=1e-6
            )


@needs_header_archive
class TestRealDecamHeaders:
    """KBMODV1 standardizer on real Rubin imdiff headers."""

    @classmethod
    def setup_class(cls):
        cls.factory = RealDecamHeaderFactory()

    def test_archive_shape(self):
        assert len(self.factory) >= 60
        hdul = self.factory.get_hdulist(0)
        assert [h.name for h in hdul[:4]] == ["PRIMARY", "IMAGE", "MASK", "VARIANCE"]

    def test_kbmodv1_resolves(self):
        from kbmod_tpu.standardizers import KBMODV1

        hdul = self.factory.get_hdulist(0)
        can, _ = KBMODV1.resolveTarget(hdul)
        assert can

    def test_standardize_metadata_and_wcs(self):
        from kbmod_tpu.standardizers import KBMODV1

        hdul = self.factory.get_hdulist(1, use_header_dimensions=True)
        std = KBMODV1(hdulist=hdul)
        meta = std.standardizeMetadata()
        # Real DECam mjd: the DEEP B1a field was observed Sept 2021
        # (mjd ~59460); location is Cerro Tololo.
        assert 59400 < meta["mjd_mid"][0] < 59500
        assert meta["obs_lat"][0] == pytest.approx(-30.17, abs=0.1)

        (wcs,) = std.standardizeWCS()
        assert wcs is not None
        # SIP-corrected round trip through the real WCS stays sub-pixel.
        xy = np.array([[100.0, 200.0], [1500.0, 3000.0]])
        sky = wcs.pixel_to_world_values(xy[:, 0], xy[:, 1])
        back = wcs.world_to_pixel_values(sky[0], sky[1])
        np.testing.assert_allclose(back[0], xy[:, 0], atol=0.05)
        np.testing.assert_allclose(back[1], xy[:, 1], atol=0.05)

    def test_to_layered_image(self):
        hdul = self.factory.get_hdulist(2)
        from kbmod_tpu.standardizers import KBMODV1

        std = KBMODV1(hdulist=hdul)
        (img,) = std.toLayeredImage()
        assert img.sci.shape == (5, 5)
        assert img.time > 59400

    def test_image_collection_from_real_headers(self, tmp_path):
        from kbmod_tpu.image_collection import ImageCollection

        paths = [
            str(self.factory.write_fits(tmp_path / f"imdiff_{i}.fits", i)) for i in range(4)
        ]
        ic = ImageCollection.fromTargets(paths)
        assert len(ic) == 4
        assert all(59400 < t < 59500 for t in ic["mjd_mid"])
        # Distinct exposures, real visit ids carried through.
        assert len(set(ic["visit"])) == 4
