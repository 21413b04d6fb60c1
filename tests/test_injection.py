"""Source injection and recovery tests (modeled on the reference's
tests/test_injection.py)."""

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.injection import (
    generate_injection_catalog,
    inject_sources_into_work_unit,
    match_injection_results,
)
from kbmod_tpu.results import Results
from kbmod_tpu.wcs_utils import make_fake_wcs


class TestInjection:
    def test_generate_catalog(self):
        catalog = generate_injection_catalog(
            20, 200.0, -7.0, 57130.0, vel_min=10.0, vel_max=100.0, seed=11
        )
        assert len(catalog) == 20
        assert np.all(np.abs(np.asarray(catalog["ra"]) - 200.0) < 0.2)
        speeds = np.hypot(catalog["v_ra"], catalog["v_dec"]) * 3600.0
        assert np.all(speeds >= 9.99)
        assert np.all(speeds <= 100.01)

    def test_generate_catalog_with_ebd(self):
        plain = generate_injection_catalog(5, 200.0, -7.0, 57130.0, seed=3)
        ebd = generate_injection_catalog(5, 200.0, -7.0, 57130.0, seed=3, barycentric_distance=40.0)
        # The inverse-EBD correction shifts the positions.
        assert not np.allclose(np.asarray(plain["ra"]), np.asarray(ebd["ra"]))

    def test_inject_and_recover(self):
        times = create_fake_times(8, t0=57130.0, obs_per_day=4)
        ds = FakeDataSet(128, 128, times, use_seed=21)
        work = ds.get_work_unit()
        work.wcs = make_fake_wcs(200.0, -7.0, 128, 128, 1.0 / 3600.0)

        catalog = generate_injection_catalog(
            3,
            200.0,
            -7.0,
            57130.0,
            ra_spread_deg=0.005,
            dec_spread_deg=0.005,
            vel_min=20.0,
            vel_max=60.0,
            mag_min=18.0,
            mag_max=19.0,
            seed=7,
        )
        injected = inject_sources_into_work_unit(work, catalog, zero_point=27.0)
        assert len(injected) == 3
        # The injections brightened the images.
        assert np.nanmax(work.im_stack.sci[0]) > 20.0

        # A perfect result set (the injected trajectories) matches fully.
        results = Results.from_trajectories(injected)
        match = match_injection_results(catalog, results, work, threshold_pixels=3.0)
        assert np.all(np.asarray(match["recovered"]))

        # An empty result set recovers nothing.
        empty_match = match_injection_results(catalog, Results(), work)
        assert not np.any(np.asarray(empty_match["recovered"]))


class TestInjectSourcesIntoIC:
    """The reference's Butler/ImageCollection injection path
    (injection.py:204-322), exercised against the mock LSST stack."""

    def _butler_ic(self, n=3):
        from tests.utils.mock_butler import MockButler, MockDatasetRef, MockExposure, install_mock_lsst

        install_mock_lsst()
        from kbmod_tpu.image_collection import ImageCollection
        from kbmod_tpu.standardizers.butler_standardizer import ButlerStandardizer

        butler = MockButler()
        stds = []
        for i in range(n):
            exp = MockExposure(mjd=57130.5 + 0.1 * i, seed=i)
            stds.append(ButlerStandardizer(MockDatasetRef(exp), butler=butler))
        return ImageCollection.fromStandardizers(stds), butler

    def test_inject_into_ic(self):
        from tests.utils.mock_injection import MockVisitInjectTask
        from kbmod_tpu.injection import inject_sources_into_ic
        from kbmod_tpu.table import Table

        ic, butler = self._butler_ic()
        assert "dataId" in ic.data.colnames

        obstimes = np.asarray(ic["mjd_mid"], dtype=float)
        # One bright source per epoch near the chip center (200.0, -7.0).
        catalog = Table({
            "injection_id": np.arange(len(obstimes)),
            "ra": np.full(len(obstimes), 200.0),
            "dec": np.full(len(obstimes), -7.0),
            "mag": np.full(len(obstimes), 20.0),
            "obj_ids": np.zeros(len(obstimes), dtype=int),
            "obstime": obstimes,
            "source_type": np.array(["Star"] * len(obstimes), dtype=object),
        })
        before = [np.array(ic.get_standardizer(i, butler=butler)["std"].exposure.image.array)
                  for i in range(len(ic))]
        new_ic, injected = inject_sources_into_ic(
            ic, catalog, butler, inject_task=MockVisitInjectTask()
        )
        assert len(new_ic) == len(ic)
        assert len(injected) == len(obstimes)
        # Every rebuilt exposure gained flux; the originals are untouched.
        for i in range(len(new_ic)):
            std = new_ic.get_standardizer(i, butler=butler)["std"]
            after = np.array(std.exposure.image.array)
            assert after.sum() > before[i].sum() + 50.0
            orig = np.array(ic.get_standardizer(i, butler=butler)["std"].exposure.image.array)
            np.testing.assert_array_equal(orig, before[i])
        # The rebuilt collection standardizes into a usable WorkUnit.
        wu = new_ic.toWorkUnit()
        assert wu.im_stack.num_times == len(ic)

    def test_epoch_without_sources_keeps_exposure(self):
        from tests.utils.mock_injection import MockVisitInjectTask
        from kbmod_tpu.injection import inject_sources_into_ic
        from kbmod_tpu.table import Table

        ic, butler = self._butler_ic(n=2)
        obstimes = np.asarray(ic["mjd_mid"], dtype=float)
        catalog = Table({
            "injection_id": np.array([0]),
            "ra": np.array([200.0]),
            "dec": np.array([-7.0]),
            "mag": np.array([20.0]),
            "obj_ids": np.array([0]),
            "obstime": obstimes[:1],
            "source_type": np.array(["Star"], dtype=object),
        })
        before1 = np.array(ic.get_standardizer(1, butler=butler)["std"].exposure.image.array)
        new_ic, injected = inject_sources_into_ic(
            ic, catalog, butler, inject_task=MockVisitInjectTask()
        )
        after1 = np.array(new_ic.get_standardizer(1, butler=butler)["std"].exposure.image.array)
        np.testing.assert_array_equal(after1, before1)
        assert len(injected) == 1

    def test_out_of_bounds_warns(self):
        import warnings as _warnings

        from tests.utils.mock_injection import MockVisitInjectTask
        from kbmod_tpu.injection import inject_sources_into_ic
        from kbmod_tpu.table import Table

        ic, butler = self._butler_ic(n=1)
        obstimes = np.asarray(ic["mjd_mid"], dtype=float)
        catalog = Table({
            "injection_id": np.array([0]),
            "ra": np.array([10.0]),  # nowhere near the chip
            "dec": np.array([80.0]),
            "mag": np.array([20.0]),
            "obj_ids": np.array([0]),
            "obstime": obstimes[:1],
            "source_type": np.array(["Star"], dtype=object),
        })
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            new_ic, injected = inject_sources_into_ic(
                ic, catalog, butler, inject_task=MockVisitInjectTask()
            )
        assert any("rendered within bounds" in str(w.message) for w in caught)
        assert len(injected) == 0

    def test_missing_columns_raises(self):
        from kbmod_tpu.injection import inject_sources_into_ic
        from kbmod_tpu.image_collection import ImageCollection
        from kbmod_tpu.table import Table

        ic = ImageCollection(Table({
            "mjd_mid": np.array([57130.0]),
            "location": np.array(["f"], dtype=object),
            "std_idx": np.array([0]),
            "ext_idx": np.array([0]),
            "std_name": np.array(["KBMODV1"], dtype=object),
            "ra": np.array([200.0]),
            "dec": np.array([-7.0]),
        }))
        with pytest.raises(ValueError, match="dataId"):
            inject_sources_into_ic(ic, Table({}), butler=None, inject_task=object())


class TestGenerateICInjectionCatalog:
    def test_catalog_schema_and_motion(self):
        from tests.utils.mock_butler import MockButler, MockDatasetRef, MockExposure, install_mock_lsst

        install_mock_lsst()
        from kbmod_tpu.configuration import SearchConfiguration
        from kbmod_tpu.image_collection import ImageCollection
        from kbmod_tpu.injection import generate_ic_injection_catalog
        from kbmod_tpu.standardizers.butler_standardizer import ButlerStandardizer
        from kbmod_tpu.wcs_utils import make_fake_wcs

        butler = MockButler()
        stds = [
            ButlerStandardizer(MockDatasetRef(MockExposure(mjd=57130.5 + 0.2 * i, seed=i)), butler=butler)
            for i in range(3)
        ]
        ic = ImageCollection.fromStandardizers(stds)
        wcs = make_fake_wcs(200.0, -7.0, 256, 256, deg_per_pixel=0.001)
        config = SearchConfiguration()
        config.set("generator_config", {
            "name": "VelocityGridSearch",
            "vx_steps": 5, "min_vx": -2.0, "max_vx": 2.0,
            "vy_steps": 5, "min_vy": -2.0, "max_vy": 2.0,
        })
        cat = generate_ic_injection_catalog(ic, config, wcs, n_objs_per_ic=4, seed=7)
        n_epochs = len(np.unique(np.asarray(ic["mjd_mid"])))
        assert len(cat) == 4 * n_epochs
        for col in ("injection_id", "ra", "dec", "mag", "obj_ids", "obstime",
                    "plot_x", "plot_y", "source_type"):
            assert col in cat.colnames
        # Straight-line pixel motion: per-object plot_x is linear in time.
        for oid in range(4):
            sel = np.asarray(cat["obj_ids"]) == oid
            xs = np.asarray(cat["plot_x"])[sel]
            ts = np.asarray(cat["obstime"])[sel]
            resid = xs - np.polyval(np.polyfit(ts, xs, 1), ts)
            assert np.max(np.abs(resid)) < 1e-8
