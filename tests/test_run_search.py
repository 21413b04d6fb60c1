"""SearchRunner unit tests (reference behavior: tests/test_run_search.py)."""

import logging
import os
import tempfile

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.run_search import SearchRunner, configure_kb_search_stack
from kbmod_tpu.search import StackSearch, Trajectory
from kbmod_tpu.trajectory_generator import VelocityGridSearch


class TestBadConfig:
    def test_invalid_params_raise(self):
        ds = FakeDataSet(30, 20, create_fake_times(5, t0=60676.0), use_seed=5)
        runner = SearchRunner()
        logging.disable(logging.CRITICAL)
        try:
            for key, val in [
                ("results_per_pixel", -1),
                ("x_pixel_bounds", [20, 10]),
                ("y_pixel_bounds", [20, 10]),
            ]:
                config = SearchConfiguration()
                config.set(key, val)
                with pytest.raises(ValueError):
                    runner.run_search(config, ds.stack_py)
        finally:
            logging.disable(logging.NOTSET)


class TestAutoConfig:
    def test_num_obs_downscaled(self):
        ds = FakeDataSet(15, 10, create_fake_times(10, t0=60676.0), use_seed=6)
        config = SearchConfiguration()
        config.set("num_obs", 21)
        config.set("cpu_only", True)
        config.set("do_clustering", False)
        config.set("cnn_filter", False)
        config.set("lh_level", 0.0)
        config.set("sigmaG_filter", False)
        config.set(
            "generator_config", {"name": "SingleVelocitySearch", "vx": 0.0, "vy": 0.0}
        )
        SearchRunner().run_search(config, ds.stack_py)
        assert config["num_obs"] == 10


class TestLoadAndFilterResults:
    def _setup(self):
        num_times, width, height = 50, 20, 5
        trjs = [
            Trajectory(x=i, y=0, vx=0.0, vy=0.0, obs_count=num_times, lh=100.0)
            for i in range(10)
        ]
        ds = FakeDataSet(width, height, create_fake_times(num_times, t0=60676.0), use_seed=9)
        # Give trajectory x exactly x outliers (bright values early on).
        for i in range(num_times):
            sci = ds.stack_py.sci[i]
            for x, trj in enumerate(trjs):
                sci[trj.y, trj.x] = 2000.0 if i < 2 * x else 10.0

        config = SearchConfiguration()
        config.set("num_obs", 39)
        config.set("lh_level", 1.0)
        config.set("sigmaG_filter", True)
        config.set("sigmaG_lims", [10, 90])
        config.set("near_dup_thresh", None)

        search = StackSearch(
            ds.stack_py.sci, ds.stack_py.var, ds.stack_py.psfs, ds.stack_py.zeroed_times
        )
        configure_kb_search_stack(search, config)
        return search, config, trjs

    def test_filtering_and_batches(self):
        search, config, trjs = self._setup()
        runner = SearchRunner()
        assert len(runner.load_and_filter_results(search, config, batch_size=10)) == 0

        search.set_results(trjs)
        results = runner.load_and_filter_results(search, config, batch_size=10)
        # sigma-G clips the outliers, dropping rows below 39 valid obs.
        assert 2 < len(results) < 10
        # Batch size must not change the outcome.
        assert len(runner.load_and_filter_results(search, config, batch_size=2)) == len(results)
        assert len(runner.load_and_filter_results(search, config, batch_size=1)) == len(results)

    def test_psi_phi_toggle(self):
        search, config, trjs = self._setup()
        search.set_results(trjs)
        config.set("sigmaG_filter", False)
        runner = SearchRunner()
        results = runner.load_and_filter_results(search, config)
        assert len(results) == 10
        assert "psi_curve" in results.colnames
        assert "phi_curve" in results.colnames

        config.set("generate_psi_phi", False)
        results = runner.load_and_filter_results(search, config)
        assert len(results) == 10
        assert "psi_curve" not in results.colnames
        assert "phi_curve" not in results.colnames


class TestMaxResults:
    def test_max_results_truncation(self):
        num_times = 10
        ds = FakeDataSet(
            20, 15, [59000.0 + float(i) / num_times for i in range(num_times)],
            psf_val=0.01, use_seed=13,
        )
        ds.insert_object(Trajectory(x=17, y=12, vx=21.0, vy=16.0, flux=250.0))
        trj_gen = VelocityGridSearch(3, 15.0, 27.0, 3, 10.0, 22.0)

        def run(max_results):
            config = SearchConfiguration()
            config.set("cpu_only", True)
            config.set("do_clustering", False)
            config.set("cnn_filter", False)
            config.set("lh_level", 0.0)
            config.set("max_results", max_results)
            config.set("near_dup_thresh", 1)
            config.set("num_obs", 1)
            config.set("sigmaG_filter", False)
            return SearchRunner().run_search(config, ds.stack_py, trj_generator=trj_gen)

        keep1 = run(50)
        assert len(keep1) == 50
        keep2 = run(10)
        assert len(keep2) == 10
        for i in range(10):
            assert keep1["x"][i] == keep2["x"][i]
            assert keep1["y"][i] == keep2["y"][i]
            np.testing.assert_allclose(keep1["likelihood"][i], keep2["likelihood"][i], rtol=1e-6)
        keep3 = run(-1)
        assert len(keep3) > 100


class TestSearchCheckpointEnv:
    def test_env_knob_routes_runner_through_checkpointing(self, tmp_path, monkeypatch):
        """KB_SEARCH_CKPT_DIR makes the full SearchRunner pipeline checkpoint
        the core search per row tile and resume from the finished tiles
        (TPU-build extension; see docs/env_vars.md)."""
        num_times = 8
        ds = FakeDataSet(30, 40, create_fake_times(num_times, t0=60676.0), use_seed=31)
        ds.insert_object(Trajectory(x=5, y=10, vx=12.0, vy=7.0, flux=300.0))
        trj_gen = VelocityGridSearch(3, 8.0, 16.0, 3, 3.0, 11.0)

        def run():
            config = SearchConfiguration()
            config.set("cpu_only", True)
            config.set("do_clustering", False)
            config.set("cnn_filter", False)
            config.set("lh_level", 0.0)
            config.set("num_obs", 4)
            config.set("sigmaG_filter", False)
            config.set("near_dup_thresh", 1)
            res = SearchRunner().run_search(config, ds.stack_py, trj_generator=trj_gen)
            return res

        plain = run()

        ck = str(tmp_path / "runner_ck")
        monkeypatch.setenv("KB_SEARCH_CKPT_DIR", ck)
        monkeypatch.setenv("KB_SEARCH_CKPT_TILE_ROWS", "16")
        tiled = run()
        tiles = [f for f in os.listdir(ck) if f.startswith("tile_")]
        assert len(tiles) == 3  # ceil(40 / 16)

        # Resume: identical output with every tile served from disk.
        import kbmod_tpu.search.checkpoint as ckmod

        def boom(*a, **k):
            raise AssertionError("core_search called on full resume")

        monkeypatch.setattr(ckmod.search_ops, "core_search", boom)
        resumed = run()

        for res in (tiled, resumed):
            assert len(res) == len(plain)
            for key in ("x", "y", "vx", "vy"):
                np.testing.assert_array_equal(res[key], plain[key], err_msg=key)
            np.testing.assert_allclose(res["likelihood"], plain["likelihood"], rtol=1e-6)


class TestMaskedImageFiltering:
    def test_overmasked_images_dropped(self):
        num_times, width, height = 10, 15, 10
        fake_times = create_fake_times(num_times, t0=60676.0)
        ds = FakeDataSet(width, height, fake_times, use_seed=21)
        for t in [1, 3, 4]:
            ds.stack_py.sci[t][:, 1:width] = np.nan
            ds.stack_py.var[t][:, 1:width] = np.nan

        work = ds.get_work_unit()
        work.org_img_meta["filter"] = list("abcdefghij")
        work.config.set("max_masked_pixels", 0.5)
        work.config.set("cnn_filter", False)
        work.config.set("cpu_only", True)
        work.config.set("do_clustering", False)
        work.config.set(
            "generator_config", {"name": "SingleVelocitySearch", "vx": 0.0, "vy": 0.0}
        )
        work.config.set("lh_level", 0.0)
        work.config.set("num_obs", 5)
        work.config.set("pred_line_cluster", False)

        with tempfile.TemporaryDirectory() as tmp:
            res_file = os.path.join(tmp, "results.ecsv")
            work.config.set("result_filename", res_file)
            results = SearchRunner().run_search_from_work_unit(work)
            assert len(results) > 0
            np.testing.assert_allclose(
                results.mjd_mid,
                [fake_times[i] for i in range(num_times) if i not in (1, 3, 4)],
            )

            from kbmod_tpu.results import Results

            saved = Results.read_table(res_file)
            assert saved.table.meta["num_img"] == 7
            assert list(saved.table.meta["filter"]) == list("acfghij")
