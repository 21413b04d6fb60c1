"""End-to-end pipeline tests: fake WorkUnit -> SearchRunner -> results file
(modeled on the reference's tests/test_end_to_end.py and
test_readme_example.py)."""

import os
import tempfile

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.fake_data.demo_helper import make_demo_data
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.results import Results
from kbmod_tpu.run_search import SearchRunner
from kbmod_tpu.search import Trajectory
from kbmod_tpu.trajectory_generator import KBMODV1Search
from kbmod_tpu.work_unit import WorkUnit


class TestReadmeExample:
    """The README-style flow: fake data + small polar grid search."""

    def test_readme_flow(self):
        times = create_fake_times(10, t0=57130.2)
        ds = FakeDataSet(128, 128, times, use_seed=42)
        trj = Trajectory(x=30, y=70, vx=9.5, vy=-4.0, flux=500.0)
        ds.insert_object(trj)

        from kbmod_tpu.search import StackSearch

        stack = ds.stack_py
        search = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)
        gen = KBMODV1Search(5, 8.0, 12.0, 5, -0.6, -0.2)
        candidates = list(gen)
        search.set_min_obs(5)
        search.search_all(candidates, True)
        results = search.get_results(0, 10)
        # The candidate grid does not contain the exact injected velocity,
        # so the best hit may sit a pixel or two off the true start.
        best = results[0]
        assert best.lh > 50.0
        assert abs(best.x - trj.x) <= 2
        assert abs(best.y - trj.y) <= 4
        assert abs(best.vx - trj.vx) < 1.5
        assert abs(best.vy - trj.vy) < 1.0


class TestEndToEnd:
    def test_demo_search_recovers_object(self):
        work = make_demo_data()
        runner = SearchRunner()
        with tempfile.TemporaryDirectory() as tmp:
            work.config.set("result_filename", os.path.join(tmp, "results.ecsv"))
            work.config.set("save_all_stamps", True)
            results = runner.run_search_from_work_unit(work)

            assert len(results) > 0
            # The injected object (x=50, y=40, vx=10, vy=0) is the top hit.
            best_idx = int(np.argmax(results["likelihood"]))
            assert abs(results["x"][best_idx] - 50) <= 1
            assert abs(results["y"][best_idx] - 40) <= 1
            assert abs(results["vx"][best_idx] - 10.0) < 1.0
            assert abs(results["vy"][best_idx] - 0.0) < 1.0

            # Stamps were generated.
            assert "stamp" in results.colnames
            assert "coadd_sum" in results.colnames
            assert results["stamp"].shape[1] == 21

            # Results file written and readable (all_stamps split off).
            out = Results.read_table(os.path.join(tmp, "results.ecsv"), load_aux_files=True)
            assert len(out) == len(results)
            assert "all_stamps" in out.colnames
            # Config provenance saved.
            assert os.path.exists(os.path.join(tmp, "results_provenance", "results_config.yaml"))

    def test_phase_stats_recorded(self):
        work = make_demo_data()
        runner = SearchRunner()
        runner.run_search_from_work_unit(work)
        assert "KBMOD" in runner.phase_times
        assert "do_core_search" in runner.phase_times
        assert runner.phase_times["KBMOD"][1] is not None


class TestWorkUnitIO:
    def test_fits_roundtrip(self):
        work = make_demo_data()
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "demo.fits")
            work.to_fits(path)
            work2 = WorkUnit.from_fits(path)
            assert work2.im_stack.num_times == work.im_stack.num_times
            assert work2.im_stack.width == work.im_stack.width
            np.testing.assert_allclose(work2.im_stack.times, work.im_stack.times)
            np.testing.assert_allclose(work2.im_stack.sci[0], work.im_stack.sci[0], rtol=1e-6)
            np.testing.assert_allclose(work2.im_stack.psfs[3], work.im_stack.psfs[3], rtol=1e-6)
            assert work2.config["sigmaG_lims"] == [15, 60]
            assert work2.config["generator_config"]["velocities"] == [0, 20.0, 21]

    def test_sharded_roundtrip(self):
        work = make_demo_data()
        with tempfile.TemporaryDirectory() as tmp:
            work.to_sharded_fits("demo.fits", tmp)
            work2 = WorkUnit.from_sharded_fits("demo.fits", tmp)
            assert work2.im_stack.num_times == work.im_stack.num_times
            np.testing.assert_allclose(work2.im_stack.sci[5], work.im_stack.sci[5], rtol=1e-6)

            lazy = WorkUnit.from_sharded_fits("demo.fits", tmp, lazy=True)
            assert lazy.lazy
            assert lazy.im_stack.num_times == 0
            lazy.load_images()
            assert lazy.im_stack.num_times == work.im_stack.num_times

    def test_filter_images(self):
        work = make_demo_data()
        n = work.im_stack.num_times
        mask = np.ones(n, dtype=bool)
        mask[:5] = False
        work.filter_images(mask)
        assert work.im_stack.num_times == n - 5
        assert work.n_constituents == n - 5
