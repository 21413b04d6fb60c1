"""Multi-object regression test: several injected objects on a larger
stack, searched with EclipticCenteredSearch and matched back via
match_trajectory_sets (modeled on the reference's
tests/test_regression_test.py)."""

import os
import tempfile

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.run_search import SearchRunner
from kbmod_tpu.search import Trajectory
from kbmod_tpu.trajectory_utils import match_trajectory_sets


class TestRegression:
    def test_multi_object_recovery(self):
        num_times = 16
        times = create_fake_times(num_times, t0=57130.2, obs_per_day=4)
        ds = FakeDataSet(200, 160, times, noise_level=2.0, psf_val=0.6, use_seed=500)

        true_trjs = [
            Trajectory(x=30, y=40, vx=12.0, vy=2.0, flux=350.0),
            Trajectory(x=120, y=120, vx=8.0, vy=-3.5, flux=400.0),
            Trajectory(x=60, y=100, vx=15.0, vy=0.5, flux=500.0),
        ]
        for trj in true_trjs:
            ds.insert_object(trj)

        config = SearchConfiguration.from_dict(
            {
                "generator_config": {
                    "name": "EclipticCenteredSearch",
                    "velocities": [5.0, 18.0, 14],
                    "angles": [-0.5, 0.5, 11],
                    "angle_units": "radian",
                    "given_ecliptic": 0.0,
                },
                "num_obs": 10,
                "lh_level": 12.0,
                "do_clustering": True,
                "cluster_type": "all",
                "cluster_eps": 20.0,
                "compute_ra_dec": False,
                "save_all_stamps": False,
            }
        )

        runner = SearchRunner()
        results = runner.run_search(config, ds.stack_py)
        assert len(results) >= 3

        zeroed = ds.stack_py.zeroed_times
        matches = match_trajectory_sets(
            true_trjs,
            results.make_trajectory_list(),
            threshold=4.0,
            times=[0.0, zeroed[-1] / 2.0, zeroed[-1]],
        )
        assert np.all(matches >= 0), f"unrecovered objects: {matches}"

    def test_reference_scale_regression(self, monkeypatch):
        """The reference's full regression geometry in-suite
        (tests/test_regression_test.py:26-230): the same 20x1024x512 stack
        and 20 known trajectories (2 starting off-chip), in-kernel sigma-G
        with clip_negative, median stamps; every injected object must be
        recovered and the result-file metadata round-trips.

        Two cost trims keep this inside the default suite's budget on the
        single-core CPU mesh (the untouched reference config runs under
        KB_SLOW_TESTS=1 below, and on TPU via scripts/regression_tpu.py):

        * the velocity range is cut to a lattice-identical subset
          [92, 92 + 458*15/51, 16 steps] of the reference's [92, 550, 52]
          grid — same spacing, same grid points, covering every object's
          speed (max 208.7 px/day) with one full spacing of margin, so
          each object's best-matching candidates are unchanged;
        * the sigma-G pool runs at KB_SIGMAG_TOPK_FACTOR=1 with
          auto-refinement off — the top-K insertion cost scales ~15x from
          K=8 to K=32 on CPU, and the measured miss-rate table
          (docs/STATUS.md) shows every injected object recovered at
          factor 1 at every artifact rate (pool churn only reorders noise
          rows near the cut; these objects are flux-500 detections).
        """
        monkeypatch.setenv("KB_SIGMAG_TOPK_FACTOR", "1")
        monkeypatch.setenv("KB_SIGMAG_AUTO", "0")
        self._reference_scale_body(velocities=[92.0, 92.0 + 458.0 * 15 / 51, 16])

    @pytest.mark.skipif(
        os.environ.get("KB_SLOW_TESTS") != "1",
        reason="full reference regression config (~12 min on the CPU mesh): "
        "set KB_SLOW_TESTS=1 to run; the same config runs on TPU via "
        "scripts/regression_tpu.py",
    )
    def test_reference_scale_regression_full(self):
        """The reference's regression config untrimmed: full 26x52 grid and
        the default sigma-G pool."""
        self._reference_scale_body(velocities=[92.0, 550.0, 52])

    def _reference_scale_body(self, velocities):
        from kbmod_tpu.core.psf import PSF
        from kbmod_tpu.fake_data.fake_data_creator import (
            image_stack_add_fake_object,
            make_fake_image_stack,
        )
        from kbmod_tpu.results import Results
        from kbmod_tpu.work_unit import WorkUnit

        flux = 500.0
        trjs = [
            Trajectory(357, 997, -15.814404, -172.098450, flux),
            Trajectory(477, 777, -70.858154, -117.137817, flux),
            Trajectory(408, 533, -53.721024, -106.118118, flux),
            Trajectory(425, 740, -32.865086, -132.898575, flux),
            Trajectory(515, 881, -73.831688, -93.251732, flux),
            Trajectory(412, 980, -79.985207, -192.813080, flux),
            Trajectory(443, 923, -36.977375, -103.556976, flux),
            Trajectory(368, 1015, -43.644382, -176.487488, flux),
            Trajectory(510, 1011, -125.422997, -166.863983, flux),
            Trajectory(398, 939, -51.037308, -107.434616, flux),
            Trajectory(491, 925, -74.266739, -104.155556, flux),
            Trajectory(366, 824, -18.041782, -153.808197, flux),
            Trajectory(477, 870, -45.608849, -90.093689, flux),
            Trajectory(447, 993, -38.152031, -196.087646, flux),
            Trajectory(481, 882, -96.767357, -143.192352, flux),
            Trajectory(423, 912, -104.900154, -125.859169, flux),
            Trajectory(409, 803, -99.066856, -173.469589, flux),
            Trajectory(328, 797, -33.212299, -196.984467, flux),
            Trajectory(466, 1026, -67.892105, -118.881493, flux),  # off chip y
            Trajectory(514, 795, -20.134245, -171.646683, flux),  # off chip x
        ]

        num_times = 20
        times, psf_vals = [], []
        seen, day = 0, 0
        for i in range(num_times):
            times.append(57130.2 + day + seen * 0.01)
            seen += 1
            if seen == 4:
                seen, day = 0, day + 1
            psf_vals.append(1.05 - 0.1 + 0.1 * (i % 3))

        psfs = [PSF.make_gaussian_kernel(v) for v in psf_vals]
        rng = np.random.default_rng(1001)
        stack = make_fake_image_stack(1024, 512, times, noise_level=4.0, psfs=psfs, rng=rng)
        for trj in trjs:
            image_stack_add_fake_object(stack, trj.x, trj.y, trj.vx, trj.vy, flux=trj.flux)

        config = SearchConfiguration.from_dict(
            {
                "psf_val": 1.05,
                "generator_config": {
                    "name": "EclipticCenteredSearch",
                    "angles": [np.pi - np.pi / 10.0, np.pi + np.pi / 10.0, 26],
                    "velocities": list(velocities),
                    "angle_units": "radian",
                    "given_ecliptic": 1.1901106654050821,
                },
                "num_obs": 15,
                "lh_level": 25.0,
                "sigmaG_lims": [25, 75],
                "stamp_type": "median",
                "cluster_eps": 20.0,
                "gpu_filter": True,
                "clip_negative": True,
                "x_pixel_buffer": 10,
                "y_pixel_buffer": 10,
            }
        )

        with tempfile.TemporaryDirectory() as tmp:
            res_file = os.path.join(tmp, "results.ecsv")
            config.set("result_filename", res_file)
            wu = WorkUnit(im_stack=stack, config=config)
            wu.org_img_meta["visit"] = [f"img_{i}" for i in range(stack.num_times)]

            SearchRunner().run_search_from_work_unit(wu)

            loaded = Results.read_table(res_file)
            found = loaded.make_trajectory_list()
            # Metadata passthrough (reference asserts the same four).
            assert loaded.table.meta["num_img"] == num_times
            assert tuple(loaded.table.meta["dims"]) == (stack.width, stack.height)
            assert np.allclose(loaded.table.meta["mjd_mid"], times)
            assert list(loaded.table.meta["visit"]) == [f"img_{i}" for i in range(num_times)]

            matches = match_trajectory_sets(trjs, found, 3.0, [0.0, 2.0])
            missing = np.where(np.asarray(matches) == -1)[0]
            assert len(missing) == 0, f"unrecovered: {[str(trjs[i]) for i in missing]}"

    def test_masked_stack_recovery(self):
        """Recovery still works with random masking and artifacts."""
        times = create_fake_times(12, t0=57130.2, obs_per_day=4)
        ds = FakeDataSet(
            128, 128, times, noise_level=2.0, psf_val=0.6,
            mask_fraction=0.05, artifacts_fraction=0.001, use_seed=7,
        )
        trj = Trajectory(x=50, y=60, vx=10.0, vy=1.0, flux=500.0)
        ds.insert_object(trj)

        config = SearchConfiguration.from_dict(
            {
                "generator_config": {
                    "name": "VelocityGridSearch",
                    "vx_steps": 9, "min_vx": 6.0, "max_vx": 14.0,
                    "vy_steps": 5, "min_vy": -2.0, "max_vy": 2.0,
                },
                "num_obs": 8,
                "lh_level": 10.0,
                "compute_ra_dec": False,
            }
        )
        results = SearchRunner().run_search(config, ds.stack_py)
        assert len(results) >= 1
        matches = match_trajectory_sets(
            [trj], results.make_trajectory_list(), threshold=4.0, times=[0.0, float(ds.stack_py.zeroed_times[-1])]
        )
        assert matches[0] >= 0
