"""Multi-object regression test: several injected objects on a larger
stack, searched with EclipticCenteredSearch and matched back via
match_trajectory_sets (modeled on the reference's
tests/test_regression_test.py)."""

import numpy as np

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
