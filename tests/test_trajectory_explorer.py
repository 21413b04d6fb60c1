"""TrajectoryExplorer tests (modeled on the reference's
tests/test_trajectory_explorer.py)."""

import numpy as np

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.search import Trajectory
from kbmod_tpu.trajectory_explorer import TrajectoryExplorer, refine_all_results
from kbmod_tpu.results import Results
from kbmod_tpu.wcs_utils import make_fake_wcs


class TestTrajectoryExplorer:
    def setup_method(self):
        times = create_fake_times(8, t0=57130.0, obs_per_day=4)
        self.ds = FakeDataSet(96, 96, times, use_seed=91)
        self.trj = Trajectory(x=40, y=50, vx=8.0, vy=-4.0, flux=400.0)
        self.ds.insert_object(self.trj)
        config = SearchConfiguration.from_dict({"num_obs": 5})
        self.explorer = TrajectoryExplorer(self.ds.stack_py, config=config)

    def test_evaluate_linear_trajectory(self):
        result = self.explorer.evaluate_linear_trajectory(40, 50, 8.0, -4.0)
        assert len(result) == 1
        assert result["likelihood"][0] > 20.0
        assert result["obs_count"][0] == 8
        assert "psi_curve" in result.colnames
        assert "coadd_mean" in result.colnames
        assert "all_stamps" in result.colnames
        assert "sigma_g_res" in result.colnames
        assert result["all_stamps"].shape[1] == 8

    def test_evaluate_angle_trajectory(self):
        wcs = make_fake_wcs(200.0, -7.0, 96, 96, 1.0 / 3600.0)
        from kbmod_tpu.trajectory_utils import trajectory_predict_skypos

        coords = trajectory_predict_skypos(self.trj, wcs, [57130.0, 57131.0])
        v_ra = coords.ra_deg[1] - coords.ra_deg[0]
        v_dec = coords.dec_deg[1] - coords.dec_deg[0]
        result = self.explorer.evaluate_angle_trajectory(
            coords.ra_deg[0], coords.dec_deg[0], v_ra, v_dec, wcs
        )
        assert result["likelihood"][0] > 20.0

    def test_evaluate_around(self):
        result = self.explorer.evaluate_around_linear_trajectory(
            40, 50, 8.0, -4.0, pixel_radius=2, max_ang_offset=0.1, ang_step=0.1,
            max_vel_offset=2.0, vel_step=2.0,
        )
        assert len(result) > 0
        # The best neighborhood hit should be near the injected trajectory.
        best = int(np.argmax(result["likelihood"]))
        assert abs(result["x"][best] - 40) <= 2
        assert abs(result["y"][best] - 50) <= 2

    def test_refine(self):
        # Start from a slightly-off trajectory and refine back.
        refined = self.explorer.refine_linear_trajectory(
            41, 49, 7.0, -5.0, pixel_radius=4, max_dv=3.0, dv_steps=7, max_results=1
        )
        assert len(refined) == 1
        assert abs(refined["x"][0] - 40) <= 1
        assert abs(refined["y"][0] - 50) <= 1
        assert abs(refined["vx"][0] - 8.0) < 1.1
        assert abs(refined["vy"][0] + 4.0) < 1.1

    def test_refine_all_results(self):
        rough = Results.from_trajectories([Trajectory(x=41, y=49, vx=7.5, vy=-4.5, lh=10.0)])
        refined = refine_all_results(
            rough,
            self.ds.stack_py,
            SearchConfiguration.from_dict({"num_obs": 5}),
            pixel_radius=4,
            max_dv=2.0,
            dv_steps=5,
        )
        assert len(refined) == 1
        assert refined["likelihood"][0] > 20.0
