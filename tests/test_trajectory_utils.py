"""trajectory_utils tests (modeled on the reference's
tests/test_trajectory_utils.py)."""

import numpy as np

from kbmod_tpu.search import Trajectory
from kbmod_tpu.results import Results
from kbmod_tpu.trajectory_utils import (
    predict_pixel_locations,
    fit_trajectory_from_pixels,
    evaluate_trajectory_mse,
    find_closest_trajectory,
    find_closest_velocity,
    match_trajectory_sets,
    trajectory_results_best_match,
    make_trajectory_from_ra_dec,
    trajectory_predict_skypos,
)
from kbmod_tpu.wcs_utils import make_fake_wcs


class TestPredict:
    def test_basic(self):
        pos = predict_pixel_locations([0.0, 1.0, 2.0], [5, 10], [1.0, -2.0])
        assert pos.shape == (2, 3)
        np.testing.assert_array_equal(pos[0], [5, 6, 7])
        np.testing.assert_array_equal(pos[1], [10, 8, 6])

    def test_truncation_semantics(self):
        # astype(int) truncates toward zero (matching the reference).
        pos = predict_pixel_locations([0.3], [0], [-2.0], centered=False)
        assert pos[0, 0] == 0  # -0.6 -> 0 via int cast

    def test_float(self):
        pos = predict_pixel_locations([0.5], [3], [1.0], centered=True, as_int=False)
        np.testing.assert_allclose(pos[0], [4.0])


class TestFitting:
    def test_fit_and_mse(self):
        times = np.array([0.0, 1.0, 2.0, 3.0])
        x_vals = 10.5 + 2.0 * times
        y_vals = 20.5 - 1.0 * times
        trj = fit_trajectory_from_pixels(x_vals, y_vals, times)
        assert trj.x == 10
        assert trj.y == 20
        assert np.isclose(trj.vx, 2.0)
        assert np.isclose(trj.vy, -1.0)
        assert evaluate_trajectory_mse(trj, x_vals, y_vals, times) < 1e-10


class TestMatching:
    def test_closest_trajectory_and_velocity(self):
        trjs = [
            Trajectory(x=0, y=0, vx=1.0, vy=0.0),
            Trajectory(x=100, y=100, vx=5.0, vy=5.0),
            Trajectory(x=2, y=1, vx=1.1, vy=0.1),
        ]
        query = Trajectory(x=1, y=1, vx=1.0, vy=0.0)
        idx, dist = find_closest_trajectory(query, trjs, times=[0.0, 1.0])
        # trjs[2] starts 1 px away (mean path distance ~1.05) vs trjs[0]'s
        # constant sqrt(2); the far trajectory is never chosen.
        assert idx == 2
        assert dist < 1.5
        assert find_closest_velocity(query, trjs) == 0

    def test_match_sets(self):
        base = [
            Trajectory(x=10, y=10, vx=1.0, vy=1.0),
            Trajectory(x=200, y=200, vx=-3.0, vy=0.0),
            Trajectory(x=400, y=100, vx=0.0, vy=5.0),
        ]
        queries = [
            Trajectory(x=11, y=10, vx=1.0, vy=1.0),  # matches 0
            Trajectory(x=800, y=800, vx=0.0, vy=0.0),  # no match
        ]
        matches = match_trajectory_sets(queries, base, threshold=5.0, times=[0.0, 1.0])
        assert matches[0] == 0
        assert matches[1] == -1

    def test_best_match_results(self):
        results = Results.from_trajectories(
            [Trajectory(x=10, y=10, vx=1.0, vy=1.0), Trajectory(x=50, y=60, vx=0.0, vy=0.0)]
        )
        best_dist, best_match = trajectory_results_best_match(
            [Trajectory(x=49, y=60, vx=0.0, vy=0.0)], results, times=[0.0, 1.0]
        )
        assert best_match[0] == 1
        assert best_dist[0] < 2.0


class TestSkyConversions:
    def test_roundtrip_through_wcs(self):
        wcs = make_fake_wcs(150.0, 2.0, 1000, 1000, 0.5 / 3600.0)
        trj = make_trajectory_from_ra_dec(150.0, 2.0, 1e-5, 1e-5, wcs)
        coords = trajectory_predict_skypos(trj, wcs, [57130.0, 57131.0])
        assert np.isclose(coords.ra_deg[0], 150.0, atol=1e-3)
        assert np.isclose(coords.dec_deg[0], 2.0, atol=1e-3)
