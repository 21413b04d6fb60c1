"""Trajectory / TrajectoryList behavior tests (modeled on the reference's
tests/test_trajectory_list.py and common.h semantics)."""

import numpy as np
import pickle

from kbmod_tpu.search import (
    Trajectory,
    TrajectoryList,
    extract_all_trajectory_x,
    extract_all_trajectory_lh,
)


class TestTrajectory:
    def test_default(self):
        t = Trajectory()
        assert t.x == 0 and t.y == 0 and t.vx == 0.0 and t.vy == 0.0
        assert t.lh == 0.0 and t.flux == 0.0 and t.obs_count == 0

    def test_prediction_centered(self):
        t = Trajectory(x=10, y=20, vx=2.0, vy=-1.0)
        # floor(x + vx*t + 0.5)
        assert t.get_x_index(0.0) == 10
        assert t.get_y_index(0.0) == 20
        assert t.get_x_index(1.0) == 12
        assert t.get_y_index(1.0) == 19
        assert t.get_x_index(0.4) == 11  # 10 + 0.8 + 0.5 = 11.3
        assert np.isclose(t.get_x_pos(1.0), 12.5)
        assert np.isclose(t.get_x_pos(1.0, centered=False), 12.0)

    def test_is_valid_and_clear(self):
        t = Trajectory(x=1, y=2, vx=3.0, vy=4.0, flux=5.0, lh=6.0, obs_count=7)
        assert t.is_valid()
        t.lh = float("nan")
        assert not t.is_valid()
        t.clear()
        assert t.x == 0 and t.lh == 0.0

    def test_pickle(self):
        t = Trajectory(x=1, y=2, vx=3.0, vy=4.0, flux=5.0, lh=6.0, obs_count=7)
        t2 = pickle.loads(pickle.dumps(t))
        assert t == t2


class TestTrajectoryList:
    def _make(self):
        return TrajectoryList(
            [
                Trajectory(x=0, y=0, lh=5.0, obs_count=10),
                Trajectory(x=1, y=1, lh=100.0, obs_count=3),
                Trajectory(x=2, y=2, lh=-1.0, obs_count=8),
                Trajectory(x=3, y=3, lh=50.0, obs_count=12),
            ]
        )

    def test_size_and_access(self):
        tl = self._make()
        assert tl.get_size() == 4
        assert tl.get_trajectory(1).lh == 100.0
        tl.set_trajectory(0, Trajectory(x=9, lh=1.0))
        assert tl.get_trajectory(0).x == 9

    def test_sort(self):
        tl = self._make()
        tl.sort_by_likelihood()
        lhs = [t.lh for t in tl.get_list()]
        assert lhs == sorted(lhs, reverse=True)

    def test_filters(self):
        tl = self._make()
        tl.filter_by_likelihood(5.0)
        assert tl.get_size() == 3  # drops lh=-1
        tl.filter_by_obs_count(10)
        assert tl.get_size() == 2

    def test_batch_and_resize(self):
        tl = self._make()
        batch = tl.get_batch(1, 2)
        assert len(batch) == 2
        assert batch[0].lh == 100.0
        tl.resize(2)
        assert tl.get_size() == 2
        tl.resize(5)
        assert tl.get_size() == 5
        assert tl.get_trajectory(4).lh == 0.0

    def test_extract(self):
        tl = self._make()
        assert extract_all_trajectory_x(tl) == [0, 1, 2, 3]
        assert extract_all_trajectory_lh(tl) == [5.0, 100.0, -1.0, 50.0]
        # Also works on plain lists of Trajectory.
        assert extract_all_trajectory_x(tl.get_list()) == [0, 1, 2, 3]
