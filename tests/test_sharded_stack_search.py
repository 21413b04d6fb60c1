"""StackSearch multi-chip integration: with KB_SHARDED=1 on the 8-device
CPU mesh, search_all must reproduce the single-device results."""

import os

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.search import StackSearch, Trajectory


class TestShardedStackSearch:
    def test_matches_single_device(self, monkeypatch):
        times = create_fake_times(8, t0=57130.0, obs_per_day=4)
        ds = FakeDataSet(64, 64, times, use_seed=77)
        trj = Trajectory(x=30, y=30, vx=6.0, vy=-3.0, flux=400.0)
        ds.insert_object(trj)
        stack = ds.stack_py

        candidates = [
            Trajectory(vx=vx, vy=vy)
            for vx in np.linspace(4.0, 8.0, 5)
            for vy in np.linspace(-5.0, -1.0, 5)
        ]

        def run():
            search = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)
            search.set_min_obs(5)
            search.set_min_lh(1.0)
            search.search_all(candidates, True)
            return search.results.get_arrays()

        monkeypatch.setenv("KB_SHARDED", "0")
        single = run()
        monkeypatch.setenv("KB_SHARDED", "1")
        sharded = run()

        assert len(single["lh"]) == len(sharded["lh"])
        np.testing.assert_allclose(sharded["lh"], single["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(sharded["x"], single["x"])
        np.testing.assert_array_equal(sharded["vx"], single["vx"])
        # Both recover the object at the top.
        assert sharded["x"][0] == 30
        assert sharded["y"][0] == 30
