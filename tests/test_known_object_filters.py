"""Known-object matching tests (modeled on the reference's
tests/test_known_object_filters.py)."""

import numpy as np

from kbmod_tpu.filters.known_object_filters import KnownObjsMatcher
from kbmod_tpu.results import Results
from kbmod_tpu.search import Trajectory
from kbmod_tpu.table import Table
from kbmod_tpu.wcs_utils import make_fake_wcs


def make_setup():
    """A results set with one trajectory matching a catalog object."""
    wcs = make_fake_wcs(200.0, -7.0, 500, 500, 1.0 / 3600.0)
    obstimes = 57130.0 + np.arange(5) * 0.1

    # A result trajectory starting at pixel (250, 250).
    trj = Trajectory(x=250, y=250, vx=10.0, vy=5.0, flux=100.0, lh=50.0, obs_count=5)
    results = Results.from_trajectories([trj, Trajectory(x=10, y=10, vx=-5.0, vy=0.0, lh=20.0, obs_count=5)])
    results.table["obs_valid"] = np.ones((2, 5), dtype=bool)

    # Catalog: object A follows the first trajectory exactly; object B far away.
    from kbmod_tpu.trajectory_utils import trajectory_predict_skypos

    coords = trajectory_predict_skypos(trj, wcs, obstimes)
    catalog = Table(
        {
            "Name": np.array(["A"] * 5 + ["B"] * 2, dtype=object),
            "RA": np.concatenate([coords.ra_deg, [210.0, 210.1]]),
            "DEC": np.concatenate([coords.dec_deg, [-10.0, -10.1]]),
            "mjd_mid": np.concatenate([obstimes, obstimes[:2]]),
        }
    )
    return wcs, obstimes, results, catalog


class TestKnownObjsMatcher:
    def test_match(self):
        wcs, obstimes, results, catalog = make_setup()
        matcher = KnownObjsMatcher(catalog, obstimes, "known", sep_thresh=2.0, time_thresh_s=600.0)
        matcher.match(results, wcs)
        assert "known" in results.colnames
        assert "A" in results["known"][0]
        assert np.count_nonzero(results["known"][0]["A"]) == 5
        assert results["known"][1] == {}

    def test_mark_matched_obs_invalid(self):
        wcs, obstimes, results, catalog = make_setup()
        matcher = KnownObjsMatcher(catalog, obstimes, "known", sep_thresh=2.0)
        matcher.match(results, wcs)
        matcher.mark_matched_obs_invalid(results, drop_empty_rows=True)
        # The matching result loses all its observations and is dropped.
        assert len(results) == 1
        assert results["x"][0] == 10

    def test_match_on_min_obs_and_filter(self):
        wcs, obstimes, results, catalog = make_setup()
        matcher = KnownObjsMatcher(catalog, obstimes, "known", sep_thresh=2.0)
        matcher.match(results, wcs)
        matcher.match_on_min_obs(results, 3)
        col = matcher.match_min_obs_col(3)
        assert col in results.colnames
        assert results[col][0] == ["A"]
        assert results[col][1] == []

        recovered, missed = matcher.get_recovered_objects(results, col)
        assert recovered == {"A"}
        assert missed == {"B"}

        matcher.filter_matches(results, col)
        assert len(results) == 1
        assert results["x"][0] == 10

    def test_time_thresh(self):
        wcs, obstimes, results, catalog = make_setup()
        # Shift the catalog times out of the window.
        catalog["mjd_mid"] = np.asarray(catalog["mjd_mid"], dtype=float) + 0.02  # ~29 min
        matcher = KnownObjsMatcher(catalog, obstimes, "known", sep_thresh=2.0, time_thresh_s=600.0)
        matcher.match(results, wcs)
        assert results["known"][0] == {}


def test_to_skycoords(make_matcher=None):
    import numpy as np
    from kbmod_tpu.filters.known_object_filters import KnownObjsMatcher
    from kbmod_tpu.table import Table

    data = Table({
        "Name": ["a", "b"],
        "RA": [200.0, 201.0],
        "DEC": [-7.0, -6.5],
        "mjd_mid": [57130.0, 57130.0],
    })
    m = KnownObjsMatcher(data, [57130.0], matcher_name="m")
    sc = m.to_skycoords()
    np.testing.assert_allclose(np.asarray(sc.ra_deg, dtype=float), [200.0, 201.0])
    np.testing.assert_allclose(np.asarray(sc.dec_deg, dtype=float), [-7.0, -6.5])
