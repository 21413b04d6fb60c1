"""Results table tests (modeled on the reference's tests/test_results.py)."""

import os
import tempfile

import numpy as np
import pytest

from kbmod_tpu.results import Results, write_results_to_files_destructive
from kbmod_tpu.search import Trajectory


def make_trajectories(n=10):
    return [
        Trajectory(x=i, y=2 * i, vx=0.5 * i, vy=-0.5 * i, flux=10.0 * i, lh=100.0 - i, obs_count=5 + i)
        for i in range(n)
    ]


class TestResultsBasics:
    def test_empty(self):
        r = Results()
        assert len(r) == 0
        assert "x" in r.colnames
        assert "uuid" in r.colnames

    def test_from_trajectories(self):
        r = Results.from_trajectories(make_trajectories(5))
        assert len(r) == 5
        assert np.array_equal(r["x"], [0, 1, 2, 3, 4])
        assert np.array_equal(r["likelihood"], [100.0, 99.0, 98.0, 97.0, 96.0])
        assert len(set(r["uuid"])) == 5

    def test_missing_required_column(self):
        with pytest.raises(KeyError):
            Results({"x": [1], "y": [2]})

    def test_make_trajectory_list(self):
        r = Results.from_trajectories(make_trajectories(4))
        trjs = r.make_trajectory_list()
        assert len(trjs) == 4
        assert trjs[2].x == 2
        assert trjs[2].lh == 98.0

    def test_sort(self):
        r = Results.from_trajectories(make_trajectories(5))
        r.sort("likelihood", descending=False)
        assert r["likelihood"][0] == 96.0
        r.sort("likelihood", descending=True)
        assert r["likelihood"][0] == 100.0

    def test_extend(self):
        r1 = Results.from_trajectories(make_trajectories(3))
        r2 = Results.from_trajectories(make_trajectories(2))
        r1.extend(r2)
        assert len(r1) == 5


class TestPsiPhiData:
    def test_add_psi_phi_updates_stats(self):
        r = Results.from_trajectories(make_trajectories(3))
        psi = np.array([[1.0, 1.0, 1.0], [2.0, 2.0, 2.0], [0.0, 0.0, 0.0]])
        phi = np.array([[1.0, 1.0, 1.0], [1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
        r.add_psi_phi_data(psi, phi)
        np.testing.assert_allclose(r["likelihood"], [3.0 / np.sqrt(3.0), 6.0 / np.sqrt(3.0), 0.0])
        np.testing.assert_allclose(r["flux"], [1.0, 2.0, 0.0])
        assert np.array_equal(r["obs_count"], [3, 3, 3])

    def test_obs_valid_updates(self):
        r = Results.from_trajectories(make_trajectories(2))
        psi = np.array([[1.0, 2.0, 3.0], [1.0, 1.0, 1.0]])
        phi = np.ones((2, 3))
        valid = np.array([[True, False, True], [False, False, False]])
        r.add_psi_phi_data(psi, phi)
        r.update_obs_valid(valid)
        # The second row has no valid observations and is dropped.
        assert len(r) == 1
        assert r["obs_count"][0] == 2
        np.testing.assert_allclose(r["likelihood"][0], 4.0 / np.sqrt(2.0))
        assert r.filtered_stats["no valid observations"] == 1

    def test_compute_likelihood_curves(self):
        r = Results.from_trajectories(make_trajectories(2))
        psi = np.array([[1.0, 2.0, np.nan], [4.0, 1.0, 1.0]])
        phi = np.array([[1.0, 0.0, 1.0], [4.0, 1.0, 1.0]])
        r.add_psi_phi_data(np.nan_to_num(psi), phi)
        r.table["psi_curve"] = psi
        lh = r.compute_likelihood_curves(filter_obs=False)
        assert lh[0, 1] == 0.0  # phi == 0 -> masked
        assert lh[0, 2] == 0.0  # nan psi -> masked
        np.testing.assert_allclose(lh[1], [2.0, 1.0, 1.0])


class TestFiltering:
    def test_filter_rows_mask_and_stats(self):
        r = Results.from_trajectories(make_trajectories(6))
        r.filter_rows(np.array([True, False, True, False, True, False]), "parity")
        assert len(r) == 3
        assert r.filtered_stats["parity"] == 3

    def test_filter_rows_indices(self):
        r = Results.from_trajectories(make_trajectories(6))
        r.filter_rows(np.array([0, 2, 4]), "keep_even")
        assert len(r) == 3
        assert np.array_equal(r["x"], [0, 2, 4])

    def test_track_and_revert(self):
        r = Results.from_trajectories(make_trajectories(6), track_filtered=True)
        r.filter_rows(np.array([True] * 3 + [False] * 3), "tail")
        assert len(r) == 3
        filtered = r.get_filtered("tail")
        assert len(filtered) == 3
        r.revert_filter("tail", add_column="reason")
        assert len(r) == 6
        assert set(r["reason"][-3:]) == {"tail"}

    def test_revert_without_tracking_raises(self):
        r = Results.from_trajectories(make_trajectories(3))
        r.filter_rows(np.array([True, False, True]), "f")
        with pytest.raises(ValueError):
            r.revert_filter("f")


class TestResultsIO:
    @pytest.mark.parametrize("suffix", [".ecsv", ".parquet", ".hdf5"])
    def test_roundtrip(self, suffix):
        r = Results.from_trajectories(make_trajectories(5))
        r.table["psi_curve"] = np.arange(15.0).reshape(5, 3).astype(np.float32)
        r.set_mjd_utc_mid(np.array([57130.0, 57130.1, 57130.2]))
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, f"results{suffix}")
            r.write_table(path)
            r2 = Results.read_table(path)
            assert len(r2) == 5
            np.testing.assert_allclose(r2["likelihood"], r["likelihood"])
            np.testing.assert_allclose(r2["psi_curve"], r["psi_curve"])
            np.testing.assert_allclose(r2.mjd_mid, r.mjd_mid)
            assert list(r2["uuid"]) == list(r["uuid"])

    def test_image_column_roundtrip(self):
        r = Results.from_trajectories(make_trajectories(4))
        r.table["stamp"] = np.random.default_rng(5).normal(size=(4, 7, 7)).astype(np.float32)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "results.parquet")
            r.write_table(path)
            r2 = Results.read_table(path)
            assert r2["stamp"].shape == (4, 7, 7)
            np.testing.assert_allclose(r2["stamp"], r["stamp"])

    def test_destructive_write_with_side_files(self):
        r = Results.from_trajectories(make_trajectories(4))
        r.table["all_stamps"] = np.random.default_rng(6).normal(size=(4, 2, 5, 5)).astype(np.float32)
        r.table["junk"] = np.arange(4)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "results.ecsv")
            write_results_to_files_destructive(
                path, r, separate_col_files=["all_stamps"], drop_columns=["junk"]
            )
            assert os.path.exists(os.path.join(tmp, "results_all_stamps.ecsv"))
            assert "all_stamps" not in r.colnames
            assert "junk" not in r.colnames
            r2 = Results.read_table(path, load_aux_files=True)
            assert "all_stamps" in r2.colnames
            assert r2["all_stamps"].shape == (4, 2, 5, 5)

    def test_chunked_read(self):
        r = Results.from_trajectories(make_trajectories(10))
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "results.parquet")
            r.write_table(path)
            chunks = list(Results.read_table_chunks(path, chunk_size=4))
            assert [len(c) for c in chunks] == [4, 4, 2]
            np.testing.assert_allclose(chunks[0]["likelihood"], r["likelihood"][:4])

    def test_filtered_stats_file(self):
        r = Results.from_trajectories(make_trajectories(5))
        r.filter_rows(np.array([True, True, False, False, False]), "lh")
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "stats.csv")
            r.write_filtered_stats(path)
            text = open(path).read()
            assert "unfiltered,2" in text
            assert "lh,3" in text


def _trajectories(n=10):
    return [
        Trajectory(x=i, y=i + 0, vx=float(i), vy=0.5 * i, lh=100.0 + i, flux=25.0 * i, obs_count=i)
        for i in range(n)
    ]


class TestResultsConstruction:
    def _input_dict(self, n=10):
        trjs = _trajectories(n)
        return {
            "x": [t.x for t in trjs],
            "y": [t.y for t in trjs],
            "vx": [t.vx for t in trjs],
            "vy": [t.vy for t in trjs],
            "likelihood": [t.lh for t in trjs],
            "flux": [t.flux for t in trjs],
            "obs_count": [t.obs_count for t in trjs],
        }

    def test_from_dict(self):
        d = self._input_dict()
        d["something_added"] = list(range(10))
        missing = {k: v for k, v in d.items() if k != "x"}
        with pytest.raises(KeyError):
            Results(missing)
        r = Results(d)
        assert len(r) == 10
        assert "something_added" in r.colnames
        np.testing.assert_array_equal(r["x"], d["x"])

    def test_copy_is_deep(self):
        r = Results.from_trajectories(_trajectories(5))
        dup = r.copy()
        dup.table["x"][0] = 99
        assert r["x"][0] == 0

    def test_remove_column(self):
        d = self._input_dict()
        d["something_added"] = list(range(10))
        r = Results(d)
        with pytest.raises(KeyError):
            r.remove_column("missing_column")
        r.remove_column("something_added")
        assert "something_added" not in r.colnames
        with pytest.raises(KeyError):
            r.remove_column("x")

    def test_extend_mismatched_raises(self):
        r1 = Results.from_trajectories(_trajectories(5))
        d = self._input_dict(5)
        d["something_added"] = list(range(5))
        with pytest.raises(ValueError):
            r1.extend(Results(d))

    def test_extend_from_empty(self):
        r1 = Results.from_trajectories(_trajectories(5))
        r4 = Results()
        r4.extend(r1)
        assert len(r4) == len(r1)
        np.testing.assert_array_equal(r4["x"], r1["x"])


class TestResultsValues:
    def test_is_empty_value(self):
        r = Results.from_trajectories(_trajectories(10))
        r.table["nums"] = list(range(10))
        pairs = [(i, i + 1) for i in range(10)]
        pairs[1] = None
        pairs[3] = ()
        pairs[7] = ()
        r.table["pairs"] = pairs
        assert not np.any(r.is_empty_value("nums"))
        expected = np.zeros(10, dtype=bool)
        expected[[1, 3, 7]] = True
        np.testing.assert_array_equal(r.is_empty_value("pairs"), expected)

    def test_filter_empty_table(self):
        r = Results.from_trajectories([])
        assert len(r) == 0
        r.filter_rows([], "empty_test")
        assert len(r) == 0
        assert "empty_test" in r.filtered_stats

    def test_extend_with_filtered(self):
        trjs = _trajectories(10)
        r1 = Results.from_trajectories(trjs, track_filtered=True)
        for t in trjs:
            t.x += 10
        r2 = Results.from_trajectories(trjs, track_filtered=True)

        r1.filter_rows([1, 3, 4, 5, 6, 7, 8, 9], label="filter1")
        r1.filter_rows([1, 2, 3, 4, 7], label="filter2")
        r2.filter_rows([1, 3, 4, 5, 6, 7, 8], label="filter1")
        r2.filter_rows([1], label="filter3")

        r1.extend(r2)
        assert len(r1) == 6
        assert r1.filtered_stats["filter1"] == 5
        assert r1.filtered_stats["filter2"] == 3
        assert r1.filtered_stats["filter3"] == 6
        assert len(r1.get_filtered("filter1")) == 5
        assert len(r1.get_filtered("filter2")) == 3
        assert len(r1.get_filtered("filter3")) == 6


class TestResultsIOEdges:
    def test_empty_roundtrip(self, tmp_path):
        r = Results()
        path = str(tmp_path / "empty.ecsv")
        r.write_table(path)
        back = Results.read_table(path)
        assert len(back) == 0

    def test_chunked_read_errors(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            list(Results.read_table_chunks(str(tmp_path / "nope.parquet")))
        bad = tmp_path / "results.xyz"
        bad.write_text("junk")
        with pytest.raises(ValueError):
            list(Results.read_table_chunks(str(bad)))

    def test_write_and_load_column(self, tmp_path):
        r = Results.from_trajectories(_trajectories(6))
        base = str(tmp_path / "res.ecsv")
        r.write_table(base)
        extra = np.arange(6.0)
        r.table["extra"] = extra
        r.write_column("extra", str(tmp_path / "extra.npy"))

        fresh = Results.read_table(base)
        assert "extra" not in fresh.colnames
        fresh.load_column(str(tmp_path / "extra.npy"), "extra")
        np.testing.assert_allclose(fresh["extra"], extra)


def test_extend_batches_matches_extend():
    from kbmod_tpu.search import Trajectory

    def mk(n, start=0, track=False):
        trjs = [Trajectory(x=start + i, y=2 * i, vx=1.0, vy=-1.0, flux=10.0 * i, lh=5.0 + i, obs_count=7)
                for i in range(n)]
        return Results.from_trajectories(trjs, track_filtered=track)

    batches_a = [mk(4), mk(0), mk(3, start=100)]
    batches_b = [mk(4), mk(0), mk(3, start=100)]
    # A batch whose rows were all filtered away still carries its stats.
    batches_a[1].filtered_stats["sigma-g"] = 11
    batches_b[1].filtered_stats["sigma-g"] = 11

    one = mk(0)
    for b in batches_a:
        one.extend(b)
    many = mk(0)
    many.extend_batches(batches_b)

    assert len(one) == len(many) == 7
    np.testing.assert_array_equal(np.asarray(one["x"]), np.asarray(many["x"]))
    assert one.filtered_stats == many.filtered_stats


def test_extend_batches_tracked_filtered():
    from kbmod_tpu.search import Trajectory

    trjs = [Trajectory(x=i, y=i, vx=1.0, vy=1.0, flux=1.0, lh=float(i), obs_count=5) for i in range(6)]
    b1 = Results.from_trajectories(trjs[:3], track_filtered=True)
    b1.filter_rows(np.array([True, False, True]), "cut")
    b2 = Results.from_trajectories(trjs[3:], track_filtered=True)
    b2.filter_rows(np.array([False, True, True]), "cut")
    acc = Results(track_filtered=True)
    acc.extend_batches([b1, b2])
    assert len(acc) == 4
    assert len(acc.get_filtered("cut")) == 2
