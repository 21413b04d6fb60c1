"""CLI smoke tests: run each console tool's main() on tiny data."""

import os
import sys
import tempfile
from unittest import mock

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_result_creator import make_fake_results
from kbmod_tpu.results import Results


def run_main(module, argv):
    with mock.patch.object(sys, "argv", ["prog"] + argv):
        module.main()


class TestCmdline:
    def test_version(self, capsys):
        from kbmod_tpu.cmdline import kbmod_version

        run_main(kbmod_version, [])
        assert "kbmod_tpu" in capsys.readouterr().out

    def test_create_test_data_and_search(self, capsys):
        from kbmod_tpu.cmdline import kbmod_create_test_data, kbmod_search

        with tempfile.TemporaryDirectory() as tmp:
            wu_path = os.path.join(tmp, "wu.fits")
            run_main(
                kbmod_create_test_data,
                [f"--outfile={wu_path}", "--num_times=6", "--width=64", "--height=64",
                 "--num_objects=1", "--flux=500", "--seed=42"],
            )
            assert os.path.exists(wu_path)

            out_path = os.path.join(tmp, "results.ecsv")
            config_path = os.path.join(tmp, "config.yaml")
            from kbmod_tpu.configuration import SearchConfiguration

            config = SearchConfiguration.from_dict(
                {
                    "generator_config": {
                        "name": "EclipticCenteredSearch",
                        "velocities": [0.0, 60.0, 9],
                        "angles": [-3.2, 3.2, 9],
                        "angle_units": "radian",
                        "given_ecliptic": 0.0,
                    },
                    "num_obs": 4,
                    "lh_level": 8.0,
                    "compute_ra_dec": False,
                }
            )
            config.to_file(config_path)
            run_main(kbmod_search, [f"--workunit={wu_path}", f"--outfile={out_path}", f"--config={config_path}"])
            assert os.path.exists(out_path)

    def test_stats_filter_strip_merge_migrate(self, capsys):
        from kbmod_tpu.cmdline import (
            kbmod_filter,
            kbmod_merge_results,
            kbmod_migrate_results,
            kbmod_stats,
            kbmod_strip_results,
        )

        rng = np.random.default_rng(3)
        with tempfile.TemporaryDirectory() as tmp:
            r1 = make_fake_results(6, 200, 200, 8, rng=rng)
            r2 = make_fake_results(6, 200, 200, 5, rng=rng)
            p1 = os.path.join(tmp, "r1.ecsv")
            p2 = os.path.join(tmp, "r2.ecsv")
            r1.write_table(p1)
            r2.write_table(p2)

            run_main(kbmod_stats, [f"--input={p1}"])
            assert "Rows: 8" in capsys.readouterr().out

            filt = os.path.join(tmp, "filtered.ecsv")
            run_main(kbmod_filter, [f"--input={p1}", f"--outfile={filt}", "--lh_level=30.0"])
            out = Results.read_table(filt)
            assert np.all(np.asarray(out["likelihood"]) >= 30.0)

            merged = os.path.join(tmp, "merged.ecsv")
            run_main(kbmod_merge_results, [p1, p2, f"--outfile={merged}", "--dup_thresh=1"])
            assert len(Results.read_table(merged)) <= 13

            stripped = os.path.join(tmp, "stripped.ecsv")
            run_main(kbmod_strip_results, [f"--input={p1}", f"--outfile={stripped}", "--cols=psi_curve,phi_curve"])
            out = Results.read_table(stripped)
            assert "psi_curve" not in out.colnames

            mig = os.path.join(tmp, "migrated.parquet")
            run_main(kbmod_migrate_results, [f"--input={p1}", f"--outfile={mig}"])
            assert len(Results.read_table(mig)) == 8


class TestMigrateResultsBatch:
    """The full reference migrate flow (kbmod_migrate_results.py:73-429):
    directory batch, image-column reshape, aux-file split, validation,
    atomic replace, audit CSVs, dry-run and skip logic."""

    def _legacy_file(self, tmp, name, n=6, dim=5):
        rng = np.random.default_rng(hash(name) % 2**31)
        res = make_fake_results(4, 100, 100, n, rng=rng)
        # A legacy flattened stamp column: (N, dim*dim).
        res.table["coadd_mean"] = rng.normal(0, 1, (n, dim * dim)).astype(np.float32)
        path = os.path.join(tmp, name)
        res.write_table(path)
        return path

    def test_directory_batch_migration(self, capsys):
        import csv as _csv

        from kbmod_tpu.cmdline import kbmod_migrate_results as mig

        with tempfile.TemporaryDirectory() as tmp:
            p1 = self._legacy_file(tmp, "a.search.parquet")
            p2 = self._legacy_file(tmp, "b.search.parquet", n=4)
            self._legacy_file(tmp, "unrelated.parquet")  # not matched by glob
            out_dir = os.path.join(tmp, "staging")
            run_main(mig, [
                f"--input={tmp}", "--image-columns", "*coadd*",
                "--stamp-dim=5", f"--output-dir={out_dir}",
            ])
            out = capsys.readouterr().out
            assert "Migrated 2 file(s)" in out

            # Originals replaced: main files lost the coadd column, aux
            # side files hold it reshaped, metadata records the shape.
            for p, n in ((p1, 6), (p2, 4)):
                main = Results.read_table(p)
                assert "coadd_mean" not in main.colnames
                assert len(main) == n
                aux = p.replace(".search.parquet", ".search_coadd_mean.parquet")
                assert os.path.exists(aux)
            # Audit CSV has one row per migrated file.
            with open(os.path.join(out_dir, "migration_mapping.csv")) as f:
                rows = list(_csv.reader(f))
            assert len(rows) == 3  # header + 2
            assert all(r[-1] == "migrated" for r in rows[1:])

    def test_reshape_and_reload_roundtrip(self):
        from kbmod_tpu.cmdline import kbmod_migrate_results as mig

        with tempfile.TemporaryDirectory() as tmp:
            p = self._legacy_file(tmp, "c.search.parquet", n=3, dim=7)
            flat = np.asarray(Results.read_table(p).table["coadd_mean"])
            run_main(mig, [f"--input={p}", "--image-columns", "*coadd*", "--stamp-dim=7"])
            aux = p.replace(".search.parquet", ".search_coadd_mean.parquet")
            from kbmod_tpu.results import Results as R

            main = R.read_table(p)
            main.load_column(aux, "coadd_mean")
            got = np.asarray(main.table["coadd_mean"])
            assert got.shape == (3, 7, 7)
            np.testing.assert_allclose(got.reshape(3, 49), flat)

    def test_dry_run_and_skip_with_aux(self, capsys):
        from kbmod_tpu.cmdline import kbmod_migrate_results as mig

        with tempfile.TemporaryDirectory() as tmp:
            p = self._legacy_file(tmp, "d.search.parquet")
            before = open(p, "rb").read()
            run_main(mig, [f"--input={p}", "--image-columns", "*coadd*",
                           "--stamp-dim=5", "--dry-run"])
            assert "Would migrate 1" in capsys.readouterr().out
            assert open(p, "rb").read() == before  # untouched

            # Real migration, then a second run skips (aux files exist).
            run_main(mig, [f"--input={p}", "--image-columns", "*coadd*", "--stamp-dim=5"])
            capsys.readouterr()
            run_main(mig, [f"--input={p}", "--image-columns", "*coadd*", "--stamp-dim=5"])
            assert "skipped 1" in capsys.readouterr().out

    def test_bad_stamp_dim_fails_cleanly(self, capsys):
        from kbmod_tpu.cmdline import kbmod_migrate_results as mig

        with tempfile.TemporaryDirectory() as tmp:
            p = self._legacy_file(tmp, "e.search.parquet", dim=5)
            before = open(p, "rb").read()
            run_main(mig, [f"--input={p}", "--image-columns", "*coadd*", "--stamp-dim=9"])
            out = capsys.readouterr().out
            assert "failed 1" in out
            assert open(p, "rb").read() == before  # original intact


class TestResultMatcherBatch:
    """The reference result-matcher flow (kbmod_result_matcher.py):
    glob batch, reflex-corrected ephemeris cache, CSV manifest with
    matched_obs/obs_ratio, exceptions CSV."""

    def _results_file(self, tmp, name, wcs, n=5, num_times=6):
        rng = np.random.default_rng(11)
        res = make_fake_results(num_times, 64, 64, n, rng=rng)
        res.wcs = wcs
        path = os.path.join(tmp, name)
        res.write_table(path)
        return path, res

    def test_glob_batch_manifest(self, capsys):
        import csv as _csv

        from kbmod_tpu.cmdline import kbmod_result_matcher as matcher
        from kbmod_tpu.wcs_utils import make_fake_wcs
        from kbmod_tpu.io import table_io
        from kbmod_tpu.table import Table

        wcs = make_fake_wcs(25.0, -10.0, 64, 64, deg_per_pixel=0.01)
        with tempfile.TemporaryDirectory() as tmp:
            p1, res = self._results_file(tmp, "a.results.parquet", wcs)
            self._results_file(tmp, "b.results.parquet", wcs)

            # Ephemeris following row 0's trajectory exactly.
            times = np.asarray(res.mjd_mid)
            t0 = times - times[0]
            row = res.table
            xs = np.asarray(row["x"])[0] + np.asarray(row["vx"])[0] * t0
            ys = np.asarray(row["y"])[0] + np.asarray(row["vy"])[0] * t0
            ra, dec = wcs.pixel_to_world_values(xs, ys)
            ephem = Table({
                "Name": np.array(["obj0"] * len(times), dtype=object),
                "RA": ra, "Dec": dec, "mjd_mid": times,
            })
            eph_path = os.path.join(tmp, "ephem.ecsv")
            table_io.write_table(ephem, eph_path)

            out_dir = os.path.join(tmp, "out")
            run_main(matcher, [
                "--results_glob", os.path.join(tmp, "*.results.parquet"),
                "--ephem", eph_path, "--output", out_dir,
                "--sep_thresh", "5.0", "--time_thresh_s", "600", "--min_obs", "2",
            ])
            out = capsys.readouterr().out
            assert "match rows for 2 file(s)" in out

            with open(os.path.join(out_dir, "matching_results.csv")) as f:
                rows = list(_csv.DictReader(f))
            assert len(rows) >= 1
            assert any(r["name"] == "obj0" and r["results_file"] == p1 for r in rows)
            r0 = [r for r in rows if r["results_file"] == p1][0]
            assert int(r0["matched_obs"]) >= 2
            assert 0 < float(r0["obs_ratio"]) <= 1.0
            # The zero-distance ephemeris cache was written.
            assert os.path.exists(os.path.join(out_dir, "ephem_0.0.parquet"))
            assert not os.path.exists(os.path.join(out_dir, "exceptions.csv"))

    def test_exceptions_csv_for_bad_file(self, capsys):
        from kbmod_tpu.cmdline import kbmod_result_matcher as matcher
        from kbmod_tpu.io import table_io
        from kbmod_tpu.table import Table

        with tempfile.TemporaryDirectory() as tmp:
            bad = os.path.join(tmp, "broken.results.parquet")
            with open(bad, "w") as f:
                f.write("not a parquet file")
            ephem = Table({
                "Name": np.array(["x"], dtype=object),
                "RA": np.array([10.0]), "Dec": np.array([5.0]),
                "mjd_mid": np.array([57130.0]),
            })
            eph_path = os.path.join(tmp, "ephem.ecsv")
            table_io.write_table(ephem, eph_path)
            out_dir = os.path.join(tmp, "out")
            run_main(matcher, ["--results", bad, "--ephem", eph_path, "--output", out_dir])
            assert os.path.exists(os.path.join(out_dir, "exceptions.csv"))

    def test_reflex_corrected_cache(self):
        from kbmod_tpu.cmdline.kbmod_result_matcher import reflex_correct_ephem_table
        from kbmod_tpu.table import Table

        ephem = Table({
            "Name": np.array(["o"] * 3, dtype=object),
            "RA": np.array([150.0, 150.1, 150.2]),
            "Dec": np.array([-5.0, -5.0, -5.0]),
            "mjd_mid": np.array([60000.0, 60000.3, 60000.6]),
        })
        out = reflex_correct_ephem_table(ephem, 30.0)
        assert "ra_30.0" in out.colnames
        # Reflex correction at 30 AU moves positions measurably (arcsec+)
        # but far less than a degree.
        d = np.abs(np.asarray(out["ra_30.0"]) - np.asarray(out["RA"]))
        assert np.all(d > 1e-5) and np.all(d < 0.5)


class TestRegionSearcherCli:
    """The reference region-searcher flow (region_searcher.py:223-333):
    patch sweep, per-patch collection export with recycling, error CSV,
    and the per-patch analysis table."""

    def test_full_flow(self, tmp_path, capsys):
        import csv as _csv

        from test_standardizers import write_rubin_style_fits
        from kbmod_tpu.cmdline import region_searcher as rs_tool
        from kbmod_tpu.image_collection import ImageCollection

        # Two sky clusters of images -> at least two matched patches.
        paths = []
        for i in range(3):
            paths.append(write_rubin_style_fits(
                str(tmp_path / f"a{i}.fits"), seed=i, mjd=57130.0 + 0.05 * i,
                ra=200.0, dec=-7.0))
        for i in range(2):
            paths.append(write_rubin_style_fits(
                str(tmp_path / f"b{i}.fits"), seed=10 + i, mjd=57131.0 + 0.05 * i,
                ra=210.0, dec=-7.0))
        ic = ImageCollection.fromTargets(paths)
        ic_path = str(tmp_path / "base.collection")
        ic.write(ic_path)

        out_dir = str(tmp_path / "out")
        argv = [
            "--ic-path", ic_path, "--guess-distances", "0.0",
            "--patch-side-len", "120", "--pixel-scale", "0.26",
            "--bands-to-drop", "u", "--max-wcs-err", "60.0",
            "--out-dir", out_dir,
        ]
        run_main(rs_tool, argv)
        out = capsys.readouterr().out
        assert "Finished!" in out

        tag_dir = os.path.join(out_dir, "0.0_120X120")
        collections = [f for f in os.listdir(tag_dir) if f.endswith(".collection")]
        assert len(collections) >= 2
        # Analysis table sorted by overlap with the expected columns.
        with open(os.path.join(tag_dir, "overlap_0.0_120X120.csv")) as f:
            rows = list(_csv.reader(f))
        assert rows[0] == ["patch_id", "overlap_deg2", "visit_count", "unique_mjds", "obs_nights_spanned"]
        overlaps = [float(r[1]) for r in rows[1:]]
        assert overlaps == sorted(overlaps, reverse=True)
        assert os.path.exists(os.path.join(tag_dir, "errors.csv"))

        # A patch collection reloads and carries the overlap column + meta.
        sub = ImageCollection.read(os.path.join(tag_dir, collections[0]))
        assert "overlap_deg" in sub.columns
        assert "patch_id" in sub.data.meta

        # Second run recycles everything from disk.
        run_main(rs_tool, argv)
        assert "Recycled" in capsys.readouterr().out
