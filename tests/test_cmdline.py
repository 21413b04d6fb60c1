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
