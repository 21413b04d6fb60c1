"""The docs/examples walkthroughs must actually run (they are the
tutorial-notebook equivalents; reference ships ~20 notebooks)."""

import pathlib
import runpy

import matplotlib
import pytest

matplotlib.use("Agg")

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "docs" / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path):
    runpy.run_path(str(path), run_name="__main__")
