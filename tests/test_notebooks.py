"""The committed notebooks/ tree is derived from docs/examples/ (the
tested percent-format walkthroughs) and must stay in sync with them —
the kbmod_tpu counterpart of the reference's notebooks/*.ipynb onboarding."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
NB_DIR = REPO / "notebooks"


class TestNotebooks:
    def test_tree_is_fresh(self, tmp_path):
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "gen_notebooks.py"), str(tmp_path)],
            cwd=REPO, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            pytest.fail(f"gen_notebooks.py failed:\n{proc.stdout}\n{proc.stderr}")
        names = sorted(os.listdir(tmp_path))
        assert names, "generator produced nothing"
        stale = [
            n for n in names
            if not (NB_DIR / n).exists()
            or (NB_DIR / n).read_text() != (tmp_path / n).read_text()
        ]
        extra = sorted(set(os.listdir(NB_DIR)) - set(names))
        assert not stale and not extra, (
            f"notebooks/ is stale (changed: {stale}, orphaned: {extra}) — "
            "run `python scripts/gen_notebooks.py` and commit."
        )

    def test_notebooks_are_valid_nbformat4(self):
        for p in sorted(NB_DIR.glob("*.ipynb")):
            nb = json.loads(p.read_text())
            assert nb["nbformat"] == 4, p
            assert len(nb["cells"]) >= 3, f"{p} is too thin to be a walkthrough"
            kinds = {c["cell_type"] for c in nb["cells"]}
            assert kinds == {"markdown", "code"}, f"{p}: {kinds}"
            for c in nb["cells"]:
                if c["cell_type"] == "code":
                    assert c["outputs"] == [] and c["execution_count"] is None

    def test_covers_reference_notebook_topics(self):
        """Every reference notebook topic has a counterpart walkthrough
        (reference notebooks/: demo, explorer, fake data, clustering
        evaluation, results+filtering, fakes analysis, visualization x2)."""
        names = " ".join(p.name for p in NB_DIR.glob("*.ipynb"))
        for topic in ("demo", "trajectory_explorer", "fake_data", "clustering",
                      "results_and_filtering", "fake_analysis", "visualization",
                      "results_rater"):
            assert topic in names, f"no notebook for reference topic {topic}"
