"""The generated API reference (docs/api) must exist, cover the public
surface, and stay in sync with the code: the test regenerates the tree
into a temp dir and diffs it against the committed pages. On drift, run
``python scripts/gen_api_docs.py`` and commit the result."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
API_DIR = REPO / "docs" / "api"


class TestApiDocs:
    def test_tree_is_fresh(self, tmp_path):
        # Generate in a clean subprocess: earlier tests install mock
        # ``lsst`` modules into sys.modules, which changes what the
        # optional-import-gated ButlerStandardizer page documents, so an
        # in-process run is order-dependent. The committed tree must match
        # what ``python scripts/gen_api_docs.py`` itself produces.
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "gen_api_docs.py"), str(tmp_path)],
            cwd=REPO, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            pytest.fail(
                f"gen_api_docs.py failed (rc={proc.returncode}):\n"
                f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
            )
        names = sorted(os.listdir(tmp_path))
        assert (API_DIR / "index.md").exists(), "docs/api missing — run scripts/gen_api_docs.py"
        stale = []
        for name in names:
            committed = API_DIR / name
            if not committed.exists():
                stale.append(f"{name} (missing)")
                continue
            if committed.read_text() != (tmp_path / name).read_text():
                stale.append(name)
        extra = sorted(set(os.listdir(API_DIR)) - set(names))
        assert not stale and not extra, (
            f"docs/api is stale (changed: {stale}, orphaned: {extra}) — "
            "run `python scripts/gen_api_docs.py` and commit."
        )

    def test_covers_all_config_params(self):
        from kbmod_tpu.configuration import _SUPPORTED_PARAMS

        text = (API_DIR / "configuration_params.md").read_text()
        missing = [p.name for p in _SUPPORTED_PARAMS if f"`{p.name}`" not in text]
        assert not missing, f"config params missing from the API reference: {missing}"

    def test_covers_key_public_classes(self):
        pages = {p.name: p.read_text() for p in API_DIR.glob("*.md")}
        joined = "\n".join(pages.values())
        for cls in (
            "StackSearch", "Trajectory", "TrajectoryList", "SearchRunner",
            "Results", "SearchConfiguration", "ImageStackPy", "LayeredImagePy",
            "PSF", "WorkUnit", "ImageCollection", "Standardizer", "KBMODV1",
            "RegionSearch", "TrajectoryExplorer", "FakeDataSet", "SigmaGClipping",
            "KnownObjsMatcher", "DebugTimer", "WCS",
        ):
            assert f"class `{cls}`" in joined, f"{cls} not documented in docs/api"
