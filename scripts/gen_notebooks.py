"""Generate notebooks/*.ipynb from the tested percent-format example
scripts in docs/examples/.

The reference ships its narrative onboarding as 8 Jupyter notebooks
(/root/reference/notebooks/*.ipynb). This repo keeps the SOURCE of each
walkthrough as a runnable, pytest-covered script (docs/examples/*.py,
jupytext percent format) and derives the .ipynb rendering from it, so the
notebooks can never drift from code that actually runs.

Usage: python scripts/gen_notebooks.py [out_dir]   # default: notebooks/
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "docs", "examples")

CELL_RE = re.compile(r"^# %%(?: \[(?P<kind>\w+)\])?\s*$")


def parse_percent_cells(text):
    """Split percent-format source into (kind, source_lines) cells."""
    cells = []
    kind, lines = None, []
    for line in text.splitlines():
        m = CELL_RE.match(line)
        if m:
            if kind is not None or lines:
                cells.append((kind or "code", lines))
            kind, lines = m.group("kind") or "code", []
        else:
            lines.append(line)
    if kind is not None or lines:
        cells.append((kind or "code", lines))
    return cells


def to_notebook(py_path):
    cells = []
    for kind, lines in parse_percent_cells(open(py_path).read()):
        # Trim the blank padding between cells.
        while lines and not lines[0].strip():
            lines.pop(0)
        while lines and not lines[-1].strip():
            lines.pop()
        if not lines:
            continue
        if kind == "markdown":
            src = [re.sub(r"^# ?", "", ln) for ln in lines]
            cells.append({"cell_type": "markdown", "metadata": {}, "source": _nl(src)})
        else:
            cells.append({
                "cell_type": "code", "metadata": {}, "source": _nl(lines),
                "execution_count": None, "outputs": [],
            })
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


def _nl(lines):
    """Notebook source: every line but the last ends with a newline."""
    return [ln + "\n" for ln in lines[:-1]] + [lines[-1]]


def main(out_dir=None):
    out_dir = out_dir or os.path.join(REPO, "notebooks")
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py"))
    for name in names:
        nb = to_notebook(os.path.join(EXAMPLES, name))
        out = os.path.join(out_dir, name[:-3] + ".ipynb")
        with open(out, "w") as f:
            json.dump(nb, f, indent=1, sort_keys=True)
            f.write("\n")
    print(f"wrote {len(names)} notebooks to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
