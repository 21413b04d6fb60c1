"""Execute the README's quick-start code verbatim, so the front-page
example can never rot (mirrors the reference's tests/test_readme_example.py,
which compiles the README snippet and checks the result)."""

import os
import re

import numpy as np


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme_code_blocks():
    with open(os.path.join(REPO_ROOT, "README.md")) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.DOTALL)


class TestReadmeExample:
    def test_quickstart_block_runs_and_recovers(self, capsys):
        blocks = [b for b in _readme_code_blocks() if "FakeDataSet" in b]
        assert blocks, "README quick-start block not found"
        ns = {}
        exec(compile(blocks[0], "README.md", "exec"), ns)  # noqa: S102
        # The snippet ends by printing the best result; re-derive it from
        # the namespace and check the injected object was recovered.
        best = ns["search"].get_results(0, 10)[0]
        assert (best.x, best.y) == (300, 200)
        assert np.isclose(best.vx, 10.0, atol=0.5)
        assert np.isclose(best.vy, -5.0, atol=0.5)
        assert "lh:" in capsys.readouterr().out

    def test_all_blocks_at_least_compile(self):
        for i, block in enumerate(_readme_code_blocks()):
            compile(block, f"README.md[block {i}]", "exec")
