"""Multi-host smoke test: two OS processes join a jax.distributed process
group over the CPU backend (2 local devices each -> 4 global) and run a
mesh-spanning sharded_core_search whose result must equal the
single-process search. Exercises initialize_distributed,
assign_patches_to_hosts and the cross-process collectives end-to-end —
the path a TPU pod slice uses over DCN (parallel/distributed.py)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "utils", "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_sharded_search(tmp_path):
    port = _free_port()
    out = str(tmp_path / "res0.npz")
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=280)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-3000:]}"
        assert f"proc {pid} OK" in log

    # The distributed result must match the single-process search exactly.
    from kbmod_tpu.ops.search import core_search

    rng = np.random.default_rng(3)
    T, H, W, C = 4, 16, 16, 8
    psi = rng.normal(0, 1, (T, H, W)).astype(np.float32)
    phi = rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32)
    valid = np.ones((T, H, W), np.uint8)
    times = np.arange(T) * 0.5
    vxs = rng.uniform(-3, 3, C).astype(np.float32)
    vys = rng.uniform(-3, 3, C).astype(np.float32)
    exp = core_search(psi, phi, valid, times, vxs, vys, 0, W, 0, H, 2)

    with np.load(out) as got:
        np.testing.assert_allclose(got["lh"], exp["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["obs_count"], exp["obs_count"])
        np.testing.assert_allclose(got["flux"], exp["flux"], rtol=1e-5, atol=1e-5)
