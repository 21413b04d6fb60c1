"""Multi-host drills: two OS processes join a jax.distributed process
group over the CPU backend (2 local devices each -> 4 global) and run

  * a mesh-spanning sharded_core_search (float planes),
  * the same search through the uint8-encoded kernel route,
  * checkpointed_core_search over a sharded per-tile search_fn, including
    a resume where one tile was deleted between runs (the finished-set
    broadcast must keep both processes on the same branch),
  * a patch-parallel run (assign_patches_to_hosts) whose per-patch results
    files are merged back with the kbmod-merge-results console script.

Every result must equal the single-process search. This exercises
initialize_distributed, the cross-process collectives, and the DCN-side
story of SURVEY §5.8 end-to-end (parallel/distributed.py)."""

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


def _launch(out_dir, phases):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port), out_dir, phases],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=280)[0] for p in procs]
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{log[-3000:]}"
        assert f"proc {pid} OK" in log
    return logs


def _expected():
    """Single-process references for the worker's fixed inputs."""
    sys.path.insert(0, os.path.dirname(_WORKER))
    from distributed_worker import make_inputs  # same seed/shapes as the workers

    sys.path.pop(0)
    return make_inputs()


@pytest.mark.timeout(600)
def test_two_process_drills(tmp_path):
    out = str(tmp_path)
    logs = _launch(out, "float,encoded,ckpt,patches")
    assert all("ckpt OK" in log for log in logs)

    from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
    from kbmod_tpu.ops.search import core_search

    psi, phi, valid, times, vxs, vys = _expected()
    H, W = psi.shape[1:]
    exp = core_search(psi, phi, valid, times, vxs, vys, 0, W, 0, H, 2)

    def check(path, expected):
        with np.load(path) as got:
            np.testing.assert_allclose(got["lh"], expected["lh"], rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(got["obs_count"], expected["obs_count"])
            np.testing.assert_allclose(got["flux"], expected["flux"], rtol=1e-5, atol=1e-5)

    # Float sharded search across the process boundary.
    check(os.path.join(out, "res0.npz"), exp)

    # Encoded route: compare against the single-process search on the
    # decoded (quantized) planes — the same data the workers searched.
    arr = PsiPhiArray()
    fill_psi_phi_array(arr, 1, list(psi), list(phi), times)
    psi_z, phi_z, valid_z = arr.decoded_psi_phi()
    exp_enc = core_search(psi_z, phi_z, valid_z, times, vxs, vys, 0, W, 0, H, 2)
    check(os.path.join(out, "res_encoded0.npz"), exp_enc)

    # Cross-process checkpointing: the first run wrote every tile (process
    # 0 only), and the result matches the single-process search.
    ckpt_dir = os.path.join(out, "ckpt")
    tiles = sorted(f for f in os.listdir(ckpt_dir) if f.startswith("tile_"))
    assert tiles == ["tile_0_4.npz", "tile_12_16.npz", "tile_4_8.npz", "tile_8_12.npz"]
    check(os.path.join(out, "res_ckpt0.npz"), exp)

    # Patch-parallel: every patch file exists (split across the two hosts)
    # and merging them with the kbmod-merge-results CLI reproduces the
    # full-frame search row set exactly (dup_thresh=0: pure concatenation).
    patch_files = [os.path.join(out, f"patch_{i}.ecsv") for i in range(4)]
    assert all(os.path.exists(f) for f in patch_files)
    merged_path = os.path.join(out, "merged.ecsv")
    cli = subprocess.run(
        [sys.executable, "-m", "kbmod_tpu.cmdline.kbmod_merge_results",
         "--outfile", merged_path, "--dup_thresh", "0", *patch_files],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=120,
    )
    assert cli.returncode == 0, cli.stdout[-2000:]
    from kbmod_tpu.results import Results

    merged = Results.read_table(merged_path)
    assert len(merged) == len(exp["lh"])
    order = np.lexsort((merged["x"], merged["y"], -np.asarray(merged["likelihood"])))
    exp_order = np.lexsort((exp["x"], exp["y"], -exp["lh"]))
    np.testing.assert_allclose(
        np.asarray(merged["likelihood"])[order], exp["lh"][exp_order], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(merged["x"])[order], exp["x"][exp_order])


@pytest.mark.timeout(600)
def test_two_process_ckpt_resume(tmp_path):
    """Resume across the process boundary: run once, delete a mid-stack
    tile, rerun — both processes must agree on the load-vs-compute split
    (process 0's broadcast) and reproduce the full result."""
    out = str(tmp_path)
    _launch(out, "ckpt")
    os.remove(os.path.join(out, "ckpt", "tile_4_8.npz"))
    logs = _launch(out, "ckpt")
    assert all("ckpt OK" in log for log in logs)

    from kbmod_tpu.ops.search import core_search

    psi, phi, valid, times, vxs, vys = _expected()
    H, W = psi.shape[1:]
    exp = core_search(psi, phi, valid, times, vxs, vys, 0, W, 0, H, 2)
    with np.load(os.path.join(out, "res_ckpt0.npz")) as got:
        np.testing.assert_allclose(got["lh"], exp["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["obs_count"], exp["obs_count"])
    # The deleted tile was recomputed and re-persisted by process 0.
    assert os.path.exists(os.path.join(out, "ckpt", "tile_4_8.npz"))
