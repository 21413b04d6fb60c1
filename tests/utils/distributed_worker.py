"""Worker for the 2-process jax.distributed drills (spawned by
tests/test_distributed.py). Must set env and call initialize_distributed
BEFORE anything initializes the XLA backend.

Phases (selected by the 4th argv, comma-separated):
  float   — mesh-spanning sharded_core_search on float psi/phi
  encoded — the same search through the uint8-encoded kernel route
  ckpt    — checkpointed_core_search over a sharded per-tile search_fn,
            twice: a fresh run (process 0 writes every tile) and a
            resume where one tile was deleted by the parent test —
            the finished-set broadcast must keep both processes on the
            same load-vs-compute branch (else the collectives deadlock)
  patches — patch-parallel: each process searches only the patches
            assign_patches_to_hosts gives it, single-process style, and
            writes one results file per patch for kbmod-merge-results
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("KB_NO_COMPILE_CACHE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

T, H, W, C = 4, 16, 16, 8


def make_inputs():
    rng = np.random.default_rng(3)
    psi = rng.normal(0, 1, (T, H, W)).astype(np.float32)
    phi = rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32)
    valid = np.ones((T, H, W), np.uint8)
    times = np.arange(T) * 0.5
    vxs = rng.uniform(-3, 3, C).astype(np.float32)
    vys = rng.uniform(-3, 3, C).astype(np.float32)
    return psi, phi, valid, times, vxs, vys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_dir = sys.argv[3]
    phases = sys.argv[4].split(",") if len(sys.argv) > 4 else ["float"]

    from kbmod_tpu.parallel import (
        initialize_distributed,
        is_distributed,
        assign_patches_to_hosts,
        build_mesh,
        sharded_core_search,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert is_distributed()
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.device_count()

    # Deterministic patch split with no communication.
    assert assign_patches_to_hosts(5) == ([0, 2, 4] if pid == 0 else [1, 3])

    psi, phi, valid, times, vxs, vys = make_inputs()
    mesh = build_mesh()  # spans all 4 global devices across both processes
    meta = dict(x_min=0, x_max=W, y_min=0, y_max=H, results_per_pixel=2)

    if "float" in phases:
        res = sharded_core_search(psi, phi, valid, times, vxs, vys, mesh, **meta)
        if pid == 0:
            np.savez(os.path.join(out_dir, "res0.npz"), **res)
        print(f"proc {pid} float OK", flush=True)

    if "encoded" in phases:
        from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array

        arr = PsiPhiArray()
        fill_psi_phi_array(arr, 1, list(psi), list(phi), times)
        m = arr.meta
        em = np.array([m.psi_min_val, m.psi_scale, m.phi_min_val, m.phi_scale], np.float32)
        psi_z, phi_z, valid_z = arr.decoded_psi_phi()
        res = sharded_core_search(
            psi_z, phi_z, valid_z, times, vxs, vys, mesh, kernel="pallas",
            psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em, **meta,
        )
        if pid == 0:
            np.savez(os.path.join(out_dir, "res_encoded0.npz"), **res)
        print(f"proc {pid} encoded OK", flush=True)

    if "ckpt" in phases:
        from kbmod_tpu.search.checkpoint import checkpointed_core_search

        def tile_fn(psi_, phi_, valid_, times_, vxs_, vys_, x0, x1, y0, y1, rpp, **kw):
            return sharded_core_search(
                psi_, phi_, valid_, times_, vxs_, vys_, mesh,
                x_min=x0, x_max=x1, y_min=y0, y_max=y1, results_per_pixel=rpp, **kw,
            )

        res = checkpointed_core_search(
            psi, phi, valid, times, vxs, vys, 0, W, 0, H, 2,
            checkpoint_dir=os.path.join(out_dir, "ckpt"), tile_rows=4,
            search_fn=tile_fn,
        )
        if pid == 0:
            np.savez(os.path.join(out_dir, "res_ckpt0.npz"), **res)
        print(f"proc {pid} ckpt OK", flush=True)

    if "patches" in phases:
        # Patch-parallel over DCN: no collectives — each host independently
        # searches its own y-patches and writes one results file per patch
        # (SURVEY §5.8; merged afterwards by kbmod-merge-results).
        from kbmod_tpu.ops.search import core_search
        from kbmod_tpu.results import Results
        from kbmod_tpu.search.trajectory_list import TrajectoryList

        n_patches, rows = 4, H // 4
        for patch in assign_patches_to_hosts(n_patches):
            part = core_search(
                psi, phi, valid, times, vxs, vys,
                0, W, patch * rows, (patch + 1) * rows, 2,
            )
            res = Results.from_trajectories(TrajectoryList(part))
            res.set_mjd_utc_mid(np.asarray(times) + 57000.0)
            res.write_table(os.path.join(out_dir, f"patch_{patch}.ecsv"), overwrite=True)
        print(f"proc {pid} patches OK", flush=True)

    print(f"proc {pid} OK", flush=True)


if __name__ == "__main__":
    main()
