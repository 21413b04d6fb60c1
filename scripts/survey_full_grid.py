"""Sustained full-grid survey gate (VERDICT r2 #3, host-overhead cut r3 #2).

Runs the reference's DEFAULT 33,153-candidate grid (EclipticCenteredSearch
velocities [92, 526] x 257, angles +-pi/15 x 129 — configuration.py:196-207)
over the full 100 x 4096 x 4096 uint8 survey stack with per-row-tile
checkpointing, KILLS the worker (SIGKILL) mid-run, resumes, and records:

  * wall time of each phase and the whole search,
  * steady-state evals/s over the completed tiles,
  * checkpoint overhead (everything outside the per-tile search calls),
  * resume accounting (tiles loaded vs computed after the kill),
  * a 64x64 window validated exactly against the XLA encoded kernel.

Unlike the r3 version (which hand-rolled the per-tile fetch, a host numpy
winner gather, and synchronous dense .npz writes — 76% of wall clock), this
drives the PRODUCTION path end to end: ``checkpointed_core_search`` over
``core_search`` with

  * EncodedPlanes winner re-scoring (device gather over the uint8 code
    planes; decoded float planes never materialize),
  * compacted result assembly (``compact_min_lh``: the >90% of slots below
    min_lh are dropped inside assembly, so tiles checkpoint ~15 MB instead
    of ~235 MB),
  * the background tile writer (persistence overlaps the next tile's
    device work).

The observation baseline is chosen so the trajectory reach stays inside the
packed stream's guards (|dx| <= 710 <= 720), keeping the search on the
grouped mask-free fast path, which is the shipped survey configuration.

Usage: python scripts/survey_full_grid.py            # full gate (parent)
       python scripts/survey_full_grid.py --worker   # internal
"""
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

CKPT_DIR = os.environ.get("KB_GATE_DIR", "/tmp/kb_full_grid_ckpt")
T, HW = 100, 4096
K = 8
MIN_LH = 10.0
# 512-row tiles amortize the per-launch dispatch overhead (~1.5-4 s/tile
# through the tunnel) that dominated the margin once assembly dropped to
# ~4 s; the checkpoint unit stays small (~30 MB compacted).
TILE_ROWS = int(os.environ.get("KB_GATE_TILE_ROWS", "512"))
EM = np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32)


def default_grid():
    """The reference's default survey grid: 257 velocities x 129 angles
    about the ecliptic (given_ecliptic = 0)."""
    vel = np.linspace(92.0, 526.0, 257)
    ang = np.linspace(-np.pi / 15.0, np.pi / 15.0, 129)
    vv, aa = np.meshgrid(vel, ang, indexing="ij")
    return (vv * np.cos(aa)).ravel().astype(np.float32), (vv * np.sin(aa)).ravel().astype(np.float32)


def build_codes():
    rng = np.random.default_rng(11)
    psi_c = rng.integers(0, 256, (T, HW, HW), dtype=np.uint8)
    phi_c = rng.integers(1, 256, (T, HW, HW), dtype=np.uint8)
    return psi_c, phi_c


def worker():
    import logging

    logging.basicConfig(level=logging.INFO)
    import jax.numpy as jnp

    from kbmod_tpu.ops.search import EncodedPlanes, core_search, trajectory_offsets
    from kbmod_tpu.ops.search_pallas import auto_pack_guards, pack_psi_phi_words
    from kbmod_tpu.search.checkpoint import checkpointed_core_search

    vxs, vys = default_grid()
    C = len(vxs)
    # Baseline 1.35 days: reach 526 * 1.35 = 710 px, inside the auto guards.
    times = np.linspace(0.0, 1.35, T)
    psi_c, phi_c = build_codes()

    t0 = time.time()
    # Canonical guards: the same bucketed stream shape the production
    # pipeline, bench cfg5, and prewarm tier 2 use, so the persistent
    # compile cache serves one executable to all of them.
    rg, cs = auto_pack_guards(*trajectory_offsets(vxs, vys, times))
    words_r, pad_rows = pack_psi_phi_words(
        psi_c, phi_c, t_chunk=8, row_guard=rg, col_slack=cs
    )
    words_r.block_until_ready()
    # Winner re-scoring gathers the code planes on device. Force the
    # (lazy, ~3.4 GB) uploads to completion HERE so they are accounted as
    # data staging — otherwise the first downstream sync (the checkpoint
    # fingerprint, in the r5c run: "fingerprint in 364.4s") silently
    # absorbs the transfer time.
    psi_dev = jnp.asarray(psi_c)
    phi_dev = jnp.asarray(phi_c)
    planes = EncodedPlanes(psi_dev, phi_dev, jnp.asarray(EM))
    del psi_c, phi_c
    float(np.asarray(psi_dev[0, 0, 0]))
    float(np.asarray(phi_dev[0, 0, 0]))
    t_pack = time.time() - t0
    print(f"pack+stage {t_pack:.1f}s", flush=True)

    tile_times = []
    tile_marks = []  # (entry, exit) per search_fn call: attributes the
    # between-tile time (resumed loads, writer stalls, final concat).

    def tile_search(psi_, phi_, valid_, times_, vxs_, vys_, x0, x1, y0, y1, rpp_, **kw):
        t1 = time.time()
        part = core_search(
            psi_, phi_, valid_, times_, vxs_, vys_, x0, x1, y0, y1, rpp_, **kw
        )
        dt = time.time() - t1
        tile_times.append(dt)
        tile_marks.append((t1, time.time()))
        rows = y1 - y0
        print(
            f"tile y=[{y0},{y1}) {dt:.1f}s  {C * rows * HW / dt / 1e9:.2f}e9 evals/s"
            f"  kept={len(part['lh'])}",
            flush=True,
        )
        # Hard-kill hook for the resume demonstration: SIGKILL (no
        # cleanup, no atexit) right after a tile's search completes —
        # the checkpoint of THIS tile is not yet written, so the resume
        # must recompute it. Killing at a device-idle moment avoids
        # wedging the TPU tunnel for the whole gate (a mid-DMA kill can
        # stall the remote runtime for an hour+).
        kill_after = int(os.environ.get("KB_GATE_SELFKILL_AFTER", "0"))
        if kill_after and len(tile_times) >= kill_after:
            print(f"[worker] self-SIGKILL after {len(tile_times)} tiles", flush=True)
            os.kill(os.getpid(), signal.SIGKILL)
        return part

    t0 = time.time()
    res = checkpointed_core_search(
        planes, None, None, times, vxs, vys,
        0, HW, 0, HW, K,
        checkpoint_dir=CKPT_DIR, tile_rows=TILE_ROWS, search_fn=tile_search,
        min_obs=10, min_lh=MIN_LH, gate_min_obs=True, gate_min_lh=True,
        compact_min_lh=MIN_LH,
        packed_provider=lambda: (words_r, pad_rows),
    )
    t_search = time.time() - t0
    n_done = len(tile_times)
    n_tiles = HW // TILE_ROWS
    state = {
        "t_pack": t_pack,
        "t_search_wall": t_search,
        "tiles_computed": n_done,
        "tiles_total": n_tiles,
        "tile_times": tile_times,
        "steady_evals_per_s": (
            C * TILE_ROWS * HW * max(0, n_done - 1) / sum(tile_times[1:])
            if n_done > 1 else None
        ),
        # Everything outside the per-tile search calls: resumed-tile loads,
        # the final concatenate, whatever checkpoint persistence did not
        # overlap with device work.
        "ckpt_overhead_frac": (t_search - sum(tile_times)) / t_search if n_done else 0.0,
        # Where the non-tile time sits: before the first computed tile
        # (resumed-tile loads), between tiles (writer stalls), after the
        # last tile (final writer drain + concatenate).
        "gap_before_first": round(tile_marks[0][0] - t0, 2) if n_done else None,
        "gaps_between": [
            round(tile_marks[i + 1][0] - tile_marks[i][1], 2) for i in range(n_done - 1)
        ],
        "gap_after_last": round(t0 + t_search - tile_marks[-1][1], 2) if n_done else None,
        "rows": len(res["lh"]),
        "kept": int((res["lh"] > MIN_LH).sum()),
    }
    print("WORKER DONE", json.dumps(state), flush=True)

    # Window validation vs the XLA encoded kernel on a 1024-candidate
    # subset of the grid (the full-grid XLA reference would take hours;
    # kernel exactness is per-candidate, so a subset is a sound check).
    from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
    from kbmod_tpu.ops.search_pallas import search_topk_pallas_packed

    dxs, dys = trajectory_offsets(vxs, vys, times)
    sub = np.random.default_rng(3).choice(C, 1024, replace=False)
    dxs_s = np.asarray(dxs, np.int32)[sub]
    dys_s = np.asarray(dys, np.int32)[sub]
    x0 = y0 = HW // 2
    em = jnp.asarray(EM)
    lh_win, _ = search_topk_pallas_packed(
        words_r, dxs_s, dys_s,
        jnp.float32(10.0), jnp.float32(0.0), em,
        shape=(T, HW, HW), bits=8, pad_rows=pad_rows,
        x_min=x0, x_max=x0 + 64, y_min=y0, y_max=y0 + 64, k_results=K,
    )
    lh_win = np.asarray(lh_win)
    del words_r
    ref_lh, _ = search_topk_shift(
        psi_dev, phi_dev, jnp.zeros((1, 1, 1), jnp.uint8),
        jnp.asarray(dxs_s), jnp.asarray(dys_s),
        jnp.float32(10.0), jnp.float32(0.0), encode_meta=em,
        x_min=x0, x_max=x0 + 64, y_min=y0, y_max=y0 + 64, k_results=K,
    )
    np.testing.assert_allclose(lh_win, np.asarray(ref_lh), rtol=1e-5, atol=1e-5)
    print("WINDOW EXACT", flush=True)


def parent():
    os.makedirs(CKPT_DIR, exist_ok=True)
    for name in os.listdir(CKPT_DIR):
        os.remove(os.path.join(CKPT_DIR, name))

    # Phase 1: the worker SIGKILLs itself (no cleanup) after ~3/8 of the
    # tiles' device work; the last tile's checkpoint is NOT yet written at
    # that point, so at most kill_after-1 tiles survive (the background
    # writer may still be flushing) and the resume recomputes the rest —
    # leaving phase 2 a long steady run for the sustained-rate measurement.
    print("=== phase 1: run + kill ===", flush=True)
    kill_after = max(2, (HW // TILE_ROWS) * 3 // 8)
    env = dict(os.environ, KB_GATE_SELFKILL_AFTER=str(kill_after))
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        timeout=3600,
    )
    print(proc.stdout[-2500:], flush=True)
    assert proc.returncode == -signal.SIGKILL, f"expected SIGKILL death, rc={proc.returncode}"
    n_after_kill = len(
        [f for f in os.listdir(CKPT_DIR) if f.startswith("tile_") and f.endswith(".npz")]
    )
    print(f"[parent] worker died by SIGKILL; {n_after_kill} tiles survive on disk", flush=True)
    assert 1 <= n_after_kill <= kill_after - 1, n_after_kill

    print("[parent] waiting 30s for the device to settle", flush=True)
    time.sleep(30)

    # Phase 2: resume to completion.
    print("=== phase 2: resume ===", flush=True)
    t0 = time.time()
    out2 = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=3600,
    )
    print(out2.stdout[-4000:], flush=True)
    assert out2.returncode == 0, "resume phase failed"
    done = json.loads(out2.stdout.split("WORKER DONE ", 1)[1].splitlines()[0])
    assert done["tiles_computed"] == done["tiles_total"] - n_after_kill, done
    assert "WINDOW EXACT" in out2.stdout
    print(f"[parent] resume completed in {time.time()-t0:.0f}s; GATE PASSED", flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        parent()
