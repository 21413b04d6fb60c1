"""Benchmark ladder: the five BASELINE.md measurement configs in one run.

Prints ONE JSON line whose headline fields keep the historical contract —
{"metric": "candidate_trajectory_evals_per_sec", "value": N, "unit": ...,
"vs_baseline": N} where value is BASELINE config 3's kernel rate and
vs_baseline is relative to the 1e9 evals/s/chip north star — plus a
"ladder" list with one entry per BASELINE measurement config:

  cfg1  README example: 10x512x512 FakeDataSet, KBMODV1Search 5x5 grid
        (the README quick-start block, executed verbatim) — pipeline wall s.
  cfg2  The reference project's real data: data/small 10-image DECam stack
        through the FULL SearchRunner (sigma-G + clustering + mean coadds)
        — pipeline wall s. Skipped if /root/reference/data is absent.
  cfg3  Mid-scale survey kernel: 64x2048^2 uint8 psi/phi, the default
        33,153-candidate grid — evals/s (the headline).
  cfg4  Reprojected WorkUnit: 20x512^2 with per-image shifted WCSes,
        adaptive reprojection to a common frame, SearchRunner with
        grid_start_end cluster dedup — wall s (reproject + pipeline).
  cfg5  Survey scale: 100x4096^2 uint8 code planes, full default grid,
        4 checkpoint row-tiles of the production encoded path — steady
        evals/s over the post-compile tiles.

Each config runs in its own subprocess (clean device memory between
scales); a config that fails or times out records {"error": ...} without
sinking the others, so the JSON line always prints. The headline config 3
runs FIRST and its JSON line is printed eagerly, so a driver-level timeout
later in the ladder still leaves a parseable artifact; a global wall
budget (KB_BENCH_WALL, default 1080 s) skips configs that no longer fit.
KB_BENCH_CONFIGS selects a subset (e.g. KB_BENCH_CONFIGS=3 restores the
old single-config behavior); cfg3 knobs stay overridable by
KB_BENCH_T/H/W/C/K/KERNEL. Configs that error or time out get ONE retry
after the whole ladder has run, inside the same wall budget — the shared
TPU frontend wedges for minutes at a time, and a config caught in such a
window should not lose its number for the round.

The default wall (1080 s) is set from the observed driver behavior: the
round-4 artifact was rc=124 (driver kill) with the tail cut during config
5, after cfg1 80s + cfg2 600s-timeout + cfg3 + cfg4 70s ~ 900-1200 s — so
the ladder must self-terminate with its full JSON line inside ~18 min.
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
NORTH_STAR = 1e9  # candidate-trajectory evals/s/chip (BASELINE.json)


# ---------------------------------------------------------------- config 1


def cfg1_readme_example():
    """BASELINE config 1: the README quick-start, executed verbatim."""
    with open(os.path.join(REPO_ROOT, "README.md")) as f:
        blocks = re.findall(r"```python\n(.*?)```", f.read(), flags=re.DOTALL)
    block = next(b for b in blocks if "FakeDataSet" in b)
    t0 = time.perf_counter()
    ns = {}
    exec(compile(block, "README.md", "exec"), ns)  # noqa: S102
    wall = time.perf_counter() - t0
    best = ns["search"].get_results(0, 1)[0]
    assert (best.x, best.y) == (300, 200), best
    return {
        "config": 1,
        "name": "readme_example",
        "metric": "pipeline_wall_s",
        "value": wall,
        "unit": "s (10x512x512 FakeDataSet, KBMODV1Search 5x5, recovery asserted)",
    }


# ---------------------------------------------------------------- config 2


def cfg2_real_data():
    """BASELINE config 2: the reference's data/small DECam files end to end."""
    from pathlib import Path

    ref_data = Path("/root/reference/data")
    if not (ref_data / "demo_image.fits").exists():
        return {"config": 2, "name": "real_data_e2e", "skipped": "reference data absent"}

    from kbmod_tpu.configuration import SearchConfiguration
    from kbmod_tpu.core.image_stack_py import ImageStackPy
    from kbmod_tpu.core.psf import PSF
    from kbmod_tpu.run_search import SearchRunner
    from kbmod_tpu.util_functions import load_deccam_layered_image
    from kbmod_tpu.work_unit import WorkUnit

    psf = PSF.make_gaussian_kernel(1.0)
    stack = ImageStackPy()
    for path in sorted((ref_data / "small").glob("*.fits")):
        stack.append_layered_image(load_deccam_layered_image(path, psf))
    stack.sort_by_time()

    config = SearchConfiguration()
    config.set("generator_config", {
        "name": "VelocityGridSearch",
        "vx_steps": 21, "min_vx": -10.0, "max_vx": 10.0,
        "vy_steps": 21, "min_vy": -10.0, "max_vy": 10.0,
    })
    config.set("num_obs", 5)
    config.set("lh_level", 8.0)
    config.set("do_clustering", True)
    config.set("coadds", ["mean"])
    config.set("stamp_radius", 5)

    t0 = time.perf_counter()
    results = SearchRunner().run_search_from_work_unit(
        WorkUnit(im_stack=stack, config=config)
    )
    wall = time.perf_counter() - t0
    assert len(results) >= 1 and np.all(np.isfinite(results["likelihood"]))
    return {
        "config": 2,
        "name": "real_data_e2e",
        "metric": "pipeline_wall_s",
        "value": wall,
        "unit": "s (reference data/small 10x64x64, sigma-G + clustering + coadds)",
        "n_results": len(results),
    }


# ---------------------------------------------------------------- config 3


def default_survey_grid(C, times_span, n_vel_default=257):
    """The reference's default grid shape: 257 speeds x 129 angles about
    the ecliptic (configuration.py:196-207), scaled to C if overridden."""
    n_vel = n_vel_default if C == 257 * 129 else max(1, int(np.sqrt(C)))
    n_ang = C // n_vel + (1 if C % n_vel else 0)
    vel = np.linspace(92.0, 526.0, n_vel) / 86.0  # px/time-unit on a 2k frame
    ang = np.linspace(-np.pi / 15, np.pi / 15, n_ang)
    vv, aa = np.meshgrid(vel, ang)
    vxs = (np.cos(aa) * vv).reshape(-1)[:C].astype(np.float32)
    vys = (np.sin(aa) * vv).reshape(-1)[:C].astype(np.float32)
    return vxs, vys


def cfg3_kernel():
    """BASELINE config 3: the mid-scale survey kernel rate (the headline)."""
    import jax
    import jax.numpy as jnp

    from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets

    T = int(os.environ.get("KB_BENCH_T", 64))
    H = int(os.environ.get("KB_BENCH_H", 2048))
    W = int(os.environ.get("KB_BENCH_W", 2048))
    C = int(os.environ.get("KB_BENCH_C", 257 * 129))
    K = int(os.environ.get("KB_BENCH_K", 8))
    REPS = int(os.environ.get("KB_BENCH_REPS", 3))
    kernel = os.environ.get(
        "KB_BENCH_KERNEL", "pallas_encoded" if jax.default_backend() != "cpu" else "xla"
    )

    rng = np.random.default_rng(42)
    times = np.linspace(0.0, 4.0, T)
    vxs, vys = default_survey_grid(C, 4.0)
    dxs, dys = trajectory_offsets(vxs, vys, times)
    dxs = jnp.asarray(dxs)
    dys = jnp.asarray(dys)

    if kernel == "pallas_encoded":
        from kbmod_tpu.ops.search_pallas import (
            pack_psi_phi_words,
            search_topk_pallas_packed,
        )

        psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
        phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
        em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)

        def search(**kw):
            return search_topk_pallas_packed(
                words_r, dxs, dys, jnp.float32(10), jnp.float32(0), em,
                shape=(T, H, W), bits=8, pad_rows=pad_rows, **kw,
            )
    elif kernel == "pallas":
        from kbmod_tpu.ops.search_pallas import search_topk_pallas

        psi = jnp.asarray(rng.normal(0, 1, (T, H, W)).astype(np.float32))
        phi = jnp.asarray(rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32))
        valid = jnp.ones((T, H, W), dtype=jnp.uint8)

        def search(**kw):
            return search_topk_pallas(
                psi, phi, valid, dxs, dys, jnp.float32(10), jnp.float32(0), **kw
            )
    else:
        psi = jnp.asarray(rng.normal(0, 1, (T, H, W)).astype(np.float32))
        phi = jnp.asarray(rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32))
        valid = jnp.ones((T, H, W), dtype=jnp.uint8)

        def search(**kw):
            return search_topk_shift(
                psi, phi, valid, dxs, dys, jnp.float32(10), jnp.float32(0), **kw
            )

    def run():
        top_lh, _ = search(x_min=0, x_max=W, y_min=0, y_max=H, k_results=K)
        # Force full completion: fetch a value to host (block_until_ready
        # does not block through the axon tunnel).
        return float(np.asarray(top_lh[0, 0, 0]))

    run()  # compile + warm up
    elapsed = float("inf")
    for _ in range(REPS):
        start = time.perf_counter()
        run()
        elapsed = min(elapsed, time.perf_counter() - start)

    rate = float(H) * float(W) * float(C) / elapsed
    return {
        "config": 3,
        "name": "midscale_kernel",
        "metric": "candidate_trajectory_evals_per_sec",
        "value": rate,
        "unit": (
            f"evals/s (T={T}, {H}x{W}, C={C}, K={K}, "
            f"{'u8' if kernel == 'pallas_encoded' else 'f32'}, {kernel})"
        ),
    }


# ---------------------------------------------------------------- config 4


def cfg4_reprojected():
    """BASELINE config 4: adaptive reprojection + grid-dedup pipeline."""
    from kbmod_tpu.configuration import SearchConfiguration
    from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
    from kbmod_tpu.reprojection import reproject_work_unit
    from kbmod_tpu.run_search import SearchRunner
    from kbmod_tpu.search import Trajectory
    from kbmod_tpu.wcs_utils import make_fake_wcs

    n, hw = 20, 512
    times = create_fake_times(n, t0=57130.0, obs_per_day=4)
    ds = FakeDataSet(hw, hw, times, use_seed=7)
    ds.insert_object(Trajectory(x=300, y=200, vx=10.0, vy=-5.0, flux=500.0))
    work = ds.get_work_unit()
    deg_pp = 0.5 / 3600.0
    for i in range(n):
        wcs = make_fake_wcs(45.0, 10.0, hw, hw, deg_pp)
        wcs.crpix = wcs.crpix + np.array([0.2 * i, -0.1 * i])
        work.org_img_meta["per_image_wcs"][i] = wcs
    common = make_fake_wcs(45.0, 10.0, hw, hw, deg_pp)

    config = SearchConfiguration()
    config.set("generator_config", {
        "name": "VelocityGridSearch",
        "vx_steps": 11, "min_vx": 5.0, "max_vx": 15.0,
        "vy_steps": 11, "min_vy": -10.0, "max_vy": 0.0,
    })
    config.set("num_obs", 15)
    config.set("lh_level", 9.0)
    config.set("do_clustering", True)
    config.set("cluster_type", "grid_start_end")
    config.set("coadds", ["mean"])
    work.config = config

    t0 = time.perf_counter()
    reprojected = reproject_work_unit(work, common, frame="original")
    t_reproject = time.perf_counter() - t0
    results = SearchRunner().run_search_from_work_unit(reprojected)
    wall = time.perf_counter() - t0
    i = int(np.argmax(results["likelihood"]))
    assert abs(int(results["x"][i]) - 300) <= 1 and abs(int(results["y"][i]) - 200) <= 1
    return {
        "config": 4,
        "name": "reprojected_workunit",
        "metric": "pipeline_wall_s",
        "value": wall,
        "unit": "s (20x512^2 adaptive reprojection + grid_start_end dedup, recovery asserted)",
        "t_reproject_s": t_reproject,
    }


# ---------------------------------------------------------------- config 5


def cfg5_survey_tiles():
    """BASELINE config 5: the production encoded path at 100x4096^2 with
    the full default grid, measured over 4 checkpoint row-tiles (the same
    unit the sustained survey gate uses; scripts/survey_full_grid.py)."""
    import jax.numpy as jnp

    from kbmod_tpu.ops.search import EncodedPlanes, core_search, trajectory_offsets
    from kbmod_tpu.ops.search_pallas import auto_pack_guards, pack_psi_phi_words

    T, HW, K = 100, 4096, 8
    tile_rows, n_tiles = 256, 4
    vel = np.linspace(92.0, 526.0, 257)
    ang = np.linspace(-np.pi / 15.0, np.pi / 15.0, 129)
    vv, aa = np.meshgrid(vel, ang, indexing="ij")
    vxs = (vv * np.cos(aa)).ravel().astype(np.float32)
    vys = (vv * np.sin(aa)).ravel().astype(np.float32)
    C = len(vxs)
    times = np.linspace(0.0, 1.35, T)  # reach 710 px, inside the auto guards

    rng = np.random.default_rng(11)
    psi_c = rng.integers(0, 256, (T, HW, HW), dtype=np.uint8)
    phi_c = rng.integers(1, 256, (T, HW, HW), dtype=np.uint8)
    em = np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32)

    t0 = time.perf_counter()
    # Canonical guards = the production pipeline's stream shape for this
    # grid, so the persistent cache shares executables with SearchRunner.
    rg, cs = auto_pack_guards(*trajectory_offsets(vxs, vys, times))
    words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c, t_chunk=8, row_guard=rg, col_slack=cs)
    words_r.block_until_ready()
    planes = EncodedPlanes(jnp.asarray(psi_c), jnp.asarray(phi_c), jnp.asarray(em))
    del psi_c, phi_c
    t_pack = time.perf_counter() - t0

    tile_times = []
    for i in range(n_tiles):
        y0 = i * tile_rows
        t1 = time.perf_counter()
        part = core_search(
            planes, None, None, times, vxs, vys,
            0, HW, y0, y0 + tile_rows, K,
            min_obs=10, min_lh=10.0, gate_min_obs=True, gate_min_lh=True,
            compact_min_lh=10.0, packed_provider=lambda: (words_r, pad_rows),
        )
        len(part["lh"])  # compaction already fetched to host
        tile_times.append(time.perf_counter() - t1)

    steady = C * tile_rows * HW * (n_tiles - 1) / sum(tile_times[1:])
    return {
        "config": 5,
        "name": "survey_scale_tiles",
        "metric": "steady_evals_per_sec",
        "value": steady,
        "unit": f"evals/s (100x4096^2 u8, C={C}, {n_tiles}x{tile_rows}-row tiles, post-compile)",
        "t_pack_s": t_pack,
        "tile_times_s": tile_times,
    }


# ---------------------------------------------------------------- driver

CONFIGS = {1: cfg1_readme_example, 2: cfg2_real_data, 3: cfg3_kernel,
           4: cfg4_reprojected, 5: cfg5_survey_tiles}
# cfg3 (the headline) runs FIRST so its JSON line exists even if a later
# config hits the driver's wall; per-config budgets sum to < 27 min and a
# global wall (KB_BENCH_WALL, default 18 min) skips any config that no
# longer fits, so the final full-ladder line always prints (VERDICT r4 #3).
ORDER = [3, 1, 2, 4, 5]
TIMEOUTS = {1: 240, 2: 300, 3: 420, 4: 360, 5: 600}


def _headline(ladder, wanted):
    head = next((e for e in ladder if e.get("config") == 3 and "value" in e), None)
    value = head["value"] if head else float("nan")
    unit = head["unit"] if head else "evals/s (config 3 failed)"
    return {
        "metric": "candidate_trajectory_evals_per_sec",
        "value": value,
        "unit": f"{unit}; ladder = BASELINE configs {wanted}",
        "vs_baseline": value / NORTH_STAR,
        "ladder": ladder,
    }


def _run_config(n, budget):
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--config", str(n)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=budget, cwd=REPO_ROOT,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("CFG_RESULT ")]
        if proc.returncode == 0 and lines:
            return json.loads(lines[-1][len("CFG_RESULT "):])
        return {"config": n, "error": proc.stdout[-800:]}
    except subprocess.TimeoutExpired:
        return {"config": n, "error": f"timeout after {budget:.0f}s"}


def main():
    if "--config" in sys.argv:
        n = int(sys.argv[sys.argv.index("--config") + 1])
        print("CFG_RESULT " + json.dumps(CONFIGS[n]()), flush=True)
        return

    wanted = [int(s) for s in os.environ.get("KB_BENCH_CONFIGS", "1,2,3,4,5").split(",")]
    wall = float(os.environ.get("KB_BENCH_WALL", 1080))
    t_start = time.perf_counter()
    ladder = []
    order = [c for c in ORDER if c in wanted] + [c for c in wanted if c not in ORDER]
    # Two passes: configs that fail on the first pass (the shared-TPU
    # tunnel wedges for minutes at a time; a config caught in such a
    # window times out through no fault of its own) get ONE retry with
    # whatever wall budget remains after everything ran once.
    for attempt in (1, 2):
        for n in order:
            if attempt == 2 and not any(
                e.get("config") == n and "error" in e for e in ladder
            ):
                continue
            remaining = wall - (time.perf_counter() - t_start)
            budget = min(TIMEOUTS[n], max(0.0, remaining))
            if budget < 30.0:
                entry = {"config": n, "skipped": f"wall budget exhausted ({wall:.0f}s)"}
                if attempt == 1:
                    ladder.append(entry)
                    print(f"[bench] config {n}: {json.dumps(entry)}", file=sys.stderr, flush=True)
                continue
            entry = _run_config(n, budget)
            if attempt == 2:
                if "error" in entry:
                    continue  # keep the first-pass error record
                ladder[next(i for i, e in enumerate(ladder) if e.get("config") == n)] = entry
                entry = dict(entry, retried=True)
            else:
                ladder.append(entry)
            print(f"[bench] config {n}: {json.dumps(entry)[:220]}", file=sys.stderr, flush=True)
            if n == 3 and "value" in entry:
                # Eager headline: a parseable line exists from this moment on.
                print(json.dumps(_headline(ladder, wanted)), flush=True)

    print(json.dumps(_headline(ladder, wanted)), flush=True)


if __name__ == "__main__":
    main()
