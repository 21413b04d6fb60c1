"""Full SearchRunner pipeline at survey scale (VERDICT r3 #1).

Drives ``SearchRunner.run_search`` END TO END — not just the kernel — on a
100 x 4096 x 4096 float stack with the reference's DEFAULT survey grid
(EclipticCenteredSearch velocities [92, 526] x 257, angle offsets
+-pi/15 x 129 = 33,153 candidates; configuration.py:196-207) and ~20
injected objects:

  core device search (uint8-encoded psi/phi, compacted assembly)
    -> near-duplicate grid prefilter over the millions of raw rows
    -> batched sigma-G load_and_filter (psi/phi curve extraction on device)
    -> clustering
    -> coadd stamps
    -> results file written + read back

and asserts every injected object is recovered in the FINAL results file.
Per-phase wall/RSS comes from SearchRunner's own phase stats. The matching
reference flow is run_search.py:396-586; this gate is the proof that the
pipeline — not only the kernel — survives survey-scale row counts.

The observation baseline spans 1.35 days so the maximum trajectory reach
(526 px/day) stays inside the packed stream's 720-px guards, keeping the
search on the grouped mask-free fast path (the shipped survey config).

Usage: python scripts/survey_pipeline_gate.py          # ~15-25 min on TPU
       KB_GATE_T=20 KB_GATE_HW=1024 ... for a reduced rehearsal
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

T = int(os.environ.get("KB_GATE_T", 100))
HW = int(os.environ.get("KB_GATE_HW", 4096))
SPAN_DAYS = 1.35  # max reach 526 * 1.35 = 710 px <= the 720-px guards
NOISE = 2.0  # sci ~ N(0, NOISE); var = NOISE^2
PSF_SIGMA = 1.0
N_BRIGHT, N_FAINT = 12, 8
FLUX_BRIGHT, FLUX_FAINT = 350.0, 220.0
# The clustering scale: 20 px on the production 4k frame, scaled down for
# rehearsal frames that pack the same 20 objects into a smaller area.
CLUSTER_EPS = max(3.0, 20.0 * HW / 4096.0)


def inject_objects(sci, zeroed_times, psf_kernel, objects):
    """Add flux * psf_kernel at each object's snapped per-time position.

    Equivalent to fake_data_creator.image_stack_add_fake_object (delta
    convolved with the PSF) for interior positions, but ~1000x faster at
    4k: a (2r+1)^2 patch add instead of a full-frame convolution per
    (object, time). Objects are constrained to stay >= r px from every
    edge so no clipping is needed and the equivalence is exact.
    """
    r = psf_kernel.shape[0] // 2
    for x, y, vx, vy, flux in objects:
        for idx, dt in enumerate(zeroed_times):
            ix = int(np.floor(x + vx * dt + 0.5))
            iy = int(np.floor(y + vy * dt + 0.5))
            assert r <= ix < HW - r and r <= iy < HW - r, "object leaves the interior"
            sci[idx][iy - r : iy + r + 1, ix - r : ix + r + 1] += flux * psf_kernel


def make_objects(rng):
    """~20 objects inside the default grid, two flux tiers, interior-safe.

    Each object's (start, end) point is rejection-sampled to stay at least
    6 * CLUSTER_EPS from every other object's in the 4D clustering space, so
    no two DISTINCT injections can legitimately be merged by the nn_start_end
    sweep and every miss is attributable to the pipeline, not the harness.
    """
    objects = []
    pts4 = []
    margin = 16
    # Rehearsal frames smaller than the full 4k cap the object speeds so
    # trajectories stay interior; at HW=4096 the full [110, 500] is used.
    speed_hi = min(500.0, (HW - 2 * margin - 24) / SPAN_DAYS)
    speed_lo = min(110.0, 0.6 * speed_hi)
    min_sep = 6.0 * CLUSTER_EPS
    while len(objects) < N_BRIGHT + N_FAINT:
        speed = rng.uniform(speed_lo, speed_hi)
        ang = rng.uniform(-np.pi / 16, np.pi / 16)
        vx, vy = speed * np.cos(ang), speed * np.sin(ang)
        reach_x, reach_y = vx * SPAN_DAYS, vy * SPAN_DAYS
        x = rng.uniform(margin, HW - margin - reach_x)
        y = rng.uniform(margin + max(0.0, -reach_y), HW - margin - max(0.0, reach_y))
        p = np.array([x, x + reach_x, y, y + reach_y])
        if pts4 and min(np.linalg.norm(p - q) for q in pts4) < min_sep:
            continue
        pts4.append(p)
        flux = FLUX_BRIGHT if len(objects) < N_BRIGHT else FLUX_FAINT
        objects.append((float(x), float(y), float(vx), float(vy), flux))
    return objects


def recovered(results, obj, zeroed_times, tol_end=4.0, cluster_eps=0.0):
    """An injected object counts as recovered if some final row matches its
    track at BOTH window endpoints.

    The base tolerances are set by the (possibly thinned) grid's resolution:
    the best-fit search row starts on the injection's snapped pixel
    (tol_start ~ 2 px) and its end position is within ~half a velocity step
    times the window span (tol_end). Clustering then legitimately replaces
    that best-fit row with ANY higher-likelihood representative within
    cluster_eps of it in the 4D (start, end) space — nn_start_end keeps only
    neighborhood likelihood maxima, and a row starting a few px off with a
    compensating velocity can out-score the pixel-exact row (its mid-track
    overlaps the object's). The recovery tolerance therefore adds the
    clustering displacement guarantee to the grid tolerance at both
    endpoints; injections are kept >= 6 * CLUSTER_EPS apart (make_objects)
    so the widened check still cannot confuse two distinct objects.
    """
    x, y, vx, vy, _ = obj
    dt = float(zeroed_times[-1])
    rx = np.asarray(results["x"], dtype=float)
    ry = np.asarray(results["y"], dtype=float)
    rvx = np.asarray(results["vx"], dtype=float)
    rvy = np.asarray(results["vy"], dtype=float)
    tol_start = max(2.0, tol_end / 3.0) + cluster_eps
    tol_end = tol_end + cluster_eps
    close_start = (np.abs(rx - x) <= tol_start) & (np.abs(ry - y) <= tol_start)
    close_end = (np.abs((rx + rvx * dt) - (x + vx * dt)) <= tol_end) & (
        np.abs((ry + rvy * dt) - (y + vy * dt)) <= tol_end
    )
    return bool(np.any(close_start & close_end))


def main():
    import logging

    logging.basicConfig(level=logging.INFO)

    from kbmod_tpu.configuration import SearchConfiguration
    from kbmod_tpu.core.image_stack_py import ImageStackPy
    from kbmod_tpu.core.psf import PSF
    from kbmod_tpu.results import Results
    from kbmod_tpu.run_search import SearchRunner

    rng = np.random.default_rng(17)
    t0 = time.time()
    times = 57130.0 + np.linspace(0.0, SPAN_DAYS, T)
    psf_kernel = PSF.make_gaussian_kernel(PSF_SIGMA)
    sci = [rng.normal(0.0, NOISE, (HW, HW)).astype(np.float32) for _ in range(T)]
    var = [np.full((HW, HW), NOISE * NOISE, dtype=np.float32) for _ in range(T)]
    objects = make_objects(rng)
    zeroed = times - times[0]
    inject_objects(sci, zeroed, psf_kernel, objects)
    stack = ImageStackPy(times, sci, var, psfs=[psf_kernel] * T)
    del sci, var
    t_build = time.time() - t0
    print(f"build {t_build:.1f}s ({T}x{HW}x{HW}, {len(objects)} objects)", flush=True)

    out_path = os.environ.get("KB_GATE_RESULTS", "/tmp/survey_pipeline_results.ecsv")
    config = SearchConfiguration()
    # KB_GATE_GRID_SCALE=n thins both grid axes by ~n (rehearsals only;
    # the production gate runs the full 257x129 default lattice).
    thin = max(1, int(os.environ.get("KB_GATE_GRID_SCALE", "1")))
    config.set("generator_config", {
        "name": "EclipticCenteredSearch",
        "velocities": [92.0, 526.0, max(2, 257 // thin)],
        "angles": [-np.pi / 15, np.pi / 15, max(2, 129 // thin)],
        "angle_units": "radian",
        "given_ecliptic": 0.0,
    })
    config.set("encode_num_bytes", 1)
    config.set("lh_level", 10.0)
    config.set("num_obs", 10)
    # Defaults kept deliberately: sigmaG_filter=True (host-side batched
    # re-filter), near_dup_thresh=10 (grid prefilter), max_results=100k.
    # DBSCAN-"all" on the post-sigma-G row count is the reference default
    # but quadratic-memory-hostile at survey scale; nn_start_end is the
    # production choice for large grids (SNS-style sweep).
    config.set("cluster_type", "nn_start_end")
    # eps is a pixel scale: 20 px on the production 4k frame. Rehearsal
    # frames pack the same 20 objects into a smaller area (fast objects all
    # start in a narrow band so their reach stays interior), so an unscaled
    # eps merges DISTINCT objects into one cluster and the gate "misses"
    # objects that were found perfectly well.
    config.set("cluster_eps", CLUSTER_EPS)
    config.set("coadds", ["mean", "median", "sum"])
    config.set("stamp_radius", 10)
    config.set("result_filename", out_path)
    config.set("save_config", False)
    # KB_GATE_DEBUG=1: keep every filtered row tagged by the filter that
    # removed it, so a missed injection can be traced to the phase that
    # dropped it (rehearsal-only; tracking doubles host row memory).
    debug = os.environ.get("KB_GATE_DEBUG") == "1"
    if debug:
        config.set("track_filtered", True)

    # Production survey path: per-row-tile search (KB_SEARCH_CKPT_DIR)
    # bounds device memory per tile AND makes the search resumable — an
    # untiled 4k full-frame assembly would share HBM with the ~8 GB
    # packed kernel stream. Rehearsals at small frames run untiled
    # unless the env var is set explicitly.
    if HW >= 2048 and not os.environ.get("KB_SEARCH_CKPT_DIR"):
        ckpt_dir = "/tmp/kb_pipeline_gate_ckpt"
        os.makedirs(ckpt_dir, exist_ok=True)
        for name in os.listdir(ckpt_dir):
            os.remove(os.path.join(ckpt_dir, name))
        os.environ["KB_SEARCH_CKPT_DIR"] = ckpt_dir

    runner = SearchRunner()
    t1 = time.time()
    results = runner.run_search(config, stack)
    t_pipeline = time.time() - t1
    print(f"pipeline {t_pipeline:.1f}s -> {len(results)} final rows", flush=True)

    phases = {
        name: round(t[1] - t[0], 2)
        for name, t in runner.phase_times.items()
        if t[1] is not None
    }
    rss_peak = max(m[1] for m in runner.phase_memory.values() if m[1] is not None)
    print("PHASES " + json.dumps(phases), flush=True)
    print(f"peak RSS {rss_peak / 2**30:.1f} GiB", flush=True)

    # Every injected object must be present in the FINAL results (after
    # sigma-G, clustering, stamps, file write). The end-position tolerance
    # scales with the (possibly thinned) grid's velocity step.
    speed_step = (526.0 - 92.0) / (max(2, 257 // thin) - 1)
    tol_end = max(4.0, 0.55 * speed_step * float(zeroed[-1]))
    missed = [
        obj for obj in objects
        if not recovered(results, obj, zeroed, tol_end, cluster_eps=CLUSTER_EPS)
    ]
    for obj in missed:
        print(f"MISSED object x={obj[0]:.0f} y={obj[1]:.0f} vx={obj[2]:.1f} vy={obj[3]:.1f} flux={obj[4]}")
        if debug and results.track_filtered:
            for label, tbl in results.filtered.items():
                if len(tbl) and recovered(tbl, obj, zeroed, tol_end, cluster_eps=CLUSTER_EPS):
                    print(f"  -> present in rows filtered by: {label}")
            _dump_neighborhood(obj, results, zeroed)
    assert not missed, f"{len(missed)}/{len(objects)} injected objects missing from final results"

    # The stamp columns exist and the results file reads back.
    assert "coadd_mean" in results.colnames and "stamp" in results.colnames
    loaded = Results.read_table(out_path)
    assert len(loaded) == len(results)
    state = {
        "t_build": round(t_build, 1),
        "t_pipeline": round(t_pipeline, 1),
        "phases": phases,
        "rows_final": len(results),
        "objects": len(objects),
        "recovered": len(objects) - len(missed),
        "peak_rss_gib": round(rss_peak / 2**30, 1),
    }
    print("PIPELINE GATE PASSED " + json.dumps(state), flush=True)


def _dump_neighborhood(obj, results, zeroed_times, radius=25.0, top=6):
    """Debug aid: the highest-lh rows near a missed object's start pixel in
    the final table and in every tracked filtered table, so a miss can be
    attributed to the row that out-competed the object (KB_GATE_DEBUG=1)."""
    x, y = obj[0], obj[1]
    dt = float(zeroed_times[-1])
    tables = [("FINAL", results)] + list(results.filtered.items())
    for label, tbl in tables:
        if len(tbl) == 0:
            continue
        rx = np.asarray(tbl["x"], dtype=float)
        ry = np.asarray(tbl["y"], dtype=float)
        near = np.where((np.abs(rx - x) <= radius) & (np.abs(ry - y) <= radius))[0]
        if len(near) == 0:
            continue
        lh = np.asarray(tbl["likelihood"], dtype=float)[near]
        order = near[np.argsort(-lh)][:top]
        print(f"  [{label}] {len(near)} rows within {radius:.0f}px of start:")
        for i in order:
            ex = float(tbl["x"][i]) + float(tbl["vx"][i]) * dt
            ey = float(tbl["y"][i]) + float(tbl["vy"][i]) * dt
            print(
                f"    x={int(tbl['x'][i])} y={int(tbl['y'][i])} "
                f"vx={float(tbl['vx'][i]):.2f} vy={float(tbl['vy'][i]):.2f} "
                f"end=({ex:.1f},{ey:.1f}) lh={float(tbl['likelihood'][i]):.2f} "
                f"obs={int(tbl['obs_count'][i])}"
            )


if __name__ == "__main__":
    main()
