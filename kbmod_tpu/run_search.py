"""SearchRunner: the top-level KBMOD search pipeline.

API-compatible with the reference's kbmod.run_search (src/kbmod/
run_search.py): image QA, candidate generation, the core device search,
sigma-G filtering, clustering, stamp generation, optional CNN vetting,
RA/Dec output, and results file writing — with per-phase wall-time/memory
stats and a soft timeout.

The device path differs from the reference in one structural way: the core
search returns a struct-of-arrays result set directly from the TPU kernel
(no 100k-batch host loop is needed for the raw trajectories; batching is
kept for the psi/phi curve extraction which scales with num_times).
"""

import logging
import os
import time

import numpy as np

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None

import kbmod_tpu.search as kb
from kbmod_tpu.filters.clustering_filters import apply_clustering
from kbmod_tpu.filters.clustering_grid import apply_trajectory_grid_filter
from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping, apply_clipped_sigma_g
from kbmod_tpu.filters.sns_filters import peak_offset_filter, predictive_line_cluster
from kbmod_tpu.filters.stamp_filters import append_all_stamps, append_coadds, filter_stamps_by_cnn
from kbmod_tpu.results import Results, write_results_to_files_destructive
from kbmod_tpu.trajectory_generator import create_trajectory_generator
from kbmod_tpu.trajectory_utils import predict_pixel_locations

logger = logging.getLogger("kbmod.run_search")


def _resolve_start_bounds(config, axis, image_extent):
    """Starting-pixel bounds along one axis, or None for the image default.

    Explicit ``{x,y}_pixel_bounds`` win; otherwise a positive
    ``{x,y}_pixel_buffer`` widens the image extent symmetrically so
    trajectories may start off-chip and drift on.
    """
    bounds = config[f"{axis}_pixel_bounds"]
    if bounds and len(bounds) == 2:
        return int(bounds[0]), int(bounds[1])
    buffer = config[f"{axis}_pixel_buffer"]
    if buffer and buffer > 0:
        return -int(buffer), image_extent + int(buffer)
    return None


def configure_kb_search_stack(search, config):
    """Push a SearchConfiguration's filtering, bounds, and in-kernel
    sigma-G settings into a StackSearch (binding surface of the reference's
    run_search.py:25-72)."""
    search.set_min_obs(int(config["num_obs"]))
    search.set_min_lh(config["lh_level"])
    search.set_results_per_pixel(config["results_per_pixel"])

    x_bounds = _resolve_start_bounds(config, "x", search.get_image_width())
    if x_bounds is not None:
        search.set_start_bounds_x(*x_bounds)
    y_bounds = _resolve_start_bounds(config, "y", search.get_image_height())
    if y_bounds is not None:
        search.set_start_bounds_y(*y_bounds)

    if config["sigmaG_filter"] and config["gpu_filter"]:
        lo, hi = config["sigmaG_lims"]
        logger.debug(f"In-kernel sigma-G enabled (percentiles [{lo}, {hi}]).")
        search.enable_gpu_sigmag_filter(
            np.array([lo, hi]) / 100.0,
            SigmaGClipping.find_sigma_g_coeff(lo, hi),
            config["lh_level"],
        )
    else:
        search.disable_gpu_sigmag_filter()

    # TPU-build extension: per-row-tile search checkpointing, so a killed
    # pipeline resumes mid-search instead of re-searching the whole stack
    # (the reference restarts the search phase from scratch). Env-gated to
    # keep the SearchConfiguration schema reference-identical; see
    # docs/env_vars.md.
    ckpt_dir = os.environ.get("KB_SEARCH_CKPT_DIR")
    if ckpt_dir:
        search.enable_search_checkpointing(
            ckpt_dir, tile_rows=int(os.environ.get("KB_SEARCH_CKPT_TILE_ROWS", "256"))
        )

    search.clear_results()


def check_gpu_memory(config, stack, trj_generator=None):
    """Check whether the search fits in device (HBM) memory.

    Uses the written TPU budget (:func:`kbmod_tpu.ops.search.
    estimate_search_hbm` — packed kernel stream + code planes + per-tile
    maps + compaction/gather workspaces) plus the candidate/result tables,
    replacing the reference's 2x-stack heuristic (run_search.py:75-126)
    which under-counts the interleaved word stream the TPU kernels read.
    """
    from kbmod_tpu.ops.search import estimate_search_hbm

    bytes_free = kb.get_gpu_free_memory()

    def extent(axis, image_extent):
        bounds = _resolve_start_bounds(config, axis, image_extent)
        return image_extent if bounds is None else bounds[1] - bounds[0]

    k = config["results_per_pixel"]
    over = int(os.environ.get("KB_SIGMAG_TOPK_FACTOR", "4"))
    budget = estimate_search_hbm(
        stack.num_times, stack.height, stack.width,
        encode_num_bytes=config["encode_num_bytes"],
        k_search=over * k if config["sigmaG_filter"] else k,
        tile_rows=int(os.environ.get("KB_SEARCH_CKPT_TILE_ROWS", "256"))
        if os.environ.get("KB_SEARCH_CKPT_DIR")
        else extent("y", stack.height),
    )

    # Candidate offset tables ride to the device (2 int32 per (cand, time));
    # result rows do NOT — assembly compacts on device into host numpy, and
    # the per-tile device slot maps are already the topk_maps budget term.
    num_candidates = 0 if trj_generator is None else len(trj_generator)
    candidate_memory = 2 * 4 * num_candidates * stack.num_times

    needed = budget["total"] + candidate_memory
    logger.debug(
        f"Device memory check: need {needed / 2**30:.2f} GiB "
        f"({ {kk: round(vv / 2**30, 2) for kk, vv in budget.items()} }), "
        f"free {bytes_free / 2**30:.2f} GiB"
    )
    return bytes_free > needed


class SearchRunner:
    """Runs the KBMOD grid search with per-phase stats and soft timeout."""

    def __init__(self, config=None):
        self.phase_times = {}
        self.phase_memory = {}
        self.timeout = None
        self.debug = False
        self.config = None
        self.apply_config(config)

    def apply_config(self, config):
        if config is None:
            return
        config.validate()
        self.config = config
        if config["debug"]:
            logging.basicConfig(level=logging.DEBUG)
            self.debug = True
        if self.timeout is None and config["timeout_hours"] is not None:
            self.timeout = time.time() + config["timeout_hours"] * 3600.0
            logger.debug(f"Search will timeout at {time.ctime(self.timeout)}.")

    def _check_timeout(self):
        """Soft timeout, checked only between phases."""
        if self.timeout is not None and time.time() > self.timeout:
            self.display_phase_stats()
            raise TimeoutError("Search has exceeded the maximum allowed time.")

    def _rss(self):
        if psutil is None:
            return 0
        return psutil.Process().memory_info().rss

    def _maybe_start_profiler(self):
        """Optional device tracing: set KB_PROFILE_DIR to capture a
        jax.profiler trace of the whole run (the TPU-native analog of the
        reference's DebugTimer-only observability; SURVEY.md §5.1)."""
        profile_dir = os.environ.get("KB_PROFILE_DIR")
        if profile_dir and not getattr(self, "_profiling", False):
            import jax

            jax.profiler.start_trace(profile_dir)
            self._profiling = True

    def _maybe_stop_profiler(self):
        if getattr(self, "_profiling", False):
            import jax

            jax.profiler.stop_trace()
            self._profiling = False

    def _start_phase(self, phase_name):
        self._check_timeout()
        logger.debug(f"Starting {phase_name}.")
        self.phase_times[phase_name] = [time.time(), None]
        self.phase_memory[phase_name] = [self._rss(), None]

    def _end_phase(self, phase_name):
        self._check_timeout()
        if phase_name not in self.phase_times:
            raise KeyError(f"Phase {phase_name} has not been started.")
        self.phase_times[phase_name][1] = time.time()
        delta_t = self.phase_times[phase_name][1] - self.phase_times[phase_name][0]
        logger.debug(f"Finished {phase_name} in {delta_t} seconds.")
        self.phase_memory[phase_name][1] = self._rss()

    def display_phase_stats(self):
        for phase in self.phase_times:
            print(f"{phase}:")
            if self.phase_times[phase][1] is not None:
                print(f"    Time (sec) = {self.phase_times[phase][1] - self.phase_times[phase][0]}")
            else:
                print("    Time (sec) = Unfinished")
            print(f"    Memory Start (mb) = {self.phase_memory[phase][0] / (1024.0 * 1024.0)}")
            if self.phase_memory[phase][1] is not None:
                print(f"    Memory End (mb) = {self.phase_memory[phase][1] / (1024.0 * 1024.0)}")
            else:
                print("    Memory End (mb) = Unfinished")

    def load_and_filter_results(self, search, config, batch_size=100_000):
        """Compile raw search results into a Results table, attaching
        psi/phi curves and applying sigma-G + stats refiltering in batches
        (reference run_search.py:251-337)."""
        self._start_phase("load_and_filter_results")
        num_times = search.get_num_images()

        bnds = config["sigmaG_lims"] if config["sigmaG_lims"] is not None else [25, 75]
        clipper = SigmaGClipping(bnds[0], bnds[1], 2, config["clip_negative"])

        keep = Results(track_filtered=config["track_filtered"])

        result_list = search.results  # TrajectoryList (struct of arrays)
        num_raw = len(result_list)
        logger.info(f"Device search produced {num_raw} raw trajectories.")
        if num_raw < 1:
            self._end_phase("load_and_filter_results")
            return keep
        arrays = result_list.get_arrays()
        logger.info(f"Raw likelihood range: [{arrays['lh'][-1]}, {arrays['lh'][0]}]")

        # Near-duplicate prefilter on the raw trajectories (vectorized grid).
        if config["near_dup_thresh"] is not None and config["near_dup_thresh"] > 0:
            self._start_phase("near duplicate removal")
            bin_width = config["near_dup_thresh"]
            zt = np.asarray(search.zeroed_times)
            max_dt = float(np.max(zt) - np.min(zt))
            arrays, _ = apply_trajectory_grid_filter(arrays, bin_width, max_dt)
            logger.info(
                f"Near-duplicate grid prefilter (bin={bin_width}px, dt={max_dt}): "
                f"{len(arrays['x'])} of {num_raw} kept."
            )
            self._end_phase("near duplicate removal")

        num_kept = len(arrays["x"])
        batches = []
        batch_start = 0
        while batch_start < num_kept:
            self._check_timeout()
            batch_end = min(batch_start + batch_size, num_kept)
            batch = {k: v[batch_start:batch_end] for k, v in arrays.items()}
            from kbmod_tpu.search.trajectory_list import TrajectoryList

            batch_results = Results.from_trajectories(
                TrajectoryList(batch), track_filtered=config["track_filtered"]
            )

            if config["generate_psi_phi"]:
                psi_phi_batch = search.get_all_psi_phi_curves(TrajectoryList(batch))
                batch_results.add_psi_phi_data(psi_phi_batch[:, :num_times], psi_phi_batch[:, num_times:])

            if config["sigmaG_filter"]:
                if not config["generate_psi_phi"]:
                    raise ValueError("Unable to do sigma-G filtering without psi and phi curves.")
                apply_clipped_sigma_g(clipper, batch_results)
                row_mask = np.asarray(batch_results["obs_count"]) >= config["num_obs"]
                if config["lh_level"] > 0.0:
                    row_mask = row_mask & (np.asarray(batch_results["likelihood"]) >= config["lh_level"])
                batch_results.filter_rows(row_mask, "sigma-g")
                logger.debug(f"After sigma-G filtering, batch size = {len(batch_results)}")

            batches.append(batch_results)
            batch_start += batch_size

        # One vstack for the whole loop: per-batch extend() is quadratic
        # in total rows (survey scale walks ~85 batches of 100k rows).
        keep.extend_batches(batches)
        self._end_phase("load_and_filter_results")
        return keep

    def do_core_search(self, config, stack, trj_generator):
        """Build the psi/phi array, run the device search, and load the
        filtered results (reference run_search.py:339-394)."""
        self._start_phase("do_core_search")

        use_gpu = not config["cpu_only"]
        if use_gpu and kb.kb_has_gpu() and not check_gpu_memory(config, stack, trj_generator):
            raise ValueError("Insufficient device memory to conduct the search.")

        search = kb.StackSearch(
            stack.sci,
            stack.var,
            stack.psfs,
            stack.zeroed_times,
            config["encode_num_bytes"],
        )
        configure_kb_search_stack(search, config)

        self._start_phase("grid search")
        logger.debug(f"Trajectory Generator: {trj_generator}")
        candidates = kb.TrajectoryList(
            {
                "x": np.zeros(len(trj_generator), dtype=np.int32),
                "y": np.zeros(len(trj_generator), dtype=np.int32),
                "vx": trj_generator.velocity_arrays()[0],
                "vy": trj_generator.velocity_arrays()[1],
                "lh": np.zeros(len(trj_generator), dtype=np.float32),
                "flux": np.zeros(len(trj_generator), dtype=np.float32),
                "obs_count": np.zeros(len(trj_generator), dtype=np.int32),
            }
        )
        logger.debug(f"Using {len(candidates)} candidates per pixel.")
        try:
            search.search_all(candidates, use_gpu)
        except Exception:
            logger.error("Error during grid search. Cleaning up memory.")
            del search
            raise
        self._end_phase("grid search")

        keep = self.load_and_filter_results(search, config)
        del search
        self._end_phase("do_core_search")
        return keep

    def _truncate_to_max_results(self, keep, config):
        """Cap the row count at config max_results (best likelihood first),
        after all trajectory-space filtering and before stamps are attached
        (reference run_search.py:482-490 for the ordering contract)."""
        limit = config["max_results"]
        if limit <= -1 or len(keep) <= limit:
            return
        self._start_phase("max_results")
        logger.info(f"Keeping the {limit} highest-likelihood of {len(keep)} rows.")
        keep.sort("likelihood", descending=True)
        keep.filter_rows(np.arange(limit), "max_results")
        self._end_phase("max_results")

    def _stamp_phase(self, keep, config, stack):
        """Attach coadd stamps, then run every stamp-space vetting step.

        One umbrella phase wraps four config-gated sub-steps; the set of
        steps and their order is the reference's pipeline contract
        (run_search.py:492-531): coadds (always, plus the legacy "stamp"
        alias), peak-offset veto, predictive line clustering, CNN vetting,
        and optionally the full per-time stamp cube.
        """
        radius = config["stamp_radius"]
        legacy = config["stamp_type"]
        self._start_phase("stamp generation")

        self._start_phase("appending co-adds")
        append_coadds(keep, stack, set(config["coadds"]) | {legacy}, radius,
                      nightly=config["nightly_coadds"])
        if f"coadd_{legacy}" in keep.colnames:
            keep.table["stamp"] = keep.table[f"coadd_{legacy}"]
        self._end_phase("appending co-adds")

        if config["peak_offset_max"] is not None:
            self._start_phase("peak_offset_filtering")
            peak_offset_filter(keep, peak_offset_max=config["peak_offset_max"])
            self._end_phase("peak_offset_filtering")

        if config["pred_line_cluster"]:
            params = config["pred_line_params"]
            if len(params) != 3:
                raise ValueError(f"pred_line_params needs [dist_lim, min_samples, proc_dist], got {params}")
            self._start_phase("predictive_line_clustering")
            predictive_line_cluster(keep, stack.times, *params)
            self._end_phase("predictive_line_clustering")

        if config["cnn_filter"]:
            if config["cnn_model"] is None:
                raise ValueError("cnn_filter requires cnn_model.")
            self._start_phase("cnn filtering")
            filter_stamps_by_cnn(
                keep,
                config["cnn_model"],
                model_type=config["cnn_model_type"],
                coadd_type=config["cnn_coadd_type"],
                stamp_radius=config["cnn_stamp_radius"],
                coadd_radius=radius,
            )
            self._end_phase("cnn filtering")

        if config["save_all_stamps"]:
            append_all_stamps(keep, stack, radius)
        self._end_phase("stamp generation")

    def run_search(self, config, stack, trj_generator=None, workunit=None, extra_meta=None):
        """The highest-level entry: search an ImageStackPy with a
        SearchConfiguration (reference run_search.py:396-593)."""
        self.apply_config(config)
        if self.debug:
            logger.debug(f"Accelerator Enabled: {kb.HAS_CUDA}")
            logger.debug(kb.stat_gpu_memory_mb())
            logger.debug(str(config))

        # Image QA: drop overly-masked images.
        if config["max_masked_pixels"] < 1.0:
            keep_mask = stack.get_masked_fractions() <= config["max_masked_pixels"]
            if workunit is not None:
                workunit.filter_images(keep_mask)
                stack = workunit.im_stack
            else:
                stack.filter_images(keep_mask)
        logger.debug(f"Searching over {stack.num_times} images after the obs-validity cut.")

        # num_obs can never exceed the number of usable (<90% masked)
        # images; -1 means "derive it from the stack".
        usable = int(np.count_nonzero(stack.get_masked_fractions() < 0.9))
        if usable == 0:
            raise ValueError("No valid images in input.")
        if config["num_obs"] == -1 or config["num_obs"] >= usable:
            logger.info(f"num_obs={config['num_obs']} capped to the {usable} usable images.")
            config.set("num_obs", usable)

        self._start_phase("KBMOD")
        self._maybe_start_profiler()

        trj_generator = trj_generator or create_trajectory_generator(config, work_unit=None)
        keep = self.do_core_search(config, stack, trj_generator)

        if config["do_clustering"] and len(keep) > 1:
            self._start_phase("clustering")
            cluster_params = {
                key: config[key] for key in ("cluster_type", "cluster_eps", "cluster_v_scale")
            }
            cluster_params["times"] = np.asarray(stack.times)
            apply_clustering(keep, cluster_params)
            self._end_phase("clustering")

        self._truncate_to_max_results(keep, config)
        self._stamp_phase(keep, config, stack)

        # Sky-coordinate output from the WorkUnit's WCS information.
        if workunit is not None:
            keep.wcs = workunit.wcs
            if config["compute_ra_dec"]:
                self._start_phase("append_positions_to_results")
                append_positions_to_results(workunit, keep)
                self._end_phase("append_positions_to_results")

        # Save results + metadata.
        self._start_phase("write results")
        meta_to_save = dict(extra_meta) if extra_meta is not None else {}
        if workunit is not None:
            meta_to_save.update(
                workunit.get_constituent_meta(["visit", "filter", "data_loc", "dataId", "color_scale"])
            )
        meta_to_save["num_img"] = stack.num_times
        meta_to_save["dims"] = (stack.width, stack.height)
        keep.set_mjd_utc_mid(np.array(stack.times))

        if config["result_filename"] is not None:
            write_results_to_files_destructive(
                config["result_filename"],
                keep,
                extra_meta=meta_to_save,
                separate_col_files=config["separate_col_files"],
                drop_columns=config["drop_columns"],
                overwrite=True,
            )
            if config["save_config"]:
                # The run's exact config goes to a <stem>_provenance/ dir
                # next to the results file (same layout the reference's
                # readers expect; run_search.py:575-585).
                from pathlib import Path

                result_path = Path(config["result_filename"])
                stem = result_path.name
                for ext in keep._supported_formats:
                    if stem.endswith(ext):
                        stem = stem[: -len(ext)]
                        break
                provenance = result_path.parent / f"{stem}_provenance"
                provenance.mkdir(parents=True, exist_ok=True)
                config.to_file(str(provenance / f"{stem}_config.yaml"), overwrite=True)
        self._end_phase("write results")

        self._end_phase("KBMOD")
        self._maybe_stop_profiler()
        if config["debug"]:
            self.display_phase_stats()
        return keep

    def run_search_from_work_unit(self, work):
        """Run a search from a WorkUnit (derives the trajectory generator's
        ecliptic angle from the WCS; applies color scaling)."""
        trj_generator = create_trajectory_generator(work.config, work_unit=work)
        if work.config["color_scale"] is not None:
            work.im_stack.apply_color_scaling(work.config["color_scale"])
        return self.run_search(work.config, work.im_stack, trj_generator=trj_generator, workunit=work)


def append_positions_to_results(workunit, results):
    """Append predicted pixel and (RA, Dec) positions per time to the
    results (reference run_search.py:620-689): global_ra/global_dec from
    the common WCS and img_ra/img_dec in the original frame (inverting the
    EBD parallax correction when the WorkUnit is reprojected)."""
    from kbmod_tpu.reprojection_utils import invert_correct_parallax_vectorized
    from kbmod_tpu.geom.wcs import SkyCoordLite

    num_results = len(results)
    if num_results == 0:
        return

    num_times = workunit.im_stack.num_times
    times = workunit.im_stack.zeroed_times

    xp = predict_pixel_locations(times, results["x"], results["vx"], as_int=False, centered=False)
    yp = predict_pixel_locations(times, results["y"], results["vy"], as_int=False, centered=False)
    results.table["pred_x"] = xp
    results.table["pred_y"] = yp

    all_ra = np.zeros((num_results, num_times))
    all_dec = np.zeros((num_results, num_times))

    if workunit.wcs is not None:
        logger.info("Common WCS present - computing global_ra/global_dec for every result row.")
        ra, dec = workunit.wcs.pixel_to_world_values(xp, yp)
        results.table["global_ra"] = ra
        results.table["global_dec"] = dec

        if workunit.reprojected and workunit.reprojection_frame != "ebd":
            logger.warning("WorkUnit was not reprojected to EBD space; per-image img_ra/img_dec are omitted.")
            all_ra = ra
            all_dec = dec
        elif workunit.reprojected:
            obstimes = workunit.get_all_obstimes()
            for time_idx in range(num_times):
                coords = SkyCoordLite(ra[:, time_idx], dec[:, time_idx])
                coords.distance_au = np.full(num_results, workunit.barycentric_distance)
                original = invert_correct_parallax_vectorized(
                    coords, obstimes=obstimes[time_idx], point_on_earth=workunit.observatory
                )
                all_ra[:, time_idx] = original.ra_deg
                all_dec[:, time_idx] = original.dec_deg
        else:
            all_ra = ra
            all_dec = dec
    else:
        logger.info("No common WCS found. Computing img_ra/img_dec from per-image WCSes.")
        for time_idx in range(num_times):
            wcs = workunit.get_wcs(time_idx)
            if wcs is not None:
                ra, dec = wcs.pixel_to_world_values(xp[:, time_idx], yp[:, time_idx])
                all_ra[:, time_idx] = ra
                all_dec[:, time_idx] = dec

    results.table["img_ra"] = all_ra
    results.table["img_dec"] = all_dec
