"""Small shared utility functions (reference: src/kbmod/util_functions.py)."""

import numpy as np

__all__ = ["get_matched_obstimes", "mjd_to_day", "unique_obstimes_and_indices", "unravel_results"]


def get_matched_obstimes(obstimes, query_times, threshold=0.0007):
    """For each query time, the index of the closest obstime within
    ``threshold`` days, or -1.

    Parameters
    ----------
    obstimes : array-like
        The observation times (MJD), assumed sorted ascending.
    query_times : array-like
        The times to match.
    threshold : float
        Maximum allowed difference in days (default ~1 minute).
    """
    obstimes = np.asarray(obstimes, dtype=float)
    query_times = np.atleast_1d(np.asarray(query_times, dtype=float))

    # Bound the array by +/- inf so every query has neighbors on both sides.
    all_times = np.concatenate([[-np.inf], obstimes, [np.inf]])
    right = np.searchsorted(all_times, query_times, side="left")
    right_dist = np.abs(all_times[right] - query_times)
    left_dist = np.abs(all_times[right - 1] - query_times)

    use_right = left_dist > right_dist
    min_dist = np.where(use_right, right_dist, left_dist)
    min_inds = np.where(use_right, right, right - 1)

    # Shift back for the -inf sentinel; -1 marks no match within threshold.
    return np.where(min_dist <= threshold, min_inds - 1, -1)


def mjd_to_day(mjd):
    """Convert an MJD timestamp to a YYYY-MM-DD day string (UTC)."""
    from kbmod_tpu.geom.time_utils import mjd_to_datetime

    return mjd_to_datetime(mjd).strftime("%Y-%m-%d")


def unique_obstimes_and_indices(obstimes, threshold=0.0007):
    """Group observation times that fall within ``threshold`` days.

    Returns
    -------
    (unique_times, per_time_indices) : (list of float, list of list of int)
    """
    obstimes = np.asarray(obstimes, dtype=float)
    order = np.argsort(obstimes)
    unique_times = []
    groups = []
    for idx in order:
        t = obstimes[idx]
        if unique_times and abs(t - unique_times[-1]) <= threshold:
            groups[-1].append(int(idx))
        else:
            unique_times.append(float(t))
            groups.append([int(idx)])
    return unique_times, groups


def unravel_results(results, obstimes=None):
    """Flatten a Results table into per-observation rows (one row per valid
    observation of each trajectory), for tracklet-style output."""
    rows = []
    for i in range(len(results)):
        x = results["x"][i]
        y = results["y"][i]
        vx = results["vx"][i]
        vy = results["vy"][i]
        valid = results["obs_valid"][i] if "obs_valid" in results.colnames else None
        if obstimes is None:
            continue
        for t_idx, t in enumerate(obstimes):
            if valid is not None and not valid[t_idx]:
                continue
            dt = t - obstimes[0]
            rows.append(
                {
                    "result_idx": i,
                    "time": t,
                    "x": int(np.floor(x + vx * dt + 0.5)),
                    "y": int(np.floor(y + vy * dt + 0.5)),
                }
            )
    return rows
