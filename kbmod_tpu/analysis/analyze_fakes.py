"""Recovery-rate analysis for inserted fakes.

Reference: src/kbmod/analysis/analyze_fakes.py.
"""

import numpy as np

from kbmod_tpu.trajectory_utils import match_trajectory_sets

__all__ = ["compute_recovery_rates", "recovery_report"]


def compute_recovery_rates(fake_trjs, results, times, threshold=5.0, by=None):
    """Fraction of fake trajectories recovered in a Results set.

    Parameters
    ----------
    fake_trjs : list of Trajectory
        The inserted fakes.
    results : Results
        The search output.
    times : array
        Zero-shifted sample times for path matching.
    threshold : float
        Mean path distance (pixels) to count as recovered.
    by : array, optional
        A per-fake grouping value (e.g. magnitude bins); when given,
        returns a dict group -> recovery fraction.

    Returns
    -------
    float or dict
    """
    if len(fake_trjs) == 0:
        return {} if by is not None else 0.0
    base = results.make_trajectory_list()
    if len(base) == 0:
        recovered = np.zeros(len(fake_trjs), dtype=bool)
    else:
        sample_times = [0.0, float(np.max(times)) / 2.0, float(np.max(times))]
        matches = match_trajectory_sets(fake_trjs, base, threshold, times=sample_times)
        recovered = matches >= 0

    if by is None:
        return float(np.mean(recovered))
    by = np.asarray(by)
    return {val: float(np.mean(recovered[by == val])) for val in np.unique(by)}


def recovery_report(fake_trjs, results, times, threshold=5.0):
    """Print a recovery summary and return the per-fake recovery mask."""
    base = results.make_trajectory_list()
    sample_times = [0.0, float(np.max(times)) / 2.0, float(np.max(times))]
    if len(base) == 0:
        matches = np.full(len(fake_trjs), -1)
    else:
        matches = match_trajectory_sets(fake_trjs, base, threshold, times=sample_times)
    recovered = matches >= 0
    print(f"Recovered {np.count_nonzero(recovered)} / {len(fake_trjs)} fakes.")
    for i, trj in enumerate(fake_trjs):
        status = f"-> result {matches[i]}" if recovered[i] else "MISSED"
        print(f"  fake {i}: x={trj.x} y={trj.y} vx={trj.vx:.2f} vy={trj.vy:.2f} flux={trj.flux:.1f} {status}")
    return recovered
