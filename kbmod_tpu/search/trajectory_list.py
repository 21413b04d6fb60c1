"""TrajectoryList: a resizable container of Trajectory results.

Behavior-compatible with src/kbmod/search/trajectory_list.{h,cpp}. Stored
internally as a struct-of-arrays numpy dict so sorting/filtering are
vectorized; Trajectory objects are materialized on access.
"""

import numpy as np

from kbmod_tpu.search.trajectory import Trajectory, trajectories_to_arrays, arrays_to_trajectories

_FIELDS = ("x", "y", "vx", "vy", "lh", "flux", "obs_count")


def _empty_arrays(n):
    return {
        "x": np.zeros(n, dtype=np.int32),
        "y": np.zeros(n, dtype=np.int32),
        "vx": np.zeros(n, dtype=np.float32),
        "vy": np.zeros(n, dtype=np.float32),
        "lh": np.zeros(n, dtype=np.float32),
        "flux": np.zeros(n, dtype=np.float32),
        "obs_count": np.zeros(n, dtype=np.int32),
    }


class TrajectoryList:
    def __init__(self, data=0):
        if isinstance(data, int):
            self._arrays = _empty_arrays(data)
        elif isinstance(data, dict):
            self._arrays = {k: np.asarray(data[k]) for k in _FIELDS}
        else:
            self._arrays = trajectories_to_arrays(list(data))
        self._on_gpu = False

    # --- size / access ---

    def __len__(self):
        return len(self._arrays["x"])

    def get_size(self):
        return len(self)

    def get_arrays(self):
        """kbmod_tpu extension: direct struct-of-arrays access."""
        return self._arrays

    def get_trajectory(self, index):
        if index < 0 or index >= len(self):
            raise IndexError(f"Index {index} out of bounds.")
        a = self._arrays
        return Trajectory(
            x=int(a["x"][index]),
            y=int(a["y"][index]),
            vx=float(a["vx"][index]),
            vy=float(a["vy"][index]),
            flux=float(a["flux"][index]),
            lh=float(a["lh"][index]),
            obs_count=int(a["obs_count"][index]),
        )

    def set_trajectory(self, index, trj):
        if index < 0 or index >= len(self):
            raise IndexError(f"Index {index} out of bounds.")
        for f in _FIELDS:
            self._arrays[f][index] = getattr(trj, f)

    def set_trajectories(self, trajectories):
        self._arrays = trajectories_to_arrays(list(trajectories))

    def set_arrays(self, arrays):
        """kbmod_tpu extension: replace the contents from a struct-of-arrays
        dict (pixel-major search output)."""
        self._arrays = {k: np.asarray(arrays[k]) for k in _FIELDS}

    def get_list(self):
        return arrays_to_trajectories(self._arrays)

    def get_batch(self, start, count):
        if start < 0:
            raise RuntimeError("start must be >= 0")
        end = min(start + count, len(self))
        return arrays_to_trajectories({k: v[start:end] for k, v in self._arrays.items()})

    def __getitem__(self, index):
        return self.get_trajectory(index)

    # --- mutation ---

    def resize(self, new_size):
        old = self._arrays
        n_copy = min(len(self), new_size)
        self._arrays = _empty_arrays(new_size)
        for f in _FIELDS:
            self._arrays[f][:n_copy] = old[f][:n_copy]

    def reset_all(self):
        self._arrays = _empty_arrays(len(self))

    def sort_by_likelihood(self):
        order = np.argsort(-self._arrays["lh"], kind="stable")
        self._arrays = {k: v[order] for k, v in self._arrays.items()}

    def sort_by_obs_count(self):
        order = np.argsort(-self._arrays["obs_count"], kind="stable")
        self._arrays = {k: v[order] for k, v in self._arrays.items()}

    def filter_by_likelihood(self, min_likelihood):
        keep = self._arrays["lh"] >= min_likelihood
        self._arrays = {k: v[keep] for k, v in self._arrays.items()}

    def filter_by_obs_count(self, min_obs_count):
        keep = self._arrays["obs_count"] >= min_obs_count
        self._arrays = {k: v[keep] for k, v in self._arrays.items()}

    def filter_by_mask(self, keep):
        keep = np.asarray(keep, dtype=bool)
        self._arrays = {k: v[keep] for k, v in self._arrays.items()}

    def assert_valid(self):
        a = self._arrays
        ok = (
            np.isfinite(a["vx"])
            & np.isfinite(a["vy"])
            & np.isfinite(a["lh"])
            & np.isfinite(a["flux"])
            & (a["obs_count"] >= 0)
        )
        if not np.all(ok):
            raise RuntimeError(f"{np.count_nonzero(~ok)} invalid trajectories in list.")

    @staticmethod
    def estimate_memory(num_elements):
        """Estimated bytes for num_elements trajectories (4 bytes x 7
        fields; common.h:55-67 layout)."""
        return int(num_elements) * 28

    # --- device lifecycle (no-ops: numpy-resident results) ---

    @property
    def on_gpu(self):
        return self._on_gpu

    def move_to_gpu(self):
        self._on_gpu = True

    def move_to_cpu(self):
        self._on_gpu = False


def _extract(trajectories, field, dtype):
    if isinstance(trajectories, TrajectoryList):
        return trajectories.get_arrays()[field].astype(dtype).tolist()
    return [dtype(getattr(t, field)) for t in trajectories]


def extract_all_trajectory_x(trajectories):
    return _extract(trajectories, "x", int)


def extract_all_trajectory_y(trajectories):
    return _extract(trajectories, "y", int)


def extract_all_trajectory_vx(trajectories):
    return _extract(trajectories, "vx", float)


def extract_all_trajectory_vy(trajectories):
    return _extract(trajectories, "vy", float)


def extract_all_trajectory_lh(trajectories):
    return _extract(trajectories, "lh", float)


def extract_all_trajectory_flux(trajectories):
    return _extract(trajectories, "flux", float)


def extract_all_trajectory_obs_count(trajectories):
    return _extract(trajectories, "obs_count", int)
