"""The Trajectory data type.

Behavior-compatible with the reference's C++ POD struct
(src/kbmod/search/common.h:55-115): a candidate linear trajectory with a
starting pixel (x, y), velocities (vx, vy) in pixels/day, and evaluation
statistics (lh, flux, obs_count). Velocities round-trip through float32 so
pixel predictions match the reference's float storage.
"""

import math
import numpy as np

__all__ = ["Trajectory", "trajectories_to_arrays", "arrays_to_trajectories"]


class Trajectory:
    __slots__ = ("x", "y", "vx", "vy", "lh", "flux", "obs_count")

    def __init__(self, x=0, y=0, vx=0.0, vy=0.0, flux=0.0, lh=0.0, obs_count=0):
        self.x = int(x)
        self.y = int(y)
        self.vx = float(np.float32(vx))
        self.vy = float(np.float32(vy))
        self.flux = float(flux)
        self.lh = float(lh)
        self.obs_count = int(obs_count)

    # Position prediction: centered=True starts from the pixel center
    # (common.h:71-79).
    def get_x_pos(self, time, centered=True):
        return self.x + time * self.vx + (0.5 if centered else 0.0)

    def get_y_pos(self, time, centered=True):
        return self.y + time * self.vy + (0.5 if centered else 0.0)

    def get_x_index(self, time):
        return int(math.floor(self.get_x_pos(time, True)))

    def get_y_index(self, time):
        return int(math.floor(self.get_y_pos(time, True)))

    def is_valid(self):
        return (
            math.isfinite(self.vx)
            and math.isfinite(self.vy)
            and math.isfinite(self.lh)
            and math.isfinite(self.flux)
            and self.obs_count >= 0
        )

    def clear(self):
        self.x = 0
        self.y = 0
        self.vx = 0.0
        self.vy = 0.0
        self.lh = 0.0
        self.flux = 0.0
        self.obs_count = 0

    def to_string(self):
        return (
            f"lh: {self.lh:.6f} flux: {self.flux:.6f} x: {self.x} y: {self.y}"
            f" vx: {self.vx:.6f} vy: {self.vy:.6f} obs_count: {self.obs_count}"
        )

    def __str__(self):
        return self.to_string()

    def __repr__(self):
        return f"Trajectory({self.to_string()})"

    def __eq__(self, other):
        if not isinstance(other, Trajectory):
            return NotImplemented
        return (
            self.x == other.x
            and self.y == other.y
            and self.vx == other.vx
            and self.vy == other.vy
            and self.lh == other.lh
            and self.flux == other.flux
            and self.obs_count == other.obs_count
        )

    # Pickle support (mirrors the reference's py::pickle lambda).
    def __getstate__(self):
        return (self.vx, self.vy, self.lh, self.flux, self.x, self.y, self.obs_count)

    def __setstate__(self, state):
        self.vx, self.vy, self.lh, self.flux, self.x, self.y, self.obs_count = state


def trajectories_to_arrays(trajectories):
    """Convert a list of Trajectory objects to a struct-of-arrays dict."""
    n = len(trajectories)
    out = {
        "x": np.zeros(n, dtype=np.int32),
        "y": np.zeros(n, dtype=np.int32),
        "vx": np.zeros(n, dtype=np.float32),
        "vy": np.zeros(n, dtype=np.float32),
        "lh": np.zeros(n, dtype=np.float32),
        "flux": np.zeros(n, dtype=np.float32),
        "obs_count": np.zeros(n, dtype=np.int32),
    }
    for i, trj in enumerate(trajectories):
        out["x"][i] = trj.x
        out["y"][i] = trj.y
        out["vx"][i] = trj.vx
        out["vy"][i] = trj.vy
        out["lh"][i] = trj.lh
        out["flux"][i] = trj.flux
        out["obs_count"][i] = trj.obs_count
    return out


def arrays_to_trajectories(arrays):
    """Convert a struct-of-arrays dict back to a list of Trajectory."""
    n = len(arrays["x"])
    return [
        Trajectory(
            x=int(arrays["x"][i]),
            y=int(arrays["y"][i]),
            vx=float(arrays["vx"][i]),
            vy=float(arrays["vy"][i]),
            flux=float(arrays["flux"][i]),
            lh=float(arrays["lh"][i]),
            obs_count=int(arrays["obs_count"][i]),
        )
        for i in range(n)
    ]
