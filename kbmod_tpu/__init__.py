"""kbmod_tpu: a TPU-native (JAX/XLA/Pallas) shift-and-stack moving-object
detection framework with the capabilities of KBMOD (dirac-institute/kbmod).

Given a time series of sky images (science + variance + PSF + timestamps),
kbmod_tpu convolves each image into per-pixel likelihood components
(psi = sci/var (x) PSF, phi = 1/var (x) PSF^2) and brute-force scores millions
of candidate linear trajectories (x, y, vx, vy) by summing psi/phi along each
trajectory's predicted path over all times:

    lh = sum(psi) / sqrt(sum(phi)),  flux = sum(psi) / sum(phi)

Everything numeric lives on-device as JAX arrays; the search kernel is a
shift-and-accumulate formulation that maps onto TPU HBM bandwidth instead of
the reference's per-thread CUDA gather (reference: src/kbmod/search/kernels/
kernels.cu:154-332).

Environment flags (mirroring the reference src/kbmod/__init__.py:16-31):
  KB_INTERACTIVE_MODE : force progress bars on/off.
  KB_LOG_LEVEL        : the default logging level.
"""

import os
import sys
import logging as _py_logging

__version__ = "0.1.0"


def is_interactive():
    """Check whether we are running in an interactive session (used to gate
    progress bars). Mirrors reference src/kbmod/__init__.py:16-31."""
    if "KB_INTERACTIVE_MODE" in os.environ:
        return os.environ["KB_INTERACTIVE_MODE"].lower() in ("1", "true", "yes")
    # Heuristic: attached tty or an IPython kernel.
    try:
        if hasattr(sys, "ps1"):
            return True
        return sys.stdout.isatty()
    except Exception:
        return False


_DEFAULT_LOG_FORMAT = "[%(asctime)s %(levelname)s %(name)s] %(message)s"


def _configure_logging():
    """Configure the kbmod logger hierarchy from the environment."""
    level_name = os.environ.get("KB_LOG_LEVEL", "WARNING").upper()
    level = getattr(_py_logging, level_name, _py_logging.WARNING)
    logger = _py_logging.getLogger("kbmod")
    logger.setLevel(level)


_configure_logging()


def _configure_compilation_cache():
    """Enable JAX's persistent compilation cache (compiles on this class of
    host are expensive; the cache makes repeated runs fast). Opt out with
    KB_NO_COMPILE_CACHE=1."""
    if os.environ.get("KB_NO_COMPILE_CACHE", "0") == "1":
        return
    try:
        import jax

        cache_dir = os.environ.get("KB_COMPILE_CACHE_DIR", os.path.expanduser("~/.kbmod_tpu_jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_configure_compilation_cache()

from kbmod_tpu.search import StackSearch, Trajectory  # noqa: E402
from kbmod_tpu.configuration import SearchConfiguration  # noqa: E402

__all__ = [
    "StackSearch",
    "Trajectory",
    "SearchConfiguration",
    "Standardizer",
    "ImageCollection",
    "WorkUnit",
    "is_interactive",
]


def __getattr__(name):
    """Lazy top-level re-exports (mirroring the reference's
    src/kbmod/__init__.py:96-98) without importing the heavy ingestion
    stack at package import."""
    if name == "Standardizer":
        from kbmod_tpu.standardizers import Standardizer

        return Standardizer
    if name == "ImageCollection":
        from kbmod_tpu.image_collection import ImageCollection

        return ImageCollection
    if name == "WorkUnit":
        from kbmod_tpu.work_unit import WorkUnit

        return WorkUnit
    raise AttributeError(f"module 'kbmod_tpu' has no attribute {name}")
