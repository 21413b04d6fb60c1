"""kbmod_tpu.search — the search-engine API.

This module exports the same names as the reference's pybind11 module
``kbmod.search`` (src/kbmod/search/bindings.cpp:20-41) so code written
against the reference ports directly. The implementation is JAX/XLA instead
of C++/CUDA; "GPU" in the API surface means "the default JAX accelerator"
(TPU here).
"""

import jax
import numpy as np

from kbmod_tpu.constants import KB_NO_DATA, pixel_value_valid
from kbmod_tpu.utils.debug_timer import DebugTimer
from kbmod_tpu.utils.logging_utils import Logging
from kbmod_tpu.search.trajectory import Trajectory
from kbmod_tpu.search.trajectory_list import (
    TrajectoryList,
    extract_all_trajectory_x,
    extract_all_trajectory_y,
    extract_all_trajectory_vx,
    extract_all_trajectory_vy,
    extract_all_trajectory_lh,
    extract_all_trajectory_flux,
    extract_all_trajectory_obs_count,
)
from kbmod_tpu.search.checkpoint import checkpointed_core_search
from kbmod_tpu.search.stack_search import StackSearch
from kbmod_tpu.ops.psi_phi import (
    PsiPhi,
    PsiPhiArray,
    PsiPhiArrayMeta,
    fill_psi_phi_array,
    fill_psi_phi_array_from_image_arrays,
    compute_scale_params_from_image_vect,
    encode_uint_scalar,
    decode_uint_scalar,
    generate_psi_phi_images,
)
from kbmod_tpu.ops.search import (
    sigmag_filtered_indices,
    evaluate_trajectories,
    predict_index,
)


# --- image-utils bindings (image_utils_cpp.cpp:179-196) ---

def convolve_image(image, psf):
    """Masked PSF convolution of one image (image_utils_cpp.cpp:103-108)."""
    from kbmod_tpu.ops.convolve import convolve_psf_and_image

    return np.asarray(convolve_psf_and_image(image, psf))


# The reference exposes explicit CPU/GPU dispatch; JAX picks the device.
convolve_image_cpu = convolve_image
convolve_image_gpu = convolve_image


def square_psf_values(given_psf):
    """Element-wise squared PSF kernel (image_utils_cpp.cpp:110-120)."""
    return np.asanyarray(given_psf) ** 2


def generate_psi(sci, var, psf):
    """psi = conv(sci/var, PSF) (image_utils_cpp.cpp:126-153)."""
    return generate_psi_phi_images(sci, var, psf)[0]


def generate_phi(var, psf):
    """phi = conv(1/var, PSF^2) (image_utils_cpp.cpp:155-177)."""
    var = np.asanyarray(var)
    return generate_psi_phi_images(np.ones_like(var), var, psf)[1]


# --- CPU search bindings (cpu_search_algorithms.cpp:127-131) ---

def evaluate_trajectory_cpu(psi_phi_array, candidate):
    """Score one candidate trajectory against a PsiPhiArray, updating its
    obs_count/lh/flux in place (cpu_search_algorithms.cpp:20-60; no
    sigma-G)."""
    psi, phi, valid = psi_phi_array.decoded_psi_phi()
    stats = evaluate_trajectories(
        psi, phi, valid, psi_phi_array.times,
        np.array([candidate.x]), np.array([candidate.y]),
        np.array([candidate.vx], dtype=np.float32),
        np.array([candidate.vy], dtype=np.float32),
    )
    candidate.obs_count = int(stats["obs_count"][0])
    candidate.lh = float(stats["lh"][0])
    candidate.flux = float(stats["flux"][0])


def search_cpu_only(psi_phi_array, params, trj_to_search, results):
    """The CPU-path search (cpu_search_algorithms.cpp:62-124): every
    starting pixel keeps min(results_per_pixel, n_candidates) ungated
    results; ``results`` (a TrajectoryList) receives them."""
    from kbmod_tpu.ops.search import core_search

    cands = trj_to_search.get_arrays()
    psi, phi, valid = psi_phi_array.decoded_psi_phi()
    raw = core_search(
        psi, phi, valid, psi_phi_array.times,
        cands["vx"], cands["vy"],
        params.x_start_min, params.x_start_max,
        params.y_start_min, params.y_start_max,
        min(params.results_per_pixel, len(trj_to_search)),
        min_obs=0, min_lh=-np.inf, gate_min_obs=False,
    )
    results.set_arrays(raw)


class StampType:
    """Coadd stamp types (bindings.cpp:33-38)."""

    STAMP_SUM = 0
    STAMP_MEAN = 1
    STAMP_MEDIAN = 2
    STAMP_VAR_WEIGHTED = 3


def _accelerator_devices():
    return [d for d in jax.devices() if d.platform != "cpu"]


def kb_has_gpu():
    """True when a non-CPU JAX accelerator (TPU) is available."""
    try:
        return len(_accelerator_devices()) > 0
    except Exception:
        return False


# Flags mirroring the reference build flags (bindings.cpp:20-30). HAS_CUDA
# here reports accelerator availability (resolved lazily via module
# __getattr__ below — probing devices at import time would initialize the
# XLA backend, breaking jax.distributed.initialize in multi-host runs);
# HAS_OMP reports nothing meaningful on TPU and is kept False for parity.
HAS_OMP = False


def __getattr__(name):
    if name == "HAS_CUDA":
        return kb_has_gpu()
    raise AttributeError(f"module 'kbmod_tpu.search' has no attribute {name}")


# Assumed HBM when the runtime exposes no memory stats (e.g. remote/
# tunneled TPU plugins return memory_stats() = None): one v5e chip's 16GB.
_DEFAULT_HBM_BYTES = 16 * 1024**3


def kb_get_gpu_free_memory():
    """Free device memory in bytes (kernel_helpers.cpp:35-50).

    Falls back to a nominal chip HBM size when the platform reports no
    stats — better to attempt the search (XLA raises a precise OOM if it
    does not fit) than to refuse it on missing telemetry."""
    devs = _accelerator_devices()
    if not devs:
        return 0
    stats = devs[0].memory_stats()
    if not stats or "bytes_limit" not in stats:
        return _DEFAULT_HBM_BYTES
    return max(stats["bytes_limit"] - stats.get("bytes_in_use", 0), 0)


def kb_get_gpu_total_memory():
    devs = _accelerator_devices()
    if not devs:
        return 0
    stats = devs[0].memory_stats() or {}
    return stats.get("bytes_limit", 0)


def get_gpu_free_memory():
    return kb_get_gpu_free_memory()


def get_gpu_total_memory():
    return kb_get_gpu_total_memory()


def stat_gpu_memory_mb():
    """Human-readable device memory stats (kernel_helpers.cpp:52-66)."""
    devs = _accelerator_devices()
    if not devs:
        return "No accelerator device available."
    stats = devs[0].memory_stats() or {}
    used = stats.get("bytes_in_use", 0) / (1024.0 * 1024.0)
    limit = stats.get("bytes_limit", 0) / (1024.0 * 1024.0)
    return f"Device memory: {used:.2f} MB used of {limit:.2f} MB total."


def print_cuda_stats():
    print(stat_gpu_memory_mb())


def validate_gpu(req_memory=0):
    """Check the accelerator exists and has at least req_memory bytes free
    (kernel_helpers.cpp:68-84)."""
    if not kb_has_gpu():
        return False
    return kb_get_gpu_free_memory() >= req_memory


__all__ = [
    "KB_NO_DATA",
    "HAS_CUDA",
    "HAS_OMP",
    "DebugTimer",
    "Logging",
    "PsiPhiArray",
    "PsiPhiArrayMeta",
    "StackSearch",
    "StampType",
    "Trajectory",
    "TrajectoryList",
    "kb_has_gpu",
    "kb_get_gpu_free_memory",
    "kb_get_gpu_total_memory",
    "get_gpu_free_memory",
    "get_gpu_total_memory",
    "stat_gpu_memory_mb",
    "print_cuda_stats",
    "validate_gpu",
    "pixel_value_valid",
    "fill_psi_phi_array",
    "fill_psi_phi_array_from_image_arrays",
    "compute_scale_params_from_image_vect",
    "encode_uint_scalar",
    "decode_uint_scalar",
    "sigmag_filtered_indices",
    "PsiPhi",
    "convolve_image",
    "convolve_image_cpu",
    "convolve_image_gpu",
    "square_psf_values",
    "generate_psi",
    "generate_phi",
    "generate_psi_phi_images",
    "evaluate_trajectory_cpu",
    "search_cpu_only",
    "evaluate_trajectories",
    "predict_index",
    "extract_all_trajectory_x",
    "extract_all_trajectory_y",
    "extract_all_trajectory_vx",
    "extract_all_trajectory_vy",
    "extract_all_trajectory_lh",
    "extract_all_trajectory_flux",
    "extract_all_trajectory_obs_count",
]
