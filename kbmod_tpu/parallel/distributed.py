"""Multi-host (DCN) process-group setup and patch-level orchestration.

The reference scales out manually: RegionSearch exports per-patch
ImageCollections, each patch runs as an independent single-GPU job, and
``kbmod-merge-results`` stitches the result files (SURVEY.md §5.8). On TPU
pods the natural equivalents are:

* one **process per host** joined with ``jax.distributed.initialize`` so a
  single search spans all chips in a slice (the ICI mesh from
  :func:`kbmod_tpu.parallel.build_mesh` then covers every device), and
* **patch-parallel** scale-out across slices, identical to the reference's
  per-patch jobs, merged with the same results-file merge.

This module provides the process-group entry point plus a deterministic
host→patch assignment helper for the patch-parallel mode.
"""

import logging
import os

import jax

logger = logging.getLogger(__name__)

__all__ = ["initialize_distributed", "is_distributed", "assign_patches_to_hosts"]

_initialized = False


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Join (or create) a multi-host JAX process group.

    On TPU pod slices the three arguments are discovered from the runtime
    environment and may be omitted; elsewhere (CPU/GPU clusters, or when
    forcing a layout) they can be passed explicitly or via
    ``KB_COORDINATOR``, ``KB_NUM_PROCESSES``, ``KB_PROCESS_ID``.

    Safe to call multiple times; only the first call initializes. After
    initialization, ``jax.devices()`` spans all hosts, so
    ``build_mesh()``/``sharded_core_search`` transparently cover the full
    slice — collectives ride ICI within a host's chips and DCN across
    hosts.
    """
    global _initialized
    # NOTE: do NOT probe jax.process_count() here — it initializes the
    # XLA backend, after which jax.distributed.initialize refuses to run.
    if _initialized or jax.distributed.is_initialized():
        _initialized = True
        return

    coordinator_address = coordinator_address or os.environ.get("KB_COORDINATOR")
    if num_processes is None and "KB_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["KB_NUM_PROCESSES"])
    if process_id is None and "KB_PROCESS_ID" in os.environ:
        process_id = int(os.environ["KB_PROCESS_ID"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        f"Joined process group: process {jax.process_index()} / {jax.process_count()}, "
        f"{jax.local_device_count()} local of {jax.device_count()} global devices."
    )


def is_distributed():
    """True when more than one process shares the device mesh."""
    return jax.process_count() > 1


def assign_patches_to_hosts(num_patches, num_hosts=None, host_id=None):
    """Deterministic round-robin patch assignment for patch-parallel runs.

    Mirrors the reference's manual per-patch job split (region_search.py
    exports, one job per patch): every host computes the same assignment
    with no communication, so independent slices can each take
    ``assign_patches_to_hosts(N)[host]`` and run
    ``SearchRunner.run_search`` per patch, merging afterwards with
    ``kbmod-merge-results``.

    Returns the list of patch indices owned by ``host_id`` (defaults to
    this process).
    """
    if num_hosts is None:
        num_hosts = max(jax.process_count(), 1)
    if host_id is None:
        host_id = jax.process_index()
    if not 0 <= host_id < num_hosts:
        raise ValueError(f"host_id {host_id} out of range for {num_hosts} hosts")
    return list(range(host_id, int(num_patches), int(num_hosts)))
