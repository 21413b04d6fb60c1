"""Multi-chip (ICI mesh) execution: sharded psi/phi build and sharded
trajectory search via jax.sharding + shard_map.

The reference has no distributed layer (one CUDA device; scale-out is
manual per-patch runs merged by kbmod-merge-results — SURVEY.md §2.1).
This package is the TPU-native replacement.
"""

from kbmod_tpu.parallel.distributed import (
    initialize_distributed,
    is_distributed,
    assign_patches_to_hosts,
)
from kbmod_tpu.parallel.sharded import (
    build_mesh,
    sharded_search_topk,
    sharded_core_search,
    sharded_psi_phi_build,
    sharded_sigmag_exact_topk,
)

__all__ = [
    "initialize_distributed",
    "is_distributed",
    "assign_patches_to_hosts",
    "build_mesh",
    "sharded_search_topk",
    "sharded_core_search",
    "sharded_psi_phi_build",
    "sharded_sigmag_exact_topk",
]
