"""Worker for the 2-process jax.distributed smoke test (spawned by
tests/test_distributed.py). Must set env and call initialize_distributed
BEFORE anything initializes the XLA backend."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("KB_NO_COMPILE_CACHE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    from kbmod_tpu.parallel import (
        initialize_distributed,
        is_distributed,
        assign_patches_to_hosts,
        build_mesh,
        sharded_core_search,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert is_distributed()
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.device_count()

    # Deterministic patch split with no communication.
    assert assign_patches_to_hosts(5) == ([0, 2, 4] if pid == 0 else [1, 3])

    rng = np.random.default_rng(3)
    T, H, W, C = 4, 16, 16, 8
    psi = rng.normal(0, 1, (T, H, W)).astype(np.float32)
    phi = rng.uniform(0.5, 2.0, (T, H, W)).astype(np.float32)
    valid = np.ones((T, H, W), np.uint8)
    times = np.arange(T) * 0.5
    vxs = rng.uniform(-3, 3, C).astype(np.float32)
    vys = rng.uniform(-3, 3, C).astype(np.float32)

    mesh = build_mesh()  # spans all 4 global devices across both processes
    res = sharded_core_search(
        psi, phi, valid, times, vxs, vys, mesh,
        x_min=0, x_max=W, y_min=0, y_max=H, results_per_pixel=2,
    )
    if pid == 0:
        np.savez(out_path, **res)
    print(f"proc {pid} OK", flush=True)


if __name__ == "__main__":
    main()
