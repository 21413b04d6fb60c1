"""Test configuration: force a CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver benches on real TPU).

Note: on this host the axon TPU plugin ignores the JAX_PLATFORMS env var, so
the platform is forced through jax.config as well.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo importable without installation.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
