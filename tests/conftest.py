"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake multi-node backend
(SURVEY.md §4): distributed logic is exercised on
``xla_force_host_platform_device_count=8`` CPU devices, exactly how the
driver's multi-chip dry-run validates sharding.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A pytest plugin may import jax before this conftest runs, latching the
# platform from the ambient JAX_PLATFORMS (axon/TPU). Override through
# jax.config, which works post-import as long as no backend was created.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# keep matmuls deterministic & true-fp32 for parity tests (the env var is
# not reliably honored; jax.config is)
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: the persistent compilation cache is NOT enabled by default here —
# on the CPU backend of this jax build it aborts the process when cached
# executables with donated buffers are reloaded (verified empirically).
# It stays enabled for the TPU paths (bench.py, cli) where it is stable.
if os.environ.get("RADZERO_TEST_CACHE", "0") == "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
