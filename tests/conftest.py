"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is exercised on host devices
(`--xla_force_host_platform_device_count=8`), mirroring how the driver
dry-runs the multichip path. Real-TPU benchmarks live in bench.py, not
in the test suite.
"""

import os

# Hard-set (the session env pins JAX_PLATFORMS=axon — the remote TPU —
# which must not be touched by unit tests). The axon sitecustomize also
# calls jax.config.update("jax_platforms", "axon,cpu") at interpreter
# start, so the env var alone is not enough: override the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and small.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
# Persistent compile cache: tiny-model grad compiles cost ~40s each on
# this single-core host; cache makes test re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the remote TPU"
)
assert jax.device_count() >= 8, "expected 8 forced host devices"
