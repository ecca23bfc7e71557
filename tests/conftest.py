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
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the remote TPU"
)
assert jax.device_count() >= 8, "expected 8 forced host devices"
