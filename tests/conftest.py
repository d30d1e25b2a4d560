"""Test configuration: force an 8-device virtual CPU mesh.

The reference's tests run single-process on CPU (cargo test); ours additionally
exercise multi-chip sharding, which JAX lets us fake on CPU via
--xla_force_host_platform_device_count (SURVEY.md section 4, "No multi-node story").
This must be set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
