"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding logic is validated on fake CPU devices, the capability
the reference never had (SURVEY.md §4e).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test compiles small and deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon site hook (PYTHONPATH=/root/.axon_site) re-adds the TPU platform
# regardless of JAX_PLATFORMS; override at config level so tests always run
# on the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
