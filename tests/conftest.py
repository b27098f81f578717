"""Test configuration: force CPU with a virtual 8-device mesh.

The environment presets JAX_PLATFORMS=axon (one real TPU chip); tests run on
CPU for determinism and so multi-chip sharding can be exercised on 8 virtual
devices.  Must run before the first jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
