"""Test configuration: force CPU with a virtual 8-device mesh.

The environment presets JAX_PLATFORMS=axon (one real TPU chip); tests run on
CPU for determinism and so multi-chip sharding can be exercised on 8 virtual
devices.

A sitecustomize hook (gated on PALLAS_AXON_POOL_IPS) registers a remote TPU
PJRT plugin at *interpreter start* — before this conftest runs — and that
registration wins over any JAX_PLATFORMS we set here.  The preparse plugin
``oscen_tpu/testing.py`` (loaded via pytest.ini addopts, before pytest's
capture redirects fd 1) re-execs the test process with the hook dropped, so
by the time this conftest runs the interpreter is hook-free; the env below
is the belt-and-braces default for environments without the hook.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
