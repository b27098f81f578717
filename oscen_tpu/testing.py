"""Pytest preparse plugin: sanitize the remote-TPU relay hook.

The shipped environment's sitecustomize (gated on ``PALLAS_AXON_POOL_IPS``)
registers a remote TPU PJRT plugin at interpreter start.  That registration
wins over any ``JAX_PLATFORMS=cpu`` a conftest sets afterwards, so tests
meant for the deterministic 8-device virtual CPU mesh land on the remote
chip and fail with backend errors.

Loaded via ``addopts = -p oscen_tpu.testing`` (pytest.ini), this module is
imported during option preparse — *before* pytest's capture plugin redirects
fd 1 and before any conftest — so it can re-exec the test process once with
the hook variable dropped (the same sanitization
``__graft_entry__.dryrun_multichip`` applies to its subprocess).  Plain
``python -m pytest tests/`` then works in the shipped environment.
"""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
