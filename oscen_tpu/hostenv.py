"""Host-environment sanitization for example programs.

The shipped environment's ``sitecustomize`` (gated on
``PALLAS_AXON_POOL_IPS``) registers a remote-TPU PJRT plugin at interpreter
start and presets ``JAX_PLATFORMS=axon``.  When the relay behind it is down,
JAX backend initialization *hangs indefinitely* rather than raising — so an
example that simply imports and renders never completes.

The reference's example binaries are its proof of life
(/root/reference/examples/src/bin/simple_synth.rs:49-57): they must run in
the shipped environment unconditionally.  ``ensure_local_backend()`` makes
that true here by re-exec'ing the current process once with the relay hook
dropped and ``JAX_PLATFORMS=cpu`` — the same sanitization the test suite
applies via ``oscen_tpu.testing``.  Opt out for real TPU runs with
``OSCEN_EXAMPLES_TPU=1`` (bench.py never uses this module; it always talks
to the real chip under its own watchdog).

Call it at the top of the example, before any JAX computation:

    from oscen_tpu.hostenv import ensure_local_backend
    ensure_local_backend()
"""
import os
import sys


def ensure_local_backend() -> None:
    """Force the deterministic CPU backend unless OSCEN_EXAMPLES_TPU=1."""
    if os.environ.get("OSCEN_EXAMPLES_TPU"):
        return
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        # The relay plugin is already registered in this interpreter and its
        # registration wins over any JAX_PLATFORMS we set now — re-exec once
        # with the hook variable dropped (mirrors oscen_tpu/testing.py).
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    if os.environ.get("JAX_PLATFORMS") == "axon":
        # Hook absent but the platform preset lingers: axon is not
        # registered in this interpreter, so initializing it would fail.
        os.environ["JAX_PLATFORMS"] = "cpu"
