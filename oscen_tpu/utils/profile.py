"""Profiling utilities.

The reference's tracing story is criterion benches + flamegraphs (SURVEY
§5.1); the TPU equivalents here: a real-time-factor meter over the fused
steady-state render, and a ``jax.profiler`` trace context for feeding the
TensorBoard/XProf toolchain.
"""

from __future__ import annotations

import contextlib
import time
import jax


def measure_rtf(compiled, n_blocks: int = 256, trials: int = 3) -> dict:
    """Real-time factor of the fused steady-state render (best-of-N;
    remote-tunnel variance makes single runs unreliable)."""
    out = compiled.render_steady(n_blocks)
    first = next(v for v in out.values() if hasattr(v, "shape"))
    jax.block_until_ready(first)
    best = float("inf")
    for _ in range(max(trials, 1)):
        t0 = time.perf_counter()
        out = compiled.render_steady(n_blocks)
        jax.block_until_ready(
            next(v for v in out.values() if hasattr(v, "shape")))
        best = min(best, time.perf_counter() - t0)
    frames = n_blocks * compiled.block_size
    rtf = (frames / compiled.sample_rate) / best
    return {"rtf": rtf, "seconds_per_block": best / n_blocks,
            "us_per_block": best / n_blocks * 1e6,
            "frames": frames}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/oscen_trace"):
    """``jax.profiler`` trace context (view with xprof/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
