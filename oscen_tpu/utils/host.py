"""Realtime streaming host: callback-paced block processing.

The reference's L6 hosts are cpal audio callbacks pacing ``process_block``
against a device clock (`examples/src/bin/simple_synth.rs:30-57`,
`examples/fm-synth/src/main.rs:197-200`).  This environment has no audio
device, so :class:`StreamingHost` paces against the wall clock at the
graph sample rate — the same contract: one block every ``B/sr`` seconds,
live events/params staged between callbacks, and *deadline accounting*
(a block finishing after its deadline is an xrun).

It also separates the two host-side costs the reference's callback hides:

- **staging** — the host pre-pass + dispatch (Python control code, event
  staging, jit call until the device work is enqueued);
- **compute** — until the output block is ready on host.

``report()`` returns both, plus miss counts and the sustained real-time
factor, giving the per-block host-staging budget table PERF.md discusses.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

__all__ = ["StreamingHost"]


class StreamingHost:
    def __init__(self, compiled, realtime: bool = True,
                 pipeline_depth: int = 2):
        """``pipeline_depth`` > 0 overlaps staging of block i+1..i+depth
        with device compute/readback of block i (JAX dispatch is async;
        the output fetch is started eagerly and only awaited ``depth``
        blocks later).  Depth 0 restores the fully synchronous loop.
        Latency cost: output audio is available ``depth`` block periods
        after submission — the usual audio-pipeline tradeoff."""
        self.compiled = compiled
        self.realtime = realtime
        self.pipeline_depth = int(pipeline_depth)
        self.block = compiled.block_size
        self.sr = compiled.sample_rate
        self.reset_stats()

    def reset_stats(self):
        self.blocks = 0
        self.misses = 0
        self.staging_s: List[float] = []
        self.total_s: List[float] = []
        self.worst_margin_s = float("inf")
        self.wall_s = 0.0

    # ------------------------------------------------------------------ #
    def run(self, seconds: float,
            on_block: Optional[Callable[["StreamingHost", float], None]]
            = None,
            collect: bool = True) -> Optional[np.ndarray]:
        """Stream for ``seconds``: one callback per block.

        ``on_block(host, t)`` runs before each block — queue events /
        set params there (the mpsc-drain phase of the reference callback,
        fm-synth main.rs:148-165).  Returns the concatenated audio when
        ``collect`` (mono: first output)."""
        c = self.compiled
        n_blocks = int(round(seconds * self.sr / self.block))
        out_name = next(o.name for o in c.ir.outputs)
        chunks = []
        period = self.block / self.sr
        depth = max(self.pipeline_depth, 0)
        pending = []  # (idx, y, t_submit) awaiting readback
        start = time.perf_counter()

        def flush_one():
            idx, y, t_sub = pending.pop(0)
            jax.block_until_ready(y)
            t_done = time.perf_counter()
            if collect:
                chunks.append(np.asarray(y))
            # the pipelined deadline: block idx must be ready depth+1
            # periods after its slot opened
            deadline = start + (idx + 1 + depth) * period
            margin = deadline - t_done
            self.worst_margin_s = min(self.worst_margin_s, margin)
            if margin < 0:
                self.misses += 1
            self.total_s.append(t_done - t_sub)

        for i in range(n_blocks):
            t = i * period
            if on_block is not None:
                on_block(self, t)
            t0 = time.perf_counter()
            out = c.process_block()
            y = out[out_name]
            try:
                y.copy_to_host_async()
            except AttributeError:
                pass
            t1 = time.perf_counter()  # staged + dispatched (async)
            self.staging_s.append(t1 - t0)
            pending.append((i, y, t0))
            while len(pending) > depth:
                flush_one()
            self.blocks += 1
            if self.realtime:
                margin = start + (i + 1) * period - time.perf_counter()
                if margin > 0:
                    time.sleep(margin)
        while pending:
            flush_one()
        self.wall_s += time.perf_counter() - start
        if collect and chunks:
            return np.concatenate(chunks, axis=0)
        return None

    # ------------------------------------------------------------------ #
    def report(self) -> Dict[str, float]:
        period = self.block / self.sr
        staging = float(np.median(self.staging_s)) if self.staging_s else 0.0
        total = float(np.median(self.total_s)) if self.total_s else 0.0
        wall_per_block = self.wall_s / self.blocks if self.blocks else 0.0
        return {
            "blocks": self.blocks,
            "block_period_ms": period * 1e3,
            "staging_ms_median": staging * 1e3,
            "block_ms_median": total * 1e3,
            "deadline_misses": self.misses,
            "worst_margin_ms": self.worst_margin_s * 1e3,
            # per-block submit->ready latency (overlapped when pipelined)
            "sustained_rtf": period / total if total > 0 else float("inf"),
            # wall-clock throughput across the run (the pipelined figure;
            # only meaningful with realtime pacing off)
            "throughput_rtf": (period / wall_per_block
                               if wall_per_block > 0 else float("inf")),
        }

    def print_report(self):
        r = self.report()
        print(f"streamed {r['blocks']} blocks "
              f"(period {r['block_period_ms']:.2f} ms)")
        print(f"  staging (host+dispatch): {r['staging_ms_median']:.3f} ms"
              f" | full block: {r['block_ms_median']:.3f} ms"
              f" | sustained RTF: {r['sustained_rtf']:.1f}x")
        print(f"  deadline misses: {r['deadline_misses']}"
              f" | worst margin: {r['worst_margin_ms']:.2f} ms")
