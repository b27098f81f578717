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
    def __init__(self, compiled, realtime: bool = True):
        self.compiled = compiled
        self.realtime = realtime
        self.block = compiled.block_size
        self.sr = compiled.sample_rate
        self.reset_stats()

    def reset_stats(self):
        self.blocks = 0
        self.misses = 0
        self.staging_s: List[float] = []
        self.total_s: List[float] = []
        self.worst_margin_s = float("inf")

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
        start = time.perf_counter()
        for i in range(n_blocks):
            t = i * period
            if on_block is not None:
                on_block(self, t)
            t0 = time.perf_counter()
            out = c.process_block()
            t1 = time.perf_counter()  # staged + dispatched
            y = out[out_name]
            jax.block_until_ready(y)
            t2 = time.perf_counter()
            if collect:
                chunks.append(np.asarray(y))
            deadline = start + (i + 1) * period
            margin = deadline - t2
            self.worst_margin_s = min(self.worst_margin_s, margin)
            if margin < 0:
                self.misses += 1
            self.staging_s.append(t1 - t0)
            self.total_s.append(t2 - t0)
            self.blocks += 1
            if self.realtime and margin > 0:
                time.sleep(margin)
        if collect and chunks:
            return np.concatenate(chunks, axis=0)
        return None

    # ------------------------------------------------------------------ #
    def report(self) -> Dict[str, float]:
        period = self.block / self.sr
        staging = float(np.median(self.staging_s)) if self.staging_s else 0.0
        total = float(np.median(self.total_s)) if self.total_s else 0.0
        return {
            "blocks": self.blocks,
            "block_period_ms": period * 1e3,
            "staging_ms_median": staging * 1e3,
            "block_ms_median": total * 1e3,
            "deadline_misses": self.misses,
            "worst_margin_ms": self.worst_margin_s * 1e3,
            "sustained_rtf": period / total if total > 0 else float("inf"),
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
