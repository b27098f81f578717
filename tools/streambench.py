"""Streamed-path benchmark: StreamingHost on the real chip.

Measures the pipelined live-streaming path (per-block host staging +
async dispatch + async readback) with live MIDI events, as opposed to
bench.py's on-device render_steady serving path.

Usage: python tools/streambench.py [--block=256] [--depth=4] [--sec=2]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from oscen_tpu.models.electric_piano import build_electric_piano
    from oscen_tpu.utils.host import StreamingHost
    from oscen_tpu import raw_midi_event

    B, depth, sec = 256, 4, 2.0
    for a in sys.argv[1:]:
        if a.startswith("--block="):
            B = int(a.split("=")[1])
        if a.startswith("--depth="):
            depth = int(a.split("=")[1])
        if a.startswith("--sec="):
            sec = float(a.split("=")[1])

    c = build_electric_piano(256).compile(48000.0, block_size=B,
                                          mode="block")
    for i in range(64):
        c.queue_event("midi_in", 0, raw_midi_event([0x90, 36 + i, 100]))
    out = c.process_block()
    jax.block_until_ready(out["out"])
    for _ in range(3):       # warm the steady path + cache
        out = c.process_block()
    jax.block_until_ready(out["out"])

    note = [0]

    def on_block(host, t):
        # a live note every ~20 blocks (realistic playing rate)
        if host.blocks % 20 == 19:
            host.compiled.queue_event(
                "midi_in", 3, raw_midi_event([0x90, 60 + note[0] % 12,
                                              100]))
            note[0] += 1

    host = StreamingHost(c, realtime=False, pipeline_depth=depth)
    host.run(sec, on_block=on_block, collect=False)
    r = host.report()
    print(f"B={B} depth={depth}: throughput {r['throughput_rtf']:.1f}x RT"
          f" | staging median {r['staging_ms_median']:.3f} ms"
          f" | submit->ready median {r['block_ms_median']:.3f} ms"
          f" | blocks {r['blocks']}")


if __name__ == "__main__":
    main()
