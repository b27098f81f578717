"""Ablation round 5f: event-dense streaming throughput (VERDICT r04 #6).

The reference's actual workload is params+MIDI inside EVERY realtime
callback (/root/reference/examples/electric-piano/src/main.rs:197-209);
this build's recorded numbers so far cover only the steady path (no
events in the measured window).  This measures the MIDI-every-block
path end to end: each block queues one note-on + one note-off (voice
cycling), then process_block runs the host prepass (MIDI parse, voice
allocation, per-voice staging) and dispatches one jitted block.

Methodology: outputs are NOT fetched per block (dispatch is async, the
device pipelines behind the host); a final checksum fetch forces
everything.  Wall time therefore measures max(host-per-block cost,
device compute) — exactly the streaming ceiling.  A no-event control
run (same loop, no queue_event -> steady staging cache) isolates the
event-path cost from dispatch cost.

Usage: python tools/evabl.py [n_blocks] [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, SR = 256, 48_000.0


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    import jax
    from oscen_tpu import raw_midi_event
    from oscen_tpu.models.electric_piano import build_electric_piano

    g = build_electric_piano(V)
    s = g.compile(sample_rate=SR, block_size=B, mode="block")
    # strike a base chord so the voices are busy
    for i in range(V // 2):
        s.queue_event("midi_in", 0, raw_midi_event([0x90, 36 + (i % 64),
                                                    100]))
    out = s.process_block()
    last = None

    def run(with_events, n):
        nonlocal last
        note = [60]

        def one(i):
            if with_events:
                s.queue_event("midi_in", 17,
                              raw_midi_event([0x80, 60 + (note[0] % 24), 0]))
                s.queue_event("midi_in", 17,
                              raw_midi_event([0x90, 60 + (note[0] % 24),
                                              90]))
                note[0] += 1
            return s.process_block()

        for _ in range(8):  # warm event-cap/packed block-fn variants
            one(0)
        t0 = time.perf_counter()
        for i in range(n):
            last = one(i)
        jax.block_until_ready(last["out"])
        dt = time.perf_counter() - t0
        us = dt / n * 1e6
        rtf = (B / SR) / (dt / n)
        return us, rtf

    for label, with_events in (("steady", False), ("events", True),
                               ("steady2", False), ("events2", True)):
        us, rtf = run(with_events, n_blocks)
        print(f"[evabl] {label:8s}: {us:8.1f} us/block  {rtf:7.1f}x RT "
              f"(B={B}, {n_blocks} blocks)", flush=True)


if __name__ == "__main__":
    main()
