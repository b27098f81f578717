"""Ablation round 5c: Tremolo form/layout on the flagship at B=1024.

glueabl3 attribution: kernel ~20.5 us, graph glue ~0, tremolo + stereo
boundary ~2.5-2.9 us/block — exactly the gap between the streaming-class
B=1024 number (~890x) and the 1000x target (21.33 us/block).  The [B, 2]
trailing-channel array pads 2 lanes to 128 on TPU (64x lane waste on
every op that touches it, including the lax.cond boundary buffer).

Variants (OSCEN_TREMOLO_FORM, trace-time; all bit-identical):
  cond_bc  : round-3/4 production — pan inside the cond, [B, 2]
  cond_cm  : pan inside the cond, CHANNEL-MAJOR [2, B] + one transpose
  phase    : only the [B] phase crosses the cond; pan outside, [B, 2]
  phase_cm : phase cond + channel-major pan + transpose
  const_cm : no cond (rate trace-time const) + channel-major + transpose

All five compiled in ONE process, windows interleaved (chip-state
discipline).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, SR, B = 256, 48_000.0, 1024
FORMS = ["cond_bc", "cond_cm", "phase", "phase_cm", "const_cm"]


def make_runner(form):
    import jax
    os.environ["OSCEN_TREMOLO_FORM"] = form
    from oscen_tpu import raw_midi_event
    from oscen_tpu.models.electric_piano import build_electric_piano
    g = build_electric_piano(V)
    s = g.compile(sample_rate=SR, block_size=B, mode="block")
    for i in range(V):
        s.queue_event("midi_in", 0,
                      raw_midi_event([0x90, 36 + (i % 64), 100]))
    out = s.process_block()
    jax.block_until_ready([v for v in out.values() if hasattr(v, "shape")])
    return s.steady_checksum


def main():
    t0 = time.time()
    runners = {}
    for form in FORMS:
        runners[form] = make_runner(form)
        runners[form](4)
        print(f"[tremabl] {form} ready {time.time()-t0:.0f}s", flush=True)

    def window(ck):
        def span(n):
            t = time.perf_counter()
            ck(n)
            return time.perf_counter() - t
        diffs = sorted(span(2048) - span(256) for _ in range(5))
        return max(diffs[2], 1e-9) / (2048 - 256) * 1e6

    results = {k: [] for k in runners}
    for i in range(6):
        line = []
        for k, ck in runners.items():
            results[k].append(window(ck))
            line.append(f"{k} {results[k][-1]:6.2f}")
        print(f"[tremabl] w{i}: " + "  ".join(line), flush=True)
    for k, ws in results.items():
        ws.sort()
        print(f"{k:9s}: best {ws[0]:6.2f}  med {ws[len(ws)//2]:6.2f}")


if __name__ == "__main__":
    main()
