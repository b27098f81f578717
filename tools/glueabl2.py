"""Ablation round 5a: the B=1024 flagship glue attack.

Round 5 target (VERDICT r04 next-1): take the streaming-class B=1024
electric piano from ~21.95 us/block over the 21.33 us/block 1000x line.
Variant ladder, interleaved in ONE process (chip-state discipline):

  mulcond0 : round-4 baseline — multiplier sin/cos sweep every block
  mulcond1 : runtime cond skips the [C, H] multiplier recompute in
             steady blocks (OSCEN_EP_MULCOND=1, nodes/electric_piano.py)

Both synths are compiled up front; measurement windows alternate A/B so
chip clock drift cancels.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from oscen_tpu import raw_midi_event
    from oscen_tpu.models.electric_piano import build_electric_piano

    V, SR, B = 256, 48_000.0, 1024

    def compile_variant(mulcond):
        os.environ["OSCEN_EP_MULCOND"] = mulcond
        g = build_electric_piano(V)
        synth = g.compile(sample_rate=SR, block_size=B, mode="block")
        for i in range(V):
            synth.queue_event("midi_in", 0,
                              raw_midi_event([0x90, 36 + (i % 64), 100]))
        out = synth.process_block()
        jax.block_until_ready([v for v in out.values()
                               if hasattr(v, "shape")])
        for n in (256, 2048):
            synth.steady_checksum(n)
        return synth

    t0 = time.time()
    a = compile_variant("0")
    print(f"[glueabl2] A (mulcond0) ready {time.time()-t0:.0f}s", flush=True)
    b = compile_variant("1")
    print(f"[glueabl2] B (mulcond1) ready {time.time()-t0:.0f}s", flush=True)

    def span(s, n):
        t = time.perf_counter()
        s.steady_checksum(n)
        return time.perf_counter() - t

    def window(s):
        diffs = sorted(span(s, 2048) - span(s, 256) for _ in range(5))
        return max(diffs[2], 1e-9) / (2048 - 256) * 1e6  # us/block

    was, wbs = [], []
    for i in range(6):
        was.append(window(a))
        wbs.append(window(b))
        print(f"[glueabl2] w{i}: A {was[-1]:6.2f}  B {wbs[-1]:6.2f} "
              f"us/block", flush=True)
    was.sort(); wbs.sort()
    print(f"A mulcond0 best {was[0]:.2f} med {was[len(was)//2]:.2f}")
    print(f"B mulcond1 best {wbs[0]:.2f} med {wbs[len(wbs)//2]:.2f}")
    print(f"delta best {wbs[0]-was[0]:+.2f} med "
          f"{wbs[len(wbs)//2]-was[len(was)//2]:+.2f} us/block")


if __name__ == "__main__":
    main()
