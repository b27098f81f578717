"""Ablation round 5d: v4 vs parity additive kernel on the flagship.

VERDICT r04 task 3: the headline number rides the closed-form v4 kernel
(~1.5e-4 relative RMS vs the exact op order, tools/fusedrms.py) while
the 1e-6-class parity kernel is opt-in and unbenchmarked on TPU.  This
prices the parity kernel at both latency classes, interleaved with v4
in one process (env read at graph-build/trace time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, SR = 256, 48_000.0


def make_runner(kernel, B):
    import jax
    os.environ["OSCEN_ADDITIVE_KERNEL"] = kernel
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
    for B in (1024, 4096):
        for kernel in ("v4", "parity"):
            key = f"{kernel}@{B}"
            runners[key] = (make_runner(kernel, B), B)
            runners[key][0](4)
            print(f"[parabl] {key} ready {time.time()-t0:.0f}s", flush=True)

    def window(ck, B):
        long_n, short_n = (2048, 256) if B == 1024 else (512, 64)
        def span(n):
            t = time.perf_counter()
            ck(n)
            return time.perf_counter() - t
        diffs = sorted(span(long_n) - span(short_n) for _ in range(5))
        return max(diffs[2], 1e-9) / (long_n - short_n) * 1e6

    results = {k: [] for k in runners}
    for i in range(6):
        line = []
        for k, (ck, B) in runners.items():
            results[k].append(window(ck, B))
            line.append(f"{k} {results[k][-1]:7.2f}")
        print(f"[parabl] w{i}: " + "  ".join(line), flush=True)
    for k, ws in results.items():
        ws.sort()
        B = runners[k][1]
        med = ws[len(ws) // 2]
        print(f"{k:12s}: best {ws[0]:7.2f}  med {med:7.2f} us/block"
              f"  (best {B / SR / (ws[0] * 1e-6):6.0f}x RT)")


if __name__ == "__main__":
    main()
