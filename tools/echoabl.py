"""Ablation round 5h: simple_echo dissolved-island delay read forms.

The dissolved feedback island's whole-block delay read was a batched
Catmull-Rom rb_get (snap compare + 5 gathers + cubic ≈ 10 ops/block);
with the delay a trace-time literal integer (the simple-echo shape) it
collapses to ONE contiguous dynamic_slice (nodes/delay.py block_read),
bit-identical to the snap branch.  A/B in one process:

  fast : literal fast path (production default)
  gen  : general batched rb_get (literal_ins withheld via env)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, SR = 1024, 48_000.0


def make_runner(fast):
    import jax
    os.environ["OSCEN_DELAY_LITERAL_READ"] = "1" if fast else "0"
    from oscen_tpu.models.simple import build_simple_echo
    g = build_simple_echo()
    s = g.compile(sample_rate=SR, block_size=B, mode="block")
    out = s.process_block()
    jax.block_until_ready([v for v in out.values() if hasattr(v, "shape")])
    return s.steady_checksum


def main():
    t0 = time.time()
    runners = {"fast": make_runner(True), "gen": make_runner(False)}
    for k, ck in runners.items():
        ck(4)
        print(f"[echoabl] {k} ready {time.time()-t0:.0f}s", flush=True)

    def window(ck):
        def span(n):
            t = time.perf_counter()
            ck(n)
            return time.perf_counter() - t
        diffs = sorted(span(2048) - span(256) for _ in range(5))
        return max(diffs[2], 1e-9) / (2048 - 256) * 1e6

    results = {k: [] for k in runners}
    for i in range(8):
        line = []
        for k, ck in runners.items():
            results[k].append(window(ck))
            line.append(f"{k} {results[k][-1]:6.2f}")
        print(f"[echoabl] w{i}: " + "  ".join(line), flush=True)
    for k, ws in results.items():
        ws.sort()
        med = ws[len(ws) // 2]
        print(f"{k:5s}: best {ws[0]:6.2f}  med {med:6.2f} us/block"
              f"  (best {B / SR / (ws[0] * 1e-6):6.0f}x RT)")


if __name__ == "__main__":
    main()
