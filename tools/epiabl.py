"""Ablation round 5e: stream-epilogue fusion with SPLIT per-channel
stores, flagship at B=1024.

Round 3 measured epilogue fusion +3.6 us/block and shipped it
default-OFF: the fused kernel stored one narrow (B, 2) output (2 lanes
padded to 128 — a 64x-wasteful store per body).  tremabl (round 5c)
showed the XLA-side Tremolo is ~2.5 us/block regardless of layout
(per-op fixed overheads, not lanes), so the only way to reclaim it is
inside the kernel.  This re-prices the fusion with per-channel (B, 1)
output refs ([U, 1] stores — the same class as the with_mix mixdown
store, which measures free, tools/glueabl3.py).

Variants (one process, windows interleaved):
  off    : fusion off (round-4 production default)
  split  : fusion on, OSCEN_EPI_SPLIT=1 (per-channel refs)
  single : fusion on, OSCEN_EPI_SPLIT=0 (round-3 losing (B,2) store)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, SR, B = 256, 48_000.0, 1024
VARIANTS = {
    "off": {"OSCEN_EPILOGUE_FUSION": "0"},
    "split": {"OSCEN_EPILOGUE_FUSION": "1", "OSCEN_EPI_SPLIT": "1"},
    "single": {"OSCEN_EPILOGUE_FUSION": "1", "OSCEN_EPI_SPLIT": "0"},
}


def make_runner(env):
    import jax
    for k, v in env.items():
        os.environ[k] = v
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
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS)
    n_win = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    runners = {}
    for name in names:
        runners[name] = make_runner(VARIANTS[name])
        runners[name](4)
        print(f"[epiabl] {name} ready {time.time()-t0:.0f}s", flush=True)

    def window(ck):
        def span(n):
            t = time.perf_counter()
            ck(n)
            return time.perf_counter() - t
        diffs = sorted(span(2048) - span(256) for _ in range(5))
        return max(diffs[2], 1e-9) / (2048 - 256) * 1e6

    results = {k: [] for k in runners}
    for i in range(n_win):
        line = []
        for k, ck in runners.items():
            results[k].append(window(ck))
            line.append(f"{k} {results[k][-1]:6.2f}")
        print(f"[epiabl] w{i}: " + "  ".join(line), flush=True)
    for k, ws in results.items():
        ws.sort()
        med = ws[len(ws) // 2]
        print(f"{k:7s}: best {ws[0]:6.2f}  med {med:6.2f} us/block"
              f"  (best {B / SR / (ws[0] * 1e-6):6.0f}x RT)")


if __name__ == "__main__":
    main()
