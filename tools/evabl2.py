"""Ablation round 5l: event-block cost split + threaded pipelining.

PERF.md attributes the event-dense floor to host prepass (~150-300 us)
+ packed H2D (~165 us) + dispatch (~180 us) — the latter two are
BLOCKING relay round trips inside the jit call, and the device block
itself is ~20 us.  If a worker thread owns the jit call (state
threading stays serial on that one thread), the main thread's prepass
for block N+1 overlaps the RTT of block N and the block time drops to
~max(prepass, put+dispatch).

Phases:
  split : instrument one process_block-equivalent loop, timing
          (prepass+staging) vs (jit call) per block
  pipe  : same workload with the jit call on a single worker thread
          (queue depth 1), vs the stock synchronous loop

Usage: python tools/evabl2.py [n_blocks] [B]
"""
import os
import queue
import sys
import threading
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
    for i in range(V // 2):
        s.queue_event("midi_in", 0,
                      raw_midi_event([0x90, 36 + (i % 64), 100]))
    s.process_block()

    note = [60]

    def queue_pair():
        s.queue_event("midi_in", 17,
                      raw_midi_event([0x80, 60 + (note[0] % 24), 0]))
        s.queue_event("midi_in", 17,
                      raw_midi_event([0x90, 60 + (note[0] % 24), 90]))
        note[0] += 1

    # ---- split: monkeypatch-time the jit call inside process_block ----
    import oscen_tpu.graph.compile as C
    jit_t = [0.0]
    orig_packed_call = s._packed_call

    def timed_packed_call(*a, **k):
        fn, packed = orig_packed_call(*a, **k)

        def timed_fn(state, packed, per_block):
            t0 = time.perf_counter()
            r = fn(state, packed, per_block)
            jit_t[0] += time.perf_counter() - t0
            return r

        return timed_fn, packed

    s._packed_call = timed_packed_call
    for _ in range(8):
        queue_pair()
        s.process_block()
    jit_t[0] = 0.0
    t0 = time.perf_counter()
    last = None
    for _ in range(n_blocks):
        queue_pair()
        last = s.process_block()
    jax.block_until_ready(last["out"])
    total = time.perf_counter() - t0
    s._packed_call = orig_packed_call
    per = total / n_blocks * 1e6
    jit_us = jit_t[0] / n_blocks * 1e6
    print(f"[evabl2] split: total {per:7.1f} us/block  "
          f"jit-call {jit_us:7.1f}  host(prepass+pack) {per - jit_us:7.1f}"
          f"  ({B / SR * 1e6 / per:6.1f}x RT)", flush=True)

    # ---- pipe: jit call on a worker thread, queue depth 1 ----
    # The worker serializes state threading; the main thread runs the
    # NEXT block's prepass+staging while the worker blocks on the relay.
    def run_pipe(n):
        q: "queue.Queue" = queue.Queue(maxsize=1)
        done = threading.Event()

        def worker():
            while True:
                item = q.get()
                if item is None:
                    break
                thunk = item
                thunk()
            done.set()

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        t0 = time.perf_counter()
        for _ in range(n):
            queue_pair()
            # stage on the main thread (prepass mutates only host state)
            ev_bufs, host_vals = s._host_prepass(B)
            import numpy as np
            dyn_np = {}
            per_block = {}
            for gi in s.ir.inputs:
                if gi.kind.name == "VALUE":
                    dyn_np[gi.name] = s._params[gi.name] \
                        .materialize_block(B)
                elif gi.kind.name == "STREAM":
                    shape = (B,) if gi.channels == 1 else (B, gi.channels)
                    per_block[gi.name] = s._cached_zeros(shape)
            for k, arr in host_vals.items():
                dyn_np[k] = np.asarray(arr, np.float32)
            ev_caps = tuple(sorted((k, v.capacity)
                                   for k, v in ev_bufs.items()))
            s._staging_cache = {}
            fn, packed = s._packed_call(B, ev_caps, per_block, dyn_np,
                                        ev_bufs)

            def thunk(fn=fn, packed=packed, per_block=per_block):
                s.state, _ = fn(s.state, packed, per_block)

            q.put(thunk)
        q.put(None)
        done.wait()
        jax.block_until_ready(s.state)
        dt = time.perf_counter() - t0
        return dt / n * 1e6

    for _ in range(2):
        us = run_pipe(n_blocks)
        print(f"[evabl2] pipe : {us:7.1f} us/block  "
              f"({B / SR * 1e6 / us:6.1f}x RT)", flush=True)
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            queue_pair()
            last = s.process_block()
        jax.block_until_ready(last["out"])
        us2 = (time.perf_counter() - t0) / n_blocks * 1e6
        print(f"[evabl2] sync : {us2:7.1f} us/block  "
              f"({B / SR * 1e6 / us2:6.1f}x RT)", flush=True)


if __name__ == "__main__":
    main()
