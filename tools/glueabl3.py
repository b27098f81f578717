"""Ablation round 5b: fresh B=1024 flagship attribution.

Three variants interleaved per window (chip-state discipline):
  kern  : the fused additive kernel alone (with_mix, steady chord state),
          scanned on device with the same fori_loop harness the bench's
          steady_checksum uses
  notrem: full graph minus Tremolo (mix straight to the mono output)
  full  : the bench path (mix -> Tremolo -> stereo out)

full - notrem prices the tremolo + stereo [B,2] boundary today;
notrem - kern prices the remaining graph glue.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, SR, B = 256, 48_000.0, 1024


def make_kernel_runner():
    """Steady kernel-only scan: state threads through fori_loop, energy
    checksum out (mirrors steady_checksum's forcing)."""
    import jax
    import jax.numpy as jnp
    from oscen_tpu.ops.pallas.additive import additive_voice_block

    H = 32
    import numpy as np
    rng = np.random.default_rng(0)
    th = rng.uniform(0.001, 0.2, (H, V))
    mul_re = jnp.asarray(np.cos(th), jnp.float32)
    mul_im = jnp.asarray(np.sin(th), jnp.float32)
    state0 = (jnp.asarray(rng.normal(size=(H, V)), jnp.float32),
              jnp.asarray(rng.normal(size=(H, V)), jnp.float32),
              jnp.asarray(rng.uniform(0, 1, (H, V)), jnp.float32),
              jnp.asarray(rng.uniform(0, 1, (H, V)), jnp.float32),
              jnp.asarray(rng.integers(0, 65, (V,)), jnp.int32))
    mult = jnp.asarray(rng.uniform(0.99, 1.0, (H, V)), jnp.float32)

    @jax.jit
    def run(state, n):
        def body(_, carry):
            st, acc = carry
            ore, oim, cur, tgt, step = st
            y, or2, oi2, cur2, tgt2, step2 = additive_voice_block(
                ore, oim, mul_re, mul_im, cur, tgt, mult, step, B,
                with_mix=True)
            return ((or2, oi2, cur2, tgt2, step2.astype(jnp.int32)),
                    acc + jnp.sum(y ** 2))
        st, ck = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return ck

    def checksum(n):
        return float(run(state0, jnp.int32(n)))
    return checksum


def make_graph_runner(with_tremolo):
    import jax
    from oscen_tpu import raw_midi_event
    if with_tremolo:
        from oscen_tpu.models.electric_piano import build_electric_piano
        g = build_electric_piano(V)
    else:
        from tools.glueabl import build_no_tremolo
        g = build_no_tremolo(V)
    s = g.compile(sample_rate=SR, block_size=B, mode="block")
    for i in range(V):
        s.queue_event("midi_in", 0, raw_midi_event([0x90, 36 + (i % 64),
                                                    100]))
    out = s.process_block()
    jax.block_until_ready([v for v in out.values() if hasattr(v, "shape")])
    return s.steady_checksum


def main():
    t0 = time.time()
    runners = {}
    runners["kern"] = make_kernel_runner()
    runners["kern"](4)
    print(f"[glueabl3] kern ready {time.time()-t0:.0f}s", flush=True)
    runners["notrem"] = make_graph_runner(False)
    runners["notrem"](4)
    print(f"[glueabl3] notrem ready {time.time()-t0:.0f}s", flush=True)
    runners["full"] = make_graph_runner(True)
    runners["full"](4)
    print(f"[glueabl3] full ready {time.time()-t0:.0f}s", flush=True)

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
        print(f"[glueabl3] w{i}: " + "  ".join(line) + " us/block",
              flush=True)
    for k, ws in results.items():
        ws.sort()
        print(f"{k:7s}: best {ws[0]:6.2f}  med {ws[len(ws)//2]:6.2f}")


if __name__ == "__main__":
    main()
