"""A/B: fm_chain3_scan vs pivot_chain3_scan standalone on chip.

Also measures the const-dt variants ([3,1,V] dt rows — the steady-block
staging from [1]-shaped handler frequency): prices the three hoisted
per-sample dt reads."""
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

    B, V = 1024, 256
    rng = np.random.default_rng(0)
    ph = jnp.asarray(rng.uniform(0, 1, (3, V)), jnp.float32)
    pv = jnp.zeros((3, V), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.01, (3, B, V)), jnp.float32)
    lvl = jnp.full((3, V), 0.5, jnp.float32)
    fb = jnp.full((3, V), 0.3, jnp.float32)
    mix = jnp.full((V,), 0.4, jnp.float32)
    env = jnp.asarray(rng.uniform(0.1, 1.0, (B, V)), jnp.float32)

    dtc = dt[:, :1, :]  # [3, 1, V] block-constant rows

    fns = {}
    for name, scan, d in (("fm", fm_chain3_scan, dt),
                          ("fm_cdt", fm_chain3_scan, dtc),
                          ("pivot", pivot_chain3_scan, dt),
                          ("pivot_cdt", pivot_chain3_scan, dtc)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def span_fn(state, n, scan=scan, d=d):
            def body(c, _):
                ph, pv = c
                y, ph, pv = scan(ph, pv, d, lvl, fb, mix, env, env, env)
                return (ph, pv), jnp.sum(y * y)
            c, ys = jax.lax.scan(body, state, None, length=n)
            return jnp.sum(ys)
        fns[name] = span_fn

    state = (ph, pv)
    # numerics: const-dt rows must equal the same constant as [3,B,V]
    dtb = jnp.broadcast_to(dtc, dt.shape)
    for name, scan in (("fm", fm_chain3_scan), ("pivot",
                                                pivot_chain3_scan)):
        ya, _, _ = scan(ph, pv, dtb, lvl, fb, mix, env, env, env)
        yb, _, _ = scan(ph, pv, dtc, lvl, fb, mix, env, env, env)
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"[numerics {name} const-dt: max abs err {err:.3e}]",
              file=sys.stderr, flush=True)

    n_small, n_large = 32, 256
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
    for name, ws in results.items():
        us = min(ws) / (n_large - n_small) * 1e6
        print(f"{name:6s}: {us:6.2f} us/block")


if __name__ == "__main__":
    main()
