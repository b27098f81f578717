"""Ablation profile of the fused additive kernel, standalone.

Times variants of the v3 kernel in ONE process (same chip state) to
attribute cost: full, no_amp (amp=tgt), no_rows (constant coefficient
rows), no_env (amp=1), no_reduce (keep plane, no harmonic sum),
rot_only (just the rotation update + store).

Usage: python tools/kabl.py [variants...]
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERP = 64.0


def make_kernel(U, SUB, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kern(or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref, mult_ref,
             step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o):
        mr = mr_ref[:]
        mi = mi_ref[:]
        mult = mult_ref[:]
        B = y_ref.shape[0]
        mjr = [mr]
        mji = [mi]
        for _ in range(SUB - 1):
            pr, pi = mjr[-1], mji[-1]
            mjr.append(pr * mr - pi * mi)
            mji.append(pr * mi + pi * mr)
        msr, msi = mjr[SUB - 1], mji[SUB - 1]
        mji3 = [m * 3.0 for m in mji]
        mjr3 = [m * 3.0 for m in mjr]

        def subgroup(carry):
            zr, zi, tgt, D, p, s = carry
            tgtm = tgt * mult
            G1 = tgtm - tgt
            r1s = []
            r2s = []
            wrapped = jnp.zeros_like(s, dtype=jnp.bool_)
            if variant == "no_rows":
                r1s = [p * 0.5] * SUB
                r2s = [p * 0.25] * SUB
            else:
                for _ in range(SUB):
                    wrap = s == 0.0
                    wrapped = jnp.logical_or(wrapped, wrap)
                    p = jnp.where(wrap, 63.0 / 64.0,
                                  p * (1.0 - (s + 1.0) / INTERP))
                    r1s.append(jnp.where(wrapped, 0.0, p))
                    r2s.append(jnp.where(wrapped, 1.0 - p, 0.0))
                    s = jnp.where(s < INTERP, s + 1.0, 0.0)
            rows = []
            for j in range(SUB):
                if variant in ("no_amp", "no_rows2"):
                    amp = tgt
                elif variant == "no_env":
                    amp = None
                else:
                    amp = r2s[j] * G1 + (r1s[j] * D + tgt)
                im = zr * mji3[j] + zi * mjr3[j]
                prod = im if amp is None else im * amp
                if variant == "no_reduce":
                    rows.append(prod[:1])
                else:
                    rows.append(jnp.sum(prod, axis=0, keepdims=True))
            zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
            w_last = wrapped
            tgt = jnp.where(w_last, tgtm, tgt)
            D = jnp.where(w_last, -G1, D)
            return (zr, zi, tgt, D, p, s), rows, tgt

        def body(i, carry):
            carry, cur_last = carry
            all_rows = []
            for _ in range(U // SUB):
                carry, rows, cur_last = subgroup(carry)
                all_rows.extend(rows)
            Y = jnp.concatenate(all_rows, axis=0)
            y_ref[pl.ds(i * U, U), :] = jnp.sum(Y, axis=1, keepdims=True)
            return (carry, cur_last)

        zr0 = or_ref[:]
        zi0 = oi_ref[:]
        cur0 = cur_ref[:]
        s0 = step_ref[:]
        tgt0 = jnp.where(s0 == 0.0, cur0, tgt_ref[:])
        D0 = cur0 - tgt0
        p0 = jnp.ones_like(s0)
        (carry, cur_last) = jax.lax.fori_loop(
            0, B // U, body, ((zr0, zi0, tgt0, D0, p0, s0), cur0))
        zr, zi, tgt, D, p, s = carry
        or_o[:] = zr
        oi_o[:] = zi
        cur_o[:] = cur_last
        tgt_o[:] = tgt
        step_o[:] = s
    return kern


def build_fn(variant, H, V, B):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = 64
    SUB = 32

    def vspec(rows):
        return pl.BlockSpec((rows, V), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    plane = jax.ShapeDtypeStruct((H, V), jnp.float32)
    y_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
    y_spec = pl.BlockSpec((B, 1), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    def call(ore, oim, mr, mi, cur, tgt, mult, step):
        return pl.pallas_call(
            make_kernel(U, SUB, variant),
            grid=(1,),
            out_shape=(y_shape, plane, plane, plane, plane,
                       jax.ShapeDtypeStruct((1, V), jnp.float32)),
            in_specs=[vspec(H)] * 7 + [vspec(1)],
            out_specs=(y_spec,) + (vspec(H),) * 4 + (vspec(1),),
        )(ore, oim, mr, mi, cur, tgt, mult, step)
    return call


def main():
    import jax
    import jax.numpy as jnp

    H, V, B = 32, 256, 1024
    variants = sys.argv[1:] or ["full", "no_amp", "no_rows", "no_env",
                                "no_reduce"]
    rng = np.random.default_rng(0)
    th = (2 * np.pi * (55.0 * (1 + rng.integers(0, 48, V))[None, :]
                       * np.arange(1, H + 1)[:, None]) / 48000.0)
    mr = jnp.asarray(np.cos(th), jnp.float32)
    mi = jnp.asarray(np.sin(th), jnp.float32)
    args0 = (jnp.ones((H, V)), jnp.zeros((H, V)),
             jnp.asarray(rng.uniform(0.01, 0.3, (H, V)), jnp.float32))
    cur = args0[2]
    tgt = cur * np.float32(0.999)
    mult = jnp.full((H, V), 0.999, jnp.float32)
    step = jnp.asarray(rng.integers(0, 64, (1, V)), jnp.float32)

    fns = {}
    for vr in variants:
        call = build_fn(vr, H, V, B)

        @functools.partial(jax.jit, static_argnames=("n",))
        def span_fn(state, n, call=call):
            def body(c, _):
                ore, oim, cur, tgt, st = c
                y, ore, oim, cur, tgt, st = call(ore, oim, mr, mi, cur,
                                                 tgt, mult, st)
                return (ore, oim, cur, tgt, st), jnp.sum(y * y)
            c, ys = jax.lax.scan(body, state, None, length=n)
            return jnp.sum(ys)
        fns[vr] = span_fn

    state = (args0[0], args0[1], cur, tgt, step)
    n_small, n_large = 64, 512
    for vr, fn in fns.items():
        t0 = time.perf_counter()
        for n in (n_small, n_large):
            float(fn(state, n))
        print(f"[compiled {vr} in {time.perf_counter()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    def span(fn, n):
        t0 = time.perf_counter()
        float(fn(state, n))
        return time.perf_counter() - t0

    results = {vr: [] for vr in fns}
    for _ in range(3):
        for vr, fn in fns.items():
            diffs = sorted(span(fn, n_large) - span(fn, n_small)
                           for _ in range(5))
            results[vr].append(max(diffs[2], 1e-9))
    for vr, ws in results.items():
        us = min(ws) / (n_large - n_small) * 1e6
        print(f"{vr:10s}: {us:6.2f} us/block")


if __name__ == "__main__":
    main()
