"""Ablation round 3b: cost attribution of the v3 additive kernel at the
production config (256 voices, B=1024, with_mix), plus candidate rewrites.

Attribution variants (each removes ONE cost component; the delta vs v3b
is that component's price):
  v3b      : production kernel (f32, 2-FMA amp, row recurrence, SUB=32)
  norows   : row pre-pass replaced by compile-time constant r1/r2
             (prices the sequential [1,V] p/s/wrap recurrence)
  noamp    : amp = tgt (prices the 2 plane FMAs + row broadcasts)
  noim     : im = zr (prices the 2-FMA rotation application)
  nored    : per-tick sublane reduce replaced by a row slice
             (prices the Sum_H reduction)
  noout    : y write dropped (prices concat + Sum_V + store)

Candidate rewrites (with_mix only needs Sum_{H,V}, so defer the
expensive intra-vreg part and let the MXU finish):
  defmix   : per tick, tree-add the 8 product vregs to ONE vreg and
             store it; per body, two tiny MXU dots (ones + block-diag)
             produce the [U,1] mix. Replaces per-tick Sum_H (12 ops) +
             per-body Sum_V with 7 adds + 1 store per tick.
  defmix64 : defmix at SUB=64 (halved subgroup boundary costs)
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERP = 64.0


def make_kernel(U, SUB, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    defmix = variant.startswith("defmix")

    def kern(or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref,
             mult_ref, step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o,
             scr):
        mr = mr_ref[:]
        mi = mi_ref[:]
        mult = mult_ref[:]
        B = y_ref.shape[0]
        V = mr.shape[1]

        mjr = [mr]
        mji = [mi]
        for _ in range(SUB - 1):
            pr, pi = mjr[-1], mji[-1]
            mjr.append(pr * mr - pi * mi)
            mji.append(pr * mi + pi * mr)
        msr, msi = mjr[SUB - 1], mji[SUB - 1]
        mji3 = [m * 3.0 for m in mji]
        mjr3 = [m * 3.0 for m in mjr]

        if variant == "norows":
            # constant rows (same op shape at the consumer, no recurrence)
            const_r1 = [np.float32(0.9 - 0.001 * j) for j in range(SUB)]
            const_r2 = [np.float32(0.001 * j) for j in range(SUB)]

        def subgroup(carry, base):
            zr, zi, tgt, D, p, s = carry
            tgtm = tgt * mult
            G1 = tgtm - tgt
            r1s, r2s = [], []
            wrapped = jnp.zeros_like(s, dtype=jnp.bool_)
            if variant == "norows":
                r1s = const_r1
                r2s = const_r2
                # still advance s so the carry keeps its shape/deps
                s = jnp.where(s + float(SUB) < INTERP + 1.0,
                              s + float(SUB), s)
                w_last = s == 0.0
            else:
                for _ in range(SUB):
                    wrap = s == 0.0
                    wrapped = jnp.logical_or(wrapped, wrap)
                    p = jnp.where(wrap, 63.0 / 64.0,
                                  p * (1.0 - (s + 1.0) / INTERP))
                    r1s.append(jnp.where(wrapped, 0.0, p))
                    r2s.append(jnp.where(wrapped, 1.0 - p, 0.0))
                    s = jnp.where(s < INTERP, s + 1.0, 0.0)
                w_last = wrapped
            rows = []
            for j in range(SUB):
                if variant == "noamp":
                    amp = tgt
                else:
                    amp = r2s[j] * G1 + (r1s[j] * D + tgt)
                if variant == "noim":
                    im = zr
                else:
                    im = zr * mji3[j] + zi * mjr3[j]
                prod = im * amp
                if defmix:
                    # 8 product vregs -> 1 vreg ([8, 128] partial);
                    # intra-vreg finish deferred to the MXU epilogue
                    t = prod
                    h = t.shape[0]
                    while h > 8:
                        t = t[: h // 2] + t[h // 2:]
                        h //= 2
                    while t.shape[1] > 128:
                        w = t.shape[1]
                        t = t[:, : w // 2] + t[:, w // 2:]
                    scr[pl.ds((base + j) * 8, 8), :] = t
                elif variant == "nored":
                    rows.append(prod[0:1, :])
                else:
                    rows.append(jnp.sum(prod, axis=0, keepdims=True))
            zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
            tgt = jnp.where(w_last, tgtm, tgt)
            D = jnp.where(w_last, -G1, D)
            if variant == "norows":
                carry = (zr, zi, tgt, D, p, s)
            else:
                carry = (zr, zi, tgt, D, p, s)
            return carry, rows

        if defmix:
            ones_col = jnp.ones((128, 1), jnp.float32)
            bd = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (U, U * 8), 1) // 8
                == jax.lax.broadcasted_iota(jnp.int32, (U, U * 8), 0),
                1.0, 0.0)

        def body(i, carry):
            all_rows = []
            for g in range(U // SUB):
                carry, rows = subgroup(carry, g * SUB)
                all_rows.extend(rows)
            if defmix:
                part = scr[:]                       # [U*8, 128]
                col = jax.lax.dot_general(
                    part, ones_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [U*8, 1]
                y = jax.lax.dot_general(
                    bd, col, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [U, 1]
                y_ref[pl.ds(i * U, U), :] = y
            else:
                Y = jnp.concatenate(all_rows, axis=0)
                if variant == "noout":
                    y_ref[pl.ds(i * U, U), :] = jnp.zeros(
                        (U, 1), jnp.float32) + Y[0, 0] * 0.0
                else:
                    y_ref[pl.ds(i * U, U), :] = jnp.sum(
                        Y, axis=1, keepdims=True)
            return carry

        zr0 = or_ref[:]
        zi0 = oi_ref[:]
        cur0 = cur_ref[:]
        s0 = step_ref[:]
        tgt0 = jnp.where(s0 == 0.0, cur0, tgt_ref[:])
        D0 = cur0 - tgt0
        p0 = jnp.ones_like(s0)
        carry = jax.lax.fori_loop(
            0, B // U, body, (zr0, zi0, tgt0, D0, p0, s0))
        zr, zi, tgt, D, p, s = carry
        or_o[:] = zr
        oi_o[:] = zi
        cur_o[:] = tgt
        tgt_o[:] = tgt
        step_o[:] = s
    return kern


def build_fn(variant, H, V, B):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = 64
    SUB = 64 if variant.endswith("64") else 32

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
            scratch_shapes=[pltpu.VMEM((U * 8, 128), jnp.float32)],
        )(ore, oim, mr, mi, cur, tgt, mult, step)
    return call


def main():
    import jax
    import jax.numpy as jnp

    H, V, B = 32, 256, 1024
    variants = sys.argv[1:] or [
        "v3b", "norows", "noamp", "noim", "nored", "noout",
        "defmix", "defmix64"]
    rng = np.random.default_rng(0)
    th = (2 * np.pi * (55.0 * (1 + rng.integers(0, 48, V))[None, :]
                       * np.arange(1, H + 1)[:, None]) / 48000.0)
    mr = jnp.asarray(np.cos(th), jnp.float32)
    mi = jnp.asarray(np.sin(th), jnp.float32)
    ore = jnp.ones((H, V))
    oim = jnp.zeros((H, V))
    cur = jnp.asarray(rng.uniform(0.01, 0.3, (H, V)), jnp.float32)
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

    state = (ore, oim, cur, tgt, step)
    n_small, n_large = 64, 512
    for vr, fn in fns.items():
        t0 = time.perf_counter()
        try:
            for n in (n_small, n_large):
                float(fn(state, n))
        except Exception as e:
            print(f"[{vr} FAILED: {type(e).__name__}: {e}]"[:300],
                  file=sys.stderr, flush=True)
            fns[vr] = None
            continue
        print(f"[compiled {vr} in {time.perf_counter()-t0:.0f}s]",
              file=sys.stderr, flush=True)

    def span(fn, n):
        t0 = time.perf_counter()
        float(fn(state, n))
        return time.perf_counter() - t0

    results = {vr: [] for vr, fn in fns.items() if fn is not None}
    for _ in range(3):
        for vr in results:
            fn = fns[vr]
            diffs = sorted(span(fn, n_large) - span(fn, n_small)
                           for _ in range(5))
            results[vr].append(max(diffs[2], 1e-9))
    base = None
    for vr, ws in results.items():
        us = min(ws) / (n_large - n_small) * 1e6
        if vr == "v3b":
            base = us
        delta = f"  (delta {us - base:+6.2f})" if base is not None else ""
        print(f"{vr:9s}: {us:6.2f} us/block{delta}")


if __name__ == "__main__":
    main()
