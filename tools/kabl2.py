"""Ablation round 2: isolate row-delivery mechanism costs in the fused
additive kernel.

Variants (all with constant-ish plane math so only the rows mechanism
differs):
  base      : constant vreg rows (the 10.6 us floor from round 1)
  recur     : v2 sequential row recurrence (the 21.4 us baseline)
  loads     : rows loaded per tick from a scratch filled once at start
  dot32     : 32 per-subgroup one-hot MXU dots, results discarded
  dot4      : 4 chunked whole-block one-hot MXU dots, results discarded
  v4        : dot per subgroup + scratch + loads (current v4)
  v5        : 4 chunked whole-block dots -> scratch; per-tick loads
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERP = 64.0


def make_kernel(U, SUB, variant, B, PAD=72):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NSUB = B // SUB

    def kern(tbl_ref, or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref,
             mult_ref, step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o,
             scr):
        mr = mr_ref[:]
        mi = mi_ref[:]
        mult = mult_ref[:]
        V = step_ref.shape[1]
        mjr = [mr]
        mji = [mi]
        for _ in range(SUB - 1):
            pr, pi = mjr[-1], mji[-1]
            mjr.append(pr * mr - pi * mi)
            mji.append(pr * mi + pi * mr)
        msr, msi = mjr[SUB - 1], mji[SUB - 1]
        mji3 = [m * 3.0 for m in mji]
        mjr3 = [m * 3.0 for m in mjr]

        iota_s = jax.lax.broadcasted_iota(jnp.int32, (PAD, V), 0)
        onehot = (iota_s == step_ref[:].astype(jnp.int32)).astype(
            jnp.bfloat16)

        if variant in ("loads", "v5"):
            # fill scratch once (v5: via 4 chunked whole-block dots)
            if variant == "loads":
                scr[:, :] = jnp.zeros_like(scr)
            else:
                C = (2 * B) // 4
                for c in range(4):
                    tb = tbl_ref[c * C:(c + 1) * C, :]
                    lo = tbl_ref[2 * B + c * C:2 * B + (c + 1) * C, :]
                    o1 = jax.lax.dot_general(
                        tb, onehot, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o2 = jax.lax.dot_general(
                        lo, onehot, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    scr[c * C:(c + 1) * C, :] = o1 + o2
        if variant == "dot4":
            C = (2 * B) // 4
            acc = None
            for c in range(4):
                tb = tbl_ref[c * C:(c + 1) * C, :]
                o1 = jax.lax.dot_general(
                    tb, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = o1 if acc is None else acc + o1
            scr[:4 * SUB, :] = acc[:4 * SUB]  # keep it alive

        def subgroup(k, carry):
            zr, zi, tgt, D, p, s = carry
            tgtm = tgt * mult
            G1 = tgtm - tgt
            r1s = r2s = None
            if variant == "recur":
                r1s, r2s = [], []
                wrapped = jnp.zeros_like(s, dtype=jnp.bool_)
                for _ in range(SUB):
                    wrap = s == 0.0
                    wrapped = jnp.logical_or(wrapped, wrap)
                    p = jnp.where(wrap, 63.0 / 64.0,
                                  p * (1.0 - (s + 1.0) / INTERP))
                    r1s.append(jnp.where(wrapped, 0.0, p))
                    r2s.append(jnp.where(wrapped, 1.0 - p, 0.0))
                    s = jnp.where(s < INTERP, s + 1.0, 0.0)
            elif variant in ("base", "dot32", "dot4"):
                r1s = [p * 0.5] * SUB
                r2s = [p * 0.25] * SUB
            if variant in ("dot32", "v4"):
                tb = tbl_ref[pl.ds(k * 4 * SUB, 4 * SUB), :]
                out = jax.lax.dot_general(
                    tb, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if variant == "v4":
                    scr[:4 * SUB // 2, :] = out[:2 * SUB] + out[2 * SUB:]
                else:
                    scr[:4 * SUB, :] = out  # keep alive
            rows = []
            for j in range(SUB):
                if variant in ("loads", "v5"):
                    r1 = scr[pl.ds(k * SUB + j, 1), :]
                    r2 = scr[pl.ds(B + k * SUB + j, 1), :]
                elif variant == "v4":
                    r1 = scr[j:j + 1, :]
                    r2 = scr[SUB + j:SUB + j + 1, :]
                else:
                    r1 = r1s[j]
                    r2 = r2s[j]
                amp = r2 * G1 + (r1 * D + tgt)
                im = zr * mji3[j] + zi * mjr3[j]
                rows.append(jnp.sum(im * amp, axis=0, keepdims=True))
            zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
            w_last = jnp.logical_or(s == 0.0, s >= 66.0 - SUB)
            tgt = jnp.where(w_last, tgtm, tgt)
            D = jnp.where(w_last, -G1, D)
            if variant != "recur":
                s = s + float(SUB)
                s = jnp.where(s >= 65.0, s - 65.0, s)
            return (zr, zi, tgt, D, p, s), rows

        def body(i, carry):
            all_rows = []
            for u in range(U // SUB):
                k = i * (U // SUB) + u
                carry, rows = subgroup(k, carry)
                all_rows.extend(rows)
            Y = jnp.concatenate(all_rows, axis=0)
            y_ref[pl.ds(i * U, U), :] = jnp.sum(Y, axis=1, keepdims=True)
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
    SUB = 32
    PAD = 72

    tbl = jnp.zeros((4 * B, PAD), jnp.bfloat16)

    def vspec(rows):
        return pl.BlockSpec((rows, V), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    plane = jax.ShapeDtypeStruct((H, V), jnp.float32)
    y_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
    y_spec = pl.BlockSpec((B, 1), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec((4 * B, PAD), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    scr_rows = 2 * B if variant in ("loads", "v5") else 4 * SUB

    def call(ore, oim, mr, mi, cur, tgt, mult, step):
        return pl.pallas_call(
            make_kernel(U, SUB, variant, B, PAD),
            grid=(1,),
            out_shape=(y_shape, plane, plane, plane, plane,
                       jax.ShapeDtypeStruct((1, V), jnp.float32)),
            in_specs=[tbl_spec] + [vspec(H)] * 7 + [vspec(1)],
            out_specs=(y_spec,) + (vspec(H),) * 4 + (vspec(1),),
            scratch_shapes=[pltpu.VMEM((scr_rows, V), jnp.float32)],
        )(tbl, ore, oim, mr, mi, cur, tgt, mult, step)
    return call


def main():
    import jax
    import jax.numpy as jnp

    H, V, B = 32, 256, 1024
    variants = sys.argv[1:] or ["base", "recur", "loads", "dot32",
                                "dot4", "v4", "v5"]
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
        print(f"{vr:8s}: {us:6.2f} us/block")


if __name__ == "__main__":
    main()
