"""Ablation round 3: precision/structure variants of the additive kernel.

  v3b      : current production kernel (f32, 2-FMA amp, row recurrence)
  v3b64    : SUB=64 (double subgroup, halved per-subgroup overheads)
  bf16_vpu : bf16 rotation/amp/product, upcast, f32 VPU reduce
  bf16_mxu : bf16 products staged to scratch, block-diag ones matmul
             with f32 accumulation on the MXU (true bf16-math/f32-acc)
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

    bf = jnp.bfloat16

    def kern(or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref,
             mult_ref, step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o,
             scr):
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
        if variant.startswith("bf16"):
            mji3 = [(m * 3.0).astype(bf) for m in mji]
            mjr3 = [(m * 3.0).astype(bf) for m in mjr]
        else:
            mji3 = [m * 3.0 for m in mji]
            mjr3 = [m * 3.0 for m in mjr]

        if variant == "bf16_mxu":
            ones = jnp.zeros((SUB, SUB * 32), bf)
            iota_j = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB * 32),
                                              0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB * 32),
                                              1)
            ones = jnp.where(iota_c // 32 == iota_j, 1.0, 0.0).astype(bf)

        def subgroup(carry):
            zr, zi, tgt, D, p, s = carry
            tgtm = tgt * mult
            G1 = tgtm - tgt
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
            if variant.startswith("bf16"):
                zrb = zr.astype(bf)
                zib = zi.astype(bf)
                tgtb = tgt.astype(bf)
                Db = D.astype(bf)
                G1b = G1.astype(bf)
            rows = []
            for j in range(SUB):
                if variant.startswith("bf16"):
                    ampb = (r2s[j].astype(bf) * G1b
                            + (r1s[j].astype(bf) * Db + tgtb))
                    imb = zrb * mji3[j] + zib * mjr3[j]
                    prodb = imb * ampb
                    if variant == "bf16_mxu":
                        scr[j * 32:(j + 1) * 32, :] = prodb
                    else:
                        rows.append(jnp.sum(
                            prodb.astype(jnp.float32), axis=0,
                            keepdims=True))
                else:
                    amp = r2s[j] * G1 + (r1s[j] * D + tgt)
                    im = zr * mji3[j] + zi * mjr3[j]
                    rows.append(jnp.sum(im * amp, axis=0, keepdims=True))
            if variant == "bf16_mxu":
                Y = jax.lax.dot_general(
                    ones, scr[:, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [SUB, V]
                rows = [Y]
            zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
            w_last = wrapped
            tgt = jnp.where(w_last, tgtm, tgt)
            D = jnp.where(w_last, -G1, D)
            return (zr, zi, tgt, D, p, s), rows

        def body(i, carry):
            all_rows = []
            for _ in range(U // SUB):
                carry, rows = subgroup(carry)
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
    SUB = 64 if variant == "v3b64" else 32

    def vspec(rows):
        return pl.BlockSpec((rows, V), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    plane = jax.ShapeDtypeStruct((H, V), jnp.float32)
    y_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
    y_spec = pl.BlockSpec((B, 1), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    scr_dtype = jnp.bfloat16 if variant == "bf16_mxu" else jnp.float32

    def call(ore, oim, mr, mi, cur, tgt, mult, step):
        return pl.pallas_call(
            make_kernel(U, SUB, variant),
            grid=(1,),
            out_shape=(y_shape, plane, plane, plane, plane,
                       jax.ShapeDtypeStruct((1, V), jnp.float32)),
            in_specs=[vspec(H)] * 7 + [vspec(1)],
            out_specs=(y_spec,) + (vspec(H),) * 4 + (vspec(1),),
            scratch_shapes=[pltpu.VMEM((SUB * 32, V), scr_dtype)],
        )(ore, oim, mr, mi, cur, tgt, mult, step)
    return call


def main():
    import jax
    import jax.numpy as jnp

    H, V, B = 32, 256, 1024
    variants = sys.argv[1:] or ["v3b", "v3b64", "bf16_vpu", "bf16_mxu"]
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
        print(f"{vr:9s}: {us:6.2f} us/block")


if __name__ == "__main__":
    main()
