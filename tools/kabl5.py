"""Ablation round 3c: h-major restructure of the additive kernel.

v3 iterates TICKS and pays a Sum_H sublane reduce (12 ops) plus a
sequential [1,V] envelope-row recurrence (~24 slots) per tick — together
~6 of its 20.4 us (kabl4: norows -3.0, and the reduce is inherent).

The h-major form iterates HARMONICS per subgroup and accumulates
[SUB_ticks, V] planes:

    for h:  acc += (z_rh*Mi3_h + z_ih*Mr3_h) * (tgt_h + r1*D_h + r2*G1_h)

- the Sum_H is free (it IS the accumulation loop — no sublane tree)
- r1/r2 become [SUB, V] planes built ONCE per subgroup by a log-step
  masked cumprod (pltpu.roll), not 32 sequential row steps
- the rotation tables Mi3/Mr3 (3*sin/cos((j+1)*theta), [H*SUB, V]) are
  frequency-only: computed OUTSIDE the kernel once per steady segment
  (they are block-invariant), read per call (~2 MB DMA)

Variants:
  v3b      : production kernel (baseline)
  hmaj_cp  : h-major, in-kernel cumprod rows, external tables
  hmaj_x   : h-major, rows ALSO external [B, V] (prices the cumprod)
  hmaj_t2  : hmaj_cp with a 2-tile voice grid (DMA/compute overlap)

Each h-major variant is also numerics-checked against v3b (one block,
same entry state; tables differ by direct-sin vs iterated-product
rounding, so tolerance 1e-3 on the unit-scale mix).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERP = 64.0


def make_v3b(U, SUB):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kern(or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref,
             mult_ref, step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o):
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
            rows = []
            for j in range(SUB):
                amp = r2s[j] * G1 + (r1s[j] * D + tgt)
                im = zr * mji3[j] + zi * mjr3[j]
                rows.append(jnp.sum(im * amp, axis=0, keepdims=True))
            zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
            tgt = jnp.where(wrapped, tgtm, tgt)
            D = jnp.where(wrapped, -G1, D)
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


def make_hmaj(U, SUB, H, ext_rows):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(*refs):
        if ext_rows:
            (or_ref, oi_ref, ti_ref, tr_ref, msr_ref, msi_ref, cur_ref,
             tgt_ref, mult_ref, step_ref, r1_ref, r2_ref,
             y_ref, or_o, oi_o, cur_o, tgt_o, step_o) = refs
        else:
            (or_ref, oi_ref, ti_ref, tr_ref, msr_ref, msi_ref, cur_ref,
             tgt_ref, mult_ref, step_ref,
             y_ref, or_o, oi_o, cur_o, tgt_o, step_o) = refs
        mult = mult_ref[:]
        msr = msr_ref[:]
        msi = msi_ref[:]
        B = y_ref.shape[0]
        V = mult.shape[1]

        J = jax.lax.broadcasted_iota(jnp.int32, (SUB, V), 0).astype(
            jnp.float32)
        shift_masks = [J >= float(sh) for sh in (1, 2, 4, 8, 16)
                       if sh < SUB]

        def rows_for(p, s):
            # [SUB, V] planes of the envelope coefficient rows, exactly
            # replaying the per-tick recurrence semantics:
            #   wrap at s==0 resets p to 63/64; otherwise p *= (63-s)/64
            S = s + J
            s0z = s == 0.0
            wrapped = jnp.logical_or(S >= 65.0, s0z)
            shift = jnp.where(s0z, 0.0, 65.0)
            seff = jnp.where(wrapped, S - shift, S)
            a = (63.0 - seff) * (1.0 / 64.0)
            am = jnp.where(wrapped, a, 1.0)   # post-wrap segment
            ap = jnp.where(wrapped, 1.0, a)   # pre-wrap segment
            sh = 1
            for mask in shift_masks:
                am = jnp.where(mask, am * pltpu.roll(am, sh, 0), am)
                ap = jnp.where(mask, ap * pltpu.roll(ap, sh, 0), ap)
                sh *= 2
            r1 = p * jnp.where(wrapped, 0.0, ap)
            r2 = jnp.where(wrapped, 1.0 - am, 0.0)
            p_out = jnp.where(wrapped[SUB - 1:SUB], am[SUB - 1:SUB],
                              p * ap[SUB - 1:SUB])
            se_last = seff[SUB - 1:SUB]
            s_out = jnp.where(se_last < 64.0, se_last + 1.0, 0.0)
            return r1, r2, p_out, s_out, wrapped[SUB - 1:SUB]

        def body(i, carry):
            zr, zi, tgt, D, p, s = carry
            for g in range(U // SUB):
                if ext_rows:
                    base = i * U + g * SUB
                    r1 = r1_ref[pl.ds(base, SUB), :]
                    r2 = r2_ref[pl.ds(base, SUB), :]
                    # still advance p/s for the carry (cheap rows)
                    _, _, p, s, w_last = rows_for(p, s)
                else:
                    r1, r2, p, s, w_last = rows_for(p, s)
                tgtm = tgt * mult
                G1 = tgtm - tgt
                acc = jnp.zeros((SUB, V), jnp.float32)
                for h in range(H):
                    Mi = ti_ref[h * SUB:(h + 1) * SUB, :]
                    Mr = tr_ref[h * SUB:(h + 1) * SUB, :]
                    im = zr[h:h + 1] * Mi + zi[h:h + 1] * Mr
                    amp = r1 * D[h:h + 1] + tgt[h:h + 1]
                    amp = r2 * G1[h:h + 1] + amp
                    acc = acc + im * amp
                mix = jnp.sum(acc, axis=1, keepdims=True)
                y_ref[pl.ds(i * U + g * SUB, SUB), :] = (
                    jnp.broadcast_to(mix, (SUB, 128)))
                zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
                tgt = jnp.where(w_last, tgtm, tgt)
                D = jnp.where(w_last, -G1, D)
            return (zr, zi, tgt, D, p, s)

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


def build_fn(variant, H, V, B, tables):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = 64
    SUB = 32
    n_tiles = 2 if variant == "hmaj_t2" else 1
    tile = V // n_tiles

    def vspec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    plane = jax.ShapeDtypeStruct((H, V), jnp.float32)
    if variant == "v3b":
        y_shape = jax.ShapeDtypeStruct((B, 1), jnp.float32)
        y_spec = pl.BlockSpec((B, 1), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        y_shape = jax.ShapeDtypeStruct((B, 128 * n_tiles), jnp.float32)
        y_spec = pl.BlockSpec((B, 128), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    ti3, tr3, msr, msi, r1b, r2b = tables

    if variant == "v3b":
        def call(ore, oim, mr, mi, cur, tgt, mult, step):
            return pl.pallas_call(
                make_v3b(U, SUB),
                grid=(1,),
                out_shape=(y_shape, plane, plane, plane, plane,
                           jax.ShapeDtypeStruct((1, V), jnp.float32)),
                in_specs=[vspec(H)] * 7 + [vspec(1)],
                out_specs=(y_spec,) + (vspec(H),) * 4 + (vspec(1),),
            )(ore, oim, mr, mi, cur, tgt, mult, step)
        return call

    ext_rows = variant == "hmaj_x"
    extra_in = [vspec(B), vspec(B)] if ext_rows else []
    extra_args = (r1b, r2b) if ext_rows else ()

    def call(ore, oim, mr, mi, cur, tgt, mult, step):
        return pl.pallas_call(
            make_hmaj(U, SUB, H, ext_rows),
            grid=(n_tiles,),
            out_shape=(y_shape, plane, plane, plane, plane,
                       jax.ShapeDtypeStruct((1, V), jnp.float32)),
            in_specs=([vspec(H)] * 2 + [vspec(H * SUB)] * 2
                      + [vspec(H)] * 5 + [vspec(1)] + extra_in),
            out_specs=(y_spec,) + (vspec(H),) * 4 + (vspec(1),),
        )(ore, oim, ti3, tr3, msr, msi, cur, tgt, mult, step,
          *extra_args)
    return call


def ref_rows(p0, s0, B):
    """Replay the per-tick recurrence in numpy -> r1/r2 [B, V]."""
    p = p0.copy()
    s = s0.copy()
    wrapped = np.zeros_like(s, dtype=bool)
    r1 = np.zeros((B,) + p.shape[1:], np.float32)
    r2 = np.zeros_like(r1)
    SUB = 32
    for j in range(B):
        if j % SUB == 0:
            wrapped[:] = False
        wrap = s == 0.0
        wrapped |= wrap
        p = np.where(wrap, np.float32(63.0 / 64.0),
                     p * (1.0 - (s + 1.0) / 64.0)).astype(np.float32)
        r1[j] = np.where(wrapped, 0.0, p)
        r2[j] = np.where(wrapped, 1.0 - p, 0.0)
        s = np.where(s < 64.0, s + 1.0, 0.0).astype(np.float32)
    return r1, r2


def main():
    import jax
    import jax.numpy as jnp

    H, V, B = 32, 256, 1024
    SUB = 32
    variants = sys.argv[1:] or ["v3b", "hmaj_cp", "hmaj_x", "hmaj_t2"]
    rng = np.random.default_rng(0)
    th = (2 * np.pi * (55.0 * (1 + rng.integers(0, 48, V))[None, :]
                       * np.arange(1, H + 1)[:, None]) / 48000.0)
    mr = jnp.asarray(np.cos(th), jnp.float32)
    mi = jnp.asarray(np.sin(th), jnp.float32)
    jj = np.arange(1, SUB + 1)[None, :, None]
    ti3 = jnp.asarray((3.0 * np.sin(jj * th[:, None, :])).reshape(
        H * SUB, V), jnp.float32)
    tr3 = jnp.asarray((3.0 * np.cos(jj * th[:, None, :])).reshape(
        H * SUB, V), jnp.float32)
    msr = jnp.asarray(np.cos(SUB * th), jnp.float32)
    msi = jnp.asarray(np.sin(SUB * th), jnp.float32)
    ore = jnp.ones((H, V))
    oim = jnp.zeros((H, V))
    cur = jnp.asarray(rng.uniform(0.01, 0.3, (H, V)), jnp.float32)
    tgt = cur * np.float32(0.999)
    mult = jnp.full((H, V), 0.999, jnp.float32)
    step_np = rng.integers(0, 64, (1, V)).astype(np.float32)
    step = jnp.asarray(step_np)

    p0 = np.ones((1, V), np.float32)
    r1b_np, r2b_np = ref_rows(p0, step_np, B)
    r1b = jnp.asarray(r1b_np)
    r2b = jnp.asarray(r2b_np)
    tables = (ti3, tr3, msr, msi, r1b, r2b)

    fns = {}
    calls = {}
    for vr in variants:
        call = build_fn(vr, H, V, B, tables)
        calls[vr] = call

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

    # numerics: one block each vs v3b
    if "v3b" in calls:
        ref_y = np.asarray(calls["v3b"](ore, oim, mr, mi, cur, tgt,
                                        mult, step)[0]).sum(axis=1)
        for vr, call in calls.items():
            if vr == "v3b":
                continue
            y = np.asarray(call(ore, oim, mr, mi, cur, tgt, mult,
                                step)[0])[:, ::128].sum(axis=1)
            err = np.max(np.abs(y - ref_y))
            scale = np.max(np.abs(ref_y)) + 1e-9
            print(f"[numerics {vr}: max abs err {err:.3e} "
                  f"(scale {scale:.3e})]", file=sys.stderr, flush=True)

    n_small, n_large = 64, 512
    for vr, fn in fns.items():
        t0 = time.perf_counter()
        try:
            for n in (n_small, n_large):
                float(fn(state, n))
        except Exception as e:
            print(f"[{vr} FAILED: {type(e).__name__}: {e}]"[:400],
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
