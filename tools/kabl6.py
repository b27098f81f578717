"""Ablation round 3e: v5 = tick-major kernel (v3 structure) with the
envelope row pre-pass computed as [SUB, V] PLANE math instead of per-tick
[1, V] row ops.

Motivation (kabl4/kabl5): the per-tick row recurrence costs ~4.4 us of
the ~21.5 us kernel because each [1,V] op occupies 2 vregs and ~9-13 ops
run per tick with a serial dependency chain.  The plane form computes all
SUB rows at once: wrap masks from the closed-form wrap tick, then a
log-step masked segmented cumprod (pltpu.roll over the sublane/tick
axis), ~40 plane ops per subgroup ~= 10 vreg-slots/tick, chain depth
log2(SUB).  Per-tick consumption slices [1,V] rows out of the plane
(sublane extract + broadcast — the open question this ablation prices).

Numerics: the cumprod reassociates the telescoped product (tree order vs
serial), so v5 is NOT bit-identical to v3/v4 — expected deviation is
~1e-6 relative on p, within the kernel's documented ~5e-4 envelope-
closed-form budget.  Checked against v3b on one block.

Variants:
  v3b   : production v3 (baseline)
  v4    : committed v4 (closed-form wrap tick, serial p chain)
  v5    : plane rows + per-tick slices, SUB=32
  v5s64 : v5 with SUB=64 (halved subgroup boundary cost; log step +1)
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
    from jax.experimental.pallas import tpu as pltpu

    if variant == "v3b" or variant.startswith("v4"):
        import oscen_tpu.ops.pallas.additive as add
        kern = add._kernel_v3 if variant == "v3b" else add._kernel_v4
        return functools.partial(kern, U, SUB, True)

    def kern(or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref,
             mult_ref, step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o):
        mr = mr_ref[:]
        mi = mi_ref[:]
        mult = mult_ref[:]
        B = y_ref.shape[0]
        V = mult.shape[1]
        mjr = [mr]
        mji = [mi]
        for _ in range(SUB - 1):
            pr, pi = mjr[-1], mji[-1]
            mjr.append(pr * mr - pi * mi)
            mji.append(pr * mi + pi * mr)
        msr, msi = mjr[SUB - 1], mji[SUB - 1]
        mji3 = [m * 3.0 for m in mji]
        mjr3 = [m * 3.0 for m in mjr]

        J = jax.lax.broadcasted_iota(jnp.int32, (SUB, V), 0).astype(
            jnp.float32)
        shifts = []
        sh = 1
        while sh < SUB:
            shifts.append(sh)
            sh *= 2

        def rows_for(p, s):
            # [SUB, V] planes replaying the per-tick recurrence exactly
            # (up to cumprod association): wrap at s==0 resets p to 63/64
            # = the s=0 factor, so the post segment is a fresh cumprod.
            S = s + J
            s0z = s == 0.0
            wrapped = jnp.logical_or(S >= 65.0, s0z)
            shift = jnp.where(s0z, 0.0, 65.0)
            seff = jnp.where(wrapped, S - shift, S)
            a = (63.0 - seff) * (1.0 / 64.0)
            am = jnp.where(wrapped, a, 1.0)   # post-wrap segment factors
            ap = jnp.where(wrapped, 1.0, a)   # pre-wrap segment factors
            for sh in shifts:
                mask = J >= float(sh)
                am = jnp.where(mask, am * pltpu.roll(am, sh, 0), am)
                ap = jnp.where(mask, ap * pltpu.roll(ap, sh, 0), ap)
            r1 = p * jnp.where(wrapped, 0.0, ap)
            r2 = jnp.where(wrapped, 1.0 - am, 0.0)
            p_out = jnp.where(wrapped[SUB - 1:SUB], am[SUB - 1:SUB],
                              p * ap[SUB - 1:SUB])
            se_last = seff[SUB - 1:SUB]
            s_out = jnp.where(se_last < 64.0, se_last + 1.0, 0.0)
            return r1, r2, p_out, s_out, wrapped[SUB - 1:SUB]

        def subgroup(carry):
            zr, zi, tgt, D, p, s = carry
            tgtm = tgt * mult
            G1 = tgtm - tgt
            r1P, r2P, p, s, w_last = rows_for(p, s)
            rows = []
            for j in range(SUB):
                r1 = jax.lax.slice_in_dim(r1P, j, j + 1, axis=0)
                r2 = jax.lax.slice_in_dim(r2P, j, j + 1, axis=0)
                amp = r2 * G1 + (r1 * D + tgt)
                im = zr * mji3[j] + zi * mjr3[j]
                rows.append(jnp.sum(im * amp, axis=0, keepdims=True))
            zr, zi = zr * msr - zi * msi, zr * msi + zi * msr
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
        cur_o[:] = cur0  # cur not tracked in this ablation (matches kabl5)
        tgt_o[:] = tgt
        step_o[:] = s
    return kern


def build(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, V, B = 32, 256, 1024
    U = 128 if "u128" in variant else 64
    SUB = 64 if "s64" in variant else 32
    kern = make_kernel(U, SUB, variant)
    plane = jax.ShapeDtypeStruct((H, V), jnp.float32)

    def vspec(rows):
        return pl.BlockSpec((rows, V), lambda: (0, 0),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, 1), jnp.float32),
                   plane, plane, plane, plane,
                   jax.ShapeDtypeStruct((1, V), jnp.float32)),
        in_specs=[vspec(H)] * 7 + [vspec(1)],
        out_specs=(pl.BlockSpec((B, 1), lambda: (0, 0),
                                memory_space=pltpu.VMEM),)
        + (vspec(H),) * 4 + (vspec(1),),
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(carry, _):
            o_re, o_im, cur, tgt, step = carry
            y, o_re, o_im, cur, tgt, step = call(
                o_re, o_im, args["m_re"], args["m_im"], cur, tgt,
                args["mult"], step)
            return (o_re, o_im, cur, tgt, step), jnp.sum(y ** 2)
        carry = (args["o_re"], args["o_im"], args["cur"], args["tgt"],
                 args["step"])
        _, cks = jax.lax.scan(body, carry, None, length=n)
        return jnp.sum(cks)

    return call, run


def main():
    import jax
    import jax.numpy as jnp

    H, V, B = 32, 256, 1024
    rng = np.random.default_rng(0)
    th = rng.uniform(0.001, 0.2, (H, V))
    args = dict(
        o_re=jnp.asarray(rng.normal(size=(H, V)), jnp.float32),
        o_im=jnp.asarray(rng.normal(size=(H, V)), jnp.float32),
        m_re=jnp.asarray(np.cos(th), jnp.float32),
        m_im=jnp.asarray(np.sin(th), jnp.float32),
        cur=jnp.asarray(rng.uniform(0, 1, (H, V)), jnp.float32),
        tgt=jnp.asarray(rng.uniform(0, 1, (H, V)), jnp.float32),
        mult=jnp.asarray(rng.uniform(0.9, 1.0, (H, V)), jnp.float32),
        step=jnp.asarray(rng.integers(0, 65, (1, V)), jnp.float32),
    )

    variants = sys.argv[1:] or ["v3b", "v4", "v5", "v5s64"]
    calls = {}
    runs = {}
    for v in variants:
        t0 = time.time()
        call, run = build(v)
        # numerics: one block vs v3b
        y = call(args["o_re"], args["o_im"], args["m_re"], args["m_im"],
                 args["cur"], args["tgt"], args["mult"], args["step"])[0]
        calls[v] = np.asarray(y)
        runs[v] = run
        run(args, 8).block_until_ready()
        print(f"[compiled {v} in {time.time()-t0:.0f}s]", flush=True)
    ref = calls[variants[0]]
    scale = np.max(np.abs(ref))
    for v in variants[1:]:
        err = np.max(np.abs(calls[v] - ref))
        print(f"[numerics {v}: max abs err {err:.3e} (scale {scale:.3e})]")

    def span(run, n):
        t0 = time.perf_counter()
        run(args, n).block_until_ready()
        return time.perf_counter() - t0

    def us_per_block(run):
        diffs = sorted(span(run, 1024) - span(run, 128) for _ in range(5))
        return diffs[2] / (1024 - 128) * 1e6

    # interleave variants round-robin per window so chip/tunnel drift
    # hits every variant equally; report median + min over 7 windows
    res = {v: [] for v in variants}
    for rep in range(7):
        for v in variants:
            res[v].append(us_per_block(runs[v]))
    med = {v: sorted(xs)[len(xs) // 2] for v, xs in res.items()}
    base = med[variants[0]]
    for v in variants:
        print(f"{v:7s}: med {med[v]:6.2f}  min {min(res[v]):6.2f} us/block"
              f"  (dmed {med[v]-base:+.2f})  "
              f"all={[round(x,2) for x in sorted(res[v])]}")


if __name__ == "__main__":
    main()
