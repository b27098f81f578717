"""Ablation round 5k: fract_phase3 variants, measured END TO END through
the zero-feedback fm fast-path math (sin/route/env consumers included,
so consumer-side layout costs count).

  cur  : shipped fract_phase3 ([3,V] plane, per-op U-row concat + store)
  direct: per-step store of the whole [3,V] plane into ONE [B,3,Vp]
          output (no concats); consumers read strided views o[:,k,:]
  seg  : segment-parallel replay — phase A sweeps the recurrence on the
         [3,V] plane storing nothing but S boundary states; phase B
         replays all S segments in parallel on an op-major [3*S, V]
         plane (op k's S segment rows = aligned vreg rows k*S..k*S+S),
         storing j-major permuted planes; consumers un-permute via a
         (free-to-fuse) gather view.  Bit-exact: identical iterated
         fract ops.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, V, SR = 1024, 256, 48_000.0
S = 8           # segments for 'seg'
SEG = B // S


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from oscen_tpu.ops.pallas.fm import fract_phase3
    from oscen_tpu.ops.pallas.util import pick_unroll
    from oscen_tpu.ops.fastmath import sin_turns

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    phases = jax.random.uniform(k1, (3, V), jnp.float32)
    dt = jnp.broadcast_to(
        jax.random.uniform(k2, (3, 1), jnp.float32) * 0.02, (3, V))
    e3 = jax.random.uniform(k3, (B, V), jnp.float32)
    e2 = jnp.roll(e3, 1, 0)
    e1 = jnp.roll(e3, 2, 0)
    mix = jax.random.uniform(k4, (V,), jnp.float32)

    def consume(ph3, ph2, ph1):
        mixr = mix[None, :]
        y3 = sin_turns(ph3) * e3
        a = y3 * (1.0 - mixr)
        b = y3 * mixr
        y2 = sin_turns(ph2 + a) * e2
        y1 = sin_turns(ph1 + (y2 + b)) * e1
        return y1

    # ---- cur ----
    @functools.partial(jax.jit, static_argnums=0)
    def run_cur(n):
        def step(p, _):
            o3, o2, o1, c = fract_phase3(p, dt, B)
            return c, jnp.sum(consume(o3, o2, o1))
        c, s = jax.lax.scan(step, phases, None, length=n)
        return jnp.sum(s)

    # ---- direct ----
    U = pick_unroll(B)

    def _direct_kernel(p_ref, d_ref, o_ref, c_ref):
        dtc = d_ref[:]

        def body(t, p):
            o_ref[t] = p
            np_ = p + dtc
            return np_ - jnp.trunc(np_)

        c_ref[:] = jax.lax.fori_loop(0, B, body, p_ref[:])

    def fract_direct(p, d):
        pp = jnp.pad(p, ((0, 0), (0, 0)))
        o, c = pl.pallas_call(
            _direct_kernel,
            out_shape=(jax.ShapeDtypeStruct((B, 3, V), jnp.float32),
                       jax.ShapeDtypeStruct((3, V), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        )(pp, d)
        return o[:, 0], o[:, 1], o[:, 2], c

    @functools.partial(jax.jit, static_argnums=0)
    def run_direct(n):
        def step(p, _):
            o3, o2, o1, c = fract_direct(p, dt)
            return c, jnp.sum(consume(o3, o2, o1))
        c, s = jax.lax.scan(step, phases, None, length=n)
        return jnp.sum(s)

    # ---- seg ----
    def _seg_kernel(p_ref, d_ref, o_ref, c_ref):
        # p_ref/d_ref [3, V]; o_ref [SEG, 3*S, V] (j-major permuted);
        # c_ref [3, V]
        dtc = d_ref[:]

        def stepf(p):
            np_ = p + dtc
            return np_ - jnp.trunc(np_)

        # phase A: boundary sweep, no stores
        bounds = [p_ref[:]]
        p = p_ref[:]
        for s in range(S - 1):
            p = jax.lax.fori_loop(0, SEG, lambda i, q: stepf(q), p)
            bounds.append(p)
        # op-major plane: row k*S + s = op k, segment s
        P = jnp.concatenate(
            [jnp.concatenate([b[k:k + 1] for b in bounds], 0)
             for k in range(3)], 0)                      # [3*S, V]
        dtP = jnp.concatenate([jnp.broadcast_to(dtc[k:k + 1], (S, V))
                               for k in range(3)], 0)

        def stepP(P):
            np_ = P + dtP
            return np_ - jnp.trunc(np_)

        def body(j, P):
            o_ref[j] = P
            return stepP(P)

        P = jax.lax.fori_loop(0, SEG, body, P)
        # carry = final state of the LAST segment per op
        c_ref[:] = jnp.concatenate(
            [P[k * S + S - 1: k * S + S] for k in range(3)], 0)

    def fract_seg(p, d):
        o, c = pl.pallas_call(
            _seg_kernel,
            out_shape=(jax.ShapeDtypeStruct((SEG, 3 * S, V), jnp.float32),
                       jax.ShapeDtypeStruct((3, V), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        )(p, d)
        # o[j, k*S+s, :] = op k, time s*SEG + j -> [B, V] per op via
        # transpose views (XLA fuses into the elementwise consumers)
        def plane(k):
            return o[:, k * S:(k + 1) * S, :].transpose(1, 0, 2) \
                    .reshape(B, V)
        return plane(0), plane(1), plane(2), c

    @functools.partial(jax.jit, static_argnums=0)
    def run_seg(n):
        def step(p, _):
            o3, o2, o1, c = fract_seg(p, dt)
            return c, jnp.sum(consume(o3, o2, o1))
        c, s = jax.lax.scan(step, phases, None, length=n)
        return jnp.sum(s)

    # parity
    a = fract_phase3(phases, dt, B)
    for name, f in (("direct", fract_direct), ("seg", fract_seg)):
        b = f(phases, dt)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        print(f"[fractabl2] parity OK: {name} (bit-exact)")

    N = 2000
    runs = {"cur": run_cur, "direct": run_direct, "seg": run_seg}
    for f in runs.values():
        f(4).block_until_ready()
    res = {k: [] for k in runs}
    for w in range(6):
        line = []
        for name, f in runs.items():
            t0 = time.perf_counter()
            f(N).block_until_ready()
            res[name].append((time.perf_counter() - t0) / N * 1e6)
            line.append(f"{name} {res[name][-1]:6.2f}")
        print("[fractabl2] w%d: %s us/block" % (w, "  ".join(line)))
    for name in res:
        print(f"{name:7s}: best {min(res[name]):6.2f}  "
              f"med {sorted(res[name])[len(res[name])//2]:6.2f} us/block")


if __name__ == "__main__":
    main()
