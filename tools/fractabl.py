"""Ablation round 5j: fract_phase3 cost inside the fm/pivot fast path.

With zero feedback (the reference default) the chain fast path
vectorizes everything except ``fract_phase3`` — B sequential steps of
``p += dt; p -= trunc(p)`` on a [3, V] plane.  At V=256 that plane is
TWO (8,128) vreg tiles with 3/8 sublanes used, so every step issues ~2x
the instructions its data needs.  Candidate: pack the two 128-lane voice
groups into SUBLANES — [6, 128] = one vreg tile — and unpack outside the
kernel (one relayout per block, not per sample).

A/B in one process:
  cur    : fract_phase3 as shipped ([3, 256] plane)
  packed : [6, 128] plane kernel, outputs stored packed [B, 6-row tiles]
           and unpacked after the launch
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, V, SR = 1024, 256, 48_000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from oscen_tpu.ops.pallas.fm import fract_phase3
    from oscen_tpu.ops.pallas.util import pick_unroll

    key = jax.random.PRNGKey(0)
    phases = jax.random.uniform(key, (3, V), jnp.float32)
    dt = jnp.full((3, V), 440.0 / SR, jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def run_cur(n):
        def step(p, _):
            o3, o2, o1, c = fract_phase3(p, dt, B)
            return c, jnp.sum(o3[-1] + o2[-1] + o1[-1])
        c, s = jax.lax.scan(step, phases, None, length=n)
        return jnp.sum(s)

    # packed variant: [6, 128] plane, one vreg tile
    U = pick_unroll(B)

    def _packed_kernel(o_ref, p_ref, d_ref, c_ref):
        dtc = d_ref[:]

        def body(i, p):
            rows = []
            for _ in range(U):
                rows.append(p)
                np_ = p + dtc
                p = np_ - jnp.trunc(np_)
            o_ref[pl.ds(i * U * 6, U * 6), :] = jnp.concatenate(rows, 0)
            return p

        c_ref[:] = jax.lax.fori_loop(0, B // U, body, p_ref[:])

    def fract_packed(p, d):
        pp = p.reshape(3, 2, 128).reshape(6, 128)
        dd = d.reshape(3, 2, 128).reshape(6, 128)
        o, c = pl.pallas_call(
            lambda p_ref, d_ref, o_ref, c_ref: _packed_kernel(
                o_ref, p_ref, d_ref, c_ref),
            out_shape=(jax.ShapeDtypeStruct((B * 6, 128), jnp.float32),
                       jax.ShapeDtypeStruct((6, 128), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        )(pp, dd)
        o = o.reshape(B, 3, 2, 128).reshape(B, 3, 256)
        return o[:, 0], o[:, 1], o[:, 2], c.reshape(3, 2, 128).reshape(3, 256)

    @functools.partial(jax.jit, static_argnums=0)
    def run_packed(n):
        def step(p, _):
            o3, o2, o1, c = fract_packed(p, dt)
            return c, jnp.sum(o3[-1] + o2[-1] + o1[-1])
        c, s = jax.lax.scan(step, phases, None, length=n)
        return jnp.sum(s)

    # parity first
    a = fract_phase3(phases, dt, B)
    b = fract_packed(phases, dt)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print("[fractabl] parity OK (bit-exact)")

    N = 2000
    for f in (run_cur, run_packed):
        f(4).block_until_ready()
    res = {"cur": [], "packed": []}
    for w in range(6):
        for name, f in (("cur", run_cur), ("packed", run_packed)):
            t0 = time.perf_counter()
            f(N).block_until_ready()
            res[name].append((time.perf_counter() - t0) / N * 1e6)
        print(f"[fractabl] w{w}: cur {res['cur'][-1]:6.2f}  "
              f"packed {res['packed'][-1]:6.2f} us/block")
    for name in res:
        print(f"{name:7s}: best {min(res[name]):6.2f}  "
              f"med {sorted(res[name])[len(res[name])//2]:6.2f} us/block")


if __name__ == "__main__":
    main()
