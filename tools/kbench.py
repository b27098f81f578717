"""Micro-benchmark: the fused additive voice kernel, standalone on chip.

Times N sequential kernel invocations (state threaded through a lax.scan,
so nothing can be elided) and reports µs/block with the same
RTT-cancelling two-span methodology bench.py uses.

Usage: python tools/kbench.py [--voices=256] [--block=1024] [--mix=1]
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

    V, B, mix = 256, 1024, True
    for a in sys.argv[1:]:
        if a.startswith("--voices="):
            V = int(a.split("=")[1])
        if a.startswith("--block="):
            B = int(a.split("=")[1])
        if a.startswith("--mix="):
            mix = bool(int(a.split("=")[1]))

    from oscen_tpu.ops.pallas.additive import additive_voice_block

    H = 32
    rng = np.random.default_rng(0)
    theta = (2 * np.pi * (55.0 * (1 + rng.integers(0, 48, V))[None, :]
                          * np.arange(1, H + 1)[:, None]) / 48000.0)
    mr = jnp.asarray(np.cos(theta), jnp.float32)
    mi = jnp.asarray(np.sin(theta), jnp.float32)
    ore = jnp.ones((H, V), jnp.float32)
    oim = jnp.zeros((H, V), jnp.float32)
    cur = jnp.asarray(rng.uniform(0.01, 0.3, (H, V)), jnp.float32)
    tgt = cur * 0.999
    mult = jnp.full((H, V), 0.999, jnp.float32)
    step = jnp.asarray(rng.integers(0, 64, (V,)), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def span_fn(state, n):
        def body(c, _):
            ore, oim, cur, tgt, step = c
            y, ore, oim, cur, tgt, step = additive_voice_block(
                ore, oim, mr, mi, cur, tgt, mult, step, B, with_mix=mix)
            return (ore, oim, cur, tgt, step), jnp.sum(y * y)
        c, ys = jax.lax.scan(body, state, None, length=n)
        return jnp.sum(ys)

    state = (ore, oim, cur, tgt, step)
    n_small, n_large = 64, 512
    for n in (n_small, n_large):
        t0 = time.perf_counter()
        float(span_fn(state, n))
        print(f"compile+run n={n}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    def span(n):
        t0 = time.perf_counter()
        float(span_fn(state, n))
        return time.perf_counter() - t0

    def window():
        diffs = sorted(span(n_large) - span(n_small) for _ in range(5))
        return max(diffs[2], 1e-9)

    ws = sorted(window() for _ in range(3))
    for name, dt in (("best", ws[0]), ("median", ws[1])):
        us = dt / (n_large - n_small) * 1e6
        rtf = (B / 48000.0) / (us * 1e-6)
        print(f"{name}: {us:.2f} us/block  ({rtf:.0f}x RT)  "
              f"V={V} B={B} mix={mix}")


if __name__ == "__main__":
    main()
