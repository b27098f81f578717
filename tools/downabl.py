"""Microbenchmark the sinc down-cascade in isolation: where do the
~21 us/block of the saturator's boundary go?  State is threaded through
a lax.scan (nothing elided) and spans are timed with the RTT-cancelling
two-span methodology.

  cascade  : the real SincDownFir(4) process_block (two polyphase stages)
  stage1   : one _Halfband2xDown on [4B]
  deint    : even/odd deinterleave reshape + trivial combine
  slices13 : 13 shifted FMAs over [4B], no reshape/concat
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from oscen_tpu.ops import resample as rs

B = 1024
N = 4


def measure(step_fn, state):
    """step_fn(state) -> (state, scalar); returns us/iteration."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def span_fn(state, n):
        def body(c, _):
            c, s = step_fn(c)
            return c, s
        c, ys = jax.lax.scan(body, state, None, length=n)
        return jnp.sum(ys)

    n_small, n_large = 512, 8192
    for n in (n_small, n_large):
        float(span_fn(state, n))  # float() forces a real fetch; block_
        # until_ready is unreliable over the relay (claims ready early)

    def span(n):
        t0 = time.perf_counter()
        float(span_fn(state, n))
        return time.perf_counter() - t0

    raw = [(span(n_large), span(n_small)) for _ in range(5)]
    diffs = sorted(a - b for a, b in raw)
    return max(diffs[2], 1e-9) / (n_large - n_small) * 1e6


def main():
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N * B,)).astype(np.float32))

    down = rs.SincDownFir(N)

    def cascade(c):
        st, x = c
        st, y = down.process_block(st, x)
        # feed the (upsampled) output back so the chain is sequential
        x = jnp.tile(y, N) * 0.99
        return (st, x), jnp.sum(y)

    s1 = rs._Halfband2xDown()

    def stage1(c):
        st, x = c
        st, y = s1.process_block(st, x)
        x = jnp.tile(y, 2) * 0.99
        return (st, x), jnp.sum(y)

    def deint(c):
        (x,) = c
        p = x.reshape(-1, 2)
        y = p[:, 0] + 2.0 * p[:, 1]
        return (jnp.tile(y, 2) * 0.99,), jnp.sum(y)

    def slices13(c):
        (x,) = c
        z = jnp.concatenate([jnp.zeros((12,), jnp.float32), x])
        y = jnp.zeros((N * B,), jnp.float32)
        for j in range(13):
            y = y + (0.1 * j) * jax.lax.slice_in_dim(z, j, j + N * B)
        return (y * 0.2,), jnp.sum(y)

    for name, f, state in [
        ("cascade", cascade, (down.init_state(x0), x0)),
        ("stage1", stage1, (s1.init_state(x0), x0)),
        ("deint", deint, (x0,)),
        ("slices13", slices13, (x0,)),
    ]:
        us = measure(f, state)
        print(f"{name:9s}: {us:7.2f} us/iter")


if __name__ == "__main__":
    main()
