"""Pallas kernel: exact sequential phase accumulation, voice-parallel.

The reference wraps oscillator phase every sample
(``phase.rem_euclid(1.0)``, oscillators/mod.rs:171-232); a prefix-sum
reformulation reassociates the f32 adds and drifts ~1e-3 RMS per second of
render against the per-sample order.  This kernel replays the exact
per-sample wrap (3 ops/step on a ``[1, V]`` row — a few µs per block), and
the waveform synthesis then runs time-parallel on the exact phases, making
block-mode oscillators bit-compatible with the per-sample path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .util import pick_unroll


def _kernel(B, U, phase0_ref, dt_ref, out_ref, carry_ref):
    # B = true block length (bound via partial), not the padded shape;
    # U = unroll factor (amortizes fori_loop overhead)

    def body(i, p):
        rows = []
        for j in range(U):
            rows.append(p)
            p = p + dt_ref[pl.ds(i * U + j, 1), :]
            p = p - jnp.floor(p)  # rem_euclid(1.0)
        out_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return p

    carry_ref[:] = jax.lax.fori_loop(0, B // U, body, phase0_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def phase_scan(phase0, dt, interpret: bool = False):
    """Sequential wrapped phase accumulation.

    Args: phase0 ``[V]`` carry; dt ``[B, V]`` per-sample increments.
    Returns (before ``[B, V]`` — the phase *before* each increment, the
    value the reference synthesizes with — and the final carry ``[V]``).
    """
    B, V = dt.shape
    padV = (-V) % 128
    padB = (-B) % 8
    dt_p = jnp.pad(dt, ((0, padB), (0, padV)))
    p0 = jnp.pad(jnp.reshape(phase0, (1, -1)), ((0, 0), (0, padV)))
    out, carry = pl.pallas_call(
        functools.partial(_kernel, B, pick_unroll(B)),
        out_shape=(
            jax.ShapeDtypeStruct(dt_p.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, dt_p.shape[1]), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(p0, dt_p)
    return out[:B, :V], carry[0, :V]
