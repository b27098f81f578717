"""Pallas kernel: FM operator with self-feedback, voice-parallel.

The FM operator's self-feedback (``prev_output * feedback`` into the phase,
reference examples/fm-synth/src/nodes/fm_operator.rs:57-77) is a one-sample
nonlinear recurrence — not reformulable as a scan.  This kernel replays the
exact per-sample op order with voices in lanes; without it, block mode
falls back to a 512-step XLA while-loop per operator.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAU = 2.0 * math.pi


def _kernel(phase0_ref, prev0_ref, dt_ref, pm_ref, fb_ref, env_ref,
            lvl_ref, y_ref, phase_o, prev_o):
    B = dt_ref.shape[0]

    def body(t, carry):
        phase, prev = carry
        # exact reference op order (fm_operator.rs:57-77)
        fbm = prev * fb_ref[pl.ds(t, 1), :]
        total_pm = pm_ref[pl.ds(t, 1), :] + fbm
        y = jnp.sin((phase + total_pm) * TAU) \
            * env_ref[pl.ds(t, 1), :] * lvl_ref[pl.ds(t, 1), :]
        y_ref[pl.ds(t, 1), :] = y
        phase = phase + dt_ref[pl.ds(t, 1), :]
        phase = phase - jnp.trunc(phase)  # Rust .fract()
        return (phase, y)

    phase, prev = jax.lax.fori_loop(0, B, body,
                                    (phase0_ref[:], prev0_ref[:]))
    phase_o[:] = phase
    prev_o[:] = prev


@functools.partial(jax.jit, static_argnames=("interpret",))
def fm_operator_scan(phase0, prev0, dt, pm, fb, env, lvl,
                     interpret: bool = False):
    """One block of the FM operator for all voices.

    Args: phase0/prev0 ``[V]``; dt/pm/fb/env/lvl ``[B, V]`` per-sample.
    Returns (y ``[B, V]``, phase', prev') — bit-parity with the tick.
    """
    B, V = dt.shape
    padV = (-V) % 128
    padB = (-B) % 8

    def padBV(x):
        return jnp.pad(x, ((0, padB), (0, padV)))

    def row(v):
        return jnp.pad(jnp.reshape(v, (1, -1)), ((0, 0), (0, padV)))

    y, phase, prev = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B + padB, V + padV), jnp.float32),
            jax.ShapeDtypeStruct((1, V + padV), jnp.float32),
            jax.ShapeDtypeStruct((1, V + padV), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(row(phase0), row(prev0), padBV(dt), padBV(pm), padBV(fb),
      padBV(env), padBV(lvl))
    return y[:B, :V], phase[0, :V], prev[0, :V]
