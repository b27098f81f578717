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

from .util import pick_unroll
from ..fastmath import sin_turns

TAU = 2.0 * math.pi


def _kernel(B, U, phase0_ref, prev0_ref, dt_ref, pm_ref, fb_ref, env_ref,
            lvl_ref, y_ref, phase_o, prev_o):
    # B = true block length (bound via partial): looping the padded
    # shape would zero the prev_output carry on the padded tail.
    # U = unroll factor.

    def sample(t, carry):
        phase, prev = carry
        # exact reference op order (fm_operator.rs:57-77)
        fbm = prev * fb_ref[pl.ds(t, 1), :]
        total_pm = pm_ref[pl.ds(t, 1), :] + fbm
        y = sin_turns(phase + total_pm) \
            * env_ref[pl.ds(t, 1), :] * lvl_ref[pl.ds(t, 1), :]
        phase = phase + dt_ref[pl.ds(t, 1), :]
        return (phase - jnp.trunc(phase), y), y  # Rust .fract()

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, y = sample(i * U + j, carry)
            rows.append(y)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    phase, prev = jax.lax.fori_loop(0, B // U, body,
                                    (phase0_ref[:], prev0_ref[:]))
    phase_o[:] = phase
    prev_o[:] = prev


def _chain3_kernel(B, U, ph_ref, prev_ref, dt_ref, lvl_ref, fb_ref,
                   mix_ref, env3_ref, env2_ref, env1_ref, y_ref,
                   ph_o, prev_o):
    """The FMVoice operator chain (fm_voice.rs connections): per sample,
    op3 → route crossfade → op2 → mixer → op1, each an FM operator with
    self-feedback.  State rows are stacked [3, V] (op3, op2, op1).
    B = true block length (bound via partial; padded tail must not run);
    U = unroll factor (amortizes fori_loop overhead, like the additive
    kernel).  dt is PER-SAMPLE ``[3, B, V]`` — the voice allocator
    changes the pitch mid-block at note-on, and this node sees no gate
    event to force the fallback path."""
    lvl = lvl_ref[:]    # [3, V]
    fb = fb_ref[:]      # [3, V]
    mix = mix_ref[:]    # [1, V] (route, pre-clamped)

    def op(t, ph, prev, pm, env, i):
        y = sin_turns(ph + pm + prev * fb[i:i + 1, :]) \
            * env * lvl[i:i + 1, :]
        ph = ph + dt_ref[i, pl.ds(t, 1), :]
        return ph - jnp.trunc(ph), y

    def sample(t, carry):
        ph3, ph2, ph1, p3, p2, p1 = carry
        ph3, y3 = op(t, ph3, p3, 0.0, env3_ref[pl.ds(t, 1), :], 0)
        a = y3 * (1.0 - mix)   # crossfade output_a -> op2.phase_mod
        b = y3 * mix           # crossfade output_b -> op1 mixer
        ph2, y2 = op(t, ph2, p2, a, env2_ref[pl.ds(t, 1), :], 1)
        ph1, y1 = op(t, ph1, p1, y2 + b, env1_ref[pl.ds(t, 1), :], 2)
        return (ph3, ph2, ph1, y3, y2, y1), y1

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, y1 = sample(i * U + j, carry)
            rows.append(y1)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    ph3, ph2, ph1, p3, p2, p1 = jax.lax.fori_loop(
        0, B // U, body,
        (ph_ref[0:1, :], ph_ref[1:2, :], ph_ref[2:3, :],
         prev_ref[0:1, :], prev_ref[1:2, :], prev_ref[2:3, :]))
    ph_o[:] = jnp.concatenate([ph3, ph2, ph1], axis=0)
    prev_o[:] = jnp.concatenate([p3, p2, p1], axis=0)


def _chain3_pipe_kernel(B, U, ph_ref, prev_ref, dt3_ref, dt2_ref, dt1_ref,
                        lvl_ref, fb_ref, mix_ref, env3_ref, env2_ref,
                        env1_ref, y_ref, ph_o, prev_o, d2_o):
    """Software-pipelined variant: iteration i computes op3 sample i,
    op2 sample i-1, op1 sample i-2 — so the three sins (and the FM
    arithmetic) run as ONE stacked [3, V] vector op per iteration instead
    of three dependent [1, V] ops.  The per-sample math and op order are
    unchanged (same f32 results as ``tick``); only the schedule shifts.

    Row r is "active" for r <= i < B + r; inactive rows neither advance
    their phase nor update the prev/feedback carry, so the prologue
    computes garbage that never escapes and the epilogue drains op2/op1.
    env/dt streams are pre-shifted by the wrapper so row r's stream is
    read at index i (= its sample i - r); six [1, V] reads + two concats
    per iteration measured FASTER than one interleaved aligned [24, V]
    chunk read per unrolled body (105 vs 148 µs/block at B=1024, V=256).
    y_ref rows 0..1 are garbage (sliced off).
    """
    lvl = lvl_ref[:]    # [3, V]
    fb = fb_ref[:]      # [3, V]
    mix = mix_ref[:]    # [1, V]
    zero = jnp.zeros_like(mix)
    one = jnp.ones_like(mix)
    rowid = jax.lax.broadcasted_iota(jnp.int32, lvl.shape, 0)
    # pm = rotate(prev) * w1 + y3_d2 * w2:
    #   rows (0, y3[i-1]*(1-mix), y2[i-2]*1) + (0, 0, y3[i-2]*mix)
    w1 = jnp.concatenate([zero, 1.0 - mix, one], axis=0)
    w2 = jnp.concatenate([zero, zero, mix], axis=0)

    def sample(i, carry):
        ph, prev, y3_d2 = carry
        env = jnp.concatenate([env3_ref[pl.ds(i, 1), :],
                               env2_ref[pl.ds(i, 1), :],
                               env1_ref[pl.ds(i, 1), :]], axis=0)
        dt = jnp.concatenate([dt3_ref[pl.ds(i, 1), :],
                              dt2_ref[pl.ds(i, 1), :],
                              dt1_ref[pl.ds(i, 1), :]], axis=0)
        rot = jnp.concatenate([prev[2:3, :], prev[0:2, :]], axis=0)
        pm = rot * w1 + y3_d2 * w2
        y = sin_turns(ph + pm + prev * fb) * env * lvl
        active = jnp.logical_and(i >= rowid, i < B + rowid)
        nph = ph + dt
        ph = jnp.where(active, nph - jnp.trunc(nph), ph)
        carry = (ph, jnp.where(active, y, prev), prev[0:1, :])
        return carry, y[2:3, :]

    def body(k, carry):
        rows = []
        for j in range(U):
            carry, y1 = sample(k * U + j, carry)
            rows.append(y1)
        y_ref[pl.ds(k * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    NI = y_ref.shape[0]  # B + 2 rounded up to U (wrapper guarantees)
    ph, prev, y3_d2 = jax.lax.fori_loop(
        0, NI // U, body, (ph_ref[:], prev_ref[:], prev_ref[0:1, :]))
    ph_o[:] = ph
    prev_o[:] = prev
    d2_o[:] = y3_d2


@functools.partial(jax.jit, static_argnames=("interpret",))
def fm_chain3_scan(phases, prevs, dt, lvl, fb, mix, env3, env2, env1,
                   interpret: bool = False):
    """One block of the fused 3-operator FM voice chain, all voices.

    Args: phases/prevs ``[3, V]`` (op3, op2, op1 order); dt ``[3, B, V]``
    per-sample phase increments (pitch changes mid-block at note-on);
    lvl/fb ``[3, V]`` block-constant per-op params; mix ``[V]`` (route,
    clamped); env* ``[B, V]`` envelope streams.
    Returns (y ``[B, V]``, phases', prevs').
    """
    B, V = env3.shape
    padV = (-V) % 128
    # U need not divide B (activity guards mask the rounded-up tail);
    # 64 is the measured VPU sweet spot for unrolled sample loops
    U = 64 if B + 2 >= 64 else 8
    NI = -(-(B + 2) // U) * U  # pipeline prologue(2) + round up to U

    def shifted(x, lag):
        # row r's stream read at iteration i = its sample i - lag
        return jnp.pad(x, ((lag, NI - B - lag), (0, padV)))

    def p3(x):
        return jnp.pad(x, ((0, 0), (0, padV)))

    mix_row = jnp.pad(jnp.reshape(mix, (1, -1)), ((0, 0), (0, padV)))
    y, ph, pv, _ = pl.pallas_call(
        functools.partial(_chain3_pipe_kernel, B, U),
        out_shape=(
            jax.ShapeDtypeStruct((NI, V + padV), jnp.float32),
            jax.ShapeDtypeStruct((3, V + padV), jnp.float32),
            jax.ShapeDtypeStruct((3, V + padV), jnp.float32),
            jax.ShapeDtypeStruct((1, V + padV), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 4,
        interpret=interpret,
    )(p3(phases), p3(prevs),
      shifted(dt[0], 0), shifted(dt[1], 1), shifted(dt[2], 2),
      p3(lvl), p3(fb), mix_row,
      shifted(env3, 0), shifted(env2, 1), shifted(env1, 2))
    return y[2:B + 2, :V], ph[:, :V], pv[:, :V]


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
        functools.partial(_kernel, B, pick_unroll(B)),
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
