"""Pallas kernel: ADSR envelope, exact per-sample op order, voice-parallel.

The block-mode closed form (nodes/envelope.py) evaluates exponentials over
``[V, B]`` tensors — several transcendental sweeps per envelope per block,
which dominates envelope-heavy graphs (the FM synth runs four envelopes per
voice).  This kernel instead replays the reference's per-sample state
machine (envelope/adsr.rs process(): apply_parameters →
update_sustain_level → process_stage) on ``[1, V]`` rows with the stage
lengths and one-pole coefficients hoisted out of the loop (parameters are
block-constant on the event-free path this kernel serves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IDLE, ATTACK, DECAY, SUSTAIN, RELEASE = 0.0, 1.0, 2.0, 3.0, 4.0


def _kernel(B, U, st_ref, an_ref, dn_ref, rn_ref, ac_ref, dc_ref,
            sus_in_ref, y_ref, st_o):
    # B is the TRUE block length bound via partial — looping over the
    # padded y_ref.shape[0] would advance the carried state through the
    # zero-padded tail samples.  U = unroll factor (amortizes fori_loop
    # overhead).
    a_n = an_ref[:]
    d_n = dn_ref[:]
    r_n = rn_ref[:]
    a_c = ac_ref[:]
    d_c = dc_ref[:]

    def step(t, carry):
        stage, rem, level, target, sus, vel, rinc = carry
        # --- update_sustain_level (adsr.rs:92-115) ------------------
        sus = jnp.clip(sus_in_ref[pl.ds(t, 1), :] * vel, 0.0, 1.0)
        cap = jnp.where(stage == ATTACK, a_n,
                        jnp.where(stage == DECAY, d_n,
                                  jnp.where(stage == RELEASE, r_n, rem)))
        clamped = jnp.maximum(jnp.minimum(rem, cap), 1.0)
        timed = jnp.logical_and(stage >= ATTACK, stage != SUSTAIN)
        rem = jnp.where(jnp.logical_and(timed, rem > 0.0), clamped, rem)
        target = jnp.where(
            jnp.logical_or(stage == DECAY, stage == SUSTAIN), sus,
            jnp.where(stage == RELEASE, 0.0, target))
        cur = jnp.clip(level, 0.0, 1.0)
        rinc = jnp.where(
            stage == RELEASE,
            jnp.where(jnp.logical_or(rem == 0.0, cur <= 0.0), 0.0,
                      -cur / jnp.maximum(rem, 1.0)),
            rinc)
        # --- process_stage (adsr.rs:206-248) ------------------------
        act_a = jnp.logical_and(stage == ATTACK, rem > 0.0)
        act_d = jnp.logical_and(stage == DECAY, rem > 0.0)
        act_r = jnp.logical_and(stage == RELEASE, rem > 0.0)
        lvl_a = jnp.clip(level + (1.0 - level) * a_c, 0.0, 1.0)
        lvl_d = jnp.clip(level + (sus - level) * d_c, 0.0, 1.0)
        lvl_r = jnp.clip(level + rinc, 0.0, 1.0)
        level = jnp.where(act_a, lvl_a,
                 jnp.where(act_d, lvl_d,
                  jnp.where(act_r, lvl_r,
                   jnp.where(stage == SUSTAIN, sus,
                    jnp.where(stage == IDLE, 0.0, level)))))
        rem = jnp.where(jnp.logical_or(act_a,
                                       jnp.logical_or(act_d, act_r)),
                        rem - 1.0, rem)
        done_a = jnp.logical_and(stage == ATTACK, rem == 0.0)
        done_d = jnp.logical_and(stage == DECAY, rem == 0.0)
        done_r = jnp.logical_and(stage == RELEASE, rem == 0.0)
        level = jnp.where(done_a, 1.0,
                          jnp.where(done_d, sus,
                                    jnp.where(done_r, 0.0, level)))
        stage = jnp.where(done_a, DECAY,
                          jnp.where(done_d, SUSTAIN,
                                    jnp.where(done_r, IDLE, stage)))
        rem = jnp.where(done_a, d_n, rem)
        target = jnp.where(done_a, jnp.clip(sus, 0.0, 1.0), target)
        rinc = jnp.where(jnp.logical_or(done_a,
                                        jnp.logical_or(done_d, done_r)),
                         0.0, rinc)
        return (stage, rem, level, target, sus, vel, rinc), level

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, level = step(i * U + j, carry)
            rows.append(level)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    carry = tuple(st_ref[i:i + 1, :] for i in range(7))
    carry = jax.lax.fori_loop(0, B // U, body, carry)
    st_o[:] = jnp.concatenate(list(carry), axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adsr_scan(state7, a_n, d_n, r_n, a_c, d_c, sus_param,
              interpret: bool = False):
    """One event-free block of the ADSR for all voices.

    ``state7``: ``[7, V]`` rows (stage, rem, level, target, sustain_level,
    velocity, release_inc) as f32; stage lengths/coeffs are block-constant
    ``[V]`` rows (values at sample 0 — same assumption as the closed
    form); ``sus_param`` is the clamped sustain parameter per sample,
    ``[B, V]``.  Returns (levels ``[B, V]``, state7').
    """
    B, V = sus_param.shape
    padV = (-V) % 128
    padB = (-B) % 8

    def p(x):
        return jnp.pad(x, ((0, 0), (0, padV)))

    def row(v):
        return jnp.pad(jnp.reshape(v, (1, -1)), ((0, 0), (0, padV)))

    from .util import pick_unroll
    y, st = pl.pallas_call(
        functools.partial(_kernel, B, pick_unroll(B)),
        out_shape=(
            jax.ShapeDtypeStruct((B + padB, V + padV), jnp.float32),
            jax.ShapeDtypeStruct((7, V + padV), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(p(state7), row(a_n), row(d_n), row(r_n), row(a_c), row(d_c),
      jnp.pad(sus_param, ((0, padB), (0, padV))))
    return y[:B, :V], st[:, :V]
