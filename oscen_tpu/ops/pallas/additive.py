"""Fused Pallas kernel for the electric-piano additive voice.

Runs the reference voice algorithm (AmplitudeSource →
OscillatorBank, electric_piano_voice.rs) sample by sample *inside one
kernel*, all voices in VPU lanes and all 32 harmonics in sublanes: per
step, the per-harmonic envelope interpolation, the complex rotation, and
the harmonic reduction — with no [V, B, H] intermediates ever touching
HBM, and the exact per-sample op order of the reference.

Steady-state only (no gate events, constant frequency within the block) —
the compiler falls back to the segmented closed forms for event blocks.

Layout: state planes ``[H, V]`` (harmonics in sublanes, voices in lanes);
the per-voice interpolation step counter is a ``[1, V]`` row broadcast
over sublanes.  Output ``[B, V]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .util import pick_unroll

INTERP = 64.0


_UNROLL = 8  # minimum block-length granularity for the fused kernel


def _kernel(U, or_ref, oi_ref, mr_ref, mi_ref, cur_ref, tgt_ref, mult_ref,
            step_ref, y_ref, or_o, oi_o, cur_o, tgt_o, step_o):
    # U = unroll factor (bound via partial; adaptive up to 64)
    mr = mr_ref[:]
    mi = mi_ref[:]
    mult = mult_ref[:]
    B = y_ref.shape[0]

    def sample(carry):
        """One exact reference sample (electric_piano_voice.rs:308-338
        envelope, :158-170 rotation); returns (carry', y_row)."""
        osc_r, osc_i, cur, tgt, s = carry
        tgt = jnp.where(s == 0.0, cur * mult, tgt)
        interp = s < INTERP
        tau = (s + 1.0) / INTERP
        cur = jnp.where(interp, cur * (1.0 - tau) + tgt * tau, tgt)
        s = jnp.where(interp, s + 1.0, 0.0)
        nr = osc_r * mr - osc_i * mi
        ni = osc_r * mi + osc_i * mr
        y = jnp.sum(ni * cur, axis=0, keepdims=True) * 3.0
        return (nr, ni, cur, tgt, s), y

    def body(i, carry):
        rows = []
        for _ in range(U):
            carry, y = sample(carry)
            rows.append(y)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    osc_r, osc_i, cur, tgt, s = jax.lax.fori_loop(
        0, B // U, body,
        (or_ref[:], oi_ref[:], cur_ref[:], tgt_ref[:], step_ref[:]))
    or_o[:] = osc_r
    oi_o[:] = osc_i
    cur_o[:] = cur
    tgt_o[:] = tgt
    step_o[:] = s


@functools.partial(jax.jit, static_argnames=("block_len", "interpret"))
def additive_voice_block(osc_re, osc_im, mul_re, mul_im, cur, tgt, mult,
                         step, block_len: int, interpret: bool = False):
    """One steady-state block of the fused additive voice.

    Args (all ``[H, V]`` except ``step`` ``[V]``): oscillator complex
    state + rotation multipliers, envelope current/target/multiplier
    planes, per-voice interpolation step counter.
    Returns (y ``[B, V]``, new osc_re, osc_im, cur, tgt, step).
    """
    if block_len % _UNROLL:
        raise ValueError(
            f"block_len must be a multiple of {_UNROLL} for the fused "
            f"kernel (got {block_len})")
    H, V = osc_re.shape
    padV = (-V) % 128
    padH = (-H) % 8

    def pad(x):
        return jnp.pad(x, ((0, padH), (0, padV)))

    step_row = jnp.pad(jnp.reshape(step.astype(jnp.float32), (1, -1)),
                       ((0, 0), (0, padV)))
    Hp, Vp = H + padH, V + padV

    # grid over voice tiles: keeps VMEM bounded for large voice counts
    # (each tile's state/output is independent — voices don't interact)
    TILE = 256
    n_tiles = max(Vp // TILE, 1)
    tile = Vp // n_tiles  # Vp is a multiple of 128; tiles stay aligned
    while tile % 128:
        n_tiles -= 1
        tile = Vp // n_tiles

    def vspec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    plane = jax.ShapeDtypeStruct((Hp, Vp), jnp.float32)
    y, or_o, oi_o, cur_o, tgt_o, step_o = pl.pallas_call(
        functools.partial(_kernel, pick_unroll(block_len)),
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((block_len, Vp), jnp.float32),
            plane, plane, plane, plane,
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ),
        in_specs=[vspec(Hp)] * 7 + [vspec(1)],
        out_specs=(vspec(block_len),) + (vspec(Hp),) * 4 + (vspec(1),),
        interpret=interpret,
    )(pad(osc_re), pad(osc_im), pad(mul_re), pad(mul_im), pad(cur),
      pad(tgt), pad(mult), step_row)
    return (y[:, :V], or_o[:H, :V], oi_o[:H, :V], cur_o[:H, :V],
            tgt_o[:H, :V], step_o[0, :V])
