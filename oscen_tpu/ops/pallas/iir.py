"""Pallas TPU kernels: sequential-in-time, parallel-in-voice recurrences.

The associative-scan formulations (ops/scan.py) parallelize the time axis
at the cost of f32 reassociation.  These kernels instead keep the
reference's exact per-sample op order (bit-parity with ``tick``) and
parallelize across the *voice* axis in VPU lanes — the layout SURVEY §7
flags as the likely winner for voice counts ≫ 1: the filter state lives in
registers, the block streams through VMEM, and each time step is a handful
of elementwise ops on a ``[1, V]`` vector.

Layout: time-major ``[B, V]`` with voices in the lane (last) dimension.
``V`` must be a multiple of 128 and ``B`` a multiple of 8 (TPU tiling);
wrappers pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .util import pick_unroll

__all__ = ["tpt_svf_scan", "biquad_scan", "allpass_cascade_scan",
           "lp18_scan"]


def _pad_to(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


# --------------------------------------------------------------------- #
def _tpt_kernel(B, U, x_ref, h_ref, g_ref, k_ref, z0_ref, z1_ref,
                y_ref, z0o_ref, z1o_ref):
    # B = true block length (bound via partial): looping the padded
    # shape would advance the integrator states on phantom zero input.
    # U = unroll factor (amortizes fori_loop overhead).
    const_coef = h_ref.shape[0] == 1

    def sample(t, carry):
        z0, z1 = carry
        x = x_ref[pl.ds(t, 1), :]
        if const_coef:
            h = h_ref[:]
            g = g_ref[:]
            k = k_ref[:]
        else:
            h = h_ref[pl.ds(t, 1), :]
            g = g_ref[pl.ds(t, 1), :]
            k = k_ref[pl.ds(t, 1), :]
        # exact reference op order (filters/tpt/mod.rs:108-123)
        high = (x - z0 * k - z1) * h
        band = high * g + z0
        low = band * g + z1
        return (high * g + band, band * g + low), low

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, low = sample(i * U + j, carry)
            rows.append(low)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    z0, z1 = jax.lax.fori_loop(0, B // U, body, (z0_ref[:], z1_ref[:]))
    z0o_ref[:] = z0
    z1o_ref[:] = z1


@functools.partial(jax.jit, static_argnames=("interpret",))
def tpt_svf_scan(x, h, g, k, z0, z1, interpret: bool = False):
    """Zavalishin TPT SVF lowpass over a block, voice-parallel.

    Args: x ``[B, V]`` time-major; h/g/k ``[V]`` block-constant or
    ``[B, V]`` per-sample coefficients; z0/z1 ``[V]`` integrator states.
    Returns (y ``[B, V]``, z0', z1') — bit-parity with the per-sample tick.
    """
    xp, B = _pad_to(x, 8, 0)
    xp, V = _pad_to(xp, 128, 1)

    def coef(v):
        v = jnp.asarray(v)
        if v.ndim == 2:  # per-sample [B, V]
            c, _ = _pad_to(v, 8, 0)
            c, _ = _pad_to(c, 128, 1)
            return c
        r, _ = _pad_to(jnp.reshape(v, (1, -1)), 128, 1)
        return r

    def row(v):
        r, _ = _pad_to(jnp.reshape(v, (1, -1)), 128, 1)
        return r

    y, z0o, z1o = pl.pallas_call(
        functools.partial(_tpt_kernel, B, pick_unroll(B)),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(xp, coef(h), coef(g), coef(k), row(z0), row(z1))
    return y[:B, :V], z0o[0, :V], z1o[0, :V]


# --------------------------------------------------------------------- #
def _lp18_kernel(B, U, x_ref, g_ref, h_ref, z_ref, y_ref, zo_ref):
    # 3-pole Hordijk-style lowpass with a tanh-saturated first pole —
    # a NONLINEAR recurrence (no associative-scan form exists), so the
    # sequential-exact voice-parallel kernel is the only fast form.
    # Exact reference op order (nih-twin-peaks/src/lp18_filter.rs; the
    # tick in nodes/filters.py::LP18Filter).
    const_coef = g_ref.shape[0] == 1

    def sample(t, carry):
        z0, z1, z2 = carry
        x = x_ref[pl.ds(t, 1), :]
        if const_coef:
            g = g_ref[:]
            h = h_ref[:]
        else:
            g = g_ref[pl.ds(t, 1), :]
            h = h_ref[pl.ds(t, 1), :]
        hp = (x - h * z0 - z1 - z2) / (1.0 + g)
        bp1 = g * hp + z0
        z0 = jnp.tanh(bp1)
        bp2 = g * bp1 + z1
        z1 = bp2
        lp = g * bp2 + z2
        z2 = lp
        return (z0, z1, z2), lp

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, lp = sample(i * U + j, carry)
            rows.append(lp)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    zo_ref[:] = z_ref[:]  # initialize padded rows (only 0-2 are real)
    z0, z1, z2 = jax.lax.fori_loop(
        0, B // U, body,
        (z_ref[pl.ds(0, 1), :], z_ref[pl.ds(1, 1), :],
         z_ref[pl.ds(2, 1), :]))
    zo_ref[pl.ds(0, 1), :] = z0
    zo_ref[pl.ds(1, 1), :] = z1
    zo_ref[pl.ds(2, 1), :] = z2


@functools.partial(jax.jit, static_argnames=("interpret",))
def lp18_scan(x, g, h, z, interpret: bool = False):
    """LP18 (3-pole, tanh first pole) over a block, voice-parallel.

    Args: x ``[B, V]`` time-major; g/h ``[V]`` block-constant or
    ``[B, V]`` per-sample; z ``[3, V]`` pole states.  Returns
    (y ``[B, V]``, z' ``[3, V]``) — bit-parity with the per-sample tick.
    """
    xp, B = _pad_to(x, 8, 0)
    xp, V = _pad_to(xp, 128, 1)

    def coef(v):
        v = jnp.asarray(v)
        if v.ndim == 2:
            c, _ = _pad_to(v, 8, 0)
            c, _ = _pad_to(c, 128, 1)
            return c
        r, _ = _pad_to(jnp.reshape(v, (1, -1)), 128, 1)
        return r

    zp, _ = _pad_to(jnp.asarray(z, jnp.float32), 128, 1)
    zp, _ = _pad_to(zp, 8, 0)  # (3, V) -> (8, Vp) rows for tiling

    y, zo = pl.pallas_call(
        functools.partial(_lp18_kernel, B, pick_unroll(B)),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            jax.ShapeDtypeStruct(zp.shape, jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        interpret=interpret,
    )(xp, coef(g), coef(h), zp)
    return y[:B, :V], zo[:3, :V]


# --------------------------------------------------------------------- #
def _biquad_kernel(B, U, x_ref, b0_ref, b1_ref, b2_ref, a1_ref, a2_ref,
                   v1_ref, v2_ref, y_ref, v1o_ref, v2o_ref):
    # B = true block length (bound via partial; padded tail must not
    # run); U = unroll factor.
    const_coef = b0_ref.shape[0] == 1
    if const_coef:
        b0c = b0_ref[:]
        b1c = b1_ref[:]
        b2c = b2_ref[:]
        a1c = a1_ref[:]
        a2c = a2_ref[:]

    def sample(t, carry):
        v1, v2 = carry
        x = x_ref[pl.ds(t, 1), :]
        if const_coef:
            b0, b1, b2, a1, a2 = b0c, b1c, b2c, a1c, a2c
        else:
            b0 = b0_ref[pl.ds(t, 1), :]
            b1 = b1_ref[pl.ds(t, 1), :]
            b2 = b2_ref[pl.ds(t, 1), :]
            a1 = a1_ref[pl.ds(t, 1), :]
            a2 = a2_ref[pl.ds(t, 1), :]
        # Direct Form II Transposed (iir_lowpass/mod.rs:109-132)
        out = b0 * x + v1
        return (b1 * x - a1 * out + v2, b2 * x - a2 * out), out

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, out = sample(i * U + j, carry)
            rows.append(out)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    v1, v2 = jax.lax.fori_loop(0, B // U, body, (v1_ref[:], v2_ref[:]))
    v1o_ref[:] = v1
    v2o_ref[:] = v2


@functools.partial(jax.jit, static_argnames=("interpret",))
def biquad_scan(x, b0, b1, b2, a1, a2, v1, v2, interpret: bool = False):
    """Biquad (DFII-t) over a block, voice-parallel; bit-parity with the
    per-sample tick (minus denormal snaps — TPU flushes denormals).

    Coefficients may be block-constant ``[V]`` rows or per-sample
    ``[B, V]`` (the mod-32 update cadence of IirLowpass)."""
    xp, B = _pad_to(x, 8, 0)
    xp, V = _pad_to(xp, 128, 1)

    def coef(v):
        v = jnp.asarray(v)
        if v.ndim == 2:  # per-sample [B, V]
            c, _ = _pad_to(v, 8, 0)
            c, _ = _pad_to(c, 128, 1)
            return c
        r, _ = _pad_to(jnp.reshape(v, (1, -1)), 128, 1)
        return r

    def row(v):
        r, _ = _pad_to(jnp.reshape(v, (1, -1)), 128, 1)
        return r

    y, v1o, v2o = pl.pallas_call(
        functools.partial(_biquad_kernel, B, pick_unroll(B)),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((1, xp.shape[1]), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(xp, coef(b0), coef(b1), coef(b2), coef(a1), coef(a2), row(v1), row(v2))
    return y[:B, :V], v1o[0, :V], v2o[0, :V]


def _allpass_kernel(B, U, S, x_ref, a_ref, xp_ref, yp_ref, y_ref,
                    xp_o, yp_o):
    """Cascade of S first-order allpasses, exact reference op order
    (resample/halfband_iir.rs:24-63): per stage
    ``y = a*(x - y_prev) + x_prev``; stages chained within the sample."""
    a = a_ref[:]          # [S, V]

    def sample(t, carry):
        xp, yp = carry    # [S, V] per-stage input/output histories
        cur = x_ref[pl.ds(t, 1), :]
        nxp = []
        nyp = []
        for s in range(S):
            y = a[s:s + 1, :] * (cur - yp[s:s + 1, :]) + xp[s:s + 1, :]
            nxp.append(cur)
            nyp.append(y)
            cur = y
        return (jnp.concatenate(nxp, axis=0),
                jnp.concatenate(nyp, axis=0)), cur

    def body(i, carry):
        rows = []
        for j in range(U):
            carry, y = sample(i * U + j, carry)
            rows.append(y)
        y_ref[pl.ds(i * U, U), :] = jnp.concatenate(rows, axis=0)
        return carry

    xp, yp = jax.lax.fori_loop(0, B // U, body, (xp_ref[:], yp_ref[:]))
    xp_o[:] = xp
    yp_o[:] = yp


@functools.partial(jax.jit, static_argnames=("interpret",))
def allpass_cascade_scan(x, a, xp, yp, interpret: bool = False):
    """One block through an S-stage first-order allpass cascade,
    channel-parallel (the IIR-halfband resampler branch).

    Args: x ``[B, V]`` time-major; a/xp/yp ``[S, V]`` per-stage
    coefficients and carried histories.
    Returns (y ``[B, V]``, xp', yp') — bit-parity with the per-sample
    recurrence (sequential-exact, so block-size invariance holds).
    """
    xq, B = _pad_to(x, 8, 0)
    xq, V = _pad_to(xq, 128, 1)

    def st(v):
        v = jnp.asarray(v)
        r, _ = _pad_to(v, 128, 1)
        return r

    S = a.shape[0]
    y, xpo, ypo = pl.pallas_call(
        functools.partial(_allpass_kernel, B, pick_unroll(B), S),
        out_shape=(
            jax.ShapeDtypeStruct(xq.shape, jnp.float32),
            jax.ShapeDtypeStruct((S, xq.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((S, xq.shape[1]), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(xq, st(a), st(xp), st(yp))
    return y[:B, :V], xpo[:, :V], ypo[:, :V]
