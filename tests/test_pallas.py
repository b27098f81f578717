"""Pallas voice-parallel IIR kernels: bit-parity with the per-sample tick
(interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oscen_tpu import IirLowpass, SampleRate, TptFilter
from oscen_tpu.ops.pallas.iir import biquad_scan, tpt_svf_scan


def test_tpt_pallas_matches_tick():
    V, B = 4, 64
    sr = SampleRate(48000.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, V)).astype(np.float32)
    cut = np.linspace(500.0, 8000.0, V).astype(np.float32)

    # per-voice sequential reference via the node tick
    ys = np.zeros((B, V), np.float32)
    states = []
    for v in range(V):
        f = TptFilter(float(cut[v]), 0.707)
        st = f.init_state(sr)
        for t in range(B):
            ins = f.default_inputs()
            ins["input"] = jnp.float32(x[t, v])
            ins["cutoff"] = jnp.float32(cut[v])
            st, o = f.tick(st, ins, sr)
            ys[t, v] = float(o["output"])
        states.append(st)

    h = np.array([float(s["h"]) for s in states], np.float32)
    g = np.array([float(s["g"]) for s in states], np.float32)
    k = np.array([float(s["k"]) for s in states], np.float32)
    y, z0, z1 = tpt_svf_scan(jnp.asarray(x), jnp.asarray(h),
                             jnp.asarray(g), jnp.asarray(k),
                             jnp.zeros(V), jnp.zeros(V), interpret=True)
    # single-ULP FMA-contraction differences between compilation paths
    np.testing.assert_allclose(np.asarray(y), ys, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z0),
                               [float(s["z0"]) for s in states], atol=1e-6)


def test_biquad_pallas_matches_tick():
    V, B = 2, 48
    sr = SampleRate(48000.0)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((B, V)).astype(np.float32) * 0.5

    f = IirLowpass(2000.0, 0.707)
    st0 = f.init_state(sr)
    coef = {n: float(st0[n]) for n in ("b0", "b1", "b2", "a1", "a2")}
    ys = np.zeros((B, V), np.float32)
    for v in range(V):
        st = f.init_state(sr)
        for t in range(B):
            ins = f.default_inputs()
            ins["input"] = jnp.float32(x[t, v])
            st, o = f.tick(st, ins, sr)
            ys[t, v] = float(o["output"])

    ones = np.ones(V, np.float32)
    y, v1, v2 = biquad_scan(
        jnp.asarray(x), coef["b0"] * ones, coef["b1"] * ones,
        coef["b2"] * ones, coef["a1"] * ones, coef["a2"] * ones,
        jnp.zeros(V), jnp.zeros(V), interpret=True)
    # tick path has denormal snaps; signals here stay far above 1e-15
    np.testing.assert_allclose(np.asarray(y), ys, atol=1e-7)


def test_phase_scan_matches_sequential():
    """The Pallas phase kernel replays exact per-sample wrapping."""
    from oscen_tpu.ops.pallas.phase import phase_scan

    rng = np.random.default_rng(0)
    V, B = 3, 100
    dt = rng.uniform(0.0, 0.3, (B, V)).astype(np.float32)
    p0 = rng.uniform(0, 1, V).astype(np.float32)
    before, carry = phase_scan(jnp.asarray(p0), jnp.asarray(dt),
                               interpret=True)
    # sequential f32 reference (exact op order)
    p = p0.copy()
    ref = np.zeros((B, V), np.float32)
    for t in range(B):
        ref[t] = p
        p = (p + dt[t]).astype(np.float32)
        p = (p - np.floor(p)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(before), ref)
    np.testing.assert_array_equal(np.asarray(carry), p)


def test_fm_operator_pallas_matches_tick():
    from oscen_tpu import FmOperator, SampleRate
    from oscen_tpu.ops.pallas.fm import fm_operator_scan

    sr = SampleRate(48000.0)
    node = FmOperator()
    V, B = 2, 64
    rng = np.random.default_rng(0)
    pm = rng.uniform(-0.2, 0.2, (B, V)).astype(np.float32)
    env = rng.uniform(0.2, 1.0, (B, V)).astype(np.float32)
    freqs = np.array([220.0, 440.0], np.float32)

    ys = np.zeros((B, V), np.float32)
    for v in range(V):
        st = node.init_state(sr)
        for t in range(B):
            ins = node.default_inputs()
            ins.update(base_freq=jnp.float32(freqs[v]),
                       ratio=jnp.float32(2.0),
                       phase_mod=jnp.float32(pm[t, v]),
                       feedback=jnp.float32(0.4),
                       envelope=jnp.float32(env[t, v]),
                       level=jnp.float32(0.8))
            st, o = node.tick(st, ins, sr)
            ys[t, v] = float(o["output"])

    dt = np.broadcast_to(freqs * 2.0 / 48000.0, (B, V)).astype(np.float32)
    y, phase, prev = fm_operator_scan(
        jnp.zeros(V), jnp.zeros(V), jnp.asarray(dt), jnp.asarray(pm),
        jnp.full((B, V), 0.4), jnp.asarray(env), jnp.full((B, V), 0.8),
        interpret=True)
    np.testing.assert_allclose(np.asarray(y), ys, atol=1e-6)
