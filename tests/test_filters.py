"""Golden-value filter tests.

Anchors from the reference test suite:
- TptFilter 8-sample impulse response at 1e-6
  (/root/reference/oscen-lib/src/filters/tpt/mod.rs:152-161)
- TptFilter Zavalishin coefficient formulation (tpt/mod.rs:200-224)
- IirLowpass JUCE coefficients + DC gain (iir_lowpass/mod.rs:178-253)
- stereo channel independence (tpt/mod.rs:166-198)
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from oscen_tpu import IirLowpass, SampleRate, TptFilter

TPT_IMPULSE_RESPONSE = [
    0.014401104, 0.052318562, 0.089890145, 0.11065749,
    0.11862421, 0.11729243, 0.10961619, 0.098000914,
]


def run_filter_ticks(f, sr_hz, inputs, extra=None):
    """Scan the per-sample tick over the input (jitted, exact op order)."""
    import jax

    sr = SampleRate(sr_hz)
    state = f.init_state(sr)
    x = jnp.asarray(np.asarray(inputs, np.float32))
    n = x.shape[0]
    ins = {k: jnp.broadcast_to(v, (n,) + jnp.shape(v))
           for k, v in f.default_inputs().items()}
    ins["input"] = x
    if extra:
        ins.update(extra)

    @jax.jit
    def run(state, ins):
        def body(st, per_t):
            st, o = f.tick(st, per_t, sr)
            return st, o["output"]
        return jax.lax.scan(body, state, ins)

    _, out = run(state, ins)
    return np.asarray(out)


def test_tpt_impulse_response_matches_reference():
    f = TptFilter(2000.0, 0.707)
    impulse = [1.0] + [0.0] * 7
    out = run_filter_ticks(f, 48_000.0, impulse)
    np.testing.assert_allclose(out, TPT_IMPULSE_RESPONSE, atol=1e-6)


def test_tpt_coefficients_follow_zavalishin():
    sr = 48_000.0
    f = TptFilter(2000.0, 0.707)
    state = f.init_state(SampleRate(sr))
    period = 0.5 / sr
    freq = 2000.0
    fc = (2.0 * sr) * math.tan(2.0 * math.pi * freq * period) * period
    r = 1.0 / 0.707
    assert abs(float(state["g"]) - fc) < 1e-6
    assert abs(float(state["h"]) - 1.0 / (1.0 + r * fc + fc * fc)) < 1e-6
    assert abs(float(state["r"]) - r) < 1e-6
    assert abs(float(state["k"]) - (fc + r)) < 1e-6


def test_tpt_stereo_channels_independent():
    f = TptFilter(2000.0, 0.707, channels=2)
    sr = SampleRate(48_000.0)
    state = f.init_state(sr)
    for n, expected in enumerate(TPT_IMPULSE_RESPONSE):
        ins = f.default_inputs()
        x = jnp.array([1.0, 0.0]) if n == 0 else jnp.array([0.0, 0.0])
        ins["input"] = x
        state, o = f.tick(state, ins, sr)
        out = np.asarray(o["output"])
        assert abs(out[0] - expected) <= 1e-6
        assert abs(out[1]) <= 1e-6


def test_tpt_block_mode_matches_tick():
    f = TptFilter(1200.0, 0.9)
    sr = SampleRate(48_000.0)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256).astype(np.float32)
    seq = run_filter_ticks(f, sr.hz, x)

    state = f.init_state(sr)
    ins = {k: jnp.broadcast_to(v, (256,)) for k, v in
           f.default_inputs().items()}
    ins["input"] = jnp.asarray(x)
    import jax
    _, o = jax.jit(lambda s, i: f.process_block(s, i, {}, sr, 256))(
        state, ins)
    # Block mode reassociates the 2x2 recurrence (associative scan): f32
    # reassociation drift, bounded but nonzero.  Sample mode is the
    # bit-parity path; block mode is the documented fast path.
    np.testing.assert_allclose(np.asarray(o["output"]), seq, atol=2e-4)


def test_iir_lowpass_coefficients_match_juce():
    sr = 48_000.0
    q = 1.0 / math.sqrt(2.0)
    f = IirLowpass(1000.0, q)
    state = f.init_state(SampleRate(sr))
    n = 1.0 / math.tan(math.pi * 1000.0 / sr)
    n2 = n * n
    c1 = 1.0 / (1.0 + 1.0 / q * n + n2)
    assert abs(float(state["b0"]) - c1) < 1e-6
    assert abs(float(state["b1"]) - c1 * 2.0) < 1e-6
    assert abs(float(state["a1"]) - c1 * 2.0 * (1.0 - n2)) < 1e-5
    assert abs(float(state["a2"]) -
               c1 * (1.0 - 1.0 / q * n + n2)) < 1e-6


def test_iir_lowpass_dc_gain_unity():
    f = IirLowpass(1000.0, 1.0 / math.sqrt(2.0))
    out = run_filter_ticks(f, 48_000.0, [1.0] * 1000)
    assert abs(out[-1] - 1.0) < 0.01


def test_iir_lowpass_block_matches_tick():
    f = IirLowpass(2000.0, 0.707)
    sr = SampleRate(48_000.0)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(200).astype(np.float32)
    seq = run_filter_ticks(f, sr.hz, x)
    state = f.init_state(sr)
    ins = {k: jnp.broadcast_to(v, (200,)) for k, v in
           f.default_inputs().items()}
    ins["input"] = jnp.asarray(x)
    import jax
    _, o = jax.jit(lambda s, i: f.process_block(s, i, {}, sr, 200))(
        state, ins)
    np.testing.assert_allclose(np.asarray(o["output"]), seq, atol=5e-5)
