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


def test_tpt_batched_const_params_elide_cond(monkeypatch):
    """When every TPT parameter is trace-time block-constant ([1]-staged
    graph inputs), the batched path compiles NO lax.cond and NO [C,B]
    coefficient sweep; a cutoff fed by a time-varying stream keeps the
    runtime cond.  (The cond used to materialize six [C,B] planes per
    block — see PERF.md pivot ladder.)"""
    import jax
    from oscen_tpu.graph.ir import Kind
    from oscen_tpu import Graph, PolyBlepOscillator, TptFilter, MulAdd
    from oscen_tpu.nodes.envelope import AdsrEnvelope

    monkeypatch.setenv("OSCEN_PALLAS_INTERPRET", "1")

    def jaxpr_of(build):
        g = build()
        s = g.compile(48000.0, block_size=64, mode="block")
        B = 64
        ev_bufs, host_vals = s._host_prepass(B)
        import jax.numpy as jnp
        per_block = {}
        for gi in s.ir.inputs:
            if gi.kind == Kind.VALUE:
                per_block[gi.name] = jnp.asarray(
                    s._params[gi.name].materialize_block(B))
            elif gi.kind == Kind.STREAM:
                per_block[gi.name] = jnp.zeros((B,), jnp.float32)
        for k, arr in host_vals.items():
            per_block[k] = jnp.asarray(arr)
        ev_caps = tuple(sorted((k, v.capacity) for k, v in ev_bufs.items()))
        fn = s._get_block_fn(B, ev_caps, tuple(sorted(per_block)))
        return str(jax.make_jaxpr(fn)(s.state, per_block, ev_bufs))

    def const_graph():
        g = Graph("TptConst")
        g.input("cutoff", "value", default=1200.0)
        g.output("out", "stream")
        osc = g.add("osc", PolyBlepOscillator.saw(220.0, 0.5), count=4)
        f = g.add("filt", TptFilter(1200.0, 0.707), count=4)
        g.connect("cutoff", f.cutoff)
        g.connect(osc.output, f.input)
        g.connect(f.output, "out")
        return g

    def modulated_graph():
        g = Graph("TptMod")
        g.input("cutoff", "value", default=1200.0)
        g.input("amount", "value", default=500.0)
        g.input("gate", "event")
        g.output("out", "stream")
        osc = g.add("osc", PolyBlepOscillator.saw(220.0, 0.5), count=4)
        env = g.add("env", AdsrEnvelope(0.01, 0.1, 0.7, 0.2), count=4)
        mod = g.add("mod", MulAdd(500.0, 1200.0), count=4)
        f = g.add("filt", TptFilter(1200.0, 0.707), count=4)
        g.connect("gate", env.gate)
        g.connect(env.output, mod.input)
        g.connect("amount", mod.gain)
        g.connect("cutoff", mod.value)
        g.connect(mod.output, f.cutoff)
        g.connect(osc.output, f.input)
        g.connect(f.output, "out")
        return g

    assert "cond" not in jaxpr_of(const_graph)
    assert "cond" in jaxpr_of(modulated_graph)


def test_muladd_equals_gain_addvalue():
    """MulAdd is bit-identical to the Gain -> AddValue pair it fuses."""
    from oscen_tpu import AddValue, Gain, Graph, MulAdd, PolyBlepOscillator

    def render(fused):
        g = Graph("MA")
        g.input("amt", "value", default=0.35)
        g.input("base", "value", default=2.0)
        g.output("out", "stream")
        osc = g.add("osc", PolyBlepOscillator.saw(110.0, 0.8))
        if fused:
            m = g.add("m", MulAdd(0.35, 2.0))
            g.connect(osc.output, m.input)
            g.connect("amt", m.gain)
            g.connect("base", m.value)
            g.connect(m.output, "out")
        else:
            ga = g.add("ga", Gain(0.35))
            ad = g.add("ad", AddValue(2.0))
            g.connect(osc.output, ga.input)
            g.connect("amt", ga.gain)
            g.connect(ga.output, ad.input)
            g.connect("base", ad.value)
            g.connect(ad.output, "out")
        return g.compile(48000.0, block_size=128).render_mono(1024)

    np.testing.assert_array_equal(render(True), render(False))
