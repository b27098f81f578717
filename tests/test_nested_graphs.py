"""Nested-graph generality: node arrays inside array subgraphs, delay
vias into subgraph inputs, asset bindings into (arrays of) subgraphs.

The reference's nested generated structs compose these for free
(tests/nested_graph_test.rs; asset/mod.rs:309-320; lower.rs:509-655 via
handling is generic over destinations); the flattening compiler lowers
them to grouped fanouts (REPEAT/SEGMENT_SUM), synthesized vias and
resolved asset routes.
"""

import numpy as np
import pytest

from oscen_tpu import (AudioAsset, Gain, Graph, GraphError, Oscillator,
                       SamplePlayer, Vca)


def _voice_with_inner_array(m=3):
    """Per-voice scalar -> inner [Vca; m] -> per-voice scalar."""
    v = Graph("Voice")
    v.input("x", "stream")
    v.output("out", "stream")
    pre = v.add("pre", Gain(2.0))
    arr = v.add("arr", Vca(), count=m)
    post = v.add("post", Gain(0.5))
    v.connect("x", pre.input)
    v.connect(pre.output, arr.input)       # REPEAT  g -> g*m
    v.connect(0.5, arr.control)
    v.connect(arr.output, post.input)      # SEGMENT_SUM  g*m -> g
    v.connect(post.output, "out")
    return v


@pytest.mark.parametrize("block_size", [64, 256])
def test_array_inside_array_subgraph(block_size):
    """[Voice; g] where Voice contains [Vca; 3]: per-instance broadcast
    and fan-in flatten to REPEAT/SEGMENT_SUM; output matches the closed
    form g * (0.5 * 3 * 0.5 * 2) * x."""
    g_count, m = 4, 3
    g = Graph("Poly")
    g.output("out", "stream")
    osc = g.add("osc", Oscillator.sine(220.0, 0.8))
    voices = g.add("v", _voice_with_inner_array(m), count=g_count)
    g.connect(osc.output, voices.x)
    g.connect(voices.out, "out")
    c = g.compile(48000.0, block_size=block_size)
    got = np.asarray(c.render_mono(1024))

    ref = Graph("Ref")
    ref.output("out", "stream")
    osc2 = ref.add("osc", Oscillator.sine(220.0, 0.8))
    amp = ref.add("amp", Gain(g_count * 0.5 * m * 0.5 * 2.0))
    ref.connect(osc2.output, amp.input)
    ref.connect(amp.output, "out")
    want = np.asarray(ref.compile(48000.0,
                                  block_size=block_size).render_mono(1024))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.abs(got).max() > 0.5


def test_array_subgraph_mode_equivalence():
    """Sample mode and block mode agree on grouped fanouts."""
    g_count = 2
    outs = {}
    for mode in ("sample", "block"):
        g = Graph("PolyM")
        g.output("out", "stream")
        osc = g.add("osc", Oscillator.sine(330.0, 0.5))
        voices = g.add("v", _voice_with_inner_array(2), count=g_count)
        g.connect(osc.output, voices.x)
        g.connect(voices.out, "out")
        c = g.compile(48000.0, block_size=128, mode=mode)
        outs[mode] = np.asarray(c.render_mono(512))
    np.testing.assert_allclose(outs["sample"], outs["block"], atol=1e-6)


def test_mismatched_inner_counts_rejected():
    v = Graph("VoiceBad")
    v.input("x", "stream")
    v.output("out", "stream")
    a = v.add("a", Vca(), count=2)
    b = v.add("b", Vca(), count=3)
    v.connect("x", a.input)
    v.connect(a.output, b.input)
    v.connect(b.output, "out")
    g = Graph("Outer")
    g.output("out", "stream")
    osc = g.add("osc", Oscillator.sine(220.0, 0.5))
    sub = g.add("v", v, count=4)
    g.connect(osc.output, sub.x)
    g.connect(sub.out, "out")
    with pytest.raises(GraphError, match="must match or be scalar"):
        g.compile(48000.0, block_size=64)


def test_indexed_ref_in_array_subgraph_rejected():
    v = Graph("VoiceIdx")
    v.input("x", "stream")
    v.output("out", "stream")
    a = v.add("a", Vca(), count=2)
    v.connect("x", a.input)
    v.connect(a[0].output, "out")
    g = Graph("Outer")
    g.output("out", "stream")
    osc = g.add("osc", Oscillator.sine(220.0, 0.5))
    sub = g.add("v", v, count=4)
    g.connect(osc.output, sub.x)
    g.connect(sub.out, "out")
    with pytest.raises(GraphError, match="indexed"):
        g.compile(48000.0, block_size=64)


# --------------------------------------------------------------------- #
# delay vias into subgraph inputs
# --------------------------------------------------------------------- #
def _via_graphs(block_size):
    """Nested: osc -> sub.in; sub.out -> [64] -> sub.in (feedback).
    Manual: the same patch with the subgraph hand-inlined."""
    sub = Graph("Fb")
    sub.input("in", "stream")
    sub.output("out", "stream")
    gn = sub.add("g", Gain(0.5))
    sub.connect("in", gn.input)
    sub.connect(gn.output, "out")

    g = Graph("Nested")
    g.output("out", "stream")
    osc = g.add("osc", Oscillator.sine(220.0, 0.5))
    s = g.add("s", sub)
    g.connect(osc.output, "s.in")
    g.connect(s.out, "s.in", via=64)
    g.connect(s.out, "out")
    nested = g.compile(48000.0, block_size=block_size)

    m = Graph("Manual")
    m.output("out", "stream")
    osc2 = m.add("osc", Oscillator.sine(220.0, 0.5))
    gn2 = m.add("g", Gain(0.5))
    m.connect(osc2.output, gn2.input)
    m.connect(gn2.output, gn2.input, via=64)
    m.connect(gn2.output, "out")
    manual = m.compile(48000.0, block_size=block_size)
    return nested, manual


@pytest.mark.parametrize("block_size", [64, 256])
def test_delay_via_into_subgraph_input(block_size):
    nested, manual = _via_graphs(block_size)
    a = np.asarray(nested.render_mono(1024))
    b = np.asarray(manual.render_mono(1024))
    np.testing.assert_allclose(a, b, atol=1e-6)
    # the echo actually recirculates (not silence past the via length)
    assert np.abs(a[64:]).max() > np.abs(b[:64]).max() * 0.1


# --------------------------------------------------------------------- #
# asset bindings into subgraphs
# --------------------------------------------------------------------- #
def _player_sub(capacity=64):
    p = Graph("Player")
    p.input("buf", "asset")
    p.output("out", "stream")
    sp = p.add("sp", SamplePlayer(capacity=capacity))
    p.connect("buf", sp.buf)
    p.connect(sp.output, "out")
    return p


def test_asset_binding_into_subgraph():
    g = Graph("Sampler")
    g.output("out", "stream")
    g.external("sample")
    p = g.add("p", _player_sub())
    g.connect("sample", "p.buf")
    g.connect("p.out", "out")
    c = g.compile(48000.0, block_size=32)
    data = np.arange(10, dtype=np.float32) / 10.0
    c.publish_asset("sample", AudioAsset.from_samples(data, 48000))
    out = np.asarray(c.render_mono(20))
    np.testing.assert_allclose(out, np.tile(data, 2), atol=1e-6)


def test_asset_binding_into_subgraph_array():
    """[Player; 4] subgraphs share one published asset; the mixed output
    is 4x the sample."""
    g = Graph("SamplerArr")
    g.output("out", "stream")
    g.external("sample")
    p = g.add("p", _player_sub(), count=4)
    g.connect("sample", "p.buf")
    g.connect("p.out", "out")
    c = g.compile(48000.0, block_size=32)
    data = np.arange(10, dtype=np.float32) / 10.0
    c.publish_asset("sample", AudioAsset.from_samples(data, 48000))
    out = np.asarray(c.render_mono(20))
    np.testing.assert_allclose(out, 4.0 * np.tile(data, 2), atol=1e-5)


def test_asset_forwarding_two_levels():
    """Asset input forwarded through two nesting levels resolves to the
    leaf SamplePlayer."""
    mid = Graph("Mid")
    mid.input("wav", "asset")
    mid.output("out", "stream")
    leaf = mid.add("leaf", _player_sub())
    mid.connect("wav", "leaf.buf")
    mid.connect("leaf.out", "out")

    g = Graph("Top")
    g.output("out", "stream")
    g.external("sample")
    m = g.add("m", mid)
    g.connect("sample", "m.wav")
    g.connect("m.out", "out")
    c = g.compile(48000.0, block_size=16)
    data = np.linspace(-1, 1, 8).astype(np.float32)
    c.publish_asset("sample", AudioAsset.from_samples(data, 48000))
    out = np.asarray(c.render_mono(16))
    np.testing.assert_allclose(out, np.tile(data, 2), atol=1e-6)


def test_top_level_asset_input_is_publish_handle():
    """A top-level asset-kind graph input publishes by its own name
    (the nested forwarding handle degenerates to an external)."""
    g = _player_sub()
    c = g.compile(48000.0, block_size=16)
    data = np.ones(4, dtype=np.float32) * 0.25
    c.publish_asset("buf", AudioAsset.from_samples(data, 48000))
    out = np.asarray(c.render_mono(8))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_unbound_subgraph_asset_input_rejected():
    g = Graph("Unbound")
    g.output("out", "stream")
    p = g.add("p", _player_sub())
    g.connect("p.out", "out")
    with pytest.raises(GraphError, match="unbound"):
        g.compile(48000.0, block_size=32)


def test_external_to_non_asset_subgraph_input_rejected():
    sub = Graph("S")
    sub.input("x", "stream")
    sub.output("out", "stream")
    gn = sub.add("g", Gain(1.0))
    sub.connect("x", gn.input)
    sub.connect(gn.output, "out")
    g = Graph("Bad")
    g.output("out", "stream")
    g.external("sample")
    s = g.add("s", sub)
    g.connect(s.out, "out")
    with pytest.raises(GraphError, match="asset input"):
        g.connect("sample", "s.x")


def test_mixed_multiplicity_expression_aligns():
    """An inner expression mixing arrays of different per-instance
    multiplicities ([Vca; 2] + scalar SamplePlayer) flattens with
    group alignment: result equals the unnested broadcast semantics
    (the scalar term counted once per lane)."""
    voice = Graph("VoiceMix")
    voice.input("x", "stream")
    voice.output("out", "stream")
    pre = voice.add("pre", Gain(1.0))
    arr = voice.add("arr", Vca(), count=2)
    voice.connect("x", pre.input)
    voice.connect(pre.output, arr.input)
    voice.connect(0.5, arr.control)
    # mixed counts: arr is [g*2], pre is [g]
    voice.connect(arr.output + pre.output * 0.1, "out")

    g = Graph("TopMix")
    g.output("out", "stream")
    osc = g.add("osc", Oscillator.sine(220.0, 0.5))
    v = g.add("v", voice, count=4)
    g.connect(osc.output, v.x)
    g.connect(v.out, "out")
    got = np.asarray(g.compile(48000.0, block_size=128).render_mono(512))

    # per voice: 2*(0.5x) + 2*(0.1x) = 1.2x; 4 voices -> 4.8x
    ref = Graph("RefMix")
    ref.output("out", "stream")
    osc2 = ref.add("osc", Oscillator.sine(220.0, 0.5))
    amp = ref.add("amp", Gain(4.8))
    ref.connect(osc2.output, amp.input)
    ref.connect(amp.output, "out")
    want = np.asarray(ref.compile(48000.0, block_size=128).render_mono(512))
    np.testing.assert_allclose(got, want, atol=1e-5)
