"""Assets + convolution: exactness vs naive convolution, zero latency,
hot-swap crossfade, stereo independence, sample playback, offline
resampler quality.

Mirrors: reference convolver-vs-naive comparisons (tests/convolution.rs),
asset end-to-end (tests/asset_graph.rs, tests/sample_player_graph.rs),
stereo no-bleed (tests/stereo_convolver_graph.rs), offline resampler
quality (asset/resample.rs tests).
"""

import numpy as np
import pytest

from oscen_tpu import (AssetError, AudioAsset, Convolver, Graph,
                      SamplePlayer)
from oscen_tpu.ops.offline_resample import resample_channel


def _noise(n, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, n).astype(np.float32)


def conv_graph(ir=None, channels=1, max_ir=256, mode="block"):
    g = Graph("Conv")
    g.input("x", "stream", channels=channels)
    g.output("out", "stream", channels=channels)
    g.external("ir")
    c = g.add("conv", Convolver(ir=ir, max_ir_len=max_ir,
                                channels=channels))
    g.connect("ir", c.ir)
    g.connect("x", c.input)
    g.connect(c.output, "out")
    return g.compile(48000.0, block_size=64, mode=mode)


@pytest.mark.parametrize("mode", ["sample", "block"])
def test_convolver_matches_naive(mode):
    """Output equals brute-force convolution with zero latency
    (the Gardner invariant, convolution/mod.rs:10-17)."""
    ir = _noise(100, seed=1)
    x = _noise(256, seed=2)
    c = conv_graph(ir=ir, max_ir=128, mode=mode)
    out = c.render_mono(256, stream_inputs={"x": x})
    ref = np.convolve(x, ir)[:256]
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_convolver_impulse_reproduces_ir():
    ir = _noise(50, seed=3)
    c = conv_graph(ir=ir, max_ir=64)
    x = np.zeros(128, np.float32)
    x[0] = 1.0
    out = c.render_mono(128, stream_inputs={"x": x})
    np.testing.assert_allclose(out[:50], ir, atol=1e-5)
    np.testing.assert_allclose(out[50:], 0.0, atol=1e-5)


def test_convolver_hot_swap_crossfades():
    """Publishing a new IR crossfades over 20 ms without clicks
    (convolution/mod.rs:534-573)."""
    c = conv_graph(ir=[1.0], max_ir=64)
    x = np.ones(4800, np.float32) * 0.5
    a = c.render_mono(960, stream_inputs={"x": x})  # identity: 0.5
    np.testing.assert_allclose(a[100:], 0.5, atol=1e-5)
    # swap to a 2x gain IR
    c.publish_asset("ir", AudioAsset.from_samples(
        np.array([2.0], np.float32), 48000))
    b = c.render_mono(1920, stream_inputs={"x": x})
    # starts at old level, ends at new level, monotonic-ish, no jumps
    assert abs(b[0] - 0.5) < 0.01
    assert abs(b[-1] - 1.0) < 1e-4
    assert np.abs(np.diff(b)).max() < 0.01  # click-free
    fade_len = int(0.02 * 48000)
    assert abs(b[fade_len + 5] - 1.0) < 1e-4


def test_convolver_stereo_no_bleed():
    """Channel c convolves with IR channel c only — L->L, R->R
    (tests/stereo_convolver_graph.rs)."""
    ir_l = _noise(20, seed=4)
    ir_r = _noise(20, seed=5)
    c = conv_graph(channels=2, max_ir=64)
    c.publish_asset("ir", AudioAsset.from_samples(
        np.stack([ir_l, ir_r]), 48000))
    # let the publish crossfade (20 ms) complete on silence first
    c.render(1024, stream_inputs={"x": np.zeros((1024, 2), np.float32)})
    x = np.zeros((128, 2), np.float32)
    x[0, 0] = 1.0  # impulse on L only
    out = c.render(128, stream_inputs={"x": x})["out"]
    np.testing.assert_allclose(out[:20, 0], ir_l, atol=1e-5)
    np.testing.assert_allclose(out[:, 1], 0.0, atol=1e-6)


def test_sample_player_loops_and_swaps(tmp_path):
    g = Graph("SP")
    g.output("out", "stream")
    g.external("buf")
    sp = g.add("sp", SamplePlayer(capacity=64))
    g.connect("buf", sp.buf)
    g.connect(sp.output, "out")
    c = g.compile(48000.0, block_size=32)
    # silent until loaded (sample_player/mod.rs: unloaded emits silence)
    out = c.render_mono(32)
    np.testing.assert_array_equal(out, 0.0)
    data = np.arange(10, dtype=np.float32) / 10.0
    c.publish_asset("buf", AudioAsset.from_samples(data, 48000))
    out = c.render_mono(25)
    np.testing.assert_allclose(out, np.tile(data, 3)[:25], atol=1e-6)
    # swap resets playhead
    data2 = -data
    c.publish_asset("buf", AudioAsset.from_samples(data2, 48000))
    out = c.render_mono(10)
    np.testing.assert_allclose(out, data2, atol=1e-6)


def test_sample_player_wav_roundtrip(tmp_path):
    path = str(tmp_path / "test.wav")
    data = (np.sin(np.linspace(0, 20, 200)) * 0.5).astype(np.float32)
    AudioAsset.write_wav(path, data, 48000)
    g = Graph("SPW")
    g.output("out", "stream")
    g.external("buf")
    sp = g.add("sp", SamplePlayer(capacity=256))
    g.connect("buf", sp.buf)
    g.connect(sp.output, "out")
    c = g.compile(48000.0, block_size=64)
    c.load_wav("buf", path)
    out = c.render_mono(200)
    np.testing.assert_allclose(out, data, atol=1e-3)  # 16-bit quant


def test_asset_resamples_to_graph_rate():
    """An asset at a foreign rate conforms via the offline resampler
    (asset/mod.rs:169-232): a 1 kHz sine at 44.1k plays as 1 kHz at 48k."""
    sr_src, sr_graph = 44100, 48000
    t = np.arange(sr_src // 2, dtype=np.float32)
    data = np.sin(2 * np.pi * 1000.0 * t / sr_src).astype(np.float32)
    g = Graph("AR")
    g.output("out", "stream")
    g.external("buf")
    sp = g.add("sp", SamplePlayer(capacity=1 << 15))
    g.connect("buf", sp.buf)
    g.connect(sp.output, "out")
    c = g.compile(float(sr_graph), block_size=512)
    c.publish_asset("buf", AudioAsset.from_samples(data, sr_src))
    out = c.render_mono(8192)[512:7680]
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak = np.fft.rfftfreq(len(out), 1 / sr_graph)[spec.argmax()]
    assert abs(peak - 1000.0) < 10.0, peak


# ---------------- offline resampler quality (asset/resample.rs) -------- #
def test_offline_resample_constant_preserved():
    x = np.full(500, 0.7, np.float32)
    for src, dst in [(48000, 44100), (44100, 48000), (96000, 44100)]:
        out = resample_channel(x, src, dst)
        guard = 36
        np.testing.assert_allclose(out[guard:-guard], 0.7, atol=1e-3)


def test_offline_resample_sine_preserved():
    src, dst, freq = 48000, 44100, 1000.0
    t = np.arange(24000, dtype=np.float32)
    x = np.sin(2 * np.pi * freq * t / src).astype(np.float32)
    out = resample_channel(x, src, dst)
    g = 40
    t2 = np.arange(len(out), dtype=np.float32)
    want = np.sin(2 * np.pi * freq * t2 / dst)
    assert np.abs(out[g:-g] - want[g:-g]).max() < 1e-2


def test_offline_resample_rejects_above_nyquist():
    src, dst = 48000, 16000
    t = np.arange(24000, dtype=np.float32)
    x = np.sin(2 * np.pi * 12000.0 * t / src).astype(np.float32)
    out = resample_channel(x, src, dst)
    g = 40
    assert np.abs(out[g:-g]).max() < 0.1


def test_offline_resample_lengths():
    x = np.zeros(1000, np.float32)
    assert len(resample_channel(x, 48000, 24000)) == 500
    assert len(resample_channel(x, 24000, 48000)) == 2000
    assert len(resample_channel(x, 48000, 48000)) == 1000


def test_signal_edge_into_asset_input_rejected():
    from oscen_tpu import Gain, GraphError
    g = Graph("Bad")
    g.output("out", "stream")
    gn = g.add("g", Gain(1.0))
    cv = g.add("c", Convolver(max_ir_len=32))
    g.connect(gn.output, "out")
    g.connect(gn.output, cv.ir)
    with pytest.raises(GraphError):
        g.lower()


def test_convolver_long_ir_grows_capacity_no_truncation():
    """Engines are sized from the published IR (reference
    convolution/mod.rs:257-306): a 48,000-tap reverb IR published into a
    small-capacity convolver must be used faithfully (pow2 capacity-class
    growth), matching naive convolution — never silently truncated."""
    ir = (_noise(48_000, seed=7)
          * np.exp(-np.arange(48_000) / 8000.0)).astype(np.float32)
    g = Graph("LongIR")
    g.input("x", "stream")
    g.output("out", "stream")
    g.external("ir")
    cv = Convolver(max_ir_len=1024)   # deliberately too small
    c = g.add("conv", cv)
    g.connect("ir", c.ir)
    g.connect("x", c.input)
    g.connect(c.output, "out")
    comp = g.compile(48000.0, block_size=512, mode="block")
    comp.publish_asset("ir", AudioAsset.from_samples(ir, 48000))
    # flush the 20 ms crossfade (old IR is all-zero, new fades in)
    fade = int(0.02 * 48000) + 512
    comp.render_mono(fade)
    x = _noise(4096, seed=8)
    out = comp.render_mono(4096, stream_inputs={"x": x})
    # reference: convolution of x with the FULL ir (the engine has only
    # seen silence before x, so history is clean)
    ref = np.convolve(x, ir)[:4096]
    err = np.sqrt(np.mean((out - ref) ** 2)) / max(np.sqrt(
        np.mean(ref ** 2)), 1e-12)
    assert err < 1e-5, err
    # truncation to the original 1024-cap would be wildly off
    ref_trunc = np.convolve(x, ir[:1024])[:4096]
    err_trunc = np.sqrt(np.mean((ref_trunc - ref) ** 2)) / np.sqrt(
        np.mean(ref ** 2))
    assert err_trunc > 1e-2  # sanity: the tail matters in this signal


def test_convolver_steady_state_matches_single_engine():
    """After the crossfade finishes the old-IR branch is skipped
    (lax.cond): output must exactly equal a fresh convolver constructed
    with the same IR (no stale-engine residue)."""
    ir = _noise(200, seed=9)
    c1 = conv_graph(ir=None, max_ir=256, mode="block")
    c1.publish_asset("ir", AudioAsset.from_samples(ir, 48000))
    c1.render_mono(2048)  # flush fade (+ fill history with silence)
    x = _noise(512, seed=10)
    a = c1.render_mono(512, stream_inputs={"x": x})
    ref = np.convolve(x, ir)[:512]
    np.testing.assert_allclose(a, ref, atol=2e-4)


def test_convolver_swap_within_capacity_does_not_retrace():
    """In-capacity swaps keep every state shape: the block fn must not
    retrace (functional hot-swap, the reference's allocation-free path)."""
    import jax
    ir = _noise(100, seed=11)
    c = conv_graph(ir=ir, max_ir=128, mode="block")
    c.render_mono(256)
    before_struct = jax.tree_util.tree_structure(c.state)
    before_shapes = [np.asarray(v).shape
                     for v in jax.tree_util.tree_leaves(c.state)]
    c.publish_asset("ir", AudioAsset.from_samples(
        _noise(120, seed=12), 48000))
    assert jax.tree_util.tree_structure(c.state) == before_struct
    after_shapes = [np.asarray(v).shape
                    for v in jax.tree_util.tree_leaves(c.state)]
    assert before_shapes == after_shapes
    c.render_mono(256)


def test_sample_player_array_shares_one_asset():
    """[SamplePlayer; 8] bound to ONE external: publish broadcasts the
    asset into every instance's state slot (reference asset wiring is
    generic over nodes, asset/mod.rs:309-320), per-voice playheads stay
    independent, and the swap causes no retrace."""
    g = Graph("SPArr")
    g.output("out", "stream")
    g.external("buf")
    sp = g.add("sp", SamplePlayer(capacity=64), count=8)
    g.connect("buf", sp.buf)
    g.connect(sp.output, "out")   # fan-in sum over the 8 players
    c = g.compile(48000.0, block_size=32)
    out = c.render_mono(32)
    np.testing.assert_array_equal(out, 0.0)

    data = np.arange(10, dtype=np.float32) / 10.0
    c.publish_asset("buf", AudioAsset.from_samples(data, 48000))
    out = c.render_mono(25)
    # 8 identical players in phase -> 8x the mono loop
    np.testing.assert_allclose(out, 8.0 * np.tile(data, 3)[:25],
                               atol=1e-5)
    # swap mid-run: playheads hard-reset on every instance
    data2 = -data
    c.publish_asset("buf", AudioAsset.from_samples(data2, 48000))
    out = c.render_mono(10)
    np.testing.assert_allclose(out, 8.0 * data2, atol=1e-5)
    # a further swap + same-length render must not retrace
    base = sum(fn._cache_size() for fn in c._block_fn_cache.values())
    c.publish_asset("buf", AudioAsset.from_samples(data, 48000))
    out = c.render_mono(10)
    np.testing.assert_allclose(out, 8.0 * data, atol=1e-5)
    assert sum(fn._cache_size()
               for fn in c._block_fn_cache.values()) == base, "retrace!"
