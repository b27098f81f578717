"""Pivot flagship model (reference examples/pivot/).

Mirrors the reference's app semantics: 8-voice 3-operator FM with the
route crossfade pivoting OP3's modulation target, envelopes applied via
external VCAs (pre-envelope operator self-feedback — the structural
difference from fm-synth, pivot/src/fm_operator.rs vs
fm-synth/src/nodes/fm_operator.rs).
"""

import numpy as np
import pytest

from oscen_tpu import raw_midi_event
from oscen_tpu.models.pivot import build_pivot, build_pivot_voice


def _spectrum(x, sr=48000.0):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    return freqs, spec


def test_pivot_voice_block_matches_sample():
    """Block mode equals the per-sample schedule (the reference's only
    schedule) within tight tolerance."""
    outs = {}
    for mode in ("sample", "block"):
        c = build_pivot_voice().compile(48000.0, block_size=256, mode=mode)
        c.set_value("op3_feedback", 0.4)
        c.set_value("route", 0.5)
        c.queue_event("gate", 10, 1.0)
        outs[mode] = c.render_mono(4096)
    a, b = outs["sample"], outs["block"]
    rms = np.sqrt(np.mean((a - b) ** 2))
    assert rms < 1e-5, rms
    assert np.abs(a).max() > 0.01


def test_pivot_route_pivots_modulation():
    """route=0 sends OP3 into OP2 (deeper stacked modulation -> brighter,
    more sidebands); route=1 sends OP3 straight to the carrier.  The two
    settings must produce measurably different spectra, and both must
    differ from OP3 silenced."""
    def render(route, op3_level=0.9):
        c = build_pivot_voice().compile(48000.0, block_size=512,
                                        mode="block")
        c.set_value("route", route)
        c.set_value("op3_level", op3_level)
        c.set_value("cutoff", 20000.0)  # filter out of the way
        c.queue_event("gate", 0, 1.0)
        return c.render_mono(8192)

    a = render(0.0)
    b = render(1.0)
    silent3 = render(0.0, op3_level=0.0)
    assert not np.allclose(a, b, atol=1e-4)
    assert not np.allclose(a, silent3, atol=1e-4)
    # with OP3 silenced the route setting is irrelevant
    silent3b = None
    c = build_pivot_voice().compile(48000.0, block_size=512, mode="block")
    c.set_value("route", 1.0)
    c.set_value("op3_level", 0.0)
    c.set_value("cutoff", 20000.0)
    c.queue_event("gate", 0, 1.0)
    silent3b = c.render_mono(8192)
    np.testing.assert_allclose(silent3, silent3b, atol=1e-6)


def test_pivot_vca_prefeedback_semantics():
    """Pivot's operator self-feedback uses the RAW sine (envelope applied
    outside through the VCA): with a decaying envelope and feedback on,
    the operator's spectral shape must NOT thin out the way the fm-synth
    (post-envelope feedback) voice does.  Concretely: at envelope level
    0.5, pivot's op3 feedback term is unchanged while fm-synth's halves.
    We check the structural property cheaply: pivot with env sustain 0.5
    != fm-synth voice with identical settings."""
    from oscen_tpu.models.fm_synth import build_fm_voice

    def render(build, names):
        c = build().compile(48000.0, block_size=512, mode="block")
        c.set_value("op3_feedback", 0.9)
        c.set_value("op3_level", 1.0)
        c.set_value("route", 1.0)       # OP3 straight to carrier
        c.set_value(names["cutoff"], 20000.0)
        c.set_value("op3_sustain", 0.5)
        c.queue_event("gate", 0, 1.0)
        return c.render_mono(8192)

    a = render(build_pivot_voice, {"cutoff": "cutoff"})
    b = render(lambda: build_fm_voice(fused=False),
               {"cutoff": "filter_cutoff"})
    # same settings, structurally different voices -> different audio
    assert np.sqrt(np.mean((a - b) ** 2)) > 1e-3


def test_pivot_chord_renders_all_voices():
    c = build_pivot(8).compile(48000.0, block_size=480, mode="block")
    notes = (48, 60, 64, 67)
    for n in notes:
        c.queue_event("midi_in", 0, raw_midi_event([0x90, n, 100]))
    out = c.render_mono(24000)
    assert np.isfinite(out).all()
    freqs, spec = _spectrum(out[4800:])
    noise = spec[freqs > 6000].max()
    for n in notes:
        f0 = 440.0 * 2 ** ((n - 69) / 12)
        peak = spec[(freqs > f0 * 0.97) & (freqs < f0 * 1.03)].max()
        assert peak > 3 * noise, (n, f0, peak, noise)


def test_pivot_block_size_invariance():
    def run(bs):
        c = build_pivot(4).compile(48000.0, block_size=bs, mode="block")
        out = []
        pos = 0
        while pos < 2048:
            n = min(bs, 2048 - pos)
            if pos <= 100 < pos + n:
                c.queue_event("midi_in", 100 - pos,
                              raw_midi_event([0x90, 60, 100]))
            out.append(np.asarray(c.process_block(n)["audio_out"]))
            pos += n
        return np.concatenate(out)
    np.testing.assert_array_equal(run(512), run(128))
