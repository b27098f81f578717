"""Native host runtime (C++): build, load, and parity with the Python
fallbacks (MIDI parse, LRU voice allocation, offline resampler)."""

import numpy as np
import pytest

from oscen_tpu.utils import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native host runtime not built (no g++?)")
    return True


def test_native_midi_parse_parity(lib_available):
    from oscen_tpu.core.events import NoteOffEvent, NoteOnEvent
    from oscen_tpu.nodes.midi import MidiParser

    cases = [[0x90, 60, 100], [0x80, 60, 0], [0x90, 60, 0],
             [0xB0, 1, 1], [0x90, 127, 127], [0xF8]]
    for c in cases:
        n = native.parse_midi(c)
        p = MidiParser.parse_bytes(c)
        if p is None:
            assert n == ("none",) or n is None
        elif isinstance(p, NoteOnEvent):
            assert n[0] == "on" and n[1] == p.note
            assert abs(n[2] - p.velocity) < 1e-6
        elif isinstance(p, NoteOffEvent):
            assert n[0] == "off" and n[1] == p.note


def test_native_allocator_parity(lib_available):
    from oscen_tpu.nodes.voice_allocator import VoiceAllocator

    rng = np.random.default_rng(0)
    py = VoiceAllocator(4)
    nat = native.NativeAllocator(4)
    held = []
    for _ in range(200):
        if held and rng.random() < 0.4:
            note = held.pop(rng.integers(len(held)))
            a = py.find_voice_for_note(note)
            if a is not None:
                py.release_voice(a)
            b = nat.note_off(note)
            assert (a if a is not None else -1) == b
        else:
            note = int(rng.integers(30, 90))
            if note in held:
                continue
            held.append(note)
            assert py.allocate_voice(note) == nat.note_on(note)


def test_native_resampler_parity(lib_available):
    from oscen_tpu.utils.native import resample_channel_native

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, 3000).astype(np.float32)
    for src, dst in [(48000, 44100), (44100, 48000), (48000, 16000)]:
        a = resample_channel_native(x, src, dst)
        # NumPy fallback path (bypass native dispatch)
        import oscen_tpu.ops.offline_resample as orx
        import numpy as _np
        ratio = dst / src
        # call the tail of the python implementation by temporarily
        # disabling the native library
        lib = native._LIB
        native._LIB = None
        native._TRIED = True
        try:
            b = orx.resample_channel(x, src, dst)
        finally:
            native._LIB = lib
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 1e-4, np.abs(a - b).max()


def test_native_resampler_quality(lib_available):
    """The native path passes the same quality bar as the reference's
    tests (constant preserved, sine preserved)."""
    from oscen_tpu.utils.native import resample_channel_native

    x = np.full(500, 0.7, np.float32)
    out = resample_channel_native(x, 48000, 44100)
    np.testing.assert_allclose(out[36:-36], 0.7, atol=1e-3)


def test_native_wav_decoder_parity_and_float32(tmp_path):
    """The native data-loader decodes PCM16 identically to the stdlib
    path and additionally reads IEEE-float32 WAVs (which the stdlib
    ``wave`` module rejects)."""
    import struct
    import numpy as np
    from oscen_tpu import AudioAsset
    from oscen_tpu.utils import native

    if not native.available():
        import pytest
        pytest.skip("native runtime unavailable")

    # PCM16 stereo round-trip: native == stdlib
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.9, 0.9, (1000, 2)).astype(np.float32)
    p16 = str(tmp_path / "a16.wav")
    AudioAsset.write_wav(p16, audio, 44100)
    data, ch, rate = native.decode_wav_native(p16)
    assert (ch, rate) == (2, 44100)
    a = AudioAsset.from_wav(p16)          # uses the native path
    assert a.channels == 2 and a.sample_rate == 44100
    # stdlib reference decode
    import wave
    with wave.open(p16, "rb") as w:
        raw = w.readframes(w.getnframes())
    ref = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    np.testing.assert_array_equal(data, ref)

    # float32 WAV (hand-built; stdlib wave cannot read format 3)
    x = np.sin(np.linspace(0, 20, 500)).astype(np.float32)
    pf = str(tmp_path / "f32.wav")
    payload = x.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 4, 4, 32)
    with open(pf, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8
                                      + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    a = AudioAsset.from_wav(pf)
    assert a.sample_rate == 48000 and a.channels == 1
    np.testing.assert_array_equal(a.channel(0), x)

    # corrupt file raises AssetError through the public API
    pc = str(tmp_path / "bad.wav")
    open(pc, "wb").write(b"RIFFxxxxJUNK")
    import pytest
    from oscen_tpu import AssetError
    with pytest.raises(AssetError):
        AudioAsset.from_wav(pc)
