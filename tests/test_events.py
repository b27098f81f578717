"""Event system tests: ADSR gate behavior, sample-accurate mid-block
events, MIDI chain, voice allocator demux.

Mirrors the reference's envelope unit tests (adsr.rs:308-387), event
sub-block timing (tests/block_processing_test.rs), MIDI parsing
(midi.rs:232-274) and voice stealing (voice_allocator.rs:152-259).
"""

import numpy as np
import pytest

from oscen_tpu import (AdsrEnvelope, Gain, Graph, MidiParser,
                       MidiVoiceHandler, NoteOffEvent, NoteOnEvent,
                       Oscillator, VoiceAllocator, midi_note_to_freq,
                       raw_midi_event)


def adsr_graph(attack=0.01, decay=0.02, sustain=0.6, release=0.05):
    g = Graph("Env")
    g.input("gate", "event")
    g.output("out", "stream")
    env = g.add("env", AdsrEnvelope(attack, decay, sustain, release))
    g.connect("gate", env.gate)
    g.connect(env.output, "out")
    return g


def test_adsr_reaches_sustain():
    """reference adsr.rs:313-334"""
    c = adsr_graph(0.01, 0.02, 0.6, 0.05).compile(48000.0, block_size=480)
    c.queue_event("gate", 0, 1.0)
    out = c.render_mono(4800)  # 100 ms
    assert 0.5 <= out[-1] <= 0.65, out[-1]


def test_adsr_release_returns_to_zero():
    """reference adsr.rs:337-363 (zero attack/decay shortcut)"""
    c = adsr_graph(0.0, 0.0, 0.8, 0.01).compile(48000.0, block_size=100)
    c.queue_event("gate", 0, 1.0)
    a = c.render_mono(100)
    assert abs(a[0] - 0.8) < 1e-6  # zero attack/decay: level = sustain
    c.queue_event("gate", 0, 0.0)
    b = c.render_mono(4800)
    assert b[-1] <= 0.01


def test_adsr_velocity_scales_output():
    """reference adsr.rs:366-387"""
    c = adsr_graph(0.0, 0.0, 1.0, 0.01).compile(48000.0, block_size=100)
    c.queue_event("gate", 0, 0.5)
    out = c.render_mono(100)
    assert 0.45 <= out[-1] <= 0.55


def test_event_is_sample_accurate_mid_block():
    """A gate at frame 100 of a 512 block: output must be exactly 0 before
    frame 100 and rise at it (sub-block splitting semantics)."""
    c = adsr_graph(0.001, 0.1, 0.5, 0.1).compile(48000.0, block_size=512)
    c.queue_event("gate", 100, 1.0)
    out = np.asarray(c.process_block()["out"])
    assert np.all(out[:100] == 0.0)
    assert out[100] > 0.0


def test_event_block_size_invariance():
    """Same absolute event time across different block sizes ->
    bit-identical output (tests/block_processing_test.rs)."""
    def run(block_size):
        c = adsr_graph(0.005, 0.05, 0.5, 0.02).compile(
            48000.0, block_size=block_size)
        outs = []
        pos = 0
        total = 2048
        gate_at = 700
        while pos < total:
            n = min(block_size, total - pos)
            if pos <= gate_at < pos + n:
                c.queue_event("gate", gate_at - pos, 1.0)
            outs.append(np.asarray(c.process_block(n)["out"]))
            pos += n
        return np.concatenate(outs)

    np.testing.assert_array_equal(run(512), run(128))


def test_midi_chain_end_to_end():
    """raw MIDI -> parser -> voice handler -> envelope*osc
    (the electric-piano event flow, SURVEY §3.4)."""
    g = Graph("Midi")
    g.input("midi_in", "event")
    g.output("out", "stream")
    parser = g.add("parser", MidiParser())
    handler = g.add("handler", MidiVoiceHandler())
    env = g.add("env", AdsrEnvelope(0.001, 0.01, 0.8, 0.05))
    osc = g.add("osc", Oscillator.sine(440.0, 1.0))
    amp = g.add("amp", Gain(1.0))
    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, handler.note_on)
    g.connect(parser.note_off, handler.note_off)
    g.connect(handler.gate, env.gate)
    g.connect(handler.frequency, osc.frequency)
    g.connect(osc.output, amp.input)
    g.connect(env.output, amp.gain)
    g.connect(amp.output, "out")

    c = g.compile(48000.0, block_size=480)
    # note on A5 (880 Hz), velocity 100
    c.queue_event("midi_in", 0, raw_midi_event([0x90, 81, 100]))
    out = c.render_mono(4800)
    assert np.abs(out).max() > 0.3
    # dominant frequency ~880
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak = np.fft.rfftfreq(len(out), 1 / 48000.0)[spec.argmax()]
    assert abs(peak - 880.0) < 15.0, peak
    # note off -> envelope releases to ~0
    c.queue_event("midi_in", 0, raw_midi_event([0x80, 81, 0]))
    tail = c.render_mono(9600)
    assert np.abs(tail[-100:]).max() < 1e-3


def test_midi_note_to_freq():
    assert midi_note_to_freq(69) == 440.0
    assert abs(midi_note_to_freq(60) - 261.626) < 0.01
    assert abs(midi_note_to_freq(81) - 880.0) < 0.01


def test_midi_parser_semantics():
    assert MidiParser.parse_bytes([0x90, 60, 100]) == NoteOnEvent(
        60, pytest.approx(100 / 127.0, abs=1e-6))
    assert MidiParser.parse_bytes([0x80, 60, 0]) == NoteOffEvent(60)
    # note-on velocity 0 is note-off (midi.rs:159-162)
    assert MidiParser.parse_bytes([0x90, 60, 0]) == NoteOffEvent(60)
    assert MidiParser.parse_bytes([0xB0, 1, 1]) is None


def test_voice_allocator_lru_and_stealing():
    """reference voice_allocator.rs:152-259"""
    a = VoiceAllocator(4)
    assert [a.allocate_voice(n) for n in (60, 64, 67, 72)] == [0, 1, 2, 3]
    # steal oldest
    assert a.allocate_voice(76) == 0
    a.reset()
    a.allocate_voice(60); a.allocate_voice(64)
    a.allocate_voice(67); a.allocate_voice(72)
    a.release_voice(1)
    # prefer released over held
    assert a.allocate_voice(76) == 1
    a2 = VoiceAllocator(2)
    assert a2.allocate_voice(60) == 0
    a2.release_voice(0)
    assert a2.allocate_voice(64) == 1  # released voice keeps sounding
    assert a2.allocate_voice(67) == 0  # now steal the released one


def test_polyphonic_voice_demux():
    """allocator -> per-voice handlers -> per-voice envelopes -> fan-in."""
    N = 4
    g = Graph("Poly")
    g.input("midi_in", "event")
    g.output("out", "stream")
    parser = g.add("parser", MidiParser())
    alloc = g.add("alloc", VoiceAllocator(N))
    handlers = g.add("handlers", MidiVoiceHandler(), count=N)
    envs = g.add("envs", AdsrEnvelope(0.001, 0.01, 1.0, 0.02), count=N)
    oscs = g.add("oscs", Oscillator.sine(440.0, 0.25), count=N)
    mix = g.add("mix", Gain(1.0))
    g.connect("midi_in", parser.midi_in)
    g.connect(parser.note_on, alloc.note_on)
    g.connect(parser.note_off, alloc.note_off)
    g.connect(alloc.voices, handlers.note_on)
    g.connect(alloc.voices, handlers.note_off)
    g.connect(handlers.gate, envs.gate)
    g.connect(handlers.frequency, oscs.frequency)
    # per-voice amplitude = env * osc via per-voice gain is implicit:
    # multiply in an expression then fan-in sum
    g.connect(oscs.output * envs.output, mix.input)
    g.connect(mix.output, "out")

    c = g.compile(48000.0, block_size=480)
    # chord: C4 + E4
    c.queue_event("midi_in", 0, raw_midi_event([0x90, 60, 127]))
    c.queue_event("midi_in", 0, raw_midi_event([0x90, 64, 127]))
    out = c.render_mono(4800)
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), 1 / 48000.0)
    c4 = spec[(freqs > 250) & (freqs < 275)].max()
    e4 = spec[(freqs > 320) & (freqs < 340)].max()
    noise = spec[(freqs > 2000)].max()
    assert c4 > 10 * noise and e4 > 10 * noise


def test_event_fanin_last_write_wins():
    """Multiple event edges into one endpoint: each edge's copy REPLACES
    the queue, so only the last edge's events land (reference
    tests/event_fanin_unchanged.rs; AccumulateEndpoints delegates events
    to connect)."""
    from oscen_tpu import EventPassthrough, Graph, AdsrEnvelope
    import numpy as np

    g = Graph("LWW")
    g.input("g1", "event")
    g.input("g2", "event")
    g.output("out", "stream")
    p1 = g.add("p1", EventPassthrough())
    p2 = g.add("p2", EventPassthrough())
    env = g.add("env", AdsrEnvelope(0.0, 0.0, 1.0, 0.001))
    g.connect("g1", p1.input)
    g.connect("g2", p2.input)
    g.connect(p1.output, env.gate)   # first edge
    g.connect(p2.output, env.gate)   # LAST edge wins
    g.connect(env.output, "out")
    c = g.compile(48000.0, block_size=64)
    # g1 carries velocity 1.0; g2 carries velocity 0.25 -> only 0.25 lands
    c.queue_event("g1", 0, 1.0)
    c.queue_event("g2", 0, 0.25)
    out = c.render_mono(64)
    assert abs(out[-1] - 0.25) < 1e-6, out[-1]
    # and when the last edge is EMPTY, it clears the queue entirely
    c.init()
    c.queue_event("g1", 0, 1.0)
    out = c.render_mono(64)
    assert np.all(out == 0.0), out[:4]


def test_step_value_staging_parity(monkeypatch):
    """StepValue staging (note-on frequency staged as base/target/offset
    and reconstructed on device — graph/node.py StepValue) is
    bit-identical to the host-materialized [B, C] arrays, across:
    mid-block note-ons, several blocks with and without events (the
    per-instance host memo), two note-ons to ONE voice in one block
    (the multi-step [B] fallback), and note-offs."""
    def build():
        N = 4
        g = Graph("PolyStep")
        g.input("midi_in", "event")
        g.output("out", "stream")
        parser = g.add("parser", MidiParser())
        alloc = g.add("alloc", VoiceAllocator(N))
        handlers = g.add("handlers", MidiVoiceHandler(), count=N)
        envs = g.add("envs", AdsrEnvelope(0.001, 0.01, 1.0, 0.02), count=N)
        oscs = g.add("oscs", Oscillator.sine(440.0, 0.25), count=N)
        mix = g.add("mix", Gain(1.0))
        g.connect("midi_in", parser.midi_in)
        g.connect(parser.note_on, alloc.note_on)
        g.connect(parser.note_off, alloc.note_off)
        g.connect(alloc.voices, handlers.note_on)
        g.connect(alloc.voices, handlers.note_off)
        g.connect(handlers.gate, envs.gate)
        g.connect(handlers.frequency, oscs.frequency)
        g.connect(oscs.output * envs.output, mix.input)
        g.connect(mix.output, "out")
        return g

    def run(step_staging):
        monkeypatch.setenv("OSCEN_STEP_STAGING",
                           "1" if step_staging else "0")
        c = build().compile(48000.0, block_size=128)
        chunks = []
        # block 0: two mid-block note-ons (different voices)
        c.queue_event("midi_in", 17, raw_midi_event([0x90, 60, 100]))
        c.queue_event("midi_in", 90, raw_midi_event([0x90, 64, 90]))
        chunks.append(c.render_mono(128))
        # block 1: no events (memo + steady staging)
        chunks.append(c.render_mono(128))
        # block 2: retrigger voice 0 TWICE in one block (steals voice 0
        # both times after 4 voices? no — 2 free voices remain; instead
        # note-off + immediate note-on re-strikes the same voice) ->
        # exercises the multi-step fallback when both land on one voice
        c.queue_event("midi_in", 10, raw_midi_event([0x90, 72, 80]))
        c.queue_event("midi_in", 11, raw_midi_event([0x90, 76, 80]))
        chunks.append(c.render_mono(128))
        # block 3: all four voices held; a fifth note STEALS the oldest
        # (voice 0) mid-block, then a sixth steals voice 1 — two steps
        # land on two voices; then note-off one of them
        c.queue_event("midi_in", 20, raw_midi_event([0x90, 48, 70]))
        c.queue_event("midi_in", 20, raw_midi_event([0x90, 50, 70]))
        c.queue_event("midi_in", 100, raw_midi_event([0x80, 50, 0]))
        chunks.append(c.render_mono(128))
        # block 4: steal ONE voice twice in one block (5th+6th note-on
        # with all voices held and none released -> LRU steals two
        # different voices; to hit one voice twice, off+on+on same note
        # path) — simplest guaranteed double-step: note-on twice routed
        # to the same voice via allocator retrigger of an existing note
        c.queue_event("midi_in", 5, raw_midi_event([0x90, 48, 70]))
        c.queue_event("midi_in", 99, raw_midi_event([0x90, 48, 75]))
        chunks.append(c.render_mono(128))
        chunks.append(c.render_mono(128))
        return np.concatenate(chunks)

    a = run(True)
    b = run(False)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_event_staging_parity(monkeypatch, seed):
    """Fuzz the round-5 control plane: random MIDI streams (note-ons,
    note-offs, retriggers, steals, multiple events per block, empty
    blocks) rendered with the production staging (StepValue + packed
    single-transfer) must be BIT-identical to the legacy per-array,
    host-materialized staging."""
    def build():
        N = 4
        g = Graph("FuzzStage")
        g.input("midi_in", "event")
        g.output("out", "stream")
        parser = g.add("parser", MidiParser())
        alloc = g.add("alloc", VoiceAllocator(N))
        handlers = g.add("handlers", MidiVoiceHandler(), count=N)
        envs = g.add("envs", AdsrEnvelope(0.002, 0.01, 0.8, 0.03), count=N)
        oscs = g.add("oscs", Oscillator.sine(440.0, 0.25), count=N)
        mix = g.add("mix", Gain(1.0))
        g.connect("midi_in", parser.midi_in)
        g.connect(parser.note_on, alloc.note_on)
        g.connect(parser.note_off, alloc.note_off)
        g.connect(alloc.voices, handlers.note_on)
        g.connect(alloc.voices, handlers.note_off)
        g.connect(handlers.gate, envs.gate)
        g.connect(handlers.frequency, oscs.frequency)
        g.connect(oscs.output * envs.output, mix.input)
        g.connect(mix.output, "out")
        return g

    B = 128
    rng = np.random.default_rng(seed)
    script = []  # per block: list of (offset, raw bytes)
    held = []
    for _ in range(12):
        evs = []
        for _ in range(int(rng.integers(0, 4))):
            off = int(rng.integers(0, B))
            if held and rng.random() < 0.4:
                note = held.pop(int(rng.integers(0, len(held))))
                evs.append((off, [0x80, note, 0]))
            else:
                note = int(rng.integers(40, 90))
                vel = int(rng.integers(1, 128))
                evs.append((off, [0x90, note, vel]))
                held.append(note)
        script.append(evs)

    def run(production):
        monkeypatch.setenv("OSCEN_STEP_STAGING",
                           "1" if production else "0")
        monkeypatch.setenv("OSCEN_PACKED_STAGING",
                           "1" if production else "0")
        c = build().compile(48000.0, block_size=B, mode="block")
        chunks = []
        for evs in script:
            for off, data in evs:
                c.queue_event("midi_in", off, raw_midi_event(data))
            chunks.append(c.render_mono(B))
        return np.concatenate(chunks)

    a = run(True)
    b = run(False)
    np.testing.assert_array_equal(a, b)
