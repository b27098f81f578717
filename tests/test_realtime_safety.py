"""Realtime-safety analogue: no retracing / recompilation in the render
loop.

The reference's RT-safety story is allocation tracking on the audio thread
(tests/realtime_safety.rs with assert_no_alloc).  The XLA equivalent: once
warmed up, steady-state block processing must never trigger a new trace or
compilation — parameter changes, event arrivals (within a capacity class)
and asset hot-swaps all reuse the compiled executable.
"""

import numpy as np
import pytest

from oscen_tpu import AudioAsset, Convolver, Graph, raw_midi_event
from oscen_tpu.models.poly_synth import build_poly_synth


def _total_cache_size(compiled):
    return sum(fn._cache_size() for fn in
               compiled._block_fn_cache.values())


def test_steady_state_never_recompiles():
    s = build_poly_synth(4).compile(48000.0, block_size=128)
    # touch the live param BEFORE warmup: a never-touched param stages
    # as a trace-time literal, so the FIRST set_value moves it to the
    # runtime [1] staging class (one bounded retrace — same class as
    # idle-[1] vs ramping-[B])
    s.set_value("cutoff", 800.0)
    s.queue_event("midi_in", 0, raw_midi_event([0x90, 60, 100]))
    s.process_block()          # event-block (packed) variant compiles
    s.process_block()          # steady variant compiles
    base = _total_cache_size(s)
    for i in range(10):
        # live param changes share the steady variant's staging shapes
        # (param-only blocks take the per-array path, not the packed
        # event path) — no retrace
        s.set_value("cutoff", 1000.0 + 100.0 * i)
        s.process_block()
    assert _total_cache_size(s) == base, "steady-state retrace!"
    # and the steady variant is still warm
    s.process_block()
    assert _total_cache_size(s) == base, "steady variant lost!"


def test_event_blocks_reuse_capacity_classes():
    """Event buffers pad to power-of-two capacities so event counts in
    the same class reuse the compiled variant.  Host-value staging adds
    exactly one more bounded shape class: blocks where no note-on lands
    stage handler frequency as [1, C] (block-constant — lets the chain
    kernels hoist per-sample dt), so a note-on block and a
    no-note-on block compile one variant each and both stay cached
    (the same two-class bound as ramping vs idle params)."""
    s = build_poly_synth(4).compile(48000.0, block_size=128)
    s.queue_event("midi_in", 0, raw_midi_event([0x90, 60, 100]))
    s.process_block()
    base = _total_cache_size(s)
    # note-off only -> frequency stages [1, C] -> ONE new variant
    s.queue_event("midi_in", 5, raw_midi_event([0x80, 60, 0]))
    s.process_block()
    assert _total_cache_size(s) <= base + 1
    ceiling = _total_cache_size(s)
    # both classes now warm: further events in either class reuse
    s.queue_event("midi_in", 2, raw_midi_event([0x90, 64, 90]))
    s.process_block()
    s.queue_event("midi_in", 9, raw_midi_event([0x80, 64, 0]))
    s.process_block()
    assert _total_cache_size(s) == ceiling


def test_asset_hot_swap_does_not_retrace():
    """Publishing a new IR replaces state functionally: same shapes, same
    executable (the reference's allocation-free swap, realtime_safety.rs)."""
    g = Graph("RT")
    g.input("x", "stream")
    g.output("out", "stream")
    g.external("ir")
    cv = g.add("c", Convolver(ir=[1.0], max_ir_len=64))
    g.connect("ir", cv.ir)
    g.connect("x", cv.input)
    g.connect(cv.output, "out")
    c = g.compile(48000.0, block_size=64)
    x = np.ones(64, np.float32)
    c.process_block(stream_inputs={"x": x})
    base = _total_cache_size(c)
    for k in range(3):
        c.publish_asset("ir", AudioAsset.from_samples(
            np.full(10, 0.5 * (k + 1), np.float32), 48000))
        c.process_block(stream_inputs={"x": x})
    assert _total_cache_size(c) == base


def test_staging_cache_refreshes_after_events():
    """steady -> event -> steady: the post-event steady blocks must see
    the event's effect on host-node outputs (a stale staging cache once
    kept serving pre-event handler frequencies)."""
    import jax
    from oscen_tpu.models.electric_piano import build_electric_piano
    from oscen_tpu import raw_midi_event

    def run(warm_steady):
        c = build_electric_piano(8).compile(48000.0, block_size=128,
                                            mode="block")
        c.queue_event("midi_in", 0, raw_midi_event([0x90, 60, 100]))
        c.process_block()
        if warm_steady:           # populate the staging cache
            for _ in range(3):
                c.process_block()
        else:
            for _ in range(3):
                c.queue_event("midi_in", 0,
                              raw_midi_event([0xA0, 0, 0]))  # dirty, noop
                c.process_block()
        # the event that must invalidate any cached staging
        c.queue_event("midi_in", 0, raw_midi_event([0x90, 45, 100]))
        c.process_block()
        return np.concatenate([np.asarray(c.process_block()["out"])
                               for _ in range(3)])

    a = run(False)
    b = run(True)
    np.testing.assert_array_equal(a, b)


def test_literal_specialization_refreshes_on_first_set_value():
    """Regression (round-5 review): every cached execution wrapper —
    the packed event-block fn, render_steady, steady_checksum — must be
    keyed on the literal-param specialization set, or the first
    set_value() on a never-touched param would keep serving the stale
    specialized program on those paths."""
    import numpy as np
    from oscen_tpu import (AdsrEnvelope, Gain, Graph, MidiParser,
                           MidiVoiceHandler, MulAdd, Oscillator,
                           VoiceAllocator, raw_midi_event)

    def build():
        g = Graph("LitRefresh")
        g.input("midi_in", "event")
        g.input("mod_amount", "value", default=0.0)  # never touched ->
        g.output("out", "stream")                    # literal-0 folding
        parser = g.add("parser", MidiParser())
        alloc = g.add("alloc", VoiceAllocator(2))
        handlers = g.add("handlers", MidiVoiceHandler(), count=2)
        envs = g.add("envs", AdsrEnvelope(0.001, 0.01, 0.8, 0.02),
                     count=2)
        oscs = g.add("oscs", Oscillator.sine(440.0, 0.3), count=2)
        # mod = env*amount + 1.0 scales the osc: with amount untouched at
        # 0.0 the whole modulation folds to the constant 1.0
        mod = g.add("mod", MulAdd(0.0, 1.0), count=2)
        mix = g.add("mix", Gain(1.0))
        g.connect("midi_in", parser.midi_in)
        g.connect(parser.note_on, alloc.note_on)
        g.connect(parser.note_off, alloc.note_off)
        g.connect(alloc.voices, handlers.note_on)
        g.connect(alloc.voices, handlers.note_off)
        g.connect(handlers.gate, envs.gate)
        g.connect(handlers.frequency, oscs.frequency)
        g.connect(envs.output, mod.input)
        g.connect("mod_amount", mod.gain)
        g.connect(oscs.output * mod.output * envs.output, mix.input)
        g.connect(mix.output, "out")
        return g

    def run(touch_first):
        s = build().compile(48000.0, block_size=128, mode="block")
        if touch_first:
            s.set_value("mod_amount", 0.0)  # touched, same value
        # event block exercises the PACKED path with the literal set
        s.queue_event("midi_in", 3, raw_midi_event([0x90, 60, 100]))
        a = [s.render_mono(128)]
        # first set_value on the untouched param: all cached wrappers
        # must refresh to the unspecialized program
        s.set_value("mod_amount", 2.0)
        s.queue_event("midi_in", 5, raw_midi_event([0x90, 64, 90]))
        a.append(s.render_mono(128))        # packed event block
        a.append(s.render_mono(128))        # steady block
        ck = float(s.steady_checksum(2))
        a.append(s.render_mono(256))
        return np.concatenate(a), ck

    a, ck_a = run(False)   # literal class engaged, then handed off
    b, ck_b = run(True)    # runtime staging throughout
    np.testing.assert_array_equal(a, b)
    assert ck_a == ck_b, (ck_a, ck_b)
