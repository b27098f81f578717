"""StreamingHost: callback-paced realtime loop with live events
(the cpal-host analogue, reference examples/src/bin/simple_synth.rs:30-57).
"""

import numpy as np

from oscen_tpu import raw_midi_event
from oscen_tpu.models.poly_synth import build_poly_synth
from oscen_tpu.utils.host import StreamingHost


def test_streaming_host_sustains_realtime_with_live_events():
    synth = build_poly_synth(4).compile(48000.0, block_size=128,
                                        mode="block")
    # warm both jit variants (steady + event-carrying) before pacing
    synth.queue_event("midi_in", 0, raw_midi_event([0x90, 60, 100]))
    synth.process_block()
    synth.process_block()
    synth.init()

    host = StreamingHost(synth, realtime=False)
    fired = {"on": False, "off": False}

    def on_block(h, t):
        if not fired["on"] and t >= 0.05:
            h.compiled.queue_event("midi_in", 3,
                                   raw_midi_event([0x90, 69, 110]))
            fired["on"] = True
        if not fired["off"] and t >= 0.35:
            h.compiled.queue_event("midi_in", 0,
                                   raw_midi_event([0x80, 69, 0]))
            fired["off"] = True

    audio = host.run(0.5, on_block=on_block)
    r = host.report()
    assert r["blocks"] == int(round(0.5 * 48000 / 128))
    assert r["sustained_rtf"] > 1.0, r
    assert r["staging_ms_median"] > 0.0
    assert np.isfinite(audio).all()
    # the live note actually sounded: audible A4 after the on, quiet before
    assert np.abs(audio[: int(0.04 * 48000)]).max() < 1e-6
    assert np.abs(audio[int(0.1 * 48000):int(0.3 * 48000)]).max() > 0.05


def test_streaming_host_deadline_accounting():
    """With realtime pacing on a trivially fast graph, deadline misses
    stay bounded and the report carries all fields."""
    synth = build_poly_synth(2).compile(48000.0, block_size=512,
                                        mode="block")
    synth.process_block()  # warm
    host = StreamingHost(synth, realtime=True)
    host.run(0.25, collect=False)
    r = host.report()
    for key in ("blocks", "block_period_ms", "staging_ms_median",
                "block_ms_median", "deadline_misses", "worst_margin_ms",
                "sustained_rtf"):
        assert key in r
    # 10.7 ms blocks on a warm graph: the loop keeps up
    assert r["deadline_misses"] <= r["blocks"] // 4, r
