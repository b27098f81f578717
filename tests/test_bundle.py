"""Deployable bundle (utils/bundle.py) — the xtask-bundling analogue:
save a compiled graph mid-performance, reload it elsewhere (no build
code), continue bit-exactly."""

import json
import os

import numpy as np
import pytest

from oscen_tpu import Graph, PolyBlepOscillator, TptFilter, raw_midi_event
from oscen_tpu.models.electric_piano import build_electric_piano
from oscen_tpu.utils.bundle import load_bundle, save_bundle


def test_bundle_roundtrip_mid_performance(tmp_path):
    g = build_electric_piano(4)
    s = g.compile(48000.0, block_size=256, mode="block")
    s.queue_event("midi_in", 0, raw_midi_event([0x90, 60, 100]))
    s.queue_event("midi_in", 0, raw_midi_event([0x90, 67, 90]))
    s.render(512)  # play into the middle of the notes
    s.set_value("vibrato_speed", 7.5)
    # leave an un-consumed queued event to test pending-event transport
    s.queue_event("midi_in", 3, raw_midi_event([0x80, 60, 0]))

    p = os.path.join(tmp_path, "ep")
    save_bundle(s, p)
    s2 = load_bundle(p)

    a = s.render(1024)["out"]
    b = s2.render(1024)["out"]
    np.testing.assert_array_equal(a, b)


def test_bundle_manifest_contents(tmp_path):
    g = Graph("Mani")
    from oscen_tpu.core.types import ParamSpec
    g.input("cutoff", "value", default=900.0,
            spec=ParamSpec(min=20.0, max=20000.0, log=True, unit="Hz"))
    g.output("out", "stream")
    o = g.add("osc", PolyBlepOscillator.saw(220.0, 0.5))
    f = g.add("f", TptFilter(900.0, 0.707))
    g.connect("cutoff", f.cutoff)
    g.connect(o.output, f.input)
    g.connect(f.output, "out")
    s = g.compile(44100.0, block_size=128)
    p = os.path.join(tmp_path, "m")
    save_bundle(s, p)
    m = json.load(open(os.path.join(p, "manifest.json")))
    assert m["graph"] == "Mani"
    assert m["sample_rate"] == 44100.0
    assert m["block_size"] == 128
    assert {i["name"] for i in m["inputs"]} == {"cutoff"}
    assert m["params"]["cutoff"]["log"] is True
    assert m["params"]["cutoff"]["unit"] == "Hz"
    assert any(n.startswith("TptFilter") for n in m["nodes"])


def test_bundle_format_version_checked(tmp_path):
    g = Graph("V")
    g.output("out", "stream")
    o = g.add("osc", PolyBlepOscillator.saw(220.0, 0.5))
    g.connect(o.output, "out")
    s = g.compile(44100.0, block_size=64)
    p = os.path.join(tmp_path, "v")
    save_bundle(s, p)
    m = json.load(open(os.path.join(p, "manifest.json")))
    m["format"] = 999
    json.dump(m, open(os.path.join(p, "manifest.json"), "w"))
    with pytest.raises(ValueError, match="bundle format"):
        load_bundle(p)
