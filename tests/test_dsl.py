"""Textual graph DSL: the reference's graph! syntax parsed at runtime.

Mirrors the reference macro integration style (oscen-lib/tests/*.rs compile
real graph! bodies and assert runtime behavior).
"""

import numpy as np
import pytest

from oscen_tpu import GraphError
from oscen_tpu.graph.dsl import parse_graph

README_SYNTH = """
    name: Synth;

    input mod_freq: value = 5.0;
    input mod_depth: value = 0.2;
    input carrier_freq: value = 440.0;
    input cutoff: value = 1200.0;

    output audio_out: stream;

    nodes {
        modulator = PolyBlepOscillator::sine(5.0, 0.2);
        carrier = PolyBlepOscillator::saw(440.0, 0.5);
        filter = TptFilter::new(1200.0, 0.707);
    }

    connections {
        mod_freq -> modulator.frequency;
        mod_depth -> modulator.amplitude;
        carrier_freq -> carrier.frequency;
        cutoff -> filter.cutoff;
        modulator.output -> carrier.frequency_mod;
        carrier.output -> filter.input;
        filter.output -> audio_out;
    }
"""


def test_readme_synth_via_dsl_matches_builder():
    import sys
    sys.path.insert(0, "tests")
    from test_graph_basic import build_readme_synth

    a = parse_graph(README_SYNTH).compile(
        44100.0, block_size=256).render_mono(2048)
    b = build_readme_synth().compile(
        44100.0, block_size=256).render_mono(2048)
    np.testing.assert_array_equal(a, b)


def test_dsl_full_feature_surface():
    src = """
        name: Full;
        input gate: event;
        input level: value = 0.5 [0.0..1.0, ramp: 32];
        output out: stream;
        output st_out: stream: Frame<2>;
        external ir;

        nodes {
            envs = [AdsrEnvelope::new(0.01, 0.1, 0.7, 0.3); 4];
            oscs = [PolyBlepOscillator::saw(220.0, 0.5); 4];
            clip = HardClip::new() * 4;
            conv = Convolver::new(max_ir_len=64);
            mix = Gain::new(1.0);
            trem = Tremolo::new();
        }

        connections {
            gate -> envs.gate;
            oscs.output * envs.output -> mix.input;
            level -> mix.gain;
            [sinc] clip.output -> conv.input;
            mix.output -> clip.input;
            ir -> conv.ir;
            conv.output -> out;
            conv.output -> trem.input;
            trem.output -> st_out;
        }
    """
    g = parse_graph(src)
    ir = g.lower()
    assert ir.nodes["envs"].count == 4
    assert ir.nodes["clip"].rate == 4
    assert ir.asset_bindings == [("ir", "conv", "ir")]
    assert g.param_specs()["level"].ramp_frames == 32
    c = g.compile(48000.0, block_size=64)
    c.queue_event("gate", 0, 1.0)
    out = c.render(256)
    assert out["out"].shape == (256,)
    assert out["st_out"].shape == (256, 2)
    assert np.all(np.isfinite(out["out"]))


def test_dsl_via_and_expression():
    src = """
        output out: stream;
        nodes {
            a = Oscillator::sine(100.0, 1.0);
            b = Oscillator::sine(200.0, 1.0);
            mix = Gain::new(1.0);
        }
        connections {
            a.output * 0.5 + b.output * 0.25 -> mix.input;
            mix.output * 0.5 -> mix.input -> [32] -> mix.gain;
        }
    """
    # the via form above is malformed on purpose midway; use a valid one
    src = src.replace(
        "mix.output * 0.5 -> mix.input -> [32] -> mix.gain;",
        "mix.output * 0.5 -> [32] -> mix.input;\n"
        "            mix.output -> out;")
    g = parse_graph(src)
    out = g.compile(48000.0, block_size=128).render_mono(128)
    assert np.all(np.isfinite(out))


def test_dsl_errors_name_location():
    with pytest.raises(GraphError, match="unknown node type"):
        parse_graph("nodes { x = NoSuchNode::new(); }")
    with pytest.raises(GraphError, match="expected"):
        parse_graph("input x value;")
    with pytest.raises(GraphError, match="no endpoint"):
        parse_graph("""
            output out: stream;
            nodes { o = Oscillator::sine(100.0, 1.0); }
            connections { o.nope -> out; }
        """)


# -- multi-error recovery (reference parse_recovery.rs + parse.rs:24-117) -- #

def _errors_of(src):
    with pytest.raises(GraphError) as ei:
        parse_graph(src)
    return str(ei.value).split("\n")


def test_dsl_accumulates_two_top_level_errors():
    errs = _errors_of("""
        name: TwoBadItems;
        input s1: stream
        input s2: stream;
        output out: stream;
        foo bar baz;
        connections { s1 -> out; }
    """)
    assert len(errs) == 2, errs
    assert any("line 3" in e or "line 4" in e for e in errs), errs
    assert any("foo" in e or "top level" in e for e in errs), errs


def test_dsl_accumulates_two_node_block_errors():
    errs = _errors_of("""
        name: BadNodeBlock;
        output out: stream;
        nodes {
            osc = PolyBlepOscillator::saw(440.0, 0.6)
            lfo = PolyBlepOscillator::sine(2.0, 0.5);
            amp : 0.8;
        }
        connections { lfo.output -> out; }
    """)
    assert len(errs) == 2, errs


def test_dsl_accumulates_two_connection_block_errors():
    errs = _errors_of("""
        name: BadConnectionBlock;
        input s1: stream;
        input s2: stream;
        input s3: stream;
        output out: stream;
        connections {
            s1 = out;
            s2 -> out;
            s3 -> ;
        }
    """)
    assert len(errs) == 2, errs


def test_dsl_misplaced_name_produces_ordering_error():
    errs = _errors_of("""
        input s: stream;
        name: LateName;
        output out: stream;
        connections { s -> out; }
    """)
    assert any("must appear at the start" in e for e in errs), errs


def test_dsl_application_errors_accumulate():
    # two distinct unknown-endpoint errors report together, with lines
    errs = _errors_of("""
        output out: stream;
        nodes { o = Oscillator::sine(100.0, 1.0); }
        connections {
            o.nope -> out;
            o.alsonope -> out;
        }
    """)
    assert len(errs) == 2, errs
    assert all("line" in e for e in errs), errs


def test_dsl_bad_chars_and_later_errors_all_report():
    errs = _errors_of("""
        output out: stream;
        nodes { o = Oscillator~sine(100.0, 1.0); }
    """)
    # the stray character reports AND the statement still gets parsed
    # (as `o = Oscillator` missing its `= ctor`), or at minimum both
    # diagnostics surface in one raise
    assert any("unexpected character" in e for e in errs), errs


def test_dsl_oversample_variants():
    # oversample_variants! for the textual DSL
    # (reference oversample_variants_macro.rs:94-120)
    from oscen_tpu.graph.dsl import parse_oversample_variants
    v = parse_oversample_variants("""
        base_name: Sat;
        factors: [1, 4];
        body: {
            output audio_out: stream;
            nodes {
                osc = PolyBlepOscillator::saw(2000.0, 0.6) * {FACTOR};
                clip = HardClip::new() * { FACTOR };
            }
            connections {
                osc.output * 2.0 -> clip.input;
                [sinc] clip.output -> audio_out;
            }
        }
    """)
    assert sorted(v) == ["Sat_1x", "Sat_4x"]
    outs = {}
    for name, g in v.items():
        a = np.asarray(g.compile(48000.0, block_size=256).render_mono(2048))
        assert np.isfinite(a).all(), name
        outs[name] = a
    # the 4x variant really oversamples: outputs differ
    assert not np.array_equal(outs["Sat_1x"], outs["Sat_4x"])
    with pytest.raises(GraphError, match="at least one"):
        parse_oversample_variants(
            "base_name: X; factors: []; body: { output o: stream; }")
    with pytest.raises(GraphError, match="unterminated"):
        parse_oversample_variants(
            "base_name: X; factors: [2]; body: { output o: stream;")
