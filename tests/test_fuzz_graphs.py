"""Differential fuzzing: random graphs, sample mode vs block mode.

The two compilers share only the IR — the per-sample fused scan and the
time-vectorized/SCC-island pipeline are independent implementations of the
same semantics, so agreement on randomized topologies is strong evidence
the lowering, fanout, feedback and state-carry machinery is right (the
reference's analogue: block==per-sample equivalence tests, generalized).
"""

import numpy as np
import pytest

from oscen_tpu import (AddValue, AdsrEnvelope, Crossfade, Delay, Gain,
                       Graph, HardClip, Mixer, Oscillator,
                       PolyBlepOscillator, TptFilter)


def _random_graph(rng, n_nodes: int, with_events: bool) -> Graph:
    g = Graph(f"Fuzz{n_nodes}")
    if with_events:
        g.input("gate", "event")
    g.input("x", "stream")
    g.output("out", "stream")

    sources = []  # (ref, producing endpoint)
    makers = [
        lambda: ("osc", Oscillator(
            float(rng.uniform(50, 2000)), float(rng.uniform(0.1, 1.0)),
            rng.choice(["sine", "square", "saw"]))),
        lambda: ("posc", PolyBlepOscillator(
            float(rng.uniform(50, 2000)), float(rng.uniform(0.1, 1.0)),
            rng.choice(PolyBlepOscillator.WAVEFORMS))),
        lambda: ("tpt", TptFilter(float(rng.uniform(200, 8000)),
                                  float(rng.uniform(0.3, 3.0)))),
        lambda: ("gain", Gain(float(rng.uniform(0.2, 1.5)))),
        lambda: ("mix", Mixer()),
        lambda: ("clip", HardClip()),
        lambda: ("addv", AddValue(float(rng.uniform(-0.5, 0.5)))),
        lambda: ("xf", Crossfade()),
        lambda: ("delay", Delay(float(rng.uniform(4, 200)),
                                float(rng.uniform(0.0, 0.8)))),
        lambda: ("env", AdsrEnvelope(
            float(rng.uniform(0.0, 0.01)), float(rng.uniform(0.001, 0.05)),
            float(rng.uniform(0.2, 1.0)), float(rng.uniform(0.001, 0.05)))),
    ]

    from oscen_tpu.graph.ir import EndpointRef
    sources.append(EndpointRef("", "x"))
    node_objs = {}
    for i in range(n_nodes):
        kind, node = makers[rng.integers(len(makers))]()
        name = f"{kind}{i}"
        ref = g.add(name, node)
        node_objs[name] = node
        # wire stream inputs from earlier sources (keeps the graph a DAG)
        for ep in node.INPUTS:
            if ep.kind.value == "stream" and len(sources) \
                    and rng.random() < 0.85:
                src = sources[rng.integers(len(sources))]
                if rng.random() < 0.2:
                    g.connect(src * float(rng.uniform(0.3, 1.0)),
                              EndpointRef(name, ep.name))
                else:
                    g.connect(src, EndpointRef(name, ep.name))
        if with_events and node.event_inputs and rng.random() < 0.8:
            g.connect("gate", EndpointRef(name, node.event_inputs[0].name))
        for out in node.OUTPUTS:
            if out.kind.value == "stream" and out.channels == 1 \
                    and not out.shape:
                sources.append(EndpointRef(name, out.name))

    # mix the last few sources to the output
    picks = [sources[rng.integers(len(sources))] for _ in range(3)]
    expr = picks[0]
    for p in picks[1:]:
        expr = expr + p * 0.5
    g.connect(expr, "out")
    return g


@pytest.mark.parametrize("seed", range(8))
def test_random_graphs_modes_agree(seed):
    def build():
        rng = np.random.default_rng(seed)
        return _random_graph(rng, int(rng.integers(3, 9)),
                             with_events=True)

    def run(mode):
        c = build().compile(48000.0, block_size=192, mode=mode)
        c.queue_event("gate", 17, 0.9)
        x = np.random.default_rng(99).standard_normal(
            576).astype(np.float32) * 0.3
        blocks = [np.asarray(c.process_block(
            stream_inputs={"x": x[i * 192:(i + 1) * 192]})["out"])
            for i in range(3)]
        return np.concatenate(blocks)

    a = run("sample")
    b = run("block")
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
    scale = max(np.abs(a).max(), 1e-3)
    rms = np.sqrt(np.mean((a - b) ** 2)) / scale
    assert rms < 2e-3, (seed, rms, np.abs(a - b).max())
