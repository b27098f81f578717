"""Stateless / near-stateless utility nodes.

Counterparts of the reference's small nodes: Gain (gain/mod.rs), Value
(value.rs), AudioInput (graph/audio_input.rs), plus the example-local
HardClip (examples/oversampled-saturator/src/main.rs:31-62), Mixer,
Crossfade, AddValue (examples/fm-synth/src/nodes/), Tremolo
(examples/electric-piano/src/tremolo.rs) and FmOperator
(examples/fm-synth/src/nodes/fm_operator.rs).

Stateless nodes vectorize trivially over the block (the default scan is
bypassed by a direct broadcast implementation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.types import SampleRate, stream, value
from ..graph.node import Node

TAU = 2.0 * math.pi


class _StatelessNode(Node):
    """Nodes whose tick is a pure function of inputs: the block impl simply
    applies the tick math to whole ``[B]`` arrays."""

    def init_state(self, sr: SampleRate):
        return {}

    def process_block(self, state, ins, events, sr, block_len):
        return self.tick(state, ins, sr)

    def const_out_eps(self, const_ins, literal_ins):
        """Const-output propagation (graph/block_mode.py const_outs): a
        pure function of block-constant inputs is block-constant."""
        from ..core.types import Kind as _K
        if all(e.name in const_ins for e in self.INPUTS
               if e.kind not in (_K.EVENT, _K.ASSET)):
            return tuple(o.name for o in self.OUTPUTS)
        return ()


class Gain(_StatelessNode):
    """``out = in * gain`` (reference gain/mod.rs)."""

    INPUTS = (stream("input", 0.0), stream("gain", 1.0))
    OUTPUTS = (stream("output"),)

    def __init__(self, initial_gain: float = 1.0):
        self.INPUTS = (stream("input", 0.0), stream("gain", float(initial_gain)))

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] * ins["gain"]}

    def const_out_eps(self, const_ins, literal_ins):
        """With a LITERAL 0.0 gain the output is identically zero
        regardless of the stream input (the reference fm/pivot voices
        feed filter_env_gain a 0.0-default amount — the whole envelope
        modulation path folds away until the param is first set)."""
        if literal_ins.get("gain") == 0.0:
            return ("output",)
        return super().const_out_eps(const_ins, literal_ins)

    def process_block(self, state, ins, events, sr, block_len,
                      literal_ins=None):
        if literal_ins and literal_ins.get("gain") == 0.0:
            # in·0 ≡ 0 (inputs finite by construction; the same
            # trace-time-zero judgment as the FM chain's literal-0.0
            # feedback / MulAdd's zero gain)
            shape = jnp.broadcast_shapes(jnp.shape(ins["input"]),
                                         jnp.shape(ins["gain"]))
            return state, {"output": jnp.zeros(shape, jnp.float32)}
        return self.tick(state, ins, sr)


class Vca(_StatelessNode):
    """Voltage-controlled amplifier: ``out = in * control`` (stream ×
    stream), used to apply envelope modulation to audio signals
    (reference examples/pivot/src/vca.rs:31-36)."""

    INPUTS = (stream("input", 0.0), stream("control", 1.0))
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] * ins["control"]}


class Value(_StatelessNode):
    """Pass-through parameter holder (reference value.rs)."""

    INPUTS = (value("input", 0.0),)
    OUTPUTS = (value("output"),)

    def __init__(self, initial_value: float = 0.0):
        self.INPUTS = (value("input", float(initial_value)),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"]}


class AudioInput(_StatelessNode):
    """value→stream bridge (reference graph/audio_input.rs)."""

    INPUTS = (value("input_value", 0.0),)
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input_value"]}


class HardClip(_StatelessNode):
    """Drive-then-clip nonlinearity (reference oversampled-saturator
    main.rs:31-62): ``out = clamp(in * 1.5, -0.7, 0.7)``."""

    INPUTS = (stream("input", 0.0),)
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": jnp.clip(ins["input"] * 1.5, -0.7, 0.7)}


class Mixer(_StatelessNode):
    """Two-input adder (reference fm-synth nodes/mixer.rs)."""

    INPUTS = (stream("input_a", 0.0), stream("input_b", 0.0))
    OUTPUTS = (stream("output"),)

    def tick(self, state, ins, sr):
        return state, {"output": ins["input_a"] + ins["input_b"]}


class Crossfade(_StatelessNode):
    """Splits input between two outputs by ``mix`` (fm-synth
    nodes/crossfade.rs): a=in*(1-mix), b=in*mix."""

    INPUTS = (stream("input", 0.0), value("mix", 0.0))
    OUTPUTS = (stream("output_a"), stream("output_b"))

    def tick(self, state, ins, sr):
        mix = jnp.clip(ins["mix"], 0.0, 1.0)
        return state, {"output_a": ins["input"] * (1.0 - mix),
                       "output_b": ins["input"] * mix}


class AddValue(_StatelessNode):
    """``out = in + value`` (fm-synth nodes/add_value.rs)."""

    INPUTS = (stream("input", 0.0), value("value", 0.0))
    OUTPUTS = (stream("output"),)

    def __init__(self, v: float = 0.0):
        self.INPUTS = (stream("input", 0.0), value("value", float(v)))

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] + ins["value"]}


class MulAdd(_StatelessNode):
    """``out = in·gain + value`` — a Gain→AddValue pair fused into one
    node (identical fp ops/order, one fewer [C, B] intermediate; used by
    the fused pivot voice's filter-env cutoff modulation,
    pivot_voice.rs:126-130, which composes Gain + AddValue)."""

    INPUTS = (stream("input", 0.0), value("gain", 1.0),
              value("value", 0.0))
    OUTPUTS = (stream("output"),)

    def __init__(self, gain: float = 1.0, v: float = 0.0):
        self.INPUTS = (stream("input", 0.0), value("gain", float(gain)),
                       value("value", float(v)))

    def tick(self, state, ins, sr):
        return state, {"output": ins["input"] * ins["gain"]
                       + ins["value"]}

    def const_out_eps(self, const_ins, literal_ins):
        """Block-constant-output declaration (graph/block_mode.py
        const_outs): with a LITERAL 0.0 gain the stream input is
        multiplied out entirely, so the output is constant whenever
        ``value`` is; with every input constant it trivially is
        (the _StatelessNode base rule)."""
        if literal_ins.get("gain") == 0.0 and "value" in const_ins:
            return ("output",)
        return super().const_out_eps(const_ins, literal_ins)

    def process_block(self, state, ins, events, sr, block_len,
                      literal_ins=None):
        if literal_ins and literal_ins.get("gain") == 0.0:
            # out = in·0 + value ≡ value: the modulation path compiles
            # away (its producer becomes dead code XLA eliminates).  The
            # trace-time-zero judgment matches the FM chain's literal-0.0
            # feedback specialization: modulation sources here are finite
            # by construction, so dropping the ·0 term is exact.
            v = ins["value"]
            shape = jnp.broadcast_shapes(jnp.shape(ins["input"]),
                                         jnp.shape(v))
            return state, {"output": jnp.broadcast_to(v, shape)}
        return self.tick(state, ins, sr)


class Tremolo(Node):
    """Mono→stereo constant-power pan LFO (reference
    examples/electric-piano/src/tremolo.rs:8-60).

    The LFO phase uses an *anchored* representation — ``phase(t) =
    wrap(anchor + dt·k)`` with the integer tick count ``k`` carried and
    the anchor rebased only when the rate changes (or at a fixed absolute
    K_REBASE to keep ``dt·k`` exact in f32).  The block path evaluates the
    same formula vectorized, so block mode is bit-identical to the
    per-sample tick AND block-size invariant, with no sequential scan in
    the common (rate-constant) case — this node sits on the flagship's
    single-lane mixdown path where a sequential kernel costs ~10 µs/block.
    """

    INPUTS = (stream("input", 0.0), value("rate", 5.0), value("depth", 0.5))
    OUTPUTS = (stream("output", channels=2),)

    K_REBASE = 1 << 20  # dt·k stays exact well below 2^24

    def init_state(self, sr: SampleRate):
        return {"anchor": jnp.float32(0.0),
                "k": jnp.int32(0),
                "dt_last": jnp.float32(0.0)}

    @staticmethod
    def _pan(x, phase, depth):
        lfo = jnp.sin(phase * TAU)
        pan = 0.5 + lfo * (depth / 3.0)
        return jnp.stack([x * pan, x * (1.0 - pan)], axis=-1)

    @staticmethod
    def _wrap(p):
        return p - jnp.floor(p)

    def tick(self, state, ins, sr):
        dt = ins["rate"] / sr.hz
        anchor, k = state["anchor"], state["k"]
        changed = jnp.logical_and(dt != state["dt_last"], k > 0)
        anchor = jnp.where(changed,
                           self._wrap(anchor + state["dt_last"]
                                      * k.astype(jnp.float32)), anchor)
        k = jnp.where(changed, 0, k)
        phase = self._wrap(anchor + dt * k.astype(jnp.float32))
        out = self._pan(ins["input"], phase, ins["depth"])
        k = k + 1
        rebase = k >= self.K_REBASE
        anchor = jnp.where(rebase,
                           self._wrap(anchor + dt * float(self.K_REBASE)),
                           anchor)
        k = jnp.where(rebase, k - self.K_REBASE, k)
        return ({"anchor": anchor, "k": k, "dt_last": dt},
                {"output": out})

    def kernel_epilogue(self, state, vals, sr, block_len):
        """Stream-epilogue fusion protocol (graph/block_mode.py): when
        this node's only stream input is a producer's fused voice
        mixdown and its value inputs are block-constant, the compiler
        runs the per-sample pan INSIDE the producer's Pallas kernel.
        Returns ``(C, fn, params, new_state)``; ``fn(mix [U,1], t0,
        p_ref) -> [U, C]`` must use only the SMEM params row.  The
        phase/rebase state advance happens here (closed form, same
        arithmetic as the block fast path)."""
        dt0 = vals["rate"] / sr.hz
        K = float(self.K_REBASE)
        anchor, k0 = state["anchor"], state["k"]
        changed = jnp.logical_and(dt0 != state["dt_last"], k0 > 0)
        anchor = jnp.where(
            changed,
            self._wrap(anchor + state["dt_last"]
                       * k0.astype(jnp.float32)), anchor)
        k0 = jnp.where(changed, 0, k0)
        a2 = self._wrap(anchor + dt0 * K)
        k_end = k0 + block_len
        reb = k_end >= self.K_REBASE
        new_state = {"anchor": jnp.where(reb, a2, anchor),
                     "k": jnp.where(reb, k_end - self.K_REBASE, k_end),
                     "dt_last": dt0}
        params = jnp.stack([anchor, k0.astype(jnp.float32), dt0,
                            vals["depth"], a2])
        return 2, Tremolo._epilogue_fn, params, new_state

    @staticmethod
    def _epilogue_fn(mix, t0, p):
        # p (SMEM row): [anchor, k0, dt, depth, a2]
        U = mix.shape[0]
        K = float(Tremolo.K_REBASE)
        t0f = jnp.asarray(t0).astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0).astype(
            jnp.float32)
        ks = p[1] + (iota + t0f)
        ph = jnp.where(ks < K, p[0] + p[2] * ks, p[4] + p[2] * (ks - K))
        ph = ph - jnp.floor(ph)
        pan = 0.5 + jnp.sin(ph * TAU) * (p[3] / 3.0)
        # returned as per-channel (U, 1) columns: the kernel either
        # stores each to its own (B, 1) ref (epi_split — lane-aligned,
        # same free class as the mixdown store) or concatenates in-
        # kernel for the single-ref A/B form
        return mix * pan, mix * (1.0 - pan)

    def process_block(self, state, ins, events, sr, block_len,
                      const_ins=frozenset()):
        B = block_len
        dt = ins["rate"] / sr.hz  # [B]
        K = float(self.K_REBASE)

        def fast_from(anchor, k0, dt0):
            ks = k0.astype(jnp.float32) + jnp.arange(B, dtype=jnp.float32)
            a2 = self._wrap(anchor + dt0 * K)
            phase = jnp.where(ks < K,
                              self._wrap(anchor + dt0 * ks),
                              self._wrap(a2 + dt0 * (ks - K)))
            k_end = k0 + B
            reb = k_end >= self.K_REBASE
            return (phase,
                    jnp.where(reb, a2, anchor),
                    jnp.where(reb, k_end - self.K_REBASE, k_end),
                    dt0)

        # Layout/structure variants, interleaved-A/B-able on chip via
        # OSCEN_TREMOLO_FORM (read at trace time; all forms are
        # bit-identical — transposes move data, the pan math and its op
        # order never change):
        #   cond_bc  — lax.cond(same-rate) with the [B, 2] pan stack
        #              computed inside each branch (round-3 default)
        #   cond_cm  — cond returns the pan CHANNEL-MAJOR [2, B] (lane-
        #              wide rows; the [B, 2] trailing-channel layout pads
        #              2 lanes to 128, making every op and the cond
        #              boundary buffer 64x wider than the data) and
        #              transposes once after the cond
        #   phase    — cond returns only the [B] phase; pan outside
        #   phase_cm — phase cond + channel-major pan + one transpose
        #   const    — no cond at all (rate is trace-time block-constant)
        #   const_cm — const + channel-major + one transpose
        # The transpose is logical: consumers that reduce (the steady
        # checksum's full sum) fold it away; the render path materializes
        # [B, 2] once at the host boundary where the copy is amortized.
        import os as _os
        form = _os.environ.get("OSCEN_TREMOLO_FORM", "")
        if not form:
            form = ("const" if _os.environ.get("OSCEN_TREMOLO_CONST",
                                               "0") != "0" else "cond_bc")
        cm = form.endswith("_cm")
        base = form[:-3] if cm else form
        if base == "const" and "rate" not in const_ins:
            base = "cond"  # rate varies at trace time: need the cond
        if base == "cond_bc":
            base = "cond"

        def pan_pair(x, phase, depth):
            lfo = jnp.sin(phase * TAU)
            pan = 0.5 + lfo * (depth / 3.0)
            return x * pan, x * (1.0 - pan)

        def pan_out(x, phase, depth):
            a, b = pan_pair(x, phase, depth)
            return jnp.stack([a, b], axis=0 if cm else -1)

        def finish(out, anchor, k, dt_last):
            if cm:
                out = out.T
            return ({"anchor": anchor, "k": k, "dt_last": dt_last},
                    {"output": out})

        if base == "const":
            # rate is block-constant at TRACE time: the only possible
            # change is at the block boundary — apply tick's rate-change
            # anchor rebase once, then the anchored closed form.  No
            # lax.cond, no scan fallback in the compiled program.
            # Bit-identical to tick: tick itself evaluates
            # phase = wrap(anchor + dt·k).  (The bc form measured SLOWER
            # than cond_bc in round 3 — 26.6 vs 24.0 us/block A/B — from
            # degenerate-layout [B,1] copies when the phase math inlines
            # into the main loop body.)
            dt0 = dt[0]
            anchor, k0 = state["anchor"], state["k"]
            changed = jnp.logical_and(dt0 != state["dt_last"], k0 > 0)
            anchor = jnp.where(
                changed,
                self._wrap(anchor + state["dt_last"]
                           * k0.astype(jnp.float32)), anchor)
            k0 = jnp.where(changed, 0, k0)
            phase, anchor, k, dt_last = fast_from(anchor, k0, dt0)
            return finish(pan_out(ins["input"], phase, ins["depth"]),
                          anchor, k, dt_last)

        same = jnp.all(dt == state["dt_last"])

        def slow_phase():
            def step(carry, dt_t):
                anchor, k, dt_last = carry
                changed = jnp.logical_and(dt_t != dt_last, k > 0)
                anchor = jnp.where(
                    changed,
                    self._wrap(anchor + dt_last * k.astype(jnp.float32)),
                    anchor)
                k = jnp.where(changed, 0, k)
                phase = self._wrap(anchor + dt_t * k.astype(jnp.float32))
                k = k + 1
                rebase = k >= self.K_REBASE
                anchor = jnp.where(rebase, self._wrap(anchor + dt_t * K),
                                   anchor)
                k = jnp.where(rebase, k - self.K_REBASE, k)
                return (anchor, k, dt_t), phase
            (anchor, k, dt_last), phase = jax.lax.scan(
                step, (state["anchor"], state["k"], state["dt_last"]), dt)
            return phase, anchor, k, dt_last

        if base == "phase":
            # only the [B] phase crosses the cond; the pan (and its
            # wider output array) fuses into the main block body
            phase, anchor, k, dt_last = jax.lax.cond(
                same,
                lambda _: fast_from(state["anchor"], state["k"], dt[0]),
                lambda _: slow_phase(), operand=None)
            return finish(pan_out(ins["input"], phase, ins["depth"]),
                          anchor, k, dt_last)

        # base == "cond": the pan is computed INSIDE each branch — the
        # output array is what crosses the cond boundary, while the [B]
        # phase array stays fused into its branch (the TPT coefficient
        # cond taught us cond-boundary arrays cost real per-block time;
        # same ops, same order — bit-exact)
        def fast(_):
            phase, anchor, k, dt_last = fast_from(
                state["anchor"], state["k"], dt[0])
            return (pan_out(ins["input"], phase, ins["depth"]),
                    anchor, k, dt_last)

        def slow(_):
            phase, anchor, k, dt_last = slow_phase()
            return (pan_out(ins["input"], phase, ins["depth"]),
                    anchor, k, dt_last)

        out, anchor, k, dt_last = jax.lax.cond(same, fast, slow,
                                               operand=None)
        return finish(out, anchor, k, dt_last)


class FmOperator(Node):
    """Sine operator with phase modulation and self-feedback (reference
    examples/fm-synth/src/nodes/fm_operator.rs).

    The self-feedback term (``prev_output * feedback``) is a one-sample
    nonlinear recurrence; the block path uses the default per-sample scan
    (a fused Pallas kernel is the fast path for voice-parallel synths).
    """

    INPUTS = (value("base_freq", 440.0), value("ratio", 1.0),
              stream("phase_mod", 0.0), value("feedback", 0.0),
              stream("envelope", 1.0), value("level", 1.0))
    OUTPUTS = (stream("output"),)

    def init_state(self, sr: SampleRate):
        return {"phase": jnp.float32(0.0), "prev_output": jnp.float32(0.0)}

    def tick(self, state, ins, sr):
        frequency = ins["base_freq"] * ins["ratio"]
        feedback_mod = state["prev_output"] * ins["feedback"]
        total_pm = ins["phase_mod"] + feedback_mod
        from ..ops.fastmath import sin_turns
        out = sin_turns(state["phase"] + total_pm) \
            * ins["envelope"] * ins["level"]
        phase = state["phase"] + frequency / sr.hz
        phase = phase - jnp.trunc(phase)  # Rust .fract()
        return ({"phase": phase, "prev_output": out}, {"output": out})

    def process_block(self, state, ins, events, sr, block_len):
        """Scalar-instance block path: route through the same
        exact-op-order Pallas kernel as the voice-batched path (with a
        width-1 instance axis).  Without this a standalone FmOperator
        fell to the default per-sample Node scan on TPU (~3.6 µs per
        Mosaic scan iteration — the cliff class the round-5 twin_peaks
        bench exposed for LP18)."""
        from ..ops.pallas.util import pallas_mode
        use, interp = pallas_mode()
        if not use:
            return super().process_block(state, ins, events, sr,
                                         block_len)
        st1 = {k: jnp.reshape(jnp.asarray(v), (1,))
               for k, v in state.items()}
        ins1 = {k: jnp.broadcast_to(jnp.asarray(v), (block_len,))[None]
                for k, v in ins.items()}
        out = self.process_block_batched(st1, ins1, events, sr, block_len)
        if out is None:  # pragma: no cover - use implies a kernel path
            return super().process_block(state, ins, events, sr,
                                         block_len)
        st2, outs = out
        return ({k: jnp.reshape(v, ()) for k, v in st2.items()},
                {k: v[0] for k, v in outs.items()})

    def process_block_batched(self, state, ins, events, sr, block_len):
        """All voices through the exact-op-order Pallas kernel
        (ops/pallas/fm.py); the default path is a per-voice 512-step
        while-loop."""
        from ..ops.pallas.util import pallas_mode
        use, interp = pallas_mode()
        if not use:
            return None
        from ..ops.pallas.fm import fm_operator_scan

        dt = ins["base_freq"] * ins["ratio"] / sr.hz  # [C, B]
        tbv = lambda v: jnp.moveaxis(v, 0, 1)  # [C, B] -> [B, C]
        y, phase, prev = fm_operator_scan(
            state["phase"], state["prev_output"], tbv(dt),
            tbv(ins["phase_mod"]), tbv(ins["feedback"]),
            tbv(ins["envelope"]), tbv(ins["level"]), interpret=interp)
        return ({"phase": phase, "prev_output": prev},
                {"output": jnp.moveaxis(y, 0, 1)})
