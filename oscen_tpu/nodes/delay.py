"""Feedback delay line.

Port of the reference Delay (/root/reference/oscen-lib/src/delay/mod.rs):
``out = buf.get(delay_samples); buf.push(in + out * feedback)`` over a
power-of-two ring buffer sized to 2 s (capped 88200), parameters clamped
every 32 frames.  This is **the** feedback-capable node
(``ALLOWS_FEEDBACK``, reference delay/mod.rs:85).

Block path: with zero feedback the delay is a pure gather over
(past state ++ current block) — fully parallel.  With feedback the
recurrence has a lag of ``floor(delay)`` samples, so the block is processed
in chunks of up to that lag, each chunk vectorized; tight delays degrade to
the per-sample scan.  Round 1 ships the scan fallback for the feedback path.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import SampleRate, stream, value
from ..graph.node import Node
from ..ops.ringbuffer import rb_get, rb_new, rb_push

MAX_DELAY_SAMPLES = 88200
FRAMES_PER_UPDATE = 32


class Delay(Node):
    ALLOWS_FEEDBACK = True

    INPUTS = (stream("input", 0.0), value("delay_samples", 0.0),
              value("feedback", 0.0))
    OUTPUTS = (stream("output"),)

    def __init__(self, delay_samples: float = 0.0, feedback: float = 0.0,
                 min_delay: int = 0):
        """``min_delay`` (static, optional): a promise that the effective
        delay never drops below this many samples.  It unlocks the
        chunked block path — the feedback recurrence has a lag of
        ``min_delay`` samples, so the block processes in vectorized
        chunks of that size instead of a per-sample scan (delay values
        are clamped to honor the promise)."""
        self.INPUTS = (stream("input", 0.0),
                       value("delay_samples", float(delay_samples)),
                       value("feedback", float(feedback)))
        self.min_delay = int(min_delay)

    @classmethod
    def from_seconds(cls, delay_seconds: float, feedback: float,
                     sample_rate: float) -> "Delay":
        return cls(delay_seconds * sample_rate, feedback)

    def init_state(self, sr: SampleRate):
        size = min(int(2.0 * sr.hz), MAX_DELAY_SAMPLES)
        buf, wp = rb_new(size)
        return {"buf": buf, "write_pos": wp,
                "frame_counter": jnp.int32(0)}

    @staticmethod
    def _clamp_cadence(update, delay_in, fb_in, cap):
        """The reference clamps params only on update frames
        (frame_counter == 0, every 32nd frame) and passes raw values
        between updates (delay/mod.rs:47-55).  ``update`` may be a scalar
        (tick) or a per-sample mask (block paths) — both replay the same
        cadence so every mode agrees sample-for-sample."""
        delay = jnp.where(update,
                          jnp.clip(delay_in, 0.0, jnp.float32(cap - 1)),
                          delay_in)
        fb = jnp.where(update, jnp.clip(fb_in, 0.0, 0.99), fb_in)
        return delay, fb

    def _effective_params(self, state, ins):
        cap = state["buf"].shape[-1]
        delay, fb = self._clamp_cadence(
            state["frame_counter"] == 0, ins["delay_samples"],
            ins["feedback"], cap)
        counter = (state["frame_counter"] + 1) % FRAMES_PER_UPDATE
        return delay, fb, counter

    def _block_params(self, state, ins, block_len):
        """Per-sample effective params for a whole block, replaying the
        32-frame clamp cadence from the carried frame counter."""
        offs = jnp.arange(block_len, dtype=jnp.int32)
        update = (state["frame_counter"] + offs) % FRAMES_PER_UPDATE == 0
        cap = state["buf"].shape[-1]
        delay, fb = self._clamp_cadence(update, ins["delay_samples"],
                                        ins["feedback"], cap)
        if self.min_delay:
            delay = jnp.maximum(delay, jnp.float32(self.min_delay))
        return delay, fb

    def tick(self, state, ins, sr):
        delay, fb, counter = self._effective_params(state, ins)
        if self.min_delay:
            delay = jnp.maximum(delay, jnp.float32(self.min_delay))
        delayed = rb_get(state["buf"], state["write_pos"], delay)
        buf, wp = rb_push(state["buf"], state["write_pos"],
                          ins["input"] + delayed * fb)
        return ({"buf": buf, "write_pos": wp, "frame_counter": counter},
                {"output": delayed})

    # ------------------------------------------------------------------ #
    # island dissolution (graph/block_mode.py): with min_delay >= B + 4,
    # every read this block addresses pre-block buffer contents, so the
    # compiler splits the node into a whole-block read (before the rest
    # of the feedback island) and a whole-block write (after it).
    # ------------------------------------------------------------------ #
    def block_read(self, state, ins, block_len, literal_ins=None):
        """Whole-block delayed output from the carried ring buffer; valid
        only under the ``min_delay >= block+4`` promise.

        When ``delay_samples`` is a TRACE-TIME LITERAL (unconnected
        default / Const edge — the simple-echo shape), in range, and
        integral after the min-delay clamp, every sample reads the same
        integer offset: the batched Catmull-Rom ``rb_get`` (≈10 ops —
        snap compare + 5 gathers + cubic) collapses to ONE contiguous
        ``dynamic_slice`` of the ring (wrap handled by a doubled tail),
        bit-identical to the snap branch it replaces."""
        import jax
        delay, fb = self._block_params(state, ins, block_len)
        buf = state["buf"]
        cap = buf.shape[-1]
        import os
        d0 = (literal_ins or {}).get("delay_samples")
        if d0 is not None and 0.0 <= d0 <= cap - 1 and buf.ndim == 1 \
                and os.environ.get("OSCEN_DELAY_LITERAL_READ", "1") != "0":
            D = max(float(d0), float(self.min_delay))
            if D == round(D):
                s0 = (state["write_pos"] - jnp.int32(int(D)) - 1) & (cap - 1)
                z = jnp.concatenate([buf, buf[:block_len]])
                delayed = jax.lax.dynamic_slice(z, (s0,), (block_len,))
                return delayed, fb
        offs = jnp.arange(block_len, dtype=jnp.int32)
        wps = state["write_pos"] + offs
        delayed = jax.vmap(
            lambda w, dd: rb_get(buf, w, dd))(wps, delay)
        return delayed, fb

    def block_write(self, state, x, delayed, fb, block_len):
        """Push the whole block (``input + delayed * feedback``)."""
        cap = state["buf"].shape[-1]
        mask = cap - 1
        offs = jnp.arange(block_len, dtype=jnp.int32)
        buf = state["buf"].at[(state["write_pos"] + offs) & mask].set(
            x + delayed * fb)
        counter = (state["frame_counter"] + block_len) % FRAMES_PER_UPDATE
        return {"buf": buf,
                "write_pos": (state["write_pos"] + block_len) & mask,
                "frame_counter": jnp.int32(counter)}

    def process_block(self, state, ins, events, sr, block_len):
        """Chunked block path (requires ``min_delay``): the feedback loop
        has a lag of at least ``min_delay`` samples, so chunks of
        ``min_delay - 4`` samples (4 = Catmull-Rom margin + boundary) read
        entirely from pre-chunk buffer contents and vectorize.  Falls back
        to the per-sample scan without the promise."""
        chunk = self.min_delay - 4
        if chunk < 8 or block_len < chunk:
            return super().process_block(state, ins, events, sr,
                                         block_len)
        import jax

        B = block_len
        n_full = B // chunk
        rem = B - n_full * chunk
        cap = state["buf"].shape[-1]
        mask = cap - 1

        x = ins["input"]
        delay_in, fb_in = self._block_params(state, ins, B)

        def run_chunk(buf, wp, xi, d, f, n):
            offs = jnp.arange(n, dtype=jnp.int32)
            wps = wp + offs
            delayed = jax.vmap(lambda w, dd: rb_get(buf, w, dd))(wps, d)
            buf = buf.at[(wp + offs) & mask].set(xi + delayed * f)
            return buf, (wp + n) & mask, delayed

        def body(carry, xc):
            buf, wp = carry
            buf, wp, delayed = run_chunk(buf, wp, *xc, chunk)
            return (buf, wp), delayed

        xs = (x[:n_full * chunk].reshape(n_full, chunk),
              delay_in[:n_full * chunk].reshape(n_full, chunk),
              fb_in[:n_full * chunk].reshape(n_full, chunk))
        (buf, wp), outs = jax.lax.scan(
            body, (state["buf"], state["write_pos"]), xs)
        y = outs.reshape(n_full * chunk)
        if rem:
            buf, wp, tail = run_chunk(buf, wp, x[-rem:], delay_in[-rem:],
                                      fb_in[-rem:], rem)
            y = jnp.concatenate([y, tail])
        counter = (state["frame_counter"] + B) % FRAMES_PER_UPDATE
        return ({"buf": buf, "write_pos": wp,
                 "frame_counter": jnp.int32(counter)},
                {"output": y})
