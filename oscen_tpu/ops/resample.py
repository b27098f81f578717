"""Fixed-ratio resampler kernels for multirate (oversampled) regions.

TPU-native counterparts of the reference's kernel families
(/root/reference/oscen-lib/src/resample/): Latch (zero-order hold), Linear,
Sinc FIR (23-tap Kaiser halfband, polyphase, cascaded 2x stages) and IIR
halfband (two-branch 1st-order allpass cascade).  Same coefficients, same
latencies; the per-sample history loops become whole-block convolutions
(FIR) and associative scans (IIR allpass).

Every kernel is expressed as ``(init_state, process_block)``:
``process_block(state, x) -> (state, y)`` maps ``[B,...]`` to ``[B*N,...]``
(up) or ``[B*N,...]`` to ``[B,...]`` (down), carrying filter histories
across blocks.  All kernels operate on the leading time axis and broadcast
over trailing channel axes.
"""

from __future__ import annotations

import os
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np



# --------------------------------------------------------------------- #
# coefficients (reference resample/coeffs.rs)
# --------------------------------------------------------------------- #
# Half of the non-zero taps of the 23-tap Kaiser (β≈8.6) halfband FIR;
# HALFBAND_23_HALF[k] is the tap at index 2k (k = 0..5).  Center tap
# (index 11) stored separately.  Stopband ≈ -90 dB above 0.55π.
HALFBAND_23_HALF = np.array([
    -3.8558514e-5, 1.2218465e-3, -7.2854808e-3,
    2.6409210e-2, -7.8128843e-2, 3.0782697e-1], np.float32)
HALFBAND_23_CENTER = np.float32(0.4999897)
HALFBAND_23_GROUP_DELAY = 11  # at the high (2x) rate

# IIR halfband: two-branch allpass cascade betas (reference coeffs.rs:48-49)
BRANCH_A_BETAS = (0.1355741, 0.6975849)
BRANCH_B_BETAS = (0.4253804, 0.9055601)
IIR_HALFBAND_GROUP_DELAY = 2

# full 23-tap halfband impulse response (for convolution forms)
_HB23 = np.zeros((23,), np.float32)
for _k, _tap in enumerate(HALFBAND_23_HALF):
    _HB23[2 * _k] = _tap
    _HB23[22 - 2 * _k] = _tap
_HB23[11] = HALFBAND_23_CENTER

DENORMAL_THRESHOLD = 1e-15


def _stages(n: int) -> int:
    if n not in (1, 2, 4, 8):
        raise ValueError("oversampling factor must be 1, 2, 4 or 8")
    return n.bit_length() - 1


def _causal_fir(x, hist, taps):
    """Causal FIR along axis 0 with carried history.

    ``hist``: [len(taps)-1, ...] previous inputs (most recent last).
    Returns (y [B,...], new_hist).

    Two lowerings, identical math: the default shifted-add form (t
    slice+FMA ops, XLA fuses the chain) and an ``lax.conv`` form
    (``OSCEN_FIR_CONV=1``) for A/B on hardware — the saturator pays
    ~15 µs/block at the 4x sinc boundary and tools/monobench.py
    attributes whether the FIR lowering or the region machinery is the
    cost."""
    t = len(taps)
    z = jnp.concatenate([hist, x], axis=0)
    if os.environ.get("OSCEN_FIR_CONV", "0") == "1" and z.ndim <= 2:
        flat = z if z.ndim == 2 else z[:, None]          # [B+t-1, C]
        lhs = jnp.moveaxis(flat, 0, 1)[:, None, :]       # [C, 1, B+t-1]
        rhs = jnp.asarray(taps, jnp.float32)[::-1][None, None, :]
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding="VALID",
            precision=jax.lax.Precision.HIGHEST)         # [C, 1, B]
        y = jnp.moveaxis(out[:, 0, :], 1, 0)
        y = y if z.ndim == 2 else y[:, 0]
        y = y.astype(x.dtype)
    else:
        y = jnp.zeros_like(x)
        for k in range(t):
            y = y + taps[k] * jax.lax.slice_in_dim(
                z, t - 1 - k, t - 1 - k + x.shape[0], axis=0)
    new_hist = z[-(t - 1):] if t > 1 else hist
    return y, new_hist


# --------------------------------------------------------------------- #
# Latch (reference resample/latch.rs) — zero-order hold; latency 0
# --------------------------------------------------------------------- #
class LatchUp:
    def __init__(self, n: int):
        self.n = n

    def init_state(self, like=None):
        return ()

    def process_block(self, state, x):
        return state, jnp.repeat(x, self.n, axis=0)

    def latency_samples(self) -> int:
        return 0


class LatchDown:
    def __init__(self, n: int):
        self.n = n

    def init_state(self, like=None):
        return ()

    def process_block(self, state, x):
        return state, x[::self.n]

    def latency_samples(self) -> int:
        return 0


# --------------------------------------------------------------------- #
# Linear (reference resample/linear.rs)
# --------------------------------------------------------------------- #
class LinearUp:
    """N-point linear interp vs the previous source sample; latency N."""

    def __init__(self, n: int):
        self.n = n

    def init_state(self, like=None):
        shape = jnp.shape(like)[1:] if like is not None else ()
        return {"prev": jnp.zeros(shape, jnp.float32)}

    def process_block(self, state, x):
        n = self.n
        prev = jnp.concatenate([state["prev"][None], x[:-1]], axis=0)
        frac = (jnp.arange(n, dtype=jnp.float32) / n)
        frac = frac.reshape((1, n) + (1,) * (x.ndim - 1))
        seg = prev[:, None] + (x - prev)[:, None] * frac
        y = seg.reshape((x.shape[0] * n,) + x.shape[1:])
        return {"prev": x[-1]}, y

    def latency_samples(self) -> int:
        return self.n


class LinearDown:
    """N-tap box average; latency (N-1)/2 source samples."""

    def __init__(self, n: int):
        self.n = n

    def init_state(self, like=None):
        return ()

    def process_block(self, state, x):
        n = self.n
        grp = x.reshape((x.shape[0] // n, n) + x.shape[1:])
        return state, jnp.mean(grp, axis=1)

    def latency_samples(self) -> int:
        return (self.n - 1) // 2


# --------------------------------------------------------------------- #
# Sinc FIR halfband (reference resample/sinc_fir.rs)
# --------------------------------------------------------------------- #
class _Halfband2xUp:
    """One polyphase 2x up stage: even branch = 12-tap FIR over the
    low-rate stream (x2 gain), odd branch = delayed center tap
    (reference sinc_fir.rs:33-82)."""

    EVEN_TAPS = np.concatenate([HALFBAND_23_HALF,
                                HALFBAND_23_HALF[::-1]]) * 2.0
    ODD_GAIN = float(2.0 * HALFBAND_23_CENTER)
    ODD_DELAY = 5

    def init_state(self, like=None):
        shape = jnp.shape(like)[1:] if like is not None else ()
        return {"hist": jnp.zeros((11,) + shape, jnp.float32),
                "odd_hist": jnp.zeros((self.ODD_DELAY,) + shape,
                                      jnp.float32)}

    def process_block(self, state, x):
        even, hist = _causal_fir(x, state["hist"], self.EVEN_TAPS)
        zo = jnp.concatenate([state["odd_hist"], x], axis=0)
        odd = zo[:x.shape[0]] * self.ODD_GAIN
        odd_hist = zo[-self.ODD_DELAY:]
        y = jnp.stack([even, odd], axis=1).reshape(
            (2 * x.shape[0],) + x.shape[1:])
        return {"hist": hist, "odd_hist": odd_hist}, y


class _Halfband2xDown:
    """One 2x down stage: 23-tap FIR at the high rate sampled at even
    indices (reference sinc_fir.rs:84-144).

    Computed polyphase at the LOW rate: only even output samples are
    kept, and a halfband's odd taps are zero except the center, so
    ``y[n] = Σ_j h[2j]·x_even[n-j] + h[11]·x_odd[n-6]`` — 13 tap-MACs
    over [B]-length streams instead of 23 over [2B] (3.5× less work).
    The accumulation order interleaves the center tap between j=5 and
    j=6 exactly where tap index 11 sits in the flat 23-tap loop, so the
    result is bit-identical to the direct high-rate form."""

    EVEN_TAPS = np.concatenate([HALFBAND_23_HALF, HALFBAND_23_HALF[::-1]])
    CENTER = float(HALFBAND_23_CENTER)
    ODD_DELAY = 6

    def init_state(self, like=None):
        shape = jnp.shape(like)[1:] if like is not None else ()
        return {"hist_e": jnp.zeros((11,) + shape, jnp.float32),
                "hist_o": jnp.zeros((self.ODD_DELAY,) + shape,
                                    jnp.float32)}

    def process_block(self, state, x):
        b = x.shape[0] // 2
        pair = x.reshape((b, 2) + x.shape[1:])
        e, o = pair[:, 0], pair[:, 1]
        ze = jnp.concatenate([state["hist_e"], e], axis=0)
        zo = jnp.concatenate([state["hist_o"], o], axis=0)
        taps = self.EVEN_TAPS
        y = jnp.zeros_like(e)
        for j in range(12):
            if j == 6:  # flat tap index 11 (the center) lands here
                y = y + self.CENTER * jax.lax.slice_in_dim(
                    zo, 0, b, axis=0)
            y = y + taps[j] * jax.lax.slice_in_dim(
                ze, 11 - j, 11 - j + b, axis=0)
        return {"hist_e": ze[-11:], "hist_o": zo[-self.ODD_DELAY:]}, y


class SincUpFir:
    """Cascaded halfband 2x up stages for N ∈ {1,2,4,8}
    (reference sinc_fir.rs:146-206), evaluated phase-major on TPU.

    Mirror of :class:`SincDownFir`'s round-4 treatment (commit 8a65417):
    the interleaved form pays a ``stack+reshape`` relayout per stage on
    TPU while the 12 tap-FMAs are nearly free, so each stage instead
    maps M phase rows to 2M phase rows of pure static-shift FMAs — an
    M→2M stage writes output phase ``2p`` as the even-branch FIR
    ``Σ_j taps[j]·u[(p-j) mod M][·+(p-j)//M]`` (accumulation order
    j=0..11, identical to ``_causal_fir``) and phase ``2p+1`` as the
    delayed-center odd branch ``gain·u[(p-5) mod M][·+(p-5)//M]`` — and
    the single interleave happens once at the cascade output.
    Bit-identical to the interleaved form (same values, same per-sample
    accumulation order; the interleave is data movement).

    The layout choice is FROZEN at construction time
    (``OSCEN_SINC_PHASEMAJOR`` read once in ``__init__``, like
    SincDownFir): checkpoints containing sinc-up state are
    layout-specific."""

    HIST = 12  # per-phase history rows kept per stage (≥ max back-shift)

    def __init__(self, n: int):
        self.n = n
        self.k = _stages(n)
        self.stages = [_Halfband2xUp() for _ in range(self.k)]
        env = os.environ.get("OSCEN_SINC_PHASEMAJOR")
        if env is not None:
            self.phase_major = env == "1"
        else:
            self.phase_major = jax.default_backend() != "cpu"

    def init_state(self, like=None):
        if not self.phase_major:
            return tuple(s.init_state(like) for s in self.stages)
        shape = jnp.shape(like)[1:] if like is not None else ()
        state = []
        m = 1
        for _ in range(self.k):
            state.append(tuple(jnp.zeros((self.HIST,) + shape, jnp.float32)
                               for _ in range(m)))
            m *= 2
        return tuple(state)

    def _stage(self, hists, phases):
        """One M→2M-phase halfband-up stage (phase-major)."""
        L = self.HIST
        b = phases[0].shape[0]
        m = len(phases)
        z = [jnp.concatenate([h, p], axis=0)
             for h, p in zip(hists, phases)]
        taps = _Halfband2xUp.EVEN_TAPS
        gain = _Halfband2xUp.ODD_GAIN

        def at(r, shift_units):
            t = r + shift_units
            ph, q = t % m, t // m  # floor div/mod handle negatives
            return jax.lax.slice_in_dim(z[ph], L + q, L + q + b, axis=0)

        out = []
        for p in range(m):
            y = jnp.zeros_like(phases[0])
            for j in range(12):
                y = y + taps[j] * at(p, -j)
            out.append(y)                               # phase 2p (even)
            out.append(gain * at(p, -_Halfband2xUp.ODD_DELAY))  # 2p+1
        new_hists = tuple(s[-L:] for s in z)
        return new_hists, out

    def process_block(self, state, x):
        if self.k == 0:
            return state, x
        if not self.phase_major:
            new = []
            for st, stage in zip(state, self.stages):
                st, x = stage.process_block(st, x)
                new.append(st)
            return tuple(new), x
        phases = [x]
        new_state = []
        for s in range(self.k):
            hists, phases = self._stage(state[s], phases)
            new_state.append(hists)
        n, b = self.n, x.shape[0]
        # one interleave: n phase rows -> [n*b, ...]
        y = jnp.reshape(jnp.stack(phases, axis=1), (n * b,) + x.shape[1:])
        return tuple(new_state), y

    def latency_samples(self) -> int:
        k = len(self.stages)
        return 0 if k == 0 else HALFBAND_23_GROUP_DELAY * ((1 << k) - 1)


class SincDownFir:
    """Cascaded halfband 2x down stages, evaluated phase-major.

    The interleaved-stream form pays ~3 µs per stage in deinterleave
    relayouts and inter-stage glue on TPU while the tap FMAs are nearly
    free (tools/downabl.py: 13 shifted FMAs over [4B] = 0.84 µs, the
    two-stage cascade = 16.3 µs).  So the input is deinterleaved ONCE
    into its N phase streams ([B]-length rows) and every stage is pure
    static-shift FMAs over phase rows: a stage from 2M phases to M maps
    tap j of output phase r to input phase (r-j) mod M at shift
    (r-j)//M.  Per-output-sample accumulation order is unchanged
    (j=0..5, center, j=6..11), so the result is bit-identical to the
    prior interleaved form.  Parity with the reference's per-sample loop
    (sinc_fir.rs:84-144) is tolerance-level only: the reference
    accumulates the center tap first and symmetric pairs as
    ``(left+right)*tap`` — a different float op order.

    The layout choice (phase-major vs interleaved) is FROZEN at
    construction time — ``OSCEN_SINC_PHASEMAJOR`` is read once in
    ``__init__`` and must not change between ``init_state`` and
    ``process_block`` (the two layouts carry different state pytrees).
    Consequence: checkpoints containing sinc-down state are
    layout-specific; a checkpoint saved with the TPU default
    (phase-major) restores on CPU only if the graph is compiled with
    ``OSCEN_SINC_PHASEMAJOR=1`` set before construction."""

    HIST = 12  # per-phase history rows kept per stage (≥ max back-shift)

    def __init__(self, n: int):
        self.n = n
        self.k = _stages(n)
        self.stages = [_Halfband2xDown() for _ in range(self.k)]
        # Phase-major on TPU, stage-interleaved on CPU — same per-sample
        # op order either way (bit-identical in exact arithmetic); the
        # split exists because XLA CPU's thread-partitioned fused loops
        # contract FMAs differently in their scalar epilogues depending
        # on array length, which the phase-major slices' misaligned
        # offsets expose as 1-ulp block-size variance, while TPU
        # vectorization is uniform across the block (no scalar
        # epilogues).  CPU phase-major block-size invariance for static
        # shapes is pinned by test_multirate_boundary_invariance's
        # sinc_phasemajor parametrization (tests/test_block_invariance.py).
        env = os.environ.get("OSCEN_SINC_PHASEMAJOR")
        if env is not None:
            self.phase_major = env == "1"
        else:
            self.phase_major = jax.default_backend() != "cpu"

    def _phase_major(self) -> bool:
        return self.phase_major

    def init_state(self, like=None):
        shape = jnp.shape(like)[1:] if like is not None else ()
        if not self._phase_major():
            return tuple(s.init_state(like) for s in self.stages)
        state = []
        m = self.n
        for _ in range(self.k):
            state.append(tuple(jnp.zeros((self.HIST,) + shape, jnp.float32)
                               for _ in range(m)))
            m //= 2
        return tuple(state)

    def _stage(self, hists, phases):
        """One 2M→M-phase halfband-down stage.  ``hists``: one [HIST,...]
        array per input phase; ``phases``: 2M arrays of [B,...]."""
        L = self.HIST
        b = phases[0].shape[0]
        z = [jnp.concatenate([h, p], axis=0) for h, p in zip(hists, phases)]
        even, odd = z[0::2], z[1::2]
        m = len(even)
        taps = _Halfband2xDown.EVEN_TAPS
        center = _Halfband2xDown.CENTER

        def at(streams, r, shift_units):
            # sample (m*n + r + shift_units) of the rate-M stream whose
            # phases are ``streams`` → phase (r+shift) mod m, row offset
            # (r+shift)//m  (negative → history rows)
            t = r + shift_units
            ph, q = t % m, t // m  # floor div/mod handle negatives
            return jax.lax.slice_in_dim(streams[ph], L + q, L + q + b,
                                        axis=0)

        out = []
        for r in range(m):
            y = jnp.zeros_like(phases[0])
            for j in range(12):
                if j == 6:
                    y = y + center * at(odd, r, -6)
                y = y + taps[j] * at(even, r, -j)
            out.append(y)
        new_hists = tuple(s[-L:] for s in z)
        return new_hists, out

    def process_block(self, state, x):
        n, b = self.n, x.shape[0] // self.n
        if self.k == 0:
            return state, x
        if not self._phase_major():
            new = []
            for st, stage in zip(state, self.stages):
                st, x = stage.process_block(st, x)
                new.append(st)
            return tuple(new), x
        # one deinterleave: [n*b, ...] -> n contiguous phase rows [b, ...]
        ph = jnp.moveaxis(jnp.reshape(x, (b, n) + x.shape[1:]), 1, 0)
        phases = [ph[r] for r in range(n)]
        new_state = []
        for s in range(self.k):
            hists, phases = self._stage(state[s], phases)
            new_state.append(hists)
        return tuple(new_state), phases[0]

    def latency_samples(self) -> int:
        k = self.k
        return 0 if k == 0 else HALFBAND_23_GROUP_DELAY * ((1 << k) - 1)


# --------------------------------------------------------------------- #
# IIR halfband (reference resample/halfband_iir.rs)
# --------------------------------------------------------------------- #
def _allpass_block(a: float, x, y_prev, x_prev):
    """First-order allpass y[n] = a (x[n] - y[n-1]) + x[n-1] over a block
    with the reference's exact per-sample op order
    (halfband_iir.rs:24-63) — sequential-exact, so oversampled regions
    stay block-size invariant (an associative-scan form reassociates and
    makes output depend on where block boundaries fall).
    Returns (y, y_last, x_last)."""
    import jax

    def step(carry, xt):
        yp, xp = carry
        y = a * (xt - yp) + xp
        return (y, xt), y

    (y_last, x_last), y = jax.lax.scan(step, (y_prev, x_prev), x)
    return y, y_last, x_last


class _IirHalfband2x:
    """Two-branch allpass polyphase halfband (reference :65-145)."""

    def init_state(self, like=None):
        shape = jnp.shape(like)[1:] if like is not None else ()
        z = jnp.zeros(shape, jnp.float32)
        return {
            "a_x": (z, z), "a_y": (z, z),
            "b_x": (z, z), "b_y": (z, z),
            "prev_odd": z,
        }

    def _branch(self, betas, xs, x_prevs, y_prevs):
        from .pallas.util import pallas_mode
        use, interp = pallas_mode()
        if use:
            # sequential-exact Pallas cascade (exact op order, so
            # block-size invariance holds) — a plain lax.scan measures
            # ~3.6 µs per ITERATION on TPU (14.8 ms per 4096-sample
            # block vs ~25 µs through the kernel; tools/monobench.py)
            from .pallas.iir import allpass_cascade_scan
            S = len(betas)
            flat = jnp.reshape(xs, (xs.shape[0], -1))
            a = jnp.broadcast_to(
                jnp.asarray(betas, jnp.float32)[:, None],
                (S, flat.shape[1]))
            xp = jnp.stack([jnp.reshape(v, (-1,)) for v in x_prevs])
            yp = jnp.stack([jnp.reshape(v, (-1,)) for v in y_prevs])
            y, xpo, ypo = allpass_cascade_scan(flat, a, xp, yp,
                                               interpret=interp)
            shp = xs.shape[1:]
            return (jnp.reshape(y, xs.shape),
                    tuple(jnp.reshape(xpo[s], shp) for s in range(S)),
                    tuple(jnp.reshape(ypo[s], shp) for s in range(S)))
        new_xp, new_yp = [], []
        y = xs
        for a, xp, yp in zip(betas, x_prevs, y_prevs):
            y, y_last, x_last = _allpass_block(a, y, yp, xp)
            new_xp.append(x_last)
            new_yp.append(y_last)
        return y, tuple(new_xp), tuple(new_yp)

    def up(self, state, x):
        ya, axp, ayp = self._branch(BRANCH_A_BETAS, x, state["a_x"],
                                    state["a_y"])
        yb, bxp, byp = self._branch(BRANCH_B_BETAS, x, state["b_x"],
                                    state["b_y"])
        y = jnp.stack([ya, yb], axis=1).reshape(
            (2 * x.shape[0],) + x.shape[1:])
        return {**state, "a_x": axp, "a_y": ayp, "b_x": bxp,
                "b_y": byp}, y

    def down(self, state, x):
        even = x[::2]
        odd = x[1::2]
        odd_delayed = jnp.concatenate([state["prev_odd"][None], odd[:-1]],
                                      axis=0)
        ya, axp, ayp = self._branch(BRANCH_A_BETAS, even, state["a_x"],
                                    state["a_y"])
        yb, bxp, byp = self._branch(BRANCH_B_BETAS, odd_delayed,
                                    state["b_x"], state["b_y"])
        y = (ya + yb) * 0.5
        return {"a_x": axp, "a_y": ayp, "b_x": bxp, "b_y": byp,
                "prev_odd": odd[-1]}, y


class IirHalfbandUp:
    def __init__(self, n: int):
        self.n = n
        self.stages = [_IirHalfband2x() for _ in range(_stages(n))]

    def init_state(self, like=None):
        return tuple(s.init_state(like) for s in self.stages)

    def process_block(self, state, x):
        new = []
        for st, stage in zip(state, self.stages):
            st, x = stage.up(st, x)
            new.append(st)
        return tuple(new), x

    def latency_samples(self) -> int:
        k = len(self.stages)
        return 0 if k == 0 else IIR_HALFBAND_GROUP_DELAY * ((1 << k) - 1)


class IirHalfbandDown:
    def __init__(self, n: int):
        self.n = n
        self.stages = [_IirHalfband2x() for _ in range(_stages(n))]

    def init_state(self, like=None):
        return tuple(s.init_state(like) for s in self.stages)

    def process_block(self, state, x):
        new = []
        for st, stage in zip(state, self.stages):
            st, x = stage.down(st, x)
            new.append(st)
        return tuple(new), x

    def latency_samples(self) -> int:
        k = len(self.stages)
        return 0 if k == 0 else IIR_HALFBAND_GROUP_DELAY * ((1 << k) - 1)


# --------------------------------------------------------------------- #
def make_upsampler(policy: str, n: int):
    """Kernel factory: policy -> upsampler (reference dispatch tables,
    dispatch/stream.rs:95-104; default stream policy is sinc FIR,
    default value policy is latch)."""
    return {"latch": LatchUp, "linear": LinearUp, "sinc": SincUpFir,
            "sinc_iir": IirHalfbandUp}[policy](n)


def make_downsampler(policy: str, n: int):
    return {"latch": LatchDown, "linear": LinearDown, "sinc": SincDownFir,
            "sinc_iir": IirHalfbandDown}[policy](n)
