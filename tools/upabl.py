"""Ablation round 5g: phase-major sinc UP cascade (mirror of 8a65417's
down-cascade treatment) — interleaved vs phase-major SincUpFir in
isolation, plus the full saturator block A/B.

The interleaved up form pays a stack+reshape relayout per stage while
the 12 tap-FMAs are nearly free (the down-side measurement in
tools/downabl.py: relayout/glue ~3 us per stage vs 0.84 us of FMAs).
Phase-major defers to ONE interleave at the cascade output.  Both forms
are bit-identical (tests/test_multirate.py::
test_sinc_up_layout_frozen_at_construction).
"""
import os
import sys
import time
import functools

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1024
N = 4


def measure_kernel(step_fn, state):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def span_fn(state, n):
        def body(c, _):
            c, s = step_fn(c)
            return c, s
        c, ys = jax.lax.scan(body, state, None, length=n)
        return jnp.sum(ys)

    n_small, n_large = 256, 4096
    for n in (n_small, n_large):
        print(f"[upabl]   warm span {n}", flush=True)
        float(span_fn(state, n))

    def span(n):
        t0 = time.perf_counter()
        float(span_fn(state, n))
        return time.perf_counter() - t0

    raw = [(span(n_large), span(n_small)) for _ in range(5)]
    diffs = sorted(a - b for a, b in raw)
    return max(diffs[2], 1e-9) / (n_large - n_small) * 1e6


def make_up(phase_major):
    os.environ["OSCEN_SINC_PHASEMAJOR"] = "1" if phase_major else "0"
    from oscen_tpu.ops import resample as rs
    import jax.numpy as jnp
    up = rs.SincUpFir(N)
    st = up.init_state(jnp.zeros((1,)))

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B,)).astype(np.float32))

    def step(c):
        c, y = up.process_block(c, x)
        return c, jnp.sum(y)

    return step, st


def make_saturator(phase_major):
    os.environ["OSCEN_SINC_PHASEMAJOR"] = "1" if phase_major else "0"
    import jax
    from oscen_tpu.models.simple import build_saturator
    g = build_saturator(factor=4)
    s = g.compile(sample_rate=48_000.0, block_size=B, mode="block")
    out = s.process_block()
    jax.block_until_ready([v for v in out.values() if hasattr(v, "shape")])
    return s.steady_checksum


def window_model(ck):
    def span(n):
        t = time.perf_counter()
        ck(n)
        return time.perf_counter() - t
    diffs = sorted(span(2048) - span(256) for _ in range(5))
    return max(diffs[2], 1e-9) / (2048 - 256) * 1e6


def main():
    t0 = time.time()
    # isolated cascade
    runners = {"up_inter": make_up(False), "up_pm": make_up(True)}
    for k, (fn, st) in runners.items():
        print(f"[upabl] {k}: {measure_kernel(fn, st):6.2f} us/block "
              f"({time.time()-t0:.0f}s)", flush=True)
    # full saturator
    sat = {"sat_inter": make_saturator(False),
           "sat_pm": make_saturator(True)}
    for k, ck in sat.items():
        ck(4)
    results = {k: [] for k in sat}
    for i in range(8):
        line = []
        for k, ck in sat.items():
            results[k].append(window_model(ck))
            line.append(f"{k} {results[k][-1]:6.2f}")
        print(f"[upabl] w{i}: " + "  ".join(line), flush=True)
    for k, ws in results.items():
        ws.sort()
        med = ws[len(ws) // 2]
        print(f"{k:10s}: best {ws[0]:6.2f}  med {med:6.2f} us/block"
              f"  (best {B / 48000.0 / (ws[0] * 1e-6):6.0f}x RT)")


if __name__ == "__main__":
    main()
