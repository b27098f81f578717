"""Compile-time vs throughput ablation for the sequential chain kernels.

The fm/pivot chain kernels unroll their per-sample fori_loop body U
samples deep.  Runtime improves with U (loop overhead amortizes) but
Mosaic compile time grows superlinearly with the unrolled body — the
pivot model's first steady-block compile measured 424 s at U=64
(B=1024, V=256), which ate the whole bench budget (VERDICT r04 work).
This tool measures, per U: first-call wall time (dominated by Mosaic
compile; each U is a distinct kernel so every first call is a cache
miss) and steady-state µs/block via the RTT-cancelling two-span method.

  OSCEN_UNROLL_CAP sweeps: python tools/uabl.py [--B=1024] [--V=256]
"""
import functools
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = """
import functools, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np, jax, jax.numpy as jnp
from oscen_tpu.ops.pallas import fm as F

B, V = %(B)d, %(V)d
rng = np.random.default_rng(0)
ph = jnp.asarray(rng.random((3, V), dtype=np.float32))
pv = jnp.zeros((3, V), jnp.float32)
dt = jnp.asarray(rng.random((3, 1, V), dtype=np.float32) * 0.01)
lvl = jnp.ones((3,), jnp.float32)
fbz = jnp.zeros((3, V), jnp.float32)
fbn = jnp.full((3, V), 0.3, jnp.float32)   # nonzero: sequential branch runs
mix = jnp.asarray(rng.random((V,), dtype=np.float32))
e = jnp.asarray(rng.random((B, V), dtype=np.float32))

t0 = time.time()
y = F.pivot_chain3_scan(ph, pv, dt, lvl, fbn, mix, e, e, e)
jax.block_until_ready(y[0])
compile_s = time.time() - t0

@functools.partial(jax.jit, static_argnames=("n",))
def span(n):
    def body(c, _):
        p, v = c
        y, p, v = F.pivot_chain3_scan(p, v, dt, lvl, fbn, mix, e, e, e)
        return (p, v), jnp.sum(y[0:1, 0])
    c, s = jax.lax.scan(body, (ph, pv), None, length=n)
    return jnp.sum(s)

for n in (64, 512):
    jax.block_until_ready(span(n))
def t(n):
    t0 = time.perf_counter(); jax.block_until_ready(span(n))
    return time.perf_counter() - t0
diffs = sorted(t(512) - t(64) for _ in range(5))
us = diffs[2] / (512 - 64) * 1e6
print(f"U_cap=%(cap)s compile={compile_s:.1f}s steady={us:.1f}us/block")
"""


def main():
    B, V = 1024, 256
    for a in sys.argv[1:]:
        if a.startswith("--B="):
            B = int(a.split("=")[1])
        if a.startswith("--V="):
            V = int(a.split("=")[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cap in ("8", "16", "32", "64"):
        env = dict(os.environ)
        env["OSCEN_UNROLL_CAP"] = cap
        src = _CHILD % dict(repo=repo, B=B, V=V, cap=cap)
        subprocess.run([sys.executable, "-c", src], env=env, check=True,
                       timeout=900)


if __name__ == "__main__":
    main()
