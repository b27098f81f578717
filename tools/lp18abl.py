"""Ablation round 5i: twin_peaks dual-LP18 kernel launch count.

twin_peaks runs TWO independent LP18Filter instances (filter_a/filter_b,
nih-twin-peaks/src/lib.rs:15-48).  Each launches its own sequential-exact
lp18_scan Pallas kernel padded from V=1 to 128 lanes — so the graph pays
the serial 1024-tick chain TWICE per block.  Both filters are independent
(same input, different coefficients), so one V=2 launch computes both in
parallel lanes for the cost of one.  A/B in one process:

  two : two V=1 lp18_scan launches (current twin_peaks shape)
  one : one V=2 lp18_scan launch (lanes = the two filters)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, SR = 1024, 48_000.0


def main():
    import jax
    import jax.numpy as jnp
    from oscen_tpu.ops.pallas.iir import lp18_scan

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B,), jnp.float32)
    ga, gb = jnp.float32(0.065), jnp.float32(0.125)
    h = jnp.float32(1.08)
    za = jnp.zeros((3, 1), jnp.float32)
    zb = jnp.zeros((3, 1), jnp.float32)
    z2 = jnp.zeros((3, 2), jnp.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def run_two(n):
        def step(carry, _):
            za, zb = carry
            ya, zan = lp18_scan(x[:, None], ga[None, None], h[None, None], za)
            yb, zbn = lp18_scan(x[:, None], gb[None, None], h[None, None], zb)
            return (zan, zbn), jnp.sum((ya - yb) ** 2)
        (_, _), e = jax.lax.scan(step, (za, zb), None, length=n)
        return jnp.sum(e)

    g2 = jnp.stack([ga, gb])[None, :]
    h2 = jnp.stack([h, h])[None, :]

    @functools.partial(jax.jit, static_argnums=0)
    def run_one(n):
        def step(carry, _):
            y, zn = lp18_scan(
                jnp.broadcast_to(x[:, None], (B, 2)), g2, h2, carry)
            return zn, jnp.sum((y[:, 0] - y[:, 1]) ** 2)
        _, e = jax.lax.scan(step, z2, None, length=n)
        return jnp.sum(e)

    # parity first: one block, both forms
    ya, _ = lp18_scan(x[:, None], ga[None, None], h[None, None], za)
    yb, _ = lp18_scan(x[:, None], gb[None, None], h[None, None], zb)
    y2, _ = lp18_scan(jnp.broadcast_to(x[:, None], (B, 2)), g2, h2, z2)
    da = float(jnp.max(jnp.abs(ya[:, 0] - y2[:, 0])))
    db = float(jnp.max(jnp.abs(yb[:, 0] - y2[:, 1])))
    print(f"[lp18abl] lane parity maxdiff a={da:.3g} b={db:.3g}", flush=True)

    runners = {"two": run_two, "one": run_one}
    t0 = time.time()
    for k, fn in runners.items():
        jax.block_until_ready(fn(4))
        print(f"[lp18abl] {k} ready {time.time()-t0:.0f}s", flush=True)

    def window(fn):
        def span(n):
            t = time.perf_counter()
            jax.block_until_ready(fn(n))
            return time.perf_counter() - t
        diffs = sorted(span(2048) - span(256) for _ in range(5))
        return max(diffs[2], 1e-9) / (2048 - 256) * 1e6

    results = {k: [] for k in runners}
    for i in range(8):
        line = []
        for k, fn in runners.items():
            results[k].append(window(fn))
            line.append(f"{k} {results[k][-1]:6.2f}")
        print(f"[lp18abl] w{i}: " + "  ".join(line), flush=True)
    for k, ws in results.items():
        ws.sort()
        med = ws[len(ws) // 2]
        print(f"{k:4s}: best {ws[0]:6.2f}  med {med:6.2f} us/block"
              f"  (best {B / SR / (ws[0] * 1e-6):6.0f}x RT)")


if __name__ == "__main__":
    main()
