"""Functional ring buffer with linear/cubic fractional reads.

Port of the reference RingBuffer
(/root/reference/oscen-lib/src/ring_buffer/mod.rs): power-of-two capacity
with mask wrapping, near-integer snap at 1e-6, Catmull-Rom cubic
interpolation for fractional offsets.  The buffer is a plain array in the
state pytree (HBM-resident between blocks); reads are gathers, writes are
scatter updates — both batchable across voices with a leading axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def next_power_of_two(n: int) -> int:
    n = max(int(n), 1)
    return 1 << (n - 1).bit_length()


def rb_new(size: int, dtype=jnp.float32):
    """Allocate a zeroed power-of-two ring buffer (buf, write_pos)."""
    cap = next_power_of_two(size)
    return jnp.zeros((cap,), dtype), jnp.int32(0)


def rb_push(buf, write_pos, v):
    """Write at write_pos, advance with mask wrap (reference :57-76)."""
    cap = buf.shape[-1]
    buf = buf.at[..., write_pos].set(v)
    return buf, (write_pos + 1) & (cap - 1)


def _read_pos(write_pos, offset, cap):
    """Float read index for ``offset`` samples into the past
    (reference :80-91)."""
    n = jnp.float32(cap)
    rp = write_pos.astype(jnp.float32) - offset - 1.0
    return jnp.mod(jnp.mod(rp, n) + n, n)


def rb_get(buf, write_pos, offset):
    """Read ``offset`` samples into the past (0 = most recent), with the
    reference's near-integer snap and Catmull-Rom interpolation
    (reference :121-201).  ``offset`` may be fractional and batched."""
    cap = buf.shape[-1]
    mask = cap - 1
    off = jnp.maximum(offset, 0.0)
    frac_raw = off - jnp.floor(off)

    # Near-integer snap (reference :178-191).
    snap = jnp.logical_or(frac_raw < 1e-6, (1.0 - frac_raw) < 1e-6)
    off_int = jnp.round(off).astype(jnp.int32)
    snap_idx = ((write_pos + cap) - jnp.mod(off_int, cap) - 1) & mask
    snapped = buf[..., snap_idx]

    # Catmull-Rom cubic (reference :121-164).
    rp = _read_pos(write_pos, off, cap)
    i = rp.astype(jnp.int32)
    f = rp - jnp.floor(rp)
    im1 = (i - 1) & mask
    i0 = i & mask
    i1 = (i + 1) & mask
    i2 = (i + 2) & mask
    v0 = buf[..., im1]
    v1 = buf[..., i0]
    v2 = buf[..., i1]
    v3 = buf[..., i2]
    c0 = v1
    c1 = 0.5 * (v2 - v0)
    c2 = v0 - 2.5 * v1 + 2.0 * v2 - 0.5 * v3
    c3 = 0.5 * (v3 - v0) + 1.5 * (v1 - v2)
    cubic = c0 + f * (c1 + f * (c2 + f * c3))

    return jnp.where(snap, snapped, cubic)


def rb_get_linear(buf, write_pos, offset):
    """Linear-interpolated read (reference :94-118), without the snap."""
    cap = buf.shape[-1]
    mask = cap - 1
    rp = _read_pos(write_pos, jnp.maximum(offset, 0.0), cap)
    i = rp.astype(jnp.int32)
    f = rp - jnp.floor(rp)
    a = buf[..., i & mask]
    b = buf[..., (i + 1) & mask]
    return a * (1.0 - f) + b * f
