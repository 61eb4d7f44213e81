"""Stereo decorrelation candidates, batched.

The reference computes average/difference channels with running abs-sums in
one pass (reference: src/encode.rs:2463-2674); here the whole batch's four
candidate channels come out of two vectorized elementwise ops.
Channel index convention used throughout the device plane:
    0 = left, 1 = right, 2 = mid ((l+r)>>1), 3 = side (l-r).
"""

from __future__ import annotations

import jax.numpy as jnp

# candidate channel pairs per assignment, in the reference's tie-break order
# (reference: src/encode.rs:2506-2518): independent, left-side, side-right,
# mid-side.  Values are (channel-assignment code, ch0 index, ch1 index).
ASSIGNMENTS = (
    (0b0001, 0, 1),  # independent stereo
    (0b1000, 0, 3),  # left-side
    (0b1001, 3, 1),  # side-right
    (0b1010, 2, 3),  # mid-side
)


def candidates(pcm: jnp.ndarray, dtype=jnp.int64) -> jnp.ndarray:
    """(B, 2, N) int32 -> (B, 4, N) candidate channels [L, R, M, S].

    ``dtype`` may be int32 when the input samples fit 26 bits (side needs
    one extra bit and l+r one more transiently) — the planner's narrow
    analysis mode, which halves HBM traffic on every panel pass.
    """
    x = pcm.astype(dtype)
    left, right = x[:, 0], x[:, 1]
    mid = (left + right) >> 1
    side = left - right
    return jnp.stack([left, right, mid, side], axis=1)


def candidate_bps(bits_per_sample: int) -> tuple:
    """Bits per sample for each candidate channel (side gets +1)."""
    return (bits_per_sample, bits_per_sample, bits_per_sample,
            bits_per_sample + 1)
