"""Shared dtype/config helpers for the device plane."""

from __future__ import annotations

import jax
import jax.numpy as jnp

I64 = jnp.int64
I32 = jnp.int32

# sentinel "invalid candidate" bit cost (plain int: keeps module import from
# initializing a backend)
BIG = 1 << 62

# subframe type codes shared by the planner and the packers
TYPE_CONSTANT = 0
TYPE_VERBATIM = 1
TYPE_FIXED = 2
TYPE_LPC = 3


def analysis_dtype(requested=None):
    """f64 when JAX x64 is enabled (bit-parity with the reference's f64
    math), else f32 (fast TPU mode; still produces valid FLAC streams)."""
    if requested is not None:
        return requested
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def round_half_away(x):
    """Rust f64::round semantics (half away from zero)."""
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


_PS_T = 128  # prefix-sum chunk width (one MXU tile)


def prefix_sum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact inclusive prefix sum along axis 1 for non-negative int32.

    ``jnp.cumsum`` on a (B, N) panel lowers to ~log2(N) reduce-window
    passes on TPU (each a full HBM round-trip); this runs ONE triangular
    (128, 128) matmul per 16-bit half on the MXU plus a tiny (B, N/128)
    chunk-total cumsum.  Exactness: each half's values are < 2^16, so a
    128-wide f32 dot stays < 2^23 (integers exact in f32); halves are
    recombined in int32, and the chunk-total carry runs in int32.
    Requires row sums < 2^31 (callers clamp element magnitudes).
    """
    B, N = x.shape
    assert x.dtype == jnp.int32 and N % _PS_T == 0, (x.dtype, N)
    C = N // _PS_T
    tri = jnp.tril(jnp.ones((_PS_T, _PS_T), jnp.float32))
    lo = (x & 0xFFFF).astype(jnp.float32).reshape(B * C, _PS_T)
    hi = jax.lax.shift_right_logical(x, jnp.int32(16)).astype(
        jnp.float32).reshape(B * C, _PS_T)
    # within-chunk inclusive prefix: pre[i] = sum_{j<=i} v[j]
    pre = (jnp.dot(lo, tri.T, preferred_element_type=jnp.float32)
           .astype(jnp.int32)
           + (jnp.dot(hi, tri.T, preferred_element_type=jnp.float32)
              .astype(jnp.int32) << 16)).reshape(B, C, _PS_T)
    totals = pre[:, :, -1]                        # (B, C) chunk sums
    carry = jnp.cumsum(totals, axis=1) - totals   # exclusive, tiny panel
    return (pre + carry[:, :, None]).reshape(B, N)
