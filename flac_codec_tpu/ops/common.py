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
