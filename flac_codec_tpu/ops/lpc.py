"""Batched LPC analysis stack (device plane).

Window -> autocorrelation -> Levinson-Durbin -> expected-bits best order ->
error-feedback quantization -> integer residuals, all vectorized over the
batch axis and shape-static (orders padded to MAX_ORDER=32).  Mirrors the
host reference implementations in models/lpc.py (which mirror
reference: src/encode.rs:3274-3745); parity is pinned in
tests/test_device_ops.py.

Float work runs in f64 when JAX x64 is enabled (exact parity) or f32
(fast TPU mode); integer residual math is always exact int64.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.lpc import precision_for_block_size, window as host_window
from .common import BIG, round_half_away

MAX_ORDER = 32
MAX_SHIFT = 15
MIN_SHIFT = -16


def window_array(kind, n: int, dtype) -> jnp.ndarray:
    """Static window coefficients (host-generated, device-resident)."""
    return jnp.asarray(host_window(kind, n), dtype=dtype)


def autocorrelate(windowed: jnp.ndarray, max_order: int) -> jnp.ndarray:
    """(B, N) -> (B, max_order+1) autocorrelation lags.

    Each lag is one batched shifted multiply-reduce (VPU); lags are
    clamped to N-1 like the host's early-exit (zero beyond) so short
    blocks cannot produce wrap-around slices.
    """
    B, N = windowed.shape
    lags = []
    for j in range(max_order + 1):
        if j >= N:  # host: lags = min(max_order, n-1); rest are zero
            lags.append(jnp.zeros(B, windowed.dtype))
        else:
            lags.append((windowed[:, : N - j] * windowed[:, j:]).sum(axis=1))
    return jnp.stack(lags, axis=1)


def levinson(autoc: jnp.ndarray, max_order: int):
    """Batched Levinson-Durbin producing coefficients for ALL orders.

    (B, max_order+1) -> (all_coeffs (B, max_order, MAX_ORDER),
                         all_errors (B, max_order))
    Column j of order-o row holds c_j (j < o), zero-padded beyond.
    """
    B = autoc.shape[0]
    M = max_order
    j_idx = jnp.arange(MAX_ORDER)

    k0 = autoc[:, 1] / autoc[:, 0]
    coeffs = jnp.zeros((B, MAX_ORDER), autoc.dtype).at[:, 0].set(k0)
    err = autoc[:, 0] * (1.0 - k0 * k0)

    all_coeffs = jnp.zeros((B, M, MAX_ORDER), autoc.dtype).at[:, 0].set(coeffs)
    all_errs = jnp.zeros((B, M), autoc.dtype).at[:, 0].set(err)

    # reversed autocorrelation, right-padded so every loop iteration's
    # window is one contiguous dynamic_slice (TPU-friendly) instead of a
    # per-element gather: ar_pad[:, M-i+j] == autoc[:, i-j]
    ar_pad = jnp.pad(jnp.flip(autoc, axis=1), ((0, 0), (0, MAX_ORDER)))

    def body(i, carry):
        coeffs, err, all_coeffs, all_errs = carry
        # q = autoc[:, i+1] - sum_{j<i} autoc[:, i-j] * c_j
        a = jax.lax.dynamic_slice(ar_pad, (0, M - i), (B, MAX_ORDER))
        a = jnp.where(j_idx[None, :] < i, a, 0.0)
        q = jax.lax.dynamic_slice(autoc, (0, i + 1), (B, 1))[:, 0] \
            - (a * coeffs).sum(axis=1)
        k = q / err
        # c'_j = c_j - k * c_{i-1-j} (j < i); c'_i = k — the reversed
        # window is again one contiguous slice of the flipped coefficients
        cr_pad = jnp.pad(jnp.flip(coeffs, axis=1), ((0, 0), (0, MAX_ORDER)))
        rev = jax.lax.dynamic_slice(cr_pad, (0, MAX_ORDER - i), (B, MAX_ORDER))
        new = jnp.where(j_idx[None, :] < i, coeffs - k[:, None] * rev, 0.0)
        new = jnp.where(j_idx[None, :] == i, k[:, None], new)
        err = err * (1.0 - k * k)
        all_coeffs = jax.lax.dynamic_update_index_in_dim(
            all_coeffs, new, i, axis=1)
        all_errs = jax.lax.dynamic_update_index_in_dim(all_errs, err, i, axis=1)
        return new, err, all_coeffs, all_errs

    if M > 1:
        _, _, all_coeffs, all_errs = jax.lax.fori_loop(
            1, M, body, (coeffs, err, all_coeffs, all_errs))
    return all_coeffs, all_errs


def best_order(all_errs: jnp.ndarray, bits_per_sample, precision: int,
               sample_count: int):
    """Expected-bits order choice (reference: src/encode.rs:3655-3702).

    ``bits_per_sample`` may be scalar or (B,).  Returns (order (B,) int32
    1-based, valid (B,) bool).  take_while(error > 0) semantics: an order is
    only a candidate if every error up to it is > 0.
    """
    B, M = all_errs.shape
    orders = jnp.arange(1, M + 1)
    error_scale = 0.5 / float(sample_count)
    ln2x2 = 2.0 * np.log(2.0)

    pos = all_errs > 0.0
    available = jnp.cumprod(pos.astype(jnp.int32), axis=1).astype(bool)

    bps = jnp.asarray(bits_per_sample)
    if bps.ndim == 0:
        bps = jnp.broadcast_to(bps, (B,))
    header_bits = orders[None, :] * (bps[:, None] + precision)
    bits_per_residual = jnp.log(all_errs * error_scale) / ln2x2
    bits = bits_per_residual * (sample_count - orders[None, :]) + header_bits
    bits = jnp.where(available, bits, jnp.inf)
    order = jnp.argmin(bits, axis=1) + 1
    valid = available[:, 0]
    return order.astype(jnp.int32), valid


def quantize(coeffs: jnp.ndarray, order: jnp.ndarray, precision: int):
    """Batched error-feedback quantization (reference:
    src/encode.rs:3334-3401).

    coeffs: (B, MAX_ORDER) float (zero beyond order); order: (B,) int.
    Returns (shift (B,) int32, qcoeffs (B, MAX_ORDER) int32, valid (B,)).
    """
    B = coeffs.shape[0]
    j_idx = jnp.arange(MAX_ORDER)
    in_order = j_idx[None, :] < order[:, None]

    max_coeff = (1 << (precision - 1)) - 1
    min_coeff = -(1 << (precision - 1))

    l = jnp.max(jnp.where(in_order, jnp.abs(coeffs), 0.0), axis=1)
    nonzero = l > 0.0

    log2l = jnp.floor(jnp.log2(jnp.where(nonzero, l, 1.0))).astype(jnp.int32)
    shift_raw = jnp.minimum((precision - 1) - log2l - 1, MAX_SHIFT)
    neg_shift_ok = shift_raw >= MIN_SHIFT
    shift = jnp.maximum(shift_raw, 0)
    # scale = 2^shift for shift >= 0, else 1 / 2^(-shift)
    scale = jnp.where(
        shift_raw >= 0,
        jnp.exp2(shift_raw.astype(coeffs.dtype)),
        1.0 / jnp.exp2((-shift_raw).astype(coeffs.dtype)))

    def body(j, carry):
        err, out = carry
        c = jax.lax.dynamic_index_in_dim(coeffs, j, axis=1, keepdims=False)
        active = j < order
        s = c * scale + err
        q = jnp.clip(round_half_away(s), min_coeff, max_coeff)
        new_err = jnp.where(active, s - q, err)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(active, q, 0.0).astype(jnp.int32).astype(out.dtype),
            j, axis=1)
        return new_err, out

    err0 = jnp.zeros(B, coeffs.dtype)
    out0 = jnp.zeros((B, MAX_ORDER), jnp.int32)
    _, qcoeffs = jax.lax.fori_loop(0, MAX_ORDER, body, (err0, out0))
    valid = nonzero & neg_shift_ok
    return shift.astype(jnp.int32), qcoeffs, valid


def residuals(x: jnp.ndarray, qcoeffs: jnp.ndarray, order: jnp.ndarray,
              shift: jnp.ndarray, max_taps: int = MAX_ORDER):
    """Batched integer LPC residuals
    r[n] = x[n] - ((sum_j q_j x[n-1-j]) >> shift), n >= order
    (reference: src/encode.rs:3174-3203).

    x: (B, N) int64; qcoeffs: (B, MAX_ORDER) int32 zero-padded; only the
    first ``max_taps`` taps can be nonzero (the configured max LPC order).
    Returns (res (B, N) int64 valid at positions >= order, overflow (B,)).
    """
    B, N = x.shape
    acc = jnp.zeros((B, N), jnp.int64)
    q64 = qcoeffs.astype(jnp.int64)
    for j in range(min(max_taps, MAX_ORDER)):
        # x[n-1-j] with left zero-pad
        shifted = jnp.pad(x, ((0, 0), (j + 1, 0)))[:, :N]
        acc = acc + q64[:, j:j + 1] * shifted
    pred = jax.lax.shift_right_arithmetic(
        acc, shift.astype(jnp.int64)[:, None])
    res = x - pred
    idx = jnp.arange(N)
    in_res = idx[None, :] >= order[:, None]
    res = jnp.where(in_res, res, 0)
    overflow = (jnp.max(jnp.where(in_res, res, 0), axis=1) > (1 << 31) - 1) | \
               (jnp.min(jnp.where(in_res, res, 0), axis=1) < -(1 << 31))
    return res, overflow


def analyze(x: jnp.ndarray, win: jnp.ndarray, max_order: int,
            bits_per_sample, block_size: int):
    """Full LPC parameter selection for a batch of channels.

    Float math runs in ``win.dtype`` (f64 for exact reference parity, f32
    for TPU speed — either yields valid streams since residuals are exact
    integer math).  Returns dict with order, shift, qcoeffs, residuals,
    valid (all batched).
    """
    precision = precision_for_block_size(block_size)
    windowed = x.astype(win.dtype) * win[None, :]
    autoc = autocorrelate(windowed, max_order)
    all_coeffs, all_errs = levinson(autoc, max_order)
    order, order_valid = best_order(all_errs, bits_per_sample, precision,
                                    block_size)
    # row pick as a masked chain over the (small) order axis — gather-free
    coeffs = all_coeffs[:, 0]
    for o in range(1, all_coeffs.shape[1]):
        coeffs = jnp.where((order == o + 1)[:, None], all_coeffs[:, o], coeffs)
    shift, qcoeffs, quant_valid = quantize(coeffs, order, precision)
    res, overflow = residuals(x, qcoeffs, order, shift, max_taps=max_order)
    # all-zero quantized coefficients are also rejected by the reference's
    # bitstream layer only at write time; the ZeroLpCoefficients check
    # happens pre-quantization via l > 0 (covered by quant_valid)
    return {
        "order": order,
        "precision": precision,
        "shift": shift,
        "qcoeffs": qcoeffs,
        "residuals": res,
        "valid": order_valid & quant_valid & ~overflow,
    }
