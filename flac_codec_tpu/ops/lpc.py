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

    Unrolled over the (static, small) order axis: the whole recursion is
    one fused elementwise DAG over (B,) columns — max_order is 8-32, so a
    sequential device loop would be pure per-iteration launch latency,
    B-independent and dominating small production batches.
    """
    B = autoc.shape[0]
    M = max_order

    k0 = autoc[:, 1] / autoc[:, 0]
    err = autoc[:, 0] * (1.0 - k0 * k0)
    coeffs = [k0]            # list of (B,) coefficient columns, len == order
    rows = [coeffs]
    errs = [err]
    for i in range(1, M):
        # q = autoc[:, i+1] - sum_{j<i} autoc[:, i-j] * c_j
        q = autoc[:, i + 1]
        for j in range(i):
            q = q - autoc[:, i - j] * coeffs[j]
        k = q / err
        # c'_j = c_j - k * c_{i-1-j} (j < i); c'_i = k
        coeffs = [coeffs[j] - k * coeffs[i - 1 - j] for j in range(i)] + [k]
        err = err * (1.0 - k * k)
        rows.append(coeffs)
        errs.append(err)

    zero = jnp.zeros(B, autoc.dtype)
    all_coeffs = jnp.stack(
        [jnp.stack(r + [zero] * (MAX_ORDER - len(r)), axis=1) for r in rows],
        axis=1)
    all_errs = jnp.stack(errs, axis=1)
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


def quantize(coeffs: jnp.ndarray, order: jnp.ndarray, precision: int,
             max_taps: int = MAX_ORDER):
    """Batched error-feedback quantization (reference:
    src/encode.rs:3334-3401).

    coeffs: (B, MAX_ORDER) float (zero beyond order); order: (B,) int.
    Returns (shift (B,) int32, qcoeffs (B, MAX_ORDER) int32, valid (B,)).

    The error-feedback chain is sequential in the tap index; it is
    unrolled over the static ``max_taps`` (the configured max LPC order)
    so it compiles to one fused DAG of (B,) ops instead of MAX_ORDER
    latency-bound loop iterations.
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

    err = jnp.zeros(B, coeffs.dtype)
    cols = []
    for j in range(min(max_taps, MAX_ORDER)):
        active = j < order
        s = coeffs[:, j] * scale + err
        q = jnp.clip(round_half_away(s), min_coeff, max_coeff)
        err = jnp.where(active, s - q, err)
        cols.append(jnp.where(active, q, 0.0).astype(jnp.int32))
    qcoeffs = jnp.stack(cols, axis=1)
    if len(cols) < MAX_ORDER:
        qcoeffs = jnp.pad(qcoeffs, ((0, 0), (0, MAX_ORDER - len(cols))))
    valid = nonzero & neg_shift_ok
    return shift.astype(jnp.int32), qcoeffs, valid


# 11-bit limbs: 3 limbs cover any int32 sample (hi = x >> 22 keeps sign),
# and every partial dot stays int32-exact: 32 taps * 2^14 * 2^11 = 2^30
_RLIMB = 11


def _residuals_i32(x: jnp.ndarray, qcoeffs: jnp.ndarray, order: jnp.ndarray,
                   shift: jnp.ndarray, max_taps: int,
                   max_sample_bits: int | None = None):
    """All-int32 limb formulation of :func:`residuals` for narrow panels.

    Same technique as the decode kernel's 3/4-limb modes
    (ops/predict_pallas.py): the 64-bit dot product is three int32
    partial sums over 11-bit sample limbs, assembled into a
    carry-propagated (hi, lo) int32 pair, funnel-shifted by the (>= 0)
    quantization shift, and subtracted from x as a 64-bit pair — so the
    returned panel wraps exactly like the int64 path's narrow cast and
    the per-row overflow flag is exact (res fits int32 iff
    res_hi == res_lo >> 31).  Avoids every int64 op on the (B, N)
    panels, which XLA emulates on TPU at several times int32 cost.

    When the caller can bound |x| < 2^(2*_RLIMB - 1) statically
    (``max_sample_bits <= 21``, e.g. 16-bit audio incl. the +1-bit side
    channel), the top limb is identically zero and the tap loop runs on
    two limbs instead of three — the loop is the planner's single
    hottest fusion, so this cuts a third of its panel traffic.
    """
    B, N = x.shape
    K = _RLIMB
    m = (1 << K) - 1
    two_limb = max_sample_bits is not None and max_sample_bits <= 2 * K
    # 2-limb exactness: |x| < 2^22 makes x_mid = x >> 11 an 11-bit signed
    # limb (unmasked, sign-carrying), so every partial product
    # |q|*|limb| <= 2^14 * 2^10 stays int32-exact over 32 taps and the
    # top limb is identically zero.
    x_mid = jax.lax.shift_right_arithmetic(x, jnp.int32(K))
    if not two_limb:
        x_hi = jax.lax.shift_right_arithmetic(x, jnp.int32(2 * K))
        x_mid = x_mid & m
    x_lo = x & m
    s_hi = jnp.zeros((B, N), jnp.int32)
    s_mid = jnp.zeros((B, N), jnp.int32)
    s_lo = jnp.zeros((B, N), jnp.int32)
    for j in range(min(max_taps, MAX_ORDER)):
        q = qcoeffs[:, j:j + 1]
        pad = ((0, 0), (j + 1, 0))
        if not two_limb:
            s_hi = s_hi + q * jnp.pad(x_hi, pad)[:, :N]
        s_mid = s_mid + q * jnp.pad(x_mid, pad)[:, :N]
        s_lo = s_lo + q * jnp.pad(x_lo, pad)[:, :N]
    # two_limb: s_hi stays all-zero; XLA folds the zero add64 away

    def add64(hi_a, lo_a, hi_b, lo_b):
        lo = lo_a + lo_b
        c = (lo.astype(jnp.uint32) < lo_a.astype(jnp.uint32)).astype(
            jnp.int32)
        return hi_a + hi_b + c, lo

    # acc = s_hi*2^22 + s_mid*2^11 + s_lo as an exact (hi, lo) pair
    hi, lo = s_lo >> 31, s_lo
    hi, lo = add64(hi, lo, s_mid >> (32 - K), s_mid << K)
    hi, lo = add64(hi, lo, s_hi >> (32 - 2 * K), s_hi << (2 * K))
    # pred = acc >> s (s in 0..15): funnel shift, exact for any s >= 0
    s = shift.astype(jnp.int32)[:, None]
    sh2 = 32 - jnp.maximum(s, 1)
    pred_lo = jnp.where(
        s == 0, lo,
        (hi << sh2) | (lo.astype(jnp.uint32)
                       >> s.astype(jnp.uint32)).astype(jnp.int32))
    pred_hi = jax.lax.shift_right_arithmetic(hi, s)
    # res = x - pred as a 64-bit pair (x sign-extends)
    res_lo = x - pred_lo
    borrow = (x.astype(jnp.uint32)
              < pred_lo.astype(jnp.uint32)).astype(jnp.int32)
    res_hi = (x >> 31) - pred_hi - borrow
    idx = jnp.arange(N)
    in_res = idx[None, :] >= order[:, None]
    res = jnp.where(in_res, res_lo, 0)
    bad = in_res & (res_hi != (res_lo >> 31))
    return res, bad.any(axis=1)


def residuals(x: jnp.ndarray, qcoeffs: jnp.ndarray, order: jnp.ndarray,
              shift: jnp.ndarray, max_taps: int = MAX_ORDER,
              max_sample_bits: int | None = None):
    """Batched integer LPC residuals
    r[n] = x[n] - ((sum_j q_j x[n-1-j]) >> shift), n >= order
    (reference: src/encode.rs:3174-3203).

    x: (B, N) int64 or int32 (narrow analysis mode); qcoeffs: (B,
    MAX_ORDER) int32 zero-padded; only the first ``max_taps`` taps can be
    nonzero (the configured max LPC order).
    Returns (res (B, N) in x's dtype, valid at positions >= order,
    overflow (B,)).  The math is always exact 64-bit; in narrow mode an
    int32-overflowing residual wraps in the returned panel, but
    ``overflow`` flags it and the planner discards the candidate.  The
    narrow path runs entirely in int32 limb arithmetic (bit-identical to
    the int64 path, pinned in tests/test_device_ops.py).
    """
    B, N = x.shape
    if x.dtype == jnp.int32:
        return _residuals_i32(x, qcoeffs, order, shift, max_taps,
                              max_sample_bits)
    acc = jnp.zeros((B, N), jnp.int64)
    q64 = qcoeffs.astype(jnp.int64)
    for j in range(min(max_taps, MAX_ORDER)):
        # x[n-1-j] with left zero-pad
        shifted = jnp.pad(x, ((0, 0), (j + 1, 0)))[:, :N]
        acc = acc + q64[:, j:j + 1] * shifted.astype(jnp.int64)
    pred = jax.lax.shift_right_arithmetic(
        acc, shift.astype(jnp.int64)[:, None])
    res = x.astype(jnp.int64) - pred
    idx = jnp.arange(N)
    in_res = idx[None, :] >= order[:, None]
    res = jnp.where(in_res, res, 0)
    overflow = (jnp.max(res, axis=1) > (1 << 31) - 1) | \
               (jnp.min(res, axis=1) < -(1 << 31))
    return res.astype(x.dtype), overflow


def analyze(x: jnp.ndarray, win: jnp.ndarray, max_order: int,
            bits_per_sample, block_size: int,
            max_sample_bits: int | None = None):
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
    shift, qcoeffs, quant_valid = quantize(coeffs, order, precision,
                                           max_taps=max_order)
    res, overflow = residuals(x, qcoeffs, order, shift, max_taps=max_order,
                              max_sample_bits=max_sample_bits)
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
