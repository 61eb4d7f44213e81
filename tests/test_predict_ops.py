"""Device decode-side LPC synthesis scan vs the host/native recurrence."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from flac_codec_tpu.decode import predict
from flac_codec_tpu.ops.predict import predict_batch


def test_predict_batch_matches_host():
    rng = np.random.default_rng(0)
    B, N = 6, 256
    orders = [1, 2, 4, 8, 12, 32]
    x = np.zeros((B, N), dtype=np.int64)
    q = np.zeros((B, 32), dtype=np.int64)
    shifts = np.zeros(B, dtype=np.int32)
    expected = np.zeros((B, N), dtype=np.int64)
    for b, order in enumerate(orders):
        coeffs = rng.integers(-2000, 2000, order)
        shift = int(rng.integers(5, 14))
        warm = rng.integers(-30000, 30000, order)
        res = rng.integers(-100, 100, N - order)
        buf = np.concatenate([warm, res]).astype(np.int64)
        x[b] = buf
        q[b, :order] = coeffs
        shifts[b] = shift
        host = buf.copy()
        predict(coeffs.astype(np.int32), shift, host)
        expected[b] = host
    got = predict_batch(jnp.asarray(x), jnp.asarray(q), jnp.asarray(shifts),
                        jnp.asarray(np.array(orders, dtype=np.int32)), N)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_predict_batch_fixed_orders():
    """Fixed-predictor coefficient rows run through the same scan."""
    from flac_codec_tpu.format.subframe import FIXED_COEFFS

    rng = np.random.default_rng(1)
    N = 128
    for order in range(5):
        signal = np.cumsum(rng.integers(-10, 10, N)).astype(np.int64)
        # compute residuals then reconstruct
        from flac_codec_tpu.models.fixed import fixed_diffs

        diffs = fixed_diffs(signal)
        if order >= len(diffs):
            continue
        buf = (np.concatenate([signal[:order], diffs[order]])
               if order else signal.copy()).astype(np.int64)
        q = np.zeros((1, 32), dtype=np.int64)
        q[0, :order] = FIXED_COEFFS[order]
        got = predict_batch(
            jnp.asarray(buf[None, :]), jnp.asarray(q),
            jnp.zeros(1, jnp.int32), jnp.asarray([order], jnp.int32), N)
        np.testing.assert_array_equal(np.asarray(got)[0], signal)


def test_predict_fixed_batch_matches_scan():
    """k-fold-cumsum inverse == the sequential scan for FIXED rows."""
    from flac_codec_tpu.ops.predict import (FIXED_ROWS, fixed_compatible_mask,
                                            predict_fixed_batch)

    rng = np.random.default_rng(7)
    N = 192
    B = 10
    orders = np.array([0, 1, 2, 3, 4, 4, 3, 2, 1, 0], dtype=np.int32)
    x = np.zeros((B, N), dtype=np.int64)
    q = np.zeros((B, 32), dtype=np.int64)
    for b, order in enumerate(orders):
        q[b, :4] = FIXED_ROWS[order]
        x[b, :order] = rng.integers(-30000, 30000, order)
        x[b, order:] = rng.integers(-500, 500, N - order)
    shifts = np.zeros(B, dtype=np.int32)
    assert fixed_compatible_mask(q, shifts, orders).all()
    ref = predict_batch(jnp.asarray(x), jnp.asarray(q), jnp.asarray(shifts),
                        jnp.asarray(orders), N)
    got = predict_fixed_batch(jnp.asarray(x), jnp.asarray(orders), N)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fixed_compatible_mask_rejects_lpc():
    from flac_codec_tpu.ops.predict import fixed_compatible_mask

    q = np.zeros((3, 32), dtype=np.int64)
    q[0, :2] = [2, -1]          # fixed order 2
    q[1, :2] = [2, -2]          # not a fixed row
    q[2, :2] = [2, -1]          # fixed taps but nonzero shift
    mask = fixed_compatible_mask(
        q, np.array([0, 0, 3]), np.array([2, 2, 2]))
    assert mask.tolist() == [True, False, False]


def test_predict_batch_taps_bucket():
    """Smaller static tap buckets give identical results."""
    rng = np.random.default_rng(9)
    B, N = 4, 256
    orders = np.array([2, 5, 8, 8], dtype=np.int32)
    x = rng.integers(-2000, 2000, (B, N)).astype(np.int64)
    q = np.zeros((B, 32), dtype=np.int64)
    for b, o in enumerate(orders):
        q[b, :o] = rng.integers(-2000, 2000, o)
    shifts = np.full(B, 11, dtype=np.int32)
    full = predict_batch(jnp.asarray(x), jnp.asarray(q), jnp.asarray(shifts),
                         jnp.asarray(orders), N)
    small = predict_batch(jnp.asarray(x), jnp.asarray(q), jnp.asarray(shifts),
                          jnp.asarray(orders), N, taps=8)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(small))


# ---------------------------------------------------------------------------
# Pallas kernel (ops/predict_pallas.py) — interpret mode on CPU; the gated
# domain must be bit-identical to the int64 XLA scan.
# ---------------------------------------------------------------------------

def _stable_lpc_batch(seed, B, N, max_order=12, sample_bits=12,
                      shifts=(10, 14), q_bits=11):
    """Residuals built by running the forward predictor over bounded
    samples, so the inverse recurrence stays in the Pallas gate's domain."""
    rng = np.random.default_rng(seed)
    orders = rng.integers(0, max_order + 1, B)
    q = np.zeros((B, 32), np.int64)
    shift = np.zeros(B, np.int64)
    x = np.zeros((B, N), np.int64)
    for b in range(B):
        o = int(orders[b])
        y = rng.integers(-(1 << sample_bits), 1 << sample_bits, N)
        if o:
            s = int(rng.integers(*shifts))
            shift[b] = s
            q[b, :o] = rng.integers(-(1 << q_bits), 1 << q_bits, o)
            res = y.copy()
            for n in range(o, N):
                acc = int((q[b, :o] * y[n - o:n][::-1]).sum())
                res[n] = y[n] - (acc >> s)
            x[b] = res
            x[b, :o] = y[:o]
        else:
            x[b] = y
    return x, q, shift, orders


def test_pallas_predict_matches_scan_interpret():
    from flac_codec_tpu.ops.predict_pallas import (pallas_predict_ok,
                                                   predict_batch_pallas)

    for taps in (8, 16):
        x, q, shift, orders = _stable_lpc_batch(3 + taps, 12, 192,
                                                max_order=taps - 4)
        assert pallas_predict_ok(x, q, shift, orders, 16, taps) == 2
        ref = predict_batch(jnp.asarray(x), jnp.asarray(q),
                            jnp.asarray(shift), jnp.asarray(orders),
                            x.shape[1], taps=taps)
        got = predict_batch_pallas(jnp.asarray(x), jnp.asarray(q),
                                   jnp.asarray(shift), jnp.asarray(orders),
                                   x.shape[1], taps=taps, limbs=2,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_predict_3limb_24bit_interpret():
    """24-bit-class samples take the 3-limb mode; small shifts are legal."""
    from flac_codec_tpu.ops.predict_pallas import (pallas_predict_ok,
                                                   predict_batch_pallas)

    # wide samples with normal shifts, plus small samples with tiny
    # shifts (legal since the wrap-exact decomposition needs no lower
    # shift bound)
    x, q, shift, orders = _stable_lpc_batch(21, 10, 192, max_order=12,
                                            sample_bits=20, shifts=(10, 16),
                                            q_bits=9)
    x2, q2, shift2, orders2 = _stable_lpc_batch(22, 10, 192, max_order=8,
                                                sample_bits=10, shifts=(1, 6),
                                                q_bits=6)
    x = np.concatenate([x, x2]); q = np.concatenate([q, q2])
    shift = np.concatenate([shift, shift2])
    orders = np.concatenate([orders, orders2])
    mode = pallas_predict_ok(x, q, shift, orders, 24, 16)
    assert mode == 3
    ref = predict_batch(jnp.asarray(x), jnp.asarray(q),
                        jnp.asarray(shift), jnp.asarray(orders),
                        x.shape[1], taps=16)
    got = predict_batch_pallas(jnp.asarray(x), jnp.asarray(q),
                               jnp.asarray(shift), jnp.asarray(orders),
                               x.shape[1], taps=16, limbs=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_gate_modes():
    from flac_codec_tpu.ops.predict_pallas import pallas_predict_ok

    x, q, shift, orders = _stable_lpc_batch(7, 6, 64)
    assert pallas_predict_ok(x, q, shift, orders, 16, 16) == 2
    # 24-bit streams use the 3-limb mode
    assert pallas_predict_ok(x, q, shift, orders, 24, 16) == 3
    # 16-bit-labelled batch with wide residuals falls through to 3-limb
    x2 = x.copy()
    x2[0, -1] = 1 << 18
    assert pallas_predict_ok(x2, q, shift, orders, 16, 16) == 3
    # a shift beyond the 2-limb boundary falls back to the 64-bit mode
    bad = shift.copy()
    bad[orders > 0] = 14
    if (orders > 0).any():
        assert pallas_predict_ok(x, q, bad, orders, 16, 16) == 3
    # 32-bit-wide samples take the 4-limb mode (round 3)
    x3 = x.copy()
    x3[0, -1] = 1 << 26
    assert pallas_predict_ok(x3, q, shift, orders, 32, 16) == 4
    # values past int32 (33-bit side channels) still reject
    x4 = x.copy().astype(np.int64)
    x4[0, -1] = 1 << 31
    assert pallas_predict_ok(x4, q, shift, orders, 32, 16) == 0


def test_pallas_predict_4limb_32bit_interpret():
    """32-bit-wide samples take the 4-limb mode (any shift, any
    int32-representable value; VERDICT r2 item 6)."""
    from flac_codec_tpu.ops.predict_pallas import (pallas_predict_ok,
                                                   predict_batch_pallas)

    # near-full-scale 32-bit samples with extreme shifts, plus a
    # tiny-shift set, plus an order-0 verbatim-ish lane
    x, q, shift, orders = _stable_lpc_batch(31, 8, 192, max_order=12,
                                            sample_bits=28, shifts=(12, 16),
                                            q_bits=12)
    x2, q2, shift2, orders2 = _stable_lpc_batch(32, 8, 192, max_order=8,
                                                sample_bits=24, shifts=(1, 4),
                                                q_bits=5)
    x = np.concatenate([x, x2]); q = np.concatenate([q, q2])
    shift = np.concatenate([shift, shift2])
    orders = np.concatenate([orders, orders2])
    mode = pallas_predict_ok(x, q, shift, orders, 32, 16)
    assert mode == 4
    ref = predict_batch(jnp.asarray(x), jnp.asarray(q),
                        jnp.asarray(shift), jnp.asarray(orders),
                        x.shape[1], taps=16)
    # the inverse recurrence must stay int32-representable for the
    # wrap-exactness argument; the stable generator guarantees it
    assert np.abs(np.asarray(ref)).max() < 1 << 31
    got = predict_batch_pallas(jnp.asarray(x), jnp.asarray(q),
                               jnp.asarray(shift), jnp.asarray(orders),
                               x.shape[1], taps=16, limbs=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
