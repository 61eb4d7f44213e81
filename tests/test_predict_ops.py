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
