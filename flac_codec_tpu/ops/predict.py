"""Batched LPC synthesis (decode side) — the sequential recurrence
x[n] += (sum_j q_j x[n-1-j]) >> shift evaluated as a lax.scan over sample
positions with the batch axis supplying the parallelism
(SURVEY §7 "blockwise scan ... batch/channel vectorization"; the exact
``>> shift`` truncation forbids associative-scan reformulations, reference:
src/decode.rs:1738-1752).

One scan handles every subframe in the batch regardless of its predictor
order: coefficients are zero-padded to 32 taps and positions below the
order pass warm-up samples through unchanged.

Role note: on TPU this int64 scan is the exactness FALLBACK (32-bit-wide
streams, off-gate batches, sharded meshes); the production decode path is
the VMEM-resident Pallas kernel in ops/predict_pallas.py (~100x faster —
XLA sequences each per-sample op through HBM with ~1.3 us of fixed
overhead), and FIXED-predictor batches take the k-fold-cumsum inverse
below, which needs no sequential step at all.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

MAX_ORDER = 32

# fixed-predictor taps, most recent first, padded to 4
# (reference: src/stream.rs:1534 FIXED_COEFFS)
FIXED_ROWS = np.array([[0, 0, 0, 0],
                       [1, 0, 0, 0],
                       [2, -1, 0, 0],
                       [3, -3, 1, 0],
                       [4, -6, 4, -1]], dtype=np.int64)


@partial(jax.jit, static_argnames=("block_size", "chunk", "taps"))
def predict_batch(x: jnp.ndarray, qcoeffs: jnp.ndarray, shift: jnp.ndarray,
                  order: jnp.ndarray, block_size: int,
                  chunk: int = 16, taps: int = MAX_ORDER) -> jnp.ndarray:
    """Reconstruct subframe samples for a batch.

    x: (B, N) int64 — warm-up samples at positions < order, residuals at
       positions >= order.
    qcoeffs: (B, >=taps) int64 (zero beyond order, "most recent first").
    shift, order: (B,).
    taps: static tap count; callers pass the smallest bucket >= max(order)
       so low-order batches do proportionally less MAC work.

    Returns (B, N) int64 reconstructed samples.

    The recurrence is sequential in n (the exact ``>> shift`` truncation
    forbids associative reformulations), but each lax.scan step advances
    ``chunk`` samples with an unrolled inner recurrence, so the number of
    device loop iterations is N/chunk — per-step overhead amortizes while
    the (B, taps) tap MAC stays batch-vectorized.
    """
    B, N = x.shape
    assert N == block_size
    q = qcoeffs[:, :taps].astype(jnp.int64)  # (B, taps)
    shift64 = shift.astype(jnp.int64)
    order = order.astype(jnp.int32)

    pad = (-N) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    nsteps = (N + pad) // chunk
    # (nsteps, chunk, B): scan-major, in-chunk position, batch
    xc = x.T.reshape(nsteps, chunk, B)
    ns = jnp.arange(nsteps * chunk, dtype=jnp.int32).reshape(nsteps, chunk)

    def step(carry, inp):
        # carry: (B, taps) last samples, most recent at column 0
        ncol, xin = inp
        outs = []
        for i in range(chunk):
            acc = (q * carry).sum(axis=1)
            pred = jax.lax.shift_right_arithmetic(acc, shift64)
            out = jnp.where(ncol[i] >= order, xin[i] + pred, xin[i])
            outs.append(out)
            carry = jnp.concatenate([out[:, None], carry[:, :-1]], axis=1)
        return carry, jnp.stack(outs)

    carry0 = jnp.zeros((B, taps), jnp.int64)
    _, out = jax.lax.scan(step, carry0, (ns, xc))
    out = out.reshape(nsteps * chunk, B).T
    return out[:, :N]


@partial(jax.jit, static_argnames=("block_size",))
def predict_fixed_batch(x: jnp.ndarray, order: jnp.ndarray,
                        block_size: int) -> jnp.ndarray:
    """Exact inverse of the FIXED predictors (orders 0-4) as k-fold
    cumulative sums — fully parallel, no sequential scan.

    Fixed predictors have shift 0 and integer taps, so the inverse
    recurrence is the k-fold prefix sum of the residual stream seeded by
    the warm-up difference pyramid — associative and exact in int64
    (reference recurrence: src/decode.rs:1738-1752 with
    FIXED_COEFFS stream.rs:1534; VERDICT r1 item 1b).

    x: (B, N) int64 — warm-ups at positions < order, residuals beyond.
    order: (B,) in [0, 4].
    """
    B, N = x.shape
    assert N == block_size
    x = x.astype(jnp.int64)
    ordc = order.astype(jnp.int32)[:, None]  # (B, 1)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]

    # warm-up difference pyramid heads: h_L = L-th forward diff at index L
    x0, x1, x2, x3 = (x[:, 0], x[:, min(1, N - 1)], x[:, min(2, N - 1)],
                      x[:, min(3, N - 1)])
    H = jnp.stack([x0,
                   x1 - x0,
                   x2 - 2 * x1 + x0,
                   x3 - 3 * x2 + 3 * x1 - x0], axis=1)  # (B, 4)

    # v: level-(k-1) stream — h_{k-1} at position k-1, residuals after,
    # zeros before (zeros are cumsum-neutral)
    top = jnp.take_along_axis(H, jnp.maximum(ordc - 1, 0), axis=1)  # (B,1)
    v = jnp.where(pos < ordc - 1, 0,
                  jnp.where((pos == ordc - 1) & (ordc >= 1), top, x))
    # integrate down the pyramid; level L applies to rows with order > L
    for L in (3, 2, 1):
        cs = jnp.cumsum(v, axis=1)
        seeded = jnp.where(pos == L - 1, H[:, L - 1:L], cs)
        v = jnp.where(ordc > L, seeded, v)
    cs = jnp.cumsum(v, axis=1)
    return jnp.where(ordc >= 1, cs, x)


def fixed_compatible_mask(qcoeffs: np.ndarray, shift: np.ndarray,
                          order: np.ndarray) -> np.ndarray:
    """(B,) bool: rows whose recurrence equals a FIXED predictor (order
    <= 4, shift 0, taps matching FIXED_COEFFS) — eligible for the cumsum
    path.  Constant/verbatim subframes (order 0) qualify trivially."""
    q = np.asarray(qcoeffs)
    ok = (np.asarray(shift) == 0) & (np.asarray(order) <= 4)
    rows = FIXED_ROWS[np.minimum(np.asarray(order), 4)]
    ok &= (q[:, :4] == rows).all(axis=1)
    ok &= (q[:, 4:] == 0).all(axis=1)
    return ok
