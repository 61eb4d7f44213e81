"""Batched LPC synthesis (decode side) — the sequential recurrence
x[n] += (sum_j q_j x[n-1-j]) >> shift evaluated as a lax.scan over sample
positions with the batch axis supplying the parallelism
(SURVEY §7 "blockwise scan ... batch/channel vectorization"; the exact
``>> shift`` truncation forbids associative-scan reformulations, reference:
src/decode.rs:1738-1752).

One scan handles every subframe in the batch regardless of its predictor
order: coefficients are zero-padded to 32 taps and positions below the
order pass warm-up samples through unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_ORDER = 32


@partial(jax.jit, static_argnames=("block_size", "chunk"))
def predict_batch(x: jnp.ndarray, qcoeffs: jnp.ndarray, shift: jnp.ndarray,
                  order: jnp.ndarray, block_size: int,
                  chunk: int = 16) -> jnp.ndarray:
    """Reconstruct subframe samples for a batch.

    x: (B, N) int64 — warm-up samples at positions < order, residuals at
       positions >= order.
    qcoeffs: (B, 32) int64 (zero beyond order, "most recent first").
    shift, order: (B,).

    Returns (B, N) int64 reconstructed samples.

    The recurrence is sequential in n (the exact ``>> shift`` truncation
    forbids associative reformulations), but each lax.scan step advances
    ``chunk`` samples with an unrolled inner recurrence, so the number of
    device loop iterations is N/chunk — per-step overhead amortizes while
    the (B, 32) tap MAC stays batch-vectorized.
    """
    B, N = x.shape
    assert N == block_size
    q = qcoeffs.astype(jnp.int64)  # (B, 32)
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
        # carry: (B, 32) last samples, most recent at column 0
        ncol, xin = inp
        outs = []
        for i in range(chunk):
            acc = (q * carry).sum(axis=1)
            pred = jax.lax.shift_right_arithmetic(acc, shift64)
            out = jnp.where(ncol[i] >= order, xin[i] + pred, xin[i])
            outs.append(out)
            carry = jnp.concatenate([out[:, None], carry[:, :-1]], axis=1)
        return carry, jnp.stack(outs)

    carry0 = jnp.zeros((B, MAX_ORDER), jnp.int64)
    _, out = jax.lax.scan(step, carry0, (ns, xc))
    out = out.reshape(nsteps * chunk, B).T
    return out[:, :N]
