"""Batched FIXED predictor analysis (orders 0-4).

Mirrors the reference's diff cascade with i32-overflow abort and
min-abs-sum-over-common-suffix order choice (reference:
src/encode.rs:3020-3088), vectorized over (batch,) channels.
"""

from __future__ import annotations

import jax.numpy as jnp

I32_MAX = (1 << 31) - 1
I32_MIN = -(1 << 31)

# order-k successive differences in closed binomial form:
# d_k[n] = sum_i BINOM[k][i] * x[n-i]
_BINOM = ((1, 0, 0, 0, 0),
          (1, -1, 0, 0, 0),
          (1, -2, 1, 0, 0),
          (1, -3, 3, -1, 0),
          (1, -4, 6, -4, 1))


def plan_narrow(x: jnp.ndarray):
    """(B, N) int32 narrow-mode panel -> (order (B,), residuals (B, N)).

    Bit-identical to ``best_order(*diff_cascade(x))`` for the planner's
    narrow mode (samples <= 27 bits: every order's diffs are int32-exact,
    so all orders are valid and the common suffix starts at position 4),
    but computes each order's abs-sum directly from ``x`` in binomial
    form — no (B, 5, N) diff stack is ever materialized; XLA fuses the
    five reductions into shifted reads of one panel, and only the chosen
    order's residual panel is written (via per-row binomial weights).
    """
    B, N = x.shape
    assert x.dtype == jnp.int32 and N >= 5
    idx = jnp.arange(N)

    def taps(weights):
        acc = None
        for i, c in enumerate(weights):
            if c == 0:
                continue
            t = jnp.pad(x, ((0, 0), (i, 0)))[:, :N] * jnp.int32(c)
            acc = t if acc is None else acc + t
        return acc

    suffix = jnp.stack(
        [jnp.where(idx[None, :] >= 4, jnp.abs(taps(_BINOM[k][:k + 1])), 0)
         .sum(axis=1, dtype=jnp.int64) for k in range(5)], axis=1)
    order = jnp.argmin(suffix, axis=1).astype(jnp.int32)  # ties -> lowest

    rows = jnp.asarray(_BINOM, jnp.int32)  # (5, 5)
    wsel = jnp.broadcast_to(rows[0], (B, 5))
    for k in range(1, 5):
        wsel = jnp.where((order == k)[:, None], rows[k], wsel)
    res = None
    for i in range(5):
        t = jnp.pad(x, ((0, 0), (i, 0)))[:, :N] * wsel[:, i:i + 1]
        res = t if res is None else res + t
    res = jnp.where(idx[None, :] >= order[:, None], res, 0)
    return order, res


def diff_cascade(x: jnp.ndarray):
    """(B, N) int -> (diffs (B, 5, N), valid (B, 5) bool).

    Order-k diffs occupy positions k..N-1 (positions < k are zero).
    ``valid[b, k]`` is False when order k's diffs overflowed i32 (which
    also invalidates every higher order) or the buffer would be empty.

    int32 input is the planner's narrow mode and REQUIRES samples of at
    most 27 bits: each diff stage widens by one bit, so order-4 diffs stay
    within int32 and the reference's i32-overflow abort can never fire
    (the min/max overflow reductions are skipped entirely).
    """
    B, N = x.shape
    narrow = x.dtype == jnp.int32
    diffs = [x]
    valid = [jnp.ones(B, dtype=bool)]
    cur = x
    for k in range(1, 5):
        nxt = jnp.zeros_like(cur)
        d = cur[:, 1:] - cur[:, :-1]
        nxt = nxt.at[:, 1:].set(d)
        # zero the positions below the order (they hold stale lower-order data)
        idx = jnp.arange(N)
        nxt = jnp.where(idx[None, :] >= k, nxt, 0)
        ok = valid[-1] & (N - k >= 1)
        if not narrow:
            ok = ok & \
                (jnp.max(jnp.where(idx[None, :] >= k, nxt, 0), axis=1)
                 <= I32_MAX) & \
                (jnp.min(jnp.where(idx[None, :] >= k, nxt, 0), axis=1)
                 >= I32_MIN)
        diffs.append(nxt)
        valid.append(ok)
        cur = nxt
    return jnp.stack(diffs, axis=1), jnp.stack(valid, axis=1)


def best_order(diffs: jnp.ndarray, valid: jnp.ndarray):
    """Choose the order minimizing the abs-sum over the common suffix
    (ties -> lowest order).

    Returns (order (B,), residuals (B, N) of the chosen order laid out at
    positions order..N-1).
    """
    B, K, N = diffs.shape
    idx = jnp.arange(N)
    order_ids = jnp.arange(K)
    a = jnp.abs(diffs) * (idx[None, None, :] >= order_ids[None, :, None])
    totals = a.sum(axis=2, dtype=jnp.int64)  # (B, 5)

    # last valid order per batch entry
    last_valid = jnp.max(jnp.where(valid, order_ids[None, :], 0), axis=1)  # (B,)

    # prefix sums of the first j in-order elements of each buffer, j in
    # 0..4: element j of buffer k sits at position k + j, so only the
    # first 9 sample positions ever contribute — compute on that slice
    # instead of masking the full panel
    head = jnp.abs(diffs[:, :, :9]).astype(jnp.int64)  # (B, 5, 9)
    hcum = jnp.concatenate(
        [jnp.zeros_like(head[:, :, :1]), jnp.cumsum(head, axis=2)], axis=2)
    # firsts[b, k, j] = sum head[k, k:k+j] = hcum[k, k+j] - hcum[k, k]
    firsts = jnp.stack(
        [jnp.stack([hcum[:, k, k + j] - hcum[:, k, k] for j in range(5)],
                   axis=1) for k in range(K)], axis=1)  # (B, 5, 5)

    skip = jnp.clip(last_valid[:, None] - order_ids[None, :], 0, 4)  # (B, 5)
    # skip-lookup + final residual pick as masked selects (gather-free)
    skipped = jnp.zeros(firsts.shape[:2], firsts.dtype)
    for j in range(5):
        skipped = jnp.where(skip == j, firsts[:, :, j], skipped)
    suffix_sums = totals - skipped
    suffix_sums = jnp.where(valid, suffix_sums, jnp.int64(1) << 62)
    order = jnp.argmin(suffix_sums, axis=1)  # first minimum -> lowest order
    residuals = diffs[:, 0]
    for k in range(1, K):
        residuals = jnp.where((order == k)[:, None], diffs[:, k], residuals)
    return order, residuals
