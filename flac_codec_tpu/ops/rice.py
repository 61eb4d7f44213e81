"""Batched Rice partition search (device plane).

Mirrors the reference's estimated-bits cost model and partition-order
search (reference: src/encode.rs:3747-3962) as a power-of-two reduction
tree over the batch: per-partition abs sums for every candidate order come
from log2(parts) pairwise folds of one base reduction.

Output is a fixed-shape partition plan: kinds/params padded to
MAX_PARTITIONS=64, plus the EXACT serialized bit count per subframe (the
reference compares exact recorded bits between candidates, while choosing
the partition order by the estimate — both are reproduced here).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .common import BIG

MAX_PARTITIONS = 64
U32_MAX = (1 << 32) - 1

KIND_RICE = 0
KIND_ESCAPE = 1
KIND_CONSTANT = 2


def _partition_orders(block_size: int, max_partition_order: int):
    tz = (block_size & -block_size).bit_length() - 1
    max_po = min(tz, max_partition_order, 6)  # 2^6 = 64 = MAX_PARTITIONS
    return list(range(0, max_po + 1))


def zigzag(res: jnp.ndarray) -> jnp.ndarray:
    """Signed residual -> unsigned Rice symbol (reference zigzag:
    src/stream.rs:2946-2958).

    int32 input returns uint32 (the narrow analysis mode): the signed
    arithmetic may wrap, but reinterpreted as uint32 the result is exactly
    zigzag(res) mod 2^32, which is exact for |res| <= 2^31 — every residual
    the planner's validity checks admit."""
    out32 = res.dtype == jnp.int32
    u = jnp.where(res < 0, ((-res - 1) << 1) + 1, res << 1)
    return u.astype(jnp.uint32 if out32 else jnp.uint64)


def part_lookup(table: jnp.ndarray, part_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-sample partition-table lookup: (B, 64) table x (B, N) indices
    -> (B, N).  A 64-way select-accumulate on purpose: take_along_axis
    lowers to a per-element gather on TPU (measured ~100x slower than
    the equivalent elementwise chain).  Prefer :func:`expand_to_samples`
    when the indices follow the contiguous-partition layout — it replaces
    the 64 full-width selects with a (B, 64) fine-grid select plus one
    static broadcast."""
    out = jnp.zeros(part_idx.shape, table.dtype)
    for p in range(MAX_PARTITIONS):
        out = out + jnp.where(part_idx == p, table[:, p:p + 1], 0)
    return out


def expand_fine(table: jnp.ndarray, po: jnp.ndarray, max_po: int) -> jnp.ndarray:
    """(B, 64) level-layout table + chosen order -> (B, 2^max_po) fine grid.

    Entry f of the result is ``table[b, f >> (max_po - po[b])]`` — the
    chosen-partition value of fine cell f.  Partition tables are tiny, so
    the per-level masked chain runs on (B, 2^max_po) arrays instead of the
    (B, N) sample panel; per-sample values then follow from one static
    ``jnp.repeat`` (a broadcast, not a gather).
    """
    B = table.shape[0]
    fine_parts = 1 << max_po
    out = jnp.broadcast_to(table[:, :1], (B, fine_parts))
    for lvl in range(1, max_po + 1):
        lvl_fine = jnp.repeat(table[:, :1 << lvl], fine_parts >> lvl, axis=1)
        out = jnp.where((po == lvl)[:, None], lvl_fine, out)
    return out


def expand_to_samples(table: jnp.ndarray, po: jnp.ndarray, block_size: int,
                      max_po: int) -> jnp.ndarray:
    """(B, 64) table -> (B, block_size) per-sample values under the chosen
    partition order (contiguous partitions).  One fine-grid select chain +
    one static repeat; replaces :func:`part_lookup` on sample panels."""
    fine = expand_fine(table, po, max_po)
    return jnp.repeat(fine, block_size >> max_po, axis=1)


def search(res: jnp.ndarray, order: jnp.ndarray, block_size: int,
           max_partition_order: int, rice_max: int):
    """Choose partition order + per-partition coding for a batch.

    res: (B, N) int64 residuals laid out at positions order..N-1 (zeros
    below).  order: (B,) predictor order (partition 0 is shorter by it).

    Returns dict:
      po (B,) chosen partition order
      kinds (B, 64) uint8   (rice / escape / constant; valid for first 2^po)
      params (B, 64) int32  (rice parameter or escape size)
      exact_bits (B,)       exact serialized residual-section bits
                            (2 method + 4 order + partitions)
    """
    B, N = res.shape
    assert N == block_size, (
        f"residual width {N} != block_size {block_size}: partition "
        "ranges would silently misalign")
    pos = jnp.arange(N)
    abs_res = jnp.abs(res)
    pos_orders = _partition_orders(block_size, max_partition_order)
    max_po = pos_orders[-1]
    max_parts = 1 << max_po

    # base reduction at the finest granularity (int64 accumulate: partition
    # abs-sums exceed int32 even for narrow int32 residual panels)
    base = abs_res.reshape(B, max_parts, N // max_parts).sum(
        axis=2, dtype=jnp.int64)  # (B,P)
    # per-level sums, level i has 2^i partitions
    sums_by_level = [None] * (max_po + 1)
    sums_by_level[max_po] = base
    for lvl in range(max_po - 1, -1, -1):
        s = sums_by_level[lvl + 1]
        sums_by_level[lvl] = s.reshape(B, -1, 2).sum(axis=2)

    total_bits_by_level = []
    plans = []  # (kinds (B,64), params (B,64)) per level
    for po in pos_orders:
        parts = 1 << po
        part_len = block_size // parts
        s = sums_by_level[po].astype(jnp.int64)  # (B, parts)
        n = jnp.full((B, parts), part_len, jnp.int64)
        n = n.at[:, 0].add(-order.astype(jnp.int64))

        valid_lens = n[:, 0] > 0  # (B,)

        is_zero = s == 0
        gt = s > n
        ratio = s.astype(jnp.float64 if jax.config.jax_enable_x64
                         else jnp.float32) / n.astype(
                             jnp.float64 if jax.config.jax_enable_x64
                             else jnp.float32)
        bits_needed = jnp.ceil(jnp.log2(jnp.where(gt, ratio, 1.0))
                               ).astype(jnp.int64)
        use_escape = gt & (bits_needed >= rice_max)
        rice = jnp.where(gt & ~use_escape, bits_needed, 0)

        # escape size = ilog2(sum) + 2  (floor log2 of a positive int)
        ilog2 = (63 - jnp.clip(
            jax.lax.clz(jnp.where(s > 0, s, 1).astype(jnp.uint64))
            .astype(jnp.int64), 0, 63))
        escape_size = ilog2 + 2
        escape_ok = escape_size <= 31

        tail = jnp.where(rice > 0,
                         jax.lax.shift_right_logical(
                             s, jnp.maximum(rice - 1, 0)),
                         s << 1)
        size = 4 + (1 + rice) * n + tail - n // 2
        part_bits = jnp.where(
            is_zero, 0,
            jnp.where(use_escape, escape_size * n, size))
        bad = (~is_zero) & ((use_escape & ~escape_ok)
                            | (~use_escape & (tail > U32_MAX))
                            | (~use_escape & (size > U32_MAX)))
        level_bits = jnp.where(
            valid_lens & ~bad.any(axis=1),
            part_bits.sum(axis=1), BIG)

        kinds = jnp.where(is_zero, KIND_CONSTANT,
                          jnp.where(use_escape, KIND_ESCAPE, KIND_RICE))
        params = jnp.where(use_escape, escape_size, rice)

        pad = MAX_PARTITIONS - parts
        kinds = jnp.pad(kinds, ((0, 0), (0, pad))).astype(jnp.uint8)
        params = jnp.pad(params, ((0, 0), (0, pad))).astype(jnp.int32)
        plans.append((kinds, params))
        total_bits_by_level.append(level_bits)

    est = jnp.stack(total_bits_by_level, axis=1)  # (B, npo)
    po = jnp.argmin(est, axis=1)  # ties -> lowest order
    fallback = jnp.min(est, axis=1) >= BIG  # all candidates dropped

    # level selection as a masked chain (gather avoidance, see part_lookup)
    kinds = plans[0][0]
    params = plans[0][1]
    for lvl in range(1, len(plans)):
        m = (po == lvl)[:, None]
        kinds = jnp.where(m, plans[lvl][0], kinds)
        params = jnp.where(m, plans[lvl][1], params)

    # fallback: single partition escaped at 31 bits
    # (reference: src/encode.rs:3887-3895)
    po = jnp.where(fallback, 0, po)
    kinds = jnp.where(fallback[:, None],
                      jnp.where(jnp.arange(MAX_PARTITIONS)[None, :] == 0,
                                KIND_ESCAPE, 0).astype(jnp.uint8), kinds)
    params = jnp.where(fallback[:, None],
                       jnp.where(jnp.arange(MAX_PARTITIONS)[None, :] == 0,
                                 31, 0).astype(jnp.int32), params)

    # ---- exact serialized size of the chosen plan ----
    rice_bits_field = 5 if rice_max == 31 else 4
    parts_chosen = jnp.int64(1) << po.astype(jnp.int64)

    # per-sample partition values under the chosen order via the fine grid
    # (one (B, 2^max_po) select chain + a static repeat; no gathers)
    k_per_sample = expand_to_samples(params, po, block_size, max_po)
    kind_per_sample = expand_to_samples(kinds.astype(jnp.int32), po,
                                        block_size, max_po)
    in_res = pos[None, :] >= order[:, None]

    # exact bits = sum of Rice quotients (the only per-sample term) plus
    # per-partition closed forms: rice (k+1)*n_p, escape esc*n_p.  The
    # quotient pass runs at the residual panel's width (uint32 in the
    # narrow analysis mode) and everything else on (B, 64) tables.
    u = zigzag(res)  # uint32 (narrow) / uint64
    shift = jnp.maximum(k_per_sample, 0).astype(u.dtype)
    quotient = jax.lax.shift_right_logical(u, shift)
    q_live = jnp.where(in_res & (kind_per_sample == KIND_RICE), quotient,
                       u.dtype.type(0))
    if u.dtype == jnp.uint32:
        data_q = q_live.sum(axis=1, dtype=jnp.int64)
    else:
        data_q = q_live.astype(jnp.int64).sum(axis=1)

    part_ids = jnp.arange(MAX_PARTITIONS)
    live = part_ids[None, :] < parts_chosen[:, None]
    part_len = jnp.int64(block_size) >> po.astype(jnp.int64)  # (B,)
    n_p = jnp.where(live, part_len[:, None], 0)
    n_p = n_p.at[:, 0].add(-order.astype(jnp.int64))
    p64 = params.astype(jnp.int64)
    per_part = jnp.where(kinds == KIND_RICE, (p64 + 1) * n_p,
                         jnp.where(kinds == KIND_ESCAPE, p64 * n_p, 0))
    data_bits = data_q + per_part.sum(axis=1)

    header_bits = jnp.where(
        live,
        jnp.where(kinds == KIND_RICE, rice_bits_field, rice_bits_field + 5),
        0).sum(axis=1)

    exact_bits = 2 + 4 + header_bits + data_bits

    # the fallback's 31-bit escape cannot represent residuals outside
    # signed-31 range; the reference's checked bitstream write would error
    # there, failing the whole candidate (caught in encode_subframe)
    res_masked = jnp.where(in_res, res, 0)
    fits31 = (jnp.max(res_masked, axis=1) <= (1 << 30) - 1) & \
             (jnp.min(res_masked, axis=1) >= -(1 << 30))
    exact_bits = jnp.where(fallback & ~fits31, BIG, exact_bits)

    return {"po": po.astype(jnp.int32), "kinds": kinds, "params": params,
            "exact_bits": exact_bits.astype(jnp.int64)}
