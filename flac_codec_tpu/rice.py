"""Rice partition search + residual cost model (host; reference:
src/encode.rs:3747-3962 write_residuals).

Given a residual array, chooses the partition order and per-partition Rice
parameters/escapes minimizing the reference's estimated-bits cost model,
then describes the partitions for serialization.  The batched device mirror
lives in ops/rice.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

MAX_PARTITIONS = 64  # reference: src/encode.rs:3756

U32_MAX = (1 << 32) - 1


def _partition_plan(abs_sums: np.ndarray, lens: np.ndarray, rice_max: int):
    """Cost + coding decision for each partition of one candidate order.

    Returns (total_estimated_bits, [(kind, param) ...]) or None if the
    candidate must be dropped (mirrors the Option-collect in the
    reference's best_partitions).
    """
    plan = []
    total = 0
    for s, n in zip(abs_sums.tolist(), lens.tolist()):
        if n == 0:
            return None
        if s == 0:
            plan.append(("constant", 0))
            continue
        if s > n:
            bits_needed = int(np.ceil(np.log2(float(s) / float(n))))
            if bits_needed >= rice_max:
                escape_size = s.bit_length() - 1 + 2  # ilog2(sum) + 2
                if escape_size > 31:
                    return None
                total += escape_size * n
                plan.append(("escape", escape_size))
                continue
            rice = bits_needed
        else:
            rice = 0
        tail = (s >> (rice - 1)) if rice > 0 else (s << 1)
        if tail > U32_MAX:
            return None
        size = 4 + (1 + rice) * n + tail - n // 2
        if size > U32_MAX:
            return None
        total += size
        plan.append(("rice", rice))
    return total, plan


def best_partitions(residuals: np.ndarray, predictor_order: int,
                    max_partition_order: int, rice_max: int):
    """Search partition orders 0..=min(tz(block), max_order) for minimum
    estimated bits (ties -> lowest order).

    Returns a list of (kind, param, values) with kind in
    {"rice", "escape", "constant"} ready for
    format.subframe.write_residuals_verbatim, or the escape-31 fallback.
    """
    res = np.asarray(residuals, dtype=np.int64)
    block_size = predictor_order + len(res)
    abs_res = np.abs(res)
    tz = (block_size & -block_size).bit_length() - 1 if block_size else 0

    best: Optional[Tuple[int, int, list]] = None  # (bits, order, plan)
    for po in range(0, min(tz, max_partition_order) + 1):
        count = 1 << po
        if count > MAX_PARTITIONS:
            break
        part_len = block_size // count
        p0 = part_len - predictor_order
        if p0 <= 0:
            continue
        lens = np.full(count, part_len, dtype=np.int64)
        lens[0] = p0
        bounds = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sums = np.add.reduceat(abs_res, bounds) if len(abs_res) else np.zeros(count, np.int64)
        got = _partition_plan(sums, lens, rice_max)
        if got is None:
            continue
        bits, plan = got
        if best is None or bits < best[0]:
            best = (bits, po, plan)

    if best is None:
        # fallback: single partition escaped at 31 bits
        return [("escape", 31, res)]

    _, po, plan = best
    count = 1 << po
    part_len = block_size // count
    out = []
    pos = 0
    for i, (kind, param) in enumerate(plan):
        n = (part_len - predictor_order) if i == 0 else part_len
        values = res[pos:pos + n]
        pos += n
        if kind == "constant":
            out.append(("constant", 0, len(values)))
        else:
            out.append((kind, param, values))
    return out


def residual_section_bits(partitions, rice_bits: int) -> int:
    """Exact bit length of a residual section as serialized (coding method
    2 bits + partition order 4 bits + per-partition header/data)."""
    total = 2 + 4
    for kind, param, values in partitions:
        total += rice_bits
        if kind == "rice":
            v = np.asarray(values, dtype=np.int64)
            u = np.where(v < 0, ((-v - 1) << 1) + 1, v << 1)
            total += int((u >> param).sum()) + (param + 1) * len(v)
        elif kind == "escape":
            total += 5 + param * len(values)
        else:
            total += 5
    return total


def choose_rice_coding(partitions, use_rice2: bool):
    """Pick 4-bit vs 5-bit coding (reference: src/encode.rs:3910-3961).

    With rice2 enabled the search runs at RICE_MAX=31 and shrinks back to
    the 4-bit method when every partition's parameter fits.
    """
    if not use_rice2:
        return 4, partitions
    for kind, param, _ in partitions:
        if kind == "rice" and param >= 15:
            return 5, partitions
    return 4, partitions
