"""Batched frame-encode planner (device plane).

Turns a batch of PCM frames (B, C, N) into a complete per-frame encoding
plan — channel assignment, subframe types/orders/coefficients, Rice
partitioning and residuals — entirely on device.  This is the TPU
re-expression of the reference's per-frame candidate search
(reference: src/encode.rs:2259-2980): the rayon "race" between candidates
becomes "compute all candidates for the whole batch, argmin-select", which
is how the search maps onto a wide vector machine.

Host code (parallel.batch) turns plans into FLAC bits via the native
packing engine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.lpc import precision_for_block_size
from . import decorrelate, fixed, lpc, rice
from .common import (BIG, TYPE_CONSTANT, TYPE_FIXED, TYPE_LPC,
                     TYPE_VERBATIM)


def _wasted_bits(x: jnp.ndarray):
    """(B, N) int64/int32 -> (wasted (B,) int32, all_zero (B,) bool).

    Minimum trailing zeros when every sample has at least one; 32 when the
    channel is silent (reference: src/encode.rs:2877-2898).
    """
    if x.dtype == jnp.int32:
        u = x.astype(jnp.uint32)  # two's-complement reinterpret
    else:
        u = jnp.bitwise_and(x, 0xFFFFFFFF).astype(jnp.uint32)
    # min over samples of trailing-zeros == trailing-zeros of the bitwise
    # OR (zero samples are the identity for both) — one OR reduction over
    # the panel instead of per-sample lowest-set-bit/clz math (round 5:
    # the fused tz+min pass was ~1 ms/step at production shapes)
    acc = jax.lax.reduce(u, jnp.uint32(0), jax.lax.bitwise_or, (1,))  # (B,)
    low = jnp.bitwise_and(acc, (~acc + jnp.uint32(1)))  # lowest set bit
    tz = 31 - jax.lax.clz(jnp.where(low == 0, jnp.uint32(1), low)).astype(
        jnp.int32)
    all_zero = acc == 0
    wasted = jnp.where(all_zero, 0, tz)
    return wasted.astype(jnp.int32), all_zero


def _analyze_channel(x: jnp.ndarray, bps: int, win: jnp.ndarray,
                     max_lpc_order, block_size: int,
                     max_partition_order: int, use_rice2: bool,
                     max_sample_bits: int | None = None):
    """Full subframe candidate analysis for one candidate channel.

    Returns a plan dict of batched arrays (see encode_frames_plan).
    """
    B, N = x.shape
    rice_max = 31 if use_rice2 else 15

    wasted, all_zero = _wasted_bits(x)
    xs = jax.lax.shift_right_arithmetic(x, wasted.astype(x.dtype)[:, None])
    bps_eff = bps - wasted  # (B,)
    header_bits = 8 + jnp.where(wasted > 0, wasted, 0)

    # ---- FIXED candidate ----
    if xs.dtype == jnp.int32 and N >= 5:
        ford, fres = fixed.plan_narrow(xs)  # fused, stack-free
    else:
        diffs, dvalid = fixed.diff_cascade(xs)
        ford, fres = fixed.best_order(diffs, dvalid)
    fplan = rice.search(fres, ford, block_size, max_partition_order, rice_max)
    fixed_bits = (header_bits.astype(jnp.int64)
                  + ford.astype(jnp.int64) * bps_eff
                  + fplan["exact_bits"])
    fixed_bits = jnp.where(fplan["exact_bits"] >= BIG, BIG, fixed_bits)

    # ---- LPC candidate ----
    # host parity: len(channel) <= max_lpc_order raises
    # InsufficientLpcSamples and yields no LPC candidate at all
    # (reference: src/encode.rs LpcParameters::best early-out)
    if max_lpc_order is not None and block_size > max_lpc_order:
        lp = lpc.analyze(xs, win, max_lpc_order, bps_eff, block_size,
                         max_sample_bits=max_sample_bits)
        lplan = rice.search(lp["residuals"], lp["order"], block_size,
                            max_partition_order, rice_max)
        precision = lp["precision"]
        lpc_bits = (header_bits.astype(jnp.int64)
                    + lp["order"].astype(jnp.int64) * bps_eff
                    + 4 + 5 + lp["order"].astype(jnp.int64) * precision
                    + lplan["exact_bits"])
        lpc_bits = jnp.where(lp["valid"] & (lplan["exact_bits"] < BIG),
                             lpc_bits, BIG)
    else:
        lp = {
            "order": jnp.zeros(B, jnp.int32),
            "shift": jnp.zeros(B, jnp.int32),
            "qcoeffs": jnp.zeros((B, lpc.MAX_ORDER), jnp.int32),
            "residuals": jnp.zeros((B, N), x.dtype),
            "precision": precision_for_block_size(block_size),
        }
        lplan = {k: jnp.zeros_like(v) for k, v in fplan.items()}
        lpc_bits = jnp.full(B, BIG, jnp.int64)

    # ---- candidate choice (reference: src/encode.rs:2902-2979) ----
    use_lpc = lpc_bits < fixed_bits  # tie -> fixed
    pred_bits = jnp.minimum(fixed_bits, lpc_bits)
    verbatim_cmp = (N * bps_eff).astype(jnp.int64)
    verbatim_bits = header_bits.astype(jnp.int64) + verbatim_cmp

    sub_type = jnp.where(
        all_zero, TYPE_CONSTANT,
        jnp.where(pred_bits < verbatim_cmp,
                  jnp.where(use_lpc, TYPE_LPC, TYPE_FIXED),
                  TYPE_VERBATIM))
    subframe_bits = jnp.where(
        all_zero, 8 + bps,
        jnp.where(pred_bits < verbatim_cmp, pred_bits, verbatim_bits))

    order = jnp.where(sub_type == TYPE_LPC, lp["order"],
                      jnp.where(sub_type == TYPE_FIXED, ford.astype(jnp.int32),
                                0))

    def pick(fa, la):
        return jnp.where((sub_type == TYPE_LPC).reshape(
            (-1,) + (1,) * (fa.ndim - 1)), la, fa)

    plan_kinds = pick(fplan["kinds"], lplan["kinds"])
    plan_params = pick(fplan["params"], lplan["params"])
    plan_po = pick(fplan["po"], lplan["po"])
    residuals = pick(fres, lp["residuals"]).astype(jnp.int32)

    # rice2 shrink-back (reference: src/encode.rs:3910-3961): when every
    # non-escaped partition's parameter fits 4 bits, use method 0 and save
    # one header bit per partition
    if use_rice2:
        parts = jnp.int64(1) << plan_po.astype(jnp.int64)
        live = jnp.arange(rice.MAX_PARTITIONS)[None, :] < parts[:, None]
        big_rice = live & (plan_kinds == rice.KIND_RICE) & (plan_params >= 15)
        can_shrink = ~big_rice.any(axis=1)
        rice_bits = jnp.where(can_shrink, 4, 5).astype(jnp.int32)
        shrink_save = jnp.where(can_shrink, parts, 0)
        is_pred = (sub_type == TYPE_FIXED) | (sub_type == TYPE_LPC)
        subframe_bits = jnp.where(is_pred, subframe_bits - shrink_save,
                                  subframe_bits)
    else:
        rice_bits = jnp.full(B, 4, jnp.int32)

    # warm-up samples (wasted-shifted) so packed-plan assembly needs no
    # channel data on host (verbatim subframes excepted)
    w_n = min(N, 32)
    warmup = xs[:, :w_n].astype(jnp.int32)
    if w_n < 32:
        warmup = jnp.pad(warmup, ((0, 0), (0, 32 - w_n)))

    return {
        "sub_type": sub_type.astype(jnp.uint8),
        "warmup": warmup,
        "wasted": wasted.astype(jnp.uint8),
        "order": order.astype(jnp.uint8),
        "shift": lp["shift"].astype(jnp.int8),
        "qcoeffs": lp["qcoeffs"],
        "precision": jnp.full(B, lp["precision"], jnp.uint8),
        "po": plan_po.astype(jnp.uint8),
        "kinds": plan_kinds,
        "params": plan_params,
        "rice_bits": rice_bits.astype(jnp.uint8),
        "residuals": residuals,
        "subframe_bits": subframe_bits,
    }


def _gather_plans(plans, src):
    """Select plan[src[b]] per batch entry from a list of 4 channel plans.

    A 4-way masked select on purpose: gather/take_along_axis over the
    stacked residual panels lowers to a per-element gather on TPU, which
    is orders of magnitude slower than three elementwise selects."""
    out = {}
    for key in plans[0]:
        acc = plans[0][key]
        for i in range(1, len(plans)):
            m = (src == i).reshape((-1,) + (1,) * (acc.ndim - 1))
            acc = jnp.where(m, plans[i][key], acc)
        out[key] = acc
    return out


def _pack_plan_channels(plan: dict, block_size: int, budget_bits: int):
    """Pack each output channel's residual section on device and drop the
    raw residual arrays from the plan (device-side bit packing).

    Sections are laid out at per-subframe word-aligned slots; with the
    panel strategy (default, see ops.packpanel) the slot stride includes
    the merge kernel's aligned-window slack."""
    from .bitpack import pack_residual_sections
    from .packpanel import MERGE_SLACK, samples_strategy

    channels = plan["channels"]
    S = len(channels)
    B = plan["assignment"].shape[0]
    strategy = samples_strategy()
    per_sub_words = (budget_bits * block_size + 31) // 32 + 2
    if strategy == "panel":
        per_sub_words = (per_sub_words + MERGE_SLACK + 127) // 128 * 128

    # per-slot packing: slot s's rows live at per_sub_words strides in
    # their own (B * per_sub_words) region, concatenated slot-major so
    # the host layout (row = b * S + s) is preserved
    slot_words = []
    ovf_any = jnp.zeros(B, bool)
    for s, ch in enumerate(channels):
        base_bits = (jnp.arange(B) * per_sub_words).astype(jnp.int64) * 32
        is_pred = (ch["sub_type"] == TYPE_FIXED) | (ch["sub_type"] == TYPE_LPC)
        w, bits, pack_ovf = pack_residual_sections(
            ch["residuals"], ch["order"].astype(jnp.int32),
            ch["po"].astype(jnp.int32), ch["kinds"], ch["params"],
            ch["rice_bits"].astype(jnp.int32), block_size,
            B * per_sub_words + 2, base_bits, budget_bits * block_size,
            live=is_pred, samples=strategy, panel_words=per_sub_words)
        slot_words.append(w[:B * per_sub_words].reshape(B, per_sub_words))
        ovf_any = ovf_any | pack_ovf
        # only FIXED/LPC subframes have a residual section; constant and
        # verbatim slots carry garbage residual arrays whose pseudo bit
        # length must not trigger the host overflow fallback
        ch["res_bits"] = jnp.where(is_pred, bits, 0).astype(bits.dtype)
        ch["res_overflow"] = (is_pred & (bits > budget_bits * block_size)) \
            | ovf_any
        del ch["residuals"]
    # interleave to the host's row order (b * S + s)
    words = jnp.stack(slot_words, axis=1).reshape(-1)
    plan["packed_words"] = jnp.concatenate(
        [words, jnp.zeros(2, jnp.uint32)])
    plan["packed_meta"] = jnp.array([S, per_sub_words], jnp.int32)
    return plan


def _encode_frames_plan_impl(pcm: jnp.ndarray, *, bits_per_sample: int,
                             block_size: int, max_lpc_order,
                             max_partition_order: int, mid_side: bool = True,
                             exhaustive: bool = True,
                             window_kind=("tukey", 0.5),
                             analysis: str = "auto",
                             pack_budget: int = 0,
                             frame_pack: bool = False,
                             slim: bool = False):
    """Plan encoding for a batch of frames.

    pcm: (B, C, N) int32.  ``analysis`` chooses the float dtype for LPC
    analysis: "f64" (bit-parity with the f64 reference math; requires
    jax_enable_x64), "f32" (fast TPU mode; still exact/lossless output), or
    "auto" (f64 iff x64 is enabled).  Integer math requires x64 regardless
    (int64 accumulators).

    Returns a dict of batched arrays:
      assignment (B,) uint8 channel-assignment code
      channels: list of per-output-channel plan dicts (len C for
                independent layouts, 2 for stereo)
    """
    B, C, N = pcm.shape
    assert N == block_size
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "encode_frames_plan needs jax_enable_x64 for exact int64 "
            "residual math; call jax.config.update('jax_enable_x64', True)")
    use_rice2 = bits_per_sample > 16
    if analysis == "f32":
        dtype = jnp.float32
    elif analysis == "f64":
        dtype = jnp.float64
    else:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    win = lpc.window_array(window_kind, N, dtype)

    # widest candidate channel: side = bps+1 bits (2-limb LPC residual
    # gate; wasted-bit shifts only narrow further)
    analyze = partial(_analyze_channel, win=win, max_lpc_order=max_lpc_order,
                      block_size=block_size,
                      max_partition_order=max_partition_order,
                      use_rice2=use_rice2,
                      max_sample_bits=bits_per_sample + 1)

    if C == 2 and bits_per_sample < 32:
        # narrow (int32) analysis panels whenever the widest candidate
        # channel (side = bps+1 bits) plus the 4 bits of widening from the
        # order-4 fixed diff cascade stays int32-exact: bps+1+4 <= 31.
        # Halves HBM bytes on every panel pass and avoids TPU int64
        # emulation; validity masks still discard any LPC residual that
        # exceeds int32 (flagged exactly, from the int64 accumulator).
        panel_dtype = jnp.int32 if bits_per_sample <= 26 else jnp.int64
        cands = decorrelate.candidates(pcm, panel_dtype)  # (B,4,N) [L,R,M,S]
        bps4 = decorrelate.candidate_bps(bits_per_sample)
        assignments = decorrelate.ASSIGNMENTS if mid_side else \
            decorrelate.ASSIGNMENTS[:3]

        # all four candidate channels analyzed as ONE (4B, N) batch: the
        # analysis graph contains order-axis-sequential sections (Levinson,
        # quantize error feedback) whose latency is B-independent, so four
        # separate calls would pay that latency four times
        flat = cands.reshape(B * 4, N)
        bps_flat = jnp.tile(jnp.asarray(bps4, jnp.int32), B)
        full = analyze(flat, bps_flat)
        plans = [
            {k: v.reshape((B, 4) + v.shape[1:])[:, i] for k, v in full.items()}
            for i in range(4)
        ]

        if exhaustive:
            totals = jnp.stack(
                [plans[c0]["subframe_bits"] + plans[c1]["subframe_bits"]
                 for _, c0, c1 in assignments], axis=1)
            choice = jnp.argmin(totals, axis=1)  # ties -> reference order
        else:
            # fast abs-sum rule (reference: src/encode.rs:2463-2674)
            sums = jnp.abs(cands).sum(axis=2, dtype=jnp.int64)  # (B, 4)
            if mid_side:
                cand_order = [(0b0001, 0, 1), (0b1000, 0, 3),
                              (0b1001, 3, 1), (0b1010, 2, 3)]
            else:
                cand_order = [(0b1000, 0, 3), (0b1001, 3, 1), (0b0001, 0, 1)]
            assignments = tuple(cand_order)
            totals = jnp.stack([sums[:, c0] + sums[:, c1]
                                for _, c0, c1 in assignments], axis=1)
            choice = jnp.argmin(totals, axis=1)

        codes = jnp.asarray([a[0] for a in assignments], jnp.uint8)
        src0 = jnp.asarray([a[1] for a in assignments], jnp.int32)
        src1 = jnp.asarray([a[2] for a in assignments], jnp.int32)
        assignment = codes[choice]
        ch0 = _gather_plans(plans, src0[choice])
        ch1 = _gather_plans(plans, src1[choice])
        plan = {"assignment": assignment, "channels": [ch0, ch1]}
    else:
        # independent layout (mono, >2 channels, or 32 bps stereo)
        assignment = jnp.full(B, C - 1, jnp.uint8)
        panel_dtype = jnp.int32 if bits_per_sample <= 27 else jnp.int64
        if C > 1:
            flat = pcm.reshape(B * C, N).astype(panel_dtype)
            full = analyze(flat, jnp.int32(bits_per_sample))
            chans = [
                {k: v.reshape((B, C) + v.shape[1:])[:, c]
                 for k, v in full.items()}
                for c in range(C)
            ]
        else:
            chans = [analyze(pcm[:, 0].astype(panel_dtype),
                             jnp.int32(bits_per_sample))]
        plan = {"assignment": assignment, "channels": chans}

    if pack_budget and frame_pack:
        from .framepack import pack_frame_bodies

        plan = pack_frame_bodies(plan, block_size, bits_per_sample,
                                 pack_budget)
        if slim:
            # frame-packed assembly needs exactly these five leaves (the
            # body blobs already hold every header/warm-up/param field;
            # fallback frames re-encode from host PCM) — dropping the
            # per-channel plan tree shrinks every device->host download
            # (parallel/batch.py:_assemble_frames_packed)
            plan = {k: plan[k] for k in (
                "assignment", "frame_words", "body_bits", "inner_crc",
                "frame_fallback")}
    elif pack_budget:
        plan = _pack_plan_channels(plan, block_size, pack_budget)
    return plan


encode_frames_plan = partial(jax.jit, static_argnames=(
    "bits_per_sample", "block_size", "max_lpc_order", "max_partition_order",
    "mid_side", "exhaustive", "window_kind", "analysis", "pack_budget",
    "frame_pack", "slim",
))(_encode_frames_plan_impl)


# ---------------------------------------------------------------------------
# Single-blob plan transfer.  A plan dict has ~25 leaves; fetching each is a
# separate device->host DMA (a full RPC round trip on tunneled hosts).  The
# blob form serializes every leaf into ONE uint8 array on device so the
# whole plan comes back in a single transfer, and supports
# ``copy_to_host_async`` for download/compute overlap.
# ---------------------------------------------------------------------------

def _leaf_to_words(leaf: jnp.ndarray) -> jnp.ndarray:
    """Flatten a plan leaf to uint32 words (little-endian within words).

    The blob is uint32-native: 4-byte leaves (frame_words dominates every
    production blob) pass through as a zero-cost bitcast, instead of the
    u32->u8 bitcast whose minor-dim-4 relayout was measured at ~1.2 ms
    per step on v5e (tools/profile_xplane.py).  Narrow leaves pad to a
    word boundary and pack little-endian, which is exactly how the host
    unpacks them (np.frombuffer on the word buffer's bytes).
    """
    a = leaf.reshape(-1)
    if a.dtype == jnp.bool_:
        a = a.astype(jnp.uint8)
    size = a.dtype.itemsize
    if size == 4:
        return jax.lax.bitcast_convert_type(a, jnp.uint32)
    if size == 8:
        return jax.lax.bitcast_convert_type(a, jnp.uint32).reshape(-1)
    # 1- or 2-byte leaves: pad to a word multiple, widen, shift-or.
    per = 4 // size
    pad = (-a.shape[0]) % per
    if pad:
        a = jnp.pad(a, (0, pad))
    g = a.reshape(-1, per).astype(jnp.uint32)
    if size == 1:
        g = g & 0xFF
    else:
        g = g & 0xFFFF
    sh = jnp.arange(per, dtype=jnp.uint32) * (8 * size)
    return (g << sh[None, :]).sum(axis=1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=(
    "bits_per_sample", "block_size", "max_lpc_order", "max_partition_order",
    "mid_side", "exhaustive", "window_kind", "analysis", "pack_budget",
    "frame_pack", "slim",
))
def encode_frames_plan_blob(pcm: jnp.ndarray, *, bits_per_sample: int,
                            block_size: int, max_lpc_order,
                            max_partition_order: int, mid_side: bool = True,
                            exhaustive: bool = True,
                            window_kind=("tukey", 0.5),
                            analysis: str = "auto",
                            pack_budget: int = 0,
                            frame_pack: bool = False,
                            slim: bool = False) -> jnp.ndarray:
    """Like :func:`encode_frames_plan` but returns one flat uint32 array
    holding every plan leaf (tree_flatten order, each leaf word-aligned,
    little-endian within words).  Decode with :func:`plan_blob_spec` +
    :func:`unpack_plan_blob`."""
    plan = _encode_frames_plan_impl(
        pcm, bits_per_sample=bits_per_sample, block_size=block_size,
        max_lpc_order=max_lpc_order, max_partition_order=max_partition_order,
        mid_side=mid_side, exhaustive=exhaustive, window_kind=window_kind,
        analysis=analysis, pack_budget=pack_budget, frame_pack=frame_pack,
        slim=slim)
    leaves = jax.tree_util.tree_leaves(plan)
    return jnp.concatenate([_leaf_to_words(l) for l in leaves])


def plan_blob_spec(batch_shape, dtype, **kw):
    """Host-side (shape, dtype, treedef) description of a plan blob for a
    given input aval — computed without running anything."""
    shaped = jax.eval_shape(
        partial(_encode_frames_plan_impl, **kw),
        jax.ShapeDtypeStruct(batch_shape, dtype))
    leaves, treedef = jax.tree_util.tree_flatten(shaped)
    return [(l.shape, l.dtype) for l in leaves], treedef


def unpack_plan_blob(blob, spec):
    """Reassemble the plan dict from a downloaded blob (host, zero-copy).

    The blob is uint32 words; each leaf starts word-aligned and narrow
    leaves are little-endian packed (see _leaf_to_words)."""
    import numpy as np

    shapes, treedef = spec
    blob = np.ascontiguousarray(np.asarray(blob)).view(np.uint8)
    out, off = [], 0
    for shape, dtype in shapes:
        npdt = np.dtype(dtype.name if dtype.name != "bool" else "uint8")
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(blob, npdt, count, off).reshape(shape)
        if dtype.name == "bool":
            arr = arr.astype(bool)
        out.append(arr)
        off += -(count * npdt.itemsize) // 4 * -4  # next word boundary
    assert off == blob.nbytes, (off, blob.nbytes)
    return jax.tree_util.tree_unflatten(treedef, out)
