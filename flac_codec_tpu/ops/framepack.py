"""Full-frame device packing (encode): complete FLAC frame bodies on device.

Everything after the frame header — subframe headers, wasted-bits unary,
warm-up samples, LPC parameter fields, Rice residual sections, final byte
alignment — is scatter-packed into a fixed-size per-frame word slot on
device, extending the residual-only packer (`ops.bitpack`).  A
position-weighted GF(2) inner product additionally reduces each frame's
CRC-16 to a single uint16 on device: with the FLAC CRC-16 (poly 0x18005,
init 0, no reflection) being linear, CRC(body) = x^(8L+15) * sum_p bit_p *
x^(-p) (mod P) where p is the bit position from the slot start — the
x^(-p) weights are STATIC per slot position, zero bits contribute nothing
(so slot padding is free), and only the final x^(8L+15) multiply depends
on the frame's byte length L, which the host finishes in O(log L).

The host assembler thus degenerates to: write the ~10-byte frame header
(varint frame number + CRC-8), memcpy the byte-aligned body out of the
slot, and append the combined CRC-16 — pure memory speed (TPU re-design
of the reference's per-frame serialization, src/encode.rs:2259-2439).

Verbatim subframes need full channel data and fall back to the host
encoder (flagged per frame), exactly like the residual-only packed mode.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from .bitpack import pack_residual_sections
from .common import TYPE_CONSTANT, TYPE_FIXED, TYPE_LPC, TYPE_VERBATIM

CRC16_POLY = 0x18005  # x^16 + x^15 + x^2 + 1 (RFC 9639 frame footer CRC)


# ---------------------------------------------------------------------------
# Static CRC-16 position-weight table
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def crc16_neg_pow_table(nbits: int) -> np.ndarray:
    """T[p] = x^(-p) mod P as uint16, p in [0, nbits).

    Multiplying by x^(-1): if the constant term is set, add P first (P has
    a constant term, so the sum is divisible by x), then divide by x.
    """
    out = np.empty(nbits, np.uint16)
    s = 1
    for p in range(nbits):
        out[p] = s
        s = ((s ^ CRC16_POLY) >> 1) if (s & 1) else (s >> 1)
    return out


def crc16_inner(words: jnp.ndarray, table: np.ndarray) -> jnp.ndarray:
    """(B, W) uint32 slot words -> (B,) uint16 GF(2) inner product.

    ``table`` is crc16_neg_pow_table(W*32); entry (w, j) weights bit j
    (MSB-first) of word w.

    MXU formulation: GF(2) inner product = parity of the per-CRC-bit
    match counts, count[b, r] = sum_p bit[b, p] * weight_bit[p, r] — one
    int8 matmul with exact int32 accumulation, then ``& 1``.  Replaces
    the 32-pass masked-XOR sweep over the slot panel (~64 full-panel
    reads/writes of HBM traffic) with one bit-plane expansion plus a
    (B, W*32) x (W*32, 16) MXU pass.

    The expansion runs on the u8 BYTE view of the slot panel (one s8
    write per bit from a 1-byte read) instead of shifting the u32 words
    32 ways: the word form materialized a u32[B, W, 32] broadcast plus a
    full-width u32 read in the convert fusion (~860 MB of HBM traffic
    per step at B=256/W=5248, measured ~0.5 ms — tools/xplane_table.py
    round 5); the byte form moves ~64 MB.  The static weight table is
    reordered to match the byte-LSB expansion order."""
    B, W = words.shape
    # byte k of a little-endian u32 view holds word bits [8k, 8k+8)
    # counting from the LSB; bit i of that byte is stream position
    # w*32 + 31 - 8k - i.  Reorder the static table to this layout.
    t = np.asarray(table, np.uint16).reshape(W, 32)
    k = np.arange(4)[:, None]
    i = np.arange(8)[None, :]
    t2 = t[:, (31 - 8 * k - i).reshape(-1)].reshape(-1)  # (W*32,) in
    planes = ((t2[:, None].astype(np.uint32)            # byte-expansion
               >> np.arange(16)[None, :]) & 1).astype(np.int8)
    byts = jax.lax.bitcast_convert_type(words, jnp.uint8)  # (B, W, 4)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (jax.lax.shift_right_logical(byts[..., None],
                                        shifts[None, None, None, :])
            & jnp.uint8(1)).astype(jnp.int8).reshape(B, W * 32)
    counts = jax.lax.dot_general(
        bits, jnp.asarray(planes), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # (B, 16) exact
    parity = (counts & 1).astype(jnp.uint16)
    weights = (jnp.uint16(1) << jnp.arange(16, dtype=jnp.uint16))
    return (parity * weights[None, :]).sum(axis=1).astype(jnp.uint16)


# ---------------------------------------------------------------------------
# Frame body packer
# ---------------------------------------------------------------------------

def subframe_panel_words(block_size: int, budget_bits: int) -> int:
    """Words per subframe panel (P): field margin (header 8 + wasted unary
    <=32 + warm-ups <=32*32 + LPC params <=9+32*15 < 1615 bits = 51 words)
    + the residual budget + the merge kernel's aligned-window slack
    (MERGE_SLACK), rounded to a lane tile."""
    from .packpanel import MERGE_SLACK

    per_sub = (budget_bits * block_size + 31) // 32
    need = per_sub + 52 + MERGE_SLACK
    return (need + 127) // 128 * 128


def frame_slot_words(S: int, block_size: int, budget_bits: int) -> int:
    """Words per frame slot: room for S spliced subframe panels, the last
    one placed via the splice kernel's aligned (P+128)-wide window."""
    per_sub = (budget_bits * block_size + 31) // 32
    P = subframe_panel_words(block_size, budget_bits)
    return (S - 1) * (per_sub + 64) + P + 192


def pack_frame_bodies(plan: dict, block_size: int, bps_base: int,
                      budget_bits: int):
    """Pack every frame's complete body into per-frame slots on device.

    plan: output of the batch planner (see encode_batch) BEFORE any
    packing: per-slot channels with residuals/kinds/params/po/rice_bits/
    warmup/subframe_bits/....  Adds to the plan:

      frame_words (B*W,) uint32 — slot blobs (bit 31 of word 0 = body bit 0)
      body_bits  (B,) int64     — exact body bit length (pre-alignment)
      inner_crc  (B,) uint16    — GF(2) inner product for the body CRC-16
      frame_fallback (B,) bool  — host must re-encode this frame
                                  (verbatim subframe or budget overflow)

    and removes the raw residual panels.  ``subframe_bits`` from the
    planner is the exact serialized subframe length, which makes every
    field offset computable before any packing happens.
    """
    from .packpanel import samples_strategy, splice_subframes

    channels = plan["channels"]
    S = len(channels)
    B = plan["assignment"].shape[0]
    N = block_size
    P = subframe_panel_words(block_size, budget_bits)
    W = frame_slot_words(S, block_size, budget_bits)
    panel_out = B * P + 2
    strategy = samples_strategy()

    # per-slot bits-per-sample (side channels carry one extra bit)
    a = plan["assignment"].astype(jnp.int32)
    if S == 2:
        side = [(a == 0b1001), (a == 0b1000) | (a == 0b1010)]
    else:
        side = [jnp.zeros(B, bool)] * S
    row_base = (jnp.arange(B, dtype=jnp.int64) * P) * 32

    sub_bits = [ch["subframe_bits"].astype(jnp.int64) for ch in channels]
    body_bits = sum(sub_bits)
    fallback = jnp.zeros(B, bool)
    for ch in channels:
        fallback = fallback | (ch["sub_type"] == TYPE_VERBATIM)
    # a frame whose packed body exceeds its slot cannot be spliced
    fallback = fallback | (body_bits > (W - 2) * 32)
    ok = ~fallback

    panels = []
    for s, ch in enumerate(channels):
        bps_s = bps_base + side[s].astype(jnp.int32)
        typ = ch["sub_type"].astype(jnp.int32)
        wasted = ch["wasted"].astype(jnp.int64)
        order = ch["order"].astype(jnp.int64)
        precision = ch["precision"].astype(jnp.int64)
        eff = bps_s.astype(jnp.int64) - wasted
        is_pred = (typ == TYPE_FIXED) | (typ == TYPE_LPC)
        is_lpc = typ == TYPE_LPC
        has_wasted = (typ != TYPE_CONSTANT) & (wasted > 0)

        # each subframe is packed into its own word-aligned P-word panel
        # (bit 0 of the subframe = panel word 0 bit 31); the splice kernel
        # below bit-concatenates the S panels into the frame slot
        base = row_base  # (B,) panel-aligned bit offset

        # field geometry first (every offset is computable up front) ...
        code6 = jnp.where(
            typ == TYPE_CONSTANT, 0,
            jnp.where(typ == TYPE_VERBATIM, 1,
                      jnp.where(typ == TYPE_FIXED, 0b001000 | order,
                                0b100000 | jnp.maximum(order - 1, 0))))
        hdr_val = (code6 << 1) | has_wasted.astype(jnp.int64)
        hdr_end = base + 8 + jnp.where(has_wasted, wasted, 0)
        warm = ch["warmup"].astype(jnp.int64)  # (B, 32)
        warm_end = hdr_end + order * eff
        pre_res = jnp.where(is_lpc, warm_end + 9 + order * precision,
                            warm_end)

        # ... so every small header/parameter field rides the residual
        # pack as a field group (one one-hot MXU window pass in panel
        # mode, chained scatters otherwise; field order is irrelevant
        # since all bit fields are disjoint):
        # 1. subframe header byte: pad(1) + type code(6) + wasted flag(1)
        # 2. wasted-bits unary: (wasted-1) zeros then a 1 -> value 1 at
        #    width `wasted`
        # 3a. constant value: the UNSHIFTED sample at full slot bps
        #     (warmup holds the wasted-shifted channel)
        cval = (warm[:, 0] << wasted) & ((jnp.int64(1) << bps_s.astype(
            jnp.int64)) - 1)
        # 3b. warm-up samples (fixed/LPC): order * eff-bit signed fields
        j = jnp.arange(32, dtype=jnp.int64)
        wmask = ok[:, None] & is_pred[:, None] & (j[None, :] < order[:, None])
        wval = warm & ((jnp.int64(1) << eff[:, None]) - 1)
        wend = hdr_end[:, None] + (j[None, :] + 1) * eff[:, None]
        # 4. LPC parameter fields: precision-1 (4) + shift (signed 5)
        shift = ch["shift"].astype(jnp.int64)
        pval = ((precision - 1) << 5) | (shift & 31)
        # 5. quantized coefficients: order * precision-bit signed fields
        q = ch["qcoeffs"].astype(jnp.int64)  # (B, 32)
        qmask = ok[:, None] & is_lpc[:, None] & (j[None, :] < order[:, None])
        qval = q & ((jnp.int64(1) << precision[:, None]) - 1)
        qend = warm_end[:, None] + 9 + (j[None, :] + 1) * precision[:, None]
        fields = [
            (hdr_val, jnp.full(B, 8, jnp.int64), base + 8, ok),
            (jnp.ones(B, jnp.int64), wasted, hdr_end, ok & has_wasted),
            (cval, bps_s.astype(jnp.int64),
             hdr_end + bps_s.astype(jnp.int64), ok & (typ == TYPE_CONSTANT)),
            (wval, jnp.broadcast_to(eff[:, None], (B, 32)), wend, wmask),
            (pval, jnp.full(B, 9, jnp.int64), warm_end + 9, ok & is_lpc),
            (qval, jnp.broadcast_to(precision[:, None], (B, 32)), qend,
             qmask),
        ]
        words, bits, pack_ovf = pack_residual_sections(
            ch["residuals"], order.astype(jnp.int32),
            ch["po"].astype(jnp.int32), ch["kinds"], ch["params"],
            ch["rice_bits"].astype(jnp.int32), block_size, panel_out,
            pre_res, budget_bits * block_size, live=ok & is_pred,
            samples=strategy, panel_words=P, fields=fields)
        ch["res_bits"] = jnp.where(is_pred, bits, 0).astype(bits.dtype)
        ch["res_overflow"] = is_pred & (bits > budget_bits * block_size)
        fallback = fallback | ch["res_overflow"] | pack_ovf
        del ch["residuals"]
        panels.append(words[:B * P].reshape(B, P))

    # splice the S panels into per-frame slots at their exact bit offsets
    offs = jnp.zeros(B, jnp.int64)
    bit_offs = []
    for s in range(S):
        bit_offs.append(offs)
        offs = offs + sub_bits[s]
    bit_off_arr = jnp.stack(bit_offs, axis=1).astype(jnp.int32)
    slots = splice_subframes(jnp.stack(panels, axis=1), bit_off_arr, W)

    plan["frame_words"] = slots.reshape(-1)
    plan["body_bits"] = body_bits
    plan["inner_crc"] = crc16_inner(slots, crc16_neg_pow_table(W * 32))
    plan["frame_fallback"] = fallback
    return plan
