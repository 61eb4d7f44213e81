"""Scatter-free device bit packing: one-hot MXU chunks + Pallas merge/splice.

Round-4 redesign of the Rice-symbol word packer (the TPU re-expression of
the reference's record-then-playback bit serialization,
reference: src/encode.rs:3747-3962, 2259-2439).  The round-3 packer
combined per-symbol two-word emissions with XLA flat scatter-adds, which
the honest full-blob fence measured at ~44.5 ms per 2.1M symbols on v5e —
~90% of the whole encode step.  The round-4 shootout
(tools/profile_pack.py) measured the chunked one-hot einsum at 9.6 ms for
the same work, and the remaining ragged placement is two tiny Pallas
kernels doing dynamic-slice adds in VMEM:

1. ``chunk_panels``  (XLA, MXU): symbols are split into static chunks of
   T=128 per subframe row.  Within a chunk, each symbol's write window
   starts at a word offset local to the chunk's first write word; the
   worst legal span is guarded (overflowing rows fall back to host
   encoding).  A (T, R=128) one-hot einsum in two 16-bit halves places
   every symbol's hi/lo word contribution into the chunk's R-word panel —
   bit fields are disjoint, so f32 accumulation is exact (each 16-bit
   half sums to <= 0xFFFF).

2. ``merge_panels``  (Pallas): per subframe row, the 32 chunk panels are
   added into the row's word-aligned output panel at their chunk word
   offsets — one dynamic-slice add per chunk, all resident in VMEM.
   Adjacent chunks share exactly one boundary word; disjoint bit fields
   make the add an OR.

3. ``splice_subframes``  (Pallas): frame bodies are the bit-concatenation
   of their subframe panels.  Each subframe's bit length is known exactly
   from the planner, so the splice is a per-row funnel shift by
   (offset mod 32) plus one dynamic-slice add at (offset / 32) — again
   VMEM-resident, no scatter.

CPU (tests / virtual meshes) runs the same kernels in interpret mode.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK_T = 64    # symbols per one-hot chunk
CHUNK_R = 64    # words per chunk window (covers spans <= R-2 = 62 words)
# Round 5: T=128/R=128 -> 64/64 halves both the materialized one-hot
# (chunks x T x 2R s8) and the placement einsum's read/write traffic —
# the pack stage is bandwidth-bound (tools/xplane_table.py: one-hot
# build + einsums + relayout = ~2.4 ms/step of the 5.4 ms step at
# T=128).  The span cap tightens to 62 words = 31 bits/symbol average
# per 64-symbol chunk; denser chunks flag pack_ovf and the frame falls
# back to host encoding (same guard as before, tighter threshold —
# escape symbols cap at ~25 bits for 24-bit audio, so real streams
# stay far below it).
BLOCK_W = 64    # einsum block-placement granularity (window = 2 blocks)
# panel slack callers must budget past the largest in-budget offset so
# clamped windows stay in-row on both merge paths (the Pallas path's
# 128-aligned window is the wider)
MERGE_SLACK = 128 + max(CHUNK_R, 128)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def samples_strategy() -> str:
    """Which residual-sample packing strategy the planner should trace.

    "panel" (default): chunked one-hot MXU + merge — measured 4.7x
    faster than the flat scatter on v5e at the preset -8 shape.
    FLAC_TPU_PACK_SCATTER=1 forces the round-3 scatter-add path.
    """
    return "scatter" if os.environ.get("FLAC_TPU_PACK_SCATTER") == "1" \
        else "panel"


def merge_strategy() -> str:
    """How chunk windows land on the row panel in the panel strategy.

    "einsum" (default): the fused 128-aligned-window formulation
    (chunkmerge_panels) — one one-hot MXU pass at 2R-wide windows plus a
    block-placement einsum on exact-in-f32 u16 halves; no sequential
    per-chunk loop at all (27% faster than the Pallas merge on v5e at
    the preset -8 shape, tools/proto_packv2.py).
    FLAC_TPU_PACK_MERGE=pallas forces the round-4 chunk_panels +
    merge_panels pipeline.
    """
    return "pallas" if os.environ.get("FLAC_TPU_PACK_MERGE") == "pallas" \
        else "einsum"


# ---------------------------------------------------------------------------
# 1. chunked one-hot panels (XLA / MXU)
# ---------------------------------------------------------------------------

def _symbol_geometry(values, widths, ends, mask):
    """Shared hi/lo word contributions + chunk geometry.

    Returns (hic, loc (rows*C, T) uint32, w0c (rows*C, T) write words,
    m (rows*C, T) bool, offs (rows*C,) chunk word offsets, overflow
    (rows, C) bool span flags).
    """
    rows, N = ends.shape
    assert N % CHUNK_T == 0, N
    C = N // CHUNK_T

    # all-int32 geometry (panel-local offsets fit int32; values fit
    # uint32: rice <= 31 value bits + stop, escape <= 31 bits) — avoids
    # TPU int64 emulation on every (rows, N) pass
    ends32 = ends.astype(jnp.int32)
    w32 = widths.astype(jnp.int32)
    start = ends32 - w32
    word0 = jax.lax.shift_right_logical(start, jnp.int32(5))
    sh = start & 31
    v32 = values.astype(jnp.uint32)
    e = (sh + w32).astype(jnp.uint32)  # pattern end bit in the 64-window
    hi = jnp.where(e <= 32,
                   v32 << ((jnp.uint32(32) - e) & 31),
                   v32 >> ((e - 32) & 31))
    lo = jnp.where(e <= 32, jnp.uint32(0), v32 << ((jnp.uint32(64) - e) & 31))
    hi = jnp.where(mask, hi, 0)
    lo = jnp.where(mask, lo, 0)

    w0c = word0.reshape(rows * C, CHUNK_T)
    m = mask.reshape(rows * C, CHUNK_T)
    # chunk offset = first LIVE symbol's write word (dead symbols carry
    # arbitrary word0); rows with no live symbol produce a zero panel
    big = jnp.int32(1 << 30)
    offs = jnp.min(jnp.where(m, w0c, big), axis=1)
    offs = jnp.where(offs == big, 0, offs)
    span = jnp.max(jnp.where(m, w0c - offs[:, None], 0), axis=1)
    overflow = (span > CHUNK_R - 2).reshape(rows, C)
    return (hi.reshape(rows * C, CHUNK_T), lo.reshape(rows * C, CHUNK_T),
            w0c, m, offs, overflow)


def chunk_panels(values: jnp.ndarray, widths: jnp.ndarray,
                 ends: jnp.ndarray, mask: jnp.ndarray):
    """Per-chunk one-hot word panels for one batch of subframe rows.

    values/widths/ends/mask: (rows, N); ``ends`` are PANEL-LOCAL bit
    offsets (bit 0 = panel word 0 bit 31, MSB-first), ``values`` hold the
    symbol's low ``widths`` bits (leading unary zeros are implicit).

    Returns (panels (rows, C, R) uint32, offs (rows, C) int32 chunk word
    offsets, overflow (rows,) bool).  Chunks whose written span exceeds
    R-2 words lose bits (masked by the one-hot window) and flag their row.
    """
    rows, N = ends.shape
    C = N // CHUNK_T
    hic, loc, w0c, m, offs, ovf = _symbol_geometry(values, widths, ends,
                                                   mask)
    local = jnp.where(m, w0c - offs[:, None], -2)  # no one-hot match
    panels = _onehot_words(hic, loc, local, CHUNK_R)
    return (panels.reshape(rows, C, CHUNK_R),
            offs.reshape(rows, C), ovf.any(axis=1))


def chunkmerge_panels(values: jnp.ndarray, widths: jnp.ndarray,
                      ends: jnp.ndarray, mask: jnp.ndarray, P: int):
    """Fused scatter-free packer: (rows, N) symbols -> ((rows, P) merged
    uint32 panels, (rows,) overflow) with NO sequential merge loop.

    Same contract and overflow flags as chunk_panels + merge_panels
    (tests pin equality on non-overflowing rows).  Two MXU passes:

    1. symbols land in a 2R-wide 128-ALIGNED window per chunk — the
       (chunk offset mod 128) shift is folded into the one-hot COLUMN,
       so window word j is panel word (offs & ~127) + j;
    2. each chunk window lands on the panel's P/128 blocks via a block
       one-hot einsum over u16 halves: products and partial sums are
       integers < 2^24 (disjoint bit fields keep per-column half sums
       < 2^16 across ALL chunks), exact in f32 at precision='highest'.
    """
    rows, N = ends.shape
    C = N // CHUNK_T
    W = 2 * BLOCK_W                            # chunk window (2 blocks)
    assert P % BLOCK_W == 0 and P >= W, P
    assert CHUNK_R <= BLOCK_W                  # span + align slop fit W
    BLK = P // BLOCK_W
    hic, loc, w0c, m, offs, ovf = _symbol_geometry(values, widths, ends,
                                                   mask)
    offs = jnp.clip(offs, 0, P - W)
    a0 = offs & ~jnp.int32(BLOCK_W - 1)
    # in [0, W-3] for legal chunks: (offs - a0) <= BLOCK_W-1, span <= R-2
    local = jnp.clip(w0c - a0[:, None], -2, W - 2)
    local = jnp.where(m, local, -2)

    # split one-hot: local = BLOCK_W*q + r with q in {0,1}; the window
    # placement factors as (plane x q-mask) @ onehot(r), which halves the
    # materialized one-hot (the pack stage's largest HBM tensor, measured
    # ~0.9 ms/step at (c, t, W) s8 — tools/xplane_table.py round 5) at
    # the same MAC count: 18 masked planes against a (c, t, W/2) one-hot.
    H = BLOCK_W
    lr = jnp.where(local >= 0, local & (H - 1), -2)
    r_ids = jnp.arange(H, dtype=jnp.int32)
    # the barrier pins the one-hot as a materialized s8 operand (see
    # _onehot_planes)
    oh = jax.lax.optimization_barrier(
        (lr[:, :, None] == r_ids[None, None, :]).astype(jnp.int8))
    byte_sh = (jnp.arange(4, dtype=jnp.uint32) * 8)[:, None, None]

    def bytes_(c):
        return (((c[None] >> byte_sh) & jnp.uint32(0xFF)).astype(jnp.int32)
                - 128).astype(jnp.int8)

    ones = jnp.ones((1,) + hic.shape, jnp.int8)
    p9 = jnp.concatenate([bytes_(hic), bytes_(loc), ones])   # (9, c, t)
    in_q0 = ((local >= 0) & (local < H)).astype(jnp.int8)[None]
    in_q1 = (local >= H).astype(jnp.int8)[None]
    # masked-off symbols contribute 0 to both the byte sums and the
    # ones-count plane of their non-half, so bias correction stays exact
    p18 = jnp.concatenate([p9 * in_q0, p9 * in_q1])          # (18, c, t)
    out18 = jnp.einsum("vct,ctr->vcr", p18, oh,
                       preferred_element_type=jnp.int32)     # (18, c, H)

    # block placement runs on the RAW byte-count planes and the byte
    # recombination happens after it: both are linear, placement only
    # relocates window words to blocks, and per-block plane sums stay
    # integers < 2^24 (<= C chunks x 64 symbols x 255 + bias counts), so
    # the f32 einsum is exact.  Recombining last removes the u32 window
    # materialization, its relayout copy, and the 16-bit half splits the
    # earlier formulation paid between the two einsums (measured ~0.5
    # ms/step of pure layout copies, tools/xplane_table.py round 5).
    b0 = (a0 // BLOCK_W).reshape(rows, C)
    ohb = (b0[:, :, None] == jnp.arange(BLK, dtype=jnp.int32)
           ).astype(jnp.float32)                        # (rows, C, BLK)
    o18 = out18.reshape(18, rows, C, H).astype(jnp.float32)
    place18 = jnp.einsum("rcb,vrcj->rbvj", ohb, o18,
                         precision="highest")           # (r, BLK, 18, H)

    def word(q, j0):  # byte recombination, exact mod 2^32 by linearity
        corr = place18[:, :, 9 * q + 8] * 128.0  # placed ones-counts
        return sum(((place18[:, :, 9 * q + j0 + i] + corr)
                    .astype(jnp.int32).astype(jnp.uint32)
                    << jnp.uint32(8 * i)) for i in range(4))

    # window word BLOCK_W*q + j: concatenate the two halves
    hi_w = jnp.concatenate([word(0, 0), word(1, 0)], axis=2)  # (r, BLK, W)
    lo_w = jnp.concatenate([word(0, 4), word(1, 4)], axis=2)
    # lo lands at local+1: one window-word shift, POST-placement (the
    # placement maps window word j to panel word a0 + j, so the +1 word
    # commutes; live locals are <= W-2 so nothing shifts out)
    lo_sh = jnp.concatenate(
        [jnp.zeros_like(lo_w[:, :, :1]), lo_w[:, :, :-1]], axis=2)
    win_w = hi_w + lo_sh                       # disjoint bit fields
    first = win_w[:, :, :BLOCK_W]              # window block 0 -> b0
    second = win_w[:, :, BLOCK_W:]             # window block 1 -> b0 + 1
    shifted = jnp.concatenate(
        [jnp.zeros_like(second[:, :1]), second[:, :-1]], axis=1)
    merged = first + shifted                   # (rows, BLK, BLOCK_W)
    return merged.reshape(rows, P), ovf.any(axis=1)


def _onehot_planes(hi: jnp.ndarray, lo: jnp.ndarray, local: jnp.ndarray,
                   W: int) -> jnp.ndarray:
    """Raw byte-count planes of the one-hot placement: (9, R_, W) int32.

    Planes 0-3 are the hi word's biased-byte column sums, 4-7 the lo
    word's, plane 8 the live-symbol count per column (for undoing the
    -128 bias).  Callers recombine bytes into u32 words — either
    directly (:func:`_onehot_words`) or after further linear placement
    (:func:`chunkmerge_panels`), which is exact mod 2^32 by linearity.
    NOTE: the lo planes are placed at column ``local`` like the hi
    planes; the +1 word shift is the caller's job."""
    r_ids = jnp.arange(W, dtype=jnp.int32)
    # the barrier pins the one-hot as a materialized s8 operand: without
    # it XLA may fuse the comparison into the dot's consumer side and
    # lower the contraction as a per-element loop reduce on the VPU
    # (measured 2.7x slower than the MXU dot at production shapes)
    oh = jax.lax.optimization_barrier(
        (local[:, :, None] == r_ids[None, None, :]).astype(jnp.int8))

    byte_sh = (jnp.arange(4, dtype=jnp.uint32) * 8)[:, None, None]

    def bytes_(c):  # (R_, T_) uint32 -> (4, R_, T_) int8 biased byte planes
        return (((c[None] >> byte_sh) & jnp.uint32(0xFF)).astype(jnp.int32)
                - 128).astype(jnp.int8)

    ones = jnp.ones((1,) + hi.shape, jnp.int8)
    planes = jnp.concatenate([bytes_(hi), bytes_(lo), ones])  # (9, R_, T_)
    return jnp.einsum("vct,ctr->vcr", planes, oh,
                      preferred_element_type=jnp.int32)


def _onehot_words(hi: jnp.ndarray, lo: jnp.ndarray, local: jnp.ndarray,
                  W: int) -> jnp.ndarray:
    """Place (R_, T_) hi/lo uint32 word contributions at word columns
    ``local``/``local + 1`` of a (R_, W) uint32 panel via one int8 MXU
    one-hot matmul.

    ONE one-hot for all value planes: the lo word lands at local+1,
    which is the hi placement shifted one column — a static column roll
    of the matmul result, so a second one-hot never materializes.  int8
    one-hot + BIASED BYTE planes (8 value planes + 1 ones plane instead
    of 16 nibble planes — 44% fewer MXU MACs, the stage's bound): s8 x
    s8 -> s32 MXU accumulation is always exact for int8 inputs; the
    -128 bias (to fit bytes in s8) is undone per column via the
    ones-plane count, and byte recombination is exact mod 2^32 by
    linearity.  The caller's disjoint-bit-field invariant is what makes
    the panel *add* equal a bitwise OR.  ``local`` must be in
    [0, W-2] for live symbols (out-of-range produces no one-hot match).
    """
    out9 = _onehot_planes(hi, lo, local, W)
    corr = out9[8] * 128  # per-column bias correction (live-symbol count)

    def word(j0):  # carries across byte boundaries propagate correctly
        return sum(((out9[j0 + i] + corr).astype(jnp.uint32)
                    << jnp.uint32(8 * i)) for i in range(4))

    hi_w = word(0)
    lo_w = word(4)
    # place lo at local+1: shift columns right by one (window slot W-1
    # would spill; callers guarantee live local <= W-2)
    return hi_w + jnp.concatenate(
        [jnp.zeros((hi.shape[0], 1), jnp.uint32), lo_w[:, :-1]], axis=1)


FIELD_WINDOW_WORDS = 64  # covers every subframe header field (< 50 words)


def pack_fields_window(values: jnp.ndarray, widths: jnp.ndarray,
                       ends: jnp.ndarray, mask: jnp.ndarray,
                       W: int = FIELD_WINDOW_WORDS) -> jnp.ndarray:
    """One-hot MXU placement of per-row header fields into the first W
    words of each row's panel.

    values/widths/ends/mask: (rows, F) — ``ends`` are PANEL-LOCAL bit
    offsets; every live field must end within (W-1)*32 bits (geometry-
    guaranteed for subframe header fields: header + wasted unary +
    warm-ups + LPC params end < 50 words).  Returns (rows, W) uint32 to
    be added onto the merged panel's first W words (bit fields disjoint
    by construction, so the add is an OR).

    Replaces per-field XLA scatter-adds, which execute as a serial
    ~8 ns/element loop on TPU (~0.6 ms/step for the 69 header fields at
    B=256 preset -8; the remaining partition-header scatter keeps rows'
    monotone 64-entry tables on the scatter path).
    """
    rows, F = ends.shape
    ends32 = ends.astype(jnp.int32)
    w32 = widths.astype(jnp.int32)
    mask = mask & (ends32 <= (W - 1) * 32) & (w32 > 0)
    start = ends32 - w32
    word0 = jax.lax.shift_right_logical(start, jnp.int32(5))
    sh = start & 31
    v32 = values.astype(jnp.uint32)
    e = (sh + w32).astype(jnp.uint32)  # pattern end bit in the 64-window
    hi = jnp.where(e <= 32,
                   v32 << ((jnp.uint32(32) - e) & 31),
                   v32 >> ((e - 32) & 31))
    lo = jnp.where(e <= 32, jnp.uint32(0), v32 << ((jnp.uint32(64) - e) & 31))
    hi = jnp.where(mask, hi, 0)
    lo = jnp.where(mask, lo, 0)
    local = jnp.where(mask, word0, -2)
    return _onehot_words(hi, lo, local, W)


# ---------------------------------------------------------------------------
# 2. Pallas merge: chunk panels -> per-row word panel
# ---------------------------------------------------------------------------

_RB = 8  # rows per program (VMEM sublane tile)


# Mosaic dynamic lane slices must be provably 128-aligned, so the merge
# kernel's aligned window is 128 (alignment slop) + CHUNK_R (span),
# rounded to a vreg multiple
_MERGE_WIN = 128 + max(CHUNK_R, 128)


def _merge_kernel(C: int, P: int):
    def kernel(offs_ref, panels_ref, out_ref):
        # Mosaic requires dynamic lane indices provably 128-aligned, so
        # each chunk window lands via an aligned _MERGE_WIN-wide slice:
        # the window is zero-padded, lane-rotated by (off mod 128), and
        # added at the 128-aligned base (tpu.dynamic_rotate does the
        # rest).
        g = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)
        zpad = jnp.zeros((1, _MERGE_WIN - CHUNK_R), jnp.uint32)

        def row(r, _):
            def chunk(c, _):
                off = offs_ref[g * _RB + r, c]
                a0 = off & ~jnp.int32(127)
                d = off - a0
                win = panels_ref[r, c, :].reshape(1, CHUNK_R)
                padded = jnp.concatenate([win, zpad], axis=1)
                rolled = pltpu.roll(padded, d, axis=1)
                a0 = pl.multiple_of(a0, 128)
                cur = out_ref[pl.ds(r, 1), pl.ds(a0, _MERGE_WIN)]
                out_ref[pl.ds(r, 1), pl.ds(a0, _MERGE_WIN)] = cur + rolled
                return jnp.int32(0)

            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(C), chunk,
                                     jnp.int32(0))

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(_RB), row, jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("P", "interpret"))
def merge_panels(panels: jnp.ndarray, offs: jnp.ndarray, P: int,
                 interpret: bool | None = None) -> jnp.ndarray:
    """(rows, C, R) chunk panels + (rows, C) word offsets -> (rows, P).

    Every chunk's R-word window must satisfy off + R <= P (the caller
    sizes P with a CHUNK_R slack past the largest in-budget offset).
    """
    rows, C, R = panels.shape
    assert R == CHUNK_R
    if interpret is None:
        interpret = _use_interpret()
    # invalid (overflowing / fallback) rows may carry junk offsets; clamp
    # so the aligned window-wide dynamic-slice add can never leave the
    # row's own panel (the caller sizes P with a _MERGE_WIN slack)
    assert P >= _MERGE_WIN, P
    offs = jnp.clip(offs, 0, P - _MERGE_WIN).astype(jnp.int32)
    pad = (-rows) % _RB
    if pad:
        panels = jnp.pad(panels, ((0, pad), (0, 0), (0, 0)))
        offs = jnp.pad(offs, ((0, pad), (0, 0)))
    rp = rows + pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, C, R), lambda g, offs_ref: (g, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, P), lambda g, offs_ref: (g, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _merge_kernel(C, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, P), jnp.uint32),
        interpret=interpret,
    )(offs, panels)
    return out[:rows] if pad else out


# ---------------------------------------------------------------------------
# 3. Pallas splice: subframe panels -> frame slots
# ---------------------------------------------------------------------------

def _splice_kernel(S: int, P: int, W: int):
    def kernel(offs_ref, panels_ref, out_ref):
        g = pl.program_id(0)
        out_ref[...] = jnp.zeros_like(out_ref)

        def row(b, _):
            def sub(s, _):
                return body(b, s)

            return jax.lax.fori_loop(jnp.int32(0), jnp.int32(S), sub,
                                     jnp.int32(0))

        def body(b, s):
            bit_off = offs_ref[g * _RB + b, s]
            word_off = jax.lax.shift_right_logical(bit_off, jnp.int32(5))
            sh = (bit_off & 31).astype(jnp.uint32)
            p = panels_ref[b, s, :].reshape(1, P)
            # funnel shift right by sh with the previous word's low bits
            # (shl amount masked to 31 so the sh == 0 branch, though
            # discarded by the where, never shifts by 32)
            shl = (jnp.uint32(32) - sh) & jnp.uint32(31)
            prev = jnp.concatenate(
                [jnp.zeros((1, 1), jnp.uint32), p[:, :-1]], axis=1)
            shifted = jnp.where(sh == 0, p, (p >> sh) | (prev << shl))
            # the shifted-out low bits of the last word land one word on
            # (the P+1'th); fold them into the zero pad before the rotate
            last = jnp.where(sh == 0, jnp.uint32(0), p[:, -1:] << shl)
            padded = jnp.concatenate(
                [shifted, last,
                 jnp.zeros((1, 127), jnp.uint32)], axis=1)  # (1, P+128)
            # aligned dynamic-slice add (Mosaic needs lane indices that
            # are provably multiples of 128): rotate by word_off mod 128,
            # add at the aligned base
            a0 = word_off & ~jnp.int32(127)
            d = word_off - a0
            rolled = pltpu.roll(padded, d, axis=1)
            a0 = pl.multiple_of(a0, 128)
            cur = out_ref[pl.ds(b, 1), pl.ds(a0, P + 128)]
            out_ref[pl.ds(b, 1), pl.ds(a0, P + 128)] = cur + rolled
            return jnp.int32(0)

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(_RB), row, jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("W", "interpret"))
def splice_subframes(panels: jnp.ndarray, bit_offs: jnp.ndarray, W: int,
                     interpret: bool | None = None) -> jnp.ndarray:
    """(B, S, P) subframe panels + (B, S) body bit offsets -> (B, W) slots.

    Requires max(bit_offs)/32 + P + 1 <= W (caller sizes W accordingly).
    """
    B, S, P = panels.shape
    if interpret is None:
        interpret = _use_interpret()
    # fallback frames (e.g. verbatim) can report body offsets past the
    # slot; clamp so the aligned (P+128)-wide dynamic-slice add stays
    # inside the row's slot.  The rotate needs a vreg-aligned width.
    assert P % 128 == 0 and W >= P + 128, (P, W)
    bit_offs = jnp.clip(bit_offs, 0, (W - P - 128) * 32).astype(jnp.int32)
    pad = (-B) % _RB
    if pad:
        panels = jnp.pad(panels, ((0, pad), (0, 0), (0, 0)))
        bit_offs = jnp.pad(bit_offs, ((0, pad), (0, 0)))
    bp = B + pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // _RB,),
        in_specs=[
            pl.BlockSpec((_RB, S, P), lambda g, offs_ref: (g, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_RB, W), lambda g, offs_ref: (g, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _splice_kernel(S, P, W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, W), jnp.uint32),
        interpret=interpret,
    )(bit_offs, panels)
    return out[:B] if pad else out


# ---------------------------------------------------------------------------
# reference (host/test) implementations
# ---------------------------------------------------------------------------

def merge_panels_ref(panels, offs, P):
    """NumPy reference for :func:`merge_panels` (tests)."""
    panels = np.asarray(panels)
    offs = np.asarray(offs)
    rows, C, R = panels.shape
    out = np.zeros((rows, P), np.uint32)
    for r in range(rows):
        for c in range(C):
            o = offs[r, c]
            out[r, o:o + R] += panels[r, c]
    return out


def splice_subframes_ref(panels, bit_offs, W):
    """NumPy reference for :func:`splice_subframes` (tests)."""
    panels = np.asarray(panels)
    bit_offs = np.asarray(bit_offs)
    B, S, P = panels.shape
    out = np.zeros((B, W), np.uint32)
    for b in range(B):
        for s in range(S):
            off = int(bit_offs[b, s])
            wo, sh = off >> 5, off & 31
            p = panels[b, s].astype(np.uint64)
            if sh == 0:
                out[b, wo:wo + P] += p.astype(np.uint32)
            else:
                prev = np.concatenate([[np.uint64(0)], p[:-1]])
                shifted = (p >> np.uint64(sh)) | (
                    (prev << np.uint64(32 - sh)) & np.uint64(0xFFFFFFFF))
                out[b, wo:wo + P] += shifted.astype(np.uint32)
                out[b, wo + P] += np.uint32(
                    (int(p[-1]) << (32 - sh)) & 0xFFFFFFFF)
    return out
