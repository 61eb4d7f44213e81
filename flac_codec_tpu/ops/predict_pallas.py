"""Pallas TPU kernel for the inverse-LPC recurrence (decode hot loop).

The XLA scan in ops/predict.py is exact but sequences every per-sample op
through HBM with fixed per-op overhead (~1.3 us/sample measured on v5e) —
two orders of magnitude from the hardware's ability.  This kernel keeps
the whole (block, batch-tile) panel resident in VMEM and runs the
recurrence as a single fori_loop, so the per-sample cost is a few dozen
VPU instructions (reference hot loop: src/decode.rs:1738-1752).

Exactness without int64 (Mosaic lowers none): the accumulator is split at
bit L (and, for the wide mode, again at L+12) into int32 partial dot
products,

    x   = x_hi * 2^L + x_lo                       (2-limb, |x| < 2^17)
    x   = x_hi * 2^(L+12) + x_mid * 2^L + x_lo    (3-limb, |x| < 2^25)
    acc = S_hi * 2^(...) + [S_mid * 2^L] + S_lo

and the FLAC prediction  acc >> s  decomposes for s <= L as

    (S_hi << (... - s)) + [S_mid << (L - s)] + (S_lo >> s)

Each decomposed term is an integer times a power of two (so floor
distributes), each is computed mod 2^32 (XLA shifts and adds wrap), and
their mod-2^32 sum equals the true prediction whenever that prediction
fits int32 — which holds for every stream whose decoded samples are in
range.  The S_* partial sums stay below 2^31 by construction when the
host-side gate `pallas_predict_ok` holds:

  * 2-limb: |x| < 2^17 (decoded samples of any spec-conforming stream
    with bits-per-sample <= 16, side channels included)
  * 3-limb: |x| < 2^25 (any spec-conforming stream with
    bits-per-sample <= 24, side channels included) — one extra multiply
    per tap
  * 4-limb (11-bit limbs): |x| < 2^31 — 32-bit-wide samples, any shift,
    two extra multiplies per tap; 33-bit side channels remain on the
    int64 scan (int32 buffers cannot carry them)
  * |q| < 2^14 (4-bit precision code => <= 15-bit signed coefficients)
  * 2-limb additionally needs shift <= L for every LPC row
    (L = 13 for tap buckets <= 16, 12 for the 32-tap bucket); the 3-limb
    mode assembles the full 64-bit accumulator as (hi, lo) int32 pairs
    with carry propagation and funnel-shifts it, so ANY shift works —
    24-bit streams routinely quantize to shift 14/15

Rows that fail the gate — 32-bit-wide samples — take
the exact XLA int64 scan instead; the two paths are bit-identical on the
gated domain (pinned by tests/test_predict_ops.py).  A hostile-but-
CRC-valid stream engineered to push predictions past int32 wraps here
where the int64 scan would not; the host decoder remains the validating
surface for untrusted input.

Mosaic notes (v5e, 2026-08, round-3 revision): the kernel streams (R,
1024) row blocks through a grid with the T-sample history carried in
fori registers and persisted across grid steps via scratch — full-lane
tiles, sequential-only ref access.  Three lowering rules learned the
hard way (each with a minimal repro, see BASELINE.md): BlockSpec
index-map literals must be wrapped jnp.int32 under jax_enable_x64 (bare
0 traces as i64 and Mosaic fails to legalize the map); loop-carry inits
must be ref-derived (a jnp.zeros init trips an "invalid relayout" on the
carried vectors); and dynamic row indexing is only fast on 2-D refs with
the dynamic axis on sublanes (outer-dim indexing of 3-D blocks lowers
~800x slower).  Round-2's perf claim for this kernel (~5 ns/step,
~100 GB/s) was a fence artifact — block_until_ready acks early through
the tunneled runtime.  Honest (dependency-chained + scalar-sync) rate:
~1.4 us per sequential sample row over 1024 lanes at taps=16, i.e.
~1.2-1.4 GB/s of PCM per chip at B=1024 — 4-5 host cores' worth of
predict per chip, so the host Rice parse (not this kernel) remains the
decode pipeline's per-core ceiling.  The surrounding arithmetic stays
int32 end-to-end; int64 anywhere in the wrapper costs more than the
kernel itself under the x64 rewriter.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch-tile width (lanes); B is padded to a multiple of this
_BT = 1024


def _limb_bits(taps: int) -> int:
    # S_lo = sum of `taps` products q*x_lo must stay below 2^31:
    # taps * 2^14 * 2^L < 2^31  =>  L <= 13 for taps<=16, 12 for taps<=32
    return 13 if taps <= 16 else 12


# the 4-limb (32-bit-wide samples) mode uses fixed 11-bit limbs:
# 4*11 = 44 >= 32 sample bits, and each partial sum stays below
# 32 taps * 2^14 * 2^11 = 2^30 < 2^31
LIMB4 = 11


def _kernel(rows_per_block: int, t_taps: int, limb: int, limbs: int):
    mask = (1 << limb) - 1
    T = t_taps
    R = rows_per_block

    def kernel(qs_ref, meta_ref, x_ref, out_ref, hist_ref):
        # Streaming-grid form (round 3): the T-sample history rides in
        # fori-carried registers (persisted across grid steps via the
        # hist scratch), so the residual panel streams through VMEM in
        # (R, BT) row blocks and the output is written sequentially —
        # full-width 1024-lane tiles instead of the old whole-panel
        # 256-lane layout (4x the per-op lane utilization, measured).
        # qs_ref: (>=8, BT) taps, row j = q_j (zero past the order);
        # meta_ref: (8, BT) row 0 = shift, row 1 = order;
        # x_ref/out_ref: (R, BT) blocks of the (Npad, BT) panels.
        g = pl.program_id(0)
        s = meta_ref[0, :]
        sh_hi = limb - s
        ordv = meta_ref[1, :]

        @pl.when(g == 0)
        def _():
            z = x_ref[0, :] * 0   # ref-derived zeros: layout-compatible
            for j in range(T):
                hist_ref[j, :] = z

        def one_step(r, hist):
            # tap j multiplies x[n-1-j], carried in registers: hist[j]
            # holds out[n-1-j].  (Round 3: history used to be re-read
            # from out_ref rows — 17 dynamic VMEM row accesses per step
            # at ~10x the cost of the arithmetic; the register shift
            # chain removed them.  Measured honestly with chained
            # dispatch + scalar sync, not block_until_ready.)
            h = hist[0]
            q0 = qs_ref[0, :]
            if limbs == 4:
                m4 = (1 << LIMB4) - 1
                s0 = q0 * (h & m4)
                s1 = q0 * ((h >> LIMB4) & m4)
                s2 = q0 * ((h >> (2 * LIMB4)) & m4)
                s3 = q0 * (h >> (3 * LIMB4))
            elif limbs == 3:
                s_hi = q0 * (h >> (limb + 12))
                s_mid = q0 * ((h >> limb) & 0xFFF)
            else:
                s_hi = q0 * (h >> limb)
                s_mid = None
            if limbs != 4:
                s_lo = q0 * (h & mask)
            for j in range(1, T):
                h = hist[j]
                qj = qs_ref[j, :]
                if limbs == 4:
                    s0 = s0 + qj * (h & m4)
                    s1 = s1 + qj * ((h >> LIMB4) & m4)
                    s2 = s2 + qj * ((h >> (2 * LIMB4)) & m4)
                    s3 = s3 + qj * (h >> (3 * LIMB4))
                    continue
                if limbs == 3:
                    s_hi = s_hi + qj * (h >> (limb + 12))
                    s_mid = s_mid + qj * ((h >> limb) & 0xFFF)
                else:
                    s_hi = s_hi + qj * (h >> limb)
                s_lo = s_lo + qj * (h & mask)
            if limbs == 4:
                # 64-bit accumulator as (hi, lo) int32 pairs:
                # acc = s3*2^33 + s2*2^22 + s1*2^11 + s0, then an exact
                # funnel shift; valid for ANY shift 0..31 and any |x|<2^31
                def add64(hi_a, lo_a, hi_b, lo_b):
                    lo = lo_a + lo_b
                    c = (lo.astype(jnp.uint32)
                         < lo_a.astype(jnp.uint32)).astype(jnp.int32)
                    return hi_a + hi_b + c, lo
                hi, lo = s0 >> 31, s0
                hi, lo = add64(hi, lo, s1 >> (32 - LIMB4), s1 << LIMB4)
                hi, lo = add64(hi, lo, s2 >> (32 - 2 * LIMB4),
                               s2 << (2 * LIMB4))
                hi, lo = add64(hi, lo, s3 << (3 * LIMB4 - 32),
                               jnp.zeros_like(s3))
                sh2 = 32 - jnp.maximum(s, 1)
                res = jnp.where(
                    s == 0, lo,
                    (hi << sh2) | (lo.astype(jnp.uint32)
                                   >> s.astype(jnp.uint32)
                                   ).astype(jnp.int32))
            elif limbs == 3:
                # full 64-bit accumulator as (hi, lo) int32 limb pairs:
                # acc = S_hi*2^(L+12) + S_mid*2^L + S_lo, then an exact
                # funnel shift — valid for ANY shift 0..31, which matters
                # because 24-bit streams routinely quantize to shift 14/15
                a_hi = s_hi >> (20 - limb)
                a_lo = s_hi << (limb + 12)
                b_hi = s_mid >> (32 - limb)
                b_lo = s_mid << limb
                lo1 = a_lo + b_lo
                c1 = (lo1.astype(jnp.uint32)
                      < a_lo.astype(jnp.uint32)).astype(jnp.int32)
                hi1 = a_hi + b_hi + c1
                lo2 = lo1 + s_lo
                c2 = (lo2.astype(jnp.uint32)
                      < lo1.astype(jnp.uint32)).astype(jnp.int32)
                hi2 = hi1 + (s_lo >> 31) + c2
                sh2 = 32 - jnp.maximum(s, 1)
                res = jnp.where(
                    s == 0, lo2,
                    (hi2 << sh2) | (lo2.astype(jnp.uint32)
                                    >> s.astype(jnp.uint32)
                                    ).astype(jnp.int32))
            else:
                res = (s_hi << sh_hi) + (s_lo >> s)
            xv = x_ref[r, :]
            out = jnp.where(g * R + r >= ordv, xv + res, xv)
            out_ref[r, :] = out
            return (out,) + hist[:-1]

        # unroll several samples per fori iteration: the per-iteration
        # loop overhead is comparable to the step arithmetic
        unroll = 4 if R % 4 == 0 else 1

        def body(i, hist):
            r = i * unroll
            for u in range(unroll):
                hist = one_step(r + u, hist)
            return hist

        # int32 loop bounds: under jax_enable_x64 a plain `0` would make
        # the index int64, which Mosaic cannot lower
        hist = tuple(hist_ref[j, :] for j in range(T))
        hist = jax.lax.fori_loop(jnp.int32(0), jnp.int32(R // unroll),
                                 body, hist)
        for j in range(T):
            hist_ref[j, :] = hist[j]

    return kernel


@partial(jax.jit, static_argnames=("block_size", "taps", "limbs",
                                   "interpret"))
def predict_batch_pallas(x: jnp.ndarray, qcoeffs: jnp.ndarray,
                         shift: jnp.ndarray, order: jnp.ndarray,
                         block_size: int, taps: int = 16, limbs: int = 2,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.predict.predict_batch on the gated domain.

    x: (B, N) integer array (warm-ups below order, residuals beyond);
    returns (B, N) of the same dtype.  Callers MUST check
    `pallas_predict_ok` first (it returns the limb mode to pass here) —
    outside the gate int32 wraps.
    """
    B, N = x.shape
    assert N == block_size
    T = max(taps, 4)
    L = _limb_bits(T)
    # streaming row blocks (grid) over the sample axis
    R = 256
    padN = (-N) % R
    xt = x.astype(jnp.int32).T                             # (N, B)
    if padN:
        xt = jnp.pad(xt, ((0, padN), (0, 0)))
    Np = N + padN
    qs = qcoeffs[:, :T].astype(jnp.int32).T                # (T, B), row j = q_j
    ordv = order.astype(jnp.int32)
    # order-0 rows (constant/verbatim) have zero taps: any shift in range
    # is exact; normalize so the gate/kernel never sees their shift field
    sh = jnp.where(ordv > 0, shift.astype(jnp.int32), L)
    meta = jnp.zeros((8, B), jnp.int32).at[0].set(sh).at[1].set(ordv)

    padB = (-B) % _BT
    if padB:
        xt = jnp.pad(xt, ((0, 0), (0, padB)))
        qs = jnp.pad(qs, ((0, 0), (0, padB)))
        meta = jnp.pad(meta, ((0, 0), (0, padB)))
        meta = meta.at[0, B:].set(L)
    Bp = B + padB
    # q rows live below the int32 tile's 8-sublane minimum; pad the panel
    Tq = max(T, 8)
    if Tq != T:
        qs = jnp.pad(qs, ((0, Tq - T), (0, 0)))

    # index-map literals must be int32 (bare 0 traces as i64 under x64,
    # which Mosaic cannot legalize)
    imc = lambda g: (jnp.int32(0), jnp.int32(0))
    imr = lambda g: (g, jnp.int32(0))
    call = pl.pallas_call(
        _kernel(R, T, L, limbs),
        grid=(Np // R,),
        in_specs=[
            pl.BlockSpec((Tq, _BT), imc, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _BT), imc, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, _BT), imr, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, _BT), imr, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, _BT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((T, _BT), jnp.int32)],
        interpret=interpret,
    )
    chunks = [call(qs[:, c:c + _BT], meta[:, c:c + _BT], xt[:, c:c + _BT])
              for c in range(0, Bp, _BT)]
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    return out[:N, :B].T.astype(x.dtype)


def pallas_predict_ok(x: np.ndarray, qcoeffs: np.ndarray, shift: np.ndarray,
                      order: np.ndarray, bits_per_sample: int,
                      taps: int) -> int:
    """Host-side exactness gate: returns the limb mode (2 or 3) when the
    whole batch is in the kernel's exact domain, else 0 (see module doc).
    """
    T = max(taps, 4)
    if T > 32:
        return 0
    L = _limb_bits(T)
    order = np.asarray(order)
    shift = np.asarray(shift)
    lpc = order > 0
    if not (shift[lpc] >= 0).all():
        return 0
    if not (np.abs(np.asarray(qcoeffs)) < 1 << 14).all():
        return 0
    xmax = int(np.abs(x).max(initial=0))
    # the cheap 2-limb decomposition needs shift <= L; the 3-limb mode
    # builds the full 64-bit accumulator and takes any shift; the 4-limb
    # mode covers 32-bit-wide samples (any int32-representable input,
    # one more multiply per tap)
    if (bits_per_sample <= 16 and xmax < 1 << 17
            and (shift[lpc] <= L).all()):
        return 2
    if bits_per_sample <= 24 and xmax < 1 << 25:
        return 3
    if xmax < 1 << 31:
        return 4
    return 0
