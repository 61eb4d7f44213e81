"""Device-side FLAC frame-body parser (Rice decode on TPU).

This closes SURVEY §7 hard part 3 ("decoder's sequential recurrences"):
Rice decode is bit-serial, so the host parser was the decode pipeline's
ceiling (~0.3 GB/s/core vs a 40-100 GB/s device predict step).  Here the
whole frame body — subframe headers, wasted-bits unary, warm-ups, LPC
parameter fields, partition headers, Rice/escape residuals
(reference semantics: src/decode.rs:1635-1856) — is parsed ON DEVICE by a
Pallas kernel that runs one bit-serial state machine per lane (lane =
frame, the last panel axis; batch-axis parallelism supplies the speed,
exactly like the inverse-LPC kernel in predict_pallas.py).

Kernel output avoids per-lane scatter (Mosaic supports only uniform row
indexing) by emitting at BIT rows: when a code completes at bit i, row i
of the `val` panel holds the decoded value and row i of the `sym` panel
holds 1 + the lane's output slot.  At most one code completes per bit per
lane, so the panels are collision-free; a vectorized XLA scatter-add then
compacts them into dense raw-subframe arrays — the same (B, C, N) buffers
+ order/shift/wasted/qcoeffs metadata the native host parser produces —
which feed the existing Pallas inverse-LPC kernel unchanged.

Slot space per channel (SLOTS_PER_CH = N + 40):
    [0, N)    sample slots (warm-ups, verbatim samples, residuals)
    N + 0     subframe type code (6-bit header field)
    N + 1     wasted bits
    N + 2     LPC shift
    N + 3     constant-subframe value
    [N+8, N+40)  LPC quantized coefficients

The host's remaining role is frame boundary detection + CRC validation
(native sync scan) and the byte gather into the word panel; everything
bit-level runs here.  Lanes that hit a malformed construct (reserved
subframe type, negative LPC shift, bad partition geometry — the same
conditions the host decoder rejects, src/decode.rs:1635-1736) raise a
sticky per-lane error flag; the caller re-decodes those frames on host
for the precise error surface.

PERFORMANCE STATUS (v5e, 2026-08, measured with dependency-chained
dispatch + scalar-download sync — plain block_until_ready is unreliable
through tunneled runtimes): the kernel itself runs at ~10-50 ns per
bit-row (batch-parallel over 1024 lanes), but the XLA scatter-add that
compacts the bit-row emission panels into dense slot panels lowers to a
per-element loop on TPU (~0.1-1 us/element; 134M elements for a
1024-frame preset -8 batch), making compaction the pipeline cost.  Every
alternative movement primitive measures similarly slow at this scale
(k/v sort: ~12 s/panel; vmapped sorted scatter: ~6 s; take_along_axis
gather: ~0.7 s per 8.5M elements), and Mosaic's in-kernel options cannot
express the per-lane placement either: tpu.dynamic_gather is limited to
a single source vreg (8 sublanes) along the gather dimension, and
per-lane dynamic row writes are not supported at all.  Round 5 measured
the last two untried primitives at the production emission shape
(88064 x 1024; tools/profile_colsort.py): columnwise axis-0 sort =
565 ms (9x better than flat, still ~20x short), per-lane variable
rotate via 14 select+roll passes = 267 ms, and even a plain int32
transpose of the panel = 300 ms (1.2 GB/s effective) — every XLA
movement primitive at this shape runs 10-200x off HBM bandwidth on
this backend, so no composition of them can beat the native host
parser (~29 ms per 1024-frame batch).  Until the backend's movement
lowering improves, BatchDecoder keeps the native host parser as the
default production path and this mode stays opt-in
(FLAC_TPU_DEVICE_PARSE=1); the kernel remains fully tested and
bit-exact, and is the complete device half of SURVEY §7's "parallel
unary scanning" design.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes = frames, the LAST axis of every panel.  All refs are 2-D with
# the dynamic (bit/word row) axis as the sublane dimension — Mosaic
# lowers dynamic row indexing on an OUTER dim of a 3-D block through a
# catastrophically slow path (~800x, measured), while the 2-D layout
# runs at native speed (same structure as predict_pallas.py).
LANES = 1024
# words consumed per grid step (CHUNK_BITS = 32 * WCHUNK panel rows);
# 2-D block shapes need the sublane dim divisible by 8
WCHUNK = 8
CHUNK_BITS = WCHUNK * 32

META_SLOTS = 40
OFF_TYPE = 0
OFF_WASTED = 1
OFF_SHIFT = 2
OFF_CONST = 3
OFF_QCOEFF = 8

# state machine contexts
(CTX_SUBHDR, CTX_WUNARY, CTX_CONST, CTX_VERB, CTX_WARM, CTX_PREC,
 CTX_SHIFT, CTX_COEFF, CTX_METHOD, CTX_PARTHDR, CTX_ESCW, CTX_UNARY,
 CTX_LSB, CTX_ESCS, CTX_DONE) = range(15)

# carried state rows
(ST_CTX, ST_REM, ST_ACC, ST_Q, ST_CNT, ST_SLOT, ST_K, ST_RB, ST_PLEFT,
 ST_PLEN, ST_CHAN, ST_EFF, ST_TYPE, ST_ORDER, ST_PREC, ST_DONE,
 ST_ERR) = range(17)
NSTATE = 17

# unary quotients past this are outside any realistic stream (a conforming
# encoder would have escaped the partition); flag and fall back to host
MAX_Q = 1 << 20


def _sext(v, w):
    """Sign-extend the low per-lane ``w`` bits of int32 ``v``."""
    sh = (32 - w).astype(jnp.int32)
    return jax.lax.shift_right_arithmetic(jax.lax.shift_left(v, sh), sh)


def _parse_kernel(N: int, C: int):
    slots_per_ch = N + META_SLOTS

    def kernel(words_ref, params_ref, val_ref, sym_ref,
               fstate_ref, state_ref):
        g = pl.program_id(0)
        nbits = params_ref[0]
        assign = params_ref[1]
        bps = params_ref[2]

        def sel(c, a, b):
            # Raw lax.select_n on purpose, twice over:
            # (1) jnp.where with a bare python-int branch plants a weak
            #     i64[] scalar in the jaxpr under x64, which Mosaic's
            #     convert helper recurses on — wrap literals as int32;
            # (2) jnp.where traces as a nested closed call
            #     (jit[name=_where]) per use, which lowers poorly inside
            #     the bit loop — the primitive keeps the body flat.
            if isinstance(a, int):
                a = jnp.int32(a)
            if isinstance(b, int):
                b = jnp.int32(b)
            a, b = jnp.broadcast_arrays(a, b)
            if a.ndim == 0:
                a = jnp.broadcast_to(a, c.shape)
                b = jnp.broadcast_to(b, c.shape)
            if a.dtype != b.dtype:
                b = b.astype(a.dtype)
            return jax.lax.select(c, a, b)

        @pl.when(g == 0)
        def _():
            z = jnp.zeros((LANES,), jnp.int32)
            for r in range(NSTATE):
                state_ref[r] = z
            state_ref[ST_CTX] = jnp.full((LANES,), CTX_SUBHDR, jnp.int32)
            state_ref[ST_REM] = jnp.full((LANES,), 8, jnp.int32)

        def body(i, st):
            (ctx, rem, acc, q, cnt, slot, k, rb, pleft, plen, chan, eff,
             sftype, order, prec, done, err) = st
            gbit = g * CHUNK_BITS + i
            w = words_ref[i >> 5]
            bit = (jax.lax.shift_right_logical(
                w, (31 - (i & 31)).astype(jnp.uint32)).astype(jnp.int32) & 1)

            active = (done == 0) & (err == 0) & (gbit < nbits)
            isu = (ctx == CTX_WUNARY) | (ctx == CTX_UNARY)
            infield = active & ~isu
            inunary = active & isu

            acc = sel(infield, (acc << 1) | bit, acc)
            rem = sel(infield, rem - 1, rem)
            fdone = infield & (rem == 0)
            qzero = inunary & (bit == 0)
            q = sel(qzero, q + 1, q)
            err = err | (qzero & (q > MAX_Q))
            udone = inunary & (bit == 1)

            c_sub = fdone & (ctx == CTX_SUBHDR)
            c_wun = udone & (ctx == CTX_WUNARY)
            c_cst = fdone & (ctx == CTX_CONST)
            c_vrb = fdone & (ctx == CTX_VERB)
            c_wrm = fdone & (ctx == CTX_WARM)
            c_prc = fdone & (ctx == CTX_PREC)
            c_sft = fdone & (ctx == CTX_SHIFT)
            c_cof = fdone & (ctx == CTX_COEFF)
            c_mth = fdone & (ctx == CTX_METHOD)
            c_phd = fdone & (ctx == CTX_PARTHDR)
            c_esw = fdone & (ctx == CTX_ESCW)
            c_unr = udone & (ctx == CTX_UNARY)
            c_lsb = fdone & (ctx == CTX_LSB)
            c_esc = fdone & (ctx == CTX_ESCS)

            # ---- subframe header byte: pad + 6-bit type + wasted flag ----
            t6 = (acc >> 1) & 63
            wflag = (acc & 1) == 1
            t_ok = ((t6 == 0) | (t6 == 1) | ((t6 >= 8) & (t6 <= 12))
                    | (t6 >= 32))
            err = err | (c_sub & (((acc >> 7) != 0) | ~t_ok))
            sftype = sel(c_sub, t6, sftype)
            order = sel(
                c_sub,
                sel(t6 >= 32, (t6 & 31) + 1,
                          sel(t6 >= 8, t6 - 8, 0)),
                order)

            # side channel gets +1 bit (reference: src/stream.rs:903-936)
            is_side = (((assign == 8) & (chan == 1))
                       | ((assign == 9) & (chan == 0))
                       | ((assign == 10) & (chan == 1)))
            bps_ch = bps + is_side.astype(jnp.int32)

            # ---- dispatch once wasted bits are known ----
            aw = (c_sub & ~wflag) | c_wun
            wasted_aw = sel(c_wun, q + 1, 0)
            eff_aw = bps_ch - wasted_aw
            err = err | (aw & (eff_aw <= 0))
            err = err | (aw & (order > N))
            a_cst = sftype == 0
            a_vrb = sftype == 1
            a_lpc = sftype >= 32
            # NB: a jnp.where with two python-int branches makes an int64
            # under x64, which Mosaic cannot lower (convert-helper
            # recursion) — wrap literals as int32 throughout.
            ctx_aw = sel(
                a_cst, CTX_CONST,
                sel(a_vrb, CTX_VERB,
                          sel(order > 0, jnp.int32(CTX_WARM),
                                    jnp.int32(CTX_METHOD))))
            rem_aw = sel(a_cst | a_vrb | (order > 0), eff_aw, 6)
            cnt_aw = sel(a_vrb, N, order)
            eff = sel(aw, eff_aw, eff)

            # ---- LPC parameter fields ----
            err = err | (c_prc & (acc == 15))
            prec = sel(c_prc, acc + 1, prec)
            shift_v = _sext(acc, jnp.full_like(acc, 5))
            err = err | (c_sft & (shift_v < 0))

            # ---- residual section prologue: 2-bit method + 4-bit order --
            meth = acc >> 4
            po = acc & 15
            plen_m = jax.lax.shift_right_logical(N + jnp.zeros_like(po), po)
            err = err | (c_mth & ((meth > 1)
                                  | (jax.lax.shift_left(plen_m, po) != N)
                                  | (plen_m - order < 1)))
            rb = sel(c_mth, 4 + meth, rb)
            plen = sel(c_mth, plen_m, plen)
            pleft = sel(c_mth, jax.lax.shift_left(jnp.ones_like(po),
                                                        po), pleft)

            # ---- partition header ----
            esc_code = sel(rb == 4, jnp.int32(15), jnp.int32(31))
            phd_esc = c_phd & (acc == esc_code)
            k = sel(c_phd & ~phd_esc, acc, k)
            esw_const = c_esw & (acc == 0)
            k = sel(c_esw & ~esw_const, acc, k)

            # ---- symbol completions ----
            u_unr = q                       # k == 0: code is pure unary
            err = err | (c_lsb & (q > jax.lax.shift_right_logical(
                jnp.full_like(k, 1 << 30), k)))
            u_lsb = jax.lax.shift_left(q, k) | acc
            rice_done = (c_unr & (k == 0)) | c_lsb
            u = sel(c_lsb, u_lsb, u_unr)
            rice_val = jax.lax.shift_right_logical(u, jnp.int32(1)) \
                ^ -(u & 1)                  # zigzag decode (u >= 0)
            esc_val = _sext(acc, k)
            sample_done = rice_done | c_esc
            emit_sample = sample_done | c_wrm | c_vrb

            cnt = sel(emit_sample | c_cof, cnt - 1, cnt)
            slot_e = slot                   # emission slot (pre-increment)
            slot = sel(emit_sample, slot + 1, slot)
            # constant partition: skip its samples (they stay zero)
            slot = sel(esw_const, slot + cnt, slot)

            part_end = (sample_done & (cnt == 0)) | esw_const
            pleft = sel(part_end, pleft - 1, pleft)
            new_part = part_end & (pleft > 0)
            warm_end = c_wrm & (cnt == 0)
            coef_end = c_cof & (cnt == 0)
            chan_end = c_cst | (c_vrb & (cnt == 0)) \
                | (part_end & (pleft == 0))
            chan = sel(chan_end, chan + 1, chan)
            done = done | (chan_end & (chan == C))
            new_sub = chan_end & (chan < C)
            cnt = sel(new_part, plen, cnt)
            cnt = sel(c_sft, order, cnt)           # coeffs to read
            cnt = sel(c_mth, plen_m - order, cnt)  # partition 0 count
            cnt = sel(aw, cnt_aw, cnt)
            slot = sel(new_sub, chan * slots_per_ch, slot)

            # ---- next context / field width ----
            ctx = sel(c_sub, sel(wflag, CTX_WUNARY, ctx_aw), ctx)
            ctx = sel(c_wun, ctx_aw, ctx)
            ctx = sel(c_cst | c_vrb | c_wrm, CTX_WARM, ctx)  # default
            ctx = sel(c_vrb & (cnt > 0), CTX_VERB, ctx)
            ctx = sel(warm_end,
                            sel(a_lpc, jnp.int32(CTX_PREC),
                                      jnp.int32(CTX_METHOD)), ctx)
            ctx = sel(c_prc, CTX_SHIFT, ctx)
            ctx = sel(c_sft, CTX_COEFF, ctx)
            ctx = sel(c_cof, sel(coef_end, jnp.int32(CTX_METHOD),
                                             jnp.int32(CTX_COEFF)), ctx)
            ctx = sel(c_mth, CTX_PARTHDR, ctx)
            ctx = sel(c_phd, sel(phd_esc, jnp.int32(CTX_ESCW),
                                             jnp.int32(CTX_UNARY)), ctx)
            ctx = sel(c_esw & ~esw_const, CTX_ESCS, ctx)
            ctx = sel(c_unr & (k > 0), CTX_LSB, ctx)
            ctx = sel(rice_done & (cnt > 0), CTX_UNARY, ctx)
            ctx = sel(c_esc & (cnt > 0), CTX_ESCS, ctx)
            ctx = sel(new_part, CTX_PARTHDR, ctx)
            ctx = sel(new_sub, CTX_SUBHDR, ctx)
            ctx = sel(chan_end & (chan == C), CTX_DONE, ctx)

            rem = sel(c_cst | c_vrb | c_wrm, eff, rem)
            rem = sel(aw, rem_aw, rem)
            rem = sel(warm_end,
                            sel(a_lpc, jnp.int32(4), jnp.int32(6)),
                            rem)
            rem = sel(c_prc, 5, rem)
            rem = sel(c_sft | (c_cof & ~coef_end), prec, rem)
            rem = sel(coef_end, 6, rem)
            rem = sel(c_mth | new_part, rb, rem)
            rem = sel(phd_esc, 5, rem)
            rem = sel(c_unr & (k > 0), k, rem)
            rem = sel((c_esw & ~esw_const) | (c_esc & (cnt > 0)),
                            k, rem)
            rem = sel(new_sub, 8, rem)

            # ---- emission (at most one code completes per lane per bit) --
            sample_val = sel(sample_done,
                                   sel(c_esc, esc_val, rice_val),
                                   _sext(acc, eff))
            chbase = sel(chan_end, chan - 1, chan) * slots_per_ch
            emit = emit_sample | c_sub | c_wun | c_cst | c_sft | c_cof
            eslot = sel(emit_sample, slot_e, 0)
            eslot = sel(c_sub, chbase + N + OFF_TYPE, eslot)
            eslot = sel(c_wun, chbase + N + OFF_WASTED, eslot)
            eslot = sel(c_sft, chbase + N + OFF_SHIFT, eslot)
            eslot = sel(c_cst, chbase + N + OFF_CONST, eslot)
            eslot = sel(c_cof, chbase + N + OFF_QCOEFF
                              + (order - cnt - 1), eslot)
            eval_ = sel(emit_sample, sample_val, 0)
            eval_ = sel(c_sub, t6, eval_)
            eval_ = sel(c_wun, q + 1, eval_)
            eval_ = sel(c_sft, shift_v, eval_)
            eval_ = sel(c_cst, _sext(acc, eff), eval_)
            eval_ = sel(c_cof, _sext(acc, prec), eval_)

            val_ref[i] = sel(emit, eval_, 0)
            sym_ref[i] = sel(emit, eslot + 1, 0)

            # field/unary register resets after completion; a rice unary
            # terminating into its LSB field must KEEP q for the quotient
            acc = sel(fdone, 0, acc)
            q = sel((udone & ~(c_unr & (k > 0))) | c_lsb, 0, q)
            err = err | ((gbit == nbits - 1) & active & (done == 0)
                         & ~(chan_end & (chan == C)))

            return (ctx, rem, acc, q, cnt, slot, k, rb, pleft, plen, chan,
                    eff, sftype, order, prec, done.astype(jnp.int32),
                    err.astype(jnp.int32))

        st = tuple(state_ref[r] for r in range(NSTATE))
        st = jax.lax.fori_loop(jnp.int32(0), jnp.int32(CHUNK_BITS), body, st)
        for r in range(NSTATE):
            state_ref[r] = st[r]
        fstate_ref[0] = st[ST_DONE]
        fstate_ref[1] = st[ST_ERR]
        fstate_ref[2] = st[ST_CTX]
        fstate_ref[3] = st[ST_CHAN]

    return kernel


@partial(jax.jit, static_argnames=("block_size", "channels", "interpret",
                                   "compaction"))
def parse_frame_bodies(words: jnp.ndarray, nbits: jnp.ndarray,
                       assignment: jnp.ndarray, block_size: int,
                       channels: int, bits_per_sample: int,
                       interpret: bool = False,
                       compaction: str = "sort"):
    """Parse up to LANES frame bodies on device.

    words: (W, LANES) uint32 — lane l holds frame l's body bits,
        MSB-first within each big-endian word; W % WCHUNK == 0.
    nbits/assignment: (LANES,) int32 per-lane body bit length (0 for
        padding lanes) and channel assignment code.

    Returns dict of device arrays shaped like the native raw parser's
    output: buf (LANES, C, N) int32, order/shift/wasted (LANES, C) int32,
    qcoeffs (LANES, C, 32) int32, ok (LANES,) bool (parsed to completion).
    """
    N, C = block_size, channels
    W = words.shape[0]
    assert W % WCHUNK == 0 and words.shape[1:] == (LANES,)
    G = W // WCHUNK
    slots_per_ch = N + META_SLOTS

    params = jnp.stack([
        nbits.astype(jnp.int32), assignment.astype(jnp.int32),
        jnp.full((LANES,), bits_per_sample, jnp.int32),
        jnp.zeros((LANES,), jnp.int32)])
    kernel = _parse_kernel(N, C)
    # index-map literals must be int32: under jax_enable_x64 a bare 0
    # traces as i64 and Mosaic fails to legalize the index-map func
    val, sym, fstate = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((WCHUNK, LANES), lambda g: (g, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANES), lambda g: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK_BITS, LANES), lambda g: (g, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BITS, LANES), lambda g: (g, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANES), lambda g: (jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * CHUNK_BITS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G * CHUNK_BITS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((4, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((NSTATE, LANES), jnp.int32)],
        interpret=interpret,
    )(words, params)

    # ---- compact the (bit-row, lane) emissions into dense slot panels ----
    TB = G * CHUNK_BITS
    tot = C * slots_per_ch
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, LANES), 1)
    if compaction == "sort":
        # round-4 path (VERDICT r3 item 4): pack (slot, value) into ONE
        # int64 and single-operand sort — round 3 measured 1-op sort at
        # ~44 ms/16.8M vs ~0.8 s for the vmapped scatter and ~208 s for
        # the two-operand k/v sort.  Slots are unique per lane (each is
        # emitted at most once), so after the ascending sort the first
        # LANES*tot entries are the live emissions in slot order; dead
        # rows carry a 2^62 sentinel and sort past them.  Placement then
        # uses a sorted+unique scatter-set.  Requires x64 (int64 keys).
        flat = (lane_ids * tot + sym - 1).astype(jnp.int64)
        keys = jnp.where(
            sym > 0,
            (flat << 32) | val.astype(jnp.uint32).astype(jnp.int64),
            jnp.int64(1) << 62)
        head = jax.lax.sort(keys.reshape(-1))[:LANES * tot]
        idx = (head >> 32).astype(jnp.int32)
        vals = jax.lax.bitcast_convert_type(
            (head & 0xFFFFFFFF).astype(jnp.uint32), jnp.int32)
        dead = head >= (jnp.int64(1) << 62)
        panel = jnp.zeros(LANES * tot + 1, jnp.int32).at[
            jnp.where(dead, LANES * tot, idx)].set(
            jnp.where(dead, 0, vals), indices_are_sorted=True,
            unique_indices=True, mode="drop")
    else:
        flat = jnp.where(sym > 0, lane_ids * tot + sym - 1,
                         LANES * tot).astype(jnp.int32)
        panel = jnp.zeros(LANES * tot + 1, jnp.int32).at[
            flat.reshape(-1)].add(
            jnp.where(sym > 0, val, 0).reshape(-1).astype(jnp.int32),
            mode="drop")
    panel = panel[:-1].reshape(LANES, C, slots_per_ch)

    samples = panel[:, :, :N]
    t6 = panel[:, :, N + OFF_TYPE]
    wasted = panel[:, :, N + OFF_WASTED]
    shift = panel[:, :, N + OFF_SHIFT]
    constv = panel[:, :, N + OFF_CONST]
    qco = panel[:, :, N + OFF_QCOEFF:N + OFF_QCOEFF + 32]

    order = jnp.where(t6 >= 32, (t6 & 31) + 1,
                      jnp.where(t6 >= 8, t6 - 8, 0))
    is_fixed = (t6 >= 8) & (t6 <= 12)
    # fixed predictors use the standard coefficient rows, shift 0
    # (reference FIXED_COEFFS: src/stream.rs:1534)
    fixed_rows = jnp.zeros((5, 32), jnp.int32).at[1, 0].set(1) \
        .at[2, :2].set(jnp.array([2, -1], jnp.int32)) \
        .at[3, :3].set(jnp.array([3, -3, 1], jnp.int32)) \
        .at[4, :4].set(jnp.array([4, -6, 4, -1], jnp.int32))
    qco = jnp.where(is_fixed[:, :, None],
                    fixed_rows[jnp.clip(order, 0, 4)], qco)
    samples = jnp.where((t6 == 0)[:, :, None], constv[:, :, None], samples)

    done = fstate[0]
    err = fstate[1]
    return {
        "buf": samples, "order": order, "shift": shift, "wasted": wasted,
        "qcoeffs": qco, "ok": (done > 0) & (err == 0),
    }


@jax.jit
def parse_gate(parsed, valid):
    """Compact per-batch stats for host-side dispatch: one tiny download
    decides the predict mode (Pallas limb count vs int64 scan), mirroring
    predict_pallas.pallas_predict_ok on device-resident parse output.

    ``valid``: (LANES,) bool — lanes that carry real frames (padding
    lanes report ok=False and must not fail the batch).

    Returns int32[6]: [all_ok, order_max, xmax (clamped), lpc_shift_max,
    qabs_max, shift_min].
    """
    lpc = parsed["order"] > 0
    xmax = jnp.abs(parsed["buf"]).max()
    qmax = jnp.abs(parsed["qcoeffs"]).max()
    smax = jnp.where(lpc, parsed["shift"], 0).max()
    smin = jnp.where(lpc, parsed["shift"], 0).min()
    return jnp.stack([
        (parsed["ok"] | ~valid).all().astype(jnp.int32),
        parsed["order"].max().astype(jnp.int32),
        jnp.minimum(xmax, 1 << 30).astype(jnp.int32),
        smax.astype(jnp.int32), jnp.minimum(qmax, 1 << 30).astype(jnp.int32),
        smin.astype(jnp.int32),
    ])


def build_word_panel(bodies, max_words: int):
    """Host-side gather: list of per-frame body byte strings -> the
    (W, LANES) big-endian word panel + per-lane bit lengths.

    Returns (words, nbits) numpy arrays; frames beyond LANES or longer
    than max_words*4 bytes must be filtered by the caller.
    """
    W = max_words
    buf = np.zeros((LANES, W * 4), np.uint8)
    nbits = np.zeros(LANES, np.int32)
    for i, body in enumerate(bodies):
        buf[i, :len(body)] = np.frombuffer(body, np.uint8)
        nbits[i] = len(body) * 8
    words = buf.view(">u4").astype(np.uint32)          # (LANES, W)
    return np.ascontiguousarray(words.T), nbits
