"""Pallas TPU kernel for the inverse-LPC recurrence (decode hot loop).

The XLA scan in ops/predict.py is exact but sequences every per-sample op
through HBM with fixed per-op overhead (~1.3 us/sample measured on v5e) —
two orders of magnitude from the hardware's ability.  This kernel keeps
the whole (block, batch-tile) panel resident in VMEM and runs the
recurrence as a single fori_loop whose tap window lives in vector
registers (a trace-time-rotated tuple — no per-sample memory shuffle), so
the per-sample cost is a few dozen VPU instructions
(reference hot loop: src/decode.rs:1738-1752).

Exactness without int64 (Mosaic lowers none): the accumulator is split at
bit L into two int32 partial dot products,

    x = x_hi * 2^L + x_lo          (x_lo unsigned L-bit, x_hi arithmetic)
    acc = S_hi * 2^L + S_lo        S_hi = sum q*x_hi,  S_lo = sum q*x_lo

and the FLAC prediction  acc >> s  decomposes exactly as

    (S_hi << (L - s)) + (S_lo >> s)          for 1 <= s <= L

because S_hi * 2^(L-s) is an integer (floor distributes over an integer
plus anything).  All intermediates fit int32 when the host-side gate
`pallas_predict_ok` holds:

  * |x| < 2^17  (every decoded sample of a spec-conforming stream with
    bits-per-sample <= 16, side channels included)
  * |q| < 2^14  (4-bit precision code => <= 15-bit signed coefficients)
  * 6 <= shift <= L for every LPC row (preset streams use 10-14)
  * order <= taps bucket

Rows that fail the gate — wide samples, tiny shifts, order > 32 — take
the exact XLA int64 scan instead; the two paths are bit-identical on the
gated domain (pinned by tests/test_predict_ops.py).

Mosaic notes (v5e, 2026-08): dynamic multi-row slices (``pl.ds(n, T)``),
``input_output_aliases`` with a grid, blocked specs with a grid, and
vector multiplies of tuple loop-carried values all crash the lowering.
The kernel therefore runs grid-free on a 256-lane column chunk, carries
nothing across iterations, reads its T history rows back from the output
panel with single-row dynamic indexing, splits limbs inline, and writes
exactly one row.  Measured (chained-unique serial dispatch, so no cache
can serve repeats): ~21 us for a (4096+16, 256) panel at taps=16 — about
5 ns per sequential sample step, ~100 GB/s of PCM-equivalent per chip at
B=512.  The surrounding arithmetic stays int32 end-to-end; int64 anywhere
in the wrapper costs more than the kernel itself under the x64 rewriter.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# batch-tile width (lanes); B is padded to a multiple of this
_BT = 256


def _limb_bits(taps: int) -> int:
    # S_lo = sum of `taps` products q*x_lo must stay below 2^31:
    # taps * 2^14 * 2^L < 2^31  =>  L <= 13 for taps<=16, 12 for taps<=32
    return 13 if taps <= 16 else 12


def _kernel(n_samples: int, t_taps: int, limb: int):
    mask = (1 << limb) - 1
    T = t_taps

    def kernel(qs_ref, meta_ref, x_ref, out_ref):
        # qs_ref: (>=8, BT) taps, row j = q_j (zero past the order);
        # meta_ref: (8, BT) with row 0 = shift, row 1 = order (padded to
        # the int32 tile's 8-sublane minimum); x_ref: (T + N, BT) int32
        # residual panel with T zero head rows; out_ref: (T + N, BT) —
        # row T+n written once, history read back from rows [n, n+T).
        s = meta_ref[0, :]
        sh_hi = limb - s
        ordv = meta_ref[1, :]

        # zero the history head rows (out_ref starts uninitialized; the
        # head rows are only ever multiplied by zero-padded taps, but
        # int32 garbage * 0 is still 0 only when it isn't read as the
        # passthrough value — keep them defined regardless)
        for r in range(T):
            out_ref[r, :] = x_ref[r, :]

        def body(n, carry):
            # tap j multiplies out[n-1-j] = out_ref row T+n-1-j = n+(T-1-j)
            h = out_ref[n + (T - 1), :]
            s_hi = qs_ref[0, :] * (h >> limb)
            s_lo = qs_ref[0, :] * (h & mask)
            for j in range(1, T):
                h = out_ref[n + (T - 1 - j), :]
                s_hi = s_hi + qs_ref[j, :] * (h >> limb)
                s_lo = s_lo + qs_ref[j, :] * (h & mask)
            res = (s_hi << sh_hi) + (s_lo >> s)
            xv = x_ref[n + T, :]
            out_ref[n + T, :] = jnp.where(n >= ordv, xv + res, xv)
            return carry

        # int32 loop bounds: under jax_enable_x64 a plain `0` would make
        # the index int64, which Mosaic cannot lower
        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_samples), body,
                          jnp.int32(0))

    return kernel


@partial(jax.jit, static_argnames=("block_size", "taps", "interpret"))
def predict_batch_pallas(x: jnp.ndarray, qcoeffs: jnp.ndarray,
                         shift: jnp.ndarray, order: jnp.ndarray,
                         block_size: int, taps: int = 16,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.predict.predict_batch on the gated domain.

    x: (B, N) integer array (warm-ups below order, residuals beyond);
    returns (B, N) of the same dtype.  Callers MUST check
    `pallas_predict_ok` first — outside the gate int32 wraps.
    """
    B, N = x.shape
    assert N == block_size
    T = max(taps, 4)
    L = _limb_bits(T)
    xt = jnp.pad(x.astype(jnp.int32), ((0, 0), (T, 0))).T  # (T+N, B)
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

    # one grid-free pallas_call per 256-lane column chunk: blocked specs
    # with a grid crash the Mosaic lowering for this kernel (see module
    # doc), and a full 512-lane panel pair would overflow VMEM anyway
    call = pl.pallas_call(
        _kernel(N, T, L),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T + N, _BT), jnp.int32),
        interpret=interpret,
    )
    chunks = [call(qs[:, c:c + _BT], meta[:, c:c + _BT], xt[:, c:c + _BT])
              for c in range(0, Bp, _BT)]
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    return out[T:, :B].T.astype(x.dtype)


def pallas_predict_ok(x: np.ndarray, qcoeffs: np.ndarray, shift: np.ndarray,
                      order: np.ndarray, bits_per_sample: int,
                      taps: int) -> bool:
    """Host-side exactness gate for the whole batch (see module doc)."""
    T = max(taps, 4)
    if T > 32 or bits_per_sample > 16:
        return False
    L = _limb_bits(T)
    order = np.asarray(order)
    shift = np.asarray(shift)
    lpc = order > 0
    if not ((shift[lpc] >= 6) & (shift[lpc] <= L)).all():
        return False
    if int(np.abs(x).max(initial=0)) >= 1 << 17:
        return False
    return bool((np.abs(np.asarray(qcoeffs)) < 1 << 14).all())
