"""Stage decomposition of the device encode step on real hardware.

Times jitted sub-stages of encode_frames_plan with the same honest
methodology as bench.py (dependency-chained dispatch + scalar sync), so
the 25.9 ms/batch step cost (BASELINE.md round-3 corrections) can be
attributed: candidates/decorrelate, fixed cascade, LPC analysis
(autocorrelation / Levinson / quantize / residuals), Rice search, plan
selection, device packing.

Usage:  python tools/profile_encode_step.py [B]
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, ".")

from bench import make_audio  # noqa: E402
from flac_codec_tpu.ops import decorrelate, fixed, lpc, rice  # noqa: E402
from flac_codec_tpu.ops.encode_batch import (  # noqa: E402
    _analyze_channel, encode_frames_plan)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = 4096
BPS = 16
MAX_LPC = 12
MAX_PO = 6
DTYPE = jnp.float32


_floor = [0.0]  # dispatch+sync constant, measured by a null stage


def timed(name, fn, x, reps=7):
    """Dependency-chained single-dispatch timing.

    The axon tunnel costs ~8 ms per dispatch round-trip, so each rep is
    one dispatch + one scalar-download sync; a null stage measures that
    constant and it is subtracted.  fn's output feeds a NaN-guard
    `where` that XLA cannot fold away (it can't prove the sum is not
    NaN), so the computation is never dead-code-eliminated, while xi is
    value-unchanged so every rep does identical real work.  Run with a
    large B so stage compute clears the ~0.5 ms floor noise.
    """
    @jax.jit
    def step(xi):
        o = fn(xi)
        leaves = jax.tree_util.tree_leaves(o)
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return jnp.where(s == s, xi, xi + 1)

    xi = step(x)
    float(jnp.sum(xi.astype(jnp.float32)))  # compile + settle
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        xi = step(xi)
        float(jnp.sum(xi.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    net = best - _floor[0]
    print(f"{name:42s} {best*1e3:9.3f} ms   net {net*1e3:9.3f} ms",
          flush=True)
    return best


def main():
    inter = make_audio(N * B)
    pcm = np.ascontiguousarray(
        inter.reshape(B, N, 2).transpose(0, 2, 1)).astype(np.int32)
    x = jnp.asarray(pcm)
    win = lpc.window_array(("tukey", 0.5), N, DTYPE)

    print(f"B={B} N={N} backend={jax.default_backend()}", flush=True)

    # dispatch+sync floor: a null stage (just the sum+where wrapper)
    _floor[0] = timed("null (dispatch+sync floor)", lambda v: v, x)

    # The full plan's time is known from bench.py (dependency-chained,
    # scalar-fenced); compiling it inside a while_loop takes >10 min, so
    # only the sub-stages are slope-timed here.  Opt in with FULL=1.
    import os
    if os.environ.get("FULL"):
        kw = dict(bits_per_sample=BPS, block_size=N, max_lpc_order=MAX_LPC,
                  max_partition_order=MAX_PO, mid_side=True, exhaustive=True,
                  analysis="f32")
        timed("full plan (pack_budget=18, frame_pack)",
              lambda v: encode_frames_plan(v, **kw, pack_budget=18,
                                           frame_pack=True), x)
        timed("full plan (no pack)",
              lambda v: encode_frames_plan(v, **kw), x)

    # stage: candidates
    timed("decorrelate.candidates", lambda v: decorrelate.candidates(v), x)

    cands = np.asarray(decorrelate.candidates(x))
    c0 = jnp.asarray(cands[:, 0])  # one candidate channel, int64

    # stage: one full channel analysis (of 4)
    an = partial(_analyze_channel, win=win, max_lpc_order=MAX_LPC,
                 block_size=N, max_partition_order=MAX_PO, use_rice2=False)
    timed("_analyze_channel (x4 in plan)", lambda v: an(v, BPS), c0)

    # fixed cascade + its rice search
    timed("fixed.diff_cascade+best", lambda v: fixed.best_order(
        *fixed.diff_cascade(v)), c0)

    fres = fixed.best_order(*fixed.diff_cascade(c0))[1]
    ford = fixed.best_order(*fixed.diff_cascade(c0))[0]
    timed("rice.search (x8 in plan)",
          lambda v: rice.search(v, ford, N, MAX_PO, 15), fres)

    # LPC stack
    xw = c0.astype(DTYPE) * win[None, :]
    timed("lpc.autocorrelate", lambda v: lpc.autocorrelate(v, MAX_LPC), xw)
    autoc = lpc.autocorrelate(xw, MAX_LPC)
    timed("lpc.levinson", lambda v: lpc.levinson(v, MAX_LPC)[0], autoc)
    lp = lpc.analyze(c0, win, MAX_LPC, BPS, N)
    timed("lpc.analyze (x4 in plan)",
          lambda v: lpc.analyze(v, win, MAX_LPC, BPS, N)["residuals"], c0)
    timed("lpc.residuals only",
          lambda v: lpc.residuals(v, lp["qcoeffs"], lp["order"],
                                  lp["shift"], max_taps=MAX_LPC)[0], c0)

    # ---- packing stages (round 4: the full-blob fence exposed these) ----
    from flac_codec_tpu.ops.bitpack import pack_residual_sections
    from flac_codec_tpu.ops.encode_batch import _encode_frames_plan_impl
    from flac_codec_tpu.ops.framepack import (crc16_inner,
                                              crc16_neg_pow_table,
                                              frame_slot_words,
                                              pack_frame_bodies)

    kwp = dict(bits_per_sample=BPS, block_size=N, max_lpc_order=MAX_LPC,
               max_partition_order=MAX_PO, mid_side=True, exhaustive=True,
               analysis="f32")
    plan = jax.jit(partial(_encode_frames_plan_impl, **kwp))(x)
    ch = plan["channels"][0]
    budget = 18
    per_sub_words = (budget * N + 31) // 32 + 2
    out_words = B * 2 * per_sub_words + 2
    base_bits = (jnp.arange(B) * 2 * per_sub_words).astype(jnp.int64) * 32
    order32 = ch["order"].astype(jnp.int32)
    po32 = ch["po"].astype(jnp.int32)
    rb32 = ch["rice_bits"].astype(jnp.int32)
    timed("pack_residual_sections (x2 in plan)",
          lambda v: pack_residual_sections(
              v.astype(jnp.int64), order32, po32, ch["kinds"], ch["params"],
              rb32, N, out_words, base_bits, budget * N)[0],
          ch["residuals"])

    def fp(v):
        p2 = {"assignment": plan["assignment"],
              "channels": [dict(plan["channels"][0]),
                           dict(plan["channels"][1])]}
        p2["channels"][0] = dict(p2["channels"][0], residuals=v)
        return pack_frame_bodies(p2, N, BPS, budget)["frame_words"]

    timed("pack_frame_bodies (full)", fp, ch["residuals"])

    W = frame_slot_words(2, N, budget)
    rng = np.random.default_rng(1)
    words_r = jnp.asarray(
        rng.integers(0, 1 << 32, (B, W), dtype=np.uint64).astype(np.uint32))
    tab = crc16_neg_pow_table(W * 32)
    timed("crc16_inner", lambda v: crc16_inner(v, tab), words_r)


if __name__ == "__main__":
    main()
