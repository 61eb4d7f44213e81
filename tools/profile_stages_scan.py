"""Scan-chain stage decomposition of the encode step (round 4).

Each stage runs as ``chain`` dependency-chained iterations inside ONE
device-resident lax.scan dispatch with a scalar-download fence, so the
tunnel's per-dispatch latency (measured 8-45 ms on this host) divides by
``chain`` instead of swamping the stage time (which it does for the
single-dispatch form in profile_encode_step.py).

Usage: python tools/profile_stages_scan.py [B] [chain]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from bench import make_audio
from flac_codec_tpu.ops import decorrelate, fixed, lpc, rice
from flac_codec_tpu.ops.encode_batch import _analyze_channel
from flac_codec_tpu.ops.packpanel import (CHUNK_R, chunk_panels,
                                          merge_panels, splice_subframes)
from flac_codec_tpu.ops.framepack import (crc16_inner, crc16_neg_pow_table,
                                          frame_slot_words,
                                          subframe_panel_words)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CHAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = 4096
MAX_LPC = 12
DTYPE = jnp.float32


def timed(name, fn, x, reps=3):
    """fn: x -> x-shaped perturbed output (dependency chain)."""
    @jax.jit
    def step(xi):
        return jax.lax.scan(lambda c, _: (fn(c), None), xi, None,
                            length=CHAIN)[0]

    x = step(x)
    float(jnp.abs(x.astype(jnp.float32)).sum())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        x = step(x)
        float(jnp.abs(x.astype(jnp.float32)).sum())
        dt = (time.perf_counter() - t0) / CHAIN
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best*1e3:9.3f} ms", flush=True)
    return best


def chained(fn):
    """Wrap stage fn (x -> pytree) as a chain step via full-leaf sum."""
    def step(x):
        out = fn(x)
        s = sum(jnp.sum(l.astype(jnp.int32)) if l.dtype != jnp.float32
                else jnp.sum(l).astype(jnp.int32)
                for l in jax.tree_util.tree_leaves(out))
        bit = (s & 1)
        if jnp.issubdtype(x.dtype, jnp.floating):
            # value-preserving float chain: multiply by a data-dependent
            # 1.0 that XLA cannot constant-fold away
            return x * jnp.where(bit == 2, 2.0, 1.0).astype(x.dtype)
        return x ^ bit.astype(x.dtype)
    return step


def main():
    inter = make_audio(N * B)
    pcm = np.ascontiguousarray(
        inter.reshape(B, N, 2).transpose(0, 2, 1)).astype(np.int16)
    x = jnp.asarray(pcm)
    win = lpc.window_array(("tukey", 0.5), N, DTYPE)
    print(f"B={B} chain={CHAIN} backend={jax.default_backend()}", flush=True)

    timed("null (chain floor)", lambda v: v ^ 1, x)
    timed("decorrelate.candidates",
          chained(lambda v: decorrelate.candidates(v, jnp.int32)), x)

    cands = decorrelate.candidates(x, jnp.int32)  # (B, 4, N)
    flat = cands.reshape(B * 4, N)
    bps_flat = jnp.tile(jnp.asarray(decorrelate.candidate_bps(16), jnp.int32),
                        B)

    an = partial(_analyze_channel, win=win, max_lpc_order=MAX_LPC,
                 block_size=N, max_partition_order=6, use_rice2=False)
    timed("analyze (4B rows, full)",
          chained(lambda v: an(v, bps_flat)), flat)
    timed("fixed cascade+best (4B)",
          chained(lambda v: fixed.best_order(*fixed.diff_cascade(v))), flat)
    ford, fres = fixed.best_order(*fixed.diff_cascade(flat))
    timed("rice.search (4B, x2 in plan)",
          chained(lambda v: rice.search(v, ford, N, 6, 15)),
          fres)
    xw = flat.astype(DTYPE) * win[None, :]
    timed("autocorrelate (4B)",
          chained(lambda v: lpc.autocorrelate(v, MAX_LPC)),
          xw)
    autoc = lpc.autocorrelate(xw, MAX_LPC)
    timed("levinson+quantize (4B)",
          chained(lambda v: lpc.quantize(
              *(lambda cs: (cs[0][:, -1], jnp.full(B * 4, MAX_LPC,
                                                   jnp.int32)))(
                  lpc.levinson(v, MAX_LPC)), 14)),
          autoc)
    lp = lpc.analyze(flat, win, MAX_LPC, bps_flat, N)
    timed("lpc.residuals (4B)",
          chained(lambda v: lpc.residuals(v, lp["qcoeffs"], lp["order"],
                                          lp["shift"], max_taps=MAX_LPC)[0]),
          flat)

    # ---- pack stages at the production shape ----
    rows = B * 2
    rng = np.random.default_rng(0)
    widths = jnp.asarray(
        np.clip(rng.poisson(9.5, (rows, N)) + 1, 2, 30).astype(np.int64))
    ends = jnp.cumsum(widths, axis=1) + 6
    vals = jnp.asarray(rng.integers(0, 1 << 16, (rows, N)).astype(np.int64)
                       ) & ((1 << widths) - 1)
    mask = jnp.asarray(np.ones((rows, N), bool))
    P = subframe_panel_words(N, 18)
    W = frame_slot_words(2, N, 18)

    def cp_step(v):
        p, o, ov = chunk_panels(v, widths, ends, mask)
        s = p.astype(jnp.int32).sum() + o.sum()
        return v ^ (s & 1).astype(v.dtype)
    timed("chunk_panels (einsum)", cp_step, vals)

    panels0, offs0, _ = chunk_panels(vals, widths, ends, mask)

    def mg_step(p):
        m = merge_panels(p, offs0, P)
        return p ^ (m.astype(jnp.int32).sum() & 1).astype(p.dtype)
    timed("merge_panels (pallas)", mg_step, panels0)

    sp = jnp.asarray(rng.integers(0, 1 << 32, (B, 2, P), dtype=np.uint64)
                     .astype(np.uint32))
    bo = np.zeros((B, 2), np.int32)
    bo[:, 1] = rng.integers(0, (W - P - 128) * 32, B)
    bo_j = jnp.asarray(bo)

    def splice_step(p):
        m = splice_subframes(p, bo_j, W)
        return p ^ (m.astype(jnp.int32).sum() & 1).astype(p.dtype)
    timed("splice_subframes (pallas)", splice_step, sp)

    words = jnp.asarray(rng.integers(0, 1 << 32, (B, W), dtype=np.uint64)
                        .astype(np.uint32))
    tab = crc16_neg_pow_table(W * 32)

    def crc_step(w):
        c = crc16_inner(w, tab)
        return w ^ (c.astype(jnp.uint32).sum() & 1).astype(w.dtype)
    timed("crc16_inner", crc_step, words)


if __name__ == "__main__":
    main()
