#!/usr/bin/env python
"""Ablation profiler for the device encode step.

Times individual planner stages with the bench.py methodology
(dependency-chained dispatch + scalar-download sync) so the honest cost
of each stage is visible.  Run on the TPU host:

    python tools/profile_encode.py [stage ...]

Stages: full pack0 analyze1 fixed lpc ricesearch partlookup exactbits
        scatter packonly
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from bench import make_audio
from flac_codec_tpu.ops import fixed, lpc, rice
from flac_codec_tpu.ops.encode_batch import (_analyze_channel,
                                             encode_frames_plan_blob)

B = int(os.environ.get("PROF_B", "256"))
N = int(os.environ.get("PROF_N", "4096"))
REPS = int(os.environ.get("PROF_REPS", "3"))
CHAIN = int(os.environ.get("PROF_CHAIN", "8"))

KW = dict(bits_per_sample=16, block_size=N, max_lpc_order=12,
          max_partition_order=6, mid_side=True, exhaustive=True,
          analysis="f32")


def timed(name, step, x0):
    x = step(x0)
    x = step(x)
    float(jnp.abs(x).sum())
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            x = step(x)
        float(jnp.abs(x).sum())
        dt = (time.perf_counter() - t0) / CHAIN
        best = dt if best is None else min(best, dt)
    mb = B * N * 2 * 2 / 1e6
    print(f"{name:12s} {best*1e3:9.3f} ms/batch  ({mb/best:9.1f} MB/s PCM)",
          flush=True)
    return best


def chainer(fn):
    """Wrap fn: (B,2,N) int16 pcm -> scalar-ish output, into a chained step."""
    @jax.jit
    def step(x):
        out = fn(x)
        return x ^ (out.astype(jnp.int64).sum() & 1).astype(x.dtype)
    return step


def main():
    stages = sys.argv[1:] or ["full", "pack0", "lpc", "fixed", "ricesearch",
                              "partlookup", "exactbits", "scatter"]
    inter = make_audio(N * B)
    pcm = inter.reshape(B, N, 2).transpose(0, 2, 1)
    x0 = jnp.asarray(np.ascontiguousarray(pcm).astype(np.int16))
    win = lpc.window_array(("tukey", 0.5), N, jnp.float32)

    def as_x64(x):
        return x[:, 0].astype(jnp.int64)

    if "full" in stages:
        timed("full", chainer(lambda x: encode_frames_plan_blob(
            x, pack_budget=18, **KW)[:64]), x0)
    if "pack0" in stages:
        timed("pack0", chainer(lambda x: encode_frames_plan_blob(
            x, pack_budget=0, **KW)[:64]), x0)
    if "analyze1" in stages:
        def a1(x):
            p = _analyze_channel(as_x64(x), 16, win, 12, N, 6, False)
            return p["subframe_bits"]
        timed("analyze1", chainer(a1), x0)
    if "fixed" in stages:
        def fx(x):
            diffs, dvalid = fixed.diff_cascade(as_x64(x))
            ford, fres = fixed.best_order(diffs, dvalid)
            return fres.sum() + ford.sum()
        timed("fixed", chainer(fx), x0)
    if "lpc" in stages:
        def lp(x):
            r = lpc.analyze(as_x64(x), win, 12, 16, N)
            return r["residuals"].sum() + r["order"].sum()
        timed("lpc", chainer(lp), x0)
    if "ricesearch" in stages:
        def rs(x):
            xi = as_x64(x)
            res = xi - jnp.pad(xi, ((0, 0), (1, 0)))[:, :N]
            order = jnp.full(B, 2, jnp.int32)
            pl = rice.search(res, order, N, 6, 15)
            return pl["exact_bits"].sum() + pl["po"].sum()
        timed("ricesearch", chainer(rs), x0)
    if "partlookup" in stages:
        def plk(x):
            xi = as_x64(x)
            params = (jnp.abs(xi[:, :64]) & 15).astype(jnp.int64)
            part_idx = jnp.minimum(jnp.arange(N)[None, :] // (N // 64), 63) \
                | (xi[:, :1] & 0).astype(jnp.int64)
            return rice.part_lookup(params, part_idx).sum()
        timed("partlookup", chainer(plk), x0)
    if "exactbits" in stages:
        # rice.search minus the exact-bits tail is hard to isolate without
        # editing; time 2x part_lookup + quotient reduce as a proxy
        pass
    if "scatter" in stages:
        def sc(x):
            xi = as_x64(x)
            u = (jnp.abs(xi) & 0xFF).astype(jnp.uint32)
            out_words = B * 2 * ((18 * N + 31) // 32 + 2) + 2
            idx = (jnp.arange(B * N) % out_words).astype(jnp.int32)
            w = jnp.zeros(out_words, jnp.uint32)
            w = w.at[idx].add(u.reshape(-1), mode="drop")
            w = w.at[idx + 1].add(u.reshape(-1), mode="drop")
            return w.sum()
        timed("scatter", chainer(sc), x0)
    if "packonly" in stages:
        from flac_codec_tpu.ops.bitpack import pack_residual_sections

        def po_(x):
            xi = as_x64(x)
            res = xi - jnp.pad(xi, ((0, 0), (1, 0)))[:, :N]
            order = jnp.full(B, 2, jnp.int32)
            pl = rice.search(res, order, N, 6, 15)
            per_sub_words = (18 * N + 31) // 32 + 2
            out_words = B * 2 * per_sub_words + 2
            base = (jnp.arange(B) * 2) * per_sub_words
            w, bits, _ = pack_residual_sections(
                res, order, pl["po"], pl["kinds"], pl["params"],
                jnp.full(B, 4, jnp.int32), N, out_words, base, 18 * N)
            return w.sum() + bits.sum()
        timed("packonly", chainer(po_), x0)


if __name__ == "__main__":
    main()
