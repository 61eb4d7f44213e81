"""Prototype A/B for the round-5 pack redesign (chunkmerge_panels).

Compares the shipped chunk_panels+merge_panels pipeline against a fused
XLA-only formulation: byte planes (8 value planes + 1 count plane, int8
biased), one one-hot einsum over 256-wide 128-ALIGNED windows (the
(offset mod 128) shift folded into the one-hot column), then block
placement as a (chunks -> P/128 blocks) einsum on exact-in-f32 u16
halves.  No Pallas, no sequential merge loop.

Usage: python tools/proto_packv2.py [rows] [check|bench]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from flac_codec_tpu.ops.packpanel import (CHUNK_R, CHUNK_T, chunk_panels,
                                          merge_panels)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MODE = sys.argv[2] if len(sys.argv) > 2 else "check"
N = 4096
P = 2688


def chunkmerge_v2(values, widths, ends, mask, P):
    """(rows, N) symbols -> (rows, P) merged uint32 panels + overflow."""
    rows, Ns = ends.shape
    C = Ns // CHUNK_T
    BLK = P // 128

    ends32 = ends.astype(jnp.int32)
    w32 = widths.astype(jnp.int32)
    start = ends32 - w32
    word0 = jax.lax.shift_right_logical(start, jnp.int32(5))
    sh = start & 31
    v32 = values.astype(jnp.uint32)
    e = (sh + w32).astype(jnp.uint32)
    hi = jnp.where(e <= 32, v32 << ((jnp.uint32(32) - e) & 31),
                   v32 >> ((e - 32) & 31))
    lo = jnp.where(e <= 32, jnp.uint32(0), v32 << ((jnp.uint32(64) - e) & 31))
    hi = jnp.where(mask, hi, 0)
    lo = jnp.where(mask, lo, 0)

    w0c = word0.reshape(rows * C, CHUNK_T)
    m = mask.reshape(rows * C, CHUNK_T)
    big = jnp.int32(1 << 30)
    offs = jnp.min(jnp.where(m, w0c, big), axis=1)
    offs = jnp.where(offs == big, 0, offs)
    offs = jnp.clip(offs, 0, P - 2 * CHUNK_R)
    span = jnp.max(jnp.where(m, w0c - offs[:, None], 0), axis=1)
    overflow = (span > CHUNK_R - 2).reshape(rows, C).any(axis=1)

    a0 = offs & ~jnp.int32(127)
    local = w0c - a0[:, None]           # in [0, 253] for legal chunks
    local = jnp.clip(local, -2, 2 * CHUNK_R - 2)
    local = jnp.where(m, local, -2)

    hic = hi.reshape(rows * C, CHUNK_T)
    loc = lo.reshape(rows * C, CHUNK_T)
    r_ids = jnp.arange(2 * CHUNK_R, dtype=jnp.int32)
    oh = (local[:, :, None] == r_ids[None, None, :]).astype(jnp.int8)

    byte_sh = (jnp.arange(4, dtype=jnp.uint32) * 8)[:, None, None]

    def bytes_(c):  # (CT, T) u32 -> (4, CT, T) int8 biased byte planes
        return (((c[None] >> byte_sh) & jnp.uint32(0xFF)).astype(jnp.int32)
                - 128).astype(jnp.int8)

    ones = jnp.ones((1,) + hic.shape, jnp.int8)
    planes = jnp.concatenate([bytes_(hic), bytes_(loc), ones])  # (9, CT, T)
    out = jnp.einsum("vct,ctr->vcr", planes, oh,
                     preferred_element_type=jnp.int32)  # (9, CT, 256)
    cnt = out[8]
    corr = cnt * 128

    def word(j0):
        return sum(((out[j0 + i] + corr).astype(jnp.uint32)
                    << jnp.uint32(8 * i)) for i in range(4))

    hi_w = word(0)
    lo_w = word(4)
    win = hi_w + jnp.concatenate(
        [jnp.zeros((rows * C, 1), jnp.uint32), lo_w[:, :-1]], axis=1)

    # block placement: u16 halves exact in f32, einsum over the chunk axis
    b0 = (a0 >> 7).reshape(rows, C)
    ohb = (b0[:, :, None] == jnp.arange(BLK, dtype=jnp.int32)
           ).astype(jnp.float32)                       # (rows, C, BLK)
    halves = jnp.stack([(win & jnp.uint32(0xFFFF)).astype(jnp.float32),
                        (win >> 16).astype(jnp.float32)], axis=1)
    halves = halves.reshape(rows, C, 2, 2, 128)        # (r, c, h16, half, j)
    place = jnp.einsum("rcb,rchkj->rbhkj", ohb, halves,
                       precision="highest")
    first = place[:, :, :, 0]                          # window words 0..127
    second = place[:, :, :, 1]                         # words 128..255
    shifted = jnp.concatenate(
        [jnp.zeros_like(second[:, :1]), second[:, :-1]], axis=1)
    blk = first + shifted                              # (rows, BLK, 2, 128)
    merged = (blk[:, :, 0].astype(jnp.uint32)
              + (blk[:, :, 1].astype(jnp.uint32) << 16))
    return merged.reshape(rows, P), overflow


def make_data(rows, seed=0):
    rng = np.random.default_rng(seed)
    widths = np.clip(rng.poisson(9.5, (rows, N)) + 1, 2, 30).astype(np.int64)
    ends = np.cumsum(widths, axis=1) + 6
    vals = rng.integers(0, 1 << 16, (rows, N)).astype(np.int64) \
        & ((1 << widths) - 1)
    mask = rng.random((rows, N)) > 0.02
    return (jnp.asarray(vals), jnp.asarray(widths), jnp.asarray(ends),
            jnp.asarray(mask))


def old_pipeline(vals, widths, ends, mask):
    panels, offs, ovf = chunk_panels(vals, widths, ends, mask)
    return merge_panels(panels, jnp.clip(offs, 0, P - 2 * CHUNK_R), P), ovf


def check():
    for seed in range(3):
        vals, widths, ends, mask = make_data(ROWS, seed)
        ref, ovf_ref = jax.jit(old_pipeline)(vals, widths, ends, mask)
        new, ovf_new = jax.jit(lambda *a: chunkmerge_v2(*a, P))(
            vals, widths, ends, mask)
        ref, new = np.asarray(ref), np.asarray(new)
        ovf = np.asarray(ovf_ref)
        okrows = ~ovf
        same = (ref[okrows] == new[okrows]).all()
        print(f"seed {seed}: overflow rows {int(ovf.sum())}, "
              f"ovf flags equal: {bool((ovf == np.asarray(ovf_new)).all())}, "
              f"non-overflow panels equal: {bool(same)}", flush=True)
        if not same:
            bad = np.argwhere(ref[okrows] != new[okrows])[:5]
            print("  first mismatches:", bad)
            for r, c in bad[:3]:
                print(f"   ref {ref[okrows][r, c]:08x} new "
                      f"{new[okrows][r, c]:08x}")
            sys.exit(1)


def bench():
    vals, widths, ends, mask = make_data(ROWS)
    CHAIN = 32

    def timed(name, fn):
        @jax.jit
        def step(v):
            def body(c, _):
                out, _ovf = fn(c, widths, ends, mask)
                return c ^ (out.sum() & 1).astype(c.dtype), None
            return jax.lax.scan(body, v, None, length=CHAIN)[0]

        x = step(vals)
        float(jnp.abs(x).sum())
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            x = step(x)
            float(jnp.abs(x).sum())
            dt = (time.perf_counter() - t0) / CHAIN
            best = dt if best is None else min(best, dt)
        print(f"{name:24s} {best*1e3:8.3f} ms", flush=True)

    timed("null floor", lambda v, w, e, m: (v.astype(jnp.uint32)[:, :1], None))
    timed("old chunk+merge", old_pipeline)
    timed("new chunkmerge_v2", lambda *a: chunkmerge_v2(*a, P))


if __name__ == "__main__":
    if MODE == "check":
        check()
    else:
        bench()
