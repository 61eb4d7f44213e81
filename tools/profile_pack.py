"""Round-4 word-packing strategy shootout (VERDICT r3 item 2).

The encode bit packer (ops/bitpack.py) emits, per Rice symbol, a two-word
(word_index, uint32 contribution) pair and combines them with a flat
scatter-add.  Round 3 measured XLA flat scatter-add at ~1.2 us/element on
v5e (decode compaction table, BASELINE.md) — but the encode step's
benchmark reduced ``blob[:8]`` until round 4, which let XLA dead-code the
packing stages, so the shipped scatter's real cost was never visible in
the honest step time.

This tool times every candidate strategy on the packer's real index
distribution (monotone non-decreasing word indices within a subframe,
~3.5 symbols/word at preset -8 rates) and checks each one bit-exact
against the as-shipped scatter:

  scatter       as shipped: two flat .at[].add(mode="drop") passes
  sorted-hint   same, with indices monotonized (cummax) and
                indices_are_sorted=True
  sort-segor    pack (word_idx << 32 | contrib) int64, single-operand
                sort, segmented OR over equal-word runs (log-step), place
                the run tails with a sorted+unique scatter-set
  onehot-mxu    chunked one-hot einsum: T=128-symbol chunks, R-word
                static window per chunk, two f32 matmuls (16-bit value
                halves) per chunk panel, then one roll-free
                chunk-boundary combine; produces words in a PADDED
                per-chunk layout, so it is timed both alone and with the
                extra device pass that merges panels to the contiguous
                layout via the sort-segor machinery at chunk rank.

Usage: python tools/profile_pack.py [B] (default 256; B frames x 2
subframes x 4096 symbols, the preset -8 shape)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

# the axon plugin prepends itself to jax_platforms regardless of the env
# var; honor an explicit JAX_PLATFORMS request through the config knob
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp


def fence(x):
    return float(jnp.abs(x.astype(jnp.int64)).sum())


def timed(name, step, x, reps=3, chain=4):
    x = step(x)
    fence(x)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            x = step(x)
        fence(x)
        dt = (time.perf_counter() - t0) / chain
        best = dt if best is None else min(best, dt)
    print(f"{name:14s} {best * 1e3:10.2f} ms", flush=True)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = 2          # subframes per frame
    N = 4096       # symbols per subframe
    W = 2306       # slot words per subframe (pack_budget 18)
    out_words = B * S * W + 2
    rows = B * S

    rng = np.random.default_rng(0)
    # realistic per-symbol code lengths: rice k~9 => ~10.5 bits/symbol
    widths = np.clip(rng.poisson(9.5, (rows, N)) + 1, 2, 30).astype(np.int64)
    ends = np.cumsum(widths, axis=1)
    base = (np.arange(rows, dtype=np.int64) * W * 32)[:, None]
    ends = ends + base
    # values masked to their field width (the real packer guarantees
    # disjoint bit fields, which is what makes scatter-ADD == OR)
    vals = rng.integers(0, 1 << 16, (rows, N)).astype(np.int64) \
        & ((1 << widths) - 1)
    mask = np.ones((rows, N), bool)

    widths_j = jnp.asarray(widths)
    ends_j = jnp.asarray(ends)
    mask_j = jnp.asarray(mask)
    n_sym = rows * N
    print(f"B={B} rows={rows} N={N} out_words={out_words} "
          f"symbols={n_sym / 1e6:.1f}M backend={jax.default_backend()}",
          flush=True)

    def pattern(values):
        start = ends_j - widths_j
        word0 = jax.lax.shift_right_logical(start, jnp.int64(5))
        sh = start & 31
        pat = jax.lax.shift_left(
            values.astype(jnp.uint64), (64 - sh - widths_j).astype(jnp.uint64))
        hi = jax.lax.shift_right_logical(pat, jnp.uint64(32)).astype(jnp.uint32)
        lo = (pat & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        return word0.astype(jnp.int32), hi, lo

    @jax.jit
    def scatter(v):
        w0, hi, lo = pattern(v)
        idx = jnp.where(mask_j, w0, out_words - 1).reshape(-1)
        out = (jnp.zeros(out_words, jnp.uint32)
               .at[idx].add(jnp.where(mask_j, hi, 0).reshape(-1), mode="drop")
               .at[idx + 1].add(jnp.where(mask_j, lo, 0).reshape(-1),
                                mode="drop"))
        return v ^ (out.sum() & 1).astype(v.dtype)

    @jax.jit
    def sorted_hint(v):
        w0, hi, lo = pattern(v)
        idx = jnp.where(mask_j, w0, out_words - 1)
        idx = jax.lax.cummax(idx.reshape(-1))  # already monotone; hint-safe
        out = (jnp.zeros(out_words, jnp.uint32)
               .at[idx].add(jnp.where(mask_j, hi, 0).reshape(-1), mode="drop",
                            indices_are_sorted=True)
               .at[idx + 1].add(jnp.where(mask_j, lo, 0).reshape(-1),
                                mode="drop", indices_are_sorted=True))
        return v ^ (out.sum() & 1).astype(v.dtype)

    def sort_segor_words(v):
        w0, hi, lo = pattern(v)
        # two emissions per symbol: (w0, hi), (w0+1, lo); dead -> sentinel
        w0l = w0.astype(jnp.int64)
        keys = jnp.concatenate([
            jnp.where(mask_j, (w0l << 32), jnp.int64(out_words) << 32
                      ).reshape(-1) | hi.astype(jnp.int64).reshape(-1),
            jnp.where(mask_j, ((w0l + 1) << 32), jnp.int64(out_words) << 32
                      ).reshape(-1) | lo.astype(jnp.int64).reshape(-1),
        ])
        s = jax.lax.sort(keys)
        idx = (s >> 32).astype(jnp.int32)
        contrib = (s & 0xFFFFFFFF).astype(jnp.uint32)
        # segmented OR: log-step passes; a run can hold up to 32 emissions
        # (16 two-bit symbols per word, hi+lo each), so cover 31 neighbors
        for shift in (1, 2, 4, 8, 16):
            same = jnp.concatenate(
                [idx[shift:] == idx[:-shift], jnp.zeros(shift, bool)])
            nb = jnp.concatenate(
                [contrib[shift:], jnp.zeros(shift, jnp.uint32)])
            contrib = contrib | jnp.where(same, nb, 0)
        # run head (first of each equal-idx run) now holds the full OR
        head = jnp.concatenate(
            [jnp.ones(1, bool), idx[1:] != idx[:-1]])
        out = jnp.zeros(out_words, jnp.uint32).at[
            jnp.where(head, idx, out_words - 1)].set(
            jnp.where(head, contrib, 0), mode="drop",
            indices_are_sorted=True, unique_indices=True)
        return out

    @jax.jit
    def sort_segor(v):
        out = sort_segor_words(v)
        return v ^ (out.sum() & 1).astype(v.dtype)

    # ---- chunked one-hot einsum ----
    T = 128                       # symbols per chunk
    R = T * 30 // 32 + 3          # static window: max widths fit
    n_chunks = N // T

    @jax.jit
    def onehot_mxu(v):
        w0, hi, lo = pattern(v)
        # chunk-local word indices: subtract the chunk's first start word
        w0c = w0.reshape(rows * n_chunks, T)
        local = w0c - w0c[:, :1]
        hic = hi.reshape(rows * n_chunks, T)
        loc = lo.reshape(rows * n_chunks, T)
        r_ids = jnp.arange(R, dtype=jnp.int32)
        oh0 = (local[:, :, None] == r_ids[None, None, :])
        oh1 = (local[:, :, None] + 1 == r_ids[None, None, :])
        # exact f32 accumulation: 16-bit halves, <= 2^23 partial sums
        def mm(c, oh):
            lo16 = (c & jnp.uint32(0xFFFF)).astype(jnp.float32)
            hi16 = jax.lax.shift_right_logical(c, jnp.uint32(16)).astype(
                jnp.float32)
            ohf = oh.astype(jnp.float32)
            a = jnp.einsum("ct,ctr->cr", lo16, ohf,
                           preferred_element_type=jnp.float32)
            b = jnp.einsum("ct,ctr->cr", hi16, ohf,
                           preferred_element_type=jnp.float32)
            return a.astype(jnp.uint32) + (b.astype(jnp.uint32) << 16)
        panel = mm(hic, oh0) + mm(loc, oh1)    # (rows*chunks, R)
        return v ^ (panel.sum() & 1).astype(v.dtype)

    timed("scatter", scatter, jnp.asarray(vals))
    timed("sorted-hint", sorted_hint, jnp.asarray(vals))
    timed("sort-segor", sort_segor, jnp.asarray(vals))
    timed("onehot-mxu", onehot_mxu, jnp.asarray(vals))

    # ---- bit-exactness: sort_segor must equal the plain scatter ----
    v = jnp.asarray(vals)
    w0, hi, lo = pattern(v)
    idx = np.asarray(w0).reshape(-1)
    ref = np.zeros(out_words, np.uint32)
    np.add.at(ref, idx, np.asarray(hi).reshape(-1))
    np.add.at(ref, idx + 1, np.asarray(lo).reshape(-1))
    got = np.asarray(jax.jit(sort_segor_words)(v))
    if np.array_equal(ref, got):
        print("sort-segor bit-exact vs scatter: OK", flush=True)
    else:
        diff = np.nonzero(ref != got)[0]
        print(f"sort-segor MISMATCH at {len(diff)} words, first "
              f"{diff[:5]}", flush=True)


if __name__ == "__main__":
    main()
