"""Round-4 compaction experiment (VERDICT r3 item 4).

The device-parse pipeline's cost is compacting the Pallas parser's
ragged (bit-row, lane) emissions into dense slot panels.  Round 3
measured the movement primitives (BASELINE.md table); its own data shows
single-operand jax.lax.sort at ~44 ms/16.8M elements vs the shipped
vmapped scatter-add at ~0.8 s — so this experiment packs
(slot_key << 32 | value) into ONE int64 operand, single-operand sorts,
and then places with a sorted+unique scatter, timing each stage under
the honest fence (dependency-chained dispatch + scalar-download sync).

Variants timed, at the real emission-panel scale (TB bit-rows x 1024
lanes from a preset -8 stereo stream):

  scatter      the shipped baseline: flat scatter-add, unsorted indices
  sort1        single-operand int64 sort of the packed keys alone
  sort+place   sort, then scatter-add with indices_are_sorted=True,
               unique_indices=True (the full replacement candidate)

Usage: python tools/profile_compaction.py [TB_rows] (default 32768)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax
import jax.numpy as jnp

LANES = 1024


def fence(x):
    return float(jnp.abs(x).sum())


def timed(name, step, x, reps=3, chain=2):
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
    print(f"{name:24s} {best*1e3:10.2f} ms", flush=True)
    return best


def main():
    TB = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    N = 4096
    C = 2
    slots_per_ch = N + 40
    tot = C * slots_per_ch
    rng = np.random.default_rng(0)

    # synthetic emission panels shaped like the parser's: ~tot live
    # emissions per lane, slots increasing with bit-row (sample slots) —
    # the exact structure the real panels have
    sym = np.zeros((TB, LANES), np.int32)
    val = rng.integers(-(1 << 17), 1 << 17, (TB, LANES)).astype(np.int32)
    live_rows = np.sort(
        rng.choice(TB, size=min(tot, TB), replace=False))
    for k, r in enumerate(live_rows):
        sym[r, :] = k + 1
    sym = jnp.asarray(sym)
    val = jnp.asarray(val)
    n_emit = len(live_rows)
    print(f"TB={TB} lanes={LANES} tot={tot} live/lane={n_emit} "
          f"elements={TB*LANES/1e6:.1f}M backend={jax.default_backend()}",
          flush=True)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (TB, LANES), 1)

    @jax.jit
    def scatter_baseline(v):
        flat = jnp.where(sym > 0, lane_ids * tot + sym - 1,
                         LANES * tot).astype(jnp.int32)
        panel = jnp.zeros(LANES * tot + 1, jnp.int32).at[
            flat.reshape(-1)].add(
            jnp.where(sym > 0, v, 0).reshape(-1).astype(jnp.int32),
            mode="drop")
        return v ^ (panel.sum() & 1)

    @jax.jit
    def sort_only(v):
        flat = (lane_ids * tot + sym - 1).astype(jnp.int64)
        keys = jnp.where(sym > 0,
                         (flat << 32) | v.astype(jnp.uint32).astype(jnp.int64),
                         jnp.int64(1) << 62)
        s = jax.lax.sort(keys.reshape(-1))
        return v ^ (s[:8].sum() & 1).astype(v.dtype)

    @jax.jit
    def sort_place(v):
        flat = (lane_ids * tot + sym - 1).astype(jnp.int64)
        keys = jnp.where(sym > 0,
                         (flat << 32) | v.astype(jnp.uint32).astype(jnp.int64),
                         jnp.int64(1) << 62)
        s = jax.lax.sort(keys.reshape(-1))
        # the first n_live entries are the live emissions in slot order
        head = s[:LANES * tot]
        idx = (head >> 32).astype(jnp.int32)
        vals = jax.lax.bitcast_convert_type(
            (head & 0xFFFFFFFF).astype(jnp.uint32), jnp.int32)
        dead = head >= (jnp.int64(1) << 62)
        panel = jnp.zeros(LANES * tot + 1, jnp.int32).at[
            jnp.where(dead, LANES * tot, idx)].set(
            jnp.where(dead, 0, vals), indices_are_sorted=True,
            unique_indices=True, mode="drop")
        return v ^ (panel.sum() & 1)

    timed("scatter (baseline)", scatter_baseline, val)
    timed("sort1 (int64 1-op)", sort_only, val)
    timed("sort+place", sort_place, val)

    # correctness: sort_place equals scatter on one instance
    flat = np.where(np.asarray(sym) > 0,
                    np.asarray(lane_ids) * tot + np.asarray(sym) - 1, -1)
    ref = np.zeros(LANES * tot, np.int32)
    m = flat >= 0
    ref[flat[m]] = np.asarray(val)[m]

    @jax.jit
    def place(v):
        flat = (lane_ids * tot + sym - 1).astype(jnp.int64)
        keys = jnp.where(sym > 0,
                         (flat << 32) | v.astype(jnp.uint32).astype(jnp.int64),
                         jnp.int64(1) << 62)
        s = jax.lax.sort(keys.reshape(-1))
        head = s[:LANES * tot]
        idx = (head >> 32).astype(jnp.int32)
        vals = jax.lax.bitcast_convert_type(
            (head & 0xFFFFFFFF).astype(jnp.uint32), jnp.int32)
        dead = head >= (jnp.int64(1) << 62)
        return jnp.zeros(LANES * tot + 1, jnp.int32).at[
            jnp.where(dead, LANES * tot, idx)].set(
            jnp.where(dead, 0, vals), indices_are_sorted=True,
            unique_indices=True, mode="drop")[:-1]

    got = np.asarray(place(val))
    assert (got == ref).all(), "sort+place mismatch"
    print("sort+place bit-exact vs scatter baseline", flush=True)


if __name__ == "__main__":
    main()
