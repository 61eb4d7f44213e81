"""Measure the two candidate decode-compaction primitives on TPU.

VERDICT r4 item 3 asks to break the decode compaction wall.  Every
movement primitive measured in rounds 3-4 (flat scatter, flat sort,
vmapped scatter, gather) runs at us/element.  Two shapes were never
measured:

1. COLUMNWISE sort: jax.lax.sort along axis 0 of a (TB, LANES) panel —
   per-lane independent bitonic networks, depth log^2(TB) (~2.5x lower
   than the flat sort's log^2(TB*LANES)) and lane-vectorized.  If this
   is fast, rank-emission + columnwise sort + per-lane rotate gives a
   scatter-free compaction pipeline.

2. Per-lane VARIABLE ROTATE via bit-decomposed static rolls:
   for bit b: x = where(bit_b(shift)[lane], roll(x, 2^b, axis=0), x).
   Needed to normalize per-lane channel bases after compaction.

Usage: python tools/profile_colsort.py [TB] [LANES] [reps]
Production shape: TB ~ 88k bit rows (preset -8 stereo 4096), LANES=1024.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def fence(x):
    return float(jnp.asarray(x).sum())


def timed(fn, x, reps):
    fence(fn(x))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        x = x + 1  # dependency-chain so nothing caches
        s = fn(x)
    got = fence(s)
    dt = (time.perf_counter() - t0) / reps
    return dt, got


def main():
    a = sys.argv[1:]
    TB = int(a[0]) if len(a) > 0 else 88064
    LANES = int(a[1]) if len(a) > 1 else 1024
    reps = int(a[2]) if len(a) > 2 else 2
    rng = np.random.default_rng(7)

    # ~11% live rows like a real emission panel; ranks monotone per lane
    live = rng.random((TB, LANES)) < 0.11
    vals = rng.integers(-(1 << 20), 1 << 20, (TB, LANES), dtype=np.int64)
    ranks = np.cumsum(live, axis=0) - 1
    keys_np = np.where(live, (ranks.astype(np.int64) << 32)
                       | (vals & 0xFFFFFFFF), np.int64(1) << 62)
    keys = jnp.asarray(keys_np)

    @jax.jit
    def colsort(k):
        return jax.lax.sort(k, dimension=0)

    dt, _ = timed(colsort, keys, reps)
    el = TB * LANES
    print(f"columnwise sort int64 ({TB}, {LANES}): {dt*1e3:.1f} ms "
          f"({dt / el * 1e9:.2f} ns/el)", flush=True)

    # flat sort for comparison at a smaller size (known slow)
    small = keys[: TB // 8].reshape(-1)

    @jax.jit
    def flatsort(k):
        return jax.lax.sort(k)

    dt_f, _ = timed(flatsort, small, 1)
    print(f"flat sort int64 ({small.size},): {dt_f*1e3:.1f} ms "
          f"({dt_f / small.size * 1e9:.2f} ns/el)", flush=True)

    # per-lane variable rotate: 14 bit passes of select+static-roll
    E = 8448
    panel = jnp.asarray(
        rng.integers(-(1 << 30), 1 << 30, (E, LANES), dtype=np.int32))
    shifts = jnp.asarray(rng.integers(0, E, LANES, dtype=np.int32))

    @jax.jit
    def var_rotate(p):
        for b in range(14):
            m = ((shifts >> b) & 1) == 1
            p = jnp.where(m[None, :], jnp.roll(p, -(1 << b), axis=0), p)
        return p

    dt_r, _ = timed(var_rotate, panel, reps)
    print(f"per-lane variable rotate 14 passes ({E}, {LANES}): "
          f"{dt_r*1e3:.2f} ms", flush=True)

    # int32 transpose at panel scale (needed once per batch)
    @jax.jit
    def transpose(p):
        return p.T.copy() if hasattr(p.T, "copy") else jnp.transpose(p)

    big32 = jnp.asarray(vals.astype(np.int32))

    @jax.jit
    def tr(p):
        return jnp.transpose(p) + 0

    dt_t, _ = timed(tr, big32, reps)
    print(f"transpose int32 ({TB}, {LANES}): {dt_t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
