"""Round-4 encode-step ablation profile (VERDICT r3 items 2 and 8).

Times the full device encode step and its ablations under the honest
fence (dependency-chained dispatch + scalar-download sync, bench.py
methodology), so the 25.9 ms/batch round-3 cost can be attributed and
the 24-bit/f64 rows in BASELINE.md re-measured honestly:

  full        frame_pack=True, pack_budget=18 (the production step)
  pack_off    same planner, residual packing only (no frame bodies/CRC)
  plan_only   pack_budget=0 (no device packing at all)
  B sweep     full step at B=256/512/1024 (latency- vs throughput-bound)
  24bit       full step on 24-bit PCM (rice2 path)
  f64         full step in f64 parity mode

Usage: python tools/profile_r4.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import device_step_mbps
from flac_codec_tpu.encode import Options


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    opts = Options.best().no_seektable()
    reps, chain = (2, 4) if quick else (3, 8)

    def run(name, **kw):
        t0 = time.time()
        mbps, ms = device_step_mbps(opts, reps=reps, chain=chain, **kw)
        print(f"{name:28s} {ms:9.3f} ms/batch  {mbps:9.1f} MB/s "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return ms

    b = int(os.environ.get("FLAC_TPU_PROF_BATCH", "256"))
    full = run("full B=%d" % b, batch_frames=b, analysis="f32",
               pack_budget=18, frame_pack=True)
    pack_off = run("pack_off (residual pack)", batch_frames=b,
                   analysis="f32", pack_budget=18, frame_pack=False)
    plan_only = run("plan_only (no pack)", batch_frames=b, analysis="f32",
                    pack_budget=0, frame_pack=False)
    print(f"-> frame-body pack cost {full-pack_off:7.3f} ms; "
          f"residual pack cost {pack_off-plan_only:7.3f} ms", flush=True)

    if not quick:
        for b2 in (512, 1024):
            run("full B=%d" % b2, batch_frames=b2, analysis="f32",
                pack_budget=18, frame_pack=True)
        run("24-bit rice2 B=%d" % b, batch_frames=b, analysis="f32",
            pack_budget=26, frame_pack=True, bits_per_sample=24)
        run("f64 parity B=%d" % b, batch_frames=b, analysis="f64",
            pack_budget=18, frame_pack=True)

    scatter_micro(b)


def scatter_micro(B):
    """Micro-benchmark of the bit-packer's two-word scatter pattern:
    the as-shipped unsorted-hint form vs a cummax-monotonized index
    stream with indices_are_sorted=True (values at monotonized masked
    slots are 0, so placement there is a harmless add)."""
    import numpy as np
    import jax.numpy as jnp
    import jax

    N = 4096
    W = 4736
    out_words = B * W + 2
    rng = np.random.default_rng(0)
    # realistic shape: ascending end-offsets per row, ~9 bits/sample
    lens = rng.integers(2, 16, (B, N)).astype(np.int64)
    ends = np.cumsum(lens, axis=1) + (np.arange(B)[:, None] * W * 32)
    vals = rng.integers(0, 1 << 16, (B, N)).astype(np.int64)
    widths = lens
    mask = rng.random((B, N)) > 0.05
    ends_j = jnp.asarray(ends)
    vals_j = jnp.asarray(vals)
    widths_j = jnp.asarray(widths)
    mask_j = jnp.asarray(mask)

    def pattern(values, widths, end_offsets):
        start = end_offsets - widths
        word0 = jax.lax.shift_right_logical(start, jnp.int64(5))
        sh = start & 31
        pat = jax.lax.shift_left(
            values.astype(jnp.uint64), (64 - sh - widths).astype(jnp.uint64))
        hi = jax.lax.shift_right_logical(pat, jnp.uint64(32)).astype(
            jnp.uint32)
        lo = (pat & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        return word0.astype(jnp.int32), hi, lo

    @jax.jit
    def as_shipped(v):
        w0, hi, lo = pattern(v, widths_j, ends_j)
        hi = jnp.where(mask_j, hi, 0)
        lo = jnp.where(mask_j, lo, 0)
        idx = jnp.where(mask_j, w0, 0).reshape(-1)
        out = (jnp.zeros(out_words, jnp.uint32)
               .at[idx].add(hi.reshape(-1), mode="drop")
               .at[idx + 1].add(lo.reshape(-1), mode="drop"))
        return v ^ (out.sum() & 1).astype(v.dtype)

    @jax.jit
    def sorted_hint(v):
        w0, hi, lo = pattern(v, widths_j, ends_j)
        hi = jnp.where(mask_j, hi, 0)
        lo = jnp.where(mask_j, lo, 0)
        idx = jax.lax.cummax(
            jnp.where(mask_j, w0, 0).reshape(-1))
        out = (jnp.zeros(out_words, jnp.uint32)
               .at[idx].add(hi.reshape(-1), mode="drop",
                            indices_are_sorted=True)
               .at[idx + 1].add(lo.reshape(-1), mode="drop",
                                indices_are_sorted=True))
        return v ^ (out.sum() & 1).astype(v.dtype)

    timed2("scatter as-shipped", as_shipped, vals_j)
    timed2("scatter sorted-hint", sorted_hint, vals_j)


def timed2(name, step, x, reps=3, chain=4):
    import jax.numpy as jnp
    x = step(x)
    float(jnp.abs(x).sum())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            x = step(x)
        float(jnp.abs(x).sum())
        dt = (time.perf_counter() - t0) / chain
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best*1e3:9.3f} ms", flush=True)
    return best


if __name__ == "__main__":
    main()
