#!/usr/bin/env python
"""Benchmark: PCM encode throughput at preset -8 on one TPU chip.

Measures the full pipeline — batched device planning (ops.encode_frames_plan)
overlapped with native host assembly — end to end, FLAC bytes out, on
synthetic 16-bit/44.1k stereo audio (sine mix + noise, the standard codec
workload shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured MB/s over the driver-assigned 1 GB/s/chip target
(BASELINE.json north_star).  Uses the persistent compilation cache in
.jax_cache so repeat runs skip the (slow, tunneled) TPU compile.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flac_codec_tpu.encode import Options
from flac_codec_tpu.parallel.batch import BatchEncoder

BASELINE_MBPS = 1000.0  # >= 1 GB/s PCM per chip (BASELINE.json north_star)


def make_audio(n_samples: int, seed: int = 0) -> np.ndarray:
    """Stereo 16-bit music-like signal: sine partials + correlated noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64)
    base = (6000 * np.sin(t * 0.01) + 3000 * np.sin(t * 0.037)
            + 1500 * np.sin(t * 0.1102))
    noise = rng.normal(0, 300, n_samples)
    left = base + noise
    right = 0.8 * base + rng.normal(0, 300, n_samples)
    pcm = np.stack([left, right]).T.reshape(-1)
    return np.clip(np.round(pcm), -32768, 32767).astype(np.int32)


def run_encode(inter: np.ndarray, total: int, opts: Options,
               batch_frames: int, analysis: str) -> float:
    buf = io.BytesIO()
    enc = BatchEncoder(buf, opts, 44100, 16, 2, total_samples=total,
                       batch_frames=batch_frames, analysis=analysis)
    t0 = time.time()
    enc.write(inter)
    enc.finalize()
    dt = time.time() - t0
    assert len(buf.getvalue()) > 0
    return dt


def main() -> None:
    opts = Options.best().no_seektable()  # preset -8: block 4096 / lpc 12 / po 6
    batch_frames = int(os.environ.get("FLAC_TPU_BENCH_BATCH", "256"))
    seconds = float(os.environ.get("FLAC_TPU_BENCH_SECONDS", "60"))
    analysis = os.environ.get("FLAC_TPU_BENCH_ANALYSIS", "f32")

    n = int(44100 * seconds)
    n -= n % opts.block_size
    inter = make_audio(n)
    pcm_mb = inter.nbytes / 2 / 1e6  # 16-bit PCM bytes

    # warmup: same config on a small slice (same batch size -> same
    # executable; the persistent cache keeps recompiles off the clock)
    warm = inter[:opts.block_size * batch_frames * 2 * 2]
    run_encode(warm, len(warm) // 2, opts, batch_frames, analysis)

    best = None
    for _ in range(int(os.environ.get("FLAC_TPU_BENCH_REPS", "2"))):
        dt = run_encode(inter, n, opts, batch_frames, analysis)
        best = dt if best is None else min(best, dt)

    mbps = pcm_mb / best
    print(json.dumps({
        "metric": "pcm_encode_mbps_preset8",
        "value": round(mbps, 1),
        "unit": "MB/s/chip",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
