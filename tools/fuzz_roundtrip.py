#!/usr/bin/env python
"""Randomized differential round-trip fuzzer.

Drives random (config, signal) pairs through the encoders and decoders
and cross-checks every path against every other:

  host mode (default):
    FlacSampleWriter -> FlacSampleReader + verify() (native bulk decode
    when available — set FLAC_TPU_NO_NATIVE=1 for the pure-Python
    decoder as the differential partner)

  device mode (--device, needs JAX; run with JAX_PLATFORMS=cpu off-TPU):
    BatchEncoder(analysis="f64")  == byte-identical ==  FlacSampleWriter
    BatchDecoder == FlacSampleReader == input

Signal classes are chosen to hit encoder decision boundaries: white
noise (verbatim-ish), sines (LPC), near-silence (constant/low rice),
step functions (FIXED + rare huge residuals -> over-long unary codes;
this class caught the 64-bit window-shift corruption fixed in
flacnat.cpp), and wasted-bits signals.

Usage:
  python tools/fuzz_roundtrip.py [--seconds N] [--seed S] [--device]

Exit code 0 = no failures.  Failures print the full config for replay.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_signal(rng, kind: str, bps: int, total: int) -> np.ndarray:
    hi = (1 << (bps - 1)) - 1
    if kind == "noise":
        pcm = rng.integers(-hi - 1, hi + 1, total)
    elif kind == "sine":
        pcm = np.round(0.7 * hi * np.sin(np.arange(total) * 0.01))
    elif kind == "quiet":
        pcm = rng.integers(-5, 6, total)
    elif kind == "steps":
        pcm = np.repeat(rng.integers(-hi - 1, hi + 1, total // 50 + 1),
                        50)[:total]
    else:  # wasted
        pcm = rng.integers(-(hi >> 4) - 1, (hi >> 4) + 1, total) << 4
    return np.asarray(pcm, dtype=np.int64)


def fuzz_host(rng, deadline: float, max_trials: int) -> int:
    from flac_codec_tpu.decode import FlacSampleReader, Verified, verify
    from flac_codec_tpu.encode import FlacSampleWriter, Options

    fails = trials = 0
    while time.time() < deadline and trials < max_trials:
        trials += 1
        bps = int(rng.choice([8, 12, 16, 20, 24, 32]))
        ch = int(rng.choice([1, 2, 2, 2, 4, 8]))
        block = int(rng.choice([16, 192, 256, 576, 1152, 4096]))
        n = int(rng.integers(1, 4)) * block + int(rng.integers(0, block))
        lpc = int(rng.choice([0, 1, 8, 12, 32]))
        po = int(rng.choice([0, 3, 6]))
        mid = bool(rng.integers(0, 2)) and ch == 2
        exh = bool(rng.integers(0, 2))
        kind = str(rng.choice(["noise", "sine", "quiet", "steps", "wasted"]))
        pcm = make_signal(rng, kind, bps, n * ch)
        cfg = (f"bps={bps} ch={ch} block={block} n={n} lpc={lpc} po={po} "
               f"mid={mid} exh={exh} kind={kind}")
        opts = (Options().with_block_size(block).no_seektable()
                .with_max_lpc_order(lpc if lpc else None)
                .with_max_partition_order(po).with_mid_side(mid)
                .fast_channel_correlation(not exh))
        try:
            buf = io.BytesIO()
            w = FlacSampleWriter(buf, opts, 44100, bps, ch, total_samples=n)
            w.write(pcm)
            w.finalize()
            data = buf.getvalue()
            got = np.asarray(
                FlacSampleReader(io.BytesIO(data)).read_to_end())
            assert np.array_equal(got, pcm), "decode mismatch"
            assert verify(io.BytesIO(data)) == Verified.MD5_MATCH
            from flac_codec_tpu.format.frame_model import rebuild_stream

            assert rebuild_stream(io.BytesIO(data)) == data, \
                "structured rebuild mismatch"
        except Exception as e:
            print(f"FAIL trial {trials}: {cfg}: {e!r}", flush=True)
            fails += 1
    print(f"host fuzz: {trials} trials, {fails} failures")
    return fails


def fuzz_device(rng, deadline: float, max_trials: int) -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    from flac_codec_tpu.decode import FlacSampleReader
    from flac_codec_tpu.encode import FlacSampleWriter, Options
    from flac_codec_tpu.parallel.batch import BatchEncoder
    from flac_codec_tpu.parallel.batch_decode import BatchDecoder

    fails = trials = 0
    # few distinct (block, bps) combos so recompiles stay bounded
    combos = [(256, 16), (256, 24), (1152, 16)]
    while time.time() < deadline and trials < max_trials:
        trials += 1
        block, bps = combos[int(rng.integers(0, len(combos)))]
        n = int(rng.integers(2, 6)) * block + int(rng.integers(0, block))
        kind = str(rng.choice(["noise", "sine", "quiet", "steps", "wasted"]))
        pcm = make_signal(rng, kind, bps, n * 2)
        cfg = f"block={block} bps={bps} n={n} kind={kind}"
        opts = Options.best().with_block_size(block).no_seektable()
        try:
            b1 = io.BytesIO()
            enc = BatchEncoder(b1, opts, 44100, bps, 2, total_samples=n,
                               batch_frames=4, analysis="f64")
            enc.write(pcm)
            enc.finalize()
            data = b1.getvalue()
            b2 = io.BytesIO()
            w = FlacSampleWriter(b2, opts, 44100, bps, 2, total_samples=n)
            w.write(pcm)
            w.finalize()
            assert data == b2.getvalue(), "f64 device/host stream parity"
            with BatchDecoder(io.BytesIO(data), batch_frames=4) as bd:
                out = np.asarray(bd.read_all_device()).reshape(-1)
            assert np.array_equal(out[: n * 2], pcm), "device decode"
            got = np.asarray(
                FlacSampleReader(io.BytesIO(data)).read_to_end())
            assert np.array_equal(got, pcm), "host decode"
        except Exception as e:
            print(f"FAIL trial {trials}: {cfg}: {e!r}", flush=True)
            fails += 1
    print(f"device fuzz: {trials} trials, {fails} failures")
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--trials", type=int, default=10 ** 9)
    ap.add_argument("--device", action="store_true",
                    help="fuzz the batch (device) pipelines instead")
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time())
    print(f"seed={seed}")
    rng = np.random.default_rng(seed)
    deadline = time.time() + args.seconds
    fn = fuzz_device if args.device else fuzz_host
    return 1 if fn(rng, deadline, args.trials) else 0


if __name__ == "__main__":
    sys.exit(main())
