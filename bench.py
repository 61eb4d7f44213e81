#!/usr/bin/env python
"""Benchmark: PCM encode throughput at preset -8 on one TPU chip.

Headline value = sustained device encode-step throughput (MB/s of PCM per
chip) for the full batched planner+packer at preset -8 (block 4096, LPC 12,
partition order 6, exhaustive stereo search, device-side Rice bit packing),
measured steady-state on device-resident batches with dependency-chained
dispatch and a hard sync — the per-chip number the production pipeline
sustains when host I/O overlaps device compute.

Secondary fields report the end-to-end file encode rate through this host's
device link.  On the benchmarking host the TPU is attached through a
network tunnel (~100 MB/s up / ~20 MB/s down, high per-transfer latency),
so end-to-end is link-bound there, not chip-bound; see BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Uses the persistent compilation cache in .jax_cache so repeat runs skip
the slow first compile.

Methodology (round 3): every device timing uses DEPENDENCY-CHAINED
dispatch (each step's input is derived from the previous step's output,
so no runtime layer can serve a cached result) and is fenced with a
SCALAR-DOWNLOAD sync (``float(x.sum())``).  ``jax.block_until_ready`` is
NOT a reliable fence through the tunneled runtime — it acks enqueue
early, which made round 2's step times measure dispatch latency instead
of execution (the recorded 230 GB/s encode step is actually ~0.16 GB/s;
see BASELINE.md "round-3 corrections").
"""

import io
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from flac_codec_tpu.encode import Options
from flac_codec_tpu.ops.encode_batch import encode_frames_plan_blob
from flac_codec_tpu.parallel.batch import BatchEncoder

BASELINE_MBPS = 1000.0  # >= 1 GB/s PCM per chip (BASELINE.json north_star)
_compression_ratio = None  # set by decode_mbps (preset -8, music-like corpus)


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


def device_step_mbps(opts: Options, batch_frames: int, analysis: str,
                     pack_budget: int, reps: int, chain: int,
                     frame_pack: bool = True) -> tuple:
    """Honest steady-state device step rate: dependency-chained dispatch
    with a scalar-download sync (see module methodology note).  With
    ``frame_pack`` (the production default) the step includes full-frame
    body serialization + the CRC-16 inner product on device."""
    N = opts.block_size
    inter = make_audio(N * batch_frames)  # returns interleaved stereo, 2x len
    pcm = inter.reshape(batch_frames, N, 2).transpose(0, 2, 1)
    pcm = np.ascontiguousarray(pcm).astype(np.int16)
    kw = dict(bits_per_sample=16, block_size=N,
              max_lpc_order=opts.max_lpc_order,
              max_partition_order=opts.max_partition_order,
              mid_side=opts.mid_side,
              exhaustive=opts.exhaustive_channel_correlation,
              analysis=analysis, pack_budget=pack_budget,
              frame_pack=frame_pack)

    @jax.jit
    def step(x):
        blob = encode_frames_plan_blob(x, **kw)
        # chain: the next input depends on this step's output, so no
        # runtime layer can serve a cached result for a repeated pair
        return x ^ (blob[:8].astype(jnp.int32).sum() & 1).astype(x.dtype)

    x = jnp.asarray(pcm)
    x = step(x)
    x = step(x)
    float(jnp.abs(x).sum())  # real fence: scalar download
    pcm_mb = batch_frames * N * 2 * 2 / 1e6  # bytes of 16-bit PCM
    best = None
    for _ in range(reps):
        t0 = time.time()
        for _ in range(chain):
            x = step(x)
        float(jnp.abs(x).sum())
        dt = (time.time() - t0) / chain
        best = dt if best is None else min(best, dt)
    return pcm_mb / best, best * 1e3


def end_to_end_mbps(opts: Options, batch_frames: int, analysis: str,
                    seconds: float) -> float:
    n = int(44100 * seconds)
    n -= n % opts.block_size
    inter = make_audio(n)
    pcm_mb = inter.nbytes / 2 / 1e6
    # warmup at the same batch size (executable + transfer-program setup)
    warm = inter[:opts.block_size * batch_frames * 2 * 2]
    buf = io.BytesIO()
    enc = BatchEncoder(buf, opts, 44100, 16, 2, total_samples=len(warm) // 2,
                       batch_frames=batch_frames, analysis=analysis)
    enc.write(warm)
    enc.finalize()
    buf = io.BytesIO()
    enc = BatchEncoder(buf, opts, 44100, 16, 2, total_samples=n,
                       batch_frames=batch_frames, analysis=analysis)
    t0 = time.time()
    enc.write(inter)
    enc.finalize()
    dt = time.time() - t0
    assert len(buf.getvalue()) > 0
    return pcm_mb / dt


def decode_mbps(opts: Options, seconds: float = 48.0) -> tuple:
    """Native host full-decode rate (per core) on a stream produced by the
    batch encoder, plus the device predict-step rate for the same shapes."""
    import jax.numpy as jnp

    from flac_codec_tpu import native
    from flac_codec_tpu.decode import Decoder

    nat = native.load()
    if nat is None:
        return None, None, None
    n = int(44100 * seconds)
    n -= n % opts.block_size
    inter = make_audio(n, seed=3)
    # host encoder on purpose: producing the stream via BatchEncoder would
    # download plan blobs, and any large device->host transfer through the
    # axon tunnel leaves ALL subsequent device dispatch ~80x slower for
    # the rest of the process (measured: a 22 us chained elementwise op
    # becomes ~2 ms after one blob download).  The host and device
    # encoders are bit-identical at matched options, so the decode
    # measurements are unaffected.
    from flac_codec_tpu.encode import FlacSampleWriter

    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts, 44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    global _compression_ratio
    _compression_ratio = len(buf.getvalue()) / (n * 4)
    pcm_mb = n * 4 / 1e6
    d = Decoder(io.BytesIO(buf.getvalue()))
    view, start = d.r.np_view(), d.r.pos
    outbuf = np.empty(n * 2, dtype=np.int32)  # reused across calls
    best = None
    for _ in range(8):  # enough reps to ride out shared-VM clock noise
        t0 = time.perf_counter()
        out, sizes, end, err = nat.decode_frames(
            view, start, 10 ** 6, 44100, 2, 16, opts.block_size, n,
            nthreads=1, out=outbuf)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    host_rate = pcm_mb / best
    # thread-scaling sweep (speculative frame-parallel decoder); flat on a
    # 1-core host, near-linear on production hosts
    sweep = {}
    ncores = os.cpu_count() or 1
    for nt in (1, 2, 4, 8, 16):
        if nt > max(2 * ncores, 2):
            break
        best_nt = None
        for _ in range(6):
            t0 = time.perf_counter()
            nat.decode_frames(view, start, 10 ** 6, 44100, 2, 16,
                              opts.block_size, n, nthreads=nt, out=outbuf)
            dt = time.perf_counter() - t0
            best_nt = dt if best_nt is None else min(best_nt, dt)
        sweep[str(nt)] = round(pcm_mb / best_nt, 1)

    # device decode step (predict + wasted-bits + decorrelation) on a real
    # parsed batch from the same preset -8 stream, in the mode the
    # BatchDecoder dispatcher picks on this backend (the Pallas VMEM
    # kernel on TPU for 16-bit-class streams, the XLA scan elsewhere);
    # four rolled input variants are cycled so no layer can serve a
    # cached result for a repeated (executable, buffer) pair
    from flac_codec_tpu.parallel.batch_decode import (BatchDecoder,
                                                      _device_reconstruct)
    from flac_codec_tpu.ops.predict_pallas import pallas_predict_ok

    bd = BatchDecoder(io.BytesIO(buf.getvalue()), batch_frames=64)
    dec2 = bd.decoder
    si2 = dec2.streaminfo
    raw = nat.parse_frames_raw(dec2.r.np_view(), dec2.r.pos, 10 ** 6,
                               si2.sample_rate, si2.channels,
                               si2.bits_per_sample, bd.block_size,
                               dec2.total_samples)
    B, C, N = raw["buf"].shape
    taps = 16
    # the gate also picks the limb mode (2 or 3) — pass it through so the
    # bench times the exact kernel BatchDecoder would dispatch (e.g. a
    # 16-bit stream quantized to shift 14/15 needs the 3-limb kernel)
    limbs = (pallas_predict_ok(raw["buf"], raw["qcoeffs"], raw["shift"],
                               raw["order"], si2.bits_per_sample, taps)
             if jax.default_backend() == "tpu" else 0)
    mode = "pallas" if limbs else "scan"
    args = [jnp.asarray(raw[k]) for k in ("qcoeffs", "shift", "order",
                                          "wasted", "assignment")]

    @jax.jit
    def step(buf):
        # honest chained step: the next input depends on this output
        # (low bit perturbation keeps the Pallas gate's domain intact)
        pcm = _device_reconstruct(buf, *args, bd.block_size, mode=mode,
                                  taps=taps, limbs=limbs or 2)
        return buf ^ (pcm.sum() & 1).astype(buf.dtype)

    x = jnp.asarray(raw["buf"])
    x = step(x)
    x = step(x)
    float(jnp.abs(x).sum())
    dev_mb = B * C * N * 2 / 1e6
    dev_best = None
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(6):
            x = step(x)
        float(jnp.abs(x).sum())
        dt = (time.perf_counter() - t0) / 6
        dev_best = dt if dev_best is None else min(dev_best, dt)
    bd.close()
    return host_rate, dev_mb / dev_best, sweep


def assemble_sweep_mbps(opts: Options):
    """Host assembler thread-scaling sweep (the production-shaped bound:
    plan blobs -> serialized frames; VERDICT r1 item 6).  Runs LAST: its
    plan-blob download degrades subsequent device dispatch (tunnel
    pathology documented in decode_mbps)."""
    import jax.numpy as jnp

    from flac_codec_tpu import native

    nat = native.load()
    if nat is None:
        return None
    ncores = os.cpu_count() or 1
    from flac_codec_tpu.ops.encode_batch import (encode_frames_plan_blob,
                                                 plan_blob_spec,
                                                 unpack_plan_blob)
    from flac_codec_tpu.parallel.batch import assemble_frames

    B = 256
    pcm_a = make_audio(opts.block_size * B).reshape(
        B, opts.block_size, 2).transpose(0, 2, 1)
    pcm_a = np.ascontiguousarray(pcm_a)
    from flac_codec_tpu import metadata as _meta

    si_a = _meta.Streaminfo(minimum_block_size=opts.block_size,
                    maximum_block_size=opts.block_size, sample_rate=44100,
                    channels=2, bits_per_sample=16,
                    total_samples=B * opts.block_size)
    asm_mb = B * opts.block_size * 4 / 1e6
    dev_in = jnp.asarray(pcm_a.astype(np.int16))

    sweeps = {}
    # residual-blob splice (legacy) vs full-frame packed splice (the
    # production default: ~10 header bytes + memcpy + CRC finish per frame)
    for name, frame_pack in (("splice", False), ("packed", True)):
        kw = dict(bits_per_sample=16, block_size=opts.block_size,
                  max_lpc_order=opts.max_lpc_order,
                  max_partition_order=opts.max_partition_order,
                  mid_side=opts.mid_side,
                  exhaustive=opts.exhaustive_channel_correlation,
                  analysis="f32", pack_budget=18, frame_pack=frame_pack)
        blob = np.asarray(encode_frames_plan_blob(dev_in, **kw))
        spec = plan_blob_spec(dev_in.shape, dev_in.dtype, **kw)
        plan = unpack_plan_blob(blob, spec)
        sweep = {}
        for nt in (1, 2, 4, 8, 16):
            if nt > max(2 * ncores, 2):
                break
            best_nt = None
            for _ in range(6):
                t0 = time.perf_counter()
                frames = assemble_frames(plan, pcm_a, si_a, 0,
                                         fallback_options=opts, nthreads=nt)
                dt = time.perf_counter() - t0
                best_nt = dt if best_nt is None else min(best_nt, dt)
            assert all(frames)
            sweep[str(nt)] = round(asm_mb / best_nt, 1)
        sweeps[name] = sweep

    return sweeps


def main() -> None:
    opts = Options.best().no_seektable()  # preset -8: block 4096 / lpc 12 / po 6
    batch_frames = int(os.environ.get("FLAC_TPU_BENCH_BATCH", "256"))
    analysis = os.environ.get("FLAC_TPU_BENCH_ANALYSIS", "f32")
    reps = int(os.environ.get("FLAC_TPU_BENCH_REPS", "3"))
    chain = int(os.environ.get("FLAC_TPU_BENCH_CHAIN", "16"))

    # ORDER MATTERS: the decode and encode device steps run before
    # end-to-end and the assembler sweep, because plan-blob downloads
    # degrade all later device dispatch in this tunneled environment
    # (see the note in decode_mbps)
    dec_host = dec_dev = dec_sweep = asm_sweep = None
    if os.environ.get("FLAC_TPU_BENCH_DECODE", "1") != "0":
        try:
            dec_host, dec_dev, dec_sweep = decode_mbps(opts)
        except Exception:
            pass

    mbps, step_ms = device_step_mbps(opts, batch_frames, analysis,
                                     pack_budget=18, reps=reps, chain=chain)

    e2e = None
    if os.environ.get("FLAC_TPU_BENCH_E2E", "1") != "0":
        try:
            e2e = end_to_end_mbps(
                opts, batch_frames, analysis,
                seconds=float(os.environ.get("FLAC_TPU_BENCH_SECONDS", "30")))
        except Exception:
            e2e = None

    if os.environ.get("FLAC_TPU_BENCH_DECODE", "1") != "0":
        try:
            asm_sweep = assemble_sweep_mbps(opts)
        except Exception:
            pass

    out = {
        "metric": "pcm_encode_mbps_preset8",
        "value": round(mbps, 1),
        "unit": "MB/s/chip",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
        "device_step_ms": round(step_ms, 3),
        "batch_frames": batch_frames,
        "note": ("honest device encode step (plan+pack), dependency-"
                 "chained with scalar-download sync; end_to_end_mbps "
                 "includes this host's tunneled device link"),
    }
    if e2e is not None:
        out["end_to_end_mbps"] = round(e2e, 1)
    if dec_host is not None:
        out["decode_host_mbps_per_core"] = round(dec_host, 1)
    if dec_dev is not None:
        out["decode_device_step_mbps"] = round(dec_dev, 1)
    if dec_sweep is not None:
        out["decode_mbps_by_threads"] = dec_sweep
    if _compression_ratio is not None:
        out["compression_ratio_preset8"] = round(_compression_ratio, 4)
    if asm_sweep is not None:
        out["assemble_mbps_by_threads"] = asm_sweep.get("splice")
        out["assemble_packed_mbps_by_threads"] = asm_sweep.get("packed")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
