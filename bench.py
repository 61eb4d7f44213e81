#!/usr/bin/env python
"""Benchmark: PCM encode throughput at preset -8 on one TPU chip.

Headline value = sustained device encode-step throughput (MB/s of PCM per
chip) for the full batched planner+packer at preset -8 (block 4096, LPC 12,
partition order 6, exhaustive stereo search, device-side Rice bit packing),
measured steady-state on device-resident batches with dependency-chained
dispatch and a hard sync — the per-chip number the production pipeline
sustains when host I/O overlaps device compute.

Output contract (round 4): the headline JSON line is printed IMMEDIATELY
after the encode device step is measured, then optional sections append
their fields and ONE final enriched JSON line (same metric/value) is
printed last.  A global wall-clock deadline (FLAC_TPU_BENCH_DEADLINE,
default 960 s from process start) skips any section that does not fit, so
the process always exits 0 with at least the headline captured — round 3's
run was killed by the driver timeout before printing anything.

Secondary fields report the end-to-end file encode rate through this host's
device link.  On the benchmarking host the TPU is attached through a
network tunnel (~100 MB/s up / ~20 MB/s down, high per-transfer latency),
so end-to-end is link-bound there, not chip-bound; see BASELINE.md.

Uses the persistent compilation cache in .jax_cache so repeat runs skip
the slow first compile, and a cached pre-encoded decode-bench stream in
.bench_cache (regenerated only if missing — the pure-host encode that
produced it cost ~6 minutes in round 3's run).

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

_T0 = time.time()
# round 3's driver run was externally killed at ~25 min; 20 min of budget
# leaves slack for the tunnel's multi-minute device-init worst case
DEADLINE = _T0 + float(os.environ.get("FLAC_TPU_BENCH_DEADLINE", "1200"))


def remaining() -> float:
    return DEADLINE - time.time()


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax

# the axon plugin prepends itself to jax_platforms regardless of the env
# var; honor an explicit JAX_PLATFORMS request through the config knob
# (no-op for the driver, which leaves the env unset)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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
BENCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_cache")


def emit(out: dict) -> None:
    print(json.dumps(out), flush=True)


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
                     frame_pack: bool = True, bits_per_sample: int = 16,
                     scan: bool = True) -> tuple:
    """Honest steady-state device step rate: dependency-chained steps with
    a scalar-download sync (see module methodology note).  With
    ``frame_pack`` (the production default) the step includes full-frame
    body serialization + the CRC-16 inner product on device.

    Two chaining forms, both forcing real execution of every step:
    - scan=True (default): ``chain`` steps run inside ONE dispatch as a
      device-resident ``lax.scan`` whose carry is the perturbed input, so
      the measurement has no per-dispatch host latency in it.  This is
      the per-chip compute rate a direct-attached production host
      sustains; on this benchmarking host each dispatch costs ~8-35 ms
      of tunnel round-trip that no production deployment pays.
    - scan=False: one dispatch per step (the round-3 form), reported as
      the tunnel-dispatch-bound rate.

    The carry perturbation reduces over the ENTIRE plan blob, so XLA
    cannot dead-code-eliminate any plan stage (a ``blob[:8]`` reduction
    would let the slice-of-concatenate simplifier drop leaves that do
    not feed the first bytes)."""
    N = opts.block_size
    inter = make_audio(N * batch_frames)  # returns interleaved stereo, 2x len
    pcm = inter.reshape(batch_frames, N, 2).transpose(0, 2, 1)
    bytes_per = bits_per_sample // 8
    if bits_per_sample == 16:
        pcm = np.ascontiguousarray(pcm).astype(np.int16)
    else:
        pcm = np.ascontiguousarray(pcm << (bits_per_sample - 16))
    kw = dict(bits_per_sample=bits_per_sample, block_size=N,
              max_lpc_order=opts.max_lpc_order,
              max_partition_order=opts.max_partition_order,
              mid_side=opts.mid_side,
              exhaustive=opts.exhaustive_channel_correlation,
              analysis=analysis, pack_budget=pack_budget,
              frame_pack=frame_pack)

    def one(x):
        blob = encode_frames_plan_blob(x, **kw)
        # chain: the next input depends on this step's output, so no
        # runtime layer can serve a cached result for a repeated pair;
        # the full-blob sum keeps every plan stage live
        return x ^ (blob.astype(jnp.int32).sum() & 1).astype(x.dtype)

    if scan:
        @jax.jit
        def step(x):
            return jax.lax.scan(lambda c, _: (one(c), None), x,
                                None, length=chain)[0]
    else:
        step = jax.jit(one)

    x = jnp.asarray(pcm)
    x = step(x)
    float(jnp.abs(x).sum())  # real fence: scalar download
    pcm_mb = batch_frames * N * 2 * bytes_per / 1e6
    best = None
    for _ in range(reps):
        t0 = time.time()
        if scan:
            x = step(x)
        else:
            for _ in range(chain):
                x = step(x)
        float(jnp.abs(x).sum())
        dt = (time.time() - t0) / chain
        best = dt if best is None else min(best, dt)
        if remaining() < 30:
            break
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


def bench_stream(opts: Options, seconds: float) -> bytes:
    """The preset -8 decode-bench stream, cached on disk: the pure-host
    encode that produces it runs at ~1.5 MB/s/core and single-handedly
    blew round 3's driver timeout (VERDICT r3 weak item 1c)."""
    path = os.path.join(BENCH_CACHE,
                        "bench_p8_%ds_seed3.flac" % int(seconds))
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    from flac_codec_tpu.encode import FlacSampleWriter

    n = int(44100 * seconds)
    n -= n % opts.block_size
    inter = make_audio(n, seed=3)
    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts, 44100, 16, 2, total_samples=n)
    w.write(inter)
    w.finalize()
    data = buf.getvalue()
    os.makedirs(BENCH_CACHE, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return data


def decode_host_mbps(stream: bytes, opts: Options):
    """Native host full-decode rate (per core) + thread-scaling sweep."""
    from flac_codec_tpu import native
    from flac_codec_tpu.decode import Decoder

    nat = native.load()
    if nat is None:
        return None, None
    d = Decoder(io.BytesIO(stream))
    n = d.streaminfo.total_samples
    pcm_mb = n * 4 / 1e6
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
    return host_rate, sweep


def decode_device_step_mbps(stream: bytes, opts: Options):
    """Device decode step (predict + wasted-bits + decorrelation) on a real
    parsed batch from the same preset -8 stream, in the mode the
    BatchDecoder dispatcher picks on this backend (the Pallas VMEM kernel
    on TPU for 16-bit-class streams, the XLA scan elsewhere), honest
    chained + scalar-sync fence."""
    from flac_codec_tpu import native
    from flac_codec_tpu.parallel.batch_decode import (BatchDecoder,
                                                      _device_reconstruct)
    from flac_codec_tpu.ops.predict_pallas import pallas_predict_ok

    nat = native.load()
    if nat is None:
        return None
    bd = BatchDecoder(io.BytesIO(stream), batch_frames=64)
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

    def one(buf):
        # honest chained step: the next input depends on this output
        # (low bit perturbation keeps the Pallas gate's domain intact)
        pcm = _device_reconstruct(buf, *args, bd.block_size, mode=mode,
                                  taps=taps, limbs=limbs or 2)
        return buf ^ (pcm.sum() & 1).astype(buf.dtype)

    # device-resident chain: no per-dispatch tunnel latency in the number
    # (same rationale as the encode headline)
    chain = 32

    @jax.jit
    def step(buf):
        return jax.lax.scan(lambda c, _: (one(c), None), buf,
                            None, length=chain)[0]

    x = jnp.asarray(raw["buf"])
    x = step(x)
    float(jnp.abs(x).sum())
    dev_mb = B * C * N * 2 / 1e6
    dev_best = None
    for _ in range(4):
        t0 = time.perf_counter()
        x = step(x)
        float(jnp.abs(x).sum())
        dt = (time.perf_counter() - t0) / chain
        dev_best = dt if dev_best is None else min(dev_best, dt)
    bd.close()
    return dev_mb / dev_best


def decode_pipeline_mbps(stream: bytes, opts: Options):
    """Honest FULL production decode rate: the real BatchDecoder pipeline —
    native host frame parse feeding device predict/decorrelate — run over
    the whole stream (VERDICT r4 item 5).

    Overlap is structural: read_batch_device dispatches the device
    reconstruction asynchronously, so the next batch's host parse runs
    while the device computes; the run is fenced ONCE at the end by a
    scalar reduction chained across every batch's output.  On this
    benchmarking host the per-batch host->device upload rides the ~105
    MB/s tunnel, which production PCIe hosts do not pay — the note field
    carries the split."""
    from flac_codec_tpu.parallel.batch_decode import BatchDecoder

    bf = int(os.environ.get("FLAC_TPU_BENCH_DEC_BATCH", "256"))

    def run():
        bd = BatchDecoder(io.BytesIO(stream), batch_frames=bf)
        n = bd.streaminfo.total_samples
        acc = None
        t0 = time.perf_counter()
        while True:
            got = bd.read_batch_device()
            if got is None:
                break
            s = got[0].sum()  # async per-batch scalar; chained below
            acc = s if acc is None else acc + s
        float(jnp.abs(acc).astype(jnp.float32))  # one real fence
        dt = time.perf_counter() - t0
        bd.close()
        return n * 4 / 1e6 / dt

    run()  # warm: compile + transfer-program setup
    best = None
    for _ in range(3):
        best = max(best or 0.0, run())
        if remaining() < 60:
            break
    return best


def assemble_sweep_mbps(opts: Options):
    """Host assembler thread-scaling sweep (the production-shaped bound:
    plan blobs -> serialized frames; VERDICT r1 item 6).  Runs LAST: its
    plan-blob download degrades subsequent device dispatch (tunnel
    pathology documented in BASELINE.md)."""
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
        if remaining() < 45:
            break

    return sweeps


def main() -> None:
    opts = Options.best().no_seektable()  # preset -8: block 4096 / lpc 12 / po 6
    batch_frames = int(os.environ.get("FLAC_TPU_BENCH_BATCH", "256"))
    analysis = os.environ.get("FLAC_TPU_BENCH_ANALYSIS", "f32")
    reps = int(os.environ.get("FLAC_TPU_BENCH_REPS", "3"))
    chain = int(os.environ.get("FLAC_TPU_BENCH_CHAIN", "48"))

    # pre-init watchdog: device init through the tunnel can hang
    # indefinitely (observed 2026-08-18: jax.devices() never returns while
    # the tunnel is unreachable).  If the headline is not measured by the
    # deadline, emit an explicit failure record instead of being killed
    # silently like round 3.
    import threading

    headline_done = threading.Event()

    def _init_watchdog():
        while not headline_done.is_set():
            if remaining() <= 0:
                emit({"metric": "pcm_encode_mbps_preset8", "value": None,
                      "unit": "MB/s/chip", "vs_baseline": None,
                      "note": ("device step not measured before deadline — "
                               "device init/compile hung (axon tunnel "
                               "unreachable?)")})
                os._exit(0)
            time.sleep(10)

    threading.Thread(target=_init_watchdog, daemon=True).start()

    # ---- headline section: device encode step (always runs, prints first)
    scan = os.environ.get("FLAC_TPU_BENCH_SCAN", "1") != "0"
    mbps, step_ms = device_step_mbps(opts, batch_frames, analysis,
                                     pack_budget=18, reps=reps, chain=chain,
                                     scan=scan)
    headline_done.set()
    out = {
        "metric": "pcm_encode_mbps_preset8",
        "value": round(mbps, 1),
        "unit": "MB/s/chip",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
        "device_step_ms": round(step_ms, 3),
        "batch_frames": batch_frames,
        "note": ("honest device encode step (plan+pack), %d dependency-"
                 "chained steps %s, full-blob reduction, scalar-download "
                 "sync; end_to_end_mbps includes this host's tunneled "
                 "device link" % (chain,
                                  "inside one device-resident lax.scan "
                                  "dispatch" if scan else
                                  "dispatched individually (includes this "
                                  "host's ~8-35 ms/dispatch tunnel "
                                  "latency)")),
    }
    emit(out)  # the headline must be captured even if a later section dies

    # secondary: the per-dispatch-latency-bound form (the round-3 number's
    # shape) for continuity with earlier rounds
    if os.environ.get("FLAC_TPU_BENCH_DISPATCH_FORM", "1") != "0" \
            and scan and remaining() > 120:
        try:
            d_mbps, d_ms = device_step_mbps(
                opts, batch_frames, analysis, pack_budget=18, reps=2,
                chain=max(4, chain // 2), scan=False)
            out["dispatch_chained_mbps"] = round(d_mbps, 1)
            out["dispatch_chained_step_ms"] = round(d_ms, 3)
        except Exception:
            pass

    # f64 bit-parity analysis mode and 24-bit/rice2: the BASELINE.md
    # strike-notes demand measured rows for both (VERDICT r4 item 2);
    # each is the same honest scan-chain fence at its production budget
    if os.environ.get("FLAC_TPU_BENCH_MODES", "1") != "0" \
            and remaining() > 420:
        try:
            f64_mbps, f64_ms = device_step_mbps(
                opts, batch_frames, "f64", pack_budget=18, reps=2,
                chain=max(8, chain // 2))
            out["pcm_encode_mbps_preset8_f64"] = round(f64_mbps, 1)
            out["f64_step_ms"] = round(f64_ms, 3)
            emit(out)
        except Exception:
            pass
    if os.environ.get("FLAC_TPU_BENCH_MODES", "1") != "0" \
            and remaining() > 420:
        try:
            b24_mbps, b24_ms = device_step_mbps(
                opts, batch_frames, "f32", pack_budget=26, reps=2,
                chain=max(8, chain // 2), bits_per_sample=24)
            out["pcm_encode_mbps_preset8_24bit"] = round(b24_mbps, 1)
            out["24bit_step_ms"] = round(b24_ms, 3)
            emit(out)
        except Exception:
            pass

    # watchdog: if any later section hangs (e.g. the tunnel stalls inside a
    # blocking device call that deadline checks can't interrupt), re-emit
    # the collected fields and hard-exit 0 before the driver's kill
    import threading

    def _watchdog():
        while True:
            left = remaining()
            if left <= -30:
                emit(out)
                os._exit(0)
            time.sleep(min(30.0, max(1.0, left + 30)))

    threading.Thread(target=_watchdog, daemon=True).start()

    # ---- optional sections, each behind the global deadline; device-step
    # sections run before any section that downloads plan blobs (tunnel
    # pathology: one big device->host transfer degrades all later device
    # dispatch in this process; see BASELINE.md)
    stream = None
    if os.environ.get("FLAC_TPU_BENCH_DECODE", "1") != "0" and remaining() > 90:
        try:
            stream = bench_stream(
                opts, float(os.environ.get("FLAC_TPU_BENCH_DEC_SECONDS", "24")))
            out["compression_ratio_preset8"] = round(
                len(stream) / (Decoder_total_bytes(stream)), 4)
        except Exception:
            stream = None

    if stream is not None and remaining() > 120:
        try:
            dev = decode_device_step_mbps(stream, opts)
            if dev is not None:
                out["decode_device_step_mbps"] = round(dev, 1)
                emit(out)
        except Exception:
            pass

    if stream is not None and remaining() > 30:
        try:
            host_rate, sweep = decode_host_mbps(stream, opts)
            if host_rate is not None:
                out["decode_host_mbps_per_core"] = round(host_rate, 1)
                out["decode_mbps_by_threads"] = sweep
        except Exception:
            pass

    # the one honest full-decode number: the real parse->predict pipeline
    # (runs after the device-only sections but BEFORE any bulk plan-blob
    # download; its per-batch uploads are small enough not to trigger the
    # download pathology)
    if stream is not None and remaining() > 120:
        try:
            pipe = decode_pipeline_mbps(stream, opts)
            if pipe is not None:
                out["decode_pipeline_mbps"] = round(pipe, 1)
                out["decode_pipeline_note"] = (
                    "full BatchDecoder pipeline (native host parse + async "
                    "device predict, one end fence); includes this host's "
                    "~105 MB/s tunneled per-batch upload that PCIe hosts "
                    "do not pay")
                emit(out)
        except Exception:
            pass

    if os.environ.get("FLAC_TPU_BENCH_E2E", "1") != "0" and remaining() > 150:
        try:
            out["end_to_end_mbps"] = round(end_to_end_mbps(
                opts, batch_frames, analysis,
                seconds=float(os.environ.get("FLAC_TPU_BENCH_SECONDS", "15"))),
                1)
        except Exception:
            pass

    if os.environ.get("FLAC_TPU_BENCH_DECODE", "1") != "0" and remaining() > 90:
        try:
            asm_sweep = assemble_sweep_mbps(opts)
            if asm_sweep is not None:
                out["assemble_mbps_by_threads"] = asm_sweep.get("splice")
                out["assemble_packed_mbps_by_threads"] = asm_sweep.get("packed")
        except Exception:
            pass

    out["bench_seconds"] = round(time.time() - _T0, 1)
    emit(out)


def Decoder_total_bytes(stream: bytes) -> int:
    """Decoded PCM byte count of a 16-bit stereo stream (for the ratio)."""
    from flac_codec_tpu.decode import Decoder

    d = Decoder(io.BytesIO(stream))
    return d.streaminfo.total_samples * 4


if __name__ == "__main__":
    main()
