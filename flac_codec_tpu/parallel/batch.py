"""Batch encode pipeline: device plans -> FLAC bits.

``BatchEncoder`` slices PCM into equal-shaped frames, runs the device
planner (`ops.encode_frames_plan`) on batches — optionally sharded over a
mesh — and assembles the resulting plans into FLAC frames on host via the
native bit-packing engine.  Output is bit-identical to the sequential host
encoder at matched parameters (pinned in tests/test_device_ops.py).

This is the TPU replacement for the reference's frame-at-a-time loop
(reference: src/encode.rs:366-385) — SURVEY §2.7's "frame-level batching is
the biggest untapped parallelism axis".
"""

from __future__ import annotations

import hashlib
import os
from typing import BinaryIO, List, Optional

import numpy as np

import jax

from .. import metadata as meta
from ..bitio import BitWriter
from ..byteorder import deinterleave, samples_to_bytes
from ..crc import crc16
from ..encode import (
    Encoder,
    EncoderOptions,
    EncoderSeekPoint,
    Options,
    encode_frame,
)
from ..format.frame import ChannelAssignment, FrameHeader
from ..format.subframe import SubframeHeader
from ..ops.encode_batch import (
    TYPE_CONSTANT,
    TYPE_FIXED,
    TYPE_LPC,
    TYPE_VERBATIM,
    encode_frames_plan,
    encode_frames_plan_blob,
    plan_blob_spec,
    unpack_plan_blob,
)
from ..utils import trace
from .mesh import batch_mesh, shard_batch

KIND_RICE = 0
KIND_ESCAPE = 1
KIND_CONSTANT = 2

# assignment code -> (source idx ch0, source idx ch1) into [L, R, M, S]
_SRC = {0b0001: (0, 1), 0b1000: (0, 3), 0b1001: (3, 1), 0b1010: (2, 3)}


def _candidate_channels(pcm: np.ndarray) -> np.ndarray:
    """(B, 2, N) -> (B, 4, N) int64 [L, R, M, S] (host mirror of
    ops.decorrelate.candidates)."""
    x = pcm.astype(np.int64)
    left, right = x[:, 0], x[:, 1]
    return np.stack([left, right, (left + right) >> 1, left - right], axis=1)


def _write_subframe_from_plan(w: BitWriter, ch_plan: dict, b: int,
                              xs: np.ndarray, bps: int, block_size: int
                              ) -> None:
    """Serialize one planned subframe.  ``xs`` is the wasted-shifted
    channel; ``bps`` the original (pre-wasted) bits per sample."""
    stype = int(ch_plan["sub_type"][b])
    wasted = int(ch_plan["wasted"][b])
    bps_eff = bps - wasted

    if stype == TYPE_CONSTANT:
        SubframeHeader("constant", 0, 0).write(w)
        w.write_signed(int(xs[0] << wasted), bps)
        return
    if stype == TYPE_VERBATIM:
        SubframeHeader("verbatim", 0, wasted).write(w)
        w.write_signed_array(xs, bps_eff)
        return

    order = int(ch_plan["order"][b])
    if stype == TYPE_FIXED:
        SubframeHeader("fixed", order, wasted).write(w)
        w.write_signed_array(xs[:order], bps_eff)
    else:
        precision = int(ch_plan["precision"][b])
        SubframeHeader("lpc", order, wasted).write(w)
        w.write_signed_array(xs[:order], bps_eff)
        w.write(precision - 1, 4)
        w.write_signed(int(ch_plan["shift"][b]), 5)
        w.write_signed_array(ch_plan["qcoeffs"][b, :order], precision)

    # residual section
    rice_bits = int(ch_plan["rice_bits"][b])
    po = int(ch_plan["po"][b])
    count = 1 << po
    part_len = block_size // count
    res_seq = ch_plan["residuals"][b, order:]
    kinds = ch_plan["kinds"][b]
    params = ch_plan["params"][b]
    escape_code = (1 << rice_bits) - 1

    w.write(0 if rice_bits == 4 else 1, 2)
    w.write(po, 4)
    pos = 0
    for p in range(count):
        n = part_len - order if p == 0 else part_len
        k = int(params[p])
        kind = int(kinds[p])
        values = res_seq[pos:pos + n]
        pos += n
        if kind == KIND_RICE:
            w.write(k, rice_bits)
            w.write_rice_array(values, k)
        elif kind == KIND_ESCAPE:
            w.write(escape_code, rice_bits)
            w.write(k, 5)
            w.write_signed_array(values, k)
        else:
            w.write(escape_code, rice_bits)
            w.write(0, 5)


def assemble_frames(plan: dict, pcm: np.ndarray, streaminfo: meta.Streaminfo,
                    first_frame_number: int,
                    fallback_options=None, nthreads: int = 0) -> List[bytes]:
    """Turn a device plan + PCM batch into serialized FLAC frames.

    Uses the native C++ batch assembler (one call per batch, thread pool
    over frames) when available; falls back to the pure-Python writer.
    """
    from .. import native

    plan = jax.tree_util.tree_map(np.asarray, plan)
    # trim any tail-batch padding (plans are dispatched at a fixed size);
    # packed_words/packed_meta are global (not batch-major) and stay whole
    B = pcm.shape[0]
    plan = dict(plan)
    if "frame_words" in plan:  # per-frame slots are batch-major
        W = plan["frame_words"].shape[0] // plan["assignment"].shape[0]
        plan["frame_words"] = plan["frame_words"][:B * W]
        for key in ("body_bits", "inner_crc", "frame_fallback"):
            plan[key] = plan[key][:B]
    plan["assignment"] = plan["assignment"][:B]
    if "channels" in plan:  # absent from slim frame-packed plans
        plan["channels"] = [{k: v[:B] for k, v in ch.items()}
                            for ch in plan["channels"]]
    nat = native.load()
    if nat is not None:
        if "frame_words" in plan:
            return _assemble_frames_packed(nat, plan, pcm, streaminfo,
                                           first_frame_number,
                                           fallback_options,
                                           nthreads=nthreads)
        return _assemble_frames_native(nat, plan, pcm, streaminfo,
                                       first_frame_number, fallback_options,
                                       nthreads=nthreads)
    if "packed_words" in plan or "frame_words" in plan:
        raise RuntimeError("device-packed plans need the native assembler")
    return _assemble_frames_python(plan, pcm, streaminfo, first_frame_number)


def _assemble_frames_packed(nat, plan: dict, pcm: np.ndarray,
                            streaminfo: meta.Streaminfo,
                            first_frame_number: int,
                            fallback_options=None,
                            nthreads: int = 0) -> List[bytes]:
    """Frame-packed plans (ops/framepack.py): the device serialized every
    frame's complete body; the host writes headers + memcpy + CRC finish."""
    B, C, N = pcm.shape
    W = plan["frame_words"].shape[0] // B
    # native-endian words straight from the device; the assembler fuses
    # the MSB-first byte swap into its per-frame copy (a numpy .astype
    # byteswap pass here measured ~25% of packed assembly)
    words = np.ascontiguousarray(plan["frame_words"], dtype=np.uint32)
    blob = words.view(np.uint8)
    fallback = np.ascontiguousarray(plan["frame_fallback"], dtype=np.uint8)
    frames = nat.assemble_packed(
        N=N, bps_base=streaminfo.bits_per_sample,
        sample_rate=streaminfo.sample_rate,
        first_frame_number=first_frame_number,
        assignment=np.ascontiguousarray(plan["assignment"], dtype=np.uint8),
        blob=blob, slot_bytes=W * 4,
        body_bits=np.ascontiguousarray(plan["body_bits"], dtype=np.uint64),
        inner_crc=np.ascontiguousarray(plan["inner_crc"], dtype=np.uint16),
        fallback=fallback, nthreads=nthreads)
    redo = np.array([f is None for f in frames], dtype=bool)
    if redo.any():
        assert fallback_options is not None, \
            "packed assembly needs fallback_options for fallback frames"
        for b in np.nonzero(redo)[0]:
            frames[b] = encode_frame(
                fallback_options, streaminfo, first_frame_number + int(b),
                [pcm[b, c].astype(np.int64) for c in range(pcm.shape[1])])
    return frames


def _assemble_frames_native(nat, plan: dict, pcm: np.ndarray,
                            streaminfo: meta.Streaminfo,
                            first_frame_number: int,
                            fallback_options=None,
                            nthreads: int = 0) -> List[bytes]:
    B, C, N = pcm.shape
    chans_plans = plan["channels"]
    S = len(chans_plans)
    assignment = np.ascontiguousarray(plan["assignment"], dtype=np.uint8)
    wasted = np.ascontiguousarray(
        np.stack([p["wasted"] for p in chans_plans]), dtype=np.uint8)

    packed = "packed_words" in plan
    if packed and all("warmup" in p for p in chans_plans):
        # residual sections ride in device-packed blobs, so the host only
        # needs the warm-up samples (already in the plan) — skip the
        # O(B*N) candidate-channel materialization entirely
        xs = np.ascontiguousarray(
            np.stack([p["warmup"] for p in chans_plans]), dtype=np.int32)
        chan_stride = xs.shape[-1]
    elif C == 2 and S == 2:
        cands = _candidate_channels(pcm)  # (B, 4, N) int64
        srcs = np.array(
            [[_SRC.get(int(a), (0, 1))[s] for a in assignment]
             for s in range(2)])  # (2, B)
        chans = cands[np.arange(B)[None, :], srcs]  # (2, B, N) int64
        xs = (chans >> wasted[:, :, None].astype(np.int64)).astype(np.int32)
        xs = np.ascontiguousarray(xs)
        chan_stride = N
    else:
        chans = pcm.transpose(1, 0, 2).astype(np.int64)
        xs = (chans >> wasted[:, :, None].astype(np.int64)).astype(np.int32)
        xs = np.ascontiguousarray(xs)
        chan_stride = N

    def stk(key, dtype):
        return np.ascontiguousarray(
            np.stack([p[key] for p in chans_plans]), dtype=dtype)

    kwargs = {}
    if "packed_words" in plan:
        # device-packed residual blobs: words -> MSB-first byte stream
        S_, per_sub_words = (int(plan["packed_meta"][0]),
                             int(plan["packed_meta"][1]))
        words = plan["packed_words"].astype(">u4")  # big-endian = bit order
        blobs = np.ascontiguousarray(words).view(np.uint8)
        starts = np.empty((S, B), dtype=np.uint64)
        for s in range(S):
            starts[s] = (np.arange(B, dtype=np.uint64) * S_ + s) \
                * per_sub_words * 32
        kwargs = dict(
            blobs=blobs,
            blob_start_bits=np.ascontiguousarray(starts),
            blob_bits=np.ascontiguousarray(stk("res_bits", np.uint64)),
        )
        residuals = np.zeros((1,), dtype=np.int32)
    else:
        residuals = stk("residuals", np.int32)

    frames = nat.assemble_batch(
        N=N, bps_base=streaminfo.bits_per_sample,
        sample_rate=streaminfo.sample_rate,
        first_frame_number=first_frame_number,
        assignment=assignment,
        sub_type=stk("sub_type", np.uint8),
        wasted=wasted,
        order=stk("order", np.uint8),
        precision=stk("precision", np.uint8),
        shift=stk("shift", np.int8),
        qcoeffs=stk("qcoeffs", np.int32),
        po=stk("po", np.uint8),
        rice_bits=stk("rice_bits", np.uint8),
        kinds=stk("kinds", np.uint8),
        params=stk("params", np.int32),
        residuals=residuals,
        channels=xs,
        chan_stride=chan_stride,
        nthreads=nthreads,
        **kwargs,
    )

    # frames the native core could not finish: blob overflowed its budget
    # (impossible at the default bps+2 budget), a verbatim subframe met
    # warm-up-only channel data, or a frame number past the 36-bit varint.
    # Re-encode those on host — bit-identical by the parity invariant, and
    # the host path raises precise errors for genuinely invalid frames.
    redo = np.array([f is None for f in frames], dtype=bool)
    if "packed_words" in plan:
        for p in chans_plans:
            redo |= np.asarray(p["res_overflow"])
    if redo.any():
        assert fallback_options is not None, \
            "native assembly needs fallback_options for fallback frames"
        for b in np.nonzero(redo)[0]:
            frames[b] = encode_frame(
                fallback_options, streaminfo, first_frame_number + int(b),
                [pcm[b, c].astype(np.int64)
                 for c in range(pcm.shape[1])])
    return frames


def _assemble_frames_python(plan: dict, pcm: np.ndarray,
                            streaminfo: meta.Streaminfo,
                            first_frame_number: int) -> List[bytes]:
    B, C, N = pcm.shape
    bps = streaminfo.bits_per_sample

    stereo_correlated = C == 2 and any(
        int(a) in _SRC and int(a) != 0b0001 for a in plan["assignment"])
    cands = _candidate_channels(pcm) if C == 2 else None

    out: List[bytes] = []
    for b in range(B):
        assignment = int(plan["assignment"][b])
        w = BitWriter()
        FrameHeader(
            blocking_strategy=False,
            block_size=N,
            sample_rate=streaminfo.sample_rate,
            channel_assignment=assignment,
            bits_per_sample=bps,
            frame_number=first_frame_number + b,
        ).write(w)

        if C == 2 and assignment in _SRC:
            srcs = _SRC[assignment]
            for slot in range(2):
                ch_plan = plan["channels"][slot]
                src = srcs[slot]
                ch_bps = bps + (1 if src == 3 else 0)
                x = cands[b, src]
                xs = x >> int(ch_plan["wasted"][b])
                _write_subframe_from_plan(w, ch_plan, b, xs, ch_bps, N)
        else:
            for c in range(C):
                ch_plan = plan["channels"][c]
                x = pcm[b, c].astype(np.int64)
                xs = x >> int(ch_plan["wasted"][b])
                _write_subframe_from_plan(w, ch_plan, b, xs, bps, N)

        w.byte_align()
        body = w.getvalue()
        out.append(body + crc16(body).to_bytes(2, "big"))
    return out


class BatchEncoder:
    """Full-file batch encoder: device planning + host assembly.

    Mirrors ``FlacSampleWriter``'s output exactly, but evaluates the
    candidate search for ``batch_frames`` frames at once on the device
    (sharded over ``mesh`` when given).
    """

    def __init__(self, fp_or_path, options: Options, sample_rate: int,
                 bits_per_sample: int, channels: int,
                 total_samples: Optional[int] = None,
                 batch_frames: int = 64, mesh=None, analysis: str = "auto",
                 pack_budget: Optional[int] = None,
                 frame_pack: Optional[bool] = None):
        # exact int64 residual math needs x64 even in f32-analysis mode
        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        self.analysis = analysis
        # device-side residual packing budget (bits/sample); 0 disables.
        # Default bps+2 can never overflow: a FIXED/LPC subframe is only
        # selected when its total (incl. residual section) beats verbatim
        # (bps_eff bits/sample), so its residual section is < bps*N bits.
        # Packing needs the native assembler for blob splicing.
        from .. import native as _native_mod

        if pack_budget is None:
            pack_budget = bits_per_sample + 2
        self.pack_budget = pack_budget if _native_mod.load() is not None else 0
        # frame_pack: serialize WHOLE frame bodies on device (subframe
        # headers + warm-ups + LPC params + residuals + CRC-16 inner
        # product) so host assembly degenerates to header-write + memcpy.
        # Default on whenever packing is available.
        self.frame_pack = bool(self.pack_budget) if frame_pack is None \
            else (frame_pack and bool(self.pack_budget))
        if isinstance(fp_or_path, (str, bytes)):
            from ..encode import _create_file

            fp_or_path = _create_file(fp_or_path, options)
            self._owns_fp = True
        else:
            self._owns_fp = False
        self.encoder = Encoder(fp_or_path, options, sample_rate,
                               bits_per_sample, channels, total_samples)
        self.options = options
        self.batch_frames = batch_frames
        self.mesh = mesh
        self._buf = np.empty(0, dtype=np.int32)
        self._block = options.block_size
        self._chans = channels
        self._specs: dict = {}
        self._async_copy = os.environ.get(
            "FLAC_TPU_NO_ASYNC_COPY", "").lower() not in ("1", "true", "yes")
        # in-flight (device plan, host pcm, raw chunk) awaiting assembly —
        # lets device planning of batch k+1 overlap host assembly of batch k
        self._pending: List = []
        # optional jax.profiler capture for this pipeline's lifetime
        # (FLAC_TPU_PROFILE_DIR; no-op otherwise)
        self._profiler = trace.profiler_session("batch-encode")
        self._profiler.__enter__()

    def write(self, samples) -> None:
        samples = np.asarray(samples, dtype=np.int32)
        self._buf = np.concatenate([self._buf, samples])
        frame_len = self._block * self._chans
        batch_len = frame_len * self.batch_frames
        while len(self._buf) >= batch_len:
            chunk, self._buf = self._buf[:batch_len], self._buf[batch_len:]
            self._dispatch_batch(chunk)
            while len(self._pending) > 1:
                self._drain_one()

    def _dispatch_batch(self, chunk: np.ndarray) -> None:
        """Launch the (async) device planning for one batch of frames."""
        frame_len = self._block * self._chans
        B = len(chunk) // frame_len
        pcm = chunk.reshape(B, self._block, self._chans).transpose(0, 2, 1)
        pcm = np.ascontiguousarray(pcm)

        # pad ragged tail batches to the steady-state size so XLA compiles
        # exactly one executable per configuration
        dev_pcm = pcm
        if B < self.batch_frames:
            dev_pcm = np.concatenate(
                [pcm, np.zeros((self.batch_frames - B, self._chans,
                                self._block), np.int32)])
        if self.encoder.streaminfo.bits_per_sample <= 16:
            dev_pcm = dev_pcm.astype(np.int16)
        if self.mesh is not None:
            dev_pcm = shard_batch(self.mesh, dev_pcm)
        o = self.options
        kw = dict(
            bits_per_sample=self.encoder.streaminfo.bits_per_sample,
            block_size=self._block,
            max_lpc_order=o.max_lpc_order,
            max_partition_order=o.max_partition_order,
            mid_side=o.mid_side,
            exhaustive=o.exhaustive_channel_correlation,
            window_kind=o.window if not isinstance(o.window, list)
            else tuple(o.window),
            analysis=self.analysis,
            pack_budget=self.pack_budget,
            frame_pack=self.frame_pack,
            # frame-packed assembly reads only 5 plan leaves; the slim
            # blob drops the per-channel tree from every download
            slim=self.frame_pack,
        )
        # single-blob plan: ONE device->host transfer per batch (a plan
        # dict has ~25 leaves; per-leaf DMAs pay a full RPC round trip
        # each on tunneled hosts), started async right after dispatch so
        # download overlaps planning of the next batch
        key = (dev_pcm.shape, str(dev_pcm.dtype))
        if key not in self._specs:
            self._specs[key] = plan_blob_spec(dev_pcm.shape, dev_pcm.dtype,
                                              **kw)
        with trace.stage("encode.dispatch", frames=B):
            blob = encode_frames_plan_blob(dev_pcm, **kw)
            if self._async_copy:
                try:
                    blob.copy_to_host_async()
                except AttributeError:  # non-jax array types in tests
                    pass
        self._pending.append(((blob, self._specs[key]), pcm, chunk))

    def _drain_one(self) -> None:
        """Assemble and emit the oldest in-flight batch (in order)."""
        enc = self.encoder
        (blob, spec), pcm, chunk = self._pending.pop(0)
        with trace.stage("encode.download", frames=pcm.shape[0]):
            host_blob = np.asarray(blob)
        plan = unpack_plan_blob(host_blob, spec)
        with trace.stage("encode.md5"):
            enc.md5.update(
                samples_to_bytes(chunk, enc.streaminfo.bits_per_sample))
        with trace.stage("encode.assemble", frames=pcm.shape[0]):
            frames = assemble_frames(plan, pcm, enc.streaminfo,
                                     enc.frame_number,
                                     fallback_options=enc.options)
        si = enc.streaminfo
        for data in frames:
            enc.seekpoints.append(EncoderSeekPoint(
                enc.samples_written, enc.frame_bytes_written, self._block))
            enc.fp.write(data)
            enc.frame_bytes_written += len(data)
            enc.samples_written += self._block
            enc.frame_number += 1
            size = len(data)
            if 0 < size < meta.Streaminfo.MAX_FRAME_SIZE:
                si.minimum_frame_size = (size if si.minimum_frame_size is None
                                         else min(si.minimum_frame_size, size))
                si.maximum_frame_size = (size if si.maximum_frame_size is None
                                         else max(si.maximum_frame_size, size))

    def finalize(self) -> None:
        enc = self.encoder
        frame_len = self._block * self._chans
        # whole frames first (small batch), then the partial tail via the
        # sequential host encoder (matches FlacSampleWriter output)
        if len(self._buf) >= frame_len:
            n_full = len(self._buf) // frame_len
            chunk = self._buf[:n_full * frame_len]
            self._buf = self._buf[n_full * frame_len:]
            self._dispatch_batch(chunk)
        while self._pending:
            self._drain_one()
        if len(self._buf):
            enc.update_md5(self._buf)
            enc.encode(list(deinterleave(self._buf, self._chans)))
            self._buf = np.empty(0, dtype=np.int32)
        enc.finalize()
        if self._owns_fp:
            enc.fp.close()
        if self._profiler is not None:
            self._profiler.__exit__(None, None, None)
            self._profiler = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.finalize()
            return
        # Error path: finalize-on-Drop mirror (src/encode.rs:2113-2117) —
        # drain what we can so the file keeps valid metadata, close the
        # owned descriptor on failure, never mask the in-flight exception.
        try:
            self.finalize()
        except Exception:
            if self._owns_fp:
                try:
                    self.encoder.fp.close()
                except Exception:
                    pass
