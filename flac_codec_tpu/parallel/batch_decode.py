"""Batched decode pipeline: FLAC -> device tensors.

The host parses/validates frames and extracts raw subframes (warm-up +
residual buffers and predictor parameters) via the native engine; the
device evaluates the inverse-LPC recurrence as a batch-vectorized scan,
applies wasted-bits shifts, and inverts the stereo decorrelation — keeping
the decoded PCM ON DEVICE (the interesting TPU use case: FLAC straight
into accelerator memory for audio-model training/serving, no PCM download).

North-star mapping (BASELINE.json): "the decoder inverts Rice codes
block-wise and evaluates the inverse-LPC recurrence as a blocked scan,
with CRC-8/16 and MD5 verification on host".
"""

from __future__ import annotations

import os
from functools import partial
from typing import BinaryIO, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .. import metadata as meta
from ..bitio import BitReader
from ..decode import Decoder
from ..ops.predict import (fixed_compatible_mask, predict_batch,
                           predict_fixed_batch)
from ..ops.predict_pallas import pallas_predict_ok, predict_batch_pallas
from ..utils import trace


@partial(jax.jit, static_argnames=("block_size", "mode", "taps", "limbs"))
def _device_reconstruct(buf, qcoeffs, shift, order, wasted, assignment,
                        block_size: int, mode: str = "scan",
                        taps: int = 32, limbs: int = 2):
    """(B, C, N) raw subframes -> (B, C, N) int32 PCM, all on device.

    mode "fixed": every subframe is FIXED-compatible (shift 0, taps equal
    to a fixed-predictor row) -> exact k-fold-cumsum inverse, no scan.
    mode "scan": general inverse-LPC scan with `taps` MACs per step.
    mode "pallas": the VMEM-resident Pallas kernel, int32 end-to-end —
    callers must have checked `pallas_predict_ok` (exactness gate), which
    also chooses `limbs` (2 for 16-bit-class batches, 3 for 24-bit).
    """
    B, C, N = buf.shape
    if mode == "pallas":
        flat = buf.reshape(B * C, N).astype(jnp.int32)
        out = predict_batch_pallas(flat,
                                   qcoeffs.reshape(B * C, 32),
                                   shift.reshape(B * C),
                                   order.reshape(B * C),
                                   block_size, taps=taps, limbs=limbs,
                                   interpret=jax.default_backend() != "tpu")
        # int32 is exact for the whole gated pipeline (samples < 2^25
        # even in the 24-bit mode, mid-side sums < 2^26)
        out = jax.lax.shift_left(
            out, wasted.reshape(B * C, 1).astype(jnp.int32))
        out = out.reshape(B, C, N)
        return _decorrelate(out, assignment, C)
    flat = buf.reshape(B * C, N).astype(jnp.int64)
    if mode == "fixed":
        out = predict_fixed_batch(flat,
                                  order.reshape(B * C).astype(jnp.int32),
                                  block_size)
    else:
        out = predict_batch(flat,
                            qcoeffs.reshape(B * C, 32).astype(jnp.int64),
                            shift.reshape(B * C).astype(jnp.int32),
                            order.reshape(B * C).astype(jnp.int32),
                            block_size, taps=taps)
    out = jax.lax.shift_left(out, wasted.reshape(B * C, 1).astype(jnp.int64))
    out = out.reshape(B, C, N)
    return _decorrelate(out, assignment, C)


def _decorrelate(out, assignment, C):
    """Inverse stereo decorrelation, dtype-generic
    (reference decorrelation: src/decode.rs:1512-1625)."""
    if C == 2:
        a = assignment.astype(jnp.int32)[:, None]
        c0, c1 = out[:, 0], out[:, 1]
        left_side = jnp.stack([c0, c0 - c1], axis=1)
        side_right = jnp.stack([c0 + c1, c1], axis=1)
        total = c0 * 2 + (jnp.abs(c1) % 2)
        mid_side = jnp.stack([(total + c1) >> 1, (total - c1) >> 1], axis=1)
        out = jnp.where((a == 0b1000)[:, :, None], left_side,
                        jnp.where((a == 0b1001)[:, :, None], side_right,
                                  jnp.where((a == 0b1010)[:, :, None],
                                            mid_side, out)))
    return out.astype(jnp.int32)


class BatchDecoder:
    """Decode a fixed-block-size FLAC stream in frame batches on device.

    Trust model: the Pallas fast path is exact for every spec-conforming
    stream (decoded samples within the bits-per-sample range), which the
    host gate `pallas_predict_ok` checks on the parsed inputs.  A
    CRC-valid but non-conforming stream engineered to push predictions
    past int32 can wrap inside the kernel and diverge from the host
    decoder without an error — run untrusted input through the host
    decoder (`decode.verify` / `FlacSampleReader`) or set
    FLAC_TPU_NO_PALLAS=1 to force the exact int64 scan path.
    """

    def __init__(self, fp_or_path, batch_frames: int = 256, mesh=None):
        # exact int64 accumulators in the inverse-LPC recurrence; without
        # x64 JAX silently truncates to int32 (wrong decodes above 16-bit).
        # This flips a process-global flag; warn so callers running f32
        # model code in the same process know their promotion semantics
        # changed (pass jax_enable_x64 yourself to silence this).
        if not jax.config.jax_enable_x64:
            import warnings

            warnings.warn(
                "BatchDecoder enabled jax_enable_x64 process-wide (required "
                "for exact int64 decode math)", stacklevel=2)
            jax.config.update("jax_enable_x64", True)
        self._owns_fp = isinstance(fp_or_path, (str, bytes))
        if self._owns_fp:
            fp_or_path = open(fp_or_path, "rb")
        self.decoder = Decoder(fp_or_path)
        self.batch_frames = batch_frames
        # optional jax.sharding.Mesh: frame batches are data-parallel over
        # the mesh's batch axis (decode mirrors encode's sharding story)
        self.mesh = mesh
        si = self.decoder.streaminfo
        self.block_size = si.maximum_block_size
        self._native_ok = (si.minimum_block_size == si.maximum_block_size
                           and si.maximum_block_size > 0)
        self._profiler = trace.profiler_session("batch-decode")
        self._profiler.__enter__()

    @property
    def streaminfo(self) -> meta.Streaminfo:
        return self.decoder.streaminfo

    def seek(self, sample: int) -> int:
        """Position at the nearest decodable frame boundary <= ``sample``
        (via SEEKTABLE when present); returns the sample actually seeked
        to — the caller discards ``sample - actual`` leading samples."""
        return self.decoder.seek(sample)

    def close(self) -> None:
        if self._owns_fp:
            self.decoder.fp.close()
        if self._profiler is not None:
            self._profiler.__exit__(None, None, None)
            self._profiler = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read_batch_device(self):
        """Decode up to batch_frames frames; returns a device array
        (B, channels, block_size) int32 (and the per-frame sample counts),
        or None at end of stream.  Short/irregular tails fall back to the
        host decoder.
        """
        from .. import native

        dec = self.decoder
        si = dec.streaminfo
        nat = native.load()
        if nat is None or not self._native_ok:
            frame = dec.read_frame()
            if frame is None:
                return None
            return jnp.asarray(frame[None]), np.array([frame.shape[1]])

        buf = dec.r.np_view()
        total = dec.total_samples
        remaining = None if total is None else total - dec.current_sample
        if remaining is not None and remaining <= 0:
            return None
        with trace.stage("decode.parse", frames=self.batch_frames):
            raw = nat.parse_frames_raw(
                buf, dec.r.pos, self.batch_frames, si.sample_rate,
                si.channels, si.bits_per_sample, self.block_size, remaining)
        if raw["n"] == 0:
            # tail / error: host path (raises precise errors)
            frame = dec.read_frame()
            if frame is None:
                return None
            return jnp.asarray(frame[None]), np.array([frame.shape[1]])
        dec.r.pos = raw["end_bitpos"]
        dec.current_sample += int(raw["blocks"].sum())

        args = [raw["buf"], raw["qcoeffs"], raw["shift"], raw["order"],
                raw["wasted"], raw["assignment"]]
        # dispatch: all-FIXED batches ride the k-fold-cumsum inverse (no
        # sequential scan at all); otherwise the scan runs with the
        # smallest tap bucket covering the batch's max LPC order
        n, C = raw["order"].shape
        mask = fixed_compatible_mask(raw["qcoeffs"].reshape(n * C, 32),
                                     raw["shift"].reshape(n * C),
                                     raw["order"].reshape(n * C))
        limbs = 2
        if mask.all():
            mode, taps = "fixed", 32
        else:
            mode = "scan"
            max_order = int(raw["order"].max())
            taps = next(t for t in (4, 8, 12, 16, 32) if t >= max_order)
            # the Pallas VMEM kernel when the batch is in its exactness
            # domain (16/24-bit-class samples) and we are on a real TPU
            # without a mesh (GSPMD cannot partition the kernel);
            # FLAC_TPU_PALLAS=force engages it off-TPU through the Pallas
            # interpreter (slow — integration testing only)
            want = (jax.default_backend() == "tpu"
                    or os.environ.get("FLAC_TPU_PALLAS") == "force")
            if (want and self.mesh is None
                    and not os.environ.get("FLAC_TPU_NO_PALLAS")):
                limbs = pallas_predict_ok(
                    raw["buf"], raw["qcoeffs"], raw["shift"],
                    raw["order"], si.bits_per_sample, taps)
                if limbs:
                    mode = "pallas"
        batch_axis = (self.mesh.shape[self.mesh.axis_names[0]]
                      if self.mesh is not None else 1)
        if self.mesh is not None and raw["n"] % batch_axis == 0:
            from .mesh import shard_batch

            args = [shard_batch(self.mesh, a) for a in args]
        else:
            args = [jnp.asarray(a) for a in args]
        with trace.stage("decode.reconstruct", frames=raw["n"], mode=mode):
            pcm = _device_reconstruct(*args, self.block_size, mode=mode,
                                      taps=taps, limbs=limbs)
        return pcm, raw["blocks"]

    def read_batch_interleaved(self):
        """One decoded batch as a ((samples, channels) device array) with
        tail padding trimmed (FLAC's only-last-frame-short invariant), or
        None at end of stream."""
        got = self.read_batch_device()
        if got is None:
            return None
        pcm, blocks = got
        flat = jnp.swapaxes(pcm, 1, 2).reshape(-1, pcm.shape[1])
        if int(blocks[-1]) != pcm.shape[2]:
            flat = flat[: int(np.asarray(blocks).sum())]
        return flat

    def read_all_device(self):
        """Whole stream as one (total, channels) device array."""
        parts = []
        while True:
            flat = self.read_batch_interleaved()
            if flat is None:
                break
            parts.append(flat)
        if not parts:
            return jnp.zeros((0, self.streaminfo.channels), jnp.int32)
        return jnp.concatenate(parts, axis=0)
