"""RIFF/WAVE container read/write (reference: examples/wav2flac.rs /
flac2wav.rs).

Handles standard PCM fmt chunks and WAVE_FORMAT_EXTENSIBLE (with channel
mask -> WAVEFORMATEXTENSIBLE_CHANNEL_MASK tag round-trip), plus the
unsigned->signed 8-bit shim (reference: examples/wav2flac.rs:133-146).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, Iterator, Optional, Tuple

import numpy as np

from ..errors import FlacError

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_EXTENSIBLE = 0xFFFE
_PCM_GUID = (b"\x01\x00\x00\x00\x00\x00\x10\x00"
             b"\x80\x00\x00\xaa\x00\x38\x9b\x71")


class WaveError(FlacError):
    pass


@dataclass
class WaveSpec:
    sample_rate: int
    channels: int
    bits_per_sample: int
    channel_mask: Optional[int] = None  # WAVE_FORMAT_EXTENSIBLE only
    data_size: int = 0


def read_wave_header(fp: BinaryIO) -> WaveSpec:
    """Parse RIFF header up to (and positioned at) the data chunk."""
    riff = fp.read(12)
    if len(riff) != 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise WaveError("not a RIFF/WAVE file")
    spec: Optional[WaveSpec] = None
    while True:
        hdr = fp.read(8)
        if len(hdr) < 8:
            raise WaveError("no data chunk")
        cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
        if cid == b"fmt ":
            body = fp.read(size)
            (fmt, channels, rate, _byte_rate, _align, bps
             ) = struct.unpack_from("<HHIIHH", body, 0)
            mask = None
            if fmt == WAVE_FORMAT_EXTENSIBLE:
                if size < 40:
                    raise WaveError("short extensible fmt chunk")
                (_ext_size, valid_bits, mask) = struct.unpack_from("<HHI", body, 16)
                guid = body[24:40]
                if guid != _PCM_GUID:
                    raise WaveError("non-PCM extensible WAVE")
                bps = valid_bits or bps
            elif fmt != WAVE_FORMAT_PCM:
                raise WaveError(f"unsupported WAVE format {fmt:#x}")
            spec = WaveSpec(rate, channels, bps, mask)
            if size % 2:
                fp.read(1)
        elif cid == b"data":
            if spec is None:
                raise WaveError("data chunk before fmt chunk")
            spec.data_size = size
            return spec
        else:
            fp.seek(size + (size % 2), 1)


def read_wave_data(fp: BinaryIO, spec: WaveSpec,
                   chunk_bytes: int = 1 << 20) -> Iterator[np.ndarray]:
    """Yield interleaved int32 sample chunks (8-bit unsigned -> signed)."""
    from ..byteorder import bytes_to_samples

    remaining = spec.data_size
    width = (spec.bits_per_sample + 7) // 8
    while remaining > 0:
        take = min(chunk_bytes, remaining)
        take -= take % (width * spec.channels)
        if take == 0:
            break
        data = fp.read(take)
        if not data:
            break
        remaining -= len(data)
        if spec.bits_per_sample <= 8:
            samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        else:
            samples = bytes_to_samples(data, spec.bits_per_sample)
        yield samples


def write_wave(fp: BinaryIO, sample_rate: int, channels: int,
               bits_per_sample: int, total_samples: int,
               channel_mask: Optional[int] = None) -> None:
    """Write WAVE headers; caller then writes raw PCM data bytes.

    Uses WAVE_FORMAT_EXTENSIBLE when channels > 2 or bps > 16 or an
    explicit channel mask is given (reference: examples/flac2wav.rs:140-151).
    """
    width = (bits_per_sample + 7) // 8
    data_size = total_samples * channels * width
    byte_rate = sample_rate * channels * width
    align = channels * width

    extensible = channels > 2 or bits_per_sample > 16 or channel_mask is not None
    if extensible:
        fmt = struct.pack("<HHIIHH", WAVE_FORMAT_EXTENSIBLE, channels,
                          sample_rate, byte_rate, align, width * 8)
        fmt += struct.pack("<HHI", 22, bits_per_sample, channel_mask or 0)
        fmt += _PCM_GUID
    else:
        fmt = struct.pack("<HHIIHH", WAVE_FORMAT_PCM, channels, sample_rate,
                          byte_rate, align, bits_per_sample)

    riff_size = 4 + (8 + len(fmt)) + (8 + data_size)
    fp.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
    fp.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    fp.write(b"data" + struct.pack("<I", data_size))


def pcm_to_wave_bytes(samples: np.ndarray, bits_per_sample: int) -> bytes:
    """Interleaved samples -> WAVE data bytes (8-bit goes unsigned)."""
    from ..byteorder import samples_to_bytes

    if bits_per_sample <= 8:
        return (np.asarray(samples, dtype=np.int32) + 128).astype(np.uint8).tobytes()
    return samples_to_bytes(samples, bits_per_sample)
