"""wav2flac — RIFF/WAVE -> FLAC (reference: examples/wav2flac.rs).

Parses standard and EXTENSIBLE fmt chunks (channel mask becomes the
WAVEFORMATEXTENSIBLE_CHANNEL_MASK tag, reference: wav2flac.rs:82-89) and
applies the unsigned->signed 8-bit shim.  ``--tpu`` routes encoding through
the batched device pipeline.
"""

from __future__ import annotations

import argparse
import sys

from .. import metadata as meta
from ..encode import FlacSampleWriter, Options
from ..utils.wav import read_wave_data, read_wave_header


def build_options(args) -> Options:
    opts = Options.fast() if args.fast else (
        Options.best() if args.best else Options())
    if args.block_size:
        opts = opts.with_block_size(args.block_size)
    if args.no_padding:
        opts = opts.no_padding()
    return opts


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--fast", action="store_true", help="fast preset")
    p.add_argument("--best", action="store_true", help="max compression (-8)")
    p.add_argument("--block-size", type=int, default=None)
    p.add_argument("--no-padding", action="store_true")
    p.add_argument("--tpu", action="store_true",
                   help="encode via the batched TPU pipeline")
    p.add_argument("--batch-frames", type=int, default=64)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="wav2flac")
    p.add_argument("input")
    p.add_argument("output")
    add_common_args(p)
    args = p.parse_args(argv)

    opts = build_options(args)
    with open(args.input, "rb") as fin:
        spec = read_wave_header(fin)
        width = (spec.bits_per_sample + 7) // 8
        total = spec.data_size // (width * spec.channels)
        if spec.channel_mask is not None:
            opts = opts.tag(meta.fields.WAVEFORMATEXTENSIBLE_CHANNEL_MASK,
                            f"0x{spec.channel_mask:04x}")
        if args.tpu:
            from ..parallel.batch import BatchEncoder

            writer = BatchEncoder(args.output, opts, spec.sample_rate,
                                  spec.bits_per_sample, spec.channels,
                                  total_samples=total,
                                  batch_frames=args.batch_frames)
        else:
            writer = FlacSampleWriter(args.output, opts, spec.sample_rate,
                                      spec.bits_per_sample, spec.channels,
                                      total_samples=total)
        for chunk in read_wave_data(fin, spec):
            writer.write(chunk)
        writer.finalize()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
