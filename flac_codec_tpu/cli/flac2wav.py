"""flac2wav — FLAC -> RIFF/WAVE (reference: examples/flac2wav.rs).

Chooses PCM vs EXTENSIBLE fmt by channels/bps (reference:
flac2wav.rs:140-151); decodes multiple files in parallel processes
(reference uses rayon par_iter, flac2wav.rs:31-38).
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import sys

from .. import metadata as meta
from ..decode import FlacSampleReader
from ..errors import FlacError
from ..utils.wav import pcm_to_wave_bytes, write_wave


def _channel_mask(blocks):
    """Validated WAVEFORMATEXTENSIBLE channel mask from the tags, or None."""
    vc = blocks.get(meta.VorbisComment)
    if vc is not None:
        raw = vc.get(meta.fields.WAVEFORMATEXTENSIBLE_CHANNEL_MASK)
        if raw:
            try:
                mask = int(raw, 16)
                if 0 <= mask < (1 << 18):  # defined WAVEFORMATEXTENSIBLE bits
                    return mask
            except ValueError:
                pass
    return None


def convert_one(path: str, out_path: str, tpu: bool = False) -> str:
    if tpu:
        return convert_one_tpu(path, out_path)
    r = FlacSampleReader(path)
    si = r.streaminfo
    mask = _channel_mask(r.metadata())
    with open(out_path, "wb") as fout:
        write_wave(fout, si.sample_rate, si.channels, si.bits_per_sample,
                   si.total_samples or 0, mask)
        while True:
            buf = r.fill_buf()
            if buf.size == 0:
                break
            r.consume(buf.size)
            fout.write(pcm_to_wave_bytes(buf, si.bits_per_sample))
    r.close()
    return out_path


def convert_one_tpu(path: str, out_path: str) -> str:
    """Decode through the batched device pipeline (frames reconstructed on
    the accelerator, PCM downloaded per batch)."""
    import numpy as np

    from ..parallel.batch_decode import BatchDecoder

    with BatchDecoder(path) as dec, open(out_path, "wb") as fout:
        si = dec.streaminfo
        mask = _channel_mask(dec.decoder.blocks)
        write_wave(fout, si.sample_rate, si.channels, si.bits_per_sample,
                   si.total_samples or 0, mask)
        while True:
            flat = dec.read_batch_interleaved()
            if flat is None:
                break
            fout.write(pcm_to_wave_bytes(np.asarray(flat).reshape(-1),
                                         si.bits_per_sample))
    return out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="flac2wav")
    p.add_argument("inputs", nargs="+")
    p.add_argument("-o", "--output", default=None,
                   help="output file (single input) or directory")
    p.add_argument("-j", "--jobs", type=int, default=os.cpu_count())
    p.add_argument("--tpu", action="store_true",
                   help="decode via the batched device pipeline")
    args = p.parse_args(argv)

    jobs = []
    for path in args.inputs:
        if args.output and len(args.inputs) == 1 and not os.path.isdir(args.output):
            out = args.output
        else:
            base = os.path.splitext(os.path.basename(path))[0] + ".wav"
            out = os.path.join(args.output or os.path.dirname(path) or ".", base)
        jobs.append((path, out))

    # surface per-file errors as clean diagnostics, not tracebacks (the
    # reference CLI prints "<path>: <error>" and continues; exit nonzero)
    failed = 0
    if len(jobs) == 1 or args.tpu:  # one device: decode serially on it
        for p_, o_ in jobs:
            try:
                print(convert_one(p_, o_, tpu=args.tpu))
            except (OSError, FlacError) as e:
                print(f"{p_}: {e}", file=sys.stderr)
                failed += 1
    else:
        with concurrent.futures.ProcessPoolExecutor(args.jobs) as ex:
            futures = {ex.submit(convert_one, p_, o_): p_ for p_, o_ in jobs}
            for f in concurrent.futures.as_completed(futures):
                try:
                    print(f.result())
                except (OSError, FlacError) as e:
                    print(f"{futures[f]}: {e}", file=sys.stderr)
                    failed += 1
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
