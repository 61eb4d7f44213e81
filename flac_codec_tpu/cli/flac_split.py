"""flac-split — split a FLAC by its embedded CUESHEET
(reference: examples/flac-split.rs; parallel per track via cloned readers).
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os

from .. import metadata as meta
from ..decode import FlacSampleReader
from ..encode import FlacSampleWriter, Options
from ..errors import FlacError


def _split_one(path: str, out_dir: str, index: int, start: int, end) -> str:
    r = FlacSampleReader(path)
    si = r.streaminfo
    end = end if end is not None else si.total_samples
    r.seek(start)
    out_path = os.path.join(out_dir, f"track{index:02d}.flac")
    # end can be unknown (no lead-out track AND no STREAMINFO total):
    # stream to end of input with an unknown output total
    w = FlacSampleWriter(out_path, Options(), si.sample_rate,
                         si.bits_per_sample, si.channels,
                         total_samples=(end - start) if end is not None
                         else None)
    remaining = ((end - start) * si.channels if end is not None
                 else None)
    while remaining is None or remaining > 0:
        want = min(remaining, 1 << 20) if remaining is not None else 1 << 20
        buf = r.read(want)
        if buf.size == 0:
            break
        w.write(buf)
        if remaining is not None:
            remaining -= buf.size
    w.finalize()
    r.close()
    return out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="flac-split")
    p.add_argument("input")
    p.add_argument("-d", "--output-dir", default=".")
    p.add_argument("-j", "--jobs", type=int, default=os.cpu_count())
    args = p.parse_args(argv)

    cs = meta.read_block(args.input, meta.Cuesheet)
    if cs is None:
        raise FlacError("no CUESHEET block in input")
    ranges = cs.track_sample_ranges()
    os.makedirs(args.output_dir, exist_ok=True)

    with concurrent.futures.ProcessPoolExecutor(args.jobs) as ex:
        futures = [
            ex.submit(_split_one, args.input, args.output_dir, i + 1, s, e)
            for i, (s, e) in enumerate(ranges)]
        for f in concurrent.futures.as_completed(futures):
            print(f.result())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
