"""Generate PARITY_GOLDEN.json: cross-implementation encoder-parity artifacts.

No Rust toolchain exists in this environment, so encoder-side stream parity
vs the actual reference (tuffy/flac-codec) cannot be executed here
(BASELINE.md).  This tool pins everything a future environment WITH a
toolchain needs to close the loop in one command (VERDICT r3 item 5):

  for each reference fixture (/root/reference/tests/data/*.flac):
    - decoded-PCM MD5 (and that it matches the STREAMINFO MD5 when present)
    - the fixture's stream parameters
    - our re-encode of that PCM at two exactly-documented Options sets
      (reference Options::default() and Options::best(),
      src/encode.rs:1376-1408 / :1649-1657), recorded as the MD5 of the
      FRAME SECTION ONLY (after the metadata blocks) — metadata bytes
      differ legitimately across implementations (vendor string, padding),
      frame bytes must not.

Verification recipe for an environment with cargo (one shot):
  1. cargo build --release in the reference
  2. decode each fixture to raw PCM (any FLAC decoder; MD5 must equal
     "pcm_md5" below)
  3. encode that PCM with the reference at the documented Options
     (matching block_size/max_lpc_order/max_partition_order/mid_side/
     window/exhaustive; disable seektable+padding so the frame section
     starts immediately after STREAMINFO)
  4. strip metadata (everything through the last metadata block) and
     MD5 the remaining frame bytes; compare with "frames_md5".

Usage: JAX_PLATFORMS=cpu python tools/make_parity_golden.py
"""

import hashlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

from flac_codec_tpu import metadata as meta
from flac_codec_tpu.decode import FlacSampleReader, Verified, verify
from flac_codec_tpu.encode import FlacSampleWriter, Options

FIXTURES = "/root/reference/tests/data"


def frames_md5(stream: bytes) -> str:
    """MD5 of the frame section (everything after the metadata blocks)."""
    fp = io.BytesIO(stream)
    meta.read_blocks(fp)
    return hashlib.md5(stream[fp.tell():]).hexdigest()


def options_doc(o: Options) -> dict:
    """The exact encoder options, spelled out for the cross-check."""
    return {
        "block_size": o.block_size,
        "max_lpc_order": o.max_lpc_order,
        "max_partition_order": o.max_partition_order,
        "mid_side": o.mid_side,
        "window": list(o.window) if isinstance(o.window, tuple) else o.window,
        "exhaustive_channel_correlation": o.exhaustive_channel_correlation,
        "padding": o.padding,
        "seektable": o.seektable_interval,
        "note": ("disable seektable+padding when reproducing so the frame "
                 "section is position-independent; rice2 iff bps > 16"),
    }


def main() -> None:
    presets = {
        "default": Options().no_seektable().no_padding(),
        "best": Options.best().no_seektable().no_padding(),
    }
    out = {
        "_doc": ("Cross-implementation encoder-parity goldens; see "
                 "tools/make_parity_golden.py for the one-shot "
                 "verification recipe (VERDICT r3 item 5)"),
        "options": {k: options_doc(v) for k, v in presets.items()},
        "fixtures": {},
    }
    for name in sorted(os.listdir(FIXTURES)):
        if not name.endswith(".flac"):
            continue
        path = os.path.join(FIXTURES, name)
        with open(path, "rb") as fp:
            si = meta.read_blocks(fp).streaminfo
        with open(path, "rb") as fp:
            r = FlacSampleReader(fp)
            pcm = r.read_to_end()
        pcm_md5 = hashlib.md5(np.asarray(pcm).astype(
            f"<i{max(1, (si.bits_per_sample + 7) // 8)}").tobytes()
        ).hexdigest()
        v = verify(path)
        rec = {
            "sample_rate": si.sample_rate,
            "channels": si.channels,
            "bits_per_sample": si.bits_per_sample,
            "total_samples": si.total_samples,
            "streaminfo_md5": si.md5.hex() if any(si.md5) else None,
            "pcm_md5": pcm_md5,
            "verify": v.name,
            "reencoded": {},
        }
        if any(si.md5):
            assert v is Verified.MD5_MATCH, (name, v)
        for pname, opts in presets.items():
            buf = io.BytesIO()
            w = FlacSampleWriter(buf, opts, si.sample_rate,
                                 si.bits_per_sample, si.channels,
                                 total_samples=len(pcm) // si.channels)
            w.write(np.asarray(pcm))
            w.finalize()
            stream = buf.getvalue()
            # self-check: our stream round-trips to the same PCM
            assert verify(io.BytesIO(stream)) is Verified.MD5_MATCH, name
            rec["reencoded"][pname] = {
                "frames_md5": frames_md5(stream),
                "stream_bytes": len(stream),
            }
        out["fixtures"][name] = rec
        print(name, "ok", flush=True)

    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "PARITY_GOLDEN.json")
    with open(dest, "w") as fp:
        json.dump(out, fp, indent=1, sort_keys=True)
        fp.write("\n")
    print("wrote", os.path.abspath(dest))


if __name__ == "__main__":
    main()
