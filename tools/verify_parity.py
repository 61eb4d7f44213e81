"""One-shot cross-implementation parity verification (VERDICT r4 item 4).

Shrinks the open encoder-parity risk (reference: README.md:53-55 claims
IETF-testbench + 200k-file-corpus coverage; no Rust toolchain exists in
this image, so the reference can never decode our streams *here*) to a
single command.  Three layers, outermost first:

In-image (always run; also exercised by tests/test_verify_parity.py):
  1. golden-drift  — re-derive every PARITY_GOLDEN.json fixture entry
     (decoded-PCM MD5, re-encoded frame-section MD5 + size at the
     documented default/best Options) and diff against the committed
     goldens.  Any drift means our encoder's output changed.
  2. rebuild       — parse every reference fixture with the structured
     frame model and re-serialize byte-for-byte
     (format/frame_model.rebuild_stream; reference "Analyzes Files").
  3. verify        — full decode + MD5 compare per fixture
     (reference: src/decode.rs:1270-1309).

With --flac-bin PATH (any external FLAC decoder, e.g. a `flac` binary):
  4. ext-decode    — our re-encoded default/best streams are decoded by
     the external binary; raw PCM MD5 must equal the golden pcm_md5.

With --ref-examples DIR (a built reference checkout's example binaries,
e.g. /path/to/flac-codec/target/release/examples):
  5. ref-encode    — the reference's `wav2flac` (Options::default(),
     examples/wav2flac.rs) encodes each fixture's PCM; its frame-section
     MD5 must equal our "default" golden (bit-exact encoder parity).
     (The reference example hardcodes default options; `best`-preset
     parity needs the cargo recipe in tools/make_parity_golden.py.)
  6. ref-decode    — the reference's `flac2wav` decodes OUR streams; the
     WAV data payload must reproduce the golden PCM (the reference
     accepts our bitstreams).

Usage:
  JAX_PLATFORMS=cpu python tools/verify_parity.py \
      [--flac-bin /usr/bin/flac] [--ref-examples DIR] [--fixtures DIR]

Exit status 0 iff every executed check passed.
"""

from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DEFAULT_FIXTURES = "/root/reference/tests/data"


def _presets():
    from flac_codec_tpu.encode import Options

    return {
        "default": Options().no_seektable().no_padding(),
        "best": Options.best().no_seektable().no_padding(),
    }


def _frames_md5(stream: bytes) -> str:
    from flac_codec_tpu import metadata as meta

    fp = io.BytesIO(stream)
    meta.read_blocks(fp)
    return hashlib.md5(stream[fp.tell():]).hexdigest()


def _pcm_bytes(pcm, bits_per_sample: int) -> bytes:
    width = max(1, (bits_per_sample + 7) // 8)
    return np.asarray(pcm).astype(f"<i{width}").tobytes()


def _reencode(pcm, si, opts) -> bytes:
    from flac_codec_tpu.encode import FlacSampleWriter

    buf = io.BytesIO()
    w = FlacSampleWriter(buf, opts, si.sample_rate, si.bits_per_sample,
                         si.channels, total_samples=len(pcm) // si.channels)
    w.write(np.asarray(pcm))
    w.finalize()
    return buf.getvalue()


def _write_wav(path: str, pcm, si) -> None:
    """Minimal PCM WAV (the container the reference's wav2flac parses)."""
    import struct

    data = _pcm_bytes(pcm, si.bits_per_sample)
    bytes_per = max(1, (si.bits_per_sample + 7) // 8)
    block_align = bytes_per * si.channels
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, si.channels, si.sample_rate,
                            si.sample_rate * block_align, block_align,
                            si.bits_per_sample))
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def _wav_data_chunk(path: str) -> bytes:
    """Extract the data chunk payload from a RIFF/WAVE file."""
    import struct

    with open(path, "rb") as f:
        blob = f.read()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE", path
    off = 12
    while off + 8 <= len(blob):
        cid, size = blob[off:off + 4], struct.unpack(
            "<I", blob[off + 4:off + 8])[0]
        if cid == b"data":
            return blob[off + 8:off + 8 + size]
        off += 8 + size + (size & 1)
    raise ValueError(f"no data chunk in {path}")


class Report:
    def __init__(self):
        self.rows = []
        self.failed = 0

    def add(self, check: str, fixture: str, ok: bool, detail: str = ""):
        self.rows.append((check, fixture, ok, detail))
        if not ok:
            self.failed += 1
        print(f"{'PASS' if ok else 'FAIL'}  {check:12s} {fixture:22s} "
              f"{detail}", flush=True)


def run_in_image(fixtures_dir: str, report: Report, golden: dict,
                 presets: dict, keep_streams: dict) -> None:
    from flac_codec_tpu import metadata as meta
    from flac_codec_tpu.decode import FlacSampleReader, Verified, verify
    from flac_codec_tpu.format import frame_model

    for name in sorted(os.listdir(fixtures_dir)):
        if not name.endswith(".flac"):
            continue
        path = os.path.join(fixtures_dir, name)
        with open(path, "rb") as fp:
            si = meta.read_blocks(fp).streaminfo
        with open(path, "rb") as fp:
            pcm = FlacSampleReader(fp).read_to_end()
        pcm_md5 = hashlib.md5(_pcm_bytes(pcm, si.bits_per_sample)).hexdigest()
        g = golden["fixtures"].get(name)

        # 3. full decode + MD5
        v = verify(path)
        ok = v is not Verified.MD5_MISMATCH
        report.add("verify", name, ok, v.name)

        # 2. structured parse + byte-for-byte rebuild of the whole stream
        with open(path, "rb") as fp:
            raw = fp.read()
        rebuilt = frame_model.rebuild_stream(raw)
        report.add("rebuild", name, rebuilt == raw, f"{len(raw)} bytes")

        # 1. golden drift: decoded PCM + both re-encodes
        if g is None:
            report.add("golden", name, False, "fixture missing from goldens")
            continue
        report.add("golden-pcm", name, pcm_md5 == g["pcm_md5"], pcm_md5)
        for pname, opts in presets.items():
            stream = _reencode(pcm, si, opts)
            fm = _frames_md5(stream)
            want = g["reencoded"][pname]
            ok = fm == want["frames_md5"] and len(stream) == want[
                "stream_bytes"]
            report.add(f"golden-{pname}", name, ok,
                       f"{len(stream)}B {fm[:12]}")
            keep_streams[(name, pname)] = (stream, pcm_md5, pcm, si)


def run_ext_decode(flac_bin: str, report: Report, keep_streams: dict) -> None:
    with tempfile.TemporaryDirectory() as td:
        for (name, pname), (stream, pcm_md5, pcm, si) in keep_streams.items():
            src = os.path.join(td, f"{name}.{pname}.flac")
            dst = os.path.join(td, f"{name}.{pname}.raw")
            with open(src, "wb") as f:
                f.write(stream)
            # force little-endian signed raw output to match pcm_md5
            cmd = [flac_bin, "-d", "-s", "-f", "--force-raw-format",
                   "--endian=little", "--sign=signed", "-o", dst, src]
            p = subprocess.run(cmd, capture_output=True, text=True)
            if p.returncode != 0:
                report.add(f"ext-dec-{pname}", name, False,
                           p.stderr.strip()[-80:])
                continue
            with open(dst, "rb") as f:
                got = hashlib.md5(f.read()).hexdigest()
            report.add(f"ext-dec-{pname}", name, got == pcm_md5, got[:12])


def run_ref_examples(ref_dir: str, report: Report, golden: dict,
                     keep_streams: dict) -> None:
    wav2flac = os.path.join(ref_dir, "wav2flac")
    flac2wav = os.path.join(ref_dir, "flac2wav")
    with tempfile.TemporaryDirectory() as td:
        seen = set()
        for (name, pname), (stream, pcm_md5, pcm, si) in keep_streams.items():
            # 6. reference decodes OUR stream
            if os.path.exists(flac2wav):
                src = os.path.join(td, f"ours.{name}.{pname}.flac")
                with open(src, "wb") as f:
                    f.write(stream)
                p = subprocess.run([flac2wav, src], capture_output=True,
                                   text=True)
                wav = src[:-5] + ".wav"
                ok = p.returncode == 0 and os.path.exists(wav)
                if ok:
                    got = hashlib.md5(_wav_data_chunk(wav)).hexdigest()
                    ok = got == pcm_md5
                report.add(f"ref-dec-{pname}", name, ok,
                           (p.stderr.strip()[-60:] if p.returncode else ""))

            # 5. reference encodes the PCM at default options
            if pname == "default" and name not in seen and \
                    os.path.exists(wav2flac):
                seen.add(name)
                wav = os.path.join(td, f"ref.{name}.wav")
                _write_wav(wav, pcm, si)
                p = subprocess.run([wav2flac, wav], capture_output=True,
                                   text=True)
                out = wav[:-4] + ".flac"
                ok = p.returncode == 0 and os.path.exists(out)
                detail = ""
                if ok:
                    with open(out, "rb") as f:
                        ref_stream = f.read()
                    got = _frames_md5(ref_stream)
                    want = golden["fixtures"][name]["reencoded"]["default"][
                        "frames_md5"]
                    ok = got == want
                    detail = got[:12]
                else:
                    detail = p.stderr.strip()[-60:]
                report.add("ref-enc-default", name, ok, detail)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--flac-bin", help="external FLAC decoder binary")
    ap.add_argument("--ref-examples",
                    help="dir with built reference wav2flac/flac2wav")
    ap.add_argument("--fixtures", default=DEFAULT_FIXTURES)
    args = ap.parse_args()

    with open(os.path.join(REPO, "PARITY_GOLDEN.json")) as f:
        golden = json.load(f)
    presets = _presets()
    report = Report()
    keep_streams: dict = {}

    run_in_image(args.fixtures, report, golden, presets, keep_streams)
    if args.flac_bin:
        run_ext_decode(args.flac_bin, report, keep_streams)
    if args.ref_examples:
        run_ref_examples(args.ref_examples, report, golden, keep_streams)

    total = len(report.rows)
    print(f"\n{total - report.failed}/{total} checks passed", flush=True)
    return 1 if report.failed else 0


if __name__ == "__main__":
    sys.exit(main())
