"""Build the vendored decoder-conformance corpus (VERDICT r4 item 7).

Generates a compact set of pre-built FLAC streams covering the format
features the IETF decoder testbench exercises (reference claim:
/root/reference/README.md:53-55) and freezes them as binary fixtures in
tests/data/conformance/, with a manifest recording each stream's decode
oracle (MD5 over the int64 little-endian sample array).  Once committed,
tests/test_conformance_corpus.py decodes the *committed bytes* — the
corpus no longer depends on the generator's correctness at test time, so
a decoder regression cannot cancel out against a generator regression.

Run:  python tools/make_conformance_corpus.py      (rewrites the corpus)

Feature matrix (one stream per row; seeds fixed so re-runs are stable):
variable blocksize, blocksize escapes, sample-rate escapes (kHz/Hz/dHz +
non-subset STREAMINFO pull), bps codes + non-subset escape widths, wasted
bits (incl. side channel), all stereo decorrelations, 33-bit wide side,
partition orders/escape/constant/rice2, LPC order extremes, 8 channels,
short last frame, undeclared total.
"""

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from flac_codec_tpu.format.frame import ChannelAssignment
from flac_codec_tpu.format.genstream import (FrameSpec, SubframeSpec,
                                             build_stream)
from flac_codec_tpu.format.subframe import CONSTANT, FIXED, LPC, VERBATIM

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "data", "conformance")


def _rng(seed):
    return np.random.default_rng(seed)


def _verbatim(n, bps, seed, scale=None):
    scale = scale or (1 << (bps - 2))
    return SubframeSpec(VERBATIM, values=_rng(seed).integers(-scale, scale, n))


def _signal(n, scale, seed):
    r = _rng(seed)
    walk = np.cumsum(r.integers(-scale // 8 - 1, scale // 8 + 2, n))
    return np.clip(walk, -scale, scale).astype(np.int64)


def _fixed(n, order, seed, scale=2000, wasted=0, **kw):
    x = _signal(n, scale, seed)
    res = x.copy()
    for _ in range(order):
        res = np.diff(res)
    return SubframeSpec(FIXED, order=order, warmups=x[:order],
                        residuals=res, wasted=wasted, **kw)


def _lpc(n, order, shift, seed, scale=2000, precision=15, coeffs=None, **kw):
    r = _rng(seed)
    if coeffs is None:
        coeffs = np.zeros(order, dtype=np.int64)
        coeffs[0] = (1 << shift) - 1
        if order > 1:
            coeffs[1:] = r.integers(-(1 << max(shift - 3, 0)),
                                    (1 << max(shift - 3, 0)) + 1, order - 1)
    coeffs = np.asarray(coeffs, dtype=np.int64)
    x = _signal(n, scale, seed + 1)
    res = x.copy()
    for i in range(order, n):
        acc = int((coeffs * x[i - order:i][::-1]).sum())
        res[i] = x[i] - (acc >> shift)
    return SubframeSpec(LPC, order=order, coeffs=coeffs, shift=shift,
                        precision=precision, warmups=x[:order],
                        residuals=res[order:], **kw)


def cases():
    """Yield (name, kwargs-for-build_stream, frames)."""
    # 1. variable blocksize, mixed sizes incl. 16 and an 8-bit escape size
    yield ("variable-blocksize", {"variable": True},
           [FrameSpec(n, [_verbatim(n, 16, 100 + i), _verbatim(n, 16, 200 + i)])
            for i, n in enumerate([576, 1152, 192, 2048, 256, 100, 16])])
    # 2. variable blocksize, undeclared total, short last
    yield ("variable-undeclared-total",
           {"variable": True, "declare_total": False},
           [FrameSpec(n, [_fixed(n, 2, 300 + n), _fixed(n, 1, 400 + n)])
            for n in (1024, 768, 512, 11)])
    # 3. blocksize 8-bit + 16-bit escapes, fixed blocking
    yield ("blocksize-escapes", {},
           [FrameSpec(255, [_verbatim(255, 16, 1)]),
            FrameSpec(255, [_verbatim(255, 16, 2)]),
            FrameSpec(17, [_verbatim(17, 16, 3)])])
    yield ("blocksize-65535", {},
           [FrameSpec(65535, [_fixed(65535, 2, 4)])])
    # 4. sample-rate escapes
    yield ("rate-khz-escape", {"sample_rate": 128000},
           [FrameSpec(256, [_fixed(256, 1, 5)])])
    yield ("rate-hz-escape", {"sample_rate": 44001},
           [FrameSpec(256, [_fixed(256, 1, 6)])])
    yield ("rate-dhz-escape", {"sample_rate": 500000},
           [FrameSpec(256, [_fixed(256, 1, 7)])])
    yield ("rate-streaminfo-non-subset",
           {"sample_rate": 1000000, "non_subset": True},
           [FrameSpec(256, [_fixed(256, 2, 8)])])
    # 5. bps codes + non-subset escape widths
    for bps in (8, 12, 20, 24, 32):
        yield (f"bps-{bps}", {"bps": bps},
               [FrameSpec(512, [_verbatim(512, bps, 10 + bps),
                                _verbatim(512, bps, 50 + bps)])])
    for bps in (17, 27):
        yield (f"bps-{bps}-non-subset", {"bps": bps, "non_subset": True},
               [FrameSpec(256, [_verbatim(256, bps, 70 + bps)])])
    # 6. wasted bits: extremes + on a decorrelated side channel
    for wasted in (1, 7, 15):
        eff = 16 - wasted
        lo, hi = -(1 << (eff - 1)), (1 << (eff - 1)) - 1
        yield (f"wasted-{wasted}", {},
               [FrameSpec(512, [SubframeSpec(
                   VERBATIM, wasted=wasted,
                   values=_rng(80 + wasted).integers(lo, hi + 1, 512))])])
    yield ("wasted-side-channel", {},
           [FrameSpec(256, [_fixed(256, 2, 90, scale=50, wasted=3),
                            _fixed(256, 1, 91, scale=20, wasted=2)],
                      assignment=ChannelAssignment.LEFT_SIDE)])
    # 7. stereo decorrelation modes
    for name, asg in (("left-side", ChannelAssignment.LEFT_SIDE),
                      ("side-right", ChannelAssignment.SIDE_RIGHT),
                      ("mid-side", ChannelAssignment.MID_SIDE)):
        yield (f"decorrelate-{name}", {},
               [FrameSpec(1024, [_fixed(1024, 2, 95), _fixed(1024, 3, 96)],
                          assignment=asg)])
    # 8. 33-bit wide side channels at bps=32 (all three assignments)
    for name, asg in (("left-side", ChannelAssignment.LEFT_SIDE),
                      ("side-right", ChannelAssignment.SIDE_RIGHT),
                      ("mid-side", ChannelAssignment.MID_SIDE)):
        r = _rng(hash(name) % 2**31)
        n = 256
        left = r.integers(-(1 << 31), (1 << 31) - 1, n).astype(np.int64)
        right = r.integers(-(1 << 31), (1 << 31) - 1, n).astype(np.int64)
        left[0], right[0] = (1 << 31) - 1, -(1 << 31)
        if asg == ChannelAssignment.LEFT_SIDE:
            s0, s1 = left, left - right
        elif asg == ChannelAssignment.SIDE_RIGHT:
            s0, s1 = left - right, right
        else:
            s0, s1 = (left + right) >> 1, left - right
        yield (f"wide-side-{name}", {"bps": 32},
               [FrameSpec(n, [SubframeSpec(VERBATIM, values=s0),
                              SubframeSpec(VERBATIM, values=s1)],
                          assignment=asg)])
    # 9. residual partitions
    yield ("partition-order-6", {},
           [FrameSpec(4096, [_fixed(4096, 2, 110, partition_order=6)])])
    yield ("partition-escape", {},
           [FrameSpec(1024, [_fixed(1024, 1, 111, partition_order=2,
                                    partition_kinds=["escape", "rice",
                                                     "escape", "rice"])])])
    res = np.zeros(1023, dtype=np.int64)
    res[:255] = _rng(112).integers(-50, 50, 255)
    yield ("partition-constant", {},
           [FrameSpec(1024, [SubframeSpec(
               FIXED, order=1, warmups=np.array([1000]), residuals=res,
               partition_order=2,
               partition_kinds=["rice", "constant", "constant",
                                "constant"])])])
    yield ("rice2-24bit", {"bps": 24},
           [FrameSpec(1024, [_fixed(1024, 2, 113, scale=100000, rice2=True,
                                    partition_order=1)])])
    yield ("rice-large-params", {"bps": 24},
           [FrameSpec(256, [SubframeSpec(
               FIXED, order=0, warmups=np.array([], dtype=np.int64),
               residuals=_rng(114).integers(-(1 << 20), 1 << 20, 256))])])
    # 10. subframe types / orders
    yield ("constant-subframes", {},
           [FrameSpec(2048, [SubframeSpec(CONSTANT, values=np.array([-12345])),
                             SubframeSpec(CONSTANT, values=np.array([0]))])])
    yield ("lpc-order-32", {},
           [FrameSpec(512, [_lpc(512, 32, 12, 120)])])
    yield ("lpc-shift0-precision4", {},
           [FrameSpec(256, [_lpc(256, 2, 0, 121, precision=4,
                                 coeffs=np.array([1, -1]), scale=30)])])
    yield ("mixed-subframe-types", {},
           [FrameSpec(1024, [SubframeSpec(CONSTANT, values=np.array([77])),
                             _verbatim(1024, 16, 122),
                             _fixed(1024, 3, 123),
                             _lpc(1024, 8, 10, 124)])])
    yield ("eight-channels", {},
           [FrameSpec(256, [_fixed(256, c % 5, 130 + c) for c in range(8)])])
    # 11. stream shapes
    yield ("short-last-frame", {},
           [FrameSpec(4096, [_fixed(4096, 2, 140)]),
            FrameSpec(4096, [_fixed(4096, 2, 141)]),
            FrameSpec(11, [_verbatim(11, 16, 142)])])
    yield ("single-sample-last", {},
           [FrameSpec(16, [_verbatim(16, 16, 143)]),
            FrameSpec(1, [_verbatim(1, 16, 144)])])
    yield ("undeclared-total", {"declare_total": False},
           [FrameSpec(512, [_fixed(512, 1, 150 + i)]) for i in range(5)])


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = {}
    total = 0
    for name, kw, frames in cases():
        data, pcm = build_stream(frames, **kw)
        path = os.path.join(OUT, name + ".flac")
        with open(path, "wb") as fp:
            fp.write(data)
        total += len(data)
        manifest[name + ".flac"] = {
            "pcm_md5": hashlib.md5(
                np.asarray(pcm, dtype="<i8").tobytes()).hexdigest(),
            "total_samples": int(len(pcm)),
            "bytes": len(data),
            "kwargs": {k: v for k, v in kw.items()},
        }
        print(f"{name}.flac: {len(data)} bytes, {len(pcm)} samples")
    with open(os.path.join(OUT, "manifest.json"), "w") as fp:
        json.dump(manifest, fp, indent=1, sort_keys=True)
    print(f"{len(manifest)} fixtures, {total} bytes total")


if __name__ == "__main__":
    main()
