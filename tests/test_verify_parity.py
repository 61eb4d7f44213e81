"""CI half of the one-shot parity verifier (VERDICT r4 item 4).

Runs tools/verify_parity.py's in-image checks — golden drift (decoded-PCM
MD5 + re-encoded frame-section MD5/size at documented default/best
Options vs PARITY_GOLDEN.json), structured byte-for-byte stream rebuild,
and full decode verify — over every reference fixture.  The external
halves (--flac-bin / --ref-examples) need binaries this image lacks.
"""

import json
import os
import sys

import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, os.path.join(REPO, "tools"))

FIXTURES = "/root/reference/tests/data"


@pytest.mark.skipif(not os.path.isdir(FIXTURES),
                    reason="reference fixtures unavailable")
def test_in_image_parity_checks():
    import verify_parity as vp

    with open(os.path.join(REPO, "PARITY_GOLDEN.json")) as f:
        golden = json.load(f)
    report = vp.Report()
    vp.run_in_image(FIXTURES, report, golden, vp._presets(), {})
    bad = [r for r in report.rows if not r[2]]
    assert not bad, bad
    # every fixture must have produced the full check set
    n_fixtures = len([n for n in os.listdir(FIXTURES)
                      if n.endswith(".flac")])
    assert len(report.rows) == n_fixtures * 5
