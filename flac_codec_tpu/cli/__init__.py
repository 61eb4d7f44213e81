"""CLI tool suite mirroring the reference's 14 example programs
(reference: examples/*.rs; SURVEY §2.6).

Run as ``python -m flac_codec_tpu.cli <tool> [args...]`` or via the
per-tool modules (``python -m flac_codec_tpu.cli.wav2flac ...``).
"""

from __future__ import annotations

import sys

TOOLS = {
    "wav2flac": "wav2flac",
    "flac2wav": "flac2wav",
    "flac-info": "flac_info",
    "flac-analyze": "flac_analyze",
    "flac-verify": "flac_verify",
    "flac-tag": "flac_tag",
    "flac-cat": "flac_cat",
    "flac-split": "flac_split",
    "flac-play": "flac_play",
    "flac-resample": "flac_resample",
    "flac-add-cover": "flac_add_cover",
    "flac-view-artwork": "flac_view_artwork",
    "flac-import-cuesheet": "flac_import_cuesheet",
    "flac-export-cuesheet": "flac_export_cuesheet",
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: flac-codec-tpu <tool> [args...]\ntools:")
        for name in TOOLS:
            print(f"  {name}")
        return 0
    tool = argv[0]
    if tool not in TOOLS:
        print(f"unknown tool {tool!r}", file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(f".{TOOLS[tool]}", __name__)
    try:
        return mod.main(argv[1:]) or 0
    except Exception as e:
        # every tool reports clean single-line diagnostics for expected
        # failures (missing/unreadable files, invalid streams) like the
        # reference examples do; anything else is a real bug and keeps
        # its traceback
        from ..errors import FlacError

        if isinstance(e, (OSError, FlacError, ValueError)):
            print(f"{tool}: {e}", file=sys.stderr)
            return 1
        raise


if __name__ == "__main__":
    raise SystemExit(main())
