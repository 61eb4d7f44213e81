"""Pipeline stage tracing (VERDICT r1 item 9).

Set ``FLAC_TPU_TRACE=1`` to log per-batch stage timings (upload / plan /
download / assemble / write, decode parse / reconstruct) to stderr, or
``FLAC_TPU_TRACE=/path/file.jsonl`` to append one JSON object per stage
event instead.  Set ``FLAC_TPU_PROFILE_DIR=/path`` to additionally
capture a ``jax.profiler`` device trace for the lifetime of each batch
pipeline (view with TensorBoard / xprof).

Zero overhead when disabled: ``stage()`` returns a no-op context manager
resolved once at import.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Optional

_MODE = os.environ.get("FLAC_TPU_TRACE", "")
_PROFILE_DIR = os.environ.get("FLAC_TPU_PROFILE_DIR", "")


def enabled() -> bool:
    return bool(_MODE)


class _StageTimer:
    __slots__ = ("name", "meta", "t0")

    def __init__(self, name: str, meta: dict):
        self.name = name
        self.meta = meta

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        emit(self.name, dt, **self.meta)


@contextlib.contextmanager
def _noop():
    yield


def stage(name: str, **meta):
    """Context manager timing one pipeline stage (no-op when disabled)."""
    if not _MODE:
        return _noop()
    return _StageTimer(name, meta)


def emit(name: str, seconds: float, **meta) -> None:
    """Record one stage event."""
    if not _MODE:
        return
    rec = {"stage": name, "ms": round(seconds * 1e3, 3), **meta}
    if _MODE == "1":
        print(f"[flac-tpu-trace] {rec['stage']}: {rec['ms']} ms "
              + " ".join(f"{k}={v}" for k, v in meta.items()),
              file=sys.stderr)
    else:
        with open(_MODE, "a") as fp:
            fp.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def profiler_session(label: str):
    """jax.profiler trace capture for a pipeline lifetime when
    FLAC_TPU_PROFILE_DIR is set (no-op otherwise)."""
    if not _PROFILE_DIR:
        yield
        return
    import jax

    path = os.path.join(_PROFILE_DIR, label)
    os.makedirs(path, exist_ok=True)
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
