"""One-off honest encode-step measurement (bench.py methodology).

Usage: python tools/measure_step_once.py [B] [analysis] [pack_budget]
                                         [frame_pack 0/1] [chain] [reps]
Prints one line: step ms/batch + MB/s.  Use between optimizations to
check a single change without re-running the whole battery.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import device_step_mbps
from flac_codec_tpu.encode import Options


def main():
    a = sys.argv[1:]
    B = int(a[0]) if len(a) > 0 else 256
    analysis = a[1] if len(a) > 1 else "f32"
    budget = int(a[2]) if len(a) > 2 else 18
    frame_pack = (a[3] != "0") if len(a) > 3 else True
    chain = int(a[4]) if len(a) > 4 else 8
    reps = int(a[5]) if len(a) > 5 else 2
    opts = Options.best().no_seektable()
    mbps, ms = device_step_mbps(opts, B, analysis, pack_budget=budget,
                                reps=reps, chain=chain, frame_pack=frame_pack)
    print(f"B={B} {analysis} budget={budget} frame_pack={frame_pack}: "
          f"{ms:.3f} ms/batch  {mbps:.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
