"""Round-4 encode-step ablation profile (VERDICT r3 items 2 and 8).

Times the full device encode step and its ablations under the honest
fence (dependency-chained dispatch + scalar-download sync, bench.py
methodology), so the 25.9 ms/batch round-3 cost can be attributed and
the 24-bit/f64 rows in BASELINE.md re-measured honestly:

  full        frame_pack=True, pack_budget=18 (the production step)
  pack_off    same planner, residual packing only (no frame bodies/CRC)
  plan_only   pack_budget=0 (no device packing at all)
  B sweep     full step at B=256/512/1024 (latency- vs throughput-bound)
  24bit       full step on 24-bit PCM (rice2 path)
  f64         full step in f64 parity mode

Usage: python tools/profile_r4.py [quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import device_step_mbps
from flac_codec_tpu.encode import Options


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    opts = Options.best().no_seektable()
    reps, chain = (2, 4) if quick else (3, 8)

    def run(name, **kw):
        t0 = time.time()
        mbps, ms = device_step_mbps(opts, reps=reps, chain=chain, **kw)
        print(f"{name:28s} {ms:9.3f} ms/batch  {mbps:9.1f} MB/s "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return ms

    b = int(os.environ.get("FLAC_TPU_PROF_BATCH", "256"))
    full = run("full B=%d" % b, batch_frames=b, analysis="f32",
               pack_budget=18, frame_pack=True)
    pack_off = run("pack_off (residual pack)", batch_frames=b,
                   analysis="f32", pack_budget=18, frame_pack=False)
    plan_only = run("plan_only (no pack)", batch_frames=b, analysis="f32",
                    pack_budget=0, frame_pack=False)
    print(f"-> frame-body pack cost {full-pack_off:7.3f} ms; "
          f"residual pack cost {pack_off-plan_only:7.3f} ms", flush=True)

    if not quick:
        for b2 in (512, 1024):
            run("full B=%d" % b2, batch_frames=b2, analysis="f32",
                pack_budget=18, frame_pack=True)
        run("24-bit rice2 B=%d" % b, batch_frames=b, analysis="f32",
            pack_budget=26, frame_pack=True, bits_per_sample=24)
        run("f64 parity B=%d" % b, batch_frames=b, analysis="f64",
            pack_budget=18, frame_pack=True)


if __name__ == "__main__":
    main()
