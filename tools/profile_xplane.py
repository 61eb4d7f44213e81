"""Op-level XLA profile of the production encode step (round 5).

Captures a jax.profiler trace of the scan-chained production step
(encode_frames_plan_blob, frame_pack, slim) on the live backend, then
parses the xplane with tensorboard_plugin_profile into a per-HLO-op time
table — the ground truth for where the step's milliseconds go
(tools/profile_stages_scan.py measures stages in isolation; this measures
them fused in situ).

Usage: python tools/profile_xplane.py [B] [chain]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from bench import make_audio
from flac_codec_tpu.encode import Options
from flac_codec_tpu.ops.encode_batch import encode_frames_plan_blob

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CHAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N = 4096


def main():
    opts = Options.best().no_seektable()
    inter = make_audio(N * B)
    pcm = np.ascontiguousarray(
        inter.reshape(B, N, 2).transpose(0, 2, 1)).astype(np.int16)
    kw = dict(bits_per_sample=16, block_size=N,
              max_lpc_order=opts.max_lpc_order,
              max_partition_order=opts.max_partition_order,
              mid_side=opts.mid_side,
              exhaustive=opts.exhaustive_channel_correlation,
              analysis="f32", pack_budget=18, frame_pack=True, slim=True)

    def one(x):
        blob = encode_frames_plan_blob(x, **kw)
        return x ^ (blob.astype(jnp.int32).sum() & 1).astype(x.dtype)

    @jax.jit
    def step(x):
        return jax.lax.scan(lambda c, _: (one(c), None), x, None,
                            length=CHAIN)[0]

    x = jnp.asarray(pcm)
    x = step(x)
    float(jnp.abs(x).sum())
    t0 = time.time()
    x = step(x)
    float(jnp.abs(x).sum())
    per = (time.time() - t0) / CHAIN
    print(f"warm step: {per*1e3:.3f} ms/step "
          f"({B*N*2*2/1e6/per:.1f} MB/s)", flush=True)

    logdir = "/tmp/flac_xprof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        x = step(x)
        float(jnp.abs(x).sum())

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    # The tensorboard_plugin_profile converter is incompatible with the
    # installed TF; parse the XSpace proto directly instead.
    from xplane_table import load, table
    table(load(xplanes[0]), top_n=50)


if __name__ == "__main__":
    main()
