"""Parse a jax.profiler xplane.pb into a per-op time table (no TF tooling).

The tensorboard_plugin_profile converter in this image is incompatible
with the installed TF, so this parses the XSpace proto directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2) and aggregates XEvent
durations by event name on the TPU op plane.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
           python tools/xplane_table.py <trace.xplane.pb> [top_n]
"""

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space


def table(space, top_n=40):
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        agg = collections.defaultdict(lambda: [0.0, 0])
        total = 0.0
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                # on TPU planes op events usually live on per-core lines;
                # accept any line whose events reference event_metadata
                pass
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                agg[(line.name, name)][0] += dur
                agg[(line.name, name)][1] += 1
        lines = collections.defaultdict(float)
        for (ln, _), (d, _) in agg.items():
            lines[ln] += d
        print(f"== plane: {plane.name}")
        for ln, d in sorted(lines.items(), key=lambda kv: -kv[1]):
            print(f"   line {ln!r}: {d:.3f} ms total")
        for pick in lines:
            rows = [(d, n, ln, c) for (ln, n), (d, c) in agg.items()
                    if ln == pick]
            rows.sort(reverse=True)
            total = sum(r[0] for r in rows)
            print(f"   -- top ops on {pick!r} (total {total:.3f} ms) --")
            for d, n, ln, c in rows[:top_n]:
                print(f"   {d:9.3f} ms {100*d/total:5.1f}%  x{c:<5d} {n[:130]}")


if __name__ == "__main__":
    space = load(sys.argv[1])
    table(space, int(sys.argv[2]) if len(sys.argv) > 2 else 40)
