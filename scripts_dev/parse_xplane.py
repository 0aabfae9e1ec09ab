"""Dump per-op device time sums from a jax.profiler xplane trace."""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(path, top=25):
    xs = load(path)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        stats = defaultdict(float)
        counts = defaultdict(int)
        evmeta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                stats[name] += ev.duration_ps / 1e6  # us
                counts[name] += 1
        print(f"== plane {plane.name} ({len(stats)} distinct ops)")
        for name, us in sorted(stats.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {us:10.1f} us  x{counts[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
