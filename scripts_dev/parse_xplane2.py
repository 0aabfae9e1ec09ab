"""Per-line (queue) op sums from an xplane trace; async *-start ops
reported separately (their durations span overlapped work)."""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(path, top=20):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = plane.event_metadata
        for line in plane.lines:
            stats = defaultdict(float)
            counts = defaultdict(int)
            total = 0.0
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                # collapse ssa ids: %fusion.123 -> fusion
                m = re.match(r"%?([a-zA-Z_\-]+)", name)
                op = m.group(1) if m else name
                dur = ev.duration_ps / 1e6
                stats[op] += dur
                counts[op] += 1
                total += dur
            if total < 1.0:
                continue
            print(f"-- line '{line.name}' total {total/1e3:.2f} ms")
            for op, us in sorted(stats.items(), key=lambda kv: -kv[1])[:top]:
                print(f"   {us:10.1f} us x{counts[op]:5d}  {op}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 20)
