"""Top individual sync ops with full HLO names."""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(path, match="", top=25):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            stats = defaultdict(float)
            counts = defaultdict(int)
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                if match and match not in name:
                    continue
                stats[name] += ev.duration_ps / 1e6
                counts[name] += 1
            for name, us in sorted(stats.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{us:9.1f} us x{counts[name]:4d}  {name[:160]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "",
         int(sys.argv[3]) if len(sys.argv) > 3 else 25)
