"""Minimal XSpace (.xplane.pb) parser: per-op device time aggregation.

The tensorboard profile plugin in this image cannot convert xplane files
(TF/protobuf version mismatch), so this decodes the protobuf wire format
directly — just enough schema for op-time tables:

  XSpace.planes(1) -> XPlane{name(2), lines(3), event_metadata(4 map)}
  XLine{name(2), events(4)} ; XEvent{metadata_id(1), duration_ps(3)}
  XEventMetadata{id(1), name(2)}

Usage: python benchmarks/xplane_ops.py <trace.xplane.pb> [steps] [top_n]
Durations print as ms per step (divide by `steps` repetitions traced).
"""

import collections
import struct
import sys


def _varint(buf, i):
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode()
        elif fn == 3 and wt == 2:
            lines.append(v)
        elif fn == 4 and wt == 2:
            # map entry: key(1)=int64, value(2)=XEventMetadata
            k = None
            m = None
            for fn2, _, v2 in fields(v):
                if fn2 == 1:
                    k = v2
                elif fn2 == 2:
                    m = v2
            if m is not None:
                mname = ""
                mid = k
                for fn3, wt3, v3 in fields(m):
                    if fn3 == 1:
                        mid = v3
                    elif fn3 == 2 and wt3 == 2:
                        mname = v3.decode()
                meta[mid] = mname
    return name, lines, meta


def plane_op_times(buf):
    """-> (plane_name, Counter[op -> ps], Counter[op -> count])"""
    name, lines, meta = parse_plane(buf)
    tot = collections.Counter()
    cnt = collections.Counter()
    for line in lines:
        for fn, wt, v in fields(line):
            if fn == 4 and wt == 2:           # XEvent
                mid = dur = 0
                for fn2, _, v2 in fields(v):
                    if fn2 == 1:
                        mid = v2
                    elif fn2 == 3:
                        dur = v2
                op = meta.get(mid, str(mid))
                tot[op] += dur
                cnt[op] += 1
    return name, tot, cnt


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    buf = open(path, "rb").read()
    for fn, wt, v in fields(buf):
        if fn != 1 or wt != 2:
            continue
        name, tot, cnt = plane_op_times(v)
        if not tot:
            continue
        total_ms = sum(tot.values()) / 1e9 / steps
        print(f"== plane {name!r}: total {total_ms:.3f} ms/step "
              f"(line-summed; overlapping lines double-count)")
        for op, ps in tot.most_common(top):
            print(f"  {ps / 1e9 / steps:8.4f} ms x{cnt[op] // steps:4d}  {op[:100]}")


if __name__ == "__main__":
    main()
