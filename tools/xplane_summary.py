"""Summarize a jax.profiler xplane.pb trace without tensorboard.

The tensorboard profile plugin in this image can't load (protobuf codegen
mismatch), so this parses the XSpace wire format directly (the proto schema
is tsl/profiler/protobuf/xplane.proto) and prints per-line (thread) op time
totals for the TPU device plane — leaf "XLA Ops" events, not the nested
trace-viewer rows.

Usage: python tools/xplane_summary.py <trace.xplane.pb> [n_iters]
"""
import struct
import sys
from collections import defaultdict


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message's wire bytes."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", buf[i:i + 4])[0]
            i += 4
        elif wt == 1:
            v = struct.unpack("<Q", buf[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode()
        elif fn == 3 and wt == 2:
            lines.append(v)
        elif fn == 4 and wt == 2:  # map entry: key=1 varint, value=2 msg
            k = None
            m = None
            for fn2, wt2, v2 in _fields(v):
                if fn2 == 1:
                    k = v2
                elif fn2 == 2:
                    m = v2
            if m is not None:
                mname = ""
                for fn3, wt3, v3 in _fields(m):
                    if fn3 == 2 and wt3 == 2:
                        mname = v3.decode()
                meta[k] = mname
    return name, lines, meta


def parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode()
        elif fn == 4 and wt == 2:
            events.append(v)
    return name, events


def parse_event(buf):
    mid = dur = 0
    for fn, wt, v in _fields(buf):
        if fn == 1:
            mid = v
        elif fn == 3:
            dur = v
    return mid, dur


def main():
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    space = open(path, "rb").read()
    for fn, wt, plane_buf in _fields(space):
        if fn != 1:
            continue
        pname, lines, meta = parse_plane(plane_buf)
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        for line_buf in lines:
            lname, events = parse_line(line_buf)
            tot = defaultdict(lambda: [0.0, 0])
            for ev in events:
                mid, dur = parse_event(ev)
                t = tot[meta.get(mid, str(mid))]
                t[0] += dur
                t[1] += 1
            whole = sum(v[0] for v in tot.values())
            if not whole:
                continue
            print(f"=== plane '{pname}' line '{lname}': "
                  f"{whole / 1e9 / iters:.3f} ms/iter over {iters} iters")
            items = sorted(tot.items(), key=lambda kv: -kv[1][0])
            for name, (ps, n) in items[:30]:
                print(f"{ps / 1e9 / iters:9.4f} ms  n={n / iters:6.1f}  "
                      f"{100 * ps / whole:5.1f}%  {name[:95]}")


if __name__ == "__main__":
    main()
