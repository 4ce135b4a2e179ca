"""Parse a jax.profiler xplane.pb into per-op device timings — no TF needed.

The TPU device trace written by `jax.profiler.start_trace` is an XSpace
protobuf; neither tensorflow's converter nor tensorboard_plugin_profile
works in this environment, so this decodes the protobuf wire format
directly (XSpace/XPlane/XLine/XEvent field numbers from xplane.proto) and
aggregates event durations by op name.

    python tools/parse_xplane.py /tmp/jaxtrace [steps]
"""

from __future__ import annotations

import glob
import sys
from collections import defaultdict


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's wire data."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:          # varint
            val, i = _varint(buf, i)
        elif wire == 1:        # 64-bit
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wire == 2:        # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:        # 32-bit
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"wire type {wire}")
        yield field, wire, val


def parse_event(buf: bytes) -> tuple[int, int]:
    meta_id = dur = 0
    for f, _, v in fields(buf):
        if f == 1:
            meta_id = v
        elif f == 3:
            dur = v
    return meta_id, dur


def parse_line(buf: bytes):
    # this runtime writes XLine.events at field 4 (older schema uses 7)
    for f, _, v in fields(buf):
        if f in (4, 7):
            yield parse_event(v)


def parse_event_metadata(buf: bytes) -> tuple[int, str]:
    mid, name = 0, ""
    for f, _, v in fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            name = v.decode("utf-8", "replace")
    return mid, name


def parse_plane(buf: bytes):
    name = ""
    lines = []
    meta: dict[int, str] = {}
    for f, _, v in fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(v)
        elif f == 4:   # map entry: key=1, value=2 (XEventMetadata)
            key = None
            val = b""
            for mf, _, mv in fields(v):
                if mf == 1:
                    key = mv
                elif mf == 2:
                    val = mv
            mid, mname = parse_event_metadata(val)
            meta[key if key is not None else mid] = mname
    return name, lines, meta


def op_times(trace_dir: str) -> dict[str, dict[str, float]]:
    """{plane_name: {op_name: total_ms}} for TPU device planes."""
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    out: dict[str, dict[str, float]] = {}
    buf = open(sorted(paths)[-1], "rb").read()
    for f, _, v in fields(buf):
        if f != 1:
            continue
        name, lines, meta = parse_plane(v)
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        agg: dict[str, float] = defaultdict(float)
        for line in lines:
            for mid, dur in parse_line(line):
                agg[meta.get(mid, str(mid))] += dur / 1e9  # ps -> ms
        out[name] = dict(agg)
    return out


def main() -> None:
    trace_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    for plane, agg in op_times(trace_dir).items():
        print(f"== {plane} ==")
        total = sum(agg.values())
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{ms / steps:9.3f} ms/step {100 * ms / total:5.1f}%  "
                  f"{name[:90]}")
        print(f"{total / steps:9.3f} ms/step total device time")


if __name__ == "__main__":
    main()
