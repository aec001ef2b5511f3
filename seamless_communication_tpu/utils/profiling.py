"""Tracing/profiling utilities — the TPU counterpart of the reference's native-side
Tracy integration and GGML_PERF op timers (SURVEY.md §5: ggml/Makefile:10-24,
CMakeLists GGML_PERF). Wraps jax.profiler (xprof/Perfetto traces) and provides a
lightweight stage timer for host-side pipelines."""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/seamless_trace",
                 annotate: Optional[str] = None) -> Iterator[None]:
    """Capture an xprof/Perfetto trace of everything inside the block.
    View with xprof or `perfetto` on the generated .pb files."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", log_dir)


def annotate(name: str):
    """Decorator: name a function's device work in traces."""
    import jax

    def deco(fn):
        def wrapped(*a, **k):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)
        return wrapped
    return deco


class StageTimer:
    """Host-side stage timing with device sync (the GGML_PERF analog).
    Forces a tiny device_get on a pytree leaf per stage so remote platforms
    (axon tunnel) actually synchronize."""

    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                import jax
                leaf = jax.tree.leaves(sync_value)
                if leaf:
                    np.asarray(leaf[0]).ravel()[:1]
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {k: {"p50_ms": float(np.median(v) * 1000),
                    "mean_ms": float(np.mean(v) * 1000),
                    "n": len(v)}
                for k, v in self.times.items()}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


# ---------------------------------------------------------------------------
# xplane trace aggregation (no tensorflow/tensorboard dependency)
# ---------------------------------------------------------------------------
#
# jax.profiler writes xplane.pb protos (tensorflow.profiler.XSpace). The
# tooling to read them (tensorboard-plugin-profile) is heavyweight and absent
# from lean images, so this is a minimal protobuf wire-format reader for the
# subset needed to answer "where did device time go": planes -> lines ->
# events (metadata_id, duration_ps) + the event-metadata name table.

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message body.
    Length-delimited values are returned as bytes; varints as ints."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == 5:
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        elif wire == 1:
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        else:  # groups (3/4) don't occur in xplane
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def aggregate_xplane(path: str, *, plane_substr: str = "TPU",
                     line_name: Optional[str] = "XLA Ops",
                     top: int = 30) -> list:
    """Aggregate device time per op name from an ``*.xplane.pb`` trace.

    Returns [(total_ms, count, op_name)] sorted by time, for events on planes
    whose name contains ``plane_substr`` (and lines matching ``line_name``,
    if given). Typical use::

        with device_trace("/tmp/t"):
            run_once()
        for ms, n, name in aggregate_xplane(glob("/tmp/t/**/*.xplane.pb")[0]):
            print(f"{ms:9.2f} ms {n:6d}x  {name}")
    """
    space = open(path, "rb").read()
    agg: Dict[str, list] = defaultdict(lambda: [0, 0])
    for f, w, plane in _fields(space):
        if f != 1:        # XSpace.planes
            continue
        name = b""
        metas: Dict[int, str] = {}
        lines = []
        for pf, pw, pv in _fields(plane):
            if pf == 2:   # XPlane.name
                name = pv
            elif pf == 3:  # XPlane.lines
                lines.append(pv)
            elif pf == 4:  # XPlane.event_metadata map entry
                mid, mname = 0, b""
                for ef, ew, ev in _fields(pv):
                    if ef == 1:
                        mid = ev
                    elif ef == 2:  # XEventMetadata
                        for mf, mw, mv in _fields(ev):
                            if mf == 1:
                                mid = mv
                            elif mf == 2:
                                mname = mv
                metas[mid] = mname.decode("utf-8", "replace")
        if plane_substr not in name.decode("utf-8", "replace"):
            continue
        for line in lines:
            lname = b""
            events = []
            for lf, lw, lv in _fields(line):
                if lf == 2:
                    lname = lv
                elif lf == 4:
                    events.append(lv)
            if line_name and lname.decode("utf-8", "replace") != line_name:
                continue
            for ev in events:
                mid = dur = 0
                for ef, ew, ev_v in _fields(ev):
                    if ef == 1:
                        mid = ev_v
                    elif ef == 3:
                        dur = ev_v
                a = agg[metas.get(mid, str(mid))]
                a[0] += dur
                a[1] += 1
    out = sorted(((ps / 1e9, n, name) for name, (ps, n) in agg.items()),
                 reverse=True)
    return out[:top] if top else out
