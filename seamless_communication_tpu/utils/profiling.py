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
