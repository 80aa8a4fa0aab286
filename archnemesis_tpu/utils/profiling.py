"""Tracing/profiling subsystem (greenfield — the reference has none beyond
wall-clock brackets, SURVEY §5; ``Retrievals.py:78,331-333``).

Three layers:
- ``trace(logdir)``: wraps ``jax.profiler.trace`` so a whole retrieval can
  be captured for TensorBoard/XProf (TPU timeline, HLO, memory viewer).
- ``annotate(name)``: named region inside a trace
  (``jax.profiler.TraceAnnotation``), for marking forward / jacobian /
  OE-update phases.
- ``stopwatch(name)`` + the module-level ``timings`` registry: lightweight
  wall-clock stage timing that synchronises on device results
  (block_until_ready) so the numbers mean what they say under async
  dispatch. Zero overhead when unused; no global state besides the
  registry.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator, List


class Timings:
    """Accumulates named wall-clock samples: ``timings.report()``."""

    def __init__(self) -> None:
        self._samples: Dict[str, List[float]] = defaultdict(list)

    def add(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def clear(self) -> None:
        self._samples.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            out[name] = {
                "count": len(xs),
                "total_s": sum(xs),
                "mean_s": sum(xs) / len(xs),
                "min_s": min(xs),
                "max_s": max(xs),
            }
        return out

    def report(self) -> str:
        rows = sorted(
            self.summary().items(), key=lambda kv: -kv[1]["total_s"]
        )
        lines = [f"{'stage':<40} {'n':>5} {'total':>10} {'mean':>10}"]
        for name, s in rows:
            lines.append(
                f"{name:<40} {s['count']:>5d} {s['total_s']:>9.3f}s "
                f"{s['mean_s']:>9.4f}s"
            )
        return "\n".join(lines)


timings = Timings()


def _sync(value: Any) -> None:
    """block_until_ready every array in a pytree (no-op for host values)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(value):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


@contextlib.contextmanager
def stopwatch(name: str, result: Any = None,
              registry: Timings = None) -> Iterator[None]:
    """Time a block; pass ``result=`` (or set ``box[0]`` inside) to
    synchronise on device values before stopping the clock."""
    reg = registry if registry is not None else timings
    t0 = time.perf_counter()
    box: list = [result]
    try:
        yield box
    finally:
        if box[0] is not None:
            _sync(box[0])
        reg.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in a captured profile (TraceAnnotation); harmless
    outside a trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device profile into ``logdir`` (view with TensorBoard's
    profile plugin / XProf)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> Dict[str, Dict[str, int]]:
    """Per-device allocator stats (bytes_in_use / peak / limit) where the
    backend exposes them (TPU does; CPU returns {})."""
    import jax

    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, float))
            }
    return out
