"""Profiling / tracing utilities.

The reference's observability is printf-level (SURVEY §5: compile-time LOG
macros defaulting to no-ops, per-frame stdout checksums, and debug-posture
cudaDeviceSynchronize after every launch). The TPU-native replacement is the
XLA profiler: device traces viewable in xprof/TensorBoard, plus lightweight
wall-clock stage timers for quick printf-style numbers.

Usage:
    with device_trace("/tmp/trace"):          # jax.profiler trace
        droid.track(...)

    timers = StageTimers()
    with timers.time("frontend"):
        ...
    print(timers.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (open with xprof / tensorboard).

    Fences pending work on entry/exit so the trace covers exactly the body.
    """
    import jax

    (jax.effects_barrier if hasattr(jax, "effects_barrier") else lambda: None)()
    with jax.profiler.trace(logdir):
        yield
        # stream fence: a trivial op enqueued after the traced work completes
        # only once everything before it has, so async dispatches land inside
        # the trace window
        jax.block_until_ready(jax.numpy.zeros(()))


class StageTimers:
    """Named wall-clock accumulators for pipeline stages."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync=None) -> Iterator[None]:
        """Time a stage; pass `sync=array_or_fn` to fence device work."""
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync() if callable(sync) else sync)
            self.total[name] += time.perf_counter() - start
            self.count[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.total, key=lambda k: -self.total[k]):
            t, n = self.total[name], self.count[name]
            lines.append(
                f"{name:24s} {t:8.3f}s total  {1e3 * t / max(n, 1):8.2f} ms/call  x{n}"
            )
        return "\n".join(lines)
