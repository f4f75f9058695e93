"""Per-stage timing instrumentation.

Replicates the reference's hand-rolled profiling (SURVEY.md §5): named
microsecond spans collected in per-stage vectors and reduced to
mean/stddev at shutdown (reference mean_stddev_time, src/LoopClosing.cpp:
3-14; reports at src/System.cpp:244-258, LocalMapping.cpp:729-741,
LoopClosing.cpp:766-780). Stage names mirror the reference printouts so
logs are comparable side by side. A `jax.profiler` trace can be layered
on via `trace()` for device-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
# The reference's 20 stage names (tracking 7, local mapping 6, loop 7)
TRACKING_STAGES = (
    "ORB extraction",
    "Stereo matching",
    "Pose prediction",
    "Relocalization",
    "Local map tracking",
    "New keyframe decision",
    "New keyframe creation",
)
LOCAL_MAPPING_STAGES = (
    "Keyframe insertion",
    "Map point culling",
    "Map point creation",
    "Map point fusion",
    "Local BA",
    "Keyframe culling",
)
LOOP_CLOSING_STAGES = (
    "Loop detection",
    "Sim3 computation",
    "Sim3 detection",
    "Loop fusion",
    "Essential graph",
    "Global BA",
    "Graph update",
)


class StageTimers:
    def __init__(self):
        self.samples: "OrderedDict[str, List[float]]" = OrderedDict()

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append(
                (time.perf_counter() - t0) * 1e6
            )

    def add(self, name: str, micros: float):
        self.samples.setdefault(name, []).append(micros)

    def mean_stddev(self, name: str):
        v = self.samples.get(name, [])
        if not v:
            return 0.0, 0.0
        n = len(v)
        mean = sum(v) / n
        var = sum((x - mean) ** 2 for x in v) / n
        return mean, var**0.5

    def report(self) -> str:
        """Shutdown report in the reference's format (System.cpp:244-258)."""
        lines = ["TIME STATS (microseconds): mean +- stddev [n]"]
        for name, v in self.samples.items():
            mean, std = self.mean_stddev(name)
            lines.append(f"  {name}: {mean:.1f} +- {std:.1f} [{len(v)}]")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Optional jax.profiler trace around a region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
