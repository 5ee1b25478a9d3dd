"""Phase timing + profiling scaffolding.

The reference's observability is gettimeofday printfs around setup /
kernel / post-processing / aggregation (ray_tracer.cpp:1156-1170,
1329-1332; aggregation.cu:137-166).  ``PhaseTimer`` is the structured
equivalent; ``trace_annotation`` adds named regions to ``jax.profiler``
traces so device timelines show simulation phases.

Note: over a tunnelled/remote device ``block_until_ready`` may return at
enqueue time — pass a small array to ``PhaseTimer.stop(sync=...)`` to
force a readback-synchronised measurement.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, List, Optional


@dataclasses.dataclass
class PhaseTimer:
    """Accumulating named-phase wall-clock timer."""

    totals: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)
    _order: List[str] = dataclasses.field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                _sync(sync)
            dt = time.perf_counter() - t0
            if name not in self.totals:
                self.totals[name] = 0.0
                self.counts[name] = 0
                self._order.append(name)
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in self._order:
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name}: {tot:.4f}s total, {n} calls, {tot / n:.4f}s avg")
        return "\n".join(lines)

    def rays_per_second(self, phase: str, rays: int) -> Optional[float]:
        tot = self.totals.get(phase)
        return rays / tot if tot else None


def _sync(x):
    """Force completion via scalar readback (reliable over tunnels)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.asarray(leaves[0]).ravel()[0])


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in jax.profiler traces (no-op if profiler inactive)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
