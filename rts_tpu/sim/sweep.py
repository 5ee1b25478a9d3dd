"""Monte-Carlo / parameter sweep runner with checkpointing.

The reference has no checkpoint or multi-run machinery (SURVEY.md §5);
production sweeps need both.  A sweep is a list of named cases (scene
builders); each case's traced CPI is written to ``<dir>/<name>.npz`` as
it completes, so an interrupted sweep resumes for free, and independent
cases can be partitioned across hosts (DCN-level parallelism) with
``shard=(i, n)`` — case k runs on host i iff k % n == i.  Within a host,
each case can still shard its pulse/ray axes over the ICI mesh.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, List, Optional, Sequence, Tuple

from rts_tpu.config import Parameters
from rts_tpu.sim.cpi import prepare_cpi
from rts_tpu.sim.export import save_cpi
from rts_tpu.sim.world import World


@dataclasses.dataclass
class SweepCase:
    name: str
    build: Callable[[], Tuple[World, Parameters]]  # fresh world per case


@dataclasses.dataclass
class SweepReport:
    completed: List[str]
    skipped: List[str]
    seconds: float


def run_sweep(
    cases: Sequence[SweepCase],
    out_dir: str,
    *,
    shard: Tuple[int, int] = (0, 1),
    mesh=None,  # optional jax Mesh: shard each case's pulses/rays over ICI
    accel: str = "brute",
    overwrite: bool = False,
    trace_kwargs: Optional[dict] = None,
) -> SweepReport:
    """Run every case assigned to this shard, checkpointing as we go."""
    from rts_tpu.engine.cpi import trace_cpi

    os.makedirs(out_dir, exist_ok=True)
    me, n = shard
    t0 = time.time()
    completed, skipped = [], []
    kw = dict(trace_kwargs or {})

    for k, case in enumerate(cases):
        if k % n != me:
            continue
        path = os.path.join(out_dir, f"{case.name}.npz")
        if os.path.exists(path) and not overwrite:
            skipped.append(case.name)
            continue
        world, params = case.build()
        base, batch, cfg, spec = prepare_cpi(world, params, accel=accel, **kw)
        if mesh is not None:
            from rts_tpu.parallel import shard_batch, trace_cpi_sharded

            out = trace_cpi_sharded(base, shard_batch(batch, mesh), cfg, spec, mesh)
        else:
            out = trace_cpi(base, batch, cfg, spec)
        tmp = path + ".tmp.npz"
        save_cpi(tmp, out, times=batch.times)
        os.replace(tmp, path)
        completed.append(case.name)

    return SweepReport(completed=completed, skipped=skipped, seconds=time.time() - t0)
