"""Sweep runner: sharding, checkpointing, resume."""

from rts_tpu import Parameters
from rts_tpu.sim.export import load_cpi
from rts_tpu.sim.sweep import SweepCase, run_sweep

from test_driver import make_world


def _cases(n):
    def mk(speed):
        return lambda: (make_world(target_speed=speed), Parameters(num_rays=1, max_refl_depth=2))

    return [SweepCase(name=f"v{k}", build=mk(float(10 * k))) for k in range(n)]


def test_shard_partition_and_resume(tmp_path):
    cases = _cases(4)
    out = str(tmp_path)

    r0 = run_sweep(cases, out, shard=(0, 2))
    assert r0.completed == ["v0", "v2"]
    r1 = run_sweep(cases, out, shard=(1, 2))
    assert r1.completed == ["v1", "v3"]

    # resume: everything checkpointed, nothing re-runs
    r2 = run_sweep(cases, out, shard=(0, 1))
    assert r2.completed == []
    assert sorted(r2.skipped) == ["v0", "v1", "v2", "v3"]

    data = load_cpi(f"{out}/v3.npz")
    assert (data["received"] >= 0).sum() > 0
    assert "times" in data
