"""Assert the 1e-6 power/phase contract ON the real TPU.

The CPU test suite proves the contract in interpret mode (tests/
test_replay.py), but Mosaic/XLA TPU codegen can differ from the CPU
lowering — the ds library's own FMA-contraction history (core/ds.py:
77-120) is exactly why "proved on CPU" is not "holds on TPU".  This
script traces a bench-style scene on the real chip with the FULL
production configuration (preset="production": clustered Pallas
traversal + candidate lists + ds replay + replay_cap), reads the
results back, and compares per-ray power and per-path phase to the
host float64 engine (itself oracle-parity-tested at rtol 1e-9,
tests/test_engine_vs_oracle.py).  Reference precision contract:
/root/reference/ray_tracer.h:13-28 (doubles end-to-end),
aggregation.cu:59-60 (double delay/phase).

Two processes are required: the f64 reference needs the CPU platform
with x64 enabled BEFORE jax initialises, while the production trace
needs the tunnelled TPU.  Run:

    python scripts/verify_contract.py --mode tpu   # trace on the chip
    python scripts/verify_contract.py --mode ref   # f64 compare (CPU)

or just `bash scripts/verify_contract.sh` (runs both, exits non-zero
on violation).  The measured maxima are recorded in docs/PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = "/tmp/rts_contract_tpu.npz"
TWO_PI = 6.283185307179586


def make_scene(num_pulses: int, refr: bool = False):
    from rts_tpu import Parameters
    from rts_tpu.sim import (
        AttitudePath, Path, RadarSignal, Receiver, RotationPath, Target,
        Transmitter, World,
    )

    w = World()
    w.add(
        Transmitter(
            name="tx0",
            path=Path.fixed(0, 0, 0),
            wave=RadarSignal(carrier=10e9),
            pulse_count=num_pulses,
            prf=1000.0,
            tx_span=(0.12, 0.12, 0.0),
        )
    )
    w.add(Receiver(name="rx0", path=Path.fixed(0, 0, 0), sphere=(25.0, 1.2, 1.2)))
    # moving icosphere + rotating plate: time-varying geometry breaks the
    # t=0 symmetry that can leave f32 ray lengths accidentally near-exact
    # refr variant: the ball moves OFF the boresight corridor so the
    # central rays reach the dielectric plate (and rx1 behind it)
    ball_y = 250.0 if refr else 0.0
    w.add(
        Target(
            name="ball",
            path=Path.linear([(0.0, (900.0, ball_y, 0.0)), (1.0, (950.0, ball_y + 4.0, 2.0))]),
            shape="sphere",
            sphere_params=(4, 40.0),
            refl_coeff=0.9,
        )
    )
    w.add(
        Target(
            name="plate",
            path=Path.fixed(1200, 30, 0),
            attitude=AttitudePath(yaw_rate=0.05),
            shape="rect",
            rect=(2.0, 120.0, 120.0),
            refl_coeff=0.5 if refr else 0.7,
            refr_index=1.5 if refr else 1.0,
        )
    )
    if refr:
        # forward receiver behind the dielectric plate catches exiting
        # refraction chains (trapped/exiting lane slots on hardware)
        # directly behind the plate on the boresight line: the exact
        # centre ray refracts straight through the slab into rx1
        w.add(
            Receiver(
                name="rx1",
                path=Path.fixed(2400, 0, 0),
                rotation=RotationPath(azimuth=3.141592653589793),
                sphere=(20.0, 1.5, 1.5),
            )
        )
    params = Parameters(num_rays=9, max_refl_depth=2, max_refr_depth=2 if refr else 0)
    return w, params


def run_tpu(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import check_replay_overflow, prepare_cpi

    w, params = make_scene(args.pulses, refr=args.refr)
    base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float32, preset="production")
    out = trace_cpi(base, batch, cfg, spec)
    counts = check_replay_overflow(out, cfg)
    platform = jax.devices()[0].platform
    np.savez(
        STATE,
        power=np.asarray(out.power, np.float64),
        received=np.asarray(out.received),
        agg_power=np.asarray(out.agg.power, np.float64),
        agg_phase=np.asarray(out.agg.phase, np.float64) + np.asarray(out.agg.phase_lo, np.float64),
        counts=counts,
        platform=np.asarray(platform),
    )
    print(
        f"traced {args.pulses} pulses on {platform!r} "
        f"(production config, {int((np.asarray(out.received) >= 0).sum())} received) -> {STATE}"
    )
    if platform not in ("tpu", "axon"):
        print("WARNING: not a TPU platform — this run does NOT validate TPU codegen", file=sys.stderr)


def run_ref(args):
    # CPU + x64 BEFORE jax initialises (same trap as tests/conftest.py)
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from rts_tpu.engine.cpi import trace_cpi
    from rts_tpu.sim import prepare_cpi

    got_tpu = np.load(STATE, allow_pickle=False)
    w, params = make_scene(args.pulses, refr=args.refr)
    base, batch, cfg, spec = prepare_cpi(w, params, dtype=jnp.float64)
    ref = trace_cpi(base, batch, cfg, spec)

    if args.refr:
        n3 = params.num_rays ** 3
        nref = int((np.asarray(ref.received)[:, n3:] >= 0).sum())
        assert nref > 0, "no refracted lanes received — dielectric variant vacuous"
        print(f"# refracted-lane receptions: {nref}")
    rec_ref = np.asarray(ref.received)
    rec_tpu = got_tpu["received"]
    np.testing.assert_array_equal(rec_tpu, rec_ref, err_msg="received (discrete decisions)")
    got = rec_ref >= 0
    n = int(got.sum())
    assert n > 0, "scene received nothing — vacuous"

    pw_ref = np.asarray(ref.power, np.float64)[got]
    rel_power = np.abs(got_tpu["power"][got] / pw_ref - 1.0).max()
    ag_ref = np.asarray(ref.agg.power, np.float64)[got]
    rel_agg = np.abs(got_tpu["agg_power"][got] / ag_ref - 1.0).max()
    ph_ref = np.asarray(ref.agg.phase, np.float64)[got]
    dph = np.abs(got_tpu["agg_phase"][got] - ph_ref)
    dph = np.minimum(dph, TWO_PI - dph).max()

    record = {
        "platform": str(got_tpu["platform"]),
        "received": n,
        "max_rel_power": float(rel_power),
        "max_rel_agg_power": float(rel_agg),
        "max_phase_rad": float(dph),
        "bar": 1e-6,
        "ok": bool(rel_power < 1e-6 and rel_agg < 1e-6 and dph < 1e-6),
    }
    print(json.dumps(record))
    if not record["ok"]:
        print("CONTRACT VIOLATED on-hardware", file=sys.stderr)
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("tpu", "ref"), required=True)
    ap.add_argument("--pulses", type=int, default=4)
    ap.add_argument("--refr", action="store_true", help="dielectric variant: refraction chains + forward Rx")
    args = ap.parse_args()
    (run_tpu if args.mode == "tpu" else run_ref)(args)


if __name__ == "__main__":
    main()
