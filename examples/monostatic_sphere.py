"""Minimal end-to-end example: monostatic radar, moving sphere, one CPI.

Run:  PYTHONPATH=. python examples/monostatic_sphere.py
"""

import numpy as np

from rts_tpu import Parameters
from rts_tpu.sim import (
    Path,
    RadarSignal,
    Receiver,
    RenderGrid,
    Target,
    Transmitter,
    World,
    render_cpi_result,
    run_cpi,
)
from rts_tpu.sim.export import save_cpi

C = 299792458.0


def main():
    world = World()
    world.add(
        Transmitter(
            name="tx0",
            path=Path.fixed(0, 0, 0),
            wave=RadarSignal(carrier=10e9),
            pulse_count=32,
            prf=1000.0,
            tx_span=(0.1, 0.1, 0.0),
        )
    )
    world.add(Receiver(name="rx0", path=Path.fixed(0, 0, 0), sphere=(10.0, 1.0, 1.0)))
    world.add(
        Target(
            name="ball",
            shape="sphere",
            sphere_params=(4, 20.0),
            path=Path.linear([(0.0, (900.0, 0.0, 0.0)), (1.0, (905.0, 0.0, 0.0))]),
            refl_coeff=0.9,
        )
    )

    params = Parameters(num_rays=9, max_refl_depth=2)
    out = run_cpi(world, params, attach_responses=False)

    received = int(np.sum(np.asarray(out.received) >= 0))
    print(f"received rays across CPI: {received}")

    grid = RenderGrid(sample_rate=50e6, num_samples=512, window_start=5.5e-6)
    rd, _ = render_cpi_result(out, rx_index=0, grid=grid, pulse_length=2e-8)
    rd = np.asarray(rd)
    row, col = np.unravel_index(np.argmax(rd), rd.shape)
    rng_m = (grid.window_start + col / grid.sample_rate) * C / 2
    prf, p = 1000.0, rd.shape[0]
    fd = (row - p // 2) * prf / p
    print(f"range-Doppler peak: ~{rng_m:.0f} m, {fd:+.0f} Hz Doppler")

    save_cpi("/tmp/cpi_result.npz", out)
    print("saved /tmp/cpi_result.npz")


if __name__ == "__main__":
    main()
