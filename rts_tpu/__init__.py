"""rts_tpu — a TPU-native radar ray-tracing simulation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the RTS
radar ray tracer (reference: ymartin101/RTS, an NVIDIA OptiX 6 module),
plus the host-simulator surface (world model, antennas, RCS, responses)
that RTS assumes but does not ship.

Architecture (TPU-first, not a port):
  * ``core``      — vector math, rotations, dtype policy, ray-state pytrees.
  * ``geometry``  — rect / icosphere / file mesh generators, scene compiler.
  * ``accel``     — triangle clustering + AABB structures for traversal.
  * ``engine``    — wavefront tracer: SoA ray lanes, masked bounce loop.
  * ``ops``       — Pallas TPU kernels (clustered Möller–Trumbore, etc).
  * ``physics``   — radar equation, Doppler, phase, signal synthesis.
  * ``aggregate`` — multipath coherent combining (sort + segment reduce).
  * ``sim``       — World / Transmitter / Receiver / Target API + driver.
  * ``parallel``  — device-mesh helpers, pulse-axis ICI sharding.
  * ``oracle``    — slow NumPy float64 reference tracer (test oracle).
"""

__version__ = "0.1.0"

from rts_tpu.config import Parameters

__all__ = ["Parameters", "__version__"]
