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

import jax as _jax

# On TPU, JAX's DEFAULT matmul precision demotes f32 dot operands to
# bfloat16 (8-bit mantissa).  This framework routes precision-critical
# values through small contractions everywhere — one-hot "gathers" of
# rotations/positions/double-single residuals, segmented-sum aggregation
# (incl. integer lane ids round-tripped through f32 dots), and the
# K=3 Möller–Trumbore matmuls of the dense intersector — so bf16
# demotion would silently break the 1e-6 power/phase contract and the
# path-match/emit bookkeeping ON TPU ONLY (the CPU test suite cannot
# see it).  Every contraction here is tiny-K or one-hot, far below MXU
# saturation, so full-f32 precision costs nothing measurable; the hot
# traversal kernel (Pallas, VPU) takes no dots and is unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

from rts_tpu.config import Parameters

__all__ = ["Parameters", "__version__"]
