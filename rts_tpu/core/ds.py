"""Double-single (two-float) arithmetic for TPU extended precision.

TPU float64 is emulated and slow; the reference is double-precision
end-to-end (SURVEY.md §2.5 — OptiX forces float rays, all bookkeeping is
double).  These error-free-transformation primitives represent a value as
an unevaluated f32 pair (hi, lo) with hi = fl(hi + lo), giving ~49 bits
of effective mantissa on f32 hardware.

Planned use (docs/CLAUDE.md roadmap): refine the traversal kernel's
winning-hit distance per lane, accumulate ray length, and convert
delay/phase, so the 1e-6 phase bar holds on-chip without f64 emulation.

Algorithms: Knuth TwoSum, Dekker split/TwoProd (FMA-free forms — the
availability of a hardware FMA through XLA is not guaranteed at f32).
All functions are shape-polymorphic jnp and work under jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DS(NamedTuple):
    """Unevaluated sum hi + lo, |lo| <= ulp(hi)/2."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def ds(x, lo=None) -> DS:
    x = jnp.asarray(x, jnp.float32)
    if lo is None:
        lo = jnp.zeros_like(x)
    return DS(x, jnp.asarray(lo, jnp.float32))


def from_f64(x) -> DS:
    """Split HOST float64 values into an f32 pair.

    Host-side only (uses NumPy): on a TPU without x64, jnp float64 casts
    silently degrade to f32 and the residual would vanish.
    """
    import numpy as np

    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DS(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(a: DS):
    """Host-side read-back of a ds value at full precision (NumPy)."""
    import numpy as np

    return np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)


def two_sum(a, b):
    """s + e == a + b exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, requires |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLIT = jnp.float32(4097.0)  # 2^12 + 1 for f32 (24-bit mantissa)


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """p + e == a * b exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(a: DS, b: DS) -> DS:
    s, e = two_sum(a.hi, b.hi)
    e = e + (a.lo + b.lo)
    hi, lo = fast_two_sum(s, e)
    return DS(hi, lo)


def sub(a: DS, b: DS) -> DS:
    return add(a, DS(-b.hi, -b.lo))


def mul(a: DS, b: DS) -> DS:
    p, e = two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    hi, lo = fast_two_sum(p, e)
    return DS(hi, lo)


def div(a: DS, b: DS) -> DS:
    """One Newton correction on the f32 quotient (~2 ulp of ds)."""
    q1 = a.hi / b.hi
    r = sub(a, mul(ds(q1), b))
    q2 = (r.hi + r.lo) / b.hi
    hi, lo = fast_two_sum(q1, q2)
    return DS(hi, lo)


def add_f32(a: DS, b) -> DS:
    """a + plain-f32 b (error-free accumulate — the ray-length update)."""
    s, e = two_sum(a.hi, jnp.asarray(b, jnp.float32))
    e = e + a.lo
    hi, lo = fast_two_sum(s, e)
    return DS(hi, lo)


def dot3(ax, ay, az, bx, by, bz) -> DS:
    """ds dot product of component triples (each a DS)."""
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


def mod_two_pi(a: DS) -> DS:
    """a mod 2*pi in ds, result in [0, 2*pi) — the phase reduction
    (aggregation.cu:60) where plain f32 quantises at ~0.03 rad for
    ~1e5-radian arguments.  Device-safe: no f64 anywhere.

    The quotient floor can be off by one when a/2pi sits within f32
    rounding of an integer; one conditional wrap each way corrects it.
    Exact for |a| < 2^24 * 2*pi (~1e8 radians)."""
    import numpy as np

    two_pi = from_f64(2.0 * np.pi)
    inv_two_pi = from_f64(1.0 / (2.0 * np.pi))
    q = mul(a, inv_two_pi)
    n = jnp.floor(q.hi + q.lo)
    r = sub(a, mul(ds(n), two_pi))
    v = r.hi + r.lo
    shift = jnp.where(v < 0.0, 1.0, jnp.where(v >= jnp.float32(2.0 * np.pi), -1.0, 0.0))
    r2 = add(r, mul(ds(shift), two_pi))
    return DS(*fast_two_sum(r2.hi, r2.lo))
