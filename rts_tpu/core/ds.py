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

import jax
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
    """s + e == a + b exactly (Knuth).  Add/sub only — safe from the FMA
    contraction that breaks multiply-based EFTs (see _split)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, requires |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Split a into hi (top 12 significand bits) + lo, exactly.

    Implemented by MASKING the mantissa via integer bitcast instead of the
    classical Veltkamp multiply (t = 4097*a; hi = t - (t - a)): XLA's CPU
    backend contracts that multiply+subtract chain into FMA at -O2, which
    silently destroys the split (observed as ds values degrading to plain
    f32 accuracy under jit — exact eagerly and at
    --xla_backend_optimization_level=0; jax.lax.optimization_barrier is
    stripped before codegen in this XLA version, so it cannot protect the
    pattern).  Bit operations admit no floating-point rewrites on any
    backend.  hi keeps 12 significant bits, so all two_prod partial
    products (12x12 bits) are exact in f32; lo = a - hi is exact because
    hi carries a's leading bits.
    """
    ai = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(ai & jnp.int32(~0xFFF), jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly — contraction-immune formulation.

    The classical Dekker error term ``(ah*bh - p) + ...`` needs ``p`` to
    be the ROUNDED full product, but XLA's CPU fusion emitter duplicates
    cheap multiplies into consumer fusions and contracts mul+add into
    FMA there, silently replacing rounded products with exact ones and
    destroying the EFT (observed: ds collapsing to f32 accuracy under
    jit only, at -O2 only).  This version never forms an inexact
    product: all four partials multiply 12-bit split halves and are
    EXACT in f32, so FMA contraction of any of them into an adjacent
    add is value-neutral, and the remaining accumulation is adds only
    (two_sum/fast_two_sum), which cannot contract.
    """
    ah, al = _split(a)
    bh, bl = _split(b)
    p1 = ah * bh  # exact: 12x12-bit significands
    p2 = ah * bl
    p3 = al * bh
    p4 = al * bl
    s, e = two_sum(p2, p3)
    hi1, lo1 = fast_two_sum(p1, s)  # |p1| >= |s| (~2^-11 smaller)
    lo2 = lo1 + (e + p4)
    return fast_two_sum(hi1, lo2)


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


def neg(a: DS) -> DS:
    return DS(-a.hi, -a.lo)


def sqrt(a: DS) -> DS:
    """ds square root: f32 seed + one error-free Newton correction.

    x = sqrt(hi); e = a - x^2 (exact via two_prod); x += e / (2x).
    Relative error ~2^-48 for normal positive inputs; returns 0 for a <= 0
    (the callers' discriminants are clamped non-negative)."""
    x = jnp.sqrt(jnp.maximum(a.hi, 0.0))
    p, pe = two_prod(x, x)
    e = add(a, DS(-p, -pe))
    safe = jnp.where(x > 0.0, 2.0 * x, 1.0)
    corr = (e.hi + e.lo) / safe
    hi, lo = fast_two_sum(x, jnp.where(x > 0.0, corr, 0.0))
    return DS(hi, lo)


class DS3(NamedTuple):
    """A 3-vector of ds scalars (component layout — SoA-friendly)."""

    x: DS
    y: DS
    z: DS


def v3(x, y, z) -> DS3:
    return DS3(x, y, z)


def v3_from_f64(a) -> DS3:
    """Split a host float64 [..., 3] array into ds components."""
    import numpy as np

    a = np.asarray(a, np.float64)
    return DS3(from_f64(a[..., 0]), from_f64(a[..., 1]), from_f64(a[..., 2]))


def v3_add(a: DS3, b: DS3) -> DS3:
    return DS3(add(a.x, b.x), add(a.y, b.y), add(a.z, b.z))


def v3_sub(a: DS3, b: DS3) -> DS3:
    return DS3(sub(a.x, b.x), sub(a.y, b.y), sub(a.z, b.z))


def v3_scale(a: DS3, s: DS) -> DS3:
    return DS3(mul(a.x, s), mul(a.y, s), mul(a.z, s))


def v3_dot(a: DS3, b: DS3) -> DS:
    return add(add(mul(a.x, b.x), mul(a.y, b.y)), mul(a.z, b.z))


def v3_cross(a: DS3, b: DS3) -> DS3:
    return DS3(
        sub(mul(a.y, b.z), mul(a.z, b.y)),
        sub(mul(a.z, b.x), mul(a.x, b.z)),
        sub(mul(a.x, b.y), mul(a.y, b.x)),
    )


def v3_normalize(a: DS3) -> DS3:
    n = sqrt(v3_dot(a, a))
    inv = div(ds(jnp.ones_like(n.hi)), n)
    return v3_scale(a, inv)


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
