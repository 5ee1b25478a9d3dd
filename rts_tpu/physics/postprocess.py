"""Host post-processing of traced rays, vectorised and jit-compatible.

Equivalent of the per-received-ray host loop at ray_tracer.cpp:1184-1258:
per-bounce RCS multiplication, antenna gains at transmit/arrival times,
the lambda^2*Gt*Gr factor (transmit power Pt is applied downstream, as in
the reference's rsresponse), and the relativistic Doppler conversion.

Quirk preserved: for direct Tx->Rx rays the reference evaluates the Tx
gain along (Tx - Rx) and the Rx gain along (Rx - Tx) — both reversed
relative to propagation (ray_tracer.cpp:1205-1206); indirect rays use
(firstHit - Tx) departure and (lastHit - Rx) arrival vectors (:1209-1210).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

from rts_tpu.engine.wavefront import TraceResult


def _azel(v):
    # components-major [3, R] vectors (lanes-last engine layout)
    az = jnp.arctan2(v[1], v[0])
    el = jnp.arctan2(v[2], jnp.sqrt(v[0] ** 2 + v[1] ** 2))
    return az, el


def postprocess(
    res: TraceResult,
    *,
    tx_origin,  # [3]
    rx_positions,  # [NR, 3]
    rcs_models: Sequence,  # per-target .rcs(az_sum, el_sum, wl)
    tx_gain,  # .gain(az, el, bore_az, bore_el, wl)
    rx_gains: Sequence,
    tx_rotation,  # (az, el) boresight at pulse time
    rx_rotation_fns: Sequence[Callable],  # t -> (az, el), vectorised over t
    time_t,
    carrier,
    cspeed,
):
    """Returns (power, doppler, delay) lane arrays ready for aggregation."""
    valid = res.received >= 0
    num_rx = rx_positions.shape[0] if hasattr(rx_positions, "shape") else len(rx_positions)
    rxi = jnp.clip(res.received, 0, max(num_rx - 1, 0))
    if num_rx:
        # one-hot contraction — tiny-operand many-index gathers are slow
        # on TPU; lanes-last: [3, NR] @ [NR, R] -> [3, R]
        oh = (jnp.arange(num_rx, dtype=jnp.int32)[:, None] == rxi[None, :]).astype(res.power.dtype)
        repos = jnp.asarray(rx_positions, res.power.dtype).T @ oh
    else:
        repos = jnp.zeros_like(res.first_hit)

    wavelength = cspeed / carrier
    direct = (res.refl_depth == 0) & (res.refr_depth == 0)
    tx_origin = jnp.asarray(tx_origin)[:, None]  # [3, 1]

    transvec = jnp.where(
        direct, tx_origin - repos, res.first_hit - tx_origin
    )
    recvvec = jnp.where(direct, repos - tx_origin, res.prev_hit - repos)
    t_az, t_el = _azel(transvec)
    r_az, r_el = _azel(recvvec)

    delay = res.ray_length / cspeed
    power = res.power

    # per-bounce RCS (ray_tracer.cpp:1219-1230); rcs is [2, D, R]
    for t_idx, model in enumerate(rcs_models):
        vals = model.rcs(res.rcs[0], res.rcs[1], wavelength)  # [D, R]
        factor = jnp.where(res.path == t_idx, vals, 1.0)
        power = power * jnp.prod(factor, axis=0)

    # antenna gains (ray_tracer.cpp:1232-1247)
    gt = tx_gain.gain(t_az, t_el, tx_rotation[0], tx_rotation[1], wavelength)
    gr = jnp.ones_like(power)
    for j, g in enumerate(rx_gains):
        b_az, b_el = rx_rotation_fns[j](delay + time_t)
        gj = g.gain(r_az, r_el, b_az, b_el, wavelength)
        gr = jnp.where(res.received == j, gj, gr)

    power = jnp.where(valid, power * (wavelength**2 * gt * gr), res.power)

    # relativistic Doppler (ray_tracer.cpp:1251-1253).  Algebraically
    # (1+x)/(1-x) - 1 == 2x/(1-x); the literal form is catastrophic in
    # f32 (x = vr/c ~ 3e-7 is below the ulp of 1.0), the rewritten form
    # is exact to rounding in both dtypes.
    x = (res.doppler / 2.0) / cspeed
    doppler = jnp.where(valid, carrier * (2.0 * x / (1.0 - x)), res.doppler)
    return power, doppler, delay
