"""O(L) received-lane compaction shared by the replay / postprocess /
aggregation cap paths.

All three hot-path consumers gather "the first ``cap`` received lanes in
lane order" out of a ~250k-lane fan.  A stable bool argsort delivers that
set but costs ~2.5 ms/pulse at a 63^3 fan (docs/PERF.md r4); the
cumsum+scatter below is one linear pass, and because every caller feeds
the same ``received`` array the cumsum CSEs across the three call sites
exactly like the shared argsort used to.

Unused slots hold ``total`` (one past the last lane) instead of an
arbitrary filler lane: gathers must go through :func:`take_lanes`
(out-of-range -> ``fill``), and scatter write-backs at those slots are
dropped by JAX's default out-of-bounds scatter mode — so filler slots can
never alias a real lane (an arbitrary filler could duplicate a received
lane and double-count it in the aggregation's group sums).
"""

from __future__ import annotations

import jax.numpy as jnp


def received_first_idx(received, cap: int):
    """Lane indices of the first ``cap`` received lanes, in lane order.

    Returns int32 [cap]; slots past the received count hold ``total``
    (out of range).  Exactly the slice a stable ``argsort(received < 0)``
    would produce for the received part, without the sort.

    Implementation: cumsum + binary-search gathers.  The j-th received
    lane is the first l with cumsum[l] == j+1 (cumsum only increments at
    received lanes), and searchsorted returns ``total`` for j >= count —
    the out-of-range sentinel — for free.  A cumsum+scatter variant was
    measured SLOWER than the argsort it replaced (a 250k-update scatter
    is pathological on TPU, like the gathers aggregate/paths.py avoids);
    this one is scatter-free.
    """
    total = received.shape[0]
    csum = jnp.cumsum((received >= 0).astype(jnp.int32))
    want = jnp.arange(1, cap + 1, dtype=csum.dtype)
    return jnp.searchsorted(csum, want, side="left").astype(jnp.int32)


def take_lanes(a, idx, fill=0):
    """Gather lanes (last axis) at ``idx`` with out-of-range -> ``fill``.

    Filler slots of :func:`received_first_idx` surface as ``fill`` — pass
    ``fill=-1`` for ``received`` so downstream valid-gating excludes them.
    """
    return jnp.take(a, idx, axis=-1, mode="fill", fill_value=fill)
