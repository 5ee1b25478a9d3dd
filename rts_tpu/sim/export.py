"""Result persistence: responses and CPI products to portable files.

The reference accumulates responses in-memory and leaves persistence to
the external simulator's HDF5 export (SURVEY.md §0/§5).  Here results
round-trip through compressed ``.npz`` (no HDF5 library in the deploy
image; the schema mirrors what an HDF5 layout would be — one array per
field plus metadata).
"""

from __future__ import annotations

import json

import numpy as np


def save_responses(path: str, world) -> None:
    """All receivers' responses -> one .npz archive."""
    fields = {"power": [], "time": [], "delay": [], "doppler": [], "phase": [], "noise_temperature": []}
    rx_index, tx_name, carrier = [], [], []
    for i, rx in enumerate(world.receivers):
        for resp in rx.responses:
            for p in resp.points:
                for k in fields:
                    fields[k].append(getattr(p, k))
                rx_index.append(i)
                tx_name.append(getattr(resp.transmitter, "name", "tx"))
                carrier.append(resp.wave.GetCarrier() if resp.wave else 0.0)
    meta = {
        "receivers": [rx.name for rx in world.receivers],
        "transmitters": [tx.name for tx in world.transmitters],
    }
    np.savez_compressed(
        path,
        rx_index=np.asarray(rx_index, np.int32),
        tx_name=np.asarray(tx_name),
        carrier=np.asarray(carrier),
        meta=np.asarray(json.dumps(meta)),
        **{k: np.asarray(v) for k, v in fields.items()},
    )


def load_responses(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files if k != "meta"}
        out["meta"] = json.loads(str(z["meta"]))
    return out


def save_cpi(path: str, out, times=None) -> None:
    """Traced CpiResult lanes -> .npz (checkpoint for long sweeps)."""
    arrays = {
        "power": np.asarray(out.power),
        "doppler": np.asarray(out.doppler),
        "delay": np.asarray(out.delay),
        "received": np.asarray(out.received),
        "agg_power": np.asarray(out.agg.power),
        "agg_delay": np.asarray(out.agg.delay),
        "agg_phase": np.asarray(out.agg.phase),
        "agg_doppler": np.asarray(out.agg.doppler),
        "agg_npath": np.asarray(out.agg.npath),
        "agg_emit": np.asarray(out.agg.emit),
        "agg_path_match": np.asarray(out.agg.path_match),
    }
    if times is not None:
        arrays["times"] = np.asarray(times)
    np.savez_compressed(path, **arrays)


def load_cpi(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
