"""Waveforms and pulse schedules.

Stands in for the external ``RadarSignal`` / ``TransmitterPulse``
(ray_tracer.cpp:811-815, 843-847, §2.3): the tracer only needs the
carrier, the per-pulse start time, and the noise temperature; power and
length feed the downstream response rendering.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RadarSignal:
    name: str = "pulse"
    carrier: float = 10e9  # Hz
    power: float = 1.0  # transmit power Pt [W] — applied at rendering
    length: float = 1e-6  # pulse length [s]
    rate: float = 0.0  # sample rate of the stored waveform (0 = analytic)
    chirp_rate: float = 0.0  # LFM sweep rate [Hz/s]; 0 = plain CW pulse
    temperature: float = 0.0  # added to receiver noise temperature

    @property
    def bandwidth(self) -> float:
        return abs(self.chirp_rate) * self.length

    def GetCarrier(self):  # noqa: N802
        return self.carrier

    def GetTemp(self):  # noqa: N802
        return self.temperature

    def GetPower(self):  # noqa: N802
        return self.power


@dataclasses.dataclass
class TransmitterPulse:
    wave: RadarSignal = None
    time: float = 0.0
