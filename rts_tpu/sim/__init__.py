from rts_tpu.sim.paths import AttitudePath, Path, RotationPath
from rts_tpu.sim.waveform import RadarSignal, TransmitterPulse
from rts_tpu.sim.response import InterpPoint, Response
from rts_tpu.sim.world import Receiver, Target, Transmitter, World
from rts_tpu.sim.driver import run
from rts_tpu.sim.cpi import prepare_cpi, run_cpi

__all__ = [
    "AttitudePath",
    "Path",
    "RotationPath",
    "RadarSignal",
    "TransmitterPulse",
    "InterpPoint",
    "Response",
    "Receiver",
    "Target",
    "Transmitter",
    "World",
    "prepare_cpi",
    "run",
    "run_cpi",
]
