"""Smoke tests: the shipped examples must run end-to-end (reduced sizes)."""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_from_xml_example(capsys):
    sys.argv = ["from_xml.py"]
    runpy.run_path(os.path.join(EXAMPLES, "from_xml.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "total responses:" in out
    assert os.path.exists("/tmp/responses.npz")


def test_terrain_imaging_example(capsys, monkeypatch):
    import rts_tpu.sim as sim

    # CPU needs the Pallas kernel in interpreter mode + a small cluster size
    orig = sim.run_cpi
    monkeypatch.setattr(
        "examples.terrain_imaging.run_cpi",
        lambda w, p, **kw: orig(w, p, **{**kw, "interpret": True, "cluster_size": 128}),
        raising=False,
    )
    sys.path.insert(0, os.path.join(EXAMPLES, ".."))
    import examples.terrain_imaging as ti

    ti.run_cpi = lambda w, p, **kw: orig(w, p, **{**kw, "interpret": True, "cluster_size": 128})
    sys.argv = ["terrain_imaging.py", "--tris", "8000", "--pulses", "4", "--rays", "5"]
    ti.main()
    out = capsys.readouterr().out
    assert "strongest compressed return" in out
