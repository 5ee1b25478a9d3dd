"""Scene file loading (JSON / TOML / XML) -> identical simulation results."""

import json

import numpy as np

from rts_tpu.sim import run
from rts_tpu.sim.config_io import load_world, world_from_dict

DOC = {
    "parameters": {"num_rays": 1, "max_refl_depth": 2},
    "transmitters": [
        {
            "name": "tx0",
            "position": [0, 0, 0],
            "wave": {"carrier": 10e9, "temperature": 30.0},
            "pulse_count": 1,
            "prf": 1000.0,
            "tx_span": [0.1, 0.1, 0.0],
            "antenna": {"type": "sinc", "alpha": 2.0, "beta": 1.0, "gamma": 2.0},
        }
    ],
    "receivers": [
        {
            "name": "rx0",
            "position": [0, 0, 0],
            "sphere": [5.0, 1.0, 1.0],
            "noise_temperature": 70.0,
        }
    ],
    "targets": [
        {
            "name": "plate",
            "shape": "rect",
            "rect": [2.0, 200.0, 200.0],
            "position": [1000, 0, 0],
            "refl_coeff": 0.9,
            "rcs": {"type": "iso", "sigma": 2.5},
        }
    ],
}

XML_DOC = """<?xml version="1.0"?>
<simulation>
  <parameters><num_rays>1</num_rays><max_refl_depth>2</max_refl_depth></parameters>
  <transmitter name="tx0">
    <position>0 0 0</position>
    <wave><carrier>10e9</carrier><temperature>30.0</temperature></wave>
    <pulse_count>1</pulse_count><prf>1000.0</prf>
    <tx_span>0.1 0.1 0.0</tx_span>
    <antenna type="sinc"><alpha>2.0</alpha><beta>1.0</beta><gamma>2.0</gamma></antenna>
  </transmitter>
  <receiver name="rx0">
    <position>0 0 0</position><sphere>5.0 1.0 1.0</sphere>
    <noise_temperature>70.0</noise_temperature>
  </receiver>
  <target name="plate">
    <shape>rect</shape><rect>2.0 200.0 200.0</rect>
    <position>1000 0 0</position><refl_coeff>0.9</refl_coeff>
    <rcs type="iso"><sigma>2.5</sigma></rcs>
  </target>
</simulation>
"""


def _simulate(world, params):
    run(world, params)
    return [
        (p.power, p.delay, p.phase, p.doppler, p.noise_temperature)
        for rx in world.receivers
        for r in rx.responses
        for p in r.points
    ]


def test_json_and_xml_agree(tmp_path):
    j = tmp_path / "scene.json"
    j.write_text(json.dumps(DOC))
    x = tmp_path / "scene.xml"
    x.write_text(XML_DOC)

    wj, pj = load_world(str(j))
    wx, px = load_world(str(x))
    assert pj == px
    rj = _simulate(wj, pj)
    rx = _simulate(wx, px)
    assert len(rj) == len(rx) == 1
    np.testing.assert_allclose(rj, rx, rtol=1e-12)
    # sigma=2.5 RCS and sinc alpha=2 boost power vs defaults
    assert rj[0][0] > 0
    assert rj[0][4] == 100.0  # accumulated noise temperature quirk


def test_dict_waypoints_and_attitude():
    doc = dict(DOC)
    doc["targets"] = [
        {
            "shape": "sphere",
            "sphere": [2, 5.0],
            "waypoints": [[0.0, [900, 0, 0]], [1.0, [950, 0, 0]]],
            "attitude": {"yaw_rate": 0.5},
        }
    ]
    w, p = world_from_dict(doc)
    t = w.targets[0]
    assert t.attitude.is_rotating
    np.testing.assert_allclose(np.asarray(t.GetPosition(0.5)), [925, 0, 0])
