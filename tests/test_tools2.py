"""json2xml converter + atmosphere medium analytics."""
import os
import xml.etree.ElementTree as ET

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.media import grid as GR


def test_json2xml_materialtest(tmp_path):
    from tungsten_tpu.tools.json2xml import convert
    out = str(tmp_path / "mt.xml")
    convert("/root/reference/data/materialtest/materialtest.json", out)
    root = ET.parse(out).getroot()
    assert root.tag == "scene"
    kinds = [(e.tag, e.get("type")) for e in root]
    assert ("integrator", "path") in kinds
    assert sum(1 for t, _ in kinds if t == "shape") >= 4
    assert sum(1 for t, _ in kinds if t == "bsdf") >= 3
    assert any(t == "emitter" for t, _ in kinds)
    # wo3 meshes re-exported as obj next to the xml
    objs = [f for f in os.listdir(tmp_path) if f.endswith(".obj")]
    assert len(objs) >= 3


def test_atmosphere_integral_matches_quadrature():
    desc = SceneDesc(
        path="/tmp/atm.json", json={},
        bsdfs=[{"name": "l", "type": "lambert"}],
        media=[{"type": "atmosphere", "sigma_a": 0.0, "sigma_s": 1.0,
                "falloff_scale": 3.0, "radius": 1.0, "center": [0, 0, 0]}],
        primitives=[{"type": "quad", "bsdf_index": 0,
                     "int_medium_index": 0, "transform": {"scale": 8.0}}],
        camera={"resolution": [8, 8]}, integrator={}, renderer={})
    scene, settings = flatten_scene(desc)
    mi = jnp.zeros((2,), jnp.int32)
    o = jnp.asarray([[0, 0, -3], [0.5, 0.2, -2]], jnp.float32)
    d = jnp.asarray([[0, 0, 1], [0, 0, 1]], jnp.float32)
    tmax = jnp.asarray([6.0, 4.0])
    tau = np.asarray(GR.unit_tau(scene, settings, mi, o, d, tmax))
    for i in range(2):
        ts = np.linspace(0, float(tmax[i]), 5001)
        pts = np.asarray(o[i])[None] + np.asarray(d[i])[None] * ts[:, None]
        rho = np.exp(-9.0 * ((pts ** 2).sum(1) - 1.0))
        ref = np.trapezoid(rho, ts)
        assert abs(tau[i] - ref) / max(ref, 1e-9) < 1e-4
    # inverse round-trips
    tau_c = jnp.asarray(tau * 0.5)
    t, rho, tot = GR.inverse_unit_tau(scene, settings, mi, o, d, tmax,
                                      tau_c)
    t = np.asarray(t)
    for i in range(2):
        ts = np.linspace(0, float(t[i]), 5001)
        pts = np.asarray(o[i])[None] + np.asarray(d[i])[None] * ts[:, None]
        rho_q = np.exp(-9.0 * ((pts ** 2).sum(1) - 1.0))
        got = np.trapezoid(rho_q, ts)
        assert abs(got - float(tau_c[i])) / float(tau_c[i]) < 1e-3
