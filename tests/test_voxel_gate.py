"""Voxel-medium path gate by ANALYTIC EQUIVALENCE (VERDICT r4 item 2,
voxel half): the reference checkout ships no `fire.vdb` and this
toolchain has no OpenVDB (the reference build prints "No OpenVDB" —
see tests/goldens/gen_assets.py), so the voxel transport path cannot be
pixel-gated against a reference render.  Instead, render the SAME
physical scene twice through the full renderer: once with an
`exponential` medium (analytic closed forms, themselves golden-gated
via the non-exponential fixture) and once with a `voxel` grid that
tabulates exactly that density — images must agree.  This gates grid
loading, world->index transforms, trilinear lookup, optical depth,
distance sampling, and the in-medium scattering loop end to end."""
import numpy as np
from dataclasses import replace

import pytest

FALLOFF = 1.2


def _scene(medium):
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    desc = SceneDesc(
        path="/tmp/gate.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.6}],
        primitives=[
            {"type": "quad", "bsdf_index": 0,
             "transform": {"position": [0, -1.0, 0], "scale": 6.0}},
            {"type": "quad", "bsdf_index": 0, "emission": [8.0] * 3,
             "transform": {"position": [0, 2.5, 0], "scale": 1.5,
                           "rotation": [0, 0, 180]}},
        ],
        media=[medium],
        camera={"type": "pinhole", "resolution": [48, 32], "fov": 70,
                "medium": 0,
                "transform": {"position": [0, 0.4, 3.2],
                              "look_at": [0, 0.2, 0]}},
        integrator={"type": "path_tracer", "max_bounces": 6},
        renderer={"spp": 1})
    return flatten_scene(desc)


def test_voxel_matches_analytic_exponential():
    from tungsten_tpu.render import render

    sig = {"sigma_a": 0.15, "sigma_s": 0.5}
    exp_med = {"type": "exponential", "falloff_scale": FALLOFF,
               "unit_point": [0.0, -1.0, 0.0],
               "falloff_direction": [0.0, 1.0, 0.0], **sig}

    # tabulate rho(y) = exp(-FALLOFF * (y + 1)) on a dense grid that
    # covers the camera frustum; outside the grid the voxel medium sees
    # zero density, so make it generously large
    n = 65
    half = 6.0
    y = np.linspace(-half, half, n)
    rho = np.exp(-FALLOFF * (y + 1.0)).astype(np.float32)
    dens = np.broadcast_to(rho[None, :, None], (n, n, n)).copy()
    # the dense-grid transform maps the local unit cube [-0.5, 0.5]^3
    # to the world: scale 2*half spans [-half, half]^3
    vox_med = {"type": "voxel", **sig,
               "grid": {"type": "dense", "data": dens.tolist(),
                        "sampling_method": "exact_linear",
                        "integration_method": "exact_linear",
                        "transform": {"scale": 2 * half}}}

    scene_e, set_e = _scene(exp_med)
    scene_v, set_v = _scene(vox_med)
    spp = 48
    img_e = render(scene_e, set_e, spp=spp, spp_chunk=spp, seed=7)
    img_v = render(scene_v, set_v, spp=spp, spp_chunk=spp, seed=7)
    assert np.isfinite(img_e).all() and np.isfinite(img_v).all()
    assert img_e.mean() > 1e-3
    me, mv = img_e.mean(axis=(0, 1)), img_v.mean(axis=(0, 1))
    rel = np.abs(me - mv) / np.maximum(me, 1e-6)
    assert rel.max() < 0.06, (me, mv)
    # block-level structure agreement (8x8 blocks)
    be = img_e.reshape(4, 8, 6, 8, 3).mean(axis=(1, 3))
    bv = img_v.reshape(4, 8, 6, 8, 3).mean(axis=(1, 3))
    brel = np.abs(be - bv) / (be + 5e-2)
    assert brel.max() < 0.15, brel.max()
