"""Fiber BCSDFs (hair / rough_wire / lambertian_fiber): sampling
consistency, pdf normalization, energy conservation, hair-scene render.

Reference: src/core/bsdfs/{HairBcsdf,RoughWireBcsdf,LambertianFiberBcsdf}.cpp
"""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.bsdf.eval import (
    ShadePoint, bsdf_eval, bsdf_pdf, bsdf_sample)


def _fiber_scene():
    desc = SceneDesc(
        path="/tmp/fiber.json", json={},
        bsdfs=[
            {"name": "h", "type": "hair", "scale_angle": 2.5,
             "melanin_ratio": 1.0, "melanin_concentration": 1.3,
             "roughness": 0.3, "albedo": 1.0},
            {"name": "w", "type": "rough_wire", "material": "Cu",
             "roughness": 0.2, "albedo": 1.0},
            {"name": "f", "type": "lambertian_fiber", "albedo": 0.8},
        ],
        primitives=[{"type": "quad", "bsdf_index": 0}],
        media=[], camera={"resolution": [8, 8]}, integrator={},
        renderer={})
    return flatten_scene(desc)


def test_fiber_sample_weight_consistency():
    scene, settings = _fiber_scene()
    R = 2048
    rng = np.random.default_rng(3)
    wi = rng.normal(size=(R, 3))
    wi = jnp.asarray(wi / np.linalg.norm(wi, axis=1, keepdims=True),
                     jnp.float32)
    for bi in range(3):
        sp = ShadePoint(scene, jnp.full((R,), bi, jnp.int32),
                        jnp.zeros((R, 2)))
        us = [jnp.asarray(rng.random(R), jnp.float32) for _ in range(4)]
        wo, wt, pdf, flags = bsdf_sample(
            sp, wi, us[0], us[1], us[2], settings.present_bsdf_types,
            u_lobe2=us[3])
        ok = np.asarray(flags) != 0
        assert ok.mean() > 0.95
        f = np.asarray(bsdf_eval(sp, wi, wo, settings.present_bsdf_types))
        p = np.asarray(bsdf_pdf(sp, wi, wo, settings.present_bsdf_types))
        wt = np.asarray(wt)
        rel = np.abs(wt[ok] - f[ok] / np.maximum(p[ok, None], 1e-9)) \
            / np.maximum(np.abs(wt[ok]), 1e-3)
        assert np.percentile(rel, 99) < 1e-3
        # directions normalized
        assert np.abs(np.linalg.norm(np.asarray(wo), axis=1) - 1).max() < 1e-3


def test_fiber_pdf_normalized():
    scene, settings = _fiber_scene()
    N = 100000
    rng = np.random.default_rng(5)
    wo = rng.normal(size=(N, 3))
    wo = jnp.asarray(wo / np.linalg.norm(wo, axis=1, keepdims=True),
                     jnp.float32)
    wi = jnp.broadcast_to(
        jnp.asarray([0.3, 0.5, np.sqrt(1 - 0.09 - 0.25)], jnp.float32),
        (N, 3))
    for bi in range(3):
        sp = ShadePoint(scene, jnp.full((N,), bi, jnp.int32),
                        jnp.zeros((N, 2)))
        p = np.asarray(bsdf_pdf(sp, wi, wo, settings.present_bsdf_types))
        integral = p.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.04, (bi, integral)


def test_hair_energy_conserving():
    scene, settings = _fiber_scene()
    N = 100000
    rng = np.random.default_rng(7)
    wo = rng.normal(size=(N, 3))
    wo = jnp.asarray(wo / np.linalg.norm(wo, axis=1, keepdims=True),
                     jnp.float32)
    sp = ShadePoint(scene, jnp.zeros((N,), jnp.int32), jnp.zeros((N, 2)))
    for ti in (0.0, 1.2):
        wi = jnp.broadcast_to(
            jnp.asarray([0.0, np.sin(ti), np.cos(ti)], jnp.float32), (N, 3))
        f = np.asarray(bsdf_eval(sp, wi, wo, settings.present_bsdf_types))
        energy = f.mean(axis=0) * 4 * np.pi
        assert (energy < 1.02).all()
        assert (energy > 0.1).all()
        # melanin absorbs blue more than red
        assert energy[0] > energy[2]


def test_hair_scene_render(tmp_path):
    """Miniature of the hair fixture: fiber curls under a sun cap,
    bcsdf_cylinder mode + hair BCSDF (the default for curves)."""
    from tungsten_tpu.io import curves as cio
    from tungsten_tpu.render import render
    rng = np.random.default_rng(11)
    nodes_l, ends, tot = [], [], 0
    for _ in range(40):
        n = 8
        base = np.array([rng.uniform(-0.4, 0.4), 0.0,
                         rng.uniform(-0.4, 0.4)])
        pts = base[None] + np.cumsum(
            0.1 * np.stack([rng.normal(0, 0.3, n), np.ones(n),
                            rng.normal(0, 0.3, n)], 1), 0)
        n4 = np.concatenate([pts, np.full((n, 1), 0.01)],
                            1).astype(np.float32)
        nodes_l.append(n4)
        tot += n
        ends.append(tot)
    nodes = np.concatenate(nodes_l)
    ce = np.asarray(ends, np.uint32)
    cio.save_fiber(str(tmp_path / "curl.fiber"),
                   cio.CurveData(ce, nodes, cio.init_normals(ce, nodes)))
    desc = SceneDesc(
        path=str(tmp_path / "s.json"), json={},
        bsdfs=[{"name": "hair", "type": "hair", "scale_angle": 2.5,
                "melanin_ratio": 1.0, "melanin_concentration": 1.3,
                "roughness": 0.3, "albedo": 1.0}],
        primitives=[
            {"type": "curves", "file": "curl.fiber", "bsdf_index": 0,
             "mode": "bcsdf_cylinder", "curve_thickness": 0.01},
            {"type": "infinite_sphere_cap", "emission": 100.0,
             "sample": True, "cap_angle": 10,
             "transform": {"rotation": [34, 0, 24]}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [24, 24],
                "transform": {"position": [0, 0.5, -2.2],
                              "look_at": [0, 0.5, 0], "up": [0, 1, 0]}},
        integrator={"max_bounces": 6}, renderer={"spp": 2})
    flat, settings = flatten_scene(desc)
    img = np.asarray(render(flat, settings, spp=2))
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # strands catch the sun
