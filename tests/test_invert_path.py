"""Inversion round trips for camera / emitter-position / medium
distance (ref Primitive::invertPosition, Camera::invertDirection,
Medium::invertDistance — the non-BSDF half of the RJ-MLT inversion
machinery)."""
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.integrators import invert_path as IP


def _scene():
    return flatten_scene(SceneDesc(
        path="/tmp/ip.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.5}],
        primitives=[
            {"type": "quad", "bsdf_index": 0, "emission": [5.0] * 3,
             "transform": {"position": [0, 2, 0], "scale": [2, 1, 1],
                           "rotation": [0, 0, 180]}},
            {"type": "quad", "bsdf_index": 0,
             "transform": {"position": [0, -1, 0], "scale": [8, 1, 8]}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [64, 48], "fov": 60,
                "transform": {"position": [0, 0.5, 4.0],
                              "look_at": [0.2, 0.4, 0]}},
        integrator={"type": "path_tracer"}, renderer={"spp": 1}))


def test_camera_direction_round_trip():
    from tungsten_tpu.cameras.camera import generate_rays
    from tungsten_tpu.utils import rng
    scene, settings = _scene()
    settings = replace(settings, filter="box", spp=0)
    R = 256
    pixel = (jnp.arange(R, dtype=jnp.uint32) * 7) % (64 * 48)
    sample = jnp.zeros((R,), jnp.uint32)
    o, d = generate_rays(scene, settings, pixel, sample, jnp.uint32(3))
    pix2, u1, u2, ok = IP.invert_camera_direction(scene, settings, d)
    ok = np.asarray(ok)
    assert ok.all()
    assert (np.asarray(pix2) == np.asarray(pixel).astype(np.int32)).all()
    # regenerate with the recovered jitter through the tape
    u1r, u2r = map(np.asarray, rng.random_2d(jnp.uint32(3), pixel, sample,
                                             rng.DIM_CAMERA))
    # box filter: f = u - 0.5, so recovered u must equal the original
    np.testing.assert_allclose(np.asarray(u1), u1r, atol=2e-3)
    np.testing.assert_allclose(np.asarray(u2), u2r, atol=2e-3)


def test_area_light_point_round_trip():
    from tungsten_tpu.integrators.lights import (alias_pick_tri,
                                                 area_light_sample)
    scene, settings = _scene()
    R = 256
    rs = np.random.default_rng(1)
    u_tri = jnp.asarray(rs.random(R), jnp.float32)
    u1 = jnp.asarray(rs.random(R), jnp.float32)
    u2 = jnp.asarray(rs.random(R), jnp.float32)
    li = jnp.zeros((R,), jnp.int32)
    p = jnp.asarray(np.tile([0.0, 0.0, 0.0], (R, 1)), jnp.float32)
    smp = area_light_sample(scene, li, p, u_tri, u1, u2)
    # recover the hit triangle + barycentrics from the sampled point
    tri = alias_pick_tri(scene, li, u_tri)
    q = p + smp["d"] * smp["dist"][..., None]
    v0 = scene.tri_v0[tri]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    # solve q - v0 = b1 e1 + b2 e2 (2x2 normal equations)
    dv = q - v0
    a11 = jnp.sum(e1 * e1, -1)
    a12 = jnp.sum(e1 * e2, -1)
    a22 = jnp.sum(e2 * e2, -1)
    r1 = jnp.sum(dv * e1, -1)
    r2 = jnp.sum(dv * e2, -1)
    det = a11 * a22 - a12 * a12
    b1 = (r1 * a22 - r2 * a12) / det
    b2 = (r2 * a11 - r1 * a12) / det

    mu = jnp.asarray(rs.random(R), jnp.float32)
    u_tri2, u1b, u2b, ok = IP.invert_area_light_point(
        scene, li, tri, b1, b2, mu)
    assert np.asarray(ok).all()
    # regenerating with the inverted coordinates lands on the SAME
    # triangle and the SAME point
    tri2 = alias_pick_tri(scene, li, u_tri2)
    assert (np.asarray(tri2) == np.asarray(tri)).all()
    smp2 = area_light_sample(scene, li, p, u_tri2, u1b, u2b)
    q2 = p + smp2["d"] * smp2["dist"][..., None]
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-4)


def test_medium_distance_round_trip():
    from tungsten_tpu.media.transmittance import (T_EXPONENTIAL,
                                                  sample_distance)
    R = 128
    rs = np.random.default_rng(2)
    u1 = jnp.asarray(rs.random(R), jnp.float32)
    u2 = jnp.asarray(rs.random(R), jnp.float32)
    tt = jnp.full((R,), T_EXPONENTIAL, jnp.int32)
    prm = jnp.zeros((R, 4))
    surf = jnp.ones((R,), bool)
    t = sample_distance(tt, prm, surf, u1, u2)
    u1b, ok = IP.invert_medium_distance(tt, prm, surf, t)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(u1b), np.asarray(u1),
                               rtol=1e-4, atol=1e-5)
    t2 = sample_distance(tt, prm, surf, u1b, u2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t),
                               rtol=1e-4, atol=1e-6)
