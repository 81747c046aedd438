"""Volume photon map (points) tests: deposits at medium scatter events
and camera-segment marching gather (ref src/core/integrators/photon_map/
PhotonMapIntegrator.hpp:36-71 volume maps, PhotonTracer volume deposit).
"""
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene


def _fog_scene(spp=4, w=24, h=16):
    """A lamp in homogeneous fog over a floor: single scattering makes
    the fog glow — visible to both PT and the volume photon map."""
    return SceneDesc(
        path="/tmp/fog.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.5}],
        primitives=[
            # fog-room binding: every prim's exterior is the fog, so
            # photons leave the lamp INTO the medium (root med =
            # emitter ext_medium, ref PathVertex::sampleRootVertex)
            {"type": "quad", "bsdf_index": 0, "emission": [20.0] * 3,
             "ext_medium_index": 0,
             "transform": {"position": [0, 2.2, 0], "scale": 1.0,
                           "rotation": [0, 0, 180]}},
            {"type": "quad", "bsdf_index": 0, "ext_medium_index": 0,
             "transform": {"position": [0, -1, 0], "scale": [8, 1, 8]}},
        ],
        media=[{"type": "homogeneous", "sigma_a": 0.02,
                "sigma_s": 0.25}],
        camera={"type": "pinhole", "resolution": [w, h], "fov": 60,
                "medium_index": 0,
                "transform": {"position": [0, 0.5, 4.0],
                              "look_at": [0, 0.5, 0]}},
        integrator={"type": "photon_map", "max_bounces": 6,
                    "photon_count": 1 << 16, "gather_radius": 0.25,
                    "volume_gather_radius": 0.3,
                    "gather_photon_count": 16},
        renderer={"spp": spp})


def test_volume_photons_deposited():
    from tungsten_tpu.integrators.photon_map import trace_photons
    scene, settings = flatten_scene(_fog_scene())
    ph = trace_photons(scene, settings, 4096, np.uint32(7), np.uint32(0))
    valid = np.asarray(ph["valid"])
    vol = np.asarray(ph["vol"])
    assert valid.any()
    # the fog scatters a decent share of photons before any surface
    frac_vol = (valid & vol).sum() / max(valid.sum(), 1)
    assert frac_vol > 0.1, f"volume deposit fraction {frac_vol}"
    # volume photons carry finite positive power
    pw = np.asarray(ph["power"])[valid & vol]
    assert np.isfinite(pw).all() and (pw >= 0).all() and pw.max() > 0


def test_volume_gather_adds_fog_glow():
    # with the volume map, pixels that look through fog ABOVE the lamp
    # (no surface behind their path except distant floor) gain radiance
    from tungsten_tpu.render import render
    scene, settings = flatten_scene(_fog_scene())
    img_pm = np.asarray(render(scene, settings, spp=2))
    assert np.isfinite(img_pm).all()
    assert img_pm.mean() > 0
    # PT cross-check: same scene by path tracing at higher spp
    s_pt = replace(settings, integrator_type="path_tracer")
    img_pt = np.asarray(render(scene, s_pt, spp=48))
    # global brightness parity (volume map is a biased estimator; the
    # agreement bar is loose but meaningful: missing in-scatter would
    # read ~0 in the fog regions)
    ratio = img_pm.mean() / max(img_pt.mean(), 1e-9)
    assert 0.4 < ratio < 2.5, f"photon/pt brightness ratio {ratio}"


def test_beam_map_matches_points_brightness():
    """The 1D photon-beam estimator (volume_photon_type "beams") must
    agree with the 0D points estimator on the fog fixture: same fog
    glow, lower variance (ref PhotonMapSettings volumePhotonType,
    evalBeam1D PhotonTracer.cpp:120-135)."""
    desc = _fog_scene()
    desc.integrator["volume_photon_type"] = "beams"
    # keep per-cell beam occupancy under BEAM_CAP in this dense fog
    # (beams span many cells; the candidate scan truncates beyond the
    # cap and reads biased-dim)
    desc.integrator["volume_photon_count"] = 2000
    from tungsten_tpu.render import render
    scene_b, settings_b = flatten_scene(desc)
    assert settings_b.vol_photon_type == "beams"
    img_beams = np.asarray(render(scene_b, settings_b, spp=2))
    assert np.isfinite(img_beams).all() and img_beams.mean() > 0

    desc_p = _fog_scene()
    scene_p, settings_p = flatten_scene(desc_p)
    img_pts = np.asarray(render(scene_p, settings_p, spp=2))
    ratio = img_beams.mean() / max(img_pts.mean(), 1e-9)
    assert 0.6 < ratio < 1.7, f"beams/points brightness ratio {ratio}"


def test_plane_records_emitted():
    """Planes mode records a parallelogram per interior volume-scatter
    pair (ref precomputePlane0D: p1 must be a volume vertex, power =
    |p1-p0| * l1 * continued throughput)."""
    from tungsten_tpu.integrators.photon_map import trace_photons
    desc = _fog_scene()
    desc.integrator["volume_photon_type"] = "planes"
    scene, settings = flatten_scene(desc)
    ph = trace_photons(scene, settings, 4096, np.uint32(7), np.uint32(0))
    pv = np.asarray(ph["pl_valid"])
    assert pv.any(), "no planes recorded"
    l1 = np.asarray(ph["pl_l1"])[pv]
    pw = np.asarray(ph["pl_pow"])[pv]
    p0 = np.asarray(ph["pl_p0"])[pv]
    p1 = np.asarray(ph["pl_p1"])[pv]
    assert (l1 > 0).all()
    assert np.isfinite(pw).all() and (pw >= 0).all() and pw.max() > 0
    # first edge is a real segment
    assert (np.linalg.norm(p1 - p0, axis=-1) > 0).all()
    # a plane roots at a volume vertex — its p1 must match some volume
    # photon deposit position
    volpos = np.asarray(ph["pos"])[np.asarray(ph["valid"])
                                   & np.asarray(ph["vol"])]
    d = np.min(np.linalg.norm(volpos[None, :50] - p1[:20, None],
                              axis=-1), axis=1)
    assert (d < 1e-4).any()


def test_plane_map_matches_points_brightness():
    """The 2D photon-plane estimator (volume_photon_type "planes") must
    agree with the 0D points estimator on the fog fixture (ref
    PhotonMapSettings volumePhotonType "planes", evalPlane0D
    PhotonTracer.cpp:138-157)."""
    desc = _fog_scene()
    desc.integrator["volume_photon_type"] = "planes"
    desc.integrator["volume_photon_count"] = 2000
    from tungsten_tpu.render import render
    scene_b, settings_b = flatten_scene(desc)
    assert settings_b.vol_photon_type == "planes"
    img_pl = np.asarray(render(scene_b, settings_b, spp=2))
    assert np.isfinite(img_pl).all() and img_pl.mean() > 0

    desc_p = _fog_scene()
    scene_p, settings_p = flatten_scene(desc_p)
    img_pts = np.asarray(render(scene_p, settings_p, spp=2))
    ratio = img_pl.mean() / max(img_pts.mean(), 1e-9)
    assert 0.5 < ratio < 2.0, f"planes/points brightness ratio {ratio}"


def test_ppm_radius_schedule():
    """gamma_i = prod_{k=1..i} (k+alpha)/(k+1)
    (ref ProgressivePhotonMapIntegrator.cpp:58-60)."""
    from tungsten_tpu.integrators.photon_map import ppm_gamma
    a = 0.3
    assert ppm_gamma(0, a) == 1.0
    assert abs(ppm_gamma(1, a) - (1 + a) / 2.0) < 1e-12
    g = [ppm_gamma(i, a) for i in range(8)]
    assert all(g[i + 1] < g[i] for i in range(7))
    assert abs(g[3] - (1.3 / 2) * (2.3 / 3) * (3.3 / 4)) < 1e-12
