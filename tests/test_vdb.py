"""OpenVDB grid subsystem: archive roundtrip, flatten integration, and
voxel-medium rendering through a synthesized .vdb fixture.

There is no OpenVDB install (and no .vdb asset — the reference's
fire.vdb is absent from its checkout) in this environment, so the
format tests are writer->reader roundtrips over the documented subset
(io/vdb.py); the medium tests check the physics downstream of the
loader against an identical dense-grid scene.
(ref: src/core/grids/VdbGrid.cpp:173-265, media/VoxelMedium.cpp)
"""
import json
import os

import numpy as np
import pytest

from tungsten_tpu.io.vdb import COMPRESS_NONE, COMPRESS_ZIP, \
    VdbGridData, read_vdb, write_vdb


def _blob(shape=(24, 20, 16), seed=0):
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    c = np.asarray(shape) / 2
    r2 = (((x - c[0]) / (shape[0] / 2.2)) ** 2
          + ((y - c[1]) / (shape[1] / 2.2)) ** 2
          + ((z - c[2]) / (shape[2] / 2.2)) ** 2)
    dens = np.where(r2 < 1, (1 - r2) * (0.5 + 0.5 * rng.random(shape)),
                    0.0).astype(np.float32)
    return dens


@pytest.mark.parametrize("compression", [COMPRESS_NONE, COMPRESS_ZIP])
def test_roundtrip_float_grid(tmp_path, compression):
    dens = _blob()
    tr = np.eye(4)
    tr[0, 0] = tr[1, 1] = tr[2, 2] = 0.25
    tr[3, :3] = (-1.0, 2.0, 0.5)
    g = VdbGridData("density", dens, (-5, 3, 40), tr)
    path = str(tmp_path / "rt.vdb")
    write_vdb(path, {"density": g}, compression=compression)
    back = read_vdb(path)["density"]
    assert np.allclose(back.transform, tr)
    # compare over the common index window
    lo = np.maximum(back.ijk_min, g.ijk_min)
    a = dens[lo[0] + 5:, lo[1] - 3:, lo[2] - 40:]
    s = back.values[lo[0] - back.ijk_min[0]:,
                    lo[1] - back.ijk_min[1]:,
                    lo[2] - back.ijk_min[2]:][
        :a.shape[0], :a.shape[1], :a.shape[2]]
    assert np.array_equal(a, s[:a.shape[0], :a.shape[1], :a.shape[2]])
    assert np.isclose(back.values.sum(), dens.sum())


def test_roundtrip_vec3_grid(tmp_path):
    rng = np.random.default_rng(7)
    em = np.zeros((10, 12, 9, 3), np.float32)
    em[2:8, 3:9, 2:7] = rng.uniform(0, 3, (6, 6, 5, 3)).astype(np.float32)
    g = VdbGridData("Cd", em, (0, 0, 0), np.eye(4))
    path = str(tmp_path / "v3.vdb")
    write_vdb(path, {"Cd": g})
    back = read_vdb(path)["Cd"]
    assert back.values.shape[-1] == 3
    assert np.isclose(back.values.sum(), em.sum())


def _write_scene(tmp_path, grid_block, sigma=6.0):
    """Cube of participating medium in front of a lit backdrop."""
    scene = {
        "media": [{
            "name": "vol", "type": "voxel",
            "sigma_a": [sigma * 0.4] * 3, "sigma_s": [sigma * 0.6] * 3,
            "phase_function": {"type": "isotropic"},
            "grid": grid_block,
        }],
        "bsdfs": [{"name": "white", "type": "lambert", "albedo": 0.8}],
        "primitives": [
            {"type": "quad", "bsdf": "white",
             "transform": {"position": [0, 0, 2], "scale": 8,
                           "rotation": [90, 0, 0]}},
            {"type": "cube", "bsdf": {"type": "null"}, "int_medium": "vol",
             "transform": {"scale": 1.6}},
            {"type": "quad", "emission": [6, 6, 6],
             "transform": {"position": [0, 2.5, 0], "scale": 3}},
        ],
        "camera": {"type": "pinhole", "fov": 60,
                   "resolution": [48, 32],
                   "transform": {"position": [0, 0, -3.2],
                                 "look_at": [0, 0, 0],
                                 "up": [0, 1, 0]}},
        "integrator": {"type": "path_tracer", "max_bounces": 16,
                       "enable_light_sampling": True},
        "renderer": {"spp": 8, "scene_bvh": True},
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(scene))
    return str(p)


def test_vdb_voxel_medium_matches_dense(tmp_path):
    """The same density field rendered via a .vdb fixture and via the
    dense-.npy path must produce identical images (same loader output)."""
    from tungsten_tpu.render import render
    from tungsten_tpu.scene.flatten import load_flat_scene

    dens = _blob(seed=3)
    tr = np.eye(4)  # voxel size 1, origin at index 0
    write_vdb(str(tmp_path / "fog.vdb"),
              {"density": VdbGridData("density", np.pad(dens, 1),
                                      (-1, -1, -1), tr)})
    np.save(tmp_path / "fog.npy", dens)

    vdb_block = {"type": "vdb", "file": "fog.vdb", "density_scale": 1.5,
                 "normalize_size": True,
                 "transform": {"position": [0, 0, 0], "scale": 1.5}}
    # the dense path maps the unit cube onto the transform; replicate
    # normalize_size manually: it unit-boxes the active region already
    dense_block = {"type": "dense", "file": "fog.npy",
                   "density_scale": 1.5,
                   "transform": {"position": [0, 0, 0], "scale": 1.5}}

    scene_v, set_v = load_flat_scene(_write_scene(tmp_path, vdb_block))
    img_v = render(scene_v, set_v, spp=4, spp_chunk=4)
    assert np.isfinite(img_v).all() and img_v.mean() > 0

    scene_d, set_d = load_flat_scene(_write_scene(tmp_path, dense_block))
    img_d = render(scene_d, set_d, spp=4, spp_chunk=4)
    # same physics through two loaders: images agree closely (grids are
    # aligned up to the normalize_size centering, tolerate a few %)
    rel = abs(img_v.mean() - img_d.mean()) / max(img_d.mean(), 1e-6)
    assert rel < 0.15, f"vdb vs dense mean differs {rel:.3f}"


def test_vdb_loader_shapes_and_scale(tmp_path):
    from tungsten_tpu.scene.flatten import _load_vdb_grid

    dens = _blob(seed=5)
    em = np.zeros(dens.shape + (3,), np.float32)
    em[dens > 0.2] = 2.0
    write_vdb(str(tmp_path / "g.vdb"),
              {"density": VdbGridData("density", dens, (4, 4, 4), np.eye(4)),
               "Cd": VdbGridData("Cd", em, (4, 4, 4), np.eye(4))})
    g = {"type": "vdb", "file": "g.vdb", "density_scale": 2.0,
         "emission_scale": 3.0, "scale_emission_by_density": True,
         "normalize_size": False}
    d, e, w2g = _load_vdb_grid(g, lambda p: str(tmp_path / p))
    assert d.ndim == 3 and e.shape == d.shape + (3,)
    assert np.isclose(d.max(), dens.max() * 2.0, rtol=1e-5)
    # emission scaled by (already scaled) density
    assert e.max() > 0
    assert w2g.shape == (3, 4)


def test_voxel_medium_scene_with_synthesized_fire_vdb(tmp_path):
    """The voxel-medium fixture scene loads end to end with the
    synthesized fire.vdb (tests/goldens/gen_assets.py): vdb archive IO,
    density + Vec3 emission grids, the exact_linear modes from the
    grid JSON, and a short render."""
    import json
    import shutil
    import subprocess
    import sys
    import numpy as np
    from dataclasses import replace
    src = "/root/reference/data/example-scenes/voxel-medium"
    work = tmp_path / "vox"
    shutil.copytree(src, work)
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run([sys.executable,
                    os.path.join(here, "goldens", "gen_assets.py"),
                    str(work)], check=True)
    from tungsten_tpu.scene.flatten import load_flat_scene
    scene, settings = load_flat_scene(str(work / "scene.json"))
    assert settings.voxel_integration == "exact_linear"
    assert settings.voxel_sampling == "exact_linear"
    assert len(scene.grid_density) == 1
    assert scene.grid_emission[0].shape[-1] == 3
    assert float(scene.grid_density[0].max()) > 0.1
    from tungsten_tpu.render import render
    settings = replace(settings, width=32, height=18, max_bounces=4)
    img = np.asarray(render(scene, settings, spp=2, spp_chunk=2))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4   # skydome + emissive plume visible
