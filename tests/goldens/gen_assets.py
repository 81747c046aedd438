#!/usr/bin/env python
"""Synthesize the fixture assets the reference checkout does NOT ship
(VERDICT r3 item 2): `curl.fiber` for the hair scene and `fire.vdb` for
the voxel-medium scene.  Both are deterministic (fixed seeds), written
with this repo's own IO (io/curves.py save_fiber, io/vdb.py write_vdb),
and loadable by BOTH renderers — the reference reads .fiber natively
(src/core/io/CurveIO.cpp:210-452).  The .vdb is loadable by the
reference only when its build has OpenVDB; this toolchain has no
OpenVDB dev libraries (verified via ldconfig + the reference CMake log
"No OpenVDB"), so the voxel gate is the internal analytic-equivalence
test in tests/test_voxel_gate.py instead of a reference render.

Usage: python tests/goldens/gen_assets.py <outdir>
"""
import os
import sys

import numpy as np


def make_curl_wig(n_strands=900, verts=32, seed=0xC021):
    """Curly strands rooted on a sphere, hanging 18-35 fiber units in
    +y with a helical curl — a stand-in for the original curl.fiber at
    the hair scene's framing: the scene transform is
    world = R_z(180) . diag(0.1, 0.133, 0.1) . fiber + (0, 9.4, 0), so
    fiber +y is world DOWN and the camera (looking at world y ~5.9)
    sees fiber y ~ 15..33."""
    rng = np.random.default_rng(seed)
    R = 8.0
    # roots: everywhere except the world-down pole (fiber +y)
    u = rng.uniform(-1.0, 0.7, n_strands)          # fiber-y cosine
    phi = rng.uniform(0.0, 2 * np.pi, n_strands)
    st = np.sqrt(np.maximum(1.0 - u * u, 0.0))
    roots = np.stack([R * st * np.cos(phi), R * u,
                      R * st * np.sin(phi)], axis=-1)
    nrm = roots / np.linalg.norm(roots, axis=-1, keepdims=True)

    # helix frame per strand: outward normal + two tangents
    down = np.asarray([0.0, 1.0, 0.0])             # fiber +y = world down
    t1 = np.cross(nrm, down)
    t1 /= np.maximum(np.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = np.cross(nrm, t1)

    length = rng.uniform(18.0, 35.0, n_strands)[:, None]
    curl_r = rng.uniform(0.8, 2.0, n_strands)[:, None]
    turns = rng.uniform(3.0, 6.0, n_strands)[:, None]
    phase = rng.uniform(0.0, 2 * np.pi, n_strands)[:, None]

    s = np.linspace(0.0, 1.0, verts)[None, :, None]       # (1, V, 1)
    ang = phase[:, :, None] + turns[:, :, None] * 2 * np.pi * s
    # drift outward along the root normal, hang down (+y), curl
    pos = (roots[:, None, :]
           + nrm[:, None, :] * (3.0 * np.sqrt(s))
           + down[None, None, :] * (length[:, :, None] * s * s)
           + (t1[:, None, :] * np.cos(ang) + t2[:, None, :] * np.sin(ang))
           * (curl_r[:, :, None] * np.minimum(4.0 * s, 1.0)))
    width = np.full((n_strands, verts, 1), 1.0, np.float32)
    nodes = np.concatenate([pos, width], axis=-1).reshape(-1, 4)
    curve_ends = (np.arange(1, n_strands + 1) * verts).astype(np.uint32)
    return curve_ends, nodes.astype(np.float32)


def make_fire_grid(n=48, seed=0xF12E):
    """Dense pseudo-'fire' density + Vec3 emission grids: a noisy
    rising plume in a unit-indexed (n, n, n) box."""
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    cx = (x - n / 2) / (n / 2)
    cz = (z - n / 2) / (n / 2)
    h = y / n
    r = np.sqrt(cx * cx + cz * cz)
    core = np.exp(-((r / (0.45 - 0.25 * h + 1e-3)) ** 2) * 3.0)
    falloff = np.clip(1.0 - h, 0.0, 1.0) ** 0.7
    # band-limited noise: upsampled random lattice
    base = rng.random((n // 8 + 2,) * 3)
    from numpy import kron
    noise = kron(base, np.ones((8, 8, 8)))[:n, :n, :n]
    dens = np.clip(core * falloff * (0.6 + 0.8 * noise) - 0.05, 0.0, None)
    dens = dens.astype(np.float32)
    # emission ~ blackbody-ish ramp with height, scaled by density
    tcol = np.stack([np.full_like(dens, 1.0),
                     np.clip(0.9 - 0.8 * h, 0.05, 1.0).astype(np.float32),
                     np.clip(0.45 - 0.42 * h, 0.01, 1.0).astype(np.float32)],
                    axis=-1)
    emis = (tcol * (dens[..., None] > 0.02)).astype(np.float32)
    return dens, emis


def main(outdir):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from tungsten_tpu.io.curves import CurveData, init_normals, save_fiber
    from tungsten_tpu.io.vdb import VdbGridData, write_vdb

    os.makedirs(outdir, exist_ok=True)
    curve_ends, nodes = make_curl_wig()
    normals = init_normals(curve_ends, nodes)
    save_fiber(os.path.join(outdir, "curl.fiber"),
               CurveData(curve_ends=curve_ends, nodes=nodes,
                         normals=normals))
    print("wrote curl.fiber:", len(curve_ends), "strands,",
          len(nodes), "vertices")

    dens, emis = make_fire_grid()
    n = dens.shape[0]
    # index -> world: center the unit-ish cube on the origin like the
    # original asset (the scene's grid transform then places it)
    xf = np.diag([1.0 / n, 1.0 / n, 1.0 / n, 1.0]).astype(np.float64)
    xf[3, :3] = [-0.5, 0.0, -0.5]
    write_vdb(os.path.join(outdir, "fire.vdb"),
              {"density": VdbGridData("density", dens, (0, 0, 0), xf),
               "Cd": VdbGridData("Cd", emis, (0, 0, 0), xf)})
    print("wrote fire.vdb:", dens.shape, "density +", emis.shape,
          "emission; nonzero voxels:", int((dens > 0).sum()))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "assets"))
