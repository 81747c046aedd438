"""SceneDesc -> FlatScene: the device-side scene representation.

The reference instantiates an object graph and intersects through virtual
calls (ref: src/core/io/Scene.cpp:373-376, TraceableScene.hpp:57-137).
The TPU-native design flattens everything into typed SoA arrays up front:
  * all finite geometry triangulated / gathered into one triangle SoA with
    a host-built SAH BVH over it (+ analytic sphere list),
  * BSDFs as one parameter-table row each,
  * emissive primitives as a light table with area CDFs,
  * an equirect envmap with Tungsten-compatible importance-sampling CDFs
    (ref: src/core/textures/BitmapTexture.cpp:400-431).
Everything lives in one pytree so a render step jits against it.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from tungsten_tpu.bsdf import types as bsdf_types
from tungsten_tpu.io import mesh as mesh_io
from tungsten_tpu.scene import transform as xform
from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.textures import TextureTableBuilder

LIGHT_AREA = 0
LIGHT_INFINITE = 1
LIGHT_CAP = 2
LIGHT_POINT = 3
LIGHT_DISK = 4       # analytic disk emitter (ref Disk::sampleDirect)
LIGHT_CYLINDER = 5   # analytic cylinder emitter (ref Cylinder::sampleDirect)
LIGHT_SPHERE = 6     # analytic sphere emitter: cone sampling toward the
                     # subtended cap (ref Sphere::sampleDirect)

def _lt_slot_of_tri(lt_tri_l, num_tris):
    """Reverse map: global triangle id -> its alias-table slot."""
    slot = np.full(max(num_tris, 1), -1, np.int32)
    if lt_tri_l:
        cat = np.concatenate(lt_tri_l).astype(np.int64)
        slot[cat] = np.arange(len(cat), dtype=np.int32)
    return slot


def _build_alias(p):
    """Walker/Vose alias table for probabilities p (sum ~1).  Returns
    (prob (n,) f32 keep-probability, alias (n,) i32 local index)."""
    n = len(p)
    if n == 0:
        return np.zeros(0, np.float32), np.zeros(0, np.int32)
    scaled = np.asarray(p, np.float64) * n
    prob = np.ones(n, np.float32)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    return prob, alias

# curve render modes (ref Curves.cpp:20-25)
CURVE_MODE_CYLINDER = 0
CURVE_MODE_HALF_CYLINDER = 1
CURVE_MODE_BCSDF_CYLINDER = 2
CURVE_MODE_RIBBON = 3
CURVE_MODES = {"cylinder": CURVE_MODE_CYLINDER,
               "half_cylinder": CURVE_MODE_HALF_CYLINDER,
               "bcsdf_cylinder": CURVE_MODE_BCSDF_CYLINDER,
               "ribbon": CURVE_MODE_RIBBON}
CURVE_SUBDIV = 8  # linear pieces per quadratic segment (leaf test)

TONEMAPS = {"linear": 0, "gamma": 1, "reinhard": 2, "filmic": 3, "pbrt": 4}
FILTERS = {"dirac": 0, "box": 1, "tent": 2, "gaussian": 3,
           "mitchell_netravali": 4, "catmull_rom": 5, "lanczos": 6}


@struct.dataclass
class FlatScene:
    # --- triangles (SoA) ---
    tri_v0: Any
    tri_e1: Any
    tri_e2: Any
    tri_shade: Any      # (T, 21) packed [e1, e2, n0, n1, n2, uv0..uv2]:
                        # hit expansion reads ONE gather row instead of
                        # eight separate table gathers (round-5 profile:
                        # random gathers are a dominant bounce-glue cost)
    tri_n0: Any
    tri_n1: Any
    tri_n2: Any
    tri_uv0: Any
    tri_uv1: Any
    tri_uv2: Any
    tri_prim: Any       # (T,) i32
    # --- BVH ---
    bvh_min: Any        # (N,3)
    bvh_max: Any
    bvh_meta: Any       # (N,2) i32
    bvh_skip: Any       # (N,) i32
    # --- cluster tables for the Pallas traversal kernel (ops/wave_trace) ---
    wk_boxes: Any       # (16, NCp) attr-major cluster AABBs (+valid)
    wk_cbox: Any        # (NCp, 8) cluster-major AABBs (drain gate)
    wk_sbox: Any        # (16, NSp) super-cluster AABBs (phase-A cull)
    wk_attr: Any        # (NCp*16, 128) precomputed MT rows per cluster
    wk_remap: Any       # (NCp*128,) i32 (cluster*128+lane) -> tri id
    # --- analytic spheres ---
    sph_center: Any     # (S,3)
    sph_radius: Any     # (S,)
    sph_prim: Any       # (S,) i32
    # --- analytic disks / cylinders (ref Disk.cpp:64-87 /
    # Cylinder.cpp:56-109: exact plane/quadric tests, not the previous
    # triangulated proxies whose silhouettes were polygonal) ---
    dsk_c: Any          # (D,3) center
    dsk_n: Any          # (D,3) unit normal
    dsk_r: Any          # (D,) radius (ref: max xz scale, unit radius 1)
    dsk_cos: Any        # (D,) cos(cone_angle) visibility gate
    dsk_prim: Any       # (D,) i32
    cyl_pos: Any        # (Y,3) center
    cyl_rot: Any        # (Y,3,3) local->world rotation (orthonormal)
    cyl_r: Any          # (Y,) radius = 0.5 * max xz scale
    cyl_hh: Any         # (Y,) half height = 0.5 * y scale
    cyl_capped: Any     # (Y,) bool
    cyl_prim: Any       # (Y,) i32
    # --- curves (ref src/core/primitives/Curves.cpp): quadratic B-spline
    # segments, pre-subdivided into linear "pieces" for the TPU-friendly
    # branchless leaf test; the segment table keeps the exact spline for
    # hit expansion (normal/tangent at the hit parameter). ---
    crv_seg_p0: Any     # (Cs,4) control points xyz+width (world)
    crv_seg_p1: Any
    crv_seg_p2: Any
    crv_seg_n0: Any     # (Cs,3) node normals (ribbon mode)
    crv_seg_n1: Any
    crv_seg_n2: Any
    crv_seg_prim: Any   # (Cs,) i32
    crv_seg_mode: Any   # (Cs,) i32 CURVE_MODE_*
    crv_pc_q0: Any      # (Cp,4) piece endpoints xyz+width
    crv_pc_q1: Any
    crv_pc_nmid: Any    # (Cp,3) spline normal at piece midpoint (ribbon)
    crv_pc_seg: Any     # (Cp,) i32 parent segment
    crv_pc_t0: Any      # (Cp,) segment-parameter range of the piece
    crv_pc_t1: Any
    cbvh_min: Any       # curve-piece BVH (same layout as bvh_*)
    cbvh_max: Any
    cbvh_meta: Any
    cbvh_skip: Any
    # --- hair BCSDF azimuthal tables (ref PrecomputedAzimuthalLobe),
    # one set per hair-type BSDF instance ---
    hair_values: Any    # (H,3,AZ,AZ,3) N_R/N_TT/N_TRT over (cosThetaD,phi)
    hair_pdf: Any       # (H,3,AZ,AZ) row-normalized sampling pdf
    hair_cdf: Any       # (H,3,AZ,AZ+1)
    hair_sums: Any      # (H,3,AZ) unnormalized row sums (lobe weights)
    hair_params: Any    # (H,4) scale_angle_rad, vR, vTT, vTRT
    # --- primitives ---
    prim_bsdf: Any      # (P,) i32
    prim_emission_tex: Any  # (P,) i32, -1 if not emissive
    prim_light: Any     # (P,) i32, -1 if not a samplable light
    # --- bsdf table ---
    bsdf_type: Any      # (B,) i32
    bsdf_albedo_tex: Any
    bsdf_params: Any    # (B,16)
    bsdf_aux: Any       # (B,4) i32
    # --- textures ---
    tex_type: Any
    tex_const: Any
    tex_params: Any
    tex_bitmap_id: Any
    bitmaps: Any        # tuple of (H,W,3) arrays
    # --- lights ---
    light_type: Any     # (L,) i32
    light_prim: Any     # (L,) i32
    light_slot: Any     # (L,) i32 analytic-table row (disk/cyl lights)
    light_emission: Any  # (L,3) constant emission (area lights)
    lt_prob: Any        # (S,) f32 flat per-light triangle alias tables
    lt_alias: Any       # (S,) i32 alias slot (light-local index)
    lt_tri: Any         # (S,) i32 global triangle id
    lt_slot: Any        # (T,) i32 global tri -> alias slot (-1 = not a
                        # light tri); the invertPosition reverse map
    light_tri_off: Any  # (L,) i32 offset of this light's alias rows
    light_tri_cnt: Any  # (L,) i32 triangle count (any size — no cap)
    light_area: Any     # (L,) total area
    light_aux: Any      # (L, 4) cap: dir(3)+cos_cap; point: pos(3)
    light_bsr: Any      # (L, 4) bounding sphere center+radius (area)
    light_lum: Any      # (L,) approximateRadiance luminance scale
    # --- infinite-cap emitters (sun), hit on escape ---
    cap_dir: Any        # (C, 3)
    cap_cos: Any        # (C,)
    cap_emission: Any   # (C, 3)
    cap_samplable: Any  # (C,) bool
    # --- media ---
    # --- scene-wide occluder bounds (tris + every analytic primitive
    # + curves): rays clipped to their exit of this box cannot be
    # occluded past it — used to shorten env/cap shadow rays ---
    geo_lo: Any          # (3,)
    geo_hi: Any          # (3,)
    med_sigma_a: Any     # (M,3) material sigma_a * density
    med_sigma_s: Any     # (M,3)
    med_phase: Any       # (M,) i32
    med_g: Any           # (M,)
    med_trans_type: Any  # (M,) i32
    med_trans_params: Any  # (M,4); (M,16) when any law is interpolated
    med_max_bounce: Any  # (M,) i32
    # --- heterogeneous media (ref VoxelMedium/ExponentialMedium) ---
    med_kind: Any        # (M,) i32: 0 homogeneous / 1 exponential / 2 voxel
    med_grid: Any        # (M,) i32 grid index for voxel media, else -1
    med_exp_params: Any  # (M,8): falloff_scale, unit_point(3), falloff_dir(3)
    grid_density: Any    # tuple of (nx,ny,nz) f32 (zero-padded border)
    grid_emission: Any   # tuple of (nx,ny,nz,3) f32 ((0,0,0,3) if none)
    grid_w2g: Any        # (G,3,4) world -> grid-index affine
    grid_super: Any      # tuple of (sx,sy,sz,2) f32 [muC, muR] majorant
                         # supergrids (SUPERGRID_SUB^3 voxels per cell)
    prim_int_medium: Any  # (P,) i32, -1 = none
    prim_ext_medium: Any  # (P,) i32
    cam_medium: Any      # () i32
    # --- envmap ---
    env_image: Any      # (H,W,3) (1x1 black if none)
    env_cond_pdf: Any   # (H,W)
    env_cond_cdf: Any   # (H,W+1)
    env_marg_pdf: Any   # (H,)
    env_marg_cdf: Any   # (H+1,)
    env_alias: Any      # (H*W, 4) packed [prob, alias, pdf_self, pdf_alias]
    env_quad: Any       # (H*W, 12) bf16 bilinear neighborhood rows
                        # [c00 c10 c01 c11] (wrap) — ONE gather per
                        # bilinear env tap instead of four (round-5b
                        # glue profile: env taps were ~23 ms/bounce)
    env_pdf_tab: Any    # (H*W,) texel pdf only (env_pdf's hot gather:
                        # 4x smaller rows than env_alias -> smaller
                        # random-access working set)
    env_to_world: Any   # (3,3)
    env_to_local: Any   # (3,3)
    env_light_index: Any  # () i32, -1 if none
    env_emission_scale: Any  # () f32
    # --- camera ---
    cam_mat: Any        # (4,4) camera-to-world
    cam_plane_dist: Any  # ()
    cam_ap_prob: Any    # (N,) thinlens aperture alias keep-probability
    cam_ap_alias: Any   # (N,) i32
    cam_ap_hw: Any      # (2,) i32 aperture bitmap (H, W)
    cam_ratio: Any      # ()


@dataclass(frozen=True)
class RenderSettings:
    """Static (python-side) render configuration — jit-static."""
    width: int
    height: int
    spp: int = 16
    max_bounces: int = 64
    min_bounces: int = 0
    enable_light_sampling: bool = True
    enable_volume_light_sampling: bool = True
    two_sided_shading: bool = True
    seed: int = 0xBA5EBA11
    tonemap: str = "gamma"
    filter: str = "tent"
    camera_type: str = "pinhole"
    cubemap_mode: str = "horizontal_cross"
    fov_deg: float = 60.0
    focus_distance: float = 1.0
    aperture_size: float = 0.001
    aperture_tex: bool = False  # thinlens custom aperture bitmap present
    cat_eye: float = 0.0
    spp_step: int = 16
    stratified_sampler: bool = False  # scrambled Sobol' vs pcg4d hash
    adaptive_sampling: bool = False   # per-tile budget reallocation
    has_env: bool = False
    num_lights: int = 0
    present_bsdf_types: tuple = ()
    has_media: bool = False
    num_caps: int = 0
    has_points: bool = False
    has_disk_lights: bool = False  # analytic disk emitters present
    has_cyl_lights: bool = False   # analytic cylinder emitters present
    has_sphere_lights: bool = False  # analytic sphere emitters present
    has_area_lights: bool = True   # any triangle-mesh area light
    has_curves: bool = False
    curve_modes: tuple = ()  # CURVE_MODE_* values present in the scene
    med_kinds: tuple = ()    # medium kinds present (grid.MED_*)
    grid_steps: int = 96     # raymarch steps for voxel optical depth
    # voxel-media optical-depth integration (ref VdbGrid.hpp:16-44
    # IntegrationMethod): "residual_ratio" = unbiased residual-ratio
    # tracking over the majorant supergrid (ref generateSuperGrid +
    # opticalDepth ResidualRatio branch, VdbGrid.cpp:87-134,332-361);
    # "exact_linear"/"exact_nearest" = voxel-boundary DDA (ref
    # VdbRaymarcher walks, VdbGrid.cpp:308-331); "raymarching" =
    # fixed-step midpoint quadrature fallback
    voxel_integration: str = "raymarching"
    # distance sampling (ref VdbGrid SampleMethod, inverseOpticalDepth
    # VdbGrid.cpp:382-430): "exact_linear"/"exact_nearest" DDA with
    # in-segment inversion, or "raymarching" fixed-step inversion
    voxel_sampling: str = "raymarching"
    rr_max_events: int = 192  # event cap per transmittance query
    integrator_type: str = "path_tracer"
    bdpt_vertices: int = 8   # per-subpath vertex cap for bdpt/light_tracer
    # photon_map / progressive_photon_map (ref PhotonMapSettings.hpp)
    photon_count: int = 1 << 20
    gather_radius: float = 0.05
    gather_count: int = 20   # gather_photon_count (kNN k)
    vol_gather_radius: float = 0.05  # volume_gather_radius (points map)
    vol_photon_type: str = "points"  # "points" | "beams" (ref
                                     # PhotonMapSettings volumePhotonType)
    vol_photon_count: int = 10000    # ref volumePhotonCount: the beam
                                     # map subsamples this many paths
    ppm_alpha: float = 0.3
    # MLT family (ref KelemenMltSettings / MultiplexedMltSettings /
    # ReversibleJumpMltSettings)
    mlt_large_step_prob: float = 0.1
    mlt_sample_pool: int = 10000     # initial_sample_pool
    mlt_chains: int = 8192           # parallel chains per batch
    mlt_strategy_prob: float = 0.05  # strategy_perturbation_probability
    mlt_path_length: int = -1        # MMLT: restrict to one path length
    # kelemen_mlt / multiplexed_mlt base sampler (ref
    # KelemenMltSettings.hpp:19 "bidirectional", default true): chains
    # mutate a BDPT tape (camera + light subpaths + connections)
    # instead of the unidirectional PT tape
    mlt_bidirectional: bool = True
    # output buffers (ref OutputBufferSettings): when True the wavefront
    # tracks depth/normal/albedo/visibility at the first non-specular
    # vertex (PathTracer.cpp:78-96) alongside the radiance
    track_aovs: bool = False


_UNIT_QUAD_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)


class _GeomAccum:
    def __init__(self):
        self.v0, self.e1, self.e2 = [], [], []
        self.n0, self.n1, self.n2 = [], [], []
        self.uv0, self.uv1, self.uv2 = [], [], []
        self.prim = []

    def add_tris(self, verts, uvs, normals, tri_idx, prim_id):
        """verts (V,3), uvs (V,2), normals (V,3), tri_idx (T,3)."""
        a = verts[tri_idx[:, 0]]
        b = verts[tri_idx[:, 1]]
        c = verts[tri_idx[:, 2]]
        self.v0.append(a)
        self.e1.append(b - a)
        self.e2.append(c - a)
        self.n0.append(normals[tri_idx[:, 0]])
        self.n1.append(normals[tri_idx[:, 1]])
        self.n2.append(normals[tri_idx[:, 2]])
        self.uv0.append(uvs[tri_idx[:, 0]])
        self.uv1.append(uvs[tri_idx[:, 1]])
        self.uv2.append(uvs[tri_idx[:, 2]])
        self.prim.append(np.full(tri_idx.shape[0], prim_id, np.int32))

    def count(self):
        return sum(p.shape[0] for p in self.prim)


def _quad_verts(m):
    """Tungsten quad: unit XZ square through origin (ref Quad.cpp:298-312)."""
    base = xform.transform_point(m, [0.0, 0.0, 0.0])
    e0 = xform.transform_vectors(m, [[1.0, 0.0, 0.0]])[0]
    e1 = xform.transform_vectors(m, [[0.0, 0.0, 1.0]])[0]
    base = base - 0.5 * e0 - 0.5 * e1
    verts = np.stack([base, base + e0, base + e0 + e1, base + e1])
    n = np.cross(e1, e0)
    n = n / max(np.linalg.norm(n), 1e-30)
    return verts.astype(np.float32), n.astype(np.float32)


def _cube_tris(m):
    """Unit cube [-0.5,0.5]^3 in local space, 12 tris (ref Cube.cpp:17-33:
    world box is transform * unit cube)."""
    corners = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    )
    # faces as corner indices (ccw from outside)
    faces = [
        (0, 1, 3, 2, (-1, 0, 0)), (4, 6, 7, 5, (1, 0, 0)),
        (0, 4, 5, 1, (0, -1, 0)), (2, 3, 7, 6, (0, 1, 0)),
        (0, 2, 6, 4, (0, 0, -1)), (1, 5, 7, 3, (0, 0, 1)),
    ]
    verts, uvs, normals, tris = [], [], [], []
    for a, b, c, d, n in faces:
        i = len(verts)
        quad = corners[[a, b, c, d]]
        world = xform.transform_points(m, quad)
        fn = np.cross(world[1] - world[0], world[3] - world[0])
        fn = fn / max(np.linalg.norm(fn), 1e-30)
        verts.extend(world)
        uvs.extend(_UNIT_QUAD_UV)
        normals.extend([fn] * 4)
        tris.append((i, i + 1, i + 2))
        tris.append((i, i + 2, i + 3))
    return (np.asarray(verts, np.float32), np.asarray(uvs, np.float32),
            np.asarray(normals, np.float32), np.asarray(tris, np.int32))


SUPERGRID_SUB = 8    # voxels per supercell axis (ref default 10)


def build_supergrid(dens: np.ndarray, sub: int = SUPERGRID_SUB):
    """Residual-ratio control/majorant supergrid (ref
    VdbGrid::generateSuperGrid, VdbGrid.cpp:87-134): per supercell of
    sub^3 voxels compute muC (control, the Novak et al. 2014 formula
    clamped to [muMin, muAvg]) and muR >= max |rho - muC| over the
    cell.  Min/max are dilated by one voxel so trilinear samples near
    cell borders stay inside the bound (keeps the ratio-tracking factor
    1 - (rho-muC)/muR nonnegative)."""
    nx, ny, nz = dens.shape
    sx, sy, sz = (-(-nx // sub), -(-ny // sub), -(-nz // sub))
    pad = np.zeros((sx * sub, sy * sub, sz * sub), np.float32)
    pad[:nx, :ny, :nz] = dens

    def dilate(a, op):
        for ax in range(3):
            lo = np.concatenate([a.take([0], ax), a], ax)
            hi = np.concatenate([a, a.take([-1], ax)], ax)
            a = op(lo.take(range(a.shape[ax]), ax),
                   hi.take(range(1, a.shape[ax] + 1), ax))
        return a

    mx = dilate(pad, np.maximum)
    mn = dilate(pad, np.minimum)

    def block(a, red):
        return red(a.reshape(sx, sub, sy, sub, sz, sub), axis=(1, 3, 5))

    mu_max = block(mx, np.max)
    mu_min = block(mn, np.min)
    mu_avg = block(pad, np.mean)
    width = mu_max - mu_min
    gamma = 2.0
    D = np.sqrt(3.0) * sub
    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        mu_c = mu_min + width * (np.power(gamma,
                                          1.0 / (D * np.maximum(width,
                                                                1e-30)))
                                 - 1.0)
    mu_c = np.clip(np.nan_to_num(mu_c, posinf=0.0), mu_min, mu_avg)
    mu_r = np.maximum(mu_max - mu_c, mu_c - mu_min)
    return np.stack([mu_c, mu_r], axis=-1).astype(np.float32)


def _load_grid(g: dict, resolve_path):
    """Load a density grid spec -> (density (padded), emission|None, w2g).

    Supported specs:
      {"type": "dense", "file": "x.npy" | "data": [[[...]]],
       "emission_file"/"emission_data": ..., "density_scale": s,
       "emission_scale": s, "scale_emission_by_density": bool,
       "transform": {...}}  — the transform maps the local unit cube
       [-0.5, 0.5]^3 onto the world (same convention as primitives).
      {"type": "vdb", ...}  — requires an OpenVDB reader; not available
       in this environment (re-export as .npy dense and use "dense").

    The returned density grid is zero-padded by one voxel per side so
    clamped trilinear lookups read zero outside the active region; w2g
    maps world points to padded index coordinates.
    (ref: src/core/grids/VdbGrid.hpp:16-44 — the sparse VDB tree becomes
    a dense device brick per SURVEY §2.7.)
    """
    gtype = g.get("type", "dense")
    if gtype == "vdb":
        return _load_vdb_grid(g, resolve_path)
    if gtype != "dense":
        raise NotImplementedError(f"grid type not supported: {gtype}")

    if "data" in g:
        dens = np.asarray(g["data"], np.float32)
    else:
        dens = np.load(resolve_path(g["file"])).astype(np.float32)
    if dens.ndim != 3 or min(dens.shape) < 2:
        raise ValueError("dense grid must be (nx,ny,nz) with n >= 2")
    dens = dens * float(g.get("density_scale", 1.0))

    emis = None
    if "emission_data" in g or "emission_file" in g:
        if "emission_data" in g:
            emis = np.asarray(g["emission_data"], np.float32)
        else:
            emis = np.load(resolve_path(g["emission_file"])).astype(
                np.float32)
        if emis.ndim == 3:
            emis = np.repeat(emis[..., None], 3, axis=-1)
        emis = emis * float(g.get("emission_scale", 1.0))
        if g.get("scale_emission_by_density", False):
            emis = emis * dens[..., None]
        emis = np.pad(emis, ((1, 1), (1, 1), (1, 1), (0, 0)))

    n = np.asarray(dens.shape, np.float64)
    dens = np.pad(dens, 1)

    m = xform.parse_transform(g.get("transform"))
    minv = np.linalg.inv(m)
    # index = (local + 0.5) * (n - 1) + 1  (padded by one voxel)
    a = (n - 1)[:, None] * minv[:3, :3]
    b = (minv[:3, 3] + 0.5) * (n - 1) + 1.0
    w2g = np.concatenate([a, b[:, None]], axis=1).astype(np.float32)
    return dens, emis, w2g


def _host_trilinear(vol, pts):
    """Host-side trilinear sample of vol (nx,ny,nz,C) at pts (N,3);
    out-of-range clamps (the brick is zero-padded so clamps read 0)."""
    n = np.asarray(vol.shape[:3])
    p = np.clip(pts, 0.0, n - 1.0 - 1e-6)
    i0 = np.floor(p).astype(np.int64)
    f = (p - i0)[..., None]
    i1 = np.minimum(i0 + 1, n - 1)
    c = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = (i1 if dx else i0)[:, 0]
                iy = (i1 if dy else i0)[:, 1]
                iz = (i1 if dz else i0)[:, 2]
                w = ((f[:, 0] if dx else 1 - f[:, 0])
                     * (f[:, 1] if dy else 1 - f[:, 1])
                     * (f[:, 2] if dz else 1 - f[:, 2]))
                c = c + vol[ix, iy, iz] * w
    return c


def _load_vdb_grid(g: dict, resolve_path):
    """OpenVDB grid -> (density (padded), emission|None, w2g).

    Mirrors ref src/core/grids/VdbGrid.cpp loadResources (lines 173-265):
    density values scaled in place, medium-local frame built from either
    normalize_size (unit-box the active bbox: scale = 1/diag.max, center
    = minP*scale + (diag.x, 0, diag.z)*0.5) or the grid's own voxel
    spacing (scale = spacing.min, center = -indexToWorld(0)), emission
    resampled at density coords + emissionIndexOffset, scaled and
    optionally multiplied by density.  The sparse tree is densified by
    the reader (io/vdb.py) with a one-voxel zero pad, which also covers
    the reference's exact_linear one-voxel dilation."""
    from tungsten_tpu.io.vdb import read_vdb

    grids = read_vdb(resolve_path(g["file"]))
    dname = g.get("density_name", g.get("grid_name", "density"))
    if dname not in grids:
        raise ValueError(f"vdb: no grid named '{dname}' in {g['file']} "
                         f"(has {list(grids)})")
    gd = grids[dname]
    dens = gd.values * float(g.get("density_scale", 1.0))

    # active-region bbox in the grid's own index space (strip the pad)
    min_p = gd.ijk_min + 1
    diag = np.asarray(dens.shape, np.float64) - 2.0
    spacing = np.abs(np.diag(gd.transform[:3, :3]))
    spacing = np.where(spacing <= 0, 1.0, spacing)
    d_center = gd.transform[3, :3]
    if g.get("normalize_size", True):
        scale = 1.0 / diag.max()
        center = min_p * scale + np.asarray(
            [diag[0] * scale, 0.0, diag[2] * scale]) * 0.5
    else:
        scale = spacing.min()
        center = -d_center

    emis = None
    ename = g.get("emission_name", "Cd")
    if ename in grids:
        ge = grids[ename]
        e_spacing = np.abs(np.diag(ge.transform[:3, :3]))
        e_spacing = np.where(e_spacing <= 0, 1.0, e_spacing)
        e_offset = (d_center - ge.transform[3, :3]) / e_spacing
        # resample emission onto the density brick lattice
        nx, ny, nz = dens.shape
        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij")
        ijk = np.stack([ii, jj, kk], -1).reshape(-1, 3) + gd.ijk_min
        pts = ijk + e_offset - ge.ijk_min
        emis = _host_trilinear(ge.values, pts).reshape(nx, ny, nz, 3)
        emis = emis.astype(np.float32) * float(g.get("emission_scale", 1.0))
        if g.get("scale_emission_by_density", True):
            emis = emis * dens[..., None]

    # w2g: world -> config-local -> vdb index -> padded brick coords
    m_cfg = xform.parse_transform(g.get("transform"))
    minv = np.linalg.inv(m_cfg)
    # index = (local + center) / scale;  brick = index - ijk_min
    a = minv[:3, :3] / scale
    b = (minv[:3, 3] + center) / scale - gd.ijk_min
    w2g = np.concatenate([a, b[:, None]], axis=1).astype(np.float32)
    return dens.astype(np.float32), emis, w2g


def _flatten_curves(prim: dict, m: np.ndarray, resolve_path, prim_id: int):
    """One `curves` primitive -> world-space quadratic segments
    (ref Curves::loadCurves + prepareForRender, Curves.cpp:282-616)."""
    from tungsten_tpu.io import curves as curve_io
    data = curve_io.load_curves(resolve_path(prim["file"]))
    nodes = data.nodes.copy()
    normals = data.normals

    curve_ends = data.curve_ends.astype(np.int64)
    starts = np.concatenate([[0], curve_ends[:-1]])
    counts = curve_ends - starts

    # thickness override / taper run before the transform
    # (Curves::loadCurves, Curves.cpp:296-306)
    if prim.get("curve_thickness") is not None:
        nodes[:, 3] = float(prim["curve_thickness"])
    if bool(prim.get("curve_taper", False)):
        curve_of = np.repeat(np.arange(len(counts)), counts)
        t_in = np.arange(len(nodes)) - starts[curve_of]
        nodes[:, 3] *= 1.0 - (t_in - 0.5) / np.maximum(
            counts[curve_of] - 1, 1)

    # transform nodes; widths scale by the average axis scale
    # (Curves::prepareForRender, Curves.cpp:577-585)
    width_scale = float(np.mean(np.linalg.norm(m[:3, :3], axis=0)))
    nodes[:, :3] = xform.transform_points(m, nodes[:, :3])
    nodes[:, 3] *= width_scale
    nrm = xform.transform_vectors(m, normals)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)

    # subsample: drop whole curves with probability `subsample`
    # (Curves.cpp:593-594)
    subsample = float(prim.get("subsample", 0.0))
    keep = np.ones(len(counts), bool)
    if subsample > 0.0:
        keep = np.random.default_rng(0xBA5EBA11).random(len(counts)) \
            >= subsample

    # segment index triples: curve i contributes nodes [s+2, e)
    seg_last = []
    for i in np.nonzero(keep & (counts >= 3))[0]:
        seg_last.append(np.arange(starts[i] + 2, curve_ends[i]))
    if not seg_last:
        return None
    t2 = np.concatenate(seg_last)
    mode = CURVE_MODES.get(prim.get("mode", "half_cylinder"),
                           CURVE_MODE_HALF_CYLINDER)
    return dict(
        p0=nodes[t2 - 2], p1=nodes[t2 - 1], p2=nodes[t2],
        n0=nrm[t2 - 2].astype(np.float32),
        n1=nrm[t2 - 1].astype(np.float32),
        n2=nrm[t2].astype(np.float32),
        prim=np.full(len(t2), prim_id, np.int32),
        mode=np.full(len(t2), mode, np.int32),
    )


def _build_curve_tables(curve_segs: list):
    """Concatenate per-prim segments, pre-subdivide into linear pieces,
    and build the piece BVH.  Returns a dict of FlatScene crv_*/cbvh_*
    arrays (numpy)."""
    from tungsten_tpu.scene.bvh import build_bvh
    curve_segs = [c for c in curve_segs if c is not None]
    if not curve_segs:
        z4 = np.zeros((0, 4), np.float32)
        z3 = np.zeros((0, 3), np.float32)
        zi = np.zeros((0,), np.int32)
        zf = np.zeros((0,), np.float32)
        bvh = build_bvh(np.zeros((0, 3)), np.zeros((0, 3)))
        return dict(
            crv_seg_p0=z4, crv_seg_p1=z4, crv_seg_p2=z4,
            crv_seg_n0=z3, crv_seg_n1=z3, crv_seg_n2=z3,
            crv_seg_prim=zi, crv_seg_mode=zi,
            crv_pc_q0=z4, crv_pc_q1=z4, crv_pc_nmid=z3,
            crv_pc_seg=zi, crv_pc_t0=zf, crv_pc_t1=zf,
            cbvh_min=bvh.bounds_min, cbvh_max=bvh.bounds_max,
            cbvh_meta=bvh.meta, cbvh_skip=bvh.skip)

    p0 = np.concatenate([c["p0"] for c in curve_segs]).astype(np.float32)
    p1 = np.concatenate([c["p1"] for c in curve_segs]).astype(np.float32)
    p2 = np.concatenate([c["p2"] for c in curve_segs]).astype(np.float32)
    n0 = np.concatenate([c["n0"] for c in curve_segs])
    n1 = np.concatenate([c["n1"] for c in curve_segs])
    n2 = np.concatenate([c["n2"] for c in curve_segs])
    seg_prim = np.concatenate([c["prim"] for c in curve_segs])
    seg_mode = np.concatenate([c["mode"] for c in curve_segs])
    cs = p0.shape[0]
    S = CURVE_SUBDIV

    # B-spline coefficient form (precomputeBSplineCoefficients,
    # Curves.cpp:135-144): q(t) = a t^2 + b t + c
    a = 0.5 * p0 - p1 + 0.5 * p2
    b = p1 - p0
    c = 0.5 * (p0 + p1)
    ts = np.linspace(0.0, 1.0, S + 1, dtype=np.float32)
    vals = (a[:, None] * (ts ** 2)[None, :, None]
            + b[:, None] * ts[None, :, None] + c[:, None])  # (Cs, S+1, 4)
    q0 = vals[:, :-1].reshape(cs * S, 4)
    q1 = vals[:, 1:].reshape(cs * S, 4)
    tmid = 0.5 * (ts[:-1] + ts[1:])
    an, bn, cn = 0.5 * n0 - n1 + 0.5 * n2, n1 - n0, 0.5 * (n0 + n1)
    nmid = (an[:, None] * (tmid ** 2)[None, :, None]
            + bn[:, None] * tmid[None, :, None]
            + cn[:, None]).reshape(cs * S, 3).astype(np.float32)
    pc_seg = np.repeat(np.arange(cs, dtype=np.int32), S)
    pc_t0 = np.tile(ts[:-1], cs)
    pc_t1 = np.tile(ts[1:], cs)

    # piece AABBs: chord box + width + curvature bulge bound
    # (max chord deviation of a quadratic over 1/S of its span)
    bulge = np.linalg.norm(a[:, :3], axis=-1) / (4.0 * S * S)
    pad = (np.maximum(q0[:, 3], q1[:, 3])
           + np.repeat(bulge, S)).astype(np.float32)[:, None]
    lo = np.minimum(q0[:, :3], q1[:, :3]) - pad
    hi = np.maximum(q0[:, :3], q1[:, :3]) + pad
    bvh = build_bvh(lo, hi)
    order = bvh.order
    return dict(
        crv_seg_p0=p0, crv_seg_p1=p1, crv_seg_p2=p2,
        crv_seg_n0=n0, crv_seg_n1=n1, crv_seg_n2=n2,
        crv_seg_prim=seg_prim, crv_seg_mode=seg_mode,
        crv_pc_q0=q0[order], crv_pc_q1=q1[order],
        crv_pc_nmid=nmid[order], crv_pc_seg=pc_seg[order],
        crv_pc_t0=pc_t0[order], crv_pc_t1=pc_t1[order],
        cbvh_min=bvh.bounds_min, cbvh_max=bvh.bounds_max,
        cbvh_meta=bvh.meta, cbvh_skip=bvh.skip)


def _stack_hair_tables(fiber_tables: list) -> dict:
    """Stack per-hair-bsdf azimuthal tables into device arrays; a benign
    1-entry placeholder keeps gathers in-range when no hair is present."""
    from tungsten_tpu.bsdf.fiber import AZ_RES
    if not fiber_tables:
        return dict(
            hair_values=np.zeros((1, 3, AZ_RES, AZ_RES, 3), np.float32),
            hair_pdf=np.full((1, 3, AZ_RES, AZ_RES), 1.0 / AZ_RES,
                             np.float32),
            hair_cdf=np.broadcast_to(
                np.arange(AZ_RES + 1, dtype=np.float32) / AZ_RES,
                (1, 3, AZ_RES, AZ_RES + 1)).copy(),
            hair_sums=np.ones((1, 3, AZ_RES), np.float32),
            hair_params=np.asarray([[0.0, 0.04, 0.01, 0.16]], np.float32))
    return dict(
        hair_values=np.stack([t["values"] for t in fiber_tables]),
        hair_pdf=np.stack([t["pdf"] for t in fiber_tables]),
        hair_cdf=np.stack([t["cdf"] for t in fiber_tables]),
        hair_sums=np.stack([t["sums"] for t in fiber_tables]),
        hair_params=np.stack([t["params"] for t in fiber_tables]))


def _build_env_distribution(img: np.ndarray):
    """Luminance*sin(theta) weights with 3-wide max dilation in u and v,
    per-row + marginal CDFs — matches BitmapTexture::makeSamplable
    (MAP_SPHERICAL) + Distribution2D semantics."""
    h, w = img.shape[:2]
    weight = img.max(axis=-1)  # ref BitmapTexture::weight uses max channel
    rows = np.sin((np.arange(h) * np.pi) / h)[:, None]
    wgt = weight * rows
    # dilate: max with left/right neighbor (wrap), then up/down (wrap)
    wgt = np.maximum(wgt, np.maximum(np.roll(wgt, 1, axis=1), np.roll(wgt, -1, axis=1)))
    wgt = np.maximum(wgt, np.maximum(np.roll(wgt, 1, axis=0), np.roll(wgt, -1, axis=0)))

    row_sum = wgt.sum(axis=1)
    cond_pdf = np.where(row_sum[:, None] < 1e-4, 1.0 / w, wgt / np.maximum(row_sum[:, None], 1e-30))
    cond_cdf = np.zeros((h, w + 1), np.float32)
    cond_cdf[:, 1:] = np.cumsum(cond_pdf, axis=1)
    cond_cdf[:, -1] = 1.0

    marg = row_sum / max(row_sum.sum(), 1e-30)
    marg_cdf = np.zeros(h + 1, np.float32)
    marg_cdf[1:] = np.cumsum(marg)
    marg_cdf[-1] = 1.0

    # O(1) alias table over all texels (Vose/Walker) — the TPU-native
    # sampling path: one packed gather instead of log2(W)+log2(H)
    # binary-search gathers (random gathers are the slow op on TPU).
    # Packed row: [prob_keep, alias_idx, texel_pdf, 0]
    p_tex = (cond_pdf * marg[:, None]).reshape(-1).astype(np.float64)
    p_tex = p_tex / max(p_tex.sum(), 1e-300)
    n = p_tex.size
    scaled = p_tex * n
    alias = np.arange(n, dtype=np.int64)
    prob = np.ones(n, np.float64)
    small = [i for i in np.nonzero(scaled < 1.0)[0]]
    large = [i for i in np.nonzero(scaled >= 1.0)[0]]
    while small and large:
        s = small.pop()
        g = large.pop()
        prob[s] = scaled[s]
        alias[s] = g
        scaled[g] = (scaled[g] + scaled[s]) - 1.0
        (small if scaled[g] < 1.0 else large).append(g)
    packed = np.zeros((n, 4), np.float32)
    packed[:, 0] = prob
    packed[:, 1] = alias
    pdf_rel = p_tex * n  # texel_pdf relative to uniform
    packed[:, 2] = pdf_rel
    # pdf of the ALIAS TARGET texel: lets env_sample resolve the chosen
    # texel's pdf from the one cell gather instead of a second random
    # 512k-row gather (round-5 slope profile: ~2.6 ms per such gather
    # at 262k rays)
    packed[:, 3] = pdf_rel[alias]
    return (cond_pdf.astype(np.float32), cond_cdf,
            marg.astype(np.float32), marg_cdf, packed)


def _build_env_quad(img: np.ndarray) -> np.ndarray:
    """(H*W, 12) bilinear neighborhood table: row (iy*W+ix) packs the
    2x2 texel block [c00, c10, c01, c11] with wrap addressing, bf16
    values identical to the bf16 env_image taps.  Lets the hot env
    paths (env_eval escapes, env_sample radiance) fetch a full bilinear
    footprint in ONE row gather instead of four (round-5b glue
    profile: the four-tap form was the largest single glue cost)."""
    h, w = img.shape[:2]
    c00 = img
    c10 = np.roll(img, -1, axis=1)
    c01 = np.roll(img, -1, axis=0)
    c11 = np.roll(c01, -1, axis=1)
    return np.concatenate([c00, c10, c01, c11],
                          axis=-1).reshape(h * w, 12).astype(np.float32)


def flatten_scene(desc: SceneDesc) -> tuple[FlatScene, RenderSettings]:
    textures = TextureTableBuilder(desc.resolve_path)

    # ---- BSDF table ----
    fiber_tables: list = []
    bsdf_rows = [bsdf_types.parse_bsdf_row(b, textures, fiber_tables)
                 for b in desc.bsdfs]
    if not bsdf_rows:
        bsdf_rows = [bsdf_types.parse_bsdf_row({"type": "lambert"}, textures,
                                               fiber_tables)]

    # ---- media table (ref HomogeneousMedium::prepareForRender scales
    # material cross-sections by density; transmittance law per medium) ----
    from tungsten_tpu.media.transmittance import NAMES as TRANS_NAMES
    from tungsten_tpu.media.phase import NAMES as PHASE_NAMES

    def vec3(v, default=0.0):
        if v is None:
            v = default
        if isinstance(v, (int, float)):
            return [float(v)] * 3
        return [float(x) for x in v]

    from tungsten_tpu.media.grid import (
        MED_ATMOSPHERE, MED_EXPONENTIAL, MED_HOMOGENEOUS, MED_VOXEL)
    MED_KINDS = {"homogeneous": MED_HOMOGENEOUS,
                 "exponential": MED_EXPONENTIAL,
                 "voxel": MED_VOXEL,
                 "atmosphere": MED_ATMOSPHERE}

    med_sigma_a, med_sigma_s = [], []
    med_phase, med_g = [], []
    med_trans_type, med_trans_params, med_max_bounce = [], [], []
    med_kind, med_grid_idx, med_exp_params = [], [], []
    grid_density, grid_emission, grid_w2g = [], [], []
    grid_super = []
    voxel_integration = "raymarching"
    voxel_sampling = "raymarching"
    for m in desc.media:
        mtype = m.get("type", "homogeneous")
        if mtype not in MED_KINDS:
            raise NotImplementedError(
                f"medium type not yet supported: {mtype}")
        kind = MED_KINDS[mtype]
        med_kind.append(kind)
        # homogeneous/exponential scale material cross-sections by the
        # scalar density (ref HomogeneousMedium/ExponentialMedium
        # prepareForRender); voxel grids carry density spatially.
        density = float(m.get("density", 1.0)) if kind != MED_VOXEL else 1.0
        ep = [0.0] * 8
        if kind == MED_EXPONENTIAL:
            ep[0] = float(m.get("falloff_scale", 1.0))
            ep[1:4] = vec3(m.get("unit_point", 0.0))
            fd = np.asarray(vec3(m.get("falloff_direction", [0, 1, 0])),
                            np.float64)
            fd = fd / max(np.linalg.norm(fd), 1e-20)
            ep[4:7] = [float(x) for x in fd]
        if kind == MED_ATMOSPHERE:
            # ref AtmosphericMedium: effective scale = falloff / radius;
            # center may bind to a named primitive's position
            radius = float(m.get("radius", 1.0))
            ep[0] = float(m.get("falloff_scale", 1.0)) / max(radius, 1e-9)
            center = m.get("center", [0.0, 0.0, 0.0])
            if "primitive" in m:
                for pr in desc.primitives:
                    if pr.get("name") == m["primitive"]:
                        pm = xform.parse_transform(pr.get("transform"))
                        center = xform.transform_point(
                            pm, [0.0, 0.0, 0.0]).tolist()
                        break
            ep[1:4] = vec3(center)
            ep[4] = radius
        med_exp_params.append(ep)
        if kind == MED_VOXEL:
            # ref VdbGrid "integration_method"/"sampling_method"
            # (VdbGrid.cpp:41-63): residual_ratio switches the
            # transmittance estimator to supergrid tracking, exact_*
            # to the voxel-boundary DDA; unknown values keep the
            # raymarching fallback
            im = str(m["grid"].get("integration_method", ""))
            if im in ("residual_ratio", "exact_linear", "exact_nearest"):
                voxel_integration = im
            sm = str(m["grid"].get("sampling_method", ""))
            if sm in ("exact_linear", "exact_nearest"):
                voxel_sampling = sm
            dens, emis, w2g = _load_grid(m["grid"], desc.resolve_path)
            med_grid_idx.append(len(grid_density))
            grid_density.append(dens)
            grid_super.append(build_supergrid(dens))
            grid_emission.append(
                emis if emis is not None
                else np.zeros((0, 0, 0, 3), np.float32))
            grid_w2g.append(w2g)
        else:
            med_grid_idx.append(-1)
        med_sigma_a.append([density * x for x in vec3(m.get("sigma_a"))])
        med_sigma_s.append([density * x for x in vec3(m.get("sigma_s"))])
        ph = m.get("phase_function", {"type": "isotropic"})
        if isinstance(ph, str):
            ph = {"type": ph}
        med_phase.append(PHASE_NAMES.get(ph.get("type", "isotropic"), 0))
        med_g.append(float(ph.get("g", 0.0)))
        tr = m.get("transmittance", {"type": "exponential"})
        if isinstance(tr, str):
            tr = {"type": tr}

        def trans_row(tr):
            """(type_id, 4 base params) for one non-interpolated law."""
            tt = tr.get("type", "exponential")
            tp = [0.0, 0.0, 0.0, 0.0]
            if tt in ("linear", "quadratic"):
                tp[0] = float(tr.get("max_t", 1.0 if tt == "linear" else 0.75))
            elif tt == "double_exponential":
                tp[0] = float(tr.get("sigma_a", 0.5))
                tp[1] = float(tr.get("sigma_b", 10.0))
            elif tt == "erlang":
                tp[0] = float(tr.get("rate", 5.0))
            elif tt == "davis":
                tp[0] = max(float(tr.get("alpha", 1.1)), 1.0 + 1e-6)
            elif tt == "davis_weinstein":
                tp[0] = min(max(float(tr.get("h", 0.75)), 0.5), 1.0)
                tp[1] = float(tr.get("c", 1.0))
            elif tt == "pulse":
                tp[0] = float(tr.get("min", 0.0))
                tp[1] = float(tr.get("max", 1.0))
                tp[2] = float(tr.get("num_pulses", 4))
            return TRANS_NAMES.get(tt, 0), tp

        if tr.get("type") == "interpolated":
            # ref InterpolatedTransmittance: lerp(tr_a, tr_b, ratio);
            # defaults linear/erlang at ratio 0.5.  16-col layout (see
            # media/transmittance.py module docstring).
            ta = tr.get("tr_a", {"type": "linear"})
            tb = tr.get("tr_b", {"type": "erlang"})
            ta = {"type": ta} if isinstance(ta, str) else ta
            tb = {"type": tb} if isinstance(tb, str) else tb
            ida, pa = trans_row(ta)
            idb, pb = trans_row(tb)
            from tungsten_tpu.media.transmittance import T_INTERPOLATED
            med_trans_type.append(T_INTERPOLATED)
            med_trans_params.append(
                [0.0] * 4 + [float(ida), float(idb),
                             float(tr.get("ratio", 0.5)), 0.0] + pa + pb)
        else:
            tid, tp = trans_row(tr)
            med_trans_type.append(tid)
            med_trans_params.append(tp)
        med_max_bounce.append(int(m.get("max_bounces", 1024)))
    num_media = len(med_sigma_a)
    # widen every row to 16 cols iff any medium is interpolated (the
    # transmittance wrappers key on the static column count)
    if any(len(r) > 4 for r in med_trans_params):
        med_trans_params = [r + [0.0] * (16 - len(r))
                            for r in med_trans_params]

    geom = _GeomAccum()
    curve_segs = []  # per-curves-prim dicts of segment arrays
    spheres_c, spheres_r, spheres_p = [], [], []
    disks = dict(c=[], n=[], r=[], cos=[], prim=[])
    cyls = dict(pos=[], rot=[], r=[], hh=[], capped=[], prim=[])
    prim_int_med, prim_ext_med = [], []
    prim_bsdf, prim_emission_tex = [], []
    prim_power: dict[int, np.ndarray] = {}
    lights = []  # (type, prim_id, emission_tex_or_none, tri_range)
    light_tri_ranges = []
    env_info = None
    caps = []
    points = []

    # ---- instances expansion (ref Instance.cpp:16-93): each entry of
    # `instances` stamps one master primitive with the instance's
    # rotation + translation (scale comes from the master's own
    # transform, as in the reference) ----
    expanded_prims = []
    for prim in desc.primitives:
        if prim.get("type") != "instances":
            expanded_prims.append(prim)
            continue
        masters = prim.get("masters", [])
        for inst in prim.get("instances", []):
            mid = int(inst.get("id", 0))
            if not 0 <= mid < len(masters):
                continue
            master = dict(masters[mid])
            mi = xform.parse_transform(master.get("transform"))
            it = xform.parse_transform(inst.get("transform"))
            R = it[:3, :3]
            # drop scale from the instance rotation (reference keeps
            # only position + quaternion)
            R = R / np.maximum(np.linalg.norm(R, axis=0, keepdims=True),
                               1e-30)
            comp = np.eye(4)
            comp[:3, :3] = R @ mi[:3, :3]
            comp[:3, 3] = R @ mi[:3, 3] + it[:3, 3]
            master["transform"] = comp.reshape(-1).tolist()
            if master.get("bsdf_index") is None and \
                    prim.get("bsdf_index") is not None:
                master["bsdf_index"] = prim["bsdf_index"]
            expanded_prims.append(master)

    prim_id = -1
    for prim in expanded_prims:
        ptype = prim.get("type", "mesh")
        m = xform.parse_transform(prim.get("transform"))
        prim_id += 1
        bidx = prim.get("bsdf_index")
        if bidx is None:
            bidx = 0
        prim_bsdf.append(bidx)
        im = prim.get("int_medium_index")
        em = prim.get("ext_medium_index")
        prim_int_med.append(-1 if im is None else int(im))
        prim_ext_med.append(-1 if em is None else int(em))

        emission = prim.get("emission")
        power = prim.get("power")
        etex = -1
        if emission is not None:
            etex = textures.add(emission)
        elif power is not None:
            # radiance filled in once the primitive's area is known
            # (ref Quad::powerToRadianceFactor = INV_PI / area)
            etex = textures.add(1.0)
            prim_power[prim_id] = np.asarray(vec3(power), np.float64)
        prim_emission_tex.append(etex)

        samplable = bool(prim.get("sample", True))
        tri_start = geom.count()

        if ptype == "quad":
            verts, n = _quad_verts(m)
            normals = np.repeat(n[None], 4, axis=0)
            # winding chosen so cross(e1, e2) == Tungsten's quad normal
            # (edge1 x edge0, ref Quad.cpp:306-309)
            tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
            geom.add_tris(verts, _UNIT_QUAD_UV, normals, tris, prim_id)
        elif ptype == "cube":
            verts, uvs, normals, tris = _cube_tris(m)
            geom.add_tris(verts, uvs, normals, tris, prim_id)
        elif ptype == "disk":
            # Analytic disk (ref Disk.cpp:315-327 prepareForRender:
            # center = T*0, radius = max xz scale of a UNIT-radius disk,
            # normal = T*(0,1,0); Disk.cpp:64-87 world-space plane test)
            center = xform.transform_point(m, [0, 0, 0])
            sv = xform.transform_vectors(m, [[1, 0, 0], [0, 0, 1]])
            r = float(max(np.linalg.norm(sv[0]), np.linalg.norm(sv[1])))
            n = xform.transform_normals(m, [[0, 1, 0]])[0]
            n = (n / max(np.linalg.norm(n), 1e-30)).astype(np.float32)
            cone = float(prim.get("cone_angle", 90.0))
            disks["c"].append(np.asarray(center, np.float32))
            disks["n"].append(n)
            disks["r"].append(r)
            disks["cos"].append(np.cos(np.deg2rad(cone)))
            disks["prim"].append(prim_id)
            if etex >= 0 and samplable:
                lights.append({"type": LIGHT_DISK, "prim": prim_id,
                               "tex": etex, "slot": len(disks["r"]) - 1})
                light_tri_ranges.append((tri_start, tri_start))
            if prim_id in prim_power:
                # powerToRadianceFactor = INV_PI / area (Disk.cpp:40-43)
                textures.const[etex] = (
                    prim_power.pop(prim_id)
                    / (np.pi * max(np.pi * r * r, 1e-20))
                ).astype(np.float32)
        elif ptype == "sphere":
            center = xform.transform_point(m, [0, 0, 0])
            radius = float(np.linalg.norm(xform.transform_vectors(m, [[1, 0, 0]])[0]))
            spheres_c.append(center)
            spheres_r.append(radius)
            spheres_p.append(prim_id)
            if etex >= 0 and samplable:
                # cone-sampled sphere emitter (ref Sphere::sampleDirect)
                lights.append({"type": LIGHT_SPHERE, "prim": prim_id,
                               "tex": etex,
                               "slot": len(spheres_r) - 1})
                light_tri_ranges.append((tri_start, tri_start))
            if prim_id in prim_power:
                # ref powerToRadianceFactor = INV_PI/area, area = 4 pi r^2
                textures.const[etex] = (
                    prim_power.pop(prim_id)
                    / (4.0 * np.pi * np.pi * max(radius * radius, 1e-20))
                ).astype(np.float32)
        elif ptype == "cylinder":
            # Analytic y-aligned cylinder (ref Cylinder.cpp:288-303
            # prepareForRender: rot = extractRotation, radius = 0.5 *
            # max xz scale, halfHeight = 0.5 * y scale; Cylinder.cpp:
            # 56-109 local-space cap + quadric tests)
            capped = bool(prim.get("capped", True))
            pos = np.asarray(xform.transform_point(m, [0, 0, 0]),
                             np.float32)
            cols = xform.transform_vectors(
                m, [[1, 0, 0], [0, 1, 0], [0, 0, 1]])
            scale = np.linalg.norm(cols, axis=-1)
            rot = (np.asarray(cols).T
                   / np.maximum(scale[None, :], 1e-30)).astype(np.float32)
            r = float(0.5 * max(scale[0], scale[2]))
            hh = float(0.5 * scale[1])
            cyls["pos"].append(pos)
            cyls["rot"].append(rot)
            cyls["r"].append(r)
            cyls["hh"].append(hh)
            cyls["capped"].append(capped)
            cyls["prim"].append(prim_id)
            area = (2.0 * np.pi * r * r if capped else 0.0) \
                + 2.0 * np.pi * r * 2.0 * hh
            if etex >= 0 and samplable:
                lights.append({"type": LIGHT_CYLINDER, "prim": prim_id,
                               "tex": etex, "slot": len(cyls["r"]) - 1})
                light_tri_ranges.append((tri_start, tri_start))
            if prim_id in prim_power:
                textures.const[etex] = (
                    prim_power.pop(prim_id)
                    / (np.pi * max(area, 1e-20))).astype(np.float32)
        elif ptype == "mesh":
            mesh = mesh_io.load_mesh(desc.resolve_path(prim["file"]))
            if bool(prim.get("recompute_normals", False)) or not np.any(mesh.normal):
                mesh.normal = mesh_io.compute_smooth_normals(mesh)
            pos = xform.transform_points(m, mesh.pos).astype(np.float32)
            if bool(prim.get("smooth", True)):
                nrm = xform.transform_normals(m, mesh.normal).astype(np.float32)
                norms = np.linalg.norm(nrm, axis=1, keepdims=True)
                nrm = nrm / np.maximum(norms, 1e-30)
            else:
                nrm = np.zeros_like(pos)  # flat: zero shading normals -> use Ng
            geom.add_tris(pos, mesh.uv, nrm, mesh.indices, prim_id)
        elif ptype == "infinite_sphere":
            if etex >= 0:
                rot = m[:3, :3].astype(np.float32)
                norm = np.linalg.norm(rot, axis=0, keepdims=True)
                rot = rot / np.maximum(norm, 1e-30)
                env_info = {
                    "prim": prim_id,
                    "tex": etex,
                    "rot": rot,
                    "samplable": samplable,
                }
            continue
        elif ptype == "infinite_sphere_cap":
            # directional "sun" cap (ref InfiniteSphereCap.cpp): direction =
            # transform's up axis, radiance = emission or
            # power * INV_TWO_PI / (1 - cos(cap_angle))
            cap_dir_v = xform.transform_vectors(m, [[0.0, 1.0, 0.0]])[0]
            cap_dir_v = cap_dir_v / max(np.linalg.norm(cap_dir_v), 1e-30)
            cos_cap = float(np.cos(np.deg2rad(float(prim.get("cap_angle", 10.0)))))
            if power is not None:
                rad = np.asarray(vec3(power)) / (2.0 * np.pi) / max(1.0 - cos_cap, 1e-9)
            else:
                rad = np.asarray(vec3(emission if emission is not None else 1.0))
            caps.append({"prim": prim_id, "dir": cap_dir_v, "cos": cos_cap,
                         "emission": rad.astype(np.float32),
                         "samplable": samplable})
            continue
        elif ptype == "point":
            pos = xform.transform_point(m, [0, 0, 0])
            rad = np.asarray(vec3(emission if emission is not None
                                  else (power if power is not None else 1.0)))
            points.append({"prim": prim_id, "pos": pos.astype(np.float32),
                           "emission": rad.astype(np.float32)})
            continue
        elif ptype == "skydome":
            # analytic daylight dome baked to an envmap (ref Skydome.cpp:
            # 292-317; sun direction = transform's up axis)
            from tungsten_tpu.scene.sky import generate_sky
            sun = xform.transform_vectors(m, [[0.0, 1.0, 0.0]])[0]
            sky_img = generate_sky(
                sun,
                turbidity=float(prim.get("turbidity", 3.0)),
                intensity=float(prim.get("intensity", 2.0)),
                temperature=float(prim.get("temperature", 5777.0)),
                gamma_scale=float(prim.get("gamma_scale", 1.0)))
            env_info = {"prim": prim_id, "tex": -1, "image": sky_img,
                        "rot": np.eye(3, dtype=np.float32),
                        "samplable": samplable}
            continue
        elif ptype == "curves":
            curve_segs.append(_flatten_curves(prim, m, desc.resolve_path,
                                              prim_id))
            # curves default to the hair BCSDF when no bsdf is given
            # (ref Curves::Curves() ctor)
            if prim.get("bsdf_index") is None:
                prim_bsdf[-1] = len(bsdf_rows)
                bsdf_rows.append(
                    bsdf_types.parse_bsdf_row({"type": "hair"}, textures,
                                              fiber_tables))
            continue
        else:
            # minecraft_map and other exotic primitives (skydome IS
            # handled above via scene/sky.py)
            raise NotImplementedError(f"primitive type not yet supported: {ptype}")

        tri_end = geom.count()
        if etex >= 0 and samplable and ptype not in (
                "infinite_sphere", "disk", "cylinder", "sphere"):
            lights.append({"type": LIGHT_AREA, "prim": prim_id, "tex": etex})
            light_tri_ranges.append((tri_start, tri_end))

    num_prims = prim_id + 1

    # ---- concatenate triangles ----
    if geom.count() > 0:
        tri_v0 = np.concatenate(geom.v0)
        tri_e1 = np.concatenate(geom.e1)
        tri_e2 = np.concatenate(geom.e2)
        tri_n0 = np.concatenate(geom.n0)
        tri_n1 = np.concatenate(geom.n1)
        tri_n2 = np.concatenate(geom.n2)
        tri_uv0 = np.concatenate(geom.uv0)
        tri_uv1 = np.concatenate(geom.uv1)
        tri_uv2 = np.concatenate(geom.uv2)
        tri_prim = np.concatenate(geom.prim)
    else:
        tri_v0 = tri_e1 = tri_e2 = np.zeros((0, 3), np.float32)
        tri_n0 = tri_n1 = tri_n2 = np.zeros((0, 3), np.float32)
        tri_uv0 = tri_uv1 = tri_uv2 = np.zeros((0, 2), np.float32)
        tri_prim = np.zeros((0,), np.int32)

    # ---- BVH over triangles (host build), reorder tris to leaf order ----
    from tungsten_tpu.scene.bvh import build_bvh
    p_min = np.minimum(tri_v0, np.minimum(tri_v0 + tri_e1, tri_v0 + tri_e2))
    p_max = np.maximum(tri_v0, np.maximum(tri_v0 + tri_e1, tri_v0 + tri_e2))
    bvh = build_bvh(p_min, p_max)
    order = bvh.order if len(bvh.order) else np.zeros(0, np.int32)
    remap = np.zeros(len(order), np.int64)
    remap[order] = np.arange(len(order))
    tri_v0, tri_e1, tri_e2 = tri_v0[order], tri_e1[order], tri_e2[order]
    tri_n0, tri_n1, tri_n2 = tri_n0[order], tri_n1[order], tri_n2[order]
    tri_uv0, tri_uv1, tri_uv2 = tri_uv0[order], tri_uv1[order], tri_uv2[order]
    tri_prim = tri_prim[order]

    # ---- lights ----
    n_samplable_caps = sum(1 for c in caps if c["samplable"])
    L = len(lights) + (1 if env_info and env_info["samplable"] else 0) \
        + n_samplable_caps + len(points)
    light_type = np.zeros(max(L, 1), np.int32)
    light_prim = np.full(max(L, 1), -1, np.int32)
    light_emission = np.zeros((max(L, 1), 3), np.float32)
    light_area = np.zeros(max(L, 1), np.float32)
    light_aux = np.zeros((max(L, 1), 4), np.float32)
    light_bsr = np.zeros((max(L, 1), 4), np.float32)
    light_lum = np.zeros(max(L, 1), np.float32)
    light_tri_off = np.zeros(max(L, 1), np.int32)
    light_tri_cnt = np.zeros(max(L, 1), np.int32)
    light_slot = np.full(max(L, 1), -1, np.int32)
    lt_prob_l, lt_alias_l, lt_tri_l = [], [], []
    prim_light = np.full(max(num_prims, 1), -1, np.int32)

    tri_cross = np.cross(tri_e1, tri_e2)
    tri_area = 0.5 * np.linalg.norm(tri_cross, axis=-1) if len(tri_v0) else np.zeros(0)

    # power-specified emitters: radiance = power / (pi * area)
    for pid, power in prim_power.items():
        ids = np.nonzero(tri_prim == pid)[0]
        area = float(tri_area[ids].sum()) if len(ids) else 1.0
        textures.const[prim_emission_tex[pid]] = (
            power / (np.pi * max(area, 1e-20))).astype(np.float32)

    for li, (light, (t0, t1)) in enumerate(zip(lights, light_tri_ranges)):
        if light["type"] == LIGHT_SPHERE:
            slot = light["slot"]
            r = spheres_r[slot]
            light_type[li] = LIGHT_SPHERE
            light_prim[li] = light["prim"]
            light_slot[li] = slot
            light_emission[li] = textures.const[light["tex"]]
            light_tri_off[li] = sum(len(x) for x in lt_tri_l)
            light_tri_cnt[li] = 0
            light_area[li] = 4.0 * np.pi * r * r
            light_bsr[li, :3] = spheres_c[slot]
            light_bsr[li, 3] = r
            light_lum[li] = float(np.max(textures.const[light["tex"]]))
            prim_light[light["prim"]] = li
            continue
        if light["type"] in (LIGHT_DISK, LIGHT_CYLINDER):
            # analytic emitters: area + bounding sphere from the
            # primitive tables, no triangle alias rows
            slot = light["slot"]
            light_type[li] = light["type"]
            light_prim[li] = light["prim"]
            light_slot[li] = slot
            light_emission[li] = textures.const[light["tex"]]
            light_tri_off[li] = sum(len(x) for x in lt_tri_l)
            light_tri_cnt[li] = 0
            if light["type"] == LIGHT_DISK:
                r = disks["r"][slot]
                light_area[li] = np.pi * r * r
                light_bsr[li, :3] = disks["c"][slot]
                light_bsr[li, 3] = r
            else:
                r, hh = cyls["r"][slot], cyls["hh"][slot]
                light_area[li] = (2.0 * np.pi * r * r
                                  if cyls["capped"][slot] else 0.0) \
                    + 2.0 * np.pi * r * 2.0 * hh
                light_bsr[li, :3] = cyls["pos"][slot]
                light_bsr[li, 3] = np.sqrt(r * r + hh * hh)
            light_lum[li] = float(np.max(textures.const[light["tex"]]))
            prim_light[light["prim"]] = li
            continue
        # triangles of this prim (they were permuted; select by prim id)
        ids = np.nonzero(tri_prim == light["prim"])[0]
        areas = tri_area[ids]
        total = float(areas.sum())
        light_type[li] = LIGHT_AREA
        light_prim[li] = light["prim"]
        # constant emission color from its texture table entry
        light_emission[li] = textures.const[light["tex"]]
        # O(1) alias table over triangle areas — any emitter size
        # (replaces the reference's per-triangle Distribution1D,
        # TriangleMesh.cpp:396-460, without the old 32-tri cap)
        prob, alias = _build_alias(areas / max(total, 1e-30))
        light_tri_off[li] = sum(len(x) for x in lt_tri_l)
        light_tri_cnt[li] = len(ids)
        lt_prob_l.append(prob)
        lt_alias_l.append(alias)
        lt_tri_l.append(ids.astype(np.int32))
        light_area[li] = total
        # bounding sphere + luminance for chooseLight's
        # approximateRadiance (ref TraceBase.cpp:416-459; meshes return
        # -1 there — this build approximates every area light by its
        # bounding sphere's solid angle, which is strictly more
        # informative than the reference's uniform fallback)
        if len(ids):
            v0 = tri_v0[ids]
            pts = np.concatenate([v0, v0 + tri_e1[ids], v0 + tri_e2[ids]])
            c = 0.5 * (pts.min(0) + pts.max(0))
            light_bsr[li, :3] = c
            light_bsr[li, 3] = np.linalg.norm(pts - c, axis=-1).max()
        light_lum[li] = float(np.max(textures.const[light["tex"]]))
        prim_light[light["prim"]] = li

    env_light_index = -1
    env_image = np.zeros((1, 1, 3), np.float32)
    env_rot = np.eye(3, dtype=np.float32)
    env_scale = 1.0
    if env_info is not None:
        if env_info.get("image") is not None:
            env_image = env_info["image"]
        else:
            tex_id = env_info["tex"]
            bid = textures.bitmap_id[tex_id]
            if bid >= 0:
                env_image = np.asarray(textures.bitmaps[bid], np.float32)
            else:
                env_image = np.broadcast_to(
                    textures.const[tex_id][None, None],
                    (1, 1, 3)).astype(np.float32)
        env_rot = env_info["rot"]
        if env_info["samplable"]:
            li = len(lights)
            env_light_index = li
            light_type[li] = LIGHT_INFINITE
            light_prim[li] = env_info["prim"]
            prim_light[env_info["prim"]] = li
    (cond_pdf, cond_cdf, marg_pdf, marg_cdf,
     env_alias) = _build_env_distribution(env_image)

    # ---- cap + point lights ----
    li_next = len(lights) + (1 if env_info and env_info["samplable"] else 0)
    cap_dir_arr = np.zeros((max(len(caps), 1), 3), np.float32)
    cap_cos_arr = np.full(max(len(caps), 1), 2.0, np.float32)  # 2 = never hit
    cap_em_arr = np.zeros((max(len(caps), 1), 3), np.float32)
    cap_samp_arr = np.zeros(max(len(caps), 1), bool)
    for ci, cap in enumerate(caps):
        cap_dir_arr[ci] = cap["dir"]
        cap_cos_arr[ci] = cap["cos"]
        cap_em_arr[ci] = cap["emission"]
        cap_samp_arr[ci] = cap["samplable"]
        if cap["samplable"]:
            li = li_next
            li_next += 1
            light_type[li] = LIGHT_CAP
            light_prim[li] = cap["prim"]
            light_emission[li] = cap["emission"]
            light_aux[li, :3] = cap["dir"]
            light_aux[li, 3] = cap["cos"]
            # ref InfiniteSphereCap::approximateRadiance
            light_lum[li] = 2.0 * np.pi * (1.0 - cap["cos"]) * \
                float(np.max(cap["emission"]))
            prim_light[cap["prim"]] = li
    for pt in points:
        li = li_next
        li_next += 1
        light_type[li] = LIGHT_POINT
        light_prim[li] = pt["prim"]
        light_emission[li] = pt["emission"]
        light_aux[li, :3] = pt["pos"]
        # ref Point::approximateRadiance = INV_FOUR_PI*power.max/r^2;
        # power = 4*pi^2*emission (Point.cpp power convention)
        light_lum[li] = float(np.max(pt["emission"]))
        prim_light[pt["prim"]] = li
    if env_light_index >= 0:
        # ref InfiniteSphere::approximateRadiance = TWO_PI * avg().max()
        light_lum[env_light_index] = 2.0 * np.pi * float(
            np.max(env_image.reshape(-1, 3).mean(axis=0)) *
            (env_scale if np.isscalar(env_scale) else 1.0))

    # ---- camera ----
    cam = desc.camera
    cam_mat = xform.parse_transform(cam.get("transform"))
    cam_mat[:3, 0] = -cam_mat[:3, 0]  # ref Camera::fromJson flips right axis
    cam_mat = cam_mat.astype(np.float32)
    res = cam.get("resolution", [512, 512])
    if isinstance(res, (int, float)):
        res = [res, res]
    fov = float(cam.get("fov", 60.0))
    plane_dist = 1.0 / np.tan(np.deg2rad(fov) * 0.5)
    ratio = res[1] / res[0]

    # thinlens focus pivot (ref ThinlensCamera::prepareForRender):
    # focus distance = |named primitive's origin - camera position|
    focus_distance = float(cam.get("focus_distance", 1.0))
    pivot = cam.get("focus_pivot")
    if pivot:
        for prim in desc.primitives:
            if prim.get("name") == pivot:
                pm = xform.parse_transform(prim.get("transform"))
                focus_distance = float(np.linalg.norm(
                    pm[:3, 3] - cam_mat[:3, 3]))
                break

    # thinlens aperture texture (ref ThinlensCamera _aperture, sampled
    # MAP_UNIFORM): alias table over texel luminances; absent -> the
    # analytic uniform-disk default (DiskTexture)
    ap_spec = cam.get("aperture")
    cam_ap_prob = np.zeros((1,), np.float32)
    cam_ap_alias = np.zeros((1,), np.int32)
    cam_ap_hw = np.asarray([1, 1], np.int32)
    aperture_tex = False
    if isinstance(ap_spec, str) or (isinstance(ap_spec, dict)
                                    and ap_spec.get("type") == "bitmap"):
        from tungsten_tpu.io import image as im
        path = ap_spec if isinstance(ap_spec, str) else ap_spec["file"]
        ap_img = np.asarray(im.load_image(desc.resolve_path(path)),
                            np.float32)
        if ap_img.ndim == 3:
            ap_img = ap_img.mean(axis=-1)
        lum = np.maximum(ap_img.reshape(-1), 0.0)
        if lum.sum() > 0:
            cam_ap_prob, cam_ap_alias = _build_alias(lum / lum.sum())
            cam_ap_hw = np.asarray(ap_img.shape, np.int32)
            aperture_tex = True

    # ---- settings ----
    integ = desc.integrator
    rend = desc.renderer
    settings = RenderSettings(
        width=int(res[0]),
        height=int(res[1]),
        spp=int(rend.get("spp", 32)),
        spp_step=int(rend.get("spp_step", 16)),
        stratified_sampler=bool(rend.get("stratified_sampler", True)),
        adaptive_sampling=bool(rend.get("adaptive_sampling", True)),
        max_bounces=int(integ.get("max_bounces", 64)),
        min_bounces=int(integ.get("min_bounces", 0)),
        enable_light_sampling=bool(integ.get("enable_light_sampling", True)),
        enable_volume_light_sampling=bool(
            integ.get("enable_volume_light_sampling", True)),
        two_sided_shading=bool(integ.get("enable_two_sided_shading", True)),
        tonemap=cam.get("tonemap", "gamma"),
        filter=cam.get("reconstruction_filter", "tent"),
        camera_type=cam.get("type", "pinhole"),
        cubemap_mode=cam.get("mode", "horizontal_cross"),
        fov_deg=fov,
        focus_distance=focus_distance,
        aperture_size=float(cam.get("aperture_size", 0.001)),
        aperture_tex=aperture_tex,
        cat_eye=float(cam.get("cateye", cam.get("cat_eye", 0.0))),
        has_env=env_info is not None,
        has_curves=any(c is not None for c in curve_segs),
        curve_modes=tuple(sorted(set(
            int(v) for c in curve_segs if c is not None
            for v in np.unique(c["mode"])))),
        num_lights=int(L),
        present_bsdf_types=tuple(sorted({int(r[0]) for r in bsdf_rows})),
        has_media=num_media > 0,
        num_caps=len(caps),
        has_points=len(points) > 0,
        has_disk_lights=any(lt["type"] == LIGHT_DISK for lt in lights),
        has_cyl_lights=any(lt["type"] == LIGHT_CYLINDER for lt in lights),
        has_sphere_lights=any(lt["type"] == LIGHT_SPHERE for lt in lights),
        has_area_lights=any(lt["type"] == LIGHT_AREA for lt in lights),
        med_kinds=tuple(sorted(set(med_kind))),
        voxel_integration=voxel_integration,
        voxel_sampling=voxel_sampling,
        integrator_type=integ.get("type", "path_tracer"),
        photon_count=int(integ.get("photon_count", 1 << 20)),
        gather_radius=float(integ.get("gather_radius", 0.05)),
        gather_count=int(integ.get("gather_photon_count", 20)),
        vol_photon_type=str(integ.get("volume_photon_type", "points")),
        vol_photon_count=int(integ.get("volume_photon_count", 10000)),
        vol_gather_radius=float(
            integ.get("volume_gather_radius",
                      integ.get("gather_radius", 0.05))),
        ppm_alpha=float(integ.get("alpha", 0.3)),
        mlt_large_step_prob=float(integ.get("large_step_probability", 0.1)),
        mlt_sample_pool=int(integ.get("initial_sample_pool", 10000)),
        mlt_strategy_prob=float(
            integ.get("strategy_perturbation_probability", 0.05)),
        mlt_bidirectional=bool(integ.get("bidirectional", True)),
    )

    tex_type, tex_const, tex_params, tex_bitmap_id, bitmaps = textures.finalize()

    from tungsten_tpu.ops.wave_trace import build_wave_tables
    wk_boxes, wk_cbox, wk_attr, wk_remap, wk_sbox = build_wave_tables(
        tri_v0, tri_e1, tri_e2)

    def dev(x, dtype=None):
        return jnp.asarray(x, dtype=dtype)

    tri_shade = np.concatenate(
        [tri_e1, tri_e2, tri_n0, tri_n1, tri_n2,
         tri_uv0, tri_uv1, tri_uv2], axis=1) if len(tri_v0) else \
        np.zeros((0, 21), np.float32)

    # scene-wide occluder bounds (tris + analytic prims + curves)
    los, his = [], []
    if len(tri_v0):
        los.append(p_min.min(0))
        his.append(p_max.max(0))
    if spheres_c:
        sc = np.asarray(spheres_c, np.float32)
        sr = np.asarray(spheres_r, np.float32)[:, None]
        los.append((sc - sr).min(0))
        his.append((sc + sr).max(0))
    if disks["c"]:
        dc = np.asarray(disks["c"], np.float32)
        dr = np.asarray(disks["r"], np.float32)[:, None]
        los.append((dc - dr).min(0))
        his.append((dc + dr).max(0))
    if cyls["pos"]:
        cp = np.asarray(cyls["pos"], np.float32)
        cr = np.sqrt(np.asarray(cyls["r"], np.float32) ** 2
                     + np.asarray(cyls["hh"], np.float32) ** 2)[:, None]
        los.append((cp - cr).min(0))
        his.append((cp + cr).max(0))
    curve_tables = _build_curve_tables(curve_segs)
    if curve_tables["crv_pc_q0"].shape[0] > 0:
        q = np.concatenate([curve_tables["crv_pc_q0"][:, :3],
                            curve_tables["crv_pc_q1"][:, :3]])
        w_c = np.concatenate([curve_tables["crv_pc_q0"][:, 3],
                              curve_tables["crv_pc_q1"][:, 3]]).max()
        los.append(q.min(0) - w_c)
        his.append(q.max(0) + w_c)
    geo_lo = (np.min(los, axis=0) if los
              else np.zeros(3)).astype(np.float32)
    geo_hi = (np.max(his, axis=0) if his
              else np.zeros(3)).astype(np.float32)

    flat = FlatScene(
        tri_v0=dev(tri_v0), tri_e1=dev(tri_e1), tri_e2=dev(tri_e2),
        tri_shade=dev(tri_shade),
        tri_n0=dev(tri_n0), tri_n1=dev(tri_n1), tri_n2=dev(tri_n2),
        tri_uv0=dev(tri_uv0), tri_uv1=dev(tri_uv1), tri_uv2=dev(tri_uv2),
        tri_prim=dev(tri_prim),
        bvh_min=dev(bvh.bounds_min), bvh_max=dev(bvh.bounds_max),
        bvh_meta=dev(bvh.meta), bvh_skip=dev(bvh.skip),
        wk_boxes=dev(wk_boxes), wk_cbox=dev(wk_cbox), wk_attr=dev(wk_attr),
        wk_remap=dev(wk_remap), wk_sbox=dev(wk_sbox),
        sph_center=dev(np.asarray(spheres_c, np.float32).reshape(-1, 3)),
        sph_radius=dev(np.asarray(spheres_r, np.float32)),
        sph_prim=dev(np.asarray(spheres_p, np.int32)),
        dsk_c=dev(np.asarray(disks["c"], np.float32).reshape(-1, 3)),
        dsk_n=dev(np.asarray(disks["n"], np.float32).reshape(-1, 3)),
        dsk_r=dev(np.asarray(disks["r"], np.float32)),
        dsk_cos=dev(np.asarray(disks["cos"], np.float32)),
        dsk_prim=dev(np.asarray(disks["prim"], np.int32)),
        cyl_pos=dev(np.asarray(cyls["pos"], np.float32).reshape(-1, 3)),
        cyl_rot=dev(np.asarray(cyls["rot"], np.float32).reshape(-1, 3, 3)),
        cyl_r=dev(np.asarray(cyls["r"], np.float32)),
        cyl_hh=dev(np.asarray(cyls["hh"], np.float32)),
        cyl_capped=dev(np.asarray(cyls["capped"], bool)),
        cyl_prim=dev(np.asarray(cyls["prim"], np.int32)),
        **{k: dev(v) for k, v in curve_tables.items()},
        **{k: dev(v) for k, v in _stack_hair_tables(fiber_tables).items()},
        prim_bsdf=dev(np.asarray(prim_bsdf, np.int32)),
        prim_emission_tex=dev(np.asarray(prim_emission_tex, np.int32)),
        prim_light=dev(prim_light),
        bsdf_type=dev(np.asarray([r[0] for r in bsdf_rows], np.int32)),
        bsdf_albedo_tex=dev(np.asarray([r[1] for r in bsdf_rows], np.int32)),
        bsdf_params=dev(np.stack([r[2] for r in bsdf_rows])),
        bsdf_aux=dev(np.stack([r[3] for r in bsdf_rows])),
        tex_type=dev(tex_type), tex_const=dev(tex_const),
        tex_params=dev(tex_params), tex_bitmap_id=dev(tex_bitmap_id),
        bitmaps=tuple(bitmaps),
        light_type=dev(light_type), light_prim=dev(light_prim),
        light_slot=dev(light_slot),
        light_emission=dev(light_emission), light_area=dev(light_area),
        light_aux=dev(light_aux), light_bsr=dev(light_bsr),
        light_lum=dev(light_lum),
        lt_prob=dev(np.concatenate(lt_prob_l).astype(np.float32)
                    if lt_prob_l else np.zeros(1, np.float32)),
        lt_alias=dev(np.concatenate(lt_alias_l).astype(np.int32)
                     if lt_alias_l else np.zeros(1, np.int32)),
        lt_tri=dev(np.concatenate(lt_tri_l).astype(np.int32)
                   if lt_tri_l else np.zeros(1, np.int32)),
        lt_slot=dev(_lt_slot_of_tri(lt_tri_l, len(tri_v0))),
        light_tri_off=dev(light_tri_off),
        light_tri_cnt=dev(light_tri_cnt),
        geo_lo=dev(geo_lo), geo_hi=dev(geo_hi),
        cap_dir=dev(cap_dir_arr), cap_cos=dev(cap_cos_arr),
        cap_emission=dev(cap_em_arr), cap_samplable=dev(cap_samp_arr),
        med_sigma_a=dev(np.asarray(med_sigma_a, np.float32).reshape(-1, 3)),
        med_sigma_s=dev(np.asarray(med_sigma_s, np.float32).reshape(-1, 3)),
        med_phase=dev(np.asarray(med_phase, np.int32)),
        med_g=dev(np.asarray(med_g, np.float32)),
        med_trans_type=dev(np.asarray(med_trans_type, np.int32)),
        med_trans_params=dev(np.asarray(med_trans_params, np.float32)
                             .reshape(len(med_trans_type) or 1, -1)
                             if med_trans_type else
                             np.zeros((0, 4), np.float32)),
        med_max_bounce=dev(np.asarray(med_max_bounce, np.int32)),
        med_kind=dev(np.asarray(med_kind, np.int32)),
        med_grid=dev(np.asarray(med_grid_idx, np.int32)),
        med_exp_params=dev(np.asarray(med_exp_params,
                                      np.float32).reshape(-1, 8)),
        grid_density=tuple(dev(gd) for gd in grid_density),
        grid_super=tuple(dev(gs) for gs in grid_super),
        grid_emission=tuple(dev(ge) for ge in grid_emission),
        grid_w2g=dev(np.asarray(grid_w2g, np.float32).reshape(-1, 3, 4)),
        prim_int_medium=dev(np.asarray(prim_int_med, np.int32)),
        prim_ext_medium=dev(np.asarray(prim_ext_med, np.int32)),
        cam_medium=dev(np.int32(cam.get("medium_index")
                                if cam.get("medium_index") is not None else -1)),
        # bf16 halves the random-gather working set; .hdr (RGBE) sources
        # only carry 8-bit mantissas, so this loses no source precision
        env_image=dev(env_image, jnp.bfloat16),
        env_quad=dev(_build_env_quad(env_image), jnp.bfloat16),
        env_cond_pdf=dev(cond_pdf), env_cond_cdf=dev(cond_cdf),
        env_marg_pdf=dev(marg_pdf), env_marg_cdf=dev(marg_cdf),
        env_alias=dev(env_alias),
        env_pdf_tab=dev(np.ascontiguousarray(env_alias[:, 2])),
        env_to_world=dev(env_rot), env_to_local=dev(env_rot.T),
        env_light_index=dev(np.int32(env_light_index)),
        env_emission_scale=dev(np.float32(env_scale)),
        cam_mat=dev(cam_mat),
        cam_plane_dist=dev(np.float32(plane_dist)),
        cam_ap_prob=dev(cam_ap_prob.astype(np.float32)),
        cam_ap_alias=dev(cam_ap_alias.astype(np.int32)),
        cam_ap_hw=dev(cam_ap_hw),
        cam_ratio=dev(np.float32(ratio)),
    )
    # auto-select the Pallas cluster traversal on TPU backends
    from tungsten_tpu.ops import intersect as _isect
    _isect.enable_pallas_if_suitable(flat)
    return flat, settings


def load_flat_scene(path):
    """Convenience: path -> (FlatScene, RenderSettings)."""
    from tungsten_tpu.scene.parse import load_scene
    return flatten_scene(load_scene(path))
