"""Light sampling: area lights (triangle sets with area CDFs) and the
infinite-sphere environment light with 2D-CDF importance sampling.

Parity targets:
  * Quad/TriangleMesh::sampleDirect — uniform-by-area point, solid-angle
    pdf r^2/(cos * area), front side only (ref Quad.cpp:172-222).
  * InfiniteSphere::sampleDirect/directPdf — envmap CDF warp, pdf
    INV_PI*INV_TWO_PI*texPdf/sinTheta (ref InfiniteSphere.cpp:160-230).
  * equirect mapping u = atan2(z,x)/2pi + 0.5, v = acos(-y)/pi
    (ref InfiniteSphere.cpp:27-56).
"""
from __future__ import annotations

import jax.numpy as jnp

from tungsten_tpu.scene.flatten import LIGHT_AREA, LIGHT_INFINITE
from tungsten_tpu.scene.textures import sample_bitmap, sample_bitmap_quad
from tungsten_tpu.utils.vecmath import INV_PI, INV_TWO_PI, INV_FOUR_PI

INF = jnp.float32(3.0e38)


# ----------------------------------------------------------------- envmap

def env_direction_to_uv(scene, d):
    """World direction -> equirect uv (+ sinTheta)."""
    local = d @ scene.env_to_local.T
    u = jnp.arctan2(local[..., 2], local[..., 0]) * INV_TWO_PI + 0.5
    cos_t = jnp.clip(-local[..., 1], -1.0, 1.0)
    v = jnp.arccos(cos_t) * INV_PI
    sin_t = jnp.sqrt(jnp.maximum(1.0 - local[..., 1] ** 2, 0.0))
    return jnp.stack([u, v], axis=-1), sin_t


def env_uv_to_direction(scene, uv):
    phi = (uv[..., 0] - 0.5) * (2.0 * jnp.pi)
    theta = uv[..., 1] * jnp.pi
    sin_t = jnp.sin(theta)
    local = jnp.stack(
        [jnp.cos(phi) * sin_t, -jnp.cos(theta), jnp.sin(phi) * sin_t], axis=-1)
    return local @ scene.env_to_world.T, sin_t


def env_eval(scene, d, active=None):
    """Environment radiance for escaping rays.  `active` (R,) bool,
    optional: lanes whose result is discarded tap row 0 (cache-friendly
    — see sample_bitmap_quad)."""
    h, w = scene.env_cond_pdf.shape
    uv, _ = env_direction_to_uv(scene, d)
    return sample_bitmap_quad(scene.env_quad, h, w, uv, active) * \
        scene.env_emission_scale


def env_pdf(scene, d, active=None):
    """Solid-angle pdf of env importance sampling for direction d."""
    h, w = scene.env_cond_pdf.shape
    uv, sin_t = env_direction_to_uv(scene, d)
    # distribution rows are image rows: row = (1 - v) * h, ref
    # BitmapTexture::pdf (src/core/textures/BitmapTexture.cpp:452-455)
    row = jnp.clip(((1.0 - uv[..., 1]) * h).astype(jnp.int32), 0, h - 1)
    col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    idx = row * w + col
    if active is not None:
        idx = jnp.where(active, idx, 0)
    tex_pdf = scene.env_pdf_tab[idx]  # one narrow gather
    return jnp.where(
        sin_t > 1e-8,
        INV_PI * INV_TWO_PI * tex_pdf / jnp.maximum(sin_t, 1e-8),
        0.0)


def env_sample(scene, u1, u2, active=None):
    """Importance-sample the envmap; returns (d, radiance, pdf).

    O(1) alias-table texel selection (Walker/Vose) — ONE packed gather
    per ray instead of log2(H)+log2(W) binary-search gathers.  Random
    gathers are the dominant scalar cost on TPU, so the distribution
    structure is chosen for gather count, not for the reference's
    row/column CDF walk; the sampled texel distribution is identical."""
    h, w = scene.env_cond_pdf.shape
    n = h * w
    x = u2 * n
    idx = jnp.minimum(x.astype(jnp.int32), n - 1)
    f = x - idx
    if active is not None:
        idx = jnp.where(active, idx, 0)
    cell = scene.env_alias[idx]                   # (R, 4) one gather
    keep = f < cell[..., 0]
    texel = jnp.where(keep, idx, cell[..., 1].astype(jnp.int32))
    # recycle the comparison residual as a fresh uniform for the
    # in-texel row offset
    ry = jnp.where(keep,
                   f / jnp.maximum(cell[..., 0], 1e-20),
                   (f - cell[..., 0]) / jnp.maximum(1.0 - cell[..., 0],
                                                    1e-20))
    # keep strictly inside the texel: a 24-bit-quantized u2 makes f
    # land exactly on texel boundaries, which at the pole rows yields
    # sin(theta) = 0 (pdf 0) with nonzero radiance
    ry = jnp.clip(ry, 1e-4, 1.0 - 1e-4)
    row = texel // w
    col = texel - row * w
    uv = jnp.stack([(col + u1) / w, 1.0 - (row + ry) / h], axis=-1)
    # NOTE ref flips v in BitmapTexture::sample; uvToDirection takes uv as-is
    d, sin_t = env_uv_to_direction(scene, uv)
    # the cell gather already carries both candidate pdfs ([2] = self,
    # [3] = alias target) — no second 512k-row gather
    tex_pdf = jnp.where(keep, cell[..., 2], cell[..., 3])
    pdf = jnp.where(sin_t > 1e-8,
                    INV_PI * INV_TWO_PI * tex_pdf / jnp.maximum(sin_t, 1e-8),
                    0.0)
    radiance = sample_bitmap_quad(scene.env_quad, h, w, uv, active) * \
        scene.env_emission_scale
    return d, radiance, pdf


def jax_searchsorted_rows(cdf_rows, u):
    """Row-wise searchsorted: cdf_rows (..., W+1), u (...,) -> index.
    Linear scan — only for narrow tables (per-light triangle CDFs)."""
    return jnp.sum((cdf_rows <= u[..., None]).astype(jnp.int32), axis=-1)


def _searchsorted_rows_gather(cdf, row, u):
    """Largest col with cdf[row, col] <= u, via per-ray binary search
    with scalar gathers (log2(W) steps, no (R, W) temporaries)."""
    import math
    w1 = cdf.shape[1]
    lo = jnp.zeros_like(row)
    hi = jnp.full_like(row, w1 - 1)
    for _ in range(int(math.ceil(math.log2(max(w1, 2))))):
        mid = (lo + hi) // 2
        below = cdf[row, mid] <= u
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    return jnp.clip(lo, 0, cdf.shape[1] - 2)


# -------------------------------------------------------------- area light

def alias_pick_tri(scene, light_idx, u):
    """O(1) area-proportional triangle pick from light `light_idx`'s
    alias table; any emitter size (ref TriangleMesh.cpp:396-460 builds a
    per-triangle Distribution1D — this is the gather-count-optimal TPU
    equivalent: two gathers per ray, no CDF walk)."""
    off = scene.light_tri_off[light_idx]
    cnt = jnp.maximum(scene.light_tri_cnt[light_idx], 1)
    x = u * cnt
    k = jnp.minimum(x.astype(jnp.int32), cnt - 1)
    f = x - k
    j = off + k
    keep = f < scene.lt_prob[j]
    slot = jnp.where(keep, j, off + scene.lt_alias[j])
    return scene.lt_tri[slot]


def _choose_light_weights(scene, settings, p):
    """Per-light selection weights at shading points p (R,3) and their
    row totals — shared by choose_light and its inverse
    (invert_path.invert_choose_light)."""
    from tungsten_tpu.scene.flatten import LIGHT_AREA, LIGHT_POINT
    nl = settings.num_lights
    lt = scene.light_type[:nl]                       # (L,)
    # area: bounding-sphere solid angle 2pi(1 - sqrt(1 - (r/d)^2))
    c = scene.light_bsr[:nl, :3]
    r = scene.light_bsr[:nl, 3]
    dvec = c[None, :, :] - p[:, None, :]             # (R, L, 3)
    dsq = jnp.sum(dvec * dvec, axis=-1)
    sin2 = jnp.clip(r[None, :] ** 2 / jnp.maximum(dsq, 1e-12), 0.0, 1.0)
    sa = 2.0 * jnp.pi * (1.0 - jnp.sqrt(1.0 - sin2))
    w_area = sa * scene.light_lum[None, :nl]
    # point: INV_FOUR_PI * power.max / r^2; emission tables store
    # radiant intensity, so the 1/r^2 falloff is what matters here
    pvec = scene.light_aux[None, :nl, :3] - p[:, None, :]
    w_point = INV_FOUR_PI * scene.light_lum[None, :nl] / \
        jnp.maximum(jnp.sum(pvec * pvec, axis=-1), 1e-12)
    # env / cap: position-independent, baked into light_lum at flatten
    from tungsten_tpu.scene.flatten import (LIGHT_CYLINDER, LIGHT_DISK,
                                            LIGHT_SPHERE)
    area_like = jnp.isin(lt, jnp.asarray(
        [LIGHT_AREA, LIGHT_DISK, LIGHT_CYLINDER, LIGHT_SPHERE]))
    w = jnp.where(area_like[None, :], w_area,
                  jnp.where(lt[None, :] == LIGHT_POINT, w_point,
                            scene.light_lum[None, :nl]))
    total = jnp.sum(w, axis=-1)
    # all-zero rows fall back to uniform (ref: numNonNegative == 0)
    w = jnp.where(total[..., None] > 0.0, w, 1.0)
    total = jnp.where(total > 0.0, total, jnp.float32(nl))
    return w, total


def choose_light(scene, settings, p, u_sel):
    """Radiance-weighted light selection (ref TraceBase::chooseLight,
    TraceBase.cpp:416-459): per-light approximateRadiance at the shading
    point drives the pick; returns (light index (R,), weight (R,) =
    total/pdf_of_pick).  Area lights use their bounding sphere's solid
    angle x peak emission (the reference returns -1 for meshes and falls
    back to uniform; a sphere bound is strictly more informative and
    exact for sphere emitters)."""
    nl = settings.num_lights
    if nl <= 1:
        R = p.shape[0]
        return jnp.zeros((R,), jnp.int32), jnp.ones((R,))
    w, total = _choose_light_weights(scene, settings, p)
    cdf = jnp.cumsum(w, axis=-1)
    x = u_sel * total
    li = jnp.minimum(jnp.sum((cdf <= x[..., None]).astype(jnp.int32),
                             axis=-1), nl - 1)
    w_i = jnp.take_along_axis(w, li[..., None], axis=-1)[..., 0]
    weight = total / jnp.maximum(w_i, 1e-30)
    return li.astype(jnp.int32), weight


def area_light_sample(scene, light_idx, p, u_tri, u1, u2):
    """Sample a point on area light `light_idx` (R,) as seen from p (R,3).

    Returns dict(d, dist, pdf, emission, valid).
    """
    if scene.tri_v0.shape[0] == 0:
        # no triangles -> no area lights in the scene (caps/env/points
        # are handled by their own samplers in _nee)
        R = p.shape[0]
        z = jnp.zeros((R,))
        return dict(d=jnp.zeros((R, 3)).at[:, 2].set(1.0), dist=z,
                    pdf=z, emission=jnp.zeros((R, 3)),
                    valid=jnp.zeros((R,), bool))
    tri = alias_pick_tri(scene, light_idx, u_tri)
    tri_c = jnp.clip(tri, 0, scene.tri_v0.shape[0] - 1)

    # uniform point in triangle (ref SampleWarp::uniformTriangleUv)
    su = jnp.sqrt(jnp.maximum(u1, 0.0))
    a = 1.0 - su
    b = (1.0 - u2) * su
    v0 = scene.tri_v0[tri_c]
    e1 = scene.tri_e1[tri_c]
    e2 = scene.tri_e2[tri_c]
    # barycentric over (v0, v1, v2): point = v0 + b1*e1 + b2*e2 with
    # (b1, b2) = (a, b) mapped onto edges — uniform either way
    q = v0 + a[..., None] * e1 + b[..., None] * e2

    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    dvec = q - p
    r_sq = jnp.sum(dvec * dvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(r_sq, 1e-20))
    d = dvec / dist[..., None]
    cos_theta = -jnp.sum(d * n, axis=-1)

    area = scene.light_area[light_idx]
    pdf = r_sq / jnp.maximum(cos_theta * area, 1e-20)
    valid = (cos_theta > 0.0) & (area > 0.0)
    emission = scene.light_emission[light_idx]
    return dict(d=d, dist=dist, pdf=pdf, emission=emission, valid=valid)


def area_light_direct_pdf(scene, light_idx, hit_t, d, hit_normal,
                          p=None, has_sphere_lights=False):
    """Solid-angle pdf that sampling light `light_idx` would have produced
    the given hit (for MIS of the bsdf strategy).
    Matches Quad::directPdf r^2/(cos * area); analytic disks/cylinders
    use the same conversion.  Sphere emitters use the cone pdf
    (Sphere::directPdf) — pass the shading point `p` when the scene has
    sphere lights."""
    cos_theta = -jnp.sum(d * hit_normal, axis=-1)
    area = scene.light_area[light_idx]
    pdf = jnp.where(
        cos_theta > 1e-6,
        hit_t * hit_t / jnp.maximum(cos_theta * area, 1e-20),
        0.0)
    if has_sphere_lights and p is not None:
        from tungsten_tpu.scene.flatten import LIGHT_SPHERE
        pdf = jnp.where(scene.light_type[light_idx] == LIGHT_SPHERE,
                        sphere_light_direct_pdf(scene, light_idx, p), pdf)
    return pdf


# ------------------------------------------------- analytic sphere emitter

def sphere_light_sample(scene, light_idx, p, u1, u2):
    """Cone sampling toward the sphere's subtended spherical cap (ref
    Sphere::sampleDirect, Sphere.cpp:173-194): uniform direction within
    cos(theta_max) = sqrt(d^2 - r^2)/d, distance = nearest quadric root,
    pdf = uniformSphericalCapPdf.  Invalid for points inside the
    sphere.  Returns dict(d, dist, pdf, emission, valid)."""
    slot = jnp.clip(scene.light_slot[light_idx], 0,
                    scene.sph_radius.shape[0] - 1)
    c = scene.sph_center[slot]
    r = scene.sph_radius[slot]
    Lv = c - p
    d2 = jnp.sum(Lv * Lv, axis=-1)
    dist_c = jnp.sqrt(jnp.maximum(d2, 1e-20))
    C = d2 - r * r
    outside = C > 0.0
    cos_max = jnp.sqrt(jnp.maximum(C, 0.0)) / dist_c
    ln = Lv / dist_c[..., None]
    # uniform direction in the cap around ln
    phi = u1 * 2.0 * jnp.pi
    z = 1.0 + u2 * (cos_max - 1.0)
    sr = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    from tungsten_tpu.utils.vecmath import ortho_frame, to_global
    t, b = ortho_frame(ln)
    d = to_global(t, b, ln, jnp.stack(
        [jnp.cos(phi) * sr, jnp.sin(phi) * sr, z], axis=-1))
    B = dist_c * z
    det = jnp.sqrt(jnp.maximum(B * B - C, 0.0))
    dist = B - det
    pdf = INV_TWO_PI / jnp.maximum(1.0 - cos_max, 1e-9)
    valid = outside & (dist > 0.0)
    return dict(d=d, dist=dist, pdf=pdf,
                emission=scene.light_emission[light_idx], valid=valid)


def sphere_light_direct_pdf(scene, light_idx, p):
    """Sphere::directPdf: the cap pdf as seen from p (independent of the
    hit point)."""
    slot = jnp.clip(scene.light_slot[light_idx], 0,
                    scene.sph_radius.shape[0] - 1)
    c = scene.sph_center[slot]
    r = scene.sph_radius[slot]
    Lv = c - p
    d2 = jnp.sum(Lv * Lv, axis=-1)
    cos_max = jnp.sqrt(jnp.maximum(d2 - r * r, 0.0)) / \
        jnp.sqrt(jnp.maximum(d2, 1e-20))
    return INV_TWO_PI / jnp.maximum(1.0 - cos_max, 1e-9)


# ------------------------------------------------- analytic disk / cylinder

def disk_light_sample(scene, light_idx, p, u1, u2):
    """Uniform point on an analytic disk emitter as seen from p
    (ref Disk::sampleDirect, Disk.cpp:177-195): rejects shading points
    behind the disk and directions outside the emission cone; pdf is
    the usual area->solid-angle conversion rSq/(cosTheta * area).
    Returns dict(d, dist, pdf, emission, valid)."""
    slot = jnp.clip(scene.light_slot[light_idx], 0,
                    scene.dsk_r.shape[0] - 1)
    c = scene.dsk_c[slot]
    n = scene.dsk_n[slot]
    r = scene.dsk_r[slot]
    from tungsten_tpu.utils.vecmath import ortho_frame
    tan, bit = ortho_frame(n)
    # SampleWarp::uniformDisk (polar)
    rho = jnp.sqrt(jnp.maximum(u2, 0.0)) * r
    phi = u1 * 2.0 * jnp.pi
    q = c + (jnp.cos(phi) * rho)[..., None] * bit \
        + (jnp.sin(phi) * rho)[..., None] * tan
    dvec = q - p
    r_sq = jnp.sum(dvec * dvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(r_sq, 1e-20))
    d = dvec / dist[..., None]
    cos_theta = -jnp.sum(d * n, axis=-1)
    front = jnp.sum(n * (p - c), axis=-1) > 0.0
    in_cone = cos_theta >= scene.dsk_cos[slot]
    area = scene.light_area[light_idx]
    pdf = r_sq / jnp.maximum(cos_theta * area, 1e-20)
    valid = front & in_cone & (cos_theta > 0.0) & (area > 0.0)
    return dict(d=d, dist=dist, pdf=pdf,
                emission=scene.light_emission[light_idx], valid=valid)


def cyl_position_sample(scene, slot, u1, u2, u3):
    """Uniform-area point + outward normal on analytic cylinder `slot`
    (ref Cylinder::samplePosition, Cylinder.cpp:152-173): the cap faces
    take their area fraction of samples, the side the rest.  Returns
    (q (R,3) world, n (R,3) world unit normal)."""
    r = scene.cyl_r[slot]
    hh = scene.cyl_hh[slot]
    capped = scene.cyl_capped[slot]
    cap_area = jnp.where(capped, 2.0 * jnp.pi * r * r, 0.0)
    side_area = 2.0 * jnp.pi * r * 2.0 * hh
    p_cap = cap_area / jnp.maximum(cap_area + side_area, 1e-20)
    take_cap = u3 < p_cap
    # remap u3 into the chosen branch for the cap-sign pick
    sign = jnp.where(u3 / jnp.maximum(p_cap, 1e-20) < 0.5, -1.0, 1.0)
    phi = u1 * 2.0 * jnp.pi
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    rho = jnp.sqrt(jnp.maximum(u2, 0.0))
    q_cap = jnp.stack([rho * cphi * r, sign * hh, rho * sphi * r], -1)
    n_cap = jnp.stack([jnp.zeros_like(sign), sign,
                       jnp.zeros_like(sign)], -1)
    h = (2.0 * u2 - 1.0) * hh
    q_side = jnp.stack([cphi * r, h, sphi * r], -1)
    n_side = jnp.stack([cphi, jnp.zeros_like(h), sphi], -1)
    q_loc = jnp.where(take_cap[..., None], q_cap, q_side)
    n_loc = jnp.where(take_cap[..., None], n_cap, n_side)
    rot = scene.cyl_rot[slot]
    q = jnp.einsum("...ij,...j->...i", rot, q_loc) + scene.cyl_pos[slot]
    n = jnp.einsum("...ij,...j->...i", rot, n_loc)
    return q, n


def cyl_light_sample(scene, light_idx, p, u1, u2, u3):
    """Analytic cylinder emitter NEE sample (ref Cylinder::sampleDirect,
    Cylinder.cpp:185-201): uniform-area position, pdf rSq/(cosTheta *
    area), rejected when the sampled normal faces away."""
    slot = jnp.clip(scene.light_slot[light_idx], 0,
                    scene.cyl_r.shape[0] - 1)
    q, n = cyl_position_sample(scene, slot, u1, u2, u3)
    dvec = q - p
    r_sq = jnp.sum(dvec * dvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(r_sq, 1e-20))
    d = dvec / dist[..., None]
    cos_theta = -jnp.sum(d * n, axis=-1)
    area = scene.light_area[light_idx]
    pdf = r_sq / jnp.maximum(cos_theta * area, 1e-20)
    valid = (cos_theta > 0.0) & (area > 0.0)
    return dict(d=d, dist=dist, pdf=pdf,
                emission=scene.light_emission[light_idx], valid=valid)


# ----------------------------------------------------------- cap / point

def cap_light_sample(scene, light_idx, u1, u2):
    """Uniform spherical-cap direction around light_aux dir
    (ref InfiniteSphereCap::sampleDirect); returns (d, pdf)."""
    aux = scene.light_aux[light_idx]
    cap_d = aux[..., :3]
    cos_cap = aux[..., 3]
    from tungsten_tpu.utils.vecmath import ortho_frame, to_global
    phi = u1 * 2.0 * jnp.pi
    z = 1.0 + u2 * (cos_cap - 1.0)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    local = jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)
    t, b = ortho_frame(cap_d)
    d = to_global(t, b, cap_d, local)
    pdf = cap_pdf_value(cos_cap)
    return d, pdf


def cap_pdf_value(cos_cap):
    return INV_TWO_PI / jnp.maximum(1.0 - cos_cap, 1e-9)


def eval_caps(scene, d):
    """Summed radiance of all cap emitters containing direction d,
    split by samplable flag: returns (samplable_rgb, unsamplable_rgb)."""
    inside = jnp.sum(d[..., None, :] * scene.cap_dir, axis=-1) >= scene.cap_cos
    e = jnp.where(inside[..., None], scene.cap_emission, 0.0)
    samp = jnp.sum(jnp.where(scene.cap_samplable[..., None], e, 0.0), axis=-2)
    unsamp = jnp.sum(jnp.where(scene.cap_samplable[..., None], 0.0, e), axis=-2)
    return samp, unsamp


def power_heuristic(pdf0, pdf1):
    """pdf0^2 / (pdf0^2 + pdf1^2) (ref SampleWarp::powerHeuristic), in
    ratio form so huge pdfs don't overflow float32 into inf/inf = nan
    (which would poison gradients through jnp.where branches)."""
    ratio = pdf1 / jnp.maximum(pdf0, 1e-30)
    ratio = jnp.minimum(ratio, 1e15)
    return jnp.where(pdf0 > 0.0, 1.0 / (1.0 + ratio * ratio), 0.0)
