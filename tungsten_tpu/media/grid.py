"""Heterogeneous media: dense voxel grids + analytic exponential falloff.

TPU-native counterpart of ref src/core/media/VoxelMedium.cpp and
ExponentialMedium.cpp plus the Grid abstraction (src/core/grids/Grid.hpp,
VdbGrid.hpp:16-44).  Design decisions vs the reference:

  * Grids live on device as dense (nx,ny,nz) float32 arrays with an
    affine world->index transform per grid; the reference's sparse VDB
    topology becomes a dense padded brick (SURVEY §2.7 "VDB -> dense/
    padded brick grid arrays on device").  Lookups are trilinear gathers
    (8 taps) — branchless, VPU-friendly.
  * Optical depth (ref VdbGrid exact_linear integration,
    VdbGrid.hpp:16-44) is a fixed-count midpoint raymarch over the
    ray∩grid segment: static trip count keeps the wavefront jittable
    (no data-dependent loop bounds), slight quadrature bias vs the
    exact per-cell linear integral is documented and tested against
    analytic grids.
  * Distance sampling inverts the unit optical depth by the same march
    (masked running accumulation + linear interpolation inside the
    crossing step) — the batched equivalent of
    VdbGrid::inverseOpticalDepth.
  * The exponential medium's closed forms (ExponentialMedium.cpp:
    densityIntegral / inverseOpticalDepth, lines 85-104) stay analytic.

Medium kinds (FlatScene.med_kind):
  0 = homogeneous   (density 1 everywhere; handled on the fast path)
  1 = exponential   (analytic, med_exp_params)
  2 = voxel         (dense grid, med_grid indexes FlatScene.grid_*)

med_exp_params layout (M,8): [falloff_scale, unit_point xyz,
falloff_direction xyz (unit), pad].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MED_HOMOGENEOUS = 0
SUPERGRID_SUB = 8    # voxels per majorant supercell axis
MED_EXPONENTIAL = 1
MED_VOXEL = 2
MED_ATMOSPHERE = 3

INF = jnp.float32(3.0e38)
SQRT_PI = 1.7724538509055159


# ------------------------------------------------------------- trilinear

def trilinear(grid, p):
    """Trilinear sample of a dense grid at index-space points.
    grid: (nx,ny,nz) or (nx,ny,nz,C); p: (R,3) index coords. Points
    outside [0, n-1] clamp (the flatten step zero-pads one border voxel
    so clamping reads zero density outside the active region)."""
    n = jnp.asarray(grid.shape[:3], jnp.float32)
    p = jnp.clip(p, 0.0, n - 1.0 - 1e-4)
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    i1 = jnp.minimum(i0 + 1, jnp.asarray(grid.shape[:3], jnp.int32) - 1)

    def tap(ix, iy, iz):
        return grid[ix, iy, iz]

    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    if grid.ndim == 4:
        fx, fy, fz = fx[..., None], fy[..., None], fz[..., None]
    c00 = tap(i0[..., 0], i0[..., 1], i0[..., 2]) * (1 - fx) + \
        tap(i1[..., 0], i0[..., 1], i0[..., 2]) * fx
    c10 = tap(i0[..., 0], i1[..., 1], i0[..., 2]) * (1 - fx) + \
        tap(i1[..., 0], i1[..., 1], i0[..., 2]) * fx
    c01 = tap(i0[..., 0], i0[..., 1], i1[..., 2]) * (1 - fx) + \
        tap(i1[..., 0], i0[..., 1], i1[..., 2]) * fx
    c11 = tap(i0[..., 0], i1[..., 1], i1[..., 2]) * (1 - fx) + \
        tap(i1[..., 0], i1[..., 1], i1[..., 2]) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def _to_grid(scene, g, p):
    """World point (R,3) -> index coords of grid g (static index)."""
    m = scene.grid_w2g[g]
    return p @ m[:, :3].T + m[:, 3]


def _grid_segment(scene, g, o, d, t_max):
    """Clip world-space rays to grid g's bounds. Returns (t0, t1) world
    parameters with t1<=t_max; empty segments have t1<=t0."""
    m = scene.grid_w2g[g]
    og = o @ m[:, :3].T + m[:, 3]
    dg = d @ m[:, :3].T
    dims = jnp.asarray(scene.grid_density[g].shape[:3], jnp.float32) - 1.0
    inv = 1.0 / jnp.where(jnp.abs(dg) < 1e-12,
                          jnp.where(dg >= 0, 1e-12, -1e-12), dg)
    ta = (0.0 - og) * inv
    tb = (dims - og) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    return t0, t1


# -------------------------------------------------- exponential (analytic)

def _exp_xdx(scene, mi, o, d):
    prm = scene.med_exp_params[mi]
    fs = prm[..., 0]
    up = prm[..., 1:4]
    fd = prm[..., 4:7]
    x = fs * jnp.sum((o - up) * fd, axis=-1)
    dx = fs * jnp.sum(d * fd, axis=-1)
    return x, dx


def _exp_density_integral(x, dx, t_max):
    """ref ExponentialMedium::densityIntegral (lines 85-93)."""
    ex = jnp.exp(-x)
    inf_case = ex / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    zero_case = ex * t_max
    safe_t = jnp.where(t_max >= INF, 0.0, t_max)
    gen_case = (ex - jnp.exp(-dx * safe_t - x)) / \
        jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    out = jnp.where(jnp.abs(dx) < 1e-12, zero_case, gen_case)
    return jnp.where(t_max >= INF, jnp.where(dx > 0, inf_case, INF), out)


def _exp_inverse(x, dx, tau):
    """ref ExponentialMedium::inverseOpticalDepth (lines 95-104)."""
    lin = tau / jnp.maximum(jnp.exp(-x), 1e-30)
    denom = 1.0 - dx * jnp.exp(x) * tau
    gen = jnp.where(denom <= 0.0, INF,
                    -jnp.log(jnp.maximum(denom, 1e-30)) /
                    jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx))
    return jnp.where(jnp.abs(dx) < 1e-12, lin, gen)


# ------------------------------------------------- atmosphere (analytic)
#
# Gaussian shell density rho(p) = exp(-s^2 (|p-c|^2 - r^2)) with
# s = falloff_scale / radius (ref AtmosphericMedium.cpp:62-121).
# Closed forms via erf; the reference returns the *absolute* coordinate
# u from inverseOpticalDepth and assigns it to sample.t directly — this
# build converts back to ray distance (t = u - t0), which is the
# dimensionally consistent interpretation.
# med_exp_params layout for atmosphere: [s_eff, center xyz, radius, pad].

def _atmo_hu(scene, mi, o, d):
    prm = scene.med_exp_params[mi]
    s = prm[..., 0]
    c = prm[..., 1:4]
    r = prm[..., 4]
    p = o - c
    t0 = jnp.sum(p * d, axis=-1)
    h_sq = jnp.maximum(jnp.sum(p * p, axis=-1) - t0 * t0, 0.0)
    return s, r, t0, h_sq


def _atmo_integral(s, r, t0, h_sq, u0, u1):
    """∫ rho du from u0 to u1 (absolute coords; u1 may be INF)."""
    from jax.scipy.special import erf
    pre = (SQRT_PI * 0.5 / jnp.maximum(s, 1e-20)) * \
        jnp.exp((-h_sq + r * r) * s * s)
    hi = jnp.where(u1 >= INF, 1.0, erf(s * jnp.where(u1 >= INF, 0.0, u1)))
    return pre * (hi - erf(s * u0))


def _atmo_inverse(s, r, t0, h_sq, tau):
    """Absolute coordinate u with ∫_{t0}^{u} rho = tau, INF if never."""
    from jax.scipy.special import erf
    from jax.scipy.special import erfinv
    inner = erf(s * t0) + (2.0 / SQRT_PI) * \
        jnp.exp(s * s * (h_sq - r * r)) * s * tau
    return jnp.where(inner >= 1.0, INF,
                     erfinv(jnp.clip(inner, -1.0 + 1e-7, 1.0 - 1e-7)) /
                     jnp.maximum(s, 1e-20))


# --------------------------------------------------------- dispatch layer

def density(scene, settings, mi, p):
    """Normalized density rho(p) per-ray; mi (R,) clipped medium index."""
    kind = scene.med_kind[mi]
    rho = jnp.ones(p.shape[:-1], jnp.float32)
    if any(k == MED_EXPONENTIAL for k in settings.med_kinds):
        x, _ = _exp_xdx(scene, mi, p, jnp.zeros_like(p))
        rho = jnp.where(kind == MED_EXPONENTIAL, jnp.exp(-x), rho)
    if any(k == MED_ATMOSPHERE for k in settings.med_kinds):
        prm = scene.med_exp_params[mi]
        sa = prm[..., 0]
        c = prm[..., 1:4]
        r = prm[..., 4]
        dist_sq = jnp.sum((p - c) ** 2, axis=-1)
        rho_a = jnp.exp(-sa * sa * (dist_sq - r * r))
        rho = jnp.where(kind == MED_ATMOSPHERE, rho_a, rho)
    for g in range(len(scene.grid_density)):
        sel = (kind == MED_VOXEL) & (scene.med_grid[mi] == g)
        rho_g = trilinear(scene.grid_density[g], _to_grid(scene, g, p))
        rho = jnp.where(sel, rho_g, rho)
    return rho


def emission(scene, settings, mi, p):
    """Volumetric emission at p (R,3); zero for non-voxel media."""
    out = jnp.zeros(p.shape, jnp.float32)
    kind = scene.med_kind[mi]
    for g in range(len(scene.grid_density)):
        em = scene.grid_emission[g]
        if em.shape[0] == 0:
            continue
        sel = (kind == MED_VOXEL) & (scene.med_grid[mi] == g)
        e_g = trilinear(em, _to_grid(scene, g, p))
        out = jnp.where(sel[..., None], e_g, out)
    return out


def _query_rand(o, d, salt, j):
    """Counter RNG keyed on the QUERY (bits of o, d) + event index —
    transmittance estimates need streams independent of the integrand
    but deterministic per query so path replay / resume reproduce the
    forward pass bit-exactly.  (The per-(pixel,sample,dim) discipline
    is not threaded through transmittance call sites; hashing the ray
    itself gives the same replay-exactness.)"""
    import jax
    from tungsten_tpu.utils.rng import _pcg4d, _to_unit_float

    def b(x):
        return jax.lax.bitcast_convert_type(x, jnp.uint32)

    v0 = b(o[..., 0]) + b(o[..., 1]) * jnp.uint32(3) + \
        b(o[..., 2]) * jnp.uint32(7)
    v1 = b(d[..., 0]) + b(d[..., 1]) * jnp.uint32(3) + \
        b(d[..., 2]) * jnp.uint32(7)
    x, _, _, _ = _pcg4d(v0, v1, jnp.uint32(salt),
                        jnp.asarray(j, jnp.uint32))
    return _to_unit_float(x)


def _rr_tau_grid(scene, settings, g, o, d, t_max, salt=0x5157):
    """Residual-ratio tracking estimate of ∫0^t_max rho dt for grid g
    (ref VdbGrid::opticalDepth ResidualRatio branch,
    VdbGrid.cpp:332-361): walk the majorant supergrid cell by cell,
    accumulate the analytic control integral muC*len, and estimate the
    residual transmittance by ratio tracking with majorant muR.
    Returns tau with E[exp(-tau)] = true transmittance (unbiased for
    the exponential law).  Batched: one fused while_loop where each
    iteration advances every ray by one event (a tentative collision
    or a supercell crossing)."""
    sup = scene.grid_super[g]                   # (sx,sy,sz,2)
    sdim = jnp.asarray(sup.shape[:3], jnp.int32)
    S = jnp.float32(SUPERGRID_SUB)
    m = scene.grid_w2g[g]
    og = o @ m[:, :3].T + m[:, 3]
    dg = d @ m[:, :3].T
    dg_safe = jnp.where(jnp.abs(dg) < 1e-12,
                        jnp.where(dg >= 0, 1e-12, -1e-12), dg)
    t0, t1 = _grid_segment(scene, g, o, d, jnp.minimum(t_max, INF))
    live0 = t1 > t0

    def cell_state(t):
        """Supercell at parameter t -> (muC, muR, seg_end)."""
        p = og + dg * t[..., None]
        cell = jnp.clip(jnp.floor(p / S).astype(jnp.int32), 0, sdim - 1)
        mu = sup[cell[..., 0], cell[..., 1], cell[..., 2]]
        lo = cell.astype(jnp.float32) * S
        hi = lo + S
        ta = (lo - og) / dg_safe
        tb = (hi - og) / dg_safe
        t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
        seg_end = jnp.minimum(jnp.maximum(t_exit, t + 1e-6), t1)
        return mu[..., 0], mu[..., 1], seg_end

    # boundary overshoot ~1e-3 voxels: small enough to skip
    # negligible optical depth, large enough that grazing rays
    # actually change supercells
    eps_t = 1e-3 / jnp.maximum(jnp.max(jnp.abs(dg), axis=-1), 1e-12)
    muC0, muR0, seg0 = cell_state(t0)
    ctrl0 = jnp.where(live0, muC0 * (seg0 - t0), 0.0)

    def cond(s):
        j, t, muC, muR, seg_end, ctrl, logtr, done = s
        return (j < settings.rr_max_events) & jnp.any(~done)

    def body(s):
        j, t, muC, muR, seg_end, ctrl, logtr, done = s
        u = _query_rand(o, d, salt, j)
        jump = -jnp.log1p(-jnp.minimum(u, 0.99999994)) / \
            jnp.maximum(muR, 1e-20)
        t_col = t + jump
        collide = ~done & (t_col < seg_end) & (muR > 1e-20)
        # tentative collision: ratio-tracking factor
        p_col = og + dg * t_col[..., None]
        rho = trilinear(scene.grid_density[g], p_col)
        factor = 1.0 - (rho - muC) / jnp.maximum(muR, 1e-20)
        logtr = logtr + jnp.where(
            collide, jnp.log(jnp.maximum(factor, 1e-30)), 0.0)
        # supercell crossing: advance into the next cell, bank its
        # control integral
        cross = ~done & ~collide
        t_new = jnp.where(collide, t_col, seg_end + eps_t)
        finished = cross & (seg_end >= t1 - 1e-7)
        done2 = done | finished
        muC2, muR2, seg2 = cell_state(t_new)
        enter = cross & ~finished
        ctrl = ctrl + jnp.where(enter, muC2 * (seg2 - t_new), 0.0)
        muC = jnp.where(enter, muC2, muC)
        muR = jnp.where(enter, muR2, muR)
        seg_end = jnp.where(enter, seg2, seg_end)
        t = jnp.where(collide | enter, t_new, t)
        return (j + 1, t, muC, muR, seg_end, ctrl, logtr, done2)

    init = (jnp.int32(0), t0, muC0, muR0, seg0, ctrl0,
            jnp.zeros_like(t0), ~live0)
    _, t_f, muC_f, _, _, ctrl, logtr, done_f = jax.lax.while_loop(
        cond, body, init)
    # rays truncated by the event cap close out with the control-only
    # remainder (slight bias only in pathological dense grids)
    ctrl = ctrl + jnp.where(~done_f,
                            muC_f * jnp.maximum(t1 - t_f, 0.0), 0.0)
    return jnp.where(live0, ctrl - logtr, 0.0)


def _dda_grid(scene, g, o, d, t_max, tau_c=None, nearest=False,
              salt=None):
    """Batched voxel-boundary DDA over grid g — the analog of the
    reference's VdbRaymarcher walks (VdbGrid.cpp:308-331 opticalDepth
    ExactNearest/ExactLinear, :382-430 inverseOpticalDepth).  One fused
    while_loop advances every ray one voxel-boundary segment per
    iteration:

      * nearest=False ("exact_linear"): trapezoid of the trilinear
        density between consecutive boundary crossings; inversion
        solves the quadratic segment integral for the crossing point
        (ref :404-421).
      * nearest=True ("exact_nearest"): piecewise-constant density of
        the voxel containing each segment (boundaries at half-integer
        index coords, i.e. the DdaRay(p + 0.5) shift); inversion is
        linear in the segment.

    With tau_c=None returns tau_total; otherwise returns
    (t, rho_at_t, tau_total) with t = INF where tau_c is never reached
    (matching inverse_unit_tau semantics)."""
    grid = scene.grid_density[g]
    m = scene.grid_w2g[g]
    og = o @ m[:, :3].T + m[:, 3]
    dg = d @ m[:, :3].T
    dg_safe = jnp.where(jnp.abs(dg) < 1e-12,
                        jnp.where(dg >= 0, 1e-12, -1e-12), dg)
    t0, t1 = _grid_segment(scene, g, o, d, jnp.minimum(t_max, INF))
    live0 = t1 > t0
    shift = 0.5 if nearest else 0.0
    dims = jnp.asarray(grid.shape[:3], jnp.int32)
    # a ray crosses at most sum(dims) + slack boundaries
    max_steps = int(sum(grid.shape[:3])) + 8
    eps_t = 1e-4 / jnp.maximum(jnp.max(jnp.abs(dg), axis=-1), 1e-12)

    def next_boundary(ta):
        p = og + dg * (ta + eps_t)[..., None] + shift
        base = jnp.floor(p)
        target = jnp.where(dg >= 0.0, base + 1.0, base) - shift
        t_axis = (target - og) / dg_safe
        tb = jnp.min(t_axis, axis=-1)
        return jnp.minimum(jnp.maximum(tb, ta + eps_t), t1)

    def f_at(t):
        return trilinear(grid, og + dg * t[..., None])

    def v_mid(ta, tb):
        pm = og + dg * (0.5 * (ta + tb))[..., None]
        idx = jnp.clip(jnp.round(pm).astype(jnp.int32), 0, dims - 1)
        return grid[idx[..., 0], idx[..., 1], idx[..., 2]]

    fa0 = f_at(t0) if not nearest else jnp.zeros_like(t0)

    def cond(s):
        i, ta, fa, integral, done, t_hit, rho_hit = s
        return (i < max_steps) & jnp.any(~done)

    def body(s):
        i, ta, fa, integral, done, t_hit, rho_hit = s
        tb = next_boundary(ta)
        if nearest:
            v = v_mid(ta, tb)
            delta = v * (tb - ta)
            fb = fa
        else:
            fb = f_at(tb)
            delta = 0.5 * (fa + fb) * (tb - ta)
        if tau_c is not None:
            crosses = ~done & (integral + delta >= tau_c) & (delta > 0.0)
            if nearest:
                x1 = jnp.clip((tau_c - integral) /
                              jnp.maximum(delta, 1e-30), 0.0, 1.0)
                rho_x = v
            else:
                # solve  a/2 x^2 + b x + c = 0  for the in-segment
                # crossing of the trapezoid integral (ref :404-416)
                a = fb - fa
                b = fa
                c = (integral - tau_c) / jnp.maximum(tb - ta, 1e-30)
                lin = -c / jnp.where(jnp.abs(b) < 1e-20, 1e-20, b)
                mant = jnp.maximum(b * b - 2.0 * a * c, 0.0)
                quad = (-b + jnp.sqrt(mant)) / \
                    jnp.where(jnp.abs(a) < 1e-6, 1e-6, a)
                x1 = jnp.clip(jnp.where(jnp.abs(a) < 1e-6, lin, quad),
                              0.0, 1.0)
                rho_x = fa + (fb - fa) * x1
            t_hit = jnp.where(crosses, ta + (tb - ta) * x1, t_hit)
            rho_hit = jnp.where(crosses, rho_x, rho_hit)
            done2 = done | crosses
        else:
            done2 = done
        integral = integral + jnp.where(done2, 0.0, delta)
        finished = tb >= t1 - eps_t
        return (i + 1, tb, fb, integral, done2 | finished,
                t_hit, rho_hit)

    init = (jnp.int32(0), t0, fa0, jnp.zeros_like(t0), ~live0,
            jnp.full_like(t0, INF), jnp.zeros_like(t0))
    _, _, _, integral, _, t_hit, rho_hit = jax.lax.while_loop(
        cond, body, init)
    integral = jnp.where(live0, integral, 0.0)
    if tau_c is None:
        return integral
    return t_hit, rho_hit, integral


def unit_tau(scene, settings, mi, o, d, t_max):
    """∫0^t_max rho dt per ray (world measure).  Homogeneous media
    return t_max itself (rho = 1).  Voxel grids use the integration
    method from settings.voxel_integration: "residual_ratio" (unbiased
    tracking over the majorant supergrid) or "raymarching" (fixed-step
    midpoint quadrature)."""
    kind = scene.med_kind[mi]
    tau = jnp.minimum(t_max, INF)
    if any(k == MED_EXPONENTIAL for k in settings.med_kinds):
        x, dx = _exp_xdx(scene, mi, o, d)
        tau = jnp.where(kind == MED_EXPONENTIAL,
                        _exp_density_integral(x, dx, t_max), tau)
    if any(k == MED_ATMOSPHERE for k in settings.med_kinds):
        sa, r, t0, h_sq = _atmo_hu(scene, mi, o, d)
        u1 = jnp.where(t_max >= INF, INF, t0 + t_max)
        tau_a = _atmo_integral(sa, r, t0, h_sq, t0, u1)
        tau = jnp.where(kind == MED_ATMOSPHERE, tau_a, tau)
    for g in range(len(scene.grid_density)):
        sel = (kind == MED_VOXEL) & (scene.med_grid[mi] == g)
        if settings.voxel_integration == "residual_ratio" and \
                len(getattr(scene, "grid_super", ())) > g:
            tau_g = _rr_tau_grid(scene, settings, g, o, d, t_max)
        elif settings.voxel_integration in ("exact_linear",
                                            "exact_nearest"):
            tau_g = _dda_grid(
                scene, g, o, d, t_max,
                nearest=settings.voxel_integration == "exact_nearest")
        else:
            t0, t1 = _grid_segment(scene, g, o, d, jnp.minimum(t_max, INF))
            seg = jnp.maximum(t1 - t0, 0.0)
            n = settings.grid_steps
            dt = seg / n
            ts = t0[..., None] + \
                (jnp.arange(n, dtype=jnp.float32) + 0.5) * dt[..., None]
            pts = o[..., None, :] + d[..., None, :] * ts[..., None]
            rho = trilinear(scene.grid_density[g],
                            _to_grid(scene, g, pts.reshape(-1, 3))
                            ).reshape(ts.shape)
            tau_g = jnp.sum(rho, axis=-1) * dt
        tau = jnp.where(sel, tau_g, tau)
    return tau


def inverse_unit_tau(scene, settings, mi, o, d, t_max, tau_c):
    """Invert ∫ rho dt = tau_c along the ray.  Returns (t, rho_at_t,
    tau_total) where rays that never reach tau_c within [0, t_max∩grid]
    get t = INF and tau_total = the full segment's optical depth
    (batched VdbGrid::inverseOpticalDepth / ExponentialMedium::
    inverseOpticalDepth semantics)."""
    kind = scene.med_kind[mi]
    # homogeneous: t = tau_c directly
    t_out = tau_c
    rho_out = jnp.ones_like(tau_c)
    tau_tot = jnp.minimum(t_max, INF)

    if any(k == MED_EXPONENTIAL for k in settings.med_kinds):
        x, dx = _exp_xdx(scene, mi, o, d)
        t_e = _exp_inverse(x, dx, tau_c)
        rho_e = jnp.exp(-(x + dx * jnp.minimum(t_e, t_max)))
        tot_e = _exp_density_integral(x, dx, t_max)
        is_e = kind == MED_EXPONENTIAL
        t_out = jnp.where(is_e, t_e, t_out)
        rho_out = jnp.where(is_e, rho_e, rho_out)
        tau_tot = jnp.where(is_e, tot_e, tau_tot)

    if any(k == MED_ATMOSPHERE for k in settings.med_kinds):
        sa, r, t0, h_sq = _atmo_hu(scene, mi, o, d)
        u = _atmo_inverse(sa, r, t0, h_sq, tau_c)
        t_a = jnp.where(u >= INF, INF, u - t0)
        u_clip = jnp.minimum(jnp.where(u >= INF, 0.0, u),
                             t0 + jnp.minimum(t_max, INF))
        rho_a = jnp.exp(-sa * sa * (h_sq - r * r + u_clip * u_clip))
        u1 = jnp.where(t_max >= INF, INF, t0 + t_max)
        tot_a = _atmo_integral(sa, r, t0, h_sq, t0, u1)
        is_a = kind == MED_ATMOSPHERE
        t_out = jnp.where(is_a, t_a, t_out)
        rho_out = jnp.where(is_a, rho_a, rho_out)
        tau_tot = jnp.where(is_a, tot_a, tau_tot)

    for g in range(len(scene.grid_density)):
        sel = (kind == MED_VOXEL) & (scene.med_grid[mi] == g)
        if settings.voxel_sampling in ("exact_linear", "exact_nearest"):
            t_g, rho_g, tau_g = _dda_grid(
                scene, g, o, d, t_max, tau_c=tau_c,
                nearest=settings.voxel_sampling == "exact_nearest")
            t_out = jnp.where(sel, t_g, t_out)
            rho_out = jnp.where(sel, rho_g, rho_out)
            tau_tot = jnp.where(sel, tau_g, tau_tot)
            continue
        t0, t1 = _grid_segment(scene, g, o, d, jnp.minimum(t_max, INF))
        seg = jnp.maximum(t1 - t0, 0.0)
        n = settings.grid_steps
        dt = seg / n

        def step(i, carry):
            tau_acc, t_hit, rho_hit, found = carry
            tm = t0 + (i + 0.5) * dt
            p = o + d * tm[..., None]
            rho = trilinear(scene.grid_density[g], _to_grid(scene, g, p))
            new_tau = tau_acc + rho * dt
            crosses = (~found) & (new_tau >= tau_c)
            # linear interpolation within the step
            frac = (tau_c - tau_acc) / jnp.maximum(rho * dt, 1e-30)
            t_c = t0 + i * dt + jnp.clip(frac, 0.0, 1.0) * dt
            t_hit = jnp.where(crosses, t_c, t_hit)
            rho_hit = jnp.where(crosses, rho, rho_hit)
            return new_tau, t_hit, rho_hit, found | crosses

        init = (jnp.zeros_like(tau_c), jnp.full_like(tau_c, INF),
                jnp.zeros_like(tau_c), jnp.zeros(tau_c.shape, bool))
        tau_g, t_g, rho_g, found = jax.lax.fori_loop(0, n, step, init)
        t_out = jnp.where(sel, t_g, t_out)
        rho_out = jnp.where(sel, rho_g, rho_out)
        tau_tot = jnp.where(sel, tau_g, tau_tot)
    return t_out, rho_out, tau_tot
