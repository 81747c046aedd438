"""Non-exponential free-flight transmittance laws (Bitterli et al. 2018
framework), batched over media.

Four-kernel interface parity with ref src/core/transmittances/
Transmittance.hpp:49-57: surfaceSurface / surfaceMedium / mediumSurface /
mediumMedium over optical depth tau, plus sigmaBar and the two samplers.
Laws: exponential, double_exponential, linear, quadratic, erlang, davis,
davis_weinstein, pulse, interpolated (ref TransmittanceFactory.cpp:15-25).

Params layout (med_trans_params (M,4), widened to (M,16) only when a
scene uses `interpolated` — the wrappers detect the width statically so
scenes without it pay nothing):
  exponential:        —
  linear/quadratic:   [max_t]
  double_exponential: [sigma_a, sigma_b]
  erlang:             [lambda]
  davis:              [alpha]
  davis_weinstein:    [h, c]
  pulse:              [a, b, num_pulses]
  interpolated:       cols [4]=type_a [5]=type_b [6]=ratio
                      [8:12]=params_a [12:16]=params_b
                      (ref InterpolatedTransmittance.cpp: lerp of two
                      child laws; children are never interpolated)
"""
from __future__ import annotations

import jax.numpy as jnp

T_EXPONENTIAL = 0
T_DOUBLE_EXPONENTIAL = 1
T_LINEAR = 2
T_QUADRATIC = 3
T_ERLANG = 4
T_DAVIS = 5
T_DAVIS_WEINSTEIN = 6
T_PULSE = 7
T_INTERPOLATED = 8

NAMES = {
    "exponential": T_EXPONENTIAL,
    "double_exponential": T_DOUBLE_EXPONENTIAL,
    "linear": T_LINEAR,
    "quadratic": T_QUADRATIC,
    "erlang": T_ERLANG,
    "davis": T_DAVIS,
    "davis_weinstein": T_DAVIS_WEINSTEIN,
    "pulse": T_PULSE,
    "interpolated": T_INTERPOLATED,
}

# laws whose mediumMedium is a dirac / sum of diracs (ref
# LinearTransmittance.cpp:65, PulseTransmittance.cpp:39)
_DIRAC_LAWS = (T_LINEAR, T_PULSE)


def _interp_parts(p):
    """Child (type, params, ratio) columns of an interpolated row."""
    ta = p[..., 4].astype(jnp.int32)
    tb = p[..., 5].astype(jnp.int32)
    u = p[..., 6:7]
    return ta, tb, u, p[..., 8:12], p[..., 12:16]



MAX_PULSES = 8  # static unroll bound for pulse sampling


def _pulse_cell(tau, a, b, n):
    return jnp.clip(n * (tau - a) / jnp.maximum(b - a, 1e-20), 0.0, n)


def _dispatch(ttype, tau, p, fns):
    out = jnp.zeros_like(tau)
    for tid, fn in fns.items():
        out = jnp.where(ttype[..., None] == tid, fn(tau, p), out)
    return out


def _surface_surface_base(ttype, tau, p):
    def exp_(tau, p):
        return jnp.exp(-tau)

    def dexp(tau, p):
        sa, sb = p[..., 0:1], p[..., 1:2]
        return 0.5 * (jnp.exp(-sa * tau) + jnp.exp(-sb * tau))

    def lin(tau, p):
        return 1.0 - jnp.minimum(tau / p[..., 0:1], 1.0)

    def quad(tau, p):
        t = jnp.minimum(tau / p[..., 0:1], 1.0)
        return 1.0 - 2.0 * t + t * t

    def erl(tau, p):
        lam = p[..., 0:1]
        return 0.5 * jnp.exp(-lam * tau) * (2.0 + lam * tau)

    def davis(tau, p):
        al = p[..., 0:1]
        return jnp.power(1.0 + tau / al, -al)

    def dw(tau, p):
        h, c = p[..., 0:1], p[..., 1:2]
        beta = 2.0 * h - 1.0
        al = jnp.power(jnp.maximum(tau, 1e-20), 1.0 - beta) / jnp.power(c, 1.0 + beta)
        tr = jnp.power(1.0 + tau / jnp.maximum(al, 1e-20), -al)
        return jnp.where(jnp.isfinite(tr), tr, 0.0)

    def pulse(tau, p):
        a, b, n = p[..., 0:1], p[..., 1:2], p[..., 2:3]
        idxf = jnp.clip(n * (tau - a) / jnp.maximum(b - a, 1e-20) + 0.5, 0.0, n)
        idx = jnp.floor(idxf)
        height = (n - idx) / n
        cell = height * (idxf - idx)
        extra = jnp.where(idx > 0,
                          (idx - 0.5) - (idx * (idx - 1.0)) / (2.0 * n),
                          -0.5)
        cell = cell + extra
        return 1.0 - (2.0 / n) * cell

    return _dispatch(ttype, tau, p, {
        T_EXPONENTIAL: exp_, T_DOUBLE_EXPONENTIAL: dexp, T_LINEAR: lin,
        T_QUADRATIC: quad, T_ERLANG: erl, T_DAVIS: davis,
        T_DAVIS_WEINSTEIN: dw, T_PULSE: pulse})


def _surface_medium_base(ttype, tau, p):
    def exp_(tau, p):
        return jnp.exp(-tau)

    def dexp(tau, p):
        sa, sb = p[..., 0:1], p[..., 1:2]
        return 0.5 * (sa * jnp.exp(-sa * tau) + sb * jnp.exp(-sb * tau))

    def lin(tau, p):
        mt = p[..., 0:1]
        return jnp.where(tau > mt, 0.0, 1.0 / mt)

    def quad(tau, p):
        mt = p[..., 0:1]
        return (2.0 / mt) * (1.0 - jnp.minimum(tau / mt, 1.0))

    def erl(tau, p):
        lam = p[..., 0:1]
        return jnp.exp(-lam * tau) * (1.0 + lam * tau) * lam * 0.5

    def davis(tau, p):
        al = p[..., 0:1]
        return jnp.power(1.0 + tau / al, -(al + 1.0))

    def dw(tau, p):
        h, c = p[..., 0:1], p[..., 1:2]
        beta = 2.0 * h - 1.0
        t = jnp.maximum(tau, 1e-20)
        al = jnp.power(t, 1.0 - beta) / jnp.power(c, 1.0 + beta)
        base = 1.0 + t / al
        trs = jnp.power(base, -al)
        tr = trs * (beta / base - (beta - 1.0) * al / t * jnp.log(base))
        return jnp.where(jnp.isfinite(tr), tr, 0.0)

    def pulse(tau, p):
        a, b = p[..., 0:1], p[..., 1:2]
        return 2.0 / (b - a) * _pulse_medium_surface(tau, p)

    return _dispatch(ttype, tau, p, {
        T_EXPONENTIAL: exp_, T_DOUBLE_EXPONENTIAL: dexp, T_LINEAR: lin,
        T_QUADRATIC: quad, T_ERLANG: erl, T_DAVIS: davis,
        T_DAVIS_WEINSTEIN: dw, T_PULSE: pulse})


def _pulse_medium_surface(tau, p):
    a, b, n = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    idx = jnp.clip(jnp.floor(n * (tau - a) / jnp.maximum(b - a, 1e-20) + 0.5),
                   0.0, n)
    return 1.0 - idx / n


def _medium_surface_base(ttype, tau, p):
    def exp_(tau, p):
        return jnp.exp(-tau)

    def dexp(tau, p):
        sa, sb = p[..., 0:1], p[..., 1:2]
        return (sa * jnp.exp(-sa * tau) + sb * jnp.exp(-sb * tau)) / (sa + sb)

    def lin(tau, p):
        return jnp.where(tau > p[..., 0:1], 0.0, 1.0)

    def quad(tau, p):
        return 1.0 - jnp.minimum(tau / p[..., 0:1], 1.0)

    def erl(tau, p):
        lam = p[..., 0:1]
        return jnp.exp(-lam * tau) * (1.0 + lam * tau)

    def davis(tau, p):
        al = p[..., 0:1]
        return jnp.power(1.0 + tau / al, -(al + 1.0))

    def pulse(tau, p):
        return _pulse_medium_surface(tau, p)

    fns = {T_EXPONENTIAL: exp_, T_DOUBLE_EXPONENTIAL: dexp, T_LINEAR: lin,
           T_QUADRATIC: quad, T_ERLANG: erl, T_DAVIS: davis, T_PULSE: pulse}
    out = _dispatch(ttype, tau, p, fns)
    dw_mask = ttype[..., None] == T_DAVIS_WEINSTEIN
    if True:  # davis_weinstein mediumSurface == surfaceMedium
        out = jnp.where(dw_mask, _surface_medium_base(
            jnp.full_like(ttype, T_DAVIS_WEINSTEIN), tau, p), out)
    return out


def _medium_medium_base(ttype, tau, p):
    def exp_(tau, p):
        return jnp.exp(-tau)

    def dexp(tau, p):
        sa, sb = p[..., 0:1], p[..., 1:2]
        return (sa * sa * jnp.exp(-sa * tau) + sb * sb * jnp.exp(-sb * tau)) / (sa + sb)

    def lin(tau, p):
        mt = p[..., 0:1]
        return jnp.where(jnp.abs(tau - mt) < 1e-3, 1.0, 0.0)

    def quad(tau, p):
        mt = p[..., 0:1]
        return jnp.where(tau > mt, 0.0, 1.0 / mt)

    def erl(tau, p):
        lam = p[..., 0:1]
        return lam * lam * tau * jnp.exp(-lam * tau)

    def davis(tau, p):
        al = p[..., 0:1]
        return (1.0 + 1.0 / al) * jnp.power(1.0 + tau / al, -(al + 2.0))

    def dw(tau, p):
        # full second-derivative form is lengthy; Davis-Weinstein media are
        # start-on-surface in practice (camera/surface segments)
        return _surface_medium_base(
            jnp.full_like(ttype, T_DAVIS_WEINSTEIN), tau, p)

    def pulse(tau, p):
        a, b, n = p[..., 0:1], p[..., 1:2], p[..., 2:3]
        idxf = _pulse_cell(tau, a, b, n)
        idx = jnp.floor(idxf)
        return (1.0 / n) * jnp.where(jnp.abs(idxf - idx - 0.5) < 1e-3, 1.0, 0.0)

    return _dispatch(ttype, tau, p, {
        T_EXPONENTIAL: exp_, T_DOUBLE_EXPONENTIAL: dexp, T_LINEAR: lin,
        T_QUADRATIC: quad, T_ERLANG: erl, T_DAVIS: davis,
        T_DAVIS_WEINSTEIN: dw, T_PULSE: pulse})


def _sigma_bar_base(ttype, p):
    out = jnp.ones(ttype.shape, jnp.float32)
    out = jnp.where(ttype == T_DOUBLE_EXPONENTIAL,
                    0.5 * (p[..., 0] + p[..., 1]), out)
    out = jnp.where(ttype == T_LINEAR, 1.0 / jnp.maximum(p[..., 0], 1e-20), out)
    out = jnp.where(ttype == T_QUADRATIC, 2.0 / jnp.maximum(p[..., 0], 1e-20), out)
    out = jnp.where(ttype == T_ERLANG, p[..., 0] * 0.5, out)
    out = jnp.where(ttype == T_PULSE,
                    2.0 / jnp.maximum(p[..., 1] - p[..., 0], 1e-20), out)
    return out


# ---- public four-kernel wrappers: interpolated = lerp of two child laws
# (ref InterpolatedTransmittance.cpp:44-70).  Active only when the param
# table carries the 16-column interpolated layout.

def _is_dirac(ttype):
    out = jnp.zeros(ttype.shape, bool)
    for t in _DIRAC_LAWS:
        out = out | (ttype == t)
    return out


def sigma_bar(ttype, p):
    out = _sigma_bar_base(ttype, p)
    if p.shape[-1] < 16:
        return out
    u = p[..., 6]
    sa = _sigma_bar_base(p[..., 4].astype(jnp.int32), p[..., 8:12])
    sb = _sigma_bar_base(p[..., 5].astype(jnp.int32), p[..., 12:16])
    # sigmaBar = 1 / lerp(1/A.sigmaBar, 1/B.sigmaBar, u)
    mix = 1.0 / ((1.0 - u) / sa + u / sb)
    return jnp.where(ttype == T_INTERPOLATED, mix, out)


def surface_surface(ttype, tau, p):
    out = _surface_surface_base(ttype, tau, p)
    if p.shape[-1] < 16:
        return out
    ta, tb, u, pa, pb = _interp_parts(p)
    sa = _sigma_bar_base(ta, pa)[..., None]
    sb = _sigma_bar_base(tb, pb)[..., None]
    sbar = sigma_bar(ttype, p)[..., None]
    mix = sbar * ((1.0 - u) * _surface_surface_base(ta, tau, pa) / sa
                  + u * _surface_surface_base(tb, tau, pb) / sb)
    return jnp.where(ttype[..., None] == T_INTERPOLATED, mix, out)


def medium_surface(ttype, tau, p):
    out = _medium_surface_base(ttype, tau, p)
    if p.shape[-1] < 16:
        return out
    ta, tb, u, pa, pb = _interp_parts(p)
    mix = ((1.0 - u) * _medium_surface_base(ta, tau, pa)
           + u * _medium_surface_base(tb, tau, pb))
    return jnp.where(ttype[..., None] == T_INTERPOLATED, mix, out)


def surface_medium(ttype, tau, p):
    out = _surface_medium_base(ttype, tau, p)
    if p.shape[-1] < 16:
        return out
    # interpolated surfaceMedium = mediumSurface * sigmaBar
    mix = medium_surface(ttype, tau, p) * sigma_bar(ttype, p)[..., None]
    return jnp.where(ttype[..., None] == T_INTERPOLATED, mix, out)


def medium_medium(ttype, tau, p):
    out = _medium_medium_base(ttype, tau, p)
    if p.shape[-1] < 16:
        return out
    ta, tb, u, pa, pb = _interp_parts(p)
    mma = _medium_medium_base(ta, tau, pa)
    mmb = _medium_medium_base(tb, tau, pb)
    # dirac exception: if exactly one child is dirac with mass here, its
    # density dominates the lerp (InterpolatedTransmittance.cpp:58-68)
    da = _is_dirac(ta)[..., None] & (mma > 0.0)
    db = _is_dirac(tb)[..., None] & (mmb > 0.0)
    lerped = (1.0 - u) * mma + u * mmb
    mix = jnp.where(da ^ db, jnp.where(da, mma, mmb), lerped)
    return jnp.where(ttype[..., None] == T_INTERPOLATED, mix, out)


def eval_tr(ttype, tau, p, start_on_surface, end_on_surface):
    """Transmittance eval with surface/medium endpoint classification.
    NOTE: both mixed cases return mediumSurface — exactly as the
    reference (Transmittance.hpp:22-30), where the final else covers
    surface->medium AND medium->surface with mediumSurface(tau)."""
    ss = surface_surface(ttype, tau, p)
    mm = medium_medium(ttype, tau, p) / sigma_bar(ttype, p)[..., None]
    both_s = start_on_surface[..., None] & end_on_surface[..., None]
    neither = ~start_on_surface[..., None] & ~end_on_surface[..., None]
    return jnp.where(both_s, ss,
                     jnp.where(neither, mm, medium_surface(ttype, tau, p)))


def surface_probability(ttype, tau, p, start_on_surface):
    return jnp.where(start_on_surface[..., None],
                     surface_surface(ttype, tau, p),
                     medium_surface(ttype, tau, p))


def medium_pdf(ttype, tau, p, start_on_surface):
    return jnp.where(start_on_surface[..., None],
                     surface_medium(ttype, tau, p),
                     medium_medium(ttype, tau, p))


def _sample_distance_base(ttype, p, start_on_surface, u1, u2):
    """Sample unit-optical-depth free flight (ref sampleSurface /
    sampleMedium per law; u2 feeds two-branch laws)."""
    u1 = jnp.minimum(u1, 1.0 - 1e-7)

    exp_t = -jnp.log(1.0 - u1)

    sa, sb = p[..., 0], p[..., 1]
    pick_a_surf = u2 < 0.5
    pick_a_med = u2 < sa / jnp.maximum(sa + sb, 1e-20)
    dexp_surf = jnp.where(pick_a_surf, exp_t / jnp.maximum(sa, 1e-20),
                          exp_t / jnp.maximum(sb, 1e-20))
    dexp_med = jnp.where(pick_a_med, exp_t / jnp.maximum(sa, 1e-20),
                         exp_t / jnp.maximum(sb, 1e-20))

    mt = p[..., 0]
    lin_surf = mt * u1
    lin_med = mt
    quad_surf = mt * (1.0 - jnp.sqrt(jnp.maximum(1.0 - u1, 0.0)))
    quad_med = mt * u1

    lam = jnp.maximum(p[..., 0], 1e-20)
    # erlang surface sampling: 10 Newton iterations on 1 - S(x) = u
    x = jnp.full_like(u1, 0.5)
    for _ in range(10):
        s = 0.5 * jnp.exp(-lam * x) * (2.0 + lam * x)
        dens = jnp.exp(-lam * x) * (1.0 + lam * x) * lam * 0.5
        x = jnp.maximum(x + (u1 - (1.0 - s)) / jnp.maximum(dens, 1e-20), 0.0)
    erl_surf = x
    erl_med = -1.0 / lam * jnp.log(jnp.maximum(u1 * u2, 1e-20))

    al = jnp.maximum(p[..., 0], 1e-20)
    davis_surf = al * (jnp.power(1.0 - u1, -1.0 / al) - 1.0)
    davis_med = al * (jnp.power(1.0 - u1, -1.0 / (1.0 + al)) - 1.0)

    # pulse surfaces: unrolled inverse-CDF over MAX_PULSES trapezoid cells
    a_, b_, n_ = p[..., 0], p[..., 1], jnp.maximum(p[..., 2], 1.0)
    xi = u1 * n_ * 0.5
    delta = 1.0 / n_
    pulse_surf = jnp.zeros_like(u1)
    found = jnp.zeros_like(u1, bool)
    for i in range(MAX_PULSES):
        valid = i < n_
        h0 = (1.0 - i * delta)
        h1 = (1.0 - (i + 1.0) * delta)
        hit0 = (~found) & valid & (xi - h0 * 0.5 < 0.0)
        pulse_surf = jnp.where(hit0, a_ + (i + 0.5 * u2) * (b_ - a_) * delta,
                               pulse_surf)
        found = found | hit0
        xi = jnp.where(valid & ~found, xi - h0 * 0.5, xi)
        hit1 = (~found) & valid & (xi - h1 * 0.5 < 0.0)
        pulse_surf = jnp.where(hit1,
                               a_ + (i + 0.5 + 0.5 * u2) * (b_ - a_) * delta,
                               pulse_surf)
        found = found | hit1
        xi = jnp.where(valid & ~found, xi - h1 * 0.5, xi)
    pulse_med = a_ + (0.5 + jnp.floor(u1 * n_)) / n_ * (b_ - a_)

    def pick(surf, med):
        return jnp.where(start_on_surface, surf, med)

    out = pick(exp_t, exp_t)
    out = jnp.where(ttype == T_DOUBLE_EXPONENTIAL, pick(dexp_surf, dexp_med), out)
    out = jnp.where(ttype == T_LINEAR, pick(lin_surf, lin_med), out)
    out = jnp.where(ttype == T_QUADRATIC, pick(quad_surf, quad_med), out)
    out = jnp.where(ttype == T_ERLANG, pick(erl_surf, erl_med), out)
    out = jnp.where(ttype == T_DAVIS, pick(davis_surf, davis_med), out)
    out = jnp.where(ttype == T_DAVIS_WEINSTEIN, pick(davis_surf, davis_med), out)
    out = jnp.where(ttype == T_PULSE, pick(pulse_surf, pulse_med), out)
    return out


def sample_distance(ttype, p, start_on_surface, u1, u2):
    out = _sample_distance_base(ttype, p, start_on_surface, u1, u2)
    if p.shape[-1] < 16:
        return out
    # interpolated: child B with probability ratio, else A (ref
    # InterpolatedTransmittance::sampleSurface/sampleMedium); u2 is
    # rescaled after the discrete choice so two-branch children keep an
    # independent uniform
    ta = p[..., 4].astype(jnp.int32)
    tb = p[..., 5].astype(jnp.int32)
    r = p[..., 6]
    pick_b = u2 < r
    u2r = jnp.where(pick_b, u2 / jnp.maximum(r, 1e-7),
                    (u2 - r) / jnp.maximum(1.0 - r, 1e-7))
    da = _sample_distance_base(ta, p[..., 8:12], start_on_surface, u1, u2r)
    db = _sample_distance_base(tb, p[..., 12:16], start_on_surface, u1, u2r)
    mix = jnp.where(pick_b, db, da)
    return jnp.where(ttype == T_INTERPOLATED, mix, out)
