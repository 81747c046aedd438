"""NFOR denoiser (Bitterli et al. 2016) — TPU-native implementation of
the reference's denoiser app (ref src/denoiser/denoiser.cpp:38-134,
NlMeans.hpp, Regression.cpp).

Pipeline parity with nforDenoiser():
  1. feature cross-prefiltering (NL-means, each half buffer guided by
     the other; F=3, R=5, k=0.5, variance scale 2),
  2. two collaborative first-order regression passes (k = 0.5 and 1.0)
     on the color half buffers with the prefiltered features,
  3. per-pixel MSE estimation + NL-means-filtered bandwidth selection,
  4. second filter pass: feature/color halves combined and a final
     regression.

TPU-shaped deltas from the reference:
  * NL-means runs as a scan over window offsets with box-filtered patch
    distances (separable cumsum) — dense image ops instead of per-tile
    scalar loops.
  * The regression solves per-pixel dxd normal equations with a batched
    linear solve and evaluates the fit at the window *center* (the
    reference also accumulates each center's prediction across its
    window, a patch-overlap average; center evaluation is the standard
    simplification and keeps memory linear in the image).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

EPS = 1e-7
DIST_CLAMP = 1e4


def _box_filter(img, radius):
    """Separable (2F+1) box mean over the leading two axes."""
    if radius <= 0:
        return img
    k = 2 * radius + 1
    pad = [(radius, radius)] + [(0, 0)] * (img.ndim - 1)
    p = jnp.pad(img, pad, mode="edge")
    c = jnp.cumsum(p, axis=0)
    c = jnp.concatenate([jnp.zeros_like(c[:1]), c], axis=0)
    img = (c[k:] - c[:-k]) / k
    pad = [(0, 0), (radius, radius)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    c = jnp.cumsum(p, axis=1)
    c = jnp.concatenate([jnp.zeros_like(c[:, :1]), c], axis=1)
    return (c[:, k:] - c[:, :-k]) / k


def _offsets(R):
    return np.array([(dy, dx) for dy in range(-R, R + 1)
                     for dx in range(-R, R + 1)], np.int32)


def _shift(img, dy, dx, R):
    """Dynamic window shift via a padded copy (edge padding)."""
    pad = [(R, R), (R, R)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    start = (R + dy, R + dx) + (0,) * (img.ndim - 2)
    return jax.lax.dynamic_slice(p, start, img.shape)


def _nl_weight(guide, var, dy, dx, F, k, var_scale):
    """Rousselle et al. patch weight for offset (dy, dx)
    (ref NlMeans.hpp squaredDist + box filter + exp)."""
    g_q = _shift(guide, dy, dx, max(F, 8))
    v_p = var * var_scale
    v_q = _shift(var, dy, dx, max(F, 8)) * var_scale
    sq = (guide - g_q) ** 2 - (v_p + jnp.minimum(v_p, v_q))
    dist = jnp.minimum(sq / ((v_p + v_q) * k * k + EPS), DIST_CLAMP)
    patch = _box_filter(dist, F)
    if patch.ndim == 3:  # rgb guide -> min-channel weight (convertWeight)
        patch = jnp.max(patch, axis=-1)
    return jnp.exp(-jnp.maximum(patch, 0.0))


@functools.partial(jax.jit, static_argnames=("F", "R", "k", "var_scale"))
def nl_means(image, guide, variance, F: int, R: int, k: float,
             var_scale: float = 1.0):
    """NL-means filter of `image` guided by (guide, variance)."""
    offs = jnp.asarray(_offsets(R))

    def body(carry, off):
        acc, wacc = carry
        dy, dx = off[0], off[1]
        w = _nl_weight(guide, variance, dy, dx, F, k, var_scale)
        img_q = _shift(image, dy, dx, R)
        acc = acc + img_q * w[..., None]
        wacc = wacc + w
        return (acc, wacc), None

    acc0 = jnp.zeros_like(image)
    w0 = jnp.zeros(image.shape[:2])
    (acc, wacc), _ = jax.lax.scan(body, (acc0, w0), offs)
    return acc / jnp.maximum(wacc, EPS)[..., None]


@functools.partial(jax.jit, static_argnames=("F", "R", "k"))
def collaborative_regression(image, guide, features, variance,
                             F: int, R: int, k: float):
    """First-order weighted regression (ref Regression.cpp): per pixel,
    fit color ~ 1 + (dx, dy) + (features - center features) over a
    (2R+1)^2 window with NL-means weights, evaluate at the center."""
    h, w = image.shape[:2]
    nf = features.shape[-1] if features is not None else 0
    d = 3 + nf
    offs = jnp.asarray(_offsets(R))

    def body(carry, off):
        A, b = carry
        dy, dx = off[0], off[1]
        wgt = _nl_weight(guide, variance, dy, dx, F, k, 2.0)
        y_q = _shift(image, dy, dx, R)
        x_parts = [jnp.ones((h, w)), jnp.broadcast_to(
            dx.astype(jnp.float32), (h, w)), jnp.broadcast_to(
            dy.astype(jnp.float32), (h, w))]
        if nf:
            f_q = _shift(features, dy, dx, R)
            diff = f_q - features
            x_parts.extend([diff[..., i] for i in range(nf)])
        x = jnp.stack(x_parts, axis=-1)                       # (h,w,d)
        A = A + wgt[..., None, None] * (x[..., :, None] * x[..., None, :])
        b = b + wgt[..., None, None] * (x[..., :, None] * y_q[..., None, :])
        return (A, b), None

    A0 = jnp.zeros((h, w, d, d))
    b0 = jnp.zeros((h, w, d, 3))
    (A, b), _ = jax.lax.scan(body, (A0, b0), offs)
    A = A + jnp.eye(d) * 1e-4                                # ridge guard
    beta = jnp.linalg.solve(A, b)                            # (h,w,d,3)
    return beta[..., 0, :]                                   # center eval


def nfor_denoise(color_a, color_b, color_var, features_a, features_b,
                 features_var):
    """Full NFOR pipeline.  colors (H,W,3); features (H,W,NF) scalar
    channels (albedo splits into 3), or None."""
    color_a = jnp.asarray(color_a)
    color_b = jnp.asarray(color_b)
    color_var = jnp.asarray(color_var)
    color = 0.5 * (color_a + color_b)

    # 1. feature cross-prefiltering (denoiser.cpp:43-53)
    if features_a is not None:
        fa = jnp.asarray(features_a)
        fb = jnp.asarray(features_b)
        fv = jnp.asarray(features_var)
        filt_a = []
        filt_b = []
        for i in range(fa.shape[-1]):
            a, bq, v = fa[..., i:i + 1], fb[..., i:i + 1], fv[..., i]
            filt_a.append(nl_means(a, bq[..., 0], v, 3, 5, 0.5, 2.0))
            filt_b.append(nl_means(bq, a[..., 0], v, 3, 5, 0.5, 2.0))
        feat_a = jnp.concatenate(filt_a, axis=-1)
        feat_b = jnp.concatenate(filt_b, axis=-1)
    else:
        feat_a = feat_b = None

    # 2. regression passes at k = 0.5, 1.0 (denoiser.cpp:56-84)
    filtered_a, filtered_b, mses = [], [], []
    for k in (0.5, 1.0):
        fca = collaborative_regression(color_a, color_b, feat_b,
                                       color_var, 3, 9, k)
        fcb = collaborative_regression(color_b, color_a, feat_a,
                                       color_var, 3, 9, k)
        mse_a = (color_b - fca) ** 2 - 2.0 * color_var
        mse_b = (color_a - fcb) ** 2 - 2.0 * color_var
        resid = (fcb - fca) ** 2 * 0.25
        noisy_mse = 0.5 * (mse_a + mse_b) - resid
        filtered_a.append(fca)
        filtered_b.append(fcb)
        mses.append(nl_means(noisy_mse, color, color_var, 1, 9, 1.0))

    # 3. bandwidth selection (denoiser.cpp:88-103)
    noisy_sel = (mses[0] >= mses[1]).astype(jnp.float32)
    sel = jnp.clip(nl_means(noisy_sel, color, color_var, 1, 9, 1.0),
                   0.0, 1.0)
    result_a = filtered_a[0] * (1 - sel) + filtered_a[1] * sel
    result_b = filtered_b[0] * (1 - sel) + filtered_b[1] * sel

    # 4. second filter pass (denoiser.cpp:107-133)
    if feat_a is not None:
        final_feats = []
        for i in range(feat_a.shape[-1]):
            comb = 0.5 * (feat_a[..., i:i + 1] + feat_b[..., i:i + 1])
            comb_var = (feat_b[..., i] - feat_a[..., i]) ** 2 * 0.25
            final_feats.append(nl_means(comb, comb[..., 0], comb_var,
                                        3, 2, 0.5))
        final_feat = jnp.concatenate(final_feats, axis=-1)
    else:
        final_feat = None
    comb = 0.5 * (result_a + result_b)
    comb_var = (result_b - result_a) ** 2 * 0.25
    out = collaborative_regression(comb, comb, final_feat,
                                   comb_var, 3, 9, 1.0)
    return np.asarray(jnp.maximum(out, 0.0))


def main(argv=None):
    """CLI: denoise a render directory containing the two-buffer AOV
    outputs (colorA/colorB/variance + albedo/normal/depth halves)."""
    import argparse
    from tungsten_tpu.io import image as im
    ap = argparse.ArgumentParser(description="NFOR denoiser")
    ap.add_argument("color_a")
    ap.add_argument("color_b")
    ap.add_argument("--variance", default=None)
    ap.add_argument("--features-a", nargs="*", default=[])
    ap.add_argument("--features-b", nargs="*", default=[])
    ap.add_argument("--feature-vars", nargs="*", default=[])
    ap.add_argument("-o", "--output", default="denoised.pfm")
    args = ap.parse_args(argv)

    ca = im.load_hdr(args.color_a)
    cb = im.load_hdr(args.color_b)
    if args.variance:
        cv = im.load_hdr(args.variance)
    else:
        cv = (cb - ca) ** 2 * 0.25
    fa = fb = fv = None
    if args.features_a:
        fa = np.concatenate([np.atleast_3d(im.load_hdr(p))
                             for p in args.features_a], axis=-1)
        fb = np.concatenate([np.atleast_3d(im.load_hdr(p))
                             for p in args.features_b], axis=-1)
        if args.feature_vars:
            fv = np.concatenate([np.atleast_3d(im.load_hdr(p))
                                 for p in args.feature_vars], axis=-1)
        else:
            fv = (fb - fa) ** 2 * 0.25
    out = nfor_denoise(ca, cb, cv, fa, fb, fv)
    im.save_hdr(args.output, out)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
