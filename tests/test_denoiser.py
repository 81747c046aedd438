"""NFOR denoiser: NL-means + collaborative regression units, MSE
reduction end-to-end (ref src/denoiser/)."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.tools.denoiser import (
    collaborative_regression, nfor_denoise, nl_means)


def _noisy_pair(seed=0, h=32, w=40, sigma=0.25):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    clean = np.stack([0.5 + 0.4 * np.sin(xx / 8),
                      0.3 + 0.2 * np.cos(yy / 6),
                      np.where((xx // 8 + yy // 8) % 2 == 0, 0.8, 0.2)],
                     -1).astype(np.float32)
    a = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    b = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    var = np.full(clean.shape, sigma ** 2 * 0.5, np.float32)
    return clean, a, b, var


def test_nl_means_smooths():
    clean, a, b, var = _noisy_pair()
    noisy = 0.5 * (a + b)
    out = np.asarray(nl_means(jnp.asarray(noisy), jnp.asarray(noisy),
                              jnp.asarray(var), 3, 5, 1.0))
    assert ((out - clean) ** 2).mean() < ((noisy - clean) ** 2).mean() * 0.7


def test_regression_uses_features():
    clean, a, b, var = _noisy_pair()
    feat = jnp.asarray(clean[..., 2:3])  # perfect edge feature
    out = np.asarray(collaborative_regression(
        jnp.asarray(a), jnp.asarray(b), feat, jnp.asarray(var), 3, 5, 1.0))
    # edges preserved: checkerboard channel stays sharp
    err = ((out - clean) ** 2).mean()
    assert err < ((a - clean) ** 2).mean() * 0.3


def test_nfor_reduces_mse():
    clean, a, b, var = _noisy_pair(h=40, w=48)
    rng = np.random.default_rng(7)
    feat = clean[..., 2:3]
    fa = feat + rng.normal(0, 0.05, feat.shape).astype(np.float32)
    fb = feat + rng.normal(0, 0.05, feat.shape).astype(np.float32)
    fv = np.full(feat.shape, 0.0025, np.float32)
    out = nfor_denoise(a, b, var, fa, fb, fv)
    mse_in = ((0.5 * (a + b) - clean) ** 2).mean()
    mse_out = ((out - clean) ** 2).mean()
    assert mse_out < mse_in * 0.5


def test_render_denoise_buffers():
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.render import render_denoise_buffers
    desc = SceneDesc(
        path="/tmp/dn.json", json={},
        bsdfs=[{"name": "w", "type": "lambert", "albedo": 0.7}],
        primitives=[
            {"type": "quad", "bsdf_index": 0, "transform": {"scale": 4.0}},
            {"type": "quad", "bsdf_index": 0, "emission": 10.0,
             "transform": {"position": [0, 3, 0], "scale": 1.0,
                           "rotation": [180, 0, 0]}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [16, 16],
                "transform": {"position": [0, 1.5, -4],
                              "look_at": [0, 1, 0], "up": [0, 1, 0]}},
        integrator={"max_bounces": 3}, renderer={"spp": 4})
    flat, settings = flatten_scene(desc)
    bufs = render_denoise_buffers(flat, settings, spp=4)
    assert bufs["color_a"].shape == (16, 16, 3)
    assert bufs["feat_a"].shape == (16, 16, 7)  # albedo3+normal3+depth
    assert np.isfinite(bufs["color_var"]).all()
    out = nfor_denoise(bufs["color_a"], bufs["color_b"],
                       bufs["color_var"], bufs["feat_a"], bufs["feat_b"],
                       bufs["feat_var"])
    assert np.isfinite(out).all() and out.shape == (16, 16, 3)
