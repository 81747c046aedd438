"""Light sampling consistency: envmap importance sampling must integrate
to the analytic integral, and pdf() must match the sample distribution."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.integrators import lights as L
from tungsten_tpu.utils import rng


def _env_scene(img):
    import tempfile, os
    from tungsten_tpu.io.image import save_hdr
    d = tempfile.mkdtemp()
    save_hdr(os.path.join(d, "env.pfm"), img)
    desc = SceneDesc(
        path=os.path.join(d, "scene.json"), json={},
        bsdfs=[{"name": "n", "type": "null"}],
        primitives=[{"type": "infinite_sphere", "emission": "env.pfm",
                     "sample": True, "bsdf_index": 0}],
        media=[], camera={"resolution": [8, 8]}, integrator={}, renderer={})
    return flatten_scene(desc)


def test_env_integral_matches():
    rs = np.random.RandomState(0)
    h, w = 32, 64
    img = (rs.rand(h, w, 3) ** 2 * 3.0).astype(np.float32)
    # a bright hot spot to stress importance sampling
    img[5:8, 10:14] = 50.0
    scene, _ = _env_scene(img)

    n = 200000
    u1 = np.asarray(rng.random_1d(9, jnp.arange(n), 0, 0))
    u2 = np.asarray(rng.random_1d(9, jnp.arange(n), 0, 1))
    d, radiance, pdf = L.env_sample(scene, jnp.asarray(u1), jnp.asarray(u2))
    d, radiance, pdf = map(np.asarray, (d, radiance, pdf))
    est = (radiance / np.maximum(pdf, 1e-20)[:, None]).mean(axis=0)

    # analytic: sum over texels of bilinear-mean radiance * solid angle.
    # texel solid angle = (2pi/w)*(pi/h)*sin(theta)
    theta = (np.arange(h) + 0.5) * np.pi / h  # image row 0 = theta ~ pi (up)
    w_sa = (2 * np.pi / w) * (np.pi / h) * np.sin(theta)
    ref = (img * w_sa[:, None, None]).sum(axis=(0, 1))
    rel = np.abs(est - ref) / ref
    assert rel.max() < 0.03, (est, ref)

    # pdf() at sampled directions must match the sample's own pdf
    pdf2 = np.asarray(L.env_pdf(scene, jnp.asarray(d)))
    rel_pdf = np.abs(pdf2 - pdf) / np.maximum(pdf, 1e-8)
    # texel-boundary crossings cause a small fraction of mismatches
    assert np.percentile(rel_pdf, 90) < 1e-3


def test_env_uv_roundtrip():
    rs = np.random.RandomState(1)
    img = rs.rand(8, 16, 3).astype(np.float32)
    scene, _ = _env_scene(img)
    d = rs.randn(1000, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    uv, sin_t = L.env_direction_to_uv(scene, d)
    d2, _ = L.env_uv_to_direction(scene, uv)
    assert np.abs(np.asarray(d2) - np.asarray(d)).max() < 1e-4
