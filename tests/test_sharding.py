"""Multi-device sharding: determinism across mesh shapes + gradient psum.

The (pixel, sample)-keyed RNG means any sharding of the same pixels must
produce bitwise-identical images (SURVEY §4 point 5).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from tungsten_tpu.scene.flatten import load_flat_scene
from tungsten_tpu.parallel.sharded import (
    make_mesh, render_pass_sharded, train_step_sharded)

SCENE_PATH = "/root/reference/data/example-scenes/cornell-box/scene.json"


@pytest.fixture(scope="module")
def cornell():
    scene, settings = load_flat_scene(SCENE_PATH)
    return scene, replace(settings, width=32, height=16, max_bounces=3)


def test_bitwise_deterministic_across_mesh_shapes(cornell):
    scene, settings = cornell
    imgs = []
    for ndev in (1, 2, 8):
        mesh = make_mesh(ndev)
        img, rays = render_pass_sharded(scene, settings, mesh, spp_chunk=2)
        imgs.append(np.asarray(img))
    assert np.array_equal(imgs[0], imgs[1])
    assert np.array_equal(imgs[0], imgs[2])


def test_sharded_matches_single_device(cornell):
    scene, settings = cornell
    from tungsten_tpu.integrators.path_tracer import trace_wave
    n = settings.width * settings.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    ref = np.asarray(trace_wave(scene, settings, pixel,
                                jnp.zeros(n, jnp.uint32), jnp.uint32(0)))
    ref = np.where(np.isfinite(ref), ref, 0.0)
    mesh = make_mesh(8)
    img, _ = render_pass_sharded(scene, settings, mesh, sample_start=0,
                                 seed=0, spp_chunk=1)
    assert np.allclose(np.asarray(img).reshape(-1, 3), ref, atol=1e-6)


def test_gradient_psum(cornell):
    scene, settings = cornell
    mesh = make_mesh(8)
    params = {"light_emission": scene.light_emission}
    loss, grads = train_step_sharded(
        scene, settings, mesh,
        lambda sc, p: sc.replace(**p),
        lambda rad, pix: jnp.sum(rad) / rad.shape[0],
        params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = np.asarray(grads["light_emission"])
    assert np.isfinite(g).all() and g[0].max() > 0


def test_staged_rebalanced_matches_plain(cornell):
    # the all_to_all deal-rebalance must not change the image: ray
    # identity (pixel, sample) travels with the ray and partials psum
    scene, settings = cornell
    from tungsten_tpu.parallel.sharded import render_pass_sharded_staged
    mesh = make_mesh(8)
    img_p, _ = render_pass_sharded(scene, settings, mesh, spp_chunk=2)
    img_s, rays = render_pass_sharded_staged(scene, settings, mesh,
                                             spp_chunk=2, segment=1)
    assert int(rays) > 0
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_p),
                               rtol=1e-5, atol=1e-6)


def test_rebalance_wave_balances_and_preserves():
    # after the deal-exchange each device holds an even share of alive
    # rays, and the (pixel, alive, value) multiset is globally unchanged
    from tungsten_tpu.parallel.distributed import rebalance_wave
    from jax.sharding import Mesh, PartitionSpec as P
    import functools

    ndev, per = 8, 32
    R = ndev * per
    rng = np.random.default_rng(3)
    # device i gets alive counts wildly imbalanced: device 0 all alive,
    # device 7 none
    alive = np.zeros((R,), bool)
    for i in range(ndev):
        alive[i * per:i * per + (per * (ndev - i)) // ndev] = True
    val = rng.random((R, 3)).astype(np.float32)
    pix = np.arange(R, dtype=np.uint32)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("dp",))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P("dp"),) * 3,
                       out_specs=(P("dp"),) * 3 + (P(),), check_vma=False)
    def go(alive, val, pix):
        s = dict(alive=alive, emission=val, pixel=pix,
                 bounce=jnp.int32(0))
        s = rebalance_wave(s, "dp", ndev)
        cnt = jnp.sum(s["alive"].astype(jnp.int32))
        cnts = jax.lax.all_gather(cnt, "dp")
        return s["alive"], s["emission"], s["pixel"], cnts

    a2, v2, p2, cnts = jax.jit(go)(jnp.asarray(alive), jnp.asarray(val),
                                   jnp.asarray(pix))
    cnts = np.asarray(cnts)[:, 0] if np.asarray(cnts).ndim > 1 \
        else np.asarray(cnts)
    total = int(alive.sum())
    assert int(cnts.sum()) == total
    assert cnts.max() - cnts.min() <= ndev  # even to within the deal
    # multiset preservation: every (pixel, alive, value) row survives
    order0 = np.argsort(np.asarray(pix))
    order2 = np.argsort(np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(pix)[order0],
                                  np.asarray(p2)[order2])
    np.testing.assert_array_equal(alive[order0], np.asarray(a2)[order2])
    np.testing.assert_allclose(val[order0], np.asarray(v2)[order2])
