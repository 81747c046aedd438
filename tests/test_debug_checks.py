"""Device-side debug assertions (utils/debug.py checked_trace — the
checkify analog of the reference's DEBUG asserts / consistency checks)."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.flatten import load_flat_scene
from tungsten_tpu.utils.debug import checked_trace

SCENE = "/root/reference/data/example-scenes/cornell-box/scene.json"


def test_checked_trace_clean_scene():
    from dataclasses import replace
    scene, settings = load_flat_scene(SCENE)
    s = replace(settings, width=8, height=4, max_bounces=2, spp=0, seed=0)
    n = s.width * s.height
    err, rad = checked_trace(scene, s, jnp.arange(n, dtype=jnp.uint32),
                             jnp.zeros(n, jnp.uint32), 1,
                             float_checks=False)
    assert err.get() is None
    assert np.isfinite(np.asarray(rad)).all()


def test_checked_trace_detects_corruption():
    from dataclasses import replace
    scene, settings = load_flat_scene(SCENE)
    s = replace(settings, width=8, height=4, max_bounces=2, spp=0, seed=0)
    # corrupt an emitter to a negative radiance: the transport invariant
    # check must fire device-side and surface through err.get()
    bad = scene.replace(light_emission=scene.light_emission - 1e6)
    n = s.width * s.height
    err, _ = checked_trace(bad, s, jnp.arange(n, dtype=jnp.uint32),
                           jnp.zeros(n, jnp.uint32), 1,
                           float_checks=False)
    assert err.get() is not None
    assert "negative radiance" in str(err.get())
