"""Multi-chip rendering: pixels x spp data-parallel over a jax Mesh.

The reference's parallelism is tile data-parallelism on a thread pool
(ref: src/core/integrators/path_tracer/PathTraceIntegrator.cpp:27-42,
220-239) plus manual multi-machine seed-splitting merged by
`hdrmanip --merge`.  The TPU-native design shards the pixel wavefront
across chips with shard_map: the flattened scene is replicated, each
device traces its pixel shard, and per-device framebuffer partials need
no collective until the final gather (tiles own disjoint pixels, exactly
like the reference's tile ownership).  Determinism: the RNG is keyed on
(pixel, sample), so any mesh shape produces bitwise-identical samples.

The differentiable path psums parameter gradients across the mesh — the
DP-gradient pattern from BASELINE.json's north star.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


from tungsten_tpu.integrators.path_tracer import trace_wave, trace_wave_diff


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _mesh_inputs(scene, mesh: Mesh, axis: str, n: int):
    """Pixel-index array + scene, placed for the mesh.  Single-process
    meshes pass plain arrays through; a multi-process mesh needs GLOBAL
    arrays (jax.make_array_from_callback) — host-local inputs deadlock
    the collectives (round-3 bring-up hit exactly this)."""
    from jax.sharding import NamedSharding, PartitionSpec
    if jax.process_count() <= 1:
        return jnp.arange(n, dtype=jnp.uint32), scene
    pix = np.arange(n, dtype=np.uint32)
    pixels = jax.make_array_from_callback(
        (n,), NamedSharding(mesh, PartitionSpec(axis)),
        lambda idx: pix[idx])
    rep = NamedSharding(mesh, PartitionSpec())
    scene = jax.tree.map(
        lambda x: jax.make_array_from_callback(
            jnp.shape(x), rep, lambda idx, x=x: np.asarray(x)[idx])
        if hasattr(x, "shape") else x, scene)
    return pixels, scene


def render_pass_sharded(scene, settings, mesh: Mesh, sample_start=0, seed=0,
                        spp_chunk: int = 1, axis: str = "dp"):
    """Render spp_chunk samples for every pixel, pixels sharded over the
    mesh; returns ((H, W, 3) radiance sum, total rays traced)."""
    w, h = settings.width, settings.height
    n = w * h
    ndev = mesh.devices.size
    pad = (-n) % ndev
    pixels, scene = _mesh_inputs(scene, mesh, axis, n + pad)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    def shard_fn(pixel_shard):
        acc = jnp.zeros(pixel_shard.shape + (3,))
        rays = jnp.int32(0)

        def body(i, carry):
            acc, rays = carry
            rad, r = trace_wave(
                scene, settings, pixel_shard,
                jnp.full(pixel_shard.shape, sample_start + i, jnp.uint32),
                jnp.uint32(seed), with_stats=True)
            rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
            return acc + rad, rays + r

        acc, rays = jax.lax.fori_loop(0, spp_chunk, body, (acc, rays))
        # rays: reduce across devices so callers see the global count
        return acc, jax.lax.psum(rays, axis)

    acc, rays = jax.jit(shard_fn)(pixels)
    return acc[:n].reshape(h, w, 3), rays


def render_pass_sharded_staged(scene, settings, mesh: Mesh,
                               sample_start=0, seed=0, spp_chunk: int = 1,
                               axis: str = "dp", segment: int = 4,
                               rebalance: bool = True):
    """Sharded render with the staged-wavefront treatment: the bounce
    loop runs in segments; between segments the alive rays are
    redistributed across the mesh with all_to_all (deal-rebalance,
    parallel/distributed.py) so drained devices pick up the busy
    devices' tails instead of idling — the multi-chip analog of the
    single-chip width schedule in render.py.  The loop exits when the
    GLOBAL wavefront is extinct (psum'd alive count), not per device.

    Because rays migrate between devices, every device banks radiance
    into a full-frame buffer and the partials psum at the end — the
    deterministic splat-merge pattern (SURVEY §2.10).
    Returns ((H, W, 3) radiance sum, total rays traced)."""
    from tungsten_tpu.integrators.path_tracer import (
        bank_emission, init_wave, run_bounces)
    from tungsten_tpu.parallel.distributed import rebalance_wave

    w, h = settings.width, settings.height
    n = w * h
    ndev = mesh.devices.size
    pad = (-n) % ndev
    pixels, scene = _mesh_inputs(scene, mesh, axis, n + pad)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(pixel_shard):
        fb = jnp.zeros((n, 3))
        rays = jnp.int32(0)

        def spp_body(i, carry):
            fb, rays = carry
            state = init_wave(
                scene, settings, pixel_shard,
                jnp.full(pixel_shard.shape, sample_start + i, jnp.uint32),
                jnp.uint32(seed))

            def seg_cond(s):
                alive = jax.lax.psum(
                    jnp.sum(s["alive"].astype(jnp.int32)), axis)
                return (s["bounce"] < settings.max_bounces) & (alive > 0)

            def seg_body(s):
                s = run_bounces(scene, settings, jnp.uint32(seed), s,
                                s["bounce"] + segment)
                if rebalance:
                    s = rebalance_wave(s, axis, ndev)
                return s

            state = jax.lax.while_loop(seg_cond, seg_body, state)
            return fb + bank_emission(state, n), rays + state["rays"]

        fb, rays = jax.lax.fori_loop(0, spp_chunk, spp_body, (fb, rays))
        return jax.lax.psum(fb, axis), jax.lax.psum(rays, axis)

    fb, rays = jax.jit(shard_fn)(pixels)
    return fb[:n].reshape(h, w, 3), rays


def measure_scaling(scene, settings, device_counts, spp: int = 1,
                    seed: int = 0, staged: bool = True):
    """Rays/s scaling efficiency over mesh sizes (the north-star gate:
    >= 80% rays/s efficiency at N >= 2).  Returns {n_devices: {rays,
    seconds, mrays_per_s, efficiency}} with efficiency relative to the
    smallest mesh's per-device throughput."""
    import time

    results = {}
    base_per_dev = None
    for nd in device_counts:
        mesh = make_mesh(nd)
        fn = render_pass_sharded_staged if staged else render_pass_sharded
        img, rays = fn(scene, settings, mesh, seed=seed, spp_chunk=spp)
        np.asarray(img)  # sync
        t0 = time.time()
        img, rays = fn(scene, settings, mesh, seed=seed, spp_chunk=spp)
        np.asarray(img)
        dt = time.time() - t0
        mrps = int(rays) / dt / 1e6
        per_dev = mrps / nd
        if base_per_dev is None:
            base_per_dev = per_dev
        results[nd] = {
            "rays": int(rays), "seconds": dt, "mrays_per_s": mrps,
            "efficiency": per_dev / base_per_dev,
        }
    return results


def train_step_sharded(scene, settings, mesh: Mesh, param_fn, loss_fn,
                       params, sample_start=0, seed=0, axis: str = "dp"):
    """One differentiable render step: pixels sharded over the mesh,
    parameter gradients psum-all-reduced (the DP gradient path).

    param_fn(scene, params) -> scene with params substituted in
    loss_fn(image (N,3) shard, pixel_idx) -> scalar partial loss
    Returns (loss, grads) with grads replicated across devices.
    """
    w, h = settings.width, settings.height
    n = w * h
    ndev = mesh.devices.size
    pad = (-n) % ndev
    pixels = jnp.arange(n + pad, dtype=jnp.uint32)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_fn(pixel_shard, params):
        def local_loss(params):
            sc = param_fn(scene, params)
            rad = trace_wave_diff(
                sc, settings, pixel_shard,
                jnp.full(pixel_shard.shape, sample_start, jnp.uint32),
                jnp.uint32(seed))
            return loss_fn(rad, pixel_shard)

        loss, grads = jax.value_and_grad(local_loss)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        return loss, grads

    return jax.jit(shard_fn)(pixels, params)
