"""tungsten_tpu — a TPU-native differentiable physically-based renderer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
Tungsten (a C++ CPU path tracer).  Scene JSON compatible with Tungsten's
format; compute path is a wavefront path tracer over SoA ray batches,
sharded across TPU meshes, differentiable w.r.t. material/emitter params.

Layering (bottom-up):
  utils/       math + stateless counter RNG
  io/          host-side readers/writers (wo3, obj, hdr/exr/png, zip scenes)
  scene/       JSON parse -> host SceneDesc -> FlatScene device pytree + BVH
  bsdf/        material eval/sample/pdf, switch-indexed over a param table
  cameras/     ray generation, reconstruction filters, tonemaps
  ops/         Pallas TPU kernels + jnp reference implementations
  integrators/ wavefront path tracer (and friends)
  parallel/    jax.sharding meshes, framebuffer psum, ray rebalancing
"""

__version__ = "0.1.0"

from tungsten_tpu.scene.parse import load_scene  # noqa: F401
