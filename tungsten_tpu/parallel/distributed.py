"""Multi-host runtime: jax.distributed bring-up + host-aware meshes +
alive-ray rebalancing collectives.

The reference has no cluster support — its multi-machine story is
"run N seeds on N machines and hdrmanip --merge the outputs"
(ref Readme.md hdrmanip section; src/hdrmanip/hdrmanip.cpp:207-208).
The TPU-native replacement (SURVEY §2.10/§5.8) is a real multi-host
jax runtime: `jax.distributed.initialize` per process, one global mesh
over hosts x local devices, framebuffer/gradient psums riding ICI
within a slice and DCN across hosts, and `all_to_all` redistribution of
alive rays when wavefront tails go sparse (the ray-rebalancing analog
of ring/sequence parallelism, SURVEY §5.7).

Single-process use is untouched: `init_distributed()` is a no-op
without coordinator env vars and every mesh helper works on the local
devices.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Bring up the multi-host runtime.  Reads JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID (or the standard cloud-TPU
    autodetection) when args are None.  Returns True when running
    multi-process.  Safe to call more than once and in single-process
    jobs (no-op there)."""
    global _INITIALIZED
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if not coordinator or num_processes <= 1:
        return jax.process_count() > 1
    if not _INITIALIZED:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
        _INITIALIZED = True
    return True


def make_global_mesh(axis: str = "dp") -> Mesh:
    """One data-parallel mesh over every device of every host, ordered
    host-major so that the per-host device block is contiguous —
    collectives between same-host devices ride ICI, the host boundary
    crossings ride DCN (the layout `create_hybrid_device_mesh` would
    pick for a pure-DP axis)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def device_put_replicated(tree, mesh: Mesh):
    """Replicate a pytree (the FlatScene) across every mesh device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# ------------------------------------------------------------ rebalance

def _deal_permutation(R: int, ndev: int):
    """Round-robin 'deal' layout: position j*ndev+i of the sorted deck
    lands in block i slot j, so each of the ndev all_to_all blocks gets
    every ndev-th ray — an alive-sorted deck therefore splits its alive
    rays evenly across blocks."""
    B = R // ndev
    src = (np.arange(R) % B) * ndev + np.arange(R) // B
    return jnp.asarray(src, jnp.int32)


def rebalance_wave(state: dict, axis: str, ndev: int):
    """all_to_all redistribution of a wavefront across the mesh axis:
    sort local rays alive-first, deal them round-robin into per-device
    blocks, exchange.  After the exchange every device holds (to within
    one ray per sender) the same number of alive rays — idle tails on
    drained devices pick up work from busy ones (SURVEY §5.7's
    ray-rebalancing obligation).  Ray identity (pixel, sample) travels
    in the state so radiance still banks to the right pixels.  The
    wavefront width per device is unchanged; only occupancy evens out.
    Scalars (bounce, rays counters) pass through untouched."""
    R = state["alive"].shape[0]
    if ndev <= 1 or R % ndev != 0:
        return state
    order = jnp.argsort(jnp.where(state["alive"], 0, 1).astype(jnp.int32),
                        stable=True)
    deal = order[_deal_permutation(R, ndev)]

    def exchange(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == R):
            return x
        y = x[deal]
        y = y.reshape((ndev, R // ndev) + y.shape[1:])
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0,
                               tiled=False)
        return y.reshape((R,) + x.shape[1:])

    return {k: exchange(v) for k, v in state.items()}
