"""Device-side debug assertions (SURVEY §2.1 Debug row: the reference's
DEBUG-build asserts + enableConsistencyChecks, src/core/Debug.hpp).

JAX/XLA has no device asserts in compiled code; the TPU-native
equivalent is `jax.experimental.checkify`: functionalized error state
threaded through the jitted program, reported after the fact.  This
module wraps the wavefront tracer with (a) automatic float checks
(NaN/inf from any op) and (b) explicit transport invariants, the same
ones the reference guards: non-negative radiance and finite
throughput (ref PathTracer.cpp:119-122's NaN scrub + consistency
checks).  Cost: one extra pass of error-flag plumbing — opt-in, not on
the hot path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked_trace(scene, settings, pixel, sample_idx, seed,
                  float_checks: bool = True):
    """Run trace_wave under checkify; returns (err, radiance).

    err.get() is None when every sample satisfied the invariants;
    otherwise it carries the first failed check's message (device-side
    detection, host-side report — the functional analog of the
    reference's FAIL/ASSERT macros)."""
    from tungsten_tpu.integrators.path_tracer import trace_wave

    errors = checkify.user_checks
    if float_checks:
        errors = errors | checkify.float_checks

    def traced(pixel, sample_idx):
        rad = trace_wave(scene, settings, pixel, sample_idx,
                         jnp.uint32(seed))
        checkify.check(jnp.all(rad > -1e-5),
                       "negative radiance in wavefront output")
        return rad

    f = checkify.checkify(traced, errors=errors)
    return jax.jit(f)(pixel, sample_idx)
