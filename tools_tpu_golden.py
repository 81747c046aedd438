#!/usr/bin/env python
"""On-TPU golden check: the CPU test suite never exercises the Pallas
traversal (enable_pallas_if_suitable requires a TPU backend), so this
is the correctness gate for kernel changes — renders the golden
fixtures on the real chip with the wave kernel ON and applies the same
tolerances as tests/test_golden.py."""
import os
import sys

import numpy as np


def compare(scene_path, golden_name, spp=16, mean_tol=0.04, ds_tol=0.10):
    from dataclasses import replace
    from tungsten_tpu.scene.flatten import load_flat_scene
    from tungsten_tpu.render import render
    from tungsten_tpu.io.image import _load_pfm
    from tungsten_tpu.ops import intersect as isect

    scene, settings = load_flat_scene(scene_path)
    isect.enable_pallas_if_suitable(scene)
    settings = replace(settings, width=128, height=72)
    hdr = np.asarray(render(scene, settings, spp=spp, spp_chunk=spp))
    ref = _load_pfm(os.path.join(os.path.dirname(__file__),
                                 "tests/goldens", golden_name))
    mean_rel = np.abs(hdr.mean((0, 1)) - ref.mean((0, 1))) / ref.mean((0, 1))

    def ds(x):
        return x.reshape(9, 8, 16, 8, 3).mean(axis=(1, 3))
    d_rel = np.abs(ds(hdr) - ds(ref)) / (ds(ref) + 5e-2)
    ok = mean_rel.max() < mean_tol and d_rel.mean() < ds_tol
    print(f"{golden_name}: pallas={isect.USE_PALLAS} "
          f"mean_rel={mean_rel.max():.4f} (tol {mean_tol}) "
          f"ds_rel={d_rel.mean():.4f} (tol {ds_tol}) "
          f"{'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    data = "/root/reference/data"
    ok = compare(f"{data}/materialtest/materialtest.json",
                 "materialtest_128x72_512spp.pfm")
    ok &= compare(f"{data}/example-scenes/cornell-box/scene.json",
                  "cornell_128x72_512spp.pfm")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
