#!/usr/bin/env python
"""Headline benchmark: forward path tracing throughput on materialtest.

BASELINE.json config[0]: materialtest.json with the BSDF set reduced to
lambert + mirror, 256x256 @ 16 spp, fixed seed.  Metric: Mrays/s/chip
(all traced rays: primary + continuation + shadow + MIS rays), target
>= 100 (vs_baseline = value / 100).

Prints exactly one JSON line.
"""
import json
import sys
import time


def simplified_bsdfs(bsdfs):
    """Reduce the BSDF set to lambert + mirror per config[0]: mirror-like
    types stay mirror, lambert keeps its albedo, and every OTHER type
    becomes lambert with the 0.8 fallback albedo (the same fallback
    already used for unsupported textures).  Carrying a coated
    material's albedo=1 into a perfect-white lambert is both a bad
    approximation (the coat absorbs) and non-terminating: albedo-1.0
    diffuse cavities keep ~1.7% of paths alive to max_bounces because
    Russian roulette (ref PathTracer.cpp:111-117) never fires at
    throughput 1."""
    mirror_types = {"mirror", "conductor", "rough_conductor"}
    out = []
    for b in bsdfs:
        nb = {"name": b.get("name", ""), "albedo": b.get("albedo", 0.8)}
        if b.get("type") in mirror_types:
            nb["type"] = "mirror"
        else:
            nb["type"] = "lambert"
            if b.get("type") != "lambert":
                nb["albedo"] = 0.8
        if isinstance(nb["albedo"], dict) and nb["albedo"].get("type") not in (
                "checker", "constant"):
            nb["albedo"] = 0.8
        out.append(nb)
    return out


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import numpy as np
    from dataclasses import replace

    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.render import render

    scene_path = "/root/reference/data/materialtest/materialtest.json"
    desc = load_scene(scene_path)
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    from tungsten_tpu.ops import intersect as isect
    isect.enable_pallas_if_suitable(flat)
    settings = replace(settings, width=256, height=256,
                       seed=0xBA5EBA11, max_bounces=64)

    spp = 16
    value = 0.0
    try:
        # warmup / compile: MUST cover the same wavefront widths as the
        # timed run (the spp-batched wave + every compaction width) —
        # i.e. the SAME spp_chunk, or the timed region pays the
        # multi-minute remote compiles (this exact mismatch produced
        # the 0.02 Mrays/s in BENCH_r02)
        render(flat, settings, spp=spp, spp_chunk=spp)
        img, stats = render(flat, settings, spp=spp, spp_chunk=spp,
                            return_stats=True)
        if bool(np.isfinite(img).all() and img.mean() > 0):
            value = stats["mrays_per_s"]
    except Exception as e:
        print(f"full-size bench failed ({type(e).__name__}), trying small",
              file=sys.stderr)
        try:
            small = replace(settings, width=128, height=128)
            render(flat, small, spp=1, spp_chunk=1)
            img, stats = render(flat, small, spp=4, spp_chunk=4,
                                return_stats=True)
            if bool(np.isfinite(img).all() and img.mean() > 0):
                value = stats["mrays_per_s"]
        except Exception:
            pass
    print(json.dumps({
        "metric": "materialtest_fwd_Mrays_per_s_per_chip",
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
