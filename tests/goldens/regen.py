#!/usr/bin/env python
"""Regenerate golden PFMs with the ORIGINAL Tungsten binary.

Provenance: every golden in this directory is produced by this script
running the reference renderer (tunabrain/tungsten, built from
/root/reference with CMake Release; see VERDICT r1 item 7).  Usage:

    cmake -S /root/reference -B /tmp/tungsten_build -DCMAKE_BUILD_TYPE=Release
    make -C /tmp/tungsten_build -j tungsten
    python tests/goldens/regen.py [--bin /tmp/tungsten_build/tungsten]

Each fixture scene is copied to a temp dir, patched to 128x72 and the
golden spp, rendered with the reference's default seed (0xBA5EBA11,
ref src/tungsten/Shared.hpp:246), and the HDR output is converted to PFM
here.  Scene-relative resources are resolved by copying the whole scene
directory.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = "/root/reference/data"

# (golden name, scene path, spp, extra renderer/integrator patches)
GOLDENS = [
    ("materialtest_128x72_512spp.pfm",
     f"{DATA}/materialtest/materialtest.json", 512, {}),
    ("cornell_128x72_512spp.pfm",
     f"{DATA}/example-scenes/cornell-box/scene.json", 512, {}),
    ("nonexp_128x72_512spp.pfm",
     f"{DATA}/example-scenes/non-exponential/scene.json", 512, {}),
    ("volcaustic_128x72_512spp.pfm",
     f"{DATA}/example-scenes/volumetric-caustic/scene.json", 512, {}),
    # NOTE: the reference's progressive_photon_map SEGFAULTS on this
    # toolchain (reproduced: /tmp/tungsten_build/tungsten --threads 1
    # on the stock scene dies in the first PPM iteration), so the
    # photon-gather golden uses the plain photon_map integrator on the
    # same scene; our PPM is gated against it + the radius-schedule
    # unit tests.  The photon_map run is ALSO flaky under python
    # subprocess (thread race in the photon pass, ~100% repro via
    # subprocess.run, ~0% from an interactive shell) — the committed
    # golden was produced by the equivalent shell invocation:
    #   cd <copy of water-caustic with the patches below> &&
    #   tungsten --seed 3126770193 scene.json && cp out.pfm ...
    ("watercaustic_pm_128x72_16spp.pfm",
     f"{DATA}/example-scenes/water-caustic/scene.json", 16,
     {"@integrator": {"type": "photon_map", "photon_count": 1000000}}),
    # the reference checkout ships no curl.fiber: gen_assets.py
    # synthesizes a deterministic stand-in wig (written by this repo's
    # own .fiber writer, read natively by the reference binary,
    # CurveIO.cpp:210-452) into the work dir before rendering
    # subsample=0: the scene's "subsample": 0.5 drops a renderer-
    # specific random half of the 900 strands — both renderers must
    # draw the full set for images to be comparable
    ("hair_128x72_256spp.pfm",
     f"{DATA}/example-scenes/hair/scene.json", 256,
     {"@curves": {"subsample": 0.0}}),
]


def regen(bin_path, name, scene_path, spp, patches, width=128, height=72):
    src_dir = os.path.dirname(scene_path)
    with tempfile.TemporaryDirectory() as tmp:
        work = os.path.join(tmp, "scene")
        shutil.copytree(src_dir, work)
        if "hair" in name:
            import gen_assets
            gen_assets.main(work)
        sp = os.path.join(work, os.path.basename(scene_path))
        with open(sp) as f:
            desc = json.load(f)
        desc["camera"]["resolution"] = [width, height]
        r = desc.setdefault("renderer", {})
        r["spp"] = spp
        r["output_file"] = "out.pfm"
        r["hdr_output_file"] = "out.pfm"
        r["adaptive_sampling"] = False
        r["checkpoint_interval"] = "0"
        r["enable_resume_render"] = False
        for k, v in patches.items():
            if k == "@integrator":
                desc.setdefault("integrator", {}).update(v)
            elif k == "@curves":
                for prim in desc.get("primitives", []):
                    if prim.get("type") == "curves":
                        prim.update(v)
            else:
                r[k] = v
        with open(sp, "w") as f:
            json.dump(desc, f)
        # photon-map builds in the reference occasionally crash in the
        # first iteration on this 2-core box (thread-pool race) — retry
        for attempt in range(4):
            r = subprocess.run([bin_path, "--seed", str(0xBA5EBA11),
                                os.path.basename(sp)],
                               cwd=work,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.STDOUT)
            if r.returncode == 0:
                break
            print(f"  attempt {attempt}: rc={r.returncode}, retrying",
                  file=sys.stderr)
        else:
            raise RuntimeError(f"renderer kept crashing (rc={r.returncode})")
        out = os.path.join(work, "out.pfm")
        if not os.path.exists(out):
            raise RuntimeError(f"{name}: renderer produced no out.pfm")
        shutil.copy(out, os.path.join(HERE, name))
        print(f"wrote {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bin", default="/tmp/tungsten_build/tungsten")
    ap.add_argument("--only", default=None,
                    help="substring filter on golden name")
    args = ap.parse_args()
    for name, scene, spp, patches in GOLDENS:
        if args.only and args.only not in name:
            continue
        try:
            regen(args.bin, name, scene, spp, patches)
        except Exception as e:
            print(f"FAILED {name}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
