"""Debug the photon-map/PT brightness mismatch on the fog fixture."""
import numpy as np
from dataclasses import replace

from tests.conftest import *  # noqa: F401,F403  (forces cpu platform)
from tests.test_photon_volume import _fog_scene
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.render import render

scene, settings = flatten_scene(_fog_scene())
img_pm = np.asarray(render(scene, settings, spp=2))
s_pt = replace(settings, integrator_type="path_tracer")
img_pt = np.asarray(render(scene, s_pt, spp=48))
ratio = img_pm.mean() / max(img_pt.mean(), 1e-9)
print("pm mean", img_pm.mean(), "pt mean", img_pt.mean(), "ratio", ratio)

# split: volume march contribution vs surface gather, by rendering with
# media disabled paths? cheaper: rerun photon render with vgrid off via
# monkeypatch
import tungsten_tpu.integrators.photon_map as PM
orig = PM._volume_march
PM._volume_march = lambda *a, **k: orig(*a, **k) * 0.0
img_pm_novol = np.asarray(render(scene, settings, spp=2))
PM._volume_march = orig
print("pm no-vol mean", img_pm_novol.mean(),
      "vol share", (img_pm.mean() - img_pm_novol.mean()) / img_pm.mean())

# row means: top rows are fog-only (above lamp), bottom rows see floor
h = img_pm.shape[0]
for name, im in (("pm", img_pm), ("pm_novol", img_pm_novol), ("pt", img_pt)):
    rows = im.mean(axis=(1, 2))
    print(name, " ".join(f"{r:.3f}" for r in rows[:: max(h // 8, 1)]))
