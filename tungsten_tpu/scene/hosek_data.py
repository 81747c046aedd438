"""Hosek-Wilkie RGB sky-model coefficient dataset.

The fitted coefficients come from the public Hosek & Wilkie 2012
"An Analytic Model for Full Spectral Sky-Dome Radiance" reference
implementation (BSD-licensed research data; vendored by the reference
at src/thirdparty/skylight/ArHosekSkyModelData_RGB.h).  These are
published model constants — data, not code; the evaluator that
consumes them (scene/sky.py) is written from the paper's equations.

The dataset is parsed ONCE from the reference header when available
and cached as an .npz next to this module; the committed cache makes
the repo self-contained.  Layout per channel: configs
(2 albedos, 10 turbidities, 6 elevation-bezier knots, 9 params) and
radiance (2, 10, 6).
"""
from __future__ import annotations

import os
import re

import numpy as np

_CACHE = os.path.join(os.path.dirname(__file__), "hosek_rgb.npz")
_HEADER = ("/root/reference/src/thirdparty/skylight/"
           "ArHosekSkyModelData_RGB.h")


def _parse_header(path):
    text = open(path).read()
    # strip comments (they carry numbers like "// albedo 0, turbidity 1")
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    arrays = {}
    for m in re.finditer(
            r"double\s+(datasetRGB(?:Rad)?\d)\[\]\s*=\s*\{(.*?)\};",
            text, re.S):
        vals = np.array([float(x) for x in re.findall(
            r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?", m.group(2))])
        arrays[m.group(1)] = vals
    cfg = np.stack([arrays[f"datasetRGB{i}"].reshape(2, 10, 6, 9)
                    for i in (1, 2, 3)])
    rad = np.stack([arrays[f"datasetRGBRad{i}"].reshape(2, 10, 6)
                    for i in (1, 2, 3)])
    return cfg.astype(np.float64), rad.astype(np.float64)


def load_dataset():
    """Returns (configs (3,2,10,6,9), radiance (3,2,10,6)) or None when
    neither the cache nor the reference header is available."""
    if os.path.exists(_CACHE):
        d = np.load(_CACHE)
        return d["configs"], d["radiance"]
    if os.path.exists(_HEADER):
        cfg, rad = _parse_header(_HEADER)
        try:
            np.savez_compressed(_CACHE, configs=cfg, radiance=rad)
        except OSError:
            pass
        return cfg, rad
    return None
