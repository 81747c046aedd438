"""Checkpoint / resume state (ref: Integrator::saveRenderResumeData /
resumeRender, src/core/integrators/Integrator.cpp:92-162).

State = JSON header {current_spp, scene_hash} + framebuffer array.  The
scene hash covers the scene JSON minus the renderer block, exactly like
the reference, so stale state is rejected.  Because the RNG is
counter-based (pixel, sample)-keyed, resuming at sample index
`current_spp` reproduces the un-resumed render bit-exactly — no sampler
state needs saving (the reference has to serialize every tile sampler).
"""
from __future__ import annotations

import hashlib
import json
import struct

import numpy as np

MAGIC = b"TTPU_RESUME1"


def scene_hash(scene_json: dict) -> str:
    d = {k: v for k, v in scene_json.items() if k != "renderer"}
    return hashlib.sha256(
        json.dumps(d, sort_keys=True).encode()).hexdigest()


def save_resume_state(path, shash, framebuffer, current_spp) -> None:
    fb = np.ascontiguousarray(framebuffer, np.float32)
    header = json.dumps({
        "scene_hash": shash,
        "current_spp": int(current_spp),
        "shape": list(fb.shape),
    }).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(fb.tobytes())


def load_resume_state(path, shash):
    """Returns {framebuffer, current_spp} or None on mismatch."""
    try:
        with open(path, "rb") as f:
            if f.read(len(MAGIC)) != MAGIC:
                return None
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen).decode())
            if header["scene_hash"] != shash:
                return None
            fb = np.frombuffer(f.read(), dtype=np.float32).reshape(
                header["shape"]).copy()
        return {"framebuffer": fb, "current_spp": header["current_spp"]}
    except (OSError, ValueError, KeyError):
        return None
