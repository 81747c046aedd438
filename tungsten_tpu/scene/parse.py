"""Host-side scene parsing: Tungsten scene JSON -> SceneDesc.

Mirrors the reference's Scene::fromJson object-graph semantics
(ref: src/core/io/Scene.cpp:64-146,236-252,378-391):
  * top-level lists: media, bsdfs, primitives; plus camera / integrator /
    renderer blocks
  * a "bsdf"/"medium"/... field may be a string (named reference into the
    top-level list) or an inline object
  * resource paths are relative to the scene file's directory
  * scenes may be zip-packaged (a `.zip` containing scene.json) — the
    reference mounts archives transparently (src/core/io/FileUtils.cpp:83).

SceneDesc keeps everything as plain dicts/numpy on the host; flatten.py
turns it into device arrays.
"""
from __future__ import annotations

import json
import os
import zipfile
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


@dataclass
class SceneDesc:
    path: str
    json: dict
    bsdfs: list          # resolved bsdf dicts (named ones, in order)
    primitives: list     # primitive dicts with "bsdf" resolved to index/dict
    media: list
    camera: dict
    integrator: dict
    renderer: dict
    resources: dict = field(default_factory=dict)  # path -> loaded resource

    def resolve_path(self, rel) -> str:
        return os.path.join(os.path.dirname(self.path), str(rel))


class _Resolver:
    """Resolves string references against a named top-level object list and
    appends inline objects, like Scene::fetchBsdf / fetchMedium."""

    def __init__(self, objects: list, kind: str):
        self.objects = list(objects)
        self.by_name = {o["name"]: i for i, o in enumerate(self.objects) if "name" in o}
        self.kind = kind

    def resolve(self, value) -> Optional[int]:
        if value is None:
            return None
        if isinstance(value, str):
            if value not in self.by_name:
                raise KeyError(f"unknown {self.kind} reference: {value!r}")
            return self.by_name[value]
        if isinstance(value, dict):
            # Inline object: append as an anonymous entry.
            self.objects.append(value)
            return len(self.objects) - 1
        raise TypeError(f"bad {self.kind} reference: {value!r}")


class SceneParseError(ValueError):
    """Scene JSON parse failure carrying file, line, column, and byte
    offset (ref JsonDocument's error-located parse exceptions,
    io/JsonDocument.cpp)."""


def _parse_json_located(text: str, path: str) -> dict:
    try:
        return json.loads(text)
    except json.JSONDecodeError as e:
        raise SceneParseError(
            f"{path}:{e.lineno}:{e.colno} (byte offset {e.pos}): "
            f"{e.msg}") from e


def _read_scene_json(path: str) -> tuple[str, dict]:
    """Read scene JSON from a file or a zip package containing one.
    Parse failures raise SceneParseError with file:line:column and the
    byte offset."""
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            candidates = [n for n in zf.namelist() if n.endswith("scene.json")]
            if not candidates:
                candidates = [n for n in zf.namelist() if n.endswith(".json")]
            name = sorted(candidates, key=len)[0]
            data = _parse_json_located(zf.read(name).decode("utf-8"),
                                       f"{path}!{name}")
            # Extract package next to the zip so resource paths resolve.
            root = path + ".extracted"
            zf.extractall(root)
            return os.path.join(root, name), data
    with open(path, "r") as f:
        return path, _parse_json_located(f.read(), path)


def load_scene(path) -> SceneDesc:
    path = str(path)
    path, data = _read_scene_json(path)

    bsdfs = _Resolver(data.get("bsdfs", []), "bsdf")
    media = _Resolver(data.get("media", []), "medium")

    primitives = []
    for prim in data.get("primitives", []):
        prim = dict(prim)
        prim["bsdf_index"] = bsdfs.resolve(prim.get("bsdf"))
        prim["int_medium_index"] = media.resolve(prim.get("int_medium"))
        prim["ext_medium_index"] = media.resolve(prim.get("ext_medium"))
        # instances carry nested master primitive dicts (ref Instance::
        # fromJson "masters") whose bsdf refs resolve the same way
        if prim.get("type") == "instances":
            prim["masters"] = [dict(m) for m in prim.get("masters", [])]
            for m in prim["masters"]:
                m["bsdf_index"] = bsdfs.resolve(m.get("bsdf"))
        primitives.append(prim)

    # Media and bsdfs may themselves reference others (smooth_coat substrate,
    # mixed children).  Resolve those to indices too.
    def resolve_nested(objs, resolver, keys):
        i = 0
        while i < len(resolver.objects):  # list may grow while iterating
            o = resolver.objects[i]
            for k in keys:
                if k in o:
                    o[k + "_index"] = resolver.resolve(o[k])
            i += 1

    resolve_nested(bsdfs.objects, bsdfs, ["substrate", "bsdf0", "bsdf1", "base"])

    camera = dict(data.get("camera", {}))
    camera.setdefault("type", "pinhole")
    camera["medium_index"] = media.resolve(camera.get("medium"))

    integrator = dict(data.get("integrator", {}))
    integrator.setdefault("type", "path_tracer")

    renderer = dict(data.get("renderer", {}))

    return SceneDesc(
        path=path,
        json=data,
        bsdfs=bsdfs.objects,
        primitives=primitives,
        media=media.objects,
        camera=camera,
        integrator=integrator,
        renderer=renderer,
    )
