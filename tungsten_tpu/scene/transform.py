"""Host-side parsing of Tungsten transform JSON into 4x4 numpy matrices.

Semantics mirror ref src/core/io/JsonPtr.cpp:108-186 exactly:
a transform object holds optional position / scale / rotation (YXZ Euler,
degrees) / look_at / up / explicit axes; axes are re-orthogonalized by
Gram-Schmidt in an order chosen by which axes were given explicitly, and
handedness is restored by flipping a non-explicit axis.  A 16-element
array is taken as a row-major matrix directly.
"""
from __future__ import annotations

import numpy as np


def _normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _random_ortho(a):
    ref = np.array([0.0, 1.0, 0.0]) if abs(a[0]) > abs(a[1]) else np.array([1.0, 0.0, 0.0])
    return _normalize(np.cross(a, ref))


def _gram_schmidt(a, b, c):
    a = _normalize(a)
    b = b - a * np.dot(a, b)
    if np.dot(b, b) < 1e-5:
        b = _random_ortho(a)
    else:
        b = _normalize(b)
    c = c - a * np.dot(a, c)
    c = c - b * np.dot(b, c)
    if np.dot(c, c) < 1e-5:
        c = np.cross(a, b)
    else:
        c = _normalize(c)
    return a, b, c


def rot_yxz(rot_deg) -> np.ndarray:
    """Tungsten's YXZ Euler rotation (degrees), ref src/core/math/Mat4f.cpp:118-131."""
    r = np.asarray(rot_deg, dtype=np.float64) * np.pi / 180.0
    c = np.cos(r)
    s = np.sin(r)
    m = np.eye(4)
    m[:3, :3] = [
        [c[1] * c[2] - s[1] * s[0] * s[2], -c[1] * s[2] - s[1] * s[0] * c[2], -s[1] * c[0]],
        [c[0] * s[2], c[0] * c[2], -s[0]],
        [s[1] * c[2] + c[1] * s[0] * s[2], -s[1] * s[2] + c[1] * s[0] * c[2], c[1] * c[0]],
    ]
    return m


def _vec3(v, default=None):
    if v is None:
        return None if default is None else np.asarray(default, dtype=np.float64)
    if isinstance(v, (int, float)):
        return np.full(3, float(v))
    return np.asarray(v, dtype=np.float64)


def parse_transform(value) -> np.ndarray:
    """Transform JSON (dict, 16-array, or None) -> 4x4 float64 matrix."""
    if value is None:
        return np.eye(4)
    if isinstance(value, (list, tuple)):
        m = np.asarray(value, dtype=np.float64)
        if m.size != 16:
            raise ValueError("matrix transform needs 16 elements")
        return m.reshape(4, 4)

    x = np.array([1.0, 0.0, 0.0])
    y = np.array([0.0, 1.0, 0.0])
    z = np.array([0.0, 0.0, 1.0])
    pos = _vec3(value.get("position"), [0.0, 0.0, 0.0])

    explicit_x = explicit_y = explicit_z = False
    if "look_at" in value:
        z = _vec3(value["look_at"]) - pos
        explicit_z = True
    if "up" in value:
        y = _vec3(value["up"])
        explicit_y = True
    if "x_axis" in value:
        x = _vec3(value["x_axis"])
        explicit_x = True
    if "y_axis" in value:
        y = _vec3(value["y_axis"])
        explicit_y = True
    if "z_axis" in value:
        z = _vec3(value["z_axis"])
        explicit_z = True

    case = (4 if explicit_z else 0) + (2 if explicit_y else 0) + (1 if explicit_x else 0)
    if case == 1:
        x, z, y = _gram_schmidt(x, z, y)
    elif case == 2:
        y, z, x = _gram_schmidt(y, z, x)
    elif case == 3:
        y, x, z = _gram_schmidt(y, x, z)
    elif case == 5:
        z, x, y = _gram_schmidt(z, x, y)
    else:  # 0, 4, 6, 7
        z, y, x = _gram_schmidt(z, y, x)

    if np.dot(np.cross(x, y), z) < 0.0:
        if not explicit_x:
            x = -x
        elif not explicit_y:
            y = -y
        else:
            z = -z

    scale = _vec3(value.get("scale"))
    if scale is not None:
        x = x * scale[0]
        y = y * scale[1]
        z = z * scale[2]

    if "rotation" in value:
        rot = rot_yxz(_vec3(value["rotation"]))[:3, :3]
        x = rot @ x
        y = rot @ y
        z = rot @ z

    m = np.eye(4)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[:3, 3] = pos
    return m


def transform_point(m, p):
    p = np.asarray(p, dtype=np.float64)
    return m[:3, :3] @ p + m[:3, 3]


def transform_points(m, pts):
    pts = np.asarray(pts, dtype=np.float64)
    return pts @ m[:3, :3].T + m[:3, 3]


def transform_vectors(m, vecs):
    return np.asarray(vecs, dtype=np.float64) @ m[:3, :3].T


def transform_normals(m, normals):
    """Normals transform by the inverse-transpose of the linear part."""
    inv_t = np.linalg.inv(m[:3, :3]).T
    return np.asarray(normals, dtype=np.float64) @ inv_t.T
