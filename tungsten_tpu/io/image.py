"""Host-side image IO: Radiance HDR (RGBE), PFM, EXR (via OpenCV when
available), and LDR formats (PNG/JPG/...).

Parity notes (ref: src/core/io/ImageIO.cpp:159-163,367-375,493,610-622):
extension dispatch; HDR formats hold linear radiance; LDR loads are
gamma-2.2 expanded to linear unless the caller asks for raw values.
"""
from __future__ import annotations

import os

import numpy as np


# ----------------------------------------------------------------- RGBE .hdr

def _load_rgbe(path) -> np.ndarray:
    """Pure-numpy Radiance .hdr (RGBE) reader supporting the common
    RLE-encoded 32-bit_rle_rgbe files."""
    with open(path, "rb") as f:
        data = f.read()
    # Header: text lines until blank, then resolution line.
    pos = 0
    if not data.startswith(b"#?"):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    res_line = data[pos:eol].decode("ascii").split()
    pos = eol + 1
    if res_line[0] != "-Y" or res_line[2] != "+X":
        raise ValueError(f"{path}: unsupported orientation {res_line}")
    h, w = int(res_line[1]), int(res_line[3])

    raw = np.frombuffer(data, dtype=np.uint8, offset=pos)
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    off = 0
    for y in range(h):
        if off + 4 <= len(raw) and raw[off] == 2 and raw[off + 1] == 2 and \
                (int(raw[off + 2]) << 8 | int(raw[off + 3])) == w:
            # New-style RLE scanline: 4 components stored separately.
            off += 4
            for c in range(4):
                x = 0
                while x < w:
                    count = int(raw[off]); off += 1
                    if count > 128:
                        count -= 128
                        rgbe[y, x:x + count, c] = raw[off]
                        off += 1
                    else:
                        rgbe[y, x:x + count, c] = raw[off:off + count]
                        off += count
                    x += count
        else:
            # Flat scanline.
            n = w * 4
            rgbe[y] = raw[off:off + n].reshape(w, 4)
            off += n
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * np.where(
        exp[..., None] == 0, 0.0, 1.0
    ).astype(np.float32)


def _save_rgbe(path, img: np.ndarray) -> None:
    img = np.asarray(img, dtype=np.float32)
    h, w = img.shape[:2]
    m = np.max(img, axis=-1)
    exp = np.zeros((h, w), dtype=np.int32)
    nz = m >= 1e-32
    _, e = np.frexp(np.where(nz, m, 1.0))
    scale = np.ldexp(1.0, -e) * 256.0 / 1.0
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    vals = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., :3] = np.where(nz[..., None], vals, 0)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    del exp
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode("ascii"))
        f.write(rgbe.tobytes())


# ---------------------------------------------------------------------- PFM

def _load_pfm(path) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        channels = 3 if header == b"PF" else 1
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), dtype="<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, channels)[::-1]  # PFM rows are bottom-up
    return np.ascontiguousarray(img, dtype=np.float32)


def _save_pfm(path, img: np.ndarray) -> None:
    img = np.asarray(img, dtype="<f4")
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if img.ndim == 3 else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.ascontiguousarray(img[::-1]).tobytes())


# ---------------------------------------------------------------------- EXR

def _cv2():
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2
    return cv2


def _load_exr(path) -> np.ndarray:
    cv2 = _cv2()
    img = cv2.imread(str(path), cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise IOError(f"failed to read EXR {path}")
    if img.ndim == 3:
        img = img[..., ::-1]  # BGR -> RGB
    return np.ascontiguousarray(img, dtype=np.float32)


def _save_exr(path, img: np.ndarray) -> None:
    cv2 = _cv2()
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 3:
        img = np.ascontiguousarray(img[..., ::-1])
    if not cv2.imwrite(str(path), img):
        raise IOError(f"failed to write EXR {path}")


# ------------------------------------------------------------------- public

HDR_EXTS = (".hdr", ".pic", ".pfm", ".exr")


def is_hdr(path) -> bool:
    return str(path).lower().endswith(HDR_EXTS)


def load_hdr(path) -> np.ndarray:
    p = str(path).lower()
    if p.endswith((".hdr", ".pic")):
        return _load_rgbe(path)
    if p.endswith(".pfm"):
        return _load_pfm(path)
    if p.endswith(".exr"):
        return _load_exr(path)
    raise ValueError(f"unsupported HDR format: {path}")


def save_hdr(path, img: np.ndarray) -> None:
    p = str(path).lower()
    if p.endswith((".hdr", ".pic")):
        _save_rgbe(path, img)
    elif p.endswith(".pfm"):
        _save_pfm(path, img)
    elif p.endswith(".exr"):
        _save_exr(path, img)
    else:
        raise ValueError(f"unsupported HDR format: {path}")


def load_ldr(path, gamma: bool = True) -> np.ndarray:
    """Load an 8-bit image as float32.  gamma=True expands sRGB-ish 2.2 gamma
    to linear, matching the reference's texture load behavior."""
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    if gamma:
        img = img ** 2.2
    return img


def save_ldr(path, img: np.ndarray) -> None:
    """Save a [0,1] float image as 8-bit (values assumed display-ready —
    tonemapping happens upstream, as in the reference's Camera outputs)."""
    from PIL import Image
    arr = np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(str(path))


def load_image(path) -> np.ndarray:
    return load_hdr(path) if is_hdr(path) else load_ldr(path)


def save_image(path, img: np.ndarray) -> None:
    if is_hdr(path):
        save_hdr(path, img)
    else:
        save_ldr(path, img)
