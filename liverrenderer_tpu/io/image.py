"""Image IO: PNG/JPG via PIL, EXR/PFM via our own codecs.

Capability analog of reference src/core/bitmap.cpp (2562 LoC): load/store of
LDR (sRGB-encoded) and HDR images with linearization on load.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.spectrum import linear_to_srgb_np


def read_image(path: str, srgb_to_linear: bool = True) -> np.ndarray:
    """Read an image to float32 (H, W, C>=3), linear RGB."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        return read_exr_any(path)
    if ext == ".pfm":
        return _read_pfm(path)
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    if srgb_to_linear:
        img = np.where(img <= 0.04045, img / 12.92,
                       ((img + 0.055) / 1.055) ** 2.4).astype(np.float32)
    return img


def write_image(path: str, img: np.ndarray):
    """Write linear RGB float image; PNG gets sRGB-encoded, EXR stays linear."""
    img = np.asarray(img, np.float32)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".exr":
        from .. import _native
        if _native.available():
            _native.exr_write(path, img)
        else:
            from .exr import write_exr
            write_exr(path, img)
        return
    if ext == ".pfm":
        _write_pfm(path, img)
        return
    from PIL import Image
    ldr = np.clip(linear_to_srgb_np(np.clip(img, 0, None)), 0, 1)
    # ordered dithering before the 8-bit quantization — the reference's
    # StructConverter dithers 2D images to avoid banding (struct.h:356,
    # struct.cpp:22/823 dither_matrix256); a tiled Bayer-style threshold
    # matrix is the same idea without shipping the 64k-float table
    h, w = ldr.shape[:2]
    b = np.array([[0, 8, 2, 10], [12, 4, 14, 6],
                  [3, 11, 1, 9], [15, 7, 13, 5]], np.float32) / 16.0
    ty = (h + 3) // 4
    tx = (w + 3) // 4
    thresh = np.tile(b, (ty, tx))[:h, :w][..., None]
    Image.fromarray((ldr * 255 + thresh).astype(np.uint8)).save(path)


def read_exr_any(path: str) -> np.ndarray:
    """EXR read: native OpenEXR (all codecs incl. PIZ) when built, else the
    pure-python codec (none/zip only).  Channels reordered to RGB(A)/Y."""
    from .. import _native
    if not _native.available():
        from .exr import read_exr
        return read_exr(path)
    img, names = _native.exr_read(path)
    order = [n for n in ("R", "G", "B", "A") if n in names]
    if len(order) >= 3:
        img = img[..., [names.index(n) for n in order]]
    elif "Y" in names:
        img = np.repeat(img[..., names.index("Y"):names.index("Y") + 1],
                        3, axis=-1)
    return img


def _read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        dims = f.readline().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        data = np.fromfile(f, "<f4" if scale < 0 else ">f4")
    data = data.reshape(h, w, 3 if color else 1)
    return np.flipud(data).astype(np.float32)


def _write_pfm(path: str, img: np.ndarray):
    with open(path, "wb") as f:
        color = img.ndim == 3 and img.shape[2] >= 3
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        np.flipud(img[..., :3] if color else img).astype("<f4").tofile(f)
