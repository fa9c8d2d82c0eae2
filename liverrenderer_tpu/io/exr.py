"""Minimal OpenEXR 2.0 codec (scanline, half/float, ZIP/none compression).

Written from the public OpenEXR file-format specification; covers what the
pipeline needs: reading the reference goldens (half RGB(A), zip) and writing
our renders.  Capability analog of the EXR paths in reference
src/core/bitmap.cpp (which links the full openexr library).
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 20000630

_PIX_UINT, _PIX_HALF, _PIX_FLOAT = 0, 1, 2
_PIX_SIZE = {_PIX_UINT: 4, _PIX_HALF: 2, _PIX_FLOAT: 4}
_PIX_NP = {_PIX_UINT: np.uint32, _PIX_HALF: np.float16, _PIX_FLOAT: np.float32}


def _read_cstr(buf, off):
    end = buf.index(b"\x00", off)
    return buf[off:end].decode("latin1"), end + 1


def _reorder_unpredict(data: bytes) -> bytes:
    """EXR zip post-processing: undo delta-predictor then de-interleave."""
    arr = np.frombuffer(data, np.uint8)
    if len(arr) > 1:
        deltas = arr[1:].astype(np.int64) - 128
        cs = np.cumsum(np.concatenate([arr[:1].astype(np.int64), deltas]))
        out = (cs % 256).astype(np.uint8)
    else:
        out = arr
    # de-interleave: first half = even bytes, second half = odd bytes
    n = len(out)
    half = (n + 1) // 2
    result = np.empty(n, np.uint8)
    result[0::2] = out[:half]
    result[1::2] = out[half:]
    return result.tobytes()


def _predict_reorder(data: bytes) -> bytes:
    """Inverse of _reorder_unpredict for writing."""
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    inter = np.empty(n, np.uint8)
    inter[:half] = arr[0::2]
    inter[half:] = arr[1::2]
    out = np.empty(n, np.uint8)
    out[0] = inter[0]
    diff = (inter[1:].astype(np.int16) - inter[:-1].astype(np.int16) + 128)
    out[1:] = (diff % 256).astype(np.uint8)
    return out.tobytes()


def read_exr(path: str) -> np.ndarray:
    """Read a scanline EXR; returns (H, W, 3) float32 (R, G, B; A dropped)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    assert magic == MAGIC, "not an EXR file"
    assert (version & 0x200) == 0, "tiled EXR unsupported"
    off = 8
    channels = []
    compression = 0
    dw = None
    while True:
        name, off = _read_cstr(buf, off)
        if not name:
            break
        atype, off = _read_cstr(buf, off)
        size = struct.unpack_from("<i", buf, off)[0]
        off += 4
        aval = buf[off:off + size]
        off += size
        if name == "channels":
            coff = 0
            while aval[coff] != 0:
                cname, coff = _read_cstr(aval, coff)
                ptype = struct.unpack_from("<i", aval, coff)[0]
                coff += 16
                channels.append((cname, ptype))
        elif name == "compression":
            compression = aval[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", aval)
    assert dw is not None
    xmin, ymin, xmax, ymax = dw
    w = xmax - xmin + 1
    h = ymax - ymin + 1
    assert compression in (0, 2, 3), f"compression {compression} unsupported"
    lines_per_block = 1 if compression in (0, 2) else 16

    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}q", buf, off)

    chan_size = {c: _PIX_SIZE[t] for c, t in channels}
    bytes_per_line = sum(chan_size.values()) * w

    out = {c: np.zeros((h, w), np.float32) for c, _ in channels}
    for bi, boff in enumerate(offsets):
        y0 = struct.unpack_from("<i", buf, boff)[0] - ymin
        dsize = struct.unpack_from("<i", buf, boff + 4)[0]
        raw = buf[boff + 8: boff + 8 + dsize]
        nlines = min(lines_per_block, h - y0)
        expect = bytes_per_line * nlines
        if compression == 0 or dsize == expect:
            data = raw
        else:
            data = _reorder_unpredict(zlib.decompress(raw))
        pos = 0
        for ly in range(nlines):
            for cname, ptype in sorted(channels):
                nb = _PIX_SIZE[ptype] * w
                line = np.frombuffer(data[pos:pos + nb], _PIX_NP[ptype])
                out[cname][y0 + ly] = line.astype(np.float32)
                pos += nb
    if all(c in out for c in "RGB"):
        return np.stack([out["R"], out["G"], out["B"]], -1)
    if "Y" in out:
        return np.repeat(out["Y"][..., None], 3, -1)
    first = next(iter(out.values()))
    return np.repeat(first[..., None], 3, -1)


def write_exr(path: str, img: np.ndarray, half: bool = True):
    """Write (H, W, 3|4) float as scanline zip-compressed EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    names = ["R", "G", "B", "A"][:c]
    ptype = _PIX_HALF if half else _PIX_FLOAT
    np_t = _PIX_NP[ptype]

    hdr = bytearray()
    hdr += struct.pack("<ii", MAGIC, 2)

    def attr(name, atype, val):
        nonlocal hdr
        hdr += name.encode() + b"\x00" + atype.encode() + b"\x00"
        hdr += struct.pack("<i", len(val)) + val

    chan = bytearray()
    for n in sorted(names):
        chan += n.encode() + b"\x00"
        chan += struct.pack("<iiii", ptype, 0, 1, 1)
    chan += b"\x00"
    attr("channels", "chlist", bytes(chan))
    attr("compression", "compression", bytes([3]))  # zip16
    attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    attr("lineOrder", "lineOrder", bytes([0]))
    attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\x00"

    lines_per_block = 16
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    table_off = len(hdr)
    hdr += b"\x00" * (8 * n_blocks)

    blocks = []
    data_off = len(hdr)
    chan_order = sorted(range(c), key=lambda i: names[i])
    for bi in range(n_blocks):
        y0 = bi * lines_per_block
        nlines = min(lines_per_block, h - y0)
        parts = []
        for ly in range(nlines):
            for ci in chan_order:
                parts.append(img[y0 + ly, :, ci].astype(np_t).tobytes())
        raw = b"".join(parts)
        comp = zlib.compress(_predict_reorder(raw))
        if len(comp) >= len(raw):
            comp = raw
        blocks.append(struct.pack("<ii", y0, len(comp)) + comp)

    out = bytearray(hdr)
    pos = data_off
    for bi, blk in enumerate(blocks):
        struct.pack_into("<q", out, table_off + 8 * bi, pos)
        out += blk
        pos += len(blk)
    with open(path, "wb") as f:
        f.write(bytes(out))
