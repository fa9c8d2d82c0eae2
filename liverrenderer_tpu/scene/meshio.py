"""Mesh file loaders: OBJ and PLY (ascii + binary-little-endian).

Capability analog of reference src/shapes/{obj.cpp,ply.cpp} — host-side,
numpy-vectorized parsing; vertices end up in the global SoA stream.
"""
from __future__ import annotations

import numpy as np

from . import geometry as geo


def load_mesh(path: str, face_normals: bool = False,
              shape_index: int = 0) -> geo.MeshData:
    low = path.lower()
    if low.endswith(".serialized"):
        mesh = _load_serialized(path, shape_index)
        if face_normals:
            mesh.normals = None
        return mesh
    if low.endswith(".obj"):
        from .. import _native
        if _native.available():
            verts, faces, nrms, uvs = _native.obj_load(path)
            if nrms is not None:
                bad = np.linalg.norm(nrms, axis=-1) < 1e-8
                if bad.any():
                    nrms[bad] = geo.compute_vertex_normals(verts,
                                                           faces)[bad]
            mesh = geo.MeshData(verts, faces, nrms, uvs)
        else:
            mesh = _load_obj(path)
    elif low.endswith(".ply"):
        mesh = _load_ply(path)
    else:
        raise ValueError(f"unsupported mesh format: {path}")
    if face_normals:
        mesh.normals = None
    return mesh


def _load_obj(path: str) -> geo.MeshData:
    v, vt, vn = [], [], []
    # corner records: (vi, ti, ni)
    tri_corners = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                v.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("vt "):
                parts = line.split()
                vt.append([float(parts[1]), float(parts[2])])
            elif line.startswith("vn "):
                parts = line.split()
                vn.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                parts = line.split()[1:]
                corners = []
                for p in parts:
                    comp = p.split("/")
                    vi = int(comp[0])
                    ti = int(comp[1]) if len(comp) > 1 and comp[1] else 0
                    ni = int(comp[2]) if len(comp) > 2 and comp[2] else 0
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):  # fan-triangulate
                    tri_corners.append((corners[0], corners[k], corners[k + 1]))

    v = np.asarray(v, np.float32)
    vt = np.asarray(vt, np.float32) if vt else None
    vn = np.asarray(vn, np.float32) if vn else None

    def fix(i, n):
        return i - 1 if i > 0 else n + i

    has_t = vt is not None and any(c[1] != 0 for tri in tri_corners for c in tri)
    has_n = vn is not None and any(c[2] != 0 for tri in tri_corners for c in tri)

    if not has_t and not has_n:
        faces = np.asarray([[fix(c[0], len(v)) for c in tri]
                            for tri in tri_corners], np.int32)
        return geo.MeshData(v, faces)

    # split vertices by unique (v, t, n) corner tuples
    corner_map = {}
    verts, uvs, nrms, faces = [], [], [], []
    for tri in tri_corners:
        face = []
        for (vi, ti, ni) in tri:
            key = (vi, ti, ni)
            if key not in corner_map:
                corner_map[key] = len(verts)
                verts.append(v[fix(vi, len(v))])
                uvs.append(vt[fix(ti, len(vt))] if has_t and ti != 0
                           else np.zeros(2, np.float32))
                nrms.append(vn[fix(ni, len(vn))] if has_n and ni != 0
                            else np.zeros(3, np.float32))
            face.append(corner_map[key])
        faces.append(face)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    uvs = np.asarray(uvs, np.float32) if has_t else None
    nrms = np.asarray(nrms, np.float32) if has_n else None
    if nrms is not None:
        bad = np.linalg.norm(nrms, axis=-1) < 1e-8
        if bad.any():
            vn_fallback = geo.compute_vertex_normals(verts, faces)
            nrms[bad] = vn_fallback[bad]
    # Mitsuba flips the OBJ V coordinate (obj.cpp): uv.y = 1 - t
    if uvs is not None:
        uvs = np.stack([uvs[:, 0], 1.0 - uvs[:, 1]], -1).astype(np.float32)
    return geo.MeshData(verts, faces, nrms, uvs)


def _load_serialized(path: str, shape_index: int = 0) -> geo.MeshData:
    """Mitsuba `.serialized` mesh container (src/shapes/serialized.cpp):
    0x041C magic + version, zlib-deflated mesh streams, and an end-of-file
    dictionary of per-mesh offsets.  Reads through the stream layer — the
    container is memory-mapped (io/stream.MemoryMappedFile) and the
    selected mesh inflates lazily through a ZStream, so only the requested
    shape's bytes are ever decompressed."""
    from ..io.stream import MemoryMappedFile, ZStream

    with MemoryMappedFile(path) as mf:
        data = mf.data()
        n_total = mf.size()
        magic, version = np.frombuffer(data, "<u2", 2, 0)
        assert magic == 0x041C, f"not a serialized mesh: {path}"
        count = int(np.frombuffer(data, "<u4", 1, n_total - 4)[0])
        if version >= 4:
            offs = np.frombuffer(data, "<u8", count,
                                 n_total - 4 - 8 * count)
        else:
            offs = np.frombuffer(data, "<u4", count,
                                 n_total - 4 - 4 * count).astype(np.uint64)
        assert 0 <= shape_index < count, (shape_index, count)
        mf.seek(int(offs[shape_index]) + 4)     # skip per-mesh magic+version
        zs = ZStream(mf, "r")

        flags = int(zs.read_value("u4"))
        if version >= 4:                        # null-terminated name
            zs.read_string()
        n_v = int(zs.read_value("u8"))
        n_t = int(zs.read_value("u8"))
        fdt = "f8" if flags & 0x2000 else "f4"
        verts = zs.read_array(fdt, n_v * 3).reshape(n_v, 3) \
            .astype(np.float32)
        normals = None
        uvs = None
        if flags & 0x0001:
            normals = zs.read_array(fdt, n_v * 3).reshape(n_v, 3) \
                .astype(np.float32)
        if flags & 0x0002:
            uvs = zs.read_array(fdt, n_v * 2).reshape(n_v, 2) \
                .astype(np.float32)
        if flags & 0x0008:                      # vertex colors (skipped)
            zs.read_array(fdt, n_v * 3)
        idt = "u8" if n_v > 0xFFFFFFFF else "u4"
        faces = zs.read_array(idt, n_t * 3).reshape(n_t, 3) \
            .astype(np.int32)
    if flags & 0x0010:                          # face normals requested
        normals = None
    return geo.MeshData(verts, faces, normals, uvs)


def _load_ply(path: str) -> geo.MeshData:
    with open(path, "rb") as f:
        data = f.read()
    hdr_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:hdr_end].decode("ascii", errors="replace").splitlines()
    fmt = "ascii"
    elements = []  # (name, count, [(prop_type, prop_name) or ('list',ct,t,name)])
    cur = None
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            cur = (parts[1], int(parts[2]), [])
            elements.append(cur)
        elif parts[0] == "property" and cur is not None:
            if parts[1] == "list":
                cur[2].append(("list", parts[2], parts[3], parts[4]))
            else:
                cur[2].append((parts[1], parts[2]))

    _T = {"float": "f4", "float32": "f4", "double": "f8", "uchar": "u1",
          "uint8": "u1", "char": "i1", "short": "i2", "ushort": "u2",
          "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4"}

    verts = nrms = uvs = None
    faces = []
    if fmt == "ascii":
        body = data[hdr_end:].decode("ascii", errors="replace").split()
        pos = 0
        for (name, count, props) in elements:
            if name == "vertex":
                ncols = len(props)
                arr = np.asarray(body[pos:pos + count * ncols],
                                 np.float32).reshape(count, ncols)
                pos += count * ncols
                cols = [p[1] for p in props]
                verts = arr[:, [cols.index("x"), cols.index("y"),
                                cols.index("z")]]
                if "nx" in cols:
                    nrms = arr[:, [cols.index("nx"), cols.index("ny"),
                                   cols.index("nz")]]
                if "u" in cols:
                    uvs = arr[:, [cols.index("u"), cols.index("v")]]
                elif "s" in cols:
                    uvs = arr[:, [cols.index("s"), cols.index("t")]]
            elif name == "face":
                for _ in range(count):
                    n = int(body[pos]); pos += 1
                    idx = [int(x) for x in body[pos:pos + n]]
                    pos += n
                    for k in range(1, n - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
    else:
        endian = "<" if "little" in fmt else ">"
        off = hdr_end
        for (name, count, props) in elements:
            if name == "vertex":
                dt = np.dtype([(p[1], endian + _T[p[0]]) for p in props])
                arr = np.frombuffer(data, dt, count, off)
                off += dt.itemsize * count
                verts = np.stack([arr["x"], arr["y"], arr["z"]],
                                 -1).astype(np.float32)
                names = dt.names
                if "nx" in names:
                    nrms = np.stack([arr["nx"], arr["ny"], arr["nz"]],
                                    -1).astype(np.float32)
                if "u" in names:
                    uvs = np.stack([arr["u"], arr["v"]], -1).astype(np.float32)
                elif "s" in names:
                    uvs = np.stack([arr["s"], arr["t"]], -1).astype(np.float32)
            elif name == "face":
                lp = props[0]
                cnt_t = np.dtype(endian + _T[lp[1]])
                idx_t = np.dtype(endian + _T[lp[2]])
                for _ in range(count):
                    n = int(np.frombuffer(data, cnt_t, 1, off)[0])
                    off += cnt_t.itemsize
                    idx = np.frombuffer(data, idx_t, n, off)
                    off += idx_t.itemsize * n
                    for k in range(1, n - 1):
                        faces.append([int(idx[0]), int(idx[k]),
                                      int(idx[k + 1])])
    faces = np.asarray(faces, np.int32)
    return geo.MeshData(verts, faces, nrms, uvs)
