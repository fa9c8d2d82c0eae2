"""Binary stream + filesystem layer (libcore analog).

Re-derivation of the reference's stream stack — Stream/FileStream/
MemoryStream (src/core/{stream,fstream,mstream}.cpp), ZStream
(zstream.cpp:1-180, zlib inflate/deflate over an inner stream),
MemoryMappedFile (mmap.cpp:1-288), and the thread-local FileResolver
(fresolver.cpp:1-51) — as small Python classes over mmap/zlib.  The
typed read/write API mirrors Stream's templated read_* methods
(little-endian, matching the reference's host byte order assumption)
so serialized containers (scene/meshio.py) parse through one surface.
"""
from __future__ import annotations

import mmap as _mmap
import os
import struct
import zlib

_FMT = {"u2": "<H", "i2": "<h", "u4": "<I", "i4": "<i",
        "u8": "<Q", "i8": "<q", "f4": "<f", "f8": "<d", "u1": "<B"}


class Stream:
    """Abstract seekable binary stream with typed little-endian reads
    (stream.h read_* template surface)."""

    def read(self, n: int) -> bytes:
        raise NotImplementedError

    def write(self, data: bytes) -> int:
        raise NotImplementedError

    def seek(self, pos: int) -> None:
        raise NotImplementedError

    def tell(self) -> int:
        raise NotImplementedError

    def size(self) -> int:
        raise NotImplementedError

    def close(self) -> None:
        pass

    # -- typed accessors (read_uint32 & friends) --
    def read_value(self, kind: str):
        fmt = _FMT[kind]
        return struct.unpack(fmt, self.read(struct.calcsize(fmt)))[0]

    def read_array(self, kind: str, count: int):
        import numpy as np
        nbytes = np.dtype(kind).itemsize * count
        return np.frombuffer(self.read(nbytes), "<" + kind, count)

    def read_string(self) -> str:
        """Null-terminated string (stream.h read/write of std::string)."""
        out = bytearray()
        while True:
            c = self.read(1)
            if not c or c == b"\0":
                return out.decode("utf-8", errors="replace")
            out += c

    def write_value(self, kind: str, v) -> None:
        self.write(struct.pack(_FMT[kind], v))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FileStream(Stream):
    """Buffered random-access file (fstream.cpp)."""

    def __init__(self, path: str, mode: str = "rb"):
        self._f = open(path, mode)
        self.path = path

    def read(self, n):
        return self._f.read(n)

    def write(self, data):
        return self._f.write(data)

    def seek(self, pos):
        self._f.seek(pos)

    def tell(self):
        return self._f.tell()

    def size(self):
        return os.fstat(self._f.fileno()).st_size

    def close(self):
        self._f.close()


class MemoryStream(Stream):
    """Growable in-memory stream (mstream.cpp)."""

    def __init__(self, data: bytes = b""):
        self._buf = bytearray(data)
        self._pos = 0

    def read(self, n):
        out = bytes(self._buf[self._pos:self._pos + n])
        self._pos += len(out)
        return out

    def write(self, data):
        end = self._pos + len(data)
        if end > len(self._buf):
            self._buf.extend(b"\0" * (end - len(self._buf)))
        self._buf[self._pos:end] = data
        self._pos = end
        return len(data)

    def seek(self, pos):
        self._pos = pos

    def tell(self):
        return self._pos

    def size(self):
        return len(self._buf)

    def getvalue(self) -> bytes:
        return bytes(self._buf)


class MemoryMappedFile(Stream):
    """Read-only memory-mapped file (mmap.cpp): zero-copy slicing for
    large mesh containers — `data()` exposes the mapping as a buffer
    usable by np.frombuffer without reading the file into the heap."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self._m = _mmap.mmap(self._f.fileno(), 0, access=_mmap.ACCESS_READ)
        self._pos = 0
        self.path = path

    def data(self):
        return memoryview(self._m)

    def read(self, n):
        out = self._m[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    def seek(self, pos):
        self._pos = pos

    def tell(self):
        return self._pos

    def size(self):
        return len(self._m)

    def close(self):
        try:
            self._m.close()
        except BufferError:
            # zero-copy views (np.frombuffer over data()) still alive: the
            # mapping stays until the last view is collected — the same
            # lifetime rule as the reference's ref<MemoryMappedFile>
            pass
        self._f.close()


class ZStream(Stream):
    """zlib inflate/deflate over an inner stream (zstream.cpp:1-180).

    Read mode inflates lazily in chunks from the current position of the
    inner stream; write mode deflates on every write and flushes the
    remainder on close — matching the reference's streaming semantics
    (the serialized-mesh container stores independent deflate streams at
    dictionary offsets; see scene/meshio.py)."""

    CHUNK = 1 << 16

    def __init__(self, inner: Stream, mode: str = "r"):
        self._inner = inner
        self._mode = mode
        if mode == "r":
            self._z = zlib.decompressobj()
            self._buf = bytearray()
        else:
            self._z = zlib.compressobj()
        self._pos = 0

    def read(self, n):
        while len(self._buf) < n:
            raw = self._inner.read(self.CHUNK)
            if not raw:
                self._buf += self._z.flush()
                break
            self._buf += self._z.decompress(raw)
        out = bytes(self._buf[:n])
        del self._buf[:n]
        self._pos += len(out)
        return out

    def write(self, data):
        self._inner.write(self._z.compress(bytes(data)))
        self._pos += len(data)
        return len(data)

    def tell(self):
        return self._pos

    def seek(self, pos):
        if self._mode == "r" and pos >= self._pos:
            self.read(pos - self._pos)     # forward skip only (zstream.cpp)
            return
        raise ValueError("ZStream seeks forward only")

    def size(self):
        raise ValueError("ZStream has no size until fully inflated")

    def close(self):
        if self._mode == "w":
            self._inner.write(self._z.flush())


class FileResolver:
    """Ordered search-path file resolution (fresolver.cpp:1-51)."""

    def __init__(self, paths=()):
        self.paths = [os.path.abspath(p) for p in paths] or [os.getcwd()]

    def append(self, path: str):
        self.paths.append(os.path.abspath(path))

    def prepend(self, path: str):
        self.paths.insert(0, os.path.abspath(path))

    def resolve(self, name: str) -> str:
        if os.path.isabs(name) and os.path.exists(name):
            return name
        for p in self.paths:
            cand = os.path.join(p, name)
            if os.path.exists(cand):
                return cand
        return name
