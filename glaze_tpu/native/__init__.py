"""Native (C++) runtime components, built on demand with g++.

Provides fast xxHash64 and a binned-SAH BVH builder. Everything here has a
pure-Python/NumPy fallback elsewhere in the package, so a missing compiler
never breaks functionality — only speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "glaze_native.cpp")
_SO = os.path.join(_HERE, "libglaze_native.so")


class _NativeLib:
    def __init__(self, cdll: ctypes.CDLL):
        self._lib = cdll
        self._lib.glaze_xxh64.restype = ctypes.c_uint64
        self._lib.glaze_xxh64.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        self._lib.glaze_bvh_build.restype = ctypes.c_void_p
        self._lib.glaze_bvh_build.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_uint32,
        ]
        self._lib.glaze_bvh_node_count.restype = ctypes.c_int32
        self._lib.glaze_bvh_node_count.argtypes = [ctypes.c_void_p]
        self._lib.glaze_bvh_export.restype = None
        self._lib.glaze_bvh_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        self._lib.glaze_bvh_free.restype = None
        self._lib.glaze_bvh_free.argtypes = [ctypes.c_void_p]
        self._lib.glaze_alias_build.restype = None
        self._lib.glaze_alias_build.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        self._lib.glaze_bvh_octants.restype = ctypes.c_void_p
        self._lib.glaze_bvh_octants.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        self._lib.glaze_oct8_node_count.restype = ctypes.c_int32
        self._lib.glaze_oct8_node_count.argtypes = [ctypes.c_void_p]
        self._lib.glaze_oct8_padded_tris.restype = ctypes.c_uint64
        self._lib.glaze_oct8_padded_tris.argtypes = [ctypes.c_void_p]
        self._lib.glaze_oct8_export.restype = None
        self._lib.glaze_oct8_export.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
        self._lib.glaze_oct8_free.restype = None
        self._lib.glaze_oct8_free.argtypes = [ctypes.c_void_p]

    def xxh64(self, data: bytes, seed: int = 0) -> int:
        return self._lib.glaze_xxh64(data, len(data), seed)

    def alias_build(self, weights: np.ndarray):
        """Walker/Vose alias tables for (rows, n) weights.

        Returns (prob (rows, n) f32, alias (rows, n) i32).
        """
        w = np.ascontiguousarray(weights, np.float32)
        rows, n = w.shape
        prob = np.empty((rows, n), np.float32)
        alias = np.empty((rows, n), np.int32)
        self._lib.glaze_alias_build(
            w.ctypes.data_as(ctypes.c_void_p), rows, n,
            prob.ctypes.data_as(ctypes.c_void_p),
            alias.ctypes.data_as(ctypes.c_void_p),
        )
        return prob, alias

    def bvh_build(self, tri_verts: np.ndarray, leaf_size: int = 4):
        """Builds a threaded BVH over triangles (N,3,3) float32.

        Returns dict of numpy arrays: bmin/bmax (M,3), first/count/skip (M,),
        tri_order (N,).
        """
        tri = np.ascontiguousarray(tri_verts, dtype=np.float32)
        n = tri.shape[0]
        handle = self._lib.glaze_bvh_build(
            tri.ctypes.data_as(ctypes.c_void_p), n, leaf_size
        )
        try:
            m = self._lib.glaze_bvh_node_count(handle)
            bmin = np.empty((m, 3), np.float32)
            bmax = np.empty((m, 3), np.float32)
            first = np.empty(m, np.int32)
            count = np.empty(m, np.int32)
            skip = np.empty(m, np.int32)
            order = np.empty(n, np.uint32)
            self._lib.glaze_bvh_export(
                handle,
                bmin.ctypes.data_as(ctypes.c_void_p),
                bmax.ctypes.data_as(ctypes.c_void_p),
                first.ctypes.data_as(ctypes.c_void_p),
                count.ctypes.data_as(ctypes.c_void_p),
                skip.ctypes.data_as(ctypes.c_void_p),
                order.ctypes.data_as(ctypes.c_void_p),
            )
        finally:
            self._lib.glaze_bvh_free(handle)
        return {
            "bmin": bmin,
            "bmax": bmax,
            "first": first,
            "count": count,
            "skip": skip,
            "tri_order": order,
        }

    def bvh_build_octants(self, tri_verts: np.ndarray, leaf_size: int = 4):
        """Builds the BVH and re-emits it in 8 octant-ordered DFS layouts
        with leaf-aligned padded triangle order (sentinel 0xFFFFFFFF).

        Returns dict: bmin/bmax (8, M, 3), first/count/skip (8, M),
        tri_order (N_pad,) uint32.
        """
        tri = np.ascontiguousarray(tri_verts, dtype=np.float32)
        n = tri.shape[0]
        handle = self._lib.glaze_bvh_build(
            tri.ctypes.data_as(ctypes.c_void_p), n, leaf_size
        )
        try:
            oct8 = self._lib.glaze_bvh_octants(handle, leaf_size)
            try:
                m = self._lib.glaze_oct8_node_count(oct8)
                n_pad = self._lib.glaze_oct8_padded_tris(oct8)
                bmin = np.empty((8, m, 3), np.float32)
                bmax = np.empty((8, m, 3), np.float32)
                first = np.empty((8, m), np.int32)
                count = np.empty((8, m), np.int32)
                skip = np.empty((8, m), np.int32)
                order = np.empty(n_pad, np.uint32)
                self._lib.glaze_oct8_export(
                    oct8,
                    bmin.ctypes.data_as(ctypes.c_void_p),
                    bmax.ctypes.data_as(ctypes.c_void_p),
                    first.ctypes.data_as(ctypes.c_void_p),
                    count.ctypes.data_as(ctypes.c_void_p),
                    skip.ctypes.data_as(ctypes.c_void_p),
                    order.ctypes.data_as(ctypes.c_void_p),
                )
            finally:
                self._lib.glaze_oct8_free(oct8)
        finally:
            self._lib.glaze_bvh_free(handle)
        return {
            "bmin": bmin,
            "bmax": bmax,
            "first": first,
            "count": count,
            "skip": skip,
            "tri_order": order,
        }


def _build() -> str | None:
    """Compile the native library if needed. Returns path or None."""
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=_HERE, delete=False
        ) as tmp:
            tmp_path = tmp.name
        cmd = [
            "g++",
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            _SRC,
            "-o",
            tmp_path,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, _SO)
        return _SO
    except Exception:
        try:
            os.unlink(tmp_path)
        except Exception:
            pass
        return None


lib: _NativeLib | None = None
_so_path = _build()
if _so_path is not None:
    try:
        lib = _NativeLib(ctypes.CDLL(_so_path))
    except Exception:
        lib = None
if lib is None:
    raise ImportError("glaze_tpu native library unavailable")
