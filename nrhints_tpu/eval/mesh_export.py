"""Mesh export: native C++ marching cubes over a device-evaluated SDF grid,
plus minimal OBJ writing (replaces the reference's PyMCubes + trimesh deps,
``models/neus_hint_model.py:86-93`` / ``trainer/trainer.py:365-380``).

The C++ backend (native/marching_cubes.cpp) is compiled on first use with
g++ and loaded through ctypes; the build artifact is cached next to the
source.  Vertices are rescaled from grid-index coordinates into the world
bounds exactly like the reference (vertices / (res-1) * (bmax-bmin) + bmin).
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_LOCK = threading.Lock()
_LIB = None


def _build_library() -> pathlib.Path:
    src = _NATIVE_DIR / "marching_cubes.cpp"
    out = _NATIVE_DIR / "build" / "libmarching_cubes.so"
    out.parent.mkdir(exist_ok=True)
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    proc = subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         str(src), "-o", str(out)],
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        # Surface the compiler diagnostics — check=True would raise with
        # only the command line, hiding the actual error.
        raise RuntimeError(f"marching-cubes build failed:\n{proc.stderr}")
    return out


def _get_lib():
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build_library()))
            lib.mc_run.restype = ctypes.c_void_p
            lib.mc_run.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
            ]
            lib.mc_num_vertices.restype = ctypes.c_int64
            lib.mc_num_vertices.argtypes = [ctypes.c_void_p]
            lib.mc_num_triangles.restype = ctypes.c_int64
            lib.mc_num_triangles.argtypes = [ctypes.c_void_p]
            lib.mc_copy_vertices.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
            lib.mc_copy_triangles.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
            lib.mc_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def marching_cubes(grid: np.ndarray, iso: float = 0.0):
    """[nx, ny, nz] scalar field -> (vertices [V,3] in grid-index coords,
    triangles [T,3] int32)."""
    lib = _get_lib()
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = grid.shape
    handle = lib.mc_run(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz, iso
    )
    if not handle:
        raise RuntimeError("marching cubes failed")
    try:
        n_v = lib.mc_num_vertices(handle)
        n_t = lib.mc_num_triangles(handle)
        verts = np.empty((n_v, 3), dtype=np.float32)
        tris = np.empty((n_t, 3), dtype=np.int32)
        if n_v:
            lib.mc_copy_vertices(handle, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n_t:
            lib.mc_copy_triangles(handle, tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return verts, tris
    finally:
        lib.mc_free(handle)


def write_obj(path, vertices: np.ndarray, triangles: np.ndarray) -> None:
    """Minimal OBJ writer (1-indexed faces)."""
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in triangles:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def marching_cubes_to_obj(grid: np.ndarray, iso, bound_min, bound_max, path):
    """Grid -> world-scaled OBJ (reference extract_geometry rescale)."""
    verts, tris = marching_cubes(grid, float(iso))
    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    res = np.asarray(grid.shape, np.float32)
    verts_world = verts / (res - 1.0)[None, :] * (bmax - bmin)[None, :] + bmin[None, :]
    write_obj(path, verts_world, tris)
    return verts_world, tris
