"""ctypes bindings to the native runtime components (native/*.cpp).

The shared library is built by ``native/build.sh`` (g++, no pybind11).  If the
.so is missing we build it on first import — the toolchain is part of the
deployment image.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "lib" / "libneus2_native.so"


def _ensure_built() -> Path:
    if not _SO.exists():
        build = _HERE.parent.parent / "native" / "build.sh"
        subprocess.run(["sh", str(build)], check=True, capture_output=True)
    return _SO


_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(_ensure_built()))
        # A stale .so from an older checkout may predate newer entry points
        # (e.g. the image loader's il_* or raster_mesh); rebuild once if
        # any is missing.
        if (
            not hasattr(_lib, "il_load_batch")
            or not hasattr(_lib, "raster_mesh")
            or not hasattr(_lib, "tbvh_build")
        ):
            _lib = None
            _SO.unlink()
            _lib = ctypes.CDLL(str(_ensure_built()))
        _lib.mc_run.restype = ctypes.c_void_p
        _lib.mc_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
        ]
        _lib.mc_num_vertices.restype = ctypes.c_int64
        _lib.mc_num_vertices.argtypes = [ctypes.c_void_p]
        _lib.mc_num_triangles.restype = ctypes.c_int64
        _lib.mc_num_triangles.argtypes = [ctypes.c_void_p]
        _lib.mc_copy_vertices.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        _lib.mc_copy_triangles.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
        _lib.mc_free.argtypes = [ctypes.c_void_p]
        _lib.il_load_batch.restype = ctypes.c_void_p
        _lib.il_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ]
        _lib.il_width.restype = ctypes.c_int
        _lib.il_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib.il_height.restype = ctypes.c_int
        _lib.il_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib.il_ok.restype = ctypes.c_int
        _lib.il_ok.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib.il_error.restype = ctypes.c_char_p
        _lib.il_error.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib.il_copy.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        _lib.il_free.argtypes = [ctypes.c_void_p]
        _lib.raster_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib.tbvh_build.restype = ctypes.c_void_p
        _lib.tbvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _lib.tbvh_free.argtypes = [ctypes.c_void_p]
        for fn in ("tbvh_signed_distance", "tbvh_unsigned_distance"):
            getattr(_lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
        _lib.tbvh_raycast.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        _lib.tbvh_face_normals.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ]
        _lib.tbvh_n_tris.restype = ctypes.c_int64
        _lib.tbvh_n_tris.argtypes = [ctypes.c_void_p]
    return _lib


class TriangleBVH:
    """Host triangle BVH: the GT signed-distance / raycast oracle for the
    SDF-from-mesh mode (reference src/triangle_bvh.cu TriangleBvh4 —
    unsigned_distance :405, signed_distance raystab :419, raytrace; OptiX
    on GPU, threaded host C++ here).  Sign: negative inside."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        self._l = lib()
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._faces = np.ascontiguousarray(faces, np.int32)
        self._h = self._l.tbvh_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._verts.shape[0],
            self._faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._faces.shape[0],
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._l.tbvh_free(h)
            self._h = None

    def signed_distance(self, pts: np.ndarray, n_threads: int = 0):
        pts = np.ascontiguousarray(pts, np.float32).reshape(-1, 3)
        out = np.empty(pts.shape[0], np.float32)
        self._l.tbvh_signed_distance(
            self._h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pts.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(n_threads),
        )
        return out

    def unsigned_distance(self, pts: np.ndarray, n_threads: int = 0):
        pts = np.ascontiguousarray(pts, np.float32).reshape(-1, 3)
        out = np.empty(pts.shape[0], np.float32)
        self._l.tbvh_unsigned_distance(
            self._h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pts.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(n_threads),
        )
        return out

    def raycast(self, origins: np.ndarray, dirs: np.ndarray,
                n_threads: int = 0):
        """Closest hit: (t (N,), tri_idx (N,)); t = -1 on miss."""
        o = np.ascontiguousarray(origins, np.float32).reshape(-1, 3)
        d = np.ascontiguousarray(dirs, np.float32).reshape(-1, 3)
        t = np.empty(o.shape[0], np.float32)
        tri = np.empty(o.shape[0], np.int32)
        self._l.tbvh_raycast(
            self._h, o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), o.shape[0],
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tri.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(n_threads),
        )
        return t, tri

    def face_normals(self):
        n = self._l.tbvh_n_tris(self._h)
        out = np.empty((n, 3), np.float32)
        self._l.tbvh_face_normals(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out


def decode_images(paths, n_threads: int = 0) -> list:
    """Decode PNG/JPEG files in parallel -> list of (H, W, 4) float32
    premultiplied-linear RGBA arrays (None for a file that failed to decode —
    callers fall back to the Python loader for those).

    Native counterpart of the reference's thread-pooled image loading
    (reference src/nerf_loader.cu:197-760); same output contract as
    data/dataset.py::_load_image_rgba.
    """
    paths = [str(p) for p in paths]
    n = len(paths)
    if n == 0:
        return []
    l = lib()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    h = l.il_load_batch(arr, n, int(n_threads))
    out = []
    try:
        for i in range(n):
            if not l.il_ok(h, i):
                out.append(None)
                continue
            w, ht = l.il_width(h, i), l.il_height(h, i)
            img = np.empty((ht, w, 4), np.float32)
            l.il_copy(h, i, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            out.append(img)
    finally:
        l.il_free(h)
    return out


def render_mesh_image(
    verts: np.ndarray,
    faces: np.ndarray,
    pose_c2w: np.ndarray,
    focal: tuple[float, float],
    principal: tuple[float, float],
    resolution: tuple[int, int],
    shaded: bool = False,
    light_dir: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Rasterize a mesh from a camera: the reference's eval-time mesh
    visualization (scripts/render_utils.py:418-421 render_mesh /
    scripts/run.py:68 --shaded_mesh), as a native z-buffer rasterizer.

    pose_c2w: (3, 4) ngp camera-to-world; focal (fx, fy) pixels; principal
    (cx, cy) in [0,1] of resolution (W, H).  Returns (rgb (H, W, 3) float32
    — normal map by default, Lambertian grey when shaded — and depth
    (H, W); background = 0).
    """
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    pose = np.asarray(pose_c2w, np.float32).reshape(3, 4)
    R, t = pose[:, :3], pose[:, 3]
    w2c = np.concatenate([R.T, (-R.T @ t)[:, None]], axis=1)
    w2c = np.ascontiguousarray(w2c, np.float32)
    W, H = int(resolution[0]), int(resolution[1])
    rgb = np.zeros((H, W, 3), np.float32)
    depth = np.zeros((H, W), np.float32)
    light = None
    if light_dir is not None:
        light = np.ascontiguousarray(light_dir, np.float32)
    fptr = ctypes.POINTER(ctypes.c_float)
    lib().raster_mesh(
        verts.ctypes.data_as(fptr), verts.shape[0],
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), faces.shape[0],
        w2c.ctypes.data_as(fptr),
        float(focal[0]), float(focal[1]),
        float(principal[0]) * W, float(principal[1]) * H,
        W, H, int(bool(shaded)),
        light.ctypes.data_as(fptr) if light is not None else None,
        rgb.ctypes.data_as(fptr), depth.ctypes.data_as(fptr),
    )
    return rgb, depth


def marching_cubes(grid: np.ndarray, thresh: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Triangulate the ``thresh`` level set of a (nx, ny, nz) float32 grid.

    Returns (vertices (V, 3) float32 in grid-index units, triangles (T, 3) int32).
    Mirrors reference marching_cubes_gpu (src/marching_cubes.cu:794).
    """
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    # mc_run indexes x fastest; our array is (x, y, z) C-order = z fastest,
    # so pass transposed dims and flip vertex coords back.
    l = lib()
    h = l.mc_run(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nz, ny, nx, float(thresh),
    )
    try:
        nv = l.mc_num_vertices(h)
        nt = l.mc_num_triangles(h)
        verts = np.empty((nv, 3), np.float32)
        tris = np.empty((nt, 3), np.int32)
        if nv:
            l.mc_copy_vertices(h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nt:
            l.mc_copy_triangles(h, tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    finally:
        l.mc_free(h)
    # emitted coords are (x=fastest…) in the transposed frame: flip to (x,y,z)
    return verts[:, ::-1].copy(), tris
