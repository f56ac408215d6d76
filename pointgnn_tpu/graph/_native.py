"""ctypes bindings for the native host kernels (cpp/graphlib).

Loads ``pointgnn_tpu/lib/libpointgnn_native.so``; if missing, attempts a
one-time build with the in-tree Makefile (g++ is part of the supported
toolchain).  All callers must handle ``get_lib() is None`` and fall back
to the pure-numpy implementations.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lib",
    "libpointgnn_native.so",
)
_CPP_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "cpp",
)

_lock = threading.Lock()
_lib = None
_tried = False


def stale(target: str, source_dir: str) -> bool:
    """True when ``target`` is missing or older than any ``.cpp``/``.h``
    under ``source_dir`` — committed binaries must never drift from the
    in-tree sources (the Makefile's dependency rules do the rebuild;
    this decides when to invoke it)."""
    if not os.path.isfile(target):
        return True
    t = os.path.getmtime(target)
    for root, _dirs, files in os.walk(source_dir):
        for name in files:
            if name.endswith((".cpp", ".h", ".hpp")):
                if os.path.getmtime(os.path.join(root, name)) > t:
                    return True
    return False


def _configure(lib):
    i64 = ctypes.c_int64
    lib.pgnn_radius_neighbors.restype = ctypes.c_int
    lib.pgnn_radius_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64,
        ctypes.POINTER(ctypes.c_float), i64,
        ctypes.c_float, ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(i64), ctypes.POINTER(i64),
        ctypes.POINTER(i64), ctypes.POINTER(i64),
    ]
    lib.pgnn_voxel_random.restype = i64
    lib.pgnn_voxel_random.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ctypes.POINTER(i64),
    ]
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.pgnn_nms.restype = None
    lib.pgnn_nms.argtypes = [
        f64p, f64p, ctypes.POINTER(i64), f64p, i64,
        ctypes.c_double, ctypes.c_int, ctypes.c_int,
        f64p, ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.path.isdir(_CPP_DIR) and stale(
            _LIB_PATH, os.path.join(_CPP_DIR, "graphlib")
        ):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=_CPP_DIR,
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                # rebuild unavailable (no toolchain) or failed: fall
                # through and load the committed .so if one exists —
                # a possibly-stale fast path beats silently degrading
                # to the numpy fallback for the whole process
                if os.path.exists(_LIB_PATH):
                    import warnings

                    warnings.warn(
                        "cpp/graphlib sources are newer than the "
                        "committed libpointgnn_native.so and the "
                        "rebuild failed; loading the existing binary "
                        "(run `make -C cpp` to refresh it)",
                        RuntimeWarning,
                    )
        if os.path.exists(_LIB_PATH):
            try:
                _lib = _configure(ctypes.CDLL(_LIB_PATH))
            except OSError:
                _lib = None
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def radius_neighbors_native(
    points_xyz: np.ndarray,
    centers_xyz: np.ndarray,
    radius: float,
    num_neighbors: int,
    seed: int,
) -> Optional[np.ndarray]:
    """[E, 2] (point, center) edges grouped by center, or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points_xyz, dtype=np.float32)
    ctr = np.ascontiguousarray(centers_xyz, dtype=np.float32)
    n, m = len(pts), len(ctr)
    if n == 0 or m == 0:
        return np.zeros((0, 2), dtype=np.int64)
    counts = np.zeros((m,), dtype=np.int64)
    null_i64 = ctypes.POINTER(ctypes.c_int64)()
    rc = lib.pgnn_radius_neighbors(
        _fptr(pts), n, _fptr(ctr), m,
        ctypes.c_float(radius), ctypes.c_int32(num_neighbors),
        ctypes.c_uint64(seed),
        _iptr(counts), null_i64, null_i64, null_i64,
    )
    if rc != 0:
        return None
    offsets = np.zeros((m + 1,), dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    src = np.empty((total,), dtype=np.int64)
    dst = np.empty((total,), dtype=np.int64)
    rc = lib.pgnn_radius_neighbors(
        _fptr(pts), n, _fptr(ctr), m,
        ctypes.c_float(radius), ctypes.c_int32(num_neighbors),
        ctypes.c_uint64(seed),
        _iptr(counts), _iptr(offsets), _iptr(src), _iptr(dst),
    )
    if rc != 0:
        return None
    return np.stack([src, dst], axis=1)


def voxel_random_native(
    xyz: np.ndarray,
    voxel_size: float,
    seed: int,
    shift: Optional[Tuple[float, float, float]] = None,
) -> Optional[np.ndarray]:
    """Indices of one random point per occupied voxel, or None."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, dtype=np.float32)
    n = len(pts)
    out = np.empty((n,), dtype=np.int64)
    shift_arr = None
    shift_ptr = ctypes.POINTER(ctypes.c_float)()
    if shift is not None:
        shift_arr = np.asarray(shift, dtype=np.float32)
        shift_ptr = _fptr(shift_arr)
    k = lib.pgnn_voxel_random(
        _fptr(pts), n, ctypes.c_float(voxel_size), shift_ptr,
        ctypes.c_uint64(seed), _iptr(out),
    )
    if k < 0:
        return None
    return out[:k]


def greedy_nms_native(
    boxes: np.ndarray,       # [n, 7] float64, sorted by decreasing score
    corners: np.ndarray,     # [n, 8, 3] float64 (possibly quantized)
    classes: np.ndarray,     # [n] int
    scores: np.ndarray,      # [n] float64
    threshold: float,
    merge: bool,
    rescore: bool,
):
    """Native greedy NMS (cpp/graphlib/nms.cpp), exact parity with
    postprocess.nms._greedy_nms.  Returns ``(keep, scores, boxes)`` or
    None if the library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pgnn_nms"):
        return None
    n = len(scores)
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    corners = np.ascontiguousarray(corners, dtype=np.float64)
    classes = np.ascontiguousarray(classes, dtype=np.int64)
    out_scores = np.array(scores, dtype=np.float64, copy=True)
    out_boxes = np.empty_like(boxes)
    keep = np.empty((n,), dtype=np.uint8)

    def _dptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    lib.pgnn_nms(
        _dptr(boxes), _dptr(corners), _iptr(classes), _dptr(out_scores),
        n, ctypes.c_double(threshold), int(merge), int(rescore),
        _dptr(out_boxes), keep.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
    )
    return keep.astype(bool), out_scores, out_boxes
