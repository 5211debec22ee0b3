"""ctypes bindings for the native IO library (native/gsplat_io.cpp).

Falls back to None when the shared library isn't built; callers keep the
pure-Python path.  Build with scripts/build_native.sh.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libgsplat_io.so"
_lib = None


def library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and _LIB_PATH.exists():
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gsplat_parse_points3d.restype = ctypes.c_int64
        lib.gsplat_parse_points3d.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.gsplat_parse_images.restype = ctypes.c_int64
        lib.gsplat_parse_images.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.gsplat_parse_cameras.restype = ctypes.c_int64
        lib.gsplat_parse_cameras.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_points3d(data: bytes):
    """points3D.bin -> (xyz [n,3] f32, rgb [n,3] f32) or None if unavailable."""
    lib = library()
    if lib is None:
        return None
    n = lib.gsplat_parse_points3d(data, len(data), None, None)
    if n < 0:
        raise ValueError("corrupt points3D.bin")
    xyz = np.empty((n, 3), np.float32)
    rgb = np.empty((n, 3), np.float32)
    got = lib.gsplat_parse_points3d(data, len(data), _fptr(xyz), _fptr(rgb))
    assert got == n
    return xyz, rgb


def parse_images(data: bytes):
    """images.bin -> list of dicts (qvec, tvec, camera_id, name) or None."""
    lib = library()
    if lib is None:
        return None
    n = lib.gsplat_parse_images(data, len(data), None, None, None, None, 0)
    if n < 0:
        raise ValueError("corrupt images.bin")
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_id = np.empty((n,), np.int32)
    names_cap = len(data)  # names cannot exceed the file size
    names_buf = ctypes.create_string_buffer(names_cap)
    got = lib.gsplat_parse_images(
        data, len(data),
        qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names_buf, names_cap,
    )
    if got < 0:
        raise ValueError("corrupt images.bin")
    names = names_buf.raw.split(b"\x00")[:n]
    return [
        dict(
            qvec=qvec[i], tvec=tvec[i], camera_id=int(cam_id[i]),
            name=names[i].decode("utf-8"),
        )
        for i in range(n)
    ]


def parse_cameras(data: bytes):
    """cameras.bin -> dict camera_id -> intrinsics dict, or None."""
    lib = library()
    if lib is None:
        return None
    # Size conservatively: each camera is at least 24 bytes.
    cap = max(1, len(data) // 24)
    cam_id = np.empty((cap,), np.int32)
    model_id = np.empty((cap,), np.int32)
    width = np.empty((cap,), np.int64)
    height = np.empty((cap,), np.int64)
    params = np.empty((cap, 8), np.float64)
    n = lib.gsplat_parse_cameras(
        data, len(data),
        cam_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        model_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        width.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        height.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n < 0:
        raise ValueError("corrupt cameras.bin")
    out = {}
    for i in range(n):
        mid = int(model_id[i])
        p = params[i]
        if mid in (0, 2):
            fx = fy = p[0]
            cx, cy = p[1], p[2]
        else:
            fx, fy, cx, cy = p[0], p[1], p[2], p[3]
        out[int(cam_id[i])] = dict(
            width=int(width[i]), height=int(height[i]),
            fx=float(fx), fy=float(fy), cx=float(cx), cy=float(cy),
        )
    return out
