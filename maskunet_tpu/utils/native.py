"""ctypes bindings for the native mask-ops library (csrc/maskops.cpp).

Builds the shared library on demand with g++ (cached next to the source;
falls back to a per-user cache dir if the tree is read-only) and exposes:

- `cc_label(mask) -> (num_labels, labels)`: 8-connectivity connected
  components (cv2.connectedComponents-compatible).
- `rle_encode_counts(mask) -> list[int]`: COCO column-major run counts.
- `rle_decode_counts(counts, h, w) -> mask`.
- `mask_iou(dt_masks, gt_masks, iscrowd) -> [nd, ng] IoU matrix`
  (bit-packed popcount intersections; COCOeval crowd semantics).

Every entry point degrades gracefully: `available()` is False when no
compiler is present and callers fall back to the numpy/cv2 paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "maskops.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_FAILED = False


def _build_and_load() -> ctypes.CDLL | None:
    global _FAILED
    candidates = [
        os.path.join(os.path.dirname(_SRC), "libmaskops.so"),
        os.path.join(os.path.expanduser("~/.cache/maskunet_tpu"),
                     "libmaskops.so"),
    ]
    for so_path in candidates:
        if os.path.exists(so_path) and os.path.getmtime(
                so_path) >= os.path.getmtime(_SRC):
            try:
                return ctypes.CDLL(so_path)
            except OSError:
                continue
        try:
            os.makedirs(os.path.dirname(so_path), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 _SRC, "-o", so_path],
                check=True, capture_output=True, timeout=120)
            return ctypes.CDLL(so_path)
        except (OSError, subprocess.SubprocessError):
            continue
    _FAILED = True
    return None


def _lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None and not _FAILED:
        with _LOCK:
            if _LIB is None and not _FAILED:
                lib = _build_and_load()
                if lib is not None:
                    lib.cc_label.restype = ctypes.c_int
                    lib.rle_encode.restype = ctypes.c_int
                    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def _ptr(a: np.ndarray, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def cc_label(mask: np.ndarray) -> tuple[int, np.ndarray]:
    lib = _lib()
    assert lib is not None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    out = np.zeros((h, w), np.int32)
    n = lib.cc_label(_ptr(mask, ctypes.c_uint8), h, w,
                     _ptr(out, ctypes.c_int32))
    return int(n), out


def rle_encode_counts(mask: np.ndarray) -> list[int]:
    lib = _lib()
    assert lib is not None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    buf = np.zeros(h * w + 2, np.uint32)
    n = lib.rle_encode(_ptr(mask, ctypes.c_uint8), h, w,
                       _ptr(buf, ctypes.c_uint32), len(buf))
    assert n >= 0
    return buf[:n].tolist()


def rle_decode_counts(counts: list[int], h: int, w: int) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    arr = np.asarray(counts, np.uint32)
    out = np.zeros((h, w), np.uint8)
    lib.rle_decode(_ptr(arr, ctypes.c_uint32), len(arr), h, w,
                   _ptr(out, ctypes.c_uint8))
    return out


def mask_iou(dt: np.ndarray, gt: np.ndarray,
             iscrowd: np.ndarray | None = None) -> np.ndarray:
    """dt: [nd, H, W] uint8; gt: [ng, H, W] uint8."""
    lib = _lib()
    assert lib is not None
    nd, h, w = dt.shape
    ng = gt.shape[0]
    dt = np.ascontiguousarray(dt.reshape(nd, h * w), np.uint8)
    gt = np.ascontiguousarray(gt.reshape(ng, h * w), np.uint8)
    crowd = np.ascontiguousarray(
        iscrowd if iscrowd is not None else np.zeros(ng), np.uint8)
    out = np.zeros((nd, ng), np.float64)
    lib.mask_iou(_ptr(dt, ctypes.c_uint8), nd, _ptr(gt, ctypes.c_uint8),
                 ng, h * w, _ptr(crowd, ctypes.c_uint8),
                 _ptr(out, ctypes.c_double))
    return out
