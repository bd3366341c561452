"""ctypes loader for the native host kernels (compiled on first use).

Falls back to numpy transparently when no C++ toolchain is available; every
entry point has identical semantics in both paths (tests cover parity).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        # -march=native: compiled lazily on the deployment host, so
        # host-specific SIMD is safe and vectorizes the color math.
        # -ffp-contract=off: FMA contraction changes the rounding of
        # a*b+c chains and breaks bit-exactness vs the PIL oracle
        # (the jitter kernels' contract); SIMD stays enabled.
        flags = ["-O3", "-march=native", "-ffp-contract=off",
                 "-shared", "-fPIC", "-std=c++17", "-pthread"]
        try:
            # Cache in a per-user dir (0700) and key the filename on a hash of
            # the source + flags + host arch: no mtime races, no other user's
            # (or other CPU's) .so can ever be CDLL'd, and any source or flag
            # change produces a fresh build.
            with open(_SRC, "rb") as f:
                src_bytes = f.read()
            key = hashlib.sha256(
                src_bytes + "\0".join(flags).encode()
                + os.uname().machine.encode()).hexdigest()[:16]
            cache_dir = os.path.join(
                tempfile.gettempdir(), f"mrfpnative-{os.getuid()}")
            os.makedirs(cache_dir, mode=0o700, exist_ok=True)
            if os.stat(cache_dir).st_uid != os.getuid():
                raise OSError(f"{cache_dir} not owned by current user")
            so_path = os.path.join(cache_dir, f"libmrfpnative-{key}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".build{os.getpid()}"
                subprocess.run(["g++", *flags, _SRC, "-o", tmp],
                               check=True, capture_output=True)
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            lib.remap_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_void_p]
            lib.fast_hist_i32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_int32,
                                          ctypes.c_void_p, ctypes.c_int32]
            lib.u8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64, ctypes.c_float,
                                      ctypes.c_float]
            lib.copy_remap_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_void_p,
                                          ctypes.c_void_p, ctypes.c_int32]
            lib.hue_shift_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int64, ctypes.c_int32,
                                         ctypes.c_int32]
            lib.saturation_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_int64, ctypes.c_float,
                                          ctypes.c_int32]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def remap_u8(mask: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """LUT remap of a uint8 array (native or numpy gather)."""
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    lut = np.ascontiguousarray(lut, dtype=np.uint8)
    lib = _build_and_load()
    if lib is None:
        return lut[mask]
    out = np.empty_like(mask)
    lib.remap_u8(mask.ctypes.data, out.ctypes.data, mask.size, lut.ctypes.data)
    return out


def fast_hist(pred: np.ndarray, label: np.ndarray, num_classes: int,
              num_threads: int = 4) -> np.ndarray:
    """Confusion matrix (int64 CxC) on the host."""
    pred = np.ascontiguousarray(pred.reshape(-1), dtype=np.int32)
    label = np.ascontiguousarray(label.reshape(-1), dtype=np.int32)
    lib = _build_and_load()
    if lib is None:
        from mrfp_tpu.ops.hist import fast_hist as np_hist
        return np_hist(pred, label, num_classes).astype(np.int64)
    hist = np.zeros((num_classes, num_classes), dtype=np.int64)
    lib.fast_hist_i32(pred.ctypes.data, label.ctypes.data, pred.size,
                      num_classes, hist.ctypes.data, num_threads)
    return hist


def u8_to_f32(img: np.ndarray, scale: float = 1.0, shift: float = 0.0) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    lib = _build_and_load()
    if lib is None:
        return img.astype(np.float32) * scale + shift
    out = np.empty(img.shape, dtype=np.float32)
    lib.u8_to_f32(img.ctypes.data, out.ctypes.data, img.size,
                  ctypes.c_float(scale), ctypes.c_float(shift))
    return out


def hue_shift_u8(rgb: np.ndarray, delta: int,
                 num_threads: Optional[int] = None) -> np.ndarray:
    """PIL-exact hue jitter (RGB->HSV->+delta->RGB) on uint8 HWC images.

    Native single-pass kernel when the toolchain is available; otherwise the
    vectorized numpy reimplementation (data/color.py) — both bit-identical
    to the PIL round trip (tests/test_transforms.py)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    assert rgb.shape[-1] == 3
    lib = _build_and_load()
    if lib is None:
        from mrfp_tpu.data.color import hue_shift_u8 as np_hue
        return np_hue(rgb, delta)
    if num_threads is None:
        num_threads = max(1, min(8, os.cpu_count() or 1))
    out = np.empty_like(rgb)
    lib.hue_shift_u8(rgb.ctypes.data, out.ctypes.data, rgb.size // 3,
                     int(delta) & 0xFF, num_threads)
    return out


def saturation_u8(rgb: np.ndarray, factor: float,
                  num_threads: Optional[int] = None) -> np.ndarray:
    """PIL-exact ImageEnhance.Color on uint8 HWC RGB (native or numpy)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    assert rgb.shape[-1] == 3
    lib = _build_and_load()
    if lib is None:
        from mrfp_tpu.data.color import saturation_u8 as np_sat
        return np_sat(rgb, factor)
    if num_threads is None:
        num_threads = max(1, min(8, os.cpu_count() or 1))
    out = np.empty_like(rgb)
    lib.saturation_u8(rgb.ctypes.data, out.ctypes.data, rgb.size // 3,
                      ctypes.c_float(factor), num_threads)
    return out


def copy_remap_u8(mask: np.ndarray, mapping: dict,
                  fill: int = 255) -> np.ndarray:
    """Copy-from-original remap (SYNTHIA/Mapillary mechanism)."""
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    lib = _build_and_load()
    keys = np.asarray(list(mapping.keys()), dtype=np.int32)
    vals = np.asarray(list(mapping.values()), dtype=np.int32)
    out = np.full(mask.shape, fill, dtype=np.uint8)
    if lib is None:
        for k, v in mapping.items():
            out[mask == k] = v
        return out
    lib.copy_remap_u8(mask.ctypes.data, out.ctypes.data, mask.size,
                      keys.ctypes.data, vals.ctypes.data, len(keys))
    return out
