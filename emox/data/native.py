"""ctypes bindings for the native host library (native/libemoxhost.so).

Drop-in accelerated versions of the host data-path kernels, with pure-numpy
fallbacks when the library is absent. All functions release the GIL during
the C call, so dataloader threads overlap with TPU dispatch (the role the
reference delegated to decord/PyAV/librosa's native code, reference
Net.py:7,16, magicanimate/utils/videoreader.py).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
# DataLoader workers race to the first native call; without the lock two
# threads could both run `make` and CDLL a half-linked .so, latching the
# process onto the numpy fallback
_LOAD_LOCK = threading.Lock()


def _try_build(path: str) -> None:
    """Best-effort `make -C native` when the .so is absent and a compiler
    exists (compiler-gated; set EMOX_NATIVE_NO_BUILD=1 to disable). Keeps
    the native kernels on by default instead of silently falling back to
    numpy on every fresh checkout."""
    if os.environ.get("EMOX_NATIVE_NO_BUILD"):
        return
    import shutil
    import subprocess

    native_dir = os.path.dirname(os.path.abspath(path))
    if not os.path.exists(os.path.join(native_dir, "Makefile")):
        return
    cxx = os.environ.get("CXX", "g++")
    if shutil.which(cxx) is None or shutil.which("make") is None:
        return
    try:
        subprocess.run(
            ["make", "-C", native_dir], check=False, timeout=120,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except Exception:
        pass


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOAD_LOCK:
        return _lib_locked()


def _lib_locked() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:  # raced: another thread finished while we waited
        return _LIB
    _TRIED = True
    path = os.environ.get(
        "EMOX_NATIVE_LIB",
        os.path.join(os.path.dirname(__file__), "..", "..", "native", "libemoxhost.so"),
    )
    if not os.path.exists(path):
        _try_build(path)
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        lib.eh_abi_version.restype = ctypes.c_int
        if lib.eh_abi_version() != 1:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        lib.eh_resample_linear.argtypes = [f32p, i64, ctypes.c_double, f32p, i64, ctypes.c_double]
        lib.eh_wav_window.argtypes = [f32p, i64, i64, f32p, i64]
        lib.eh_rms_envelope.argtypes = [f32p, i64, ctypes.c_double, f32p, i64]
        lib.eh_u8_to_unit_f32.argtypes = [u8p, f32p, i64]
        lib.eh_unit_f32_to_u8.argtypes = [f32p, u8p, i64]
        lib.eh_resize_bilinear_f32.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                               f32p, ctypes.c_int, ctypes.c_int]
        if hasattr(lib, "eh_augment_frame_f32"):
            lib.eh_augment_frame_f32.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, f32p, ctypes.c_int, ctypes.c_int,
            ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_linear(wav: np.ndarray, src_rate: float, dst_rate: float) -> np.ndarray:
    wav = np.ascontiguousarray(wav, np.float32)
    n_dst = int(round(len(wav) * dst_rate / src_rate))
    lib = _lib()
    if lib is None:
        pos = np.arange(n_dst) * (src_rate / dst_rate)
        return np.interp(pos, np.arange(len(wav)), wav).astype(np.float32)
    out = np.empty(n_dst, np.float32)
    lib.eh_resample_linear(_fp(wav), len(wav), src_rate, _fp(out), n_dst, dst_rate)
    return out


def wav_window(wav: np.ndarray, start: int, length: int) -> np.ndarray:
    wav = np.ascontiguousarray(wav, np.float32)
    lib = _lib()
    if lib is None:
        out = np.zeros(length, np.float32)
        a, b = max(0, start), min(len(wav), start + length)
        if b > a:
            out[a - start : b - start] = wav[a:b]
        return out
    out = np.empty(length, np.float32)
    lib.eh_wav_window(_fp(wav), len(wav), start, _fp(out), length)
    return out


def u8_to_unit(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.uint8)
    lib = _lib()
    if lib is None:
        return img.astype(np.float32) / 127.5 - 1.0
    out = np.empty(img.shape, np.float32)
    lib.eh_u8_to_unit_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fp(out), img.size
    )
    return out


def unit_to_u8(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, np.float32)
    lib = _lib()
    if lib is None:
        return np.clip((img + 1.0) * 127.5, 0, 255).round().astype(np.uint8)
    out = np.empty(img.shape, np.uint8)
    lib.eh_unit_f32_to_u8(_fp(img), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), img.size)
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """float32 [H, W, C] -> [dh, dw, C] (half-pixel centers)."""
    img = np.ascontiguousarray(img, np.float32)
    sh, sw, c = img.shape
    lib = _lib()
    if lib is None:
        ys = np.clip((np.arange(dh) + 0.5) * sh / dh - 0.5, 0, sh - 1)
        xs = np.clip((np.arange(dw) + 0.5) * sw / dw - 0.5, 0, sw - 1)
        y0 = ys.astype(int); y1 = np.minimum(y0 + 1, sh - 1); wy = (ys - y0)[:, None, None]
        x0 = xs.astype(int); x1 = np.minimum(x0 + 1, sw - 1); wx = (xs - x0)[None, :, None]
        out = ((1 - wy) * ((1 - wx) * img[y0][:, x0] + wx * img[y0][:, x1])
               + wy * ((1 - wx) * img[y1][:, x0] + wx * img[y1][:, x1]))
        return out.astype(np.float32)
    out = np.empty((dh, dw, c), np.float32)
    lib.eh_resize_bilinear_f32(_fp(img), sh, sw, c, _fp(out), dh, dw)
    return out


def augment_frame(
    img: np.ndarray, y0: int, x0: int, ch: int, cw: int, flip: bool,
    brightness: float, contrast: float, dh: int, dw: int,
) -> Optional[np.ndarray]:
    """Fused crop+flip+resize+color in one native pass; None if the library
    (or the symbol) is unavailable — caller falls back to the numpy path."""
    lib = _lib()
    if lib is None or not hasattr(lib, "eh_augment_frame_f32"):
        return None
    img = np.ascontiguousarray(img, np.float32)
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.float32)
    lib.eh_augment_frame_f32(
        _fp(img), sh, sw, c, y0, x0, ch, cw, 1 if flip else 0,
        float(brightness), float(contrast), _fp(out), dh, dw,
    )
    return out


def rms_envelope(wav: np.ndarray, samples_per_frame: float, frames: int) -> np.ndarray:
    wav = np.ascontiguousarray(wav, np.float32)
    lib = _lib()
    if lib is None:
        out = np.zeros(frames, np.float32)
        for f in range(frames):
            a, b = int(f * samples_per_frame), min(int((f + 1) * samples_per_frame), len(wav))
            out[f] = np.sqrt(np.mean(wav[a:b] ** 2)) if b > a else 0.0
        return out
    out = np.empty(frames, np.float32)
    lib.eh_rms_envelope(_fp(wav), len(wav), samples_per_frame, _fp(out), frames)
    return out
