"""ctypes bindings for the native runtime library (native/convopeq_native.cpp).

Loads `libconvopeq_native.so` (built via `make -C native`, auto-built on
first use when a compiler is available) and exposes:
- fast WAV parse/decode (`read_wav_native`)
- SPSC lock-free ring buffer (`NativeRing`)
- interleave/deinterleave framing kernels

Falls back cleanly: callers should catch `NativeUnavailable` and use the
NumPy paths (utils/wavio) when the library can't be built.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native"
_SO = _NATIVE_DIR / "libconvopeq_native.so"


class NativeUnavailable(RuntimeError):
    pass


def _build():
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:
        raise NativeUnavailable(f"native build failed: {e}") from e


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists():
        _build()
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:
        raise NativeUnavailable(str(e)) from e

    u64 = ctypes.c_uint64
    u32 = ctypes.c_uint32
    lib.cq_wav_parse.restype = ctypes.c_int
    lib.cq_wav_parse.argtypes = [ctypes.c_char_p, u64,
                                 ctypes.POINTER(u32), ctypes.POINTER(u32),
                                 ctypes.POINTER(u32), ctypes.POINTER(u32),
                                 ctypes.POINTER(u64), ctypes.POINTER(u64)]
    lib.cq_wav_decode.restype = ctypes.c_int
    lib.cq_wav_decode.argtypes = [ctypes.c_char_p, u64, u32, u32, u32,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.POINTER(u64)]
    lib.cq_ring_create.restype = ctypes.c_void_p
    lib.cq_ring_create.argtypes = [u64]
    lib.cq_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.cq_ring_available_read.restype = u64
    lib.cq_ring_available_read.argtypes = [ctypes.c_void_p]
    lib.cq_ring_available_write.restype = u64
    lib.cq_ring_available_write.argtypes = [ctypes.c_void_p]
    lib.cq_ring_push.restype = u64
    lib.cq_ring_push.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double), u64]
    lib.cq_ring_pop.restype = u64
    lib.cq_ring_pop.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_double), u64]
    lib.cq_mpsc_create.restype = ctypes.c_void_p
    lib.cq_mpsc_create.argtypes = [u64, u64]
    lib.cq_mpsc_destroy.argtypes = [ctypes.c_void_p]
    lib.cq_mpsc_push.restype = ctypes.c_int
    lib.cq_mpsc_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.cq_mpsc_pop.restype = ctypes.c_int
    lib.cq_mpsc_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.cq_mpsc_size_approx.restype = u64
    lib.cq_mpsc_size_approx.argtypes = [ctypes.c_void_p]
    lib.cq_deinterleave_f32_to_f64.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double),
        u64, u32, ctypes.c_double]
    lib.cq_interleave_f64_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_float),
        u64, u32, ctypes.c_double]
    _LIB = lib
    return lib


def read_wav_native(path):
    """Native WAV read -> (samples (C, N) float64, sample_rate)."""
    lib = load()
    data = Path(path).read_bytes()
    u32 = ctypes.c_uint32
    u64 = ctypes.c_uint64
    tag, ch, sr, bits = u32(), u32(), u32(), u32()
    off, nbytes = u64(), u64()
    rc = lib.cq_wav_parse(data, len(data), ctypes.byref(tag), ctypes.byref(ch),
                          ctypes.byref(sr), ctypes.byref(bits),
                          ctypes.byref(off), ctypes.byref(nbytes))
    if rc != 0:
        raise ValueError(f"{path}: not a valid WAV (rc={rc})")
    stride = (bits.value // 8) * ch.value
    if stride == 0:
        raise ValueError(
            f"{path}: malformed fmt chunk (channels={ch.value}, "
            f"bits={bits.value})")
    frames = nbytes.value // stride
    out = np.empty((ch.value, frames), np.float64)
    got = u64()
    rc = lib.cq_wav_decode(data[off.value:off.value + nbytes.value],
                           nbytes.value, tag.value, ch.value, bits.value,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           ctypes.byref(got))
    if rc != 0:
        raise ValueError(f"{path}: unsupported WAV format (rc={rc})")
    return out[:, :got.value], int(sr.value)


class NativeRing:
    """SPSC lock-free ring of float64 (LockFreeRingBuffer analog)."""

    def __init__(self, capacity: int):
        self._lib = load()
        self._h = self._lib.cq_ring_create(capacity)
        if not self._h:
            raise ValueError("capacity must be a nonzero power of two")
        self.capacity = capacity

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cq_ring_destroy(self._h)
            self._h = None

    @property
    def readable(self):
        return self._lib.cq_ring_available_read(self._h)

    @property
    def writable(self):
        return self._lib.cq_ring_available_write(self._h)

    def push(self, arr) -> bool:
        arr = np.ascontiguousarray(arr, np.float64)
        n = self._lib.cq_ring_push(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            arr.size)
        return n == arr.size

    def pop(self, n: int):
        out = np.empty(n, np.float64)
        got = self._lib.cq_ring_pop(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
        if got != n:
            return None
        return out


class NativeMpscRing:
    """Bounded MPSC ring of fixed-size byte records (MpscBoundedRing analog:
    Vyukov slots, multi-producer CAS push, single-consumer pop that never
    skips a producer hole).  push/pop move `elem_size`-byte bytes objects."""

    def __init__(self, capacity: int, elem_size: int):
        self._lib = load()
        self._h = self._lib.cq_mpsc_create(capacity, elem_size)
        if not self._h:
            raise ValueError("capacity must be a nonzero power of two")
        self.capacity = capacity
        self.elem_size = elem_size

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cq_mpsc_destroy(self._h)
            self._h = None

    def push(self, record: bytes) -> bool:
        if len(record) != self.elem_size:
            raise ValueError(f"record must be exactly {self.elem_size} bytes")
        buf = ctypes.create_string_buffer(record, self.elem_size)
        return bool(self._lib.cq_mpsc_push(self._h, buf))

    def pop(self) -> bytes | None:
        buf = ctypes.create_string_buffer(self.elem_size)
        if not self._lib.cq_mpsc_pop(self._h, buf):
            return None
        return buf.raw

    @property
    def size_approx(self) -> int:
        return self._lib.cq_mpsc_size_approx(self._h)


def deinterleave(interleaved_f32, channels: int, gain: float = 1.0):
    lib = load()
    x = np.ascontiguousarray(interleaved_f32, np.float32)
    frames = x.size // channels
    out = np.empty((channels, frames), np.float64)
    lib.cq_deinterleave_f32_to_f64(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        frames, channels, gain)
    return out


def interleave(planar_f64, gain: float = 1.0):
    lib = load()
    x = np.ascontiguousarray(planar_f64, np.float64)
    channels, frames = x.shape
    out = np.empty(frames * channels, np.float32)
    lib.cq_interleave_f64_to_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, channels, gain)
    return out
