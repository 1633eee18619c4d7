"""ctypes bindings for the native host-I/O core (`host_io.cpp`).

Builds `_host_io.so` with g++ on first import (no external dependencies)
and exposes:
- `now_ns() / pace_until(ns)` — microsecond real-time pacing off the GIL
- `xp_dref / xp_vehs / xp_cmnd` — X-Plane 12 packet builders
  (byte-compatible with `flightjax.io.network.xpmsg_*`)
- `UdpBatchSender` — one-FFI-hop batched UDP frame sender

`available()` reports whether the native core loaded; callers fall back to
the pure-Python implementations when it did not (mirrors how the reference
degrades when SDL2 is absent, `joysticks.jl`).
"""

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_io.cpp")
_SO = os.path.join(_DIR, "_host_io.so")

_lib = None
_err = None


def _build():
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)


def _load():
    global _lib, _err
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.fj_now_ns.restype = ctypes.c_int64
        lib.fj_pace_until.restype = ctypes.c_int64
        lib.fj_pace_until.argtypes = [ctypes.c_int64]
        lib.fj_xp_dref.restype = ctypes.c_int
        lib.fj_xp_dref.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_float]
        lib.fj_xp_vehs.restype = ctypes.c_int
        lib.fj_xp_vehs.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                   ctypes.c_double, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_float,
                                   ctypes.c_float, ctypes.c_float]
        lib.fj_xp_cmnd.restype = ctypes.c_int
        lib.fj_xp_cmnd.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.fj_udp_open.restype = ctypes.c_int
        lib.fj_udp_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fj_udp_send_batch.restype = ctypes.c_int
        lib.fj_udp_send_batch.argtypes = [
            ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.fj_udp_close.argtypes = [ctypes.c_int]
        _lib = lib
    except Exception as exc:  # no toolchain / load failure -> fallback
        _err = exc
    return _lib


def available() -> bool:
    return _load() is not None


def load_error():
    _load()
    return _err


# ------------------------------------------------------------------ pacing

def now_ns() -> int:
    return _load().fj_now_ns()


def pace_until(target_ns: int) -> int:
    """Sleep+spin until the CLOCK_MONOTONIC instant; returns overshoot ns."""
    return _load().fj_pace_until(target_ns)


# ------------------------------------------------------------ X-Plane codec

def xp_dref(dref_id: str, value: float) -> bytes:
    buf = ctypes.create_string_buffer(509)
    n = _load().fj_xp_dref(buf, dref_id.encode("ascii"), float(value))
    if n < 0:
        raise ValueError("dref id too long")
    return buf.raw[:n]


def xp_vehs(lat_deg, lon_deg, h_m, psi_deg, theta_deg, phi_deg,
            aircraft=0) -> bytes:
    buf = ctypes.create_string_buffer(45)
    n = _load().fj_xp_vehs(buf, int(aircraft), float(lat_deg),
                           float(lon_deg), float(h_m), float(psi_deg),
                           float(theta_deg), float(phi_deg))
    return buf.raw[:n]


def xp_cmnd(cmd_id: str) -> bytes:
    cid = cmd_id.encode("ascii")
    buf = ctypes.create_string_buffer(5 + len(cid))
    n = _load().fj_xp_cmnd(buf, cid)
    return buf.raw[:n]


# --------------------------------------------------------------- UDP frame

class UdpBatchSender:
    """Connected UDP socket sending whole packet batches in one call."""

    def __init__(self, address="127.0.0.1", port=49000):
        self._fd = _load().fj_udp_open(address.encode("ascii"), int(port))
        if self._fd < 0:
            raise OSError(f"fj_udp_open({address}, {port}) failed")

    def send(self, packets) -> int:
        data = b"".join(packets)
        sizes = (ctypes.c_int32 * len(packets))(*[len(p) for p in packets])
        return _load().fj_udp_send_batch(self._fd, data, sizes,
                                         len(packets))

    def close(self):
        if self._fd >= 0:
            _load().fj_udp_close(self._fd)
            self._fd = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
