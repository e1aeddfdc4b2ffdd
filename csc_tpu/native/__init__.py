"""ctypes bindings for the native host runtime (libcsc_host.so).

Auto-builds on first import when a toolchain is available; every entry
point has a pure-Python fallback in csc_tpu.golden, so the package works
without the shared library (`available` tells you which path is active).
"""
import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcsc_host.so")
_lib = None


def _try_build():
    src = os.path.join(_DIR, "csc_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        src, "-o", _SO], check=True, capture_output=True,
                       timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.csc_adler32.restype = ctypes.c_uint32
    lib.csc_adler32.argtypes = [ctypes.c_uint32, ctypes.c_char_p,
                                ctypes.c_uint64]
    lib.csc_e89_forward.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.csc_e89_inverse.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.csc_delta_forward.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_uint32]
    lib.csc_delta_inverse.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_uint32]
    lib.csc_dict_forward.restype = ctypes.c_int32
    lib.csc_dict_forward.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.csc_dict_inverse.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.csc_analyze.restype = ctypes.c_uint32
    lib.csc_analyze.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                ctypes.POINTER(ctypes.c_uint32)]
    _lib = lib
    return lib


def available():
    return _load() is not None


def adler32(data, value=0):
    lib = _load()
    if lib is None:
        from ..archiver.adler32 import adler32 as py
        return py(bytes(data), value)
    return lib.csc_adler32(value, bytes(data), len(data))


def _inplace(fn, buf, *args):
    raw = ctypes.create_string_buffer(bytes(buf), len(buf))
    fn(raw, len(buf), *args)
    buf[:] = raw.raw[:len(buf)]


def e89_forward(buf: bytearray):
    lib = _load()
    if lib is None:
        from ..golden.filters import forward_e89
        forward_e89(buf, len(buf))
        return
    _inplace(lib.csc_e89_forward, buf)


def e89_inverse(buf: bytearray):
    lib = _load()
    if lib is None:
        from ..golden.filters import inverse_e89
        inverse_e89(buf, len(buf))
        return
    _inplace(lib.csc_e89_inverse, buf)


def dict_forward(buf: bytearray) -> bool:
    lib = _load()
    if lib is None:
        from ..golden.filters import forward_dict
        return forward_dict(buf, len(buf))
    raw = ctypes.create_string_buffer(bytes(buf), len(buf))
    ok = lib.csc_dict_forward(raw, len(buf))
    if ok:
        buf[:] = raw.raw[:len(buf)]
    return bool(ok)


def dict_inverse(buf: bytearray):
    lib = _load()
    if lib is None:
        from ..golden.filters import inverse_dict
        inverse_dict(buf, len(buf))
        return
    _inplace(lib.csc_dict_inverse, buf)


def delta_forward(buf: bytearray, chn: int):
    lib = _load()
    if lib is None:
        from ..golden.filters import forward_delta
        forward_delta(buf, len(buf), chn)
        return
    _inplace(lib.csc_delta_forward, buf, chn)


def delta_inverse(buf: bytearray, chn: int):
    lib = _load()
    if lib is None:
        from ..golden.filters import inverse_delta
        inverse_delta(buf, len(buf), chn)
        return
    _inplace(lib.csc_delta_inverse, buf, chn)


def analyze(data) -> tuple:
    """Returns (block_type, bpb); golden fallback when unavailable."""
    lib = _load()
    if lib is None:
        from ..golden.analyzer import analyze as py
        return py(data, len(data))
    bpb = ctypes.c_uint32(0)
    t = lib.csc_analyze(bytes(data), len(data), ctypes.byref(bpb))
    return t, bpb.value
