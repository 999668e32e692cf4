"""Native (C) host-runtime components, loaded via ctypes.

The shared library is rebuilt automatically from source when missing or
stale (gcc is part of the toolchain). Python fallbacks exist for every
native component; the natives are drop-in accelerators for the host parse
path (CABAC entry decode), keeping the TPU compute path in JAX/XLA.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "cabac.c")
_LIB = os.path.join(_DIR, "libcabac.so")


_SRC_RES = os.path.join(_DIR, "residual.c")


def _build():
    subprocess.run(
        ["gcc", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC, _SRC_RES],
        check=True,
        capture_output=True,
    )


def load_cabac_lib():
    """Returns the ctypes handle for the native CABAC library (or None)."""
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC_RES)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None
    lib.cabac_new.restype = ctypes.c_void_p
    lib.cabac_new.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.cabac_free.argtypes = [ctypes.c_void_p]
    lib.cabac_decode_bin.restype = ctypes.c_int
    lib.cabac_decode_bin.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.cabac_decode_bypass.restype = ctypes.c_int
    lib.cabac_decode_bypass.argtypes = [ctypes.c_void_p]
    lib.cabac_decode_bypass_bits.restype = ctypes.c_uint32
    lib.cabac_decode_bypass_bits.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.cabac_decode_terminate.restype = ctypes.c_int
    lib.cabac_decode_terminate.argtypes = [ctypes.c_void_p]
    lib.cabac_overread.restype = ctypes.c_int
    lib.cabac_overread.argtypes = [ctypes.c_void_p]
    lib.cabac_bitpos.restype = ctypes.c_int64
    lib.cabac_bitpos.argtypes = [ctypes.c_void_p]
    lib.rc_decode_tb.restype = ctypes.c_int64
    lib.rc_decode_tb.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,  # levels int32*
        ctypes.c_void_p,  # decoded int32*
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    return lib


class NativeCabacDecoder:
    """ctypes wrapper with the same interface as cabac.engine.CabacDecoder."""

    _lib = None

    def __init__(self, data: bytes, slice_type: int, slice_qp: int):
        from openvvc_tpu.cabac.ctx import init_context_states

        if NativeCabacDecoder._lib is None:
            NativeCabacDecoder._lib = load_cabac_lib()
        lib = NativeCabacDecoder._lib
        if lib is None:
            raise RuntimeError("native cabac library unavailable")
        s0, s1, r0, r1 = init_context_states(slice_type, slice_qp)
        n = len(s0)
        self._data = data  # keep alive: C side borrows the buffer
        a_s0 = (ctypes.c_uint16 * n)(*s0)
        a_s1 = (ctypes.c_uint16 * n)(*s1)
        a_r0 = (ctypes.c_uint8 * n)(*r0)
        a_r1 = (ctypes.c_uint8 * n)(*r1)
        self._h = lib.cabac_new(data, len(data), a_s0, a_s1, a_r0, a_r1)
        self._lib_ref = lib

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib_ref.cabac_free(h)
            self._h = None

    def decode_bin(self, ctx_idx: int) -> int:
        return self._lib_ref.cabac_decode_bin(self._h, ctx_idx)

    def decode_bypass(self) -> int:
        return self._lib_ref.cabac_decode_bypass(self._h)

    def decode_bypass_bits(self, n: int) -> int:
        return self._lib_ref.cabac_decode_bypass_bits(self._h, n)

    def decode_terminate(self) -> int:
        return self._lib_ref.cabac_decode_terminate(self._h)

    def overread(self) -> bool:
        return bool(self._lib_ref.cabac_overread(self._h))

    def decode_tb(self, log2_w, log2_h, luma, dep_quant, sdh, mts_reduced=False):
        """Native residual_coding: returns (levels, decoded, (lx,ly), sig_map)."""
        import numpy as np

        w, h = 1 << log2_w, 1 << log2_h
        levels = np.zeros((h, w), np.int32)
        decoded = np.zeros((h, w), np.int32)
        sig = ctypes.c_uint64(0)
        packed = self._lib_ref.rc_decode_tb(
            self._h,
            levels.ctypes.data_as(ctypes.c_void_p),
            decoded.ctypes.data_as(ctypes.c_void_p),
            log2_w, log2_h, int(luma), int(dep_quant), int(sdh),
            int(mts_reduced), ctypes.byref(sig))
        return levels, decoded, (packed & 0xFF, (packed >> 8) & 0xFF), sig.value
