"""ctypes bindings for the C++ PLY codec (``plyfast.cpp``).

Builds ``_plyfast.so`` on first use with the sibling Makefile (g++ is in the
image; pybind11 is not, so the ABI is plain C via ctypes). Falls back to
pure numpy silently when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = pathlib.Path(__file__).parent
_LIB = None
_TRIED = False
_LOCK = threading.Lock()


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _HERE / "_plyfast.so"
        if not so.exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_HERE), "-s"],
                    check=True, capture_output=True, timeout=120)
            except Exception as e:
                logger.debug("plyfast build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(str(so))
            lib.ply_deinterleave.restype = None
            lib.ply_interleave.restype = None
            _LIB = lib
        except Exception as e:  # pragma: no cover
            logger.debug("plyfast load failed: %s", e)
        return _LIB


def available() -> bool:
    return _load() is not None


def deinterleave(raw: bytes, nrows: int, row_stride: int, offsets, widths,
                 dtypes) -> list:
    """Split an interleaved record buffer into per-column arrays using the
    native codec. Returns a list of 1-D numpy arrays (native byte order)."""
    lib = _load()
    assert lib is not None
    ncols = len(offsets)
    outs = [np.empty(nrows, dtype=dt) for dt in dtypes]
    dst_ptrs = (ctypes.c_void_p * ncols)(*[o.ctypes.data for o in outs])
    offs = np.asarray(offsets, np.int64)
    wids = np.asarray(widths, np.int64)
    nthreads = min(os.cpu_count() or 1, 8)
    lib.ply_deinterleave(
        raw,
        ctypes.c_int64(nrows),
        ctypes.c_int64(row_stride),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        wids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(ncols),
        dst_ptrs,
        ctypes.c_int32(nthreads),
    )
    return outs


def interleave(columns, row_stride: int, offsets, widths) -> bytes:
    """Pack per-column arrays into an interleaved record buffer."""
    lib = _load()
    assert lib is not None
    ncols = len(columns)
    nrows = len(columns[0])
    out = np.empty(nrows * row_stride, np.uint8)
    # Keep the contiguous copies alive for the duration of the call.
    contig = [np.ascontiguousarray(c) for c in columns]
    src_ptrs = (ctypes.c_void_p * ncols)(*[c.ctypes.data for c in contig])
    offs = np.asarray(offsets, np.int64)
    wids = np.asarray(widths, np.int64)
    nthreads = min(os.cpu_count() or 1, 8)
    lib.ply_interleave(
        out.ctypes.data_as(ctypes.c_char_p),
        ctypes.c_int64(nrows),
        ctypes.c_int64(row_stride),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        wids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(ncols),
        src_ptrs,
        ctypes.c_int32(nthreads),
    )
    return out.tobytes()
