"""ctypes loader for the native host helpers (csrc/host_pack.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; every entry point has a pure-numpy fallback so the framework works
without a toolchain. The native path matters for big tables: radix-sorting
2^30 prefixes is the host-side hot spot of table construction (the
reference does this with multi-threaded PureBasic/x86 insertion sorts,
1_9_7File.pb:2771-2895).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "host_pack.cpp")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(_SRC)),
                         "libbsgs_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.abspath(_SRC)
        if not os.path.exists(src):
            return None
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-pthread", "-o", _LIB_PATH, src],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.SubprocessError):
            return None
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.bsgs_sort_prefixes.argtypes = [u64p, u32p, ctypes.c_int64]
        lib.bsgs_sort_prefixes.restype = ctypes.c_int
        lib.bsgs_csr_pack.argtypes = [u64p, ctypes.c_int64, ctypes.c_int,
                                      u32p, u32p]
        lib.bsgs_csr_pack.restype = ctypes.c_int64
        lib.bsgs_lookup.argtypes = [u64p, ctypes.c_int64, ctypes.c_uint64,
                                    i64p]
        lib.bsgs_lookup.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def sort_prefixes(pre: np.ndarray):
    """Sort 64-bit prefixes ascending; returns (sorted_pre, positions) where
    positions are the 1-based original indices (baby indices)."""
    n = pre.shape[0]
    pos = np.arange(1, n + 1, dtype=np.uint32)
    lib = _load()
    if lib is not None:
        pre = np.array(pre, dtype=np.uint64, copy=True, order="C")
        lib.bsgs_sort_prefixes(pre, pos, n)
        return pre, pos
    order = np.argsort(pre, kind="stable")
    return pre[order], pos[order]


def csr_pack(sorted_pre: np.ndarray, htsz: int):
    """-> (offsets (2^htsz+1,) u32, disc (n,) u32, max_bucket)."""
    n = sorted_pre.shape[0]
    lib = _load()
    if lib is not None:
        offsets = np.empty((1 << htsz) + 1, np.uint32)
        disc = np.empty(max(n, 1), np.uint32)
        maxb = lib.bsgs_csr_pack(
            np.ascontiguousarray(sorted_pre, np.uint64), n, htsz,
            offsets, disc,
        )
        if maxb < 0:
            raise ValueError(f"bad htsz {htsz}")
        return offsets, disc[:n], int(maxb)
    buckets = (sorted_pre >> np.uint64(64 - htsz)).astype(np.int64)
    counts = np.bincount(buckets, minlength=1 << htsz)
    offsets = np.zeros((1 << htsz) + 1, dtype=np.uint32)
    np.cumsum(counts, out=offsets[1:])
    disc = ((sorted_pre << np.uint64(htsz)) >> np.uint64(32)).astype(np.uint32)
    return offsets, disc, int(counts.max()) if n else 0
