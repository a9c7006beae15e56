"""ctypes bindings for the native C++ allocator (csrc/aule_alloc.cpp).

Loads libaule_alloc.so, compiling it on first use if needed (g++ is part of
the toolchain; no pybind11 in this image, so the binding is a plain C ABI —
the same pattern the reference uses for libaule.so, python/aule/vulkan.py:
31-69, minus the GPU).  `make_allocator` in kv_cache.py prefers this and
falls back to the pure-Python free list if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

logger = logging.getLogger("aule_tpu")

_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "aule_alloc.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "_native")


def _load_library() -> ctypes.CDLL:
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_FAILED:
            raise RuntimeError("native allocator build previously failed")
        so_path = os.path.join(_BUILD_DIR, "libaule_alloc.so")
        src = os.path.abspath(_SRC)
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(src)):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     src, "-o", so_path],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so_path)
        except Exception as e:
            _LIB_FAILED = True
            raise RuntimeError(f"native allocator unavailable: {e!r}")
        _declare(lib)
        _LIB = lib
        return lib


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.aule_alloc_create.argtypes = [c.c_int32]
    lib.aule_alloc_create.restype = c.c_void_p
    lib.aule_alloc_destroy.argtypes = [c.c_void_p]
    lib.aule_alloc_num_free.argtypes = [c.c_void_p]
    lib.aule_alloc_num_free.restype = c.c_int32
    lib.aule_alloc_num_pages.argtypes = [c.c_void_p]
    lib.aule_alloc_num_pages.restype = c.c_int32
    lib.aule_alloc_allocate.argtypes = [c.c_void_p, c.c_int32,
                                        c.POINTER(c.c_int32)]
    lib.aule_alloc_allocate.restype = c.c_int32
    lib.aule_alloc_free.argtypes = [c.c_void_p, c.c_int32,
                                    c.POINTER(c.c_int32)]
    lib.aule_alloc_get_free.argtypes = [c.c_void_p,
                                        c.POINTER(c.c_int32)]
    lib.aule_alloc_get_free.restype = None
    lib.aule_alloc_set_free.argtypes = [c.c_void_p, c.c_int32,
                                        c.POINTER(c.c_int32)]
    lib.aule_alloc_set_free.restype = None
    lib.aule_alloc_grow.argtypes = [c.c_void_p, c.c_int32]
    lib.aule_alloc_grow.restype = c.c_int32
    lib.aule_seqs_create.argtypes = [c.c_void_p, c.c_int32, c.c_int32]
    lib.aule_seqs_create.restype = c.c_void_p
    lib.aule_seqs_destroy.argtypes = [c.c_void_p]
    lib.aule_seq_add.argtypes = [c.c_void_p, c.c_int64]
    lib.aule_seq_add.restype = c.c_int32
    lib.aule_seq_reserve.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.aule_seq_reserve.restype = c.c_int32
    lib.aule_seq_advance.argtypes = [c.c_void_p, c.c_int64, c.c_int64]
    lib.aule_seq_advance.restype = c.c_int32
    lib.aule_seq_len.argtypes = [c.c_void_p, c.c_int64]
    lib.aule_seq_len.restype = c.c_int64
    lib.aule_seq_remove.argtypes = [c.c_void_p, c.c_int64]
    lib.aule_seq_remove.restype = c.c_int32
    lib.aule_build_batch_views.argtypes = [
        c.c_void_p, c.POINTER(c.c_int64), c.c_int32, c.c_int32,
        c.POINTER(c.c_int32), c.POINTER(c.c_int32)]
    lib.aule_build_batch_views.restype = c.c_int32


class NativePageAllocator:
    """Drop-in for PythonPageAllocator backed by the C++ free list."""

    def __init__(self, num_pages: int):
        self._lib = _load_library()
        self._h = self._lib.aule_alloc_create(num_pages)
        if not self._h:
            raise MemoryError("aule_alloc_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and _LIB is not None:
            _LIB.aule_alloc_destroy(h)
            self._h = None

    @property
    def num_pages(self) -> int:
        return self._lib.aule_alloc_num_pages(self._h)

    @property
    def num_free(self) -> int:
        return self._lib.aule_alloc_num_free(self._h)

    def allocate(self, n: int) -> List[int]:
        out = np.empty((n,), np.int32)
        rc = self._lib.aule_alloc_allocate(
            self._h, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            from .kv_cache import PagePoolExhausted

            raise PagePoolExhausted(
                f"requested {n} pages, only {self.num_free} free")
        return out.tolist()

    def free(self, pages: List[int]) -> None:
        arr = np.asarray(pages, np.int32)
        self._lib.aule_alloc_free(
            self._h, len(pages),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))

    def grow(self, new_num_pages: int) -> None:
        rc = self._lib.aule_alloc_grow(self._h, new_num_pages)
        if rc != 0:
            raise ValueError("grow target below current pool size")

    def free_list(self) -> List[int]:
        out = np.empty((self.num_free,), np.int32)
        self._lib.aule_alloc_get_free(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out.tolist()

    def set_free_list(self, pages: List[int]) -> None:
        arr = np.asarray(pages, np.int32)
        self._lib.aule_alloc_set_free(
            self._h, len(pages),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))


class NativeSequenceManager:
    """C++ per-sequence page bookkeeping + batch-view builder."""

    def __init__(self, allocator: NativePageAllocator, page_size: int,
                 max_pages_per_seq: int):
        self._lib = allocator._lib
        self._alloc = allocator  # keep alive
        self._h = self._lib.aule_seqs_create(
            allocator._h, page_size, max_pages_per_seq)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and _LIB is not None:
            _LIB.aule_seqs_destroy(h)
            self._h = None

    def add(self, seq_id: int) -> None:
        if self._lib.aule_seq_add(self._h, seq_id) != 0:
            raise ValueError(f"sequence {seq_id} already present")

    def reserve(self, seq_id: int, num_new_tokens: int) -> None:
        rc = self._lib.aule_seq_reserve(self._h, seq_id, num_new_tokens)
        if rc == 0:
            return
        from .kv_cache import PagePoolExhausted

        if rc == -1:
            raise PagePoolExhausted("page pool exhausted")
        if rc == -2:
            raise PagePoolExhausted("exceeds max_pages_per_seq")
        raise KeyError(seq_id)

    def advance(self, seq_id: int, tokens: int) -> None:
        if self._lib.aule_seq_advance(self._h, seq_id, tokens) != 0:
            raise KeyError(seq_id)

    def length(self, seq_id: int) -> int:
        n = self._lib.aule_seq_len(self._h, seq_id)
        if n < 0:
            raise KeyError(seq_id)
        return int(n)

    def remove(self, seq_id: int) -> None:
        if self._lib.aule_seq_remove(self._h, seq_id) != 0:
            raise KeyError(seq_id)

    def batch_views(self, seq_ids: List[int], max_pages: int):
        batch = len(seq_ids)
        ids = np.asarray(seq_ids, np.int64)
        bt = np.empty((batch, max_pages), np.int32)
        lens = np.empty((batch,), np.int32)
        rc = self._lib.aule_build_batch_views(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            batch, max_pages,
            bt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise ValueError("sequence exceeds max_pages")
        return bt, lens
