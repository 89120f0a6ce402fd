"""ctypes loader + wrappers for the native serving-runtime core.

`native/lca_host.cc` implements the continuous-batching scheduler's host-side
hot path — the page free-list and the prefix-cache content LRU with refcounts
and admission dry-runs — as a C ABI shared library. This module builds it on
first use (g++ -O2, cached beside the source), loads it via ctypes (no
pybind/cffi dependency), and exposes drop-in replacements for
`serving.continuous._PageAllocator` and
`serving.prefix_cache.PrefixPageAllocator` with the exact same method
signatures and — by contract, enforced in tests/test_native_alloc.py —
bit-identical decisions (page ids, hit counts, eviction order).

If the toolchain is missing or the build fails, `load()` returns None and the
engines silently use the pure-Python structures (the behaviour is identical;
only host-side speed differs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["load", "native_available", "NativePageAllocator",
           "NativePrefixPageAllocator"]

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "lca_host.cc")

_lock = threading.Lock()
_lib = None
_tried = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first call; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        so = os.path.join(os.path.dirname(_SRC), "lca_host.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            tmp = so + f".tmp{os.getpid()}"
            if not _build(_SRC, tmp):
                return None
            os.replace(tmp, so)  # atomic: parallel builders race safely
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.lca_alloc_new.restype = ctypes.c_void_p
        lib.lca_alloc_new.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.lca_alloc_free.argtypes = [ctypes.c_void_p]
        lib.lca_available.restype = ctypes.c_int64
        lib.lca_available.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lca_take_basic.restype = ctypes.c_int32
        lib.lca_take_basic.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.lca_take_extra.restype = ctypes.c_int32
        lib.lca_take_extra.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.lca_release_pages.restype = ctypes.c_int32
        lib.lca_release_pages.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.lca_lookup.restype = ctypes.c_int64
        lib.lca_lookup.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32]
        lib.lca_can_take.restype = ctypes.c_int32
        lib.lca_can_take.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32]
        lib.lca_release_row.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.lca_take_prefix.restype = ctypes.c_int64
        lib.lca_take_prefix.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.lca_register.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.lca_hit_pages.restype = ctypes.c_int64
        lib.lca_hit_pages.argtypes = [ctypes.c_void_p]
        lib.lca_evictions.restype = ctypes.c_int64
        lib.lca_evictions.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load() is not None


def _pack_keys(hashes: Sequence[bytes]) -> bytes:
    if not hashes:
        return b""
    for h in hashes:
        if len(h) != 16:
            raise ValueError("prefix keys must be 16-byte digests")
    return b"".join(hashes)


class _Handle:
    """Owns the C allocator object (freed on GC)."""

    def __init__(self, pool_pages: int, prefix_mode: bool):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native runtime unavailable (g++ build failed)")
        self._h = self._lib.lca_alloc_new(pool_pages, 1 if prefix_mode else 0)

    def __del__(self):
        lib, h = getattr(self, "_lib", None), getattr(self, "_h", None)
        if lib is not None and h:
            lib.lca_alloc_free(h)
            self._h = None


class NativePageAllocator(_Handle):
    """Drop-in for `serving.continuous._PageAllocator` (free-list only)."""

    def __init__(self, pool_pages: int):
        super().__init__(pool_pages, prefix_mode=False)

    def available(self, bi: int) -> int:
        return int(self._lib.lca_available(self._h, bi))

    def take(self, bi: int, need: int) -> List[int]:
        out = (ctypes.c_int32 * max(need, 1))()
        rc = self._lib.lca_take_basic(self._h, bi, need, out)
        assert rc == 0, (need, "pool exhausted")
        return list(out[:need])

    def take_extra(self, bi: int, need: int) -> List[int]:
        out = (ctypes.c_int32 * max(need, 1))()
        rc = self._lib.lca_take_extra(self._h, bi, need, out)
        if rc != 0:
            raise RuntimeError(
                f"page pool exhausted: row {bi} needs {need} growth pages")
        return list(out[:need])

    def release_pages(self, bi: int, pages: List[int]) -> None:
        if not pages:
            return
        arr = (ctypes.c_int32 * len(pages))(*pages)
        rc = self._lib.lca_release_pages(self._h, bi, arr, len(pages))
        if rc != 0:
            raise ValueError(
                f"release_pages: page not owned by row {bi} (double "
                f"release?)")


class NativePrefixPageAllocator(_Handle):
    """Drop-in for `serving.prefix_cache.PrefixPageAllocator`."""

    def __init__(self, pool_pages: int):
        super().__init__(pool_pages, prefix_mode=True)

    # --- queries -----------------------------------------------------------

    def lookup(self, hashes: Sequence[bytes]) -> int:
        return int(self._lib.lca_lookup(
            self._h, _pack_keys(hashes), len(hashes)))

    def can_take(self, bi: int, hashes: Sequence[bytes],
                 span_pages: int) -> bool:
        return bool(self._lib.lca_can_take(
            self._h, bi, _pack_keys(hashes), len(hashes), span_pages))

    # --- mutations ----------------------------------------------------------

    def release_row(self, bi: int) -> None:
        self._lib.lca_release_row(self._h, bi)

    def take(self, bi: int, hashes: Sequence[bytes],
             span_pages: int) -> Tuple[List[int], int]:
        out = (ctypes.c_int32 * max(span_pages, 1))()
        hits = int(self._lib.lca_take_prefix(
            self._h, bi, _pack_keys(hashes), len(hashes), span_pages, out))
        assert hits >= 0, "pool exhausted: no free or evictable pages " \
                          "(caller must gate on can_take)"
        return list(out[:span_pages]), hits

    def register(self, hashes: Sequence[bytes],
                 pages: Sequence[int]) -> None:
        n = min(len(hashes), len(pages))
        arr = (ctypes.c_int32 * max(n, 1))(*pages[:n])
        self._lib.lca_register(self._h, _pack_keys(hashes[:n]), arr, n)

    # --- observability -------------------------------------------------------

    @property
    def hit_pages(self) -> int:
        return int(self._lib.lca_hit_pages(self._h))

    @property
    def evictions(self) -> int:
        return int(self._lib.lca_evictions(self._h))
