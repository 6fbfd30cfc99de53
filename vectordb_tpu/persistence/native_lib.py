"""Loader for the native persistence core (libvdbwal.so).

Compiles vectordb_tpu/persistence/native/walcore.cpp on first use (g++,
cached as a .so next to the source) and exposes it through ctypes. Set
``VDB_TPU_NO_NATIVE=1`` to force the pure-Python fallbacks (every caller in
this package has one, with an identical on-disk format).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvdbwal.so"
_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.vdb_crc32.argtypes = [u8p, ctypes.c_uint64]
    lib.vdb_crc32.restype = ctypes.c_uint32
    lib.vdb_wal_open.argtypes = [ctypes.c_char_p]
    lib.vdb_wal_open.restype = ctypes.c_void_p
    lib.vdb_wal_append.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint32]
    lib.vdb_wal_append.restype = ctypes.c_int
    lib.vdb_wal_sync.argtypes = [ctypes.c_void_p]
    lib.vdb_wal_sync.restype = ctypes.c_int
    lib.vdb_wal_append_raw.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint64]
    lib.vdb_wal_append_raw.restype = ctypes.c_int
    lib.vdb_wal_truncate.argtypes = [ctypes.c_void_p]
    lib.vdb_wal_truncate.restype = ctypes.c_int
    lib.vdb_wal_close.argtypes = [ctypes.c_void_p]
    lib.vdb_wal_close.restype = None
    lib.vdb_wal_scan.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int64)]
    lib.vdb_wal_scan.restype = ctypes.c_int64
    lib.vdb_durable_write.argtypes = [ctypes.c_char_p, u8p, ctypes.c_uint64]
    lib.vdb_durable_write.restype = ctypes.c_int
    lib.vdb_mmf_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.vdb_mmf_create.restype = ctypes.c_void_p
    lib.vdb_mmf_open.argtypes = [ctypes.c_char_p]
    lib.vdb_mmf_open.restype = ctypes.c_void_p
    lib.vdb_mmf_dim.argtypes = [ctypes.c_void_p]
    lib.vdb_mmf_dim.restype = ctypes.c_uint32
    lib.vdb_mmf_count.argtypes = [ctypes.c_void_p]
    lib.vdb_mmf_count.restype = ctypes.c_uint32
    lib.vdb_mmf_append.argtypes = [ctypes.c_void_p, f32p]
    lib.vdb_mmf_append.restype = ctypes.c_int64
    lib.vdb_mmf_get.argtypes = [ctypes.c_void_p, ctypes.c_uint32, f32p]
    lib.vdb_mmf_get.restype = ctypes.c_int
    lib.vdb_mmf_read_range.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                       ctypes.c_uint32, f32p]
    lib.vdb_mmf_read_range.restype = ctypes.c_int
    lib.vdb_mmf_close.argtypes = [ctypes.c_void_p]
    lib.vdb_mmf_close.restype = None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.vdb_hnsw_create.argtypes = [ctypes.c_uint32] * 6 + [
        ctypes.c_uint64, ctypes.c_double]
    lib.vdb_hnsw_create.restype = ctypes.c_void_p
    lib.vdb_hnsw_free.argtypes = [ctypes.c_void_p]
    lib.vdb_hnsw_free.restype = None
    lib.vdb_hnsw_insert.argtypes = [ctypes.c_void_p, ctypes.c_int64, f32p]
    lib.vdb_hnsw_insert.restype = ctypes.c_int64
    lib.vdb_hnsw_insert_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), f32p,
        ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.vdb_hnsw_insert_batch.restype = None
    lib.vdb_hnsw_remove_slot.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.vdb_hnsw_remove_slot.restype = None
    lib.vdb_hnsw_search.argtypes = [ctypes.c_void_p, f32p, ctypes.c_uint32,
                                    ctypes.c_uint32, i64p, f32p]
    lib.vdb_hnsw_search.restype = ctypes.c_int64
    lib.vdb_hnsw_search_masked.argtypes = [
        ctypes.c_void_p, f32p, ctypes.c_uint32, ctypes.c_uint32, u8p,
        ctypes.c_int64, i64p, f32p]
    lib.vdb_hnsw_search_masked.restype = ctypes.c_int64
    lib.vdb_hnsw_len.argtypes = [ctypes.c_void_p]
    lib.vdb_hnsw_len.restype = ctypes.c_int64
    lib.vdb_hnsw_capacity.argtypes = [ctypes.c_void_p]
    lib.vdb_hnsw_capacity.restype = ctypes.c_int64
    lib.vdb_hnsw_entry.argtypes = [ctypes.c_void_p]
    lib.vdb_hnsw_entry.restype = ctypes.c_int32
    lib.vdb_hnsw_max_level.argtypes = [ctypes.c_void_p]
    lib.vdb_hnsw_max_level.restype = ctypes.c_int32
    lib.vdb_hnsw_version.argtypes = [ctypes.c_void_p]
    lib.vdb_hnsw_version.restype = ctypes.c_uint64
    lib.vdb_hnsw_get_slot.argtypes = [ctypes.c_void_p, ctypes.c_int32, f32p]
    lib.vdb_hnsw_get_slot.restype = ctypes.c_int
    lib.vdb_hnsw_export.argtypes = [ctypes.c_void_p, f32p, f32p, i32p, i32p,
                                    i64p, ctypes.POINTER(ctypes.c_uint8)]
    lib.vdb_hnsw_export.restype = ctypes.c_int
    lib.vdb_hnsw_import.argtypes = [ctypes.c_void_p, f32p, i32p, i32p, i64p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int64, ctypes.c_int32,
                                    ctypes.c_int32]
    lib.vdb_hnsw_import.restype = ctypes.c_int
    lib.vdb_http_start.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.vdb_http_start.restype = ctypes.c_void_p
    lib.vdb_http_port.argtypes = [ctypes.c_void_p]
    lib.vdb_http_port.restype = ctypes.c_int
    lib.vdb_http_stop.argtypes = [ctypes.c_void_p]
    lib.vdb_http_stop.restype = None
    lib.vdb_http_next_jobs.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64,
                                       ctypes.c_int]
    lib.vdb_http_next_jobs.restype = ctypes.c_int64
    lib.vdb_http_respond.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                     ctypes.c_int, u8p, ctypes.c_int64]
    lib.vdb_http_respond.restype = ctypes.c_int
    i32p = ctypes.POINTER(ctypes.c_int32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.vdb_http_respond_search.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, u8p, u32p, f64p,
        ctypes.c_int32]
    lib.vdb_http_respond_search.restype = ctypes.c_int
    lib.vdb_http_respond_search_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, u8p, u32p, f64p,
        i32p, ctypes.c_int32]
    lib.vdb_http_respond_search_batch.restype = ctypes.c_int
    return lib


def get_native() -> Optional[ctypes.CDLL]:
    """The configured native library, building it if necessary.
    Returns None when disabled or unavailable."""
    global _lib, _lib_failed
    if os.environ.get("VDB_TPU_NO_NATIVE"):
        return None
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    with _build_lock:
        if _lib is not None:
            return _lib
        try:
            newest_src = max(
                (_NATIVE_DIR / name).stat().st_mtime
                for name in ("walcore.cpp", "hnswcore.cpp", "httpcore.cpp"))
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < newest_src:
                subprocess.run(
                    ["make", "-s", "-C", str(_NATIVE_DIR), "libvdbwal.so"],
                    check=True, capture_output=True, timeout=120)
            _lib = _configure(ctypes.CDLL(str(_LIB_PATH)))
            return _lib
        except Exception:
            _lib_failed = True
            return None


def as_u8p(data: bytes):
    return ctypes.cast(ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))


__all__ = ["get_native", "as_u8p"]
