"""Native (C++) runtime components, loaded via ctypes.

The BAM scanner is the production ingest path: multithreaded BGZF inflate +
single-pass record filtering in C++ (the reference's equivalent,
Isas.SequencingFiles, was compiled code too; SURVEY.md §7 layer 1).  It is
built on first use with g++ and falls back to the pure-Python reader when a
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "bam_scanner.cpp"
_LIB = Path(__file__).parent / "libbam_scanner.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB),
                 str(_SRC), "-lz", "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.scan_read_starts.restype = ctypes.c_int64
        lib.scan_read_starts.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.read_bam_header.restype = ctypes.c_int32
        lib.read_bam_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def read_bam_refs(path: str) -> list[tuple[str, int]] | None:
    """Native header read: [(name, length), ...] or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    max_refs = 4096
    lengths = (ctypes.c_int64 * max_refs)()
    names_buf = ctypes.create_string_buffer(1 << 20)
    n = lib.read_bam_header(path.encode(), lengths, names_buf,
                            len(names_buf), max_refs)
    if n < 0:
        return None
    names = names_buf.raw.split(b"\x00")[:n]
    return [(names[i].decode(), int(lengths[i])) for i in range(min(n, max_refs))]


def scan_read_starts(
    path: str, ref_index: int, ref_length: int,
    paired_end: bool = True, binary_mode: bool = False,
    n_threads: int = 0,
) -> np.ndarray | None:
    """Native read-start counting (CanvasBin filter).  Returns the uint8
    observed array or None when the native path is unavailable/fails."""
    lib = _load()
    if lib is None:
        return None
    observed = np.zeros(ref_length, dtype=np.uint8)
    kept = lib.scan_read_starts(
        path.encode(), ref_index,
        observed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ref_length, int(paired_end), int(binary_mode), n_threads)
    if kept < 0:
        return None
    return observed
