"""ctypes bindings for the native (C++) host-side graph tooling.

Builds `libkgat_native.so` from graph_builder.cpp on first import if
missing (g++ -O3; ~1s), caches it next to this file. Every entry point has
a pure-numpy fallback in kgat_tpu.graph / kgat_tpu.data — import failure
here degrades gracefully to those.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_builder.cpp")
_SO = os.path.join(_DIR, "libkgat_native.so")


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             _SRC, "-o", _SO + ".tmp"],
            check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
    return _SO


_lib = ctypes.CDLL(_build())

_lib.kgat_count_pairs.restype = ctypes.c_int64
_lib.kgat_count_pairs.argtypes = [ctypes.c_char_p]
_lib.kgat_parse_pairs.restype = ctypes.c_int64
_lib.kgat_parse_pairs.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
_lib.kgat_count_triples.restype = ctypes.c_int64
_lib.kgat_count_triples.argtypes = [ctypes.c_char_p]
_lib.kgat_parse_triples.restype = ctypes.c_int64
_lib.kgat_parse_triples.argtypes = [
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
_lib.kgat_sort_perm.restype = None
_lib.kgat_sort_perm.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int64)]
_lib.kgat_csr_offsets.restype = None
_lib.kgat_csr_offsets.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int64)]


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_user_items(path: str) -> np.ndarray:
    """Parse 'uid iid iid ...' lines -> (n, 2) int64 pairs."""
    n = _lib.kgat_count_pairs(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    u = np.empty(n, np.int64)
    i = np.empty(n, np.int64)
    got = _lib.kgat_parse_pairs(path.encode(), _i64p(u), _i64p(i), n)
    if got != n:
        raise RuntimeError(f"parse mismatch in {path}: {got} vs {n}")
    return np.stack([u, i], axis=1)


def parse_triples(path: str) -> np.ndarray:
    """Parse 'h r t' lines -> (n, 3) int64 triples."""
    cap = _lib.kgat_count_triples(path.encode())
    if cap < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((cap, 3), np.int64)
    got = _lib.kgat_parse_triples(path.encode(), _i64p(out), cap)
    if got < 0:
        raise RuntimeError(f"parse failed in {path}")
    return out[:got]


def sort_perm(keys: np.ndarray, n_keys: int) -> np.ndarray:
    """Stable counting-sort permutation of int32 keys (DGL coo2csr analog)."""
    keys = np.ascontiguousarray(keys, np.int32)
    perm = np.empty(len(keys), np.int64)
    _lib.kgat_sort_perm(_i32p(keys), len(keys), int(n_keys), _i64p(perm))
    return perm


def csr_offsets(sorted_keys: np.ndarray, n_segments: int) -> np.ndarray:
    sorted_keys = np.ascontiguousarray(sorted_keys, np.int32)
    out = np.empty(n_segments + 1, np.int64)
    _lib.kgat_csr_offsets(_i32p(sorted_keys), len(sorted_keys),
                          int(n_segments), _i64p(out))
    return out
