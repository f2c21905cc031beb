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


_lib.kgat_aligned_fill.restype = None
_lib.kgat_aligned_fill.argtypes = [
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32)]


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


def aligned_fill(order: np.ndarray, seg: np.ndarray, other: np.ndarray,
                 ro: np.ndarray, blk_start: np.ndarray, n_nodes: int,
                 block_rows: int, chunk_edges: int, dead_slot: int,
                 e_al: int):
    """One-pass aligned-layout fill (the O(E) part of the layout build).

    Returns (gather, node, seg_al, bounds, chunk_block) — identical to the
    numpy path in kgat_tpu.graph._build_aligned_layout.
    """
    order = np.ascontiguousarray(order, np.int64)
    seg = np.ascontiguousarray(seg, np.int64)
    other = np.ascontiguousarray(other, np.int64)
    ro = np.ascontiguousarray(ro, np.int64)
    blk_start = np.ascontiguousarray(blk_start, np.int64)
    n_blocks = len(blk_start) - 1
    gather = np.empty(e_al, np.int32)
    node = np.empty(e_al, np.int32)
    seg_al = np.empty(e_al, np.int32)
    bounds = np.empty((n_blocks, block_rows, 8), np.int32)
    chunk_block = np.empty(e_al // chunk_edges, np.int32)
    _lib.kgat_aligned_fill(
        _i64p(order), _i64p(seg), _i64p(other), len(seg), _i64p(ro),
        _i64p(blk_start), n_blocks, int(n_nodes), int(block_rows),
        int(chunk_edges), int(dead_slot), int(e_al),
        _i32p(gather), _i32p(node), _i32p(seg_al),
        _i32p(bounds), _i32p(chunk_block))
    return gather, node, seg_al, bounds, chunk_block
