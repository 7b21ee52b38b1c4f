"""Native (C++) graph-core runtime with transparent numpy fallback.

Compiled lazily on first use (g++ -O3 -shared -fPIC, cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a toolchain. The C ABI is consumed through ctypes (pybind11 is not
in the image).

Scope note: edge set-algebra (union/difference) was prototyped here too but
a key-packed np.unique is ~18x faster than a hash-set C++ implementation at
millions of edges, so those live vectorized in graph/build.py; the native
layer keeps what actually wins — the k-core peel (6.6x over the vectorized
numpy fixed-point, orders of magnitude over the reference's dict loops).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "graph_core.cpp")
_LIB_PATH = os.path.join(_HERE, "_graph_core.so")
_lock = threading.Lock()
_lib = None
_unavailable = False


def _load():
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    with _lock:
        if _lib is not None or _unavailable:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-march=native",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        _SRC,
                        "-o",
                        _LIB_PATH,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            i64p = ctypes.POINTER(ctypes.c_int64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.kcore.argtypes = [i64p, i64p] + [ctypes.c_int64] * 4 + [u8p, u8p]
            lib.kcore.restype = None
            lib.parse_gowalla.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                i64p,
                i64p,
                i64p,
            ]
            lib.parse_gowalla.restype = ctypes.c_int64
            lib.parse_adjacency.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.c_int64,
                i64p,
                i64p,
            ]
            lib.parse_adjacency.restype = ctypes.c_int64
            for fn in (lib.parse_yelp, lib.parse_amazon):
                fn.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_int64,
                    i64p,
                    i64p,
                    i64p,
                    i64p,
                    i64p,
                ]
                fn.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _unavailable = True
    return _lib


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_available() -> bool:
    return _load() is not None


def kcore_masks(users, items, n_users, n_items, min_inter):
    """Keep-flags of the (min_inter)-core over a DEDUPLICATED bipartite edge
    list with dense ids. Returns (keep_users bool[n_users], keep_items)."""
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    lib = _load()
    if lib is not None:
        ku = np.empty(n_users, dtype=np.uint8)
        ki = np.empty(n_items, dtype=np.uint8)
        lib.kcore(
            _p64(users),
            _p64(items),
            len(users),
            n_users,
            n_items,
            min_inter,
            ku.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ki.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return ku.astype(bool), ki.astype(bool)
    # numpy fallback: iterative masked degree recount
    ku = np.ones(n_users, dtype=bool)
    ki = np.ones(n_items, dtype=bool)
    while True:
        live = ku[users] & ki[items]
        u_deg = np.bincount(users[live], minlength=n_users)
        i_deg = np.bincount(items[live], minlength=n_items)
        new_ku = ku & (u_deg >= min_inter)
        new_ki = ki & (i_deg >= min_inter)
        if new_ku.sum() == ku.sum() and new_ki.sum() == ki.sum():
            return new_ku, new_ki
        ku, ki = new_ku, new_ki


def parse_gowalla_file(path):
    """Parse Gowalla_totalCheckins.txt -> (users, items, ts int64 arrays).

    Native: direct fixed-format scan (the reference's per-line
    time.strptime, dataset.py:183-186, is minutes at the 6.4M-line full
    file). Fallback: vectorized numpy split + np.datetime64. Timestamps are
    UTC epoch seconds in both paths (the reference's time.mktime was
    host-timezone dependent; the chronological split consumes only the
    ordering, which is unchanged).
    """
    lib = _load()
    if lib is not None:
        size = os.path.getsize(path)
        cap = size // 20 + 16  # >= line count (min line ~ 29 bytes)
        users = np.empty(cap, dtype=np.int64)
        items = np.empty(cap, dtype=np.int64)
        ts = np.empty(cap, dtype=np.int64)
        n = lib.parse_gowalla(
            path.encode(), cap, _p64(users), _p64(items), _p64(ts)
        )
        if n >= 0:
            return users[:n].copy(), items[:n].copy(), ts[:n].copy()
    # numpy fallback
    raw = np.loadtxt(path, dtype=str, delimiter="\t", ndmin=2)
    users = raw[:, 0].astype(np.int64)
    items = raw[:, 4].astype(np.int64)
    ts = (
        raw[:, 1].astype("datetime64[s]").astype(np.int64)
        if len(raw)
        else np.zeros(0, np.int64)
    )
    return users, items, ts


def _parse_interned(fn_name, path, min_line_bytes):
    """Shared driver for the interning parsers (yelp/amazon): returns
    (users, items, ts) dense-int64 arrays of the KEPT interactions, or None
    when the native library is unavailable or declined the file (the caller
    then runs its exact python parser)."""
    lib = _load()
    if lib is None:
        return None
    size = os.path.getsize(path)
    cap = size // min_line_bytes + 16
    users = np.empty(cap, dtype=np.int64)
    items = np.empty(cap, dtype=np.int64)
    ts = np.empty(cap, dtype=np.int64)
    ndu = np.zeros(1, dtype=np.int64)
    ndi = np.zeros(1, dtype=np.int64)
    n = getattr(lib, fn_name)(
        path.encode(), cap, _p64(users), _p64(items), _p64(ts), _p64(ndu), _p64(ndi)
    )
    if n < 0:
        return None
    return users[:n].copy(), items[:n].copy(), ts[:n].copy()


def parse_yelp_file(path):
    """yelp_academic_dataset_review.json -> kept (stars > 3) interactions as
    dense-interned (users, items, ts) int64 arrays, or None (caller falls
    back to the exact json.loads path). Interning is first-seen order, which
    downstream re-indexing (remove_sparse_ui) makes parity-preserving."""
    # min JSON review line in the real dataset is far above 80 bytes
    return _parse_interned("parse_yelp", path, 80)


def parse_amazon_file(path):
    """ratings_Books.csv -> kept (rating > 3) interactions as dense-interned
    (users, items, ts) int64 arrays, or None for the python fallback."""
    return _parse_interned("parse_amazon", path, 8)


def parse_adjacency_file(path):
    """Parse 'user item item ...' text (ProcessedDataset train/val/test.txt,
    reference dataset.py:140-164: the leading user token is discarded, line
    order is the user id) -> (flat_items int64, offsets int64[n_lines+1])."""
    lib = _load()
    if lib is not None:
        size = os.path.getsize(path)
        cap_items = size // 2 + 16
        cap_lines = size // 2 + 16
        flat = np.empty(cap_items, dtype=np.int64)
        offs = np.empty(cap_lines + 1, dtype=np.int64)
        n = lib.parse_adjacency(
            path.encode(), cap_items, cap_lines, _p64(flat), _p64(offs)
        )
        if n >= 0:
            n_items = int(offs[n])
            return flat[:n_items].copy(), offs[: n + 1].copy()
    # python fallback (reference semantics)
    with open(path, "r") as f:
        lines = f.read().strip().split("\n")
    flat, offs = [], [0]
    for line in lines:
        toks = line.split(" ")[1:]
        flat.extend(int(t) for t in toks if t)
        offs.append(len(flat))
    return np.asarray(flat, dtype=np.int64), np.asarray(offs, dtype=np.int64)
