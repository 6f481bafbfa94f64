"""ctypes bindings for the native host library (mpx/native/scamp_host.cpp).

Built on demand with g++ (no pybind11 in the image); the shared object is
cached next to the source keyed by a source hash.  All entry points have
pure-numpy fallbacks, so the framework works without a toolchain — the
native paths are for exact float64 host precompute and large-n golden
validation at C speed.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "scamp_host.cpp")
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERROR = None


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"_scamp_host_{tag}.so")


def _build(so: str):
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-std=c++17", _SRC, "-o", so,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _bind(lib):
    i64, f64p, i32p = (
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    )
    lib.mpx_precompute.argtypes = [f64p, i64, i64, f64p, f64p, f64p, f64p, f64p]
    lib.mpx_precompute.restype = None
    lib.mpx_precompute_stats.argtypes = [f64p, i64, i64, f64p, f64p]
    lib.mpx_precompute_stats.restype = None
    lib.mpx_golden_scamp.argtypes = [f64p, i64, i64, f64p, i32p]
    lib.mpx_golden_scamp.restype = None
    lib.mpx_merge_aggregates.argtypes = [f64p, i32p, f64p, i32p, i64]
    lib.mpx_merge_aggregates.restype = None
    lib.mpx_rescore.argtypes = [f64p, f64p, f64p, i64, i32p, i32p, i64, f64p]
    lib.mpx_rescore.restype = None
    lib.mpx_resolve_sym.argtypes = [
        f64p, f64p, f64p, i64, i32p, i32p, i64, f64p, i32p,
    ]
    lib.mpx_resolve_sym.restype = None
    lib.mpx_resolve_slots.argtypes = [
        f64p, f64p, f64p, i64, i32p, i64, i64, f64p, i32p,
    ]
    lib.mpx_resolve_slots.restype = None
    lib.mpx_resolve_slots_ab.argtypes = [
        f64p, f64p, f64p, f64p, f64p, f64p, i64, i32p, i64, i64, i64,
        f64p, i32p,
    ]
    lib.mpx_resolve_slots_ab.restype = None
    lib.mpx_row_scan.argtypes = [
        f64p, f64p, f64p, i64, i64, i64, i32p, i64, f64p, i32p,
    ]
    lib.mpx_row_scan.restype = None
    lib.mpx_rescore_ab.argtypes = [
        f64p, f64p, f64p, f64p, f64p, f64p, i64, i32p, i32p, i64, f64p,
    ]
    lib.mpx_rescore_ab.restype = None
    lib.mpx_row_scan_ab.argtypes = [
        f64p, f64p, f64p, f64p, f64p, f64p, i64, i64, i64, i32p, i64,
        f64p, i32p,
    ]
    lib.mpx_row_scan_ab.restype = None
    return lib


def load():
    """Load (building if needed) the native library, or raise."""
    global _LIB, _BUILD_ERROR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_ERROR is not None:
            raise _BUILD_ERROR
        so = _so_path()
        try:
            if not os.path.exists(so):
                _build(so)
            _LIB = _bind(ctypes.CDLL(so))
            return _LIB
        except Exception as e:  # toolchain missing / build failure
            _BUILD_ERROR = RuntimeError(f"native build failed: {e}")
            raise _BUILD_ERROR


def is_available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def precompute(T: np.ndarray, m: int):
    """Exact float64 statistics via the native single-pass kernel."""
    lib = load()
    T = np.ascontiguousarray(T, dtype=np.float64)
    w = T.shape[0] - m + 1
    mu = np.empty(w)
    df = np.empty(w)
    dg = np.empty(w)
    inv = np.empty(w)
    qt0 = np.empty(w)
    lib.mpx_precompute(T, T.shape[0], m, mu, df, dg, inv, qt0)
    return {"mu": mu, "df": df, "dg": dg, "inv": inv, "qt0": qt0}


def precompute_stats(T: np.ndarray, m: int):
    """Exact float64 mu/inv only (the hybrid tier's host statistics) —
    skips df/dg/qt0 and runs the vectorized 8-accumulator reduction
    (~9x faster than :func:`precompute` at n=2^20 on one core)."""
    lib = load()
    T = np.ascontiguousarray(T, dtype=np.float64)
    w = T.shape[0] - m + 1
    mu = np.empty(w)
    inv = np.empty(w)
    lib.mpx_precompute_stats(T, T.shape[0], m, mu, inv)
    return {"mu": mu, "inv": inv}


def golden_scamp(T: np.ndarray, m: int):
    """O(n^2) golden SCAMP at C speed (OpenMP over diagonals)."""
    lib = load()
    T = np.ascontiguousarray(T, dtype=np.float64)
    w = T.shape[0] - m + 1
    MP = np.empty(w)
    MPI = np.empty(w, dtype=np.int32)
    lib.mpx_golden_scamp(T, T.shape[0], m, MP, MPI)
    return MP, MPI


def rescore(T, mu, inv, m: int, rows, cols):
    """Exact f64 Pearson P for explicit (rows[i], cols[i]) pairs."""
    lib = load()
    T = np.ascontiguousarray(T, np.float64)
    mu = np.ascontiguousarray(mu, np.float64)
    inv = np.ascontiguousarray(inv, np.float64)
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    P = np.empty(rows.shape[0], np.float64)
    lib.mpx_rescore(T, mu, inv, m, rows, cols, rows.shape[0], P)
    return P


def resolve_sym(T, mu, inv, m: int, rows, cols, w: int):
    """Self-join pair resolution: exact f64 P for each unordered
    (rows[i], cols[i]) pair, merged into BOTH endpoints' per-row best
    under the strict-greater / smallest-index-tie rule.  Returns
    (bestP (w,), bestI (w,)) initialized to the aggregate inits."""
    lib = load()
    T = np.ascontiguousarray(T, np.float64)
    mu = np.ascontiguousarray(mu, np.float64)
    inv = np.ascontiguousarray(inv, np.float64)
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    bestP = np.full(w, -1e12, np.float64)
    bestI = np.full(w, -1, np.int32)
    lib.mpx_resolve_sym(T, mu, inv, m, rows, cols, rows.shape[0], bestP, bestI)
    return bestP, bestI


def resolve_slots(T, mu, inv, m: int, cand, w: int):
    """Self-join resolution from the raw (w, nslots) capture matrix:
    dedupe, symmetric-pair filtering, exact f64 scoring, and both-end
    merging all happen in one C pass (see mpx_resolve_slots)."""
    lib = load()
    T = np.ascontiguousarray(T, np.float64)
    mu = np.ascontiguousarray(mu, np.float64)
    inv = np.ascontiguousarray(inv, np.float64)
    cand = np.ascontiguousarray(cand, np.int32)
    bestP = np.full(w, -1e12, np.float64)
    bestI = np.full(w, -1, np.int32)
    lib.mpx_resolve_slots(
        T, mu, inv, m, cand, w, cand.shape[1], bestP, bestI
    )
    return bestP, bestI


def resolve_slots_ab(Tq, muq, invq, Tt, mut, invt, m: int, cand,
                     wq: int, wt: int):
    """One-sided slot resolution (left/right and AB-joins): per-query-
    row best over its raw capture slots, scored exactly against the
    target series (see mpx_resolve_slots_ab)."""
    lib = load()
    args = [np.ascontiguousarray(x, np.float64)
            for x in (Tq, muq, invq, Tt, mut, invt)]
    cand = np.ascontiguousarray(cand, np.int32)
    bestP = np.full(wq, -1e12, np.float64)
    bestI = np.full(wq, -1, np.int32)
    lib.mpx_resolve_slots_ab(
        *args, m, cand, wq, wt, cand.shape[1], bestP, bestI
    )
    return bestP, bestI


def row_scan(T, mu, inv, m: int, w: int, excl: int, rows):
    """Exact f64 best (P, index) over all valid neighbors of each row."""
    lib = load()
    T = np.ascontiguousarray(T, np.float64)
    mu = np.ascontiguousarray(mu, np.float64)
    inv = np.ascontiguousarray(inv, np.float64)
    rows = np.ascontiguousarray(rows, np.int32)
    bestP = np.empty(rows.shape[0], np.float64)
    bestI = np.empty(rows.shape[0], np.int32)
    lib.mpx_row_scan(T, mu, inv, m, w, excl, rows, rows.shape[0], bestP, bestI)
    return bestP, bestI


def rescore_ab(Tq, muq, invq, Tt, mut, invt, m: int, rows, cols):
    """Exact f64 Pearson for (query rows[i], target cols[i]) pairs."""
    lib = load()
    args = [np.ascontiguousarray(x, np.float64)
            for x in (Tq, muq, invq, Tt, mut, invt)]
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    P = np.empty(rows.shape[0], np.float64)
    lib.mpx_rescore_ab(*args, m, rows, cols, rows.shape[0], P)
    return P


def row_scan_ab(Tq, muq, invq, Tt, mut, invt, m: int, wt: int, excl: int,
                rows):
    """Exact f64 best target neighbor per query row (excl<0: no zone)."""
    lib = load()
    args = [np.ascontiguousarray(x, np.float64)
            for x in (Tq, muq, invq, Tt, mut, invt)]
    rows = np.ascontiguousarray(rows, np.int32)
    bestP = np.empty(rows.shape[0], np.float64)
    bestI = np.empty(rows.shape[0], np.int32)
    lib.mpx_row_scan_ab(*args, m, wt, excl, rows, rows.shape[0], bestP, bestI)
    return bestP, bestI


def merge_aggregates(a_val, a_idx, b_val, b_idx):
    lib = load()
    a_val = np.ascontiguousarray(a_val, np.float64)
    a_idx = np.ascontiguousarray(a_idx, np.int32)
    lib.mpx_merge_aggregates(
        a_val, a_idx,
        np.ascontiguousarray(b_val, np.float64),
        np.ascontiguousarray(b_idx, np.int32),
        a_val.shape[0],
    )
    return a_val, a_idx
