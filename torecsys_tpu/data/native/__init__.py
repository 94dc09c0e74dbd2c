"""Native (C++) host input-pipeline components.

The compute path is JAX/XLA on TPU; the host side — file parsing, hashing,
collation into fixed-shape batches — is plain CPU work where native code
pays. This module compiles ``criteo_parser.cc`` on first use (g++, cached
next to the source) and exposes it through ctypes, with a bit-identical
pure-NumPy fallback when no toolchain is available.

Reference analogue: the pandas Criteo loader
(``/root/reference/torecsys/data/sample_data/load_data.py:66``) and the
per-row Python collate (``data/dataloader/collate_fn.py:53-128``).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

NUM_DENSE = 13
NUM_CATS = 26

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "criteo_parser.cc")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _cached_lib_path() -> str:
    """Per-machine build-cache path keyed by a hash of the source.

    The binary is never committed: every machine compiles its own (git does
    not preserve mtimes and ``-march=native`` binaries are not portable), and
    the source-hash key means an edited ``.cc`` can never load stale code.
    """
    with open(_SRC, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    cache_dir = os.path.join(cache_root, "torecsys_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"_criteo_parser_{src_hash}.so")


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile + load the parser; returns None when unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            lib_path = _cached_lib_path()
            if not os.path.exists(lib_path):
                tmp_path = f"{lib_path}.tmp.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", tmp_path],
                    check=True, capture_output=True,
                )
                os.replace(tmp_path, lib_path)  # atomic vs concurrent builds
            lib = ctypes.CDLL(lib_path)
            lib.trs_parse_criteo.restype = ctypes.c_int64
            lib.trs_parse_criteo.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            _lib = lib
            return _lib
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("native criteo parser unavailable (%s); "
                           "falling back to NumPy", e)
            _build_failed = True
            return None


def native_available() -> bool:
    return _build_lib() is not None


_SRC_PRESORT = os.path.join(_HERE, "id_preprocess.cc")
_presort_lib: Optional[ctypes.CDLL] = None
_presort_failed = False


def _cached_path_for(src: str, tag: str) -> str:
    with open(src, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    cache_dir = os.path.join(cache_root, "torecsys_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"_{tag}_{src_hash}.so")


def presort_lib() -> Optional[ctypes.CDLL]:
    """Compile + load the id-stream preprocessor (``id_preprocess.cc``).

    Same hash-cached build scheme as the Criteo parser; returns None when no
    toolchain is available (callers fall back to the NumPy implementation in
    ``torecsys_tpu.data.presort``).
    """
    global _presort_lib, _presort_failed
    with _lock:
        if _presort_lib is not None:
            return _presort_lib
        if _presort_failed:
            return None
        try:
            lib_path = _cached_path_for(_SRC_PRESORT, "id_preprocess")
            if not os.path.exists(lib_path):
                tmp_path = f"{lib_path}.tmp.{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", _SRC_PRESORT, "-o", tmp_path],
                    check=True, capture_output=True,
                )
                os.replace(tmp_path, lib_path)
            lib = ctypes.CDLL(lib_path)
            lib.trs_presort_ids.restype = ctypes.c_int32
            lib.trs_presort_ids.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _presort_lib = lib
            return _presort_lib
        except (OSError, subprocess.CalledProcessError) as e:
            logger.warning("native id preprocessor unavailable (%s); "
                           "falling back to NumPy", e)
            _presort_failed = True
            return None


def _fnv1a(token: bytes) -> int:
    """FNV-1a 32-bit — must match ``fnv1a`` in criteo_parser.cc exactly."""
    h = 2166136261
    for b in token:
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _parse_dense_token(tok: bytes) -> int:
    """Strict dense-token grammar: ``[+-]?[0-9]+`` or missing → 0.

    Both parsers implement exactly this (no ``int()`` whitespace tolerance,
    no C-style partial parse), so output never depends on which path ran.
    """
    digits = tok[1:] if tok[:1] in (b"+", b"-") else tok
    if not digits or not digits.isdigit():
        return 0
    return int(tok)


def _parse_python(data: bytes, max_rows: int, hash_sizes: np.ndarray):
    """Pure-Python oracle, bit-identical to the C++ path.

    Line semantics mirror the C++ pass 1: every ``\\n``-delimited segment is
    one row (malformed segments produce all-zero rows), a trailing segment
    without a final newline still counts.
    """
    segments = data.split(b"\n")
    if segments and segments[-1] == b"":
        segments.pop()
    segments = segments[:max_rows]
    rows = len(segments)
    labels = np.zeros((max_rows,), np.float32)
    dense = np.zeros((max_rows, NUM_DENSE), np.float32)
    cats = np.zeros((max_rows, NUM_CATS), np.int32)
    for r, line in enumerate(segments):
        parts = line.rstrip(b"\r").split(b"\t")
        if len(parts) != 1 + NUM_DENSE + NUM_CATS:
            continue
        labels[r] = 1.0 if parts[0][:1] == b"1" else 0.0
        for f in range(NUM_DENSE):
            v = _parse_dense_token(parts[1 + f])
            dense[r, f] = np.log1p(np.float32(v)) if v > 0 else 0.0
        for f in range(NUM_CATS):
            tok = parts[1 + NUM_DENSE + f]
            cats[r, f] = _fnv1a(tok) % int(hash_sizes[f]) if tok else 0
    return rows, labels, dense, cats


def parse_criteo_tsv(
    data: bytes,
    hash_sizes: Sequence[int],
    max_rows: Optional[int] = None,
    num_threads: int = 0,
    force_python: bool = False,
) -> Dict[str, np.ndarray]:
    """Parse Criteo DAC TSV bytes into fixed-shape batch arrays.

    Args:
        data: raw file bytes (tab-separated, one example per line).
        hash_sizes: per-categorical-field modulus (26 entries).
        max_rows: cap on parsed rows (default: all lines).
        num_threads: C++ parse threads; 0 = os.cpu_count().
        force_python: use the NumPy fallback (testing).

    Returns:
        dict with ``label (R,) f32``, ``dense (R, 13) f32`` (log1p),
        ``cats (R, 26) int32`` (FNV-1a hashed).
    """
    hs = np.asarray(list(hash_sizes), dtype=np.int64)
    if hs.shape != (NUM_CATS,):
        raise ValueError(f"hash_sizes must have {NUM_CATS} entries, got {hs.shape}")
    if not (hs > 0).all():
        # zero would divide-by-zero in the C++ modulo; negative would emit
        # out-of-range ids via the uint64 cast — reject both up front.
        raise ValueError(f"hash_sizes must all be positive, got {hs.tolist()}")
    if max_rows is None:
        max_rows = data.count(b"\n") + (0 if data.endswith(b"\n") else 1)
    max_rows = max(0, max_rows)
    if max_rows == 0:
        return {"label": np.zeros((0,), np.float32),
                "dense": np.zeros((0, NUM_DENSE), np.float32),
                "cats": np.zeros((0, NUM_CATS), np.int32)}

    lib = None if force_python else _build_lib()
    if lib is None:
        rows, labels, dense, cats = _parse_python(data, max_rows, hs)
    else:
        labels = np.zeros((max_rows,), np.float32)
        dense = np.zeros((max_rows, NUM_DENSE), np.float32)
        cats = np.zeros((max_rows, NUM_CATS), np.int32)
        threads = num_threads or (os.cpu_count() or 1)
        rows = lib.trs_parse_criteo(
            data, len(data), max_rows,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            threads,
        )
    return {"label": labels[:rows], "dense": dense[:rows], "cats": cats[:rows]}


__all__ = ["parse_criteo_tsv", "native_available", "presort_lib",
           "NUM_DENSE", "NUM_CATS"]
