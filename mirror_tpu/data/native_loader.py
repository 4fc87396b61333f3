"""ctypes bindings for the native (C++) batch-assembly loader.

``native/mirror_loader.cpp`` assembles [B, T, D] training batches from
per-slide ``.npy`` feature files with GIL-free worker threads (mmap + token
sampling + gather in one pass). This module builds the shared library on
first use (g++, cached next to the source) and exposes:

- ``available()``            — True when the library compiled and loaded
- ``npy_shape(path)``        — (rows, cols) without reading the data
- ``gather_batch(paths, n_tokens, seeds, ...)`` — the batch assembly

The Python loader (``mirror_tpu.data.loader``) uses this automatically for
``.npy`` cohorts and falls back to the numpy path otherwise. Token-sampling
semantics match the reference (with replacement iff a slide has fewer rows
than requested, datasets/dataset_pretrain.py:157-161); the RNG streams differ
from numpy's (documented — sampling is random either way).
"""

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "mirror_loader.cpp"))
_LIB = os.path.abspath(os.path.join(_NATIVE_DIR, "libmirror_loader.so"))

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # compile to a per-pid temp path and os.rename into place: two processes
    # building concurrently (pytest -n, parallel fold jobs) must not
    # interleave writes into the same .so (a corrupt library with a fresh
    # mtime would look up-to-date and disable the fast path forever)
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", tmp, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        msg = getattr(e, "stderr", str(e))
        _logger.warning("native loader build failed: %s", msg)
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        needs_build = not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            _logger.warning("native loader load failed: %s", e)
            return None
        lib.mirror_npy_shape.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mirror_npy_shape.restype = ctypes.c_int
        lib.mirror_gather_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,  # batch
            ctypes.c_int64,  # n_tokens
            ctypes.c_int64,  # feature_dim
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,  # num_threads
        ]
        lib.mirror_gather_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def npy_shape(path: str) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.mirror_npy_shape(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise ValueError(f"mirror_npy_shape({path}) failed: {rc}")
    return rows.value, cols.value


def gather_batch(
    paths: Sequence[str],
    n_tokens: int,
    seeds: Sequence[int],
    feature_dim: Optional[int] = None,
    num_threads: int = 8,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Assemble [len(paths), n_tokens, D] float32 from .npy feature files."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    if feature_dim is None:
        _, feature_dim = npy_shape(paths[0])
    batch = len(paths)
    if len(seeds) != batch:
        # a short seeds list would zero-fill the ctypes array: trailing
        # slides silently resampled with seed 0 every single batch
        raise ValueError(f"{len(seeds)} seeds for {batch} paths")
    if out is None:
        out = np.empty((batch, n_tokens, feature_dim), dtype=np.float32)
    # real checks (assert vanishes under python -O): C++ writes
    # batch*n_tokens*D contiguous floats through the base pointer
    if out.shape != (batch, n_tokens, feature_dim) or out.dtype != np.float32:
        raise ValueError(
            f"out must be float32 {(batch, n_tokens, feature_dim)}, "
            f"got {out.dtype} {out.shape}"
        )
    if not out.flags["C_CONTIGUOUS"]:
        raise ValueError("out must be C-contiguous")

    c_paths = (ctypes.c_char_p * batch)(*[p.encode() for p in paths])
    c_seeds = (ctypes.c_uint64 * batch)(*[int(s) & (2**64 - 1) for s in seeds])
    rc = lib.mirror_gather_batch(
        c_paths, batch, n_tokens, feature_dim, c_seeds,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if rc != 0:
        # the C++ side keeps only an error CODE (whichever failing worker
        # reported first); re-probe the files one at a time so the error
        # names the offending path instead of leaving the operator to
        # bisect the batch by hand
        culprit = ""
        for p, s in zip(paths, seeds):
            one = np.empty((1, n_tokens, feature_dim), np.float32)
            rc1 = lib.mirror_gather_batch(
                (ctypes.c_char_p * 1)(p.encode()), 1, n_tokens, feature_dim,
                (ctypes.c_uint64 * 1)(int(s) & (2**64 - 1)),
                one.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 1,
            )
            if rc1 != 0:
                culprit = f" (first failing file: {p}, code {rc1})"
                break
        raise ValueError(f"mirror_gather_batch failed with code {rc}{culprit}")
    return out
