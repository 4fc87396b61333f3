"""Feature-file IO.

The reference stores per-slide features as torch ``.pt`` tensors
(tools/feature_generation/gen_patch_feature.py:167-168). We read those for
drop-in compatibility (torch-cpu is only imported on demand) and prefer
``.npy`` as the native format — zero-copy mmap-able, no pickle, no torch.
"""

import os
from typing import List

import numpy as np

_FEATURE_EXTS = (".npy", ".pt", ".npz")


def load_feature_file(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path, mmap_mode="r")
    if path.endswith(".npz"):
        with np.load(path) as z:
            return z[z.files[0]]
    if path.endswith(".pt"):
        import torch

        t = torch.load(path, map_location="cpu", weights_only=True)
        return t.numpy()
    raise ValueError(f"Unsupported feature file: {path}")


def find_feature_file(directory: str, slide_id: str) -> str:
    for ext in _FEATURE_EXTS:
        p = os.path.join(directory, slide_id + ext)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"No feature file for {slide_id} in {directory}")


def list_feature_files(directory: str) -> List[str]:
    """One file per slide id, sorted. A slide present in several formats
    (e.g. X.npy next to X.pt after tools/convert_features.py) is listed
    once, preferring the _FEATURE_EXTS order (.npy, the native format,
    first) — otherwise such slides would be silently double-counted by the
    datasets (twice per epoch, twice in class-balanced weights)."""
    by_id: dict = {}
    for f in os.listdir(directory):
        if not f.endswith(_FEATURE_EXTS):
            continue
        sid = f.split(".")[0]
        prev = by_id.get(sid)
        if prev is None or _ext_rank(f) < _ext_rank(prev):
            by_id[sid] = f
    return sorted(by_id.values())


def _ext_rank(fname: str) -> int:
    for i, ext in enumerate(_FEATURE_EXTS):
        if fname.endswith(ext):
            return i
    return len(_FEATURE_EXTS)


def save_feature_file(path: str, array: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, array)
    elif path.endswith(".pt"):
        import torch

        arr = np.ascontiguousarray(array)
        if not arr.flags.writeable:  # mmap-backed input: torch needs writable
            arr = arr.copy()
        torch.save(torch.from_numpy(arr), path)
    else:
        raise ValueError(f"Unsupported feature file: {path}")
