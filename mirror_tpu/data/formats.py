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
    return [f for f in os.listdir(directory) if f.endswith(_FEATURE_EXTS)]


def save_feature_file(path: str, array: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, array)
    elif path.endswith(".pt"):
        import torch

        torch.save(torch.from_numpy(np.ascontiguousarray(array)), path)
    else:
        raise ValueError(f"Unsupported feature file: {path}")
