#!/usr/bin/env python
"""Convert reference-era torch ``.pt`` feature files to native ``.npy``.

``.npy`` cohorts unlock the C++ batch-assembly fast path
(mirror_tpu/data/native_loader.py) and mmap-based reads; ``.pt`` stays
readable everywhere for drop-in compatibility.
"""

import argparse
import logging
import os

import numpy as np

from mirror_tpu.data.formats import load_feature_file

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("convert_features")


def convert_dir(src: str, dst: str, delete_src: bool = False) -> int:
    os.makedirs(dst, exist_ok=True)
    n = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        for f in sorted(files):
            if not f.endswith(".pt"):
                continue
            arr = np.asarray(load_feature_file(os.path.join(root, f)), np.float32)
            out_dir = os.path.join(dst, rel) if rel != "." else dst
            os.makedirs(out_dir, exist_ok=True)
            out = os.path.join(out_dir, f[:-3] + ".npy")
            np.save(out, arr)
            if delete_src:
                os.remove(os.path.join(root, f))
            n += 1
    _logger.info("converted %d files from %s to %s", n, src, dst)
    return n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--delete-src", action="store_true")
    a = p.parse_args()
    convert_dir(a.src, a.dst, a.delete_src)


if __name__ == "__main__":
    main()
