#!/usr/bin/env python
"""WSI tiling: whole-slide images -> foreground patch JPEGs.

Rebuild of /root/reference/tools/gen_patch.py (213 LoC):
- magnification-normalized read (``aperio.AppMag`` / target-mag thumbnail,
  ref :165-170) via OpenSlide when available; plain images (PNG/JPEG/TIFF
  via cv2) are supported directly so the pipeline runs without OpenSlide;
- pad to a patch-size multiple (``pad_slide``, ref :71-91);
- foreground mask: HSV saturation -> median blur -> Otsu -> morphological
  close -> erode -> remove small holes/objects (ref ``segment_foreground``
  :94-117; skimage's remove_small_* reimplemented with cv2 connected
  components);
- reshape-patchify, keep patches overlapping foreground, fall back to all
  patches when the mask is empty (ref :183-192);
- write ``{out}/{slide}/{row}_{col}.jpeg`` (ref :193-206).

Single-process per slide and embarrassingly parallel across slides — use
``--fold/--k`` sharding to fan out.
"""

import argparse
import logging
import os
from typing import Optional, Tuple

import cv2
import numpy as np

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("gen_patch")

WSI_EXTS = (".svs", ".tif", ".tiff", ".ndpi", ".mrxs")
IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def remove_small_objects(mask: np.ndarray, min_size: int) -> np.ndarray:
    """skimage.morphology.remove_small_objects via connected components."""
    n, labels, stats, _ = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), connectivity=8
    )
    out = np.zeros_like(mask, dtype=np.uint8)
    for i in range(1, n):
        if stats[i, cv2.CC_STAT_AREA] >= min_size:
            out[labels == i] = 1
    return out


def remove_small_holes(mask: np.ndarray, min_size: int) -> np.ndarray:
    """Fill background components smaller than min_size."""
    inv = (mask == 0).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(inv, connectivity=8)
    out = mask.astype(np.uint8).copy()
    for i in range(1, n):
        if stats[i, cv2.CC_STAT_AREA] < min_size:
            out[labels == i] = 1
    return out


def segment_foreground(
    image: np.ndarray,
    median_kernel: int = 7,
    close_kernel: int = 4,
    erode_kernel: int = 4,
    min_hole_size: int = 256,
    min_object_size: int = 256,
) -> np.ndarray:
    """HSV-S Otsu foreground mask (ref gen_patch.py:94-117). image: RGB."""
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
    sat = cv2.medianBlur(hsv[:, :, 1], median_kernel)
    _, mask = cv2.threshold(sat, 0, 1, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    kernel = np.ones((close_kernel, close_kernel), np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    mask = cv2.erode(mask, np.ones((erode_kernel, erode_kernel), np.uint8))
    mask = remove_small_holes(mask, min_hole_size)
    mask = remove_small_objects(mask, min_object_size)
    return mask.astype(bool)


def pad_slide(
    image: np.ndarray, patch_size: int, fill: int = 255
) -> np.ndarray:
    """Pad bottom/right to a patch-size multiple (ref :71-91)."""
    h, w = image.shape[:2]
    ph = (patch_size - h % patch_size) % patch_size
    pw = (patch_size - w % patch_size) % patch_size
    if ph or pw:
        image = cv2.copyMakeBorder(
            image, 0, ph, 0, pw, cv2.BORDER_CONSTANT, value=(fill,) * 3
        )
    return image


def patchify(image: np.ndarray, patch_size: int) -> np.ndarray:
    """[H, W, 3] -> [rows, cols, p, p, 3] via reshape (ref :120-136)."""
    h, w, c = image.shape
    rows, cols = h // patch_size, w // patch_size
    return (
        image.reshape(rows, patch_size, cols, patch_size, c)
        .transpose(0, 2, 1, 3, 4)
    )


def read_slide(
    path: str, target_mag: float = 20.0
) -> Tuple[np.ndarray, Optional[float]]:
    """Read a slide as RGB at (approximately) the target magnification."""
    ext = os.path.splitext(path)[1].lower()
    if ext in WSI_EXTS:
        try:
            import openslide
        except ImportError as e:
            raise SystemExit(
                "OpenSlide is required for WSI formats; install openslide or "
                "convert slides to plain images"
            ) from e
        slide = openslide.OpenSlide(path)
        app_mag = float(slide.properties.get("aperio.AppMag", target_mag))
        scale = app_mag / target_mag
        w0, h0 = slide.dimensions
        thumb = slide.get_thumbnail((int(w0 / scale), int(h0 / scale)))
        return np.asarray(thumb.convert("RGB")), app_mag
    img = cv2.imread(path)
    if img is None:
        raise SystemExit(f"Cannot read {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB), None


def process_slide(
    slide_path: str,
    output_dir: str,
    patch_size: int = 224,
    target_mag: float = 20.0,
    jpeg_quality: int = 90,
) -> int:
    slide_name = os.path.splitext(os.path.basename(slide_path))[0]
    out_dir = os.path.join(output_dir, slide_name)
    os.makedirs(out_dir, exist_ok=True)

    image, _ = read_slide(slide_path, target_mag)
    image = pad_slide(image, patch_size)
    mask = segment_foreground(image)
    patches = patchify(image, patch_size)
    mask_patches = patchify(mask[..., None].astype(np.uint8), patch_size)
    keep = mask_patches.any(axis=(2, 3, 4))
    if not keep.any():  # fallback: keep everything (ref :185-192)
        keep[:] = True
    n = 0
    for r in range(patches.shape[0]):
        for c in range(patches.shape[1]):
            if not keep[r, c]:
                continue
            patch = cv2.cvtColor(patches[r, c], cv2.COLOR_RGB2BGR)
            cv2.imwrite(
                os.path.join(out_dir, f"{r}_{c}.jpeg"), patch,
                [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality],
            )
            n += 1
    _logger.info("%s: %d/%d patches kept", slide_name, n, keep.size)
    return n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("slide_dir")
    p.add_argument("output_dir")
    p.add_argument("--patch-size", type=int, default=224)
    p.add_argument("--target-mag", type=float, default=20.0)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--k", type=int, default=1)
    a = p.parse_args()
    slides = sorted(
        os.path.join(a.slide_dir, f)
        for f in os.listdir(a.slide_dir)
        if f.lower().endswith(WSI_EXTS + IMG_EXTS)
    )[a.fold :: a.k]
    _logger.info("%d slides (shard %d/%d)", len(slides), a.fold, a.k)
    for s in slides:
        process_slide(s, a.output_dir, a.patch_size, a.target_mag)


if __name__ == "__main__":
    main()
