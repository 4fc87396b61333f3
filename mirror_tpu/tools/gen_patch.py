#!/usr/bin/env python
"""WSI tiling: whole-slide images -> foreground patch JPEGs.

Reference-parity rebuild of /root/reference/tools/gen_patch.py (213 LoC):

- cohort directory layout: ``{input}/{cohort}/*.svs`` ->
  ``{output}/{cohort}/{slide}/{row}_{col}.{type}`` (ref :143-163);
- magnification-normalized read: ``aperio.AppMag`` / target-mag thumbnail
  (ref :165-170) via OpenSlide when available; plain images (PNG/JPEG/TIFF
  via cv2) are also accepted — treated as already at target magnification —
  so the pipeline runs without OpenSlide;
- CENTERED pad to a patch-size multiple, including the reference's
  always-pad quirk: a dimension already a multiple of ``patch_size`` still
  receives a full ``patch_size`` of padding, split half/half (ref
  ``pad_slide`` :71-91 computes ``patch_size - shape % patch_size`` without
  a modulo);
- foreground mask: HSV saturation -> median blur -> Otsu (0/255) ->
  morphological close -> erode -> remove small holes -> remove small
  objects (ref ``segment_foreground`` :94-117). The skimage
  ``remove_small_holes/objects`` calls are reproduced exactly with
  scipy.ndimage — including skimage's treatment of ``connectivity`` as the
  argument of ``generate_binary_structure`` (so the reference's
  ``connectivity=8`` saturates to full 8-connectivity for 2-D masks);
- reshape-patchify (ref :120-136), keep patches whose mask sums > 0, fall
  back to all patches when segmentation finds nothing (ref :183-192);
- the reference's COORDINATE QUIRK (ref :193-198): filenames are
  ``{idx // C}_{idx % C}`` with ``C = level0_width // patch_size`` — the
  LEVEL-0 slide width, not the padded-thumbnail grid width. The mapping is
  injective (no filename collisions) but the row/col do not correspond to
  the actual patch grid; reproduced for cross-pipeline filename parity.
  For plain images the image itself is level 0. If ``C`` would be 0 (image
  narrower than one patch — the reference would divide by zero) the actual
  grid width is used instead, with a warning.

Single-process per slide and embarrassingly parallel across slides — use
the ``--fold/--k`` sharding extension to fan out.
"""

import argparse
import glob
import logging
import os
from typing import Tuple

import cv2
import numpy as np
from scipy import ndimage as ndi

logging.basicConfig(level=logging.INFO)
_logger = logging.getLogger("gen_patch")

WSI_EXTS = (".svs", ".tif", ".tiff", ".ndpi", ".mrxs")
IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def remove_small_objects(
    mask: np.ndarray, min_size: int, connectivity: int
) -> np.ndarray:
    """skimage.morphology.remove_small_objects, exact semantics: label with
    ``generate_binary_structure(2, connectivity)`` and zero components whose
    pixel count is strictly below ``min_size`` (ref gen_patch.py:113-115
    calls skimage with ``connectivity=8``, which generate_binary_structure
    saturates to the full 3x3 footprint)."""
    footprint = ndi.generate_binary_structure(mask.ndim, connectivity)
    labels, _ = ndi.label(mask, footprint)
    sizes = np.bincount(labels.ravel())
    too_small = sizes < min_size
    too_small[0] = False
    out = mask.copy()
    out[too_small[labels]] = False
    return out


def remove_small_holes(
    mask: np.ndarray, area_threshold: int, connectivity: int
) -> np.ndarray:
    """skimage.morphology.remove_small_holes, exact semantics: complement,
    remove objects with area < area_threshold, complement back — i.e. holes
    of area exactly ``area_threshold`` are NOT filled (ref
    gen_patch.py:110-112)."""
    return ~remove_small_objects(~mask, area_threshold, connectivity)


def segment_foreground(
    image: np.ndarray,
    blur_ksize: int = 7,
    close_ksize: int = 5,
    erode_ksize: int = 10,
    area_small_holes: int = 16384,
    min_size_small_objects: int = 8192,
    connectivity: int = 8,
) -> np.ndarray:
    """HSV-S Otsu foreground mask, uint8 0/255 (ref gen_patch.py:94-117).

    image: RGB uint8. Defaults match the reference argparse surface
    (ref :39-59)."""
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
    sat = cv2.medianBlur(hsv[:, :, 1], ksize=blur_ksize)
    _, mask = cv2.threshold(sat, 0, 255, cv2.THRESH_OTSU + cv2.THRESH_BINARY)
    mask = cv2.morphologyEx(
        mask, cv2.MORPH_CLOSE, np.ones((close_ksize, close_ksize), np.uint8)
    )
    mask = cv2.erode(mask, np.ones((erode_ksize, erode_ksize), np.uint8))
    mask = remove_small_holes(mask > 0, area_small_holes, connectivity)
    mask = remove_small_objects(mask, min_size_small_objects, connectivity)
    return mask.astype(np.uint8) * 255


def pad_slide(
    image: np.ndarray, patch_size: int, pad_value: int = 255
) -> np.ndarray:
    """Centered pad to a patch-size multiple (ref pad_slide :71-91),
    including the always-pad quirk: ``pad = patch_size - dim % patch_size``
    is a full ``patch_size`` when the dimension is already a multiple. The
    pad splits ``pad // 2`` before / ``pad - pad // 2`` after."""
    shape = image.shape
    pad0 = int(patch_size - (shape[0] % patch_size))
    pad1 = int(patch_size - (shape[1] % patch_size))
    widths = [[pad0 // 2, pad0 - pad0 // 2], [pad1 // 2, pad1 - pad1 // 2]]
    if len(shape) == 3:
        widths.append([0, 0])
    elif len(shape) != 2:
        raise ValueError("Invalid shape")
    return np.pad(image, widths, constant_values=pad_value)


def patchify(image: np.ndarray, patch_size: int) -> np.ndarray:
    """[H, W(, 3)] -> [rows*cols, p, p(, 3)] row-major flat patch list via
    reshape/transpose (ref patchify :120-136)."""
    shape = image.shape
    rows, cols = shape[0] // patch_size, shape[1] // patch_size
    if len(shape) == 2:
        patches = image.reshape(rows, patch_size, cols, patch_size)
        patches = patches.transpose(0, 2, 1, 3)
        return patches.reshape(-1, patch_size, patch_size)
    if len(shape) == 3:
        patches = image.reshape(rows, patch_size, cols, patch_size, 3)
        patches = patches.transpose(0, 2, 1, 3, 4)
        return patches.reshape(-1, patch_size, patch_size, 3)
    raise ValueError("Invalid shape")


def read_slide(
    path: str, target_mag: float = 20.0
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Read a slide as RGB at the target magnification.

    Returns (image, level0_size) where level0_size is ``(width, height)`` at
    level 0 — the quantity the reference's coordinate naming divides by
    (ref :166,195-198). Plain images are their own level 0."""
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
        size = slide.level_dimensions[0]
        # ref :167 does int(AppMag)/target and crashes on a missing AppMag;
        # we default to target (factor 1) instead.
        app_mag = slide.properties.get("aperio.AppMag")
        factor = (int(app_mag) if app_mag is not None else target_mag) / target_mag
        thumb = slide.get_thumbnail((size[0] // factor, size[1] // factor))
        return np.asarray(thumb.convert("RGB")), (int(size[0]), int(size[1]))
    img = cv2.imread(path)
    if img is None:
        raise SystemExit(f"Cannot read {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img, (img.shape[1], img.shape[0])


def process_slide(
    slide_path: str,
    output_dir: str,
    patch_size: int = 512,
    target_mag: float = 20.0,
    pad_value: int = 255,
    blur_ksize: int = 7,
    close_ksize: int = 5,
    erode_ksize: int = 10,
    area_small_holes: int = 16384,
    min_size_small_objects: int = 8192,
    connectivity: int = 8,
    output_type: str = "jpeg",
) -> int:
    """Tile one slide into ``{output_dir}/{slide_name}/`` (ref main
    :157-208). Returns the number of patches written."""
    slide_name = os.path.splitext(os.path.basename(slide_path))[0]
    slide_output_dir = os.path.join(output_dir, slide_name)
    os.makedirs(slide_output_dir, exist_ok=True)

    image, level0_size = read_slide(slide_path, target_mag)
    image = pad_slide(image, patch_size, pad_value)
    mask = segment_foreground(
        image,
        blur_ksize,
        close_ksize,
        erode_ksize,
        area_small_holes,
        min_size_small_objects,
        connectivity,
    )

    patches = patchify(image, patch_size)
    mask_patches = patchify(mask, patch_size)
    selected = mask_patches.sum(axis=(1, 2)) > 0
    if not selected.any():
        _logger.info("Segment slide %s failed, select all patches", slide_path)
        selected[:] = True

    # Reference coordinate quirk (ref :193-198): divisor is the LEVEL-0
    # width in patches, not the padded grid width.
    cols = level0_size[0] // patch_size
    if cols <= 0:
        cols = image.shape[1] // patch_size
        _logger.warning(
            "%s: level-0 width %d < patch size; naming by actual grid width",
            slide_path, level0_size[0],
        )
    n = 0
    for idx in np.flatnonzero(selected):
        coord = (idx // cols, idx % cols)
        patch = cv2.cvtColor(patches[idx], cv2.COLOR_RGB2BGR)
        cv2.imwrite(
            os.path.join(slide_output_dir, f"{coord[0]}_{coord[1]}.{output_type}"),
            patch,
        )
        n += 1
    _logger.info("%s: %d/%d patches kept", slide_path, n, selected.size)
    return n


def build_parser() -> argparse.ArgumentParser:
    """Reference argparse surface (ref gen_patch.py:16-68) plus the
    ``--fold/--k`` slide-sharding extension."""
    p = argparse.ArgumentParser(description="Generate patch for Whole Slide Image")
    p.add_argument("--input-dir", type=str, default="./input/wsi/TCGA")
    p.add_argument("--cohorts", nargs="+", type=str, default=["TCGA_BRCA"])
    p.add_argument("--target-mag", type=int, default=20)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--pad-value", type=int, default=255)
    p.add_argument("--blur-ksize", type=int, default=7)
    p.add_argument("--close-ksize", type=int, default=5)
    p.add_argument("--erode-ksize", type=int, default=10)
    p.add_argument("--area-small-holes", type=int, default=16384)
    p.add_argument("--min-size-small-objects", type=int, default=8192)
    p.add_argument("--connectivity", type=int, default=8)
    p.add_argument("--output-type", type=str, default="jpeg")
    p.add_argument("--output-dir", type=str, default="./input/wsi_patch/TCGA")
    p.add_argument("--fold", type=int, default=0,
                   help="shard index (extension; not in the reference)")
    p.add_argument("--k", type=int, default=1,
                   help="shard count (extension; not in the reference)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    for cohort in args.cohorts:
        _logger.info("Processing %s", cohort)
        cohort_dir = os.path.join(args.input_dir, cohort)
        if not os.path.exists(cohort_dir):
            raise ValueError(f"Input directory {cohort_dir} does not exist")
        cohort_output_dir = os.path.join(args.output_dir, cohort)
        os.makedirs(cohort_output_dir, exist_ok=True)

        wsi_files = sorted(
            f
            for ext in WSI_EXTS + IMG_EXTS
            for f in glob.glob(os.path.join(cohort_dir, f"*{ext}"))
        )[args.fold :: args.k]
        _logger.info(
            "Found %d slide files (shard %d/%d)", len(wsi_files), args.fold, args.k
        )
        for i, wsi_file in enumerate(wsi_files):
            _logger.info("Processing %s (%d/%d)", wsi_file, i + 1, len(wsi_files))
            process_slide(
                wsi_file,
                cohort_output_dir,
                patch_size=args.patch_size,
                target_mag=args.target_mag,
                pad_value=args.pad_value,
                blur_ksize=args.blur_ksize,
                close_ksize=args.close_ksize,
                erode_ksize=args.erode_ksize,
                area_small_holes=args.area_small_holes,
                min_size_small_objects=args.min_size_small_objects,
                connectivity=args.connectivity,
                output_type=args.output_type,
            )
    _logger.info("Done")


if __name__ == "__main__":
    main()
