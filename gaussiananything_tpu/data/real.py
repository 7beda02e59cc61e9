"""Real-image evaluation datasets for i23d conditioning.

Capability parity with `RealDataset` / `RealDataset_GSO`
(`datasets/g_buffer_objaverse.py:4570,4692`; loader dispatch
`load_eval_data:1710`): a folder of images becomes conditioning inputs.
The reference removes backgrounds with rembg — a pretrained U²-Net
(`utils/infer_utils.py:4,27`). The same architecture lives in
`models/matting.U2Net`; pass converted weights
(`utils/param_io.convert_u2net`, saved with `save_params_npz`) as
`matting_params`/`--matting-npz` for reference-parity matting. Without
weights, a corner-chroma-key + white-composite stand-in is used
(`utils/infer_utils.py:70` remove_background/resize_foreground analog).
"""
from __future__ import annotations

import glob
import os
from typing import Any, Iterator, List, Optional

import numpy as np


def remove_background(img: np.ndarray, thresh: float = 0.12,
                      matting_params: Optional[Any] = None) -> np.ndarray:
    """(H, W, 3) float [0,1] → white-composited foreground.

    With `matting_params` (converted u2net weights): soft U²-Net alpha,
    rembg-equivalent. Without: corner chroma-key heuristic.
    """
    if matting_params is not None:
        from gaussiananything_tpu.models.matting import matting_alpha
        a = np.asarray(matting_alpha(matting_params, img))[..., None]
        return (img * a + (1 - a)).astype(img.dtype)
    corner = np.median(
        np.concatenate([img[:5, :5].reshape(-1, 3),
                        img[:5, -5:].reshape(-1, 3),
                        img[-5:, :5].reshape(-1, 3),
                        img[-5:, -5:].reshape(-1, 3)]), axis=0)
    dist = np.linalg.norm(img - corner, axis=-1)
    fg = (dist > thresh)[..., None].astype(img.dtype)
    return img * fg + (1 - fg)


def resize_foreground(img: np.ndarray, ratio: float = 0.85) -> np.ndarray:
    """Centre + pad the foreground to occupy `ratio` of the frame."""
    fg = np.any(np.abs(img - 1.0) > 0.02, axis=-1)
    ys, xs = np.where(fg)
    if len(ys) == 0:
        return img
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    crop = img[y0:y1, x0:x1]
    h, w = crop.shape[:2]
    side = int(max(h, w) / ratio)
    canvas = np.ones((side, side, 3), img.dtype)
    oy, ox = (side - h) // 2, (side - w) // 2
    canvas[oy:oy + h, ox:ox + w] = crop
    return canvas


class RealImageDataset:
    """Folder of images → preprocessed (3, S, S) conditioning arrays."""

    def __init__(self, image_dir: str, img_size: int = 224,
                 remove_bg: bool = True,
                 matting_npz: Optional[str] = None):
        exts = ("*.png", "*.jpg", "*.jpeg", "*.webp")
        self.paths: List[str] = sorted(
            p for e in exts for p in glob.glob(os.path.join(image_dir, e)))
        assert self.paths, f"no images in {image_dir}"
        self.img_size = img_size
        self.remove_bg = remove_bg
        self.matting_params = None
        if matting_npz:
            from gaussiananything_tpu.utils.param_io import (as_variables,
                                                             load_params_npz)
            self.matting_params = as_variables(load_params_npz(matting_npz))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        from PIL import Image
        img = np.asarray(
            Image.open(self.paths[i]).convert("RGB"), np.float32) / 255.0
        if self.remove_bg:
            img = remove_background(img, matting_params=self.matting_params)
            img = resize_foreground(img)
        img = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize(
                (self.img_size, self.img_size)), np.float32) / 255.0
        return np.moveaxis(img, -1, 0)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self[i]
