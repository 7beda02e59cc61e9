"""Real-image evaluation datasets for i23d conditioning.

Capability parity with `RealDataset` / `RealDataset_GSO`
(`datasets/g_buffer_objaverse.py:4570,4692`; loader dispatch
`load_eval_data:1710`): a folder of images becomes conditioning inputs.
The reference removes backgrounds with rembg (U²-Net, not available here);
we use a corner-chroma-key + white-composite stand-in
(`utils/infer_utils.py:70` remove_background/resize_foreground analog),
with a hook to plug a learned matting model later.
"""
from __future__ import annotations

import glob
import os
from typing import Iterator, List

import numpy as np


def remove_background(img: np.ndarray, thresh: float = 0.12) -> np.ndarray:
    """(H, W, 3) float [0,1] → white-composited foreground."""
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
                 remove_bg: bool = True):
        exts = ("*.png", "*.jpg", "*.jpeg", "*.webp")
        self.paths: List[str] = sorted(
            p for e in exts for p in glob.glob(os.path.join(image_dir, e)))
        assert self.paths, f"no images in {image_dir}"
        self.img_size = img_size
        self.remove_bg = remove_bg

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        from PIL import Image
        img = np.asarray(
            Image.open(self.paths[i]).convert("RGB"), np.float32) / 255.0
        if self.remove_bg:
            img = remove_background(img)
            img = resize_foreground(img)
        img = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize(
                (self.img_size, self.img_size)), np.float32) / 255.0
        return np.moveaxis(img, -1, 0)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self[i]
