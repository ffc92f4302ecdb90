"""Host-side image transforms (PIL + numpy, torch-free).

Behavioural parity with the torchvision transforms the reference composes
(loader.py:370-385): Resize(shorter-side), CenterCrop, RandomResizedCrop
with one crop shared across a stacked video clip.  Outputs NHWC float32 in
[0, 1] (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def open_rgb(path) -> Image.Image:
    img = Image.open(path)
    if img.mode != 'RGB':
        img = img.convert('RGB')
    return img


def to_array(img: Image.Image) -> np.ndarray:
    """PIL -> HWC float32 [0,1]."""
    return np.asarray(img, np.float32) / 255.0


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        nw, nh = size, max(1, round(h * size / w))
    else:
        nw, nh = max(1, round(w * size / h)), size
    return img.resize((nw, nh), Image.BILINEAR)


def resize_exact(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    return img.resize((size[1], size[0]), Image.BILINEAR)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[-3:-1]
    i = max(0, (h - size) // 2)
    j = max(0, (w - size) // 2)
    return arr[..., i:i + size, j:j + size, :]


def sample_resized_crop_params(h: int, w: int, scale: Tuple[float, float],
                               ratio: Tuple[float, float],
                               rng: Optional[random.Random] = None):
    """(i, j, ch, cw) following torchvision RandomResizedCrop.get_params."""
    r = rng or random
    area = h * w
    for _ in range(10):
        target_area = area * r.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(r.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = r.randint(0, h - ch)
            j = r.randint(0, w - cw)
            return i, j, ch, cw
    # fallback: center crop at the clamped aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = h
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = w, h
    i = (h - ch) // 2
    j = (w - cw) // 2
    return i, j, ch, cw


def _resize_array(arr: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize an HWC (or stack of) array to size x size via PIL."""
    if arr.ndim == 3:
        img = Image.fromarray((arr * 255).astype(np.uint8))
        return to_array(img.resize((size, size), Image.BILINEAR))
    return np.stack([_resize_array(a, size) for a in arr])


class VideoTransform:
    """Resize(shorter) + RandomResizedCrop / CenterCrop, one crop per clip.

    deterministic=True -> Resize + CenterCrop (reference loader.py:370-374);
    else Resize + RandomResizedCrop(scale=(resize_ratio, 1), ratio=(1, 1))
    (loader.py:376-385).
    """

    def __init__(self, image_size: int, resize_ratio: float = 1.0,
                 deterministic: bool = False,
                 rng: Optional[random.Random] = None):
        self.image_size = image_size
        self.resize_ratio = resize_ratio
        self.deterministic = deterministic
        self.rng = rng

    def __call__(self, frames: Sequence[Image.Image]) -> np.ndarray:
        """PIL frames -> [T, S, S, 3] float32, one shared crop."""
        size = self.image_size
        frames = [resize_shorter(f, size) for f in frames]
        arr = np.stack([to_array(f) for f in frames])
        if self.deterministic:
            return center_crop(arr, size)
        h, w = arr.shape[1:3]
        i, j, ch, cw = sample_resized_crop_params(
            h, w, (self.resize_ratio, 1.0), (1.0, 1.0), self.rng)
        crop = arr[:, i:i + ch, j:j + cw, :]
        if (ch, cw) != (size, size):
            crop = _resize_array(crop, size)
        return crop

    def one(self, frame: Image.Image) -> np.ndarray:
        return self([frame])[0]
