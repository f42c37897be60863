"""Image IO and array<->image conversion with reference-identical rounding.

The evaluation protocol computes metrics on images that have round-tripped
through uint8 (ref: HAT/ESC/basicsr/utils/img_util.py::tensor2img used at
hat/models/hat_model.py:144) — matching that rounding exactly matters more
for the <=0.01 dB parity budget than model numerics, so the conversion here
reproduces it: clamp to [0,1], *255, round-half-away (numpy round is
banker's; torch .round() is half-to-even too — both round() halves to even),
uint8, RGB->BGR.
"""

from __future__ import annotations

import os

import numpy as np


def tensor2img(x, rgb2bgr: bool = True, min_max=(0, 1)) -> np.ndarray:
    """Convert an NHWC/HWC [0,1] float array to a uint8 BGR HWC image.

    Accepts jax or numpy arrays; batch dimension of size 1 is squeezed.
    Matches the reference tensor2img: clamp -> normalize to [0,1] ->
    *255 -> round -> uint8, channel order flipped to BGR for cv2 IO.
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 4:
        if x.shape[0] != 1:
            return np.stack([tensor2img(v, rgb2bgr, min_max) for v in x])
        x = x[0]
    x = np.clip(x, min_max[0], min_max[1])
    x = (x - min_max[0]) / (min_max[1] - min_max[0])
    if x.ndim == 3 and x.shape[2] == 3 and rgb2bgr:
        x = x[:, :, ::-1]
    return (x * 255.0).round().astype(np.uint8)


def img2tensor(img: np.ndarray, bgr2rgb: bool = True) -> np.ndarray:
    """uint8 (or float) BGR HWC image -> float32 RGB HWC in [0,1]."""
    img = img.astype(np.float32)
    if img.max() > 1.01:
        img = img / 255.0
    if img.ndim == 3 and img.shape[2] == 3 and bgr2rgb:
        img = img[:, :, ::-1]
    elif img.ndim == 2:
        img = img[:, :, None]
    return np.ascontiguousarray(img)


def imread(path: str, float32: bool = False) -> np.ndarray:
    """Read an image as BGR HWC uint8 (cv2 convention); float32 scales to [0,1]."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"Failed to read image: {path}")
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def imwrite(img: np.ndarray, file_path: str, auto_mkdir: bool = True) -> None:
    """Write a BGR HWC uint8 image; creates parent dirs like the reference."""
    import cv2

    if auto_mkdir:
        os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    ok = cv2.imwrite(file_path, img)
    if not ok:
        raise IOError(f"Failed to write image: {file_path}")


def imfrombytes(content: bytes, float32: bool = False,
                flag: str = "color") -> np.ndarray:
    """Decode image bytes to BGR HWC (lmdb/file-client read path).
    flag: 'color' | 'grayscale' | 'unchanged' (ref: img_util.py::imfrombytes)."""
    import cv2

    flags = {"color": cv2.IMREAD_COLOR, "grayscale": cv2.IMREAD_GRAYSCALE,
             "unchanged": cv2.IMREAD_UNCHANGED}[flag]
    img = cv2.imdecode(np.frombuffer(content, np.uint8), flags)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H,W to multiples of scale (ref: basicsr/data/transforms.py:6)."""
    if img.ndim in (2, 3):
        h, w = img.shape[0], img.shape[1]
        return img[:h - h % scale, :w - w % scale, ...]
    raise ValueError(f"Wrong img ndim: {img.ndim}")


def crop_border(imgs, border: int):
    """Crop border pixels from image(s) (ref: img_util.py::crop_border)."""
    if border == 0:
        return imgs
    if isinstance(imgs, list):
        return [v[border:-border, border:-border, ...] for v in imgs]
    return imgs[border:-border, border:-border, ...]
