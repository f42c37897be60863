"""Paired crop / augmentation transforms (ref: basicsr/data/transforms.py)."""

from __future__ import annotations

import random

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W to multiples of scale (ref: transforms.py:6)."""
    h, w = img.shape[0], img.shape[1]
    return img[:h - h % scale, :w - w % scale, ...]


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int,
                       rng: random.Random | None = None):
    """Scale-consistent random crops of LQ/GT pairs
    (ref: transforms.py:26-91). Accepts single images or lists (HWC numpy).
    """
    rng = rng or random
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    if single_gt:
        img_gts = [img_gts]
    if single_lq:
        img_lqs = [img_lqs]

    h_lq, w_lq = img_lqs[0].shape[0], img_lqs[0].shape[1]
    h_gt, w_gt = img_gts[0].shape[0], img_gts[0].shape[1]
    lq_patch_size = gt_patch_size // scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(f"GT size ({h_gt},{w_gt}) is not {scale}x LQ "
                         f"({h_lq},{w_lq})")
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(f"LQ ({h_lq},{w_lq}) smaller than patch "
                         f"{lq_patch_size}")

    top = rng.randint(0, h_lq - lq_patch_size)
    left = rng.randint(0, w_lq - lq_patch_size)
    img_lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...]
               for v in img_lqs]
    top_gt, left_gt = top * scale, left * scale
    img_gts = [v[top_gt:top_gt + gt_patch_size,
                 left_gt:left_gt + gt_patch_size, ...] for v in img_gts]
    if single_gt:
        img_gts = img_gts[0]
    if single_lq:
        img_lqs = img_lqs[0]
    return img_gts, img_lqs


def augment(imgs, hflip: bool = True, rotation: bool = True,
            flows=None, return_status: bool = False,
            rng: random.Random | None = None):
    """hflip / vflip / rot90 augmentation (ref: transforms.py:116-180)."""
    rng = rng or random
    do_hflip = hflip and rng.random() < 0.5
    do_vflip = rotation and rng.random() < 0.5
    do_rot90 = rotation and rng.random() < 0.5

    def _augment(img):
        if do_hflip:
            img = img[:, ::-1, ...]
        if do_vflip:
            img = img[::-1, :, ...]
        if do_rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    def _augment_flow(flow):
        if do_hflip:
            flow = flow[:, ::-1, :].copy()
            flow[:, :, 0] *= -1
        if do_vflip:
            flow = flow[::-1, :, :].copy()
            flow[:, :, 1] *= -1
        if do_rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return np.ascontiguousarray(flow)

    single = not isinstance(imgs, list)
    if single:
        imgs = [imgs]
    imgs = [_augment(img) for img in imgs]
    if single:
        imgs = imgs[0]

    if flows is not None:
        single_flow = not isinstance(flows, list)
        if single_flow:
            flows = [flows]
        flows = [_augment_flow(f) for f in flows]
        if single_flow:
            flows = flows[0]
        if return_status:
            return imgs, flows, (do_hflip, do_vflip, do_rot90)
        return imgs, flows
    if return_status:
        return imgs, (do_hflip, do_vflip, do_rot90)
    return imgs


def single_random_crop(img, patch_size: int, rng: random.Random | None = None):
    """Random crop of a single image (ref: transforms.py:94)."""
    rng = rng or random
    h, w = img.shape[0], img.shape[1]
    if h < patch_size or w < patch_size:
        raise ValueError(f"image ({h},{w}) smaller than patch {patch_size}")
    top = rng.randint(0, h - patch_size)
    left = rng.randint(0, w - patch_size)
    return img[top:top + patch_size, left:left + patch_size, ...]
