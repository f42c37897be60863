"""GT-only datasets that synthesize LQ on the fly.

- ImageNetPairedDataset (ref: hat/data/imagenet_paired_dataset.py:14-92):
  modcrop, resize-up if below gt_size, random crop, LQ = MATLAB bicubic
  downscale of the GT crop.
- DownsampleImageDataset (ref: HAT/ESC/esc/data/downsample_dataset.py:47-131):
  random crop + bicubic downsample (the esc recipe uses PIL bicubic; we use
  the MATLAB kernel, the convention every SR benchmark assumes).
"""

from __future__ import annotations

import random

import numpy as np

from super_resolution_tpu.data.transforms import augment, mod_crop
from super_resolution_tpu.utils.img import img2tensor, imread
from super_resolution_tpu.utils.matlab import imresize
from super_resolution_tpu.utils.misc import scandir
from super_resolution_tpu.utils.registry import DATASET_REGISTRY


class _GTOnlyBase:
    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_folder = opt["dataroot_gt"]
        if opt.get("meta_info_file"):
            with open(opt["meta_info_file"], "r") as f:
                from os import path as osp

                self.paths = [osp.join(self.gt_folder,
                                       line.strip().split(" ")[0])
                              for line in f if line.strip()]
        else:
            self.paths = sorted(scandir(self.gt_folder, full_path=True))
        self._rng = random.Random(0)

    def seed(self, seed: int):
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.paths)


@DATASET_REGISTRY.register()
class ImageNetPairedDataset(_GTOnlyBase):

    def __getitem__(self, index: int) -> dict:
        scale = self.opt["scale"]
        gt_size = self.opt.get("gt_size")
        gt_path = self.paths[index]
        img_gt = img2tensor(imread(gt_path, float32=True))
        img_gt = mod_crop(img_gt, scale)

        if self.opt.get("phase") == "train":
            h, w = img_gt.shape[:2]
            # upscale small images so a gt_size crop exists (ref: :44-52)
            if gt_size and (h < gt_size or w < gt_size):
                s = max(gt_size / h, gt_size / w)
                img_gt = np.clip(imresize(img_gt, s), 0, 1)
                img_gt = mod_crop(img_gt, scale)
                h, w = img_gt.shape[:2]
            if gt_size:
                top = self._rng.randint(0, h - gt_size)
                left = self._rng.randint(0, w - gt_size)
                img_gt = img_gt[top:top + gt_size, left:left + gt_size]
            img_gt = augment(img_gt, self.opt.get("use_hflip", True),
                             self.opt.get("use_rot", True), rng=self._rng)

        img_lq = np.clip(imresize(np.ascontiguousarray(img_gt), 1.0 / scale),
                         0, 1)
        return {"lq": img_lq.astype(np.float32),
                "gt": np.ascontiguousarray(img_gt, np.float32),
                "lq_path": gt_path, "gt_path": gt_path}


@DATASET_REGISTRY.register()
class DownsampleImageDataset(_GTOnlyBase):

    def __getitem__(self, index: int) -> dict:
        scale = self.opt["scale"]
        gt_size = self.opt.get("gt_size")
        gt_path = self.paths[index]
        img_gt = img2tensor(imread(gt_path, float32=True))

        if self.opt.get("phase") == "train" and gt_size:
            h, w = img_gt.shape[:2]
            top = self._rng.randint(0, max(0, h - gt_size))
            left = self._rng.randint(0, max(0, w - gt_size))
            img_gt = img_gt[top:top + gt_size, left:left + gt_size]
            img_gt = augment(img_gt, self.opt.get("use_hflip", True),
                             self.opt.get("use_rot", True), rng=self._rng)
        else:
            img_gt = mod_crop(img_gt, scale)

        img_lq = np.clip(imresize(np.ascontiguousarray(img_gt), 1.0 / scale),
                         0, 1)
        return {"lq": img_lq.astype(np.float32),
                "gt": np.ascontiguousarray(img_gt, np.float32),
                "lq_path": gt_path, "gt_path": gt_path}
