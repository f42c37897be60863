"""Paired LQ/GT and single-LQ datasets (folder + meta-info backends).

TPU-native counterpart of the reference datasets
(ref: basicsr/data/paired_image_dataset.py:10-106,
single_image_dataset.py:10-40). Datasets here are plain indexable objects
returning float32 RGB HWC [0,1] numpy arrays; batching/sharding lives in
the loader (data/__init__.py), prefetch is a background thread that
overlaps disk IO + decode with device compute.
"""

from __future__ import annotations

import os
from os import path as osp

import numpy as np

from super_resolution_tpu.data.transforms import augment, mod_crop, paired_random_crop
from super_resolution_tpu.utils.img import img2tensor, imread
from super_resolution_tpu.utils.misc import scandir
from super_resolution_tpu.utils.registry import DATASET_REGISTRY


def paired_paths_from_folders(lq_folder: str, gt_folder: str,
                              filename_tmpl: str = "{}"):
    """Match LQ/GT files by stem (ref: data_util.py::paired_paths_from_folder)."""
    lq_names = sorted(scandir(lq_folder))
    gt_names = sorted(scandir(gt_folder))
    if len(lq_names) != len(gt_names):
        raise ValueError(f"Folders have mismatched sizes: {len(lq_names)} LQ "
                         f"vs {len(gt_names)} GT")
    paths = []
    gt_by_stem = {osp.splitext(osp.basename(p))[0]: p for p in gt_names}
    for lq_name in lq_names:
        stem, ext = osp.splitext(osp.basename(lq_name))
        # LQ files are commonly named '<stem>x4.png' against GT '<stem>.png';
        # filename_tmpl maps GT stem -> LQ stem (reference semantics).
        gt_stem = stem
        for cand in (stem,):
            if cand in gt_by_stem:
                gt_stem = cand
                break
        else:
            # try stripping a trailing 'x<scale>' suffix
            import re

            m = re.match(r"(.*?)x\d+$", stem)
            if m and m.group(1) in gt_by_stem:
                gt_stem = m.group(1)
        if gt_stem not in gt_by_stem:
            raise FileNotFoundError(f"No GT match for LQ {lq_name}")
        paths.append({"lq_path": osp.join(lq_folder, lq_name),
                      "gt_path": osp.join(gt_folder, gt_by_stem[gt_stem])})
    return paths


def paired_paths_from_lmdb(lq_folder: str, gt_folder: str):
    """Keys from the meta_info.txt the lmdb packer writes next to data.mdb
    (ref: data_util.py::paired_paths_from_lmdb; lmdb_util.py:78-87)."""
    if not (lq_folder.endswith(".lmdb") and gt_folder.endswith(".lmdb")):
        raise ValueError("lmdb io_backend requires both dataroots to be "
                         f".lmdb folders, got {lq_folder} / {gt_folder}")

    def read_keys(folder):
        with open(osp.join(folder, "meta_info.txt")) as f:
            return [line.split(".")[0] for line in f if line.strip()]

    lq_keys, gt_keys = read_keys(lq_folder), read_keys(gt_folder)
    if set(lq_keys) != set(gt_keys):
        raise ValueError("LQ and GT lmdbs hold different key sets")
    return [{"lq_path": k, "gt_path": k} for k in sorted(gt_keys)]


def paired_paths_from_meta_info(lq_folder: str, gt_folder: str,
                                meta_info_file: str, filename_tmpl: str = "{}"):
    """Build pairs from a meta_info txt listing GT names
    (ref: data_util.py::paired_paths_from_meta_info_file)."""
    with open(meta_info_file, "r") as f:
        gt_names = [line.strip().split(" ")[0] for line in f if line.strip()]
    paths = []
    for gt_name in gt_names:
        stem, ext = osp.splitext(gt_name)
        lq_name = f"{filename_tmpl.format(stem)}{ext}"
        paths.append({"lq_path": osp.join(lq_folder, lq_name),
                      "gt_path": osp.join(gt_folder, gt_name)})
    return paths


@DATASET_REGISTRY.register()
class PairedImageDataset:
    """LQ/GT pairs; train: paired random crop + flip/rot augment; val: GT
    mod-crop to LQ x scale (ref: paired_image_dataset.py:79-94)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.gt_folder = opt["dataroot_gt"]
        self.lq_folder = opt["dataroot_lq"]
        self.filename_tmpl = opt.get("filename_tmpl", "{}")
        io_backend = dict(opt.get("io_backend") or {"type": "disk"})
        self._file_client = None
        if io_backend.get("type") == "lmdb":
            from super_resolution_tpu.utils.file_client import FileClient

            self.paths = paired_paths_from_lmdb(self.lq_folder,
                                                self.gt_folder)
            self._file_client = FileClient(
                "lmdb", db_paths=[self.lq_folder, self.gt_folder],
                client_keys=["lq", "gt"])
        elif opt.get("meta_info_file"):
            self.paths = paired_paths_from_meta_info(
                self.lq_folder, self.gt_folder, opt["meta_info_file"],
                self.filename_tmpl)
        else:
            self.paths = paired_paths_from_folders(
                self.lq_folder, self.gt_folder, self.filename_tmpl)
        self._rng = None

    def seed(self, seed: int):
        import random

        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> dict:
        scale = self.opt["scale"]
        p = self.paths[index]
        if self._file_client is not None:
            from super_resolution_tpu.utils.img import imfrombytes

            img_gt = img2tensor(imfrombytes(
                self._file_client.get(p["gt_path"], "gt"), float32=True))
            img_lq = img2tensor(imfrombytes(
                self._file_client.get(p["lq_path"], "lq"), float32=True))
        else:
            img_gt = img2tensor(imread(p["gt_path"], float32=True))
            img_lq = img2tensor(imread(p["lq_path"], float32=True))

        if self.opt["phase"] == "train":
            gt_size = self.opt["gt_size"]
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size, scale,
                                                rng=self._rng)
            img_gt, img_lq = augment([img_gt, img_lq],
                                     self.opt.get("use_hflip", True),
                                     self.opt.get("use_rot", True),
                                     rng=self._rng)
        else:
            h, w = img_lq.shape[0], img_lq.shape[1]
            img_gt = img_gt[0:h * scale, 0:w * scale, :]

        if self.opt.get("mean") is not None:
            mean = np.asarray(self.opt["mean"], dtype=np.float32)
            std = np.asarray(self.opt.get("std", [1, 1, 1]), dtype=np.float32)
            img_gt = (img_gt - mean) / std
            img_lq = (img_lq - mean) / std

        return {"lq": img_lq, "gt": img_gt,
                "lq_path": p["lq_path"], "gt_path": p["gt_path"]}


@DATASET_REGISTRY.register()
class SingleImageDataset:
    """LQ-only inference dataset (ref: single_image_dataset.py:10-40)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.lq_folder = opt["dataroot_lq"]
        if opt.get("meta_info_file"):
            with open(opt["meta_info_file"], "r") as f:
                self.paths = [osp.join(self.lq_folder, line.strip().split(" ")[0])
                              for line in f if line.strip()]
        else:
            self.paths = sorted(scandir(self.lq_folder, full_path=True))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index: int) -> dict:
        lq_path = self.paths[index]
        img_lq = img2tensor(imread(lq_path, float32=True))
        if self.opt.get("mean") is not None:
            mean = np.asarray(self.opt["mean"], dtype=np.float32)
            std = np.asarray(self.opt.get("std", [1, 1, 1]), dtype=np.float32)
            img_lq = (img_lq - mean) / std
        return {"lq": img_lq, "lq_path": lq_path}


@DATASET_REGISTRY.register()
class RealESRGANPairedDataset(PairedImageDataset):
    """Paired dataset with the Real-ESRGAN 'meta_info' format — each line is
    'gt_relpath, lq_relpath' (ref: basicsr/data/realesrgan_paired_dataset.py:
    12-110). Everything else (crop/augment/normalize) matches
    PairedImageDataset.
    """

    def __init__(self, opt: dict):
        if opt.get("meta_info"):
            self.opt = opt
            self.gt_folder = opt["dataroot_gt"]
            self.lq_folder = opt["dataroot_lq"]
            self.filename_tmpl = opt.get("filename_tmpl", "{}")
            self.paths = []
            with open(opt["meta_info"]) as fin:
                for line in fin:
                    if not line.strip():
                        continue
                    gt_rel, lq_rel = [p.strip() for p in line.split(",")]
                    self.paths.append(
                        {"gt_path": osp.join(self.gt_folder, gt_rel),
                         "lq_path": osp.join(self.lq_folder, lq_rel)})
            self._rng = None
        else:
            super().__init__(opt)
