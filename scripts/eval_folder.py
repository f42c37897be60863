"""Folder-vs-folder IQA sweep — analog of the reference's pyiqa shell sweep
(ref: HAT/ESC/scripts/compare_real.sh:1-10): computes PSNR / PSNR-Y / SSIM /
NIQE (and FID when InceptionV3 weights are supplied) over a result folder
against an HR reference folder.

Usage:
    python scripts/eval_folder.py --sr results/foo --hr datasets/GTmod4 \
        [--crop-border 4] [--fid-weights inception.pth]
"""

from __future__ import annotations

import argparse
import json
from os import path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sr", required=True, help="folder of SR results")
    p.add_argument("--hr", default=None, help="folder of HR references")
    p.add_argument("--crop-border", type=int, default=4)
    p.add_argument("--fid-weights", default=None)
    args = p.parse_args()

    from super_resolution_tpu.metrics.niqe import calculate_niqe
    from super_resolution_tpu.metrics.psnr_ssim import (calculate_psnr,
                                                        calculate_ssim)
    from super_resolution_tpu.utils.img import imread
    from super_resolution_tpu.utils.misc import scandir

    sr_paths = sorted(scandir(args.sr, full_path=True))
    hr_paths = sorted(scandir(args.hr, full_path=True)) if args.hr else []
    accum: dict = {}
    for i, sr_path in enumerate(sr_paths):
        sr = imread(sr_path)
        row = {}
        # NIQE needs at least one 96x96 block after the border crop
        if min(sr.shape[:2]) - 2 * args.crop_border >= 96:
            row["niqe"] = float(calculate_niqe(sr, args.crop_border))
        if hr_paths:
            hr = imread(hr_paths[i])
            h = min(sr.shape[0], hr.shape[0])
            w = min(sr.shape[1], hr.shape[1])
            sr_c, hr_c = sr[:h, :w], hr[:h, :w]
            row["psnr"] = float(calculate_psnr(sr_c, hr_c, args.crop_border))
            row["psnr_y"] = float(calculate_psnr(sr_c, hr_c, args.crop_border,
                                                 test_y_channel=True))
            row["ssim_y"] = float(calculate_ssim(sr_c, hr_c, args.crop_border,
                                                 test_y_channel=True))
        for k, v in row.items():
            accum.setdefault(k, []).append(v)
        print(f"{osp.basename(sr_path)}: "
              + " ".join(f"{k}={v:.4f}" for k, v in row.items()))

    summary = {k: sum(v) / len(v) for k, v in accum.items()}
    summary["n_images"] = len(sr_paths)

    if args.fid_weights and hr_paths:
        from super_resolution_tpu.metrics.fid import calculate_fid
        from super_resolution_tpu.utils.img import imread as _imread

        srs = [_imread(p) for p in sr_paths]
        hrs = [_imread(p) for p in hr_paths]
        summary["fid"] = float(calculate_fid(
            srs, hrs, inception_weights_path=args.fid_weights))
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
