"""Generate meta_info txt files in the reference's formats.

The reference ships pre-generated listings consumed by dataset options
(meta_info_file:, e.g. hat/data/meta_info/meta_info_DF2Ksub_GT.txt for
image sets — lines `name.png (h,w,c)` — and
basicsr/data/meta_info/meta_info_REDS_GT.txt for video sets — lines
`clip n_frames (h,w,c)`). The files themselves are dataset-derived
artifacts, so this framework ships the GENERATOR instead: point it at a
prepared GT folder and it writes the same format our PairedImageDataset
/ video datasets parse (data/paired_dataset.py::paths_from_meta_info).

Usage:
  python scripts/gen_meta_info.py --input datasets/DF2K/GT_sub \
      --output meta_info_DF2Ksub_GT.txt
  python scripts/gen_meta_info.py --input datasets/REDS/train_sharp \
      --output meta_info_REDS_GT.txt --video
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}


def _img_shape(path):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError(f"unreadable image: {path}")
    if img.ndim == 2:
        return img.shape[0], img.shape[1], 1
    return img.shape[0], img.shape[1], img.shape[2]


def gen_image_meta(input_dir: str, output: str, recursive: bool = False):
    """`name.ext (h,w,c)` per image (ref: meta_info_DF2Ksub_GT.txt)."""
    names = []
    if recursive:
        for root, _, files in os.walk(input_dir):
            rel = os.path.relpath(root, input_dir)
            for f in sorted(files):
                if os.path.splitext(f)[1].lower() in IMG_EXTS:
                    names.append(f if rel == "." else os.path.join(rel, f))
    else:
        names = sorted(f for f in os.listdir(input_dir)
                       if os.path.splitext(f)[1].lower() in IMG_EXTS)
    if not names:
        raise ValueError(f"no images under {input_dir}")
    with open(output, "w") as out:
        for name in names:
            h, w, c = _img_shape(os.path.join(input_dir, name))
            out.write(f"{name} ({h},{w},{c})\n")
    return len(names)


def gen_video_meta(input_dir: str, output: str):
    """`clip n_frames (h,w,c)` per clip folder (ref:
    meta_info_REDS_GT.txt / meta_info_Vimeo90K_*.txt; nested clip dirs
    like 00001/0266 are supported)."""
    clips = []
    for root, dirs, files in os.walk(input_dir):
        frames = sorted(f for f in files
                        if os.path.splitext(f)[1].lower() in IMG_EXTS)
        if frames:
            rel = os.path.relpath(root, input_dir)
            clips.append((rel, frames))
    if not clips:
        raise ValueError(f"no frame folders under {input_dir}")
    clips.sort()
    with open(output, "w") as out:
        for rel, frames in clips:
            h, w, c = _img_shape(os.path.join(input_dir, rel, frames[0]))
            out.write(f"{rel} {len(frames)} ({h},{w},{c})\n")
    return len(clips)


# The REDS corpus is fully deterministic from the dataset's published
# structure (270 train clips 000-269 x 100 frames of 720x1280x3; the
# standard EDVR REDS4 test split and the official validation split), so
# those listings can be generated without the dataset present. The
# Vimeo90K and DF2K/DIV2K-sub listings depend on per-dataset contents
# (clip-ID subsets / source image dims) and need --input instead.
STANDARD = {
    "meta_info_REDS_GT.txt": [f"{i:03d}" for i in range(270)],
    "meta_info_REDS4_test_GT.txt": ["000", "011", "015", "020"],
    "meta_info_REDSofficial4_test_GT.txt": ["240", "241", "246", "257"],
    "meta_info_REDSval_official_test_GT.txt":
        [f"{i:03d}" for i in range(240, 270)],
}


def gen_standard(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    for fname, clips in STANDARD.items():
        with open(os.path.join(out_dir, fname), "w") as out:
            for clip in clips:
                out.write(f"{clip} 100 (720,1280,3)\n")
    return len(STANDARD)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="GT folder to list")
    p.add_argument("--output", help="meta_info txt path (or dir for "
                                    "--standard)")
    p.add_argument("--video", action="store_true",
                   help="clip-folder format (REDS/Vimeo style)")
    p.add_argument("--recursive", action="store_true",
                   help="recurse into subfolders (image mode)")
    p.add_argument("--standard", action="store_true",
                   help="emit the deterministic REDS meta_info corpus "
                        "into --output (a directory)")
    args = p.parse_args()
    if args.standard:
        n = gen_standard(args.output or "super_resolution_tpu/data/meta_info")
        print(f"wrote {n} standard REDS meta files")
        return
    if not (args.input and args.output):
        p.error("--input/--output required without --standard")
    if args.video:
        n = gen_video_meta(args.input, args.output)
        print(f"wrote {n} clips -> {args.output}")
    else:
        n = gen_image_meta(args.input, args.output, args.recursive)
        print(f"wrote {n} images -> {args.output}")


if __name__ == "__main__":
    main()
