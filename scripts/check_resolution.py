#!/usr/bin/env python3
"""Compare the pixel resolution of two images (human utility).

TPU-framework port of the reference's dataset sanity checker
(HAT/datasets/test.py:13-48): reports each image's pixel size and DPI
metadata and states whether the pixel resolutions match.

Usage: python scripts/check_resolution.py IMG1 IMG2
"""

from __future__ import annotations

import argparse


def get_image_info(path: str):
    from PIL import Image

    with Image.open(path) as im:
        return im.size, im.info.get("dpi")


def main():
    parser = argparse.ArgumentParser(
        description="Check whether two images have the same pixel resolution.")
    parser.add_argument("img1", help="first image path")
    parser.add_argument("img2", help="second image path")
    args = parser.parse_args()

    infos = []
    for path in (args.img1, args.img2):
        try:
            infos.append(get_image_info(path))
        except Exception as e:  # noqa: BLE001 - report and exit, CLI tool
            print(f"error opening {path}: {e}")
            return 1

    for path, ((w, h), dpi) in zip((args.img1, args.img2), infos):
        print(f"{path}: {w} x {h} ({w * h} px), dpi={dpi}")

    (size1, dpi1), (size2, dpi2) = infos
    match = size1 == size2
    print("resolutions MATCH" if match else "resolutions DIFFER")
    if dpi1 != dpi2:
        print("note: DPI metadata differs (print density only — "
              "unrelated to pixel resolution)")
    return 0 if match else 2


if __name__ == "__main__":
    raise SystemExit(main())
