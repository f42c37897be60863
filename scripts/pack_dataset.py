"""Pack image folders into RawPack files (the lmdb-tooling analog,
ref: HAT/ESC/basicsr/utils/lmdb_util.py + scripts/data_preparation).

Usage:
    python scripts/pack_dataset.py --gt ./DF2K_HR_sub --lq ./DF2K_LRx2_sub \
        --out ./packs/df2k_x2
Produces <out>_gt.srpk and <out>_lq.srpk, index-aligned for
RawPackPairedDataset.
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt", required=True)
    parser.add_argument("--lq", default=None)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    from super_resolution_tpu.data.rawpack_dataset import pack_folder

    n = pack_folder(args.gt, args.out + "_gt.srpk")
    print(f"packed {n} GT images -> {args.out}_gt.srpk")
    if args.lq:
        n2 = pack_folder(args.lq, args.out + "_lq.srpk")
        print(f"packed {n2} LQ images -> {args.out}_lq.srpk")
        if n != n2:
            raise SystemExit("WARNING: gt/lq counts differ — packs will not "
                             "be index-aligned")


if __name__ == "__main__":
    main()
