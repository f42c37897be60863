"""Train CLI: ``python -m super_resolution_tpu.train -opt options/train/x.yml``
(analog of the reference's hat/train.py shim)."""

import os.path as osp

from super_resolution_tpu.runtime.train_pipeline import train_pipeline

if __name__ == "__main__":
    root_path = osp.abspath(osp.join(__file__, osp.pardir, osp.pardir))
    train_pipeline(root_path)
