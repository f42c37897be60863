"""Test CLI: ``python -m super_resolution_tpu.test -opt options/test/x.yml``
(analog of the reference's hat/test.py shim)."""

import os.path as osp

from super_resolution_tpu.runtime.test_pipeline import test_pipeline

if __name__ == "__main__":
    root_path = osp.abspath(osp.join(__file__, osp.pardir, osp.pardir))
    test_pipeline(root_path)
