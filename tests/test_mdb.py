"""Pure-Python LMDB format implementation (utils/mdb.py).

Covers the on-disk structures the reference's lmdb path exercises
(basicsr/utils/file_client.py:74-131, lmdb_util.py:9-199): single-leaf
DBs, multi-page leaves with branch levels, overflow pages for values
larger than half a page, misses, reopen-append, and the python-lmdb API
shim surface (open/begin/put/get/commit/close, subdir data.mdb layout).
"""

import os
import struct

import numpy as np
import pytest

from super_resolution_tpu.utils import mdb


def _build(tmp_path, items, map_size=10 * 1024 ** 2):
    path = str(tmp_path / "db.lmdb")
    env = mdb.open(path, map_size=map_size)
    with env.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env.close()
    return path


def test_small_roundtrip(tmp_path):
    items = {b"a": b"alpha", b"b": b"beta", b"zz": b"x" * 100}
    path = _build(tmp_path, items)
    env = mdb.open(path, readonly=True)
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v
        assert txn.get(b"missing") is None
        assert txn.get(b"missing", b"dflt") == b"dflt"
    assert env.stat()["entries"] == 3


def test_multipage_btree(tmp_path):
    """Enough keys to force multiple leaf pages and >=1 branch level; keys
    inserted unsorted, read back exactly."""
    rng = np.random.default_rng(0)
    items = {f"key_{i:06d}".encode(): rng.bytes(200)
             for i in rng.permutation(500)}
    path = _build(tmp_path, items)
    r = mdb._Reader(os.path.join(path, "data.mdb"))
    assert r.depth >= 2, "test did not exercise branch pages"
    assert r.entries == 500
    for k, v in items.items():
        assert r.get(k) == v
    # in-order iteration
    assert list(r.keys()) == sorted(items)


def test_overflow_values(tmp_path):
    """Values larger than half a page go to overflow page chains."""
    rng = np.random.default_rng(1)
    items = {b"big1": rng.bytes(3 * 4096 + 17), b"small": b"s",
             b"big2": rng.bytes(4096), b"big3": rng.bytes(100_000)}
    path = _build(tmp_path, items)
    env = mdb.open(path, readonly=True)
    txn = env.begin()
    for k, v in items.items():
        assert txn.get(k) == v


def test_reopen_appends(tmp_path):
    path = _build(tmp_path, {b"a": b"1"})
    env = mdb.open(path)
    with env.begin(write=True) as txn:
        txn.put(b"b", b"2")
    env.close()
    env = mdb.open(path, readonly=True)
    txn = env.begin()
    assert txn.get(b"a") == b"1" and txn.get(b"b") == b"2"


def test_meta_layout(tmp_path):
    """The data file carries the LMDB magic/version and dual meta pages
    with the newer txnid winning."""
    path = _build(tmp_path, {b"k": b"v"})
    with open(os.path.join(path, "data.mdb"), "rb") as f:
        data = f.read()
    for pgno in (0, 1):
        magic, version = struct.unpack_from("<II", data, pgno * 4096 + 16)
        assert magic == 0xBEEFC0DE and version == 1
    assert len(data) % 4096 == 0


def test_paired_dataset_lmdb_backend(tmp_path):
    """The reference's primary packed-dataset path: LmdbMaker-built LQ/GT
    lmdbs driving PairedImageDataset via io_backend: lmdb
    (ref: paired_image_dataset.py:53-61)."""
    import cv2

    from super_resolution_tpu.data.paired_dataset import PairedImageDataset
    from super_resolution_tpu.utils.lmdb_util import LmdbMaker

    rng = np.random.default_rng(2)
    gts = {f"img{i}": (rng.random((16, 16, 3)) * 255).astype(np.uint8)
           for i in range(3)}
    lqs = {k: v[::2, ::2] for k, v in gts.items()}
    for name, imgs in (("gt.lmdb", gts), ("lq.lmdb", lqs)):
        maker = LmdbMaker(str(tmp_path / name))
        for k, img in imgs.items():
            ok, buf = cv2.imencode(".png", img)
            assert ok
            maker.put(buf.tobytes(), k, img.shape)
        maker.close()

    ds = PairedImageDataset({
        "dataroot_gt": str(tmp_path / "gt.lmdb"),
        "dataroot_lq": str(tmp_path / "lq.lmdb"),
        "io_backend": {"type": "lmdb"}, "scale": 2, "phase": "val"})
    assert len(ds) == 3
    item = ds[0]
    key = item["gt_path"]
    np.testing.assert_allclose(item["gt"] * 255,
                               gts[key][..., ::-1].astype(np.float32),
                               atol=0.51)
    assert item["lq"].shape == (8, 8, 3)


def test_readonly_guard(tmp_path):
    path = _build(tmp_path, {b"k": b"v"})
    env = mdb.open(path, readonly=True)
    with pytest.raises(PermissionError):
        env.begin(write=True)
    with pytest.raises(FileNotFoundError):
        mdb.open(str(tmp_path / "absent.lmdb"), readonly=True)
