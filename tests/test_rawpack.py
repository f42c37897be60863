"""Native RawPack IO: pack/read roundtrip, parallel crop correctness,
paired dataset integration."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pack_files(tmp_path_factory):
    import cv2

    from super_resolution_tpu.data.rawpack_dataset import pack_folder

    root = tmp_path_factory.mktemp("rawpack")
    gt_dir, lq_dir = root / "gt", root / "lq"
    gt_dir.mkdir(), lq_dir.mkdir()
    rng = np.random.default_rng(0)
    imgs = []
    for i in range(3):
        h, w = 40 + 4 * i, 48
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        imgs.append(img)
        cv2.imwrite(str(gt_dir / f"i{i}.png"), img)
        cv2.imwrite(str(lq_dir / f"i{i}.png"), img[::2, ::2])
    gt_pack = str(root / "gt.srpk")
    lq_pack = str(root / "lq.srpk")
    assert pack_folder(str(gt_dir), gt_pack) == 3
    assert pack_folder(str(lq_dir), lq_pack) == 3
    return gt_pack, lq_pack, imgs


def test_roundtrip(pack_files):
    from super_resolution_tpu.data.rawpack_dataset import RawPackReader

    gt_pack, _, imgs = pack_files
    r = RawPackReader(gt_pack)
    assert len(r) == 3
    for i, img in enumerate(imgs):
        got = r.read(i)
        # packed as RGB; imwrite/imread roundtrip is BGR->disk->BGR
        np.testing.assert_array_equal(got, img[:, :, ::-1])


def test_crop_batch_matches_numpy(pack_files):
    from super_resolution_tpu.data.rawpack_dataset import RawPackReader

    gt_pack, _, imgs = pack_files
    r = RawPackReader(gt_pack)
    idxs = [0, 1, 2, 0]
    tops = [0, 3, 7, 10]
    lefts = [5, 0, 11, 2]
    crop = 16
    hflips = [0, 1, 0, 1]
    rots = [0, 0, 1, 1]
    out = r.crop_batch(idxs, tops, lefts, crop, hflips, rots, n_threads=3)
    for k in range(4):
        ref = imgs[idxs[k]][:, :, ::-1][tops[k]:tops[k] + crop,
                                        lefts[k]:lefts[k] + crop]
        # augment order (data/transforms.py): hflip first, then rot90
        if hflips[k]:
            ref = ref[:, ::-1]
        if rots[k]:
            ref = ref.transpose(1, 0, 2)
        np.testing.assert_array_equal(out[k], ref, err_msg=f"item {k}")


def test_crop_batch_rejects_bad_bounds(pack_files):
    from super_resolution_tpu.data.rawpack_dataset import RawPackReader

    gt_pack, _, _ = pack_files
    r = RawPackReader(gt_pack)
    with pytest.raises(ValueError):
        r.crop_batch([0], [100], [0], 16)
    with pytest.raises((ValueError, IndexError)):
        r.crop_batch([99], [0], [0], 16)


def test_paired_dataset(pack_files):
    from super_resolution_tpu.data.rawpack_dataset import RawPackPairedDataset

    gt_pack, lq_pack, _ = pack_files
    ds = RawPackPairedDataset({"gt_pack": gt_pack, "lq_pack": lq_pack,
                               "scale": 2, "gt_size": 16,
                               "use_hflip": True, "use_rot": True})
    ds.seed(0)
    item = ds[1]
    assert item["lq"].shape == (8, 8, 3)
    assert item["gt"].shape == (16, 16, 3)
    assert 0 <= item["lq"].min() and item["gt"].max() <= 1

    batch = ds.sample_batch(6)
    assert batch["lq"].shape == (6, 8, 8, 3)
    assert batch["gt"].shape == (6, 16, 16, 3)
