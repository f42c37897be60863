"""Video data layer + video runner tests: REDS/Vimeo90K dataset semantics
on synthetic clips, frame-index generation parity, and end-to-end
train-step + validation smoke for the recurrent and sliding-window
runners."""

import os

import numpy as np
import pytest

from super_resolution_tpu.utils.img import imwrite


def _make_clip_tree(root, n_clips=2, n_frames=6, lq_size=16, scale=2):
    """folder-per-clip GT/LQ frame tree."""
    gt_root = os.path.join(root, "gt")
    lq_root = os.path.join(root, "lq")
    rng = np.random.default_rng(0)
    for c in range(n_clips):
        for f in range(n_frames):
            gt = (rng.random((lq_size * scale, lq_size * scale, 3)) * 255
                  ).astype(np.uint8)
            lq = gt[::scale, ::scale]
            imwrite(gt, os.path.join(gt_root, f"{c:03d}", f"{f:08d}.png"))
            imwrite(lq, os.path.join(lq_root, f"{c:03d}", f"{f:08d}.png"))
    return gt_root, lq_root


def test_generate_frame_indices_matches_reference():
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.data.data_util import generate_frame_indices as ref_gfi
    from super_resolution_tpu.data.video_datasets import \
        generate_frame_indices

    for pad in ("replicate", "reflection", "reflection_circle", "circle"):
        for crt in (0, 1, 5, 98, 99):
            assert generate_frame_indices(crt, 100, 5, pad) == \
                ref_gfi(crt, 100, 5, pad), (pad, crt)


def test_duf_downsample_matches_reference(rng):
    import torch
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.data.data_util import duf_downsample as ref_duf
    from super_resolution_tpu.data.video_datasets import duf_downsample

    x = rng.random((3, 20, 24, 3), dtype=np.float32)  # (T,H,W,C)
    ref = ref_duf(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous(),
                  kernel_size=13, scale=2).numpy()
    ours = duf_downsample(x, kernel_size=13, scale=2)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-5)


def test_video_test_dataset(tmp_path):
    from super_resolution_tpu.data.video_datasets import VideoTestDataset

    gt_root, lq_root = _make_clip_tree(str(tmp_path))
    ds = VideoTestDataset({"name": "REDS4", "dataroot_gt": gt_root,
                           "dataroot_lq": lq_root, "cache_data": True,
                           "io_backend": {"type": "disk"},
                           "num_frame": 3, "padding": "reflection"})
    assert len(ds) == 12
    item = ds[0]
    assert item["lq"].shape == (3, 16, 16, 3)
    assert item["gt"].shape == (32, 32, 3)
    assert item["border"] == 1
    mid = ds[3]  # frame 3 of clip 0
    assert mid["border"] == 0


def test_video_recurrent_test_dataset(tmp_path):
    from super_resolution_tpu.data.video_datasets import \
        VideoRecurrentTestDataset

    gt_root, lq_root = _make_clip_tree(str(tmp_path))
    ds = VideoRecurrentTestDataset(
        {"name": "REDS4", "dataroot_gt": gt_root, "dataroot_lq": lq_root,
         "cache_data": True, "io_backend": {"type": "disk"},
         "num_frame": 3, "padding": "reflection"})
    assert len(ds) == 2
    item = ds[0]
    assert item["lq"].shape == (6, 16, 16, 3)
    assert item["gt"].shape == (6, 32, 32, 3)


def test_reds_recurrent_dataset(tmp_path):
    from super_resolution_tpu.data.video_datasets import REDSRecurrentDataset

    gt_root, lq_root = _make_clip_tree(str(tmp_path), n_clips=1, n_frames=6)
    # rename clip dir to a non-val partition name and build a meta file
    meta = tmp_path / "meta.txt"
    meta.write_text("000 6 (32,32,3)\n")
    ds = REDSRecurrentDataset({
        "dataroot_gt": gt_root, "dataroot_lq": lq_root,
        "meta_info_file": str(meta), "val_partition": "official",
        "io_backend": {"type": "disk"}, "num_frame": 3, "gt_size": 16,
        "scale": 2, "interval_list": [1], "random_reverse": False,
        "use_hflip": False, "use_rot": False, "test_mode": False})
    ds.seed(0)
    item = ds[0]
    assert item["lq"].shape == (3, 8, 8, 3)
    assert item["gt"].shape == (3, 16, 16, 3)
    # GT must be the exact 2x nearest grid of LQ (synthetic construction)
    np.testing.assert_allclose(item["gt"][:, ::2, ::2], item["lq"], atol=1e-6)


@pytest.mark.slow
def test_video_recurrent_model_train_and_val(tmp_path):
    """BasicVSR runner: one train step + whole-clip validation."""
    from super_resolution_tpu.data.video_datasets import \
        VideoRecurrentTestDataset
    from super_resolution_tpu.data import EvalLoader
    from super_resolution_tpu.runtime import build_model

    gt_root, lq_root = _make_clip_tree(str(tmp_path), n_clips=1, n_frames=2,
                                       lq_size=64, scale=4)
    opt = {
        "name": "test_vsr", "model_type": "VideoRecurrentModel", "scale": 4,
        "is_train": True, "manual_seed": 0,
        "network_g": {"type": "BasicVSR", "num_feat": 8, "num_block": 1},
        "path": {"models": str(tmp_path / "models"),
                 "visualization": str(tmp_path / "vis")},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                  "fix_flow": 1, "flow_lr_mul": 0.125},
        "val": {"metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 0}}},
    }
    model = build_model(opt)
    model.setup_training()
    batch = {"lq": np.random.rand(1, 2, 64, 64, 3).astype(np.float32),
             "gt": np.random.rand(1, 2, 256, 256, 3).astype(np.float32)}
    model.optimize_parameters(batch, 1)
    assert "l_pix" in model.get_current_log()

    ds = VideoRecurrentTestDataset(
        {"name": "clip", "dataroot_gt": gt_root, "dataroot_lq": lq_root,
         "cache_data": True, "io_backend": {"type": "disk"},
         "num_frame": 2, "padding": "reflection"})
    ds.opt = {"name": "clip"}
    model.opt["is_train"] = False
    model.nondist_validation(EvalLoader(ds), 1, None, save_img=False)
    assert model.metric_results["000"].shape == (2, 1)
    assert (model.metric_results["000"] > 0).all()


@pytest.mark.slow
def test_edvr_model_train_smoke(tmp_path):
    from super_resolution_tpu.runtime import build_model

    opt = {
        "name": "test_edvr", "model_type": "EDVRModel", "scale": 4,
        "is_train": True, "manual_seed": 0,
        "network_g": {"type": "EDVR", "num_feat": 8, "num_frame": 3,
                      "deformable_groups": 2, "num_extract_block": 1,
                      "num_reconstruct_block": 1, "with_tsa": True},
        "path": {"models": str(tmp_path / "models"),
                 "visualization": str(tmp_path / "vis")},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "total_iter": 2, "pixel_opt": {"type": "L1Loss"},
                  "dcn_lr_mul": 0.1, "tsa_iter": 2},
        "val": {"metrics": None},
    }
    model = build_model(opt)
    model.setup_training()
    import jax

    p0 = jax.tree.map(np.asarray, model.params)
    batch = {"lq": np.random.rand(2, 3, 16, 16, 3).astype(np.float32),
             "gt": np.random.rand(2, 64, 64, 3).astype(np.float32)}
    model.optimize_parameters(batch, 1)
    # during the TSA-only phase only 'fusion' params may change
    flat0 = dict(jax.tree_util.tree_flatten_with_path(p0)[0])
    flat1 = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, model.params))[0])
    changed = {"/".join(str(getattr(k, "key", k)) for k in path): not
               np.allclose(flat0[path], flat1[path], atol=1e-9)
               for path in flat0}
    assert any(v for k, v in changed.items() if "fusion" in k)
    assert not any(v for k, v in changed.items() if "fusion" not in k)


def test_lmdb_roundtrip(tmp_path):
    """LmdbMaker -> LmdbBackend roundtrip. Runs on the pure-Python LMDB
    format implementation (utils/mdb.py) when python-lmdb is absent;
    format-level coverage lives in test_mdb.py."""
    import cv2

    from super_resolution_tpu.utils.file_client import FileClient
    from super_resolution_tpu.utils.lmdb_util import LmdbMaker

    img = (np.random.default_rng(0).random((8, 9, 3)) * 255).astype(np.uint8)
    _, img_byte = cv2.imencode(".png", img)
    path = str(tmp_path / "test.lmdb")
    maker = LmdbMaker(path)
    maker.put(img_byte.tobytes(), "a", img.shape)
    maker.close()
    client = FileClient("lmdb", db_paths=path, client_keys="gt")
    from super_resolution_tpu.utils.img import imfrombytes

    out = imfrombytes(client.get("a", "gt"))
    np.testing.assert_array_equal(out, img)


def test_memcached_backend_roundtrip():
    """MemcachedBackend against an in-process fake memcached speaking the
    text protocol (no external server in this environment)."""
    import socket
    import threading

    from super_resolution_tpu.utils.file_client import FileClient

    # binary value embedding the protocol terminator — must NOT truncate
    tricky = b"\x00head" + b"END\r\n" + b"tail" * 1000 + b"\xff"
    store = {b"datasets/img001.png": b"\x89PNG-fake-bytes",
             b"a%20key/with.png": b"other",
             b"tricky.bin": tricky}

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        buf = b""
        try:
            while True:
                chunk = conn.recv(4096)
                if not chunk:
                    return
                buf += chunk
                while b"\r\n" in buf:
                    line, buf = buf.split(b"\r\n", 1)
                    if not line.startswith(b"get "):
                        continue
                    key = line[4:]
                    val = store.get(key)
                    if val is None:
                        conn.sendall(b"END\r\n")
                    else:
                        conn.sendall(b"VALUE " + key + b" 0 "
                                     + str(len(val)).encode() + b"\r\n"
                                     + val + b"\r\nEND\r\n")
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    fc = FileClient("memcached", server=f"127.0.0.1:{port}")
    assert fc.get("datasets/img001.png") == b"\x89PNG-fake-bytes"
    assert fc.get("a key/with.png") == b"other"    # space percent-encoded
    assert fc.get("tricky.bin") == tricky          # embedded END\r\n intact
    # >250-byte keys hash instead of truncating: two long paths differing
    # only past byte 250 must not collide
    from super_resolution_tpu.utils.file_client import MemcachedBackend
    ka = MemcachedBackend._encode_key("x/" + "a" * 300 + "1.png")
    kb = MemcachedBackend._encode_key("x/" + "a" * 300 + "2.png")
    assert ka != kb and len(ka) <= 250 and len(kb) <= 250
    with pytest.raises(KeyError):
        fc.get("missing.png")
    srv.close()
