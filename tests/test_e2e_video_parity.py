"""Cross-stack END-TO-END video pipeline parity vs the reference.

Companion to test_e2e_pipeline_parity (which covers the image-SR stack):
runs the reference's own recurrent-video validation
(basicsr/models/video_recurrent_model.py::dist_validation semantics —
whole-clip BasicVSR forward, per-frame tensor2img + PSNR into a
folder-indexed metric table) and our VideoRecurrentModel validation on
the SAME synthetic clip tree with the SAME .pth weights, and asserts
the per-frame PSNR tables agree <= 0.01 dB. Catches glue-level drift in
the video path (clip batching, frame iteration order, tensor2img
rounding, metric table indexing) that per-arch golden tests cannot.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCALE = 4
VSR_KW = dict(num_feat=8, num_block=1)


def _make_clips(root, n_clips=2, n_frames=3, lq_size=64):
    import cv2

    gt_root = os.path.join(root, "gt")
    lq_root = os.path.join(root, "lq")
    rng = np.random.default_rng(7)
    for c in range(n_clips):
        os.makedirs(os.path.join(gt_root, f"{c:03d}"), exist_ok=True)
        os.makedirs(os.path.join(lq_root, f"{c:03d}"), exist_ok=True)
        for f in range(n_frames):
            h = w = lq_size * SCALE
            base = rng.random((6, 6, 3))
            gt = np.clip(cv2.resize(base, (w, h),
                                    interpolation=cv2.INTER_CUBIC)
                         + 0.05 * rng.random((h, w, 3)), 0, 1)
            gt8 = (gt * 255).round().astype(np.uint8)
            lq8 = gt8[::SCALE, ::SCALE]
            cv2.imwrite(os.path.join(gt_root, f"{c:03d}", f"{f:08d}.png"),
                        gt8[..., ::-1])
            cv2.imwrite(os.path.join(lq_root, f"{c:03d}", f"{f:08d}.png"),
                        lq8[..., ::-1])
    return gt_root, lq_root


def _reference_validation(gt_root, lq_root, pth_path):
    from reference_oracle import get_hat_model

    get_hat_model()  # wires build_network/build_loss/calculate_metric shims
    import basicsr.archs.basicvsr_arch  # noqa: F401 (registers BasicVSR)
    from basicsr.data.video_test_dataset import VideoRecurrentTestDataset
    from basicsr.models.video_recurrent_model import VideoRecurrentModel

    opt = {
        "name": "e2e_vsr_ref", "is_train": False, "scale": SCALE,
        "num_gpu": 0, "dist": False, "model_type": "VideoRecurrentModel",
        "network_g": {"type": "BasicVSR", **VSR_KW},
        "path": {"pretrain_network_g": pth_path, "strict_load_g": True,
                 "param_key_g": "params"},
        "val": {"suffix": None, "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 0,
                     "test_y_channel": False}}},
    }
    ds_opt = {"name": "REDS4", "phase": "val", "scale": SCALE,
              "dataroot_gt": gt_root, "dataroot_lq": lq_root,
              "cache_data": True, "io_backend": {"type": "disk"},
              "num_frame": -1, "padding": "reflection"}
    dataset = VideoRecurrentTestDataset(ds_opt)
    loader = torch.utils.data.DataLoader(dataset, batch_size=1,
                                         shuffle=False, num_workers=0)
    model = VideoRecurrentModel(opt)
    # two CPU-only quirks of the reference need GPU semantics emulated:
    # (1) feed_data's .to(device) is a no-op copy on CPU, so the in-place
    # val_data['lq'].squeeze_(0) after feed_data
    # (video_recurrent_model.py:106) would alias-revert self.lq to 4-dim;
    # clone like a device transfer would
    orig_feed = model.feed_data

    def feed_clone(data):
        orig_feed({k: (v.clone() if torch.is_tensor(v) else v)
                   for k, v in data.items()})

    model.feed_data = feed_clone
    # (2) the reference allocates its metric table with device='cuda'
    # (video_recurrent_model.py:80-82); pre-seed CPU tensors so the same
    # accumulation code runs off-GPU
    from collections import Counter

    n_per_folder = Counter(dataset.data_info["folder"])
    model.metric_results = {
        folder: torch.zeros(n, 1, dtype=torch.float32)
        for folder, n in n_per_folder.items()}
    model.validation(loader, current_iter=0, tb_logger=None, save_img=False)
    return {k: v.numpy()[:, 0] for k, v in model.metric_results.items()}


def _our_validation(gt_root, lq_root, pth_path):
    from super_resolution_tpu.data import EvalLoader
    from super_resolution_tpu.data.video_datasets import \
        VideoRecurrentTestDataset
    from super_resolution_tpu.runtime import build_model

    opt = {
        "name": "e2e_vsr_ours", "model_type": "VideoRecurrentModel",
        "scale": SCALE, "num_gpu": 1, "manual_seed": 0, "is_train": False,
        "network_g": {"type": "BasicVSR", **VSR_KW},
        "path": {"pretrain_network_g": pth_path, "strict_load_g": True,
                 "param_key_g": "params"},
        "val": {"suffix": None, "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 0,
                     "test_y_channel": False}}},
    }
    model = build_model(opt)
    ds = VideoRecurrentTestDataset(
        {"name": "REDS4", "dataroot_gt": gt_root, "dataroot_lq": lq_root,
         "cache_data": True, "io_backend": {"type": "disk"},
         "num_frame": -1, "padding": "reflection"})
    ds.opt = {"name": "REDS4"}
    model.nondist_validation(EvalLoader(ds), 1, None, save_img=False)
    return {k: np.asarray(v)[:, 0] for k, v in model.metric_results.items()}


@pytest.mark.slow
def test_cross_stack_video_pipeline_parity(tmp_path):
    from reference_oracle import get_basicsr

    get_basicsr()
    from basicsr.archs.basicvsr_arch import BasicVSR as RefBasicVSR

    gt_root, lq_root = _make_clips(str(tmp_path))

    torch.manual_seed(0)
    tm = RefBasicVSR(**VSR_KW)
    tm.eval()
    pth_path = str(tmp_path / "tiny_vsr.pth")
    torch.save({"params": tm.state_dict()}, pth_path)

    ref = _reference_validation(gt_root, lq_root, pth_path)
    ours = _our_validation(gt_root, lq_root, pth_path)

    assert sorted(ref) == sorted(ours)
    for folder in ref:
        np.testing.assert_allclose(
            ours[folder], ref[folder], atol=0.01,
            err_msg=f"per-frame PSNR table for clip {folder}")
