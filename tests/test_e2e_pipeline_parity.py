"""Cross-stack END-TO-END pipeline parity vs the reference (round-2
verdict item 4).

Runs the reference's own validation pipeline (basicsr/test.py:11-45
semantics: PairedImageDataset -> HATModel -> nondist_validation with
pre/post_process, tensor2img, imwrite, PSNR/SSIM — torch CPU,
hat/models/hat_model.py:114-185) and our `run_test` YAML pipeline on the
SAME synthetic mini-dataset with the SAME .pth weights, and asserts the
reported PSNR/SSIM agree <= 0.01 dB and the saved PNGs are
pixel-identical. This is the closest offline stand-in for the
north-star gate (no pretrained weights / benchmark sets are mounted):
it catches glue-level drift (padding, border crop, save-then-measure
ordering) that per-component golden tests cannot.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HAT_KW = dict(img_size=32, embed_dim=60, depths=(2, 2), num_heads=(6, 6),
              window_size=8, compress_ratio=3, squeeze_factor=30,
              conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
              upscale=2, upsampler="pixelshuffle")


def _make_dataset(root, n=3):
    import cv2

    from super_resolution_tpu.utils.matlab import imresize

    gt_dir, lq_dir = root / "GT", root / "LQ"
    gt_dir.mkdir(), lq_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(n):
        h, w = 36 + 4 * i, 44
        # smooth-ish content so PSNR is in a realistic range
        base = rng.random((6, 6, 3))
        gt = np.clip(cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
                     + 0.05 * rng.random((h, w, 3)), 0, 1)
        gt8 = (gt * 255).round().astype(np.uint8)
        lr = imresize(gt8.astype(np.float32) / 255.0, 0.5)
        lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), gt8[..., ::-1])
        cv2.imwrite(str(lq_dir / f"img{i}x2.png"), lr8[..., ::-1])
    return str(gt_dir), str(lq_dir)


def _reference_validation(gt_dir, lq_dir, pth_path, out_root):
    """The reference pipeline's semantics, torch CPU."""
    from reference_oracle import get_hat_model

    hat_model = get_hat_model()
    from basicsr.data.paired_image_dataset import PairedImageDataset

    net_opt = {"type": "HAT", **HAT_KW}
    opt = {
        "name": "e2e_ref", "is_train": False, "scale": 2, "num_gpu": 0,
        "dist": False,
        "network_g": net_opt,
        "path": {"pretrain_network_g": pth_path, "strict_load_g": True,
                 "param_key_g": "params",
                 "visualization": os.path.join(out_root, "vis")},
        "val": {"suffix": None, "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 2,
                     "test_y_channel": True},
            "ssim": {"type": "calculate_ssim", "crop_border": 2,
                     "test_y_channel": True}}},
    }
    ds_opt = {"name": "E2ESet", "phase": "val", "scale": 2,
              "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
              "filename_tmpl": "{}x2", "io_backend": {"type": "disk"}}
    dataset = PairedImageDataset(ds_opt)
    loader = torch.utils.data.DataLoader(dataset, batch_size=1,
                                         shuffle=False, num_workers=0)
    model = hat_model.HATModel(opt)
    model.validation(loader, current_iter=0, tb_logger=None, save_img=True)
    return dict(model.metric_results), os.path.join(out_root, "vis",
                                                    "E2ESet")


def _our_validation(gt_dir, lq_dir, pth_path, out_root):
    from super_resolution_tpu.runtime.test_pipeline import run_test
    from super_resolution_tpu.utils.options import process_options

    opt = {
        "name": "e2e_ours", "model_type": "HATModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0,
        "network_g": {"type": "HAT", **HAT_KW},
        "datasets": {"test_1": {
            "name": "E2ESet", "type": "PairedImageDataset",
            "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
            "io_backend": {"type": "disk"}}},
        "path": {"pretrain_network_g": pth_path, "strict_load_g": True,
                 "param_key_g": "params", "results_root": out_root},
        "val": {"save_img": True, "suffix": None, "metrics": {
            "psnr": {"type": "calculate_psnr", "crop_border": 2,
                     "test_y_channel": True},
            "ssim": {"type": "calculate_ssim", "crop_border": 2,
                     "test_y_channel": True}}},
    }
    results = run_test(process_options(opt, out_root, is_train=False))
    return results["E2ESet"], os.path.join(out_root, "e2e_ours",
                                           "visualization", "E2ESet")


@pytest.mark.slow
def test_cross_stack_pipeline_parity(tmp_path):
    import cv2

    from reference_oracle import get_hat_arch

    gt_dir, lq_dir = _make_dataset(tmp_path)

    # one set of weights for both stacks, loaded from the same .pth
    hat_arch = get_hat_arch()
    torch.manual_seed(0)
    tm = hat_arch.HAT(**HAT_KW)
    tm.eval()
    pth_path = str(tmp_path / "tiny_hat.pth")
    torch.save({"params": tm.state_dict()}, pth_path)

    ref_metrics, ref_vis = _reference_validation(
        gt_dir, lq_dir, pth_path, str(tmp_path / "ref"))
    our_metrics, our_vis = _our_validation(
        gt_dir, lq_dir, pth_path, str(tmp_path / "ours"))

    assert abs(our_metrics["psnr"] - ref_metrics["psnr"]) <= 0.01, \
        (our_metrics, ref_metrics)
    assert abs(our_metrics["ssim"] - ref_metrics["ssim"]) <= 1e-4, \
        (our_metrics, ref_metrics)

    # saved SR PNGs pixel-identical up to the 1/255 rounding threshold:
    # fp values landing exactly on a .5 boundary may round apart — allow
    # a small fraction of values off by exactly one uint8 step (random
    # weights cluster outputs near boundaries), nothing more
    for i in range(3):
        a = cv2.imread(os.path.join(ref_vis, f"img{i}x2_e2e_ref.png"))
        b = cv2.imread(os.path.join(our_vis, f"img{i}x2_e2e_ours.png"))
        assert a is not None and b is not None
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert diff.max() <= 1, f"img{i}: max uint8 delta {diff.max()}"
        frac = float((diff > 0).mean())
        assert frac <= 5e-3, f"img{i}: {frac:.2e} of values differ"
