"""Shape-bucketed cross-image batched tiled eval (runtime/batched_eval.py).

Pins the two contracts the round-2 verdict asked for:
  - a varied-size image set evaluates with a HANDFUL of compiled programs
    (the per-image path would compile once per distinct size);
  - results are bit-identical to the per-image tile engine with the same
    plan (padding never read; duplicate-tile padding idempotent).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.runtime.batched_eval import (bucketed_tile_eval,
                                                       group_images,
                                                       tile_forward_group)
from super_resolution_tpu.runtime.tile import tile_forward


def _make_net(rng, c_mid=8, scale=2):
    from super_resolution_tpu.ops.conv import conv2d_nhwc
    from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle

    k1 = jnp.asarray(rng.standard_normal((c_mid, 3, 3, 3)).astype(np.float32)
                     * 0.1)
    k2 = jnp.asarray(rng.standard_normal(
        (3 * scale * scale, c_mid, 3, 3)).astype(np.float32) * 0.1)

    def apply_fn(params, x):
        a, b = params
        return pixel_shuffle(conv2d_nhwc(jax.nn.relu(conv2d_nhwc(x, a)), b),
                             scale)

    return apply_fn, (k1, k2)


def _varied_images(rng, sizes):
    return [jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
            for h, w in sizes]


def test_group_images_buckets_varied_sizes():
    """20 varied Urban100-like sizes collapse to <= 4 signatures."""
    rng = np.random.default_rng(0)
    sizes = [(int(rng.integers(150, 200)), int(rng.integers(220, 260)))
             for _ in range(20)]
    groups = group_images(sizes, tile_size=64, tile_pad=16, quant=64)
    assert sum(len(v) for v in groups.values()) == 20
    assert len(groups) <= 4, groups.keys()


def test_batched_eval_matches_per_image_tile_forward(rng):
    """Bit-exact vs runtime/tile.py per image, across a mixed-size set."""
    apply_fn, params = _make_net(rng)
    sizes = [(40, 56), (48, 56), (40, 64), (48, 64), (40, 56)]
    imgs = _varied_images(rng, sizes)
    outs = bucketed_tile_eval(apply_fn, params, imgs, 2, tile_size=16,
                              tile_pad=4, chunk=4, quant=8)
    for im, out in zip(imgs, outs):
        ref = tile_forward(lambda t: apply_fn(params, t), im, 2,
                           tile_size=16, tile_pad=4, chunk=4)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_batched_eval_compile_count(rng):
    """A 12-image varied set runs with <= 3 traced programs (trace count
    proxies compile count: the network fn is traced once per compiled
    bucket program)."""
    base_fn, params = _make_net(rng)
    traces = []

    def counting_fn(p, x):
        traces.append(x.shape)
        return base_fn(p, x)

    rng2 = np.random.default_rng(3)
    sizes = [(int(rng2.integers(40, 56)), int(rng2.integers(48, 72)))
             for _ in range(12)]
    imgs = _varied_images(np.random.default_rng(4), sizes)
    outs = bucketed_tile_eval(counting_fn, params, imgs, 2, tile_size=16,
                              tile_pad=4, chunk=4, quant=32)
    assert len(outs) == 12
    assert all(o.shape == (1, h * 2, w * 2, 3)
               for o, (h, w) in zip(outs, sizes))
    assert len(traces) <= 3, traces


def test_group_signature_mismatch_raises(rng):
    apply_fn, params = _make_net(rng)
    imgs = [jnp.zeros((1, 40, 56, 3)), jnp.zeros((1, 20, 56, 3))]
    with pytest.raises(ValueError, match="share window/center"):
        tile_forward_group(apply_fn, params, imgs, 2, tile_size=16,
                           tile_pad=4)


@pytest.mark.slow
def test_pipeline_bucketed_eval_matches_per_image(tmp_path):
    """Full test pipeline with val.bucketed_eval reports the same metrics
    as per-image tile mode (bit-identical outputs -> identical PSNR)."""
    import cv2

    from super_resolution_tpu.runtime.test_pipeline import run_test
    from super_resolution_tpu.utils.matlab import imresize
    from super_resolution_tpu.utils.options import process_options

    rng = np.random.default_rng(11)
    gt_dir, lq_dir = tmp_path / "GT", tmp_path / "LQ"
    gt_dir.mkdir(), lq_dir.mkdir()
    for i, (h, w) in enumerate([(40, 48), (48, 48), (40, 56), (44, 48)]):
        gt = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        lr = imresize(gt.astype(np.float32) / 255.0, 0.5)
        lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), gt)
        cv2.imwrite(str(lq_dir / f"img{i}x2.png"), lr8)

    def _opt(tag, bucketed):
        return {
            "name": f"bucketed_{tag}", "model_type": "HATModel", "scale": 2,
            "num_gpu": 1, "manual_seed": 0,
            "network_g": {
                "type": "ESC", "dim": 16, "pdim": 8, "kernel_size": 5,
                "n_blocks": 1, "conv_blocks": 1, "window_size": 8,
                "num_heads": 2, "upscaling_factor": 2, "exp_ratio": 1.0,
            },
            "tile": {"tile_size": 16, "tile_pad": 4, "chunk": 4},
            "datasets": {"test_1": {
                "name": "VarSet", "type": "PairedImageDataset",
                "dataroot_gt": str(gt_dir), "dataroot_lq": str(lq_dir),
                "io_backend": {"type": "disk"}}},
            "path": {"pretrain_network_g": None,
                     "results_root": str(tmp_path / tag)},
            "val": {"save_img": False, "suffix": None,
                    "bucketed_eval": bucketed, "bucket_quant": 8,
                    "metrics": {
                        "psnr": {"type": "calculate_psnr", "crop_border": 2,
                                 "test_y_channel": True}}},
        }

    res_b = run_test(process_options(_opt("on", True), str(tmp_path / "on"),
                                     is_train=False))
    res_p = run_test(process_options(_opt("off", False),
                                     str(tmp_path / "off"), is_train=False))
    assert res_b["VarSet"]["psnr"] == pytest.approx(
        res_p["VarSet"]["psnr"], abs=1e-9)


def test_batched_eval_single_image_and_tiny(rng):
    """An image smaller than the tile window still round-trips (window
    clamps to the image; its own signature)."""
    apply_fn, params = _make_net(rng)
    imgs = [jnp.asarray(rng.random((1, 12, 14, 3)).astype(np.float32))]
    outs = bucketed_tile_eval(apply_fn, params, imgs, 2, tile_size=16,
                              tile_pad=4)
    ref = tile_forward(lambda t: apply_fn(params, t), imgs[0], 2,
                       tile_size=16, tile_pad=4)
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(ref))


def test_gen_meta_info_roundtrip(tmp_path):
    """scripts/gen_meta_info.py emits the reference's formats and the
    image listing round-trips through paired_paths_from_meta_info."""
    import subprocess
    import sys as _sys

    import cv2

    from super_resolution_tpu.data.paired_dataset import \
        paired_paths_from_meta_info

    gt = tmp_path / "GT"
    gt.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(gt / f"im{i}.png"),
                    (rng.random((8 + i, 10, 3)) * 255).astype(np.uint8))
    meta = tmp_path / "meta_info_GT.txt"
    r = subprocess.run([_sys.executable, "scripts/gen_meta_info.py",
                        "--input", str(gt), "--output", str(meta)],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = meta.read_text().splitlines()
    assert lines[0] == "im0.png (8,10,3)"          # reference line format
    paths = paired_paths_from_meta_info(str(tmp_path), str(gt), str(meta),
                                        filename_tmpl="{}x2")
    assert len(paths) == 3
    assert paths[1]["lq_path"].endswith("im1x2.png")

    # video format: clip folders
    vid = tmp_path / "vid" / "000"
    vid.mkdir(parents=True)
    for i in range(4):
        cv2.imwrite(str(vid / f"{i:08d}.png"),
                    (rng.random((6, 8, 3)) * 255).astype(np.uint8))
    vmeta = tmp_path / "meta_info_vid.txt"
    r = subprocess.run([_sys.executable, "scripts/gen_meta_info.py",
                        "--input", str(tmp_path / "vid"), "--output",
                        str(vmeta), "--video"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert vmeta.read_text().splitlines() == ["000 4 (6,8,3)"]
