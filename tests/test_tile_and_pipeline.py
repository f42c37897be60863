"""End-to-end: on-device tile engine equivalence + full test pipeline on
synthetic data (the minimum slice of BASELINE configs 1-3)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.runtime.tile import tile_forward


def test_tile_identity_roundtrip(rng):
    """scale=1 identity network reassembles the input exactly."""
    x = jnp.asarray(rng.random((1, 37, 53, 3), dtype=np.float32))
    out = tile_forward(lambda t: t, x, scale=1, tile_size=16, tile_pad=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_tile_forward_identity_network(rng):
    """With a pointwise network, tiled output == whole-image output exactly."""
    x = jnp.asarray(rng.random((1, 37, 53, 3), dtype=np.float32))

    def net(t):  # pointwise x2 'upscale' by nearest: repeat + shuffle
        from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
        return pixel_shuffle(jnp.repeat(t * 2.0 + 0.1, 4, axis=-1), 2)

    whole = net(x)
    tiled = tile_forward(net, x, scale=2, tile_size=16, tile_pad=4, chunk=4)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(whole), atol=1e-6)


@pytest.mark.parametrize("shape", [(40, 56), (37, 53), (16, 16), (10, 70)])
def test_tile_forward_conv_network_exact(rng, shape):
    """With a conv net whose receptive field fits in the halo, tiled output
    equals the whole-image output EVERYWHERE: inward-shifted windows mean
    borders zero-pad exactly like the whole-image forward."""
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
            x = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)])(x)
            x = nn.relu(x)
            x = nn.Conv(12, (3, 3), padding=[(1, 1), (1, 1)])(x)
            return pixel_shuffle(x, 2)

    net = Net()
    h, w = shape
    x = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    fwd = lambda t: net.apply(variables, t)
    whole = np.asarray(fwd(x))
    tiled = np.asarray(tile_forward(fwd, x, scale=2, tile_size=16, tile_pad=4))
    assert tiled.shape == whole.shape
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_tile_forward_rectangular_and_chunk_clamp(rng):
    """(y, x) tile plans (kill halo waste along a fully-covered axis) and
    chunk clamping (a 1-tile image must not pad to an 8-slot batch) keep
    exactness with a halo-bounded conv net."""
    from flax import linen as nn

    calls = []

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
            calls.append(x.shape)
            x = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)])(x)
            x = nn.relu(x)
            x = nn.Conv(12, (3, 3), padding=[(1, 1), (1, 1)])(x)
            return pixel_shuffle(x, 2)

    net = Net()
    x = jnp.asarray(rng.random((1, 24, 40, 3), dtype=np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    fwd = lambda t: net.apply(variables, t)
    whole = np.asarray(fwd(x))

    # rows in one 24-high band (no y halo), columns split in 16s
    tiled = np.asarray(tile_forward(fwd, x, scale=2, tile_size=(24, 16),
                                    tile_pad=(0, 4), chunk=3))
    np.testing.assert_allclose(tiled, whole, atol=1e-5)
    assert any(s[1] == 24 and s[2] == 24 for s in calls)  # 24 x (16+2*4)

    # whole image in a single tile: chunk 8 must clamp to 1 (no batch pad)
    calls.clear()
    tiled1 = np.asarray(tile_forward(fwd, x, scale=2, tile_size=64,
                                     tile_pad=8, chunk=8))
    np.testing.assert_allclose(tiled1, whole, atol=1e-5)
    assert all(s[0] == 1 for s in calls if len(s) == 4)


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """Tiny GT/LQ x2 pair folders with MATLAB-bicubic LR."""
    import cv2

    from super_resolution_tpu.utils.matlab import imresize

    root = tmp_path_factory.mktemp("data")
    gt_dir, lq_dir = root / "GT", root / "LQ"
    gt_dir.mkdir(), lq_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        h, w = 40 + 8 * i, 48
        gt = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        lr = imresize(gt.astype(np.float32) / 255.0, 0.5)
        lr8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        cv2.imwrite(str(gt_dir / f"img{i}.png"), gt)
        cv2.imwrite(str(lq_dir / f"img{i}x2.png"), lr8)
    return str(gt_dir), str(lq_dir)


def _pipeline_opt(gt_dir, lq_dir, tmp, tile=False):
    opt = {
        "name": "test_ESC_x2",
        "model_type": "HATModel",
        "scale": 2,
        "num_gpu": 1,
        "manual_seed": 0,
        "network_g": {
            "type": "ESC", "dim": 16, "pdim": 8, "kernel_size": 5,
            "n_blocks": 1, "conv_blocks": 1, "window_size": 8,
            "num_heads": 2, "upscaling_factor": 2, "exp_ratio": 1.0,
        },
        "datasets": {
            "test_1": {
                "name": "Synth5", "type": "PairedImageDataset",
                "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                "io_backend": {"type": "disk"},
            },
        },
        "path": {"pretrain_network_g": None, "results_root": str(tmp)},
        "val": {
            "save_img": True, "suffix": None,
            "metrics": {
                "psnr": {"type": "calculate_psnr", "crop_border": 2,
                         "test_y_channel": True},
                "ssim": {"type": "calculate_ssim", "crop_border": 2,
                         "test_y_channel": True},
            },
        },
    }
    if tile:
        opt["tile"] = {"tile_size": 16, "tile_pad": 4, "chunk": 2}
    return opt


def test_full_test_pipeline(synthetic_dataset, tmp_path):
    from super_resolution_tpu.runtime.test_pipeline import run_test
    from super_resolution_tpu.utils.options import process_options

    gt_dir, lq_dir = synthetic_dataset
    opt = process_options(_pipeline_opt(gt_dir, lq_dir, tmp_path),
                          str(tmp_path), is_train=False)
    results = run_test(opt)
    assert "Synth5" in results
    assert 0 < results["Synth5"]["psnr"] < 60
    assert 0 < results["Synth5"]["ssim"] <= 1
    # saved images exist
    vis = os.path.join(str(tmp_path), "test_ESC_x2", "visualization", "Synth5")
    assert len(os.listdir(vis)) == 3


def test_pipeline_tile_close_to_whole(synthetic_dataset, tmp_path):
    """Tile-mode metrics match whole-image metrics closely (same weights)."""
    from super_resolution_tpu.runtime.test_pipeline import run_test
    from super_resolution_tpu.utils.options import process_options

    gt_dir, lq_dir = synthetic_dataset
    opt_w = process_options(_pipeline_opt(gt_dir, lq_dir, tmp_path / "w"),
                            str(tmp_path / "w"), is_train=False)
    opt_t = process_options(_pipeline_opt(gt_dir, lq_dir, tmp_path / "t",
                                          tile=True),
                            str(tmp_path / "t"), is_train=False)
    r_whole = run_test(opt_w)
    r_tile = run_test(opt_t)
    assert abs(r_whole["Synth5"]["psnr"] - r_tile["Synth5"]["psnr"]) < 0.05


def test_tile_forward_multichip_mesh(rng):
    """Tiles sharded over the 8-device CPU mesh == single-device output
    (BASELINE config 5: multi-chip tiled inference)."""
    from flax import linen as nn

    from super_resolution_tpu.parallel.mesh import make_mesh

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
            x = nn.Conv(12, (3, 3), padding=[(1, 1), (1, 1)])(x)
            return pixel_shuffle(nn.relu(x), 2)

    net = Net()
    x = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    fwd = lambda t: net.apply(variables, t)

    single = np.asarray(tile_forward(fwd, x, 2, tile_size=16, tile_pad=4,
                                     chunk=8))
    mesh = make_mesh(8)
    multi_fn = jax.jit(lambda img: tile_forward(fwd, img, 2, tile_size=16,
                                                tile_pad=4, chunk=8,
                                                mesh=mesh))
    multi = np.asarray(multi_fn(x))
    np.testing.assert_allclose(multi, single, atol=1e-6)


def test_dist_validation_single_process(tmp_path, rng):
    """dist_validation degrades to the full eval under one process and
    matches nondist results."""
    import numpy as np

    import jax

    from super_resolution_tpu.data import EvalLoader
    from super_resolution_tpu.data.paired_dataset import PairedImageDataset
    from super_resolution_tpu.runtime import build_model
    from super_resolution_tpu.utils.img import imwrite

    gt_dir, lq_dir = tmp_path / "gt", tmp_path / "lq"
    r = np.random.default_rng(0)
    for name in ("a", "b", "c"):
        gt = (r.random((16, 16, 3)) * 255).astype(np.uint8)
        imwrite(gt, str(gt_dir / f"{name}.png"))
        imwrite(gt[::2, ::2], str(lq_dir / f"{name}x2.png"))
    opt = {
        "name": "distval", "model_type": "SRModel", "scale": 2,
        "is_train": False, "manual_seed": 0,
        "network_g": {"type": "EDSR", "num_feat": 8, "num_block": 1,
                      "upscale": 2},
        "path": {"visualization": str(tmp_path / "vis")},
        "val": {"metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 2}}},
    }
    model = build_model(opt)
    ds = PairedImageDataset({"name": "distval", "phase": "val", "scale": 2,
                             "dataroot_gt": str(gt_dir),
                             "dataroot_lq": str(lq_dir),
                             "io_backend": {"type": "disk"}})
    model.dist_validation(EvalLoader(ds), 1, None, False)
    dist_psnr = model.metric_results["psnr"]
    model.nondist_validation(EvalLoader(ds), 1, None, False)
    assert abs(dist_psnr - model.metric_results["psnr"]) < 1e-9


def test_eval_profile_trace(synthetic_dataset, tmp_path):
    """logger.profile in a *test* YAML traces the whole validation pass and
    writes a TensorBoard-readable xplane dump (utils/profiler.py::trace_eval;
    the reference's only eval timing is wall-clock prints,
    ESC/scripts/test_direct_metrics.py)."""
    from super_resolution_tpu.runtime.test_pipeline import run_test
    from super_resolution_tpu.utils.options import process_options

    gt_dir, lq_dir = synthetic_dataset
    opt = _pipeline_opt(gt_dir, lq_dir, tmp_path)
    opt["logger"] = {"profile": {}}
    opt = process_options(opt, str(tmp_path), is_train=False)
    results = run_test(opt)
    assert "Synth5" in results
    profile_dir = os.path.join(str(tmp_path), "test_ESC_x2", "profile")
    dumps = [os.path.join(root, f)
             for root, _, files in os.walk(profile_dir) for f in files]
    assert any(f.endswith((".xplane.pb", ".trace.json.gz")) for f in dumps), \
        dumps
