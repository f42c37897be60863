"""Tensor parallelism (parallel/tp.py) on the 8-device CPU mesh.

Pins: (1) the Megatron param layout actually shards the transformer
matmuls (shard shapes + byte fraction), (2) a TP-sharded forward is
numerically the single-device forward, (3) a DP x TP train step matches
the unsharded step (params after one update), (4) non-divisible dims fall
back to replicated instead of failing GSPMD.

The reference has no TP analog (DDP only, basicsr/models/base_model.py:
95-98) — this is TPU-native capability, tested the framework's way.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_resolution_tpu.models.hat_classic_arch import HATClassic
from super_resolution_tpu.parallel.tp import (shard_params_tp,
                                              tp_param_specs,
                                              tp_sharded_fraction)


def _tiny_net():
    # heads=4 and mlp hidden 2*32=64 divide the 4-way model axis
    return HATClassic(img_size=16, embed_dim=32, depths=(2, 2),
                      num_heads=(4, 4), window_size=8, compress_ratio=4,
                      squeeze_factor=8, conv_scale=0.01, overlap_ratio=0.5,
                      mlp_ratio=2.0, drop_path_rate=0.0, upscale=2)


@pytest.fixture(scope="module")
def net_and_params():
    net = _tiny_net()
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    return net, params


def test_tp_layout_shards_the_matmuls(net_and_params):
    net, params = net_and_params
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("model",))
    sharded = shard_params_tp(params, mesh)
    qkv_k = sharded["layers_0"]["residual_group"]["blocks_0"]["attn"][
        "qkv"]["kernel"]
    # (32, 96) column-parallel over 4 -> local (32, 24)
    assert qkv_k.addressable_shards[0].data.shape == (32, 24)
    fc2_k = sharded["layers_0"]["residual_group"]["blocks_0"]["mlp"][
        "fc2"]["kernel"]
    # (64, 32) row-parallel over 4 -> local (16, 32)
    assert fc2_k.addressable_shards[0].data.shape == (16, 32)
    conv_k = sharded["conv_first"]["kernel"]
    assert conv_k.addressable_shards[0].data.shape == conv_k.shape
    # the transformer matmuls are most of the *block* bytes (whole tiny
    # net is upsample-conv dominated, so probe the RHAG subtree)
    assert tp_sharded_fraction(params["layers_0"]) > 0.45


def test_tp_forward_matches_single_device(net_and_params):
    net, params = net_and_params
    x = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 3)),
                    jnp.float32)
    ref = jax.jit(net.apply)({"params": params}, x)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    sharded = shard_params_tp(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(net.apply)({"params": sharded}, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_tp_train_step_matches_unsharded(net_and_params):
    from super_resolution_tpu.runtime.train_loop import (build_optimizer,
                                                         init_train_state,
                                                         make_sr_train_step)

    net, params = net_and_params
    train_opt = {
        "optim_g": {"type": "Adam", "lr": 2e-4, "betas": [0.9, 0.99]},
        "scheduler": {"type": "MultiStepLR", "milestones": [100],
                      "gamma": 0.5},
        "total_iter": 200, "pixel_opt": {"type": "L1Loss",
                                         "loss_weight": 1.0},
        "ema_decay": 0.999,
    }
    tx, _ = build_optimizer(train_opt)
    step = make_sr_train_step(net, tx, train_opt)
    rng = jax.random.PRNGKey(7)
    batch_np = {
        "lq": np.random.default_rng(2).random((4, 16, 16, 3)).astype(
            np.float32),
        "gt": np.random.default_rng(3).random((4, 32, 32, 3)).astype(
            np.float32),
    }

    state0 = init_train_state(params, tx, ema_decay=0.999)
    ref_state, ref_logs = jax.jit(step)(
        state0, jax.tree.map(jnp.asarray, batch_np), rng)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))
    sh_params = shard_params_tp(params, mesh)
    # opt/EMA state inherits the param layout via propagation under jit
    sh_state = jax.jit(lambda p: init_train_state(p, tx, ema_decay=0.999))(
        sh_params)
    batch_sh = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("data"))),
        batch_np)
    tp_state, tp_logs = jax.jit(step)(sh_state, batch_sh, rng)

    np.testing.assert_allclose(float(tp_logs["l_pix"]),
                               float(ref_logs["l_pix"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        ref_state.params, jax.device_get(tp_state.params))


def test_nondivisible_dims_fall_back_to_replicated():
    net = HATClassic(img_size=16, embed_dim=30, depths=(1,), num_heads=(3,),
                     window_size=8, compress_ratio=3, squeeze_factor=5,
                     conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
                     drop_path_rate=0.0, upscale=2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("model",))
    sharded = shard_params_tp(params, mesh)  # 90 % 4 != 0 -> replicated
    qkv_k = sharded["layers_0"]["residual_group"]["blocks_0"]["attn"][
        "qkv"]["kernel"]
    assert qkv_k.addressable_shards[0].data.shape == qkv_k.shape
    ref = jax.jit(net.apply)({"params": params}, x)
    out = jax.jit(net.apply)({"params": sharded}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_config_driven_tp_training(tmp_path):
    """YAML `mesh: {data: 4, model: 2}` drives a DP x TP training run
    through the full pipeline (runtime/train_pipeline.py wiring)."""
    import cv2

    from super_resolution_tpu.runtime.train_pipeline import run_train
    from super_resolution_tpu.utils.matlab import imresize
    from super_resolution_tpu.utils.options import process_options

    gt_dir, lq_dir = tmp_path / "GT", tmp_path / "LQ"
    gt_dir.mkdir(), lq_dir.mkdir()
    rng = np.random.default_rng(11)
    for i in range(4):
        gt = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        lr = imresize(gt.astype(np.float32) / 255.0, 0.5)
        cv2.imwrite(str(gt_dir / f"t{i}.png"), gt)
        cv2.imwrite(str(lq_dir / f"t{i}.png"),
                    (np.clip(lr, 0, 1) * 255).round().astype(np.uint8))

    opt = {
        "name": "tp_smoke", "model_type": "SRModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0,
        "mesh": {"data": 4, "model": 2},
        "network_g": {"type": "SwinIR", "img_size": 16, "embed_dim": 16,
                      "depths": [2], "num_heads": [2], "window_size": 8,
                      "mlp_ratio": 2.0, "upscale": 2,
                      "upsampler": "pixelshuffledirect"},
        "datasets": {
            "train": {"name": "synth", "type": "PairedImageDataset",
                      "dataroot_gt": str(gt_dir), "dataroot_lq": str(lq_dir),
                      "gt_size": 32, "use_hflip": False, "use_rot": False,
                      "batch_size_per_gpu": 1, "dataset_enlarge_ratio": 1,
                      "io_backend": {"type": "disk"}},
        },
        "train": {"optim_g": {"type": "Adam", "lr": 2e-4,
                              "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "total_iter": 2, "warmup_iter": -1, "ema_decay": 0.999,
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                                "reduction": "mean"}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 100,
                   "use_tb_logger": False},
        "path": {"pretrain_network_g": None,
                 "experiments_root": str(tmp_path / "exp")},
    }
    opt = process_options(opt, str(tmp_path), is_train=True)
    model, final_iter = run_train(opt)
    assert final_iter >= 2
    assert np.isfinite(float(model.get_current_log()["l_pix"]))
    n_sharded = sum(
        leaf.addressable_shards[0].data.shape != leaf.shape
        for leaf in jax.tree.leaves(model.state.params))
    assert n_sharded > 0, "config-driven TP left every param replicated"


def test_specs_cover_every_param(net_and_params):
    _, params = net_and_params
    specs = tp_param_specs(params)
    assert (jax.tree_util.tree_structure(specs)
            == jax.tree_util.tree_structure(params))


def test_tp_resume_reapplies_sharding(tmp_path):
    """Resuming under a model-parallel mesh must re-shard the loaded
    (plain/replicated) arrays — otherwise computation-follows-data
    silently replicates the whole resumed run (r3 advisor finding,
    sr_model.py resume_training)."""
    from super_resolution_tpu.parallel.mesh import make_mesh_from_spec
    from super_resolution_tpu.runtime.sr_model import SRModel

    kw = dict(img_size=16, embed_dim=32, depths=[2], num_heads=[4],
              window_size=8, compress_ratio=4, squeeze_factor=8,
              conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
              drop_path_rate=0.0, upscale=2)
    opt = {
        "name": "tp_resume", "model_type": "SRModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0, "is_train": True,
        "network_g": {"type": "HATClassic", **kw},
        "datasets": {"train": {"name": "x", "type": "PairedImageDataset",
                               "phase": "train", "gt_size": 32}},
        "train": {"optim_g": {"type": "Adam", "lr": 2e-4,
                              "betas": [0.9, 0.99]},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "total_iter": 4, "warmup_iter": -1, "ema_decay": 0.999,
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                                "reduction": "mean"}},
        "path": {"pretrain_network_g": None,
                 "models": str(tmp_path / "models")},
    }
    (tmp_path / "models").mkdir()
    mesh = make_mesh_from_spec({"data": 4, "model": 2})
    model = SRModel(opt)
    model.setup_training(mesh=mesh)
    model.save(0, 1)

    model2 = SRModel(opt)
    model2.setup_training(mesh=mesh)
    model2.resume_training(str(tmp_path / "models" / "net_g_1"))

    def n_sharded(tree):
        return sum(leaf.addressable_shards[0].data.shape != leaf.shape
                   for leaf in jax.tree.leaves(tree))

    assert n_sharded(model2.params) > 0, "resume dropped the TP layout"
    assert n_sharded(model2.ema_params) > 0
    assert n_sharded(model2.state.opt_state) > 0, \
        "optimizer moments lost the TP layout on resume"
