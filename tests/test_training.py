"""Training stack: schedules, train step (loss decreases), full pipeline
smoke on synthetic data, checkpoint/resume, and the 8-device DP mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_cosine_restart_schedule_matches_reference():
    from reference_oracle import install_stubs
    install_stubs()
    import torch
    from basicsr.models.lr_scheduler import CosineAnnealingRestartLR

    from super_resolution_tpu.runtime.schedulers import cosine_annealing_restart_lr

    periods = [10, 20]
    weights = [1.0, 0.5]
    base_lr = 2e-4
    p = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([p], lr=base_lr)
    ref_sched = CosineAnnealingRestartLR(optim, periods=periods,
                                         restart_weights=weights, eta_min=1e-7)
    sched = cosine_annealing_restart_lr(base_lr, periods, weights, eta_min=1e-7)
    for it in range(30):
        ref_lr = ref_sched.get_lr()[0]
        ours = float(sched(it))
        assert ours == pytest.approx(ref_lr, rel=1e-5), f"iter {it}"
        ref_sched.step()


def test_multistep_schedule():
    from super_resolution_tpu.runtime.schedulers import multistep_restart_lr

    sched = multistep_restart_lr(1e-3, milestones=[5, 10], gamma=0.1)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(5)) == pytest.approx(1e-4)
    assert float(sched(12)) == pytest.approx(1e-5)


def test_multistep_restart_schedule_matches_reference():
    """Restart resets LR to initial_lr*weight; pre-restart milestones stop
    contributing (ref: lr_scheduler.py:27-33)."""
    from reference_oracle import install_stubs
    install_stubs()
    import torch
    from basicsr.models.lr_scheduler import MultiStepRestartLR

    from super_resolution_tpu.runtime.schedulers import multistep_restart_lr

    base_lr = 1e-3
    milestones = [5, 12, 25]
    restarts = [10, 20]
    weights = [0.5, 0.25]
    p = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.Adam([p], lr=base_lr)
    ref_sched = MultiStepRestartLR(optim, milestones=milestones, gamma=0.1,
                                   restarts=restarts, restart_weights=weights)
    sched = multistep_restart_lr(base_lr, milestones, gamma=0.1,
                                 restarts=[0] + restarts,
                                 restart_weights=[1.0] + weights)
    for it in range(30):
        ref_lr = optim.param_groups[0]["lr"]
        assert float(sched(it)) == pytest.approx(ref_lr, rel=1e-6), f"iter {it}"
        ref_sched.step()


def test_warmup():
    from super_resolution_tpu.runtime.schedulers import (multistep_restart_lr,
                                                         with_warmup)

    sched = with_warmup(multistep_restart_lr(1e-3, milestones=[]), 10)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(9)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-3)


def test_build_dataloader_scales_batch_by_mesh_devices():
    """With a mesh, the per-process batch is batch_size_per_gpu x local
    data-axis devices, matching the reference's per-GPU semantics
    (global batch = batch_size_per_gpu x num_gpu)."""
    from super_resolution_tpu.data import build_dataloader
    from super_resolution_tpu.parallel.mesh import make_mesh

    class _FakeDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"lq": np.zeros((4, 4, 3), np.float32),
                    "gt": np.zeros((8, 8, 3), np.float32)}

    opt = {"phase": "train", "batch_size_per_gpu": 2}
    mesh = make_mesh(8)
    loader = build_dataloader(_FakeDataset(), opt, mesh=mesh)
    assert loader.batch_size == 16  # 2 per device x 8 devices, 1 process
    batch = next(iter(loader.epoch_iter(0)))
    assert batch["lq"].shape[0] == 16
    # without a mesh: single-device semantics
    loader1 = build_dataloader(_FakeDataset(), opt)
    assert loader1.batch_size == 2


def _tiny_train_opt():
    return {
        "optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
        "scheduler": {"type": "MultiStepLR", "milestones": [1000], "gamma": 0.5},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0, "reduction": "mean"},
        "ema_decay": 0.9,
        "total_iter": 20,
        "warmup_iter": -1,
    }


def test_train_step_loss_decreases(rng):
    from super_resolution_tpu.models.esc_arch import ESC
    from super_resolution_tpu.runtime.train_loop import (
        build_optimizer, init_train_state, make_sr_train_step)

    net = ESC(dim=16, pdim=8, kernel_size=5, n_blocks=1, conv_blocks=1,
              window_size=8, num_heads=2, upscaling_factor=2, exp_ratio=1.0)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    train_opt = _tiny_train_opt()
    tx, _ = build_optimizer(train_opt)
    state = init_train_state(params, tx, train_opt["ema_decay"])
    step = jax.jit(make_sr_train_step(net, tx, train_opt))

    lq = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    gt = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    batch = {"lq": lq, "gt": gt}
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, logs = step(state, batch, sub)
        losses.append(float(logs["l_pix"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12
    # EMA drifted from init but differs from raw params
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0


@pytest.mark.slow
def test_train_step_dp_mesh_matches_single_device(rng):
    """Data-parallel over the 8-device CPU mesh == single-device numerics."""
    from super_resolution_tpu.models.esc_arch import ESC
    from super_resolution_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                    replicated, shard_batch)
    from super_resolution_tpu.runtime.train_loop import (
        build_optimizer, init_train_state, make_sr_train_step)

    assert jax.device_count() == 8
    net = ESC(dim=16, pdim=8, kernel_size=5, n_blocks=1, conv_blocks=1,
              window_size=8, num_heads=2, upscaling_factor=2, exp_ratio=1.0)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    train_opt = _tiny_train_opt()
    tx, _ = build_optimizer(train_opt)
    step_fn = make_sr_train_step(net, tx, train_opt)

    lq = rng.random((8, 16, 16, 3), dtype=np.float32)
    gt = rng.random((8, 32, 32, 3), dtype=np.float32)
    rng_key = jax.random.PRNGKey(2)

    # single device
    state1 = init_train_state(params, tx, train_opt["ema_decay"])
    state1, logs1 = jax.jit(step_fn)(state1, {"lq": jnp.asarray(lq),
                                              "gt": jnp.asarray(gt)}, rng_key)

    # 8-device mesh
    mesh = make_mesh(8)
    state2 = init_train_state(params, tx, train_opt["ema_decay"])
    sharded_step = jax.jit(
        step_fn,
        in_shardings=(replicated(mesh),
                      {"lq": batch_sharding(mesh), "gt": batch_sharding(mesh)},
                      replicated(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)))
    batch = shard_batch({"lq": lq, "gt": gt}, mesh)
    state2, logs2 = sharded_step(state2, batch, rng_key)

    assert float(logs1["l_pix"]) == pytest.approx(float(logs2["l_pix"]), rel=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state1.params, state2.params)
    # bound = lr/2: psum changes gradient summation ORDER, and at step 1
    # Adam's g/(|g|+eps) amplifies fp-reorder noise on near-zero-gradient
    # leaves (zero-init heads) to a visible fraction of one lr step; a real
    # reduction bug (missing/double psum) shows up at the full lr scale
    assert max(jax.tree.leaves(d)) < 1e-4


@pytest.fixture()
def synth_train_data(tmp_path):
    import cv2

    from super_resolution_tpu.utils.matlab import imresize

    gt_dir, lq_dir = tmp_path / "GT", tmp_path / "LQ"
    gt_dir.mkdir(), lq_dir.mkdir()
    rng = np.random.default_rng(11)
    for i in range(4):
        gt = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        lr = imresize(gt.astype(np.float32) / 255.0, 0.5)
        cv2.imwrite(str(gt_dir / f"t{i}.png"), gt)
        cv2.imwrite(str(lq_dir / f"t{i}.png"),
                    (np.clip(lr, 0, 1) * 255).round().astype(np.uint8))
    return str(gt_dir), str(lq_dir)


def test_train_pipeline_smoke(synth_train_data, tmp_path):
    from super_resolution_tpu.runtime.train_pipeline import run_train
    from super_resolution_tpu.utils.options import process_options

    gt_dir, lq_dir = synth_train_data
    opt = {
        "name": "train_smoke", "model_type": "SRModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0,
        "network_g": {"type": "ESC", "dim": 16, "pdim": 8, "kernel_size": 5,
                      "n_blocks": 1, "conv_blocks": 1, "window_size": 8,
                      "num_heads": 2, "upscaling_factor": 2, "exp_ratio": 1.0},
        "datasets": {
            "train": {"name": "synth", "type": "PairedImageDataset",
                      "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                      "gt_size": 32, "use_hflip": True, "use_rot": True,
                      "batch_size_per_gpu": 2, "dataset_enlarge_ratio": 1,
                      "io_backend": {"type": "disk"}},
            "val": {"name": "synthval", "type": "PairedImageDataset",
                    "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                    "io_backend": {"type": "disk"}},
        },
        "train": {**_tiny_train_opt(), "total_iter": 6},
        "val": {"val_freq": 3, "save_img": False,
                "metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 2}}},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 3,
                   "use_tb_logger": False},
        "path": {"pretrain_network_g": None,
                 "experiments_root": str(tmp_path / "exp")},
    }
    opt = process_options(opt, str(tmp_path), is_train=True)
    model, final_iter = run_train(opt)
    assert final_iter == 7 or final_iter == 6
    # checkpoints written
    models_dir = os.path.join(str(tmp_path / "exp"), "train_smoke", "models")
    assert any(d.startswith("net_g_") for d in os.listdir(models_dir))

    # resume path: fresh run with auto_resume picks up the checkpoint
    opt2 = dict(opt)
    opt2["auto_resume"] = True
    model2, _ = run_train(opt2)
    assert int(model2.state.step) >= 6


def test_esr_model_training(rng, tmp_path):
    """ESRModel: bf16 AMP + MESA + momentum reset + clip halving, loss
    finite and decreasing."""
    from super_resolution_tpu.runtime import build_model
    from super_resolution_tpu.utils.options import process_options

    opt = {
        "name": "esr_smoke", "model_type": "ESRModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0, "is_train": True, "use_amp": True,
        "network_g": {"type": "ESC", "dim": 16, "pdim": 8, "kernel_size": 5,
                      "n_blocks": 1, "conv_blocks": 1, "window_size": 8,
                      "num_heads": 2, "upscaling_factor": 2, "exp_ratio": 1.0},
        "datasets": {},
        "train": {
            "optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [1000],
                          "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
            "mesa_opt": {"type": "L1Loss", "loss_weight": 0.5,
                         "reduction": "mean", "start_ratio": 0.3},
            "ema_decay": 0.99, "total_iter": 10, "warmup_iter": -1,
            "gradient_clip": 1.0, "reset_momentum_iter": 4,
        },
        "path": {"pretrain_network_g": None},
    }
    opt = process_options(opt, str(tmp_path), is_train=True)
    model = build_model(opt)
    model.setup_training()
    lq = rng.random((2, 16, 16, 3), dtype=np.float32)
    gt = rng.random((2, 32, 32, 3), dtype=np.float32)
    losses = []
    for it in range(1, 7):
        model.optimize_parameters({"lq": lq, "gt": gt}, it)
        logs = model.get_current_log()
        assert all(np.isfinite(v) for v in logs.values())
        losses.append(logs["l_pix"])
        if it >= 3:  # mesa starts at 0.3 * 10 = iter 3
            assert "l_mesa" in logs
    assert losses[-1] < losses[0]


def test_train_profile_trace_window(synth_train_data, tmp_path):
    """logger.profile opens a jax.profiler trace over the configured
    iteration window and writes a TensorBoard-readable xplane dump
    (utils/profiler.py — SURVEY 5.1's TPU-native tracer; the reference
    only has AvgTimers, basicsr/utils/logger.py:10-43)."""
    from super_resolution_tpu.runtime.train_pipeline import run_train
    from super_resolution_tpu.utils.options import process_options

    gt_dir, lq_dir = synth_train_data
    opt = {
        "name": "profile_smoke", "model_type": "SRModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0,
        "network_g": {"type": "ESC", "dim": 16, "pdim": 8, "kernel_size": 5,
                      "n_blocks": 1, "conv_blocks": 1, "window_size": 8,
                      "num_heads": 2, "upscaling_factor": 2, "exp_ratio": 1.0},
        "datasets": {
            "train": {"name": "synth", "type": "PairedImageDataset",
                      "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
                      "gt_size": 32, "use_hflip": False, "use_rot": False,
                      "batch_size_per_gpu": 2, "dataset_enlarge_ratio": 1,
                      "io_backend": {"type": "disk"}},
        },
        "train": {**_tiny_train_opt(), "total_iter": 4},
        "logger": {"print_freq": 10, "save_checkpoint_freq": 100,
                   "use_tb_logger": False,
                   "profile": {"start_iter": 2, "num_iters": 2}},
        "path": {"pretrain_network_g": None,
                 "experiments_root": str(tmp_path / "exp")},
    }
    opt = process_options(opt, str(tmp_path), is_train=True)
    run_train(opt)
    profile_dir = os.path.join(str(tmp_path / "exp"), "profile_smoke",
                               "profile")
    dumps = [os.path.join(root, f)
             for root, _, files in os.walk(profile_dir) for f in files]
    assert dumps, f"no profiler artifacts under {profile_dir}"
    assert any(f.endswith((".xplane.pb", ".trace.json.gz")) for f in dumps), \
        dumps
