"""Train pipeline: the process-lifecycle loop
(ref: basicsr/train.py:91-210).

options -> dirs -> loggers -> loaders -> model -> iter loop
(lr / feed / optimize / log / checkpoint / validate) with auto-resume.
"""

from __future__ import annotations

import logging
import math
import os
from os import path as osp

from super_resolution_tpu.data import build_dataloader, build_dataset
from super_resolution_tpu.runtime import build_model
from super_resolution_tpu.utils import (AvgTimer, MessageLogger, copy_opt_file,
                                        dict2str, get_env_info, get_root_logger,
                                        init_tb_logger, make_exp_dirs,
                                        set_random_seed)
from super_resolution_tpu.utils.options import parse_options, process_options, yaml_load


def load_resume_state(opt: dict):
    """Auto-resume: pick the max-iter checkpoint dir under training_states
    (ref: basicsr/train.py:68-88; checkpoints live under path.models here)."""
    resume_path = None
    if opt.get("auto_resume"):
        models_dir = opt["path"]["models"]
        if osp.isdir(models_dir):
            ckpts = [d for d in os.listdir(models_dir) if d.startswith("net_g_")]
            if ckpts:
                iters = [int(d.split("_")[-1]) for d in ckpts]
                resume_path = osp.join(models_dir, f"net_g_{max(iters)}")
    elif opt["path"].get("resume_state"):
        resume_path = opt["path"]["resume_state"]
    return resume_path


def create_train_val_dataloaders(opt: dict, logger, mesh=None):
    train_loader, val_loaders = None, []
    for phase, dataset_opt in opt["datasets"].items():
        if phase == "train":
            train_set = build_dataset(dataset_opt)
            train_loader = build_dataloader(train_set, dataset_opt,
                                            seed=opt["manual_seed"], mesh=mesh)
            num_iter_per_epoch = max(1, len(train_loader))
            total_iters = int(opt["train"]["total_iter"])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info(f"Training {dataset_opt['name']}: {len(train_set)} "
                        f"images, {num_iter_per_epoch} iters/epoch, "
                        f"{total_epochs} epochs for {total_iters} iters")
        elif phase.split("_")[0] == "val":
            val_set = build_dataset(dataset_opt)
            val_loaders.append(build_dataloader(val_set, dataset_opt))
            logger.info(f"Validation {dataset_opt['name']}: {len(val_set)} images")
        else:
            raise ValueError(f"Unrecognized dataset phase: {phase}")
    return train_loader, val_loaders


def run_train(opt: dict, opt_path: str | None = None, mesh=None):
    import jax

    # config-driven device mesh (TPU-native replacement for the
    # reference's num_gpu/DDP launch plumbing): `mesh: {data: -1}` is pure
    # DP over all chips, `mesh: {data: N, model: M}` the DP x TP rectangle
    if mesh is None and opt.get("mesh"):
        from super_resolution_tpu.parallel.mesh import make_mesh_from_spec

        mesh = make_mesh_from_spec(opt["mesh"])

    set_random_seed(opt["manual_seed"] + opt["rank"])
    resume_path = load_resume_state(opt)
    if resume_path is None:
        make_exp_dirs(opt)
    if opt_path and jax.process_index() == 0:
        copy_opt_file(opt_path, opt["path"]["experiments_root"])

    log_file = osp.join(opt["path"]["log"], f"train_{opt['name']}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    # wandb initializes BEFORE tb so sync_tensorboard captures it
    # (ref: basicsr/train.py:17-26 precedence rule)
    if (opt.get("logger", {}).get("wandb") or {}).get("project") is not None:
        from super_resolution_tpu.utils.logger import init_wandb_logger

        assert opt["logger"].get("use_tb_logger"), \
            "should turn on tensorboard when using wandb"
        init_wandb_logger(opt)
    tb_logger = (init_tb_logger(osp.join(opt["path"]["log"], "tb_logger"))
                 if opt.get("logger", {}).get("use_tb_logger") else None)

    train_loader, val_loaders = create_train_val_dataloaders(opt, logger,
                                                             mesh=mesh)

    model = build_model(opt)
    model.setup_training(mesh=mesh)

    start_epoch, current_iter = 0, 0
    if resume_path:
        start_epoch, current_iter = model.resume_training(resume_path)
        logger.info(f"Resumed from {resume_path}: epoch {start_epoch}, "
                    f"iter {current_iter}")

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    data_timer, iter_timer = AvgTimer(), AvgTimer()

    # XLA profiler trace window (utils/profiler.py) — the TPU-native
    # observability the reference lacks (its tracing is AvgTimers only,
    # basicsr/utils/logger.py:10-43)
    from super_resolution_tpu.utils.profiler import TraceWindow

    trace = TraceWindow(opt["logger"].get("profile"),
                        osp.join(opt["path"]["experiments_root"], "profile"))

    total_iters = int(opt["train"]["total_iter"])
    num_iter_per_epoch = max(1, len(train_loader))
    total_epochs = math.ceil(total_iters / num_iter_per_epoch)
    print_freq = opt["logger"]["print_freq"]
    save_freq = opt["logger"]["save_checkpoint_freq"]
    val_freq = opt.get("val", {}).get("val_freq")

    logger.info(f"Start training from epoch {start_epoch}, iter {current_iter}")
    epoch = start_epoch
    stop = False
    while epoch < total_epochs + 1 and not stop:
        for batch in train_loader.epoch_iter(epoch):
            data_timer.record()
            current_iter += 1
            if current_iter > total_iters:
                current_iter = total_iters
                stop = True
                break
            model.optimize_parameters(batch, current_iter)
            trace.step(current_iter,
                       block_on=getattr(model, "log_dict", None))
            iter_timer.record()

            if current_iter % print_freq == 0:
                log_vars = {"epoch": epoch, "iter": current_iter,
                            "lrs": model.current_lrs(current_iter),
                            "time": iter_timer.get_avg_time(),
                            "data_time": data_timer.get_avg_time()}
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if current_iter % save_freq == 0 and jax.process_index() == 0:
                logger.info("Saving models and training states.")
                model.save(epoch, current_iter)

            if val_freq and current_iter % val_freq == 0:
                for val_loader in val_loaders:
                    model.validation(val_loader, current_iter, tb_logger,
                                     opt["val"].get("save_img", False))
            data_timer.start()
            iter_timer.start()
        epoch += 1

    trace.close()
    logger.info("End of training.")
    if jax.process_index() == 0:
        model.save(epoch, current_iter)
    return model, current_iter


def train_pipeline(root_path: str, argv=None, mesh=None):
    opt, args = parse_options(root_path, is_train=True, argv=argv)
    return run_train(opt, opt_path=args.opt, mesh=mesh)


def train_from_yaml(yaml_path: str, root_path: str = ".", mesh=None, **overrides):
    opt = yaml_load(yaml_path)
    opt.update(overrides)
    opt = process_options(opt, root_path, is_train=True)
    return run_train(opt, opt_path=yaml_path, mesh=mesh)
