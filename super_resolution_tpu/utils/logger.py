"""Process-aware logging, timers and the train message logger.

TPU analog of the reference's logging stack (ref:
HAT/ESC/basicsr/utils/logger.py): root logger with file+stream handlers
where non-zero processes log errors only, an AvgTimer for data/iter time
split, and a MessageLogger that formats epoch/iter/lr/eta/losses lines and
optionally mirrors scalars to TensorBoard.
"""

from __future__ import annotations

import datetime
import logging
import time

_initialized_loggers = {}


def master_only(func):
    """Decorator: run only on process 0 (ref: dist_util.py:74-82)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        import jax

        if jax.process_index() == 0:
            return func(*args, **kwargs)
    return wrapper


def get_root_logger(logger_name: str = "super_resolution_tpu",
                    log_level: int = logging.INFO,
                    log_file: str | None = None) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    if logger_name in _initialized_loggers:
        return logger

    fmt = "%(asctime)s %(levelname)s: %(message)s"
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(fmt))
    logger.addHandler(sh)
    logger.propagate = False

    import jax

    if jax.process_index() != 0:
        logger.setLevel(logging.ERROR)
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "w")
            fh.setFormatter(logging.Formatter(fmt))
            fh.setLevel(log_level)
            logger.addHandler(fh)
    _initialized_loggers[logger_name] = True
    return logger


class AvgTimer:
    """Windowed average wall-clock timer (ref: logger.py:10-43)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.current_time = 0.0
        self.total_time = 0.0
        self.count = 0
        self.avg_time = 0.0
        self.start()

    def start(self):
        self.start_time = self.tic = time.time()

    def record(self):
        self.count += 1
        self.toc = time.time()
        self.current_time = self.toc - self.tic
        self.total_time += self.current_time
        self.avg_time = self.total_time / self.count
        if self.count > self.window:
            self.count = 0
            self.total_time = 0
        self.tic = time.time()

    def get_current_time(self) -> float:
        return self.current_time

    def get_avg_time(self) -> float:
        return self.avg_time


class MessageLogger:
    """Formats training log lines with lr/eta/time and loss scalars."""

    def __init__(self, opt: dict, start_iter: int = 1, tb_logger=None):
        self.exp_name = opt["name"]
        self.interval = opt["logger"]["print_freq"]
        self.start_iter = start_iter
        self.max_iters = opt["train"]["total_iter"]
        self.use_tb_logger = opt["logger"].get("use_tb_logger", False)
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    @master_only
    def __call__(self, log_vars: dict):
        current_iter = log_vars.pop("iter")
        epoch = log_vars.pop("epoch")
        lrs = log_vars.pop("lrs")

        message = (f"[{self.exp_name[:31]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, lr:(")
        message += ", ".join(f"{v:.3e}" for v in lrs) + ")] "

        if "time" in log_vars.keys():
            iter_time = log_vars.pop("time")
            data_time = log_vars.pop("data_time")
            total_time = time.time() - self.start_time
            time_sec_avg = total_time / max(current_iter - self.start_iter + 1, 1)
            eta_sec = time_sec_avg * (self.max_iters - current_iter - 1)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[eta: {eta_str}, time (data): {iter_time:.3f} ({data_time:.3f})] "

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger is not None and "debug" not in self.exp_name:
                key = f"losses/{k}" if k.startswith("l_") else k
                self.tb_logger.add_scalar(key, v, current_iter)
        self.logger.info(message)


@master_only
def init_tb_logger(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
    except ImportError:
        return None
    return SummaryWriter(log_dir=log_dir)


@master_only
def init_wandb_logger(opt: dict):
    """W&B sync-to-tensorboard (ref: basicsr/utils/logger.py:125-143 —
    must initialize BEFORE the tb logger; import-gated, wandb is optional).
    """
    try:
        import wandb
    except ImportError:
        get_root_logger().warning("wandb is not installed; skipping.")
        return None
    logger = get_root_logger()
    project = opt["logger"]["wandb"]["project"]
    resume_id = opt["logger"]["wandb"].get("resume_id")
    if resume_id:
        wandb_id, resume = resume_id, "allow"
        logger.warning(f"Resume wandb logger with id={wandb_id}.")
    else:
        wandb_id, resume = wandb.util.generate_id(), "never"
    wandb.init(id=wandb_id, resume=resume, name=opt["name"], config=opt,
               project=project, sync_tensorboard=True)
    logger.info(f"Use wandb logger with id={wandb_id}; project={project}.")
    return wandb


def get_env_info() -> str:
    import jax

    import super_resolution_tpu

    return (f"\nsuper_resolution_tpu {super_resolution_tpu.__version__}"
            f"\n\tjax {jax.__version__}; backend {jax.default_backend()};"
            f" devices {jax.device_count()} ({jax.local_device_count()} local)")
