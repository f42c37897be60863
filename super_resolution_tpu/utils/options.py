"""YAML experiment-config system, schema-compatible with the reference.

The reference drives everything from a single YAML file per experiment
(ref: HAT/ESC/basicsr/utils/options.py:99-201): `type:` strings resolve
components through registries, `scale` propagates into dataset opts, debug
mode shrinks frequencies, and dotted `--force_yml` overrides patch the tree.
We keep that schema so the reference's options/*.yml drive this framework,
but replace the eval/exec override mechanism with a safe dotted-path setter
and torch/dist specifics with JAX process info.
"""

from __future__ import annotations

import argparse
import os
import random
from os import path as osp
from typing import Any

import yaml


def yaml_load(f: str) -> dict:
    """Load a YAML file path or string into a dict."""
    if os.path.isfile(f):
        with open(f, "r") as fh:
            return yaml.safe_load(fh)
    if f.endswith((".yml", ".yaml")) or os.sep in f:
        raise FileNotFoundError(f"Option file not found: {f}")
    return yaml.safe_load(f)


def dict2str(opt: dict, indent_level: int = 1) -> str:
    """Pretty-print an option tree (logging banner)."""
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":["
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + k + ": " + str(v) + "\n"
    return msg


def _coerce_value(value: str) -> Any:
    """Interpret a CLI override string (ref semantics, minus eval)."""
    if value == "~" or value.lower() == "none":
        return None
    if value.lower() == "true":
        return True
    if value.lower() == "false":
        return False
    if value.startswith("!!float"):
        return float(value.replace("!!float", ""))
    if value.lstrip("-").isdigit():
        return int(value)
    try:
        return float(value)
    except ValueError:
        pass
    if value.startswith("["):
        return yaml.safe_load(value)
    return value


def set_by_path(opt: dict, dotted: str, value: Any) -> None:
    """Set opt['a']['b']['c'] from 'a:b:c' (replacement for the exec-based
    --force_yml in the reference, options.py:133-144)."""
    keys = [k.strip() for k in dotted.split(":")]
    node = opt
    for k in keys[:-1]:
        node = node[k]
    if keys[-1] not in node:
        raise KeyError(f"force_yml cannot create new key: {dotted}")
    node[keys[-1]] = value


def apply_force_yml(opt: dict, entries) -> None:
    for entry in entries or []:
        keys, value = entry.split("=", 1)
        set_by_path(opt, keys.strip(), _coerce_value(value.strip()))


def process_options(opt: dict, root_path: str, is_train: bool = True,
                    force_yml=None, auto_resume: bool = False,
                    debug: bool = False) -> dict:
    """Post-process a loaded option dict (no CLI involved).

    Mirrors parse_options semantics: process info, seed offset, scale
    propagation, derived experiment/results paths, debug shrinkage.
    """
    import jax

    opt["dist"] = jax.process_count() > 1
    opt["rank"] = jax.process_index()
    opt["world_size"] = jax.process_count()

    seed = opt.get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
        opt["manual_seed"] = seed

    apply_force_yml(opt, force_yml)

    opt["auto_resume"] = auto_resume
    opt["is_train"] = is_train

    if debug and not opt["name"].startswith("debug"):
        opt["name"] = "debug_" + opt["name"]

    if opt.get("num_gpu") == "auto":
        opt["num_gpu"] = jax.local_device_count()

    for phase, dataset in (opt.get("datasets") or {}).items():
        phase = phase.split("_")[0]
        dataset["phase"] = phase
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
        for key in ("dataroot_gt", "dataroot_lq"):
            if dataset.get(key) is not None:
                dataset[key] = osp.expanduser(dataset[key])

    opt.setdefault("path", {})
    for key, val in opt["path"].items():
        if val is not None and ("resume_state" in key or "pretrain_network" in key):
            opt["path"][key] = osp.expanduser(val)

    if is_train:
        experiments_root = opt["path"].get("experiments_root")
        if experiments_root is None:
            experiments_root = osp.join(root_path, "experiments")
        experiments_root = osp.join(experiments_root, opt["name"])
        opt["path"]["experiments_root"] = experiments_root
        opt["path"]["models"] = osp.join(experiments_root, "models")
        opt["path"]["training_states"] = osp.join(experiments_root, "training_states")
        opt["path"]["log"] = experiments_root
        opt["path"]["visualization"] = osp.join(experiments_root, "visualization")
        if "debug" in opt["name"]:
            if "val" in opt:
                opt["val"]["val_freq"] = 8
            opt.setdefault("logger", {})
            opt["logger"]["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = opt["path"].get("results_root")
        if results_root is None:
            results_root = osp.join(root_path, "results")
        results_root = osp.join(results_root, opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = osp.join(results_root, "visualization")

    return opt


def parse_options(root_path: str, is_train: bool = True, argv=None):
    """CLI entry: parse -opt YAML plus flags (reference-compatible surface)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to option YAML file.")
    parser.add_argument("--launcher", choices=["none", "jax"], default="none",
                        help="job launcher ('jax' initializes jax.distributed)")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--force_yml", nargs="+", default=None,
                        help="Force to update yml. Example: train:ema_decay=0.999")
    args = parser.parse_args(argv)

    if args.launcher == "jax":
        import jax

        jax.distributed.initialize()

    opt = yaml_load(args.opt)
    opt = process_options(opt, root_path, is_train=is_train,
                          force_yml=args.force_yml,
                          auto_resume=args.auto_resume, debug=args.debug)
    return opt, args


def copy_opt_file(opt_file: str, experiments_root: str) -> None:
    """Copy the launched config into the experiment dir with a header."""
    import sys
    import time
    from shutil import copyfile

    os.makedirs(experiments_root, exist_ok=True)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    copyfile(opt_file, filename)
    with open(filename, "r+") as f:
        lines = f.readlines()
        lines.insert(0, f"# GENERATE TIME: {time.asctime()}\n# CMD:\n# {' '.join(sys.argv)}\n\n")
        f.seek(0)
        f.writelines(lines)
