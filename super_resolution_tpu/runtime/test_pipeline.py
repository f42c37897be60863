"""Test pipeline: options -> dirs -> loaders -> model -> validation
(ref: basicsr/test.py:11-45)."""

from __future__ import annotations

import logging
from os import path as osp

from super_resolution_tpu.data import build_dataloader, build_dataset
from super_resolution_tpu.runtime import build_model
from super_resolution_tpu.utils import (dict2str, get_env_info, get_root_logger,
                                        make_exp_dirs, set_random_seed)
from super_resolution_tpu.utils.options import parse_options, process_options, yaml_load


def run_test(opt: dict):
    """Core test loop given a processed option dict."""
    set_random_seed(opt["manual_seed"] + opt["rank"])
    make_exp_dirs(opt)
    log_file = osp.join(opt["path"]["log"], f"test_{opt['name']}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    test_loaders = []
    for _, dataset_opt in sorted(opt["datasets"].items()):
        test_set = build_dataset(dataset_opt)
        test_loader = build_dataloader(test_set, dataset_opt)
        logger.info(f"Number of test images in {dataset_opt['name']}: "
                    f"{len(test_set)}")
        test_loaders.append(test_loader)

    model = build_model(opt)
    results = {}
    # Optional whole-eval XLA trace (logger.profile in the test YAML) —
    # utils/profiler.py; the reference's only eval timing is wall-clock
    # prints (ESC/scripts/test_direct_metrics.py).
    from super_resolution_tpu.utils.profiler import trace_eval

    with trace_eval(opt.get("logger", {}).get("profile"),
                    osp.join(opt["path"]["results_root"], "profile")):
        for test_loader in test_loaders:
            test_set_name = test_loader.dataset.opt["name"]
            logger.info(f"Testing {test_set_name}...")
            model.validation(test_loader, current_iter=opt["name"],
                             save_img=opt["val"].get("save_img", True))
            results[test_set_name] = dict(model.metric_results)
    return results


def test_pipeline(root_path: str, argv=None):
    opt, _ = parse_options(root_path, is_train=False, argv=argv)
    return run_test(opt)


def test_from_yaml(yaml_path: str, root_path: str = ".", **overrides):
    """Programmatic entry: load a reference-format YAML and run the test
    pipeline (no CLI)."""
    opt = yaml_load(yaml_path)
    opt.update(overrides)
    opt = process_options(opt, root_path, is_train=False)
    return run_test(opt)
