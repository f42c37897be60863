"""Config-corpus smoke: every yml under options/ must parse, reference only
registered types, and its network_g must construct AND trace (abstract init)
— catching kwarg drift between configs and arch signatures forever."""

import glob
import json
from os import path as osp

import pytest
import yaml

import jax
import jax.numpy as jnp

# registries populate on package import
import super_resolution_tpu.runtime  # noqa: F401  MODEL_REGISTRY
import super_resolution_tpu.data  # noqa: F401  DATASET_REGISTRY
import super_resolution_tpu.arb.data  # noqa: F401  SRImplicit* datasets
import super_resolution_tpu.metrics  # noqa: F401  METRIC_REGISTRY
import super_resolution_tpu.losses  # noqa: F401  LOSS_REGISTRY

OPTIONS_ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "options")

ALL_YMLS = sorted(glob.glob(osp.join(OPTIONS_ROOT, "**", "*.yml"),
                            recursive=True))
ARB_YMLS = [f for f in ALL_YMLS if f"{osp.sep}arb{osp.sep}" in f]
BASICSR_YMLS = [f for f in ALL_YMLS if f not in ARB_YMLS]

assert len(ALL_YMLS) > 100, "config corpus went missing"

# trace each unique network spec only once (many configs share a net)
_traced: dict = {}


def _rel(f):
    return osp.relpath(f, OPTIONS_ROOT)


@pytest.mark.parametrize("yml", BASICSR_YMLS, ids=_rel)
def test_basicsr_config(yml):
    from super_resolution_tpu.losses import LOSS_REGISTRY
    from super_resolution_tpu.metrics import METRIC_REGISTRY
    from super_resolution_tpu.models import build_network
    from super_resolution_tpu.utils.registry import (DATASET_REGISTRY,
                                                     MODEL_REGISTRY)

    with open(yml) as f:
        opt = yaml.safe_load(f)

    # registry coverage: model / datasets / metrics / losses
    MODEL_REGISTRY.get(opt["model_type"])
    for ds in opt.get("datasets", {}).values():
        DATASET_REGISTRY.get(ds["type"])
    for m in ((opt.get("val") or {}).get("metrics") or {}).values():
        METRIC_REGISTRY.get(m["type"])
    for key, val in opt.get("train", {}).items():
        if key.endswith("_opt") and isinstance(val, dict) and "type" in val:
            LOSS_REGISTRY.get(val["type"])

    # network construction + abstract init (shape/kwarg validation, no FLOPs)
    for net_key in ("network_g", "network_d"):
        net_opt = opt.get(net_key)
        if net_opt is None:
            continue
        cache_key = json.dumps(net_opt, sort_keys=True)
        if cache_key in _traced:
            continue
        net = build_network(net_opt)
        ws = net_opt.get("window_size", 16) or 16
        if isinstance(ws, (list, tuple)):
            ws = max(ws)
        size = max(64, 2 * int(ws))
        if net_key == "network_d":
            size = 128  # discriminators see GT-sized crops
        x = jnp.zeros((1, size, size, net_opt.get("in_chans",
                                                  net_opt.get("num_in_ch", 3))),
                      jnp.float32)
        jax.eval_shape(lambda n=net, xx=x: n.init(jax.random.PRNGKey(0), xx))
        _traced[cache_key] = True

    # scale sanity: network upscale factor must match the config scale
    ng = opt.get("network_g", {})
    declared = ng.get("upscale", ng.get("upscaling_factor"))
    if declared is not None and opt["model_type"] != "RealHATGANModel":
        assert declared == opt["scale"], "network/scale mismatch"


def test_eval_arb_drives_generated_config(tmp_path):
    """One generated arb test config runs end-to-end through eval_arb with
    a tiny model and synthetic data (the esc_arb test-CLI analog)."""
    import cv2
    import numpy as np

    from super_resolution_tpu.arb.eval import eval_arb
    from super_resolution_tpu.arb.models import make

    yml = osp.join(OPTIONS_ROOT, "arb", "test", "test-div2k-6.yml")
    with open(yml) as f:
        cfg = yaml.safe_load(f)

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(gt_dir / "im0.png"),
                (rng.random((36, 48, 3)) * 255).astype(np.uint8))
    cfg["test_dataset"]["dataset"]["dataroot_gt"] = str(gt_dir)
    cfg["eval_bsize"] = 64

    model = make({"name": "liif",
                  "args": {"encoder_spec": {"name": "edsr-baseline",
                                            "args": {"n_resblocks": 1,
                                                     "n_feats": 8}},
                           "imnet_spec": {"name": "mlp",
                                          "args": {"out_dim": 3,
                                                   "hidden_list": [16]}}}})
    item_ds_cfg = dict(cfg["test_dataset"], phase="val")
    from super_resolution_tpu.data import build_dataset

    ds = build_dataset(item_ds_cfg)
    item = ds[0]
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(item["inp"])[None],
                        jnp.asarray(item["coord"])[None],
                        jnp.asarray(item["cell"])[None])["params"]
    psnr = eval_arb(cfg, model, params, max_images=1)
    assert np.isfinite(psnr)


@pytest.mark.parametrize("yml", ARB_YMLS, ids=_rel)
def test_arb_config(yml):
    from super_resolution_tpu.arb.models import make, models
    from super_resolution_tpu.utils.registry import DATASET_REGISTRY

    with open(yml) as f:
        cfg = yaml.safe_load(f)

    if "model" in cfg:  # training recipe
        assert cfg["model"]["name"] in models
        model = make(cfg["model"])  # kwarg validation via dataclass init
        assert model is not None
        ds = cfg["train_dataset"]
        DATASET_REGISTRY.get(ds["type"])
        DATASET_REGISTRY.get(ds["dataset"]["type"])
        assert cfg["optimizer"]["lr"] > 0
        assert cfg["epoch_max"] > 0
    else:  # test recipe
        ds = cfg["test_dataset"]
        DATASET_REGISTRY.get(ds["type"])
        DATASET_REGISTRY.get(ds["dataset"]["type"])
        kind, scale = cfg["eval_type"].rsplit("-", 1)
        assert kind in ("benchmark", "div2k")
        assert int(scale) >= 2
        assert cfg["eval_bsize"] > 0
