"""Arbitrary-scale stack: LIIF parity vs the oracle (shared tiny encoder),
MLP/coord utils parity, wrapper dataset shapes, batched_predict."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _load_arb_oracle():
    import sys

    from reference_oracle import install_stubs
    install_stubs()
    path = "/root/reference/HAT/ESC/esc_arb"
    if path not in sys.path:
        sys.path.insert(0, path)
    # esc_arb modules call .cuda(); make it a no-op on CPU
    if not getattr(torch.Tensor.cuda, "_noop", False):
        def cuda_noop(self, *a, **k):
            return self
        cuda_noop._noop = True
        torch.Tensor.cuda = cuda_noop
    import models as ref_models  # esc_arb top-level registry
    import utils as ref_utils
    return ref_models, ref_utils


def test_make_coord_matches_reference():
    from super_resolution_tpu.arb.models import make_coord

    ref_models, ref_utils = _load_arb_oracle()
    ours = make_coord((5, 7))
    ref = ref_utils.make_coord((5, 7)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_liif_parity(rng):
    """Full LIIF head parity with a shared tiny conv encoder registered on
    both sides."""
    import torch.nn as tnn

    from super_resolution_tpu.arb.models import LIIF, make, register
    from flax import linen as fnn

    ref_models, ref_utils = _load_arb_oracle()

    @ref_models.register("tinyconv")
    class TorchTinyConv(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(3, 8, 3, 1, 1)
            self.out_dim = 8

        def forward(self, x):
            return self.conv(x)

    @register("tinyconv")
    class FlaxTinyConv(fnn.Module):
        out_dim: int = 8

        @fnn.compact
        def __call__(self, x):
            return fnn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)],
                            name="conv")(x)

    torch.manual_seed(0)
    imnet_spec = {"name": "mlp", "args": {"out_dim": 3,
                                          "hidden_list": [16, 16]}}
    tm = ref_models.make({"name": "liif",
                          "args": {"encoder_spec": {"name": "tinyconv",
                                                    "args": {}},
                                   "imnet_spec": imnet_spec}})
    tm.eval()
    fm = LIIF(encoder_spec={"name": "tinyconv", "args": {}},
              imnet_spec=imnet_spec)

    inp = rng.random((1, 8, 10, 3), dtype=np.float32)
    coord = (rng.random((1, 50, 2), dtype=np.float32) * 1.8 - 0.9)
    cell = np.full((1, 50, 2), 2.0 / 16, np.float32)

    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(inp),
                        jnp.asarray(coord), jnp.asarray(cell))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        ref = tm(torch.from_numpy(inp.transpose(0, 3, 1, 2)).contiguous(),
                 torch.from_numpy(coord), torch.from_numpy(cell)).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(inp),
                               jnp.asarray(coord), jnp.asarray(cell)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_metasr_and_lte_run(rng):
    from super_resolution_tpu.arb.models import LTE, MetaSR

    enc = {"name": "edsr-baseline", "args": {"n_resblocks": 2, "n_feats": 8}}
    inp = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    coord = jnp.asarray(rng.random((1, 20, 2), dtype=np.float32) * 2 - 1)
    cell = jnp.full((1, 20, 2), 0.1, jnp.float32)

    for model in (MetaSR(encoder_spec=enc),
                  LTE(encoder_spec=enc,
                      imnet_spec={"name": "mlp",
                                  "args": {"out_dim": 3, "hidden_list": [16]}},
                      hidden_dim=16)):
        variables = model.init(jax.random.PRNGKey(0), inp, coord, cell)
        out = model.apply(variables, inp, coord, cell)
        assert out.shape == (1, 20, 3)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_batched_predict_matches_oneshot(rng):
    from super_resolution_tpu.arb.eval import batched_predict
    from super_resolution_tpu.arb.models import LIIF

    enc = {"name": "edsr-baseline", "args": {"n_resblocks": 1, "n_feats": 8}}
    model = LIIF(encoder_spec=enc,
                 imnet_spec={"name": "mlp",
                             "args": {"out_dim": 3, "hidden_list": [16]}})
    inp = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    coord = jnp.asarray(rng.random((1, 77, 2), dtype=np.float32) * 2 - 1)
    cell = jnp.full((1, 77, 2), 0.1, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), inp, coord, cell)
    oneshot = model.apply(variables, inp, coord, cell)
    chunked = batched_predict(model, variables, inp, coord, cell, bsize=30)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(oneshot),
                               atol=1e-5)


def test_sr_implicit_downsampled(tmp_path, rng):
    import cv2

    from super_resolution_tpu.arb.data import SRImplicitDownsampled

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    for i in range(2):
        cv2.imwrite(str(gt_dir / f"g{i}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    ds = SRImplicitDownsampled({
        "dataset": {"type": "SingleImageDataset", "dataroot_lq": str(gt_dir)},
        "inp_size": 12, "scale_min": 1, "scale_max": 3, "sample_q": 100,
        "augment": True})
    # SingleImageDataset returns {'lq': ...}; adapt via gt key fallback
    ds.dataset.__class__.__getitem__orig = ds.dataset.__class__.__getitem__
    item = ds.dataset[0]
    ds.dataset.__class__.__getitem__ = lambda self, i: {
        "gt": self.__class__.__getitem__orig(self, i)["lq"]}
    try:
        out = ds[0]
    finally:
        ds.dataset.__class__.__getitem__ = ds.dataset.__class__.__getitem__orig
    assert out["inp"].shape == (12, 12, 3)
    assert out["coord"].shape == (100, 2)
    assert out["cell"].shape == (100, 2)
    assert out["gt"].shape == (100, 3)


def test_arb_training_loop(tmp_path, rng):
    import cv2

    from super_resolution_tpu.arb.train import train_arb

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    for i in range(3):
        cv2.imwrite(str(gt_dir / f"g{i}.png"),
                    (rng.random((48, 48, 3)) * 255).astype(np.uint8))
    config = {
        "model": {"name": "liif",
                  "args": {"encoder_spec": {"name": "edsr-baseline",
                                            "args": {"n_resblocks": 1,
                                                     "n_feats": 8}},
                           "imnet_spec": {"name": "mlp",
                                          "args": {"out_dim": 3,
                                                   "hidden_list": [16]}}}},
        "train_dataset": {"type": "SRImplicitDownsampled",
                          "dataset": {"type": "DownsampleImageDataset",
                                      "dataroot_gt": str(gt_dir), "scale": 2,
                                      "phase": "train"},
                          "inp_size": 8, "scale_min": 1, "scale_max": 2,
                          "sample_q": 64, "batch_size": 3},
        "optimizer": {"lr": 1e-3},
        "epoch_max": 2, "epoch_save": 2,
        "multi_step_lr": {"milestones": [10], "gamma": 0.5},
    }
    model, params = train_arb(config, save_path=str(tmp_path / "exp"))
    import os
    assert os.path.isdir(tmp_path / "exp" / "epoch-last")


def test_onthefly_datasets(tmp_path, rng):
    import cv2

    from super_resolution_tpu.data import build_dataset

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    cv2.imwrite(str(gt_dir / "a.png"),
                (rng.random((37, 41, 3)) * 255).astype(np.uint8))
    for dtype in ("ImageNetPairedDataset", "DownsampleImageDataset"):
        ds = build_dataset({"type": dtype, "dataroot_gt": str(gt_dir),
                            "scale": 2, "phase": "train", "gt_size": 24})
        item = ds[0]
        assert item["gt"].shape == (24, 24, 3)
        assert item["lq"].shape == (12, 12, 3)
