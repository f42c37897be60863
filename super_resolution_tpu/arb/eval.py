"""Arbitrary-scale evaluation (ref: esc_arb/test.py::batched_predict:16-28,
eval_psnr:31-120)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def batched_predict(model, variables, inp, coord, cell, bsize: int = 30000):
    """Encode once, query coords in fixed-size chunks (lax.map)."""
    feat_fn = getattr(model, "gen_feat", None)
    if feat_fn is None:
        # heads without a separate gen_feat: one shot
        return model.apply(variables, inp, coord, cell)

    n = coord.shape[1]
    pad = (-n) % bsize
    coord_p = jnp.pad(coord, ((0, 0), (0, pad), (0, 0)))
    cell_p = jnp.pad(cell, ((0, 0), (0, pad), (0, 0)))
    n_chunks = coord_p.shape[1] // bsize

    feat = model.apply(variables, inp, method=model.gen_feat)

    def chunk_fn(args):
        co, ce = args
        return model.apply(variables, feat, co, ce, method=model.query_rgb)

    coords = coord_p.reshape(coord.shape[0], n_chunks, bsize, 2).transpose(1, 0, 2, 3)
    cells = cell_p.reshape(cell.shape[0], n_chunks, bsize, 2).transpose(1, 0, 2, 3)
    preds = jax.lax.map(chunk_fn, (coords, cells))
    preds = preds.transpose(1, 0, 2, 3).reshape(coord.shape[0], -1, preds.shape[-1])
    return preds[:, :n]


def eval_arb(config: dict, model, params, max_images: int | None = None):
    """Config-driven arbitrary-scale evaluation — the esc_arb test-CLI
    analog (ref: esc_arb/test.py:31-120; configs/test/*.yaml schema:
    test_dataset / eval_type / eval_bsize). Returns the mean PSNR under the
    eval_type's shave/luma protocol.

    The reference additionally carries a data_norm block (inputs mapped to
    [-1,1]); this framework trains on raw [0,1], so no normalization is
    applied — checkpoints converted from the reference must fold the affine
    into the first/last layers.
    """
    from super_resolution_tpu.data import build_dataset

    ds = build_dataset(dict(config["test_dataset"], phase="val"))
    kind, scale_s = config["eval_type"].rsplit("-", 1)
    scale = int(scale_s)
    dataset_protocol = "benchmark" if kind == "benchmark" else "div2k"
    bsize = int(config.get("eval_bsize", 30000))
    one_shot = bool(config.get("fast_eval"))

    psnrs = []
    n = len(ds) if max_images is None else min(len(ds), max_images)
    for i in range(n):
        item = ds[i]
        inp = jnp.asarray(item["inp"])[None]
        coord = jnp.asarray(item["coord"])[None]
        cell = jnp.asarray(item["cell"])[None]
        if one_shot:
            pred = model.apply({"params": params}, inp, coord, cell)
        else:
            pred = batched_predict(model, {"params": params}, inp, coord,
                                   cell, bsize)
        h = inp.shape[1] * scale
        w = inp.shape[2] * scale
        sr = np.asarray(pred).reshape(h, w, -1)
        hr = np.asarray(item["gt"]).reshape(h, w, -1)
        psnrs.append(arb_psnr(sr, hr, dataset=dataset_protocol, scale=scale))
    return float(np.mean(psnrs))


def arb_psnr(sr, hr, dataset: str | None = None, scale: int = 1,
             rgb_range: float = 1.0) -> float:
    """esc_arb's PSNR protocol (ref: utils.py:132-150): 'benchmark' shaves
    `scale` and converts to the EDSR gray luma; 'div2k' shaves scale+6.
    Accepts HWC or NHWC arrays (channels last — this framework's layout)."""
    sr = np.asarray(sr)
    hr = np.asarray(hr)
    if sr.ndim == 3:
        sr, hr = sr[None], hr[None]
    diff = (sr - hr) / rgb_range  # (N, H, W, C)
    if dataset is not None:
        if dataset == "benchmark":
            shave = scale
            if diff.shape[-1] > 1:
                gray = np.array([65.738, 129.057, 25.064]) / 256.0
                diff = (diff * gray).sum(axis=-1, keepdims=True)
        elif dataset == "div2k":
            shave = scale + 6
        else:
            raise NotImplementedError(dataset)
        valid = diff[:, shave:-shave, shave:-shave, :]
    else:
        valid = diff
    mse = float(np.mean(valid ** 2))
    return -10.0 * np.log10(mse)
