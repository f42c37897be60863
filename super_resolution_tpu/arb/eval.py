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


def arb_psnr(sr, hr, dataset: str | None = None, scale: int = 1,
             rgb_range: float = 1.0) -> float:
    """esc_arb's PSNR protocol (ref: utils.py:132-150): 'benchmark' shaves
    `scale` and converts to the EDSR gray luma; 'div2k' shaves scale+6."""
    diff = (np.asarray(sr) - np.asarray(hr)) / rgb_range
    if dataset is not None:
        if dataset == "benchmark":
            shave = scale
            if diff.shape[-1] > 1:
                gray = np.array([65.738, 129.057, 25.064]) / 256.0
                diff = (diff * gray).sum(axis=-1)
        elif dataset == "div2k":
            shave = scale + 6
        else:
            raise NotImplementedError(dataset)
        valid = diff[..., shave:-shave, shave:-shave] if diff.ndim == 3 else \
            diff[:, shave:-shave, shave:-shave, :]
    else:
        valid = diff
    mse = float(np.mean(valid ** 2))
    return -10.0 * np.log10(mse)
