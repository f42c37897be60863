"""Arbitrary-scale SR: LIIF / LTE / MetaSR heads over feature encoders.

Rebuild of the esc_arb mini-stack's model layer (ref:
HAT/ESC/esc_arb/models/ — liif.py:10-110, lte.py:11-110, misc.py:11-70,
mlp.py:7-24, models.py:7-23 spec registry).

TPU-native notes:
- The reference's nearest-mode grid_sample calls resolve to integer
  gathers at cell centers; they are implemented directly as gathers
  (no grid-sample emulation needed for 'nearest').
- query coordinates are processed in one batched pass (the reference
  chunks host-side, test.py::batched_predict); chunking for memory is a
  lax.map over static slices in arb/eval.py.
- Everything is NHWC; coords keep the reference's (y, x) channel order
  and [-1, 1] normalization.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.grid_sample import grid_sample_bilinear
from super_resolution_tpu.ops.conv import shifted_neighborhoods

models: Dict[str, Any] = {}


def register(name: str):
    def decorator(cls):
        models[name] = cls
        return cls
    return decorator


def make(model_spec: dict, args: dict | None = None):
    """Spec-dict factory (ref: models.py:14-23). Flax freezes dict fields,
    so specs are deep-copied into plain dicts."""
    model_args = dict(model_spec.get("args", {}))
    if args is not None:
        model_args.update(args)
    return models[model_spec["name"]](**model_args)


def make_coord(shape, ranges=None, flatten: bool = True) -> np.ndarray:
    """Grid-center coordinates in [-1, 1], (y, x) order (ref: utils.py:105)."""
    seqs = []
    for i, n in enumerate(shape):
        v0, v1 = (-1, 1) if ranges is None else ranges[i]
        r = (v1 - v0) / (2 * n)
        seqs.append(v0 + r + (2 * r) * np.arange(n, dtype=np.float32))
    grid = np.stack(np.meshgrid(*seqs, indexing="ij"), axis=-1)
    return grid.reshape(-1, len(shape)) if flatten else grid


def to_pixel_samples(img_hwc: np.ndarray):
    """HWC image -> (coord (N,2), rgb (N,3)) (ref: utils.py:123)."""
    coord = make_coord(img_hwc.shape[:2])
    rgb = img_hwc.reshape(-1, img_hwc.shape[-1])
    return coord, rgb


def _nearest_gather(feat, coord):
    """Nearest-neighbor sample of NHWC feat at normalized (y, x) coords.

    feat: (B, H, W, C); coord: (B, Q, 2). Equivalent to the reference's
    grid_sample(..., mode='nearest', align_corners=False) on clamped
    cell-center coords."""
    b, h, w, c = feat.shape
    iy = jnp.clip(jnp.floor((coord[..., 0] + 1) / 2 * h), 0, h - 1).astype(jnp.int32)
    ix = jnp.clip(jnp.floor((coord[..., 1] + 1) / 2 * w), 0, w - 1).astype(jnp.int32)
    bidx = jnp.arange(b)[:, None]
    return feat[bidx, iy, ix]


@register("mlp")
class MLP(nn.Module):
    in_dim: int
    out_dim: int
    hidden_list: Sequence[int]

    def setup(self):
        dims = list(self.hidden_list) + [self.out_dim]
        # torch Sequential indices: Linear at 0, 2, 4, ...
        self.dense_layers = [nn.Dense(d, name=f"layers_{2 * i}")
                             for i, d in enumerate(dims)]

    def __call__(self, x):
        for i, layer in enumerate(self.dense_layers):
            x = layer(x)
            if i < len(self.dense_layers) - 1:
                x = nn.relu(x)
        return x


@register("liif")
class LIIF(nn.Module):
    """Local implicit image function head (ref: liif.py:10-110)."""

    encoder_spec: Any
    imnet_spec: Any = None
    local_ensemble: bool = True
    feat_unfold: bool = True
    cell_decode: bool = True

    def setup(self):
        self.encoder = make(dict(self.encoder_spec))
        if self.imnet_spec is not None:
            in_dim = self.encoder.out_dim
            if self.feat_unfold:
                in_dim *= 9
            in_dim += 2
            if self.cell_decode:
                in_dim += 2
            self.imnet = make(dict(self.imnet_spec), args={"in_dim": in_dim})
        else:
            self.imnet = None

    def gen_feat(self, inp):
        return self.encoder(inp)

    def query_rgb(self, feat, coord, cell=None):
        if self.imnet is None:
            return _nearest_gather(feat, coord)

        b, h, w, c = feat.shape
        if self.feat_unfold:
            # 3x3 unfold: (B,H,W,9,C) -> channel-major (C,kh,kw) ordering
            taps = shifted_neighborhoods(feat, 3)          # (B,H,W,9,C)
            feat = taps.transpose(0, 1, 2, 4, 3).reshape(b, h, w, c * 9)

        if self.local_ensemble:
            vx_lst, vy_lst, eps = [-1, 1], [-1, 1], 1e-6
        else:
            vx_lst, vy_lst, eps = [0], [0], 0

        rx = 1.0 / h
        ry = 1.0 / w
        feat_coord = jnp.asarray(make_coord((h, w), flatten=False))  # (H,W,2)
        feat_coord = jnp.broadcast_to(feat_coord[None], (b, h, w, 2))

        preds, areas = [], []
        for vx in vx_lst:
            for vy in vy_lst:
                shift = jnp.asarray([vx * rx + eps, vy * ry + eps],
                                    coord.dtype)
                coord_ = jnp.clip(coord + shift, -1 + 1e-6, 1 - 1e-6)
                q_feat = _nearest_gather(feat, coord_)
                q_coord = _nearest_gather(feat_coord, coord_)
                rel = (coord - q_coord) * jnp.asarray([h, w], coord.dtype)
                inp = jnp.concatenate([q_feat, rel], axis=-1)
                if self.cell_decode:
                    rel_cell = cell * jnp.asarray([h, w], coord.dtype)
                    inp = jnp.concatenate([inp, rel_cell], axis=-1)
                preds.append(self.imnet(inp))
                areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)

        tot = sum(areas)
        if self.local_ensemble:
            areas = [areas[3], areas[2], areas[1], areas[0]]
        out = 0
        for pred, area in zip(preds, areas):
            out = out + pred * (area / tot)[..., None]
        return out

    def __call__(self, inp, coord, cell):
        return self.query_rgb(self.gen_feat(inp), coord, cell)


@register("lte")
class LTE(nn.Module):
    """Local texture estimator head (ref: lte.py:11-110)."""

    encoder_spec: Any
    imnet_spec: Any = None
    hidden_dim: int = 256

    def setup(self):
        self.encoder = make(dict(self.encoder_spec))
        self.coef = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="coef")
        self.freq = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="freq")
        self.phase = nn.Dense(self.hidden_dim // 2, use_bias=False,
                              name="phase")
        self.imnet = make(dict(self.imnet_spec),
                          args={"in_dim": self.hidden_dim})

    def __call__(self, inp, coord, cell):
        feat = self.encoder(inp)
        coef = self.coef(feat)
        freq = self.freq(feat)
        b, h, w, _ = feat.shape

        feat_coord = jnp.asarray(make_coord((h, w), flatten=False))
        feat_coord = jnp.broadcast_to(feat_coord[None], (b, h, w, 2))

        rx, ry = 1.0 / h, 1.0 / w
        preds, areas = [], []
        for vx in (-1, 1):
            for vy in (-1, 1):
                shift = jnp.asarray([vx * rx + 1e-6, vy * ry + 1e-6],
                                    coord.dtype)
                coord_ = jnp.clip(coord + shift, -1 + 1e-6, 1 - 1e-6)
                q_coef = _nearest_gather(coef, coord_)
                q_freq = _nearest_gather(freq, coord_)
                q_coord = _nearest_gather(feat_coord, coord_)
                rel = (coord - q_coord) * jnp.asarray([h, w], coord.dtype)
                rel_cell = cell * jnp.asarray([h, w], coord.dtype)

                bq = q_freq.shape[:2]
                # split into (hidden/2, 2), weight by rel coord, sum
                qf = q_freq.reshape(*bq, self.hidden_dim // 2, 2)
                qf = jnp.sum(qf * rel[..., None, :], axis=-1)
                qf = qf + self.phase(rel_cell)
                qf = jnp.concatenate([jnp.cos(np.pi * qf),
                                      jnp.sin(np.pi * qf)], axis=-1)
                preds.append(self.imnet(q_coef * qf))
                areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)

        tot = sum(areas)
        areas = [areas[3], areas[2], areas[1], areas[0]]
        out = 0
        for pred, area in zip(preds, areas):
            out = out + pred * (area / tot)[..., None]
        # bilinear input skip (border padding)
        grid = jnp.stack([coord[..., 1], coord[..., 0]], axis=-1)  # (x, y)
        skip = grid_sample_bilinear(inp, grid[:, :, None, :])[:, :, 0, :]
        return out + skip


@register("metasr")
class MetaSR(nn.Module):
    """Meta-upscale head (ref: misc.py:11-70)."""

    encoder_spec: Any

    def setup(self):
        self.encoder = make(dict(self.encoder_spec))
        self.imnet = MLP(in_dim=3, out_dim=self.encoder.out_dim * 9 * 3,
                         hidden_list=(256,), name="imnet")

    def __call__(self, inp, coord, cell):
        feat = self.encoder(inp)
        b, h, w, c = feat.shape
        taps = shifted_neighborhoods(feat, 3)
        feat9 = taps.transpose(0, 1, 2, 4, 3).reshape(b, h, w, c * 9)

        feat_coord = make_coord((h, w), flatten=False)
        feat_coord[:, :, 0] -= 1.0 / h
        feat_coord[:, :, 1] -= 1.0 / w
        feat_coord = jnp.broadcast_to(jnp.asarray(feat_coord)[None],
                                      (b, h, w, 2))

        coord_ = coord - cell / 2
        coord_q = jnp.clip(coord_ + 1e-6, -1 + 1e-6, 1 - 1e-6)
        q_feat = _nearest_gather(feat9, coord_q)
        q_coord = _nearest_gather(feat_coord, coord_q)
        rel = (coord_ - q_coord) * jnp.asarray([h / 2, w / 2], coord.dtype)
        r_rev = cell[..., 0] * (h / 2)
        inp_vec = jnp.concatenate([rel, r_rev[..., None]], axis=-1)

        pred_w = self.imnet(inp_vec).reshape(*coord.shape[:2], c * 9, 3)
        return jnp.einsum("bqk,bqko->bqo", q_feat, pred_w)


@register("lte-fast")
class LTEP(nn.Module):
    """LTE+ — grid-query LTE variant with a pointwise-conv head
    (ref: esc_arb/models/ltep.py:13-110). coord is a (B, Hq, Wq, 2) query
    GRID; the shared MLP is a stack of 1x1 convs over that grid and the
    bilinear input skip is added at the end.
    """

    encoder_spec: Any
    num_layer: int = 3
    hidden_dim: int = 256
    out_dim: int = 3

    def setup(self):
        self.encoder = make(dict(self.encoder_spec))
        self.coef = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="coef")
        self.freq = nn.Conv(self.hidden_dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="freq")
        self.phase = nn.Dense(self.hidden_dim // 2, use_bias=False,
                              name="phase")
        self.head = [nn.Conv(self.hidden_dim, (1, 1), name=f"layers.{2 * i}")
                     for i in range(self.num_layer)] + \
                    [nn.Conv(self.out_dim, (1, 1),
                             name=f"layers.{2 * self.num_layer}")]

    def __call__(self, inp, coord, cell):
        feat = self.encoder(inp)
        coef = self.coef(feat)
        freq = self.freq(feat)
        b, h, w, _ = feat.shape
        hq, wq = coord.shape[1], coord.shape[2]
        coord_flat = coord.reshape(b, hq * wq, 2)

        feat_coord = jnp.asarray(make_coord((h, w), flatten=False))
        feat_coord = jnp.broadcast_to(feat_coord[None], (b, h, w, 2))

        rx, ry = 1.0 / h, 1.0 / w
        preds, areas = [], []
        for vx in (-1, 1):
            for vy in (-1, 1):
                shift = jnp.asarray([vx * rx + 1e-6, vy * ry + 1e-6],
                                    coord.dtype)
                coord_ = jnp.clip(coord_flat + shift, -1 + 1e-6, 1 - 1e-6)
                q_coef = _nearest_gather(coef, coord_)
                q_freq = _nearest_gather(freq, coord_)
                q_coord = _nearest_gather(feat_coord, coord_)
                rel = (coord_flat - q_coord) * jnp.asarray([h, w],
                                                           coord.dtype)
                rel_cell = cell * jnp.asarray([h, w], coord.dtype)

                # NOTE: unlike lte.py (interleaved channel pairs), ltep.py
                # splits the frequency channels into two HALVES (y-half,
                # x-half) — ref: ltep.py:79-81
                qf = q_freq.reshape(b, hq * wq, 2, self.hidden_dim // 2)
                qf = jnp.sum(qf * rel[..., :, None], axis=2)
                qf = qf + self.phase(rel_cell)[:, None, :]
                qf = jnp.concatenate([jnp.cos(np.pi * qf),
                                      jnp.sin(np.pi * qf)], axis=-1)
                y = (q_coef * qf).reshape(b, hq, wq, self.hidden_dim)
                for i, conv in enumerate(self.head):
                    y = conv(y)
                    if i < len(self.head) - 1:
                        y = nn.relu(y)
                preds.append(y)
                areas.append(
                    (jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)
                    .reshape(b, hq, wq))

        tot = sum(areas)
        areas = [areas[3], areas[2], areas[1], areas[0]]
        out = 0
        for pred, area in zip(preds, areas):
            out = out + pred * (area / tot)[..., None]
        grid = jnp.stack([coord_flat[..., 1], coord_flat[..., 0]], axis=-1)
        skip = grid_sample_bilinear(inp, grid[:, :, None, :])[:, :, 0, :]
        return out + skip.reshape(b, hq, wq, -1)
