"""Feature encoders for the arbitrary-scale heads (no_upsampling variants).

The reference ports each SR backbone with a `no_upsampling` flag exposing
`out_dim` features (ref: esc_arb/models/{esc,edsr,swinir}.py). Here the
encoders are thin feature-trunk modules reusing the framework's block
implementations; ESC's deployment flag folds the geo-ensemble offline
(ref: esc_arb/models/esc.py:260-300).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.arb.models import register
from super_resolution_tpu.models.cnn_archs import ResidualBlockNoBN
from super_resolution_tpu.models.esc_arch import Block, geo_ensemble, orthogonal_oihw
from super_resolution_tpu.models.swinir_arch import RSTB


@register("esc")
class ESCEncoder(nn.Module):
    """ESC feature trunk: proj -> blocks (shared PLK) -> last + skip."""

    dim: int = 64
    pdim: int = 16
    kernel_size: int = 13
    n_blocks: int = 5
    conv_blocks: int = 5
    window_size: int = 32
    num_heads: int = 4
    exp_ratio: float = 1.25
    deployment: bool = False

    @property
    def out_dim(self) -> int:
        return self.dim

    def setup(self):
        self.plk_filter = self.param(
            "plk_filter", orthogonal_oihw,
            (self.pdim, self.pdim, self.kernel_size, self.kernel_size))
        self.proj = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="proj")
        self.blocks = [
            Block(self.dim, self.pdim, self.conv_blocks, self.kernel_size,
                  self.window_size, self.num_heads, self.exp_ratio,
                  name=f"blocks_{i}")
            for i in range(self.n_blocks)
        ]
        self.last = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="last")

    def __call__(self, x):
        feat = self.proj(x)
        skip = feat
        plk = (self.plk_filter if self.deployment
               else geo_ensemble(self.plk_filter))
        for block in self.blocks:
            feat = block(feat, plk)
        return self.last(feat) + skip


@register("edsr-baseline")
@register("edsr")
class EDSREncoder(nn.Module):
    """EDSR trunk without upsampling (ref: esc_arb/models/edsr.py)."""

    n_resblocks: int = 16
    n_feats: int = 64
    res_scale: float = 1.0
    no_upsampling: bool = True
    rgb_range: float = 1.0

    @property
    def out_dim(self) -> int:
        return self.n_feats

    def setup(self):
        self.head = nn.Conv(self.n_feats, (3, 3), padding=[(1, 1), (1, 1)],
                            name="head")
        self.body = [ResidualBlockNoBN(self.n_feats, self.res_scale,
                                       name=f"body_{i}")
                     for i in range(self.n_resblocks)]
        self.body_tail = nn.Conv(self.n_feats, (3, 3),
                                 padding=[(1, 1), (1, 1)], name="body_tail")

    def __call__(self, x):
        feat = self.head(x)
        res = feat
        for blk in self.body:
            res = blk(res)
        return self.body_tail(res) + feat


@register("swinir")
class SwinIREncoder(nn.Module):
    """SwinIR trunk without reconstruction (ref: esc_arb/models/swinir.py)."""

    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0

    @property
    def out_dim(self) -> int:
        return self.embed_dim

    def setup(self):
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.layers = [
            RSTB(dim=self.embed_dim, depth=d, num_heads=self.num_heads[i],
                 window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                 name=f"layers_{i}")
            for i, d in enumerate(self.depths)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       name="conv_after_body")

    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        feat = self.conv_first(x)
        body = feat
        for layer in self.layers:
            body = layer(body)
        body = self.norm(body)
        out = self.conv_after_body(body) + feat
        return out[:, :h, :w, :]


class _RDBConv(nn.Module):
    """conv+relu with dense concat (ref: esc_arb/models/rdn.py:13-25)."""

    grow: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(nn.Conv(self.grow, (3, 3), padding=[(1, 1), (1, 1)],
                              name="conv_0")(x))
        return jnp.concatenate([x, out], axis=-1)


class _RDB(nn.Module):
    g0: int
    grow: int
    n_convs: int

    def setup(self):
        self.convs = [_RDBConv(self.grow, name=f"convs_{i}")
                      for i in range(self.n_convs)]
        self.lff = nn.Conv(self.g0, (1, 1), name="LFF")

    def __call__(self, x):
        y = x
        for conv in self.convs:
            y = conv(y)
        return self.lff(y) + x


@register("rdn")
class RDNEncoder(nn.Module):
    """RDN feature trunk, no_upsampling (ref: esc_arb/models/rdn.py:45-100);
    config 'B' default (16 blocks, 8 convs, growth 64)."""

    G0: int = 64
    RDNkSize: int = 3
    RDNconfig: str = "B"

    @property
    def out_dim(self) -> int:
        return self.G0

    def setup(self):
        d, c, g = {"A": (20, 6, 32), "B": (16, 8, 64)}[self.RDNconfig]
        self._d = d
        self.sfe1 = nn.Conv(self.G0, (3, 3), padding=[(1, 1), (1, 1)],
                            name="SFENet1")
        self.sfe2 = nn.Conv(self.G0, (3, 3), padding=[(1, 1), (1, 1)],
                            name="SFENet2")
        self.rdbs = [_RDB(self.G0, g, c, name=f"RDBs_{i}") for i in range(d)]
        self.gff_0 = nn.Conv(self.G0, (1, 1), name="GFF_0")
        self.gff_1 = nn.Conv(self.G0, (3, 3), padding=[(1, 1), (1, 1)],
                             name="GFF_1")

    def __call__(self, x):
        f1 = self.sfe1(x)
        y = self.sfe2(f1)
        outs = []
        for rdb in self.rdbs:
            y = rdb(y)
            outs.append(y)
        y = self.gff_1(self.gff_0(jnp.concatenate(outs, axis=-1)))
        return y + f1


class _RCANCALayer(nn.Module):
    """(ref: esc_arb/models/rcan.py:46-62)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(nn.Conv(self.channel // self.reduction, (1, 1),
                            name="conv_du.0")(y))
        y = nn.sigmoid(nn.Conv(self.channel, (1, 1), name="conv_du.2")(y))
        return x * y


class _RCAB(nn.Module):
    """(ref: esc_arb/models/rcan.py:64-84)."""

    n_feat: int
    reduction: int

    @nn.compact
    def __call__(self, x):
        res = nn.relu(nn.Conv(self.n_feat, (3, 3), padding=[(1, 1)] * 2,
                              name="body.0")(x))
        res = nn.Conv(self.n_feat, (3, 3), padding=[(1, 1)] * 2,
                      name="body.2")(res)
        res = _RCANCALayer(self.n_feat, self.reduction, name="body.3")(res)
        return res + x


class _RCANResidualGroup(nn.Module):
    """(ref: esc_arb/models/rcan.py:86-102)."""

    n_feat: int
    reduction: int
    n_resblocks: int

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.n_resblocks):
            res = _RCAB(self.n_feat, self.reduction, name=f"body.{i}")(res)
        res = nn.Conv(self.n_feat, (3, 3), padding=[(1, 1)] * 2,
                      name=f"body.{self.n_resblocks}")(res)
        return res + x


@register("rcan")
class RCANEncoder(nn.Module):
    """RCAN feature trunk, EDSR-style port (ref: esc_arb/models/rcan.py:
    104-207); no mean shift on the arb path (forward comments it out)."""

    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    reduction: int = 16
    scale: int = 2
    no_upsampling: bool = True
    rgb_range: float = 1.0

    @property
    def out_dim(self) -> int:
        return self.n_feats

    @nn.compact
    def __call__(self, x):
        assert self.no_upsampling, "arb encoders run feature-only"
        x = nn.Conv(self.n_feats, (3, 3), padding=[(1, 1)] * 2,
                    name="head.0")(x)
        res = x
        for g in range(self.n_resgroups):
            res = _RCANResidualGroup(self.n_feats, self.reduction,
                                     self.n_resblocks, name=f"body.{g}")(res)
        res = nn.Conv(self.n_feats, (3, 3), padding=[(1, 1)] * 2,
                      name=f"body.{self.n_resgroups}")(res)
        return res + x


@register("ATDLight")
class ATDEncoder(nn.Module):
    """ATD feature trunk (ref: esc_arb/models/atd.py:883-1196 arbitrary-
    scale path + make_atdlight:1197-1216): mirror-pad to window multiple,
    conv_first -> ATD blocks -> norm -> conv_after_body + skip, crop.
    No mean shift (the port comments it out)."""

    embed_dim: int = 48
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (4, 4, 4, 4)
    window_size: int = 16
    category_size: int = 128
    num_tokens: int = 64
    reducted_dim: int = 8
    convffn_kernel_size: int = 7
    mlp_ratio: float = 1.0
    no_upsampling: bool = True

    @property
    def out_dim(self) -> int:
        return self.embed_dim

    def setup(self):
        from super_resolution_tpu.models.atd_arch import ATDB, PatchEmbedNorm

        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(True, name="patch_embed")
        self.layers = [
            ATDB(dim=self.embed_dim, depth=self.depths[i],
                 num_heads=self.num_heads[i], window_size=self.window_size,
                 category_size=self.category_size,
                 num_tokens=self.num_tokens, reducted_dim=self.reducted_dim,
                 convffn_kernel_size=self.convffn_kernel_size,
                 mlp_ratio=self.mlp_ratio, resi_connection="1conv",
                 name=f"layers_{i}")
            for i in range(len(self.depths))
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       name="conv_after_body")

    def __call__(self, x):
        h_ori, w_ori = x.shape[1], x.shape[2]
        mod = self.window_size
        pad_h = (mod - h_ori % mod) % mod
        pad_w = (mod - w_ori % mod) % mod
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="symmetric")
        feat = self.conv_first(x)
        body = self.patch_embed(feat)
        for layer in self.layers:
            body = layer(body)
        body = self.norm(body)
        feat = self.conv_after_body(body) + feat
        return feat[:, :h_ori, :w_ori]


@register("HiTSRF")
class HiTSRFEncoder(nn.Module):
    """HiT-SRF feature trunk (ref: esc_arb/models/hit_srf.py:726-936
    arbitrary-scale path; HiT_SRF() factory defaults). No mean shift."""

    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    base_win_size: Sequence[int] = (8, 8)
    mlp_ratio: float = 2.0
    hier_win_ratios: Sequence[float] = (0.5, 1, 2, 4, 6, 8)
    no_upsampling: bool = True

    @property
    def out_dim(self) -> int:
        return self.embed_dim

    def setup(self):
        from super_resolution_tpu.models.hitsrf_arch import (PatchEmbedNorm,
                                                             RHTB)

        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(True, name="patch_embed")
        self.layers = [
            RHTB(dim=self.embed_dim, depth=self.depths[i],
                 num_heads=self.num_heads[i],
                 base_win_size=tuple(self.base_win_size),
                 mlp_ratio=self.mlp_ratio,
                 hier_win_ratios=tuple(self.hier_win_ratios),
                 name=f"layers_{i}")
            for i in range(len(self.depths))
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       name="conv_after_body")

    def __call__(self, x):
        feat = self.conv_first(x)
        body = self.patch_embed(feat)
        for layer in self.layers:
            body = layer(body)
        body = self.norm(body)
        return self.conv_after_body(body) + feat
