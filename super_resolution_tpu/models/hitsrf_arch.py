"""HiT-SRF — hierarchical transformer SR (flax.linen, NHWC).

Rebuild of the reference (ref: hat/archs/hitsrf_arch.py). Each block uses a
different window size (base_win * hier ratio, :475-505) and the SCC
attention (:175-320) computes two correlations per window:
- spatial: full-window queries against base-window-projected values
  (spatial_linear collapses each base cell's sub-grid), with a
  DynamicPosBias MLP bias averaged over sub-positions;
- channel: single-head C x C correlation.
The halves are fused by a linear projection. Q/V come from a DFE
(conv-gated linear) projection. Blocks are post-norm (norm after attn/mlp).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import MeanShift, gelu_exact
from super_resolution_tpu.models.hat_classic_arch import PatchEmbedNorm
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5


def _win_partition(x, wh, ww):
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh, ww, c)


def _win_reverse(wins, wh, ww, h, w):
    b = wins.shape[0] // (h // wh * (w // ww))
    x = wins.reshape(b, h // wh, w // ww, wh, ww, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class DFE(nn.Module):
    """Dual feature extraction: conv branch gated by a linear branch
    (ref: :14-42)."""

    in_features: int
    out_features: int

    def setup(self):
        mid = self.in_features // 5
        self.conv_0 = nn.Conv(mid, (1, 1), name="conv_0")
        self.conv_2 = nn.Conv(mid, (3, 3), padding=[(1, 1), (1, 1)],
                              name="conv_2")
        self.conv_4 = nn.Conv(self.out_features, (1, 1), name="conv_4")
        self.linear = nn.Conv(self.out_features, (1, 1), name="linear")

    def __call__(self, x):
        y = nn.leaky_relu(self.conv_0(x), negative_slope=0.2)
        y = nn.leaky_relu(self.conv_2(y), negative_slope=0.2)
        return self.conv_4(y) * self.linear(x)


class DynamicPosBias(nn.Module):
    """MLP position bias (ref: :136-173, residual=False path)."""

    dim: int
    num_heads: int

    def setup(self):
        pd = self.dim // 4
        self.pos_proj = nn.Dense(pd, name="pos_proj")
        self.pos1_ln = nn.LayerNorm(epsilon=_LN_EPS, name="pos1_0")
        self.pos1_fc = nn.Dense(pd, name="pos1_2")
        self.pos2_ln = nn.LayerNorm(epsilon=_LN_EPS, name="pos2_0")
        self.pos2_fc = nn.Dense(pd, name="pos2_2")
        self.pos3_ln = nn.LayerNorm(epsilon=_LN_EPS, name="pos3_0")
        self.pos3_fc = nn.Dense(self.num_heads, name="pos3_2")

    def __call__(self, biases):
        pos = self.pos_proj(biases)
        pos = self.pos1_fc(nn.relu(self.pos1_ln(pos)))
        pos = self.pos2_fc(nn.relu(self.pos2_ln(pos)))
        return self.pos3_fc(nn.relu(self.pos3_ln(pos)))


class SCC(nn.Module):
    """Spatial-channel correlation (ref: :175-320)."""

    dim: int
    base_win_size: Sequence[int]
    window_size: Sequence[int]
    num_heads: int

    def setup(self):
        self.qv = DFE(self.dim, self.dim, name="qv")
        self.proj = nn.Dense(self.dim, name="proj")
        wh, ww = self.window_size
        self._base = (min(wh, self.base_win_size[0]),
                      min(ww, self.base_win_size[1]))
        ratio = (wh * ww) // (self._base[0] * self._base[1])
        self.spatial_linear = nn.Dense(1, name="spatial_linear")
        self._ratio = ratio
        self.pos = DynamicPosBias(self.dim // 4, self.num_heads, name="pos")

    def _spatial_bias(self):
        wh, ww = self.window_size
        bh, bw = self._base
        ph = np.arange(1 - wh, wh)
        pw = np.arange(1 - ww, ww)
        biases = np.stack(np.meshgrid(ph, pw, indexing="ij"))
        rpe = jnp.asarray(biases.reshape(2, -1).T.astype(np.float32))
        pos = self.pos(rpe)                                 # ((2wh-1)(2ww-1), heads)

        coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                      indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.transpose(1, 2, 0).astype(np.int64)
        rel[:, :, 0] += wh - 1
        rel[:, :, 1] += ww - 1
        rel[:, :, 0] *= 2 * ww - 1
        rpi = rel.sum(-1)                                    # (L, L)

        bias = pos[jnp.asarray(rpi.reshape(-1))]
        bias = bias.reshape(wh * ww, bh, wh // bh, bw, ww // bw, self.num_heads)
        bias = bias.transpose(0, 1, 3, 5, 2, 4).reshape(
            wh * ww, bh * bw, self.num_heads, -1).mean(-1)
        return bias.transpose(2, 0, 1)                       # (heads, L, baseL)

    def __call__(self, x):
        xb, xh, xw, xc = x.shape
        wh, ww = self.window_size
        bh, bw = self._base
        qv = self.qv(x)

        from super_resolution_tpu.ops.attention import \
            fused_route_enabled as _pallas_attention_enabled
        from super_resolution_tpu.ops.pallas_attention import \
            scc_block_supported
        if (_pallas_attention_enabled() and not self.is_initializing()
                and xh % wh == 0 and xw % ww == 0
                and scc_block_supported(wh, ww, xw, xc, self.num_heads,
                                        bh * bw)
                and (xc // 2) % self.num_heads == 0):
            # SCC block megakernel: windowing, base-grid value projection,
            # spatial + channel correlations and the output projection in
            # one VMEM pass (ops/pallas_attention.py::fused_scc_block)
            from super_resolution_tpu.ops.pallas_attention import \
                fused_scc_block_ad
            sl = self.spatial_linear.variables["params"]
            pj = self.proj.variables["params"]
            return fused_scc_block_ad(
                qv, sl["kernel"][:, 0], sl["bias"][0],
                pj["kernel"], pj["bias"],
                self._spatial_bias().astype(jnp.float32),
                self.num_heads, (wh, ww), (bh, bw))

        qv = _win_partition(qv, wh, ww).reshape(-1, wh * ww, xc)

        bwn, L, c = qv.shape
        nh = self.num_heads
        d = c // (2 * nh)
        qv = qv.reshape(bwn, L, 2, nh, d).transpose(2, 0, 3, 1, 4)
        q, v = qv[0], qv[1]                                  # (bwn, nh, L, d)

        # ---- spatial self-correlation
        # project values to the base grid: collapse each base cell's sub-grid
        vs = v.reshape(bwn, nh, bh, wh // bh, bw, ww // bw, d)
        vs = vs.transpose(0, 1, 2, 4, 6, 3, 5).reshape(bwn, nh, bh * bw, d, -1)
        vs = self.spatial_linear(vs)[..., 0]                 # (bwn, nh, baseL, d)
        corr = jnp.einsum("bhld,bhmd->bhlm", q, vs) / float(d)
        corr = corr + self._spatial_bias()[None]
        x_spatial = jnp.einsum("bhlm,bhmd->bhld", corr, vs)
        x_spatial = x_spatial.transpose(0, 2, 1, 3).reshape(bwn, L, c // 2)
        x_spatial = _win_reverse(x_spatial.reshape(-1, wh, ww, c // 2),
                                 wh, ww, xh, xw)

        # ---- channel self-correlation (single head)
        qc = q.transpose(0, 2, 1, 3).reshape(bwn, L, nh * d)
        vc = v.transpose(0, 2, 1, 3).reshape(bwn, L, nh * d)
        corr_c = jnp.einsum("blc,bld->bcd", qc, vc) / float(L)
        x_channel = jnp.einsum("bcd,bld->blc", corr_c, vc)
        x_channel = _win_reverse(x_channel.reshape(-1, wh, ww, c // 2),
                                 wh, ww, xh, xw)

        x = jnp.concatenate([x_spatial, x_channel], axis=-1)
        return self.proj(x)


class ConvFFNHiT(nn.Module):
    """fc1 -> GELU -> (+5x5 dw GELU) -> fc2 (ref: :70-103)."""

    hidden: int
    out: int

    def setup(self):
        self.fc1 = nn.Dense(self.hidden, name="fc1")

        class _DW(nn.Module):
            hidden: int

            def setup(self):
                self.conv = nn.Conv(self.hidden, (5, 5),
                                    padding=[(2, 2), (2, 2)],
                                    feature_group_count=self.hidden,
                                    name="depthwise_conv_0")

            def __call__(self, x):
                return gelu_exact(self.conv(x))

        self.dwconv = _DW(self.hidden, name="dwconv")
        self.fc2 = nn.Dense(self.out, name="fc2")

    def __call__(self, x):
        x = gelu_exact(self.fc1(x))
        x = x + self.dwconv(x)
        return self.fc2(x)


class HierarchicalTransformerBlock(nn.Module):
    """Post-norm hierarchical block (ref: :321-412)."""

    dim: int
    num_heads: int
    base_win_size: Sequence[int]
    window_size: Sequence[int]
    mlp_ratio: float = 2.0

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.correlation = SCC(self.dim, tuple(self.base_win_size),
                               tuple(self.window_size), self.num_heads,
                               name="correlation")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = ConvFFNHiT(int(self.dim * self.mlp_ratio), self.dim,
                              name="mlp")

    def _pad(self, x):
        """Per-block reflect pad to window multiple (ref: :365-382)."""
        wh, ww = self.window_size
        h, w = x.shape[1], x.shape[2]
        mph = (wh - h % wh) % wh
        mpw = (ww - w % ww) % ww
        if mph >= h or mpw >= w:
            ph, pw = h - 1, w - 1
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            mph, mpw = mph - ph, mpw - pw
            h, w = x.shape[1], x.shape[2]
        if mph or mpw:
            x = jnp.pad(x, ((0, 0), (0, mph), (0, mpw), (0, 0)),
                        mode="reflect")
        return x

    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        shortcut = x
        xp = self._pad(x)
        y = self.correlation(xp)[:, :h, :w, :]
        y = self.norm1(y)
        x = shortcut + y
        return x + self.norm2(self.mlp(x))


class RHTB(nn.Module):
    """Residual hierarchical group (ref: :524-586)."""

    dim: int
    depth: int
    num_heads: int
    base_win_size: Sequence[int]
    mlp_ratio: float = 2.0
    hier_win_ratios: Sequence[float] = (0.5, 1, 2, 4, 6, 8)

    def setup(self):
        bws = tuple(self.base_win_size)
        wins = [(int(bws[0] * r), int(bws[1] * r))
                for r in self.hier_win_ratios]

        class _Blocks(nn.Module):
            dim: int
            depth: int
            num_heads: int
            base: tuple
            mlp_ratio: float
            wins: tuple

            def setup(self):
                self.blocks = [
                    HierarchicalTransformerBlock(
                        dim=self.dim, num_heads=self.num_heads,
                        base_win_size=self.base,
                        window_size=self.wins[i], mlp_ratio=self.mlp_ratio,
                        name=f"blocks_{i}")
                    for i in range(self.depth)
                ]

            def __call__(self, x):
                for blk in self.blocks:
                    x = blk(x)
                return x

        self.residual_group = _Blocks(self.dim, self.depth, self.num_heads,
                                      bws, self.mlp_ratio, tuple(wins),
                                      name="residual_group")
        self.conv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="conv")

    def __call__(self, x):
        return self.conv(self.residual_group(x)) + x


@ARCH_REGISTRY.register()
class HiT_SRF(nn.Module):
    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    base_win_size: Sequence[int] = (8, 8)
    mlp_ratio: float = 2.0
    # The shipped HiT-SRF configs say `expansion_factor`, which the torch
    # class swallows via **kwargs (ref: hitsrf_arch.py:722-729 — it defaults
    # mlp_ratio=2, coinciding with the config value). We accept it as an
    # explicit FFN-ratio alias instead of dropping it silently.
    expansion_factor: float | None = None
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffledirect"
    resi_connection: str = "1conv"
    hier_win_ratios: Sequence[float] = (0.5, 1, 2, 4, 6, 8)
    # gradient checkpointing: remat per RHTB (same recipe as HAT)
    use_checkpoint: bool = False

    @property
    def _mlp_ratio(self) -> float:
        return (self.mlp_ratio if self.expansion_factor is None
                else float(self.expansion_factor))

    def setup(self):
        import math

        num_feat = 64
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(self.patch_norm, name="patch_embed")
        rhtb_cls = nn.remat(RHTB) if self.use_checkpoint else RHTB
        self.layers = [
            rhtb_cls(dim=self.embed_dim, depth=self.depths[i],
                 num_heads=self.num_heads[i],
                 base_win_size=tuple(self.base_win_size),
                 mlp_ratio=self._mlp_ratio,
                 hier_win_ratios=tuple(self.hier_win_ratios),
                 name=f"layers_{i}")
            for i in range(len(self.depths))
        ]
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm")
        self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       name="conv_after_body")
        if self.upsampler == "pixelshuffle":
            self.conv_before_upsample_0 = nn.Conv(
                num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                name="conv_before_upsample_0")
            n = int(math.log2(self.upscale))
            self.upsample_convs = [
                nn.Conv(4 * num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                        name=f"upsample_{2 * i}") for i in range(n)]
            self.upsample_factors = [2] * n
            self.conv_last = nn.Conv(self.in_chans, (3, 3),
                                     padding=[(1, 1), (1, 1)], name="conv_last")
        elif self.upsampler == "pixelshuffledirect":
            self.upsample_0 = nn.Conv(self.in_chans * self.upscale ** 2,
                                      (3, 3), padding=[(1, 1), (1, 1)],
                                      name="upsample_0")
        else:
            raise NotImplementedError(self.upsampler)

    def __call__(self, x, deterministic: bool = True):
        x = MeanShift.normalize(x, self.img_range)
        feat = self.conv_first(x)
        body = self.patch_embed(feat)
        for layer in self.layers:
            body = layer(body)
        body = self.norm(body)
        feat = self.conv_after_body(body) + feat
        if self.upsampler == "pixelshuffle":
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            for conv, r in zip(self.upsample_convs, self.upsample_factors):
                y = pixel_shuffle(conv(y), r)
            out = self.conv_last(y)
        else:
            out = pixel_shuffle(self.upsample_0(feat), self.upscale)
        return MeanShift.denormalize(out, self.img_range)
