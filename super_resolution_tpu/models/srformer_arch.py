"""SRFormer — permuted self-attention SR (flax.linen, NHWC).

Rebuild of the reference SRFormer (ref: hat/archs/srformer_arch.py).
Core idea: inside each window, K/V are channel-compressed (dim -> dim/2)
and their 2x2 spatial sub-positions folded into channels, shrinking the
key set to N/4 while Q keeps full resolution (PSA, :119-222). The relative
position bias is defined on the permuted (half-resolution) grid and
expanded to full-resolution queries via the aligned index (:146-161).
The FFN is a ConvFFN with a 5x5 depthwise residual branch (:48-86).
Macro structure (groups, heads, padding) mirrors SwinIR.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import MeanShift, drop_path, gelu_exact
from super_resolution_tpu.models.hat_classic_arch import PatchEmbedNorm
from super_resolution_tpu.ops.attention import (attention_with_bias,
                                                 attention_with_bias_auto)
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.ops.windowing import window_partition, window_reverse
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5


def aligned_rpi(pws: int) -> np.ndarray:
    """(4*pws^2, pws^2) aligned relative-position index (ref: :146-161)."""
    coords = np.stack(np.meshgrid(np.arange(pws), np.arange(pws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += pws - 1
    rel[:, :, 1] += pws - 1
    rel[:, :, 0] *= 2 * pws - 1
    idx = rel.sum(-1)                                     # (pws^2, pws^2)
    idx = idx.reshape(pws, pws, 1, 1, pws * pws)
    idx = np.tile(idx, (1, 1, 2, 2, 1))
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(4 * pws * pws, pws * pws)
    return idx.astype(np.int32)


def psa_shift_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """(nW, ws^2, pws^2) rectangular shift mask (ref: :305-337)."""
    def region_ids(hh, ww, ws, ss):
        m = np.zeros((hh, ww))
        slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
        cnt = 0
        for hs in slices:
            for wsl in slices:
                m[hs, wsl] = cnt
                cnt += 1
        nh, nw = hh // ws, ww // ws
        mw = m.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3)
        return mw.reshape(-1, ws * ws)

    full = region_ids(h, w, window_size, shift_size)
    perm = region_ids(h // 2, w // 2, window_size // 2, shift_size // 2)
    diff = full[:, :, None] - perm[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class PSA(nn.Module):
    """Permuted self-attention over pre-partitioned windows (ref: :119-222)."""

    dim: int
    window_size: int
    num_heads: int

    def setup(self):
        pws = self.window_size // 2
        self.kv = nn.Dense(self.dim // 2, name="kv")
        self.q = nn.Dense(self.dim, name="q")
        self.proj = nn.Dense(self.dim, name="proj")
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            ((2 * pws - 1) * (2 * pws - 1), self.num_heads))
        self._rpi = aligned_rpi(pws)

    def __call__(self, x_windows, mask=None):
        bw, n, c = x_windows.shape
        ws = self.window_size
        pws = ws // 2
        h = self.num_heads
        d = c // h
        nk = n // 4

        # permuted KV: fold each 2x2 spatial neighborhood's c/4 channels
        kv = self.kv(x_windows)                               # (bw, n, c/2)
        kv = kv.reshape(bw, pws, 2, pws, 2, 2, c // 4)
        kv = kv.transpose(0, 1, 3, 5, 2, 4, 6)                # b,pw0,pw1,kv,2,2,c4
        kv = kv.reshape(bw, nk, 2, h, d).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]                                   # (bw, h, nk, d)

        q = self.q(x_windows).reshape(bw, n, h, d).transpose(0, 2, 1, 3)

        bias = self.relative_position_bias_table[self._rpi.reshape(-1)]
        bias = bias.reshape(n, nk, h).transpose(2, 0, 1)      # (h, n, nk)
        if mask is not None:
            nw = mask.shape[0]
            bias = bias[None, None] + mask[None, :, None]
            q = q.reshape(bw // nw, nw, h, n, d)
            k = k.reshape(bw // nw, nw, h, nk, d)
            v = v.reshape(bw // nw, nw, h, nk, d)
            out = attention_with_bias(q, k, v, bias, scale=d ** -0.5)
            out = out.reshape(bw, h, n, d)
        else:
            out = attention_with_bias_auto(q, k, v, bias, scale=d ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return self.proj(out)


class _DWConv(nn.Module):
    """5x5 depthwise + GELU (torch name dwconv.depthwise_conv.0)."""

    hidden: int

    def setup(self):
        self.conv = nn.Conv(self.hidden, (5, 5), padding=[(2, 2), (2, 2)],
                            feature_group_count=self.hidden,
                            name="depthwise_conv_0")

    def __call__(self, x):
        return gelu_exact(self.conv(x))


class ConvFFN(nn.Module):
    """fc1 -> GELU -> (+ 5x5 depthwise GELU branch) -> fc2 (ref: :48-86)."""

    hidden: int
    out: int

    def setup(self):
        self.fc1 = nn.Dense(self.hidden, name="fc1")
        self.dwconv = _DWConv(self.hidden, name="dwconv")
        self.fc2 = nn.Dense(self.out, name="fc2")

    def __call__(self, x):
        x = gelu_exact(self.fc1(x))
        x = x + self.dwconv(x)
        return self.fc2(x)


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 24
    shift_size: int = 0
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.0

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.attn = PSA(self.dim, self.window_size, self.num_heads,
                        name="attn")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = ConvFFN(int(self.dim * self.mlp_ratio), self.dim,
                           name="mlp")

    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x
        x = self.norm1(x)

        if ss > 0:
            shifted = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            mask = jnp.asarray(psa_shift_mask(hh, ww, ws, ss))
        else:
            shifted, mask = x, None

        from super_resolution_tpu.ops.attention import \
            fused_route_enabled as _pallas_attention_enabled
        from super_resolution_tpu.ops.pallas_attention import \
            bias_attention_supported
        if (_pallas_attention_enabled() and not self.is_initializing()
                and ws % 8 == 0 and hh % ws == 0 and ww % ws == 0
                and bias_attention_supported(ws * ws, (ws // 2) ** 2,
                                             self.num_heads)):
            # fused PSA block megakernel: q projection, partition,
            # rectangular attention vs the 4x-compressed KV, and the output
            # projection in VMEM (ops/pallas_attention.py::fused_psa_block).
            # The KV projection + 2x2 permuted fold stay in XLA (see the
            # kernel docstring) — compressed windows are 4x smaller than x.
            from super_resolution_tpu.ops.pallas_attention import \
                fused_psa_block_ad
            at = self.attn
            h_ = self.num_heads
            d = c // h_
            n, pws = ws * ws, ws // 2
            nk, c4 = pws * pws, c // 4
            kv_p = at.kv.variables["params"]
            q_p = at.q.variables["params"]
            proj_p = at.proj.variables["params"]
            kv_img = (shifted @ kv_p["kernel"].astype(shifted.dtype)
                      + kv_p["bias"].astype(shifted.dtype))
            # whole-image permuted fold == the per-window fold (ws even,
            # windows align to even rows/cols): each 2x2 neighborhood's
            # (kv, c/4) channel slices become one compressed token
            kvc = kv_img.reshape(b, hh // 2, 2, ww // 2, 2, 2, c4)
            kvc = kvc.transpose(0, 1, 3, 5, 2, 4, 6)
            kvc = kvc.reshape(b, hh // 2, ww // 2, 2, c)
            kvc = jnp.concatenate([kvc[..., 0, :], kvc[..., 1, :]], axis=-1)
            kvw = window_partition(kvc, pws).reshape(-1, nk, 2 * c)
            bias = at.relative_position_bias_table[at._rpi.reshape(-1)]
            bias = bias.reshape(n, nk, h_).transpose(2, 0, 1)
            mask_arr = (mask.astype(jnp.float32) if mask is not None
                        else jnp.zeros((1, n, nk), jnp.float32))
            shifted = fused_psa_block_ad(
                shifted, q_p["kernel"], q_p["bias"], proj_p["kernel"],
                proj_p["bias"], kvw, bias, mask_arr, h_, ws, d ** -0.5)
        else:
            x_windows = window_partition(shifted, ws).reshape(-1, ws * ws, c)
            attn_windows = self.attn(x_windows, mask=mask)
            shifted = window_reverse(attn_windows.reshape(-1, ws, ws, c),
                                     ws, hh, ww)
        x = jnp.roll(shifted, (ss, ss), axis=(1, 2)) if ss > 0 else shifted

        if not deterministic and self.drop_path_rate > 0:
            x = drop_path(x, self.drop_path_rate, False,
                          self.make_rng("droppath"))
        x = shortcut + x
        mlp_x = self.mlp(self.norm2(x))
        if not deterministic and self.drop_path_rate > 0:
            mlp_x = drop_path(mlp_x, self.drop_path_rate, False,
                              self.make_rng("droppath"))
        return x + mlp_x


class PSABasicLayer(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 2.0
    drop_path_rates: Sequence[float] = ()

    def setup(self):
        rates = list(self.drop_path_rates) or [0.0] * self.depth
        self.blocks = [
            PSABlock(dim=self.dim, num_heads=self.num_heads,
                     window_size=self.window_size,
                     shift_size=0 if i % 2 == 0 else self.window_size // 2,
                     mlp_ratio=self.mlp_ratio, drop_path_rate=rates[i],
                     name=f"blocks_{i}")
            for i in range(self.depth)
        ]

    def __call__(self, x, deterministic: bool = True):
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return x


class PSAGroup(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 2.0
    drop_path_rates: Sequence[float] = ()
    resi_connection: str = "1conv"

    def setup(self):
        self.residual_group = PSABasicLayer(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            drop_path_rates=self.drop_path_rates, name="residual_group")
        if self.resi_connection == "1conv":
            self.conv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv")
        else:
            raise NotImplementedError(self.resi_connection)

    def __call__(self, x, deterministic: bool = True):
        return self.conv(self.residual_group(x, deterministic)) + x


@ARCH_REGISTRY.register()
class SRFormer(nn.Module):
    img_size: int = 48
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 24
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""
    resi_connection: str = "1conv"
    # gradient checkpointing: remat per PSAGroup (same recipe as HAT)
    use_checkpoint: bool = False

    def setup(self):
        import math

        num_feat = 64
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(self.patch_norm, name="patch_embed")
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        group_cls = (nn.remat(PSAGroup, static_argnums=(2,))
                     if self.use_checkpoint else PSAGroup)
        layers = []
        start = 0
        for i, depth in enumerate(self.depths):
            layers.append(group_cls(dim=self.embed_dim, depth=depth,
                                   num_heads=self.num_heads[i],
                                   window_size=self.window_size,
                                   mlp_ratio=self.mlp_ratio,
                                   drop_path_rates=tuple(dpr[start:start + depth]),
                                   resi_connection=self.resi_connection,
                                   name=f"layers_{i}"))
            start += depth
        self.layers = layers
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm")
        self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       name="conv_after_body")
        if self.upsampler == "pixelshuffle":
            self.conv_before_upsample_0 = nn.Conv(
                num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                name="conv_before_upsample_0")
            if (self.upscale & (self.upscale - 1)) == 0:
                nlog = int(math.log2(self.upscale))
                self.upsample_convs = [
                    nn.Conv(4 * num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"upsample_{2 * i}") for i in range(nlog)]
                self.upsample_factors = [2] * nlog
            elif self.upscale == 3:
                self.upsample_convs = [nn.Conv(9 * num_feat, (3, 3),
                                               padding=[(1, 1), (1, 1)],
                                               name="upsample_0")]
                self.upsample_factors = [3]
            self.conv_last = nn.Conv(self.in_chans, (3, 3),
                                     padding=[(1, 1), (1, 1)], name="conv_last")
        elif self.upsampler == "pixelshuffledirect":
            self.upsample_0 = nn.Conv(self.in_chans * self.upscale ** 2,
                                      (3, 3), padding=[(1, 1), (1, 1)],
                                      name="upsample_0")
        else:
            self.conv_last = nn.Conv(self.in_chans, (3, 3),
                                     padding=[(1, 1), (1, 1)], name="conv_last")

    def features(self, x, deterministic: bool = True):
        x = self.patch_embed(x)
        for layer in self.layers:
            # positional: static_argnums=(2,) on the remat-lifted group
            x = layer(x, deterministic)
        return self.norm(x)

    def head(self, x):
        """Everything ahead of the PSA-group stack — the pipeline-stage
        split (parallel/pipeline.py). Requires window-multiple input; see
        SwinIR.head for why."""
        if x.shape[1] % self.window_size or x.shape[2] % self.window_size:
            raise ValueError(
                "pipelined SRFormer needs window-multiple input; pad like "
                "HATModel.pre_process / the tile engine does")
        x = MeanShift.normalize(x, self.img_range)
        feat = self.conv_first(x)
        return feat, self.patch_embed(feat)

    def tail(self, body, feat):
        """Post-body norm/conv + global residual + reconstruction."""
        body = self.norm(body)
        feat = self.conv_after_body(body) + feat
        if self.upsampler == "pixelshuffle":
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            for conv, r in zip(self.upsample_convs, self.upsample_factors):
                y = pixel_shuffle(conv(y), r)
            out = self.conv_last(y)
        elif self.upsampler == "pixelshuffledirect":
            out = pixel_shuffle(self.upsample_0(feat), self.upscale)
        else:
            raise NotImplementedError(
                "pipelined SRFormer supports the SR upsampler branches only")
        return MeanShift.denormalize(out, self.img_range)

    def __call__(self, x, deterministic: bool = True):
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
        x = MeanShift.normalize(x, self.img_range)

        if self.upsampler == "pixelshuffle":
            feat = self.conv_first(x)
            feat = self.conv_after_body(self.features(feat, deterministic)) + feat
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            for conv, r in zip(self.upsample_convs, self.upsample_factors):
                y = pixel_shuffle(conv(y), r)
            out = self.conv_last(y)
        elif self.upsampler == "pixelshuffledirect":
            feat = self.conv_first(x)
            feat = self.conv_after_body(self.features(feat, deterministic)) + feat
            out = pixel_shuffle(self.upsample_0(feat), self.upscale)
        else:
            feat = self.conv_first(x)
            res = self.conv_after_body(self.features(feat, deterministic)) + feat
            out = x + self.conv_last(res)

        out = MeanShift.denormalize(out, self.img_range)
        return out[:, :h * self.upscale, :w * self.upscale, :]
