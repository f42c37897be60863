"""SwinIR (flax.linen, NHWC) — classic window-MSA SR network.

Rebuild of the vendored SwinIR (ref: basicsr/archs/swinir_arch.py:694-930),
sharing the window-attention / shift-mask machinery with classic HAT
(models/hat_classic_arch.py). Four reconstruction heads: 'pixelshuffle'
(classical SR), 'pixelshuffledirect' (lightweight), 'nearest+conv'
(real-world), and '' (denoise/CAR residual head).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import MeanShift, drop_path, gelu_exact
from super_resolution_tpu.models.hat_classic_arch import (
    Mlp, PatchEmbedNorm, WindowAttentionClassic)
from super_resolution_tpu.ops.attention import shift_attn_mask_jnp
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.ops.windowing import window_partition, window_reverse
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5


class SwinTransformerBlock(nn.Module):
    """(S)W-MSA + MLP block (ref: swinir_arch.py:194-324)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.attn = WindowAttentionClassic(self.dim, self.window_size,
                                           self.num_heads, name="attn")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")

    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x
        x = self.norm1(x)

        if ss > 0:
            shifted = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            mask = shift_attn_mask_jnp(h, w, ws, ss)
        else:
            shifted, mask = x, None

        from super_resolution_tpu.ops.attention import \
            fused_route_enabled as _pallas_attention_enabled
        from super_resolution_tpu.ops.pallas_attention import \
            msa_block_supported
        if (_pallas_attention_enabled() and not self.is_initializing()
                and ws % 8 == 0 and h % ws == 0 and w % ws == 0
                and msa_block_supported(ws, shifted.dtype)):
            # (S)W-MSA block megakernel incl. qkv/proj matmuls (shared with
            # classic HAT — ops/pallas_attention.py::fused_msa_block)
            from super_resolution_tpu.ops.pallas_attention import \
                fused_msa_block_ad
            at = self.attn
            d = c // self.num_heads
            n = ws * ws
            bias = at.relative_position_bias_table[at._rpi.reshape(-1)]
            bias = bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)
            mask_arr = (mask.astype(jnp.float32) if mask is not None
                        else jnp.zeros((1, n, n), jnp.float32))
            qkv_p = at.qkv.variables["params"]
            proj_p = at.proj.variables["params"]
            if ss > 0 and ws % ss == 0:
                # shift folded into the kernel's window gather; the
                # roll-in above is dead code XLA removes (r5 — see
                # fused_msa_block_shifted)
                from super_resolution_tpu.ops.pallas_attention import \
                    fused_msa_block_shifted_ad

                shifted = fused_msa_block_shifted_ad(
                    x, qkv_p["kernel"], qkv_p["bias"], proj_p["kernel"],
                    proj_p["bias"], bias, mask_arr, self.num_heads, ws,
                    ss, d ** -0.5)
            else:
                shifted = fused_msa_block_ad(
                    shifted, qkv_p["kernel"], qkv_p["bias"],
                    proj_p["kernel"], proj_p["bias"], bias, mask_arr,
                    self.num_heads, ws, d ** -0.5)
        else:
            x_windows = window_partition(shifted, ws).reshape(-1, ws * ws, c)
            attn_windows = self.attn(x_windows, mask=mask)
            shifted = window_reverse(attn_windows.reshape(-1, ws, ws, c),
                                     ws, h, w)
        x = jnp.roll(shifted, (ss, ss), axis=(1, 2)) if ss > 0 else shifted

        if not deterministic and self.drop_path_rate > 0:
            x = drop_path(x, self.drop_path_rate, False,
                          self.make_rng("droppath"))
        x = shortcut + x
        from super_resolution_tpu.models.hat_classic_arch import \
            _fused_mlp_tail
        fused = _fused_mlp_tail(
            self, x, deterministic or self.drop_path_rate == 0)
        if fused is not None:
            return fused
        mlp_x = self.mlp(self.norm2(x))
        if not deterministic and self.drop_path_rate > 0:
            mlp_x = drop_path(mlp_x, self.drop_path_rate, False,
                              self.make_rng("droppath"))
        return x + mlp_x


class BasicLayer(nn.Module):
    """Stack of Swin blocks (torch name 'residual_group' inside RSTB)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop_path_rates: Sequence[float] = ()

    def setup(self):
        rates = list(self.drop_path_rates) or [0.0] * self.depth
        self.blocks = [
            SwinTransformerBlock(
                dim=self.dim, num_heads=self.num_heads,
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


class RSTB(nn.Module):
    """Residual Swin Transformer block group (ref: swinir_arch.py:480-567)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop_path_rates: Sequence[float] = ()
    resi_connection: str = "1conv"

    def setup(self):
        self.residual_group = BasicLayer(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            drop_path_rates=self.drop_path_rates, name="residual_group")
        if self.resi_connection == "1conv":
            self.conv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv")
            self.conv_seq = None
        elif self.resi_connection == "3conv":
            self.conv_seq = [
                nn.Conv(self.dim // 4, (3, 3), padding=[(1, 1), (1, 1)],
                        name="conv_0"),
                nn.Conv(self.dim // 4, (1, 1), name="conv_2"),
                nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                        name="conv_4"),
            ]
            self.conv = None
        else:
            raise ValueError(self.resi_connection)

    def __call__(self, x, deterministic: bool = True):
        y = self.residual_group(x, deterministic=deterministic)
        if self.conv is not None:
            y = self.conv(y)
        else:
            y = self.conv_seq[0](y)
            y = nn.leaky_relu(y, negative_slope=0.2)
            y = self.conv_seq[1](y)
            y = nn.leaky_relu(y, negative_slope=0.2)
            y = self.conv_seq[2](y)
        return y + x


@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""
    resi_connection: str = "1conv"
    # gradient checkpointing: remat per RSTB (same recipe as HAT)
    use_checkpoint: bool = False

    def setup(self):
        import math

        num_feat = 64
        num_out_ch = self.in_chans
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(self.patch_norm, name="patch_embed")
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        rstb_cls = (nn.remat(RSTB, static_argnums=(2,))
                    if self.use_checkpoint else RSTB)
        layers = []
        start = 0
        for i, depth in enumerate(self.depths):
            layers.append(rstb_cls(dim=self.embed_dim, depth=depth,
                               num_heads=self.num_heads[i],
                               window_size=self.window_size,
                               mlp_ratio=self.mlp_ratio,
                               drop_path_rates=tuple(dpr[start:start + depth]),
                               resi_connection=self.resi_connection,
                               name=f"layers_{i}"))
            start += depth
        self.layers = layers
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm")
        if self.resi_connection == "1conv":
            self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                           padding=[(1, 1), (1, 1)],
                                           name="conv_after_body")
            self.conv_after_body_seq = None
        else:  # '3conv' (ref: swinir_arch.py:824-830)
            self.conv_after_body = None
            self.conv_after_body_seq = [
                nn.Conv(self.embed_dim // 4, (3, 3), padding=[(1, 1), (1, 1)],
                        name="conv_after_body_0"),
                nn.Conv(self.embed_dim // 4, (1, 1), name="conv_after_body_2"),
                nn.Conv(self.embed_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        name="conv_after_body_4"),
            ]

        if self.upsampler == "pixelshuffle":
            self.conv_before_upsample_0 = nn.Conv(
                num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                name="conv_before_upsample_0")
            if (self.upscale & (self.upscale - 1)) == 0:
                n = int(math.log2(self.upscale))
                self.upsample_convs = [
                    nn.Conv(4 * num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"upsample_{2 * i}") for i in range(n)]
                self.upsample_factors = [2] * n
            elif self.upscale == 3:
                self.upsample_convs = [nn.Conv(9 * num_feat, (3, 3),
                                               padding=[(1, 1), (1, 1)],
                                               name="upsample_0")]
                self.upsample_factors = [3]
            self.conv_last = nn.Conv(num_out_ch, (3, 3),
                                     padding=[(1, 1), (1, 1)], name="conv_last")
        elif self.upsampler == "pixelshuffledirect":
            self.upsample_0 = nn.Conv(num_out_ch * self.upscale ** 2, (3, 3),
                                      padding=[(1, 1), (1, 1)],
                                      name="upsample_0")
        elif self.upsampler == "nearest+conv":
            if self.upscale != 4:
                raise ValueError("nearest+conv supports x4 only (reference)")
            self.conv_before_upsample_0 = nn.Conv(
                num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                name="conv_before_upsample_0")
            self.conv_up1 = nn.Conv(num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                                    name="conv_up1")
            self.conv_up2 = nn.Conv(num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                                    name="conv_up2")
            self.conv_hr = nn.Conv(num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                                   name="conv_hr")
            self.conv_last = nn.Conv(num_out_ch, (3, 3),
                                     padding=[(1, 1), (1, 1)], name="conv_last")
        else:
            self.conv_last = nn.Conv(num_out_ch, (3, 3),
                                     padding=[(1, 1), (1, 1)], name="conv_last")

    def _after_body(self, x):
        if self.conv_after_body is not None:
            return self.conv_after_body(x)
        y = self.conv_after_body_seq[0](x)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = self.conv_after_body_seq[1](y)
        y = nn.leaky_relu(y, negative_slope=0.2)
        return self.conv_after_body_seq[2](y)

    def features(self, x, deterministic: bool = True):
        x = self.patch_embed(x)
        for layer in self.layers:
            # positional: static_argnums=(2,) on the remat-lifted RSTB
            x = layer(x, deterministic)
        return self.norm(x)

    def head(self, x):
        """Everything ahead of the RSTB stack, split out so
        parallel/pipeline.py can run the (structurally identical,
        shape-preserving) RSTBs as pipeline stages across a mesh axis.
        Requires window-multiple input (the tile engine's padded tiles
        satisfy this); __call__'s internal pad would otherwise make the
        tail's crop shape data-dependent."""
        if x.shape[1] % self.window_size or x.shape[2] % self.window_size:
            raise ValueError(
                "pipelined SwinIR needs window-multiple input; pad like "
                "HATModel.pre_process / the tile engine does")
        if self.in_chans == 3:
            x = MeanShift.normalize(x, self.img_range)
        else:
            x = x * self.img_range
        feat = self.conv_first(x)
        return feat, self.patch_embed(feat)

    def tail(self, body, feat):
        """Post-body norm/conv + global residual + reconstruction (the
        pixel-shuffle upsampler branches of __call__)."""
        body = self.norm(body)
        feat = self._after_body(body) + feat
        if self.upsampler == "pixelshuffle":
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            for conv, r in zip(self.upsample_convs, self.upsample_factors):
                y = pixel_shuffle(conv(y), r)
            out = self.conv_last(y)
        elif self.upsampler == "pixelshuffledirect":
            out = pixel_shuffle(self.upsample_0(feat), self.upscale)
        elif self.upsampler == "nearest+conv":
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.leaky_relu(self.conv_up1(y), negative_slope=0.2)
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.leaky_relu(self.conv_up2(y), negative_slope=0.2)
            out = self.conv_last(nn.leaky_relu(self.conv_hr(y),
                                               negative_slope=0.2))
        else:
            raise NotImplementedError(
                "pipelined SwinIR supports the SR upsampler branches only "
                "(the denoise path residual-adds the raw input in tail)")
        if self.in_chans == 3:
            return MeanShift.denormalize(out, self.img_range)
        return out / self.img_range

    def __call__(self, x, deterministic: bool = True):
        # window-multiple reflect pad + final crop, inside the arch like
        # the reference (check_image_size — esc_arb/models/swinir.py:790-795,
        # crop at :846): SwinIR must run standalone under plain SRModel on
        # arbitrary image sizes.
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")

        if self.in_chans == 3:
            x = MeanShift.normalize(x, self.img_range)
        else:
            x = x * self.img_range

        if self.upsampler == "pixelshuffle":
            feat = self.conv_first(x)
            feat = self._after_body(self.features(feat, deterministic)) + feat
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            for conv, r in zip(self.upsample_convs, self.upsample_factors):
                y = pixel_shuffle(conv(y), r)
            out = self.conv_last(y)
        elif self.upsampler == "pixelshuffledirect":
            feat = self.conv_first(x)
            feat = self._after_body(self.features(feat, deterministic)) + feat
            out = pixel_shuffle(self.upsample_0(feat), self.upscale)
        elif self.upsampler == "nearest+conv":
            feat = self.conv_first(x)
            feat = self._after_body(self.features(feat, deterministic)) + feat
            y = nn.leaky_relu(self.conv_before_upsample_0(feat))
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.leaky_relu(self.conv_up1(y), negative_slope=0.2)
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.leaky_relu(self.conv_up2(y), negative_slope=0.2)
            out = self.conv_last(nn.leaky_relu(self.conv_hr(y),
                                               negative_slope=0.2))
        else:
            feat = self.conv_first(x)
            res = self._after_body(self.features(feat, deterministic)) + feat
            out = x + self.conv_last(res)

        if self.in_chans == 3:
            out = MeanShift.denormalize(out, self.img_range)
        else:
            out = out / self.img_range
        # reference crops with self.upscale regardless of upsampler (:846)
        return out[:, :h * self.upscale, :w * self.upscale, :]
