"""HATX — HAT variant with spatial-gate FFN, focus bias and top-k KV pruning.

Rebuild of the reference HATX (ref: hat/archs/hatx_arch.py). Deltas vs the
fork HAT (models/hat_arch.py):

- HAB's FFN is a SpatialGateDConvFFN (:144-180): fc1 -> split halves ->
  depthwise conv on the spatial half -> concat(spatial * act(gate), gate)
  -> fc2; its ratio is `hab_ffn_ratio`, separate from OCAB's mlp_ratio
  (:748-751).
- OCAB (:289-465) adds an optional Focus-bias saliency head whose tanh'd
  per-key score is added to the attention logits (:358-362,417-427), and
  Top-K KV pruning: keep the top kv_topk_ratio*Nk keys by saliency (or
  ||K||_2 when no focus head) and mask the rest to -1e4 (:429-445).
  top-k masking is expressed via jax.lax.top_k + threshold comparison
  (no scatter needed).
- OCAB unfold padding is ceil((ow-ws)/2) (:315-321) vs the fork's floor.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from super_resolution_tpu.models.arch_util import MeanShift, drop_path, gelu_exact
from super_resolution_tpu.models.esc_arch import ConvAttnWrapper, orthogonal_oihw
from super_resolution_tpu.models.hat_arch import CAB, ESCConvAttn, PatchEmbed
from super_resolution_tpu.ops.attention import relative_position_index_oca
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.ops.windowing import window_partition, window_reverse
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5


def extract_overlap_windows_ceil(x, window_size: int, overlap_win_size: int):
    """Overlap-window extraction with ceil padding (hatx_arch.py:315-321)."""
    b, h, w, c = x.shape
    pad = (overlap_win_size - window_size + 1) // 2
    patches = lax.conv_general_dilated_patches(
        x.transpose(0, 3, 1, 2),
        filter_shape=(overlap_win_size, overlap_win_size),
        window_strides=(window_size, window_size),
        padding=[(pad, pad), (pad, pad)])
    nh, nw = patches.shape[2], patches.shape[3]
    patches = patches.reshape(b, c, overlap_win_size * overlap_win_size, nh, nw)
    patches = patches.transpose(0, 3, 4, 2, 1)
    return patches.reshape(b * nh * nw, overlap_win_size * overlap_win_size, c)


class SpatialGateDConvFFN(nn.Module):
    """fc1 -> [spatial dw-conv | gate] -> concat(spatial*act(gate), gate)
    -> fc2 (ref: hatx_arch.py:144-180)."""

    dim: int
    mlp_ratio: float = 2.0
    dw_kernel_size: int = 3
    act_layer: str = "gelu"

    def setup(self):
        hidden = int(self.dim * self.mlp_ratio)
        assert hidden % 2 == 0, "hidden must be even for the spatial gate"
        self.hidden = hidden
        k = self.dw_kernel_size
        self.fc1 = nn.Dense(hidden, name="fc1")
        self.dw = nn.Conv(hidden // 2, (k, k), padding=[(k // 2, k // 2)] * 2,
                          feature_group_count=hidden // 2, name="dw")
        self.fc2 = nn.Dense(self.dim, name="fc2")

    def __call__(self, x):
        x = self.fc1(x)                       # NHWC, hidden channels
        c2 = self.hidden // 2
        xa, xb = x[..., :c2], x[..., c2:]
        xa = self.dw(xa)
        act = nn.silu if self.act_layer.lower() == "silu" else gelu_exact
        x = jnp.concatenate([xa * act(xb), xb], axis=-1)
        return self.fc2(x)


class HABX(nn.Module):
    """HATX hybrid block: ESC conv attention + CAB + SpatialGateDConvFFN."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    hab_ffn_ratio: float = 2.0
    drop_path_rate: float = 0.0
    esc_pdim: int = 16
    esc_kernel: int = 13

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.esc_attn = ESCConvAttn(self.dim, self.esc_pdim, self.esc_kernel,
                                    name="esc_attn")
        self.conv_block = CAB(self.dim, self.compress_ratio, name="conv_block")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = SpatialGateDConvFFN(self.dim, self.hab_ffn_ratio, 3,
                                       name="mlp")

    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        x = self.norm1(x)
        conv_x = self.conv_block(x)
        attn_x = self.esc_attn(x)
        if not deterministic and self.drop_path_rate > 0:
            attn_x = drop_path(attn_x, self.drop_path_rate, False,
                               self.make_rng("droppath"))
        x = shortcut + attn_x + conv_x * self.conv_scale
        mlp_x = self.mlp(self.norm2(x))
        if not deterministic and self.drop_path_rate > 0:
            mlp_x = drop_path(mlp_x, self.drop_path_rate, False,
                              self.make_rng("droppath"))
        return x + mlp_x


class OCABX(nn.Module):
    """HATX OCAB with focus bias + top-k pruning (ref: hatx_arch.py:289-465)."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0
    esc_enable: bool = False
    esc_pdim: int = 16
    esc_kernel: int = 13
    kv_topk_ratio: float = 1.0
    use_focus_bias: bool = False

    def setup(self):
        ws = self.window_size
        self.overlap_win_size = int(ws * self.overlap_ratio) + ws
        ow = self.overlap_win_size
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.q_proj = nn.Dense(self.dim, name="q_proj")
        self.kv_proj = nn.Dense(2 * self.dim, name="kv_proj")
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            ((ws + ow - 1) * (ws + ow - 1), self.num_heads))
        self.proj = nn.Dense(self.dim, name="proj")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp_0 = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_0")
        self.mlp_2 = nn.Dense(self.dim, name="mlp_2")
        self._rpi = relative_position_index_oca(ws, self.overlap_ratio)
        if self.esc_enable:
            self.esc_core = ConvAttnWrapper(self.dim, self.esc_pdim,
                                            self.esc_kernel, name="esc_core")
            self.esc_plk = self.param(
                "esc_plk", orthogonal_oihw,
                (self.esc_pdim, self.esc_pdim, self.esc_kernel, self.esc_kernel))
        if self.use_focus_bias:
            self.focus_head_0 = nn.Conv(self.dim // 4, (1, 1),
                                        name="focus_head_0")
            self.focus_head_2 = nn.Conv(1, (1, 1), name="focus_head_2")

    def __call__(self, x):
        b, h, w, c = x.shape
        ws, ow = self.window_size, self.overlap_win_size
        shortcut = x
        x = self.norm1(x)

        y = self.esc_core(x, self.esc_plk) if self.esc_enable else x
        q = self.q_proj(x)
        kv = self.kv_proj(y)

        q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)
        kv_windows = extract_overlap_windows_ceil(kv, ws, ow)
        k_windows = kv_windows[..., :c]
        v_windows = kv_windows[..., c:]

        bw = q_windows.shape[0]
        nk = ow * ow
        d = c // self.num_heads
        qh = q_windows.reshape(bw, ws * ws, self.num_heads, d).transpose(0, 2, 1, 3)
        kh = k_windows.reshape(bw, nk, self.num_heads, d).transpose(0, 2, 1, 3)
        vh = v_windows.reshape(bw, nk, self.num_heads, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", qh * (d ** -0.5), kh)

        focus_k = None
        if self.use_focus_bias:
            sal = self.focus_head_2(gelu_exact(self.focus_head_0(y)))  # (B,H,W,1)
            sal_windows = extract_overlap_windows_ceil(sal, ws, ow)    # (B*nW, Nk, 1)
            focus_k = jnp.tanh(sal_windows[..., 0])                    # (B*nW, Nk)
            attn = attn + focus_k[:, None, None, :]

        if self.kv_topk_ratio < 1.0:
            k_keep = max(1, int(self.kv_topk_ratio * nk))
            if focus_k is None:
                key_score = jnp.linalg.norm(k_windows, axis=-1)        # (B*nW, Nk)
            else:
                key_score = focus_k
            # keep scores >= k-th largest (jax.lax.top_k threshold — same
            # keep-set as the reference's scatter mask modulo ties)
            thresh = lax.top_k(key_score, k_keep)[0][:, -1:]
            keep = key_score >= thresh
            attn = jnp.where(keep[:, None, None, :], attn, -1e4)

        bias = self.relative_position_bias_table[self._rpi.reshape(-1)]
        bias = bias.reshape(ws * ws, nk, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(bw, ws * ws, c)

        x = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        x = self.proj(x) + shortcut
        return x + self.mlp_2(gelu_exact(self.mlp_0(self.norm2(x))))


class AttenBlocksX(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float = 2.0
    hab_ffn_ratio: float = 2.0
    drop_path_rates: Sequence[float] = ()
    esc_pdim: int = 16
    esc_kernel: int = 13
    ocab_esc_enable: bool = False
    ocab_esc_pdim: int = 16
    ocab_esc_kernel: int = 13
    kv_topk_ratio: float = 1.0
    use_focus_bias: bool = False

    def setup(self):
        rates = list(self.drop_path_rates) or [0.0] * self.depth
        self.blocks = [
            HABX(dim=self.dim, num_heads=self.num_heads,
                 window_size=self.window_size,
                 shift_size=0 if i % 2 == 0 else self.window_size // 2,
                 compress_ratio=self.compress_ratio,
                 squeeze_factor=self.squeeze_factor,
                 conv_scale=self.conv_scale,
                 hab_ffn_ratio=self.hab_ffn_ratio,
                 drop_path_rate=rates[i], esc_pdim=self.esc_pdim,
                 esc_kernel=self.esc_kernel, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.overlap_attn = OCABX(
            dim=self.dim, window_size=self.window_size,
            overlap_ratio=self.overlap_ratio, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, esc_enable=self.ocab_esc_enable,
            esc_pdim=self.ocab_esc_pdim, esc_kernel=self.ocab_esc_kernel,
            kv_topk_ratio=self.kv_topk_ratio,
            use_focus_bias=self.use_focus_bias, name="overlap_attn")

    def __call__(self, x, deterministic: bool = True):
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.overlap_attn(x)


class RHAGX(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float = 2.0
    hab_ffn_ratio: float = 2.0
    drop_path_rates: Sequence[float] = ()
    resi_connection: str = "1conv"
    esc_pdim: int = 16
    esc_kernel: int = 13
    ocab_esc_enable: bool = False
    ocab_esc_pdim: int = 16
    ocab_esc_kernel: int = 13
    kv_topk_ratio: float = 1.0
    use_focus_bias: bool = False

    def setup(self):
        self.residual_group = AttenBlocksX(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, compress_ratio=self.compress_ratio,
            squeeze_factor=self.squeeze_factor, conv_scale=self.conv_scale,
            overlap_ratio=self.overlap_ratio, mlp_ratio=self.mlp_ratio,
            hab_ffn_ratio=self.hab_ffn_ratio,
            drop_path_rates=self.drop_path_rates, esc_pdim=self.esc_pdim,
            esc_kernel=self.esc_kernel,
            ocab_esc_enable=self.ocab_esc_enable,
            ocab_esc_pdim=self.ocab_esc_pdim,
            ocab_esc_kernel=self.ocab_esc_kernel,
            kv_topk_ratio=self.kv_topk_ratio,
            use_focus_bias=self.use_focus_bias, name="residual_group")
        if self.resi_connection == "1conv":
            self.conv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv")
        else:
            self.conv = None

    def __call__(self, x, deterministic: bool = True):
        y = self.residual_group(x, deterministic=deterministic)
        if self.conv is not None:
            y = self.conv(y)
        return y + x


@ARCH_REGISTRY.register()
class HATX(nn.Module):
    """HATX network (ref: hatx_arch.py:707-974)."""

    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    hab_ffn_ratio: float = 2.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    esc_pdim: int = 16
    esc_kernel: int = 13
    ocab_esc_enable: bool = False
    ocab_esc_pdim: int = 16
    ocab_esc_kernel: int = 13
    kv_topk_ratio: float = 1.0
    use_focus_bias: bool = False
    # gradient checkpointing per RHAG (ref honors this: hatx_arch.py:546-551)
    use_checkpoint: bool = False

    def setup(self):
        import math

        num_feat = 64
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbed(self.patch_norm, name="patch_embed")
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        rhag_cls = (nn.remat(RHAGX, static_argnums=(2,))
                    if self.use_checkpoint else RHAGX)
        layers = []
        start = 0
        for i, depth in enumerate(self.depths):
            layers.append(rhag_cls(
                dim=self.embed_dim, depth=depth, num_heads=self.num_heads[i],
                window_size=self.window_size,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale, overlap_ratio=self.overlap_ratio,
                mlp_ratio=self.mlp_ratio, hab_ffn_ratio=self.hab_ffn_ratio,
                drop_path_rates=tuple(dpr[start:start + depth]),
                resi_connection=self.resi_connection,
                esc_pdim=self.esc_pdim, esc_kernel=self.esc_kernel,
                ocab_esc_enable=self.ocab_esc_enable,
                ocab_esc_pdim=self.ocab_esc_pdim,
                ocab_esc_kernel=self.ocab_esc_kernel,
                kv_topk_ratio=self.kv_topk_ratio,
                use_focus_bias=self.use_focus_bias, name=f"layers_{i}"))
            start += depth
        self.layers = layers
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm")
        self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       name="conv_after_body")
        self.conv_before_upsample_0 = nn.Conv(num_feat, (3, 3),
                                              padding=[(1, 1), (1, 1)],
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
        else:
            raise ValueError(f"upscale {self.upscale} unsupported")
        self.conv_last = nn.Conv(self.in_chans, (3, 3),
                                 padding=[(1, 1), (1, 1)], name="conv_last")

    def __call__(self, x, deterministic: bool = True):
        x = MeanShift.normalize(x, self.img_range)
        feat = self.conv_first(x)
        body = self.patch_embed(feat)
        for layer in self.layers:
            # positional: static_argnums=(2,) on the remat-lifted RHAG
            body = layer(body, deterministic)
        body = self.norm(body)
        feat = self.conv_after_body(body) + feat
        y = nn.leaky_relu(self.conv_before_upsample_0(feat), negative_slope=0.01)
        for conv, r in zip(self.upsample_convs, self.upsample_factors):
            y = pixel_shuffle(conv(y), r)
        y = self.conv_last(y)
        return MeanShift.denormalize(y, self.img_range)
