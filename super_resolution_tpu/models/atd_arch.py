"""ATD — Adaptive Token Dictionary SR (flax.linen, NHWC).

Rebuild of the reference ATD (ref: hat/archs/atd_arch.py). Each layer
combines three attentions over a shared qkv projection:

- (S)W-MSA with RPB (WindowAttention, :99-170);
- ATD-CA: cross-attention of all pixels against a learned per-block token
  dictionary with normalized q/k and a learnable temperature (:174-246);
- AC-MSA: pixels are categorized by their dictionary similarity argmax,
  sorted into fixed-size groups, and attend within groups (:249-335) —
  argsort/gather replaces the reference's sort+shuffle tensors;

followed by a ConvFFN and, except on the last layer of a block, an
adaptive refinement of the token dictionary from an instance-normalized
similarity map (:480-495).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import gelu_exact
from super_resolution_tpu.models.hat_classic_arch import PatchEmbedNorm
from super_resolution_tpu.ops.attention import (attention_with_bias, attention_with_bias_auto,
                                                relative_position_index_sa,
                                                shift_attn_mask_jnp)
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.ops.windowing import window_partition, window_reverse
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5


class ConvFFNATD(nn.Module):
    """fc1 -> GELU -> (+ k x k depthwise GELU) -> fc2 (ref: :35-66)."""

    hidden: int
    out: int
    kernel_size: int = 5

    def setup(self):
        k = self.kernel_size
        self.fc1 = nn.Dense(self.hidden, name="fc1")

        class _DW(nn.Module):
            hidden: int
            k: int

            def setup(self):
                p = (self.k - 1) // 2
                self.conv = nn.Conv(self.hidden, (self.k, self.k),
                                    padding=[(p, p), (p, p)],
                                    feature_group_count=self.hidden,
                                    name="depthwise_conv_0")

            def __call__(self, x):
                return gelu_exact(self.conv(x))

        self.dwconv = _DW(self.hidden, k, name="dwconv")
        self.fc2 = nn.Dense(self.out, name="fc2")

    def __call__(self, x):
        x = gelu_exact(self.fc1(x))
        x = x + self.dwconv(x)
        return self.fc2(x)


class WindowAttentionATD(nn.Module):
    """W-MSA over pre-projected qkv windows (ref: :99-170)."""

    dim: int
    window_size: int
    num_heads: int

    def setup(self):
        ws = self.window_size
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        self.proj = nn.Dense(self.dim, name="proj")
        self._rpi = relative_position_index_sa(ws)

    def __call__(self, qkv_windows, mask=None):
        bw, n, c3 = qkv_windows.shape
        c = c3 // 3
        h = self.num_heads
        d = c // h
        qkv = qkv_windows.reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        bias = self.relative_position_bias_table[self._rpi.reshape(-1)]
        bias = bias.reshape(n, n, h).transpose(2, 0, 1)
        if mask is not None:
            nw = mask.shape[0]
            bias = bias[None, None] + mask[None, :, None]
            q = q.reshape(bw // nw, nw, h, n, d)
            k = k.reshape(bw // nw, nw, h, n, d)
            v = v.reshape(bw // nw, nw, h, n, d)
            out = attention_with_bias(q, k, v, bias, scale=d ** -0.5)
            out = out.reshape(bw, h, n, d)
        else:
            out = attention_with_bias_auto(q, k, v, bias, scale=d ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return self.proj(out)


class ATD_CA(nn.Module):
    """Token-dictionary cross attention (ref: :174-246)."""

    dim: int
    num_tokens: int = 64
    reducted_dim: int = 10

    def setup(self):
        self.wq = nn.Dense(self.reducted_dim, name="wq")
        self.wk = nn.Dense(self.reducted_dim, name="wk")
        self.wv = nn.Dense(self.dim, name="wv")
        self.scale = self.param("scale",
                                nn.initializers.constant(0.5),
                                (self.num_tokens,))

    def __call__(self, x, td):
        q = self.wq(x)
        k = self.wk(td)
        v = self.wv(td)

        def l2norm(t):
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)

        attn = jnp.einsum("bnr,bmr->bnm", l2norm(q), l2norm(k))
        s = jnp.clip(self.scale, 0, 1)
        attn = attn * (1 + s * np.log(self.num_tokens))
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bnm,bmc->bnc", attn, v), attn


class AC_MSA(nn.Module):
    """Adaptive category MSA: sort tokens by dictionary-similarity argmax
    into fixed-size groups, attend within groups (ref: :249-335)."""

    dim: int
    num_tokens: int = 64
    num_heads: int = 4
    category_size: int = 128

    def setup(self):
        self.proj = nn.Dense(self.dim, name="proj")
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.log(10.0) * jnp.ones(shape), (1, 1))

    def __call__(self, qkv, sim):
        b, n, c3 = qkv.shape
        c = c3 // 3
        gs = min(n, self.category_size)
        ng = (n + gs - 1) // gs
        pad_n = ng * gs - n

        tk_id = jnp.argmax(sim, axis=-1)
        order = jnp.argsort(tk_id, axis=-1, stable=True)
        reverse = jnp.argsort(order, axis=-1)

        bidx = jnp.arange(b)[:, None]
        shuffled = qkv[bidx, order]                           # (b, n, c3)
        tail = jnp.flip(shuffled[:, n - pad_n:n, :], axis=1) if pad_n else \
            shuffled[:, :0]
        padded = jnp.concatenate([shuffled, tail], axis=1)

        h = self.num_heads
        d = c // h
        y = padded.reshape(b, ng, gs, 3, h, d).transpose(3, 0, 1, 4, 2, 5)
        q, k, v = y[0], y[1], y[2]                            # (b, ng, h, gs, d)

        attn = jnp.einsum("bghld,bghmd->bghlm", q, k)
        scale = jnp.exp(jnp.clip(self.logit_scale, max=np.log(1.0 / 0.01)))
        attn = jax.nn.softmax(attn * scale, axis=-1)
        out = jnp.einsum("bghlm,bghmd->bghld", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, ng * gs, c)[:, :n]

        out = out[bidx, reverse]
        return self.proj(out)


class InstanceNorm1dTokens(nn.Module):
    """torch InstanceNorm1d(num_tokens, affine=True) over (b, m, n)."""

    num_tokens: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.num_tokens,))
        b = self.param("bias", nn.initializers.zeros, (self.num_tokens,))
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        y = (x - mu) / jnp.sqrt(var + 1e-5)
        return y * w[None, :, None] + b[None, :, None]


class ATDTransformerLayer(nn.Module):
    """One ATD layer: shared qkv -> {SW-MSA, ATD-CA, AC-MSA} + ConvFFN +
    token-dictionary refinement (ref: :336-495)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    category_size: int
    num_tokens: int
    reducted_dim: int
    convffn_kernel_size: int
    mlp_ratio: float
    is_last: bool = False

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        if not self.is_last:
            self.norm3 = InstanceNorm1dTokens(self.num_tokens, name="norm3")
            self.sigma = self.param("sigma", nn.initializers.zeros,
                                    (self.num_tokens, 1))
        self.wqkv = nn.Dense(3 * self.dim, name="wqkv")
        self.attn_win = WindowAttentionATD(self.dim, self.window_size,
                                           self.num_heads, name="attn_win")
        self.attn_atd = ATD_CA(self.dim, self.num_tokens, self.reducted_dim,
                               name="attn_atd")
        self.attn_aca = AC_MSA(self.dim, self.num_tokens, self.num_heads,
                               self.category_size, name="attn_aca")
        self.convffn = ConvFFNATD(int(self.dim * self.mlp_ratio), self.dim,
                                  self.convffn_kernel_size, name="convffn")

    def __call__(self, x, td):
        b, h, w, c = x.shape
        n = h * w
        ws, ss = self.window_size, self.shift_size
        shortcut = x
        xn = self.norm1(x)
        qkv = self.wqkv(xn)                                  # (b, h, w, 3c)

        x_tok = xn.reshape(b, n, c)
        x_atd, sim_atd = self.attn_atd(x_tok, td)
        x_aca = self.attn_aca(qkv.reshape(b, n, 3 * c), sim_atd)

        if ss > 0:
            shifted_qkv = jnp.roll(qkv, (-ss, -ss), axis=(1, 2))
            mask = shift_attn_mask_jnp(h, w, ws, ss)
        else:
            shifted_qkv, mask = qkv, None
        from super_resolution_tpu.ops.attention import \
            fused_route_enabled as _pallas_attention_enabled
        from super_resolution_tpu.ops.pallas_attention import \
            attention_window_supported
        if (_pallas_attention_enabled() and not self.is_initializing()
                and ws % 8 == 0 and h % ws == 0 and w % ws == 0
                and attention_window_supported(ws * ws)):
            # (S)W-MSA megakernel on the shared qkv image (the qkv stays
            # materialized because AC-MSA consumes it too; windowing,
            # head split, attention and reverse still fold into VMEM —
            # ops/pallas_attention.py::fused_msa_attention)
            from super_resolution_tpu.ops.pallas_attention import \
                fused_msa_attention_ad
            at = self.attn_win
            nn_ = ws * ws
            d = c // self.num_heads
            bias = at.relative_position_bias_table[at._rpi.reshape(-1)]
            bias = bias.reshape(nn_, nn_, self.num_heads).transpose(2, 0, 1)
            mask_arr = (mask.astype(jnp.float32) if mask is not None
                        else jnp.zeros((1, nn_, nn_), jnp.float32))
            out_img = fused_msa_attention_ad(shifted_qkv, bias, mask_arr,
                                             self.num_heads, ws, d ** -0.5)
            shifted = at.proj(out_img)
        else:
            qkv_windows = window_partition(shifted_qkv, ws).reshape(
                -1, ws * ws, 3 * c)
            attn_windows = self.attn_win(qkv_windows, mask=mask)
            shifted = window_reverse(attn_windows.reshape(-1, ws, ws, c),
                                     ws, h, w)
        x_win = jnp.roll(shifted, (ss, ss), axis=(1, 2)) if ss > 0 else shifted

        x = shortcut + x_win + (x_atd + x_aca).reshape(b, h, w, c)
        x = x + self.convffn(self.norm2(x))

        if not self.is_last:
            mask_soft = jax.nn.softmax(
                self.norm3(sim_atd.transpose(0, 2, 1)), axis=-1)  # (b, m, n)
            s = nn.sigmoid(self.sigma)
            td = s * td + (1 - s) * jnp.einsum(
                "bmn,bnc->bmc", mask_soft, x.reshape(b, n, c))
        return x, td


class BasicBlockATD(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    category_size: int
    num_tokens: int
    reducted_dim: int
    convffn_kernel_size: int
    mlp_ratio: float

    def setup(self):
        self.layers = [
            ATDTransformerLayer(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                category_size=self.category_size,
                num_tokens=self.num_tokens, reducted_dim=self.reducted_dim,
                convffn_kernel_size=self.convffn_kernel_size,
                mlp_ratio=self.mlp_ratio, is_last=(i == self.depth - 1),
                name=f"layers_{i}")
            for i in range(self.depth)
        ]
        self.td = self.param("td", nn.initializers.normal(1.0),
                             (self.num_tokens, self.dim))

    def __call__(self, x):
        b = x.shape[0]
        td = jnp.broadcast_to(self.td[None], (b,) + self.td.shape)
        for layer in self.layers:
            x, td = layer(x, td)
        return x


class ATDB(nn.Module):
    """residual_group + conv + skip (ref: :657-735)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    category_size: int
    num_tokens: int
    reducted_dim: int
    convffn_kernel_size: int
    mlp_ratio: float
    resi_connection: str = "1conv"

    def setup(self):
        self.residual_group = BasicBlockATD(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, category_size=self.category_size,
            num_tokens=self.num_tokens, reducted_dim=self.reducted_dim,
            convffn_kernel_size=self.convffn_kernel_size,
            mlp_ratio=self.mlp_ratio, name="residual_group")
        if self.resi_connection == "1conv":
            self.conv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv")
        else:
            raise NotImplementedError(self.resi_connection)

    def __call__(self, x):
        return self.conv(self.residual_group(x)) + x


@ARCH_REGISTRY.register()
class ATD(nn.Module):
    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 90
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 16
    category_size: int = 256
    num_tokens: int = 64
    reducted_dim: int = 20
    convffn_kernel_size: int = 5
    mlp_ratio: float = 2.0
    patch_norm: bool = True
    upscale: int = 4
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    # gradient checkpointing: remat per ATDB (same recipe as HAT)
    use_checkpoint: bool = False

    def setup(self):
        import math

        num_feat = 64
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(self.patch_norm, name="patch_embed")
        atdb_cls = nn.remat(ATDB) if self.use_checkpoint else ATDB
        self.layers = [
            atdb_cls(dim=self.embed_dim, depth=self.depths[i],
                 num_heads=self.num_heads[i], window_size=self.window_size,
                 category_size=self.category_size,
                 num_tokens=self.num_tokens, reducted_dim=self.reducted_dim,
                 convffn_kernel_size=self.convffn_kernel_size,
                 mlp_ratio=self.mlp_ratio,
                 resi_connection=self.resi_connection, name=f"layers_{i}")
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
            raise NotImplementedError(self.upsampler)

    def head(self, x):
        """Everything ahead of the ATDB stack — the pipeline-stage split
        (parallel/pipeline.py): each ATDB carries its own token dictionary
        param, so the stack is a clean chain of self-contained,
        shape-preserving stages. Requires window-multiple input; see
        SwinIR.head for why."""
        if x.shape[1] % self.window_size or x.shape[2] % self.window_size:
            raise ValueError(
                "pipelined ATD needs window-multiple input; pad like "
                "HATModel.pre_process / the tile engine does")
        from super_resolution_tpu.models.arch_util import MeanShift

        x = MeanShift.normalize(x, self.img_range)
        feat = self.conv_first(x)
        return feat, self.patch_embed(feat)

    def tail(self, body, feat):
        """Post-body norm/conv + global residual + reconstruction."""
        from super_resolution_tpu.models.arch_util import MeanShift

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

    def __call__(self, x, deterministic: bool = True):
        h_ori, w_ori = x.shape[1], x.shape[2]
        mod = self.window_size
        pad_h = (mod - h_ori % mod) % mod
        pad_w = (mod - w_ori % mod) % mod
        if pad_h or pad_w:
            # symmetric (edge-repeating) padding (ref: :1115-1118)
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                        mode="symmetric")
        from super_resolution_tpu.models.arch_util import MeanShift

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
        out = MeanShift.denormalize(out, self.img_range)
        return out[:, :h_ori * self.upscale, :w_ori * self.upscale, :]
