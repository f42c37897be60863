"""ESC — Emulating Self-attention with Convolution (flax.linen, NHWC).

TPU-native rebuild of the reference ESC architecture
(ref: HAT/hat/archs/esc_arch.py, byte-identical to HAT/ESC/esc/archs/
esc_arch.py). Key structural choices vs the reference:

- The per-sample dynamic depthwise 3x3 conv (reference uses a cuDNN
  batch-into-groups trick, esc_arch.py:110-116) is a 9-tap
  shift-and-weight einsum (ops/conv.py) — pure VPU work XLA fuses.
- Window attention uses the XLA reference path (ops/attention.py) with the
  RPB gathered to a dense (heads, N, N) bias at trace time — the analog of
  the reference's Naive/SDPA path; the Pallas fused kernel replaces it on
  the hot path (ops/pallas_attention.py) with identical semantics to the
  FlexAttention backend (esc_arch.py:234-235).
- Train and eval share one code path: the reference's training split-concat
  vs eval in-place branches (esc_arch.py:104-130) compute the same values.

Weight-name convention: submodule names mirror the torch tree with
sequential indices flattened (`dwc_proj.1` -> `dwc_proj_1`), making
checkpoint conversion a mechanical rename (convert/torch_import.py).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.attention import window_msa
from super_resolution_tpu.ops.conv import (conv2d_nhwc, conv2d_nhwc_s2d,
                                           dynamic_depthwise_conv3x3)
from super_resolution_tpu.ops.windowing import window_partition, window_reverse
from super_resolution_tpu.models.arch_util import gelu_exact
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def geo_ensemble(k):
    """8-fold flip/rotation average of a conv kernel (OIHW), the
    feature-level geometric re-parameterization of the large kernel
    (ref: esc_arch.py:289-298)."""
    k_hflip = jnp.flip(k, 3)
    k_vflip = jnp.flip(k, 2)
    k_hvflip = jnp.flip(k, (2, 3))
    k_rot90 = jnp.rot90(k, -1, (2, 3))
    k_rot90_hflip = jnp.flip(k_rot90, 3)
    k_rot90_vflip = jnp.flip(k_rot90, 2)
    k_rot90_hvflip = jnp.flip(k_rot90, (2, 3))
    return (k + k_hflip + k_vflip + k_hvflip
            + k_rot90 + k_rot90_hflip + k_rot90_vflip + k_rot90_hvflip) / 8.0


def esc_rpe_index(window_size: int) -> np.ndarray:
    """(N, N) relative-position index for ESC's transposed-Swin RPE table
    (ref: esc_arch.py:186-203)."""
    ws = window_size
    idx = np.arange(ws * ws)
    qh, qw = idx // ws, idx % ws
    rel_h = qh[None, :] - qh[:, None] + ws - 1
    rel_w = qw[None, :] - qw[:, None] + ws - 1
    return (rel_h * (2 * ws - 1) + rel_w).astype(np.int32)


def orthogonal_oihw(key, shape, dtype=jnp.float32):
    """torch.nn.init.orthogonal_ equivalent for an OIHW conv kernel: the
    (O, I*kh*kw) flattening is orthogonalized (ref: esc_arch.py:321-323)."""
    import jax

    o = shape[0]
    n = int(np.prod(shape[1:]))
    q = jax.nn.initializers.orthogonal()(key, (max(o, n), min(o, n)), dtype)
    if o < n:
        q = q.T
    return q[:o, :n].reshape(shape)


class ConvolutionalAttention(nn.Module):
    """Static 13x13 partial large-kernel conv + per-sample dynamic 3x3
    depthwise conv on the first `pdim` channels (ref: esc_arch.py:89-133)."""

    pdim: int
    kernel_size: int = 13

    def setup(self):
        self.dwc_proj_1 = nn.Dense(self.pdim // 2, name="dwc_proj_1")
        self.dwc_proj_3 = nn.Dense(
            self.pdim * 9, name="dwc_proj_3",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)

    def attended(self, x, lk_filter):
        """The processed first-pdim-channels slab only (no concat)."""
        x1 = x[..., :self.pdim]
        # dynamic kernel head: GAP -> 1x1 -> GELU -> 1x1, zero-initialized
        g = jnp.mean(x1, axis=(1, 2))                       # (B, pdim)
        dk = self.dwc_proj_3(gelu_exact(self.dwc_proj_1(g)))  # (B, pdim*9)
        dk = dk.reshape(-1, self.pdim, 3, 3).transpose(0, 2, 3, 1)  # (B,3,3,pdim)
        dyn = dynamic_depthwise_conv3x3(x1, dk)
        # space-to-depth route: a pdim(16)-lane 13x13 conv starves the MXU
        # (measured ~2.5% FLOP efficiency on v5e); the transformed
        # 256-channel 6x6 conv is a standard well-tiled conv (ops/conv.py)
        stat = conv2d_nhwc_s2d(x1, lk_filter)
        return stat + dyn

    def __call__(self, x, lk_filter):
        return jnp.concatenate(
            [self.attended(x, lk_filter), x[..., self.pdim:]], axis=-1)


class SplitPointwise(nn.Module):
    """1x1 conv over a virtual concat([y1, x2]) without materializing it.

    Parameter tree is identical to ``nn.Conv(dim, (1, 1))`` (kernel
    (1, 1, Cin, dim), bias (dim,)) so checkpoints are unaffected; the
    kernel is split at `split` and applied to the two pieces separately —
    on the HAT hot path this avoids a full write+read of the (B,H,W,C)
    concat per block (C=180 at flagship dims: ~0.6 GB HBM per tile batch).
    """

    dim: int
    split: int
    in_features: int

    @nn.compact
    def __call__(self, y1, x2):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        k1 = kernel[0, 0, :self.split]
        k2 = kernel[0, 0, self.split:]
        return (jnp.einsum("bhwc,cd->bhwd", y1, k1.astype(y1.dtype))
                + jnp.einsum("bhwc,cd->bhwd", x2, k2.astype(x2.dtype))
                + bias.astype(y1.dtype))


class ConvAttnWrapper(nn.Module):
    """ConvolutionalAttention + 1x1 aggregation (ref: esc_arch.py:136-145).

    The aggregation consumes the attended pdim slab and the passthrough
    channels separately (SplitPointwise) — same math as
    ``aggr(concat([attended, rest]))`` with the concat never built."""

    dim: int
    pdim: int
    kernel_size: int = 13

    def setup(self):
        self.plk = ConvolutionalAttention(self.pdim, self.kernel_size, name="plk")
        self.aggr = SplitPointwise(self.dim, self.pdim, self.dim, name="aggr")

    def __call__(self, x, lk_filter):
        y1 = self.plk.attended(x, lk_filter)
        return self.aggr(y1, x[..., self.pdim:])


class ConvFFN(nn.Module):
    """1x1 expand -> GELU -> depthwise k -> GELU + residual -> 1x1 aggregate
    (ref: esc_arch.py:148-159)."""

    dim: int
    kernel_size: int
    exp_ratio: float

    def setup(self):
        hidden = int(self.dim * self.exp_ratio)
        pad = self.kernel_size // 2
        self.proj = nn.Conv(hidden, (1, 1), name="proj")
        self.dwc = nn.Conv(hidden, (self.kernel_size, self.kernel_size),
                           padding=[(pad, pad), (pad, pad)],
                           feature_group_count=hidden, name="dwc")
        self.aggr = nn.Conv(self.dim, (1, 1), name="aggr")

    def __call__(self, x):
        x = gelu_exact(self.proj(x))
        x = gelu_exact(self.dwc(x)) + x
        return self.aggr(x)


class WindowAttentionESC(nn.Module):
    """Window MSA on NHWC with reflect pad-to-window and transposed-Swin RPE
    (ref: esc_arch.py:162-253). Equivalent to the reference's Naive/Flex/
    SDPA backends; the Pallas kernel slots in behind the same interface."""

    dim: int
    window_size: int
    num_heads: int
    use_pallas: bool = False

    def setup(self):
        self.to_qkv = nn.Conv(self.dim * 3, (1, 1), name="to_qkv")
        self.to_out = nn.Conv(self.dim, (1, 1), name="to_out")
        self.relative_position_bias = self.param(
            "relative_position_bias",
            lambda key, shape: 0.001 * jax.random.normal(key, shape,
                                                         jnp.float32),
            (self.num_heads, (2 * self.window_size - 1) ** 2))
        self._rpe_idx = esc_rpe_index(self.window_size)

    def __call__(self, x):
        b, h, w, c = x.shape
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        hp, wp = x.shape[1], x.shape[2]
        bias = self.relative_position_bias[:, self._rpe_idx]   # (heads, N, N)
        from super_resolution_tpu.ops.attention import fused_route_enabled as _pallas_attention_enabled
        pallas_on = self.use_pallas or _pallas_attention_enabled()
        from super_resolution_tpu.ops.pallas_attention import \
            msa_block_supported
        if (pallas_on and ws % 8 == 0 and not self.is_initializing()
                and msa_block_supported(ws, x.dtype)):
            # MSA block megakernel straight on the C-channel image: qkv
            # projection, windowing, head split, attention, reverse and the
            # output projection all in VMEM (the to_qkv/to_out 1x1 convs
            # are matmuls — their kernels reshape to (C, 3C)/(C, C))
            from super_resolution_tpu.ops.pallas_attention import \
                fused_msa_block_ad
            n = ws * ws
            d = c // self.num_heads
            qkv_p = self.to_qkv.variables["params"]
            out_p = self.to_out.variables["params"]
            out = fused_msa_block_ad(
                x, qkv_p["kernel"].reshape(c, 3 * c), qkv_p["bias"],
                out_p["kernel"].reshape(c, c), out_p["bias"],
                bias.astype(jnp.float32),
                jnp.zeros((1, n, n), jnp.float32), self.num_heads, ws,
                d ** -0.5)
            return out[:, :h, :w, :]
        else:
            qkv = self.to_qkv(x)                               # (B,Hp,Wp,3C)
            from super_resolution_tpu.ops.pallas_attention import (
                attention_window_supported, flash_route_enabled,
                msa_flash_supported, msa_qtile_supported,
                qtile_route_enabled)
            if (pallas_on and flash_route_enabled()
                    and not self.is_initializing() and ws % 8 == 0
                    and hp % ws == 0 and wp % ws == 0
                    and not attention_window_supported(ws * ws)
                    and msa_flash_supported(ws, c, self.num_heads,
                                            nwx=wp // ws)):
                # large-window flash route (r4 ask-8 experiment): online-
                # softmax kv chunking, bias chunk reused across a window
                # row, full-window M per program. Opt-in (SR_TPU_FLASH=1)
                # until the hardware A/B (scripts/bench_esc.py ESC_XL=1)
                # decides the default.
                from super_resolution_tpu.ops.pallas_attention import \
                    msa_flash_attention_ad
                out = msa_flash_attention_ad(
                    qkv, bias.astype(jnp.float32), self.num_heads, ws,
                    (c // self.num_heads) ** -0.5)
                return self.to_out(out[:, :h, :w, :])
            if (pallas_on and qtile_route_enabled()
                    and not self.is_initializing() and ws % 8 == 0
                    and hp % ws == 0 and wp % ws == 0
                    and not attention_window_supported(ws * ws)
                    and msa_qtile_supported(ws, c, self.num_heads)):
                # large-window route (ESC-XL's native ws 48): whole-window
                # kernels exceed scoped VMEM, so tile the query dim — each
                # program softmaxes Tq exact rows against the full key
                # range (k/v of one window are only N x d). OPT-IN ONLY:
                # measured slower than slabbed XLA at ESC-XL's d=16 (see
                # qtile_route_enabled for the data)
                from super_resolution_tpu.ops.pallas_attention import \
                    msa_qtile_attention_ad
                out = msa_qtile_attention_ad(
                    qkv, bias.astype(jnp.float32), self.num_heads, ws,
                    (c // self.num_heads) ** -0.5)
                return self.to_out(out[:, :h, :w, :])
            wins = window_partition(qkv, ws).reshape(-1, ws * ws, 3, c)
            wins = wins.transpose(2, 0, 1, 3)                  # (3, B*nW, N, C)
            if (pallas_on and not self.is_initializing()
                    and attention_window_supported(ws * ws)):
                from super_resolution_tpu.ops.pallas_attention import \
                    window_attention_fused
                out = window_attention_fused(wins, self.num_heads, bias)
            else:
                out = window_msa(wins, self.num_heads, bias)
            out = window_reverse(out.reshape(-1, ws, ws, c), ws, hp, wp)
        return self.to_out(out[:, :h, :w, :])


class Block(nn.Module):
    """ESC block: ConvFFN proj -> window attention -> conv_blocks x
    (ConvFFN -> ConvAttn) -> 3x3 conv out, all residual
    (ref: esc_arch.py:256-284)."""

    dim: int
    pdim: int
    conv_blocks: int
    kernel_size: int
    window_size: int
    num_heads: int
    exp_ratio: float
    use_ln: bool = False
    use_pallas_attn: bool = False

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, name=name)
        self.ln_proj = ln("ln_proj")
        self.proj = ConvFFN(self.dim, 3, 2, name="proj")
        self.ln_attn = ln("ln_attn")
        self.attn = WindowAttentionESC(self.dim, self.window_size,
                                       self.num_heads,
                                       use_pallas=self.use_pallas_attn,
                                       name="attn")
        if self.use_ln:
            self.lns = [ln(f"lns_{i}") for i in range(self.conv_blocks)]
        else:
            self.lns = [None] * self.conv_blocks
        self.pconvs = [ConvAttnWrapper(self.dim, self.pdim, self.kernel_size,
                                       name=f"pconvs_{i}")
                       for i in range(self.conv_blocks)]
        self.convffns = [ConvFFN(self.dim, 3, self.exp_ratio, name=f"convffns_{i}")
                         for i in range(self.conv_blocks)]
        self.ln_out = ln("ln_out")
        self.conv_out = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv_out")

    def __call__(self, x, plk_filter):
        skip = x
        x = self.proj(self.ln_proj(x))
        x = x + self.attn(self.ln_attn(x))
        for ln, pconv, convffn in zip(self.lns, self.pconvs, self.convffns):
            y = x if ln is None else ln(x)
            x = x + pconv(convffn(y), plk_filter)
        x = self.conv_out(self.ln_out(x))
        return x + skip


@ARCH_REGISTRY.register()
class ESC(nn.Module):
    """ESC super-resolution network (ref: esc_arch.py:301-386).

    forward: 3x3 proj -> n_blocks x Block (shared geo-ensembled 13x13 PLK
    filter) -> 3x3 last + skip -> to_img conv -> pixel shuffle with
    input-replication residual (repeat_interleave + shuffle = nearest-
    neighbor upsample of the input added to the prediction).
    """

    dim: int
    pdim: int
    kernel_size: int
    n_blocks: int
    conv_blocks: int
    window_size: int
    num_heads: int
    upscaling_factor: int
    exp_ratio: float = 2.0
    use_ln: bool = False
    attn_type: str = "xla"  # 'xla' | 'pallas' (backend, not a semantics switch)
    deployment: bool = False  # True once the geo-ensemble is folded offline

    def setup(self):
        self.plk_filter = self.param(
            "plk_filter", orthogonal_oihw,
            (self.pdim, self.pdim, self.kernel_size, self.kernel_size))
        self.proj = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], name="proj")
        self.blocks = [
            Block(self.dim, self.pdim, self.conv_blocks, self.kernel_size,
                  self.window_size, self.num_heads, self.exp_ratio,
                  use_ln=self.use_ln,
                  use_pallas_attn=(self.attn_type == "pallas"),
                  name=f"blocks_{i}")
            for i in range(self.n_blocks)
        ]
        self.last = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], name="last")
        self.to_img = nn.Conv(3 * self.upscaling_factor ** 2, (3, 3),
                              padding=[(1, 1), (1, 1)], name="to_img")

    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1] -> (B, H*s, W*s, 3)."""
        from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle

        s = self.upscaling_factor
        feat = self.proj(x)
        skip = feat
        plk = self.plk_filter if self.deployment else geo_ensemble(self.plk_filter)
        for block in self.blocks:
            feat = block(feat, plk)
        feat = self.last(feat) + skip
        out = self.to_img(feat) + jnp.repeat(x, s * s, axis=-1)
        return pixel_shuffle(out, s)
