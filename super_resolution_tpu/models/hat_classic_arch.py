"""Classic HAT — the structure official HAT checkpoints expect.

The fork's HAT (models/hat_arch.py) replaced window self-attention with ESC
convolution, so official XPixelGroup/HAT weights (which the reference's own
test configs point at, e.g. options/test/HAT_SRx4.yml:70 with
strict_load_g: true) cannot load into it (SURVEY.md §0). This module is the
classic structure those weights describe:

- HAB = (S)W-MSA with relative position bias + shift mask (the pattern
  preserved verbatim in the reference's vendored
  basicsr/archs/swinir_arch.py:95-192) in parallel with a classic CAB
  (conv-compress/GELU/conv-expand + squeeze channel attention), then MLP.
- OCAB = single fused qkv projection; Q from ws-windows, K/V from
  overlapping windows (fork OCAB splits q/kv projections; classic fuses).

NHWC end-to-end; shift masks and RPB index tables are numpy constants baked
at trace time per static input shape (no per-forward mask computation).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import MeanShift, drop_path, gelu_exact
from super_resolution_tpu.ops.attention import (attention_with_bias, attention_with_bias_auto,
                                                relative_position_index_oca,
                                                relative_position_index_sa,
                                                shift_attn_mask_jnp)
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.ops.streamed_tail import streamed_rows
from super_resolution_tpu.ops.windowing import (extract_overlap_windows,
                                                window_partition, window_reverse)
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5


class ChannelAttention(nn.Module):
    """Squeeze channel attention: GAP -> 1x1 down -> ReLU -> 1x1 up -> sigmoid.
    Child names mirror the torch Sequential ('attention.{1,3}')."""

    num_feat: int
    squeeze_factor: int = 16

    def setup(self):
        mid = self.num_feat // self.squeeze_factor
        self.attention_1 = nn.Conv(mid, (1, 1), name="attention_1")
        self.attention_3 = nn.Conv(self.num_feat, (1, 1), name="attention_3")

    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.relu(self.attention_1(y))
        y = nn.sigmoid(self.attention_3(y))
        return x * y


class CABClassic(nn.Module):
    """Classic CAB: 3x3 compress -> GELU -> 3x3 expand -> ChannelAttention."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30

    def setup(self):
        mid = self.num_feat // self.compress_ratio
        self.cab_0 = nn.Conv(mid, (3, 3), padding=[(1, 1), (1, 1)], name="cab_0")
        self.cab_2 = nn.Conv(self.num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                             name="cab_2")
        self.cab_3 = ChannelAttention(self.num_feat, self.squeeze_factor,
                                      name="cab_3")

    def __call__(self, x):
        return self.cab_3(self.cab_2(gelu_exact(self.cab_0(x))))


class WindowAttentionClassic(nn.Module):
    """W-MSA over pre-partitioned windows with RPB and optional shift mask
    (structure per swinir_arch.py:95-192)."""

    dim: int
    window_size: int
    num_heads: int

    def setup(self):
        ws = self.window_size
        self.qkv = nn.Dense(self.dim * 3, name="qkv")
        self.proj = nn.Dense(self.dim, name="proj")
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        self._rpi = relative_position_index_sa(ws)

    def __call__(self, x_windows, mask=None):
        """x_windows: (B*nW, N, C); mask: (nW, N, N) additive or None."""
        bw, n, c = x_windows.shape
        h = self.num_heads
        d = c // h
        qkv = self.qkv(x_windows).reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        bias = self.relative_position_bias_table[self._rpi.reshape(-1)]
        bias = bias.reshape(n, n, h).transpose(2, 0, 1)        # (heads, N, N)
        if mask is not None:
            nw = mask.shape[0]
            bias = bias[None, None] + mask[None, :, None]      # (1, nW, heads, N, N)
            q = q.reshape(bw // nw, nw, h, n, d)
            k = k.reshape(bw // nw, nw, h, n, d)
            v = v.reshape(bw // nw, nw, h, n, d)
            out = attention_with_bias(q, k, v, bias, scale=d ** -0.5)
            out = out.reshape(bw, h, n, d)
        else:
            out = attention_with_bias_auto(q, k, v, bias, scale=d ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return self.proj(out)


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (upstream HAT / timm Mlp naming)."""

    hidden: int
    out: int

    def setup(self):
        self.fc1 = nn.Dense(self.hidden, name="fc1")
        self.fc2 = nn.Dense(self.out, name="fc2")

    def __call__(self, x):
        return self.fc2(gelu_exact(self.fc1(x)))



def _tp_ffn_route(hid):
    """(mesh, axis) when the hidden-parallel fused-FFN composition applies
    under the active TP context (parallel/tp_ffn.py), else None."""
    from super_resolution_tpu.parallel.tp import tp_attention_ctx

    ctx = tp_attention_ctx()
    if ctx is None:
        return None
    mesh, axis = ctx
    return (mesh, axis) if hid % int(mesh.shape[axis]) == 0 else None


def _fused_mlp_tail(block, x, deterministic=True):
    """Route  x + Mlp(norm2(x))  through the fused Pallas mlp_block when
    enabled (ops/pallas_ffn.py); None when the fused path is off. Under
    TP the hidden-parallel shard_map composition keeps the fused kernel
    (parallel/tp_ffn.py) when the hidden dim divides the model axis."""
    from super_resolution_tpu.ops.pallas_ffn import (ffn_fused_enabled,
                                                     mlp_block_ad)

    if not (not block.is_initializing() and x.ndim == 4 and deterministic):
        return None
    tp_route = (_tp_ffn_route(block.mlp.hidden)
                if ffn_fused_enabled(ignore_tp=True) else None)
    if not (ffn_fused_enabled() or tp_route):
        return None
    np2 = block.norm2.variables["params"]
    mp = block.mlp
    args = (x, np2["scale"], np2["bias"],
            mp.fc1.variables["params"]["kernel"],
            mp.fc1.variables["params"]["bias"],
            mp.fc2.variables["params"]["kernel"],
            mp.fc2.variables["params"]["bias"])
    if tp_route is not None:
        from super_resolution_tpu.parallel.tp_ffn import \
            hidden_parallel_mlp_block

        return hidden_parallel_mlp_block(*args, mesh=tp_route[0],
                                         axis=tp_route[1])
    return mlp_block_ad(*args)


class HABClassic(nn.Module):
    """Classic hybrid attention block: (S)W-MSA + conv_scale * CAB, then MLP."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.attn = WindowAttentionClassic(self.dim, self.window_size,
                                           self.num_heads, name="attn")
        self.conv_block = CABClassic(self.dim, self.compress_ratio,
                                     self.squeeze_factor, name="conv_block")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")

    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        ws, ss = self.window_size, self.shift_size
        shortcut = x
        x = self.norm1(x)
        conv_x = self.conv_block(x)

        if ss > 0:
            shifted = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            mask = shift_attn_mask_jnp(hh, ww, ws, ss)
        else:
            shifted, mask = x, None

        from super_resolution_tpu.ops.attention import \
            _pallas_attention_enabled
        from super_resolution_tpu.ops.pallas_ffn import ffn_fused_enabled
        import os as _os
        if (ss == 0 and _os.environ.get("SR_TPU_HAB_MEGA") == "1"
                and _pallas_attention_enabled() and ffn_fused_enabled()
                and not self.is_initializing()
                and ws % 8 == 0 and hh % ws == 0 and ww % ws == 0
                and (deterministic or self.drop_path_rate == 0)):
            # whole-block megakernel (unshifted only): W-MSA + 3-way
            # residual + LN2/MLP tail in one VMEM pass — the attention
            # output never round-trips HBM
            # (ops/pallas_attention.py::fused_hab_block).
            # MEASURED SLOWER on v5e (bench classic HD 7.56 vs 7.87
            # out-Mpix/s): per-window programs cut the MLP matmuls from
            # M = th*W rows (separate mlp kernel) to M = ws^2 = 256,
            # which costs more than the saved 0.93 GB/block HBM round
            # trip. Opt-in via SR_TPU_HAB_MEGA=1; default stays the
            # split MSA-kernel + residual-fused-MLP pipeline.
            from super_resolution_tpu.ops.pallas_attention import \
                fused_hab_block_ad
            at = self.attn
            d = c // self.num_heads
            n = ws * ws
            bias = at.relative_position_bias_table[at._rpi.reshape(-1)]
            bias = bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)
            qkv_p = at.qkv.variables["params"]
            proj_p = at.proj.variables["params"]
            np2 = self.norm2.variables["params"]
            mp = self.mlp
            return fused_hab_block_ad(
                x, shortcut, conv_x, qkv_p["kernel"], qkv_p["bias"],
                proj_p["kernel"], proj_p["bias"], bias.astype(jnp.float32),
                np2["scale"], np2["bias"],
                mp.fc1.variables["params"]["kernel"],
                mp.fc1.variables["params"]["bias"],
                mp.fc2.variables["params"]["kernel"],
                mp.fc2.variables["params"]["bias"],
                self.num_heads, ws, d ** -0.5, float(self.conv_scale))
        from super_resolution_tpu.ops.pallas_attention import \
            msa_block_supported
        from super_resolution_tpu.parallel.tp import tp_attention_ctx

        tp_ctx = tp_attention_ctx()
        # under TP the fused route requires the head-parallel composition
        # (heads divisible by the model axis); otherwise the qkv/proj
        # weights carry the Megatron layout and the XLA path lets GSPMD
        # contract them sharded (a pallas_call would all-gather them)
        tp_route_ok = (tp_ctx is None or self.num_heads
                       % int(tp_ctx[0].shape[tp_ctx[1]]) == 0)
        if (_pallas_attention_enabled() and tp_route_ok
                and not self.is_initializing()
                and ws % 8 == 0 and hh % ws == 0 and ww % ws == 0
                and msa_block_supported(ws, shifted.dtype)):
            # fused (S)W-MSA block megakernel: qkv projection, partition,
            # head-split, attention, reverse AND the output projection in
            # VMEM (ops/pallas_attention.py::fused_msa_block) — the qkv
            # (3C) and pre-proj (C) images never touch HBM
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
            if tp_ctx is not None:
                # tensor parallelism: heads sharded over the model axis,
                # same fused kernel per head slice, one psum
                # (parallel/tp_attention.py)
                from super_resolution_tpu.parallel.tp_attention import \
                    head_parallel_msa_block

                shifted = head_parallel_msa_block(
                    shifted, qkv_p["kernel"], qkv_p["bias"],
                    proj_p["kernel"], proj_p["bias"], bias, mask_arr,
                    heads=self.num_heads, window_size=ws,
                    mesh=tp_ctx[0], axis=tp_ctx[1], scale=d ** -0.5)
            elif ss > 0 and ws % ss == 0:
                # shift folded into the kernel's window gather: the
                # roll-in above is dead code XLA removes; only the thin
                # wrap strips are built (r5 — the full-image roll was
                # 9.5% of the HD step, scripts/profile_hd_trace.py).
                # Output stays in rolled space: mask and roll-back below
                # are unchanged.
                from super_resolution_tpu.ops.pallas_attention import \
                    fused_msa_block_shifted_ad

                shifted = fused_msa_block_shifted_ad(
                    x, qkv_p["kernel"], qkv_p["bias"],
                    proj_p["kernel"], proj_p["bias"], bias, mask_arr,
                    self.num_heads, ws, ss, d ** -0.5)
            else:
                shifted = fused_msa_block_ad(
                    shifted, qkv_p["kernel"], qkv_p["bias"],
                    proj_p["kernel"], proj_p["bias"], bias, mask_arr,
                    self.num_heads, ws, d ** -0.5)
        else:
            x_windows = window_partition(shifted, ws).reshape(-1, ws * ws, c)
            attn_windows = self.attn(x_windows, mask=mask)
            shifted = window_reverse(attn_windows.reshape(-1, ws, ws, c),
                                     ws, hh, ww)
        attn_x = jnp.roll(shifted, (ss, ss), axis=(1, 2)) if ss > 0 else shifted

        if not deterministic and self.drop_path_rate > 0:
            attn_x = drop_path(attn_x, self.drop_path_rate, False,
                               self.make_rng("droppath"))
        from super_resolution_tpu.ops.pallas_ffn import (ffn_fused_enabled,
                                                         mlp_block_sum3_ad)
        tp_ffn = (_tp_ffn_route(self.mlp.hidden)
                  if ffn_fused_enabled(ignore_tp=True) else None)
        if ((ffn_fused_enabled() or tp_ffn) and not self.is_initializing()
                and x.ndim == 4
                and (deterministic or self.drop_path_rate == 0)):
            # fused tail INCLUDING the 3-way residual: the XLA add would
            # materialize x (read 3 C-images, write 1) only for the mlp
            # kernel to re-read it — one extra HBM round trip per block.
            # Under TP: hidden-parallel shard_map keeps the fused kernel
            # (parallel/tp_ffn.py)
            np2 = self.norm2.variables["params"]
            mp = self.mlp
            tail_w = (
                np2["scale"], np2["bias"],
                mp.fc1.variables["params"]["kernel"],
                mp.fc1.variables["params"]["bias"],
                mp.fc2.variables["params"]["kernel"],
                mp.fc2.variables["params"]["bias"])
            if tp_ffn is not None:
                from super_resolution_tpu.parallel.tp_ffn import \
                    hidden_parallel_mlp_sum3

                return hidden_parallel_mlp_sum3(
                    shortcut, attn_x, conv_x, *tail_w,
                    conv_scale=float(self.conv_scale),
                    mesh=tp_ffn[0], axis=tp_ffn[1])
            if ss > 0:
                # roll-back folded into the sum3 gather: `shifted` is the
                # attention output still in rolled space; the attn_x roll
                # above is dead code XLA removes (r5 — the pair of
                # full-image rolls was 9.5% of the HD step)
                from super_resolution_tpu.ops.pallas_ffn import \
                    mlp_block_sum3_shifted_ad

                return mlp_block_sum3_shifted_ad(
                    shortcut, shifted, conv_x, *tail_w,
                    float(self.conv_scale), ss)
            return mlp_block_sum3_ad(shortcut, attn_x, conv_x, *tail_w,
                                     float(self.conv_scale))
        x = shortcut + attn_x + conv_x * self.conv_scale
        fused = _fused_mlp_tail(
            self, x, deterministic or self.drop_path_rate == 0)
        if fused is not None:
            return fused
        mlp_x = self.mlp(self.norm2(x))
        if not deterministic and self.drop_path_rate > 0:
            mlp_x = drop_path(mlp_x, self.drop_path_rate, False,
                              self.make_rng("droppath"))
        return x + mlp_x


class OCABClassic(nn.Module):
    """Classic OCAB: fused qkv; Q from ws-windows, K/V from overlapping
    windows; rectangular attention with gathered RPB; Mlp tail."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0

    def setup(self):
        ws = self.window_size
        self.overlap_win_size = int(ws * self.overlap_ratio) + ws
        ow = self.overlap_win_size
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.qkv = nn.Dense(self.dim * 3, name="qkv")
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0),
            ((ws + ow - 1) * (ws + ow - 1), self.num_heads))
        self.proj = nn.Dense(self.dim, name="proj")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")
        self._rpi = relative_position_index_oca(ws, self.overlap_ratio)

    def __call__(self, x):
        b, h, w, c = x.shape
        ws, ow = self.window_size, self.overlap_win_size
        d = c // self.num_heads
        bias = self.relative_position_bias_table[self._rpi.reshape(-1)]
        bias = bias.reshape(ws * ws, ow * ow, self.num_heads).transpose(2, 0, 1)

        from super_resolution_tpu.ops.attention import (
            _pallas_attention_enabled, fused_route_enabled)
        from super_resolution_tpu.ops.pallas_attention import \
            ocab_attention_supported
        from super_resolution_tpu.parallel.tp import tp_attention_ctx

        # under TP the fused OCAB stays on via head parallelism
        # (parallel/tp_attention.py): each device's kernel sees its head
        # group's weight slices — the VMEM guard evaluates at the LOCAL
        # head count
        tp_ctx = tp_attention_ctx()
        ntp = int(tp_ctx[0].shape[tp_ctx[1]]) if tp_ctx is not None else 1
        tp_ocab = (tp_ctx is not None and _pallas_attention_enabled()
                   and self.num_heads % ntp == 0
                   and ocab_attention_supported(ws, ow,
                                                self.num_heads // ntp))
        plain_ocab = (fused_route_enabled()
                      and ocab_attention_supported(ws, ow, self.num_heads))
        if ((plain_ocab or tp_ocab) and not self.is_initializing()
                and h % ws == 0 and w % ws == 0):
            # OCAB block megakernel: LN1, q/kv projections (kv recomputed
            # per overlap window instead of round-tripping a 2C image),
            # windowing, attention, output projection and the shortcut
            # residual in one VMEM pass
            # (ops/pallas_attention.py::fused_ocab_block)
            from super_resolution_tpu.ops.pallas_attention import \
                fused_ocab_block_ad
            n1 = self.norm1.variables["params"]
            qk = self.qkv.variables["params"]
            pj = self.proj.variables["params"]
            ocab_args = (
                x, n1["scale"], n1["bias"],
                qk["kernel"][:, :c], qk["bias"][:c],
                qk["kernel"][:, c:], qk["bias"][c:],
                pj["kernel"], pj["bias"], bias)
            if tp_ctx is not None:
                from super_resolution_tpu.parallel.tp_attention import \
                    head_parallel_ocab_block

                x = head_parallel_ocab_block(
                    *ocab_args, heads=self.num_heads, window_size=ws,
                    overlap_win=ow, mesh=tp_ctx[0], axis=tp_ctx[1],
                    scale=d ** -0.5)
            else:
                x = fused_ocab_block_ad(*ocab_args, self.num_heads, ws, ow,
                                        d ** -0.5)
        else:
            shortcut = x
            x = self.norm1(x)
            qkv = self.qkv(x)                                  # (B,H,W,3C)
            q, kv = qkv[..., :c], qkv[..., c:]
            q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)
            kv_windows = extract_overlap_windows(kv, ws, ow)
            k_windows = kv_windows[..., :c]
            v_windows = kv_windows[..., c:]
            bw = q_windows.shape[0]
            qh = q_windows.reshape(bw, ws * ws, self.num_heads,
                                   d).transpose(0, 2, 1, 3)
            kh = k_windows.reshape(bw, ow * ow, self.num_heads,
                                   d).transpose(0, 2, 1, 3)
            vh = v_windows.reshape(bw, ow * ow, self.num_heads,
                                   d).transpose(0, 2, 1, 3)
            out = attention_with_bias_auto(qh, kh, vh, bias, scale=d ** -0.5)
            out = out.transpose(0, 2, 1, 3).reshape(bw, ws * ws, c)
            x = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
            x = self.proj(x) + shortcut
        fused = _fused_mlp_tail(self, x)
        if fused is not None:
            return fused
        return x + self.mlp(self.norm2(x))


class AttenBlocksClassic(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float = 4.0
    drop_path_rates: Sequence[float] = ()

    def setup(self):
        rates = (list(self.drop_path_rates) or [0.0] * self.depth)
        self.blocks = [
            HABClassic(dim=self.dim, num_heads=self.num_heads,
                       window_size=self.window_size,
                       shift_size=0 if i % 2 == 0 else self.window_size // 2,
                       compress_ratio=self.compress_ratio,
                       squeeze_factor=self.squeeze_factor,
                       conv_scale=self.conv_scale, mlp_ratio=self.mlp_ratio,
                       drop_path_rate=rates[i], name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.overlap_attn = OCABClassic(dim=self.dim,
                                        window_size=self.window_size,
                                        overlap_ratio=self.overlap_ratio,
                                        num_heads=self.num_heads,
                                        mlp_ratio=self.mlp_ratio,
                                        name="overlap_attn")

    def __call__(self, x, deterministic: bool = True):
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.overlap_attn(x)


class RHAGClassic(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float = 4.0
    drop_path_rates: Sequence[float] = ()
    resi_connection: str = "1conv"

    def setup(self):
        self.residual_group = AttenBlocksClassic(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, compress_ratio=self.compress_ratio,
            squeeze_factor=self.squeeze_factor, conv_scale=self.conv_scale,
            overlap_ratio=self.overlap_ratio, mlp_ratio=self.mlp_ratio,
            drop_path_rates=self.drop_path_rates, name="residual_group")
        if self.resi_connection == "1conv":
            self.conv = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv")
        elif self.resi_connection == "identity":
            self.conv = None
        else:
            raise ValueError(f"Unknown resi_connection: {self.resi_connection}")

    def __call__(self, x, deterministic: bool = True):
        y = self.residual_group(x, deterministic=deterministic)
        if self.conv is not None:
            y = self.conv(y)
        return y + x


class PatchEmbedNorm(nn.Module):
    use_norm: bool = True

    def setup(self):
        self.norm = (nn.LayerNorm(epsilon=_LN_EPS, name="norm")
                     if self.use_norm else None)

    def __call__(self, x):
        return self.norm(x) if self.norm is not None else x


@ARCH_REGISTRY.register()
class HATClassic(nn.Module):
    """Classic HAT for official checkpoint compatibility.

    Same macro structure as the fork HAT (shallow conv -> RHAGs -> body conv
    + global residual -> pixel-shuffle reconstruction) but with the
    published HAB/OCAB internals. Converted official .pth weights load via
    convert/torch_import.py with the same naming convention.
    """

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
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    # gradient checkpointing: remat each RHAG so backprop stores only the
    # 6 group-boundary activations and recomputes block internals (the TPU
    # analog of the reference's use_checkpoint, hatx_arch.py:546-551)
    use_checkpoint: bool = False
    # >0: stream the reconstruction tail over row bands of this height so
    # the upsampler's conv->pixel-shuffle peak (the widest activation of
    # tiled inference) shrinks ~H/band-fold (ops/streamed_tail.py). Exact.
    stream_tail_rows: int = 0

    def setup(self):
        if self.upsampler != "pixelshuffle":
            raise NotImplementedError("only 'pixelshuffle' upsampler")
        num_feat = 64
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbedNorm(self.patch_norm, name="patch_embed")
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        rhag_cls = (nn.remat(RHAGClassic, static_argnums=(2,))
                    if self.use_checkpoint else RHAGClassic)
        layers = []
        start = 0
        for i, depth in enumerate(self.depths):
            layers.append(rhag_cls(
                dim=self.embed_dim, depth=depth, num_heads=self.num_heads[i],
                window_size=self.window_size,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale, overlap_ratio=self.overlap_ratio,
                mlp_ratio=self.mlp_ratio,
                drop_path_rates=tuple(dpr[start:start + depth]),
                resi_connection=self.resi_connection, name=f"layers_{i}"))
            start += depth
        self.layers = layers
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm")
        if self.resi_connection == "1conv":
            self.conv_after_body = nn.Conv(self.embed_dim, (3, 3),
                                           padding=[(1, 1), (1, 1)],
                                           name="conv_after_body")
        else:
            self.conv_after_body = None
        self.conv_before_upsample_0 = nn.Conv(num_feat, (3, 3),
                                              padding=[(1, 1), (1, 1)],
                                              name="conv_before_upsample_0")
        import math

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

    def head(self, x):
        """Shallow feature extraction ahead of the RHAG stack — split out
        so parallel/pipeline.py can run the (structurally identical,
        shape-preserving) RHAGs as pipeline stages across a mesh axis."""
        x = MeanShift.normalize(x, self.img_range)
        feat = self.conv_first(x)
        return feat, self.patch_embed(feat)

    def tail(self, body, feat):
        """Post-body norm/conv + global residual + reconstruction."""
        body = self.norm(body)
        if self.conv_after_body is not None:
            body = self.conv_after_body(body)
        feat = body + feat

        def recon(f):
            y = nn.leaky_relu(self.conv_before_upsample_0(f),
                              negative_slope=0.01)
            for conv, r in zip(self.upsample_convs, self.upsample_factors):
                y = pixel_shuffle(conv(y), r)
            return self.conv_last(y)

        if self.stream_tail_rows and not self.is_initializing():
            y = streamed_rows(recon, feat, self.upscale,
                              self.stream_tail_rows)
        else:
            y = recon(feat)
        return MeanShift.denormalize(y, self.img_range)

    def __call__(self, x, deterministic: bool = True):
        feat, body = self.head(x)
        for layer in self.layers:
            # positional: static_argnums=(2,) on the remat-lifted RHAG
            body = layer(body, deterministic)
        return self.tail(body, feat)
