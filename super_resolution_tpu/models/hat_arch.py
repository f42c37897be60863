"""HAT (fork variant): ESC-conv-attention HAB + overlapping cross-attention.

TPU-native rebuild of the reference fork's HAT
(ref: HAT/hat/archs/hat_arch.py). This fork is NOT vanilla HAT: the HAB's
window self-attention is replaced by ESC convolutional attention
(hat_arch.py:210,228), the MLP by a gated depthwise-conv FFN
(hat_arch.py:95-119), and the channel attention by ECA (hat_arch.py:66-78).
Only the OCAB keeps true windowed cross-attention with a learned relative
position bias (hat_arch.py:267-393). The classic structure (window-MSA HAB)
lives in hat_classic_arch.py.

Design notes (TPU-first):
- NHWC end-to-end; the reference's patch_embed/unembed BNC<->BCHW shuffles
  are eliminated (LayerNorm is channel-last native).
- OCAB's nn.Unfold overlap-window extraction becomes a
  conv_general_dilated_patches gather (ops/windowing.py).
- The shift mask the reference computes per forward (hat_arch.py:831) is
  dead code for this fork's HAB (conv attention ignores it) and is not
  computed at all.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import MLP, MeanShift, drop_path, gelu_exact
from super_resolution_tpu.models.esc_arch import ConvAttnWrapper, orthogonal_oihw
from super_resolution_tpu.ops.attention import (attention_with_bias_auto, attention_with_bias,
                                                relative_position_index_oca)
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.ops.streamed_tail import streamed_rows
from super_resolution_tpu.ops.windowing import (extract_overlap_windows,
                                                window_partition, window_reverse)
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

_LN_EPS = 1e-5  # torch nn.LayerNorm default


class ECAConv(nn.Module):
    """1D conv over the channel axis, kernel (k,) (torch Conv1d(1,1,k))."""

    k_size: int = 5

    @nn.compact
    def __call__(self, y):
        # y: (B, C) channel descriptor
        w = self.param("kernel", nn.initializers.lecun_normal(), (self.k_size, 1, 1))
        import jax

        pad = self.k_size // 2
        out = jax.lax.conv_general_dilated(
            y[:, :, None], w, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out[:, :, 0]


class ECA(nn.Module):
    """Efficient channel attention: GAP -> conv1d(k=5) -> sigmoid gate
    (ref: hat_arch.py:66-78)."""

    k_size: int = 5

    def setup(self):
        self.conv = ECAConv(self.k_size, name="conv")

    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))          # (B, C)
        y = nn.sigmoid(self.conv(y))
        return x * y[:, None, None, :]


class CAB(nn.Module):
    """Conv block: 3x3 compress -> GELU -> 3x3 expand -> ECA
    (ref: hat_arch.py:80-90). Child names mirror the torch Sequential."""

    num_feat: int
    compress_ratio: int = 3

    def setup(self):
        mid = self.num_feat // self.compress_ratio
        self.cab_0 = nn.Conv(mid, (3, 3), padding=[(1, 1), (1, 1)], name="cab_0")
        self.cab_2 = nn.Conv(self.num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                             name="cab_2")
        self.cab_3 = ECA(5, name="cab_3")

    def __call__(self, x):
        return self.cab_3(self.cab_2(gelu_exact(self.cab_0(x))))


class GatedDconvFFN(nn.Module):
    """fc1 -> depthwise 3x3 -> SiLU-gated GLU -> fc2 (ref: hat_arch.py:95-119)."""

    dim: int
    mlp_ratio: float = 2.0
    dw_kernel_size: int = 3

    def setup(self):
        hidden = int(self.dim * self.mlp_ratio)
        k = self.dw_kernel_size
        self.fc1 = nn.Dense(2 * hidden, name="fc1")
        self.dw = nn.Conv(2 * hidden, (k, k), padding=[(k // 2, k // 2)] * 2,
                          feature_group_count=2 * hidden, name="dw")
        self.fc2 = nn.Dense(self.dim, name="fc2")

    def __call__(self, x):
        x = self.fc1(x)          # NHWC, channels = 2*hidden
        x = self.dw(x)
        hidden = x.shape[-1] // 2
        x_proj, x_gate = x[..., :hidden], x[..., hidden:]
        x = x_proj * nn.silu(x_gate)
        return self.fc2(x)


class ESCConvAttn(nn.Module):
    """HAB attention branch: ConvAttnWrapper with a per-block orthogonal-init
    13x13 PLK filter (ref: hat_arch.py:139-167, param at :148-149)."""

    dim: int
    pdim: int = 16
    kernel_size: int = 13

    def setup(self):
        self.core = ConvAttnWrapper(self.dim, self.pdim, self.kernel_size,
                                    name="core")
        self.plk_filter = self.param(
            "plk_filter", orthogonal_oihw,
            (self.pdim, self.pdim, self.kernel_size, self.kernel_size))

    def __call__(self, x):
        return self.core(x, self.plk_filter)


class HAB(nn.Module):
    """Hybrid attention block, fork flavor (ref: hat_arch.py:172-238):
    norm1 -> {ESC conv-attn + CAB * conv_scale} residual -> norm2 ->
    GatedDconvFFN residual."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    esc_pdim: int = 16
    esc_kernel: int = 13

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=_LN_EPS, name="norm1")
        self.esc_attn = ESCConvAttn(self.dim, self.esc_pdim, self.esc_kernel,
                                    name="esc_attn")
        self.conv_block = CAB(self.dim, self.compress_ratio, name="conv_block")
        self.norm2 = nn.LayerNorm(epsilon=_LN_EPS, name="norm2")
        self.mlp = GatedDconvFFN(self.dim, self.mlp_ratio, 3, name="mlp")

    def __call__(self, x, deterministic: bool = True):
        from super_resolution_tpu.ops.pallas_hab import (hab_front_ad,
                                                         hab_fused_enabled)

        fuse_front = (hab_fused_enabled() and not self.is_initializing()
                      and x.ndim == 4 and self.dim > self.esc_pdim
                      and (deterministic or self.drop_path_rate == 0))
        from super_resolution_tpu.ops.pallas_hab import ln_split_enabled

        split_ok = (not self.is_initializing() and x.ndim == 4
                    and self.dim > self.esc_pdim
                    and (deterministic or self.drop_path_rate == 0)
                    and x.shape[1] % 8 == 0 and x.shape[2] % 4 == 0)
        if fuse_front:
            x = self._fused_front(x, hab_front_ad)
        elif ln_split_enabled() and split_ok:
            x = self._split_front(x)
        else:
            shortcut = x
            x = self.norm1(x)
            conv_x = self.conv_block(x)
            attn_x = self.esc_attn(x)
            if not deterministic and self.drop_path_rate > 0:
                rng = self.make_rng("droppath")
                attn_x = drop_path(attn_x, self.drop_path_rate, False, rng)
            x = shortcut + attn_x + conv_x * self.conv_scale
        from super_resolution_tpu.ops.pallas_ffn import (
            ffn_fused_enabled, gated_dconv_ffn_block_ad)

        if (ffn_fused_enabled() and not self.is_initializing()
                and x.ndim == 4
                and (deterministic or self.drop_path_rate == 0)):
            # fused  x + FFN(LN(x))  Pallas block (ops/pallas_ffn.py)
            np2 = self.norm2.variables["params"]
            mp = self.mlp
            return gated_dconv_ffn_block_ad(
                x, np2["scale"], np2["bias"],
                mp.fc1.variables["params"]["kernel"],
                mp.fc1.variables["params"]["bias"],
                mp.dw.variables["params"]["kernel"][:, :, 0, :],
                mp.dw.variables["params"]["bias"],
                mp.fc2.variables["params"]["kernel"],
                mp.fc2.variables["params"]["bias"])
        mlp_x = self.mlp(self.norm2(x))
        if not deterministic and self.drop_path_rate > 0:
            rng = self.make_rng("droppath")
            mlp_x = drop_path(mlp_x, self.drop_path_rate, False, rng)
        return x + mlp_x

    def _fused_front(self, x, hab_front_ad):
        """First HAB residual via the fused Pallas front
        (ops/pallas_hab.py): the kernel emits LN1(x), the pre-gate CAB
        tensor and both GAP partial sums in one pass; the GAP-dependent
        tails (ECA gate, ESC dynamic-kernel head) and the branch assembly
        run in XLA, which fuses them into the aggregation einsums."""
        from super_resolution_tpu.ops.conv import (conv2d_nhwc_s2d,
                                                   dynamic_depthwise_conv3x3)

        b, h, w, c = x.shape
        pdim = self.esc_pdim
        n1 = self.norm1.variables["params"]
        cb = self.conv_block.variables["params"]
        ln1, cab_mid, gap_cab, gap16 = hab_front_ad(
            x, n1["scale"], n1["bias"],
            cb["cab_0"]["kernel"], cb["cab_0"]["bias"],
            cb["cab_2"]["kernel"], cb["cab_2"]["bias"], _LN_EPS, pdim)
        inv_hw = 1.0 / (h * w)

        # ECA gate: GAP -> conv1d(k) -> sigmoid (ref: hat_arch.py:66-78)
        wk = cb["cab_3"]["conv"]["kernel"]                 # (k, 1, 1)
        ksz = wk.shape[0]
        gd = (gap_cab * inv_hw).astype(x.dtype)            # (B, C)
        gate = jax.lax.conv_general_dilated(
            gd[:, :, None], wk.astype(gd.dtype), (1,),
            [(ksz // 2, ksz // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"))[:, :, 0]
        gate = nn.sigmoid(gate)

        # ESC dynamic-kernel head (ref: esc_arch.py:95-100)
        ep = self.esc_attn.variables["params"]
        plk = ep["core"]["plk"]
        g16 = (gap16 * inv_hw).astype(x.dtype)             # (B, pdim)
        dk = g16 @ plk["dwc_proj_1"]["kernel"] + plk["dwc_proj_1"]["bias"]
        dk = gelu_exact(dk)
        dk = dk @ plk["dwc_proj_3"]["kernel"] + plk["dwc_proj_3"]["bias"]
        dk = dk.reshape(-1, pdim, 3, 3).transpose(0, 2, 3, 1)

        x1 = ln1[..., :pdim]
        y1 = (conv2d_nhwc_s2d(x1, ep["plk_filter"])
              + dynamic_depthwise_conv3x3(x1, dk))
        ak = ep["core"]["aggr"]["kernel"][0, 0]                    # (C, C)
        attn_x = (jnp.einsum("bhwc,cd->bhwd", y1, ak[:pdim].astype(y1.dtype))
                  + jnp.einsum("bhwc,cd->bhwd", ln1[..., pdim:],
                               ak[pdim:].astype(x.dtype))
                  + ep["core"]["aggr"]["bias"].astype(x.dtype))
        return (x + attn_x
                + self.conv_scale * cab_mid * gate[:, None, None, :])

    def _split_front(self, x):
        """First HAB residual with the LN-split Pallas kernel
        (ops/pallas_hab.py::ln_split): one streamed pass emits LN1(x),
        the compact pdim slab and its pre-s2d layout, so the ESC branch
        pays no strided-slice reads or s2d relayout; CAB runs the flax
        module on ln1; the aggregation consumes full ln1 with the first
        pdim kernel rows zeroed (same math, no slice copy)."""
        from super_resolution_tpu.ops.conv import (conv2d_s2d_pre,
                                                   dynamic_depthwise_conv3x3)
        from super_resolution_tpu.ops.pallas_hab import ln_split_ad

        b, h, w, c = x.shape
        pdim = self.esc_pdim
        n1 = self.norm1.variables["params"]
        from super_resolution_tpu.ops.conv import s2d_transform
        ln1, x1 = ln_split_ad(x, n1["scale"], n1["bias"], _LN_EPS, pdim)
        x1s = s2d_transform(x1, 4)
        conv_x = self.conv_block(ln1)

        ep = self.esc_attn.variables["params"]
        plkp = ep["core"]["plk"]
        g16 = jnp.mean(x1.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        dk = g16 @ plkp["dwc_proj_1"]["kernel"] + plkp["dwc_proj_1"]["bias"]
        dk = gelu_exact(dk)
        dk = dk @ plkp["dwc_proj_3"]["kernel"] + plkp["dwc_proj_3"]["bias"]
        dk = dk.reshape(-1, pdim, 3, 3).transpose(0, 2, 3, 1)
        dyn = dynamic_depthwise_conv3x3(x1, dk)
        stat = conv2d_s2d_pre(x1s, ep["plk_filter"].astype(x.dtype), (h, w),
                              4)
        y1 = stat + dyn
        ak = ep["core"]["aggr"]["kernel"][0, 0]                # (C, C)
        k2pad = jnp.concatenate(
            [jnp.zeros((pdim, c), ak.dtype), ak[pdim:]], axis=0)
        attn_x = (jnp.einsum("bhwc,cd->bhwd", y1, ak[:pdim].astype(y1.dtype))
                  + jnp.einsum("bhwc,cd->bhwd", ln1, k2pad.astype(ln1.dtype))
                  + ep["core"]["aggr"]["bias"].astype(x.dtype))
        return x + attn_x + self.conv_scale * conv_x


class OCAB(nn.Module):
    """Overlapping cross-attention block (ref: hat_arch.py:267-393).

    Q from ws x ws windows; K/V from overlapping ow x ow windows (ow =
    ws + overlap_ratio*ws) extracted zero-padded with stride ws; rectangular
    attention (Nq=ws^2, Nk=ow^2) with gathered RPB; MLP tail. Optional ESC
    feature infusion for K/V (esc_enable, :316-324)."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0
    esc_enable: bool = False
    esc_pdim: int = 16
    esc_kernel: int = 13

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

    def __call__(self, x):
        b, h, w, c = x.shape
        ws, ow = self.window_size, self.overlap_win_size
        d = c // self.num_heads
        bias = self.relative_position_bias_table[self._rpi.reshape(-1)]
        bias = bias.reshape(ws * ws, ow * ow, self.num_heads).transpose(2, 0, 1)

        from super_resolution_tpu.ops.attention import \
            fused_route_enabled
        from super_resolution_tpu.ops.pallas_attention import \
            ocab_attention_supported
        fused_route = (fused_route_enabled()
                       and not self.is_initializing()
                       and ocab_attention_supported(ws, ow, self.num_heads)
                       and h % ws == 0 and w % ws == 0)
        if fused_route and not self.esc_enable:
            # full OCAB block megakernel: LN1 + q/kv projections +
            # windowing + attention + proj + residual in one VMEM pass
            # (ops/pallas_attention.py::fused_ocab_block); the ESC-infused
            # variant keeps the attention-only kernel below because its kv
            # source is the materialized esc_core feature image
            from super_resolution_tpu.ops.pallas_attention import \
                fused_ocab_block_ad
            n1 = self.norm1.variables["params"]
            qp = self.q_proj.variables["params"]
            kp = self.kv_proj.variables["params"]
            pj = self.proj.variables["params"]
            x = fused_ocab_block_ad(
                x, n1["scale"], n1["bias"], qp["kernel"], qp["bias"],
                kp["kernel"], kp["bias"], pj["kernel"], pj["bias"], bias,
                self.num_heads, ws, ow, d ** -0.5)
        else:
            shortcut = x
            x = self.norm1(x)
            y = self.esc_core(x, self.esc_plk) if self.esc_enable else x
            q = self.q_proj(x)                                # (B,H,W,C)
            kv = self.kv_proj(y)                              # (B,H,W,2C)
            if fused_route:
                # attention-only megakernel (windowing + overlap extraction
                # + heads + attention + reverse in VMEM —
                # ops/pallas_attention.py::fused_ocab_attention)
                from super_resolution_tpu.ops.pallas_attention import \
                    fused_ocab_attention_ad
                x = fused_ocab_attention_ad(q, kv, bias, self.num_heads,
                                            ws, ow, d ** -0.5)
            else:
                q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)
                kv_windows = extract_overlap_windows(kv, ws, ow)
                bw = q_windows.shape[0]
                k_windows = kv_windows[..., :c]
                v_windows = kv_windows[..., c:]
                qh = q_windows.reshape(bw, ws * ws, self.num_heads,
                                       d).transpose(0, 2, 1, 3)
                kh = k_windows.reshape(bw, ow * ow, self.num_heads,
                                       d).transpose(0, 2, 1, 3)
                vh = v_windows.reshape(bw, ow * ow, self.num_heads,
                                       d).transpose(0, 2, 1, 3)
                out = attention_with_bias_auto(qh, kh, vh, bias,
                                               scale=d ** -0.5)
                out = out.transpose(0, 2, 1, 3).reshape(bw, ws * ws, c)
                x = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
            x = self.proj(x) + shortcut

        from super_resolution_tpu.ops.pallas_ffn import (ffn_fused_enabled,
                                                         mlp_block_ad)
        from super_resolution_tpu.models.hat_classic_arch import _tp_ffn_route
        tp_ffn = (_tp_ffn_route(int(self.mlp_0.features))
                  if ffn_fused_enabled(ignore_tp=True) else None)
        if (ffn_fused_enabled() or tp_ffn) and not self.is_initializing():
            # fused x + MLP(LN(x)) tail (ops/pallas_ffn.py::mlp_block);
            # under TP: hidden-parallel shard_map (parallel/tp_ffn.py)
            np2 = self.norm2.variables["params"]
            args = (x, np2["scale"], np2["bias"],
                    self.mlp_0.variables["params"]["kernel"],
                    self.mlp_0.variables["params"]["bias"],
                    self.mlp_2.variables["params"]["kernel"],
                    self.mlp_2.variables["params"]["bias"])
            if tp_ffn is not None:
                from super_resolution_tpu.parallel.tp_ffn import \
                    hidden_parallel_mlp_block

                return hidden_parallel_mlp_block(*args, mesh=tp_ffn[0],
                                                 axis=tp_ffn[1])
            return mlp_block_ad(*args)
        return x + self.mlp_2(gelu_exact(self.mlp_0(self.norm2(x))))


class AttenBlocks(nn.Module):
    """depth x HAB followed by one OCAB (ref: hat_arch.py:395-482)."""

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
    esc_pdim: int = 16
    esc_kernel: int = 13
    ocab_esc_enable: bool = False
    ocab_esc_pdim: int = 16
    ocab_esc_kernel: int = 13

    def setup(self):
        rates = (list(self.drop_path_rates) or [0.0] * self.depth)
        self.blocks = [
            HAB(dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale, mlp_ratio=self.mlp_ratio,
                drop_path_rate=rates[i], esc_pdim=self.esc_pdim,
                esc_kernel=self.esc_kernel, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.overlap_attn = OCAB(dim=self.dim, window_size=self.window_size,
                                 overlap_ratio=self.overlap_ratio,
                                 num_heads=self.num_heads,
                                 mlp_ratio=self.mlp_ratio,
                                 esc_enable=self.ocab_esc_enable,
                                 esc_pdim=self.ocab_esc_pdim,
                                 esc_kernel=self.ocab_esc_kernel,
                                 name="overlap_attn")

    def __call__(self, x, deterministic: bool = True):
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.overlap_attn(x)


class RHAG(nn.Module):
    """Residual hybrid attention group: AttenBlocks -> 3x3 conv -> +skip
    (ref: hat_arch.py:484-556)."""

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
    esc_pdim: int = 16
    esc_kernel: int = 13
    ocab_esc_enable: bool = False
    ocab_esc_pdim: int = 16
    ocab_esc_kernel: int = 13

    def setup(self):
        self.residual_group = AttenBlocks(
            dim=self.dim, depth=self.depth, num_heads=self.num_heads,
            window_size=self.window_size, compress_ratio=self.compress_ratio,
            squeeze_factor=self.squeeze_factor, conv_scale=self.conv_scale,
            overlap_ratio=self.overlap_ratio, mlp_ratio=self.mlp_ratio,
            drop_path_rates=self.drop_path_rates, esc_pdim=self.esc_pdim,
            esc_kernel=self.esc_kernel, ocab_esc_enable=self.ocab_esc_enable,
            ocab_esc_pdim=self.ocab_esc_pdim,
            ocab_esc_kernel=self.ocab_esc_kernel, name="residual_group")
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


class PatchEmbed(nn.Module):
    """Token-space LayerNorm (the only live piece of the reference's
    PatchEmbed in NHWC; ref: hat_arch.py:558-575)."""

    use_norm: bool = True

    def setup(self):
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, name="norm") if self.use_norm else None

    def __call__(self, x):
        return self.norm(x) if self.norm is not None else x


@ARCH_REGISTRY.register()
class HAT(nn.Module):
    """Hybrid Attention Transformer, fork variant (ref: hat_arch.py:607-859).

    __call__ contract: NHWC RGB in [0,1] -> NHWC upscaled RGB.
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
    esc_pdim: int = 16
    esc_kernel: int = 13
    ocab_esc_enable: bool = False
    ocab_esc_pdim: int = 16
    ocab_esc_kernel: int = 13
    # gradient checkpointing: remat each RHAG so backprop stores only the
    # group-boundary activations (the TPU analog of the reference's
    # use_checkpoint, hatx_arch.py:546-551)
    use_checkpoint: bool = False
    # >0: stream the reconstruction tail over row bands of this height so
    # the upsampler's conv->pixel-shuffle peak (the widest activation of
    # tiled inference) shrinks ~H/band-fold (ops/streamed_tail.py). Exact.
    stream_tail_rows: int = 0

    def setup(self):
        if self.upsampler != "pixelshuffle":
            raise NotImplementedError(
                f"upsampler={self.upsampler!r}; only 'pixelshuffle' exists in "
                "the reference HAT (hat_arch.py:753-757)")
        num_feat = 64
        self.conv_first = nn.Conv(self.embed_dim, (3, 3),
                                  padding=[(1, 1), (1, 1)], name="conv_first")
        self.patch_embed = PatchEmbed(self.patch_norm, name="patch_embed")
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        rhag_cls = (nn.remat(RHAG, static_argnums=(2,))
                    if self.use_checkpoint else RHAG)
        layers = []
        start = 0
        for i, depth in enumerate(self.depths):
            layers.append(rhag_cls(
                dim=self.embed_dim, depth=depth, num_heads=self.num_heads[i],
                window_size=self.window_size, compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor, conv_scale=self.conv_scale,
                overlap_ratio=self.overlap_ratio, mlp_ratio=self.mlp_ratio,
                drop_path_rates=tuple(dpr[start:start + depth]),
                resi_connection=self.resi_connection, esc_pdim=self.esc_pdim,
                esc_kernel=self.esc_kernel,
                ocab_esc_enable=self.ocab_esc_enable,
                ocab_esc_pdim=self.ocab_esc_pdim,
                ocab_esc_kernel=self.ocab_esc_kernel, name=f"layers_{i}"))
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

    def features(self, x, deterministic: bool = True):
        """Deep feature body (ref: forward_features, hat_arch.py:828-846)."""
        x = self.patch_embed(x)
        for layer in self.layers:
            # positional: static_argnums=(2,) on the remat-lifted RHAG
            x = layer(x, deterministic)
        return self.norm(x)

    def head(self, x):
        """Shallow features ahead of the RHAG stack — split out (same
        contract as HATClassic.head) so parallel/pipeline.py can run the
        groups as pipeline stages over a mesh axis."""
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
