"""ECBSR — Edge-oriented Convolution Block SR (flax, NHWC).

Rebuild of the reference's re-parameterizable mobile SR net
(ref: basicsr/archs/ecbsr_arch.py:8-275). Each ECB trains as five parallel
branches (plain 3x3, expand-squeeze 1x1-3x3, and three fixed-mask edge
filters scaled per channel) and folds at eval time into ONE 3x3 conv — the
fold is computed in jnp from the live params, so a single conv hits the MXU
at inference with zero reparam bookkeeping.

Parameters keep torch layout (OIHW) and the reference's attribute names so
reference checkpoints convert verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.conv import conv2d_nhwc
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _edge_mask(seq_type: str, out_channels: int) -> jnp.ndarray:
    """The fixed 3x3 edge-filter masks (ref: ecbsr_arch.py:50-101)."""
    if seq_type == "conv1x1-sobelx":
        m = [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]]
    elif seq_type == "conv1x1-sobely":
        m = [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]
    elif seq_type == "conv1x1-laplacian":
        m = [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]
    else:
        raise ValueError(seq_type)
    return jnp.broadcast_to(jnp.asarray(m), (out_channels, 1, 3, 3))


def _conv_init(shape):
    fan_in = shape[1] * shape[2] * shape[3]
    bound = (6.0 / fan_in) ** 0.5  # kaiming-uniform-ish; overwritten on load

    def init(key, s=shape):
        return jax.random.uniform(key, s, minval=-bound, maxval=bound)
    return init


class SeqConv3x3(nn.Module):
    """One re-parameterizable branch (ref: ecbsr_arch.py:8-153)."""

    seq_type: str
    in_channels: int
    out_channels: int
    depth_multiplier: float = 1.0

    def setup(self):
        if self.seq_type == "conv1x1-conv3x3":
            mid = int(self.out_channels * self.depth_multiplier)
            self.k0 = self.param("k0", _conv_init((mid, self.in_channels, 1, 1)))
            self.b0 = self.param("b0", nn.initializers.zeros, (mid,))
            self.k1 = self.param("k1", _conv_init((self.out_channels, mid, 3, 3)))
            self.b1 = self.param("b1", nn.initializers.zeros, (self.out_channels,))
        else:
            self.k0 = self.param(
                "k0", _conv_init((self.out_channels, self.in_channels, 1, 1)))
            self.b0 = self.param("b0", nn.initializers.zeros, (self.out_channels,))
            self.scale = self.param(
                "scale", lambda k: jax.random.normal(
                    k, (self.out_channels, 1, 1, 1)) * 1e-3)
            self.bias = self.param(
                "bias", lambda k: jax.random.normal(k, (self.out_channels,)) * 1e-3)
            # fixed mask; a param for checkpoint parity but never trained
            self.mask = self.param(
                "mask", lambda _: _edge_mask(self.seq_type, self.out_channels))

    def __call__(self, x):
        # The reference pads the 1x1-conv OUTPUT borders with the bias value
        # (ecbsr_arch.py:110-126); identical to zero-padding the input before
        # the 1x1 conv (conv1x1(0) == b0), which XLA fuses cleanly.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y0 = conv2d_nhwc(xp, self.k0, self.b0, padding=0)
        if self.seq_type == "conv1x1-conv3x3":
            return conv2d_nhwc(y0, self.k1, self.b1, padding=0)
        tmp = jax.lax.stop_gradient(self.mask) * self.scale
        return conv2d_nhwc(y0, tmp, self.bias, padding=0,
                           groups=self.out_channels)

    def rep_params(self):
        """Fold into an equivalent single 3x3 (ref: ecbsr_arch.py:131-153)."""
        if self.seq_type == "conv1x1-conv3x3":
            # 1x1 (mid<-in) then 3x3 (out<-mid) == 3x3 (out<-in)
            w = jnp.einsum("omhw,mi->oihw", self.k1, self.k0[:, :, 0, 0])
            b = jnp.einsum("omhw,m->o", self.k1, self.b0) + self.b1
            return w, b
        tmp = jax.lax.stop_gradient(self.mask) * self.scale  # (O,1,3,3)
        w = jnp.einsum("ozhw,oi->oihw", tmp, self.k0[:, :, 0, 0])
        b = self.b0 * tmp.sum(axis=(1, 2, 3)) + self.bias
        return w, b


class ECB(nn.Module):
    """Edge-oriented Convolution Block (ref: ecbsr_arch.py:156-232)."""

    in_channels: int
    out_channels: int
    depth_multiplier: float
    act_type: str = "prelu"
    with_idt: bool = False

    def setup(self):
        self.idt = self.with_idt and self.in_channels == self.out_channels
        self.conv3x3_k = self.param(
            "conv3x3.weight",
            _conv_init((self.out_channels, self.in_channels, 3, 3)))
        self.conv3x3_b = self.param("conv3x3.bias", nn.initializers.zeros,
                                    (self.out_channels,))
        self.conv1x1_3x3 = SeqConv3x3("conv1x1-conv3x3", self.in_channels,
                                      self.out_channels, self.depth_multiplier,
                                      name="conv1x1_3x3")
        self.conv1x1_sbx = SeqConv3x3("conv1x1-sobelx", self.in_channels,
                                      self.out_channels, name="conv1x1_sbx")
        self.conv1x1_sby = SeqConv3x3("conv1x1-sobely", self.in_channels,
                                      self.out_channels, name="conv1x1_sby")
        self.conv1x1_lpl = SeqConv3x3("conv1x1-laplacian", self.in_channels,
                                      self.out_channels, name="conv1x1_lpl")
        if self.act_type == "prelu":
            self.act_w = self.param("act.weight",
                                    nn.initializers.constant(0.25),
                                    (self.out_channels,))

    def _act(self, y):
        if self.act_type == "prelu":
            return jnp.where(y >= 0, y, self.act_w * y)
        if self.act_type == "relu":
            return nn.relu(y)
        if self.act_type == "rrelu":
            # eval semantics: negative slope = (lower+upper)/2 = 0
            return nn.relu(y)
        if self.act_type == "softplus":
            return nn.softplus(y)
        if self.act_type == "linear":
            return y
        raise ValueError(self.act_type)

    def rep_params(self):
        w, b = self.conv3x3_k, self.conv3x3_b
        for branch in (self.conv1x1_3x3, self.conv1x1_sbx, self.conv1x1_sby,
                       self.conv1x1_lpl):
            wi, bi = branch.rep_params()
            w, b = w + wi, b + bi
        if self.idt:
            eye = jnp.zeros_like(w).at[
                jnp.arange(self.out_channels), jnp.arange(self.out_channels),
                1, 1].set(1.0)
            w = w + eye
        return w, b

    def __call__(self, x, training: bool = False):
        if training:
            y = conv2d_nhwc(x, self.conv3x3_k, self.conv3x3_b, padding=1)
            y = (y + self.conv1x1_3x3(x) + self.conv1x1_sbx(x)
                 + self.conv1x1_sby(x) + self.conv1x1_lpl(x))
            if self.idt:
                y = y + x
        else:
            w, b = self.rep_params()
            y = conv2d_nhwc(x, w, b, padding=1)
        return self._act(y)


@ARCH_REGISTRY.register()
class ECBSR(nn.Module):
    """ECBSR trunk + sub-pixel head (ref: ecbsr_arch.py:235-275)."""

    num_in_ch: int
    num_out_ch: int
    num_block: int
    num_channel: int
    with_idt: bool
    act_type: str
    scale: int

    def setup(self):
        blocks = [ECB(self.num_in_ch, self.num_channel, 2.0, self.act_type,
                      self.with_idt, name="backbone_0")]
        for i in range(self.num_block):
            blocks.append(ECB(self.num_channel, self.num_channel, 2.0,
                              self.act_type, self.with_idt,
                              name=f"backbone_{i + 1}"))
        blocks.append(ECB(self.num_channel, self.num_out_ch * self.scale ** 2,
                          2.0, "linear", self.with_idt,
                          name=f"backbone_{self.num_block + 1}"))
        self.backbone = blocks

    def __call__(self, x, training: bool = False):
        if self.num_in_ch > 1:
            shortcut = jnp.repeat(x, self.scale ** 2, axis=-1)
        else:
            shortcut = x  # broadcasts over the s^2 output channels
        y = x
        for blk in self.backbone:
            y = blk(y, training=training)
        return pixel_shuffle(y + shortcut, self.scale)
