"""Discriminators (ref: hat/archs/discriminator_arch.py:7-67).

UNetDiscriminatorSN: Real-ESRGAN's U-Net discriminator with spectral
normalization — conv0, 3 strided down convs, 3 up convs with skip
connections, 2 refinement convs, 1-channel head; all inner convs spectrally
normalized. flax.linen.SpectralNorm carries the power-iteration vectors in
the 'batch_stats' collection (functional analog of torch's SN buffers).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _upx2(x):
    return resize_to(x, x.shape[1] * 2, x.shape[2] * 2, "bilinear")


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, update_sn_stats: bool = False):
        def snconv(feats, k, stride, name):
            p = (k - 1) // 2  # torch padding convention (k=4,s=2 -> p=1)
            conv = nn.Conv(feats, (k, k), strides=(stride, stride),
                           padding=[(p, p)] * 2, use_bias=True,
                           name=name)
            return nn.SpectralNorm(conv, collection_name="batch_stats")

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        update = update_sn_stats

        nf = self.num_feat
        x0 = lrelu(nn.Conv(nf, (3, 3), padding=[(1, 1), (1, 1)],
                           name="conv0")(x))
        x1 = lrelu(snconv(nf * 2, 4, 2, "conv1")(x0, update_stats=update))
        x2 = lrelu(snconv(nf * 4, 4, 2, "conv2")(x1, update_stats=update))
        x3 = lrelu(snconv(nf * 8, 4, 2, "conv3")(x2, update_stats=update))

        x3u = _upx2(x3)
        x4 = lrelu(snconv(nf * 4, 3, 1, "conv4")(x3u, update_stats=update))
        if self.skip_connection:
            x4 = x4 + x2
        x4u = _upx2(x4)
        x5 = lrelu(snconv(nf * 2, 3, 1, "conv5")(x4u, update_stats=update))
        if self.skip_connection:
            x5 = x5 + x1
        x5u = _upx2(x5)
        x6 = lrelu(snconv(nf, 3, 1, "conv6")(x5u, update_stats=update))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(snconv(nf, 3, 1, "conv7")(x6, update_stats=update))
        out = lrelu(snconv(nf, 3, 1, "conv8")(out, update_stats=update))
        return nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="conv9")(out)


class _SA(nn.Module):
    """Global self-attention over all H*W tokens, positional encodings
    intentionally discarded (ref: esc/archs/discriminator_arch.py:14-45).
    The reference casts q/k/v to bf16 for its flash kernel; matched here so
    golden outputs agree — on TPU the bf16 QK^T also lands on the MXU."""

    dim: int
    n_heads: int = 8

    @nn.compact
    def __call__(self, x, update_sn_stats: bool = False):
        b, h, w, c = x.shape
        ch = self.dim // self.n_heads
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=False,
                      name="to_qkv")(x)
        # channel order matches torch's 'b (qkv heads c) h w' rearrange
        qkv = qkv.reshape(b, h * w, 3, self.n_heads, ch)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3).astype(jnp.bfloat16)
                   for i in range(3))  # (b, heads, hw, ch)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * (ch ** -0.5)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn.astype(jnp.bfloat16), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        out = out.astype(x.dtype)
        to_out = nn.SpectralNorm(
            nn.Conv(self.dim, (1, 1), use_bias=True, name="to_out"),
            collection_name="batch_stats")
        return to_out(out, update_stats=update_sn_stats)


@ARCH_REGISTRY.register()
class DeepUNetDiscriminatorSN(nn.Module):
    """Deeper U-Net SN discriminator with global self-attention at the two
    innermost levels (ref: esc/archs/discriminator_arch.py:48-117).
    Registered in the reference but unused by any shipped config; ported
    for registry completeness. Structural notes vs UNetDiscriminatorSN:
    the up-path interpolates BEFORE each conv, the innermost feature gets a
    residual SA block, and the first skip is sa1(x2) instead of x2."""

    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True

    @nn.compact
    def __call__(self, x, update_sn_stats: bool = False):
        def snconv(feats, k, stride, name):
            p = (k - 1) // 2
            conv = nn.Conv(feats, (k, k), strides=(stride, stride),
                           padding=[(p, p)] * 2, use_bias=False, name=name)
            return nn.SpectralNorm(conv, collection_name="batch_stats")

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        update = update_sn_stats

        nf = self.num_feat
        x0 = lrelu(nn.Conv(nf, (3, 3), padding=[(1, 1), (1, 1)],
                           name="conv0")(x))
        x1 = lrelu(snconv(nf * 2, 4, 2, "conv1")(x0, update_stats=update))
        x2 = lrelu(snconv(nf * 4, 4, 2, "conv2")(x1, update_stats=update))
        x3 = lrelu(snconv(nf * 8, 4, 2, "conv3")(x2, update_stats=update))

        x3 = x3 + _SA(nf * 8, n_heads=8, name="sa2")(
            x3, update_sn_stats=update)

        x3 = _upx2(x3)
        x4 = lrelu(snconv(nf * 4, 3, 1, "conv4")(x3, update_stats=update))
        if self.skip_connection:
            x4 = x4 + _SA(nf * 4, n_heads=4, name="sa1")(
                x2, update_sn_stats=update)
        x4 = _upx2(x4)
        x5 = lrelu(snconv(nf * 2, 3, 1, "conv5")(x4, update_stats=update))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = _upx2(x5)
        x6 = lrelu(snconv(nf, 3, 1, "conv6")(x5, update_stats=update))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(snconv(nf, 3, 1, "conv7")(x6, update_stats=update))
        out = lrelu(snconv(nf, 3, 1, "conv8")(out, update_stats=update))
        return nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="conv9")(out)


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator(nn.Module):
    """VGG-style discriminator for 128/256 inputs
    (ref: basicsr/archs/discriminator_arch.py:9-88): 3x3 conv + 4x4 stride-2
    conv pairs with BatchNorm, then two linear layers. BN runs with stored
    (frozen) statistics — see models/arch_util.FrozenBatchNorm.
    """

    num_in_ch: int = 3
    num_feat: int = 64
    input_size: int = 128

    @nn.compact
    def __call__(self, x):
        from super_resolution_tpu.models.arch_util import FrozenBatchNorm

        assert self.input_size in (128, 256)
        assert x.shape[1] == self.input_size

        def lrelu(v):
            return nn.leaky_relu(v, negative_slope=0.2)

        def conv(feats, k, s, name, bias):
            return nn.Conv(feats, (k, k), strides=(s, s),
                           padding=[(1, 1)] * 2, use_bias=bias, name=name)

        nf = self.num_feat
        feat = lrelu(conv(nf, 3, 1, "conv0_0", True)(x))
        feat = lrelu(FrozenBatchNorm(nf, name="bn0_1")(
            conv(nf, 4, 2, "conv0_1", False)(feat)))
        stages = [(nf * 2, "1"), (nf * 4, "2"), (nf * 8, "3"), (nf * 8, "4")]
        if self.input_size == 256:
            stages.append((nf * 8, "5"))
        for feats, tag in stages:
            feat = lrelu(FrozenBatchNorm(feats, name=f"bn{tag}_0")(
                conv(feats, 3, 1, f"conv{tag}_0", False)(feat)))
            feat = lrelu(FrozenBatchNorm(feats, name=f"bn{tag}_1")(
                conv(feats, 4, 2, f"conv{tag}_1", False)(feat)))

        # torch flattens NCHW (c-major)
        feat = feat.transpose(0, 3, 1, 2).reshape(feat.shape[0], -1)
        feat = lrelu(nn.Dense(100, name="linear1")(feat))
        return nn.Dense(1, name="linear2")(feat)
