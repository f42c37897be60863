"""HiFaceGAN — SPADE-based face renovation GAN (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/hifacegan_arch.py:10-260 and
hifacegan_util.py:12-255): a SPADE generator whose encoder is LIP (local
importance pooling), and a pix2pixHD-style multiscale PatchGAN
discriminator. Spectral-norm convs follow torch eval semantics (see
models/arch_util.SNConv2d).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from super_resolution_tpu.models.arch_util import SNConv2d
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def instance_norm(x, eps: float = 1e-5):
    """Per-sample, per-channel norm over H, W (torch InstanceNorm2d with
    track_running_stats=False, biased variance)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def _nearest2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _nearest_resize(x, out_h, out_w):
    """torch F.interpolate(mode='nearest') parity: index floor(i*in/out)."""
    h, w = x.shape[1], x.shape[2]
    iy = (jnp.arange(out_h) * h // out_h).astype(jnp.int32)
    ix = (jnp.arange(out_w) * w // out_w).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def _avg_pool_nopad_count(x, kernel=3, stride=2, padding=1):
    """avg_pool2d(count_include_pad=False): sum pool / valid-count pool."""
    dims = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return s / cnt


def lip2d(x, logit, kernel=3, stride=2, padding=1):
    """Local importance pooling (ref: hifacegan_util.py:154-156).
    Both pools use count_include_pad=False (torch default is True, but the
    reference calls F.avg_pool2d positionally with default True — ratio of
    two identically-counted pools cancels the denominator either way)."""
    w = jnp.exp(logit)
    dims = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    num = lax.reduce_window(x * w, 0.0, lax.add, dims, strides, pads)
    den = lax.reduce_window(w, 0.0, lax.add, dims, strides, pads)
    return num / den


class SPADE(nn.Module):
    """Spatially-adaptive denormalization (ref: hifacegan_util.py:12-54).
    'syncbatch'/'instance' both run instance norm (the reference falls back
    to InstanceNorm2d in single-GPU mode, hifacegan_util.py:25-26)."""

    norm_nc: int
    label_nc: int
    ks: int = 3

    @nn.compact
    def __call__(self, x, segmap):
        normalized = instance_norm(x)
        segmap = _nearest_resize(segmap, x.shape[1], x.shape[2])
        nhidden = 128 if self.norm_nc > 128 else self.norm_nc
        pw = self.ks // 2
        actv = nn.relu(nn.Conv(nhidden, (self.ks, self.ks),
                               padding=[(pw, pw)] * 2,
                               name="mlp_shared.0")(segmap))
        gamma = nn.Conv(self.norm_nc, (self.ks, self.ks),
                        padding=[(pw, pw)] * 2, use_bias=False,
                        name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (self.ks, self.ks),
                       padding=[(pw, pw)] * 2, use_bias=False,
                       name="mlp_beta")(actv)
        return normalized * gamma + beta


class SPADEResnetBlock(nn.Module):
    """(ref: hifacegan_util.py:57-110)."""

    fin: int
    fout: int

    @nn.compact
    def __call__(self, x, seg):
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        def act(v):
            return nn.leaky_relu(v, negative_slope=0.2)

        if learned_shortcut:
            x_s = SNConv2d(self.fin, self.fout, 1, use_bias=False,
                           name="conv_s")(
                SPADE(self.fin, 3, name="norm_s")(x, seg))
        else:
            x_s = x
        dx = SNConv2d(self.fin, fmiddle, 3, padding=1, name="conv_0")(
            act(SPADE(self.fin, 3, name="norm_0")(x, seg)))
        dx = SNConv2d(fmiddle, self.fout, 3, padding=1, name="conv_1")(
            act(SPADE(fmiddle, 3, name="norm_1")(dx, seg)))
        return x_s + dx


class SimplifiedLIP(nn.Module):
    """(ref: hifacegan_util.py:166-179)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        logit = nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=False, name="logit.0")(x)
        logit = instance_norm(logit)
        w = self.param("logit.1.weight", nn.initializers.ones,
                       (self.channels,))
        b = self.param("logit.1.bias", nn.initializers.zeros,
                       (self.channels,))
        logit = logit * w + b
        logit = nn.sigmoid(logit) * 12.0  # SoftGate
        return lip2d(x, logit)


class LIPEncoder(nn.Module):
    """Local-importance-pooling encoder (ref: hifacegan_util.py:182-214)."""

    input_nc: int
    ngf: int
    n_2xdown: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ngf, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    name="model.0")(x)
        x = nn.relu(instance_norm(x))
        cur_ratio, idx = 1, 3
        for i in range(self.n_2xdown):
            next_ratio = min(cur_ratio * 2, 16)
            x = SimplifiedLIP(self.ngf * cur_ratio, name=f"model.{idx}")(x)
            x = nn.Conv(self.ngf * next_ratio, (3, 3), padding=[(1, 1)] * 2,
                        name=f"model.{idx + 1}")(x)
            x = instance_norm(x)
            cur_ratio = next_ratio
            if i < self.n_2xdown - 1:
                x = nn.relu(x)
                idx += 4
            else:
                idx += 3
        return x


class _SPADEGeneratorBase(nn.Module):
    """Shared SPADE generator body (ref: hifacegan_arch.py:10-94)."""

    num_in_ch: int = 3
    num_feat: int = 64
    use_vae: bool = False
    z_dim: int = 256
    crop_size: int = 512
    norm_g: str = "spectralspadesyncbatch3x3"
    is_train: bool = True
    init_train_phase: int = 3

    scale_ratio: int = 5

    def setup(self):
        nf = self.num_feat
        self.fc = nn.Conv(16 * nf, (3, 3), padding=[(1, 1)] * 2, name="fc")
        self.head_0 = SPADEResnetBlock(16 * nf, 16 * nf, name="head_0")
        self.g_middle_0 = SPADEResnetBlock(16 * nf, 16 * nf, name="g_middle_0")
        self.g_middle_1 = SPADEResnetBlock(16 * nf, 16 * nf, name="g_middle_1")
        self.ups = [SPADEResnetBlock(16 * nf, 8 * nf, name="ups.0"),
                    SPADEResnetBlock(8 * nf, 4 * nf, name="ups.1"),
                    SPADEResnetBlock(4 * nf, 2 * nf, name="ups.2"),
                    SPADEResnetBlock(2 * nf, nf, name="ups.3")]
        self.to_rgbs = [nn.Conv(3, (3, 3), padding=[(1, 1)] * 2,
                                name=f"to_rgbs.{i}") for i in range(4)]
        self._setup_encoder()

    def _setup_encoder(self):
        pass

    def encode(self, x):
        sh = x.shape[1] // 2 ** self.scale_ratio
        sw = x.shape[2] // 2 ** self.scale_ratio
        return self.fc(_nearest_resize(x, sh, sw))

    def __call__(self, x):
        seg = x
        x = self.encode(x)
        x = self.head_0(x, seg)
        x = _nearest2x(x)
        x = self.g_middle_0(x, seg)
        x = self.g_middle_1(x, seg)
        phase = (self.init_train_phase + 1 if self.is_train
                 else len(self.to_rgbs))
        for i in range(phase):
            x = _nearest2x(x)
            x = self.ups[i](x, seg)
        x = self.to_rgbs[phase - 1](nn.leaky_relu(x, negative_slope=0.2))
        return jnp.tanh(x)


@ARCH_REGISTRY.register()
class SPADEGenerator(_SPADEGeneratorBase):
    pass


@ARCH_REGISTRY.register()
class HiFaceGAN(_SPADEGeneratorBase):
    """SPADE generator with the LIP encoder
    (ref: hifacegan_arch.py:144-164)."""

    def _setup_encoder(self):
        self.lip_encoder = LIPEncoder(self.num_in_ch, self.num_feat,
                                      self.scale_ratio, name="lip_encoder")

    def encode(self, x):
        return self.lip_encoder(x)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (ref: hifacegan_arch.py:223-260);
    norm_d='spectralinstance'."""

    input_nc: int
    n_layers_d: int
    num_feat: int
    keep_features: bool = True

    @nn.compact
    def __call__(self, x):
        results = [x]
        nf = self.num_feat
        out = nn.Conv(nf, (4, 4), strides=(2, 2), padding=[(2, 2)] * 2,
                      name="model0.0")(results[-1])
        results.append(nn.leaky_relu(out, negative_slope=0.2))
        for n in range(1, self.n_layers_d):
            nf_prev, nf = nf, min(nf * 2, 512)
            stride = 1 if n == self.n_layers_d - 1 else 2
            out = SNConv2d(nf_prev, nf, 4, stride=stride, padding=2,
                           use_bias=False, name=f"model{n}.0.0")(results[-1])
            results.append(nn.leaky_relu(instance_norm(out),
                                         negative_slope=0.2))
        results.append(nn.Conv(1, (4, 4), padding=[(2, 2)] * 2,
                               name=f"model{self.n_layers_d}.0")(results[-1]))
        return results[1:] if self.keep_features else results[-1]


@ARCH_REGISTRY.register()
class HiFaceGANDiscriminator(nn.Module):
    """Multiscale PatchGAN discriminator
    (ref: hifacegan_arch.py:167-220)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    conditional_d: bool = True
    num_d: int = 2
    n_layers_d: int = 4
    num_feat: int = 64
    norm_d: str = "spectralinstance"
    keep_features: bool = True

    @nn.compact
    def __call__(self, x):
        input_nc = self.num_in_ch + (self.num_out_ch if self.conditional_d
                                     else 0)
        result = []
        for i in range(self.num_d):
            out = NLayerDiscriminator(input_nc, self.n_layers_d,
                                      self.num_feat, self.keep_features,
                                      name=f"discriminator_{i}")(x)
            result.append(out)
            x = _avg_pool_nopad_count(x)
        return result
