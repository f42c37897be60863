"""FID InceptionV3 feature extractor, flax/NHWC.

TPU-native implementation of the FID-patched InceptionV3 the reference uses
for its FID metric (ref: basicsr/archs/inception.py:1-310 — torchvision
inception_v3 with num_classes=1008/aux_logits=False plus the TF-parity
patches: 3x3 average pools exclude padding from the divisor, and Mixed_7c's
pool branch is a max pool). Weights come from the pt_inception checkpoint
via :func:`fid_inception_state_dict_to_params`.

BatchNorm runs in inference mode only (the extractor is frozen for FID), so
running statistics are stored as plain parameters and the normalization is
a pure affine: (x - mean) * rsqrt(var + 1e-3) * scale + bias.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

BN_EPS = 1e-3


class BasicConv2d(nn.Module):
    """Conv (no bias) + frozen BatchNorm + ReLU (ref: torchvision
    inception BasicConv2d, bn eps=0.001)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=[(ph, ph), (pw, pw)], use_bias=False,
                    name="conv")(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * lax.rsqrt(var + BN_EPS) * scale + bias
        return nn.relu(x)


def _avg_pool3x3_excl_pad(x):
    """3x3 stride-1 average pool whose divisor counts only in-bounds taps
    (the TF-parity patch: ref inception.py FIDInceptionA/C/E_1 forward)."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    total = lax.reduce_window(x, 0.0, lax.add, dims, strides, pad)
    counts = lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, lax.add,
                               dims, strides, pad)
    return total / counts


def _max_pool3x3(x, stride: int, pad: int = 0):
    return nn.max_pool(x, (3, 3), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(bd)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool3x3_excl_pad(x))
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3x3(x, 2)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1),
                         name="branch_pool")(_avg_pool3x3_excl_pad(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3x3(x, 2)], axis=-1)


class InceptionE(nn.Module):
    """pool_mode 'avg' = FIDInceptionE_1 (Mixed_7b), 'max' = FIDInceptionE_2
    (Mixed_7c — the FID checkpoint's max-pool quirk, ref inception.py)."""

    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool3x3(x, 1, pad=1)
        else:
            bp = _avg_pool3x3_excl_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Returns the feature maps of the requested blocks, ascending
    (ref: inception.py InceptionV3.forward:123-151).

    Blocks: 0 = after first max pool (64ch), 1 = after second max pool
    (192ch), 2 = pre-aux (768ch), 3 = final global average pool (2048ch,
    spatial 1x1). Input NHWC RGB; [0,1] with normalize_input, else [-1,1].
    """

    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        outputs = {}
        blocks = sorted(self.output_blocks)
        last = blocks[-1]
        assert last <= 3, "output block indices go up to 3"
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                 method="bilinear", antialias=False)
        if self.normalize_input:
            x = 2 * x - 1

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool3x3(x, 2)
        outputs[0] = x
        if last >= 1:
            x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = _max_pool3x3(x, 2)
            outputs[1] = x
        if last >= 2:
            x = InceptionA(32, name="Mixed_5b")(x)
            x = InceptionA(64, name="Mixed_5c")(x)
            x = InceptionA(64, name="Mixed_5d")(x)
            x = InceptionB(name="Mixed_6a")(x)
            x = InceptionC(128, name="Mixed_6b")(x)
            x = InceptionC(160, name="Mixed_6c")(x)
            x = InceptionC(160, name="Mixed_6d")(x)
            x = InceptionC(192, name="Mixed_6e")(x)
            outputs[2] = x
        if last >= 3:
            x = InceptionD(name="Mixed_7a")(x)
            x = InceptionE("avg", name="Mixed_7b")(x)
            x = InceptionE("max", name="Mixed_7c")(x)
            outputs[3] = jnp.mean(x, axis=(1, 2), keepdims=True)
        return [outputs[i] for i in blocks]


# torch layer lists per wrapper block, for 'blocks.N.M.' checkpoint keys
# (the reference's InceptionV3 nn.Sequential wrapper, inception.py:89-119)
_BLOCK_LAYOUT = {
    0: ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", None],
    1: ["Conv2d_3b_1x1", "Conv2d_4a_3x3", None],
    2: ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
        "Mixed_6c", "Mixed_6d", "Mixed_6e"],
    3: ["Mixed_7a", "Mixed_7b", "Mixed_7c", None],
}

_BN_KEY_MAP = {"weight": "bn_scale", "bias": "bn_bias",
               "running_mean": "bn_mean", "running_var": "bn_var"}


def fid_inception_state_dict_to_params(state_dict: dict) -> dict:
    """Map a torch FID-inception state dict onto the flax tree.

    Accepts both layouts: the raw pt_inception checkpoint
    ('Conv2d_1a_3x3.conv.weight', 'Mixed_5b.branch1x1.bn.running_mean', ...)
    and the reference wrapper's ('blocks.0.0.conv.weight', ...).
    Classifier ('fc.*') and bookkeeping keys are dropped.
    """
    params: dict = {}

    def put(path, val):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = val

    for key, v in state_dict.items():
        parts = key.split(".")
        if parts[0] == "blocks":
            layer = _BLOCK_LAYOUT[int(parts[1])][int(parts[2])]
            if layer is None:  # pooling layer, no params
                continue
            parts = [layer] + parts[3:]
        if parts[0] in ("fc", "AuxLogits") or parts[-1] == "num_batches_tracked":
            continue
        v = np.asarray(v)
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(parts[:-1] + ["kernel"], v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn" and parts[-1] in _BN_KEY_MAP:
            put(parts[:-2] + [_BN_KEY_MAP[parts[-1]]], v)
        else:
            raise KeyError(f"unrecognized inception checkpoint key: {key}")
    return params
