"""VGG feature extractor for perceptual loss (ref: basicsr/archs/vgg_arch.py).

The reference pulls pretrained VGG from torchvision; this environment has
no torchvision and no network egress, so weights must be supplied as a
torch .pth (either torchvision's vgg19-dcbb9e9d.pth layout, keys
'features.N.{weight,bias}', or a converted tree). The architecture and the
layer-name map match torchvision's cfg 'E' (vgg19) so published weights
load directly once available.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

# torchvision vgg19 cfg 'E' with basicsr's layer naming
VGG19_LAYERS = [
    "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
    "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
    "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
    "conv3_4", "relu3_4", "pool3",
    "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
    "conv4_4", "relu4_4", "pool4",
    "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
    "conv5_4", "relu5_4", "pool5",
]
_VGG19_CHANNELS = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}

# ImageNet normalization (ref: vgg_arch.py VGGFeatureExtractor)
VGG_MEAN = (0.485, 0.456, 0.406)
VGG_STD = (0.229, 0.224, 0.225)


class VGGFeatureExtractor(nn.Module):
    """Runs VGG19 up to the deepest requested layer, returning a dict of
    the requested intermediate activations.

    layer_name_list uses basicsr names (e.g. 'conv5_4' or 'relu4_4').
    """

    layer_name_list: Sequence[str]
    use_input_norm: bool = True
    range_norm: bool = False

    def setup(self):
        max_idx = max(VGG19_LAYERS.index(n) for n in self.layer_name_list)
        self._active_layers = VGG19_LAYERS[:max_idx + 1]
        convs = {}
        for name in self._active_layers:
            if name.startswith("conv"):
                feats = _VGG19_CHANNELS[name[4]]
                convs[name] = nn.Conv(feats, (3, 3), padding=[(1, 1), (1, 1)],
                                      name=name)
        self._convs = convs

    def __call__(self, x):
        """x: NHWC RGB in [0,1] (or [-1,1] with range_norm)."""
        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            x = (x - jnp.asarray(VGG_MEAN, x.dtype)) / jnp.asarray(VGG_STD, x.dtype)
        out = {}
        for name in self._active_layers:
            if name.startswith("conv"):
                x = self._convs[name](x)
            elif name.startswith("relu"):
                x = nn.relu(x)
            elif name.startswith("pool"):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if name in self.layer_name_list:
                out[name] = x
        return out


def torchvision_vgg19_to_params(state_dict: dict, layer_names=None) -> dict:
    """Map torchvision 'features.N.weight' keys onto the flax tree."""
    conv_indices = []
    i = 0
    for name in VGG19_LAYERS:
        if name.startswith("conv"):
            conv_indices.append((name, i))
            i += 2  # conv + relu
        elif name.startswith("pool"):
            i += 1
    params = {}
    for name, idx in conv_indices:
        wkey, bkey = f"features.{idx}.weight", f"features.{idx}.bias"
        if wkey not in state_dict:
            continue
        w = np.asarray(state_dict[wkey]).transpose(2, 3, 1, 0)
        params[name] = {"kernel": w, "bias": np.asarray(state_dict[bkey])}
    return params
