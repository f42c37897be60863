"""Import the mounted PyTorch reference (/root/reference) as a golden oracle.

The reference is used ONLY as a numerical oracle in tests — we run its
modules to produce expected outputs and compare against our TPU-native
implementations. Nothing is copied from it.

The environment lacks torchvision/timm, which the reference imports at
module scope; minimal stubs are installed so the import graph resolves.
Modules that would actually *use* those libraries (VGG perceptual loss,
HiT-SRF) are exercised only where the stub suffices.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference/HAT"
REF_BASICSR = "/root/reference/HAT/ESC"

_installed = False


def _make_mod(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__path__ = []  # mark as package so submodule imports resolve
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def naive_deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                        padding=(0, 0), dilation=(1, 1), mask=None):
    """Pure-torch torchvision.ops.deform_conv2d (DCNv2) — the oracle for our
    Pallas/XLA implementation AND the stub that lets the reference's
    DCN-based archs (EDVR, BasicVSR++) run on CPU. Implements torchvision's
    documented semantics: offset channel 2*(g*kk+k) is dy, +1 is dx; out-of-
    bounds bilinear corner taps are zero."""
    import torch

    def _pair(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, c, h, w = input.shape
    oc, _, kh, kw = weight.shape
    kk = kh * kw
    ho = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    wo = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    dg = offset.shape[1] // (2 * kk)
    cg = c // dg
    off = offset.view(b, dg, kk, 2, ho, wo).to(input.dtype)
    m = mask.view(b, dg, kk, ho, wo) if mask is not None else None

    oy = torch.arange(ho, dtype=input.dtype).view(1, ho, 1) * sh - ph
    ox = torch.arange(wo, dtype=input.dtype).view(1, 1, wo) * sw - pw

    def sample(img, py, px):
        # img (b,cg,h,w); py/px (b,ho,wo) -> (b,cg,ho,wo), zeros padding
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        fy = (py - y0).unsqueeze(1)
        fx = (px - x0).unsqueeze(1)
        out = 0.0
        for dy_i, wy in ((0, 1 - fy), (1, fy)):
            for dx_i, wx in ((0, 1 - fx), (1, fx)):
                yy = y0 + dy_i
                xx = x0 + dx_i
                valid = ((yy >= 0) & (yy <= h - 1) & (xx >= 0)
                         & (xx <= w - 1)).unsqueeze(1).to(img.dtype)
                yc = yy.clamp(0, h - 1).long()
                xc = xx.clamp(0, w - 1).long()
                bidx = torch.arange(b).view(b, 1, 1)
                v = img[bidx, :, yc, xc].permute(0, 3, 1, 2)
                out = out + v * valid * wy * wx
        return out

    cols = input.new_zeros(b, c, kk, ho, wo)
    for g in range(dg):
        img = input[:, g * cg:(g + 1) * cg]
        for k in range(kk):
            i, j = divmod(k, kw)
            py = oy + i * dh + off[:, g, k, 0]
            px = ox + j * dw + off[:, g, k, 1]
            val = sample(img, py, px)
            if m is not None:
                val = val * m[:, g, k].unsqueeze(1)
            cols[:, g * cg:(g + 1) * cg, k] = val
    out = torch.einsum("bckhw,ock->bohw", cols, weight.reshape(oc, c, kk))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install_stubs() -> None:
    global _installed
    if _installed:
        return
    import torch

    tv = _make_mod("torchvision")
    tvu = _make_mod("torchvision.utils", make_grid=lambda *a, **k: None)
    vgg_stub = _make_mod("torchvision.models.vgg")

    # functional vgg19 so basicsr's VGGFeatureExtractor (and DFDNet /
    # perceptual loss) can build with random weights on CPU
    import torch.nn as _nn

    _VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                  512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

    def _tv_vgg19(pretrained=False, **kwargs):
        layers = []
        in_ch = 3
        for v in _VGG19_CFG:
            if v == "M":
                layers.append(_nn.MaxPool2d(2, 2))
            else:
                layers += [_nn.Conv2d(in_ch, v, 3, padding=1),
                           _nn.ReLU(inplace=True)]
                in_ch = v

        class _VGG(_nn.Module):
            def __init__(self):
                super().__init__()
                self.features = _nn.Sequential(*layers)

        return _VGG()

    vgg_stub.vgg19 = _tv_vgg19

    # functional torchvision.models.inception so the reference's FID
    # InceptionV3 (basicsr/archs/inception.py) builds and runs on CPU with
    # random weights (FID subclasses override A/C/E forwards; the stub's
    # stem + B/D forwards and all module trees/shapes match torchvision)
    import torch.nn.functional as _F

    class _BasicConv2d(_nn.Module):
        def __init__(self, in_ch, out_ch, **kw):
            super().__init__()
            self.conv = _nn.Conv2d(in_ch, out_ch, bias=False, **kw)
            self.bn = _nn.BatchNorm2d(out_ch, eps=0.001)

        def forward(self, x):
            return _F.relu(self.bn(self.conv(x)), inplace=True)

    class _InceptionA(_nn.Module):
        def __init__(self, in_channels, pool_features, conv_block=None):
            super().__init__()
            cb = conv_block or _BasicConv2d
            self.branch1x1 = cb(in_channels, 64, kernel_size=1)
            self.branch5x5_1 = cb(in_channels, 48, kernel_size=1)
            self.branch5x5_2 = cb(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = cb(in_channels, 64, kernel_size=1)
            self.branch3x3dbl_2 = cb(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = cb(96, 96, kernel_size=3, padding=1)
            self.branch_pool = cb(in_channels, pool_features, kernel_size=1)

    class _InceptionB(_nn.Module):
        def __init__(self, in_channels, conv_block=None):
            super().__init__()
            cb = conv_block or _BasicConv2d
            self.branch3x3 = cb(in_channels, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = cb(in_channels, 64, kernel_size=1)
            self.branch3x3dbl_2 = cb(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = cb(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            a = self.branch3x3(x)
            b = self.branch3x3dbl_3(
                self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            c = _F.max_pool2d(x, kernel_size=3, stride=2)
            return torch.cat([a, b, c], 1)

    class _InceptionC(_nn.Module):
        def __init__(self, in_channels, channels_7x7, conv_block=None):
            super().__init__()
            cb = conv_block or _BasicConv2d
            c7 = channels_7x7
            self.branch1x1 = cb(in_channels, 192, kernel_size=1)
            self.branch7x7_1 = cb(in_channels, c7, kernel_size=1)
            self.branch7x7_2 = cb(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = cb(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = cb(in_channels, c7, kernel_size=1)
            self.branch7x7dbl_2 = cb(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = cb(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = cb(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = cb(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = cb(in_channels, 192, kernel_size=1)

    class _InceptionD(_nn.Module):
        def __init__(self, in_channels, conv_block=None):
            super().__init__()
            cb = conv_block or _BasicConv2d
            self.branch3x3_1 = cb(in_channels, 192, kernel_size=1)
            self.branch3x3_2 = cb(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = cb(in_channels, 192, kernel_size=1)
            self.branch7x7x3_2 = cb(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = cb(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = cb(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            a = self.branch3x3_2(self.branch3x3_1(x))
            b = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            c = _F.max_pool2d(x, kernel_size=3, stride=2)
            return torch.cat([a, b, c], 1)

    class _InceptionE(_nn.Module):
        def __init__(self, in_channels, conv_block=None):
            super().__init__()
            cb = conv_block or _BasicConv2d
            self.branch1x1 = cb(in_channels, 320, kernel_size=1)
            self.branch3x3_1 = cb(in_channels, 384, kernel_size=1)
            self.branch3x3_2a = cb(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = cb(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = cb(in_channels, 448, kernel_size=1)
            self.branch3x3dbl_2 = cb(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = cb(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = cb(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = cb(in_channels, 192, kernel_size=1)

    class _Inception3(_nn.Module):
        def __init__(self, num_classes=1000, aux_logits=True):
            super().__init__()
            self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = _InceptionA(192, pool_features=32)
            self.Mixed_5c = _InceptionA(256, pool_features=64)
            self.Mixed_5d = _InceptionA(288, pool_features=64)
            self.Mixed_6a = _InceptionB(288)
            self.Mixed_6b = _InceptionC(768, channels_7x7=128)
            self.Mixed_6c = _InceptionC(768, channels_7x7=160)
            self.Mixed_6d = _InceptionC(768, channels_7x7=160)
            self.Mixed_6e = _InceptionC(768, channels_7x7=192)
            self.Mixed_7a = _InceptionD(768)
            self.Mixed_7b = _InceptionE(1280)
            self.Mixed_7c = _InceptionE(2048)
            self.fc = _nn.Linear(2048, num_classes)

    def _tv_inception_v3(num_classes=1000, aux_logits=True, pretrained=False,
                         init_weights=None, **kwargs):
        assert not pretrained, "stub has no pretrained weights"
        return _Inception3(num_classes=num_classes, aux_logits=aux_logits)

    inception_stub = _make_mod(
        "torchvision.models.inception", BasicConv2d=_BasicConv2d,
        InceptionA=_InceptionA, InceptionB=_InceptionB,
        InceptionC=_InceptionC, InceptionD=_InceptionD,
        InceptionE=_InceptionE, Inception3=_Inception3,
        inception_v3=_tv_inception_v3)
    tvm = _make_mod("torchvision.models", vgg=vgg_stub,
                    inception=inception_stub, inception_v3=_tv_inception_v3)
    tvt = _make_mod("torchvision.transforms")
    tvtf = _make_mod("torchvision.transforms.functional",
                     normalize=lambda *a, **k: None)
    tvt.functional = tvtf
    tv.utils, tv.models, tv.transforms = tvu, tvm, tvt
    tv.__version__ = "0.15.0"
    tvo = _make_mod("torchvision.ops", deform_conv2d=naive_deform_conv2d)
    tv.ops = tvo

    # timm.layers for hitsrf_arch: provide real tiny implementations.
    timm = _make_mod("timm")
    import torch.nn as nn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = keep + torch.rand((x.shape[0],) + (1,) * (x.ndim - 1),
                                     dtype=x.dtype, device=x.device)
            return x / keep * mask.floor_()

    timm_layers = _make_mod("timm.layers", DropPath=DropPath,
                            to_2tuple=to_2tuple, trunc_normal_=trunc_normal_)
    timm.layers = timm_layers
    _make_mod("timm.models")
    sys.modules["timm.models.layers"] = timm_layers

    # CPU-only environment: DySample passes pin_memory=True to torch.tensor
    # (esc_real_arch.py:376) which requires an accelerator; strip it.
    _orig_tensor = torch.tensor

    def _tensor_no_pin(*args, **kwargs):
        kwargs.pop("pin_memory", None)
        return _orig_tensor(*args, **kwargs)

    if not getattr(torch.tensor, "_no_pin_wrapper", False):
        _tensor_no_pin._no_pin_wrapper = True
        torch.tensor = _tensor_no_pin

    # torch 2.13 dropped torch.nn.functional.rgb_to_grayscale
    if not hasattr(torch.nn.functional, "rgb_to_grayscale"):
        def rgb_to_grayscale(img, num_output_channels=1):
            w = torch.tensor([0.299, 0.587, 0.114], dtype=img.dtype, device=img.device)
            gray = (img * w.view(-1, 1, 1)).sum(-3, keepdim=True)
            if num_output_channels > 1:
                gray = gray.expand(*img.shape[:-3], num_output_channels, *img.shape[-2:])
            return gray
        torch.nn.functional.rgb_to_grayscale = rgb_to_grayscale

    for p in (REF_BASICSR, REF_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)

    # Path-only package shims: the real basicsr/hat __init__ files eagerly
    # auto-import every arch/dataset/model module (slow: tens of seconds,
    # and hat/__init__ even hits a latent ImportError in
    # imagenet_paired_dataset.py:10). Registering namespace-style packages
    # lets tests import exactly the submodule under test.
    shims = {
        "basicsr": f"{REF_BASICSR}/basicsr",
        "basicsr.archs": f"{REF_BASICSR}/basicsr/archs",
        "basicsr.data": f"{REF_BASICSR}/basicsr/data",
        "basicsr.models": f"{REF_BASICSR}/basicsr/models",
        "basicsr.losses": f"{REF_BASICSR}/basicsr/losses",
        "basicsr.metrics": f"{REF_BASICSR}/basicsr/metrics",
        "hat": f"{REF_ROOT}/hat",
        "hat.archs": f"{REF_ROOT}/hat/archs",
        "hat.data": f"{REF_ROOT}/hat/data",
        "hat.models": f"{REF_ROOT}/hat/models",
    }
    for name, path in shims.items():
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m

    # The fused_act CUDA extension has no CPU fallback (unlike upfirdn2d's
    # _native path); patch in a pure-torch equivalent so StyleGAN2 runs.
    import basicsr.ops.fused_act as _fa_pkg
    import basicsr.ops.fused_act.fused_act as _fa

    def _fused_leaky_relu_cpu(input, bias, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            input = input + bias.view(1, -1, *([1] * (input.ndim - 2)))
        return torch.nn.functional.leaky_relu(input, negative_slope) * scale

    _fa.fused_leaky_relu = _fused_leaky_relu_cpu
    _fa_pkg.fused_leaky_relu = _fused_leaky_relu_cpu
    _installed = True


def get_hat_arch():
    install_stubs()
    from hat.archs import hat_arch
    return hat_arch


def get_hat_model():
    """Import the reference's model layer (hat.models.hat_model.HATModel)
    with the registry factories wired onto the namespace-shimmed packages
    — enables running the reference's validation pipeline
    (basicsr/test.py::test_pipeline + HATModel.nondist_validation
    semantics) as a system-level oracle."""
    install_stubs()
    from copy import deepcopy

    get_hat_arch()  # registers HAT in ARCH_REGISTRY
    from basicsr.utils.registry import (ARCH_REGISTRY, LOSS_REGISTRY,
                                        METRIC_REGISTRY)

    archs_mod = sys.modules["basicsr.archs"]
    if not hasattr(archs_mod, "build_network"):
        def build_network(opt):
            opt = deepcopy(opt)
            return ARCH_REGISTRY.get(opt.pop("type"))(**opt)

        archs_mod.build_network = build_network

    losses_mod = sys.modules["basicsr.losses"]
    if not hasattr(losses_mod, "build_loss"):
        def build_loss(opt):
            opt = deepcopy(opt)
            return LOSS_REGISTRY.get(opt.pop("type"))(**opt)

        losses_mod.build_loss = build_loss

    metrics_mod = sys.modules["basicsr.metrics"]
    if not hasattr(metrics_mod, "calculate_metric"):
        import basicsr.metrics.psnr_ssim  # noqa: F401  (registers)

        def calculate_metric(data, opt):
            opt = deepcopy(opt)
            return METRIC_REGISTRY.get(opt.pop("type"))(**data, **opt)

        metrics_mod.calculate_metric = calculate_metric

    from hat.models import hat_model
    return hat_model


def get_esc_arch():
    install_stubs()
    from hat.archs import esc_arch
    return esc_arch


def get_swinir_arch():
    install_stubs()
    from basicsr.archs import swinir_arch
    return swinir_arch


def get_basicsr():
    install_stubs()
    import basicsr
    return basicsr
