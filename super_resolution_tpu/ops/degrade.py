"""On-device degradation ops for real-world SR training (NHWC, jax).

Device-side counterparts of the reference's GPU degradation ops
(ref: basicsr/utils/img_process_util.py filter2D:7 / USMSharp:63;
basicsr/data/degradations.py *_pt noise ops :496-734): per-sample blur,
Gaussian/Poisson noise, USM sharpening, and the random-resize family —
all pure functions of explicit PRNG keys so the whole degradation
synthesis jits into the train step.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def filter2d_batch(img, kernels):
    """Per-sample 2D filtering with reflect padding.

    Args:
      img: (B, H, W, C); kernels: (B, k, k) or (1, k, k) shared.
    Returns (B, H, W, C) — each sample cross-correlated with its kernel on
    every channel (ref: img_process_util.py::filter2D).
    """
    b, h, w, c = img.shape
    k = kernels.shape[-1]
    if k % 2 != 1:
        raise ValueError("Wrong kernel size")
    pad = k // 2
    imgp = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")
    if kernels.shape[0] == 1:
        kern = kernels[0][:, :, None, None] * jnp.ones((1, 1, 1, c))
        return lax.conv_general_dilated(
            imgp, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    # batch-into-groups: (1, H, W, B*C) with one depthwise kernel per (b, c)
    ph, pw = imgp.shape[1], imgp.shape[2]
    x = imgp.transpose(1, 2, 0, 3).reshape(1, ph, pw, b * c)
    kern = jnp.repeat(kernels[:, :, :, None], c, axis=3)  # (B, k, k, C)
    kern = kern.transpose(1, 2, 0, 3).reshape(k, k, 1, b * c)
    out = lax.conv_general_dilated(
        x, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def _gray_weights(dtype):
    return jnp.asarray([0.299, 0.587, 0.114], dtype)


def random_gaussian_noise(key, img, sigma_range=(0, 10), gray_prob=0.0):
    """Per-sample sigma in sigma_range (measured on the 255 scale), with
    probability gray_prob the noise is luminance-only
    (ref: degradations.py:540-556)."""
    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma = jax.random.uniform(k1, (b, 1, 1, 1), minval=sigma_range[0],
                               maxval=sigma_range[1]) / 255.0
    noise = jax.random.normal(k2, img.shape, img.dtype) * sigma
    gray_noise = jax.random.normal(k3, img.shape[:3] + (1,), img.dtype) * sigma
    is_gray = (jax.random.uniform(k4, (b, 1, 1, 1)) < gray_prob)
    return jnp.where(is_gray, gray_noise, noise)


def add_gaussian_noise(key, img, sigma_range=(0, 10), gray_prob=0.0,
                       clip=True, rounds=False):
    out = img + random_gaussian_noise(key, img, sigma_range, gray_prob)
    return _clip_round(out, clip, rounds)


def random_poisson_noise(key, img, scale_range=(0, 1.0), gray_prob=0.0):
    """Per-sample Poisson (shot) noise scaled by scale_range
    (ref: degradations.py:613-658): vals = 10^ceil(log10(#unique)) in the
    reference; jit-compatible approximation uses the 256-level count the
    rounded image actually has."""
    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(k1, (b, 1, 1, 1), minval=scale_range[0],
                               maxval=scale_range[1])

    def shot(key, x):
        x = jnp.clip(jnp.round(x * 255.0), 0, 255) / 255.0
        vals = 1024.0  # 2^ceil(log2(256)) analog of the reference's 10^#levels
        noisy = jax.random.poisson(key, x * vals).astype(x.dtype) / vals
        return noisy - x

    noise = shot(k2, img)
    gray = jnp.mean(img * _gray_weights(img.dtype), axis=-1, keepdims=True)
    gray_noise = shot(k3, gray)
    is_gray = (jax.random.uniform(k4, (b, 1, 1, 1)) < gray_prob)
    return jnp.where(is_gray, gray_noise, noise) * scale


def add_poisson_noise(key, img, scale_range=(0, 1.0), gray_prob=0.0,
                      clip=True, rounds=False):
    out = img + random_poisson_noise(key, img, scale_range, gray_prob)
    return _clip_round(out, clip, rounds)


def _clip_round(out, clip: bool, rounds: bool):
    if clip and rounds:
        return jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0
    if clip:
        return jnp.clip(out, 0, 1)
    if rounds:
        return jnp.round(out * 255.0) / 255.0
    return out


def _cubic_torch(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch bicubic convolution kernel (A = -0.75)."""
    at = np.abs(t)
    return np.where(
        at <= 1, (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1,
        np.where(at < 2, a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a,
                 0.0))


def _torch_resize_plan(in_size: int, out_size: int, mode: str):
    """(weights [out, taps], indices [out, taps]) replicating
    torch.nn.functional.interpolate semantics (align_corners=False)."""
    if mode == "area":
        # adaptive average pooling: integer cell boundaries, equal weights
        starts = np.floor(np.arange(out_size) * in_size / out_size).astype(int)
        ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(int)
        taps = int((ends - starts).max())
        idx = starts[:, None] + np.arange(taps)[None, :]
        valid = idx < ends[:, None]
        idx = np.clip(idx, 0, in_size - 1)
        w = valid.astype(np.float64)
        w /= w.sum(axis=1, keepdims=True)
        return w, idx
    if mode == "nearest":
        # torch F.interpolate nearest: index floor(i * in / out)
        idx = (np.arange(out_size) * in_size // out_size)[:, None]
        return np.ones((out_size, 1)), np.clip(idx, 0, in_size - 1)
    scale = in_size / out_size
    u = (np.arange(out_size) + 0.5) * scale - 0.5
    if mode == "bilinear":
        i0 = np.floor(u).astype(int)
        frac = u - i0
        idx = np.stack([i0, i0 + 1], axis=1)
        w = np.stack([1 - frac, frac], axis=1)
    elif mode == "bicubic":
        i0 = np.floor(u).astype(int)
        frac = u - i0
        idx = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=1)
        w = np.stack([_cubic_torch(frac + 1), _cubic_torch(frac),
                      _cubic_torch(1 - frac), _cubic_torch(2 - frac)], axis=1)
    else:
        raise ValueError(f"Unknown resize mode {mode}")
    idx = np.clip(idx, 0, in_size - 1)  # border replicate, torch behavior
    return w, idx


def resize_to(img, out_h: int, out_w: int, mode: str):
    """Resize NHWC with torch.nn.functional.interpolate parity
    (align_corners=False; 'area' = adaptive average pooling), expressed as
    two gather-contractions (plans baked at trace time)."""
    in_h, in_w = img.shape[1], img.shape[2]
    wh, ih = _torch_resize_plan(in_h, out_h, mode)
    ww, iw = _torch_resize_plan(in_w, out_w, mode)
    wh = jnp.asarray(wh, img.dtype)
    ww = jnp.asarray(ww, img.dtype)
    x = jnp.einsum("botwc,ot->bowc", img[:, ih], wh)
    return jnp.einsum("bhotc,ot->bhoc", x[:, :, iw], ww)


def usm_gaussian_kernel(radius: int = 50, sigma: float = 0) -> np.ndarray:
    """cv2.getGaussianKernel-compatible separable kernel (sigma=0 derives
    sigma from the size, ref: img_process_util.py USMSharp.__init__)."""
    if radius % 2 == 0:
        radius += 1
    if sigma <= 0:
        sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8
    x = np.arange(radius, dtype=np.float64) - (radius - 1) / 2.0
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k = (k / k.sum()).astype(np.float32)
    return np.outer(k, k)


def usm_sharp(img, kernel, weight: float = 0.5, threshold: float = 10.0):
    """Unsharp masking with a soft threshold mask
    (ref: img_process_util.py:63-85): sharp = clip(I + w*(I - blur));
    out = softmask * sharp + (1 - softmask) * I."""
    kern = jnp.asarray(kernel)[None]
    blur = filter2d_batch(img, kern)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d_batch(mask, kern)
    sharp = jnp.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img
