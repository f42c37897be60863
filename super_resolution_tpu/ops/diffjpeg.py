"""Differentiable JPEG compression (jax, NHWC).

Behavioral rebuild of the reference's DiffJPEG (ref:
basicsr/utils/diffjpeg.py:449-492, itself from mlomnitz/DiffJPEG): JPEG
YCbCr conversion, 2x2 chroma subsampling, 8x8 orthonormal DCT-II, standard
luminance/chrominance quantization tables scaled by the quality factor,
(differentiable) rounding, then the exact inverse path. Used by the
real-world degradation synthesis inside the jitted train step.

The reference expresses the DCT as a 4D tensordot; here it is the separable
O B O^T form (O = orthonormal DCT-II matrix) — two 8x8 matmuls per block,
batched over all blocks on the MXU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# standard JPEG quantization tables (Annex K), stored TRANSPOSED to match
# the reference implementation's orientation (diffjpeg.py:14-23 applies .T;
# quantization parity requires the same quirk)
Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float32).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]],
                           dtype=np.float32).T


def _dct_ortho_matrix() -> np.ndarray:
    """Orthonormal DCT-II matrix O (8x8): O[u, x] = a_u/2 cos((2x+1)u pi/16)."""
    x = np.arange(8)
    u = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    alpha = np.ones(8)
    alpha[0] = 1 / np.sqrt(2)
    return (alpha[:, None] / 2.0 * c).astype(np.float32)


_O = _dct_ortho_matrix()

_RGB2YCBCR = np.array([[0.299, 0.587, 0.114],
                       [-0.168736, -0.331264, 0.5],
                       [0.5, -0.418688, -0.081312]], dtype=np.float32)
_YCBCR_SHIFT = np.array([0.0, 128.0, 128.0], dtype=np.float32)
_YCBCR2RGB = np.array([[1.0, 0.0, 1.402],
                       [1.0, -0.344136, -0.714136],
                       [1.0, 1.772, 0.0]], dtype=np.float32)


def diff_round(x):
    """round(x) + (x - round(x))^3 — identity gradient at integer points
    (ref: diffjpeg.py:26-29)."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality):
    """JPEG quality (1..100) -> quant-table scale factor (ref: :32-45)."""
    q = jnp.asarray(quality, jnp.float32)
    return jnp.where(q < 50, 5000.0 / q, 200.0 - 2.0 * q) / 100.0


def _to_blocks(x):
    """(B, H, W) -> (B, nb, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _from_blocks(x, h: int, w: int):
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def _dct(blocks):
    o = jnp.asarray(_O)
    return jnp.einsum("ux,bnxy,vy->bnuv", o, blocks - 128.0, o)


def _idct(coefs):
    # B = O^T F O with orthonormal O: the alpha weights attach to the
    # frequency indices (u, v), i.e. contract o[u, x], not o.T
    o = jnp.asarray(_O)
    return jnp.einsum("ux,bnuv,vy->bnxy", o, coefs, o) + 128.0


def _quant_channel(plane, table, factor, rounding):
    """plane (B, H, W) -> quantized blocks (B, nb, 8, 8)."""
    blocks = _dct(_to_blocks(plane))
    t = jnp.asarray(table)[None, None] * factor[:, None, None, None]
    return rounding(blocks / t), t


def jpeg_compress_decompress(img, quality, differentiable: bool = True):
    """Round-trip JPEG on NHWC RGB [0,1].

    Args:
      img: (B, H, W, 3); quality: scalar or (B,) JPEG quality.
    Returns (B, H, W, 3) in [0,1].
    """
    b, h, w, _ = img.shape
    factor = quality_to_factor(jnp.broadcast_to(jnp.asarray(quality,
                                                            jnp.float32), (b,)))
    rounding = diff_round if differentiable else jnp.round

    pad_h = (-h) % 16
    pad_w = (-w) % 16
    if pad_h or pad_w:
        img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = img.shape[1], img.shape[2]

    # RGB -> JPEG YCbCr on the 255 scale
    x = img * 255.0
    ycc = x @ jnp.asarray(_RGB2YCBCR).T + jnp.asarray(_YCBCR_SHIFT)
    y = ycc[..., 0]
    # 2x2 average chroma subsampling
    cb = ycc[..., 1].reshape(b, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))
    cr = ycc[..., 2].reshape(b, hp // 2, 2, wp // 2, 2).mean(axis=(2, 4))

    yq, yt = _quant_channel(y, Y_TABLE, factor, rounding)
    cbq, ct = _quant_channel(cb, C_TABLE, factor, rounding)
    crq, _ = _quant_channel(cr, C_TABLE, factor, rounding)

    # decompress: dequant + idct + merge
    y_rec = _from_blocks(_idct(yq * yt), hp, wp)
    cb_rec = _from_blocks(_idct(cbq * ct), hp // 2, wp // 2)
    cr_rec = _from_blocks(_idct(crq * ct), hp // 2, wp // 2)

    # nearest chroma upsampling (repeat 2x2)
    cb_up = jnp.repeat(jnp.repeat(cb_rec, 2, axis=1), 2, axis=2)
    cr_up = jnp.repeat(jnp.repeat(cr_rec, 2, axis=1), 2, axis=2)

    ycc_rec = jnp.stack([y_rec, cb_up - 128.0, cr_up - 128.0], axis=-1)
    rgb = ycc_rec @ jnp.asarray(_YCBCR2RGB).T
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]
