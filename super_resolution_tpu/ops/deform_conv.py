"""Modulated deformable convolution (DCNv2) — TPU-native.

Replaces the reference's CUDA extension (ref: basicsr/ops/dcn/src/
deform_conv_cuda_kernel.cu; python wrapper basicsr/ops/dcn/deform_conv.py)
and torchvision.ops.deform_conv2d, which the reference prefers when
available (ref: basicsr/archs/arch_util.py:205-231 DCNv2Pack.forward).

TPU design: the CUDA kernel is a fused bilinear-im2col + GEMM. Here the
im2col is expressed as kh*kw vectorized bilinear gathers (VPU) into a
(B, Ho, Wo, kk, Cin) column tensor, and the contraction with the weights is
ONE einsum -> a single large MXU matmul. Offset/mask channel layout follows
torchvision exactly: for deformable group g and kernel tap k = i*kw + j,
offset channel 2*(g*kk + k) is dy and 2*(g*kk + k)+1 is dx; out-of-bounds
corner taps contribute zero.
"""

from __future__ import annotations

import jax.numpy as jnp

from super_resolution_tpu.ops.grid_sample import _bilinear_gather


def modulated_deform_conv2d(x, offset, mask, weight_oihw, bias=None,
                            stride: int = 1, padding: int = 1,
                            dilation: int = 1, deformable_groups: int = 1):
    """NHWC DCNv2 forward.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, 2*dg*kh*kw) — torchvision layout (see module doc).
      mask: (B, Ho, Wo, dg*kh*kw) — modulation scalars (post-sigmoid), or
        None for DCNv1 semantics.
      weight_oihw: (Cout, Cin, kh, kw) torch-layout weights (groups=1).
    Returns:
      (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    cout, cin_w, kh, kw = weight_oihw.shape
    assert cin_w == cin, "grouped deform conv not supported (reference uses groups=1)"
    kk = kh * kw
    dg = deformable_groups
    cg = cin // dg
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # sampling coordinates: (B, Ho, Wo, dg, kk)
    off = offset.reshape(b, ho, wo, dg, kk, 2)
    oy, ox = jnp.meshgrid(jnp.arange(ho, dtype=x.dtype),
                          jnp.arange(wo, dtype=x.dtype), indexing="ij")
    ky, kx = jnp.meshgrid(jnp.arange(kh, dtype=x.dtype),
                          jnp.arange(kw, dtype=x.dtype), indexing="ij")
    base_y = oy[:, :, None] * stride - padding + ky.reshape(-1) * dilation
    base_x = ox[:, :, None] * stride - padding + kx.reshape(-1) * dilation
    iy = base_y[None, :, :, None, :] + off[..., 0]   # (B,Ho,Wo,dg,kk)
    ix = base_x[None, :, :, None, :] + off[..., 1]

    # fold the deformable-group axis into batch for one vectorized gather
    xg = x.reshape(b, h, w, dg, cg).transpose(0, 3, 1, 2, 4) \
          .reshape(b * dg, h, w, cg)
    iyg = iy.transpose(0, 3, 1, 2, 4).reshape(b * dg, ho, wo, kk)
    ixg = ix.transpose(0, 3, 1, 2, 4).reshape(b * dg, ho, wo, kk)
    cols = _bilinear_gather(xg, ixg, iyg, "zeros")   # (B*dg,Ho,Wo,kk,cg)

    if mask is not None:
        mg = mask.reshape(b, ho, wo, dg, kk).transpose(0, 3, 1, 2, 4) \
                 .reshape(b * dg, ho, wo, kk)
        cols = cols * mg[..., None]

    # (B,Ho,Wo,kk,Cin) columns @ (Cout,kk,Cin) weights -> one MXU matmul
    cols = cols.reshape(b, dg, ho, wo, kk, cg).transpose(0, 2, 3, 4, 1, 5) \
               .reshape(b, ho, wo, kk, cin)
    wr = weight_oihw.transpose(0, 2, 3, 1).reshape(cout, kk, cin)
    out = jnp.einsum("bhwkc,okc->bhwo", cols, wr)
    if bias is not None:
        out = out + bias
    return out


def dcn_offset_mask_from_conv(conv_out, deformable_groups: int):
    """Split a conv_offset output into (offset, mask) exactly like DCNv2Pack
    (ref: arch_util.py:216-219): chunk into thirds o1|o2|m along channels,
    offset = concat(o1, o2), mask = sigmoid(m)."""
    import jax.nn as jnn

    o1, o2, m = jnp.split(conv_out, 3, axis=-1)
    return jnp.concatenate([o1, o2], axis=-1), jnn.sigmoid(m)
