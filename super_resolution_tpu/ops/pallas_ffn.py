"""Pallas fused gated depthwise-conv FFN (fork-HAT's MLP replacement).

Computes fc2(glu(dw3x3(fc1(x)))) — ref: hat/archs/hat_arch.py:95-119 —
in one VMEM-resident pass per row tile. The XLA path materializes every
intermediate in HBM (fc1 out, dw out, gated product); the fused kernel
reads x and writes out only.

Semantics (verified vs the flax module in tests/test_pallas_ffn.py):
  h   = x @ w1 + b1                    # (.., 2M)
  d   = depthwise3x3(h, wd) + bd       # zero-padded at image borders
  g   = d[..., :M] * silu(d[..., M:])
  out = g @ w2 + b2                    # (.., C)

Layout: grid over (batch, row-tiles). The 1-row halo needed by the 3x3
depthwise conv is obtained by passing x THREE times with row-shifted
BlockSpec index maps (prev/cur/next tile) — the Pallas pipeline double-
buffers those block fetches automatically, unlike a manual in-kernel DMA
(the v1 design), which serialized a blocking copy per program. fc1 runs
on the tile rows plus one halo row each side; rows outside the image are
zero-masked (the dw conv pads its INPUT with zeros, and fc1(0) != 0
because of the bias). bf16 operands, f32 accumulation on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ffn_kernel(xp, xc, xn, gam_ref, bet_ref, w1_ref, b1_ref, wd_ref, bd_ref,
                w2_ref, b2_ref, o_ref, hs, *, th: int, h_img: int, w_img: int,
                ln: bool, residual: bool, eps: float):
    i = pl.program_id(1)
    r0 = i * th                       # first image row of this tile
    c = xc.shape[-1]
    m2 = w1_ref.shape[-1]
    m = m2 // 2

    w1 = w1_ref[...]
    b1 = b1_ref[0].astype(jnp.float32)

    def pre(rows2d):
        """Optional fused LayerNorm (f32 stats over the lane/channel dim)."""
        if not ln:
            return rows2d
        xf = rows2d.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xd = xf - mu
        var = jnp.mean(xd * xd, axis=-1, keepdims=True)
        y = xd * jax.lax.rsqrt(var + eps)
        y = y * gam_ref[0].astype(jnp.float32) + bet_ref[0].astype(jnp.float32)
        return y.astype(rows2d.dtype)

    def fc1(rows2d):
        return (jax.lax.dot_general(
            pre(rows2d), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1).astype(hs.dtype)

    # fc1 output goes straight to the bf16 halo scratch — no separate f32
    # tile-sized temporary (scoped-VMEM OOM at th=8 otherwise)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) + r0
    mask = (rows < h_img).astype(hs.dtype)
    h_cur = fc1(xc[0].reshape(th * w_img, c)).reshape(th, w_img, m2) * mask
    # halo rows: last row of the prev tile / first row of the next tile
    # (the index maps clamp at the grid edges; the masks zero them there)
    h_top = jnp.where(r0 >= 1, fc1(xp[0, th - 1]),
                      jnp.zeros((w_img, m2), hs.dtype))
    h_bot = jnp.where(r0 + th < h_img, fc1(xn[0, 0]),
                      jnp.zeros((w_img, m2), hs.dtype))

    # zero-padded columns: write into hs[:, 1:w+1], borders stay zero
    hs[:, 0] = jnp.zeros((th + 2, m2), hs.dtype)
    hs[:, w_img + 1] = jnp.zeros((th + 2, m2), hs.dtype)
    hs[0, 1:w_img + 1] = h_top
    hs[pl.ds(1, th), 1:w_img + 1] = h_cur
    hs[th + 1, 1:w_img + 1] = h_bot

    # depthwise 3x3 on the tile's th interior rows
    wd = wd_ref[...].astype(jnp.float32)              # (3, 3, 2M)
    acc = jnp.zeros((th, w_img, m2), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = hs[pl.ds(dy, th), pl.ds(dx, w_img)]  # (th, W, 2M)
            acc = acc + sl.astype(jnp.float32) * wd[dy, dx]
    acc = acc + bd_ref[0].astype(jnp.float32)

    g = acc[..., :m] * jax.nn.sigmoid(acc[..., m:]) * acc[..., m:]
    out = jax.lax.dot_general(
        g.reshape(th * w_img, m).astype(xc.dtype), w2_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    if residual:    # y = x + FFN(LN(x)); requires C_out == C
        out = out + xc[0].reshape(th * w_img, c).astype(jnp.float32)
    o_ref[0] = out.reshape(th, w_img, o_ref.shape[-1]).astype(o_ref.dtype)


def _run(x, gamma, beta, w1, b1, wd, bd, w2, b2, *, ln: bool, residual: bool,
         eps: float, tile_rows: int, interpret):
    b, h, w, c = x.shape
    m2 = w1.shape[1]
    c_out = w2.shape[1]
    if residual and c_out != c:
        raise ValueError(f"residual needs C_out == C, got {c_out} != {c}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th = tile_rows
    pad_r = (-h) % th
    if pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
    hp = x.shape[1]
    nt = hp // th

    grid = (b, nt)
    row_block = lambda off: pl.BlockSpec(
        (1, th, w, c),
        lambda b_, i: (b_, jnp.clip(i + off, 0, nt - 1), 0, 0),
        memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda b_, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, th=th, h_img=h, w_img=w,
                          ln=ln, residual=residual, eps=eps),
        grid=grid,
        in_specs=[
            row_block(-1), row_block(0), row_block(+1),
            vec(c), vec(c),
            pl.BlockSpec((c, m2), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(m2),
            pl.BlockSpec((3, 3, m2), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(m2),
            pl.BlockSpec((m2 // 2, c_out), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(c_out),
        ],
        out_specs=pl.BlockSpec((1, th, w, c_out), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w + 2, m2), x.dtype),    # padded fc1 out
        ],
        interpret=interpret,
    )(x, x, x, gamma.reshape(1, c), beta.reshape(1, c),
      w1, b1.reshape(1, m2), wd, bd.reshape(1, m2), w2,
      b2.reshape(1, c_out))
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def gated_dconv_ffn(x, w1, b1, wd, bd, w2, b2, *, tile_rows: int = 4,
                    interpret: bool | None = None):
    """Fused FFN forward.

    Args:
      x: (B, H, W, C); w1 (C, 2M), b1 (2M,); wd (3, 3, 2M), bd (2M,);
      w2 (M, C_out), b2 (C_out,).
    Returns:
      (B, H, W, C_out) in x.dtype.
    """
    c = x.shape[-1]
    one = jnp.ones((c,), x.dtype)
    return _run(x, one, one, w1, b1, wd, bd, w2, b2, ln=False,
                residual=False, eps=0.0, tile_rows=tile_rows,
                interpret=interpret)


@functools.partial(jax.jit, static_argnames=("eps", "tile_rows", "interpret"))
def gated_dconv_ffn_block(x, gamma, beta, w1, b1, wd, bd, w2, b2, *,
                          eps: float = 1e-5, tile_rows: int = 4,
                          interpret: bool | None = None):
    """Fused  x + FFN(LayerNorm(x))  — the full HAB mlp residual
    (ref: hat_arch.py:237) in one VMEM pass: LN stats in f32 over the
    channel (lane) dim, fc1/fc2 on the MXU, 3x3 depthwise + SiLU-GLU on
    the VPU, residual added before the single output write."""
    return _run(x, gamma, beta, w1, b1, wd, bd, w2, b2, ln=True,
                residual=True, eps=eps, tile_rows=tile_rows,
                interpret=interpret)


def ffn_reference(x, w1, b1, wd, bd, w2, b2):
    """Unfused jnp composition (identical math; backward path + oracle)."""
    from jax import lax

    h = x @ w1 + b1
    d = lax.conv_general_dilated(
        h, wd[:, :, None, :], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=wd.shape[-1]) + bd
    m = wd.shape[-1] // 2
    g = d[..., :m] * jax.nn.silu(d[..., m:])
    return g @ w2 + b2


@jax.custom_vjp
def gated_dconv_ffn_ad(x, w1, b1, wd, bd, w2, b2):
    """Fused forward, XLA backward (pallas_call is not differentiable;
    training crops are small so the unfused backward is cheap)."""
    return gated_dconv_ffn(x, w1, b1, wd, bd, w2, b2)


def _ffn_ad_fwd(x, w1, b1, wd, bd, w2, b2):
    return gated_dconv_ffn(x, w1, b1, wd, bd, w2, b2), (x, w1, b1, wd, bd,
                                                        w2, b2)


def _ffn_ad_bwd(res, g):
    _, vjp = jax.vjp(ffn_reference, *res)
    return vjp(g.astype(res[0].dtype))


gated_dconv_ffn_ad.defvjp(_ffn_ad_fwd, _ffn_ad_bwd)


def ffn_block_reference(x, gamma, beta, w1, b1, wd, bd, w2, b2,
                        eps: float = 1e-5):
    """Unfused x + FFN(LN(x)) (backward path + oracle)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xd = xf - mu
    var = jnp.mean(xd * xd, axis=-1, keepdims=True)
    y = (xd * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
         + beta.astype(jnp.float32)).astype(x.dtype)
    return x + ffn_reference(y, w1, b1, wd, bd, w2, b2)


@jax.custom_vjp
def gated_dconv_ffn_block_ad(x, gamma, beta, w1, b1, wd, bd, w2, b2):
    """Fused forward, XLA backward."""
    return gated_dconv_ffn_block(x, gamma, beta, w1, b1, wd, bd, w2, b2)


def _blk_fwd(x, gamma, beta, w1, b1, wd, bd, w2, b2):
    args = (x, gamma, beta, w1, b1, wd, bd, w2, b2)
    return gated_dconv_ffn_block(*args), args


def _blk_bwd(res, g):
    _, vjp = jax.vjp(ffn_block_reference, *res)
    return vjp(g.astype(res[0].dtype))


gated_dconv_ffn_block_ad.defvjp(_blk_fwd, _blk_bwd)


def ffn_fused_enabled(ignore_tp: bool = False) -> bool:
    """Route HAB mlp residuals through the fused block kernel on TPU
    (SR_TPU_FFN=fused|xla overrides).

    ignore_tp: answer "would the fused route be on, TP aside" — used by the
    arch routing to decide the hidden-parallel shard_map composition
    (parallel/tp_ffn.py) when the fc1/fc2 weights are kept replicated."""
    import os

    import jax

    from super_resolution_tpu.parallel.tp import tp_active

    if tp_active() and not ignore_tp:
        # under tensor parallelism with Megatron-sharded fc1/fc2 the XLA
        # path lets GSPMD contract them sharded (a pallas_call would
        # all-gather them every block); with replicated mlp weights the
        # hidden-parallel composition routes explicitly via ignore_tp
        return False
    mode = os.environ.get("SR_TPU_FFN", "auto").lower()
    if mode == "fused":
        return True
    if mode == "xla":
        return False
    # Measured on v5e (scripts/compare_ffn.py, B8 320x320x180 bf16,
    # fori-amortized protocol): x + FFN(LN(x)) block XLA 17.83 ms vs
    # fused 13.33 ms (-25%). The v1 manual-DMA kernel was neutral; v2's
    # row-shifted BlockSpec pipeline + bf16 halo scratch + th=4 (scoped
    # VMEM cap) is what wins.
    return jax.default_backend() == "tpu"


def _mlp_tail_math(xf, dtype, gam_ref, bet_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, eps: float, residual_scale: float = 1.0):
    """Shared VMEM tail:  residual_scale*xf + fc2(gelu(fc1(LN(xf))))  with
    f32 stats/accum. xf: (rows, C) f32. Returns (rows, C) f32.
    residual_scale != 1 serves the hidden-parallel TP workers
    (parallel/tp_ffn.py): each of N devices computes its hidden-slice MLP
    partial plus xf/N, so the psum reassembles exactly one residual."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xd = xf - mu
    var = jnp.mean(xd * xd, axis=-1, keepdims=True)
    y = (xd * jax.lax.rsqrt(var + eps)
         * gam_ref[0].astype(jnp.float32)
         + bet_ref[0].astype(jnp.float32)).astype(dtype)
    h = jax.lax.dot_general(
        y, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    # exact-erf GELU via the A&S approximation (Mosaic has no erf)
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    z = h * (2.0 ** -0.5)
    s = jnp.sign(z)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + p * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    g = 0.5 * h * (1.0 + s * (1.0 - poly * jnp.exp(-az * az)))
    out = jax.lax.dot_general(
        g.astype(dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    if residual_scale == 1.0:
        return out + xf
    return out + xf * residual_scale


def _mlp_kernel(xc, gam_ref, bet_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, eps: float, residual_scale: float = 1.0):
    c = xc.shape[-1]
    rows = xc[0].reshape(-1, c)
    out = _mlp_tail_math(rows.astype(jnp.float32), rows.dtype, gam_ref,
                         bet_ref, w1_ref, b1_ref, w2_ref, b2_ref, eps,
                         residual_scale)
    o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _mlp_auto_rows(w: int, c: int, hid: int) -> int:
    """Rows per program for the fused MLP tails, bounded by the ~16 MB
    Mosaic scoped-VMEM stack. Anchored to a measured point: th=8 at
    W=384 / C=180 / HID=360 allocates 20.18M (AOT OOM error, r4) —
    i.e. ~2 bytes per element for each bf16 image block plus ~4 bytes for
    each of the f32 temporaries (x-sum, fc1 out, gelu, fc2 out). Budget
    13M leaves headroom for Mosaic's own spills. th=8 was measured best
    at the bench band width (scripts/compare_ffn.py); wider tiles scale
    it down instead of OOMing (a fixed th=8 dies beyond ~W=300 at the
    sum3 kernel's 4-image footprint)."""
    bytes_per_row = w * (4 * 2 * c + 4 * (2 * c + 2 * hid))
    return max(1, min(8, int(13e6 // bytes_per_row)))


@functools.partial(jax.jit, static_argnames=("eps", "tile_rows", "interpret",
                                             "residual_scale"))
def mlp_block(x, gamma, beta, w1, b1, w2, b2, *, eps: float = 1e-5,
              tile_rows: int = 0, interpret: bool | None = None,
              residual_scale: float = 1.0):
    """Fused  x + fc2(gelu(fc1(LN(x))))  — the OCAB / classic-HAT MLP
    residual tail (ref: hat_arch.py:391-392) in one VMEM pass. Pointwise
    only: no halos, no scratch; each program LNs a row tile, runs both
    matmuls on the MXU and writes the residual-added result once.

    x: (B, H, W, C); w1 (C, HID); w2 (HID, C).
    tile_rows: rows per program; 0 = auto (scaled down with width so the
    f32 intermediates stay inside the ~16 MB scoped-VMEM cap — a fixed
    th=8 OOMs the Mosaic stack beyond ~W=640 at C=180).
    """
    b, h, w, c = x.shape
    hid = w1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th = tile_rows or _mlp_auto_rows(w, c, hid)
    pad_r = (-h) % th
    if pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
    hp = x.shape[1]

    grid = (b, hp // th)
    vec = lambda n: pl.BlockSpec((1, n), lambda b_, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps,
                          residual_scale=residual_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(c), vec(c),
            pl.BlockSpec((c, hid), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(hid),
            pl.BlockSpec((hid, c), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), x.dtype),
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c), w1, b1.reshape(1, hid),
      w2, b2.reshape(1, c))
    return out[:, :h]


def mlp_block_reference(x, gamma, beta, w1, b1, w2, b2, eps: float = 1e-5,
                        residual_scale: float = 1.0):
    """Unfused residual_scale*x + MLP(LN(x)) with exact erf GELU
    (oracle + backward)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xd = xf - mu
    var = jnp.mean(xd * xd, axis=-1, keepdims=True)
    y = (xd * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
         + beta.astype(jnp.float32)).astype(x.dtype)
    h = y @ w1 + b1
    g = 0.5 * h * (1.0 + jax.lax.erf(h * (2.0 ** -0.5)))
    res = x if residual_scale == 1.0 else x * residual_scale
    return res + (g.astype(x.dtype) @ w2 + b2)


@jax.custom_vjp
def mlp_block_ad(x, gamma, beta, w1, b1, w2, b2):
    """Fused forward, XLA backward."""
    return mlp_block(x, gamma, beta, w1, b1, w2, b2)


def _mlp_ad_fwd(x, gamma, beta, w1, b1, w2, b2):
    args = (x, gamma, beta, w1, b1, w2, b2)
    return mlp_block(*args), args


def _mlp_ad_bwd(res, g):
    _, vjp = jax.vjp(mlp_block_reference, *res)
    return vjp(g.astype(res[0].dtype))


mlp_block_ad.defvjp(_mlp_ad_fwd, _mlp_ad_bwd)


def _mlp_sum3_kernel(s_ref, a_ref, cv_ref, gam_ref, bet_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, o_ref, *, eps: float, cs: float,
                     residual_scale: float = 1.0):
    c = s_ref.shape[-1]
    xf = (s_ref[0].reshape(-1, c).astype(jnp.float32)
          + a_ref[0].reshape(-1, c).astype(jnp.float32)
          + cv_ref[0].reshape(-1, c).astype(jnp.float32) * cs)
    out = _mlp_tail_math(xf, s_ref.dtype, gam_ref, bet_ref, w1_ref, b1_ref,
                         w2_ref, b2_ref, eps, residual_scale)
    o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def _mlp_sum3_shifted_kernel(s_ref, a_ref, astrip_ref, cv_ref, gam_ref,
                             bet_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                             *, eps: float, cs: float, ss: int,
                             residual_scale: float = 1.0):
    """sum3 kernel whose attn input arrives in ROLLED space: the (+ss, +ss)
    roll-back is folded into the gather (rows via the element-indexed
    origin, cols via an in-VMEM rotation) — see mlp_block_sum3_shifted."""
    i = pl.program_id(1)
    a = a_ref[0]            # (th, w, c) rolled rows at origin ss*max(iq-1,0)
    strip = astrip_ref[0]   # (ss, w, c) rolled rows h-ss..h-1 (true content)
    th = a.shape[0]
    # tile 0's clamped read starts at rolled row 0; real rows [0, ss) wrap
    # to the strip, the rest shift down by ss
    top = (strip if th == ss
           else jnp.concatenate([strip, a[:th - ss]], axis=0))
    a = jnp.where(i == 0, top, a)
    # column roll-back: real col k = rolled col (k - ss) mod W
    w_ = a.shape[1]
    a = jnp.concatenate([a[:, w_ - ss:], a[:, :w_ - ss]], axis=1)
    c = s_ref.shape[-1]
    xf = (s_ref[0].reshape(-1, c).astype(jnp.float32)
          + a.reshape(-1, c).astype(jnp.float32)
          + cv_ref[0].reshape(-1, c).astype(jnp.float32) * cs)
    out = _mlp_tail_math(xf, s_ref.dtype, gam_ref, bet_ref, w1_ref, b1_ref,
                         w2_ref, b2_ref, eps, residual_scale)
    o_ref[0] = out.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("conv_scale", "eps",
                                             "tile_rows", "interpret",
                                             "residual_scale"))
def mlp_block_sum3(shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2, *,
                   conv_scale: float, eps: float = 1e-5, tile_rows: int = 0,
                   interpret: bool | None = None,
                   residual_scale: float = 1.0):
    """Fused HAB tail INCLUDING the 3-way residual:

        x   = shortcut + attn_x + conv_scale * conv_x
        out = x + fc2(gelu(fc1(LN(x))))

    (ref: hat/archs/hat_arch.py:236-237 — attn/conv merge then MLP.) The
    XLA add materializes x (read 3 C-images, write 1) and mlp_block then
    re-reads it: ~0.93 GB extra HBM round trip per block at the bench
    band shape. This kernel reads the three summands once and writes only
    the block output — measured machine BW (scripts/roofline.py) makes
    that the binding constraint, not FLOPs.
    """
    b, h, w, c = shortcut.shape
    hid = w1.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th = tile_rows or _mlp_auto_rows(w, c, hid)
    pad_r = (-h) % th
    if pad_r:
        pads = ((0, 0), (0, pad_r), (0, 0), (0, 0))
        shortcut = jnp.pad(shortcut, pads)
        attn_x = jnp.pad(attn_x, pads)
        conv_x = jnp.pad(conv_x, pads)
    hp = shortcut.shape[1]

    grid = (b, hp // th)
    img = pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda b_, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_sum3_kernel, eps=eps, cs=conv_scale,
                          residual_scale=residual_scale),
        grid=grid,
        in_specs=[
            img, img, img,
            vec(c), vec(c),
            pl.BlockSpec((c, hid), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(hid),
            pl.BlockSpec((hid, c), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), shortcut.dtype),
        interpret=interpret,
    )(shortcut, attn_x, conv_x, gamma.reshape(1, c), beta.reshape(1, c),
      w1, b1.reshape(1, hid), w2, b2.reshape(1, c))
    return out[:, :h]


@functools.partial(jax.jit, static_argnames=("conv_scale", "shift", "eps",
                                             "tile_rows", "interpret",
                                             "residual_scale"))
def mlp_block_sum3_shifted(shortcut, attn_rolled, conv_x, gamma, beta, w1,
                           b1, w2, b2, *, conv_scale: float, shift: int,
                           eps: float = 1e-5, tile_rows: int = 0,
                           interpret: bool | None = None,
                           residual_scale: float = 1.0):
    """mlp_block_sum3 whose attn input is still in SW-MSA ROLLED space:
    numerically identical to
    ``mlp_block_sum3(shortcut, jnp.roll(attn_rolled, (shift, shift),
    (1, 2)), conv_x, ...)``.

    Together with fused_msa_block_shifted (ops/pallas_attention.py) this
    removes BOTH full-image rolls of every shifted block: the roll-back's
    row shift becomes an element-indexed read origin (one thin strip
    supplies the wrapped top rows), and the column shift is an in-VMEM
    rotation of each full-width row tile. The r5 xplane trace measured
    the two rolls at 9.5% of the HD step (178 ms at 8x720x224x180).
    """
    b, h, w, c = shortcut.shape
    hid = w1.shape[1]
    ss = shift
    assert 0 < ss < h
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    th = tile_rows or _mlp_auto_rows(w, c, hid)
    # row origins are ss * max(i*(th//ss) - 1, 0): keeping th a multiple
    # of ss makes the tiling-divisibility proof structural for Mosaic
    th = max(ss, th - th % ss)
    q = th // ss
    strip = attn_rolled[:, h - ss:h]
    pad_r = (-h) % th
    if pad_r:
        pads = ((0, 0), (0, pad_r), (0, 0), (0, 0))
        shortcut = jnp.pad(shortcut, pads)
        attn_rolled = jnp.pad(attn_rolled, pads)
        conv_x = jnp.pad(conv_x, pads)
    hp = shortcut.shape[1]

    grid = (b, hp // th)
    img = pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda b_, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mlp_sum3_shifted_kernel, eps=eps, cs=conv_scale,
                          ss=ss, residual_scale=residual_scale),
        grid=grid,
        in_specs=[
            img,
            pl.BlockSpec((pl.Element(1), pl.Element(th), pl.Element(w),
                          pl.Element(c)),
                         lambda b_, i, _q=q: (
                             b_, ss * jnp.maximum(i * _q - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(1), pl.Element(ss), pl.Element(w),
                          pl.Element(c)),
                         lambda b_, i: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            img,
            vec(c), vec(c),
            pl.BlockSpec((c, hid), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(hid),
            pl.BlockSpec((hid, c), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), shortcut.dtype),
        interpret=interpret,
    )(shortcut, attn_rolled, strip, conv_x, gamma.reshape(1, c),
      beta.reshape(1, c), w1, b1.reshape(1, hid), w2, b2.reshape(1, c))
    return out[:, :h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def mlp_block_sum3_shifted_ad(shortcut, attn_rolled, conv_x, gamma, beta,
                              w1, b1, w2, b2, conv_scale, shift):
    """Shift-folded sum3 forward, XLA backward (differentiates the
    roll + reference composition)."""
    return mlp_block_sum3_shifted(shortcut, attn_rolled, conv_x, gamma,
                                  beta, w1, b1, w2, b2,
                                  conv_scale=conv_scale, shift=shift)


def _sum3_shifted_ad_fwd(shortcut, attn_rolled, conv_x, gamma, beta, w1,
                         b1, w2, b2, conv_scale, shift):
    out = mlp_block_sum3_shifted(shortcut, attn_rolled, conv_x, gamma,
                                 beta, w1, b1, w2, b2,
                                 conv_scale=conv_scale, shift=shift)
    return out, (shortcut, attn_rolled, conv_x, gamma, beta, w1, b1, w2, b2)


def _sum3_shifted_ad_bwd(conv_scale, shift, res, g):
    shortcut, attn_rolled, conv_x, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda s_, a_, cv_, g_, be_, w1_, b1_, w2_, b2_:
        mlp_block_sum3_reference(
            s_, jnp.roll(a_, (shift, shift), axis=(1, 2)), cv_, g_, be_,
            w1_, b1_, w2_, b2_, conv_scale),
        shortcut, attn_rolled, conv_x, gamma, beta, w1, b1, w2, b2)
    return vjp(g.astype(shortcut.dtype))


mlp_block_sum3_shifted_ad.defvjp(_sum3_shifted_ad_fwd, _sum3_shifted_ad_bwd)


def mlp_block_sum3_reference(shortcut, attn_x, conv_x, gamma, beta, w1, b1,
                             w2, b2, conv_scale: float, eps: float = 1e-5,
                             residual_scale: float = 1.0):
    """Unfused 3-way residual + MLP tail (oracle + backward)."""
    x = (shortcut.astype(jnp.float32) + attn_x.astype(jnp.float32)
         + conv_x.astype(jnp.float32) * conv_scale).astype(shortcut.dtype)
    return mlp_block_reference(x, gamma, beta, w1, b1, w2, b2, eps,
                               residual_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def mlp_block_sum3_ad(shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2,
                      conv_scale):
    """Fused forward, XLA backward."""
    return mlp_block_sum3(shortcut, attn_x, conv_x, gamma, beta, w1, b1,
                          w2, b2, conv_scale=conv_scale)


def _sum3_ad_fwd(shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2,
                 conv_scale):
    args = (shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2)
    return mlp_block_sum3(*args, conv_scale=conv_scale), args


def _sum3_ad_bwd(conv_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: mlp_block_sum3_reference(*a, conv_scale), *res)
    return vjp(g.astype(res[0].dtype))


mlp_block_sum3_ad.defvjp(_sum3_ad_fwd, _sum3_ad_bwd)


# --- residual-scaled AD variants (the hidden-parallel TP workers,
# parallel/tp_ffn.py: each device contributes residual/N so the psum over
# the model axis reassembles exactly one residual) -------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def mlp_block_scaled_ad(x, gamma, beta, w1, b1, w2, b2, residual_scale):
    """Fused forward of residual_scale*x + MLP(LN(x)), XLA backward."""
    return mlp_block(x, gamma, beta, w1, b1, w2, b2,
                     residual_scale=residual_scale)


def _mlp_scaled_fwd(x, gamma, beta, w1, b1, w2, b2, residual_scale):
    args = (x, gamma, beta, w1, b1, w2, b2)
    return mlp_block(*args, residual_scale=residual_scale), args


def _mlp_scaled_bwd(residual_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: mlp_block_reference(*a, 1e-5, residual_scale), *res)
    return vjp(g.astype(res[0].dtype))


mlp_block_scaled_ad.defvjp(_mlp_scaled_fwd, _mlp_scaled_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def mlp_block_sum3_scaled_ad(shortcut, attn_x, conv_x, gamma, beta, w1, b1,
                             w2, b2, conv_scale, residual_scale):
    """Fused forward of residual_scale*sum3 + MLP(LN(sum3)), XLA backward."""
    return mlp_block_sum3(shortcut, attn_x, conv_x, gamma, beta, w1, b1,
                          w2, b2, conv_scale=conv_scale,
                          residual_scale=residual_scale)


def _sum3_scaled_fwd(shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2,
                     conv_scale, residual_scale):
    args = (shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2)
    return mlp_block_sum3(*args, conv_scale=conv_scale,
                          residual_scale=residual_scale), args


def _sum3_scaled_bwd(conv_scale, residual_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: mlp_block_sum3_reference(*a, conv_scale, 1e-5,
                                            residual_scale), *res)
    return vjp(g.astype(res[0].dtype))


mlp_block_sum3_scaled_ad.defvjp(_sum3_scaled_fwd, _sum3_scaled_bwd)
