"""Pallas fused HAB front: LayerNorm + CAB conv chain + GAP partials.

The HAB's first residual (ref: hat_arch.py:217-238) is

    y   = LN1(x)
    cab = conv2(gelu(conv1(y)))          # 3x3 C->C/3, 3x3 C/3->C
    out = x + ESCConvAttn(y) + conv_scale * (cab * eca_gate(cab))

ECA's gate and ESC's dynamic-kernel head both need global average pools,
which breaks single-pass row tiling — so this kernel computes everything
UP TO the pools in one VMEM pass and emits: LN1(x) (reused by the ESC
branch), cab (pre-gate), and the two GAP partial sums. The XLA glue then
computes the tiny gate/kernel heads, the 16-channel PLK + dynamic convs,
and the final fused assembly einsum. Eliminated HBM traffic vs the XLA
composition: LN write+read, the gelu intermediate, and the conv chain's
producer materializations.

Semantics pinned vs the flax modules by tests/test_pallas_hab.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7) —
    Mosaic has no erf lowering; this uses only exp, which it has."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel(x):
    """erf-GELU with the in-kernel erf approximation (fwd path)."""
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _gelu_true(x):
    """Exact erf-GELU (XLA oracle + backward path)."""
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _hab_front_kernel(xp, xc, xn, gam_ref, bet_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, ln_out, mid_out, gap_cab, gap16, lns, t1s, *,
                      th: int, h_img: int, w_img: int, eps: float,
                      pdim: int):
    i = pl.program_id(1)
    r0 = i * th
    c = xc.shape[-1]
    mid = w1_ref.shape[-1]
    gam = gam_ref[0].astype(jnp.float32)
    bet = bet_ref[0].astype(jnp.float32)

    def lnorm(rows2d, img_row_ok):
        xf = rows2d.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xd = xf - mu
        var = jnp.mean(xd * xd, axis=-1, keepdims=True)
        y = (xd * jax.lax.rsqrt(var + eps) * gam + bet).astype(lns.dtype)
        return jnp.where(img_row_ok, y, jnp.zeros_like(y))

    # LN rows r0-2 .. r0+th+1 into the (th+4, W+2, C) zero-col scratch.
    # Halo rows come from the prev/next row blocks (clamped at grid edges,
    # masked to zero outside the image).
    lns[:, 0] = jnp.zeros((th + 4, c), lns.dtype)
    lns[:, w_img + 1] = jnp.zeros((th + 4, c), lns.dtype)
    lns[0, 1:w_img + 1] = lnorm(xp[0, th - 2], r0 >= 2)
    lns[1, 1:w_img + 1] = lnorm(xp[0, th - 1], r0 >= 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0) + r0
    cur = lnorm(xc[0].reshape(th * w_img, c),
                True).reshape(th, w_img, c)
    cur = jnp.where(rows < h_img, cur, 0.0)
    lns[pl.ds(2, th), 1:w_img + 1] = cur
    lns[th + 2, 1:w_img + 1] = lnorm(xn[0, 0], r0 + th < h_img)
    lns[th + 3, 1:w_img + 1] = lnorm(xn[0, 1], r0 + th + 1 < h_img)

    ln_out[0] = cur

    # conv1 3x3 (C -> mid) + exact GELU on th+2 rows (t1 rows r0-1..r0+th)
    w1 = w1_ref[...]
    acc1 = jnp.zeros((th + 2, w_img, mid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = lns[pl.ds(dy, th + 2), pl.ds(dx, w_img)]
            acc1 = acc1 + jax.lax.dot_general(
                sl.reshape((th + 2) * w_img, c), w1[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th + 2, w_img, mid)
    t1 = _gelu_kernel(acc1 + b1_ref[0].astype(jnp.float32))
    # conv2 zero-pads ITS input at image borders: t1 rows outside the
    # image must be exactly zero, not gelu(conv1(zero-padded ln))
    t1_rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + r0 - 1
    t1 = jnp.where((t1_rows >= 0) & (t1_rows < h_img), t1, 0.0)
    t1s[:, 0] = jnp.zeros((th + 2, mid), t1s.dtype)
    t1s[:, w_img + 1] = jnp.zeros((th + 2, mid), t1s.dtype)
    t1s[:, 1:w_img + 1] = t1.astype(t1s.dtype)

    # conv2 3x3 (mid -> C) on the tile's th rows
    w2 = w2_ref[...]
    acc2 = jnp.zeros((th, w_img, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = t1s[pl.ds(dy, th), pl.ds(dx, w_img)]
            acc2 = acc2 + jax.lax.dot_general(
                sl.reshape(th * w_img, mid), w2[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(th, w_img, c)
    cab = acc2 + b2_ref[0].astype(jnp.float32)
    cab = jnp.where(rows < h_img, cab, 0.0)
    mid_out[0] = cab.astype(mid_out.dtype)

    # GAP partials, accumulated across the row-tile grid axis (the output
    # blocks revisit the same (b, 0) slot every i step)
    @pl.when(i == 0)
    def _init():
        gap_cab[0, 0] = jnp.zeros((c,), jnp.float32)
        gap16[0, 0] = jnp.zeros((pdim,), jnp.float32)

    gap_cab[0, 0] += jnp.sum(cab, axis=(0, 1))
    gap16[0, 0] += jnp.sum(cur.astype(jnp.float32)[..., :pdim], axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("eps", "pdim", "tile_rows",
                                             "interpret"))
def hab_front(x, gamma, beta, w1, b1, w2, b2, *, eps: float = 1e-5,
              pdim: int = 16, tile_rows: int = 4,
              interpret: bool | None = None):
    """Fused LN1 + CAB conv chain + GAP partial sums.

    Args:
      x: (B, H, W, C); gamma/beta (C,) LN params; w1 (3, 3, C, MID),
      b1 (MID,); w2 (3, 3, MID, C), b2 (C,).
    Returns:
      (ln1, cab_mid, gap_cab, gap16): (B, H, W, C), (B, H, W, C),
      (B, C) f32 SUM over pixels, (B, pdim) f32 SUM of ln1[..., :pdim].
    """
    b, h, w, c = x.shape
    mid = w1.shape[-1]
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
    outs = pl.pallas_call(
        functools.partial(_hab_front_kernel, th=th, h_img=h, w_img=w,
                          eps=eps, pdim=pdim),
        grid=grid,
        in_specs=[
            row_block(-1), row_block(0), row_block(+1),
            vec(c), vec(c),
            pl.BlockSpec((3, 3, c, mid), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(mid),
            pl.BlockSpec((3, 3, mid, c), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(c),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pdim), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, hp, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, pdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((th + 4, w + 2, c), x.dtype),     # LN rows
            pltpu.VMEM((th + 2, w + 2, mid), x.dtype),   # gelu(conv1) rows
        ],
        interpret=interpret,
    )(x, x, x, gamma.reshape(1, c), beta.reshape(1, c),
      w1, b1.reshape(1, mid), w2, b2.reshape(1, c))
    ln1, cab_mid, gap_cab, gap16 = outs
    return ln1[:, :h], cab_mid[:, :h], gap_cab[:, 0], gap16[:, 0]


def hab_front_reference(x, gamma, beta, w1, b1, w2, b2, eps: float = 1e-5,
                        pdim: int = 16):
    """Unfused composition (oracle + backward)."""
    from jax import lax

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xd = xf - mu
    var = jnp.mean(xd * xd, axis=-1, keepdims=True)
    ln1 = (xd * lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
           + beta.astype(jnp.float32)).astype(x.dtype)

    def conv(t, k, bias):
        return lax.conv_general_dilated(
            t, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    t1 = _gelu_true(conv(ln1, w1, b1).astype(jnp.float32)).astype(x.dtype)
    cab = conv(t1, w2, b2)
    gap_cab = jnp.sum(cab.astype(jnp.float32), axis=(1, 2))
    gap16 = jnp.sum(ln1.astype(jnp.float32)[..., :pdim], axis=(1, 2))
    return ln1, cab, gap_cab, gap16


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def hab_front_ad(x, gamma, beta, w1, b1, w2, b2, eps, pdim):
    """Fused forward, XLA backward."""
    return hab_front(x, gamma, beta, w1, b1, w2, b2, eps=eps, pdim=pdim)


def _hf_fwd(x, gamma, beta, w1, b1, w2, b2, eps, pdim):
    return (hab_front(x, gamma, beta, w1, b1, w2, b2, eps=eps, pdim=pdim),
            (x, gamma, beta, w1, b1, w2, b2))


def _hf_bwd(eps, pdim, res, g):
    _, vjp = jax.vjp(
        lambda *a: hab_front_reference(*a, eps=eps, pdim=pdim), *res)
    return vjp(g)


hab_front_ad.defvjp(_hf_fwd, _hf_bwd)


def hab_fused_enabled() -> bool:
    """Route the HAB front through the fused kernel
    (SR_TPU_HAB=fused|xla overrides)."""
    import os

    mode = os.environ.get("SR_TPU_HAB", "auto").lower()
    if mode == "fused":
        return True
    if mode == "xla":
        return False
    # Default OFF — measured SLOWER than the XLA composition on v5e
    # (scripts/profile_blocks.py --only hab, B8 320x320x180 bf16:
    # fused 38.6 ms vs XLA 30.4 ms per HAB). Unlike the OCAB megakernel,
    # the traffic saved here (LN + gelu intermediates) does not cover the
    # kernel's costs: x is fetched 3x for row halos, and the 9-tap
    # conv matmuls run at N=60/180 MXU pad efficiency while XLA's conv
    # lowering pipelines the same work better. Kept behind SR_TPU_HAB=
    # fused for future iteration (e.g. channel-tiled conv2 accumulation).
    return False


def _ln_split_kernel(xc, gam_ref, bet_ref, ln_out, x1_out, *,
                     eps: float, pdim: int):
    th, w, c = xc.shape[1], xc.shape[2], xc.shape[3]
    rows = xc[0].reshape(th * w, c)
    xf = rows.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xd = xf - mu
    var = jnp.mean(xd * xd, axis=-1, keepdims=True)
    y = (xd * jax.lax.rsqrt(var + eps)
         * gam_ref[0].astype(jnp.float32)
         + bet_ref[0].astype(jnp.float32)).astype(ln_out.dtype)
    y3 = y.reshape(th, w, c)
    ln_out[0] = y3
    x1_out[0] = y3[..., :pdim]


@functools.partial(jax.jit, static_argnames=("eps", "pdim",
                                             "tile_rows", "interpret"))
def ln_split(x, gamma, beta, *, eps: float = 1e-5, pdim: int = 16,
             tile_rows: int = 8, interpret: bool | None = None):
    """One streamed pass producing the three layouts the HAB front needs:

      ln1 = LayerNorm(x)                 (B, H, W, C)
      x1  = ln1[..., :pdim] compact      (B, H, W, pdim)

    The XLA composition pays ~3.9 ms for the LN alone plus ~3 ms for the
    strided pdim-slice reads of the full-width tensor at the production
    tile batch (scripts/profile_hab.py); here the slice is written while
    the rows are VMEM-resident, and the cheap s2d of the COMPACT slab is
    left to XLA (Mosaic cannot collapse sublane dims into lanes, so the
    in-kernel s2d shuffle does not lower). H must divide tile_rows.
    """
    b, h, w, c = x.shape
    th = tile_rows
    if h % th:
        raise ValueError(f"ln_split needs H % {th} == 0")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (b, h // th)
    vec = lambda n: pl.BlockSpec((1, n), lambda b_, i: (0, 0),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_ln_split_kernel, eps=eps, pdim=pdim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(c), vec(c),
        ],
        out_specs=[
            pl.BlockSpec((1, th, w, c), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, pdim), lambda b_, i: (b_, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, h, w, pdim), x.dtype),
        ],
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c))
    return tuple(outs)


def ln_split_reference(x, gamma, beta, eps: float = 1e-5, pdim: int = 16):
    """Unfused composition (oracle + backward)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xd = xf - mu
    var = jnp.mean(xd * xd, axis=-1, keepdims=True)
    ln1 = (xd * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
           + beta.astype(jnp.float32)).astype(x.dtype)
    return ln1, ln1[..., :pdim]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ln_split_ad(x, gamma, beta, eps, pdim):
    """Fused forward, XLA backward."""
    return ln_split(x, gamma, beta, eps=eps, pdim=pdim)


def _lns_fwd(x, gamma, beta, eps, pdim):
    return ln_split(x, gamma, beta, eps=eps, pdim=pdim), (x, gamma, beta)


def _lns_bwd(eps, pdim, res, g):
    _, vjp = jax.vjp(
        lambda *a: ln_split_reference(*a, eps=eps, pdim=pdim), *res)
    return vjp(g)


ln_split_ad.defvjp(_lns_fwd, _lns_bwd)


def ln_split_enabled() -> bool:
    """Route the HAB front's LN through ln_split on TPU
    (SR_TPU_LNS=fused|xla overrides)."""
    import os

    mode = os.environ.get("SR_TPU_LNS", "auto").lower()
    if mode == "fused":
        return True
    if mode == "xla":
        return False
    import jax

    return jax.default_backend() == "tpu"
