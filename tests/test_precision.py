"""bf16 mixed-precision inference: PSNR cost within the <=0.01 dB budget.

Protocol mirrors the reference's metric path (tensor2img uint8 round-trip
then MATLAB-protocol PSNR — ref: HAT/ESC/scripts/test_direct_metrics.py and
basicsr/metrics/psnr_ssim.py): the SAME weights run in f32 and under the
bf16 policy (utils/precision.py), both outputs go through the uint8
pipeline, and the PSNR-vs-GT delta must hold the parity gate. A
flagship-dim leg lives in test_flagship.py (slow).
"""

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.metrics.psnr_ssim import calculate_psnr
from super_resolution_tpu.models.hat_arch import HAT
from super_resolution_tpu.utils.img import tensor2img
from super_resolution_tpu.utils.precision import (cast_floating, resolve_dtype,
                                                  wrap_apply)


def _outputs(net, params, x):
    f32 = net.apply({"params": params}, x)
    bf16_params = cast_floating(params, jnp.bfloat16)
    fwd = wrap_apply(lambda p, t: net.apply({"params": p}, t), jnp.bfloat16)
    bf16 = fwd(bf16_params, x)
    assert bf16.dtype == jnp.float32  # policy returns f32 for metrics/IO
    return np.asarray(f32), np.asarray(bf16)


def test_bf16_psnr_delta_within_budget(rng):
    net = HAT(img_size=32, embed_dim=60, depths=(2, 2), num_heads=(6, 6),
              window_size=8, compress_ratio=3, squeeze_factor=30,
              conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
              upscale=2, upsampler="pixelshuffle")
    x = jnp.asarray(rng.random((1, 24, 24, 3), dtype=np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    f32, bf16 = _outputs(net, params, x)

    img_f32, img_bf16 = tensor2img(f32), tensor2img(bf16)
    # raw agreement between the two uint8 images (random-init weights put
    # the output range at ~[-2, 3] — ~5x wider than trained [0,1] — so the
    # observed ~45 dB here is a conservative lower bound)
    agreement = calculate_psnr(img_f32, img_bf16, crop_border=0)
    assert agreement > 40.0, f"bf16 vs f32 uint8 agreement only {agreement} dB"

    # metric-protocol delta vs a fixed GT (crop_border=scale, Y channel —
    # the reference validation protocol)
    gt = tensor2img(rng.random((1, 48, 48, 3), dtype=np.float32))
    p32 = calculate_psnr(img_f32, gt, crop_border=2, test_y_channel=True)
    p16 = calculate_psnr(img_bf16, gt, crop_border=2, test_y_channel=True)
    assert abs(p32 - p16) <= 0.01, f"PSNR delta {abs(p32 - p16):.4f} dB"


def test_resolve_dtype_aliases():
    assert resolve_dtype(None) is None
    assert resolve_dtype("") is None
    assert resolve_dtype("float32") is None
    assert resolve_dtype("fp32") is None
    assert resolve_dtype("bf16") == jnp.bfloat16
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    try:
        resolve_dtype("int8")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for unsupported dtype")


def test_cast_floating_keeps_integers():
    tree = {"w": jnp.ones((2, 2), jnp.float32), "idx": jnp.arange(3)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == tree["idx"].dtype


def test_srmodel_inference_dtype_config(tmp_path, rng):
    """HATModel honors val.inference_dtype: outputs stay f32, params cache
    casts once, and bf16 output tracks the f32 output."""
    from super_resolution_tpu.runtime.sr_model import HATModel

    def make_opt(dtype):
        return {
            "name": "t", "scale": 2, "is_train": False, "manual_seed": 0,
            "network_g": {"type": "HAT", "img_size": 32, "embed_dim": 24,
                          "depths": (1, 1), "num_heads": (2, 2),
                          "window_size": 8, "mlp_ratio": 2.0, "upscale": 2,
                          "upsampler": "pixelshuffle"},
            "path": {}, "val": {"inference_dtype": dtype},
        }

    lq = rng.random((1, 20, 20, 3), dtype=np.float32)
    model32 = HATModel(make_opt(None))
    model32.feed_data({"lq": lq})
    model32._run_inference()
    out32 = np.asarray(model32.output)

    model16 = HATModel(make_opt("bf16"))
    model16.feed_data({"lq": lq})
    model16._run_inference()
    out16 = np.asarray(model16.output)

    assert out16.dtype == np.float32
    assert out16.shape == out32.shape
    assert np.max(np.abs(out16 - out32)) < 0.06  # random-init range ~[-2, 2]
    # cast cache: same params object -> one cast, reused
    p1 = model16.eval_params()
    p2 = model16.eval_params()
    assert p1 is p2
    assert jax.tree_util.tree_leaves(p1)[0].dtype == jnp.bfloat16
