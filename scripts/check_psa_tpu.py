"""One-off: fused PSA block Mosaic-compiles; PSNR vs XLA routes on-chip."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from super_resolution_tpu.models.srformer_arch import SRFormer
from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

kw = dict(img_size=48, embed_dim=180, depths=(2,), num_heads=(6,),
          window_size=24, mlp_ratio=2.0, upscale=2, upsampler="pixelshuffledirect")
fm = SRFormer(**kw)
x = jnp.asarray(np.random.default_rng(0).random((1, 48, 48, 3)), jnp.float32)
variables = fm.init(jax.random.PRNGKey(0), x)

def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))

outs = {}
for attn in ("xla", "pallas"):
    os.environ["SR_TPU_ATTN"] = attn
    with jax.default_matmul_precision("highest"):
        outs[f"{attn}_f32hi"] = np.asarray(
            jax.jit(lambda v, x: fm.apply(v, x))(variables, x))
    pb = cast_floating(variables["params"], jnp.bfloat16)
    ab = wrap_apply(lambda p, t: fm.apply({"params": p}, t), jnp.bfloat16)
    outs[f"{attn}_bf16"] = np.asarray(jax.jit(ab)(pb, x))

print("backend:", jax.default_backend())
print("PSNR pallas_f32hi vs xla_f32hi:", psnr(outs["pallas_f32hi"], outs["xla_f32hi"]))
print("PSNR pallas_bf16 vs xla_f32hi :", psnr(outs["pallas_bf16"], outs["xla_f32hi"]))
print("PSNR xla_bf16    vs xla_f32hi :", psnr(outs["xla_bf16"], outs["xla_f32hi"]))
print("PSNR pallas_bf16 vs xla_bf16  :", psnr(outs["pallas_bf16"], outs["xla_bf16"]))
