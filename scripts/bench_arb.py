"""Arbitrary-scale (LIIF over the ESC encoder) throughput on-chip.

The reference evaluates LIIF by chunked coordinate queries (esc_arb/
test.py::batched_predict:16-28, bsize 30000 — a GPU-memory workaround).
On TPU the whole coordinate grid is one batched MLP over gathered
features; this script A/Bs the reference's chunk size against the
full-grid one-shot at x4 on a ~Urban100-shape input (176x256 ->
704x1024, 720k queries).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.arb.eval import batched_predict
from super_resolution_tpu.arb.models import LIIF, make_coord
from super_resolution_tpu.utils.precision import cast_floating

# reference esc_arb recipe: LIIF head over the ESC trunk (esc_arb configs)
model = LIIF(
    encoder_spec={"name": "esc", "args": {}},
    imnet_spec={"name": "mlp", "args": {"out_dim": 3,
                                        "hidden_list": [256] * 4}})
h, w, scale = 176, 256, 4
H, W = h * scale, w * scale
rng = np.random.default_rng(0)
# bf16 activations (the production precision policy): the ESC trunk's
# ws-32 fused MSA route needs it on-chip — f32 at ws 32 falls back to XLA
# (ops/pallas_attention.py::msa_block_supported, boundary found by this
# script)
inp = jnp.asarray(rng.random((1, h, w, 3)), jnp.bfloat16)
coord = jnp.asarray(make_coord((H, W))[None], jnp.float32)
cell = jnp.full((1, H * W, 2), 2.0 / H, jnp.float32).at[..., 1].set(2.0 / W)
variables = model.init(jax.random.PRNGKey(0), inp, coord[:, :64], cell[:, :64])
variables = {"params": cast_floating(variables["params"], jnp.bfloat16)}


def timed(fn, reps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


# reference protocol: 30000-query chunks (jitted as the eval path runs it)
chunked = jax.jit(
    lambda v, i, c, cl: batched_predict(model, v, i, c, cl, bsize=30000))
dt = timed(lambda: np.asarray(chunked(variables, inp, coord, cell)))
print(f"chunked (bsize 30000, ref protocol): {dt*1e3:.1f} ms "
      f"-> {H*W/1e6/dt:.3f} out-Mpix/s")

# TPU one-shot: gen_feat once, single query_rgb over all 720k coords
onestep = jax.jit(lambda v, i, c, cl: model.apply(v, i, c, cl))
dt = timed(lambda: np.asarray(onestep(variables, inp, coord, cell)))
print(f"one-shot full grid: {dt*1e3:.1f} ms -> {H*W/1e6/dt:.3f} out-Mpix/s")
