"""Hidden-parallel fused MLP tails (parallel/tp_ffn.py): TP composed with
the Pallas FFN kernels on the 8-device CPU mesh (interpret mode).

Pins: (1) forward parity of hidden_parallel_mlp_block /
hidden_parallel_mlp_sum3 vs the XLA references under a DP x TP mesh,
(2) gradient parity for every input (residual_scale custom VJPs composed
with the shard_map transpose), (3) a full HATClassic forward with BOTH
fused routes ON (head-parallel MSA + hidden-parallel FFN) and replicated
attn/mlp weights matches the single-device net, (4) a TP train step in the
same regime matches the unsharded f32 step — TP now keeps the entire
fused production kernel path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_resolution_tpu.ops.pallas_ffn import (mlp_block_reference,
                                                 mlp_block_sum3_reference)
from super_resolution_tpu.parallel.tp import shard_params_tp, tp_attention
from super_resolution_tpu.parallel.tp_ffn import (hidden_parallel_mlp_block,
                                                  hidden_parallel_mlp_sum3)


def _mesh_dp_tp():
    return Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "model"))


def _inputs(rng, b=2, hw=12, c=16, hid=32):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return dict(x=mk(b, hw, hw, c), gamma=mk(c) + 1.0, beta=mk(c),
                w1=mk(c, hid), b1=mk(hid), w2=mk(hid, c), b2=mk(c))


def test_hidden_parallel_mlp_forward_matches_reference(rng):
    i = _inputs(rng)
    ref = mlp_block_reference(i["x"], i["gamma"], i["beta"], i["w1"],
                              i["b1"], i["w2"], i["b2"])
    out = jax.jit(lambda *a: hidden_parallel_mlp_block(
        *a, mesh=_mesh_dp_tp()))(
        i["x"], i["gamma"], i["beta"], i["w1"], i["b1"], i["w2"], i["b2"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_hidden_parallel_mlp_grads_match_reference(rng):
    i = _inputs(rng)
    mesh = _mesh_dp_tp()
    names = ("x", "gamma", "beta", "w1", "b1", "w2", "b2")
    args = tuple(i[n] for n in names)

    def loss_hp(*a):
        return jnp.sum(hidden_parallel_mlp_block(*a, mesh=mesh) ** 2)

    def loss_ref(*a):
        return jnp.sum(mlp_block_reference(*a) ** 2)

    g_hp = jax.jit(jax.grad(loss_hp, argnums=tuple(range(7))))(*args)
    g_rf = jax.jit(jax.grad(loss_ref, argnums=tuple(range(7))))(*args)
    for n, a, b in zip(names, g_hp, g_rf):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-6,
                                   err_msg=f"grad mismatch for {n}")


def test_hidden_parallel_sum3_forward_and_grads(rng):
    i = _inputs(rng)
    mesh = _mesh_dp_tp()
    s, a3, cv = i["x"], i["x"] * 0.5, i["x"] * -0.25
    cs = 0.01
    names = ("s", "a", "cv", "gamma", "beta", "w1", "b1", "w2", "b2")
    args = (s, a3, cv, i["gamma"], i["beta"], i["w1"], i["b1"], i["w2"],
            i["b2"])

    ref = mlp_block_sum3_reference(*args, cs)
    out = jax.jit(lambda *a: hidden_parallel_mlp_sum3(
        *a, conv_scale=cs, mesh=mesh))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    def loss_hp(*a):
        return jnp.sum(hidden_parallel_mlp_sum3(
            *a, conv_scale=cs, mesh=mesh) ** 2)

    def loss_ref(*a):
        return jnp.sum(mlp_block_sum3_reference(*a, cs) ** 2)

    g_hp = jax.jit(jax.grad(loss_hp, argnums=tuple(range(9))))(*args)
    g_rf = jax.jit(jax.grad(loss_ref, argnums=tuple(range(9))))(*args)
    for n, a_, b_ in zip(names, g_hp, g_rf):
        scale = max(float(jnp.max(jnp.abs(b_))), 1.0)
        np.testing.assert_allclose(np.asarray(a_) / scale,
                                   np.asarray(b_) / scale, atol=2e-6,
                                   err_msg=f"grad mismatch for {n}")


def test_hidden_parallel_rejects_nondivisible_hidden(rng):
    i = _inputs(rng, hid=30)  # 30 % 4 != 0
    with pytest.raises(ValueError, match="hidden"):
        hidden_parallel_mlp_block(
            i["x"], i["gamma"], i["beta"], i["w1"], i["b1"], i["w2"],
            i["b2"], mesh=_mesh_dp_tp())


def _tiny_classic():
    from super_resolution_tpu.models.hat_classic_arch import HATClassic

    return HATClassic(img_size=16, embed_dim=32, depths=(2,),
                      num_heads=(4,), window_size=8, compress_ratio=4,
                      squeeze_factor=8, conv_scale=0.01, overlap_ratio=0.5,
                      mlp_ratio=2.0, drop_path_rate=0.0, upscale=2)


def test_hat_classic_tp_both_fused_routes(rng, monkeypatch):
    """Full net forward with head-parallel MSA AND hidden-parallel FFN
    under the TP context — attn + mlp weights replicated, shard_map slices
    both, output matches the single-device forward."""
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    monkeypatch.setenv("SR_TPU_FFN", "fused")
    net = _tiny_classic()
    x = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    ref = jax.jit(net.apply)({"params": params}, x)

    mesh = _mesh_dp_tp()
    sharded = shard_params_tp(params, mesh, head_parallel_attn=True,
                              hidden_parallel_mlp=True)
    blk = sharded["layers_0"]["residual_group"]["blocks_0"]
    for mod in ("fc1", "fc2"):
        k = blk["mlp"][mod]["kernel"]
        assert k.addressable_shards[0].data.shape == k.shape, \
            f"hidden-parallel mlp weights must stay replicated ({mod})"
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with tp_attention(mesh):
        out = jax.jit(net.apply)({"params": sharded}, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_hat_classic_tp_train_step_both_fused_routes(rng, monkeypatch):
    """One TP train step with both fused compositions ON matches the
    unsharded f32 step (loss + stepped params)."""
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    monkeypatch.setenv("SR_TPU_FFN", "fused")
    import optax

    from super_resolution_tpu.runtime.train_loop import (init_train_state,
                                                         make_sr_train_step)

    net = _tiny_classic()
    x = jnp.asarray(rng.random((4, 16, 16, 3)), jnp.float32)
    gt = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    topt = {"pixel_opt": {"type": "L1Loss", "loss_weight": 1.0}}
    tx = optax.adam(1e-3)
    step = make_sr_train_step(net, tx, topt)
    rng_key = jax.random.PRNGKey(7)

    st_ref = init_train_state(params, tx)
    st_ref, logs_ref = jax.jit(step)(st_ref, {"lq": x, "gt": gt}, rng_key)

    mesh = _mesh_dp_tp()
    sharded = shard_params_tp(params, mesh, head_parallel_attn=True,
                              hidden_parallel_mlp=True)
    st_tp = jax.jit(lambda p: init_train_state(p, tx))(sharded)
    batch = {"lq": jax.device_put(x, NamedSharding(mesh, P("data"))),
             "gt": jax.device_put(gt, NamedSharding(mesh, P("data")))}
    with tp_attention(mesh):
        st_tp, logs_tp = jax.jit(step)(st_tp, batch, rng_key)

    np.testing.assert_allclose(float(logs_tp["l_pix"]),
                               float(logs_ref["l_pix"]), atol=1e-5)
    ref_leaves = jax.tree.leaves(st_ref.params)
    tp_leaves = jax.tree.leaves(st_tp.params)
    # 5e-5: Adam's rsqrt amplifies the f32 psum-reorder noise of TWO
    # sharded kernels per block (measured max 2.1e-5 on 1/147k elements)
    for a, b in zip(tp_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
