"""Golden parity for the remaining arb encoders (RCAN / ATDLight / HiTSRF)
and the LTE+ ('lte-fast') grid-query head vs the esc_arb reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _load_arb_oracle():
    import sys

    from reference_oracle import install_stubs
    install_stubs()
    path = "/root/reference/HAT/ESC/esc_arb"
    if path not in sys.path:
        sys.path.insert(0, path)
    if not getattr(torch.Tensor.cuda, "_noop", False):
        def cuda_noop(self, *a, **k):
            return self
        cuda_noop._noop = True
        torch.Tensor.cuda = cuda_noop
    import models as ref_models
    import utils as ref_utils
    return ref_models, ref_utils


def _check_encoder(tm, fm, x, drop_prefixes=(), atol=5e-4):
    tm.eval()
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v for k, v in module_state_dict(tm).items()
          if not k.startswith(tuple(drop_prefixes))}
    params = convert_state_dict(sd, variables["params"])
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1), atol=atol)


def test_rcan_encoder_parity(rng):
    from super_resolution_tpu.arb.encoders import RCANEncoder

    _load_arb_oracle()
    from models.rcan import make_rcan

    torch.manual_seed(0)
    tm = make_rcan(n_resgroups=2, n_resblocks=2, n_feats=8, reduction=4,
                   no_upsampling=True)
    fm = RCANEncoder(n_resgroups=2, n_resblocks=2, n_feats=8, reduction=4)
    assert fm.out_dim == tm.out_dim
    _check_encoder(tm, fm, rng.random((1, 12, 14, 3), dtype=np.float32),
                   drop_prefixes=("sub_mean.", "add_mean."))


def test_atd_encoder_parity(rng):
    from super_resolution_tpu.arb.encoders import ATDEncoder

    _load_arb_oracle()
    from models.atd import ATD as RefATD

    torch.manual_seed(1)
    tm = RefATD(upscale=1, in_chans=3, img_size=16, embed_dim=16,
                depths=[2], num_heads=[2], window_size=8, category_size=8,
                num_tokens=8, reducted_dim=4, convffn_kernel_size=5,
                mlp_ratio=1, upsampler="nope", resi_connection="1conv")
    fm = ATDEncoder(embed_dim=16, depths=(2,), num_heads=(2,), window_size=8,
                    category_size=8, num_tokens=8, reducted_dim=4,
                    convffn_kernel_size=5, mlp_ratio=1.0)
    # window_size attr is overwritten to 16 in the ref ctor tail; restore
    tm.window_size = 8
    assert fm.out_dim == tm.out_dim
    _check_encoder(tm, fm, rng.random((1, 12, 14, 3), dtype=np.float32),
                   drop_prefixes=("conv_last.",), atol=3e-3)


def test_hitsrf_encoder_parity(rng):
    from super_resolution_tpu.arb.encoders import HiTSRFEncoder

    _load_arb_oracle()
    from models.hit_srf import HiT_SRF as RefHiT

    torch.manual_seed(2)
    tm = RefHiT(embed_dim=16, depths=[2], num_heads=[2], base_win_size=[4, 4],
                mlp_ratio=1, upsampler="noupsample",
                hier_win_ratios=[0.5, 1])
    fm = HiTSRFEncoder(embed_dim=16, depths=(2,), num_heads=(2,),
                       base_win_size=(4, 4), mlp_ratio=1.0,
                       hier_win_ratios=(0.5, 1))
    assert fm.out_dim == tm.out_dim
    _check_encoder(tm, fm, rng.random((1, 8, 8, 3), dtype=np.float32),
                   drop_prefixes=("conv_last.",), atol=1e-3)


def test_ltep_parity(rng):
    import torch.nn as tnn

    from super_resolution_tpu.arb.models import make, register

    ref_models, ref_utils = _load_arb_oracle()
    import models.ltep  # noqa: F401 registers 'lte-fast'
    from flax import linen as fnn

    if "tinyconv2" not in ref_models.models.models:
        @ref_models.register("tinyconv2")
        class TorchTinyConv(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(3, 8, 3, 1, 1)
                self.out_dim = 8

            def forward(self, x):
                return self.conv(x)

        @register("tinyconv2")
        class FlaxTinyConv(fnn.Module):
            @property
            def out_dim(self):
                return 8

            @fnn.compact
            def __call__(self, x):
                return fnn.Conv(8, (3, 3), padding=[(1, 1)] * 2,
                                name="conv")(x)

    torch.manual_seed(3)
    tm = ref_models.make({"name": "lte-fast",
                          "args": {"encoder_spec": {"name": "tinyconv2",
                                                    "args": {}},
                                   "num_layer": 2, "hidden_dim": 16}})
    tm.eval()
    fm = make({"name": "lte-fast",
               "args": {"encoder_spec": {"name": "tinyconv2", "args": {}},
                        "num_layer": 2, "hidden_dim": 16}})

    x = rng.random((1, 8, 9, 3), dtype=np.float32)
    # query grid at 2x resolution
    hq, wq = 16, 18
    coord = ref_utils.make_coord((hq, wq), flatten=False).numpy()[None]
    cell = np.array([[2.0 / hq, 2.0 / wq]], np.float32)

    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(coord), jnp.asarray(cell))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous(),
                 torch.from_numpy(coord), torch.from_numpy(cell))
    ours = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(coord),
                    jnp.asarray(cell))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.numpy().transpose(0, 2, 3, 1), atol=5e-4)
