"""FID stack: flax InceptionV3 golden-parity vs the reference arch
(basicsr/archs/inception.py run with random shared weights), checkpoint-key
conversion for both layouts, and the end-to-end set-level FID surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import install_stubs


def _build_reference_inception(output_blocks, resize_input, normalize_input,
                               seed=0):
    """Reference InceptionV3 wrapper with fid_inception_v3's weight download
    replaced by random init (all convs + BN affine/running stats drawn from
    a seeded generator so the oracle is discriminative)."""
    install_stubs()
    import torch
    import basicsr.archs.inception as inc

    def _fid_inception_no_load():
        from torchvision import models

        m = models.inception_v3(num_classes=1008, aux_logits=False,
                                pretrained=False, init_weights=False)
        m.Mixed_5b = inc.FIDInceptionA(192, pool_features=32)
        m.Mixed_5c = inc.FIDInceptionA(256, pool_features=64)
        m.Mixed_5d = inc.FIDInceptionA(288, pool_features=64)
        m.Mixed_6b = inc.FIDInceptionC(768, channels_7x7=128)
        m.Mixed_6c = inc.FIDInceptionC(768, channels_7x7=160)
        m.Mixed_6d = inc.FIDInceptionC(768, channels_7x7=160)
        m.Mixed_6e = inc.FIDInceptionC(768, channels_7x7=192)
        m.Mixed_7b = inc.FIDInceptionE_1(1280)
        m.Mixed_7c = inc.FIDInceptionE_2(2048)
        return m

    orig = inc.fid_inception_v3
    inc.fid_inception_v3 = _fid_inception_no_load
    try:
        net = inc.InceptionV3(output_blocks=output_blocks,
                              resize_input=resize_input,
                              normalize_input=normalize_input)
    finally:
        inc.fid_inception_v3 = orig
    net.eval()

    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=g)
    net.load_state_dict(sd)
    return net


def _flax_params_from_torch(net):
    from super_resolution_tpu.models.inception_arch import (
        fid_inception_state_dict_to_params)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    return fid_inception_state_dict_to_params(sd)


@pytest.mark.parametrize("resize_input", [False, True])
def test_inception_feature_parity(resize_input):
    import torch

    from super_resolution_tpu.models.inception_arch import FIDInceptionV3

    blocks = [0, 1, 2, 3]
    ref = _build_reference_inception(blocks, resize_input=resize_input,
                                     normalize_input=True)
    params = _flax_params_from_torch(ref)
    ours = FIDInceptionV3(output_blocks=tuple(blocks), resize_input=resize_input,
                          normalize_input=True)

    rng = np.random.default_rng(0)
    size = 96 if resize_input else 299
    x = rng.random((2, size, size, 3), dtype=np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_outs = ours.apply({"params": params}, jnp.asarray(x))
    assert len(ref_outs) == len(got_outs) == len(blocks)
    for i, (r, g) in enumerate(zip(ref_outs, got_outs)):
        r = r.numpy().transpose(0, 2, 3, 1)
        g = np.asarray(g)
        assert r.shape == g.shape, f"block {i}: {r.shape} vs {g.shape}"
        scale = max(np.abs(r).max(), 1e-3)
        np.testing.assert_allclose(g, r, atol=3e-4 * scale,
                                   err_msg=f"block {i}")


def test_converter_accepts_wrapper_and_raw_layouts():
    from super_resolution_tpu.models.inception_arch import (
        fid_inception_state_dict_to_params)

    ref = _build_reference_inception([3], resize_input=False,
                                     normalize_input=False)
    wrapper_sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    assert all(k.startswith("blocks.") for k in wrapper_sd)
    from_wrapper = fid_inception_state_dict_to_params(wrapper_sd)

    # raw pt_inception layout: layer-named keys (plus a classifier to drop)
    import torch
    raw_sd = dict(wrapper_sd)
    raw = {}
    layout = {0: ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", None],
              1: ["Conv2d_3b_1x1", "Conv2d_4a_3x3", None],
              2: ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                  "Mixed_6c", "Mixed_6d", "Mixed_6e"],
              3: ["Mixed_7a", "Mixed_7b", "Mixed_7c", None]}
    for k, v in raw_sd.items():
        parts = k.split(".")
        raw[".".join([layout[int(parts[1])][int(parts[2])]] + parts[3:])] = v
    raw["fc.weight"] = torch.zeros(1008, 2048).numpy()
    raw["fc.bias"] = torch.zeros(1008).numpy()
    from_raw = fid_inception_state_dict_to_params(raw)

    flat_w = jax.tree.leaves(from_wrapper)
    flat_r = jax.tree.leaves(from_raw)
    assert jax.tree.structure(from_wrapper) == jax.tree.structure(from_raw)
    for a, b in zip(flat_w, flat_r):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_calculate_fid_end_to_end(tmp_path):
    """Set-level FID with a random-weight extractor: identical sets -> ~0,
    disjoint noise sets -> positive; loads weights from a torch .pth."""
    import torch

    from super_resolution_tpu.metrics.fid import (calculate_fid,
                                                  load_patched_inception_v3)

    ref = _build_reference_inception([3], resize_input=True,
                                     normalize_input=True)
    pth = tmp_path / "fid_inception.pth"
    torch.save(ref.state_dict(), pth)

    feature_fn = load_patched_inception_v3(str(pth), resize_input=True,
                                           normalize_input=True)
    rng = np.random.default_rng(0)
    set1 = [rng.random((40, 40, 3), dtype=np.float32) for _ in range(8)]
    set2 = [np.clip(im + 0.3 * rng.random(im.shape, dtype=np.float32), 0, 1)
            for im in set1]
    fid_same = calculate_fid(set1, list(set1), feature_fn=feature_fn)
    fid_diff = calculate_fid(set1, set2, feature_fn=feature_fn)
    assert abs(fid_same) < 1e-3
    assert np.isfinite(fid_diff) and fid_diff > fid_same

    with pytest.raises(ValueError):
        calculate_fid(set1[:1], set2[:1], feature_fn=feature_fn)
