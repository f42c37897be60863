"""FID — Frechet Inception Distance (ref: basicsr/metrics/fid.py:1-90).

The feature extractor is the FID-patched InceptionV3
(models/inception_arch.py, ref: basicsr/archs/inception.py). This
environment has no egress, so the pt_inception checkpoint
(pt_inception-2015-12-05-6726825d.pth — ref inception.py:13) must be
supplied locally via `weights_path`.

FID is a SET-level statistic (covariance over many activations), so it is
deliberately NOT in METRIC_REGISTRY's per-image dispatch; use
:func:`calculate_fid` over two image collections (scripts/eval_folder.py
--fid-weights) or the lower-level pieces directly.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np
from scipy import linalg


def calculate_frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                               mu2: np.ndarray, sigma2: np.ndarray,
                               eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (numerics per the standard implementation the reference uses,
    ref: fid.py:50-90)."""
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("Imaginary component in matrix sqrt")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_statistics(features: np.ndarray):
    """(N, D) activations -> (mu, sigma)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def extract_inception_features(images: Iterable[np.ndarray],
                               feature_fn: Callable[[np.ndarray], np.ndarray],
                               batch_size: int = 32) -> np.ndarray:
    """Run a feature extractor over image batches and stack activations
    (ref: fid.py:19-47). Images are HWC float32 RGB in [0,1]; sizes may
    vary (the extractor resizes to 299), so ragged batches fall back to
    per-image calls."""
    feats = []
    batch: list = []

    def flush():
        if not batch:
            return
        if all(b.shape == batch[0].shape for b in batch):
            feats.append(np.asarray(feature_fn(np.stack(batch))))
        else:
            for b in batch:
                feats.append(np.asarray(feature_fn(b[None])))
        batch.clear()

    for img in images:
        batch.append(np.asarray(img, np.float32))
        if len(batch) == batch_size:
            flush()
    flush()
    return np.concatenate(feats, axis=0)


def load_patched_inception_v3(weights_path: str | None = None,
                              resize_input: bool = True,
                              normalize_input: bool = False,
                              output_blocks: Sequence[int] = (3,),
                              params=None) -> Callable[[np.ndarray], np.ndarray]:
    """Build the FID feature function (ref: fid.py:10-15): a jitted
    InceptionV3 returning flattened block-3 activations, (N, 2048).

    Weights come from `weights_path` (the pt_inception .pth; raw or
    reference-wrapper key layout) or a pre-converted flax `params` tree —
    one of the two is required since this environment cannot download.
    """
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.models.inception_arch import (
        FIDInceptionV3, fid_inception_state_dict_to_params)

    net = FIDInceptionV3(output_blocks=tuple(output_blocks),
                         resize_input=resize_input,
                         normalize_input=normalize_input)
    if params is None:
        if weights_path is None:
            raise ValueError(
                "FID needs InceptionV3 weights: pass weights_path (the "
                "pt_inception checkpoint, ref inception.py:13) or a "
                "converted params tree — no egress to download them here.")
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = fid_inception_state_dict_to_params(
            {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()})
        ref_struct = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 75, 75, 3)))["params"])
        got = jax.tree.structure(params)
        want = jax.tree.structure(ref_struct)
        if got != want:
            raise ValueError(
                f"converted inception tree does not match the architecture "
                f"(checkpoint {weights_path}); got {got.num_leaves} leaves, "
                f"expected {want.num_leaves}")

    @jax.jit
    def feature_fn(imgs):
        out = net.apply({"params": params}, jnp.asarray(imgs, jnp.float32))
        return out[-1].reshape(out[-1].shape[0], -1)

    return feature_fn


def calculate_fid(imgs1: Sequence[np.ndarray], imgs2: Sequence[np.ndarray],
                  inception_weights_path: str | None = None,
                  feature_fn: Callable | None = None,
                  batch_size: int = 32, **kwargs) -> float:
    """FID between two image SETS (HWC float [0,1] each). Needs enough
    images for a meaningful covariance — use dataset-sized folders."""
    if len(imgs1) < 2 or len(imgs2) < 2:
        raise ValueError("FID is a set statistic: give >=2 images per side "
                         "(realistically, a full dataset)")
    if feature_fn is None:
        feature_fn = load_patched_inception_v3(
            inception_weights_path, resize_input=True, normalize_input=True)
    f1 = extract_inception_features(imgs1, feature_fn, batch_size)
    f2 = extract_inception_features(imgs2, feature_fn, batch_size)
    return calculate_frechet_distance(*compute_statistics(f1),
                                      *compute_statistics(f2))
