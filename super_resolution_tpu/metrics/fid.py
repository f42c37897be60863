"""FID — Frechet Inception Distance (ref: basicsr/metrics/fid.py).

The Frechet distance math and statistics extraction are fully implemented;
the InceptionV3 feature extractor requires pretrained weights which cannot
be downloaded in deployment environments (no egress). Pass any feature
extractor callable to :func:`extract_inception_features` (e.g. a converted
torchvision InceptionV3, or a jax reimplementation once weights are
provided via `inception_weights_path`).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
from scipy import linalg

from super_resolution_tpu.utils.registry import METRIC_REGISTRY


def calculate_frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                               mu2: np.ndarray, sigma2: np.ndarray,
                               eps: float = 1e-6) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))
    (numerics per the standard implementation the reference uses)."""
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
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
    """Run a feature extractor over image batches and stack activations."""
    feats = []
    batch = []
    for img in images:
        batch.append(img)
        if len(batch) == batch_size:
            feats.append(np.asarray(feature_fn(np.stack(batch))))
            batch = []
    if batch:
        feats.append(np.asarray(feature_fn(np.stack(batch))))
    return np.concatenate(feats, axis=0)


def load_inception_feature_fn(weights_path: str | None = None):
    if weights_path is None:
        raise ValueError(
            "FID needs InceptionV3 weights (inception_weights_path); this "
            "environment cannot download them. Provide the pt_inception "
            "checkpoint the reference uses, or precompute activations and "
            "call calculate_frechet_distance directly.")
    raise NotImplementedError(
        "InceptionV3 conversion pending weights availability; pass a custom "
        "feature_fn to extract_inception_features meanwhile.")


@METRIC_REGISTRY.register()
def calculate_fid(img, img2, inception_weights_path: str | None = None,
                  **kwargs) -> float:
    """Metric-registry surface; requires inception weights (gated)."""
    feature_fn = load_inception_feature_fn(inception_weights_path)
    f1 = extract_inception_features([img], feature_fn)
    f2 = extract_inception_features([img2], feature_fn)
    return calculate_frechet_distance(*compute_statistics(f1),
                                      *compute_statistics(f2))
