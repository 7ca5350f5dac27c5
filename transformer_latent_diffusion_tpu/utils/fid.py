"""Fréchet distance / FID computation.

The reference lists "add script to compute FID" as an open TODO
(reference README.md, "TODOS" section); this ships it. The metric is
extractor-agnostic: FID is the Fréchet distance between two gaussians
fitted to feature sets — classic FID uses InceptionV3 pool features,
CLIP-FID uses a CLIP image tower. The API takes feature arrays from any
extractor; in-repo extractors are the Flax CLIP image tower
(utils/clip_eval.clip_image_features — literature-comparable CLIP-FID
once real ViT-L/14 weights are converted) and the Flax VAE encoder
("latent FID" below — a tower-free relative metric for
checkpoint-to-checkpoint comparison). See scripts/compute_fid.py.
"""

from __future__ import annotations

import numpy as np


def gaussian_stats(feats: np.ndarray):
    """Feature matrix (N, D) -> (mean (D,), covariance (D, D))."""
    feats = np.asarray(feats, dtype=np.float64)
    if feats.ndim != 2:
        feats = feats.reshape(feats.shape[0], -1)
    if feats.shape[0] < 2:
        raise ValueError(f"need >= 2 samples, got {feats.shape[0]}")
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """d^2 = |mu1-mu2|^2 + tr(C1 + C2 - 2 (C1^0.5 C2 C1^0.5)^0.5).

    The matrix square roots are taken via symmetric eigendecomposition
    (C1^0.5 C2 C1^0.5 is symmetric PSD up to roundoff — eigenvalues are
    clipped at 0), avoiding scipy.linalg.sqrtm's complex drift on
    near-singular covariances from small sample counts.
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64)
    cov2 = np.asarray(cov2, np.float64)

    def _sqrtm_psd(mat):
        vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
        return (vecs * np.sqrt(np.clip(vals, 0.0, None))) @ vecs.T

    s1 = _sqrtm_psd(cov1)
    covmean = _sqrtm_psd(s1 @ cov2 @ s1)
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def compute_fid(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets (N, D) — any extractor's features."""
    return frechet_distance(*gaussian_stats(feats_a),
                            *gaussian_stats(feats_b))


def save_stats(path: str, feats: np.ndarray) -> None:
    """Fit and persist gaussian stats (mu, cov, n) for a feature set —
    the pytorch-fid-style precomputed-reference workflow: fit the real
    set once, reuse the small stats file for every later comparison."""
    mu, cov = gaussian_stats(feats)
    np.savez(path, mu=mu, cov=cov, n=np.int64(len(feats)))


def load_stats(path: str):
    """-> (mu, cov) from a save_stats file."""
    with np.load(path) as z:
        if "mu" not in z or "cov" not in z:
            raise ValueError(
                f"{path}: not a FID stats file (needs 'mu' and 'cov')")
        return z["mu"], z["cov"]


def vae_latent_features(images_nchw: np.ndarray, vae,
                        batch_size: int = 32) -> np.ndarray:
    """Encode images (N,3,H,W) in [-1,1] to flattened VAE latent means.

    A pretrained-tower-free feature extractor for relative ("latent")
    FID between checkpoints; pass real Inception/CLIP-image features to
    compute_fid for literature-comparable numbers.

    Batches go through the FlaxVae's jit-cached deterministic-mean
    encode (one compiled program, posterior mean — no sampling noise);
    the ragged final batch is zero-padded to `batch_size` so every call
    reuses the same compiled shape, then sliced back.
    """
    import jax.numpy as jnp

    n = images_nchw.shape[0]
    feats = []
    for i in range(0, n, batch_size):
        batch = np.asarray(images_nchw[i:i + batch_size], dtype=np.float32)
        m = batch.shape[0]
        if m < batch_size:
            batch = np.concatenate(
                [batch, np.zeros((batch_size - m,) + batch.shape[1:],
                                 np.float32)], axis=0)
        mean = vae.encode_mean(jnp.asarray(batch))[:m]
        feats.append(np.asarray(mean).reshape(m, -1))
    return np.concatenate(feats, axis=0)
