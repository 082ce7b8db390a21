"""Host-side metric math: Frechet distance and Inception Score.

Numerics match the reference (experiments/util.py:44-111): stable-sqrtm
FID (the mseitzer/pytorch-fid formulation) and the 10-split exp-entropy
Inception Score. These run on host numpy/scipy — the covariance sqrtm is
a one-off O(2048^3) eig problem, not worth a TPU kernel.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg
from scipy.stats import entropy


def _sqrtm_quiet(m: np.ndarray) -> np.ndarray:
    """Matrix square root on the reference's quiet fallback path
    (experiments/util.py:81 uses disp=False): near-singular eval
    covariances are expected — the caller's finite-check + eps retry is
    the real guard, so scipy's LinAlgWarning chatter is suppressed.
    Handles both old scipy (tuple return with disp=False) and new scipy
    (disp removed, warns instead)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = linalg.sqrtm(m)
    return out[0] if isinstance(out, tuple) else out


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6):
    """FID between two Gaussians:
    d^2 = ||mu1 - mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)).
    """
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)

    assert mu1.shape == mu2.shape, "mean vectors have different lengths"
    assert sigma1.shape == sigma2.shape, "covariances have different dims"

    diff = mu1 - mu2

    covmean = _sqrtm_quiet(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm_quiet((sigma1 + offset).dot(sigma2 + offset))

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
            - 2 * np.trace(covmean))


def calculate_inception_score(prob: np.ndarray, splits: int = 10):
    """10-split exp-mean-KL Inception Score over softmax probs [N,1000]."""
    scores = []
    length = prob.shape[0]
    step = max(length // splits, 1)
    for k in range(0, length, step):
        part = prob[k:k + step, :]
        py = np.mean(part, axis=0)
        kl = [entropy(part[i, :], py) for i in range(part.shape[0])]
        scores.append(np.exp(np.mean(kl)))
    return float(np.mean(scores)), float(np.std(scores))
