"""Image quality metrics and conversions.

Parity target: reference nerf/models/model_utils.py:7-10 (img2mse, mse2psnr,
to8b/to8b_np lambdas).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def img2mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all pixels/channels."""
    return jnp.mean((pred - target) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB for signals in [0, 1]."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def to8b(x) -> np.ndarray:
    """Clamp to [0, 1] and quantize to uint8 (host-side)."""
    return (255.0 * np.clip(np.asarray(x), 0.0, 1.0)).astype(np.uint8)


def ssim(
    img0: np.ndarray,
    img1: np.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Structural similarity between two [H, W, C] float images.

    Standard Gaussian-windowed SSIM; used to validate renders against the
    reference (BASELINE.md fidelity target: >= 99% SSIM).
    """
    img0 = np.asarray(img0, dtype=np.float64)
    img1 = np.asarray(img1, dtype=np.float64)
    if img0.ndim == 2:
        img0, img1 = img0[..., None], img1[..., None]

    radius = filter_size // 2
    coords = np.arange(filter_size) - radius
    g = np.exp(-(coords**2) / (2.0 * filter_sigma**2))
    g /= g.sum()

    def blur(img: np.ndarray) -> np.ndarray:
        out = np.apply_along_axis(lambda r: np.convolve(r, g, mode="valid"), 0, img)
        out = np.apply_along_axis(lambda r: np.convolve(r, g, mode="valid"), 1, out)
        return out

    mu0, mu1 = blur(img0), blur(img1)
    sigma00 = blur(img0 * img0) - mu0**2
    sigma11 = blur(img1 * img1) - mu1**2
    sigma01 = blur(img0 * img1) - mu0 * mu1

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu0 * mu1 + c1) * (2 * sigma01 + c2)
    denom = (mu0**2 + mu1**2 + c1) * (sigma00 + sigma11 + c2)
    return float(np.mean(numer / denom))
