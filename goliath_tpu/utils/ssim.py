"""Gaussian-window SSIM with optional masking (reference: ca_code/utils/ssim.py).

Implemented as depthwise convolutions, which XLA fuses and tiles onto the
MXU/VPU; mask-aware mean matches the reference (mean over masked pixels).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def _gaussian_taps(window_size: int, sigma: float) -> tuple:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g = g / g.sum()
    return tuple(float(v) for v in g)


def _depthwise(x: jnp.ndarray, taps: tuple) -> jnp.ndarray:
    """Separable gaussian blur over [B, C, H, W] as shift-and-add.

    Depthwise lax convs don't tile onto the MXU (1 input channel per group)
    and lower to slow scalarized VPU loops on TPU; K static slices + FMAs
    per axis fuse into one fast elementwise pass and cut the taps from K^2
    to 2K. Zero padding matches the conv's 'same' behavior.
    """
    K = len(taps)
    r = K // 2
    H, W = x.shape[2], x.shape[3]
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (0, 0)))
    acc = None
    for k in range(K):
        term = taps[k] * lax.slice_in_dim(xp, k, k + H, axis=2)
        acc = term if acc is None else acc + term
    xp = jnp.pad(acc, ((0, 0), (0, 0), (0, 0), (r, r)))
    acc = None
    for k in range(K):
        term = taps[k] * lax.slice_in_dim(xp, k, k + W, axis=3)
        acc = term if acc is None else acc + term
    return acc


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over [B, C, H, W]; if mask [B, 1, H, W], mean over masked px."""
    w = _gaussian_taps(window_size, sigma)
    mu1 = _depthwise(img1, w)
    mu2 = _depthwise(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise(img1 * img2, w) - mu12

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if mask is not None:
        m = jnp.broadcast_to(mask, ssim_map.shape)
        return jnp.sum(ssim_map * m) / jnp.clip(jnp.sum(m), min=1.0)
    return jnp.mean(ssim_map)
