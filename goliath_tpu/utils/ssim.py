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
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma**2)
    )
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w[None, None]  # [1, 1, K, K]


def _depthwise(x: jnp.ndarray, w2d: np.ndarray) -> jnp.ndarray:
    """Depthwise conv [B, C, H, W] with shared 2D window, same padding."""
    C = x.shape[1]
    k = w2d.shape[-1]
    w = jnp.asarray(np.repeat(w2d, C, axis=0))  # [C, 1, K, K]
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over [B, C, H, W]; if mask [B, 1, H, W], mean over masked px."""
    w = _gaussian_window(window_size, sigma)
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
