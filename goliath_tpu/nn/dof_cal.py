"""Per-camera learnable defocus blur (reference: ca_code/nn/dof_cal.py:20-56).

Softmax mix of {identity, 3x3 gaussian blur, 7x7 gaussian blur} per camera;
`reg` exposes raw weights for the learn_blur loss.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


@lru_cache(maxsize=None)
def _gauss_kernel2d(ksize: int) -> np.ndarray:
    # torchvision gaussian_blur default sigma: 0.3*((k-1)*0.5 - 1) + 0.8
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - ksize // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    k2 = np.outer(g, g).astype(np.float32)
    return k2


def gaussian_blur(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """[B, C, H, W] depthwise gaussian blur, 'same' padding."""
    C = img.shape[1]
    k2 = _gauss_kernel2d(ksize)
    w = jnp.asarray(np.tile(k2[None, None], (C, 1, 1, 1)))
    pad = ksize // 2
    return lax.conv_general_dilated(
        img, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


class LearnableBlur(nn.Module):
    cameras: Sequence[str]

    def setup(self):
        self.weights_raw = self.param(
            "weights_raw",
            lambda key, shape: jnp.ones(shape, jnp.float32),
            (len(self.cameras), 3),
        )

    def name_to_idx(self, cam_names: Sequence[str]) -> jnp.ndarray:
        cameras = list(self.cameras)
        return jnp.asarray([cameras.index(c) for c in cam_names], jnp.int32)

    def reg(self, cam_idxs: jnp.ndarray) -> jnp.ndarray:
        return self.weights_raw[cam_idxs]

    def __call__(self, img: jnp.ndarray, cam_idxs: jnp.ndarray) -> jnp.ndarray:
        B = img.shape[0]
        weights = nn.softmax(self.weights_raw[cam_idxs], axis=-1)
        weights = weights.reshape(B, 3, 1, 1, 1)
        return (
            weights[:, 0] * img
            + weights[:, 1] * gaussian_blur(img, 3)
            + weights[:, 2] * gaussian_blur(img, 7)
        )
