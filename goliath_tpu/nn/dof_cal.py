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
def _gauss_taps(ksize: int) -> tuple:
    # torchvision gaussian_blur default sigma: 0.3*((k-1)*0.5 - 1) + 0.8
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - ksize // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return tuple(float(v) for v in g)


def gaussian_blur(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """[B, C, H, W] gaussian blur, 'same' zero padding.

    Separable shift-and-add: depthwise lax convs scalarize on TPU (no MXU
    path for 1-input-channel groups); 2K static slices + FMAs fuse into one
    elementwise pass (same rewrite as utils/ssim.py).
    """
    taps = _gauss_taps(ksize)
    r = ksize // 2
    H, W = img.shape[2], img.shape[3]
    xp = jnp.pad(img, ((0, 0), (0, 0), (r, r), (0, 0)))
    acc = None
    for k in range(ksize):
        term = taps[k] * lax.slice_in_dim(xp, k, k + H, axis=2)
        acc = term if acc is None else acc + term
    xp = jnp.pad(acc, ((0, 0), (0, 0), (0, 0), (r, r)))
    acc = None
    for k in range(ksize):
        term = taps[k] * lax.slice_in_dim(xp, k, k + W, axis=3)
        acc = term if acc is None else acc + term
    return acc


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
