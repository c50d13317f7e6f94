"""UV-seam-continuous texture resampling (reference: ca_code/utils/seams.py).

`SeamSampler` holds precomputed seam-crossing texel copies (dst<-src) and a
weighted grid_sample resample; data comes from the shared static assets
(`seam_data_1024` / `seam_data_2048`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from goliath_tpu.utils.sampling import grid_sample


def impaint_batch(value: jnp.ndarray, dst_ij: jnp.ndarray, src_ij: jnp.ndarray
                  ) -> jnp.ndarray:
    """Copy src texels into dst texels: value [B, C, H, W]."""
    src_vals = value[:, :, src_ij[:, 0], src_ij[:, 1]]
    return value.at[:, :, dst_ij[:, 0], dst_ij[:, 1]].set(src_vals)


def resample_tex(tex: jnp.ndarray, uvs: jnp.ndarray, weights: jnp.ndarray
                 ) -> jnp.ndarray:
    B = tex.shape[0]
    grid = 2.0 * (uvs[None] - 0.5)
    grid = jnp.broadcast_to(grid, (B,) + grid.shape[1:])
    resampled = grid_sample(tex, grid, align_corners=False, padding_mode="border")
    return (1.0 - weights) * tex + weights * resampled


class SeamSampler:
    def __init__(self, seamless_data: Dict[str, Any]) -> None:
        self.dst_ij = np.asarray(seamless_data["dst_ij"], np.int64)
        self.src_ij = np.asarray(seamless_data["src_ij"], np.int64)
        self.uvs = np.asarray(seamless_data["uvs"], np.float32)
        self.weights = np.asarray(seamless_data["weights"], np.float32)

    def impaint(self, value: jnp.ndarray) -> jnp.ndarray:
        return impaint_batch(value, jnp.asarray(self.dst_ij), jnp.asarray(self.src_ij))

    def resample(self, tex: jnp.ndarray) -> jnp.ndarray:
        return resample_tex(tex, jnp.asarray(self.uvs), jnp.asarray(self.weights))

    def resample_border_only(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(tex)

    def __call__(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(self.impaint(tex))
