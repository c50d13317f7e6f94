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
        # The blend weights are nonzero only on a thin seam band (~1-2% of
        # texels), but the dense formulation grid_samples the FULL map
        # (4M 4-tap point gathers at 2048^2 per call, several calls per
        # step). Precompute the static nonzero-weight texel set once and
        # resample only those — exact, since weight==0 texels pass through.
        w = self.weights
        w2d = w.reshape(w.shape[-3:]) if w.ndim >= 3 else w[None]
        nz = np.nonzero(np.abs(w2d).max(axis=0) > 0)
        if nz[0].size == 0:
            nz = (np.zeros(1, np.int64), np.zeros(1, np.int64))
        self._sel_i = nz[0].astype(np.int32)
        self._sel_j = nz[1].astype(np.int32)
        uv2d = self.uvs
        self._sel_uv = uv2d[nz[0], nz[1]]                    # [K, 2]
        self._sel_w = w2d[:, nz[0], nz[1]].T                 # [K, Cw]

    def impaint(self, value: jnp.ndarray) -> jnp.ndarray:
        return impaint_batch(value, jnp.asarray(self.dst_ij), jnp.asarray(self.src_ij))

    def resample(self, tex: jnp.ndarray) -> jnp.ndarray:
        B = tex.shape[0]
        si = jnp.asarray(self._sel_i)
        sj = jnp.asarray(self._sel_j)
        grid = (2.0 * (jnp.asarray(self._sel_uv) - 0.5))[None, :, None, :]
        grid = jnp.broadcast_to(grid, (B,) + grid.shape[1:])  # [B, K, 1, 2]
        res = grid_sample(tex, grid, align_corners=False,
                          padding_mode="border")[..., 0]      # [B, C, K]
        w = jnp.asarray(self._sel_w.T)                        # [Cw, K]
        cur = tex[:, :, si, sj]                               # [B, C, K]
        blended = (1.0 - w)[None] * cur + w[None] * res
        return tex.at[:, :, si, sj].set(blended.astype(tex.dtype))

    def resample_border_only(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(tex)

    def __call__(self, tex: jnp.ndarray) -> jnp.ndarray:
        return self.resample(self.impaint(tex))
