"""Trilinear mipmap sampling (reference: ca_code/utils/mipmap_sampler.py).

Samples every mip level with grid_sample, then lerps between the floor/ceil
level per sample according to a continuous (e.g. roughness-driven) mip level.
Levels are a static Python list, so this unrolls into q fused gathers.
"""

from __future__ import annotations

from typing import List, Union

import jax.numpy as jnp

from goliath_tpu.utils.sampling import grid_sample


def mipmap_grid_sample(
    input: Union[List[jnp.ndarray], jnp.ndarray],
    grid: jnp.ndarray,
    mipmap_level: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = False,
) -> jnp.ndarray:
    """input: list of mip levels [B, C, H_i, W_i]; grid: [B, Ho, Wo, 2];
    mipmap_level: [B, Ho, Wo] continuous level."""
    if isinstance(input, jnp.ndarray):
        input = [input]
    q = len(input)
    lam = jnp.clip(mipmap_level, 0.0, q - 1 - 1e-6)
    d1 = jnp.floor(lam).astype(jnp.int32)
    a = lam - d1.astype(lam.dtype)

    sampled = [
        grid_sample(level, grid, mode=mode, padding_mode=padding_mode,
                    align_corners=align_corners)
        for level in input
    ]
    if q == 1:
        return sampled[0]
    stacked = jnp.stack(sampled, axis=0)  # [q, B, C, Ho, Wo]
    lo = jnp.take_along_axis(
        stacked, d1[None, :, None].astype(jnp.int32), axis=0
    )[0]
    hi = jnp.take_along_axis(
        stacked, (d1 + 1)[None, :, None].astype(jnp.int32), axis=0
    )[0]
    return lo + (hi - lo) * a[:, None]
