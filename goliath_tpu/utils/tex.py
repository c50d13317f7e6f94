"""UV unprojection wrapper (reference: ca_code/utils/tex.py:21-63)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from goliath_tpu.ops.rasterizer import RenderLayer, rasterize, transform
from goliath_tpu.utils.geom import compute_view_texture


def get_tex_rl(
    rl: RenderLayer,
    image: jnp.ndarray,        # [1, 3, H, W]
    ply: Tuple[jnp.ndarray, jnp.ndarray],
    extrin: jnp.ndarray,       # [1, 3, 4]
    intrin: jnp.ndarray,       # [1, 3, 3]
    face_index: jnp.ndarray,   # [T, T]
    index_image: jnp.ndarray,  # [T, T, 3]
    bary_image: jnp.ndarray,   # [T, T, 3]
):
    """Unproject one camera image into UV; returns (tex, visibility mask)."""
    geom, faces = ply
    v_pix = transform(geom, intrin, extrin)
    index_img = jax.vmap(
        lambda vp: rasterize(vp, rl.vi, rl.h, rl.w, **rl.raster_kwargs)
    )(v_pix)
    return compute_view_texture(
        geom, faces, image, index_img, None, intrin, extrin,
        index_image, bary_image, face_index,
        intensity_threshold=None, normal_threshold=0.1,
    )
