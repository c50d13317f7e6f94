"""Camera ray generation (replaces extensions/utils CUDA ray generator).

Pure jnp: per-pixel ray dirs + entry/exit parameters against the [-1, 1]^3
normalized volume (reference: extensions/utils/utils_kernel.cu:11-51).
Fuses with downstream consumers under jit — no standalone kernel needed on
TPU; this is bandwidth-trivial elementwise work for the VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def compute_raydirs(
    viewpos: jnp.ndarray,      # [N, 3] camera position (world)
    viewrot: jnp.ndarray,      # [N, 3, 3] world-to-cam rotation (rows = axes)
    focal: jnp.ndarray,        # [N, 2] (fx, fy)
    princpt: jnp.ndarray,      # [N, 2]
    pixelcoords: jnp.ndarray,  # [N, H, W, 2] pixel coords (or meshgrid)
    volradius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (raypos [N,H,W,3], raydir [N,H,W,3], tminmax [N,H,W,2])."""
    N, H, W = pixelcoords.shape[:3]
    raypos = viewpos / volradius  # [N, 3]

    p = (pixelcoords - princpt[:, None, None]) / focal[:, None, None]
    d = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)  # cam space
    # rotate into world: d_world = R^T d  ==  sum_k R[k] * d[k]
    d = jnp.einsum("nkc,nhwk->nhwc", viewrot, d)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    rp = raypos[:, None, None]
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    t1 = (-1.0 - rp) / safe_d
    t2 = (1.0 - rp) / safe_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    tminmax = jnp.stack([jnp.maximum(tmin, 0.0), tmax], axis=-1)

    raypos_img = jnp.broadcast_to(rp, (N, H, W, 3))
    return raypos_img, d, tminmax


def make_pixelcoords(
    N: int, H: int, W: int, dtype=jnp.float32
) -> jnp.ndarray:
    x, y = jnp.meshgrid(
        jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype), indexing="xy"
    )
    return jnp.broadcast_to(jnp.stack([x, y], -1)[None], (N, H, W, 2))
