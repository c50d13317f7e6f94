"""Differentiable image sampling (torch.nn.functional.grid_sample equivalent).

The reference leans on grid_sample for UV<->vertex transfer, seam resampling,
envmap rotation, and mipmap lookups. Here it is a pure gather+lerp in jnp:
XLA lowers the gathers to efficient dynamic-slices and fuses the lerp, which
is the right formulation for TPU (no scatter in the forward pass; the
backward becomes a scatter-add that XLA handles).

Convention matches torch: `grid` is [..., 2] with (x, y) in [-1, 1],
`align_corners` semantics identical.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    mode: Literal["bilinear", "nearest"] = "bilinear",
    padding_mode: Literal["zeros", "border"] = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample `image` [B, C, H, W] at `grid` [B, Ho, Wo, 2] -> [B, C, Ho, Wo].

    grid[..., 0] is x (width), grid[..., 1] is y (height), in [-1, 1].
    """
    B, C, H, W = image.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if mode == "nearest":
        # torch rounds half away from zero here; round-to-even diff is < 1ulp
        # at pixel centers and irrelevant in practice.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        out = _gather2d(image, iyc, ixc)
        if padding_mode == "zeros":
            out = out * valid[:, None].astype(image.dtype)
        return out

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(image.dtype)
    wy = (y - y0).astype(image.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros((B, C) + grid.shape[1:-1], dtype=image.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            w = (wx if dx else (1.0 - wx)) * (wy if dy else (1.0 - wy))
            if padding_mode == "zeros":
                valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                w = w * valid.astype(image.dtype)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            out = out + _gather2d(image, yi, xi) * w[:, None]
    return out


def _gather2d(image: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """image [B, C, H, W], iy/ix [B, ...spatial] -> [B, C, ...spatial].

    Routed through take_cols so the backward (splatting cotangents into the
    image) is the sort-based indexed_add instead of a TPU scatter-add
    (~370ms for a 2M-point texture-gather adjoint)."""
    import jax

    from goliath_tpu.ops.scatter import take_cols

    B, C, H, W = image.shape
    flat = image.reshape(B, C, H * W)
    idx = (iy * W + ix).reshape(B, -1)  # [B, P]
    g = jax.vmap(take_cols)(flat, idx)  # [B, C, P]
    return g.reshape((B, C) + iy.shape[1:])


@lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Static 1-D bilinear interpolation matrix [n_out, n_in] (2 taps/row)."""
    if align_corners:
        xs = np.linspace(0.0, n_in - 1.0, n_out, dtype=np.float64)
    else:
        xs = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    x0 = np.clip(np.floor(xs), 0, n_in - 1)
    x1 = np.clip(x0 + 1, 0, n_in - 1)
    w = np.clip(xs - x0, 0.0, 1.0)
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    m[rows, x0.astype(np.int64)] += (1.0 - w).astype(np.float32)
    m[rows, x1.astype(np.int64)] += w.astype(np.float32)
    return m


def interpolate_bilinear(
    image: jnp.ndarray, scale_factor: float | None = None,
    size: tuple[int, int] | None = None, align_corners: bool = False,
) -> jnp.ndarray:
    """F.interpolate(mode='bilinear') equivalent for [B, C, H, W].

    TPU formulation: separable static interpolation-matrix products
    (out = My @ img @ Mx^T) instead of row/column gathers. Gather outputs
    at UNet-ladder scale get awkward XLA layouts (observed: 3.2x-padded
    640 MB remat copies in the hand_teacher OLAT UNet backward = a
    reference-scale HBM OOM), and the gather adjoint is a serialized
    scatter-add; the matmul form rides the MXU with a transposed-matmul
    adjoint. HIGHEST precision keeps it exact in f32 (2-tap weights)."""
    B, C, H, W = image.shape
    if size is None:
        size = (int(H * scale_factor), int(W * scale_factor))
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return image
    prec = jax.lax.Precision.HIGHEST
    out = image
    if Ho != H:
        my = jnp.asarray(_interp_matrix(H, Ho, align_corners),
                         dtype=image.dtype)
        out = jnp.einsum("oh,bchw->bcow", my, out, precision=prec)
    if Wo != W:
        mx = jnp.asarray(_interp_matrix(W, Wo, align_corners),
                         dtype=image.dtype)
        out = jnp.einsum("pw,bchw->bchp", mx, out, precision=prec)
    return out


def grid_sample_3d(
    vol: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: Literal["zeros", "border"] = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Trilinear sample vol [C, D, H, W] at coords [..., 3] (x, y, z) in
    [-1, 1] -> [C, ...]. Matches torch grid_sample 3D semantics."""
    C, D, H, W = vol.shape
    x = _unnormalize(coords[..., 0], W, align_corners)
    y = _unnormalize(coords[..., 1], H, align_corners)
    z = _unnormalize(coords[..., 2], D, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0).astype(vol.dtype)
    wy = (y - y0).astype(vol.dtype)
    wz = (z - z0).astype(vol.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    flat = vol.reshape(C, -1)
    out = jnp.zeros((C,) + coords.shape[:-1], dtype=vol.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi, zi = x0i + dx, y0i + dy, z0i + dz
                w = ((wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                     * (wz if dz else 1 - wz))
                if padding_mode == "zeros":
                    vmask = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                             & (zi >= 0) & (zi < D))
                    w = w * vmask.astype(vol.dtype)
                xi = jnp.clip(xi, 0, W - 1)
                yi = jnp.clip(yi, 0, H - 1)
                zi = jnp.clip(zi, 0, D - 1)
                idx = (zi * H + yi) * W + xi
                vals = flat[:, idx.reshape(-1)].reshape(
                    (C,) + coords.shape[:-1]
                )
                out = out + vals * w[None]
    return out


def avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Average pool [B, C, H, W] with stride == kernel == k."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // k, k, W // k, k)
    return x.mean(axis=(3, 5))
