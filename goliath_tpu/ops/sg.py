"""Spherical/angular Gaussian light integrator (replaces extensions/sgutils).

For each primitive, integrate point-light contributions through an angular
Gaussian lobe around a reflection direction. The CUDA original
(extensions/sgutils/sg.cu:27-175) loops lights per thread with handwritten
gradients; on TPU this is one einsum-style masked reduction over the light
axis — XLA fuses it and AD gives the same gradients for free, so no custom
kernel or VJP is needed. Weight types (sg.cu:57-70):

  0: normalized angular Gaussian  exp(-theta^2 / 2 sigma^2) / (sigma*(2pi)^1.5)
  1: unnormalized angular Gaussian
  2: vMF-style  exp((cos theta - 1)/sigma) / (2 pi sigma)
  3: unnormalized vMF
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp

_SQRT2PI23 = 3.03352966508  # (2*pi)^(3/2)
_TWOPI = 2.0 * math.pi


def evaluate_gaussian(
    lobe_dirs: jnp.ndarray,     # [N, D, 3]
    lobe_sigmas: jnp.ndarray,   # [N, D] or [N, D, 1]
    light_values: jnp.ndarray,  # [N, L, C]
    light_pts: jnp.ndarray,     # [N, L, 3]
    prim_pts: jnp.ndarray,      # [N, D, 3]
    n_lights: jnp.ndarray,      # [N] active light counts
    w_type: int = 0,
    normalize_lobe_dirs: bool = True,
) -> jnp.ndarray:
    """Returns [N, D, C] integrated light through the Gaussian lobe."""
    if normalize_lobe_dirs:
        lobe_dirs = lobe_dirs / jnp.clip(
            jnp.linalg.norm(lobe_dirs, axis=-1, keepdims=True), min=1e-12
        )
    if lobe_sigmas.ndim == 3:
        lobe_sigmas = lobe_sigmas[..., 0]

    N, L = light_pts.shape[:2]
    # light dirs per (prim, light): [N, D, L, 3]
    ldir = light_pts[:, None] - prim_pts[:, :, None]
    ldir = ldir / jnp.clip(jnp.linalg.norm(ldir, axis=-1, keepdims=True), min=1e-12)
    cos_dot = jnp.clip(
        jnp.sum(ldir * lobe_dirs[:, :, None], axis=-1), -1.0, 1.0
    )  # [N, D, L]
    sigma = lobe_sigmas[..., None]  # [N, D, 1]

    if w_type in (0, 1):
        # back off from |cos|=1 so d(arccos) stays finite under AD (the CUDA
        # backward has the same singularity; this changes the angle by <1e-3)
        angle = jnp.arccos(jnp.clip(cos_dot, -1.0 + 1e-7, 1.0 - 1e-7))
    if w_type == 0:
        weight = jnp.exp(-0.5 * (angle / sigma) ** 2) / (sigma * _SQRT2PI23)
    elif w_type == 1:
        weight = jnp.exp(-0.5 * (angle / sigma) ** 2)
    elif w_type == 2:
        weight = jnp.exp((cos_dot - 1.0) / sigma) / (sigma * _TWOPI)
    elif w_type == 3:
        weight = jnp.exp((cos_dot - 1.0) / sigma)
    else:
        raise ValueError(f"unknown w_type {w_type}")

    mask = (
        jnp.arange(L)[None, :] < n_lights[:, None]
    ).astype(weight.dtype)  # [N, L]
    weight = weight * mask[:, None]
    return jnp.einsum("ndl,nlc->ndc", weight, light_values)
