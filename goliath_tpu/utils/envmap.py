"""Equirect environment-map ops (reference: ca_code/utils/envmap.py).

Rotation, camera-background projection, mirrorball rendering, SG
importance-sampled prefiltering, and direction->equirect-UV mapping.
All pure jnp (grid_sample gathers fuse under jit); the SG prefilter takes an
explicit PRNG key instead of torch's global RNG.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from goliath_tpu.utils.sampling import grid_sample, interpolate_bilinear

_PI = math.pi


def _sphere_dirs(height: int, width: int) -> jnp.ndarray:
    """Unit direction per equirect texel, [H, W, 3]; y is up (reference conv)."""
    theta = (jnp.arange(height, dtype=jnp.float32) + 0.5) * _PI / height
    phi = (
        jnp.arange(-(width // 2), width - width // 2, dtype=jnp.float32) + 0.5
    ) * 2.0 * _PI / width
    theta = theta[:, None]
    phi = phi[None, :]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack(
        [st * jnp.sin(phi), jnp.broadcast_to(ct, (height, width)), st * jnp.cos(phi)],
        axis=-1,
    )


def dir2uv(d: jnp.ndarray, dim: int = 1) -> jnp.ndarray:
    """Direction -> equirect grid-sample coords in [-1, 1]^2."""
    d = jnp.moveaxis(d, dim, -1)
    u = (1.0 / _PI) * jnp.arctan2(d[..., 0], d[..., 2])
    v = (1.0 / _PI) * jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    return jnp.stack([u, 2.0 * v - 1.0], axis=-1)


def rotate_envmap_mat(image: jnp.ndarray, rot_mat: jnp.ndarray) -> jnp.ndarray:
    """Rotate an envmap [3, H, W] by a rotation matrix (world-space)."""
    H, W = image.shape[1:]
    vec = _sphere_dirs(H, W)
    vec = jnp.clip(vec @ rot_mat, -1.0, 1.0)
    uv = dir2uv(vec, dim=-1)
    return grid_sample(image[None], uv[None], padding_mode="border")[0]


def rotate_envmap(image: jnp.ndarray, rot_x: float = 0.0, rot_y: float = 0.0,
                  rot_z: float = 0.0) -> jnp.ndarray:
    from goliath_tpu.utils.quaternion import axisangle_to_matrix

    Rx = axisangle_to_matrix(jnp.asarray([rot_x, 0.0, 0.0]))
    Ry = axisangle_to_matrix(jnp.asarray([0.0, rot_y, 0.0]))
    Rz = axisangle_to_matrix(jnp.asarray([0.0, 0.0, rot_z]))
    return rotate_envmap_mat(image, (Rz @ Ry @ Rx).T)


def envmap_to_image(
    w: int, h: int, envbg: jnp.ndarray, princpt: jnp.ndarray, focal: jnp.ndarray,
    camrot: Optional[jnp.ndarray] = None, focal_scale: float = 0.2,
    blurbg: bool = True,
) -> jnp.ndarray:
    """Project envmap to a camera background [B, 3, h, w] (reference :169-229)."""
    B = princpt.shape[0]
    px, py = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32),
        indexing="xy",
    )
    pix = jnp.stack([px, py], -1)[None]
    raydir = pix - princpt[:, None, None, :]
    raydir = raydir / (
        jnp.stack([focal[:, 0, 0], focal[:, 1, 1]], -1)[:, None, None] * focal_scale
    )
    raydir = jnp.concatenate([raydir, jnp.ones_like(raydir[..., :1])], axis=-1)
    if camrot is not None:
        raydir = jnp.einsum("bxy,bhwx->bhwy", camrot, raydir)
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)
    uv = dir2uv(raydir, dim=-1)
    bg = grid_sample(envbg, uv, padding_mode="border", align_corners=True)
    if blurbg:
        k = jnp.exp(-jnp.linspace(-4.0, 4.0, 101) ** 2)
        k2 = k[:, None] * k[None, :]
        k2 = (k2 / k2.sum())[None, None]
        kern = jnp.tile(k2, (3, 1, 1, 1))
        bg = lax.conv_general_dilated(
            bg, kern, (1, 1), [(50, 50), (50, 50)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=3,
        )
        bg = interpolate_bilinear(bg, size=(h, w))
    return bg


def envmap_to_mirrorball(w: int, h: int, env: jnp.ndarray,
                         camrot: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Render envmap as a mirrored ball inset: [B, 4, h, w] (rgb + mask)."""
    py, px = jnp.meshgrid(
        jnp.linspace(-1.0, 1.0, h), jnp.linspace(-1.0, 1.0, w), indexing="ij"
    )
    pix = jnp.stack([px, py], -1)[None]
    pix = jnp.broadcast_to(pix, (env.shape[0], h, w, 2))
    zsq = jnp.sum(pix**2, -1, keepdims=True)
    mask = (zsq < 1.0).astype(env.dtype)[:, None, :, :, 0]
    nz = -jnp.sqrt(jnp.clip(1.0 - zsq, min=0.0))
    nml = jnp.concatenate([pix, nz], -1)
    ref = -2.0 * nz * nml
    ref = ref.at[..., 2].add(1.0)
    if camrot is not None:
        ref = jnp.einsum("bxy,bhwx->bhwy", camrot, ref)
    uv = dir2uv(ref, dim=-1)
    ball = grid_sample(env, uv, padding_mode="border", align_corners=True)
    return jnp.concatenate([ball, mask], axis=1)


def importance_sample_sg(
    Xi: jnp.ndarray, n: jnp.ndarray, sigma: float, dim: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample a spherical Gaussian lobe around normals n.

    Xi: uniform randoms, 2 channels along `dim`; n: unit vectors, 3 channels.
    """
    Xi = jnp.moveaxis(Xi, dim, -1)
    n_ = jnp.moveaxis(n, dim, -1)
    phi = 2.0 * _PI * Xi[..., 0:1]
    sqrt2sigma = math.sqrt(2.0) * sigma
    theta_new = sqrt2sigma * jax.scipy.special.erfinv(
        Xi[..., 1:2] * math.erf(_PI / sqrt2sigma)
    )
    cos_t, sin_t = jnp.cos(theta_new), jnp.sin(theta_new)
    Hv = jnp.concatenate(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1
    )
    pdf = (
        math.sqrt(2.0) * _PI ** (-0.5)
        / (sigma * math.erf(_PI / sqrt2sigma))
        * jnp.exp(-0.5 * (theta_new / sigma) ** 2)
    )
    m = (n_[..., 2:3] < 0.999)
    up = jnp.concatenate(
        [jnp.where(m, 0.0, 1.0), jnp.zeros_like(m, n_.dtype),
         jnp.where(m, 1.0, 0.0)], axis=-1,
    )
    tangent = jnp.cross(up, n_)
    tangent = tangent / jnp.clip(jnp.linalg.norm(tangent, axis=-1, keepdims=True),
                                 min=1e-12)
    bitangent = jnp.cross(n_, tangent)
    sample = tangent * Hv[..., 0:1] + bitangent * Hv[..., 1:2] + n_ * Hv[..., 2:3]
    sample = sample / jnp.clip(jnp.linalg.norm(sample, axis=-1, keepdims=True),
                               min=1e-12)
    return jnp.moveaxis(sample, -1, dim), jnp.moveaxis(pdf, -1, dim)


def sample_dirs(d: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Sample equirect img [B,3,H',W'] at directions d [B,3,H,W]."""
    uv = dir2uv(d, 1)
    return grid_sample(img, uv, padding_mode="border", align_corners=False)


def prefilter_envmap_sg(
    sigma: float, v: jnp.ndarray, env_tex: jnp.ndarray,
    key: jax.Array, num_samples: int = 1,
) -> jnp.ndarray:
    """Monte-Carlo SG prefilter of an envmap along directions v [B,3,H,W]."""
    acc = jnp.zeros_like(v)
    for i in range(num_samples):
        k = jax.random.fold_in(key, i)
        x_i = jax.random.uniform(k, v[:, :2].shape, dtype=v.dtype)
        v_sample, _ = importance_sample_sg(x_i, v, sigma)
        acc = acc + sample_dirs(v_sample, env_tex)
    return acc / float(num_samples)


def compose_envmap(render, alpha, envbg, K, Rt):
    """Composite a render over the envmap bg + mirrorball inset (:325-344).

    The inset is 200px like the reference, shrunk to fit small renders.
    """
    ms = min(200, render.shape[-1], render.shape[-2])
    env_mirror = envmap_to_mirrorball(ms, ms, envbg, Rt[:, :3, :3])
    mirror_img = jnp.zeros_like(render)
    mirror_alpha = jnp.zeros_like(alpha)
    mirror_alpha = mirror_alpha.at[:, :, -ms:, -ms:].set(env_mirror[:, 3:])
    mirror_img = mirror_img.at[:, :, -ms:, -ms:].set(env_mirror[:, :3])

    bg = envmap_to_image(
        render.shape[-1], render.shape[-2], envbg, K[:, :2, 2], K, Rt[:, :3, :3]
    )
    render = render + (1.0 - alpha) * jnp.clip(bg, 0.0, 1.0)
    return (1.0 - mirror_alpha) * render + mirror_alpha * mirror_img
