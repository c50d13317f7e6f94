"""get_shadow_map's fused one-gather tap path vs a per-tap grid_sample
oracle (the reference formulation, ca_code/utils/shadowmap.py:58-85)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.utils.sampling import grid_sample


def _oracle_soft_compare(depth, v_pix_n, v_depth_1):
    """Original 9x2 grid_sample formulation."""
    kernel = 3
    sigma = 0.3 * ((kernel - 1) * 0.5 - 1) + 0.8
    dx = 2.0 / depth.shape[-1]
    dy = 2.0 / depth.shape[-2]
    valid_sum = 0.0
    shadow_sum = 0.0
    dmask = (depth > 0.0).astype(depth.dtype)
    for x in range(kernel):
        for y in range(kernel):
            weight = math.exp(
                -((x - kernel // 2) ** 2 + (y - kernel // 2) ** 2)
                / (2.0 * sigma**2))
            off = jnp.asarray(
                [dx * (x - kernel // 2), dy * (y - kernel // 2)], depth.dtype)
            g = v_pix_n + off[None, None, None]
            d = grid_sample(depth, g, mode="nearest", align_corners=False)
            w = grid_sample(dmask, g, mode="nearest", align_corners=False)
            v_depth_2 = d / (w + 1e-8)
            valid = weight * (w > 1e-4).astype(depth.dtype)
            valid_sum = valid_sum + valid
            shadow_sum = shadow_sum + valid * jnp.clip(
                v_depth_1 - v_depth_2, min=0.0)
    return shadow_sum / (valid_sum + 1e-6)


def _fused_soft_compare(depth, v_pix_n, v_depth_1):
    """The production path, extracted: mirrors utils/shadowmap.py."""
    kernel = 3
    sigma = 0.3 * ((kernel - 1) * 0.5 - 1) + 0.8
    B = depth.shape[0]
    H, W = v_pix_n.shape[1], v_pix_n.shape[2]
    hs, ws = depth.shape[2], depth.shape[3]
    dmask = (depth > 0.0).astype(depth.dtype)
    dm = jnp.concatenate([depth, dmask], axis=1)
    dm_p = jnp.pad(dm, ((0, 0), (0, 0), (1, 1), (1, 1)))
    planes, weights = [], []
    for y in range(kernel):
        for x in range(kernel):
            weights.append(math.exp(
                -((x - kernel // 2) ** 2 + (y - kernel // 2) ** 2)
                / (2.0 * sigma**2)))
            planes.append(dm_p[:, :, y:y + hs, x:x + ws])
    stacked = jnp.concatenate(planes, axis=1)
    cl = stacked.reshape(B, 2 * 9, hs * ws).transpose(0, 2, 1)
    bx = jnp.round((v_pix_n[..., 0] + 1.0) * ws * 0.5 - 0.5).astype(jnp.int32)
    by = jnp.round((v_pix_n[..., 1] + 1.0) * hs * 0.5 - 0.5).astype(jnp.int32)
    base_ok = ((bx >= 0) & (bx < ws) & (by >= 0) & (by < hs)).astype(
        depth.dtype)
    idx = jnp.clip(by, 0, hs - 1) * ws + jnp.clip(bx, 0, ws - 1)
    rows = jnp.take_along_axis(cl, idx.reshape(B, -1, 1), axis=1)
    rows = rows * base_ok.reshape(B, -1, 1)
    d9 = rows[..., 0::2].reshape(B, H, W, 9)
    w9 = rows[..., 1::2].reshape(B, H, W, 9)
    wt = jnp.asarray(weights, depth.dtype)
    v2 = d9 / (w9 + 1e-8)
    valid = wt[None, None, None] * (w9 > 1e-4).astype(depth.dtype)
    v1 = v_depth_1[:, 0][..., None]
    return (jnp.sum(valid * jnp.clip(v1 - v2, min=0.0), axis=-1)
            / (jnp.sum(valid, axis=-1) + 1e-6))[:, None]


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_taps_match_grid_sample_oracle(seed):
    rng = np.random.RandomState(seed)
    B, hs, ws, H, W = 2, 24, 20, 17, 13
    depth = jnp.asarray(
        np.where(rng.rand(B, 1, hs, ws) > 0.3,
                 rng.rand(B, 1, hs, ws) * 5 + 1, 0.0).astype(np.float32))
    # sample points strictly inside the map (the fused path documents a
    # <=1-texel border-ring semantic difference)
    v_pix_n = jnp.asarray(
        (rng.rand(B, H, W, 2) * 1.6 - 0.8).astype(np.float32))
    v1 = jnp.asarray((rng.rand(B, 1, H, W) * 6).astype(np.float32))

    ref = np.asarray(_oracle_soft_compare(depth, v_pix_n, v1))
    got = np.asarray(_fused_soft_compare(depth, v_pix_n, v1))
    np.testing.assert_allclose(got[:, 0], ref[:, 0], rtol=1e-5, atol=1e-5)
