"""Batch-folded Pallas render (ONE kernel launch for B samples) vs the
unrolled per-sample Pallas path: outputs and gradients must match.

Runs both paths in interpret mode on CPU. The scene uses well-separated
depths and a generous pair budget so per-sample vs global depth
quantization / budget semantics cannot reorder or drop pairs — any
difference is then a real indexing bug in the fold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.ops import gsplat, gsplat_pallas


@pytest.fixture(scope="module")
def scene():
    rs = np.random.RandomState(7)
    B, N = 3, 220
    H, W = 64, 32
    K = np.asarray([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]] * B,
                   np.float32)
    Rt = np.asarray([np.eye(4)[:3]] * B, np.float32)
    pos = rs.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    pos[..., 2] = rs.uniform(3.0, 9.0, (B, N))  # well-separated depths
    quat = rs.standard_normal((B, N, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    scale = np.exp(rs.standard_normal((B, N, 3)) * 0.3).astype(
        np.float32) * 0.05
    op = rs.uniform(0.2, 0.9, (B, N, 1)).astype(np.float32)
    col = rs.uniform(0, 1, (B, N, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (K, Rt, pos, quat, scale, op, col))


pytestmark = pytest.mark.fast


def test_folded_outputs_and_grads_match_unrolled(scene, monkeypatch):
    K, Rt, pos, quat, scale, op, col = scene
    H, W = 64, 32
    kw = dict(tile_size=16, max_pairs_per_tile=256, chunk=32,
              pair_budget_mult=8, use_pallas=True)
    tgt = jnp.ones((3, 3, H, W)) * 0.4

    def make_loss():
        def loss(pos, scale, op, col):
            r = gsplat.render(W, H, K, Rt, pos, quat, scale, op, col, **kw)
            return ((r["render"] - tgt) ** 2).mean() + r["alpha"].mean() \
                + r["depth"].mean() * 0.1, r
        return loss

    monkeypatch.setattr(gsplat_pallas, "INTERPRET", True)

    monkeypatch.setenv("GOLIATH_GSPLAT_FOLD", "0")
    (v1, r1), g1 = jax.value_and_grad(
        make_loss(), argnums=(0, 1, 2, 3), has_aux=True)(
        pos, scale, op, col)

    monkeypatch.setenv("GOLIATH_GSPLAT_FOLD", "1")
    (v2, r2), g2 = jax.value_and_grad(
        make_loss(), argnums=(0, 1, 2, 3), has_aux=True)(
        pos, scale, op, col)

    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-5)
    for key in ("render", "alpha", "depth", "final_T"):
        np.testing.assert_allclose(
            np.asarray(r2[key]), np.asarray(r1[key]), atol=2e-4, rtol=1e-4,
            err_msg=key)
    for a, b, name in zip(g2, g1, ("pos", "scale", "op", "col")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=2e-3, err_msg=name)


def test_folded_prims_stay_in_their_image(scene, monkeypatch):
    """A prim far outside image b's frustum must not leak pairs into the
    vertically-adjacent image b+1 (the per-sample clip-before-offset)."""
    K, Rt, pos, quat, scale, op, col = scene
    H, W = 64, 32
    # push sample 0's prims far BELOW its image: without the per-sample
    # clip they would land in sample 1's top tile rows
    pos0 = np.array(pos)  # np.asarray of a jax array is read-only
    pos0[0, :, 1] += 1e3
    pos0 = jnp.asarray(pos0)
    kw = dict(tile_size=16, max_pairs_per_tile=256, chunk=32,
              pair_budget_mult=8, use_pallas=True)

    monkeypatch.setattr(gsplat_pallas, "INTERPRET", True)
    monkeypatch.setenv("GOLIATH_GSPLAT_FOLD", "1")
    r = gsplat.render(W, H, K, Rt, pos0, quat, scale, op, col, **kw)
    # sample 0 renders empty; sample 1/2 must be unaffected
    monkeypatch.setenv("GOLIATH_GSPLAT_FOLD", "0")
    r0 = gsplat.render(W, H, K, Rt, pos0, quat, scale, op, col, **kw)
    np.testing.assert_allclose(np.asarray(r["render"]),
                               np.asarray(r0["render"]),
                               atol=2e-4, rtol=1e-4)
    assert float(jnp.abs(r["render"][0]).max()) == 0.0
