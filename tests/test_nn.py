"""Tests for the NN library: WN parameterization, conv parity vs torch,
blocks/unet/cal shapes and semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch as th
import torch.nn.functional as thf

from goliath_tpu.nn import layers as la
from goliath_tpu.nn.blocks import ConvBlock, UpConvBlockDeep, pixel_shuffle, tile2d
from goliath_tpu.nn.color_cal import CalV5
from goliath_tpu.nn.dof_cal import LearnableBlur
from goliath_tpu.nn.unet import UNetWB


def test_linear_wn_init_and_forward(rng):
    m = la.LinearWN(16, 8)
    x = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (4, 8)
    v = params["params"]["weight_v"]
    g = params["params"]["weight_g"]
    # init: g == ||v||_F for every row -> effective w == v
    np.testing.assert_allclose(
        np.asarray(g), np.linalg.norm(np.asarray(v)), rtol=1e-5
    )
    ref = np.asarray(x) @ np.asarray(v).T + np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_conv_matches_torch(rng):
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    m = la.Conv2dWN(3, 5, 4, 2, 1)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    v = np.asarray(params["params"]["weight_v"])
    g = np.asarray(params["params"]["weight_g"])
    w = v * (g[:, None, None, None] / np.linalg.norm(v))
    ref = thf.conv2d(th.from_numpy(x), th.from_numpy(w), stride=2, padding=1)
    ours = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch(rng):
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    m = la.ConvTranspose2dWN(3, 5, 4, 2, 1)
    params = m.init(jax.random.PRNGKey(2), jnp.asarray(x))
    v = np.asarray(params["params"]["weight_v"])  # (in, out, kh, kw)
    g = np.asarray(params["params"]["weight_g"])
    w = v * (g[None, :, None, None] / np.linalg.norm(v))
    ref = thf.conv_transpose2d(th.from_numpy(x), th.from_numpy(w), stride=2,
                               padding=1)
    ours = m.apply(params, jnp.asarray(x))
    assert ours.shape == (2, 5, 16, 16)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
    # checkerboard-avoiding init: all 2x2 quadrants equal
    np.testing.assert_allclose(v[:, :, 0::2, 1::2], v[:, :, 0::2, 0::2])
    np.testing.assert_allclose(v[:, :, 1::2, 0::2], v[:, :, 0::2, 0::2])


def test_untied_bias_shape(rng):
    m = la.Conv2dWNUB(3, 4, 8, 8, 3, 1, 1)
    x = jnp.asarray(rng.randn(1, 3, 8, 8).astype(np.float32))
    params = m.init(jax.random.PRNGKey(3), x)
    assert params["params"]["bias"].shape == (4, 8, 8)
    assert m.apply(params, x).shape == (1, 4, 8, 8)


def test_conv_block_and_upconv(rng):
    x = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    blk = ConvBlock(4, 6, 8)
    p = blk.init(jax.random.PRNGKey(4), x)
    assert blk.apply(p, x).shape == (2, 6, 8, 8)
    up = UpConvBlockDeep(4, 6, 16)
    p = up.init(jax.random.PRNGKey(5), x)
    assert up.apply(p, x).shape == (2, 6, 16, 16)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.randn(2, 8, 3, 5).astype(np.float32)
    ours = pixel_shuffle(jnp.asarray(x), 2)
    ref = thf.pixel_shuffle(th.from_numpy(x), 2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy())


def test_unet_wb(rng):
    x = jnp.asarray(rng.randn(1, 3, 64, 64).astype(np.float32))
    m = UNetWB(3, 2, 64)
    p = m.init(jax.random.PRNGKey(6), x)
    assert m.apply(p, x).shape == (1, 2, 64, 64)


def test_calv5_semantics(rng):
    cams = ["400001", "410002", "400870"]
    m = CalV5(cameras=cams, identity_camera="400870")
    img = jnp.asarray(rng.rand(3, 3, 4, 4).astype(np.float32))
    idxs = m.name_to_idx(cams)
    p = m.init(jax.random.PRNGKey(7), img, idxs)
    out = m.apply(p, img, idxs)
    # identity camera passes through
    np.testing.assert_allclose(np.asarray(out)[2], np.asarray(img)[2])
    # grey camera: all channels equal
    o1 = np.asarray(out)[1]
    np.testing.assert_allclose(o1[0], o1[1], rtol=1e-5)
    # color camera: w=1,b=0 init -> identity too
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(img)[0], rtol=1e-5)


def test_learnable_blur(rng):
    cams = ["a", "b"]
    m = LearnableBlur(cameras=cams)
    img = jnp.asarray(rng.rand(2, 3, 8, 8).astype(np.float32))
    idxs = m.name_to_idx(cams)
    p = m.init(jax.random.PRNGKey(8), img, idxs)
    out = m.apply(p, img, idxs)
    assert out.shape == img.shape
    reg = m.apply(p, idxs, method=LearnableBlur.reg)
    assert reg.shape == (2, 3)


def test_tile2d():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))
    t = tile2d(x, 4)
    assert t.shape == (2, 3, 4, 4)
    assert float(t[1, 2, 3, 3]) == 5.0
