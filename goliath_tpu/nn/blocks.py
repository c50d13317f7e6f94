"""Residual conv blocks (reference: ca_code/nn/blocks.py).

ConvBlock / ConvDownBlock / UpConvBlockDeep follow the reference topology:
two 3x3 untied-bias WN convs with a 1x1 WN skip; the up block bilinearly
upsamples first. `weights_initializer`-style kaiming init is baked into the
blocks' conv layers via their glorot-alpha attribute (identical statistics).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.nn.layers import (
    Conv2dWN,
    Conv2dWNUB,
    LeakyReLU,
    leaky_relu,
)
from goliath_tpu.utils.sampling import interpolate_bilinear


def tile1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, C] -> [B, C, size]."""
    return jnp.broadcast_to(x[:, :, None], x.shape + (size,))


def tile2d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, C] -> [B, C, size, size] (reference blocks.py:731-744)."""
    return jnp.broadcast_to(x[:, :, None, None], x.shape + (size, size))


class ConvBlock(nn.Module):
    """conv-lrelu-conv-lrelu + 1x1 skip (reference blocks.py:232-281)."""

    in_channels: int
    out_channels: int
    size: int
    lrelu_slope: float = 0.2
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_skip = Conv2dWN(self.in_channels, self.out_channels, 1,
                          name="conv_resize")(x)
        h = Conv2dWNUB(self.in_channels, self.in_channels, self.size, self.size,
                       self.kernel_size, 1, self.padding, name="conv1")(x)
        h = leaky_relu(h, self.lrelu_slope)
        h = Conv2dWNUB(self.in_channels, self.out_channels, self.size, self.size,
                       self.kernel_size, 1, self.padding, name="conv2")(h)
        h = leaky_relu(h, self.lrelu_slope)
        return h + x_skip


class ConvDownBlock(nn.Module):
    """Residual stride-2 down block (reference blocks.py:327-380)."""

    in_channels: int
    out_channels: int
    size: int  # input size
    lrelu_slope: float = 0.2
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_skip = Conv2dWN(self.in_channels, self.out_channels, 1, 2, 0,
                          groups=self.groups, name="conv_resize")(x)
        h = Conv2dWNUB(self.in_channels, self.in_channels, self.size, self.size,
                       3, 1, 1, groups=self.groups, name="conv1")(x)
        h = leaky_relu(h, self.lrelu_slope)
        h = Conv2dWNUB(self.in_channels, self.out_channels,
                       self.size // 2, self.size // 2,
                       3, 2, 1, groups=self.groups, name="conv2")(h)
        h = leaky_relu(h, self.lrelu_slope)
        return h + x_skip


class UpConvBlockDeep(nn.Module):
    """Bilinear-up + residual double conv (reference blocks.py:382-436)."""

    in_channels: int
    out_channels: int
    size: int  # output size
    lrelu_slope: float = 0.2
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_up = interpolate_bilinear(x, size=(self.size, self.size),
                                    align_corners=True)
        x_skip = Conv2dWN(self.in_channels, self.out_channels, 1,
                          groups=self.groups, name="conv_resize")(x_up)
        h = Conv2dWNUB(self.in_channels, self.in_channels, self.size, self.size,
                       3, 1, 1, groups=self.groups, name="conv1")(x_up)
        h = leaky_relu(h, self.lrelu_slope)
        h = Conv2dWNUB(self.in_channels, self.out_channels, self.size, self.size,
                       3, 1, 1, groups=self.groups, name="conv2")(h)
        h = leaky_relu(h, self.lrelu_slope)
        return h + x_skip


def pixel_shuffle(x: jnp.ndarray, upscale: int) -> jnp.ndarray:
    """[B, C*r^2, H, W] -> [B, C, H*r, W*r] (torch PixelShuffle semantics)."""
    B, C, H, W = x.shape
    r = upscale
    Co = C // (r * r)
    x = x.reshape(B, Co, r, r, H, W)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, Co, H * r, W * r)


def _icnr_uniform(key, shape, scale: int = 2, dtype=jnp.float32):
    """ICNR init for pixel-shuffle convs (reference blocks.py:753-760):
    sub-kernel initialized once and repeated across the r^2 groups."""
    out, in_c, kh, kw = shape
    ni = out // (scale**2)
    fan_in = in_c * kh * kw
    bound = np.sqrt(6.0 / fan_in)  # kaiming-uniform-ish
    sub = jax.random.uniform(key, (ni, in_c, kh, kw), dtype, -bound, bound)
    return jnp.repeat(sub, scale**2, axis=0)


class PixelShuffleWN(nn.Module):
    """WN conv + pixel shuffle with ICNR init (reference blocks.py:762-791)."""

    in_channels: int
    out_channels: int
    upscale_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from goliath_tpu.nn.layers import _wn_g_init, _wn_weight, _conv_nchw

        oc = self.out_channels * self.upscale_factor**2
        v = self.param(
            "weight_v",
            lambda k, s: _icnr_uniform(k, s, self.upscale_factor),
            (oc, self.in_channels, 1, 1),
        )
        g = self.param("weight_g", _wn_g_init(v, oc), (oc,))
        b = self.param("bias", nn.initializers.zeros, (oc,))
        w = _wn_weight(v, g, 0)
        y = _conv_nchw(x, w, 1, [(0, 0), (0, 0)]) + b[None, :, None, None]
        return pixel_shuffle(y, self.upscale_factor)


class UpscaleNet(nn.Module):
    """Small pixel-shuffle superresolution head (reference blocks.py:793-822)."""

    in_channels: int
    out_channels: int = 3
    n_ftrs: int = 16
    size: int = 1024
    upscale_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv2dWNUB(self.in_channels, self.n_ftrs, self.size, self.size,
                       3, 1, 1, name="conv_block1")(x)
        h = leaky_relu(h, 0.2)
        h = Conv2dWNUB(self.n_ftrs, self.n_ftrs, self.size, self.size,
                       3, 1, 1, name="conv_block2")(h)
        h = leaky_relu(h, 0.2)
        out = PixelShuffleWN(self.n_ftrs, self.out_channels,
                             self.upscale_factor, name="out_block")(h)
        return out
