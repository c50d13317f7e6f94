"""Foundation NN layers (reference: ca_code/nn/layers.py).

Weight normalization is expressed directly as a re-parameterization
(w = v * g / ||v||_F with a per-output-channel learnable gain g), matching
the reference's wrapped-WeightNorm semantics (layers.py:157-268: g_dim=out,
v_dim=None => whole-tensor norm). "Untied bias" layers carry a (C, H, W)
bias parameter (layers.py:276-482).

Init matches the reference `glorot` (layers.py:605-650): uniform with
gain = sqrt(2 / (1 + alpha^2)), transpose convs use ksize/4 fan and the
checkerboard-avoiding 2x2 quadrant duplication; then g = ||w||_F, v = w.

Layout is NCHW to mirror the reference API; XLA re-lays out for TPU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def glorot_gain(alpha: float) -> float:
    return math.sqrt(2.0 / (1.0 + alpha**2))


def _uniform_init(std: float) -> Callable:
    bound = std * math.sqrt(3.0)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _wn_g_init(v: jnp.ndarray, out_channels: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2))
        return jnp.full(shape, norm, dtype)

    return init


def _wn_weight(v: jnp.ndarray, g: jnp.ndarray, g_axis: int) -> jnp.ndarray:
    """w = v * g / ||v||_F, g broadcast along the output-channel axis."""
    norm = jnp.sqrt(jnp.sum(v**2))
    shape = [1] * v.ndim
    shape[g_axis] = -1
    return v * (g.reshape(shape) / jnp.clip(norm, min=1e-12))


class LinearWN(nn.Module):
    """Weight-normalized linear layer; weight stored (out, in) torch-style."""

    in_features: int
    out_features: int
    use_bias: bool = True
    alpha: float = 0.2  # leaky-relu slope driving the glorot gain

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        std = glorot_gain(self.alpha) * math.sqrt(
            2.0 / (self.in_features + self.out_features)
        )
        v = self.param("weight_v", _uniform_init(std),
                       (self.out_features, self.in_features))
        g = self.param("weight_g", _wn_g_init(v, self.out_features),
                       (self.out_features,))
        w = _wn_weight(v, g, 0)
        y = x @ w.T
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_features,))
            y = y + b
        return y


def _conv_nchw(x, w, stride, padding, groups=1, lhs_dilation=None):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride) if isinstance(stride, int) else stride,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )


class Conv2dWN(nn.Module):
    """Weight-normalized conv; weight (out, in/groups, kh, kw) torch-style."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        std = glorot_gain(self.alpha) * math.sqrt(
            2.0 / ((self.in_channels + self.out_channels) * k * k)
        )
        v = self.param(
            "weight_v", _uniform_init(std),
            (self.out_channels, self.in_channels // self.groups, k, k),
        )
        g = self.param("weight_g", _wn_g_init(v, self.out_channels),
                       (self.out_channels,))
        w = _wn_weight(v, g, 0)
        pad = [(self.padding, self.padding)] * 2
        y = _conv_nchw(x, w, self.stride, pad, self.groups)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None, None]
        return y


class Conv2dWNUB(nn.Module):
    """Weight-normalized conv with untied (C, H, W) bias."""

    in_channels: int
    out_channels: int
    height: int
    width: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        std = glorot_gain(self.alpha) * math.sqrt(
            2.0 / ((self.in_channels + self.out_channels) * k * k)
        )
        v = self.param(
            "weight_v", _uniform_init(std),
            (self.out_channels, self.in_channels // self.groups, k, k),
        )
        g = self.param("weight_g", _wn_g_init(v, self.out_channels),
                       (self.out_channels,))
        w = _wn_weight(v, g, 0)
        pad = [(self.padding, self.padding)] * 2
        y = _conv_nchw(x, w, self.stride, pad, self.groups)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros,
                (self.out_channels, self.height, self.width),
            )
            y = y + b[None]
        return y


def _convt_init(std: float) -> Callable:
    """Uniform init + 2x2 quadrant duplication (checkerboard-avoiding,
    reference layers.py:641-646, hardcoded for stride 2)."""
    bound = std * math.sqrt(3.0)

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.uniform(key, shape, dtype, -bound, bound)
        w = w.at[:, :, 0::2, 1::2].set(w[:, :, 0::2, 0::2])
        w = w.at[:, :, 1::2, 0::2].set(w[:, :, 0::2, 0::2])
        w = w.at[:, :, 1::2, 1::2].set(w[:, :, 0::2, 0::2])
        return w

    return init


def _conv_transpose_nchw(x, w_iohw, stride: int, padding: int):
    """torch ConvTranspose2d semantics via fractionally-strided conv.

    w_iohw: (in, out, kh, kw) torch layout. Equivalent to conv with
    lhs_dilation=stride, padding k-1-p, and spatially-flipped kernel
    transposed to OIHW.
    """
    k = w_iohw.shape[-1]
    w = jnp.flip(w_iohw, (-2, -1)).transpose(1, 0, 2, 3)  # -> OIHW
    pad = k - 1 - padding
    return _conv_nchw(
        x, w, 1, [(pad, pad), (pad, pad)], lhs_dilation=(stride, stride)
    )


class ConvTranspose2dWN(nn.Module):
    """Weight-normalized transpose conv; weight (in, out, kh, kw), g over out."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        std = glorot_gain(self.alpha) * math.sqrt(
            2.0 / ((self.in_channels + self.out_channels) * (k * k // 4))
        )
        v = self.param(
            "weight_v", _convt_init(std),
            (self.in_channels, self.out_channels, k, k),
        )
        g = self.param("weight_g", _wn_g_init(v, self.out_channels),
                       (self.out_channels,))
        w = _wn_weight(v, g, 1)
        y = _conv_transpose_nchw(x, w, self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b[None, :, None, None]
        return y


class ConvTranspose2dWNUB(nn.Module):
    """Weight-normalized transpose conv with untied (C, H, W) bias."""

    in_channels: int
    out_channels: int
    height: int
    width: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        std = glorot_gain(self.alpha) * math.sqrt(
            2.0 / ((self.in_channels + self.out_channels) * (k * k // 4))
        )
        v = self.param(
            "weight_v", _convt_init(std),
            (self.in_channels, self.out_channels, k, k),
        )
        g = self.param("weight_g", _wn_g_init(v, self.out_channels),
                       (self.out_channels,))
        w = _wn_weight(v, g, 1)
        y = _conv_transpose_nchw(x, w, self.stride, self.padding)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros,
                (self.out_channels, self.height, self.width),
            )
            y = y + b[None]
        return y


class UpConv2dWN(nn.Module):
    """Bilinear 2x upsample followed by a WN conv (interpolate_wrapper equiv)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    scale_factor: float = 2.0
    alpha: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from goliath_tpu.utils.sampling import interpolate_bilinear

        x = interpolate_bilinear(x, scale_factor=self.scale_factor)
        return Conv2dWN(
            self.in_channels, self.out_channels, self.kernel_size,
            self.stride, self.padding, alpha=self.alpha, name="conv",
        )(x)


class Sequential(nn.Module):
    """Applies a list of modules / plain callables in order."""

    layers: Sequence[Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x)
        return x


class LeakyReLU:
    """Hashable activation wrapper usable as a linen module attribute."""

    def __init__(self, slope: float = 0.2):
        self.slope = slope

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return leaky_relu(x, self.slope)

    def __hash__(self):
        return hash(("LeakyReLU", self.slope))

    def __eq__(self, other):
        return isinstance(other, LeakyReLU) and other.slope == self.slope


def make_linear(n_in: int, n_out: int, mode: str = "wn", act=None, bias=True
                ) -> List[Any]:
    assert mode == "wn"
    layers: List[Any] = [LinearWN(n_in, n_out, use_bias=bias)]
    if act is not None:
        layers.append(act)
    return layers


def make_conv(n_in, n_out, fs, stride, pad, mode="wn", act=None, trans=False,
              ub=None, bias=True) -> List[Any]:
    assert mode == "wn"
    if ub:
        cls = ConvTranspose2dWNUB if trans else Conv2dWNUB
        layer = cls(n_in, n_out, ub[0], ub[1], fs, stride, pad, use_bias=bias)
    else:
        cls = ConvTranspose2dWN if trans else Conv2dWN
        layer = cls(n_in, n_out, fs, stride, pad, use_bias=bias)
    layers: List[Any] = [layer]
    if act is not None:
        layers.append(act)
    return layers


def make_conv_trans(*args, **kwargs) -> List[Any]:
    return make_conv(*args, **kwargs, trans=True)


class ConcatPyramid(nn.Module):
    """Wraps an up/down conv branch taking one input X into a branch taking
    (X, Y): before each conv layer, a gaussian-blur pyramid level of Y is
    concatenated (reference layers.py:846-933).

    every_other: set when the branch alternates conv / nonlinearity.
    transposed: branch upsamples (pyramid starts one blur-decimation down and
    is consumed coarse-to-fine)."""

    branch: Sequence[Any]
    n_concat_in: int
    every_other: bool = True
    ksize: int = 7
    kstd: Optional[float] = None
    transposed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        levels = (
            (len(self.branch) + 1) // 2 if self.every_other
            else len(self.branch)
        )
        gk = gaussian_kernel(self.ksize, self.kstd)
        C = self.n_concat_in
        w = jnp.asarray(np.tile(gk[None, None], (C, 1, 1, 1)))
        pad = self.ksize // 2

        def blur_decimate(img):
            blurred = lax.conv_general_dilated(
                img, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=C,
            )
            return blurred[:, :, ::2, ::2]

        pyramid = [blur_decimate(y) if self.transposed else y]
        for _ in range(levels - 1):
            pyramid.insert(0, blur_decimate(pyramid[0]))

        out = x
        for i, layer in enumerate(self.branch):
            if (i % 2) == 0 or not self.every_other:
                idx = i // 2 if self.every_other else i
                out = jnp.concatenate([out, pyramid[idx]], axis=1)
            out = layer(out)
        return out


def gaussian_kernel(ksize: int, std: Optional[float] = None) -> np.ndarray:
    """2D gaussian kernel, normalized to sum 1 (reference layers.py:49-77)."""
    assert ksize % 2 == 1
    radius = ksize // 2
    if std is None:
        std = np.sqrt(-(radius**2) / (2 * np.log(0.05)))
    x, y = np.meshgrid(
        np.linspace(-radius, radius, ksize), np.linspace(-radius, radius, ksize)
    )
    gk = np.exp(-(x**2 + y**2) / (2 * std**2))
    return (gk / gk.sum()).astype(np.float32)


class LinearELR(nn.Module):
    """Equalized-LR linear (reference layers.py:659-740): weight stored
    N(0, 1/lr_mul), scaled at runtime by gain/sqrt(fan_in)*lr_mul."""

    in_features: int
    out_features: int
    use_bias: bool = True
    gain: Optional[float] = None
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gain = math.sqrt(2.0) if self.gain is None else self.gain
        std = gain / math.sqrt(self.in_features) * self.lr_mul
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) / self.lr_mul,
            (self.out_features, self.in_features),
        )
        y = x @ (w * std).T
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_features,))
            y = y + b * self.lr_mul
        return y


class Conv2dELR(nn.Module):
    """Equalized-LR conv (reference layers.py:741-845)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    gain: Optional[float] = None
    lr_mul: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gain = math.sqrt(2.0) if self.gain is None else self.gain
        fan_in = self.in_channels * self.kernel_size**2
        std = gain / math.sqrt(fan_in) * self.lr_mul
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s) / self.lr_mul,
            (self.out_channels, self.in_channels,
             self.kernel_size, self.kernel_size),
        )
        pad = [(self.padding, self.padding)] * 2
        y = _conv_nchw(x, w * std, self.stride, pad)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + (b * self.lr_mul)[None, :, None, None]
        return y


class Downsample(nn.Module):
    """Antialiased 2x downsample with a fixed gaussian kernel
    (reference layers.py:953-1017)."""

    ksize: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gk = gaussian_kernel(self.ksize)
        C = x.shape[1]
        w = jnp.asarray(np.tile(gk[None, None], (C, 1, 1, 1)))
        pad = self.ksize // 2
        return lax.conv_general_dilated(
            x, w, (2, 2), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        )
