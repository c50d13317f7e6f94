"""Perceptual losses (reference: ca_code/loss/{perceptual,vgg,effnet}.py).

VGG19 5-slice masked feature L1 (weights [20, 5, .9, .5, .5]) and an
EfficientNet-B0-style 3-stage feature loss (weights [.8, .1, .1]).

The reference downloads ImageNet weights via torchvision; this environment
has no torchvision and no egress, so feature weights are loaded from an
`.npz` pointed to by GOLIATH_TPU_VGG19_NPZ / GOLIATH_TPU_EFFNET_NPZ (numpy
arrays keyed conv{i}_w / conv{i}_b in torch OIHW layout) when available.
When the weights are ABSENT the loss refuses to run unless random features
are explicitly allowed (GOLIATH_TPU_ALLOW_RANDOM_FEATURES=1 or loss config
`allow_random_features: true`): fixed-seed random convolutional features
are a serviceable perceptual prior for smoke tests and benches, but they
silently diverge from the reference's ImageNet-pretrained features at
train quality — a run that "converges" on them will not match reference
PSNR (round-2 verdict item 8), so opting in must be loud and deliberate.

TPU notes: feature extraction is plain NCHW convs that XLA tiles onto the
MXU; inputs are normalized from [0, 255] like the reference.
"""

from __future__ import annotations

import logging
import os
from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from goliath_tpu.losses import register_loss
from goliath_tpu.utils.image import erode
from goliath_tpu.utils.sampling import interpolate_bilinear

logger = logging.getLogger(__name__)


def _require_random_ok(net: str, env_var: str) -> None:
    """Hard-fail on missing pretrained weights unless explicitly waived."""
    if os.environ.get("GOLIATH_TPU_ALLOW_RANDOM_FEATURES") == "1":
        logger.warning(
            "%s pretrained weights unavailable (set %s); using fixed-seed "
            "RANDOM features — training quality will NOT match the "
            "reference.", net, env_var)
        return
    raise RuntimeError(
        f"{net} pretrained weights not found (set {env_var} to an .npz "
        "exported by scripts/export_perceptual_npz.py). Training against "
        "random features silently diverges from reference quality; to "
        "accept that for a smoke run, set GOLIATH_TPU_ALLOW_RANDOM_"
        "FEATURES=1 or `allow_random_features: true` in the loss config.")

_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# VGG19 conv ladder matching torchvision `features` indices 0-29. The
# reference slices at features [0:2), [2:7), [7:12), [12:21), [21:30)
# (vgg.py:28-38), i.e. the 5 feature maps are relu1_1, relu2_1, relu3_1,
# relu4_1, relu5_1 — after convs 0, 2, 4, 8, 12 of the 13 convs reached.
_VGG19_CONVS = [64, 64, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512,
                512]
_VGG19_POOL_BEFORE = {2, 4, 8, 12}     # conv indices (0-based) preceded by pool
_VGG19_SLICE_AFTER = {0: 0, 2: 1, 4: 2, 8: 3, 12: 4}  # conv idx -> slice id


def _max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _conv_relu(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + b[None, :, None, None]
    return jnp.maximum(y, 0.0)


@lru_cache(maxsize=1)
def _vgg19_weights():
    path = os.environ.get("GOLIATH_TPU_VGG19_NPZ", "")
    if path and os.path.exists(path):
        data = np.load(path)
        ws = [(jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
              for i in range(len(_VGG19_CONVS))]
        logger.info(f"loaded VGG19 weights from {path}")
        return ws
    _require_random_ok("VGG19", "GOLIATH_TPU_VGG19_NPZ")
    key = jax.random.PRNGKey(1234)
    ws = []
    cin = 3
    for i, cout in enumerate(_VGG19_CONVS):
        key, k1 = jax.random.split(key)
        std = np.sqrt(2.0 / (cin * 9))
        w = jax.random.normal(k1, (cout, cin, 3, 3), jnp.float32) * std
        ws.append((w, jnp.zeros((cout,), jnp.float32)))
        cin = cout
    return ws


def _normalize_imagenet(batch: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(_IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(_IMAGENET_STD).reshape(1, 3, 1, 1)
    return (jnp.clip(batch / 255.0, 0.0, 1.0) - mean) / std


def _vgg19_features(x: jnp.ndarray) -> List[jnp.ndarray]:
    ws = _vgg19_weights()
    feats = []
    h = x
    for i, (w, b) in enumerate(ws):
        if i in _VGG19_POOL_BEFORE:
            h = _max_pool2(h)
        h = _conv_relu(h, lax.stop_gradient(w), lax.stop_gradient(b))
        if i in _VGG19_SLICE_AFTER:
            feats.append(h)
    return feats


class VGGLossMasked:
    """Masked multi-slice VGG feature L1 (reference vgg.py:53-88)."""

    def __init__(self, weights: Optional[List[float]] = None):
        self.weights = weights or [20.0, 5.0, 0.9, 0.5, 0.5]

    def __call__(self, x_rgb, y_rgb, mask):
        fx = _vgg19_features(_normalize_imagenet(x_rgb))
        fy = _vgg19_features(_normalize_imagenet(y_rgb))
        loss = 0.0
        for i, (vx, vy) in enumerate(zip(fx, fy)):
            if isinstance(mask, jnp.ndarray):
                m = lax.stop_gradient(interpolate_bilinear(
                    mask.astype(vx.dtype), size=vx.shape[-2:]
                ))
            else:
                m = mask
            loss = loss + self.weights[i] * jnp.mean(jnp.abs(vx * m - vy * m))
        return loss


# EfficientNet-B0 features[0..3], faithful to torchvision (the reference
# uses efficientnet_b0 features at activation_idxs [1, 2, 3], effnet.py:
# 16-69). BatchNorms are folded into the convs at export time
# (scripts/export_perceptual_npz.py), so inference is conv+bias only.
#
# Block spec (cin, expand_ratio, kernel, stride, cout, se_squeeze):
# B0 stage 1 = 1x MBConv1-k3-s1 32->16; stage 2 = 2x MBConv6-k3 16->24
# (s2 then s1); stage 3 = 2x MBConv6-k5 24->40 (s2 then s1). SE squeeze
# channels = max(1, cin // 4) of the BLOCK input (torchvision convention).
_B0_STEM = (3, 32, 3, 2)  # cin, cout, kernel, stride
_B0_BLOCKS = [
    # (cin, expand, k, stride, cout, se_sq)
    (32, 1, 3, 1, 16, 8),
    (16, 6, 3, 2, 24, 4),
    (24, 6, 3, 1, 24, 6),
    (24, 6, 5, 2, 40, 6),
    (40, 6, 5, 1, 40, 10),
]
_B0_STAGE_AFTER_BLOCK = {0: 0, 2: 1, 4: 2}  # block idx -> feature slot


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _conv_nchw(x, w, b, stride=1, groups=1):
    k = w.shape[-1]
    pad = (k - 1) // 2
    if groups > 1 and groups == x.shape[1] and w.shape[1] == 1:
        # depthwise: grouped lax convs scalarize on TPU (no MXU path for
        # 1-input-channel groups); k^2 shifted FMAs with per-channel
        # weights fuse into one vectorized elementwise pass
        B, C, H, W = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        acc = None
        for i in range(k):
            for j in range(k):
                term = w[:, 0, i, j][None, :, None, None] * lax.slice(
                    xp, (0, 0, i, j), (B, C, i + H, j + W),
                    (1, 1, stride, stride))
                acc = term if acc is None else acc + term
        return acc + b[None, :, None, None]
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
    )
    return y + b[None, :, None, None]


@lru_cache(maxsize=1)
def _effnet_weights():
    """Returns {key: array} of folded-BN B0 weights for features[0..3].

    Keys: stem_w/b; per block j: mb{j}_expand_w/b (absent for expand=1),
    mb{j}_dw_w/b, mb{j}_se1_w/b, mb{j}_se2_w/b, mb{j}_proj_w/b.
    """
    path = os.environ.get("GOLIATH_TPU_EFFNET_NPZ", "")
    if path and os.path.exists(path):
        data = np.load(path)
        logger.info(f"loaded EfficientNet-B0 weights from {path}")
        return {k: jnp.asarray(data[k]) for k in data.files}
    _require_random_ok("EfficientNet-B0", "GOLIATH_TPU_EFFNET_NPZ")
    key = jax.random.PRNGKey(4321)
    ws = {}

    def randw(key, shape, fan_in):
        return jax.random.normal(key, shape, jnp.float32) * np.sqrt(
            2.0 / fan_in)

    cin, cout, k, _ = _B0_STEM
    key, k1 = jax.random.split(key)
    ws["stem_w"] = randw(k1, (cout, cin, k, k), cin * k * k)
    ws["stem_b"] = jnp.zeros((cout,))
    for j, (cin, exp, k, _s, cout, sq) in enumerate(_B0_BLOCKS):
        mid = cin * exp
        if exp != 1:
            key, k1 = jax.random.split(key)
            ws[f"mb{j}_expand_w"] = randw(k1, (mid, cin, 1, 1), cin)
            ws[f"mb{j}_expand_b"] = jnp.zeros((mid,))
        key, k1 = jax.random.split(key)
        ws[f"mb{j}_dw_w"] = randw(k1, (mid, 1, k, k), k * k)
        ws[f"mb{j}_dw_b"] = jnp.zeros((mid,))
        key, k1 = jax.random.split(key)
        ws[f"mb{j}_se1_w"] = randw(k1, (sq, mid, 1, 1), mid)
        ws[f"mb{j}_se1_b"] = jnp.zeros((sq,))
        key, k1 = jax.random.split(key)
        ws[f"mb{j}_se2_w"] = randw(k1, (mid, sq, 1, 1), sq)
        ws[f"mb{j}_se2_b"] = jnp.zeros((mid,))
        key, k1 = jax.random.split(key)
        ws[f"mb{j}_proj_w"] = randw(k1, (cout, mid, 1, 1), mid)
        ws[f"mb{j}_proj_b"] = jnp.zeros((cout,))
    return ws


def _effnet_features(x: jnp.ndarray) -> List[jnp.ndarray]:
    ws = {k: lax.stop_gradient(v) for k, v in _effnet_weights().items()}
    cin, cout, k, s = _B0_STEM
    h = _silu(_conv_nchw(x, ws["stem_w"], ws["stem_b"], stride=s))
    feats: List[jnp.ndarray] = []
    for j, (cin, exp, k, s, cout, sq) in enumerate(_B0_BLOCKS):
        inp = h
        mid = cin * exp
        if exp != 1:
            h = _silu(_conv_nchw(h, ws[f"mb{j}_expand_w"],
                                 ws[f"mb{j}_expand_b"]))
        h = _silu(_conv_nchw(h, ws[f"mb{j}_dw_w"], ws[f"mb{j}_dw_b"],
                             stride=s, groups=mid))
        # squeeze-excitation: global avg pool -> 1x1 silu -> 1x1 sigmoid gate
        se = jnp.mean(h, axis=(2, 3), keepdims=True)
        se = _silu(_conv_nchw(se, ws[f"mb{j}_se1_w"], ws[f"mb{j}_se1_b"]))
        se = jax.nn.sigmoid(
            _conv_nchw(se, ws[f"mb{j}_se2_w"], ws[f"mb{j}_se2_b"]))
        h = h * se
        h = _conv_nchw(h, ws[f"mb{j}_proj_w"], ws[f"mb{j}_proj_b"])  # linear
        if s == 1 and cin == cout:
            h = h + inp  # skip (stochastic depth is identity in eval mode)
        if j in _B0_STAGE_AFTER_BLOCK:
            feats.append(h)
    return feats


class EfficientNetLoss:
    """Masked EfficientNet-stage feature L1 (reference effnet.py:16-69)."""

    def __init__(self, activation_idxs=None, weights=None):
        self.weights = weights or [0.8, 0.1, 0.1]

    def __call__(self, x, y, mask=None):
        fx = _effnet_features(_normalize_imagenet(x))
        fy = _effnet_features(_normalize_imagenet(y))
        loss = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            if isinstance(mask, jnp.ndarray):
                m = lax.stop_gradient(interpolate_bilinear(
                    mask.astype(a.dtype), size=a.shape[-2:]
                ))
            else:
                m = 1.0
            loss = loss + self.weights[i] * jnp.mean(jnp.abs((a - b) * m))
        return loss


class BasePerceptualLoss:
    def __init__(self, assets, net, src_key="rendered_rgb", tgt_key="image",
                 dst_key=None, mask_key="image_mask", mask_erode=None,
                 allow_random_features=False):
        self.src_key, self.tgt_key, self.dst_key = src_key, tgt_key, dst_key
        self.mask_key, self.mask_erode = mask_key, mask_erode
        self.net = net
        if allow_random_features:
            # explicit per-config opt-in to the fixed-seed random-feature
            # fallback (see _require_random_ok)
            os.environ["GOLIATH_TPU_ALLOW_RANDOM_FEATURES"] = "1"

    def __call__(self, preds, targets):
        fg_mask = (targets[self.mask_key] if self.mask_key in targets
                   else preds[self.mask_key])
        if self.mask_erode is not None:
            fg_mask = erode(fg_mask, self.mask_erode)
        src = preds[self.src_key]
        tgt = targets[self.tgt_key] if self.dst_key is None else preds[self.dst_key]
        return self.net(src, tgt, fg_mask)


@register_loss("vgg")
class VGGLoss(BasePerceptualLoss):
    def __init__(self, assets, **kwargs):
        super().__init__(assets, net=VGGLossMasked(), **kwargs)


@register_loss("effnet")
class EfficientNetLossImpl(BasePerceptualLoss):
    def __init__(self, assets, **kwargs):
        super().__init__(assets, net=EfficientNetLoss(), **kwargs)


@register_loss("effnet_phys")
class EfficientNetLossImplPhys(BasePerceptualLoss):
    def __init__(self, assets, **kwargs):
        super().__init__(assets, net=EfficientNetLoss(),
                         src_key="rendered_phys_rgb", **kwargs)
