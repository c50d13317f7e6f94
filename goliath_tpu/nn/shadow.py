"""Shadow networks (reference: ca_code/nn/shadow.py).

ShadowUNet: AO map -> soft shadow map via a small UNet over the shadow_size
grid, sigmoid(beta + x), bilinearly upsampled to uv_size.
PoseToShadow: distilled pose -> shadow conv-transpose stack.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from goliath_tpu.nn.layers import (
    Conv2dWN,
    Conv2dWNUB,
    ConvTranspose2dWNUB,
    LinearWN,
    leaky_relu,
)
from goliath_tpu.utils.sampling import interpolate_bilinear


class ShadowUNet(nn.Module):
    """reference shadow.py:22-188."""

    uv_size: int
    ao_mean: Any  # numpy [1, H, W]
    shadow_size: int
    lrelu_slope: float = 0.2
    beta: float = 1.0
    n_dims: int = 64
    interp_mode: str = "bilinear"
    biases: bool = True
    trainable_mean: bool = False

    @nn.compact
    def __call__(self, ao_map: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        S = self.shadow_size
        n = self.n_dims
        ao_mean_np = np.asarray(self.ao_mean, np.float32)
        if ao_mean_np.shape[-2:] != (S, S):
            # nearest-resize the stored mean once (host)
            ys = (np.arange(S) * ao_mean_np.shape[-2] / S).astype(np.int64)
            xs = (np.arange(S) * ao_mean_np.shape[-1] / S).astype(np.int64)
            ao_mean_np = ao_mean_np[..., ys, :][..., xs]
        if self.trainable_mean:
            ao_mean = self.param("ao_mean", lambda k, s: jnp.asarray(ao_mean_np),
                                 ao_mean_np.shape)
        else:
            ao_mean = jnp.asarray(ao_mean_np)

        if ao_map.shape[-2:] != (S, S):
            ao_map = interpolate_bilinear(ao_map, size=(S, S))

        x = ao_map - ao_mean

        sizes = [S // (2**i) for i in range(4)]
        enc_dims = [(1, n), (n, n), (n, n), (n, n)]
        enc_acts = []
        for i, size in enumerate(sizes):
            cin, cout = enc_dims[i]
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"enc{i}")(x)
            x = leaky_relu(x, self.lrelu_slope)
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = interpolate_bilinear(
                    x, size=(size // 2, size // 2), align_corners=True
                )

        dec_dims = [(n, n), (n * 2, n), (n * 2, n), (n * 2, n)]
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            cin, cout = dec_dims[i]
            if i > 0:
                x_prev = enc_acts[-i - 1]
                x = interpolate_bilinear(
                    x, size=x_prev.shape[2:4], align_corners=True
                )
                x = jnp.concatenate([x, x_prev], axis=1)
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"dec{i}")(x)
            x = leaky_relu(x, self.lrelu_slope)

        if self.biases:
            pred = Conv2dWNUB(dec_dims[-1][-1], 1, sizes[0], sizes[0], 3, 1, 1,
                              alpha=1.0, name="shadow_pred")(x)
        else:
            pred = Conv2dWN(dec_dims[-1][-1], 1, 3, 1, 1,
                            alpha=1.0, name="shadow_pred")(x)
        shadow_map_lowres = nn.sigmoid(pred + self.beta)
        shadow_map = interpolate_bilinear(
            shadow_map_lowres, size=(self.uv_size, self.uv_size)
        )
        return {
            "shadow_map": shadow_map,
            "ao_map": ao_map,
            "shadow_map_lowres": shadow_map_lowres,
        }


class FloorShadowDecoder(nn.Module):
    """AO map -> floor shadow via a fixed 512-res UNet with additive skips
    (reference shadow.py:191-256). Output = (tanh(up5(x) + aomap) + 1) / 2."""

    uv_size: int
    beta: float = 1.0

    @nn.compact
    def __call__(self, aomap: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if aomap.shape[-2:] != (self.uv_size, self.uv_size):
            aomap = interpolate_bilinear(
                aomap, size=(self.uv_size, self.uv_size), align_corners=True
            )
        down = [(1, 64, 256), (64, 64, 128), (64, 128, 64), (128, 256, 32),
                (256, 512, 16)]
        x = aomap - 0.5
        skips = []
        for i, (cin, cout, size) in enumerate(down):
            x = Conv2dWNUB(cin, cout, size, size, 4, 2, 1,
                           name=f"down{i + 1}")(x)
            x = leaky_relu(x, 0.2)
            skips.append(x)
        up = [(512, 256, 32), (256, 128, 64), (128, 64, 128), (64, 64, 256)]
        for i, (cin, cout, size) in enumerate(up):
            x = ConvTranspose2dWNUB(cin, cout, size, size, 4, 2, 1,
                                    name=f"up{i + 1}")(x)
            x = leaky_relu(x, 0.2)
            x = x + skips[-i - 2]
        x = ConvTranspose2dWNUB(64, 1, 512, 512, 4, 2, 1, alpha=1.0,
                                name="up5")(x)
        logits = (jnp.tanh(x + aomap) + 1.0) / 2.0
        return {"shadow_map": logits}


class ShadowUNet_PoseCond(nn.Module):
    """ShadowUNet with the bottleneck conditioned on a (root) pose vector
    tiled + conv-encoded and concatenated before the decoder
    (reference shadow.py:258-426; the reference also constructs an unused
    pose_fc_block — a dead parameter we deliberately omit)."""

    uv_size: int
    ao_mean: Any  # numpy [1, H, W]
    shadow_size: int
    lrelu_slope: float = 0.2
    beta: float = 1.0
    n_dims: int = 64
    n_pose_dims: int = 6
    n_pose_enc_dims: int = 32
    interp_mode: str = "bilinear"

    @nn.compact
    def __call__(self, ao_map: jnp.ndarray,
                 pose_vec: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        from goliath_tpu.nn.blocks import tile2d

        S = self.shadow_size
        n = self.n_dims
        ao_mean_np = np.asarray(self.ao_mean, np.float32)
        x = ao_map - jnp.asarray(ao_mean_np)
        if x.shape[-2:] != (S, S):
            x = interpolate_bilinear(x, size=(S, S))

        sizes = [S // (2**i) for i in range(4)]
        enc_dims = [(1, n), (n, n), (n, n), (n, n)]
        enc_acts = []
        for i, size in enumerate(sizes):
            cin, cout = enc_dims[i]
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"enc{i}")(x)
            x = leaky_relu(x, self.lrelu_slope)
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = interpolate_bilinear(
                    x, size=(size // 2, size // 2), align_corners=True
                )

        pose_enc = Conv2dWNUB(
            self.n_pose_dims, self.n_pose_enc_dims, sizes[-1], sizes[-1],
            3, 1, 1, name="pose_conv_block",
        )(tile2d(pose_vec, sizes[-1]))
        x = jnp.concatenate([x, pose_enc], axis=1)

        dec_dims = [(n + self.n_pose_enc_dims, n), (n * 2, n), (n * 2, n),
                    (n * 2, n)]
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            cin, cout = dec_dims[i]
            if i > 0:
                x_prev = enc_acts[-i - 1]
                x = interpolate_bilinear(
                    x, size=x_prev.shape[2:4], align_corners=True
                )
                x = jnp.concatenate([x, x_prev], axis=1)
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"dec{i}")(x)
            x = leaky_relu(x, self.lrelu_slope)

        pred = Conv2dWNUB(dec_dims[-1][-1], 1, sizes[0], sizes[0], 3, 1, 1,
                          alpha=1.0, name="shadow_pred")(x)
        shadow_map_lowres = nn.sigmoid(pred + self.beta)
        shadow_map = interpolate_bilinear(
            shadow_map_lowres, size=(self.uv_size, self.uv_size)
        )
        return {"shadow_map": shadow_map, "ao_map": ao_map}


class DistMapShadowUNet(nn.Module):
    """ShadowUNet variant driven by per-joint distance maps instead of an
    AO map — no mean subtraction, n_dist_joints input channels
    (reference shadow.py:474-630)."""

    uv_size: int
    shadow_size: int
    n_dist_joints: int
    lrelu_slope: float = 0.2
    beta: float = 1.0
    n_dims: int = 64
    interp_mode: str = "bilinear"
    biases: bool = True

    @nn.compact
    def __call__(self, dist_map: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        S = self.shadow_size
        n = self.n_dims
        x = dist_map
        if x.shape[-2:] != (S, S):
            x = interpolate_bilinear(x, size=(S, S))

        sizes = [S // (2**i) for i in range(4)]
        enc_dims = [(self.n_dist_joints, n), (n, n), (n, n), (n, n)]
        enc_acts = []
        for i, size in enumerate(sizes):
            cin, cout = enc_dims[i]
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"enc{i}")(x)
            x = leaky_relu(x, self.lrelu_slope)
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = interpolate_bilinear(
                    x, size=(size // 2, size // 2), align_corners=True
                )

        dec_dims = [(n, n), (n * 2, n), (n * 2, n), (n * 2, n)]
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            cin, cout = dec_dims[i]
            if i > 0:
                x_prev = enc_acts[-i - 1]
                x = interpolate_bilinear(
                    x, size=x_prev.shape[2:4], align_corners=True
                )
                x = jnp.concatenate([x, x_prev], axis=1)
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"dec{i}")(x)
            x = leaky_relu(x, self.lrelu_slope)

        if self.biases:
            pred = Conv2dWNUB(dec_dims[-1][-1], 1, sizes[0], sizes[0],
                              3, 1, 1, alpha=1.0, name="shadow_pred")(x)
        else:
            pred = Conv2dWN(dec_dims[-1][-1], 1, 3, 1, 1, alpha=1.0,
                            name="shadow_pred")(x)
        shadow_map_lowres = nn.sigmoid(pred + self.beta)
        shadow_map = interpolate_bilinear(
            shadow_map_lowres, size=(self.uv_size, self.uv_size)
        )
        return {
            "shadow_map": shadow_map,
            "shadow_map_lowres": shadow_map_lowres,
        }


class PoseToShadow(nn.Module):
    """reference shadow.py:429-473."""

    n_pose_dims: int
    uv_size: int
    beta: float = 1.0

    @nn.compact
    def __call__(self, pose: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = LinearWN(self.n_pose_dims, 256 * 4 * 4, name="fc")(pose)
        x = leaky_relu(x, 0.2)
        x = x.reshape(-1, 256, 4, 4)
        chans = [(256, 256, 8), (256, 128, 16), (128, 128, 32), (128, 64, 64)]
        for i, (cin, cout, size) in enumerate(chans):
            x = ConvTranspose2dWNUB(cin, cout, size, size, 4, 2, 1,
                                    name=f"conv{i}")(x)
            x = leaky_relu(x, 0.2)
        x = ConvTranspose2dWNUB(64, 1, 128, 128, 4, 2, 1, alpha=1.0,
                                name="out")(x)
        shadow_map_lowres = nn.sigmoid(x + self.beta)
        shadow_map = interpolate_bilinear(
            shadow_map_lowres, size=(self.uv_size, self.uv_size)
        )
        return {"shadow_map": shadow_map}
