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
