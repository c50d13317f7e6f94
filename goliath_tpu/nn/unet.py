"""UNets with untied-bias WN convs (reference: ca_code/nn/unet.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from goliath_tpu.nn.layers import (
    Conv2dWN,
    Conv2dWNUB,
    ConvTranspose2dWN,
    ConvTranspose2dWNUB,
    leaky_relu,
)


class UNetWB(nn.Module):
    """5-down/5-up UNet with additive skips, final concat-input 1x1 conv,
    output scaled by out_scale (reference unet.py:14-95)."""

    in_channels: int
    out_channels: int
    size: int
    n_init_ftrs: int = 8
    out_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        F = self.n_init_ftrs
        S = self.size

        def down(h, cin, cout, size, name):
            h = Conv2dWNUB(cin, cout, size, size, 4, 2, 1, name=name)(h)
            return leaky_relu(h, 0.2)

        def up(h, cin, cout, size, name, alpha=0.2):
            h = ConvTranspose2dWNUB(cin, cout, size, size, 4, 2, 1, name=name)(h)
            return leaky_relu(h, 0.2)

        x1 = x
        x2 = down(x1, self.in_channels, F, S // 2, "down1")
        x3 = down(x2, F, 2 * F, S // 4, "down2")
        x4 = down(x3, 2 * F, 4 * F, S // 8, "down3")
        x5 = down(x4, 4 * F, 8 * F, S // 16, "down4")
        x6 = down(x5, 8 * F, 16 * F, S // 32, "down5")
        h = up(x6, 16 * F, 8 * F, S // 16, "up1") + x5
        h = up(h, 8 * F, 4 * F, S // 8, "up2") + x4
        h = up(h, 4 * F, 2 * F, S // 4, "up3") + x3
        h = up(h, 2 * F, F, S // 2, "up4") + x2
        h = up(h, F, F, S, "up5")
        h = jnp.concatenate([h, x1], axis=1)
        out = Conv2dWNUB(F + self.in_channels, self.out_channels, S, S, 1,
                         alpha=1.0, name="out")(h)
        return out * self.out_scale


class UNetWBConcat(nn.Module):
    """Concat-skip variant (reference unet.py:98-180)."""

    in_channels: int
    out_channels: int
    size: int
    n_init_ftrs: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        F = self.n_init_ftrs
        S = self.size

        def down(h, cin, cout, size, name):
            h = Conv2dWNUB(cin, cout, size, size, 4, 2, 1, name=name)(h)
            return leaky_relu(h, 0.2)

        def up(h, cin, cout, size, name):
            h = ConvTranspose2dWNUB(cin, cout, size, size, 4, 2, 1, name=name)(h)
            return leaky_relu(h, 0.2)

        x1 = x
        x2 = down(x1, self.in_channels, F, S // 2, "down1")
        x3 = down(x2, F, 2 * F, S // 4, "down2")
        x4 = down(x3, 2 * F, 4 * F, S // 8, "down3")
        x5 = down(x4, 4 * F, 8 * F, S // 16, "down4")
        x6 = down(x5, 8 * F, 16 * F, S // 32, "down5")
        h = jnp.concatenate([up(x6, 16 * F, 8 * F, S // 16, "up1"), x5], 1)
        h = jnp.concatenate([up(h, 16 * F, 4 * F, S // 8, "up2"), x4], 1)
        h = jnp.concatenate([up(h, 8 * F, 2 * F, S // 4, "up3"), x3], 1)
        h = jnp.concatenate([up(h, 4 * F, F, S // 2, "up4"), x2], 1)
        h = up(h, 2 * F, F, S, "up5")
        h = jnp.concatenate([h, x1], axis=1)
        return Conv2dWNUB(F + self.in_channels, self.out_channels, S, S, 1,
                          alpha=1.0, name="out")(h)


class UNetW(nn.Module):
    """Tied-bias variant, size-agnostic (reference unet.py:183-252)."""

    in_channels: int
    out_channels: int
    n_init_ftrs: int
    kernel_size: int = 4
    out_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        F = self.n_init_ftrs
        K = self.kernel_size

        def down(h, cin, cout, name):
            h = Conv2dWN(cin, cout, K, 2, 1, name=name)(h)
            return leaky_relu(h, 0.2)

        def up(h, cin, cout, name):
            h = ConvTranspose2dWN(cin, cout, K, 2, 1, name=name)(h)
            return leaky_relu(h, 0.2)

        x1 = x
        x2 = down(x1, self.in_channels, F, "down1")
        x3 = down(x2, F, 2 * F, "down2")
        x4 = down(x3, 2 * F, 4 * F, "down3")
        x5 = down(x4, 4 * F, 8 * F, "down4")
        x6 = down(x5, 8 * F, 16 * F, "down5")
        h = up(x6, 16 * F, 8 * F, "up1") + x5
        h = up(h, 8 * F, 4 * F, "up2") + x4
        h = up(h, 4 * F, 2 * F, "up3") + x3
        h = up(h, 2 * F, F, "up4") + x2
        h = up(h, F, F, "up5")
        h = jnp.concatenate([h, x1], axis=1)
        out = Conv2dWN(F + self.in_channels, self.out_channels, 1,
                       alpha=1.0, name="out")(h)
        return out * self.out_scale
