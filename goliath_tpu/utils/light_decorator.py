"""Eval-time light decorators (reference: ca_code/utils/light_decorator.py).

`SingleLightCycleDecorator` synthesizes one orbiting point light per frame
index; `EnvSpinDecorator` loads an HDR envmap, builds SG-prefiltered specular
mipmaps once, rotates the map per frame, and converts the 16x32 texels to
512 point lights + preconvolved mipmaps + a background image.

Decorators wrap a model facade: `decorator.apply(params, batch)` augments the
batch with light inputs and calls the wrapped model.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.utils import envmap as envmap_lib
from goliath_tpu.utils.hdr import load_envmap, resize_area
from goliath_tpu.utils.quaternion import axisangle_to_matrix
from goliath_tpu.utils.sampling import avg_pool2d, interpolate_bilinear


class SingleLightCycleDecorator:
    """Orbiting point light (reference light_decorator.py:167-223)."""

    def __init__(self, mod, cycle: int = 256, light_rotate_axis: int = 0):
        self.mod = mod
        self.cycle = cycle
        self.light_rotate_axis = light_rotate_axis

    def augment(self, data: Dict[str, Any]) -> Dict[str, Any]:
        B = np.asarray(data["campos"]).shape[0]
        index = np.asarray(data.get("index", np.zeros(B)))
        light_pos = []
        for i in range(B):
            trans = None
            if "head_pose" in data:
                trans = np.asarray(data["head_pose"][i])[:3, 3]
            elif "pose" in data:
                trans = np.asarray(data["pose"][i][:3])
            angle = (abs(float(index[i])) % self.cycle) / self.cycle * 2 * math.pi
            if self.light_rotate_axis == 0:
                lp = np.asarray([0.0, 1100 * math.sin(angle),
                                 1100 * math.cos(angle)], np.float32)
            elif self.light_rotate_axis == 1:
                lp = np.asarray([-1100 * math.sin(angle), 300.0,
                                 1100 * math.cos(angle)], np.float32)
            else:
                lp = np.asarray([1100 * math.cos(angle),
                                 1100 * math.sin(angle), 0.0], np.float32)
            lp = 1100.0 * lp / np.linalg.norm(lp)
            if trans is not None:
                lp = lp + trans
            light_pos.append(lp)
        data = dict(data)
        data["light_intensity"] = jnp.ones((B, 1, 1), jnp.float32)
        data["light_pos"] = jnp.asarray(np.stack(light_pos))[:, None]
        data["n_lights"] = jnp.ones((B,), jnp.int32)
        data["is_fully_lit_frame"] = jnp.zeros((B,), bool)
        return data

    def apply(self, params, batch, **kwargs):
        return self.mod.apply(params, self.augment(batch), **kwargs)


class EnvSpinDecorator:
    """HDRI-spin relighting (reference light_decorator.py:18-164)."""

    def __init__(
        self,
        mod,
        envmap_path: str,
        envmap_dist: float = 10000.0,
        env_scale: float = 18.0,
        cycle: int = 256,
        sigma_step: float = 0.2,
        miplevel: int = 4,
        ydown: bool = False,
        prefilter_samples: int = 64,
    ):
        self.mod = mod
        self.envmap_dist = envmap_dist
        self.env_scale = env_scale
        self.cycle = cycle
        self.sigma_step = sigma_step
        self.miplevel = miplevel

        image = load_envmap(envmap_path)
        if ydown:
            image = image[::-1, ::-1]
        image = resize_area(image, 512, 1024)
        self.image = jnp.asarray(image.transpose(2, 0, 1))  # [3, H, W]

        # SG-prefiltered mipmaps (reference :54-100)
        H = self.image.shape[1]
        multisin = jnp.sin(
            (jnp.arange(H) + 0.5) * math.pi / H)[None, None, :, None]
        mipmap = [self.image[None]]
        img = self.image[None] * multisin
        key = jax.random.PRNGKey(7)
        for i in range(miplevel - 1):
            sigma = (i + 1) * sigma_step
            img = avg_pool2d(img, 2)
            h, w = img.shape[2:]
            theta, phi = jnp.meshgrid(
                (jnp.arange(h, dtype=jnp.float32) + 0.5) * math.pi / h,
                (jnp.arange(-w // 2, w // 2, dtype=jnp.float32) + 0.5)
                * 2 * math.pi / w, indexing="ij",
            )
            vec = jnp.stack(
                [jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta),
                 -jnp.sin(theta) * jnp.cos(phi)], 0)[None]
            conv = envmap_lib.prefilter_envmap_sg(
                sigma, vec, img, jax.random.fold_in(key, i),
                prefilter_samples)
            mipmap.append(conv)
        self._mipmap = mipmap

        L = 16
        theta, phi = np.meshgrid(
            (np.arange(L, dtype=np.float32) + 0.5) * np.pi / L,
            (np.arange(-L, L, dtype=np.float32) + 0.5) * np.pi / L,
            indexing="ij",
        )
        self.sphvec = np.stack(
            [np.sin(theta) * np.sin(phi), np.cos(theta),
             -np.sin(theta) * np.cos(phi)], 0).reshape(3, -1)

    def augment(self, data: Dict[str, Any]) -> Dict[str, Any]:
        B = np.asarray(data["campos"]).shape[0]
        index = np.asarray(data.get("index", np.zeros(B)))
        lightrots, envbgs, envmaps, lints = [], [], [], []
        norm_scales = []
        perc90 = float(np.percentile(np.asarray(self.image), 90))
        for i in range(B):
            rot_y = 2.0 * math.pi * float(index[i]) / self.cycle
            rot_mat = axisangle_to_matrix(
                jnp.asarray([0.0, rot_y, 0.0], jnp.float32))
            new_env = envmap_lib.rotate_envmap_mat(self.image, rot_mat)
            lightrots.append(rot_mat)
            denom = perc90 if perc90 > 0 else float(new_env.max())
            envbgs.append(new_env / denom)

            small = interpolate_bilinear(new_env[None], size=(16, 32))[0]
            sin_w = jnp.sin((jnp.arange(16) + 0.5) * math.pi / 16)[None, :, None]
            total = jnp.sum(small * sin_w)
            small = self.env_scale * small / total
            norm_scales.append(self.env_scale / total)
            envmaps.append(small)
            lints.append(small.reshape(3, -1).T)

        data = dict(data)
        scale = 2.0 * math.pi * norm_scales[0]
        data["preconv_envmap"] = tuple(
            jnp.broadcast_to(m, (B,) + m.shape[1:]) * scale
            for m in self._mipmap
        )
        data["envmap"] = jnp.stack(envmaps)
        data["lightrot"] = jnp.stack(lightrots)
        data["light_intensity"] = jnp.stack(lints)
        data["light_pos"] = self.envmap_dist * jnp.asarray(
            self.sphvec.T)[None].repeat(B, 0)
        data["envbg"] = jnp.stack(envbgs)
        data["n_lights"] = jnp.full((B,), self.sphvec.shape[1], jnp.int32)
        data["is_fully_lit_frame"] = jnp.zeros((B,), bool)
        return data

    def apply(self, params, batch, **kwargs):
        return self.mod.apply(params, self.augment(batch), **kwargs)
