"""Per-camera color calibration (reference: ca_code/nn/color_cal.py).

CalV5: per-camera affine (3 gain + 3 bias) with an identity passthrough
camera and grayscale cameras (id prefix "41") collapsing to luma.

TPU-first: the reference's per-sample Python loop + grad hooks become a
fully-vectorized masked select plus a custom-VJP gradient scaler, so the
whole thing stays inside one jitted computation.
"""

from __future__ import annotations

import logging
from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@jax.custom_vjp
def scale_grad(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return x


def _scale_grad_fwd(x, scale):
    return x, scale


def _scale_grad_bwd(scale, g):
    return g * scale, None


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


class CalV5(nn.Module):
    cameras: Sequence[str]
    identity_camera: str
    gs_lrscale: float = 1e0
    col_lrscale: float = 1e-1

    def setup(self):
        cameras = list(self.cameras)
        identity_camera = self.identity_camera
        if identity_camera not in cameras:
            identity_camera = cameras[0]
            logger.warning(
                "Requested color-calibration identity camera not present, "
                f"defaulting to {identity_camera}."
            )
        self._identity_idx = cameras.index(identity_camera)
        self._grey_mask = np.asarray(
            [c.startswith("41") for c in cameras], dtype=bool
        )

        init = np.tile(
            np.asarray([1, 1, 1, 0, 0, 0], np.float32), (len(cameras), 1)
        )
        init[self._grey_mask, :3] = np.asarray([0.37, 0.52, 0.52], np.float32)
        self.params_table = self.param(
            "cal_params", lambda key, shape: jnp.asarray(init), init.shape
        )

    def name_to_idx(self, cam_names: Sequence[str]) -> jnp.ndarray:
        cameras = list(self.cameras)
        return jnp.asarray([cameras.index(c) for c in cam_names], jnp.int32)

    def __call__(self, image: jnp.ndarray, cam_idxs: jnp.ndarray) -> jnp.ndarray:
        """image [B, 3, H, W], cam_idxs [B] int."""
        grey = jnp.asarray(self._grey_mask)[cam_idxs]  # [B]
        is_identity = cam_idxs == self._identity_idx
        hook_scales = jnp.where(
            is_identity, 1.0,
            jnp.where(grey, self.gs_lrscale, self.col_lrscale),
        )
        params = scale_grad(self.params_table[cam_idxs],
                            hook_scales[:, None])  # [B, 6]
        w = params[:, :3][..., None, None]
        b = params[:, 3:][..., None, None]
        color_out = image * w + b
        grey_out = jnp.sum(image * w, axis=1, keepdims=True) + jnp.sum(
            b, axis=1, keepdims=True
        )
        grey_out = jnp.broadcast_to(grey_out, image.shape)
        out = jnp.where(grey[:, None, None, None], grey_out, color_out)
        return jnp.where(is_identity[:, None, None, None], image, out)


class CalV3(nn.Module):
    """Per-camera per-channel gain+bias (the reference's groups=3 1x1 conv,
    color_cal.py:61-98). The identity camera's parameters are frozen at the
    identity via stop_gradient, matching requires_grad=False on init values.
    No grayscale-camera handling (the reference CalV3 has none)."""

    cameras: Sequence[str]
    identity_camera: str

    def setup(self):
        cameras = list(self.cameras)
        identity_camera = self.identity_camera
        if identity_camera not in cameras:
            identity_camera = cameras[0]
            logger.warning(
                "Requested color-calibration identity camera not present, "
                f"defaulting to {identity_camera}."
            )
        self._identity_idx = cameras.index(identity_camera)
        init = np.tile(
            np.asarray([1, 1, 1, 0, 0, 0], np.float32), (len(cameras), 1)
        )
        self.params_table = self.param(
            "cal_params", lambda key, shape: jnp.asarray(init), init.shape
        )

    def name_to_idx(self, cam_names: Sequence[str]) -> jnp.ndarray:
        cameras = list(self.cameras)
        return jnp.asarray([cameras.index(c) for c in cam_names], jnp.int32)

    def __call__(self, image: jnp.ndarray, cam_idxs: jnp.ndarray) -> jnp.ndarray:
        params = self.params_table[cam_idxs]  # [B, 6]
        is_identity = (cam_idxs == self._identity_idx)[:, None]
        params = jnp.where(is_identity, jax.lax.stop_gradient(params), params)
        w = params[:, :3][..., None, None]
        b = params[:, 3:][..., None, None]
        return image * w + b


class CalV6(nn.Module):
    """CalV5 without grayscale support; the identity camera's parameters are
    replaced by the constant identity affine via lerp, so gradients to them
    vanish (reference color_cal.py:244-327)."""

    cameras: Sequence[str]
    identity_camera: str

    def setup(self):
        cameras = list(self.cameras)
        if any(c.startswith("41") for c in cameras):
            raise ValueError("Gray cameras are not supported")
        identity_camera = self.identity_camera
        if identity_camera not in cameras:
            identity_camera = cameras[0]
            logger.warning(
                "Requested color-calibration identity camera not present, "
                f"defaulting to {identity_camera}."
            )
        self._identity_idx = cameras.index(identity_camera)
        init = np.tile(
            np.asarray([1, 1, 1, 0, 0, 0], np.float32), (len(cameras), 1)
        )
        self.params_table = self.param(
            "cal_params", lambda key, shape: jnp.asarray(init), init.shape
        )

    def name_to_idx(self, cam_names: Sequence[str]) -> jnp.ndarray:
        cameras = list(self.cameras)
        return jnp.asarray([cameras.index(c) for c in cam_names], jnp.int32)

    def __call__(self, image: jnp.ndarray, cam_idxs: jnp.ndarray) -> jnp.ndarray:
        ident = jnp.asarray([1, 1, 1, 0, 0, 0], jnp.float32)
        w_ident = (jnp.arange(len(self.cameras)) == self._identity_idx)
        table = jnp.where(w_ident[:, None], ident[None], self.params_table)
        params = table[cam_idxs]  # [B, 6]
        w = params[:, :3][..., None, None]
        b = params[:, 3:][..., None, None]
        return image * w + b


class Identity(nn.Module):
    """No-op calibration retaining the param table (reference :33-58)."""

    cameras: Sequence[str]
    identity_camera: str

    def setup(self):
        init = np.tile(
            np.asarray([1, 1, 1, 0, 0, 0], np.float32), (len(self.cameras), 1)
        )
        self.params_table = self.param(
            "cal_params", lambda key, shape: jnp.asarray(init), init.shape
        )

    def name_to_idx(self, cam_names: Sequence[str]) -> jnp.ndarray:
        cameras = list(self.cameras)
        return jnp.asarray([cameras.index(c) for c in cam_names], jnp.int32)

    def __call__(self, image: jnp.ndarray, cam_idxs: jnp.ndarray) -> jnp.ndarray:
        return image


def make_cal(cal_type: str, **kwargs) -> nn.Module:
    """reference color_cal.py:330-336 (plus the torch-free 'identity')."""
    return {"identity": Identity, "v3": CalV3, "v5": CalV5,
            "v6": CalV6}[cal_type](**kwargs)
