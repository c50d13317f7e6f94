"""Mesh-VAE full-body avatar (reference: ca_code/models/mesh_vae.py).

Body VAE: encode LBS-unposed registration geometry (UV map) into a body
latent plus a separate face latent from the face UV quadrant; ConvDecoder
mixes spatially-masked pose conditioning with latent pyramids into a
geometry-delta UV map and a mean texture; UNetViewDecoder adds
view-dependent texture; ShadowUNet maps ambient occlusion to a shadow map
(optionally distilled into PoseToShadow); UpscaleNet pixel-shuffles
1024 -> 2048; textures are composited (x std + mean, x shadow) with
seam-correct resampling and rendered with the TPU mesh rasterizer.

Default dims match the reference (uv 1024 -> tex 2048); all sizes scale
down programmatically for tests.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.models.base import ModelFacade
from goliath_tpu.nn.blocks import ConvBlock, ConvDownBlock, UpConvBlockDeep, \
    tile2d
from goliath_tpu.nn.color_cal import CalV5
from goliath_tpu.nn.dof_cal import LearnableBlur
from goliath_tpu.nn.layers import Conv2dWNUB, LinearWN, leaky_relu
from goliath_tpu.nn.blocks import pixel_shuffle
from goliath_tpu.nn.shadow import PoseToShadow, ShadowUNet
from goliath_tpu.nn.unet import UNetWB
from goliath_tpu.ops.rasterizer import RenderLayer
from goliath_tpu.utils.image import gaussian_blur_np
from goliath_tpu.utils.geom import (
    GeometryModule,
    compute_view_cos,
    depth_discontinuity_mask,
)
from goliath_tpu.utils.lbs import LBSModule
from goliath_tpu.utils.sampling import interpolate_bilinear
from goliath_tpu.utils.seams import SeamSampler

logger = logging.getLogger(__name__)


class CameraPixelBias(nn.Module):
    """Per-camera screen-space bias (reference mesh_vae.py:51-69)."""

    image_height: int
    image_width: int
    n_cameras: int
    ds_rate: int

    @nn.compact
    def __call__(self, idxs: jnp.ndarray) -> jnp.ndarray:
        bias = self.param(
            "bias", nn.initializers.zeros,
            (self.n_cameras, 1, self.image_height // self.ds_rate,
             self.image_width // self.ds_rate),
        )
        return interpolate_bilinear(
            bias[idxs], size=(self.image_height, self.image_width)
        )


class Encoder(nn.Module):
    """Masked UV-geometry encoder (reference mesh_vae.py:344-421)."""

    n_embs: int
    mask: Any  # numpy [H, W]
    enc_size: int = 512
    noise_std: float = 1.0
    mean_scale: float = 0.1
    logvar_scale: float = 0.1
    verts_scale: float = 1.0

    @nn.compact
    def __call__(self, verts_unposed_uv: jnp.ndarray, train: bool
                 ) -> Dict[str, jnp.ndarray]:
        B = verts_unposed_uv.shape[0]
        S = self.enc_size
        mask_np = np.asarray(self.mask, np.float32)[None, None]
        mask = jnp.asarray(mask_np)
        if mask.shape[-2:] != (S, S):
            mask = interpolate_bilinear(mask, size=(S, S))
        mask = (mask > 0).astype(verts_unposed_uv.dtype)

        x = interpolate_bilinear(
            verts_unposed_uv * self.verts_scale, size=(S, S)
        ) * mask
        x = ConvDownBlock(3, 8, S, name="verts_conv")(x)

        widths = [(8, 16), (16, 32), (32, 32), (32, 64), (64, 128), (128, 128)]
        n_down = int(math.log2(S // 4)) - 1
        widths = widths[-n_down:]
        widths[0] = (8, widths[0][1])
        size = S // 2
        for i, (cin, cout) in enumerate(widths):
            x = ConvDownBlock(cin, cout, size, name=f"joint{i}")(x)
            size //= 2
        last = widths[-1][1]
        x = x.reshape(B, -1)
        embs_mu = self.mean_scale * LinearWN(
            4 * 4 * last, self.n_embs, alpha=1.0, name="mu")(x)
        embs_logvar = self.logvar_scale * LinearWN(
            4 * 4 * last, self.n_embs, alpha=1.0, name="logvar")(x)
        if train:
            noise = jax.random.normal(self.make_rng("noise"), embs_mu.shape)
            embs = embs_mu + jnp.exp(embs_logvar) * noise * self.noise_std
        else:
            embs = embs_mu
        return dict(embs=embs, embs_mu=embs_mu, embs_logvar=embs_logvar)


class FaceEncoder(nn.Module):
    """Face-quadrant encoder (reference mesh_vae.py:424-436)."""

    n_embs: int
    mask: Any
    uv_size: int
    enc_size: int = 512
    noise_std: float = 1.0
    mean_scale: float = 0.1
    logvar_scale: float = 0.1
    verts_scale: float = 1.0

    @nn.compact
    def __call__(self, verts_unposed_uv: jnp.ndarray, train: bool
                 ) -> Dict[str, jnp.ndarray]:
        h = self.uv_size // 2
        mask_np = np.asarray(self.mask, np.float32)
        face_mask = mask_np[mask_np.shape[0] // 2:, : mask_np.shape[1] // 2]
        face_uv = verts_unposed_uv[:, :, h:, :h]
        preds = Encoder(
            n_embs=self.n_embs, mask=face_mask, enc_size=self.enc_size,
            noise_std=self.noise_std, mean_scale=self.mean_scale,
            logvar_scale=self.logvar_scale, verts_scale=self.verts_scale,
            name="encoder",
        )(face_uv, train)
        return {f"face_{k}": v for k, v in preds.items()}


def _up_trunk(mdl, x, n_channels, sizes):
    """Grouped up-conv trunk (reference mesh_vae.py:603-610); free function so
    nn.remat wraps it without changing parameter names."""
    for b in range(len(sizes) - 1):
        x = UpConvBlockDeep(
            n_channels[b] * 2, n_channels[b + 1] * 2, sizes[b + 1],
            groups=2, name=f"conv_block{b}",
        )(x)
    return x


class ConvDecoder(nn.Module):
    """Pose + latents -> geometry-delta UV + mean texture
    (reference mesh_vae.py:438-630)."""

    geo_fn: GeometryModule
    seam_sampler: SeamSampler
    uv_size: int
    init_uv_size: int
    n_pose_dims: int
    n_pose_enc_channels: int
    n_embs: int
    n_embs_enc_channels: int
    n_face_embs: int
    n_init_channels: int
    n_min_channels: int
    pose_cond_mask: Any
    face_cond_mask: Any
    body_cond_mask: Any
    tex_scale: float = 0.001
    verts_scale: float = 0.01

    @nn.compact
    def __call__(self, pose: jnp.ndarray, embs: jnp.ndarray,
                 face_embs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        B = pose.shape[0]
        S0 = self.init_uv_size
        n_blocks = int(math.log2(self.uv_size // S0))
        sizes = [S0 * 2**s for s in range(n_blocks + 1)]
        n_channels = [
            max(self.n_init_channels // 2**b, self.n_min_channels)
            for b in range(n_blocks + 1)
        ]

        local_pose = pose[:, 6:]
        pose_cond = jnp.asarray(np.asarray(self.pose_cond_mask, np.float32))
        face_cond = jnp.asarray(
            np.asarray(self.face_cond_mask, np.float32))[None, None]
        body_cond = jnp.asarray(
            np.asarray(self.body_cond_mask, np.float32))[None, None]
        non_head_mask = jnp.clip(body_cond * (1.0 - face_cond), 0.0, 1.0)

        pose_masked = tile2d(local_pose, S0) * pose_cond
        pose_conv = ConvBlock(
            self.n_pose_dims, self.n_pose_enc_channels, S0, kernel_size=1,
            padding=0, name="local_pose_conv_block",
        )(pose_masked) * non_head_mask

        h = leaky_relu(LinearWN(self.n_embs, 4 * 4 * 128, name="embs_fc")(embs))
        h = h.reshape(B, 128, 4, 4)
        embs_widths = [(128, 128), (128, 128), (128, 64),
                       (64, self.n_embs_enc_channels)]
        n_ups = int(math.log2(S0 // 4))
        embs_widths = embs_widths[-n_ups:]
        embs_widths[0] = (128, embs_widths[0][1])
        size = 4
        for i, (cin, cout) in enumerate(embs_widths):
            size *= 2
            h = UpConvBlockDeep(cin, cout, size, name=f"embs_conv{i}")(h)
        embs_conv = h

        fh = leaky_relu(LinearWN(self.n_face_embs, 4 * 4 * 32,
                                 name="face_embs_fc")(face_embs))
        fh = fh.reshape(B, 32, 4, 4)
        face_widths = [(32, 64), (64, 64),
                       (64, self.n_embs_enc_channels)]
        n_fups = int(math.log2((S0 // 2) // 4))
        face_widths = face_widths[-n_fups:]
        face_widths[0] = (32, face_widths[0][1])
        size = 4
        for i, (cin, cout) in enumerate(face_widths):
            size *= 2
            fh = UpConvBlockDeep(cin, cout, size, name=f"face_conv{i}")(fh)
        half = S0 // 2
        patched = (
            fh * face_cond[:, :, half:, :half]
            + embs_conv[:, :, half:, :half] * non_head_mask[:, :, half:, :half]
        )
        embs_conv = embs_conv.at[:, :, half:, :half].set(patched)

        joint = jnp.concatenate([pose_conv, embs_conv], axis=1)
        joint = ConvBlock(
            self.n_pose_enc_channels + self.n_embs_enc_channels,
            self.n_init_channels, S0, name="joint_conv_block",
        )(joint)

        x = jnp.concatenate([joint, joint], axis=1)
        # rematerialized: the up-conv trunk to uv_size^2 dominates training
        # memory; recompute in the backward is cheap next to the raster
        trunk = nn.remat(_up_trunk, static_argnums=(2, 3))
        x = trunk(self, x, tuple(n_channels), tuple(sizes))

        x = self.seam_sampler.impaint(x)
        x = self.seam_sampler.resample(x)
        x = self.seam_sampler.resample(x)

        verts_features = x[:, : n_channels[-1]]
        tex_features = x[:, n_channels[-1]:]
        verts_uv_delta_rec = Conv2dWNUB(
            n_channels[-1], 3, self.uv_size, self.uv_size, 3, 1, 1,
            alpha=1.0, name="verts_conv",
        )(verts_features) * self.verts_scale
        verts_delta_rec = self.geo_fn.from_uv(verts_uv_delta_rec)
        tex_mean_rec = Conv2dWNUB(
            n_channels[-1], 3, self.uv_size, self.uv_size, 3, 1, 1,
            alpha=1.0, name="tex_conv",
        )(tex_features) * self.tex_scale

        return {
            "geom_delta_rec": verts_delta_rec,
            "geom_uv_delta_rec": verts_uv_delta_rec,
            "tex_mean_rec": tex_mean_rec,
            "embs_conv": embs_conv,
            "pose_conv": pose_conv,
        }


class UNetViewDecoder(nn.Module):
    """View-conditioned texture (reference mesh_vae.py:633-649)."""

    geo_fn: GeometryModule
    net_uv_size: int
    n_init_ftrs: int = 8

    @nn.compact
    def __call__(self, geom_rec, tex_mean_rec, camera_pos):
        view_cos = jax.lax.stop_gradient(
            compute_view_cos(geom_rec, jnp.asarray(self.geo_fn.vi), camera_pos)
        )
        view_cos_uv = jax.lax.stop_gradient(
            self.geo_fn.to_uv(view_cos[..., None])
        )
        cond_view = jnp.concatenate([view_cos_uv, tex_mean_rec], axis=1)
        tex_view = UNetWB(4, 3, self.net_uv_size,
                          n_init_ftrs=self.n_init_ftrs, name="unet")(cond_view)
        return {"tex_view_rec": tex_view, "cond_view": cond_view}


class UpscaleNet(nn.Module):
    """conv3x3 -> 1x1 pixel-shuffle head (reference mesh_vae.py:652-678)."""

    in_channels: int
    out_channels: int
    n_ftrs: int
    size: int = 1024
    upscale_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv2dWNUB(self.in_channels, self.n_ftrs, self.size, self.size,
                       3, 1, 1, name="conv_block")(x)
        h = leaky_relu(h, 0.2)
        h = Conv2dWNUB(
            self.n_ftrs, self.out_channels * self.upscale_factor**2,
            self.size, self.size, 1, 1, 0, alpha=1.0, name="out_block",
        )(h)
        return pixel_shuffle(h, self.upscale_factor)


class _MeshVAENet(nn.Module):
    geo_fn: GeometryModule
    lbs_fn: LBSModule
    seam_sampler: SeamSampler
    seam_sampler_2k: SeamSampler
    renderer: Any
    tex_mean: Any           # numpy [1, 3, T2, T2]
    tex_std: float
    masks: Any              # dict of numpy masks
    camera_ids: Any
    encoder_cfg: Any
    encoder_face_cfg: Any
    decoder_cfg: Any
    decoder_view_cfg: Any
    shadow_net_cfg: Any
    upscale_net_cfg: Any
    pose_to_shadow_cfg: Any
    cal_cfg: Any
    pixel_cal_cfg: Any
    learn_blur_enabled: bool
    uv_size: int
    tex_size: int

    @nn.compact
    def __call__(
        self,
        pose: jnp.ndarray,
        campos: jnp.ndarray,
        registration_vertices: Optional[jnp.ndarray] = None,
        ambient_occlusion: Optional[jnp.ndarray] = None,
        K: Optional[jnp.ndarray] = None,
        Rt: Optional[jnp.ndarray] = None,
        camera_idx: Optional[jnp.ndarray] = None,
        embs: Optional[jnp.ndarray] = None,
        face_embs: Optional[jnp.ndarray] = None,
        iteration: Optional[jnp.ndarray] = None,
        encode: bool = True,
        train: bool = False,
    ) -> Dict[str, Any]:
        B = pose.shape[0]
        masks = dict(self.masks)

        enc_preds = {}
        if encode:
            verts_unposed = jax.lax.stop_gradient(
                self.lbs_fn.unpose(registration_vertices, pose)
            )
            verts_unposed_uv = jax.lax.stop_gradient(
                self.geo_fn.to_uv(verts_unposed)
            )
            enc_preds = Encoder(
                mask=1.0 - masks["face_mask"], name="encoder",
                **dict(self.encoder_cfg),
            )(verts_unposed_uv, train)
            face_preds = FaceEncoder(
                mask=masks["face_mask"], uv_size=self.uv_size,
                name="encoder_face", **dict(self.encoder_face_cfg),
            )(verts_unposed_uv, train)
            enc_preds = {**enc_preds, **face_preds}
            embs = enc_preds["embs"]
            face_embs = enc_preds["face_embs"]

        dec_preds = ConvDecoder(
            geo_fn=self.geo_fn,
            seam_sampler=self.seam_sampler,
            pose_cond_mask=masks["pose_cond_mask"],
            face_cond_mask=masks["face_cond_mask"],
            body_cond_mask=masks["body_cond_mask"],
            name="decoder",
            **dict(self.decoder_cfg),
        )(pose, embs, face_embs)

        geom_rec = self.lbs_fn.pose(dec_preds["geom_delta_rec"], pose)

        dec_view_preds = UNetViewDecoder(
            geo_fn=self.geo_fn, name="decoder_view",
            **dict(self.decoder_view_cfg),
        )(geom_rec, dec_preds["tex_mean_rec"], campos)

        # Both shadow modules are materialized whenever pose_to_shadow is
        # enabled (the reference constructs both at __init__); train uses the
        # AO ShadowUNet + distillation target, eval uses the distilled net.
        p2s_enabled = self.pose_to_shadow_cfg is not None
        shadow_preds = ShadowUNet(
            ao_mean=masks["ao_mean"], interp_mode="bilinear",
            biases=False, name="shadow_net", **dict(self.shadow_net_cfg),
        )(ambient_occlusion)
        if p2s_enabled:
            p2s = PoseToShadow(name="pose_to_shadow",
                               **dict(self.pose_to_shadow_cfg))(pose)
            if train:
                shadow_preds["pose_shadow_map"] = p2s["shadow_map"]
            else:
                shadow_preds = {**shadow_preds,
                                "shadow_map": p2s["shadow_map"]}

        # forward_tex (reference :204-228)
        tex_mean_rec = dec_preds["tex_mean_rec"]
        tex_view_rec = dec_view_preds["tex_view_rec"]
        x = jnp.concatenate([tex_mean_rec, tex_view_rec], axis=1)
        tex_rec = tex_mean_rec + tex_view_rec
        tex_rec = self.seam_sampler.impaint(tex_rec)
        tex_rec = self.seam_sampler.resample(tex_rec)
        T2 = self.tex_size
        tex_rec = interpolate_bilinear(tex_rec, size=(T2, T2))
        tex_rec = tex_rec + UpscaleNet(
            in_channels=6, size=self.uv_size,
            upscale_factor=T2 // self.uv_size, out_channels=3,
            name="upscale_net", **dict(self.upscale_net_cfg),
        )(x)
        tex_rec = tex_rec * self.tex_std + jnp.asarray(
            np.asarray(self.tex_mean, np.float32)
        )
        shadow_map = shadow_preds["shadow_map"]
        shadow_map = self.seam_sampler_2k.impaint(shadow_map)
        shadow_map = self.seam_sampler_2k.resample(shadow_map)
        shadow_map = self.seam_sampler_2k.resample(shadow_map)
        tex_rec = tex_rec * shadow_map
        tex_rec = self.seam_sampler_2k.impaint(tex_rec)
        tex_rec = self.seam_sampler_2k.resample(tex_rec)
        tex_rec = self.seam_sampler_2k.resample(tex_rec)

        cal = CalV5(name="cal", **dict(self.cal_cfg)) if self.cal_cfg else None
        if cal is not None and camera_idx is not None:
            tex_rec = cal(tex_rec, camera_idx)

        preds: Dict[str, Any] = {
            "geom": geom_rec,
            "tex_rec": tex_rec,
            **dec_preds,
            **shadow_preds,
            **dec_view_preds,
            **enc_preds,
        }

        if self.renderer is not None and K is not None:
            tex_seg = jnp.ones_like(tex_rec[:, :1])
            renders = self.renderer(
                geom_rec, jnp.concatenate([tex_rec, tex_seg], axis=1), K, Rt
            )
            render_rgb = renders["render"][:, :3]
            render_alpha = renders["render"][:, 3:]
            render_depth = jax.lax.stop_gradient(
                renders["depth_img"][:, None]
            )
            preds.update(
                rgb=render_rgb,
                alpha=render_alpha,
                depth=render_depth,
                depth_disc_mask=depth_discontinuity_mask(render_depth),
            )

        if self.learn_blur_enabled and camera_idx is not None:
            blur = LearnableBlur(cameras=tuple(self.camera_ids),
                                 name="learn_blur")
            preds["rgb"] = blur(preds["rgb"], camera_idx)
            preds["learn_blur_weights"] = blur.reg(camera_idx)

        if self.pixel_cal_cfg is not None and camera_idx is not None:
            pb = CameraPixelBias(
                n_cameras=len(self.camera_ids), name="pixel_cal",
                **dict(self.pixel_cal_cfg),
            )(camera_idx)
            preds["rgb"] = preds["rgb"] + pb

        return preds


def _default_masks(assets: Any, uv_size: int, init_uv_size: int,
                   n_pose_local: int, geo_fn: GeometryModule) -> Dict[str, Any]:
    """Fetch (or synthesize) the conditioning masks from assets."""
    def get(name, default):
        try:
            return np.asarray(assets[name], np.float32)
        except (KeyError, AttributeError):
            logger.warning(f"assets missing {name}; using default")
            return default

    face_mask = get("face_mask", np.zeros((uv_size, uv_size), np.float32))
    pose_default = np.ones((1, n_pose_local, init_uv_size, init_uv_size),
                           np.float32)
    pose_cond = get("pose_cond_mask", pose_default)
    head_cond = get("head_cond_mask",
                    np.zeros((init_uv_size, init_uv_size), np.float32))
    if pose_cond.ndim == 3:
        pose_cond = pose_cond[None]
    pose_cond_mask = pose_cond * (
        1 - head_cond.reshape(1, 1, *head_cond.shape[-2:])
    )
    face_default = np.zeros((init_uv_size, init_uv_size), np.float32)
    face_default[init_uv_size // 2:, : init_uv_size // 2] = 1.0  # face quadrant
    face_cond = get("face_cond_mask", face_default)
    body_cond = get("body_cond_mask",
                    np.ones((init_uv_size, init_uv_size), np.float32))
    ao_mean = get("ambient_occlusion_mean",
                  get("ao_mean", np.full((1, uv_size, uv_size), 0.5,
                                         np.float32)))
    return {
        "face_mask": face_mask,
        "pose_cond_mask": pose_cond_mask.astype(np.float32),
        "face_cond_mask": face_cond,
        "body_cond_mask": body_cond,
        "ao_mean": ao_mean,
    }


def _identity_seam_data(uv_size: int) -> Dict[str, np.ndarray]:
    gy, gx = np.meshgrid(
        (np.arange(uv_size) + 0.5) / uv_size,
        (np.arange(uv_size) + 0.5) / uv_size, indexing="ij",
    )
    return {
        "dst_ij": np.zeros((1, 2), np.int64),
        "src_ij": np.zeros((1, 2), np.int64),
        "uvs": np.stack([gx, gy], -1).astype(np.float32),
        "weights": np.zeros((1, 1, uv_size, uv_size), np.float32),
    }


class AutoEncoder(ModelFacade):
    def __init__(
        self,
        encoder: Dict[str, Any],
        encoder_face: Dict[str, Any],
        decoder: Dict[str, Any],
        decoder_view: Dict[str, Any],
        shadow_net: Dict[str, Any],
        upscale_net: Dict[str, Any],
        assets: Any,
        pose_to_shadow: Optional[Dict[str, Any]] = None,
        renderer: Optional[Dict[str, Any]] = None,
        cal: Optional[Dict[str, Any]] = None,
        pixel_cal: Optional[Dict[str, Any]] = None,
        learn_blur: bool = True,
        uv_size: int = 1024,
        tex_size: Optional[int] = None,
    ):
        self.assets = assets
        self.cameras = list(assets.camera_ids)
        decoder = dict(decoder)
        uv_size = int(decoder.get("uv_size", uv_size))
        tex_size = tex_size or uv_size * 2

        self.geo_fn = GeometryModule(
            np.asarray(assets.topology.vi),
            np.asarray(assets.topology.vt),
            np.asarray(assets.topology.vti),
            np.asarray(assets.topology.v2uv),
            uv_size=uv_size,
            impaint=True,
        )
        template = np.asarray(
            assets.get("template_mesh", assets.get("template_mesh_unscaled"))
        )
        if template.ndim == 2:
            template = template[None]
        global_scaling = np.asarray(
            assets.get("global_scaling", [1.0, 1.0, 1.0]), np.float32
        )
        self.lbs_fn = LBSModule(
            assets.lbs_model_json, assets.lbs_config_dict,
            template, assets.skeleton_scales, global_scaling,
        )

        seam_1k = assets.get("seam_data_1024", None)
        seam_2k = assets.get("seam_data_2048", None)
        self.seam_sampler = SeamSampler(
            seam_1k if seam_1k is not None else _identity_seam_data(uv_size)
        )
        self.seam_sampler_2k = SeamSampler(
            seam_2k if seam_2k is not None else _identity_seam_data(tex_size)
        )

        tex_mean = np.asarray(assets.color_mean, np.float32)[None]
        tex_mean = gaussian_blur_np(tex_mean, 11)
        if tex_mean.shape[-1] != tex_size:
            import jax.numpy as _jnp

            tex_mean = np.asarray(interpolate_bilinear(
                _jnp.asarray(tex_mean), size=(tex_size, tex_size)
            ))
        self.tex_std = float(assets.get("tex_var", 64.0))

        init_uv_size = int(decoder.get("init_uv_size", 64))
        decoder["uv_size"] = uv_size
        n_pose_local = int(decoder["n_pose_dims"])
        masks = _default_masks(assets, uv_size, init_uv_size, n_pose_local,
                               self.geo_fn)

        rl = None
        if renderer is not None:
            rl_keys = ("tile_size", "max_tiles_per_face",
                       "max_faces_per_tile", "chunk", "pair_budget_mult",
                       "z_near")
            rl = RenderLayer(
                h=int(renderer["image_height"]), w=int(renderer["image_width"]),
                vi=self.geo_fn.vi, vt=self.geo_fn.vt, vti=self.geo_fn.vti,
                flip_uvs=False,
                **{k: v for k, v in renderer.items() if k in rl_keys},
            )

        cal_cfg = None
        if cal is not None:
            cal_cfg = dict(cal)
            cal_cfg["cameras"] = tuple(self.cameras)
            cal_cfg["identity_camera"] = str(cal_cfg["identity_camera"])
        self.cal_enabled = cal is not None
        self.learn_blur_enabled = bool(learn_blur)
        self.pose_to_shadow_enabled = pose_to_shadow is not None
        self.pixel_cal_enabled = pixel_cal is not None

        def cfgt(d):
            return tuple(sorted(d.items())) if d is not None else None

        enc_cfg = dict(encoder)
        encf_cfg = dict(encoder_face)
        shadow_cfg = dict(shadow_net)

        self.module = _MeshVAENet(
            geo_fn=self.geo_fn,
            lbs_fn=self.lbs_fn,
            seam_sampler=self.seam_sampler,
            seam_sampler_2k=self.seam_sampler_2k,
            renderer=rl,
            tex_mean=tex_mean,
            tex_std=self.tex_std,
            masks=tuple(sorted(masks.items(), key=lambda kv: kv[0])),
            camera_ids=tuple(self.cameras),
            encoder_cfg=cfgt(enc_cfg),
            encoder_face_cfg=cfgt(encf_cfg),
            decoder_cfg=cfgt(decoder),
            decoder_view_cfg=cfgt(dict(decoder_view)),
            shadow_net_cfg=cfgt(shadow_cfg),
            upscale_net_cfg=cfgt(dict(upscale_net)),
            pose_to_shadow_cfg=cfgt(dict(pose_to_shadow)
                                    if pose_to_shadow else None),
            cal_cfg=cfgt(cal_cfg),
            pixel_cal_cfg=cfgt(dict(pixel_cal) if pixel_cal else None),
            learn_blur_enabled=self.learn_blur_enabled,
            uv_size=uv_size,
            tex_size=tex_size,
        )

    def name_to_idx(self, camera_ids) -> jnp.ndarray:
        return jnp.asarray(
            [self.cameras.index(str(c)) for c in camera_ids], jnp.int32
        )


class MeshVAESummary:
    """Progress image: rgb / gt / normals (reference mesh_vae.py:681-705)."""

    def __call__(self, preds: Dict[str, Any], batch: Dict[str, Any]
                 ) -> Dict[str, np.ndarray]:
        from goliath_tpu.utils.geom import depth2normals
        from goliath_tpu.utils.image import linear2display

        rgb = np.asarray(linear2display(preds["rgb"][:, :3])) / 255.0
        out = {"render": np.clip(rgb, 0, 1)}
        if "image" in batch:
            out["gt"] = np.clip(
                np.asarray(linear2display(batch["image"])) / 255.0, 0, 1)
        if "depth" in preds and "focal" in batch:
            mask = np.asarray(preds["depth"]) > 0
            n = np.asarray(depth2normals(
                preds["depth"], batch["focal"], batch["princpt"]))
            out["normals"] = np.clip((1.0 - n) / 2.0 * mask, 0, 1)
        return out
