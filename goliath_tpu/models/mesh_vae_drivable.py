"""Drivable mesh-VAE body (reference: ca_code/models/mesh_vae_drivable.py).

Variant of mesh_vae keyed on `lbs_motion`/`geom`/`ao` inputs. Face
conditioning comes from a (pretrained, frozen) FaceDecoderFrontal decoding
external "hqlp" face codes into face geometry + frontal texture, which a
mugsy-masked FaceEncoder re-encodes into the body-space face latent. The
rest of the pipeline (ConvDecoder, view decoder, shadow, upscale, seams,
render) matches mesh_vae.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.models import mesh_vae as mv
from goliath_tpu.models.base import ModelFacade
from goliath_tpu.nn.blocks import ConvDownBlock
from goliath_tpu.nn.color_cal import CalV5
from goliath_tpu.nn.dof_cal import LearnableBlur
from goliath_tpu.nn.face import FaceDecoderFrontal
from goliath_tpu.nn.layers import LinearWN, leaky_relu
from goliath_tpu.nn.shadow import PoseToShadow, ShadowUNet
from goliath_tpu.utils.geom import depth_discontinuity_mask
from goliath_tpu.utils.sampling import interpolate_bilinear

logger = logging.getLogger(__name__)


class Encoder(nn.Module):
    """Unposed-geometry encoder (reference mesh_vae_drivable.py:387-467)."""

    geo_fn: Any
    n_embs: int
    mask: Any
    enc_size: int = 512
    noise_std: float = 1.0
    logvar_scale: float = 0.1

    @nn.compact
    def __call__(self, motion, verts_unposed, train: bool):
        B = motion.shape[0]
        S = self.enc_size
        mask = jnp.asarray(np.asarray(self.mask, np.float32))[None, None]
        if mask.shape[-2:] != (S, S):
            mask = interpolate_bilinear(mask, size=(S, S))
        mask = (mask > 0).astype(jnp.float32)
        uv = self.geo_fn.to_uv(verts_unposed)
        x = interpolate_bilinear(uv, size=(S, S)) * mask
        x = ConvDownBlock(3, 8, S, name="verts_conv")(x)
        widths = [(8, 16), (16, 32), (32, 32), (32, 64), (64, 128),
                  (128, 128)]
        n_down = int(math.log2(S // 4)) - 1
        widths = widths[-n_down:]
        widths[0] = (8, widths[0][1])
        size = S // 2
        for i, (cin, cout) in enumerate(widths):
            x = ConvDownBlock(cin, cout, size, name=f"joint{i}")(x)
            size //= 2
        x = x.reshape(B, -1)
        last = widths[-1][1]
        embs_mu = LinearWN(4 * 4 * last, self.n_embs, alpha=1.0, name="mu")(x)
        embs_logvar = self.logvar_scale * LinearWN(
            4 * 4 * last, self.n_embs, alpha=1.0, name="logvar")(x)
        if train:
            noise = jax.random.normal(self.make_rng("noise"), embs_mu.shape)
            embs = embs_mu + jnp.exp(embs_logvar) * noise * self.noise_std
        else:
            embs = embs_mu
        return dict(embs=embs, embs_mu=embs_mu, embs_logvar=embs_logvar)


class FaceEncoder(nn.Module):
    """Mugsy-masked face tex+geom encoder (reference :656-748)."""

    n_embs: int
    mugsy_mask: Any       # numpy [H, W]
    n_vert_in: int
    uv_size: int = 512
    noise_std: float = 1.0
    logvar_scale: float = 0.1
    prefix: str = "face_"

    @nn.compact
    def __call__(self, face_geom, face_tex, train: bool):
        B = face_geom.shape[0]
        S = self.uv_size
        mask = jnp.asarray(np.asarray(self.mugsy_mask, np.float32))[None, None]
        mask = interpolate_bilinear(mask, size=(S, S), align_corners=True)

        tex_cond = interpolate_bilinear(face_tex, size=(S, S))
        tex_cond = (tex_cond / 255.0 - 0.5) * mask
        widths = [(3, 4), (4, 8), (8, 16), (16, 32), (32, 64), (64, 128),
                  (128, 128)]
        n_down = int(math.log2(S // 4))
        widths = widths[-n_down:]
        widths[0] = (3, widths[0][1])
        x = tex_cond
        size = S
        for i, (cin, cout) in enumerate(widths):
            x = ConvDownBlock(cin, cout, size, name=f"conv{i}")(x)
            size //= 2
        last = widths[-1][1]
        tex_enc = x.reshape(B, 4 * 4 * last)
        geom_enc = leaky_relu(LinearWN(self.n_vert_in, 256, name="geommod")(
            face_geom.reshape(B, -1)))
        x = leaky_relu(LinearWN(4 * 4 * last + 256, 512, name="jointmod")(
            jnp.concatenate([tex_enc, geom_enc], axis=1)))
        embs_mu = LinearWN(512, self.n_embs, alpha=1.0, name="mu")(x)
        embs_logvar = self.logvar_scale * LinearWN(
            512, self.n_embs, alpha=1.0, name="logvar")(x)
        if train:
            noise = jax.random.normal(self.make_rng("noise"), embs_mu.shape)
            embs = embs_mu + jnp.exp(embs_logvar) * noise * self.noise_std
        else:
            embs = embs_mu
        preds = dict(embs=embs, embs_mu=embs_mu, embs_logvar=embs_logvar,
                     tex_cond=tex_cond)
        return {f"{self.prefix}{k}": v for k, v in preds.items()}


class _DrivableNet(nn.Module):
    geo_fn: Any
    lbs_fn: Any
    seam_sampler: Any
    seam_sampler_2k: Any
    renderer: Any
    tex_mean: Any
    tex_std: float
    masks: Any
    mugsy_mask: Any
    face_assets: Any
    camera_ids: Any
    encoder_cfg: Any
    encoder_face_cfg: Any
    decoder_face_cfg: Any
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
        lbs_motion: jnp.ndarray,
        campos: jnp.ndarray,
        geom: Optional[jnp.ndarray] = None,
        ao: Optional[jnp.ndarray] = None,
        K: Optional[jnp.ndarray] = None,
        Rt: Optional[jnp.ndarray] = None,
        camera_idx: Optional[jnp.ndarray] = None,
        face_embs: Optional[jnp.ndarray] = None,
        embs: Optional[jnp.ndarray] = None,
        iteration: Optional[jnp.ndarray] = None,
        encode: bool = True,
        train: bool = False,
    ) -> Dict[str, Any]:
        B = lbs_motion.shape[0]
        masks = dict(self.masks)

        enc_preds: Dict[str, Any] = {}
        if encode:
            verts_unposed = jax.lax.stop_gradient(
                self.lbs_fn.unpose(geom, lbs_motion))
            enc_preds = Encoder(
                geo_fn=self.geo_fn, mask=1.0 - masks["face_mask"],
                name="encoder", **dict(self.encoder_cfg),
            )(lbs_motion, verts_unposed, train)
            # frozen pretrained face decoder on external hqlp codes
            face_dec_preds = jax.tree_util.tree_map(
                jax.lax.stop_gradient,
                FaceDecoderFrontal(
                    assets=self.face_assets, name="decoder_face",
                    **dict(self.decoder_face_cfg),
                )(face_embs),
            )
            face_enc = FaceEncoder(
                mugsy_mask=self.mugsy_mask, name="encoder_face",
                **dict(self.encoder_face_cfg),
            )(face_dec_preds["face_geom"], face_dec_preds["face_tex"], train)
            enc_preds = {**enc_preds, **face_enc,
                         "face_dec_preds": face_dec_preds}
            embs = enc_preds["embs"]
            face_embs_body = enc_preds["face_embs"]
        else:
            face_embs_body = face_embs

        dec_preds = mv.ConvDecoder(
            geo_fn=self.geo_fn,
            seam_sampler=self.seam_sampler,
            pose_cond_mask=masks["pose_cond_mask"],
            face_cond_mask=masks["face_cond_mask"],
            body_cond_mask=masks["body_cond_mask"],
            name="decoder",
            **dict(self.decoder_cfg),
        )(lbs_motion, embs, face_embs_body)

        geom_rec = self.lbs_fn.pose(dec_preds["geom_delta_rec"], lbs_motion)

        dec_view_preds = mv.UNetViewDecoder(
            geo_fn=self.geo_fn, name="decoder_view",
            **dict(self.decoder_view_cfg),
        )(geom_rec, dec_preds["tex_mean_rec"], campos)

        shadow_preds = ShadowUNet(
            ao_mean=masks["ao_mean"], interp_mode="bilinear", biases=False,
            name="shadow_net", **dict(self.shadow_net_cfg),
        )(ao)
        if self.pose_to_shadow_cfg is not None:
            p2s = PoseToShadow(name="pose_to_shadow",
                               **dict(self.pose_to_shadow_cfg))(lbs_motion)
            if train:
                shadow_preds["pose_shadow_map"] = p2s["shadow_map"]
            else:
                shadow_preds = {**shadow_preds,
                                "shadow_map": p2s["shadow_map"]}

        tex_mean_rec = dec_preds["tex_mean_rec"]
        tex_view_rec = dec_view_preds["tex_view_rec"]
        x = jnp.concatenate([tex_mean_rec, tex_view_rec], axis=1)
        tex_rec = tex_mean_rec + tex_view_rec
        tex_rec = self.seam_sampler.impaint(tex_rec)
        tex_rec = self.seam_sampler.resample(tex_rec)
        T2 = self.tex_size
        tex_rec = interpolate_bilinear(tex_rec, size=(T2, T2))
        tex_rec = tex_rec + mv.UpscaleNet(
            in_channels=6, size=self.uv_size,
            upscale_factor=T2 // self.uv_size, out_channels=3,
            name="upscale_net", **dict(self.upscale_net_cfg),
        )(x)
        tex_rec = tex_rec * self.tex_std + jnp.asarray(
            np.asarray(self.tex_mean, np.float32))
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
            "geom": geom_rec, "tex_rec": tex_rec,
            **dec_preds, **shadow_preds, **dec_view_preds, **enc_preds,
        }

        if self.renderer is not None and K is not None:
            tex_seg = jnp.ones_like(tex_rec[:, :1])
            renders = self.renderer(
                geom_rec, jnp.concatenate([tex_rec, tex_seg], axis=1), K, Rt)
            render_depth = jax.lax.stop_gradient(renders["depth_img"][:, None])
            preds.update(
                rgb=renders["render"][:, :3],
                alpha=renders["render"][:, 3:],
                depth=render_depth,
                depth_disc_mask=depth_discontinuity_mask(render_depth),
            )

        if self.learn_blur_enabled and camera_idx is not None:
            blur = LearnableBlur(cameras=tuple(self.camera_ids),
                                 name="learn_blur")
            preds["rgb"] = blur(preds["rgb"], camera_idx)
            preds["learn_blur_weights"] = blur.reg(camera_idx)

        if self.pixel_cal_cfg is not None and camera_idx is not None:
            pb = mv.CameraPixelBias(
                n_cameras=len(self.camera_ids), name="pixel_cal",
                **dict(self.pixel_cal_cfg),
            )(camera_idx)
            preds["rgb"] = preds["rgb"] + pb

        return preds


class AutoEncoder(mv.AutoEncoder):
    """Facade: reuses mesh_vae host-side precompute; swaps the net."""

    def __init__(self, encoder, encoder_face, decoder_face, decoder,
                 decoder_view, shadow_net, upscale_net, assets,
                 pose_to_shadow=None, renderer=None, cal=None,
                 pixel_cal=None, learn_blur=True, uv_size=1024,
                 tex_size=None):
        # reuse mesh_vae's constructor for the shared precompute; its
        # encoder_face config is unused here (we replace the module)
        super().__init__(
            encoder={"n_embs": 16},  # placeholder, replaced below
            encoder_face={"n_embs": 16},
            decoder=decoder, decoder_view=decoder_view,
            shadow_net=shadow_net, upscale_net=upscale_net, assets=assets,
            pose_to_shadow=pose_to_shadow, renderer=renderer, cal=cal,
            pixel_cal=pixel_cal, learn_blur=learn_blur, uv_size=uv_size,
            tex_size=tex_size,
        )
        base = self.module

        mugsy = assets.get("mugsy_face_mask", None)
        if mugsy is None:
            logger.warning("assets missing mugsy_face_mask; using ones")
            mugsy = np.ones((uv_size, uv_size), np.float32)
        else:
            mugsy = np.asarray(mugsy, np.float32)
            if mugsy.ndim == 3:
                mugsy = mugsy[..., 0]

        class _FaceAssets:
            face_frontal_view = np.asarray(
                assets.get("face_frontal_view", np.zeros(3)), np.float32)

        def cfgt(d):
            return tuple(sorted(d.items())) if d is not None else None

        self.module = _DrivableNet(
            geo_fn=base.geo_fn,
            lbs_fn=base.lbs_fn,
            seam_sampler=base.seam_sampler,
            seam_sampler_2k=base.seam_sampler_2k,
            renderer=base.renderer,
            tex_mean=base.tex_mean,
            tex_std=base.tex_std,
            masks=base.masks,
            mugsy_mask=mugsy,
            face_assets=_FaceAssets(),
            camera_ids=base.camera_ids,
            encoder_cfg=cfgt(dict(encoder)),
            encoder_face_cfg=cfgt(dict(encoder_face)),
            decoder_face_cfg=cfgt(dict(decoder_face)),
            decoder_cfg=base.decoder_cfg,
            decoder_view_cfg=base.decoder_view_cfg,
            shadow_net_cfg=base.shadow_net_cfg,
            upscale_net_cfg=base.upscale_net_cfg,
            pose_to_shadow_cfg=base.pose_to_shadow_cfg,
            cal_cfg=base.cal_cfg,
            pixel_cal_cfg=base.pixel_cal_cfg,
            learn_blur_enabled=base.learn_blur_enabled,
            uv_size=base.uv_size,
            tex_size=base.tex_size,
        )


MeshVAESummary = mv.MeshVAESummary
