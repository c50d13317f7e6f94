"""RGCA — Relightable Gaussian Codec Avatar heads (reference: ca_code/models/rgca.py).

VAE over (registration verts, unwrapped color texture) -> 256-d latent;
GeomDecoder MLP -> face mesh; PrimDecoder conv-transpose pyramids decode
per-texel Gaussian parameters (delta-pos, quat, scale, opacity), diffuse SH
(color deg n_color_sh + mono to n_diff_sh), roughness, and view-conditioned
specular visibility/normal. Relighting: diffuse = albedo * <SH, light SH>;
specular = reflection-lobe angular Gaussian vs point lights (ops/sg.py) or
a preconvolved envmap mipmap lookup. Rendered with the TPU gaussian-splat
renderer (ops/gsplat.py) in head-relative coordinates.

TPU-first departures from the reference:
  * rendering is batched inside one jit (the reference loops batch elements
    calling CUDA per element, rgca.py:112-151);
  * the per-texel decoders keep the reference's exact channel ladders at
    slab size 1024 and scale down programmatically for small test configs;
  * camera ids enter as integer indices (strings stay host-side).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.models.base import ModelFacade
from goliath_tpu.nn.color_cal import CalV5
from goliath_tpu.nn.dof_cal import LearnableBlur
from goliath_tpu.nn.layers import (
    Conv2dWNUB,
    ConvTranspose2dWNUB,
    LinearWN,
    leaky_relu,
)
from goliath_tpu.ops import gsplat
from goliath_tpu.ops.sg import evaluate_gaussian
from goliath_tpu.utils import sh
from goliath_tpu.utils.envmap import compose_envmap, dir2uv
from goliath_tpu.utils.geom import GeometryModule
from goliath_tpu.utils.mipmap_sampler import mipmap_grid_sample

logger = logging.getLogger(__name__)

primscale_range: Tuple[float, float] = (0.1, 20.0)


def _normalize(v, axis=-1, eps=1e-12):
    # eps inside the sqrt keeps gradients finite at v == 0 (uncovered texels)
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps)


class Encoder(nn.Module):
    """Joint geometry+texture encoder (reference rgca.py:256-332)."""

    n_embs: int
    n_verts_in: int
    tex_size: int = 1024
    noise_std: float = 1.0
    mean_scale: float = 0.1
    logvar_scale: float = 0.01

    @nn.compact
    def __call__(self, geom: jnp.ndarray, color: jnp.ndarray, train: bool
                 ) -> Dict[str, jnp.ndarray]:
        B = geom.shape[0]
        g = geom.reshape(B, -1)
        geomout = leaky_relu(LinearWN(self.n_verts_in * 3, 256, name="geommod")(g))

        widths = [32, 32, 64, 64, 128, 128, 256, 256]
        n_down = int(math.log2(self.tex_size // 4))
        widths = widths[-n_down:] if n_down <= len(widths) else widths
        h = color / 255.0 - 0.5
        cin = 3
        size = self.tex_size
        for i, w in enumerate(widths):
            size //= 2
            h = Conv2dWNUB(cin, w, size, size, 4, 2, 1, name=f"tex{i}")(h)
            h = leaky_relu(h)
            cin = w
        texout = h.reshape(B, -1)

        joint = jnp.concatenate([geomout, texout], axis=1)
        joint = leaky_relu(
            LinearWN(joint.shape[-1], 512, name="jointmod")(joint)
        )
        embs_mu = LinearWN(512, self.n_embs, alpha=1.0, name="mean")(joint) \
            * self.mean_scale
        embs_logvar = LinearWN(512, self.n_embs, alpha=1.0, name="logvar")(joint) \
            * self.logvar_scale

        if train:
            noise = jax.random.normal(self.make_rng("noise"), embs_mu.shape)
            embs = embs_mu + jnp.exp(embs_logvar) * noise * self.noise_std
        else:
            embs = embs_mu
        return dict(embs=embs, embs_mu=embs_mu, embs_logvar=embs_logvar)


class GeomDecoder(nn.Module):
    """Latent -> coarse face mesh (reference rgca.py:335-369)."""

    n_embs: int
    verts_mean: Any  # numpy [V, 3]
    verts_std: float

    @nn.compact
    def __call__(self, embs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        n_verts = self.verts_mean.shape[-2]
        h = leaky_relu(LinearWN(self.n_embs, 256, name="fc1")(embs))
        geom = LinearWN(256, 3 * n_verts, alpha=1.0, name="fc2")(h)
        geom = geom.reshape(embs.shape[0], -1, 3)
        geom = geom * self.verts_std + jnp.asarray(
            np.asarray(self.verts_mean, np.float32)
        )[None]
        return dict(face_geom=geom)


def _pyramid_widths(slabsize: int):
    """Conv-transpose ladder 8 -> slabsize; reference channels at 1024."""
    full = [256, 256, 128, 128, 64, 32, 16]  # input widths of the 7 ups
    n_ups = int(math.log2(slabsize // 8))
    if n_ups >= len(full):
        return full
    return [256] + full[-(n_ups - 1):] if n_ups > 1 else [256]


def _prim_pyramid(mdl, h, out_ch, name, cin):
    """Conv-transpose pyramid 8x8 -> slabsize^2 (rgca.py:398-460); module-
    scoped free function so nn.remat can wrap it without renaming params."""
    widths = _pyramid_widths(mdl.slabsize)
    size = 8
    for i, w_out in enumerate(widths[1:] + [None]):
        size *= 2
        cout = w_out if w_out is not None else out_ch
        alpha = 0.2 if w_out is not None else 1.0
        h = ConvTranspose2dWNUB(
            cin, cout, size, size, 4, 2, 1, alpha=alpha,
            name=f"{name}{i}",
        )(h)
        if w_out is not None:
            h = leaky_relu(h)
        cin = cout
    return h


class PrimDecoder(nn.Module):
    """Latent (+view) -> per-texel relightable Gaussians (rgca.py:372-620)."""

    n_embs: int
    geo_fn: GeometryModule
    color_mean: Any  # numpy [3, T, T]
    slabsize: int = 1024
    n_diff_sh: int = 8
    n_color_sh: int = 3
    remat_pyramids: bool = True

    @nn.compact
    def __call__(
        self,
        embs: jnp.ndarray,
        geom: jnp.ndarray,
        headrel_campos: jnp.ndarray,
        light_intensity: jnp.ndarray,
        headrel_light_pos: jnp.ndarray,
        headrel_light_sh: jnp.ndarray,
        n_lights: jnp.ndarray,
        preconv_envmap: Optional[Tuple[jnp.ndarray, ...]] = None,
        lightrot: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        B = embs.shape[0]
        S = self.slabsize
        n_color_coeffs = (self.n_color_sh + 1) ** 2
        n_mono_coeffs = (self.n_diff_sh + 1) ** 2 - n_color_coeffs
        n_diff_coeffs = 3 * n_color_coeffs + n_mono_coeffs
        vind_ch = n_diff_coeffs + 11 + 1
        vd_ch = 4

        # base position / normal maps from the decoded mesh
        postex = self.geo_fn.to_uv(geom)  # [B, 3, S, S]
        primposbase = postex.transpose(0, 2, 3, 1).reshape(B, -1, 3)
        vn = self.geo_fn.vn(geom)
        tn = self.geo_fn.to_uv(vn)
        tn = tn / jnp.sqrt(jnp.sum(tn * tn, axis=1, keepdims=True) + 1e-12)
        primnmlbase = tn.transpose(0, 2, 3, 1).reshape(B, -1, 3)

        h0 = leaky_relu(
            LinearWN(self.n_embs, 256 * 8 * 8, name="encmod")(embs)
        ).reshape(-1, 256, 8, 8)

        # rematerialized: the conv-transpose pyramids to slabsize^2 dominate
        # training memory (hundreds of MB of activations per sample at 1024^2)
        # while costing little to recompute relative to the splat render.
        # When the WHOLE decoder is already under remat (remat_decoder), a
        # nested pyramid remat would re-run the pyramids a third time for
        # zero memory benefit — the caller disables it then.
        pyramid = (nn.remat(_prim_pyramid, static_argnums=(2, 3, 4))
                   if self.remat_pyramids else _prim_pyramid)

        f_vnocond = pyramid(self, h0, vind_ch, "vnocond", 256)

        view = leaky_relu(
            LinearWN(3, 8, name="viewmod")(_normalize(headrel_campos))
        )[:, :, None, None]
        view = jnp.broadcast_to(view, view.shape[:2] + (8, 8))
        f_vcond = pyramid(self, jnp.concatenate([h0, view], axis=1), vd_ch,
                          "vcond", 256 + 8)
        f_vcond = f_vcond.transpose(0, 2, 3, 1).reshape(B, -1, vd_ch)

        # diffuse SH. The reference concatenates color+broadcast-mono into a
        # [B, N, 3, K] tensor and dots it with the light SH (rgca.py:540);
        # at 1M gaussians that materializes multi-GB intermediates, so we
        # keep color/mono factors separate and contract each with the light
        # SH directly (identical math, no broadcast concat).
        diff_raw = f_vnocond[:, :n_diff_coeffs]
        diff_raw = diff_raw.transpose(0, 2, 3, 1).reshape(B, -1, n_diff_coeffs)
        shs_color = diff_raw[..., : n_color_coeffs * 3].reshape(
            B, -1, 3, n_color_coeffs
        )
        shs_mono = diff_raw[..., n_color_coeffs * 3:]  # [B, N, n_mono]

        def eval_diff_sh(light_sh):
            """light_sh [B, 3, K] -> diffuse radiance [B, N, 3]."""
            lc = light_sh[..., :n_color_coeffs]
            lm = light_sh[..., n_color_coeffs:]
            return (jnp.einsum("bnck,bck->bnc", shs_color, lc)
                    + jnp.einsum("bnk,bck->bnc", shs_mono, lm))

        # gaussian params
        f_geom = f_vnocond[:, n_diff_coeffs: n_diff_coeffs + 11]
        f_geom = f_geom.transpose(0, 2, 3, 1).reshape(B, -1, 11)
        primpos = f_geom[..., 0:3] + primposbase
        primqvec = _normalize(f_geom[..., 3:7])
        primscale = jax.nn.softplus(f_geom[..., 7:10])
        opacity = jax.nn.sigmoid(f_geom[..., 10:11])

        # roughness
        sigma = f_vnocond[:, n_diff_coeffs + 11:]
        sigma = sigma.transpose(0, 2, 3, 1).reshape(B, -1)
        sigma = jnp.clip(jnp.exp(sigma) * 0.1, min=0.01)

        spec_vis = jax.nn.sigmoid(f_vcond[..., :1])
        spec_dnml = f_vcond[..., 1:]
        spec_nml = _normalize(spec_dnml + primnmlbase)

        rgb_mean = jnp.asarray(np.asarray(self.color_mean, np.float32)) / 255.0
        albedo_init = (2.0 * rgb_mean / 2.2974).transpose(1, 2, 0).reshape(1, -1, 3)
        albedo = self.param(
            "albedo", lambda k, s: jnp.asarray(albedo_init), albedo_init.shape
        )
        albedo = jnp.broadcast_to(albedo, (B,) + albedo.shape[1:])

        diff_color = albedo * eval_diff_sh(headrel_light_sh)

        view_local = _normalize(primpos - headrel_campos[:, None])
        ref_dirs = view_local - 2.0 * jnp.sum(
            view_local * spec_nml, axis=-1, keepdims=True
        ) * spec_nml

        if preconv_envmap is not None:
            ref_dirs = jnp.einsum("bxy,bny->bnx", lightrot, ref_dirs)
            ref_uv = dir2uv(ref_dirs, 2)
            miplevel = sigma * 5
            spec_color = mipmap_grid_sample(
                list(preconv_envmap), ref_uv[:, :, None, :],
                miplevel[..., None],
            )[..., 0]
            spec_color = jnp.clip(
                spec_color.transpose(0, 2, 1), max=1.0
            ) * spec_vis
        else:
            spec_color = evaluate_gaussian(
                ref_dirs, sigma, light_intensity, headrel_light_pos,
                primpos, n_lights, w_type=0,
            ) * spec_vis

        color = jnp.clip(diff_color, min=0.0) + spec_color

        preds = dict(
            color=jnp.clip(color, min=0.0),
            opacity=opacity,
            primpos=primpos,
            primqvec=primqvec,
            primscale=jnp.clip(primscale, *primscale_range),
            primscale_preclip=primscale,
            sigma=sigma,
            spec_vis=spec_vis,
            spec_nml=spec_nml,
            spec_dnml=spec_dnml,
            diff_color=diff_color,
            spec_color=spec_color,
            primnmlbase=primnmlbase,
        )

        if train:
            # random backlit regularization branch (reference rgca.py:590-618)
            key = self.make_rng("noise")
            light_dir = jax.random.uniform(key, (B, 1, 3)) - 0.5
            light_dir = jax.lax.stop_gradient(_normalize(light_dir))
            cos_weight = jnp.sum(light_dir * spec_nml, axis=-1, keepdims=True)
            li = jnp.ones_like(light_intensity[:, :1])
            sh_coeffs = sh.dir2sh(self.n_diff_sh, light_dir)
            light_sh = jnp.sum(sh_coeffs[:, :, None] * li[..., None], axis=1)
            diff_color_rand = eval_diff_sh(light_sh)  # light_sh [B, 3, K]
            preds["cos_weight"] = cos_weight
            preds["color_rand"] = jnp.clip(diff_color_rand, min=0.0)
        return preds


def _call_prim_decoder(dec, embs, geom, headrel_campos, light_intensity,
                       headrel_light_pos, headrel_light_sh, n_lights,
                       preconv_envmap, lightrot, train):
    """Module-scoped free function so nn.remat can wrap the WHOLE decoder:
    the backward then re-derives every UV-slab intermediate instead of
    keeping multi-GB [B, C, S, S] residuals alive across the splat render
    (the b=4 full-res RESOURCE_EXHAUSTED whale)."""
    return dec(embs, geom, headrel_campos, light_intensity,
               headrel_light_pos, headrel_light_sh, n_lights,
               preconv_envmap, lightrot, train)


class _RGCANet(nn.Module):
    """Inner jittable module for the RGCA AutoEncoder."""

    geo_fn: GeometryModule
    n_verts_in: int
    verts_mean: Any          # numpy [V, 3]
    verts_var: float
    color_mean: Any          # numpy [3, T, T]
    camera_ids: Any          # tuple of str
    encoder_cfg: Any
    decoder_cfg: Any
    image_height: int
    image_width: int
    n_embs: int
    n_diff_sh: int
    cal_cfg: Any
    learn_blur_enabled: bool
    bg_weight: float
    tex_size: int
    slabsize: int
    render_cfg: Any
    remat_decoder: bool = True

    @nn.compact
    def __call__(
        self,
        head_pose: jnp.ndarray,
        campos: jnp.ndarray,
        registration_vertices: jnp.ndarray,
        color: jnp.ndarray,
        light_intensity: jnp.ndarray,
        light_pos: jnp.ndarray,
        n_lights: jnp.ndarray,
        K: jnp.ndarray,
        Rt: jnp.ndarray,
        camera_idx: Optional[jnp.ndarray] = None,
        background: Optional[jnp.ndarray] = None,
        is_fully_lit_frame: Optional[jnp.ndarray] = None,
        preconv_envmap: Optional[Tuple[jnp.ndarray, ...]] = None,
        lightrot: Optional[jnp.ndarray] = None,
        envbg: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        B = head_pose.shape[0]
        light_intensity = jnp.broadcast_to(
            light_intensity, light_intensity.shape[:2] + (3,)
        )

        # head-relative coordinates (reference rgca.py:178-193)
        head_pose_4x4 = jnp.concatenate(
            [head_pose, jnp.zeros_like(head_pose[:, :1])], axis=1
        )
        head_pose_4x4 = head_pose_4x4.at[:, 3, 3].set(1.0)
        headrel_Rt = Rt @ head_pose_4x4
        headrel_campos = jnp.einsum(
            "bj,bjk->bk", campos - head_pose[:, :3, 3], head_pose[:, :3, :3]
        )
        headrel_light_pos = jnp.einsum(
            "blj,bjk->blk", light_pos - head_pose[:, None, :3, 3],
            head_pose[:, :3, :3],
        )
        headrel_light_dir = _normalize(headrel_light_pos)
        sh_coeffs = sh.dir2sh(self.n_diff_sh, headrel_light_dir)  # [B, L, K]
        # mask inactive lights out of the SH sum
        L = light_pos.shape[1]
        lmask = (jnp.arange(L)[None] < n_lights[:, None]).astype(sh_coeffs.dtype)
        headrel_light_sh = jnp.sum(
            sh_coeffs[:, :, None] * light_intensity[..., None]
            * lmask[:, :, None, None], axis=1,
        )
        if lightrot is not None:
            lightrot = lightrot @ head_pose[:, :3, :3]

        enc_preds = Encoder(
            n_embs=self.n_embs,
            n_verts_in=self.n_verts_in,
            tex_size=self.tex_size,
            name="encoder",
            **dict(self.encoder_cfg),
        )(registration_vertices, color, train)
        embs = enc_preds["embs"]

        geom_preds = GeomDecoder(
            n_embs=self.n_embs,
            verts_mean=self.verts_mean,
            verts_std=float(math.sqrt(float(self.verts_var))),
            name="geomdecoder",
        )(embs)
        geom = geom_preds["face_geom"]

        dec = PrimDecoder(
            n_embs=self.n_embs,
            geo_fn=self.geo_fn,
            color_mean=self.color_mean,
            slabsize=self.slabsize,
            n_diff_sh=self.n_diff_sh,
            remat_pyramids=not self.remat_decoder,
            name="decoder",
            **dict(self.decoder_cfg),
        )
        # whole-decoder remat trades a second decode (~54ms at uv 1024) for
        # not keeping multi-GB UV-slab activations across the splat render;
        # required at batch 4 full-res, pure overhead at batch 1-2
        call = (nn.remat(_call_prim_decoder, static_argnums=(10,))
                if self.remat_decoder else _call_prim_decoder)
        dec_preds = call(
            dec, embs, geom, headrel_campos, light_intensity,
            headrel_light_pos, headrel_light_sh, n_lights, preconv_envmap,
            lightrot, train,
        )

        preds: Dict[str, Any] = {
            "geom": geom,
            "headrel_light_sh": headrel_light_sh,
            **enc_preds,
            **dec_preds,
        }

        def render_pass(color_override=None):
            p = dict(preds)
            if color_override is not None:
                p["color"] = color_override
            out = gsplat.render(
                self.image_width, self.image_height, K, headrel_Rt,
                p["primpos"], p["primqvec"], p["primscale"],
                p["opacity"], p["color"], return_depth=True,
                **dict(self.render_cfg),
            )
            rgb = out["render"]
            alpha = 1.0 - out["final_T"]
            depth = out["depth"] / jnp.clip(alpha, 0.05, 1.0)
            return rgb, alpha, depth

        rgb, alpha, depth = render_pass()

        cal = CalV5(name="cal", **dict(self.cal_cfg)) if self.cal_cfg else None
        if cal is not None and camera_idx is not None:
            rgb = cal(rgb, camera_idx)

        if train and background is not None and is_fully_lit_frame is not None:
            bg = background[:, :3] * is_fully_lit_frame.reshape(B, 1, 1, 1)
            rgb = rgb + (1.0 - alpha) * bg

        if preconv_envmap is not None and envbg is not None:
            rgb = compose_envmap(rgb, alpha, envbg, K, Rt)
            rgbs = [rgb]
            r2, _, _ = render_pass(jnp.clip(preds["diff_color"], min=0.0))
            rgbs.append(r2)
            r3, _, _ = render_pass(jnp.clip(preds["spec_color"], min=0.0))
            rgbs.append(r3)
            rgb = jnp.concatenate(rgbs, axis=-1)

        preds.update(rgb=rgb, alpha=alpha, depth=depth)

        if self.learn_blur_enabled and camera_idx is not None:
            blur = LearnableBlur(cameras=tuple(self.camera_ids),
                                 name="learn_blur")
            preds["rgb"] = blur(preds["rgb"], camera_idx)
            preds["learn_blur_weights"] = blur.reg(camera_idx)

        return preds


class AutoEncoder(ModelFacade):
    """Facade: precomputes UV tables once, exposes init/apply (models/base.py)."""

    def __init__(
        self,
        encoder: Dict[str, Any],
        decoder: Dict[str, Any],
        assets: Any,
        image_height: int,
        image_width: int,
        cal: Optional[Dict[str, Any]] = None,
        n_embs: int = 256,
        n_diff_sh: int = 8,
        learn_blur: bool = True,
        bg_weight: float = 1.0,
        uv_size: int = 1024,
        render: Optional[Dict[str, Any]] = None,
        remat_decoder: bool = True,
    ):
        self.assets = assets
        self.image_height = image_height
        self.image_width = image_width
        self.cameras = list(assets.camera_ids)
        self.geo_fn = GeometryModule(
            np.asarray(assets.topology.vi),
            np.asarray(assets.topology.vt),
            np.asarray(assets.topology.vti),
            None,
            uv_size=uv_size,
            flip_uv=True,
            impaint=False,
        )
        encoder = dict(encoder)
        tex_size = int(np.asarray(assets.color_mean).shape[-1])
        cal_cfg = None
        if cal is not None:
            cal_cfg = dict(cal)
            cal_cfg["cameras"] = tuple(self.cameras)
            cal_cfg["identity_camera"] = str(cal_cfg["identity_camera"])
        self.cal_enabled = cal is not None
        self.learn_blur_enabled = bool(learn_blur)

        self.module = _RGCANet(
            geo_fn=self.geo_fn,
            n_verts_in=int(np.asarray(assets.topology.v).shape[0]),
            verts_mean=np.asarray(assets.verts_mean, np.float32),
            verts_var=float(assets.verts_var),
            color_mean=np.asarray(assets.color_mean, np.float32),
            camera_ids=tuple(self.cameras),
            encoder_cfg=tuple(sorted(encoder.items())),
            decoder_cfg=tuple(sorted(dict(decoder).items())),
            image_height=image_height,
            image_width=image_width,
            n_embs=n_embs,
            n_diff_sh=n_diff_sh,
            cal_cfg=tuple(sorted(cal_cfg.items())) if cal_cfg else None,
            learn_blur_enabled=self.learn_blur_enabled,
            bg_weight=bg_weight,
            tex_size=tex_size,
            slabsize=uv_size,
            render_cfg=tuple(sorted((render or {}).items())),
            remat_decoder=bool(remat_decoder),
        )

    def name_to_idx(self, camera_ids) -> jnp.ndarray:
        return jnp.asarray(
            [self.cameras.index(str(c)) for c in camera_ids], jnp.int32
        )


class RGCASummary:
    """Host-side TensorBoard image grids (reference rgca.py:623-727)."""

    def __call__(self, preds: Dict[str, Any], batch: Dict[str, Any]
                 ) -> Dict[str, np.ndarray]:
        from goliath_tpu.utils.image import linear2srgb, scale_diff_image

        diag: Dict[str, np.ndarray] = {}
        diff_color = np.clip(np.asarray(preds["diff_color"]), 0, 1)
        spec_color = np.clip(np.asarray(preds["spec_color"]), 0, 1)
        bs = diff_color.shape[0]
        n = diff_color.shape[1]
        s = int(math.sqrt(n))

        def slab(x, name, chans=3):
            img = x[:, : s * s].reshape(bs, s, s, -1).transpose(0, 3, 1, 2)
            diag[name] = np.clip(img, 0, 1)

        slab(np.asarray(linear2srgb(jnp.asarray(diff_color + spec_color))),
             "sh_slab")
        slab(np.asarray(linear2srgb(jnp.asarray(diff_color))), "diff_sh_slab")
        slab(np.asarray(linear2srgb(jnp.asarray(spec_color))), "spec_slab")
        slab(np.clip(np.asarray(preds["spec_nml"]) * 0.5 + 0.5, 0, 1),
             "spec_normal_slab")
        slab(np.clip(np.asarray(preds["spec_vis"]), 0, 1), "spec_vis_slab")
        slab(np.clip(np.asarray(preds["opacity"]), 0, 1), "opacity_slab")

        render = np.asarray(linear2srgb(preds["rgb"]))
        diag["render"] = np.clip(render, 0, 1)
        alpha = np.asarray(preds["alpha"])
        diag["alpha"] = np.clip(np.repeat(alpha, 3, axis=1), 0, 1)
        if "image" in batch:
            gt = np.asarray(linear2srgb(batch["image"]))
            diag["gt"] = np.clip(gt, 0, 1)
            diff = np.asarray(
                scale_diff_image(preds["rgb"] - batch["image"])
            )
            diag["diff"] = np.clip(diff, 0, 1)
        return diag
