"""URHand — Universal Relightable Hand (reference: ca_code/models/urhand.py).

Physics-inspired + neural hybrid on a mesh: LBS-posed template -> per-texel
TBN frames; raster shadow maps per light (depth render from each light with
the TPU mesh rasterizer + soft depth compare, utils/shadowmap.py);
hand-crafted lambert + phong-power features feed a DisplacementUNet that
refines geometry along normals and predicts roughness; a second shadow pass
on displaced geometry; full GGX specular with Schlick fresnel drives a
"phys" branch (albedo/pi + GGX) and a "linear" branch where a
FeatEncoderUNet encodes light features into gain/bias textures decoded by
dual conv stacks with gain-bias modulation; final texture =
tex_mean * gain + bias * 64, seam-resampled, rendered with edge gradients.

All sizes scale from (uv_size, init_uv_size); defaults match the reference
(1024 / 64).
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
from goliath_tpu.nn.blocks import ConvBlock, tile2d
from goliath_tpu.nn.color_cal import CalV5
from goliath_tpu.nn.layers import Conv2dWN, Conv2dWNUB, leaky_relu
from goliath_tpu.ops.rasterizer import RenderLayer
from goliath_tpu.utils.geom import (
    GeometryModule,
    make_uv_vert_index,
    vert_normals,
    xyz2normals,
)
from goliath_tpu.utils.lbs import LBSModule
from goliath_tpu.utils.quaternion import (
    matrix_to_axisangle,
    quat_from_xyz,
    quat_to_matrix,
)
from goliath_tpu.utils.sampling import interpolate_bilinear
from goliath_tpu.utils.seams import SeamSampler
from goliath_tpu.utils.shadowmap import get_shadow_map

logger = logging.getLogger(__name__)


def _normalize(v, axis=-1, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps)


def build_cam_rot_mat(campos: jnp.ndarray, objcenter: jnp.ndarray
                      ) -> jnp.ndarray:
    """Look-at rotation rows for light views (reference urhand.py:61-79)."""
    degenerate = (jnp.abs(campos[:, 0]) + jnp.abs(campos[:, 2])) < 1e-8
    campos = campos.at[:, 2].add(jnp.where(degenerate, 1e-2, 0.0))
    z = _normalize(objcenter - campos)
    up = jnp.zeros_like(campos).at[:, 1].set(1.0)
    x = _normalize(jnp.cross(z, up))
    y = _normalize(jnp.cross(z, x))
    return jnp.stack([x, y, z], axis=1)


class FeatEncoderUNet(nn.Module):
    """Light-feature encoder with gain/bias side outputs (urhand.py:81-106)."""

    n_diff_feat: int
    n_spec_feat: int
    out_ch: int
    m: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c, m = 3, self.m
        nfc = [64, 64 * c, 128 * c, 128 * c, 256 * c]
        nbc = [64, 64 * m, 128 * m, 128 * m, 256 * m]
        x = Conv2dWN(self.n_diff_feat + self.n_spec_feat, 64, 7, 1, 3,
                     use_bias=False, name="proj")(x)
        gb: List[jnp.ndarray] = []
        for i in range(len(nfc) - 1):
            x = Conv2dWN(nfc[i], nfc[i + 1], 4, 2, 1, use_bias=False,
                         name=f"feat{i}")(x)
            b = Conv2dWN(nfc[i + 1], nbc[i + 1], 1, 1, 0, use_bias=False,
                         name=f"gb{i}")(x)
            gb.insert(0, b)
        z = Conv2dWN(256 * c, self.out_ch, 4, 2, 1, name="enc")(x)
        return z, gb


class DisplacementUNet(nn.Module):
    """Geometry refinement + roughness UNet (urhand.py:109-242)."""

    uv_size: int
    init_uv_size: int
    output_scale: float
    pose_feat_dim: int
    n_enc_dims: Tuple[int, ...] = (64, 64, 64, 64, 64, 64)

    @nn.compact
    def __call__(self, feat_uv: jnp.ndarray, pose_cond: jnp.ndarray):
        n_blocks = int(math.log2(self.uv_size // self.init_uv_size))
        sizes = [self.init_uv_size * 2**s for s in range(n_blocks + 1)]
        d = list(self.n_enc_dims)[: n_blocks + 1]
        enc_dims = [(6, d[0])] + [(d[i - 1], d[i]) for i in range(1, len(d))]
        dec_dims = [(d[-1] + self.pose_feat_dim, d[-2] if len(d) > 1 else 1)]
        for i in range(1, len(d)):
            cout = d[len(d) - 2 - i] if len(d) - 2 - i >= 0 else 1
            dec_dims.append((d[len(d) - 1 - i] * 2, cout))
        dec_dims[-1] = (dec_dims[-1][0], 1)
        rough_dims = [(d[-1], dec_dims[0][1])] + dec_dims[1:]

        enc_acts = []
        x = feat_uv
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            cin, cout = enc_dims[i]
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"enc{i}")(x)
            x = leaky_relu(x, 0.2)
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = interpolate_bilinear(x, size=(size // 2, size // 2),
                                         align_corners=True)

        def run_dec(x0, dims, prefix, cond=None):
            x = x0
            interm = None
            for i, size in enumerate(sizes):
                cin, cout = dims[i]
                if i == 0:
                    if cond is not None:
                        x = jnp.concatenate([x, cond], axis=1)
                        interm = x
                else:
                    x = leaky_relu(x, 0.2)
                    x_prev = enc_acts[-i - 1]
                    x = interpolate_bilinear(x, size=x_prev.shape[2:4],
                                             align_corners=True)
                    x = jnp.concatenate([x, x_prev], axis=1)
                alpha = 1.0 if i == len(sizes) - 1 else 0.2
                x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, alpha=alpha,
                               name=f"{prefix}{i}")(x)
            return jnp.tanh(x), interm

        disp, interm_feat = run_dec(x, dec_dims, "dec", cond=pose_cond)
        disp = disp * self.output_scale
        rough, _ = run_dec(x, rough_dims, "rough")
        roughness = (rough + 1.0) / 4.0 + 0.3  # [0.3, 0.8]
        return disp, roughness, interm_feat


class ConvTeacherDecoder(nn.Module):
    """Relightable teacher decoder (urhand.py:244-676)."""

    geo_fn: GeometryModule
    raw_index_mask: Any
    uv_size: int
    init_uv_size: int
    pose_enc_dims: int
    disp_enc_dims: Tuple[int, ...]
    disp_scale: float
    shadow_rl: RenderLayer
    init_channels: int = 128
    min_channels: int = 16
    refine_geo: bool = True
    feat_uv: str = "texmean"
    view_cond: bool = True
    fresnel: float = 0.04
    scaled_albedo: bool = True
    shadow: bool = True
    spec_powers: Tuple[int, ...] = (1, 16, 32)

    @nn.compact
    def __call__(
        self,
        lbs_motion: jnp.ndarray,
        id_mesh: jnp.ndarray,
        tex_mean: jnp.ndarray,
        verts_rec: jnp.ndarray,
        cam_pos: jnp.ndarray,
        light_pos: jnp.ndarray,
        light_intensity: jnp.ndarray,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        B = verts_rec.shape[0]
        L = light_pos.shape[1]
        S = self.uv_size
        gf = self.geo_fn

        mask = jnp.asarray(np.all(gf.index_image != -1, axis=-1))  # [S, S]
        # UV-edge tangent weights precomputed host-side: w1/w2 [S, S] so the
        # device-side TBN is pure channel-first [B, 3, S, S] math — the
        # previous verts[:, index_image] gather materialized [B, S, S, 3, 3]
        # whose (3, 3) trailing dims are tile-padded ~42x on TPU (1.6GB)
        idx_np = np.clip(np.asarray(gf.index_image), 0, None)  # [S, S, 3]
        tri_uv_np = np.asarray(gf.vt)[
            np.asarray(gf.v2uv)[idx_np, 0]]  # [S, S, 3, 2]
        vt01 = tri_uv_np[..., 1, :] - tri_uv_np[..., 0, :]
        vt02 = tri_uv_np[..., 2, :] - tri_uv_np[..., 0, :]
        fin = vt01[..., 0] * vt02[..., 1] - vt01[..., 1] * vt02[..., 0]
        fin = np.where(np.abs(fin) < 1e-8, 1e-8, fin)
        w_e1 = jnp.asarray((vt02[..., 1] / fin).astype(np.float32))
        w_e2 = jnp.asarray((vt01[..., 1] / fin).astype(np.float32))
        i_c = [jnp.asarray(idx_np[..., k]) for k in range(3)]

        def _norm_cf(x, eps=1e-5):
            return x / jnp.clip(
                jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)), min=eps)

        def _cross_cf(u, v):
            return jnp.stack(
                [u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
                 u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
                 u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0]], axis=1)

        def tbn_uv(verts, normals_cf):
            """Per-texel TBN, channel-first: returns (t, b, n) [B,3,S,S]."""
            vt_cf = verts.transpose(0, 2, 1)               # [B, 3, V]
            c0 = vt_cf[:, :, i_c[0]]                       # [B, 3, S, S]
            tang = ((vt_cf[:, :, i_c[1]] - c0) * w_e1[None, None]
                    - (vt_cf[:, :, i_c[2]] - c0) * w_e2[None, None])
            tang = _norm_cf(tang)
            n = normals_cf
            bt = _norm_cf(_cross_cf(n, tang))
            tang = _norm_cf(_cross_cf(bt, n))
            m = mask[None, None]
            return tang * m, bt * m, n * m

        vert_nml = vert_normals(verts_rec, jnp.asarray(gf.vi))
        n0 = _norm_cf(gf.to_uv(vert_nml))                  # [B, 3, S, S]
        tbn_t, tbn_b, tbn_n = tbn_uv(verts_rec, n0)

        p_uv = gf.to_uv(verts_rec)  # [B, 3, S, S]
        v_uv = _normalize(cam_pos[..., None, None] - p_uv, axis=1)
        li = light_intensity[..., None, None]  # [B, L, 1, 1, 1]

        def shadow_pass(verts, p_uv_c, nml_c):
            posc = (verts.max(1) + verts.min(1)) / 2
            posc = jnp.repeat(posc[:, None], L, 1).reshape(-1, 3)
            lightpos = light_pos.reshape(-1, 3)
            lightrot = build_cam_rot_mat(lightpos, posc)
            Rt_l = jnp.concatenate([lightrot, -jnp.einsum(
                "bij,bj->bi", lightrot, lightpos)[..., None]], axis=2)
            pv = jnp.repeat(p_uv_c[:, None], L, 1).reshape(B * L, 3, S, S)
            vv = jnp.repeat(verts[:, None], L, 1).reshape(
                B * L, verts.shape[1], 3)
            nm = jnp.repeat(nml_c[:, None], L, 1).reshape(B * L, 3, S, S)
            sm = get_shadow_map(self.shadow_rl, Rt_l, None, vv, pv, nm)
            sm = jnp.exp(-sm / 8.0)
            return jax.lax.stop_gradient(sm.reshape(B, L, 1, S, S))

        nml = tbn_n                                        # [B, 3, S, S]
        if self.shadow:
            shadow_map = shadow_pass(verts_rec, p_uv, nml)

        # lambert + phong features (urhand.py:419-444)
        l_uv = _normalize(
            light_pos[..., None, None] - p_uv[:, None], axis=2
        )  # [B, L, 3, S, S]
        view = -v_uv
        ref = view - 2.0 * jnp.sum(view * nml, 1, keepdims=True) * nml
        diff = jnp.clip(jnp.sum(nml[:, None] * l_uv, 2, keepdims=True),
                        0.0, 1.0)
        spec0 = jnp.clip(jnp.sum(ref[:, None] * l_uv, 2, keepdims=True),
                         min=0.0)
        spec = jnp.stack(
            [jnp.clip(spec0**p, max=1.0) for p in self.spec_powers], 2
        )
        if self.shadow:
            diff_p = jnp.sum(diff * li * shadow_map, 1)
            spec_p = jnp.sum(spec * li[:, :, None] * shadow_map[:, :, None], 1)
        else:
            diff_p = jnp.sum(diff * li, 1)
            spec_p = jnp.sum(spec * li[:, :, None], 1)
        lint_scale = jnp.sum(li, 1)
        inv_lint = 1.0 / (lint_scale + 1e-6)

        outputs: Dict[str, jnp.ndarray] = {
            "diff_feature_raw": inv_lint * diff_p,
            "spec_feature_raw": inv_lint[:, None] * spec_p,
            "feature_normal_raw": nml,
        }
        if self.shadow:
            outputs["shadow_raw"] = shadow_map

        # displacement (urhand.py:447-487)
        uv_id_mesh = gf.to_uv(id_mesh)
        pose_cond = tile2d(lbs_motion, self.init_uv_size)
        normalized_tex = (tex_mean / 255.0) * 2.0 - 1.0
        rim = jnp.asarray(np.asarray(self.raw_index_mask))[None, None]
        uv_id_mesh = uv_id_mesh * rim
        normalized_tex = normalized_tex * rim
        if self.feat_uv == "texmean":
            uv_refiner_feat = jnp.concatenate(
                [normalized_tex, normalized_tex], 1)
        elif self.feat_uv == "texmean_geo":
            uv_refiner_feat = jnp.concatenate([normalized_tex, uv_id_mesh], 1)
        else:  # "geo"
            uv_refiner_feat = jnp.concatenate([uv_id_mesh, nml], 1)
        displacement, roughness, id_pose_feat = DisplacementUNet(
            self.uv_size, self.init_uv_size, self.disp_scale,
            self.pose_enc_dims, tuple(self.disp_enc_dims),
            name="geo_refiner",
        )(uv_refiner_feat, pose_cond)
        if not self.refine_geo:
            displacement = displacement * 0.0

        p_uv_displaced = p_uv + jax.lax.stop_gradient(nml) * displacement
        n_disp = xyz2normals(p_uv_displaced)               # [B, 3, S, S]
        verts_rec_displaced = gf.from_uv(p_uv_displaced)
        tbn_t, tbn_b, tbn_n = tbn_uv(verts_rec_displaced, n_disp)
        tbn_n = -tbn_n  # reference flips the normal row after displacement

        p_uv = p_uv_displaced
        v_uv = _normalize(cam_pos[..., None, None] - p_uv, axis=1)
        nml = tbn_n
        if self.shadow:
            shadow_map = shadow_pass(
                jax.lax.stop_gradient(verts_rec_displaced),
                jax.lax.stop_gradient(p_uv), nml,
            )

        # GGX specular + phys branch (urhand.py:508-572)
        ggx_L = _normalize(light_pos[..., None, None] - p_uv[:, None], axis=2)
        ggx_V = v_uv
        ggx_H = _normalize((ggx_L + ggx_V[:, None]) / 2.0, axis=2)
        ggx_N = nml
        nov0 = jnp.sum(ggx_V * ggx_N, 1, keepdims=True)
        ggx_N = ggx_N * jnp.sign(nov0)
        nol = jnp.clip(jnp.sum(ggx_N[:, None] * ggx_L, 2, keepdims=True),
                       1e-6, 1.0)
        nov = jnp.sum(ggx_N * ggx_V, 1, keepdims=True)
        noh = jnp.clip(jnp.sum(ggx_N[:, None] * ggx_H, 2, keepdims=True),
                       1e-6, 1.0)
        voh = jnp.clip(jnp.sum(ggx_V[:, None] * ggx_H, 2, keepdims=True),
                       1e-6, 1.0)
        alpha_r = roughness * roughness
        alpha2 = alpha_r * alpha_r
        ggx_k = (alpha_r + 2 * roughness + 1) / 8.0
        FMi = (-5.55473 * voh - 6.98316) * voh
        frac0 = self.fresnel + (1 - self.fresnel) * jnp.power(2.0, FMi)
        frac = frac0 * alpha2[:, None]
        nom0 = noh * noh * (alpha2[:, None] - 1) + 1
        nom1 = nov * (1 - ggx_k) + ggx_k
        nom2 = nol * (1 - ggx_k[:, None]) + ggx_k[:, None]
        nom = jnp.clip(4 * math.pi * nom0 * nom0 * nom1[:, None] * nom2,
                       1e-6, 4 * math.pi)
        spec_ggx = frac / nom  # [B, L, 1, S, S]
        specular = spec_ggx

        diff_cos = jnp.clip(jnp.sum(nml[:, None] * ggx_L, 2, keepdims=True),
                            0.0, 1.0)
        spec = jnp.stack(
            [jnp.clip(spec_ggx**p, max=1.0) for p in self.spec_powers], 2
        )
        pos_cos = (diff_cos[:, :, None] > 0).astype(spec.dtype)
        if self.shadow:
            diff_p = jnp.sum(diff_cos * li * shadow_map, 1)
            spec_p = jnp.sum(
                spec * li[:, :, None] * shadow_map[:, :, None] * pos_cos, 1)
        else:
            diff_p = jnp.sum(diff_cos * li, 1)
            spec_p = jnp.sum(spec * li[:, :, None] * pos_cos, 1)
        spec_p = spec_p * 10.0

        feat_p = inv_lint[:, None] * jnp.concatenate(
            [diff_p[:, None], spec_p], 1)

        global_albedo_scale = self.param(
            "global_albedo_scale", nn.initializers.zeros, (1,))
        if self.scaled_albedo:
            tex_mean = tex_mean * (
                jax.nn.sigmoid(global_albedo_scale) / 2.0 + 0.7)
        surface_brdf = (tex_mean[:, None] / 255.0) / math.pi + specular
        cosine = jnp.clip(
            jnp.einsum("bjknm,bknm->bjnm", ggx_L, nml), min=0.0)
        phys_rgb = jnp.mean(
            4 * math.pi * surface_brdf * li * cosine[:, :, None], axis=1)
        global_scale = self.param("global_scale", nn.initializers.ones, (1,))
        phys_rgb = phys_rgb * (jax.nn.sigmoid(global_scale) / 2.0 + 0.3)
        outputs.update(phys_tex=phys_rgb, roughness=roughness)

        if self.view_cond:
            # v expressed in the TBN frame: rows of the frame are
            # (t, -b, n), so vout = v_x*t - v_y*b + v_z*n per texel
            viewout = (v_uv[:, 0:1] * tbn_t - v_uv[:, 1:2] * tbn_b
                       + v_uv[:, 2:3] * tbn_n)
            viewout = interpolate_bilinear(
                viewout, size=id_pose_feat.shape[2:])
            id_pose_feat = jnp.concatenate([id_pose_feat, viewout], axis=1)
        outputs["id_pose_conv"] = id_pose_feat

        n_joint = id_pose_feat.shape[1]
        joint_feat = ConvBlock(
            n_joint, self.init_channels, self.init_uv_size,
            name="joint_conv_block_tex",
        )(id_pose_feat)

        # linear gain/bias branch (urhand.py:582-617)
        feat_flat = feat_p.reshape(
            feat_p.shape[0], -1, feat_p.shape[-2], feat_p.shape[-1])
        z, gainbias = FeatEncoderUNet(
            1, len(self.spec_powers), 128, name="featenc",
        )(jax.lax.stop_gradient(feat_flat))

        nc = [128, 256, 128, 128, 64, 32, 16, 4]
        n_layers = int(math.log2((self.uv_size * 4) // self.init_uv_size)) + 1
        n_layers = min(n_layers, len(nc) - 1)
        scale = 0.707107
        activations = []
        x = joint_feat
        hh = self.init_uv_size
        for i in range(n_layers):
            x = interpolate_bilinear(x, size=(hh, hh), align_corners=True)
            cin = self.init_channels if i == 0 else nc[i]
            alpha = 1.0 if i == n_layers - 1 else 0.2
            x = Conv2dWNUB(cin, nc[i + 1], hh, hh, 3, 1, 1, alpha=alpha,
                           name=f"texmod0_{i}")(x)
            x = leaky_relu(x, 0.2)
            activations.append(x)
            hh *= 2
        x = z
        hh = self.init_uv_size
        for i in range(n_layers):
            x = interpolate_bilinear(x, size=(hh, hh), align_corners=True)
            cin = 128 if i == 0 else nc[i]
            alpha = 1.0 if i == n_layers - 1 else 0.2
            x = Conv2dWN(cin, nc[i + 1], 3, 1, 1, use_bias=False, alpha=alpha,
                         name=f"texmod1_{i}")(x) * activations[i]
            hh *= 2
            if i < len(gainbias):
                x = (x + interpolate_bilinear(
                    gainbias[i], size=x.shape[2:], align_corners=True
                )) * scale
        rgb = interpolate_bilinear(x, size=(S, S), align_corners=True)

        if self.shadow and not train:
            rgb = rgb * jnp.sum((li / lint_scale[:, None]) * shadow_map, 1)
        rgb = lint_scale * rgb

        outputs.update(
            tex=jnp.clip(rgb, min=0.0),
            verts_displaced=verts_rec_displaced,
            diff_feature=inv_lint * diff_p,
            spec_feature=inv_lint[:, None] * spec_p,
            displacement=displacement,
            feature_normal=nml,
            interm_features2reg=gainbias,
        )
        if self.shadow:
            outputs["shadow"] = shadow_map
        return outputs


class _URHandNet(nn.Module):
    geo_fn: GeometryModule
    lbs_fn: LBSModule
    seam_sampler: SeamSampler
    renderer: Any
    shadow_rl: Any
    raw_index_mask: Any
    tex_mean: Any
    tex_std: float
    camera_ids: Any
    cal_cfg: Any
    relight_cfg: Any
    uv_size: int

    @nn.compact
    def __call__(
        self,
        pose: jnp.ndarray,
        campos: jnp.ndarray,
        K: Optional[jnp.ndarray] = None,
        Rt: Optional[jnp.ndarray] = None,
        light_pos: Optional[jnp.ndarray] = None,
        light_intensity: Optional[jnp.ndarray] = None,
        camera_idx: Optional[jnp.ndarray] = None,
        iteration: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        B = pose.shape[0]
        S = self.uv_size
        tex_mean = jnp.broadcast_to(
            jnp.asarray(np.asarray(self.tex_mean, np.float32)),
            (B, 3, S, S),
        )
        preds: Dict[str, Any] = {}

        zeros = jnp.zeros(
            (B,) + self.lbs_fn.lbs_template_verts.shape[-2:], pose.dtype)
        mesh_world = self.lbs_fn.pose(zeros, pose)
        mesh_id_only = jnp.broadcast_to(
            jnp.asarray(self.lbs_fn.lbs_template_verts)
            * jnp.asarray(self.lbs_fn.global_scaling)[0],
            mesh_world.shape,
        )
        verts_rec = mesh_world

        # per-joint euler XYZ -> axis-angle (reference urhand.py:771)
        eul = pose.reshape(B, -1, 3)
        Rj = quat_to_matrix(quat_from_xyz(eul))
        hand_pose_aa = matrix_to_axisangle(Rj).reshape(B, -1)

        relight_preds = ConvTeacherDecoder(
            geo_fn=self.geo_fn,
            raw_index_mask=self.raw_index_mask,
            shadow_rl=self.shadow_rl,
            name="decoder_relight",
            **dict(self.relight_cfg),
        )(
            jax.lax.stop_gradient(hand_pose_aa),
            jax.lax.stop_gradient(mesh_id_only),
            jax.lax.stop_gradient(tex_mean),
            jax.lax.stop_gradient(verts_rec),
            campos, light_pos, light_intensity, train,
        )
        preds["interm_features2reg"] = relight_preds["interm_features2reg"]

        phys_tex_rec = jnp.clip(relight_preds["phys_tex"] * 255.0, 0, 255)

        # forward_tex: gain/bias composition (urhand.py:711-748)
        tex = relight_preds["tex"]
        gain = tex[:, 0:3]
        bias = tex[:, 3:4] if tex.shape[1] == 4 else tex[:, 3:6]
        tex_rec = tex_mean * gain + bias * self.tex_std
        cal = CalV5(name="cal", **dict(self.cal_cfg)) if self.cal_cfg else None
        if cal is not None and camera_idx is not None:
            tex_rec = cal(tex_rec, camera_idx)
        tex_rec = jnp.clip(tex_rec, 0.0, 255.0)
        preds["texrec_before_warp"] = tex_rec
        tex_rec = self.seam_sampler.resample(tex_rec)

        verts_displaced = relight_preds["verts_displaced"]
        preds.update(
            geom=verts_displaced,
            tex_rec=tex_rec,
            displacement=relight_preds["displacement"],
            roughness=relight_preds["roughness"],
        )

        if self.renderer is not None and K is not None:
            tex_seg = jnp.ones_like(tex_rec[:, :1])
            rgb_out = self.renderer(
                verts_displaced,
                jnp.concatenate([tex_rec, tex_seg], axis=1), K, Rt,
                edge_grad=train,
            )
            preds["rgb"] = rgb_out["render"][:, :3]
            preds["rendered_rgb"] = preds["rgb"]
            preds["alpha"] = rgb_out["render"][:, 3:4]
            preds["rendered_mask"] = preds["alpha"]
            phys_out = self.renderer(
                verts_displaced,
                jnp.concatenate([phys_tex_rec, tex_seg], axis=1), K, Rt,
                edge_grad=train,
            )
            preds["rendered_phys_rgb"] = phys_out["render"][:, :3]
            preds["depth"] = jax.lax.stop_gradient(
                rgb_out["depth_img"][:, None])

            # normal visualizations (stop-grad feature renders)
            nrm = jax.lax.stop_gradient(relight_preds["feature_normal"])
            nrm_cam = jnp.einsum(
                "bchw,bdc->bdhw", nrm, Rt[:, :3, :3])
            feat_normal = (1 - nrm_cam) * 127.5
            nrm_out = self.renderer(
                jax.lax.stop_gradient(verts_displaced),
                jnp.concatenate(
                    [feat_normal, jnp.ones_like(feat_normal[:, :1])], 1),
                K, Rt, edge_grad=False,
            )
            preds["normals"] = nrm_out["render"][:, :3]

        return preds


class AutoEncoder(ModelFacade):
    def __init__(
        self,
        assets: Any,
        cal: Optional[Dict[str, Any]] = None,
        renderer: Optional[Dict[str, Any]] = None,
        relight: Optional[Dict[str, Any]] = None,
        blur_enable: bool = False,
        blur_sig: float = 1.0,
        blur_size: int = 3,
        vis_feature: bool = False,
        impaint_uv: bool = True,
        uv_size: int = 1024,
        global_scaling: float = 10.0,
        shadow_size: Optional[int] = None,
    ):
        self.assets = assets
        self.cameras = list(assets.camera_ids)
        relight = dict(relight or {})
        uv_size = int(relight.pop("uv_size", uv_size))
        shadow_size = shadow_size or uv_size

        self.geo_fn = GeometryModule(
            np.asarray(assets.topology.vi),
            np.asarray(assets.topology.vt),
            np.asarray(assets.topology.vti),
            np.asarray(assets.topology.v2uv),
            uv_size=uv_size,
            impaint=impaint_uv,
        )
        self.lbs_fn = LBSModule(
            assets.lbs_model_json, assets.lbs_config_dict,
            np.asarray(assets.template_mesh_unscaled)[None],
            assets.skeleton_scales,
            global_scaling=[global_scaling] * 3,
        )
        raw_index = make_uv_vert_index(
            self.geo_fn.vt, self.geo_fn.vi, self.geo_fn.vti,
            uv_size=uv_size, flip_uv=False,
        )
        raw_index_mask = (raw_index != -1).any(-1)

        tex_mean = np.asarray(assets.color_mean, np.float32)
        if tex_mean.shape[-1] != uv_size:
            tex_mean = np.asarray(interpolate_bilinear(
                jnp.asarray(tex_mean[None]), size=(uv_size, uv_size)))[0]
        self.tex_std = 64.0

        seam = assets.get("seam_data_1024", None)
        if seam is None:
            from goliath_tpu.models.mesh_vae import _identity_seam_data

            seam = _identity_seam_data(uv_size)
        self.seam_sampler = SeamSampler(seam)

        shadow_rl = RenderLayer(
            h=shadow_size, w=shadow_size,
            vi=self.geo_fn.vi, vt=self.geo_fn.vt, vti=self.geo_fn.vti,
            flip_uvs=False,
            max_faces_per_tile=int(relight.pop("shadow_max_faces", 128)),
            chunk=16,
        )

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

        relight.pop("masked_refiner_input", None)  # implied by impaint_uv
        relight.setdefault("init_uv_size", 64)
        relight.setdefault("pose_enc_dims", 64)
        relight.setdefault("disp_enc_dims", (64, 64, 64, 64, 64, 64))
        relight.setdefault("disp_scale", 0.3)
        relight["uv_size"] = uv_size
        relight["disp_enc_dims"] = tuple(relight["disp_enc_dims"])

        self.module = _URHandNet(
            geo_fn=self.geo_fn,
            lbs_fn=self.lbs_fn,
            seam_sampler=self.seam_sampler,
            renderer=rl,
            shadow_rl=shadow_rl,
            raw_index_mask=raw_index_mask,
            tex_mean=tex_mean,
            tex_std=self.tex_std,
            camera_ids=tuple(self.cameras),
            cal_cfg=tuple(sorted(cal_cfg.items())) if cal_cfg else None,
            relight_cfg=tuple(sorted(relight.items())),
            uv_size=uv_size,
        )

    def name_to_idx(self, camera_ids) -> jnp.ndarray:
        return jnp.asarray(
            [self.cameras.index(str(c)) for c in camera_ids], jnp.int32
        )


class URHandSummary:
    """Host-side summary (reference urhand.py:992-1108)."""

    def __call__(self, preds: Dict[str, Any], batch: Dict[str, Any]
                 ) -> Dict[str, np.ndarray]:
        out = {}
        rgb = np.asarray(preds["rgb"]) / 255.0
        out["render"] = np.clip(rgb, 0, 1)
        if "rendered_phys_rgb" in preds:
            out["phys"] = np.clip(
                np.asarray(preds["rendered_phys_rgb"]) / 255.0, 0, 1)
        if "normals" in preds:
            out["normals"] = np.clip(np.asarray(preds["normals"]) / 255.0,
                                     0, 1)
        if "image" in batch:
            out["gt"] = np.clip(np.asarray(batch["image"]) / 255.0, 0, 1)
        return out
