"""OLAT relighting teacher for MVP hands
(reference: ca_code/models/hand_teacher_mvp.py).

Subclasses the hand_mvp AutoEncoder: the geometry path (poseencoder +
geomdecoder) is reused frozen-style; a second PoseEncoder and an
OLATRGBDecoder add per-light relighting: per-(prim, voxel) deep shadow
values, light and view directions in prim-local frames, and a UNet over
(lightvec, viewdir, 1 - shadow) per light producing per-light RGBA slabs;
the relit slab is sum_lights sigmoid(shadow_pred) * relu(olat_tex) *
intensity.

TPU-first shadow redesign: the CUDA path renders unit-RGB prims from each
light with scatter "shadow splatting" (primsplatter.h); here a global
density grid is built once per frame (ops/mvp.py:splat_density_grid) and
light->voxel transmittance is integrated directly (shadow_at_points) —
the same accumulated-alpha quantity without scatters inside the march.
Lights are processed together (the reference chunks by 5 for GPU memory).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.models import hand_mvp as base
from goliath_tpu.nn.color_cal import CalV5
from goliath_tpu.nn.dof_cal import LearnableBlur
from goliath_tpu.nn.layers import Conv2dWNUB, leaky_relu
from goliath_tpu.ops.mvp import (
    shadow_at_points,
    shadow_at_points_exact,
    splat_density_grid,
)
from goliath_tpu.ops.raygen import compute_raydirs, make_pixelcoords
from goliath_tpu.utils.render_raymarcher import Raymarcher
from goliath_tpu.utils.sampling import interpolate_bilinear

logger = logging.getLogger(__name__)


class _OLATUNet(nn.Module):
    """The OLAT decoder's UNet over (lightvec, viewdir, 1 - shadow) slabs
    (reference hand_teacher_mvp.py:434-492): bilinear-resampled encoder/
    decoder ladder with joint-feature injection at the bottleneck."""

    uv_size: int
    pz: int
    n_enc_dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, jf: jnp.ndarray) -> jnp.ndarray:
        S, pz = self.uv_size, self.pz
        d = list(self.n_enc_dims)
        in_feats = (2 * 3 + 1) * pz
        sizes = [S // (2**i) for i in range(len(d))]
        enc_dims = [(in_feats, d[0])] + [(d[i - 1], d[i])
                                         for i in range(1, len(d))]
        dec_dims = [(d[-1] + jf.shape[1], d[-2])]
        for i in range(1, len(d) - 1):
            dec_dims.append((d[len(d) - 1 - i] * 2, d[len(d) - 2 - i]))
        dec_dims.append((d[0] * 2, pz * 4))

        enc_acts = []
        for i, size in enumerate(sizes):
            cin, cout = enc_dims[i]
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"enc{i}")(x)
            x = leaky_relu(x, 0.2)
            enc_acts.append(x)
            if i < len(sizes) - 1:
                x = interpolate_bilinear(x, size=(size // 2, size // 2),
                                         align_corners=True)
        for i in range(len(sizes)):
            size = sizes[-i - 1]
            cin, cout = dec_dims[i]
            if i == 0:
                jf_r = interpolate_bilinear(jf, size=x.shape[2:],
                                            align_corners=True)
                x = jnp.concatenate([x, jf_r], axis=1)
            else:
                x_prev = enc_acts[-i - 1]
                x = interpolate_bilinear(x, size=x_prev.shape[2:4],
                                         align_corners=True)
                x = jnp.concatenate([x, x_prev], axis=1)
            x = Conv2dWNUB(cin, cout, size, size, 3, 1, 1, name=f"dec{i}")(x)
            x = leaky_relu(x, 0.2)
        return x


class OLATRGBDecoder(nn.Module):
    """Per-light OLAT texture decoder (reference hand_teacher_mvp.py:159-554)."""

    uv_size: int
    primsize: Tuple[int, int, int]
    n_prim_x: int
    n_prim_y: int
    volradius: float
    n_init_channels: int = 64
    n_enc_dims: Tuple[int, ...] = (64, 64, 64, 64, 64)
    shadow_grid_res: int = 64
    shadow_steps: int = 32
    # "grid" (production: global density grid, ops/mvp.py docstring) or
    # "exact" (brute-force per-prim oracle — O(K^2 V S), parity studies only)
    shadow_mode: str = "grid"

    @nn.compact
    def __call__(
        self,
        campos: jnp.ndarray,
        primpos: jnp.ndarray,     # [B, K, 3] world
        primrot: jnp.ndarray,     # [B, K, 3, 3]
        primscale: jnp.ndarray,   # [B, K, 3]
        primalpha: jnp.ndarray,   # [B, Z, 1, uv, uv]
        valid_prims: jnp.ndarray,  # [K]
        joint_feat: jnp.ndarray,  # [B, C, n_prim_x, n_prim_y]
        light_pos: jnp.ndarray,   # [B, L, 3]
        light_intensity: jnp.ndarray,  # [B, L, 1]
        iteration=None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        B, L = light_pos.shape[:2]
        pz, py, px = self.primsize[2], self.primsize[1], self.primsize[0]
        npx, npy = self.n_prim_x, self.n_prim_y
        K = npx * npy
        S = self.uv_size
        vr = self.volradius

        # slab -> per-prim voxel alphas [B, K, Z, Y, X]
        pa = primalpha.reshape(B, pz, 1, npy, py, npx, px)
        pa = pa.transpose(0, 3, 5, 1, 4, 6, 2)[..., 0].reshape(
            B, K, pz, py, px)
        pa = pa * valid_prims[None, :, None, None, None]

        # prim voxel centers in world (reference :383-402), [B,K,Z,Y,X,3]
        def axis(n):
            return jnp.linspace(-1.0, 1.0, n)

        zz, yy, xx = jnp.meshgrid(axis(pz), axis(py), axis(px), indexing="ij")
        y_local = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)  # [V, 3]
        # primscale is in volradius units (world half-extent = vr / scale):
        # world voxel center = primpos + vr * R @ (y / scale)
        # (reference hand_teacher_mvp.py:383-402)
        prims = primpos[:, :, None] + vr * jnp.einsum(
            "bkij,bkvj->bkvi", primrot,
            y_local[None, None] / primscale[:, :, None],
        )  # [B, K, V, 3]

        # deep shadow via the global density grid (stop-grad like the ref)
        def one_shadow(pp, pr, ps, alpha_k, lp):
            density = None
            if self.shadow_mode == "grid":
                density = splat_density_grid(
                    pp / vr, pr, ps, alpha_k, self.shadow_grid_res
                )

            def per_light(lp_one):
                pts = (pp[:, None] + vr * jnp.einsum(
                    "kij,kvj->kvi", pr,
                    y_local[None] / ps[:, None])).reshape(-1, 3) / vr
                if self.shadow_mode == "exact":
                    return shadow_at_points_exact(
                        pp / vr, pr, ps, alpha_k, pts, lp_one / vr,
                        self.shadow_steps)
                return shadow_at_points(density, pts, lp_one / vr,
                                        self.shadow_steps)

            return jax.vmap(per_light)(lp)  # [L, K*V]

        shadow = jax.lax.stop_gradient(
            jax.vmap(one_shadow)(primpos, primrot, primscale, pa, light_pos)
        ).reshape(B, L, K, pz, py, px)

        # shadow -> slab layout [B*L, Z, uv, uv] (reference :360-377)
        sh = shadow.reshape(B, L, npy, npx, 1, pz, py, px)
        sh = sh.transpose(0, 1, 5, 4, 2, 6, 3, 7).reshape(B * L, pz, S, S)
        shadow_feat = sh

        # light/view dirs in prim-local frames (reference :404-432)
        lightvec = light_pos[:, :, None, None] - prims[:, None]  # [B,L,K,V,3]
        lightvec = lightvec / jnp.sqrt(
            jnp.sum(lightvec**2, -1, keepdims=True) + 1e-12)
        viewdir = campos[:, None, None] - prims  # [B, K, V, 3]
        viewdir = viewdir / jnp.sqrt(
            jnp.sum(viewdir**2, -1, keepdims=True) + 1e-12)
        lightvec = jnp.einsum("bkef,blkve->blkvf", primrot, lightvec)
        viewdir = jnp.einsum("bkef,bkve->bkvf", primrot, viewdir)
        vp = valid_prims[None, :, None, None]
        viewdir = viewdir * vp
        lightvec = lightvec * vp[:, None]

        def to_slab(x, lead):  # [lead, K, V, 3] -> [lead, Z*3, S, S]
            x = x.reshape(lead, npy, npx, pz, py, px, 3)
            x = x.transpose(0, 3, 6, 1, 4, 2, 5)
            return x.reshape(lead, pz * 3, S, S)

        lightvec = to_slab(lightvec.reshape(B * L, K, -1, 3), B * L)
        viewdir = to_slab(viewdir, B)
        viewdir = jnp.repeat(viewdir[:, None], L, 1).reshape(B * L, -1, S, S)
        shadow_in = shadow_feat.reshape(B * L, pz, S, S)
        shadow_feat_flat = jax.lax.stop_gradient(shadow_in)

        x = jnp.concatenate(
            [lightvec, viewdir, 1.0 - shadow_feat_flat], axis=1)

        jf = jnp.repeat(joint_feat[:, None], L, 1).reshape(
            B * L, *joint_feat.shape[1:])

        # UNet (reference :434-492), rematerialized: its saved activations
        # at uv 1024 x (B*L=5) were ~16 GB of bwd residuals (the round-3
        # hand_teacher rung OOM after the shadow fix) — nn.remat keeps only
        # the UNet inputs and recomputes activations in the bwd
        unet = nn.remat(_OLATUNet)(
            uv_size=S, pz=pz, n_enc_dims=tuple(self.n_enc_dims),
            name="unet")
        tex = unet(x, jf).reshape(B, L, pz, 4, S, S)

        if train and iteration is not None:
            warm = (jnp.asarray(iteration) < 1000)
            shadowolat = jnp.where(
                warm,
                shadow_feat_flat.reshape(B, L, pz, 1, S, S),
                jax.nn.sigmoid(tex[:, :, :, :1]),
            )
        else:
            shadowolat = jax.nn.sigmoid(tex[:, :, :, :1])
        texolat = 25.0 * tex[:, :, :, 1:] + 100.0

        li = light_intensity[:, :, None, :, None, None]
        rgb = jnp.sum(shadowolat * jnp.maximum(texolat, 0.0) * li, axis=1)
        rgb = rgb.reshape(B, pz, 3, S, S)

        primshadow = jnp.repeat(
            shadow_feat_flat[:, :, None], 3, 2
        ).reshape(B, L, pz, 3, S, S).sum(1) / L

        out = {"primrgb": rgb, "primshadow": primshadow}
        if train:
            out["texolat"] = texolat
        return out


class _HandTeacherNet(base._HandMVPNet):
    """Extends the hand_mvp net with the OLAT relight path."""

    shadow_mode: str = "grid"

    @nn.compact
    def __call__(
        self,
        pose: jnp.ndarray,
        campos: jnp.ndarray,
        light_intensity: Optional[jnp.ndarray] = None,
        light_pos: Optional[jnp.ndarray] = None,
        K: Optional[jnp.ndarray] = None,
        Rt: Optional[jnp.ndarray] = None,
        camera_idx: Optional[jnp.ndarray] = None,
        background: Optional[jnp.ndarray] = None,
        iteration: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        B = pose.shape[0]
        n_prim_x = self.uv_size // self.primsize[0]
        n_prim_y = self.uv_size // self.primsize[1]
        n_prims = n_prim_x * n_prim_y

        joint = base.PoseEncoder(self.n_pose_dims, self.n_embs, n_prim_x,
                                 name="poseencoder")(pose)
        # frozen-geometry path: stop gradients into the geometry decoders
        geo_preds = base.GeomDecoder(
            self.n_embs, self.primsize[2], self.uv_size, n_prims,
            self.lbs_fn, self.geo_fn,
            self.prim_vidx_img, self.prim_vtidx_img, self.prim_bary_img,
            in_size=n_prim_x, prim_scale=self.prim_scale, name="geomdecoder",
        )(pose, joint, iteration, False)
        geo_preds = jax.tree_util.tree_map(jax.lax.stop_gradient, geo_preds)

        joint2 = base.PoseEncoder(self.n_pose_dims, self.n_embs, n_prim_x,
                                  name="poseencoder2")(pose)
        dec_preds = OLATRGBDecoder(
            self.uv_size, self.primsize, n_prim_x, n_prim_y,
            self.volradius, shadow_mode=self.shadow_mode,
            name="relightdecoder",
        )(
            campos, geo_preds["primpos"], geo_preds["primrot"],
            geo_preds["primscale"], geo_preds["primalpha"],
            jnp.asarray(np.asarray(self.valid_prims), jnp.float32),
            joint2, light_pos, light_intensity, iteration, train,
        )
        primrgb = dec_preds["primrgb"]
        preds: Dict[str, Any] = {"primrgb": primrgb, **geo_preds, **dec_preds}

        pz, py_, px_ = self.primsize[2], self.primsize[1], self.primsize[0]
        rgba = jnp.concatenate([primrgb, geo_preds["primalpha"]], axis=2)
        rgba = rgba.reshape(B, pz, 4, n_prim_y, py_, n_prim_x, px_)
        primrgba = rgba.transpose(0, 3, 5, 2, 1, 4, 6).reshape(
            B, n_prims, 4, pz, py_, px_)

        focal = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
        princpt = K[:, :2, 2]
        camrot = Rt[:, :3, :3]
        campos_r = -jnp.einsum("bji,bj->bi", camrot, Rt[:, :3, 3])
        pix = make_pixelcoords(B, self.image_height, self.image_width)
        raypos, raydir, tminmax = compute_raydirs(
            campos_r, camrot, focal, princpt, pix, self.volradius)
        rm = Raymarcher(volradius=self.volradius, **dict(self.raymarcher_cfg))
        decout = {
            "primpos": geo_preds["primpos"],
            "primrot": geo_preds["primrot"],
            "primscale": geo_preds["primscale"],
            "primrgba": primrgba,
            "valid_prims": jnp.asarray(np.asarray(self.valid_prims)),
        }
        rgb, alpha, _, _ = rm(raypos, raydir, tminmax, decout, K, Rt)
        preds["mvp_window_overflow"] = rm.window_overflow(decout)

        cal = CalV5(name="cal", **dict(self.cal_cfg)) if self.cal_cfg else None
        if cal is not None and camera_idx is not None:
            rgb = cal(rgb, camera_idx)
        if train and background is not None:
            rgb = rgb + (1.0 - alpha) * background[:, :3]
        preds.update(rgb=rgb, alpha=alpha)
        if self.learn_blur_enabled and camera_idx is not None:
            blur = LearnableBlur(cameras=tuple(self.camera_ids),
                                 name="learn_blur")
            preds["rgb"] = blur(preds["rgb"], camera_idx)
            preds["learn_blur_weights"] = blur.reg(camera_idx)
        return preds


class AutoEncoder(base.AutoEncoder):
    """Facade reusing hand_mvp's host-side precompute with the teacher net."""

    def __init__(self, *args, shadow_mode: str = "grid", **kwargs):
        super().__init__(*args, **kwargs)
        cfg = {f: getattr(self.module, f)
               for f in self.module.__dataclass_fields__
               if f not in ("parent", "name")}
        self.module = _HandTeacherNet(shadow_mode=shadow_mode, **cfg)


HandMVPSummary = base.HandMVPSummary
