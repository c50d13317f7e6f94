"""MVP hands — pose-driven volumetric primitives (reference: ca_code/models/hand_mvp.py).

Pipeline: PoseEncoder tiles the local pose into an (n_prim_x)^2 feature map;
GeomDecoder poses the LBS template (stop-gradient), derives per-primitive
base positions (UV-grid barycentric sampling) and base rotations (TBN),
and decodes per-prim delta pos/rot/scale plus a 1024^2 x z alpha slab;
RGBSlabDecoder decodes the RGB slab conditioned on a view-cos UV map and
ambient occlusion. The slab is reshaped into K=(uv/16)^2 RGBA voxel boxes
rendered by the TPU MVP raymarcher (ops/mvp.py).

Default dimensions match the reference exactly (uv 1024, prims 16x16x8,
4096 prims); everything scales down programmatically for tests.
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
from goliath_tpu.nn.dof_cal import LearnableBlur
from goliath_tpu.nn.layers import Conv2dWNUB, ConvTranspose2dWNUB, leaky_relu
from goliath_tpu.ops.raygen import compute_raydirs, make_pixelcoords
from goliath_tpu.utils.assets import AttrDict
from goliath_tpu.utils.geom import (
    GeometryModule,
    compute_tbn,
    compute_view_cos,
    index_image_impaint,
    make_postex,
    make_uv_barys,
    values_to_uv,
)
from goliath_tpu.utils.lbs import LBSModule
from goliath_tpu.utils.quaternion import axisangle_to_matrix
from goliath_tpu.utils.render_raymarcher import Raymarcher
from goliath_tpu.utils.sampling import interpolate_bilinear

logger = logging.getLogger(__name__)


def init_primitives(slab_size: int, n_prims: int, geo_fn: GeometryModule):
    """Strided sampling of impainted UV index/bary images -> per-prim base
    tables (reference hand_mvp.py:50-68)."""
    stride = slab_size // int(n_prims**0.5)
    face_index, bary = make_uv_barys(
        geo_fn.vt, geo_fn.vti, slab_size, flip_uv=False
    )
    face_index, bary = index_image_impaint(face_index, bary)
    sl = slice(stride // 2, None, stride)
    prim_bary_img = bary[sl, sl]
    prim_vidx_img = geo_fn.vi[face_index[sl, sl]]
    prim_vtidx_img = geo_fn.vti[face_index[sl, sl]]
    return prim_vidx_img, prim_vtidx_img, prim_bary_img


class PoseEncoder(nn.Module):
    """Local pose -> (n_prim_x)^2 feature map (reference :269-294)."""

    n_pose_dims: int
    n_embs: int
    in_size: int

    @nn.compact
    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        local_pose = pose[:, 6:]
        pose_tile = tile2d(local_pose, self.in_size)
        h = ConvBlock(self.n_pose_dims, 16, self.in_size, kernel_size=1,
                      padding=0, name="local_pose_conv_block")(pose_tile)
        return ConvBlock(16, self.n_embs, self.in_size,
                         name="joint_conv_block")(h)


class TransDecoder(nn.Module):
    """Per-prim delta pos/rvec/scale (reference :297-321)."""

    inch: int
    size: int

    @nn.compact
    def __call__(self, local_encoding: jnp.ndarray):
        S = self.size
        h = local_encoding
        chans = [(self.inch, 64), (64, 128), (128, 64), (64, 64)]
        for i, (cin, cout) in enumerate(chans):
            h = Conv2dWNUB(cin, cout, S, S, 3, 1, 1, name=f"dec{i}")(h)
            h = leaky_relu(h, 0.2)
        h = Conv2dWNUB(64, 9, S, S, 3, 1, 1, alpha=1.0, name="dec_out")(h)
        out = h.reshape(h.shape[0], 9, -1).transpose(0, 2, 1)
        primposdelta = out[:, :, 0:3] * 1.0e-4
        primrvecdelta = out[:, :, 3:6] * 0.01
        primscaledelta = jnp.exp(0.01 * out[:, :, 6:9])
        return primposdelta, primrvecdelta, primscaledelta


class DeconvContentDecoder(nn.Module):
    """(n_prim_x)^2 features -> uv_size^2 slab (reference :324-348)."""

    primsize_z: int
    inch: int
    outch: int
    in_size: int
    uv_size: int

    @nn.compact
    def __call__(self, local_enc: jnp.ndarray) -> jnp.ndarray:
        n_ups = int(math.log2(self.uv_size // self.in_size))
        widths = [32, 32, 16][-max(n_ups - 1, 0):] if n_ups > 1 else []
        h = local_enc
        cin = self.inch
        size = self.in_size
        for i, w in enumerate(widths):
            size *= 2
            h = ConvTranspose2dWNUB(cin, w, size, size, 4, 2, 1,
                                    name=f"tex{i}")(h)
            h = leaky_relu(h, 0.2)
            cin = w
        h = ConvTranspose2dWNUB(
            cin, self.primsize_z * self.outch, self.uv_size, self.uv_size,
            4, 2, 1, alpha=1.0, name="tex_out",
        )(h)
        return h


class GeomDecoder(nn.Module):
    """LBS-posed prim bases + decoded deltas + alpha slab (reference :353-434)."""

    inch: int
    primsize_z: int
    uv_size: int
    n_prims: int
    lbs_fn: LBSModule
    geo_fn: GeometryModule
    prim_vidx_img: Any
    prim_vtidx_img: Any
    prim_bary_img: Any
    in_size: int
    primposstart: int = 1000
    prim_scale: float = 512.0  # inverse half-extent in volradius units

    @nn.compact
    def __call__(self, pose: jnp.ndarray, joint: jnp.ndarray,
                 iteration=None, train: bool = False) -> Dict[str, jnp.ndarray]:
        B = pose.shape[0]
        zeros = jnp.zeros(
            (B,) + self.lbs_fn.lbs_template_verts.shape[-2:], pose.dtype
        )
        geom_lbs = jax.lax.stop_gradient(self.lbs_fn.pose(zeros, pose))
        vidx = jnp.asarray(np.asarray(self.prim_vidx_img))
        vtidx = jnp.asarray(np.asarray(self.prim_vtidx_img))
        bary = jnp.asarray(np.asarray(self.prim_bary_img))
        primposbase = make_postex(geom_lbs, vidx, bary)
        primposbase = primposbase.transpose(0, 2, 3, 1).reshape(B, -1, 3)
        tbn = compute_tbn(geom_lbs, jnp.asarray(self.geo_fn.vt), vidx, vtidx)
        primrotbase = jnp.stack(tbn, axis=-2).reshape(
            B, self.n_prims, 3, 3
        ).transpose(0, 1, 3, 2)
        # Uncovered/collapsed UV texels give exactly-zero (or singular) TBNs
        # -> zero-volume prims whose AABB the tile-culled march can never
        # bin, while y = primscale * R^T(x - p) = 0 marks every sample
        # "inside" (an un-cullable prim that paints its center texel along
        # entire rays). Fall back to identity orientation for any
        # non-invertible frame; real orthonormal TBNs have |det| = 1.
        det = jnp.linalg.det(primrotbase)[..., None, None]
        primrotbase = jnp.where(
            jnp.abs(det) < 0.5,
            jnp.eye(3, dtype=primrotbase.dtype), primrotbase)
        primposbase = jax.lax.stop_gradient(primposbase)
        primrotbase = jax.lax.stop_gradient(primrotbase)

        delta_pos, delta_rvec, delta_scale = TransDecoder(
            self.inch, self.in_size, name="transdecoder"
        )(joint)

        if train and iteration is not None:
            warm = (jnp.asarray(iteration) >= self.primposstart).astype(
                delta_pos.dtype
            )
            delta_pos = delta_pos * warm
            delta_rvec = delta_rvec * warm
            delta_scale = delta_scale * warm + (1.0 - warm)

        primpos = primposbase + jnp.einsum(
            "bkij,bkj->bki", primrotbase, delta_pos
        )
        primscale = self.prim_scale * delta_scale
        primrotdelta = axisangle_to_matrix(delta_rvec)
        primrot = jnp.einsum("bkij,bkjl->bkil", primrotbase, primrotdelta)

        alpha = nn.remat(DeconvContentDecoder)(
            self.primsize_z, self.inch, 1, self.in_size, self.uv_size,
            name="alphadecoder",
        )(joint).reshape(B, self.primsize_z, 1, self.uv_size, self.uv_size)
        alpha = jnp.maximum(alpha, 0.0)

        return {
            "primalpha": alpha,
            "primpos": primpos,
            "primscale": primscale,
            "primrot": primrot,
            "geom_lbs": geom_lbs,
        }


class RGBSlabDecoder(nn.Module):
    """View+AO-conditioned RGB slab (reference :451-474)."""

    inch: int
    primsize_z: int
    uv_size: int
    in_size: int

    @nn.compact
    def __call__(self, view_cos_uv, joint, ambient_occlusion) -> jnp.ndarray:
        B = joint.shape[0]
        ao_ds = interpolate_bilinear(
            ambient_occlusion, size=(self.in_size, self.in_size)
        )
        view_cond = jnp.concatenate([joint, view_cos_uv, ao_ds], axis=1)
        rgb = nn.remat(DeconvContentDecoder)(
            self.primsize_z, self.inch, 3, self.in_size, self.uv_size,
            name="texdecoder",
        )(view_cond).reshape(B, self.primsize_z, 3, self.uv_size, self.uv_size)
        return jnp.maximum(25.0 * rgb + 100.0, 0.0)


class _HandMVPNet(nn.Module):
    geo_fn: GeometryModule
    lbs_fn: LBSModule
    prim_vidx_img: Any
    prim_vtidx_img: Any
    prim_bary_img: Any
    valid_prims: Any
    camera_ids: Any
    cal_cfg: Any
    learn_blur_enabled: bool
    image_height: int
    image_width: int
    uv_size: int
    primsize: Tuple[int, int, int]
    n_pose_dims: int
    n_embs: int
    volradius: float
    prim_scale: float
    raymarcher_cfg: Any

    @nn.compact
    def __call__(
        self,
        pose: jnp.ndarray,
        campos: jnp.ndarray,
        ambient_occlusion: Optional[jnp.ndarray] = None,
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

        joint = PoseEncoder(self.n_pose_dims, self.n_embs, n_prim_x,
                            name="poseencoder")(pose)

        geo_preds = GeomDecoder(
            self.n_embs, self.primsize[2], self.uv_size, n_prims,
            self.lbs_fn, self.geo_fn,
            self.prim_vidx_img, self.prim_vtidx_img, self.prim_bary_img,
            in_size=n_prim_x, prim_scale=self.prim_scale, name="geomdecoder",
        )(pose, joint, iteration, train)
        geom_lbs = geo_preds["geom_lbs"]

        view_cos = compute_view_cos(
            geom_lbs, jnp.asarray(self.geo_fn.vi), campos
        )
        view_cos_uv = values_to_uv(
            view_cos[..., None],
            jnp.asarray(np.asarray(self.prim_vidx_img)),
            jnp.asarray(np.asarray(self.prim_bary_img)),
        )

        primrgb = RGBSlabDecoder(
            self.n_embs + 2, self.primsize[2], self.uv_size, n_prim_x,
            name="rgbdecoder",
        )(view_cos_uv, joint, ambient_occlusion)

        preds: Dict[str, Any] = {"primrgb": primrgb, **geo_preds}

        # slab -> [B, K, 4, z, py, px] channel-first voxel boxes
        pz, py_, px_ = self.primsize[2], self.primsize[1], self.primsize[0]
        rgba = jnp.concatenate(
            [primrgb, geo_preds["primalpha"]], axis=2
        )  # [B, z, 4, uv, uv]
        rgba = rgba.reshape(B, pz, 4, n_prim_y, py_, n_prim_x, px_)
        primrgba = rgba.transpose(0, 3, 5, 2, 1, 4, 6).reshape(
            B, n_prims, 4, pz, py_, px_
        )

        # rays
        focal = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
        princpt = K[:, :2, 2]
        camrot = Rt[:, :3, :3]
        campos_r = -jnp.einsum("bji,bj->bi", camrot, Rt[:, :3, 3])
        pix = make_pixelcoords(B, self.image_height, self.image_width)
        raypos, raydir, tminmax = compute_raydirs(
            campos_r, camrot, focal, princpt, pix, self.volradius
        )

        rm = Raymarcher(volradius=self.volradius,
                        **dict(self.raymarcher_cfg))
        decout = {
            "primpos": geo_preds["primpos"],
            "primrot": geo_preds["primrot"],
            "primscale": geo_preds["primscale"],
            "primrgba": primrgba,
            "valid_prims": jnp.asarray(np.asarray(self.valid_prims)),
        }
        rgb, alpha, _, _ = rm(raypos, raydir, tminmax, decout, K, Rt)
        # observability for the Sp sampling window (ADVICE r4 #3): fraction
        # of prims whose span outgrew the exactness bound this step
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


class AutoEncoder(ModelFacade):
    def __init__(
        self,
        assets: Any,
        image_height: int,
        image_width: int,
        cal: Optional[Dict[str, Any]] = None,
        n_pose_dims: int = 54,
        n_embs: int = 64,
        volradius: float = 2000.0,
        primsize: Tuple[int, int, int] = (16, 16, 8),
        learn_blur: bool = True,
        uv_size: int = 1024,
        prim_scale: float = 512.0,
        global_scaling: float = 10.0,  # meter -> cm like the reference
        raymarcher: Optional[Dict[str, Any]] = None,
    ):
        self.assets = assets
        self.cameras = list(assets.camera_ids)
        primsize = tuple(primsize)
        n_prim_x = uv_size // primsize[0]
        n_prim_y = uv_size // primsize[1]
        n_prims = n_prim_x * n_prim_y

        self.lbs_fn = LBSModule(
            assets.lbs_model_json,
            assets.lbs_config_dict,
            np.asarray(assets.template_mesh_unscaled)[None],
            assets.skeleton_scales,
            global_scaling=[global_scaling] * 3,
        )
        self.geo_fn = GeometryModule(
            np.asarray(assets.topology.vi),
            np.asarray(assets.topology.vt),
            np.asarray(assets.topology.vti),
            np.asarray(assets.topology.v2uv),
            uv_size=uv_size,
            flip_uv=False,
            impaint=False,
        )
        prim_vidx_img, prim_vtidx_img, prim_bary_img = init_primitives(
            uv_size, n_prims, self.geo_fn
        )

        vm = self.geo_fn.valid_mask.astype(np.float32)[..., 0]
        bx = uv_size // n_prim_x
        by = uv_size // n_prim_y
        vm = vm.reshape(n_prim_y, by, n_prim_x, bx).mean(axis=(1, 3))
        valid_prims = (vm != 0).reshape(-1)

        cal_cfg = None
        if cal is not None:
            cal_cfg = dict(cal)
            cal_cfg["cameras"] = tuple(self.cameras)
            cal_cfg["identity_camera"] = str(cal_cfg["identity_camera"])
        self.cal_enabled = cal is not None
        self.learn_blur_enabled = bool(learn_blur)

        rm_cfg = {"dt": 1.0, "max_steps": 128, "max_prims_per_tile": 64,
                  "chunk": 16}
        rm_cfg.update(raymarcher or {})

        self.module = _HandMVPNet(
            geo_fn=self.geo_fn,
            lbs_fn=self.lbs_fn,
            prim_vidx_img=prim_vidx_img,
            prim_vtidx_img=prim_vtidx_img,
            prim_bary_img=prim_bary_img,
            valid_prims=valid_prims,
            camera_ids=tuple(self.cameras),
            cal_cfg=tuple(sorted(cal_cfg.items())) if cal_cfg else None,
            learn_blur_enabled=self.learn_blur_enabled,
            image_height=image_height,
            image_width=image_width,
            uv_size=uv_size,
            primsize=primsize,
            n_pose_dims=n_pose_dims,
            n_embs=n_embs,
            volradius=float(volradius),
            prim_scale=float(prim_scale),
            raymarcher_cfg=tuple(sorted(rm_cfg.items())),
        )

    def name_to_idx(self, camera_ids) -> jnp.ndarray:
        return jnp.asarray(
            [self.cameras.index(str(c)) for c in camera_ids], jnp.int32
        )


class HandMVPSummary:
    """Host-side summary grids (reference hand_mvp.py:483-559)."""

    def __call__(self, preds: Dict[str, Any], batch: Dict[str, Any]
                 ) -> Dict[str, np.ndarray]:
        from goliath_tpu.utils.image import linear2display

        diag: Dict[str, np.ndarray] = {}
        rgb = np.asarray(linear2display(preds["rgb"])) / 255.0
        diag["render"] = np.clip(rgb, 0, 1)
        diag["alpha"] = np.clip(
            np.repeat(np.asarray(preds["alpha"]), 3, axis=1), 0, 1
        )
        if "image" in batch:
            diag["gt"] = np.clip(
                np.asarray(linear2display(batch["image"])) / 255.0, 0, 1
            )
        return diag
