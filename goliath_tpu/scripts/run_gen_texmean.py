"""Bake color_mean.png by unprojecting frames into UV
(reference: ca_code/scripts/run_gen_texmean.py:28-108).

Averages the UV unprojection of `num_frames` fully-lit frames over all
cameras; required before URHand training.

    python -m goliath_tpu.scripts.run_gen_texmean <config.yml> [overrides]
"""

from __future__ import annotations

import logging
import os
import sys

import jax.numpy as jnp
import numpy as np

from goliath_tpu.config import Config, load_config
from goliath_tpu.ops.rasterizer import RenderLayer
from goliath_tpu.scripts.run_train import build_dataset
from goliath_tpu.test import _save_png
from goliath_tpu.utils.geom import (
    GeometryModule,
    index_image_impaint,
    make_uv_barys,
    make_uv_vert_index,
)
from goliath_tpu.utils.lbs import LBSModule
from goliath_tpu.utils.tex import get_tex_rl

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(config: Config) -> None:
    data_cfg = dict(config.data)
    data_cfg["fully_lit_only"] = True
    dataset = build_dataset(data_cfg)
    assets = dataset.static_assets

    uv_size = int(config.get("texmean_uv_size", 1024))
    geo_fn = GeometryModule(
        np.asarray(assets.topology.vi), np.asarray(assets.topology.vt),
        np.asarray(assets.topology.vti), np.asarray(assets.topology.v2uv),
        uv_size=uv_size, impaint=True,
    )
    lbs_fn = LBSModule(
        assets.lbs_model_json, assets.lbs_config_dict,
        np.asarray(assets.template_mesh_unscaled)[None],
        assets.skeleton_scales,
        global_scaling=[config.get("global_scaling", 10.0)] * 3,
    )
    rl = RenderLayer(
        h=int(config.model.renderer.image_height),
        w=int(config.model.renderer.image_width),
        vi=geo_fn.vi, vt=geo_fn.vt, vti=geo_fn.vti, flip_uvs=False,
    )
    index_image = make_uv_vert_index(
        geo_fn.vt, geo_fn.vi, geo_fn.vti, uv_size=uv_size, flip_uv=True)
    face_index, bary_image = make_uv_barys(
        geo_fn.vt, geo_fn.vti, uv_size=uv_size, flip_uv=True)
    index_image, bary_image = index_image_impaint(index_image, bary_image)
    face_index = index_image_impaint(face_index)

    num_frames = int(config.get("texmean_num_frames", 5))
    frame_list = getattr(dataset, "get_frame_list",
                         lambda **kw: list(range(dataset.n_frames)))()
    frame_list = frame_list[:num_frames]
    camera_list = getattr(dataset, "get_camera_list",
                          lambda: list(range(len(dataset.camera_ids))))()

    tex_total = np.zeros((1, 3, uv_size, uv_size), np.float32)
    tex_cnt = np.zeros((1, 3, uv_size, uv_size), np.float32)
    for fid in frame_list:
        for cid in camera_list:
            try:
                data = dataset.get(fid, cid)
            except Exception:
                logger.warning(f"failed loading cam {cid} frame {fid}")
                continue
            if data is None:
                continue
            img = jnp.asarray(data["image"])[None].astype(jnp.float32)
            extrin = jnp.asarray(data["Rt"])[None]
            intrin = jnp.asarray(data["K"])[None]
            pose = jnp.asarray(data["pose"])[None]
            mesh_world = lbs_fn.pose(
                jnp.zeros((1,) + lbs_fn.lbs_template_verts.shape[-2:]), pose)
            tex_img, tex_mask = get_tex_rl(
                rl, img, (mesh_world, jnp.asarray(geo_fn.vi)), extrin, intrin,
                jnp.asarray(face_index), jnp.asarray(index_image),
                jnp.asarray(bary_image),
            )
            tex_total += np.asarray(tex_img)
            tex_cnt += np.asarray(tex_mask, np.float32)

    tex_mean = tex_total / (tex_cnt + 1e-5)
    tex_mean = np.flip(tex_mean[0].transpose(1, 2, 0), 0)
    out_dir = os.path.join(str(config.data.get("root_path", ".")), "uv_image")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "color_mean.png")
    scale = 1.0 if tex_mean.max() > 2.0 else 255.0
    _save_png(out_path, np.clip(tex_mean * scale, 0, 255).astype(np.uint8))
    logger.info(f"wrote {out_path}")


if __name__ == "__main__":
    cfg = load_config(sys.argv[1], overrides=sys.argv[2:])
    main(cfg)
