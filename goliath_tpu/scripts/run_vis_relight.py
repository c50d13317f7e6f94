"""Relighting visualization (reference: ca_code/scripts/run_vis_relight.py).

Renders a point-light sweep and an HDRI-spin sequence from a checkpoint via
the light decorators. Frames are written as PNGs; if ffmpeg is on PATH an
mp4 is also encoded (this environment has none, so PNG sequences are the
primary artifact).

    python -m goliath_tpu.scripts.run_vis_relight <config.yml> [overrides]
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.config import Config, load_config, load_from_config
from goliath_tpu import train as train_lib
from goliath_tpu.data.pipeline import collate
from goliath_tpu.scripts.run_train import build_dataset
from goliath_tpu.test import _save_png
from goliath_tpu.utils.image import linear2srgb
from goliath_tpu.utils.light_decorator import (
    EnvSpinDecorator,
    SingleLightCycleDecorator,
)

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def _encode_video(frame_dir: str, out_path: str, fps: int = 30) -> None:
    if shutil.which("ffmpeg") is None:
        logger.info(f"ffmpeg not available; frames left in {frame_dir}")
        return
    subprocess.run(
        ["ffmpeg", "-y", "-framerate", str(fps), "-i",
         os.path.join(frame_dir, "%04d.png"), "-pix_fmt", "yuv420p", out_path],
        check=False,
    )


def _save_frame(path: str, rgb) -> None:
    img = np.asarray(linear2srgb(jnp.clip(rgb[0], 0.0, 1.0)))
    img = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
    _save_png(path, img)


def main(config: Config) -> None:
    vis_cfg = config.get("vis", Config())
    n_frames = int(vis_cfg.get("n_frames", 16))
    out_dir = vis_cfg.get("output_dir", "runs/vis_relight")

    data_cfg = dict(config.get("test", {}).get("data", config.data))
    dataset = build_dataset(data_cfg)
    static_assets = dataset.static_assets

    model_cfg = Config.wrap(dict(config.model))
    model_cfg.pop("cal", None)
    model_cfg["learn_blur"] = False
    model = load_from_config(model_cfg, assets=static_assets)

    sample = collate([dataset[0]])
    jb = {k: jnp.asarray(v) for k, v in sample.items()
          if not isinstance(v, (list, str))}
    params = model.init(jax.random.PRNGKey(0), jb)
    ckpt = config.get("test", {}).get("ckpt", None)
    if ckpt is not None and os.path.exists(str(ckpt["ckpt_path"])):
        restored = train_lib.load_checkpoint(str(ckpt["ckpt_path"]))
        params = jax.tree_util.tree_map(jnp.asarray, restored["model"])

    # 1) point-light sweep
    sweep_dir = os.path.join(out_dir, "light_sweep")
    os.makedirs(sweep_dir, exist_ok=True)
    deco = SingleLightCycleDecorator(model, cycle=n_frames)
    for i in range(n_frames):
        batch = dict(jb)
        batch["index"] = np.asarray([i])
        preds = deco.apply(params, batch, train=False)
        _save_frame(os.path.join(sweep_dir, f"{i:04d}.png"), preds["rgb"])
    _encode_video(sweep_dir, os.path.join(out_dir, "light_sweep.mp4"))
    logger.info(f"wrote point-light sweep to {sweep_dir}")

    # 2) HDRI spin
    envmap_path = vis_cfg.get("envmap_path", None)
    if envmap_path and os.path.exists(str(envmap_path)):
        spin_dir = os.path.join(out_dir, "env_spin")
        os.makedirs(spin_dir, exist_ok=True)
        deco = EnvSpinDecorator(model, envmap_path=str(envmap_path),
                                cycle=n_frames)
        for i in range(n_frames):
            batch = dict(jb)
            batch["index"] = np.asarray([i])
            preds = deco.apply(params, batch, train=False)
            # rgb holds [full | diffuse | specular] panels (rgca envmap path)
            _save_frame(os.path.join(spin_dir, f"{i:04d}.png"), preds["rgb"])
        _encode_video(spin_dir, os.path.join(out_dir, "env_spin.mp4"))
        logger.info(f"wrote env spin to {spin_dir}")
    else:
        logger.info("no vis.envmap_path configured; skipping HDRI spin")


if __name__ == "__main__":
    cfg = load_config(sys.argv[1], overrides=sys.argv[2:])
    main(cfg)
