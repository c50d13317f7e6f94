"""Checkpoint-render example — the TPU equivalent of the reference's
notebooks/render_example_cca.ipynb (load config + assets + checkpoint,
disable train-only camera modules, forward one batch, save an image grid).

Usage:
    python examples/render_example.py <config.yml> [ckpt_dir] [out.png]

With no checkpoint directory, renders from freshly-initialized params (the
synthetic fixture needs no downloads, so this runs anywhere).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.config import Config, load_config, load_from_config
from goliath_tpu.scripts.run_train import build_dataset


def image_grid(imgs: np.ndarray, nrow: int = 4) -> np.ndarray:
    """[B, 3, H, W] -> [H', W', 3] tiled grid (torchvision make_grid)."""
    b, c, h, w = imgs.shape
    ncol = min(nrow, b)
    nr = -(-b // ncol)
    pad = nr * ncol - b
    imgs = np.concatenate([imgs, np.zeros((pad, c, h, w), imgs.dtype)])
    grid = imgs.reshape(nr, ncol, c, h, w).transpose(0, 3, 1, 4, 2)
    return grid.reshape(nr * h, ncol * w, c)


def main() -> None:
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "configs/rgca_synthetic.yml"
    ckpt_dir = sys.argv[2] if len(sys.argv) > 2 else None
    out_path = sys.argv[3] if len(sys.argv) > 3 else "render_example.png"

    config = load_config(cfg_path)
    dataset = build_dataset(dict(config.data))

    # disable training-only camera modules (reference notebook:
    # learn_blur_enabled / pixel_cal_enabled / cal_enabled = False)
    model_cfg = Config.wrap(dict(config.model))
    model_cfg.pop("cal", None)
    model_cfg.pop("pixel_cal", None)
    model_cfg["learn_blur"] = False
    model = load_from_config(model_cfg, assets=dataset.static_assets)

    samples = [dataset[i] for i in range(min(4, len(dataset)))]
    batch = {
        k: jnp.asarray(np.stack([np.asarray(s[k]) for s in samples]))
        for k in samples[0] if not isinstance(samples[0][k], (str, bytes))
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    if ckpt_dir:
        from goliath_tpu import train as train_lib

        restored = train_lib.load_checkpoint(ckpt_dir)
        params = jax.tree_util.tree_map(jnp.asarray, restored["model"])

    preds = model.apply(params, batch, train=False)
    rgb = np.asarray(preds["rgb"])
    scale = 255.0 if rgb.max() > 2.0 else 1.0  # body models emit 0..255
    grid = np.clip(image_grid(rgb) / scale, 0, 1)

    from PIL import Image

    Image.fromarray((grid * 255).astype(np.uint8)).save(out_path)
    print(f"wrote {out_path} ({grid.shape[1]}x{grid.shape[0]})")


if __name__ == "__main__":
    main()
