"""CLI eval entry (reference: ca_code/scripts/run_test.py:31-127).

Injects a `psnr` metric, strips train-only losses (learn_blur, backlit_reg,
kl regularizers keep their eval value but are reported unweighted), samples
`n_test_frames` random frames at batch size 1, disables per-camera cal/blur.
"""

from __future__ import annotations

import logging
import random
import sys

import jax
import jax.numpy as jnp

from goliath_tpu.config import Config, load_config, load_from_config
from goliath_tpu import test as test_lib
from goliath_tpu import train as train_lib
from goliath_tpu.data.pipeline import DataLoader
from goliath_tpu.losses import ModularLoss
from goliath_tpu.scripts.run_train import build_dataset

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)

TRAIN_ONLY_LOSSES = {"learn_blur", "backlit_reg", "kl", "face_kl",
                     "pose_shadow_l2"}


def main(config: Config) -> None:
    test_cfg = config.get("test", Config())
    data_cfg = dict(test_cfg.get("data", config.data))
    dataset = build_dataset(data_cfg)
    static_assets = dataset.static_assets

    # disable train-only camera modules (reference run_test.py:85-90)
    model_cfg = Config.wrap(dict(config.model))
    model_cfg.pop("cal", None)
    model_cfg["learn_blur"] = False
    model = load_from_config(model_cfg, assets=static_assets)

    # losses: drop train-only, inject psnr (reference run_test.py:49-57)
    losses_cfg = {k: v for k, v in dict(config.loss.losses).items()
                  if k not in TRAIN_ONLY_LOSSES}
    losses_cfg["psnr"] = {
        "src_key": "rgb", "tgt_key": "image", "mask_key": "image_weight",
        "weight": 0.0,
    }
    loss_fn = ModularLoss(losses_cfg, assets=static_assets)

    n_frames = int(test_cfg.get("n_test_frames", 12))
    random.seed(42)
    idxs = random.sample(range(len(dataset)), min(n_frames, len(dataset)))

    class Subset:
        def __len__(self):
            return len(idxs)

        def __getitem__(self, i):
            return dataset[idxs[i]]

    loader = DataLoader(Subset(), batch_size=1, shuffle=False, num_workers=0,
                        n_epochs=1)

    batch0 = next(iter(loader))
    jb = {k: jnp.asarray(v) for k, v in batch0.items()
          if not isinstance(v, (list, str))}
    params = model.init(jax.random.PRNGKey(0), jb)
    ckpt = test_cfg.get("ckpt", None)
    if ckpt is not None:
        restored = train_lib.load_checkpoint(str(ckpt["ckpt_path"]))
        params = jax.tree_util.tree_map(jnp.asarray, restored["model"])

    means = test_lib.test(
        model, loss_fn, iter(loader), config, params,
        batch_filter_fn=getattr(dataset, "batch_filter", None),
        vis_path=test_cfg.get("vis_path", None),
    )
    print(means)


if __name__ == "__main__":
    cfg = load_config(sys.argv[1], overrides=sys.argv[2:])
    main(cfg)
