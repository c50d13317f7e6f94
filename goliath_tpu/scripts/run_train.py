"""CLI train entry (reference: ca_code/scripts/run_train.py:31-100).

    python -m goliath_tpu.scripts.run_train <config.yml> [a.b=value ...]

Builds dataset, model, optimizer, loss, data loader, summary writer, then
runs the train loop; resumes from `latest` if `train.resume` is set (or a
checkpoint exists).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any, Dict

import jax
import yaml

import goliath_tpu
from goliath_tpu.config import Config, load_config, load_from_config
from goliath_tpu import train as train_lib
from goliath_tpu.data.pipeline import DataLoader
from goliath_tpu.optim import build_optimizer

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(levelname)s: %(message)s",
)
logger = logging.getLogger(__name__)


def build_dataset(data_cfg: Dict[str, Any], **kwargs):
    data_cfg = dict(data_cfg)
    if data_cfg.pop("synthetic", False):
        from goliath_tpu.data.synthetic import SyntheticDataset

        data_cfg.pop("root_path", None)
        data_cfg.pop("shared_assets_path", None)
        data_cfg.pop("split", None)
        data_cfg.pop("fully_lit_only", None)
        return SyntheticDataset(**data_cfg, **kwargs)
    from goliath_tpu.data.dataloader import BodyDataset

    return BodyDataset(**data_cfg, **kwargs)


def main(config: Config) -> None:
    goliath_tpu.enable_compilation_cache()
    dataset = build_dataset(config.data)
    static_assets = dataset.static_assets

    model = load_from_config(config.model, assets=static_assets)
    loss_fn = load_from_config(config.loss, assets=static_assets)
    summary_fn = (load_from_config(config.summary)
                  if "summary" in config else None)

    # build a first batch to initialize params
    loader = DataLoader(dataset, **config.get("dataloader", {"batch_size": 1}))
    train_dir = config.train.get("run_dir", "runs/default")
    os.makedirs(train_dir, exist_ok=True)
    with open(os.path.join(train_dir, "config.yml"), "w") as f:
        yaml.safe_dump(config.to_dict(), f)

    it = iter(loader)
    first_batch = next(it)
    import itertools
    import jax.numpy as jnp

    jb = {k: jnp.asarray(v) for k, v in first_batch.items()
          if not isinstance(v, (list, str))}
    params = model.init(jax.random.PRNGKey(config.train.get("seed", 0)), jb)

    # optimizer: top-level `lr` feeds the default group like the reference
    opt_cfg = dict(config.optimizer)
    opt_cfg.setdefault("lr", config.get("lr", 1e-3))
    optimizer = build_optimizer(opt_cfg, params)
    opt_state = optimizer.init(params)

    iteration = 0
    ckpt_dir = config.train.ckpt_dir
    if config.train.get("resume", True) and train_lib.has_checkpoint(ckpt_dir):
        restored = train_lib.load_checkpoint(
            ckpt_dir,
            target={"model": params, "optimizer": opt_state, "iteration": 0},
        )
        params = restored["model"]
        opt_state = restored["optimizer"]
        iteration = int(restored.get("iteration", 0))
        logger.info(f"resumed from iteration {iteration}")

    writer = train_lib.SummaryWriterish(config.train.get("tb_dir",
                                                         train_dir + "/tb"))
    batch_filter_fn = getattr(dataset, "batch_filter", None)

    train_lib.train(
        model,
        loss_fn,
        optimizer,
        itertools.chain([first_batch], it),
        config,
        params=params,
        opt_state=opt_state,
        train_writer=writer,
        summary_fn=summary_fn,
        batch_filter_fn=batch_filter_fn,
        iteration=iteration,
    )


if __name__ == "__main__":
    cfg = load_config(sys.argv[1], overrides=sys.argv[2:])
    main(cfg)
