"""Optimizer construction (reference: ca_code/utils/module_loader.py:199-253).

`torch.optim.Adam` / `AdamW` class names in configs remap here (see
goliath_tpu/config.py). `build_optimizer` supports per-module learning-rate
groups via optax.multi_transform keyed on the top-level parameter collection
name ('encoder', 'decoder', ...), warning about unoptimized submodules like
the reference does.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import optax

logger = logging.getLogger(__name__)


class Adam:
    optax_ctor = staticmethod(optax.adam)

    def __init__(self, lr: float = 1e-3, betas: Tuple[float, float] = (0.9, 0.999),
                 eps: float = 1e-8, weight_decay: float = 0.0,
                 per_module: Optional[Mapping[str, Mapping[str, Any]]] = None):
        self.lr = lr
        self.betas = tuple(betas)
        self.eps = eps
        self.weight_decay = weight_decay
        self.per_module = dict(per_module or {})

    def make(self, lr: float) -> optax.GradientTransformation:
        if self.weight_decay:
            return optax.adamw(lr, b1=self.betas[0], b2=self.betas[1],
                               eps=self.eps, weight_decay=self.weight_decay)
        return type(self).optax_ctor(lr, b1=self.betas[0], b2=self.betas[1],
                                     eps=self.eps)


class AdamW(Adam):
    def __init__(self, lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 1e-2, per_module=None):
        super().__init__(lr, betas, eps, weight_decay, per_module)

    def make(self, lr: float) -> optax.GradientTransformation:
        return optax.adamw(lr, b1=self.betas[0], b2=self.betas[1],
                           eps=self.eps, weight_decay=self.weight_decay)


def scrub_nonfinite() -> optax.GradientTransformation:
    """Zero NaN/Inf gradient entries (reference train.py:209-214)."""
    import jax.numpy as jnp

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: Mapping[str, Any], params: Any,
                    clip_grad_norm: float = 1.0) -> optax.GradientTransformation:
    """Build scrub -> clip(1.0) -> (per-module) Adam from a config section."""
    from goliath_tpu.config import load_class

    cfg = dict(cfg)
    cls = load_class(cfg.pop("class_name", "goliath_tpu.optim.Adam"))
    opt = cls(**cfg)

    base: optax.GradientTransformation
    if opt.per_module:
        top = params["params"] if "params" in params else params
        groups: Dict[str, optax.GradientTransformation] = {}
        for name, sub in opt.per_module.items():
            groups[name] = opt.make(float(sub.get("lr", opt.lr)))
        missing = [k for k in top.keys() if k not in groups]
        if missing:
            logger.warning(
                f"submodules without explicit optimizer group: {missing}; "
                f"using base lr {opt.lr}"
            )
        groups["__default__"] = opt.make(opt.lr)

        def label_fn(tree):
            p = tree["params"] if "params" in tree else tree
            labels = {
                k: jax.tree_util.tree_map(
                    lambda _: (k if k in opt.per_module else "__default__"), v
                )
                for k, v in p.items()
            }
            return {"params": labels} if "params" in tree else labels

        base = optax.multi_transform(groups, label_fn)
    else:
        base = opt.make(opt.lr)

    return optax.chain(
        scrub_nonfinite(),
        optax.clip_by_global_norm(clip_grad_norm),
        base,
    )
