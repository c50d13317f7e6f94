"""Model facade convention.

Models are plain Python classes that precompute heavy host-side state
(UV tables, LBS parsing) once in __init__ and wrap an inner flax.linen
module. The harness interacts with them functionally:

    params = model.init(rng, batch)            # batch: dict of arrays
    preds = model.apply(params, batch, train=True, rngs={...})

`batch_keys()` introspects the inner module's __call__ signature, playing
the role of the reference's get_inputs/filter_inputs
(ca_code/utils/train.py:99-116).
"""

from __future__ import annotations

import inspect
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax


class ModelFacade:
    module: nn.Module

    def batch_keys(self) -> List[str]:
        sig = inspect.signature(type(self.module).__call__)
        return [
            p.name for p in sig.parameters.values()
            if p.name not in ("self",) and p.kind
            in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
        ]

    def filter_inputs(self, batch: Dict[str, Any],
                      required_only: bool = False) -> Dict[str, Any]:
        sig = inspect.signature(type(self.module).__call__)
        keys = set(self.batch_keys())
        out = {k: v for k, v in batch.items() if k in keys}
        if not required_only:
            return out
        required = {
            p.name for p in sig.parameters.values()
            if p.name != "self" and p.default is inspect.Parameter.empty
        }
        missing = required - set(out) - {"train"}
        if missing:
            raise ValueError(f"batch missing required model inputs: {missing}")
        return out

    def init(self, rng: jax.Array, batch: Dict[str, Any]) -> Any:
        inputs = self.filter_inputs(batch)
        rngs = {"params": rng, "noise": jax.random.fold_in(rng, 1)}

        # jit the init: eager flax init dispatches every op individually,
        # which over the axon TPU tunnel costs ~ms of round-trip latency per
        # op (a full-res RGCA init was measured at ~20 min eager vs ~1 min
        # compiled)
        def _init(rngs, inputs):
            return self.module.init(rngs, **inputs, train=False)

        return jax.jit(_init)(rngs, inputs)

    def apply(self, params: Any, batch: Dict[str, Any], train: bool = False,
              rngs: Optional[Dict[str, jax.Array]] = None) -> Dict[str, Any]:
        inputs = self.filter_inputs(batch)
        return self.module.apply(params, **inputs, train=train, rngs=rngs)
