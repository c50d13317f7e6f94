"""Array utilities (reference: ca_code/utils/torchutils.py).

`ParamHolder`'s named-key parameter table maps onto the flax param tables in
nn/color_cal.py; the generic helpers live here: `index` (dimension-generic
gather) and `to_device` (host batch -> jnp arrays, optionally sharded).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def index(x: jnp.ndarray, idxs: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Index a given dimension with an index array, batching like the
    reference's torchutils.index (torchutils.py:234-247)."""
    return jnp.take(x, idxs, axis=dim)


def to_device(batch: Any, sharding: Optional[Any] = None) -> Any:
    """Recursively move a host batch to device jnp arrays.

    Strings and lists of strings stay host-side. With a `sharding`
    (jax.sharding.Sharding), arrays are placed with it.
    """
    if isinstance(batch, dict):
        return {k: to_device(v, sharding) for k, v in batch.items()}
    if isinstance(batch, (list, tuple)):
        if batch and isinstance(batch[0], str):
            return batch
        return type(batch)(to_device(v, sharding) for v in batch)
    if isinstance(batch, (str, bytes)) or batch is None:
        return batch
    arr = jnp.asarray(batch)
    if sharding is not None:
        arr = jax.device_put(arr, sharding)
    return arr


class ParamHolder:
    """Named-key -> row lookup over a numpy table (host-side analogue of the
    reference's ParamHolder; learnable versions are flax params, see
    nn/color_cal.py)."""

    def __init__(self, shape, keys: Sequence[str],
                 init_value: Optional[np.ndarray] = None):
        if isinstance(shape, int):
            shape = (shape,)
        self.key_list = list(keys)
        self.params = np.zeros((len(self.key_list),) + tuple(shape),
                               np.float32)
        if init_value is not None:
            self.params[:] = init_value

    def to_idx(self, keys: Sequence[str]) -> np.ndarray:
        return np.asarray([self.key_list.index(k) for k in keys], np.int64)

    def from_idx(self, idxs: Sequence[int]) -> list:
        return [self.key_list[i] for i in idxs]

    def __call__(self, idxs: np.ndarray) -> np.ndarray:
        return self.params[np.asarray(idxs)]
