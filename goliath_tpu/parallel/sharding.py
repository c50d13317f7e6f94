"""Multi-chip scaling via jax.sharding (SURVEY.md 2.8).

The reference is single-GPU per job (no torch.distributed anywhere); its
scale-out is SLURM array jobs, one subject per GPU. The natural TPU mesh for
this workload:

  * **data axis** — shard the (frame x camera) batch across chips. Gradients
    are allreduced over ICI automatically by XLA (params replicated, batch
    sharded). This is the dome-capture scaling axis: 172 cameras per frame
    give ample parallel batch.
  * pixel/primitive axes (sharding render tiles or gaussian slabs for
    beyond-HBM images) are the next axes; the binning engine keys tiles per
    image, so per-image work stays chip-local under data parallelism.

`make_sharded_train_step` builds one pjit-compiled step: params/opt-state
replicated, batch sharded on the leading axis, loss psum'd by XLA.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis_name: str = "data") -> Dict[str, Any]:
    """Place a host batch with its leading dim sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = {}
    for k, v in batch.items():
        if isinstance(v, (list, str)):
            continue
        arr = jnp.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] % mesh.devices.size == 0:
            out[k] = jax.device_put(arr, sharding)
        else:
            out[k] = jax.device_put(arr, NamedSharding(mesh, P()))
    return out


def make_sharded_train_step(
    model, loss_fn, optimizer: optax.GradientTransformation, mesh: Mesh,
    axis_name: str = "data", donate: bool = True,
) -> Callable:
    """jit-compiled DP train step over the mesh.

    Returns step(params, opt_state, batch, rng, iteration) with params and
    optimizer state replicated, batch sharded on its leading axis; XLA
    inserts the gradient allreduce over ICI.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def step(params, opt_state, batch, rng, iteration):
        def loss_inner(p):
            preds = model.apply(p, batch, train=True, rngs={"noise": rng})
            total, ldict = loss_fn(preds, batch, iteration)
            return total, ldict

        (total, ldict), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, total, ldict

    def batch_sharding(batch):
        return {
            k: data if (hasattr(v, "ndim") and v.ndim >= 1) else repl
            for k, v in batch.items()
        }

    def compiled(params, opt_state, batch, rng, iteration):
        jitted = jax.jit(
            step,
            in_shardings=(repl, repl, batch_sharding(batch), repl, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1) if donate else (),
        )
        return jitted(params, opt_state, batch, rng, iteration)

    return compiled


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
