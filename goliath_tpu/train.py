"""Training harness (reference: ca_code/utils/train.py:153-276).

One jitted, donated train step (forward -> ModularLoss -> NaN/Inf gradient
scrub -> global-norm clip 1.0 -> optax update), wrapped by a host-side loop
with loss-explosion detection and rollback-to-checkpoint, periodic
scalar/image logging, and orbax checkpointing (latest + per-iteration,
matching the reference's latest.pt / {iter}.pt layout).

TPU notes: the loss scalar is fetched with a one-step lag so the explosion
check doesn't serialize host and device; rollback therefore happens at most
one step late, which the checkpoint granularity makes irrelevant.
"""

from __future__ import annotations

import logging
import time
import os
from collections import deque
from typing import Any, Callable, Dict, Iterator, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# checkpointing (orbax)
# ---------------------------------------------------------------------------


def _ckpt():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any],
                    iteration: Optional[int] = None) -> None:
    """Writes ckpt_dir/{iteration:06d} and updates ckpt_dir/latest."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"{iteration:06d}" if iteration is not None else "final"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    state = dict(state)
    if iteration is not None:
        state["iteration"] = iteration
    _ckpt().save(path, state, force=True)
    with open(os.path.join(ckpt_dir, "latest"), "w") as f:
        f.write(name)


def load_checkpoint(ckpt_path: str, iteration: Optional[int] = None,
                    target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load from a checkpoint dir (using `latest`) or an explicit path."""
    if os.path.isdir(ckpt_path) and os.path.exists(
        os.path.join(ckpt_path, "latest")
    ):
        if iteration is None:
            with open(os.path.join(ckpt_path, "latest")) as f:
                name = f.read().strip()
        else:
            name = f"{iteration:06d}"
        ckpt_path = os.path.join(ckpt_path, name)
    logger.info(f"loading checkpoint {ckpt_path}")
    restored = _ckpt().restore(os.path.abspath(ckpt_path), item=target)
    return restored


def has_checkpoint(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "latest"))


# ---------------------------------------------------------------------------
# logging
# ---------------------------------------------------------------------------


class SummaryWriterish:
    """torch.utils.tensorboard writer with a JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:  # pragma: no cover
            self._tb = None

    def add_scalar(self, tag: str, value: float, global_step: int) -> None:
        import json

        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(global_step)}
        ) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=global_step)

    def add_image(self, tag: str, img: np.ndarray, global_step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, img, global_step=global_step)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()


def process_losses(loss_dict: Mapping[str, Any]) -> Dict[str, float]:
    return {k: float(np.asarray(v).mean()) for k, v in loss_dict.items()
            if np.asarray(v).size == 1 or np.asarray(v).ndim <= 1}


# ---------------------------------------------------------------------------
# train step + loop
# ---------------------------------------------------------------------------


def make_train_step(model, loss_fn, optimizer) -> Callable:
    """Returns jitted step(params, opt_state, batch, rng, iteration)."""

    def step(params, opt_state, batch, rng, iteration):
        def loss_inner(p):
            preds = model.apply(p, batch, train=True, rngs={"noise": rng})
            total, ldict = loss_fn(preds, batch, iteration)
            return total, ldict

        (total, ldict), grads = jax.value_and_grad(
            loss_inner, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, ldict

    return jax.jit(step, donate_argnums=(0, 1))


def train(
    model,
    loss_fn,
    optimizer: optax.GradientTransformation,
    train_data: Iterator,
    config: Mapping[str, Any],
    params: Any,
    opt_state: Any = None,
    train_writer: Optional[SummaryWriterish] = None,
    summary_fn: Optional[Callable] = None,
    batch_filter_fn: Optional[Callable] = None,
    saving_enabled: bool = True,
    logging_enabled: bool = True,
    summary_enabled: bool = True,
    iteration: int = 0,
    rng: Optional[jax.Array] = None,
):
    """Host loop around the jitted step. Returns (params, opt_state, iter)."""
    tcfg = config["train"]
    ckpt_dir = tcfg.get("ckpt_dir", "checkpoints")
    if opt_state is None:
        opt_state = optimizer.init(params)
    if rng is None:
        rng = jax.random.PRNGKey(tcfg.get("seed", 0))

    step_fn = make_train_step(model, loss_fn, optimizer)

    # Undonated restore target for explosion rollback: params/opt_state are
    # donated to step_fn, so their device buffers are deleted by the time a
    # rollback happens — an abstract ShapeDtypeStruct template is safe to
    # hold and is all orbax needs to reconstruct the tree.
    restore_tmpl = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        {"model": params, "optimizer": opt_state},
    )
    restore_tmpl["iteration"] = 0

    loss_history: deque = deque(maxlen=32)
    pending = None  # (iteration, loss device scalar) for lagged explosion check

    # profiling (SURVEY.md 5): jax profiler trace over a config-chosen window
    # (train.profile = {dir, start_step, n_steps}); per-step wall time is
    # always tracked and logged as Perf/steps_per_sec
    pcfg = tcfg.get("profile") or {}
    prof_start = int(pcfg.get("start_step", -1))
    prof_n = int(pcfg.get("n_steps", 5))
    _prof_active = False
    _t_window = time.time()
    _it_window = iteration

    for batch in train_data:
        if batch is None:
            logger.info("skipping empty batch")
            continue
        if batch_filter_fn is not None:
            batch = batch_filter_fn(batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not isinstance(v, (list, str))}

        if prof_start >= 0 and iteration == prof_start and not _prof_active:
            jax.profiler.start_trace(pcfg.get("dir", "profile"))
            _prof_active = True
        if _prof_active and iteration >= prof_start + prof_n:
            jax.profiler.stop_trace()
            _prof_active = False

        rng, key = jax.random.split(rng)
        new_params, new_opt_state, total, ldict = step_fn(
            params, opt_state, jb, key, jnp.asarray(iteration)
        )

        # lagged explosion check on the *previous* step's loss
        exploded = False
        if pending is not None:
            prev_it, prev_loss = pending
            prev_val = float(prev_loss)
            mean_hist = (sum(loss_history) / len(loss_history)
                         if loss_history else np.inf)
            if not np.isfinite(prev_val) or prev_val > 10 * mean_hist:
                exploded = True
                logger.info(
                    f"explosion detected: iter={prev_it}: loss={prev_val}"
                )
            else:
                loss_history.append(prev_val)
        pending = (iteration, total)

        if exploded and has_checkpoint(ckpt_dir):
            restored = load_checkpoint(ckpt_dir, target=restore_tmpl)
            params = restored["model"]
            opt_state = restored["optimizer"]
            # resume from the checkpointed iteration so schedule-gated losses
            # re-run the rolled-back steps (reference ca_code/utils/train.py:
            # 189-204 reloads iteration with the checkpoint)
            iteration = int(restored.get("iteration", iteration))
            loss_history.clear()
            pending = None
            continue

        params, opt_state = new_params, new_opt_state

        if logging_enabled and iteration % tcfg["log_every_n_steps"] == 0:
            _ld = process_losses(ldict)
            loss_str = " ".join(f"{k}={v:.4f}" for k, v in _ld.items())
            logger.info(f"iter={iteration}: {loss_str}")
            now = time.time()
            if iteration > _it_window and now > _t_window:
                sps = (iteration - _it_window) / (now - _t_window)
                logger.info(f"perf: {sps:.3f} steps/s")
                if train_writer is not None:
                    train_writer.add_scalar("Perf/steps_per_sec", sps,
                                            iteration)
            _t_window, _it_window = now, iteration
            if train_writer is not None:
                for name, value in _ld.items():
                    train_writer.add_scalar(f"Losses/{name}", value, iteration)
                train_writer.flush()

        if (summary_enabled and summary_fn is not None
                and train_writer is not None
                and iteration % tcfg["summary_every_n_steps"] == 0):
            preds = model.apply(params, jb, train=False)
            summaries = summary_fn(preds, jb)
            for name, value in summaries.items():
                img = np.asarray(value)
                if img.ndim == 4:
                    img = img[0]
                train_writer.add_image(f"Images/{name}", img, iteration)

        if (saving_enabled and iteration % tcfg["ckpt_every_n_steps"] == 0):
            save_checkpoint(
                ckpt_dir,
                {"model": jax.device_get(params),
                 "optimizer": jax.device_get(opt_state)},
                iteration=iteration,
            )

        iteration += 1
        if iteration >= tcfg["n_max_iters"]:
            logger.info(f"reached max iters ({tcfg['n_max_iters']})")
            break

    if saving_enabled:
        save_checkpoint(ckpt_dir, {"model": jax.device_get(params),
                                   "optimizer": jax.device_get(opt_state)},
                        iteration=iteration)
    return params, opt_state, iteration
