"""Host train loop mechanics: stepping, checkpointing, explosion rollback
(reference ca_code/utils/train.py:153-276)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu import train as train_mod


class _ToyModel:
    """Quadratic fit y = w*x; enough to drive the generic loop."""

    def init(self, rng, batch):
        return {"w": jnp.zeros((1,))}

    def apply(self, params, batch, train=False, rngs=None):
        return {"y": params["w"] * batch["x"]}


def _loss(preds, batch, iteration):
    err = ((preds["y"] - batch["x"] * 3.0) ** 2).mean()
    return err, {"total": err, "mse": err}


def _batches(n):
    rs = np.random.RandomState(0)
    for _ in range(n):
        yield {"x": rs.rand(4, 1).astype(np.float32)}


def test_train_runs_and_checkpoints(tmp_path):
    import optax

    model = _ToyModel()
    params = model.init(None, None)
    opt = optax.adam(0.1)
    cfg = {"train": {
        "n_max_iters": 6, "log_every_n_steps": 2, "summary_every_n_steps": 100,
        "ckpt_every_n_steps": 2, "ckpt_dir": str(tmp_path / "ckpt"),
    }}
    params, opt_state, it = train_mod.train(
        model, _loss, opt, _batches(10), cfg, params,
        summary_enabled=False, logging_enabled=True,
    )
    assert it == 6
    assert float(params["w"][0]) > 0.5  # moved toward w = 3
    assert train_mod.has_checkpoint(str(tmp_path / "ckpt"))

    # resume restores pytree structure and values
    restored = train_mod.load_checkpoint(
        str(tmp_path / "ckpt"),
        target={"model": params, "optimizer": opt_state, "iteration": 0},
    )
    np.testing.assert_allclose(np.asarray(restored["model"]["w"]),
                               np.asarray(params["w"]))


def test_explosion_rolls_back(tmp_path, caplog):
    import optax

    class _Bomb(_ToyModel):
        def apply(self, params, batch, train=False, rngs=None):
            return {"y": params["w"] * batch["x"], "boom": batch["boom"]}

    def loss(preds, batch, iteration):
        err = ((preds["y"] - batch["x"] * 3.0) ** 2).mean() \
            + preds["boom"].sum()
        return err, {"total": err}

    def batches():
        rs = np.random.RandomState(0)
        for i in itertools.count():
            yield {"x": rs.rand(4, 1).astype(np.float32),
                   "boom": np.float32(1e12 if i == 4 else 0.0)}

    model = _Bomb()
    params = model.init(None, None)
    cfg = {"train": {
        "n_max_iters": 8, "log_every_n_steps": 100,
        "summary_every_n_steps": 100, "ckpt_every_n_steps": 2,
        "ckpt_dir": str(tmp_path / "ckpt"),
    }}
    with caplog.at_level("INFO"):
        params, _, it = train_mod.train(
            model, loss, optax.adam(0.1), batches(), cfg, params,
            summary_enabled=False,
        )
    assert it == 8
    assert any("explosion detected" in r.message for r in caplog.records)
    assert np.isfinite(float(params["w"][0]))
