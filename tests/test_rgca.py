"""End-to-end RGCA model test on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.data.synthetic import SyntheticDataset
from goliath_tpu.losses import ModularLoss
from goliath_tpu.models.rgca import AutoEncoder, RGCASummary


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(n_cams=3, n_frames=4, img_h=48, img_w=48,
                            uv_size=32)


@pytest.fixture(scope="module")
def model(ds):
    return AutoEncoder(
        encoder={"noise_std": 1.0, "mean_scale": 0.1, "logvar_scale": 0.01},
        decoder={"n_color_sh": 1},
        assets=ds.static_assets,
        image_height=48,
        image_width=48,
        cal={"identity_camera": "400000"},
        n_embs=16,
        n_diff_sh=2,
        learn_blur=True,
        uv_size=32,
        render={"max_pairs_per_tile": 128, "chunk": 16},
    )


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()
            if not isinstance(v, list)}


def test_rgca_forward_and_summary(ds, model):
    batch = next(ds.batches(2, 1))
    jb = _to_jnp(batch)
    params = model.init(jax.random.PRNGKey(0), jb)
    preds = model.apply(params, jb, train=True,
                        rngs={"noise": jax.random.PRNGKey(1)})
    assert preds["rgb"].shape == (2, 3, 48, 48)
    assert preds["alpha"].shape == (2, 1, 48, 48)
    assert preds["geom"].shape[0] == 2
    n_prims = 32 * 32
    assert preds["primpos"].shape == (2, n_prims, 3)
    assert bool(jnp.isfinite(preds["rgb"]).all())
    assert float(preds["alpha"].max()) > 0.1  # sphere visible

    # train-only branches
    assert "cos_weight" in preds and "learn_blur_weights" in preds

    summary = RGCASummary()(preds, jb)
    assert "render" in summary and "sh_slab" in summary


def test_rgca_train_step(ds, model):
    losses_cfg = {
        "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                   "mask_key": "image_weight", "weight": 10.0},
        "geom_l2": 0.4,
        "bound_primscale": 1e-2,
        "negcolor": 1e-2,
        "learn_blur": 0.001,
        "kl": 0.002,
    }
    loss_fn = ModularLoss(losses_cfg, assets=ds.static_assets)
    batch = next(ds.batches(2, 1))
    jb = _to_jnp(batch)
    params = model.init(jax.random.PRNGKey(0), jb)

    @jax.jit
    def step(params, batch, key, iteration):
        def loss(p):
            preds = model.apply(p, batch, train=True, rngs={"noise": key})
            total, ldict = loss_fn(preds, batch, iteration)
            return total, ldict

        (total, ldict), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return total, ldict, grads

    total, ldict, grads = step(params, jb, jax.random.PRNGKey(2),
                               jnp.asarray(100))
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    finite = all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert finite
    # decoder should receive gradient through the renderer
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dec_grads = [l for p, l in flat if "decoder" in str(p)]
    assert any(float(jnp.abs(l).sum()) > 0 for l in dec_grads)
