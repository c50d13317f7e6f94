"""URHand end-to-end on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=48, img_w=48,
                          uv_size=32, n_lights=2, seed=4)
    from goliath_tpu.models.urhand import AutoEncoder

    model = AutoEncoder(
        assets=ds.static_assets,
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        renderer={"image_height": 48, "image_width": 48,
                  "max_faces_per_tile": 128, "chunk": 16},
        relight={
            "uv_size": 32,
            "init_uv_size": 8,
            "pose_enc_dims": 12,
            "disp_enc_dims": (8, 8, 8),
            "disp_scale": 0.3,
            "init_channels": 16,
        },
        global_scaling=1.0,
        shadow_size=32,
    )
    return ds, model


def _batch(ds, b=1):
    batch = next(ds.batches(b, 1))
    return {k: jnp.asarray(v) for k, v in batch.items()
            if not isinstance(v, list)}


def test_urhand_forward(setup):
    ds, model = setup
    jb = _batch(ds, 1)
    params = model.init(jax.random.PRNGKey(0), jb)
    preds = model.apply(params, jb, train=False)
    assert preds["rgb"].shape == (1, 3, 48, 48)
    assert preds["rendered_phys_rgb"].shape == (1, 3, 48, 48)
    assert preds["tex_rec"].shape == (1, 3, 32, 32)
    assert preds["roughness"].shape == (1, 1, 32, 32)
    r = np.asarray(preds["roughness"])
    assert r.min() >= 0.3 - 1e-5 and r.max() <= 0.8 + 1e-5
    assert bool(jnp.isfinite(preds["rgb"]).all())
    assert float(preds["alpha"].max()) > 0.3


def test_urhand_train_step(setup):
    ds, model = setup
    from goliath_tpu.losses import ModularLoss

    loss_fn = ModularLoss(
        {
            "rgb_l1_focus": {"weight": 1.0, "self_mask": True},
            "rgb_l1_phys": {"weight": 0.1, "self_mask": True},
            "list_l1_reg": {"weight": 1e-4, "key": "interm_features2reg"},
        },
        assets=ds.static_assets,
    )
    jb = _batch(ds, 1)
    params = model.init(jax.random.PRNGKey(0), jb)

    @jax.jit
    def step(p, b, it):
        def loss(p):
            preds = model.apply(p, b, train=True)
            preds["rendered_rgb"] = preds["rgb"]
            preds["rendered_mask"] = preds["alpha"]
            return loss_fn(preds, b, it)[0]

        return jax.value_and_grad(loss)(p)

    total, grads = step(params, jb, jnp.asarray(100))
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for mod in ["geo_refiner", "featenc", "joint_conv_block_tex"]:
        g = [l for pth, l in flat
             if f"['{mod}']" in jax.tree_util.keystr(pth)]
        assert any(float(jnp.abs(l).sum()) > 0 for l in g), f"no grad in {mod}"
