"""hand_teacher_mvp end-to-end + shadow volume sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.data.synthetic import SyntheticDataset
from goliath_tpu.ops.mvp import shadow_at_points, splat_density_grid


def test_shadow_volume_blocks_light():
    # one opaque box at origin; a point behind it (from the light) is
    # shadowed, a point beside it is not
    primpos = jnp.asarray([[0.0, 0.0, 0.0]])
    primrot = jnp.eye(3)[None]
    primscale = jnp.asarray([[4.0, 4.0, 4.0]])  # half-extent 0.25
    alpha = jnp.ones((1, 4, 4, 4)) * 40.0
    density = splat_density_grid(primpos, primrot, primscale, alpha, 32)
    light = jnp.asarray([0.0, 0.0, -0.9])
    pts = jnp.asarray([
        [0.0, 0.0, 0.5],   # behind the box
        [0.8, 0.0, 0.5],   # off to the side
    ])
    s = np.asarray(shadow_at_points(density, pts, light, n_steps=48))
    assert s[0] > 0.9, f"occluded point not shadowed: {s}"
    assert s[1] < 0.1, f"unoccluded point shadowed: {s}"


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=32, img_w=32,
                          uv_size=32, n_lights=2, seed=5)
    from goliath_tpu.models.hand_teacher_mvp import AutoEncoder

    model = AutoEncoder(
        assets=ds.static_assets,
        image_height=32,
        image_width=32,
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        n_pose_dims=6,
        n_embs=8,
        volradius=400.0,
        primsize=(8, 8, 4),
        uv_size=32,
        prim_scale=12.0,
        global_scaling=1.0,
        raymarcher={"dt": 4.0, "max_steps": 48, "max_prims_per_tile": 16,
                    "chunk": 8},
    )
    return ds, model


def test_teacher_forward_and_grads(setup):
    ds, model = setup
    batch = next(ds.batches(1, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    params = model.init(jax.random.PRNGKey(0), jb)
    preds = model.apply(params, jb, train=True,
                        rngs={"noise": jax.random.PRNGKey(1)})
    assert preds["rgb"].shape == (1, 3, 32, 32)
    assert "primshadow" in preds and "texolat" in preds
    assert bool(jnp.isfinite(preds["rgb"]).all())

    from goliath_tpu.losses import ModularLoss

    loss_fn = ModularLoss(
        {"rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                    "mask_key": "image_mask", "weight": 1.0}},
        assets=ds.static_assets,
    )

    @jax.jit
    def step(p, b, it):
        def loss(p):
            preds = model.apply(p, b, train=True,
                                rngs={"noise": jax.random.PRNGKey(2)})
            return loss_fn(preds, b, it)[0]

        return jax.value_and_grad(loss)(p)

    total, grads = step(params, jb, jnp.asarray(2000))
    assert np.isfinite(float(total))
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    relight = [l for pth, l in flat
               if "relightdecoder" in jax.tree_util.keystr(pth)]
    assert any(float(jnp.abs(l).sum()) > 0 for l in relight)
    # geometry path is frozen (stop-gradient)
    geo = [l for pth, l in flat
           if "geomdecoder" in jax.tree_util.keystr(pth)]
    assert all(float(jnp.abs(l).sum()) == 0 for l in geo)
