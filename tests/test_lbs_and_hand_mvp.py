"""LBS correctness + hand_mvp end-to-end on the synthetic skeleton."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.data.synthetic import SyntheticDataset, make_synthetic_lbs, \
    make_sphere_mesh
from goliath_tpu.utils.lbs import LBSModule, LinearBlendSkinning


@pytest.fixture(scope="module")
def lbs_setup():
    v, vi, vt, vti = make_sphere_mesh(6, 8, radius=100.0)
    model_json, cfg = make_synthetic_lbs(v, vi, vt, vti, n_joints=3)
    lbs = LinearBlendSkinning(model_json, cfg)
    return v, lbs


def test_lbs_zero_pose_identity(lbs_setup):
    v, lbs = lbs_setup
    zero = jnp.zeros((1, lbs.param_transform.nr_position_params))
    scales = jnp.zeros((1, lbs.param_transform.nr_scaling_params))
    out = lbs(zero, scales)
    np.testing.assert_allclose(np.asarray(out)[0], v, atol=1e-4)


def test_lbs_root_translation(lbs_setup):
    v, lbs = lbs_setup
    pose = jnp.zeros((1, lbs.param_transform.nr_position_params))
    pose = pose.at[0, 0].set(5.0).at[0, 1].set(-3.0)
    scales = jnp.zeros((1, lbs.param_transform.nr_scaling_params))
    out = lbs(pose, scales)
    np.testing.assert_allclose(
        np.asarray(out)[0], v + np.asarray([5.0, -3.0, 0.0]), atol=1e-4
    )


def test_lbs_root_rotation(lbs_setup):
    v, lbs = lbs_setup
    pose = jnp.zeros((1, lbs.param_transform.nr_position_params))
    pose = pose.at[0, 4].set(np.pi / 2)  # ry
    scales = jnp.zeros((1, lbs.param_transform.nr_scaling_params))
    out = np.asarray(lbs(pose, scales))[0]
    # root at origin: rotation about y by 90 degrees
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("y", np.pi / 2).as_matrix()
    np.testing.assert_allclose(out, v @ R.T, atol=1e-3)


def test_lbs_unpose_roundtrip(lbs_setup):
    v, lbs = lbs_setup
    rng = np.random.RandomState(0)
    pose = jnp.asarray(
        0.3 * rng.randn(1, lbs.param_transform.nr_position_params)
        .astype(np.float32)
    )
    scales = jnp.zeros((1, lbs.param_transform.nr_scaling_params))
    posed = lbs(pose, scales)
    unposed = lbs.unpose(pose, scales, posed)
    np.testing.assert_allclose(np.asarray(unposed)[0], v, atol=1e-2)


def test_lbs_module_pose_unpose():
    v, vi, vt, vti = make_sphere_mesh(6, 8)
    model_json, cfg = make_synthetic_lbs(v, vi, vt, vti)
    m = LBSModule(model_json, cfg, v[None], np.zeros((1, 3), np.float32),
                  [2.0, 2.0, 2.0])
    pose = jnp.zeros((1, 6 + 6))
    out = m.pose(jnp.zeros((1,) + v.shape), pose)
    np.testing.assert_allclose(np.asarray(out)[0], 2.0 * v, atol=1e-3)
    back = m.unpose(out, pose)
    np.testing.assert_allclose(np.asarray(back)[0], 0.0, atol=1e-3)


@pytest.fixture(scope="module")
def hand_setup():
    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=48, img_w=48,
                          uv_size=64, seed=1)
    from goliath_tpu.models.hand_mvp import AutoEncoder

    model = AutoEncoder(
        assets=ds.static_assets,
        image_height=48,
        image_width=48,
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        n_pose_dims=6,   # local pose dims of the synthetic 3-joint chain
        n_embs=8,
        volradius=400.0,
        primsize=(8, 8, 4),
        uv_size=64,
        prim_scale=12.0,
        global_scaling=1.0,
        raymarcher={"dt": 4.0, "max_steps": 64, "max_prims_per_tile": 32,
                    "chunk": 8},
    )
    return ds, model


def test_hand_mvp_forward(hand_setup):
    ds, model = hand_setup
    batch = next(ds.batches(2, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    params = model.init(jax.random.PRNGKey(0), jb)
    preds = model.apply(params, jb, train=True,
                        rngs={"noise": jax.random.PRNGKey(1)})
    assert preds["rgb"].shape == (2, 3, 48, 48)
    assert preds["alpha"].shape == (2, 1, 48, 48)
    n_prims = (64 // 8) ** 2
    assert preds["primpos"].shape == (2, n_prims, 3)
    assert preds["primrot"].shape == (2, n_prims, 3, 3)
    assert bool(jnp.isfinite(preds["rgb"]).all())
    assert float(preds["alpha"].max()) > 0.05  # hand visible


def test_hand_mvp_train_step(hand_setup):
    ds, model = hand_setup
    from goliath_tpu.losses import ModularLoss

    loss_fn = ModularLoss(
        {
            "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                       "mask_key": "image_mask", "weight": 1.0},
            "mask_l1": {"src_key": "alpha", "tgt_key": "image_mask",
                        "weight": 0.1},
            "learn_blur": 0.001,
        },
        assets=ds.static_assets,
    )
    batch = next(ds.batches(2, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    params = model.init(jax.random.PRNGKey(0), jb)

    @jax.jit
    def step(p, b, it):
        def loss(p):
            preds = model.apply(p, b, train=True,
                                rngs={"noise": jax.random.PRNGKey(3)})
            return loss_fn(preds, b, it)[0]

        return jax.value_and_grad(loss)(p)

    total, grads = step(params, jb, jnp.asarray(2000))
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    rgb_grads = [l for p, l in flat if "rgbdecoder" in str(p)]
    assert any(float(jnp.abs(l).sum()) > 0 for l in rgb_grads)
    trans_grads = [l for p, l in flat if "transdecoder" in str(p)]
    assert any(float(jnp.abs(l).sum()) > 0 for l in trans_grads)

    # warmup window (iteration < primposstart): deltas are forced to exactly
    # zero, which used to produce NaN grads through axisangle_to_matrix and
    # silently zero the whole encoder's gradient (ADVICE r1). Grads must be
    # finite AND the pose encoder must still learn.
    total_w, grads_w = step(params, jb, jnp.asarray(0))
    assert np.isfinite(float(total_w))
    leaves_w = jax.tree_util.tree_flatten_with_path(grads_w)[0]
    assert all(bool(jnp.isfinite(l).all()) for _, l in leaves_w)
    enc_grads = [l for p, l in leaves_w if "poseencoder" in str(p)]
    assert enc_grads and any(float(jnp.abs(l).sum()) > 0 for l in enc_grads)
