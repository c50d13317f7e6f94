"""mesh_vae end-to-end on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=48, img_w=48,
                          uv_size=64, seed=2)
    from goliath_tpu.models.mesh_vae import AutoEncoder

    model = AutoEncoder(
        encoder={"n_embs": 16, "enc_size": 64},
        encoder_face={"n_embs": 8, "enc_size": 32},
        decoder={
            "init_uv_size": 16,
            "n_pose_dims": 6,
            "n_pose_enc_channels": 8,
            "n_embs": 16,
            "n_embs_enc_channels": 8,
            "n_face_embs": 8,
            "n_init_channels": 16,
            "n_min_channels": 4,
        },
        decoder_view={"net_uv_size": 64, "n_init_ftrs": 4},
        shadow_net={"uv_size": 128, "shadow_size": 32, "n_dims": 8},
        upscale_net={"n_ftrs": 4},
        assets=ds.static_assets,
        pose_to_shadow={"n_pose_dims": 12, "uv_size": 128},
        renderer={"image_height": 48, "image_width": 48,
                  "max_faces_per_tile": 128, "chunk": 16},
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        pixel_cal={"image_height": 48, "image_width": 48, "ds_rate": 8},
        learn_blur=True,
        uv_size=64,
        tex_size=128,
    )
    return ds, model


def test_mesh_vae_forward(setup):
    ds, model = setup
    batch = next(ds.batches(2, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    params = model.init(jax.random.PRNGKey(0), jb)
    preds = model.apply(params, jb, train=True,
                        rngs={"noise": jax.random.PRNGKey(1)})
    assert preds["rgb"].shape == (2, 3, 48, 48)
    assert preds["tex_rec"].shape == (2, 3, 128, 128)
    assert preds["geom"].shape[0] == 2
    assert "shadow_map" in preds and "pose_shadow_map" in preds
    assert "embs_mu" in preds and "face_embs_mu" in preds
    assert bool(jnp.isfinite(preds["rgb"]).all())
    assert float(preds["alpha"].max()) > 0.3


def test_mesh_vae_train_step(setup):
    ds, model = setup
    from goliath_tpu.losses import ModularLoss

    loss_fn = ModularLoss(
        {
            "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                       "mask_key": "image_mask", "weight": 1.0},
            "geom_l2": {"weight": 0.1, "src_key": "geom",
                        "tgt_key": "registration_vertices"},
            "geom_lap": {"weight": 0.1, "src_key": "geom",
                         "tgt_key": "registration_vertices"},
            "kl": 0.002,
            "face_kl": 0.002,
            "pose_shadow_l2": 0.1,
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

    total, grads = step(params, jb, jnp.asarray(100))
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for mod in ["decoder", "encoder", "decoder_view", "upscale_net"]:
        g = [l for pth, l in flat
             if f"['{mod}']" in jax.tree_util.keystr(pth)]
        assert any(float(jnp.abs(l).sum()) > 0 for l in g), f"no grad in {mod}"
