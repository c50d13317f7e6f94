"""mesh_vae_drivable end-to-end on the synthetic fixture."""

import jax
import jax.numpy as jnp
import numpy as np


def test_drivable_forward_and_grad():
    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.models.mesh_vae_drivable import AutoEncoder

    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=32, img_w=32,
                          uv_size=64, seed=6)
    n_verts = len(ds.static_assets.topology.v)
    model = AutoEncoder(
        encoder={"n_embs": 16, "enc_size": 64},
        encoder_face={"n_embs": 8, "uv_size": 32,
                      "n_vert_in": 3 * 16},
        decoder_face={"n_latent": 8, "n_vert_out": 3 * 16,
                      "tex_out_shp": (32, 32)},
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
        renderer={"image_height": 32, "image_width": 32,
                  "max_faces_per_tile": 128, "chunk": 16},
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        learn_blur=True,
        uv_size=64,
        tex_size=128,
    )

    batch = next(ds.batches(1, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    # drivable input keys
    jb["lbs_motion"] = jb.pop("pose")
    jb["geom"] = jb.pop("registration_vertices")
    jb["ao"] = jb.pop("ambient_occlusion")
    jb["face_embs"] = jnp.asarray(
        np.random.RandomState(0).randn(1, 8).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), jb)
    preds = model.apply(params, jb, train=True,
                        rngs={"noise": jax.random.PRNGKey(1)})
    assert preds["rgb"].shape == (1, 3, 32, 32)
    assert "face_embs_mu" in preds and "face_dec_preds" in preds
    assert bool(jnp.isfinite(preds["rgb"]).all())

    def loss(p):
        preds = model.apply(p, jb, train=True,
                            rngs={"noise": jax.random.PRNGKey(2)})
        return jnp.mean(jnp.abs(preds["rgb"] - jb["image"]))

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    enc = [l for pth, l in flat
           if "encoder_face" in jax.tree_util.keystr(pth)]
    assert any(float(jnp.abs(l).sum()) > 0 for l in enc)
    # frozen face decoder gets no gradient
    fd = [l for pth, l in flat
          if "decoder_face" in jax.tree_util.keystr(pth)]
    assert all(float(jnp.abs(l).sum()) == 0 for l in fd)
