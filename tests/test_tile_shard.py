"""Tile-axis (pixel) sharding of the gsplat render over the CPU mesh:
outputs and gradients must match the single-device render()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.ops import gsplat
from goliath_tpu.parallel.sharding import make_mesh
from goliath_tpu.parallel.tile_shard import render_tile_sharded


@pytest.fixture(scope="module")
def scene():
    rs = np.random.RandomState(11)
    B, N = 2, 250
    H, W = 64, 32
    K = np.asarray([[[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]] * B,
                   np.float32)
    Rt = np.asarray([np.eye(4)[:3]] * B, np.float32)
    pos = rs.uniform(-2, 2, (B, N, 3)).astype(np.float32)
    pos[..., 2] = rs.uniform(3.0, 9.0, (B, N))  # well-separated depths
    quat = rs.standard_normal((B, N, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    scale = np.exp(rs.standard_normal((B, N, 3)) * 0.3).astype(
        np.float32) * 0.05
    op = rs.uniform(0.2, 0.9, (B, N, 1)).astype(np.float32)
    col = rs.uniform(0, 1, (B, N, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (K, Rt, pos, quat, scale, op, col))


def test_tile_sharded_outputs_and_grads_match_single(scene):
    """Outputs AND grads of the band-sharded render vs single-device, in
    one value_and_grad compile per path (CPU compiles dominate runtime)."""
    K, Rt, pos, quat, scale, op, col = scene
    H, W = 64, 32
    kw = dict(tile_size=16, max_pairs_per_tile=256, chunk=32,
              pair_budget_mult=8)
    mesh = make_mesh(4, axis_name="tile")

    tgt = jnp.ones((2, 3, H, W)) * 0.4

    def loss_single(pos, scale, op, col):
        r = gsplat.render(W, H, K, Rt, pos, quat, scale, op, col, **kw)
        return ((r["render"] - tgt) ** 2).mean() + r["alpha"].mean(), r

    def loss_sharded(pos, scale, op, col):
        r = render_tile_sharded(
            mesh, "tile", W, H, K, Rt, pos, quat, scale, op, col, **kw)
        return ((r["render"] - tgt) ** 2).mean() + r["alpha"].mean(), r

    (v1, r1), g1 = jax.value_and_grad(
        loss_single, argnums=(0, 1, 2, 3), has_aux=True)(
        pos, scale, op, col)
    (v2, r2), g2 = jax.value_and_grad(
        loss_sharded, argnums=(0, 1, 2, 3), has_aux=True)(
        pos, scale, op, col)
    for key in ("render", "alpha", "depth", "final_T"):
        np.testing.assert_allclose(
            np.asarray(r2[key]), np.asarray(r1[key]), atol=2e-5,
            err_msg=key)
    # per-band pair budgets may truncate a handful of far pairs the global
    # budget keeps (documented render_tile_sharded semantics) — value and
    # grads agree to ~1e-4
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    for a, b, name in zip(g1, g2, ("pos", "scale", "op", "col")):
        a, b = np.asarray(a), np.asarray(b)
        s = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / s, b / s, atol=1e-4, err_msg=name)


def test_rgca_model_with_tile_sharded_render():
    """RGCA forward with render.tile_shard_* routed through shard_map must
    match the single-device model (the SURVEY 2.8 pixels-axis scale-out,
    wired at the model config level)."""
    import jax.numpy as jnp

    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.models.rgca import AutoEncoder

    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=48, img_w=48,
                          uv_size=32, seed=7)
    mesh = make_mesh(4, axis_name="tile")
    common = dict(
        encoder={"noise_std": 0.0}, decoder={"n_color_sh": 1},
        assets=ds.static_assets, image_height=48, image_width=48,
        cal=None, n_embs=8, n_diff_sh=2, learn_blur=False, uv_size=32,
    )
    m_ref = AutoEncoder(
        render={"max_pairs_per_tile": 64, "chunk": 16}, **common)
    m_sh = AutoEncoder(
        render={"max_pairs_per_tile": 64, "chunk": 16,
                "tile_shard_mesh": mesh, "tile_shard_axis": "tile"},
        **common)
    batch = next(ds.batches(2, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    params = m_ref.init(jax.random.PRNGKey(0), jb)
    out_ref = m_ref.apply(params, jb, train=False)
    out_sh = m_sh.apply(params, jb, train=False)
    np.testing.assert_allclose(np.asarray(out_sh["rgb"]),
                               np.asarray(out_ref["rgb"]), atol=3e-5)


def test_prim_sharded_render_matches_single(scene):
    """Depth-slab (primitive-axis) sharding: 4 chips compositing N/4-prim
    slabs folded with the over-operator must match the single-device
    render, including gradients through the slab gather + all_gather."""
    from goliath_tpu.parallel.tile_shard import render_prim_sharded

    K, Rt, pos, quat, scale, op, col = scene
    H, W = 64, 32
    kw = dict(tile_size=16, max_pairs_per_tile=256, chunk=32,
              pair_budget_mult=8)
    mesh = make_mesh(4, axis_name="slab")

    def loss_single(pos, op, col):
        r = gsplat.render(W, H, K, Rt, pos, quat, scale, op, col, **kw)
        return (r["render"] ** 2).mean() + r["alpha"].mean(), r

    def loss_sharded(pos, op, col):
        r = render_prim_sharded(
            mesh, "slab", W, H, K, Rt, pos, quat, scale, op, col, **kw)
        return (r["render"] ** 2).mean() + r["alpha"].mean(), r

    (v1, r1), g1 = jax.value_and_grad(
        loss_single, argnums=(0, 1, 2), has_aux=True)(pos, op, col)
    (v2, r2), g2 = jax.value_and_grad(
        loss_sharded, argnums=(0, 1, 2), has_aux=True)(pos, op, col)
    for key in ("render", "alpha", "depth", "final_T"):
        np.testing.assert_allclose(
            np.asarray(r2[key]), np.asarray(r1[key]), atol=5e-5,
            err_msg=key)
    np.testing.assert_allclose(float(v1), float(v2), rtol=2e-4)
    for a, b, name in zip(g1, g2, ("pos", "op", "col")):
        a, b = np.asarray(a), np.asarray(b)
        s = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / s, b / s, atol=2e-4, err_msg=name)


def test_composite_over_associative():
    rs = np.random.RandomState(0)
    c = [jnp.asarray(rs.uniform(0, 1, (2, 3, 4, 4)).astype(np.float32))
         for _ in range(3)]
    t = [jnp.asarray(rs.uniform(0.1, 1, (2, 4, 4)).astype(np.float32))
         for _ in range(3)]
    from goliath_tpu.parallel.tile_shard import composite_over

    ab_c = composite_over(composite_over((c[0], t[0]), (c[1], t[1])),
                          (c[2], t[2]))
    bc_c = composite_over((c[0], t[0]),
                          composite_over((c[1], t[1]), (c[2], t[2])))
    np.testing.assert_allclose(np.asarray(ab_c[0]), np.asarray(bc_c[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ab_c[1]), np.asarray(bc_c[1]),
                               rtol=1e-6)
