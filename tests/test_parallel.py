"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np


def test_sharded_train_step_matches_single_device():
    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.losses import ModularLoss
    from goliath_tpu.models.rgca import AutoEncoder
    from goliath_tpu.optim import build_optimizer
    from goliath_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_batch,
    )
    from goliath_tpu.parallel.sharding import replicate

    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"

    ds = SyntheticDataset(n_cams=4, n_frames=2, img_h=32, img_w=32,
                          uv_size=32, seed=7)
    model = AutoEncoder(
        encoder={"noise_std": 0.0}, decoder={"n_color_sh": 1},
        assets=ds.static_assets, image_height=32, image_width=32,
        cal=None, n_embs=8, n_diff_sh=2, learn_blur=False, uv_size=32,
        render={"max_pairs_per_tile": 64, "chunk": 16},
    )
    loss_fn = ModularLoss(
        {"rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                    "mask_key": "image_weight", "weight": 1.0}},
        assets=ds.static_assets,
    )
    batch = next(ds.batches(8, 1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not isinstance(v, list)}
    params = model.init(jax.random.PRNGKey(0), jb)
    optimizer = build_optimizer(
        {"class_name": "goliath_tpu.optim.Adam", "lr": 1e-3}, params)
    opt_state = optimizer.init(params)

    # single-device step
    def step(p, o, b, rng, it):
        def loss(p):
            preds = model.apply(p, b, train=True, rngs={"noise": rng})
            return loss_fn(preds, b, it)[0]

        total, grads = jax.value_and_grad(loss)(p)
        updates, o2 = optimizer.update(grads, o, p)
        import optax

        return optax.apply_updates(p, updates), o2, total

    rng = jax.random.PRNGKey(1)
    it = jnp.asarray(0)
    p1, _, t1 = jax.jit(step)(params, opt_state, jb, rng, it)

    def grads_of(p, b, rng):
        def loss(p):
            preds = model.apply(p, b, train=True, rngs={"noise": rng})
            return loss_fn(preds, b, it)[0]

        return jax.grad(loss)(p)

    g1 = jax.jit(grads_of)(params, jb, rng)

    # 8-way data-parallel step
    mesh = make_mesh(8)
    sp = replicate(params, mesh)
    so = replicate(opt_state, mesh)
    sb = shard_batch(jb, mesh)
    sharded = make_sharded_train_step(model, loss_fn, optimizer, mesh,
                                      donate=False)
    p2, _, t2, _ = sharded(sp, so, sb, replicate(rng, mesh),
                           replicate(it, mesh))

    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-4)

    # gradient parity (Adam at step 1 amplifies reduction-order noise into
    # +-lr sign flips, so param-level comparison would be meaningless)
    from jax.sharding import NamedSharding, PartitionSpec as P

    g2 = jax.jit(
        grads_of,
        in_shardings=(NamedSharding(mesh, P()),
                      {k: NamedSharding(mesh, P("data"))
                       if v.ndim >= 1 else NamedSharding(mesh, P())
                       for k, v in sb.items()},
                      NamedSharding(mesh, P())),
    )(sp, sb, replicate(rng, mesh))
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(l1, l2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)
    # updated params stay finite and close in norm
    n1 = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(p1))
    n2 = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(p2))
    np.testing.assert_allclose(n1, n2, rtol=1e-3)
