"""Quality-floor regression: RGCA trained briefly on the rendered-target
synthetic capture must clear a PSNR floor under the run_test protocol
(psnr injected, cal/blur disabled, held-out ring cameras). Guards the whole
train->eval pipeline against silent quality regressions; the full-scale
on-chip run is recorded in QUALITY.md."""

import numpy as np
import pytest


@pytest.mark.slow
def test_rgca_synthetic_quality_floor(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from goliath_tpu.data.pipeline import DataLoader
    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.losses import ModularLoss
    from goliath_tpu.models.rgca import AutoEncoder

    ds = SyntheticDataset(n_cams=3, n_frames=4, img_h=64, img_w=64,
                          uv_size=32, seed=0, render_targets=True)
    model = AutoEncoder(
        encoder={"noise_std": 1.0}, decoder={"n_color_sh": 1},
        assets=ds.static_assets, image_height=64, image_width=64,
        cal=None, n_embs=16, n_diff_sh=2, learn_blur=False, uv_size=32,
        render={"max_pairs_per_tile": 128, "chunk": 16},
    )
    loss_fn = ModularLoss(
        {
            "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                       "mask_key": "image_weight", "weight": 10.0},
            "geom_l2": 0.4,
            "kl": 0.002,
        },
        assets=ds.static_assets,
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=0)
    it = iter(loader)
    b0 = next(it)
    jb = {k: jnp.asarray(v) for k, v in b0.items() if not isinstance(v, list)}
    params = model.init(jax.random.PRNGKey(0), jb)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss(p):
            preds = model.apply(p, batch, train=True, rngs={"noise": rng})
            return loss_fn(preds, batch, 0)[0]

        total, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    rng = jax.random.PRNGKey(1)
    batch = jb
    for i in range(180):
        rng, k = jax.random.split(rng)
        params, opt_state, total = step(params, opt_state, batch, k)
        if i % 10 == 9:
            nb = next(it)
            batch = {k2: jnp.asarray(v) for k2, v in nb.items()
                     if not isinstance(v, list)}
    assert np.isfinite(float(total))

    # eval protocol: held-out viewpoints (6-cam ring; odd cameras differ
    # from the 3-cam train ring), cal/blur off, psnr metric
    ds_eval = SyntheticDataset(n_cams=6, n_frames=4, img_h=64, img_w=64,
                               uv_size=32, seed=0, render_targets=True)
    psnrs = []
    for cam in (1, 3, 5):
        s = ds_eval.get(1, cam)
        eb = {k2: jnp.asarray(np.asarray(v)[None]) for k2, v in s.items()
              if not isinstance(v, (str, bytes))}
        preds = model.apply(params, eb, train=False)
        err = np.asarray(preds["rgb"] - eb["image"])
        mse = float((err ** 2).mean())
        psnrs.append(10 * np.log10(1.0 / mse))
    mean_psnr = float(np.mean(psnrs))
    # untrained model scores ~10-12 dB on this fixture; 180 steps measured
    # 18.06 dB on CPU (r5) — floor at 17.0 leaves ~1 dB for platform noise
    assert mean_psnr > 17.0, f"held-out PSNR regressed: {mean_psnr:.2f} dB"
