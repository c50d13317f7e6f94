"""Tests for the modular loss system."""

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.losses import (
    CyclicWeightSchedule,
    ModularLoss,
    MonotonicWeightSchedule,
    StepWeightSchedule,
    get_loss,
    kl_loss,
)


class _Assets:
    """Minimal assets stand-in with topology neighbours."""

    class topology:
        nbs_idxs = np.tile(np.arange(5)[:, None], (1, 3))
        nbs_weights = np.full((5, 3), -1.0 / 3, np.float32)

    def __getitem__(self, k):
        return getattr(self, k)


def test_schedules():
    s = StepWeightSchedule(10, 20, 2.0)
    assert float(s(5)) == 0.0
    assert float(s(15)) == 2.0
    assert float(s(25)) == 0.0
    m = MonotonicWeightSchedule(0, 10, 1.0, 0.0)
    assert abs(float(m(5)) - 0.5) < 1e-6
    assert float(m(100)) == 0.0
    c = CyclicWeightSchedule(10, 0.0, 1.0)
    assert abs(float(c(5)) - 0.5) < 1e-6
    assert float(c(15)) == 1.0


def test_modular_loss_rgca_config(rng):
    losses_cfg = {
        "rgb_l1": {
            "src_key": "rgb", "tgt_key": "image",
            "mask_key": "image_weight", "weight": 10.0,
        },
        "geom_l2": 0.4,
        "l2_reg": {
            "key": "spec_dnml",
            "schedule": {
                "class_name": "ca_code.loss.MonotonicWeightSchedule",
                "start": 0, "end": 10000,
                "init_value": 1.0, "target_value": 0.0,
            },
        },
        "backlit_reg": {
            "schedule": {
                "class_name": "ca_code.loss.StepWeightSchedule",
                "start": 500000, "end": 600000, "value": 1.0,
            },
        },
        "bound_primscale": 1e-2,
        "negcolor": 1e-2,
        "kl": 0.002,
    }
    loss_fn = ModularLoss(losses_cfg, assets=_Assets())
    B, N = 2, 5
    preds = {
        "rgb": jnp.asarray(rng.rand(B, 3, 8, 8).astype(np.float32)),
        "geom": jnp.asarray(rng.randn(B, N, 3).astype(np.float32)),
        "spec_dnml": jnp.asarray(rng.randn(B, N, 3).astype(np.float32)),
        "color_rand": jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        "cos_weight": jnp.asarray(rng.randn(B, N, 1).astype(np.float32)),
        "primscale_preclip": jnp.asarray(
            rng.rand(B, N, 3).astype(np.float32) * 5 + 0.2),
        "diff_color": jnp.asarray(rng.randn(B, N, 3).astype(np.float32)),
        "embs_mu": jnp.asarray(rng.randn(B, 4).astype(np.float32)),
        "embs_logvar": jnp.asarray(rng.randn(B, 4).astype(np.float32)),
    }
    targets = {
        "image": jnp.asarray(rng.rand(B, 3, 8, 8).astype(np.float32)),
        "image_weight": jnp.ones((B, 1, 8, 8), jnp.float32),
        "registration_vertices": jnp.asarray(
            rng.randn(B, N, 3).astype(np.float32)),
    }
    total, ldict = loss_fn(preds, targets, iteration=100)
    assert np.isfinite(float(total))
    assert "loss_rgb_l1" in ldict and "loss_kl" in ldict
    # backlit_reg schedule is 0 before iter 500k
    total2, _ = loss_fn(preds, targets, iteration=550000)
    assert float(total2) != float(total)

    # jit-compatible with traced iteration
    jt = jax.jit(lambda it: loss_fn(preds, targets, iteration=it)[0])
    assert np.isfinite(float(jt(jnp.asarray(100))))


def test_psnr_sanity():
    fn = get_loss("psnr", init_kwargs={"src_key": "rgb", "tgt_key": "image",
                                       "mask_key": "none"})
    img = jnp.ones((1, 3, 8, 8)) * 0.5
    noisy = img + 0.1
    val = fn({"rgb": noisy}, {"image": img})
    assert abs(float(val) - 20.0) < 1e-3  # psnr of constant 0.1 err = 20dB


def test_laplacian_losses():
    a = _Assets()
    fn = get_loss("geom_lap", a)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 3).astype(np.float32))
    val = fn({"geom": x}, {"registration_vertices": x})
    assert float(val) == 0.0


def test_perceptual_losses_run(rng):
    vgg = get_loss("vgg", None, {"src_key": "rgb"})
    x = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32) * 255)
    y = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32) * 255)
    mask = jnp.ones((1, 1, 64, 64), jnp.float32)
    v = vgg({"rgb": x}, {"image": y, "image_mask": mask})
    assert np.isfinite(float(v)) and float(v) > 0
    same = vgg({"rgb": x}, {"image": x, "image_mask": mask})
    assert float(same) < 1e-6

    eff = get_loss("effnet", None, {"src_key": "rgb"})
    v2 = eff({"rgb": x}, {"image": y, "image_mask": mask})
    assert np.isfinite(float(v2)) and float(v2) > 0


def test_perceptual_requires_weights_or_explicit_optin(monkeypatch):
    """Missing pretrained npz must be a hard error unless random features
    are explicitly allowed (round-2 verdict item 8)."""
    import pytest

    from goliath_tpu.losses import perceptual as P

    monkeypatch.delenv("GOLIATH_TPU_ALLOW_RANDOM_FEATURES", raising=False)
    monkeypatch.setenv("GOLIATH_TPU_VGG19_NPZ", "")
    monkeypatch.setenv("GOLIATH_TPU_EFFNET_NPZ", "")
    P._vgg19_weights.cache_clear()
    P._effnet_weights.cache_clear()
    with pytest.raises(RuntimeError, match="VGG19"):
        P._vgg19_weights()
    with pytest.raises(RuntimeError, match="EfficientNet"):
        P._effnet_weights()
    # config-level opt-in flips the env var
    P.VGGLoss(None, src_key="rgb", allow_random_features=True)
    assert P._vgg19_weights() is not None
    P._vgg19_weights.cache_clear()
    P._effnet_weights.cache_clear()
