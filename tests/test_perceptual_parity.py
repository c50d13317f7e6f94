"""Perceptual-net parity: the JAX VGG19/EffNet-B0 feature extractors must
reproduce a torch forward through torchvision-layout weights exported by
scripts/export_perceptual_npz.py (reference nets ca_code/loss/{vgg,effnet}.py).
"""

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_exporter():
    spec = importlib.util.spec_from_file_location(
        "export_perceptual_npz",
        os.path.join(_ROOT, "scripts", "export_perceptual_npz.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_exporter_selftest(tmp_path):
    mod = _load_exporter()
    saved = {k: os.environ.get(k)
             for k in ("GOLIATH_TPU_VGG19_NPZ", "GOLIATH_TPU_EFFNET_NPZ")}
    try:
        mod.selftest(str(tmp_path))
    finally:
        from goliath_tpu.losses import perceptual as P

        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        P._vgg19_weights.cache_clear()
        P._effnet_weights.cache_clear()


def test_real_weights_path_differs_from_random_fallback(tmp_path):
    """VERDICT r3 item 6: loading an exported npz must take the
    real-weights path and produce features that DIFFER from the
    fixed-seed random fallback (guards against silently ignoring the
    npz and benchmarking/training on random features)."""
    import numpy as np
    import jax.numpy as jnp

    mod = _load_exporter()
    from goliath_tpu.losses import perceptual as P

    vgg = mod.build_torch_vgg19_features().eval()
    npz = tmp_path / "vgg19.npz"
    np.savez(npz, **mod.export_vgg19(vgg.state_dict()))

    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 255
    )
    xn = P._normalize_imagenet(x)

    saved = os.environ.get("GOLIATH_TPU_VGG19_NPZ")
    saved_allow = os.environ.get("GOLIATH_TPU_ALLOW_RANDOM_FEATURES")
    try:
        os.environ["GOLIATH_TPU_VGG19_NPZ"] = str(npz)
        P._vgg19_weights.cache_clear()
        real = [np.asarray(f) for f in P._vgg19_features(xn)]

        os.environ["GOLIATH_TPU_VGG19_NPZ"] = ""
        os.environ["GOLIATH_TPU_ALLOW_RANDOM_FEATURES"] = "1"
        P._vgg19_weights.cache_clear()
        rand = [np.asarray(f) for f in P._vgg19_features(xn)]

        # every slice must differ materially between loaded and fallback
        for i, (a, b) in enumerate(zip(real, rand)):
            rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
            assert rel > 1e-2, f"slice {i} identical to random fallback"

        # and with no npz AND no waiver, the loss must refuse to run
        os.environ.pop("GOLIATH_TPU_ALLOW_RANDOM_FEATURES", None)
        P._vgg19_weights.cache_clear()
        with pytest.raises(RuntimeError, match="pretrained weights"):
            P._vgg19_weights()
    finally:
        if saved is None:
            os.environ.pop("GOLIATH_TPU_VGG19_NPZ", None)
        else:
            os.environ["GOLIATH_TPU_VGG19_NPZ"] = saved
        if saved_allow is None:
            os.environ.pop("GOLIATH_TPU_ALLOW_RANDOM_FEATURES", None)
        else:
            os.environ["GOLIATH_TPU_ALLOW_RANDOM_FEATURES"] = saved_allow
        P._vgg19_weights.cache_clear()
