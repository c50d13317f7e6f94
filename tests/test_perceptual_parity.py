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
