"""CLI-level smoke test: run_train -> run_test -> run_vis_relight on the
synthetic RGCA config, exercising the config/scripts plumbing end-to-end
(the reference's eval-as-test gate, ca_code/scripts/run_test.py:31-127).

Runs the script mains in-process (conftest already pins the CPU backend;
the container's sitecustomize would override JAX_PLATFORMS in a fresh
subprocess)."""

import os

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CFG = os.path.join(_ROOT, "configs", "rgca_synthetic.yml")


def test_cli_train_test_vis(tmp_path, monkeypatch, capsys):
    from goliath_tpu.config import load_config
    from goliath_tpu.scripts import run_test, run_train, run_vis_relight

    monkeypatch.chdir(tmp_path)
    overrides = [
        "train.n_max_iters=6",
        "train.ckpt_every_n_steps=3",
        "train.summary_every_n_steps=4",
        "train.log_every_n_steps=2",
        "test.n_test_frames=2",
    ]
    cfg = load_config(_CFG, overrides=overrides)

    run_train.main(cfg)
    run_dir = str(cfg.train.run_dir)
    ckpt_dir = str(cfg.train.ckpt_dir)
    assert os.path.exists(os.path.join(run_dir, "config.yml"))
    assert os.path.exists(os.path.join(ckpt_dir, "latest"))

    # resume path: a second run_train picks up the checkpoint and finishes
    # immediately (iteration >= n_max_iters)
    run_train.main(cfg)

    run_test.main(cfg)
    out = capsys.readouterr().out
    assert "psnr" in out
    vis_path = str(cfg.test.vis_path)
    pngs = [f for f in os.listdir(vis_path)] if os.path.isdir(vis_path) else []
    assert pngs, f"run_test produced no visual dumps in {vis_path}"

    cfg2 = load_config(_CFG, overrides=overrides + [
        "vis.n_frames=2", f"vis.output_dir={tmp_path}/vis_relight",
    ])
    run_vis_relight.main(cfg2)
    sweep = os.path.join(str(tmp_path), "vis_relight", "light_sweep")
    frames = sorted(os.listdir(sweep))
    assert len(frames) == 2
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(sweep, frames[0])))
    assert img.shape[:2] == (64, 64) and img.max() > 0
