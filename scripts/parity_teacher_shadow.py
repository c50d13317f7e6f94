#!/usr/bin/env python
"""Quality-level parity study for the hand_teacher deep-shadow deviation.

The reference computes per-(prim, voxel) deep shadows by rendering
unit-alpha prims from each light with scatter "shadow splatting"
(reference extensions/mvpraymarch/primsplatter.h:14-38, consumed by
ca_code/models/hand_teacher_mvp.py:271-377). The TPU design replaces that
with a global density grid + direct light->voxel integration
(ops/mvp.py:splat_density_grid / shadow_at_points — documented deviation).

This study trains the SAME tiny teacher twice on the same synthetic OLAT
fixture — (a) production grid shadows, (b) the brute-force per-prim oracle
(ops/mvp.py:shadow_at_points_exact, the reference quantity with no grid
resampling) — and compares:
  * primshadow (the deep-shadow quantity itself) between variants,
  * relit RGB renders between variants (PSNR),
  * each variant's render vs the lambert-lit target (PSNR),
on frames with the trained checkpoints. Results go to PARITY.md.

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/parity_teacher_shadow.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from goliath_tpu.data.synthetic import SyntheticDataset
from goliath_tpu.losses import ModularLoss
from goliath_tpu.models.hand_teacher_mvp import AutoEncoder
from goliath_tpu.optim import build_optimizer

N_STEPS = int(os.environ.get("PARITY_STEPS", 150))
IMG = 48
UV = 32


def build(ds, shadow_mode):
    return AutoEncoder(
        assets=ds.static_assets,
        image_height=IMG, image_width=IMG,
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        n_pose_dims=6, n_embs=8, volradius=400.0, primsize=(8, 8, 4),
        uv_size=UV, prim_scale=12.0, global_scaling=1.0,
        raymarcher={"dt": 4.0, "max_steps": 48, "max_prims_per_tile": 32,
                    "chunk": 8},
        shadow_mode=shadow_mode,
    )


def to_jb(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()
            if not isinstance(v, (list, str))}


def train_one(ds, shadow_mode):
    model = build(ds, shadow_mode)
    loss_fn = ModularLoss(
        {"rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                    "mask_key": "image_weight", "weight": 10.0}},
        assets=ds.static_assets,
    )
    jb0 = to_jb(next(ds.batches(2, 1)))
    params = model.init(jax.random.PRNGKey(0), jb0)
    optimizer = build_optimizer(
        {"class_name": "torch.optim.Adam", "lr": 1e-3}, params)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, s, b, it):
        def loss(p):
            preds = model.apply(p, b, train=True,
                                rngs={"noise": jax.random.PRNGKey(7)})
            return loss_fn(preds, b, it)[0]

        total, g = jax.value_and_grad(loss)(p)
        updates, s = optimizer.update(g, s, p)
        import optax

        return optax.apply_updates(p, updates), s, total

    t0 = time.time()
    it = iter(ds.batches(2, N_STEPS + 4))
    for i in range(N_STEPS):
        jb = to_jb(next(it))
        params, opt_state, total = step(params, opt_state, jb,
                                        jnp.asarray(i))
        if i % 25 == 0 or i == N_STEPS - 1:
            print(f"[{shadow_mode}] step {i} loss {float(total):.4f} "
                  f"(+{time.time() - t0:.0f}s)", flush=True)
    return model, params


def psnr(a, b, mask=None):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    if mask is not None:
        m = np.broadcast_to(np.asarray(mask, bool), a.shape)
        mse = ((a - b)[m] ** 2).mean()
    else:
        mse = ((a - b) ** 2).mean()
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-12))


def main():
    ds = SyntheticDataset(n_cams=4, n_frames=6, img_h=IMG, img_w=IMG,
                          uv_size=UV, n_lights=2, seed=11,
                          render_targets=True)
    results = {}
    for mode in ("grid", "exact"):
        results[mode] = train_one(ds, mode)

    # eval on fresh frames, both variants on identical batches
    model_g, params_g = results["grid"]
    model_e, params_e = results["exact"]
    rows = {"rgb_g": [], "rgb_e": [], "tgt": [], "sh_g": [], "sh_e": [],
            "mask": []}
    for i, batch in enumerate(ds.batches(1, 8)):
        jb = to_jb(batch)
        pg = model_g.apply(params_g, jb, train=False)
        pe = model_e.apply(params_e, jb, train=False)
        rows["rgb_g"].append(np.asarray(pg["rgb"]))
        rows["rgb_e"].append(np.asarray(pe["rgb"]))
        rows["sh_g"].append(np.asarray(pg["primshadow"]))
        rows["sh_e"].append(np.asarray(pe["primshadow"]))
        rows["tgt"].append(np.asarray(jb["image"]))
        rows["mask"].append(np.asarray(jb["image_weight"]))
    cat = {k: np.concatenate(v) for k, v in rows.items()}

    sh_mae = np.abs(cat["sh_g"] - cat["sh_e"]).mean()
    sh_q95 = np.quantile(np.abs(cat["sh_g"] - cat["sh_e"]), 0.95)
    p_cross = psnr(cat["rgb_g"], cat["rgb_e"], cat["mask"])
    p_g = psnr(cat["rgb_g"], cat["tgt"], cat["mask"])
    p_e = psnr(cat["rgb_e"], cat["tgt"], cat["mask"])

    print(f"primshadow MAE {sh_mae:.4f} q95 {sh_q95:.4f}")
    print(f"PSNR grid-vs-exact {p_cross:.2f} dB | grid-vs-target "
          f"{p_g:.2f} dB | exact-vs-target {p_e:.2f} dB")

    row = (
        f"| hand_teacher deep shadows | density grid (G=64) vs per-prim "
        f"brute-force oracle, {N_STEPS}-step trainings on the OLAT "
        f"fixture ({IMG}px/uv{UV}) | primshadow MAE {sh_mae:.4f} "
        f"(q95 {sh_q95:.4f}) | relit PSNR grid-vs-exact {p_cross:.2f} dB; "
        f"vs target: grid {p_g:.2f} / exact {p_e:.2f} dB |\n"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                "# Deviation parity studies\n\n"
                "Quality-level evidence that documented TPU-first "
                "deviations match the reference quantity (op-level "
                "oracles live in tests/).\n\n"
                "| Deviation | Protocol | Quantity agreement | "
                "Output agreement |\n|---|---|---|---|\n")
    with open(path, "a") as f:
        f.write(row)
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
