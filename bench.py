"""Benchmark: RGCA training step time on the attached TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation (BASELINE.md): the reference trains RGCA for 800,000
iterations at batch 4 within a 7-day single-A100 SLURM allowance
(config/rgca_example.yml + scripts/train_bulk/slurm_heads.sh), i.e. it must
sustain >= 800000 / (7*24*3600) = 1.32 steps/s. vs_baseline is
measured_steps_per_sec / 1.32 — >1.0 means faster than the reference's
implied A100 budget.

Scale knobs via env: GOLIATH_BENCH_{IMG_H,IMG_W,UV,BATCH,STEPS}. Defaults
run the full reference geometry (2048x1334 render, 1024^2 = 1M gaussians,
batch 4) and automatically halve batch/resolution on OOM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 800_000 / (7 * 24 * 3600)  # 1.3228


def build(img_h: int, img_w: int, uv: int, batch: int):
    import jax
    import jax.numpy as jnp

    import goliath_tpu

    goliath_tpu.enable_compilation_cache()

    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.losses import ModularLoss
    from goliath_tpu.models.rgca import AutoEncoder
    from goliath_tpu.optim import build_optimizer

    ds = SyntheticDataset(
        n_cams=2, n_frames=max(batch, 2), img_h=img_h, img_w=img_w,
        uv_size=uv, seed=0,
    )
    model = AutoEncoder(
        encoder={"noise_std": 1.0},
        decoder={"n_color_sh": 3},
        assets=ds.static_assets,
        image_height=img_h, image_width=img_w,
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        n_embs=256, n_diff_sh=8, learn_blur=True, uv_size=uv,
        remat_decoder=os.environ.get("GOLIATH_RGCA_REMAT", "1") == "1",
        render={
            "max_pairs_per_tile": int(os.environ.get("GOLIATH_BENCH_MPPT", 1024)),
            "chunk": int(os.environ.get("GOLIATH_BENCH_CHUNK", 256)),
            "pallas_inner": int(os.environ.get("GOLIATH_BENCH_INNER", 64)),
            "tile_size": int(os.environ.get("GOLIATH_BENCH_TS", 32)),
            "pair_budget_mult": float(os.environ.get("GOLIATH_BENCH_PBM", 2)),
            "use_pallas": os.environ.get("GOLIATH_BENCH_PALLAS", "1") == "1",
        },
    )
    loss_fn = ModularLoss(
        {
            "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                       "mask_key": "image_weight", "weight": 10.0},
            "rgb_ssim": {"src_key": "rgb", "tgt_key": "image",
                         "mask_key": "image_weight", "weight": 0.2},
            "geom_l2": 0.4,
            "bound_primscale": 1e-2,
            "negcolor": 1e-2,
            "learn_blur": 0.001,
            "kl": 0.002,
        },
        assets=ds.static_assets,
    )
    batch_np = next(ds.batches(batch, 1))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()
          if not isinstance(v, (list, str))}
    params = model.init(jax.random.PRNGKey(0), jb)
    optimizer = build_optimizer(
        {"class_name": "torch.optim.Adam", "lr": 5e-4}, params
    )
    opt_state = optimizer.init(params)
    return model, loss_fn, optimizer, params, opt_state, jb


def build_urhand(img_h: int, img_w: int, uv: int, batch: int):
    """URHand at reference scale (config/urhand_mesh_example.yml: uv 1024,
    2048x1334, batch 1, 400k iters / 7 days => 0.661 steps/s baseline)."""
    import jax
    import jax.numpy as jnp

    import goliath_tpu

    goliath_tpu.enable_compilation_cache()

    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.losses import ModularLoss
    from goliath_tpu.models.urhand import AutoEncoder
    from goliath_tpu.optim import build_optimizer

    ds = SyntheticDataset(
        n_cams=2, n_frames=max(batch, 2), img_h=img_h, img_w=img_w,
        uv_size=uv, n_lights=5, seed=0,
    )
    model = AutoEncoder(
        assets=ds.static_assets,
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        renderer={"image_height": img_h, "image_width": img_w},
        relight={
            "uv_size": uv,
            "init_uv_size": 32,
            "pose_enc_dims": 12,
            "disp_enc_dims": (64,) * 6,
            "disp_scale": 3.0,
            "init_channels": 128,
            # ablation knob for profiling, e.g. '{"shadow": false}'
            **json.loads(os.environ.get("GOLIATH_URHAND_RELIGHT", "{}")),
        },
        global_scaling=1.0,
        shadow_size=min(uv, 512),
    )
    loss_fn = ModularLoss(
        {
            "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                       "mask_key": "image_weight", "weight": 1.0},
            "rgb_ssim": {"src_key": "rgb", "tgt_key": "image",
                         "mask_key": "image_weight", "weight": 0.2},
        },
        assets=ds.static_assets,
    )
    batch_np = next(ds.batches(batch, 1))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()
          if not isinstance(v, (list, str))}
    params = model.init(jax.random.PRNGKey(0), jb)
    optimizer = build_optimizer(
        {"class_name": "torch.optim.Adam", "lr": 1e-4}, params
    )
    opt_state = optimizer.init(params)
    return model, loss_fn, optimizer, params, opt_state, jb


def build_mesh_vae(img_h: int, img_w: int, uv: int, batch: int):
    """mesh_vae at reference scale (configs/mesh_vae.yml: uv 1024,
    tex/shadow 2048, 2048x1334, batch 4, 800k iters / 7 days)."""
    import jax
    import jax.numpy as jnp

    import goliath_tpu

    goliath_tpu.enable_compilation_cache()

    from goliath_tpu.data.synthetic import SyntheticDataset
    from goliath_tpu.losses import ModularLoss
    from goliath_tpu.models.mesh_vae import AutoEncoder
    from goliath_tpu.optim import build_optimizer

    ds = SyntheticDataset(
        n_cams=2, n_frames=max(batch, 2), img_h=img_h, img_w=img_w,
        uv_size=uv, seed=0,
    )
    n_pose = int(ds.static_assets["n_pose_dims"]) \
        if "n_pose_dims" in ds.static_assets else None
    dec = {
        "init_uv_size": 64, "n_init_channels": 64, "n_min_channels": 4,
        "n_pose_enc_channels": 16, "n_embs": 1024,
        "n_embs_enc_channels": 32, "n_face_embs": 256, "uv_size": uv,
    }
    if n_pose is not None:
        dec["n_pose_dims"] = n_pose
    model = AutoEncoder(
        encoder={"n_embs": 1024},
        encoder_face={"n_embs": 256},
        decoder=dec,
        decoder_view={"net_uv_size": uv},
        upscale_net={"n_ftrs": 4},
        shadow_net={"uv_size": 2 * uv, "shadow_size": 256, "n_dims": 4},
        renderer={"image_height": img_h, "image_width": img_w},
        cal={"identity_camera": ds.static_assets.camera_ids[0]},
        pixel_cal={"image_height": img_h, "image_width": img_w,
                   "ds_rate": 8},
        learn_blur=True,
        assets=ds.static_assets,
        uv_size=uv,
        tex_size=2 * uv,
    )
    loss_fn = ModularLoss(
        {
            "rgb_l1": {"src_key": "rgb", "tgt_key": "image",
                       "mask_key": "image_weight", "weight": 10.0},
            "rgb_ssim": {"src_key": "rgb", "tgt_key": "image",
                         "mask_key": "image_weight", "weight": 0.2},
            "geom_l2": 0.4,
            "kl": 0.002,
        },
        assets=ds.static_assets,
    )
    batch_np = next(ds.batches(batch, 1))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()
          if not isinstance(v, (list, str))}
    params = model.init(jax.random.PRNGKey(0), jb)
    optimizer = build_optimizer(
        {"class_name": "torch.optim.Adam", "lr": 1e-3}, params
    )
    opt_state = optimizer.init(params)
    return model, loss_fn, optimizer, params, opt_state, jb


def run(img_h, img_w, uv, batch, n_steps):
    import jax
    import jax.numpy as jnp
    import optax

    builder = {"urhand": build_urhand, "mesh_vae": build_mesh_vae}.get(
        os.environ.get("GOLIATH_BENCH_MODEL", ""), build)
    model, loss_fn, optimizer, params, opt_state, jb = builder(
        img_h, img_w, uv, batch
    )

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng, it):
        def loss(p):
            preds = model.apply(p, batch, train=True, rngs={"noise": rng})
            return loss_fn(preds, batch, it)[0]

        total, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    rng = jax.random.PRNGKey(0)
    it0 = jnp.asarray(0)
    t0 = time.time()
    params, opt_state, total = step(params, opt_state, jb, rng, it0)
    _ = float(total)  # host fetch: block_until_ready can be a no-op over
    compile_s = time.time() - t0  # the axon tunnel's async dispatch

    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, total = step(
            params, opt_state, jb, jax.random.fold_in(rng, i), it0
        )
    total_host = float(total)  # chained deps + host fetch = honest timing
    elapsed = time.time() - t0
    return elapsed / n_steps, compile_s, total_host


def run_single(h, w, u, b, n_steps):
    step_s, compile_s, loss = run(h, w, u, b, n_steps)
    if os.environ.get("GOLIATH_BENCH_MODEL") == "mesh_vae":
        # mesh_vae reference: batch 4, 800k iters / 7 days = 1.32 steps/s
        work_ratio = (b / 4.0) * ((h * w) / (2048 * 1334)) \
            * ((u * u) / (1024 * 1024))
        eff = (1.0 / step_s) * work_ratio
        print(json.dumps({
            "metric": "mesh_vae_train_step_time",
            "value": round(step_s, 4),
            "unit": f"s/step (batch={b}, {h}x{w}, uv={u}; "
                    f"compile={compile_s:.1f}s, "
                    f"workload-normalized {eff:.3f} ref-steps/s)",
            "vs_baseline": round(eff / BASELINE_STEPS_PER_SEC, 3),
        }))
        return
    if os.environ.get("GOLIATH_BENCH_MODEL") == "urhand":
        # urhand reference: batch 1, 400k iters / 7 days = 0.661 steps/s
        work_ratio = (b / 1.0) * ((h * w) / (2048 * 1334)) \
            * ((u * u) / (1024 * 1024))
        eff = (1.0 / step_s) * work_ratio
        print(json.dumps({
            "metric": "urhand_train_step_time",
            "value": round(step_s, 4),
            "unit": f"s/step (batch={b}, {h}x{w}, uv={u}; "
                    f"compile={compile_s:.1f}s, "
                    f"workload-normalized {eff:.3f} ref-steps/s)",
            "vs_baseline": round(eff / (400_000 / (7 * 24 * 3600)), 3),
        }))
        return
    # normalize to the reference workload (batch 4, 2048x1334, 1M
    # gaussians): scale step time by the workload ratio
    work_ratio = (b / 4.0) * ((h * w) / (2048 * 1334)) \
        * ((u * u) / (1024 * 1024))
    eff_steps_per_sec = (1.0 / step_s) * work_ratio
    print(json.dumps({
        "metric": "rgca_train_step_time",
        "value": round(step_s, 4),
        "unit": f"s/step (batch={b}, {h}x{w}, {u*u} gaussians; "
                f"compile={compile_s:.1f}s, "
                f"workload-normalized {eff_steps_per_sec:.3f} "
                f"ref-steps/s)",
        "vs_baseline": round(eff_steps_per_sec / BASELINE_STEPS_PER_SEC,
                             3),
    }))


def main():
    img_h = int(os.environ.get("GOLIATH_BENCH_IMG_H", 2048))
    img_w = int(os.environ.get("GOLIATH_BENCH_IMG_W", 1344))
    uv = int(os.environ.get("GOLIATH_BENCH_UV", 1024))
    batch = int(os.environ.get("GOLIATH_BENCH_BATCH", 4))
    n_steps = int(os.environ.get("GOLIATH_BENCH_STEPS", 6))

    if os.environ.get("GOLIATH_BENCH_SINGLE") == "1":
        run_single(img_h, img_w, uv, batch, n_steps)
        return

    pal = os.environ.get("GOLIATH_BENCH_PALLAS", "1")
    # Fail-fast ladder: bank a cheap known-good number FIRST (printed the
    # moment it lands), then attempt rungs in DESCENDING expected value;
    # every IMPROVED result prints a fresh JSON line, so the last line on
    # stdout is always the best completed rung even if the driver kills us
    # mid-rung. Measured 2026-08-17: b4 noremat is the best known rung
    # (1.66 s/step, fits since the values_to_uv padding fix); remat b4 and
    # b1 are progressively safer fallbacks.
    # (h, w, uv, batch, use_pallas, per-rung timeout s)
    attempts = [
        (512, 512, 256, 1, pal, 900),            # banker: compiles in ~2 min
        (img_h, img_w, uv, batch, pal + "noremat", 1500),  # best known
        (img_h, img_w, uv, batch, pal, 1500),    # reference workload, remat
        (img_h, img_w, uv, 1, pal + "noremat", 1500),
        (img_h, img_w, uv, max(batch // 2, 1), pal, 1500),
    ]
    if pal == "1":
        # XLA fallback rung in case full-res pallas regresses on hardware.
        # Half resolution: the XLA-scan compositor's vmapped row packing
        # materializes 128x-padded [1, budget, 1] columns at full res
        # (20GB+); half res keeps the insurance rung compiling.
        attempts.append((img_h // 2, img_w // 2, uv, 1, "0", 1200))

    deadline = time.time() + float(
        os.environ.get("GOLIATH_BENCH_DEADLINE", 3300))

    # a failed attempt (OOM) can leave device memory pinned in this process,
    # cascading OOM into every smaller rung — run each rung in a fresh
    # subprocess instead
    import subprocess
    best = None
    printed_any = False
    for h, w, u, b, pl, rung_to in attempts:
        remaining = deadline - time.time()
        if remaining < 60:
            print(f"# bench deadline reached, skipping remaining rungs",
                  file=sys.stderr)
            break
        noremat = pl.endswith("noremat")
        pl = pl.replace("noremat", "")
        env = dict(os.environ)
        env.update({
            "GOLIATH_BENCH_SINGLE": "1",
            "GOLIATH_BENCH_IMG_H": str(h), "GOLIATH_BENCH_IMG_W": str(w),
            "GOLIATH_BENCH_UV": str(u), "GOLIATH_BENCH_BATCH": str(b),
            "GOLIATH_BENCH_STEPS": str(n_steps),
            "GOLIATH_BENCH_PALLAS": pl,
            "GOLIATH_RGCA_REMAT": "0" if noremat else "1",
        })
        if pl == "0":
            # the XLA-scan compositor materializes [tiles, chunk, C, P]
            # per scan step; at the pallas-tuned ts32/chunk256 that is
            # ~11GB — pin the fallback rung to its own feasible config
            env.update({"GOLIATH_BENCH_TS": "16", "GOLIATH_BENCH_CHUNK": "64",
                        "GOLIATH_BENCH_MPPT": "512",
                        "GOLIATH_BENCH_PBM": "4"})
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True,
                timeout=min(rung_to, remaining),
            )
        except subprocess.TimeoutExpired:
            print(f"# bench attempt (b={b}, {h}x{w}, uv={u}, pallas={pl}) "
                  "timed out", file=sys.stderr)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith('{"metric"')), None)
        if r.returncode == 0 and line is not None:
            try:
                vs = float(json.loads(line).get("vs_baseline", 0.0))
            except Exception:
                vs = 0.0
            if best is None or vs > best:
                best = vs
                print(line, flush=True)
                printed_any = True
            else:
                print(f"# rung (b={b}, {h}x{w}, uv={u}, pallas={pl}) ok but "
                      f"not an improvement: vs_baseline={vs}",
                      file=sys.stderr)
            continue
        tail = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
        print(f"# bench attempt (b={b}, {h}x{w}, uv={u}, pallas={pl}) "
              f"failed: {tail[0][:200]}", file=sys.stderr)
    if not printed_any:
        print(json.dumps({
            "metric": "rgca_train_step_time",
            "value": -1,
            "unit": "failed: all ladder rungs",
            "vs_baseline": 0.0,
        }))


if __name__ == "__main__":
    main()
