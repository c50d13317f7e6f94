#!/usr/bin/env python
"""Renderer-only probe: times the gaussian-splat render (fwd and fwd+bwd)
at configurable scale, and optionally measures the image-space error of the
static binning budgets (pair_budget_mult / max_pairs_per_tile) by comparing
against larger budgets.

  python scripts/probe_renderer.py                     # time defaults
  python scripts/probe_renderer.py --chunk 128 --inner 64
  python scripts/probe_renderer.py --budget-sweep      # PSNR vs budgets

Runs on whatever backend jax picks (axon TPU in this container).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_scene(n_gauss: int, img_h: int, img_w: int, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    # gaussians spread over a head-sized blob in front of the camera
    pos = rng.randn(n_gauss, 3).astype(np.float32) * np.asarray(
        [0.12, 0.15, 0.08], np.float32) + np.asarray([0, 0, 1.0], np.float32)
    q = rng.randn(n_gauss, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    scale = np.exp(rng.randn(n_gauss, 3).astype(np.float32) * 0.3) * 2.5e-3
    opacity = 1.0 / (1.0 + np.exp(-rng.randn(n_gauss, 1).astype(np.float32)))
    color = rng.rand(n_gauss, 3).astype(np.float32)
    f = 2.2 * img_h
    K = np.asarray([[[f, 0, img_w / 2], [0, f, img_h / 2], [0, 0, 1]]],
                   np.float32)
    Rt = np.eye(4, dtype=np.float32)[None, :3]
    return {k: jnp.asarray(v) for k, v in dict(
        K=K, Rt=Rt, primpos=pos[None], primqvec=q[None],
        primscale=scale[None], opacity=opacity[None], colors=color[None],
    ).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024 * 1024)
    ap.add_argument("--h", type=int, default=2048)
    ap.add_argument("--w", type=int, default=1344)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--maxppt", type=int, default=512)
    ap.add_argument("--pbm", type=int, default=4)
    ap.add_argument("--xla", action="store_true", help="XLA compositor")
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--budget-sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from goliath_tpu.ops.gsplat import render

    scene = make_scene(args.n, args.h, args.w)

    def run_cfg(maxppt, pbm, chunk, inner, use_pallas, fwd_only,
                steps=None, label=""):
        def fwd(primpos, colors, opacity):
            out = render(
                args.w, args.h, scene["K"], scene["Rt"], primpos,
                scene["primqvec"], scene["primscale"], opacity, colors,
                max_pairs_per_tile=maxppt, chunk=chunk,
                pallas_inner=inner, pair_budget_mult=pbm,
                use_pallas=use_pallas,
            )
            return out["render"], out["depth"]

        if fwd_only:
            f = jax.jit(fwd)
        else:
            def loss(primpos, colors, opacity):
                rgb, depth = fwd(primpos, colors, opacity)
                return (rgb * rgb).sum() + jnp.abs(depth).sum() * 1e-3

            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        t0 = time.time()
        out = f(scene["primpos"], scene["colors"], scene["opacity"])
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        nst = steps or args.steps
        for _ in range(nst):
            out = f(scene["primpos"], scene["colors"], scene["opacity"])
        jax.block_until_ready(out)
        dt = (time.time() - t0) / nst
        print(f"{label or 'cfg'}: maxppt={maxppt} pbm={pbm} chunk={chunk} "
              f"inner={inner} pallas={use_pallas} fwd_only={fwd_only}: "
              f"{dt*1e3:.1f} ms/iter (compile {compile_s:.0f}s)", flush=True)
        return out

    if args.budget_sweep:
        # PSNR of the render at 1x budgets vs 2x/4x reference budgets
        def img_at(maxppt, pbm):
            out = render(
                args.w, args.h, scene["K"], scene["Rt"], scene["primpos"],
                scene["primqvec"], scene["primscale"], scene["opacity"],
                scene["colors"],
                max_pairs_per_tile=maxppt, chunk=args.chunk,
                pallas_inner=args.inner, pair_budget_mult=pbm,
                use_pallas=not args.xla,
            )
            return np.asarray(out["render"][0])

        ref = img_at(args.maxppt * 4, args.pbm * 4)
        for mult in (1, 2, 4):
            img = img_at(args.maxppt * mult, args.pbm * mult)
            mse = float(((img - ref) ** 2).mean())
            peak = max(float(ref.max()), 1e-6)
            psnr = 10 * np.log10(peak ** 2 / max(mse, 1e-12))
            print(f"budget x{mult} (maxppt={args.maxppt*mult}, "
                  f"pbm={args.pbm*mult}): PSNR vs x4 = {psnr:.2f} dB",
                  flush=True)
        return

    run_cfg(args.maxppt, args.pbm, args.chunk, args.inner,
            not args.xla, args.fwd_only)


if __name__ == "__main__":
    main()
