"""Quantify static-budget truncation error at reference scale (VERDICT r1 #7).

Decodes the RGCA model once at full scale (1M gaussians, 2048x1344), then
renders the SAME gaussians under different static budgets
(tile_size / pair_budget_mult / max_pairs_per_tile) and reports PSNR of
each setting against a maximal-budget reference render.

Run on the TPU:  python scripts/eval_budgets.py
Results table is recorded in docs/budget_truncation.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import goliath_tpu

goliath_tpu.enable_compilation_cache()


def main():
    img_h, img_w, uv, batch = 2048, 1344, 1024, 1
    from bench import build

    model, _loss, _opt, params, _os_, jb = build(img_h, img_w, uv, batch)

    preds = jax.jit(
        lambda p, b: model.apply(p, b, train=False))(params, jb)
    gaussians = {
        k: jax.device_get(preds[k])
        for k in ("primpos", "primqvec", "primscale", "opacity", "color")
    }
    print("decoded gaussians:",
          {k: v.shape for k, v in gaussians.items()}, flush=True)

    from goliath_tpu.ops import gsplat

    def render_with(cfg):
        @jax.jit
        def go(K, Rt, g):
            out = gsplat.render(
                img_w, img_h, K, Rt, g["primpos"], g["primqvec"],
                g["primscale"], g["opacity"], g["color"],
                return_depth=False, use_pallas=True, **cfg)
            return out["render"], out["alpha"]
        rgb, alpha = go(jb["K"], jb["Rt"],
                        {k: jnp.asarray(v) for k, v in gaussians.items()})
        return jax.device_get(rgb), jax.device_get(alpha)

    ref_cfg = dict(tile_size=16, pair_budget_mult=8, max_pairs_per_tile=3072,
                   chunk=256, pallas_inner=64, max_tiles_per_prim=64)
    ref_rgb, ref_alpha = render_with(ref_cfg)

    import numpy as np

    # pair demand per tile size (before budget truncation)
    from goliath_tpu.ops.gsplat import project_gaussians

    @jax.jit
    def demand(K, Rt, g):
        proj = project_gaussians(
            g["primpos"][0], g["primscale"][0], g["primqvec"][0], Rt[0],
            K[0, 0, 0], K[0, 1, 1], K[0, 0, 2], K[0, 1, 2], img_h, img_w)
        out = {}
        rx = proj["radii_xy"][:, 0]
        ry = proj["radii_xy"][:, 1]
        for ts in (16, 32):
            ntx, nty = -(-img_w // ts), -(-img_h // ts)
            x0 = jnp.clip(jnp.floor((proj["xys"][:, 0] - rx) / ts), 0, ntx)
            x1 = jnp.clip(jnp.floor((proj["xys"][:, 0] + rx) / ts) + 1,
                          0, ntx)
            y0 = jnp.clip(jnp.floor((proj["xys"][:, 1] - ry) / ts), 0, nty)
            y1 = jnp.clip(jnp.floor((proj["xys"][:, 1] + ry) / ts) + 1,
                          0, nty)
            n = jnp.where(proj["valid"] & (proj["radii"] > 0),
                          jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0),
                          0)
            out[ts] = jnp.sum(jnp.minimum(n, 64))
        return out

    dem = jax.device_get(demand(
        jb["K"], jb["Rt"],
        {k: jnp.asarray(v) for k, v in gaussians.items()}))
    for ts, n in dem.items():
        print(f"pair demand at ts={ts}: {int(n)} "
              f"({int(n) / (uv * uv):.2f} per gaussian)")

    variants = [
        ("ts32/pbm3/mppt2048",
         dict(tile_size=32, pair_budget_mult=3, max_pairs_per_tile=2048,
              chunk=256, pallas_inner=64)),
        ("r1 default ts16/pbm4/mppt512",
         dict(tile_size=16, pair_budget_mult=4, max_pairs_per_tile=512,
              chunk=64, pallas_inner=64)),
        ("bench ts32/pbm2/mppt2048",
         dict(tile_size=32, pair_budget_mult=2, max_pairs_per_tile=2048,
              chunk=256, pallas_inner=64)),
        ("lean ts32/pbm2/mppt1024",
         dict(tile_size=32, pair_budget_mult=2, max_pairs_per_tile=1024,
              chunk=256, pallas_inner=64)),
        ("half ts16/pbm2/mppt256",
         dict(tile_size=16, pair_budget_mult=2, max_pairs_per_tile=256,
              chunk=64, pallas_inner=64)),
        # per-axis-radii era: demand dropped, so smaller global budgets
        ("axis ts32/pbm1.5/mppt1024/c512",
         dict(tile_size=32, pair_budget_mult=1.5, max_pairs_per_tile=1024,
              chunk=512, pallas_inner=64)),
        ("axis ts32/pbm1.25/mppt1024/c1024",
         dict(tile_size=32, pair_budget_mult=1.25, max_pairs_per_tile=1024,
              chunk=1024, pallas_inner=64)),
        ("axis ts32/pbm1.0/mppt512/c512",
         dict(tile_size=32, pair_budget_mult=1.0, max_pairs_per_tile=512,
              chunk=512, pallas_inner=64)),
    ]
    mask = ref_alpha > 0.01
    print(f"ref coverage: {mask.mean():.4f} of pixels")
    for name, cfg in variants:
        rgb, _ = render_with(cfg)
        d2 = ((rgb - ref_rgb) ** 2)[np.broadcast_to(mask, rgb.shape)]
        mse = float(d2.mean()) if d2.size else 0.0
        peak = float(np.abs(ref_rgb).max()) or 1.0
        psnr = 10 * np.log10(peak**2 / max(mse, 1e-12))
        print(f"{name:36s} PSNR vs maximal budget: {psnr:6.2f} dB "
              f"(mse {mse:.2e})", flush=True)


if __name__ == "__main__":
    main()
