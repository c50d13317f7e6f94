"""Component-level timing for the RGCA train step on the attached TPU.

Times, in separate jitted programs:
  binning      — project + depth sort + bin_to_tiles (renderer front-end)
  render_fwd   — full render() forward (pallas or xla)
  render_bwd   — render() fwd+bwd (grad wrt gaussian params)
  model_fwd    — model forward with the splat render REPLACED by a cheap sum
                 (isolates encoder/decoder/SH/spec cost)
  model_bwd    — same, fwd+bwd
  loss_only    — loss pipeline on fixed preds (SSIM at full res etc.)
  full_step    — the real train step (same as bench.py)

Usage: GOLIATH_PROF_PALLAS=1 python scripts/profile_step.py [sections...]
Env: GOLIATH_PROF_{IMG_H,IMG_W,UV,BATCH} (defaults 2048/1344/1024/1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=4, warmup=1, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    # host fetch of one leaf — block_until_ready can be a no-op over axon
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf)
    return (time.time() - t0) / n


def main():
    img_h = int(os.environ.get("GOLIATH_PROF_IMG_H", 2048))
    img_w = int(os.environ.get("GOLIATH_PROF_IMG_W", 1344))
    uv = int(os.environ.get("GOLIATH_PROF_UV", 1024))
    batch = int(os.environ.get("GOLIATH_PROF_BATCH", 1))
    use_pallas = os.environ.get("GOLIATH_PROF_PALLAS", "1") == "1"
    sections = set(sys.argv[1:]) or {
        "binning", "render_fwd", "render_bwd", "model_fwd", "model_bwd",
        "loss_only", "full_step"}

    from bench import build

    os.environ["GOLIATH_BENCH_PALLAS"] = "1" if use_pallas else "0"
    model, loss_fn, optimizer, params, opt_state, jb = build(
        img_h, img_w, uv, batch)
    N = uv * uv
    rng = jax.random.PRNGKey(0)
    it0 = jnp.asarray(0)

    print(f"== profile: {img_h}x{img_w}, uv={uv} (N={N}), batch={batch}, "
          f"pallas={use_pallas}")

    # synthetic gaussian cloud matching the model's head-relative stats
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    primpos = jax.random.normal(k1, (batch, N, 3)) * 100.0
    primqvec = jax.random.normal(k2, (batch, N, 4))
    primqvec = primqvec / jnp.linalg.norm(primqvec, axis=-1, keepdims=True)
    primscale = jnp.exp(jax.random.normal(k3, (batch, N, 3)) * 0.3) * 2.0
    opacity = jax.nn.sigmoid(jax.random.normal(k4, (batch, N, 1)))
    colors = jax.nn.sigmoid(jax.random.normal(k5, (batch, N, 3)))
    K = jb["K"]
    Rt = jb["Rt"]

    from goliath_tpu.ops import gsplat
    from goliath_tpu.ops.binning import bin_to_tiles

    render_cfg = dict(
        max_pairs_per_tile=int(os.environ.get("GOLIATH_BENCH_MPPT", 1024)),
        chunk=int(os.environ.get("GOLIATH_BENCH_CHUNK", 256)),
        pallas_inner=int(os.environ.get("GOLIATH_BENCH_INNER", 64)),
        pair_budget_mult=float(os.environ.get("GOLIATH_BENCH_PBM", 2)),
        use_pallas=use_pallas,
        tile_size=int(os.environ.get("GOLIATH_BENCH_TS", 32)),
    )
    tile_size = render_cfg["tile_size"]
    ntx = -(-img_w // tile_size)
    nty = -(-img_h // tile_size)

    pbudget = int(round(render_cfg["pair_budget_mult"] * N))

    if "binning" in sections:
        @jax.jit
        def binning_only(K, Rt, pos, quat, scale, op, col):
            def one(K_b, Rt_b, p, q, s, o, c):
                _, _, _, _, _, _, b = gsplat.prepare_sample(
                    K_b, Rt_b, p, q, s, o, c, img_h, img_w, tile_size,
                    pair_budget=pbudget)
                return (b.sorted_prim.sum() + b.tile_start.sum()
                        + b.perm.sum() + b.prim_offsets.sum())
            return jax.vmap(one)(K, Rt, pos, quat, scale, op, col).sum()

        t = timeit(binning_only, K, Rt, primpos, primqvec, primscale,
                   opacity, colors)
        print(f"binning (proj+key+bin):  {t*1e3:8.1f} ms")

    if "pack" in sections:
        from goliath_tpu.ops.gsplat_pallas import pack_pair_rows

        nchunks = (render_cfg["max_pairs_per_tile"]
                   // render_cfg["chunk"] + 1)

        @jax.jit
        def pack_only(K, Rt, pos, quat, scale, op, col):
            def one(K_b, Rt_b, p, q, s, o, c):
                xys, conics, op_s, chan, valid, _, b = gsplat.prepare_sample(
                    K_b, Rt_b, p, q, s, o, c, img_h, img_w, tile_size,
                    pair_budget=pbudget)
                rows = pack_pair_rows(
                    xys, conics, op_s, chan, valid.astype(xys.dtype),
                    b.sorted_prim, nchunks * render_cfg["chunk"])
                return rows.sum()
            return jax.vmap(one)(K, Rt, pos, quat, scale, op, col).sum()

        t = timeit(pack_only, K, Rt, primpos, primqvec, primscale,
                   opacity, colors)
        print(f"binning+pack rows:       {t*1e3:8.1f} ms")

    if "render_fwd" in sections:
        @jax.jit
        def rfwd(pos, quat, scale, op, col):
            out = gsplat.render(img_w, img_h, K, Rt, pos, quat, scale, op,
                                col, **render_cfg)
            return out["render"].sum()

        t = timeit(rfwd, primpos, primqvec, primscale, opacity, colors)
        print(f"render fwd:              {t*1e3:8.1f} ms")

    if "render_bwd" in sections:
        @jax.jit
        def rbwd(pos, quat, scale, op, col):
            def f(pos, quat, scale, op, col):
                out = gsplat.render(img_w, img_h, K, Rt, pos, quat, scale,
                                    op, col, **render_cfg)
                return out["render"].sum() + out["alpha"].sum()
            g = jax.grad(f, argnums=(0, 1, 2, 3, 4))(pos, quat, scale, op,
                                                     col)
            return sum(x.sum() for x in g)

        t = timeit(rbwd, primpos, primqvec, primscale, opacity, colors)
        print(f"render fwd+bwd:          {t*1e3:8.1f} ms")

    if "model_fwd" in sections or "model_bwd" in sections:
        import goliath_tpu.ops.gsplat as gsplat_mod
        real_render = gsplat_mod.render

        def fake_render(cam_img_w, cam_img_h, K, Rt, primpos, primqvec,
                        primscale, opacity, colors, **kw):
            B = K.shape[0]
            v = (primpos.sum() + primqvec.sum() + primscale.sum()
                 + opacity.sum() + colors.sum()) * 1e-9
            z = jnp.zeros((B, 1, cam_img_h, cam_img_w)) + v
            rgb = jnp.zeros((B, 3, cam_img_h, cam_img_w)) + v
            return {"render": rgb, "final_T": 1.0 - z, "alpha": z,
                    "depth": z, "radii": jnp.zeros(primpos.shape[:2])}

        gsplat_mod.render = fake_render
        try:
            if "model_fwd" in sections:
                @jax.jit
                def mfwd(p, batch, rng):
                    preds = model.apply(p, batch, train=True,
                                        rngs={"noise": rng})
                    return preds["rgb"].sum()

                t = timeit(mfwd, params, jb, rng)
                print(f"model fwd (no render):   {t*1e3:8.1f} ms")

            if "model_bwd" in sections:
                @jax.jit
                def mbwd(p, batch, rng):
                    def f(p):
                        preds = model.apply(p, batch, train=True,
                                            rngs={"noise": rng})
                        return preds["rgb"].sum() + preds["geom"].sum()
                    g = jax.grad(f)(p)
                    return sum(jnp.sum(x) for x in
                               jax.tree_util.tree_leaves(g))

                t = timeit(mbwd, params, jb, rng)
                print(f"model fwd+bwd (no rndr): {t*1e3:8.1f} ms")

            if "model_nodec" in sections:
                # also neutralize the prim decoder: what's left is encoder +
                # geom decoder + cal/blur/backlit plumbing
                import goliath_tpu.models.rgca as rgca_mod
                real_call = rgca_mod._call_prim_decoder

                def fake_call(dec, embs, geom, *a, **kw):
                    B_, S = embs.shape[0], model.module.slabsize
                    Npix = S * S
                    v = embs.sum() * 1e-9 + geom.sum() * 1e-9
                    z3 = jnp.zeros((B_, Npix, 3)) + v
                    return dict(
                        color=z3, opacity=z3[..., :1] + 0.5, primpos=z3,
                        primqvec=jnp.concatenate(
                            [z3, jnp.ones((B_, Npix, 1))], -1),
                        primscale=z3 + 1.0, primscale_preclip=z3 + 1.0,
                        sigma=z3[..., 0], spec_vis=z3[..., :1],
                        spec_nml=z3, spec_dnml=z3, diff_color=z3,
                        spec_color=z3, primnmlbase=z3,
                        cos_weight=z3[..., :1], color_rand=z3)

                rgca_mod._call_prim_decoder = fake_call
                try:
                    @jax.jit
                    def mnd(p, batch, rng):
                        def f(p):
                            preds = model.apply(p, batch, train=True,
                                                rngs={"noise": rng})
                            return preds["rgb"].sum() + preds["geom"].sum()
                        g = jax.grad(f)(p)
                        return sum(jnp.sum(x) for x in
                                   jax.tree_util.tree_leaves(g))

                    t = timeit(mnd, params, jb, rng)
                    print(f"model f+b (no dec/rndr): {t*1e3:8.1f} ms")
                finally:
                    rgca_mod._call_prim_decoder = real_call
        finally:
            gsplat_mod.render = real_render

    if "bwd_parts" in sections:
        # split the render backward into (pallas grad kernel + gather) vs
        # (per-prim reduction): in-graph timing, not standalone micro ops
        from goliath_tpu.ops.gsplat import (
            project_gaussians, reduce_sorted_pair_grads,
        )
        from goliath_tpu.ops.gsplat_pallas import (
            pair_grads_pallas, rasterize_tiled_pallas_fwd,
        )

        mppt = render_cfg["max_pairs_per_tile"]
        chunk = render_cfg["chunk"]
        inner = render_cfg["pallas_inner"]

        def make_binned(K_b, Rt_b, pos, quat, scale, op, col):
            xys, conics, op_s, chan, valid, _, b = gsplat.prepare_sample(
                K_b, Rt_b, pos, quat, scale, op, col, img_h, img_w,
                tile_size, pair_budget=pbudget, return_depth=False)
            return xys, conics, op_s, chan, valid, b

        @jax.jit
        def kernel_fwd_only(K, Rt, pos, quat, scale, op, col):
            xys, conics, op_s, chan, valid, b = make_binned(
                K[0], Rt[0], pos[0], quat[0], scale[0], op[0], col[0])
            out, Tf, cnt = rasterize_tiled_pallas_fwd(
                xys, conics, op_s, chan, valid.astype(jnp.float32),
                b.sorted_prim, b.tile_start, b.tile_end,
                img_h, img_w, tile_size, ntx, nty,
                chunk=chunk, inner=inner, max_pairs_per_tile=mppt)
            return out.sum()

        t = timeit(kernel_fwd_only, K, Rt, primpos, primqvec, primscale,
                   opacity, colors)
        print(f"bin+fwd kernel only:     {t*1e3:8.1f} ms")

        @jax.jit
        def kernel_bwd(K, Rt, pos, quat, scale, op, col):
            xys, conics, op_s, chan, valid, b = make_binned(
                K[0], Rt[0], pos[0], quat[0], scale[0], op[0], col[0])
            out, Tf, cnt = rasterize_tiled_pallas_fwd(
                xys, conics, op_s, chan, valid.astype(jnp.float32),
                b.sorted_prim, b.tile_start, b.tile_end,
                img_h, img_w, tile_size, ntx, nty,
                chunk=chunk, inner=inner, max_pairs_per_tile=mppt)
            sorted_g = pair_grads_pallas(
                xys, conics, op_s, chan, valid.astype(jnp.float32),
                b.sorted_prim, b.tile_start, b.tile_end, b.tile_of_pair,
                jnp.ones_like(out), jnp.ones_like(Tf), Tf, cnt,
                img_h, img_w, tile_size, ntx, nty,
                chunk=chunk, inner=inner, max_pairs_per_tile=mppt,
                out_img=out)
            return sorted_g.sum()

        t = timeit(kernel_bwd, K, Rt, primpos, primqvec, primscale,
                   opacity, colors)
        print(f"bin+fwd+bwd kernels:     {t*1e3:8.1f} ms")

        @jax.jit
        def kernel_bwd_reduce(K, Rt, pos, quat, scale, op, col):
            xys, conics, op_s, chan, valid, b = make_binned(
                K[0], Rt[0], pos[0], quat[0], scale[0], op[0], col[0])
            out, Tf, cnt = rasterize_tiled_pallas_fwd(
                xys, conics, op_s, chan, valid.astype(jnp.float32),
                b.sorted_prim, b.tile_start, b.tile_end,
                img_h, img_w, tile_size, ntx, nty,
                chunk=chunk, inner=inner, max_pairs_per_tile=mppt)
            sorted_g = pair_grads_pallas(
                xys, conics, op_s, chan, valid.astype(jnp.float32),
                b.sorted_prim, b.tile_start, b.tile_end, b.tile_of_pair,
                jnp.ones_like(out), jnp.ones_like(Tf), Tf, cnt,
                img_h, img_w, tile_size, ntx, nty,
                chunk=chunk, inner=inner, max_pairs_per_tile=mppt,
                out_img=out)
            from goliath_tpu.ops.gsplat import reduce_sorted_pair_grads
            C = chan.shape[-1]
            acc = reduce_sorted_pair_grads(
                sorted_g[:, :6 + C], b.perm, b.prim_offsets, b.prim_ends)
            return acc.sum()

        t = timeit(kernel_bwd_reduce, K, Rt, primpos, primqvec, primscale,
                   opacity, colors)
        print(f"bin+fwd+bwd+reduce:      {t*1e3:8.1f} ms")

    if "parts" in sections:
        import numpy as np

        from goliath_tpu.models.rgca import Encoder, PrimDecoder

        V = jb["registration_vertices"].shape[1]
        enc = Encoder(n_embs=256, n_verts_in=V, tex_size=uv, noise_std=1.0)
        everts = jb["registration_vertices"]
        ecolor = jnp.ones((batch, 3, uv, uv)) * 128.0
        eparams = jax.jit(lambda r: enc.init(
            {"params": r, "noise": r}, everts, ecolor, True))(rng)

        @jax.jit
        def efwd(p, v, c):
            return enc.apply(p, v, c, True, rngs={"noise": rng})["embs"].sum()

        t = timeit(efwd, eparams, everts, ecolor)
        print(f"encoder fwd:             {t*1e3:8.1f} ms")

        @jax.jit
        def ebwd(p, v, c):
            g = jax.grad(lambda p: enc.apply(
                p, v, c, True, rngs={"noise": rng})["embs"].sum())(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        t = timeit(ebwd, eparams, everts, ecolor)
        print(f"encoder fwd+bwd:         {t*1e3:8.1f} ms")

        dec = PrimDecoder(
            n_embs=256, geo_fn=model.geo_fn,
            color_mean=np.ones((3, uv, uv), np.float32) * 128,
            slabsize=uv, n_diff_sh=8, n_color_sh=3)
        embs = jnp.zeros((batch, 256))
        geom = jb["registration_vertices"]
        campos = jb["campos"]
        li = jnp.ones((batch, 5, 3))
        lp = jnp.ones((batch, 5, 3)) * 100
        lsh = jnp.ones((batch, 3, 81))
        nl = jnp.full((batch,), 5)
        dparams = jax.jit(lambda r: dec.init(
            {"params": r, "noise": r}, embs, geom, campos, li, lp, lsh,
            nl, None, None, True))(rng)

        @jax.jit
        def dfwd(p, embs, geom):
            out = dec.apply(p, embs, geom, campos, li, lp, lsh, nl, None,
                            None, True, rngs={"noise": rng})
            return out["color"].sum() + out["primpos"].sum()

        t = timeit(dfwd, dparams, embs, geom)
        print(f"decoder fwd:             {t*1e3:8.1f} ms")

        @jax.jit
        def dbwd(p, embs, geom):
            g = jax.grad(lambda p: dfwd_inner(p, embs, geom))(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        def dfwd_inner(p, embs, geom):
            out = dec.apply(p, embs, geom, campos, li, lp, lsh, nl, None,
                            None, True, rngs={"noise": rng})
            return out["color"].sum() + out["primpos"].sum()

        t = timeit(dbwd, dparams, embs, geom)
        print(f"decoder fwd+bwd:         {t*1e3:8.1f} ms")

    if "loss_only" in sections:
        fake_preds = {
            "rgb": jnp.zeros((batch, 3, img_h, img_w)) + 0.3,
            "alpha": jnp.ones((batch, 1, img_h, img_w)) * 0.5,
            "geom": jb["registration_vertices"] * 1.01,
            "embs_mu": jnp.zeros((batch, 256)),
            "embs_logvar": jnp.zeros((batch, 256)),
            "primscale_preclip": primscale,
            "color": colors,
            "diff_color": colors - 0.5,
            "learn_blur_weights": jnp.ones((batch, 2)),
        }

        @jax.jit
        def lonly(preds, batch):
            return loss_fn(preds, batch, it0)[0]

        t = timeit(lonly, fake_preds, jb)
        print(f"loss only:               {t*1e3:8.1f} ms")

    if "full_step" in sections:
        import optax

        @jax.jit
        def step(params, opt_state, batch, rng, it):
            def loss(p):
                preds = model.apply(p, batch, train=True,
                                    rngs={"noise": rng})
                return loss_fn(preds, batch, it)[0]
            total, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, total

        def run_step(params, opt_state):
            p2, o2, tot = step(params, opt_state, jb, rng, it0)
            return tot

        t = timeit(run_step, params, opt_state)
        print(f"full step:               {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
