"""Stage timings for urhand's shadow pass at bench scale.

Times, in separate jitted programs, on the attached TPU:
  raster     — the L-light depth z-buffer raster alone (vmapped pallas)
  raster1    — ONE light's raster (per-call overhead vs batched)
  full       — get_shadow_map end to end (B*L lights)

Uses bench.build_urhand's model/assets so shapes match the bench rung
exactly (shadow_rl size, hand topology, uv size).

Env: GOLIATH_PROF_{IMG_H,IMG_W,UV} (defaults 2048/1344/1024);
GOLIATH_PROBE_LIGHTS (default 5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    img_h = int(os.environ.get("GOLIATH_PROF_IMG_H", 2048))
    img_w = int(os.environ.get("GOLIATH_PROF_IMG_W", 1344))
    uv = int(os.environ.get("GOLIATH_PROF_UV", 1024))
    L = int(os.environ.get("GOLIATH_PROBE_LIGHTS", 5))

    os.environ.setdefault("GOLIATH_BENCH_MODEL", "urhand")
    from bench import build_urhand
    from goliath_tpu.ops.rasterizer import rasterize, transform
    from goliath_tpu.utils.shadowmap import get_shadow_map
    from goliath_tpu.models.urhand import build_cam_rot_mat

    model, _loss, _opt, params, _os_, jb = build_urhand(img_h, img_w, uv, 1)
    rl = model.module.shadow_rl
    gf = model.geo_fn
    nfaces = np.asarray(gf.vi).shape[0]
    print(f"== shadow probe: uv={uv} shadow={rl.h} L={L} faces={nfaces}",
          flush=True)

    vkey = ("registration_vertices" if "registration_vertices" in jb
            else "template_mesh" if "template_mesh" in jb else None)
    if vkey is None:
        verts1 = jnp.asarray(
            np.asarray(gf.v2uv is not None and 0) * 0
            + np.asarray(model.lbs_fn.lbs_fn.template_mesh
                         if hasattr(model.lbs_fn, "lbs_fn") else 0))
        raise SystemExit(f"no vertex key in batch: {sorted(jb)}")
    verts1 = jnp.asarray(jb[vkey][:1], jnp.float32)
    verts = jnp.tile(verts1, (L, 1, 1))
    center = jnp.mean(verts1[0], axis=0)
    ang = np.linspace(0, 2 * np.pi, L, endpoint=False)
    lp = jnp.asarray(np.stack(
        [800 * np.cos(ang), 200 + 0 * ang, 800 * np.sin(ang)], -1),
        jnp.float32) + center[None]
    rot = build_cam_rot_mat(lp, jnp.tile(center[None], (L, 1)))
    Rt = jnp.concatenate(
        [rot, -jnp.einsum("bij,bj->bi", rot, lp)[..., None]], axis=2)

    postex = jnp.tile(gf.to_uv(verts1), (L, 1, 1, 1))  # [L, 3, uv, uv]
    nml = jnp.ones_like(postex) / np.sqrt(3.0)

    sections = set(sys.argv[1:]) or {"raster", "raster1", "full"}

    if "raster" in sections:
        @jax.jit
        def raster(vv, Rtb):
            K = jnp.zeros((L, 3, 3), jnp.float32)
            K = K.at[:, 0, 0].set(900.0).at[:, 1, 1].set(900.0)
            K = K.at[:, 0, 2].set(rl.w / 2).at[:, 1, 2].set(rl.h / 2)
            K = K.at[:, 2, 2].set(1.0)
            vp = transform(vv, K, Rtb)
            idx = jax.vmap(lambda v: rasterize(
                v, rl.vi, rl.h, rl.w, **rl.raster_kwargs))(vp)
            return idx.sum()

        t = timeit(raster, verts, Rt)
        print(f"raster x{L} (vmapped):   {t*1e3:8.1f} ms", flush=True)

    if "raster1" in sections:
        @jax.jit
        def raster1(vv, Rtb):
            K = jnp.zeros((1, 3, 3), jnp.float32)
            K = K.at[:, 0, 0].set(900.0).at[:, 1, 1].set(900.0)
            K = K.at[:, 0, 2].set(rl.w / 2).at[:, 1, 2].set(rl.h / 2)
            K = K.at[:, 2, 2].set(1.0)
            vp = transform(vv[:1], K, Rtb[:1])
            idx = rasterize(vp[0], rl.vi, rl.h, rl.w, **rl.raster_kwargs)
            return idx.sum()

        t = timeit(raster1, verts, Rt)
        print(f"raster x1:               {t*1e3:8.1f} ms", flush=True)

    if "full" in sections:
        @jax.jit
        def full(vv, Rtb, pv, nm):
            return get_shadow_map(rl, Rtb, None, vv, pv, nm).sum()

        t = timeit(full, verts, Rt, postex, nml)
        print(f"get_shadow_map full:     {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
