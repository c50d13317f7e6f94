"""Section timing for the URHand train step at reference scale.

Sections:
  full_step   — the bench train step
  model_fwd   — model forward only
  model_bwd   — model forward+backward (no optimizer)
  noshadow    — model fwd+bwd with the shadow passes disabled
  norender    — model fwd+bwd with the mesh rasterizer replaced by a sum
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3, warmup=1, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
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
    sections = set(sys.argv[1:]) or {
        "model_fwd", "model_bwd", "full_step"}

    os.environ.setdefault("GOLIATH_BENCH_MODEL", "urhand")
    from bench import build_urhand

    model, loss_fn, optimizer, params, opt_state, jb = build_urhand(
        img_h, img_w, uv, batch)
    rng = jax.random.PRNGKey(0)
    it0 = jnp.asarray(0)
    print(f"== urhand profile: {img_h}x{img_w}, uv={uv}, batch={batch}")

    if "model_fwd" in sections:
        @jax.jit
        def mfwd(p, b):
            preds = model.apply(p, b, train=True)
            return preds["rgb"].sum()

        t = timeit(mfwd, params, jb)
        print(f"model fwd:               {t*1e3:8.1f} ms", flush=True)

    if "model_bwd" in sections:
        @jax.jit
        def mbwd(p, b):
            def f(p):
                preds = model.apply(p, b, train=True)
                return preds["rgb"].sum()
            g = jax.grad(f)(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        t = timeit(mbwd, params, jb)
        print(f"model fwd+bwd:           {t*1e3:8.1f} ms", flush=True)

    if "noshadow" in sections:
        # shadow cost by ablation: stub get_shadow_map (both passes) with a
        # constant no-shadow map of the right shape
        import goliath_tpu.models.urhand as uh

        real = uh.get_shadow_map

        def stub(rl, Rt, K, verts, postex, nml=None):
            return jnp.zeros_like(postex[:, :1])

        uh.get_shadow_map = stub

        def nsfwd(p, b):
            preds = model.apply(p, b, train=True)
            return preds["rgb"].sum()

        def nsbwd(p, b):
            g = jax.grad(lambda p: nsfwd(p, b))(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        t = timeit(jax.jit(nsfwd), params, jb)
        print(f"model fwd (no shadow):   {t*1e3:8.1f} ms", flush=True)
        t = timeit(jax.jit(nsbwd), params, jb)
        print(f"model fwd+bwd (noshdw):  {t*1e3:8.1f} ms", flush=True)
        uh.get_shadow_map = real

    if "halfshadow" in sections:
        # one shared shadow pass: reuse the FIRST pass's map for the second
        import goliath_tpu.models.urhand as uh

        real = uh.get_shadow_map
        cache = {}

        def shared(rl, Rt, K, verts, postex, nml=None):
            if "sm" not in cache:
                cache["sm"] = real(rl, Rt, K, verts, postex, nml)
            return cache["sm"]

        uh.get_shadow_map = shared

        def hsbwd(p, b):
            cache.clear()
            g = jax.grad(lambda p: (model.apply(p, b, train=True)["rgb"]
                                    ).sum())(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        t = timeit(jax.jit(hsbwd), params, jb)
        print(f"model fwd+bwd (1 pass):  {t*1e3:8.1f} ms", flush=True)
        uh.get_shadow_map = real
        cache.clear()

    if "full_step" in sections:
        import optax
        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch, it):
            def loss(p):
                preds = model.apply(p, batch, train=True)
                return loss_fn(preds, batch, it)[0]
            total, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, total

        def run(p, o):
            p2, o2, tot = step(p, o, jb, it0)
            return tot

        t = timeit(run, params, opt_state)
        print(f"full step:               {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
