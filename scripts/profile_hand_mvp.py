"""Section timing for the hand_mvp/hand_teacher train step (r5).

Sections: model_fwd, model_bwd (fwd+grad, no opt), norender (march replaced
by a cheap sum), full_step. Env: GOLIATH_PROF_{IMG_H,IMG_W,UV,BATCH},
GOLIATH_PROF_TEACHER=1 for the teacher.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=2):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.time() - t0) / n


def main():
    img_h = int(os.environ.get("GOLIATH_PROF_IMG_H", 512))
    img_w = int(os.environ.get("GOLIATH_PROF_IMG_W", 336))
    uv = int(os.environ.get("GOLIATH_PROF_UV", 256))
    batch = int(os.environ.get("GOLIATH_PROF_BATCH", 1))
    teacher = os.environ.get("GOLIATH_PROF_TEACHER") == "1"
    sections = sys.argv[1:] or ["model_fwd", "model_bwd", "full_step"]

    os.environ["GOLIATH_BENCH_MODEL"] = "hand_teacher" if teacher else "hand_mvp"
    from bench import build_hand_mvp

    model, loss_fn, optimizer, params, opt_state, jb = build_hand_mvp(
        img_h, img_w, uv, batch, teacher=teacher)
    rng = jax.random.PRNGKey(0)
    it0 = jnp.asarray(0)
    print(f"== hand profile: {img_h}x{img_w}, uv={uv}, b={batch}, "
          f"teacher={teacher}", flush=True)

    if "model_fwd" in sections:
        @jax.jit
        def mfwd(p, b):
            preds = model.apply(p, b, train=True,
                                rngs={"noise": jax.random.PRNGKey(1)})
            return preds["rgb"].sum() + preds["alpha"].sum()

        t0 = time.time()
        t = timeit(mfwd, params, jb)
        print(f"model fwd:     {t*1e3:9.1f} ms (compile {time.time()-t0-2*t:.0f}s)",
              flush=True)

    if "model_bwd" in sections:
        @jax.jit
        def mbwd(p, b):
            def f(p):
                preds = model.apply(p, b, train=True,
                                    rngs={"noise": jax.random.PRNGKey(1)})
                return preds["rgb"].sum() + preds["alpha"].sum()
            return jax.grad(f)(p)

        t0 = time.time()
        t = timeit(mbwd, params, jb)
        print(f"model fwd+bwd: {t*1e3:9.1f} ms (compile {time.time()-t0-2*t:.0f}s)",
              flush=True)

    if "full_step" in sections:
        import optax
        from functools import partial

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, o, b, r, it):
            def loss(p):
                preds = model.apply(p, b, train=True, rngs={"noise": r})
                return loss_fn(preds, b, it)[0]
            total, grads = jax.value_and_grad(loss)(p)
            upd, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, upd), o, total

        t0 = time.time()
        params, opt_state, total = step(params, opt_state, jb, rng, it0)
        _ = float(total)
        print(f"full step compile+1: {time.time()-t0:9.1f} s", flush=True)
        t1 = time.time()
        for _ in range(2):
            params, opt_state, total = step(params, opt_state, jb, rng, it0)
        _ = float(total)
        print(f"full step:     {(time.time()-t1)/2*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
