"""Section timing for the mesh_vae train step at reference scale.

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
    img_w = int(os.environ.get("GOLIATH_PROF_IMG_W", 1334))
    uv = int(os.environ.get("GOLIATH_PROF_UV", 1024))
    batch = int(os.environ.get("GOLIATH_PROF_BATCH", 1))
    sections = set(sys.argv[1:]) or {
        "model_fwd", "model_bwd", "noseam", "noshadow", "noupscale",
        "norender", "full_step"}

    os.environ.setdefault("GOLIATH_BENCH_MODEL", "mesh_vae")

    # Ablation monkeypatches (each section rebuilds nothing — the linen
    # modules are re-instantiated per trace, so patching the CLASS before
    # the jit trace is enough; restore after).
    import contextlib

    @contextlib.contextmanager
    def ablate(kind):
        if kind == "noseam":
            from goliath_tpu.utils import seams as _s
            orig = (_s.SeamSampler.impaint, _s.SeamSampler.resample)
            _s.SeamSampler.impaint = lambda self, x: x
            _s.SeamSampler.resample = lambda self, x: x
            try:
                yield
            finally:
                _s.SeamSampler.impaint, _s.SeamSampler.resample = orig
        elif kind == "noshadow":
            from goliath_tpu.nn import shadow as _sh
            orig = _sh.ShadowUNet.__call__

            def fake(self, ao):
                B = ao.shape[0]
                s = self.uv_size
                one = jnp.ones((B, 1, s, s), jnp.float32) * (1.0 + 0.0 * ao.mean())
                return {"shadow_map": one, "ao_map": ao}
            _sh.ShadowUNet.__call__ = fake
            try:
                yield
            finally:
                _sh.ShadowUNet.__call__ = orig
        elif kind == "noupscale":
            from goliath_tpu.models import mesh_vae as _mv
            orig = _mv.UpscaleNet.__call__

            def fake(self, x):
                B = x.shape[0]
                T2 = x.shape[-1] * self.upscale_factor
                return jnp.zeros((B, self.out_channels, T2, T2),
                                 jnp.float32) * x.mean()
            _mv.UpscaleNet.__call__ = fake
            try:
                yield
            finally:
                _mv.UpscaleNet.__call__ = orig
        elif kind == "norender":
            from goliath_tpu.ops import rasterizer as _rz
            orig = _rz.RenderLayer.__call__

            def fake(self, verts, tex, K, Rt, **kw):
                B = tex.shape[0]
                m = tex.mean((1, 2, 3)) + 0.0 * verts.mean((1, 2))
                render = jnp.broadcast_to(
                    m[:, None, None, None], (B, tex.shape[1], self.h, self.w))
                depth = jnp.broadcast_to(
                    verts.mean((1, 2))[:, None, None], (B, self.h, self.w))
                return {"render": render, "depth_img": depth,
                        "mask": depth > 0}
            _rz.RenderLayer.__call__ = fake
            try:
                yield
            finally:
                _rz.RenderLayer.__call__ = orig
        else:
            yield

    from bench import build_mesh_vae

    model, loss_fn, optimizer, params, opt_state, jb = build_mesh_vae(
        img_h, img_w, uv, batch)
    rng = jax.random.PRNGKey(0)
    it0 = jnp.asarray(0)
    print(f"== mesh_vae profile: {img_h}x{img_w}, uv={uv}, batch={batch}")

    def bwd_time(tag):
        @jax.jit
        def mbwd(p, b):
            def f(p):
                preds = model.apply(p, b, train=True,
                                    rngs={"noise": jax.random.PRNGKey(1)})
                return preds["rgb"].sum()
            g = jax.grad(f)(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        t = timeit(mbwd, params, jb)
        print(f"{tag:24s} {t*1e3:8.1f} ms", flush=True)

    for kind in ("noseam", "noshadow", "noupscale", "norender"):
        if kind in sections:
            with ablate(kind):
                bwd_time(f"fwd+bwd [{kind}]:")

    if "model_fwd" in sections:
        @jax.jit
        def mfwd(p, b):
            preds = model.apply(p, b, train=True, rngs={"noise": jax.random.PRNGKey(1)})
            return preds["rgb"].sum()

        t = timeit(mfwd, params, jb)
        print(f"model fwd:               {t*1e3:8.1f} ms", flush=True)

    if "model_bwd" in sections:
        @jax.jit
        def mbwd(p, b):
            def f(p):
                preds = model.apply(p, b, train=True, rngs={"noise": jax.random.PRNGKey(1)})
                return preds["rgb"].sum()
            g = jax.grad(f)(p)
            return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        t = timeit(mbwd, params, jb)
        print(f"model fwd+bwd:           {t*1e3:8.1f} ms", flush=True)

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
