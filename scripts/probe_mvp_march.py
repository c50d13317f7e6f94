"""On-chip ablation of the MVP march hot path (r5 hand crash/perf work).

Builds a bench-scale synthetic march input and times mvp_raymarch_tiled
fwd and fwd+bwd under ablations:

  full        — as-is
  nodeposit   — one-hot deposit replaced by a fixed-offset window add
                (wrong image, same sampling cost) via GOLIATH_MVP_ABLATE
  nosample    — sample_prims replaced by a constant (deposit cost only)

Env: GOLIATH_PROBE_{H,W,UV,STEPS,WINDOW,CHUNK,MPPT,TILEGROUP}
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=2):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.time() - t0) / n


def main():
    H = int(os.environ.get("GOLIATH_PROBE_H", 512))
    W = int(os.environ.get("GOLIATH_PROBE_W", 336))
    uv = int(os.environ.get("GOLIATH_PROBE_UV", 256))
    S = int(os.environ.get("GOLIATH_PROBE_STEPS", 128))
    Sp = int(os.environ.get("GOLIATH_PROBE_WINDOW", 16))
    chunk = int(os.environ.get("GOLIATH_PROBE_CHUNK", 16))
    mppt = int(os.environ.get("GOLIATH_PROBE_MPPT", 64))
    tg = int(os.environ.get("GOLIATH_PROBE_TILEGROUP", 32))
    ps = 16
    K = (uv // ps) ** 2

    from goliath_tpu.ops import mvp
    from goliath_tpu.ops.raygen import compute_raydirs, make_pixelcoords
    from goliath_tpu.utils.quaternion import quat_to_matrix

    rng = np.random.RandomState(0)
    # hand-like cloud: prims in a ball of radius .5, extents ~1/100*400=4mm
    primpos = (rng.rand(K, 3).astype(np.float32) - 0.5) * 0.8
    q = rng.randn(K, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    primrot = np.asarray(quat_to_matrix(jnp.asarray(q)))
    primscale = np.full((K, 3), 25.0, np.float32)  # span ~8 steps at dt=.005
    template = rng.rand(K, 4, ps, ps, ps // 2).astype(np.float32)

    viewpos = np.asarray([[0.0, 0.0, -3.0]], np.float32)
    viewrot = np.eye(3, dtype=np.float32)[None]
    focal = np.asarray([[2.0 * W, 2.0 * W]], np.float32)
    princpt = np.asarray([[W / 2, H / 2]], np.float32)
    pix = make_pixelcoords(1, H, W)
    rp, rd, tminmax = compute_raydirs(
        jnp.asarray(viewpos), jnp.asarray(viewrot), jnp.asarray(focal),
        jnp.asarray(princpt), pix, volradius=1.0)
    K_cam = np.asarray([[2.0 * W, 0, W / 2], [0, 2.0 * W, H / 2], [0, 0, 1]],
                       np.float32)
    Rt = np.concatenate([viewrot[0], -viewrot[0] @ viewpos[0][:, None]], 1)
    dt = 2.0 / 400.0  # bench dt

    args = (rp[0], rd[0], dt, tminmax[0], jnp.asarray(primpos),
            jnp.asarray(primrot), jnp.asarray(primscale),
            jnp.asarray(template), jnp.asarray(K_cam),
            jnp.asarray(Rt.astype(np.float32)))
    kw = dict(max_steps=S, max_prims_per_tile=mppt, chunk=chunk,
              tile_group=tg, window_steps=Sp)

    def make_fns():
        # FRESH function objects per mode: jax.jit's global cache is keyed
        # on the function object, so reusing one `fwd` across modes silently
        # reuses the FIRST mode's trace (r5 lesson: the env-ablation knob
        # appeared dead because of this)
        def fwd(*a):
            return mvp.mvp_raymarch_tiled(*a, **kw).sum()

        # grad target: template (default; exercises the tap-scatter
        # adjoint) or primpos (geometry-only adjoint) via
        # GOLIATH_PROBE_GRAD=primpos
        gi = 4 if os.environ.get("GOLIATH_PROBE_GRAD") == "primpos" else 7

        def fwdbwd(*a):
            return jax.grad(lambda v: mvp.mvp_raymarch_tiled(
                *a[:gi], v, *a[gi + 1:], **kw).sum())(a[gi])
        return fwd, fwdbwd

    for mode in os.environ.get("GOLIATH_PROBE_MODES",
                               "full,nodeposit,nosample").split(","):
        os.environ["GOLIATH_MVP_ABLATE"] = "" if mode == "full" else mode
        fwd, fwdbwd = make_fns()
        f = jax.jit(fwd)
        fb = jax.jit(fwdbwd)
        t_f = timeit(f, *args)
        t_fb = timeit(fb, *args)
        print(f"{mode:10s} fwd {t_f*1e3:8.1f} ms   fwd+bwd {t_fb*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
