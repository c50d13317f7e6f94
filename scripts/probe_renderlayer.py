"""Time one mesh-rasterizer RenderLayer pass at URHand scale (fwd and bwd).

  python scripts/probe_renderlayer.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import goliath_tpu

goliath_tpu.enable_compilation_cache()

from goliath_tpu.data.synthetic import SyntheticDataset  # noqa: E402
from goliath_tpu.ops.rasterizer import RenderLayer  # noqa: E402


def timeit(fn, *args, n=4):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    h, w, uv = 2048, 1344, 1024
    ds = SyntheticDataset(n_cams=2, n_frames=2, img_h=h, img_w=w,
                          uv_size=uv, seed=0)
    a = ds.static_assets
    rl = RenderLayer(h=h, w=w, vi=np.asarray(a.topology.vi),
                     vt=np.asarray(a.topology.vt),
                     vti=np.asarray(a.topology.vti), flip_uvs=False)
    b = next(ds.batches(1, 1))
    verts = jnp.asarray(b["registration_vertices"])
    K = jnp.asarray(b["K"])
    Rt = jnp.asarray(b["Rt"])
    tex = jnp.ones((1, 4, uv, uv))

    @jax.jit
    def fwd(verts, tex):
        out = rl(verts, tex, K, Rt, edge_grad=False)
        return out["render"].sum()

    t = timeit(fwd, verts, tex)
    print(f"renderlayer fwd (no edge): {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def fwd_eg(verts, tex):
        out = rl(verts, tex, K, Rt, edge_grad=True)
        return out["render"].sum()

    t = timeit(fwd_eg, verts, tex)
    print(f"renderlayer fwd (edge):    {t*1e3:8.1f} ms", flush=True)

    @jax.jit
    def bwd(verts, tex):
        g = jax.grad(lambda v, t: rl(
            v, t, K, Rt, edge_grad=True)["render"].sum(), argnums=(0, 1))(
            verts, tex)
        return sum(x.sum() for x in g)

    t = timeit(bwd, verts, tex)
    print(f"renderlayer fwd+bwd:       {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
