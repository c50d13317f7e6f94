"""Kernel-level on-device parity: rasterize_tiled_pl vs XLA rasterize_tiled
on IDENTICAL binning arrays — isolates the Pallas bwd kernel from the
projection/binning front-end. Compares each gradient operand separately.

Configure OVERFLOW-FREE (no tile above max_pairs_per_tile): the two paths
truncate overflow tiles over different windows and would composite
different pair sets (see probe_parity.py docstring).

  python scripts/probe_parity_kernel.py
  N=262144 H=1024 W=672 python scripts/probe_parity_kernel.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import goliath_tpu

goliath_tpu.enable_compilation_cache()

from goliath_tpu.ops import gsplat  # noqa: E402
from goliath_tpu.ops import gsplat_pallas  # noqa: E402
from probe_renderer import make_scene  # noqa: E402


def main():
    n = int(os.environ.get("N", 32 * 1024))
    h = int(os.environ.get("H", 512))
    w = int(os.environ.get("W", 512))
    ts = int(os.environ.get("TS", 32))
    mppt = int(os.environ.get("MPPT", 4096))
    chunk = int(os.environ.get("CHUNK", 256))
    inner = int(os.environ.get("INNER", 64))
    ntx, nty = -(-w // ts), -(-h // ts)
    scene = make_scene(n, h, w)

    xys, conics, op_s, chan, valid, radii, b = jax.jit(
        lambda: gsplat.prepare_sample(
            scene["K"][0], scene["Rt"][0], scene["primpos"][0],
            scene["primqvec"][0], scene["primscale"][0],
            scene["opacity"][0], scene["colors"][0], h, w, ts,
            pair_budget=2 * n, return_depth=False)
    )()
    barrays = (b.sorted_prim, b.tile_start, b.tile_end, valid, b.perm,
               b.prim_offsets, b.prim_ends, b.tile_of_pair)

    def loss_of(raster):
        def loss(xys, conics, op, col):
            out, T = raster(xys, conics, op, col)
            wgt = 1.0 + 0.1 * jnp.arange(out.size).reshape(out.shape) / out.size
            return (out * wgt).sum() + 0.3 * (1.0 - T).sum()
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))

    f_xla = loss_of(lambda x, c, o, cc: gsplat.rasterize_tiled(
        x, c, o, cc, barrays, h, w, ts, mppt, min(chunk, 64), ntx, nty))
    f_pl = loss_of(lambda x, c, o, cc: gsplat_pallas.rasterize_tiled_pl(
        x, c, o, cc, barrays, h, w, ts, mppt, chunk, inner, ntx, nty))

    v1, g1 = f_xla(xys, conics, op_s, chan)
    v2, g2 = f_pl(xys, conics, op_s, chan)
    print(f"loss: xla={float(v1):.6g} pallas={float(v2):.6g} "
          f"rel={abs(float(v1) - float(v2)) / abs(float(v1)):.2e}")
    names = ["xys", "conics", "opacity", "colors"]
    worst = 0.0
    for name, a_, b_ in zip(names, g2, g1):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        scale = np.abs(b_).max() + 1e-12
        rel = np.abs(a_ - b_).max() / scale
        cos = float((a_ * b_).sum() /
                    (np.linalg.norm(a_) * np.linalg.norm(b_) + 1e-12))
        print(f"  {name:8s} max|d|/max|g| = {rel:.3e}  cos = {cos:.6f}")
        worst = max(worst, rel)
    ok = worst < 1e-2
    print("KERNEL PARITY OK" if ok else "KERNEL PARITY FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
