"""On-device parity probe: Pallas vs XLA compositor grads at mid scale.

Interpret-mode CPU tests miss hardware-only effects (matmul precision, OOB
DMA clamping, early-out replay), so this compares the two production paths
on the real TPU. Run after any kernel-math change.

IMPORTANT: configure so NO tile overflows max_pairs_per_tile — the XLA
compositor truncates overflow tiles to [start, start + mppt) while the
Pallas kernel covers [align(start), align + nchunks*chunk); on overflow
tiles they composite DIFFERENT pair sets and the comparison is meaningless
(grads of the symmetric-difference pairs show up as huge spurious diffs).
The defaults below are overflow-free for the probe scene.

  python scripts/probe_parity.py            # 128k gaussians, 1024x672
  N=1048576 H=2048 W=1344 python scripts/probe_parity.py   # full scale
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

from probe_renderer import make_scene  # noqa: E402

from goliath_tpu.ops.gsplat import render  # noqa: E402


def main():
    n = int(os.environ.get("N", 128 * 1024))
    h = int(os.environ.get("H", 1024))
    w = int(os.environ.get("W", 672))
    ts = int(os.environ.get("TS", 32))
    mppt = int(os.environ.get("MPPT", 4096))
    chunk = int(os.environ.get("CHUNK", 256))
    inner = int(os.environ.get("INNER", 64))
    scene = make_scene(n, h, w)

    def grads(use_pallas):
        def loss(pos, col, op, scale):
            out = render(
                w, h, scene["K"], scene["Rt"], pos, scene["primqvec"],
                scale, op, col, tile_size=ts, max_pairs_per_tile=mppt,
                chunk=chunk, pallas_inner=inner, pair_budget_mult=2,
                use_pallas=use_pallas,
            )
            # weighted sums exercise both dL/dout and dL/dT paths
            rgb = out["render"]
            wgt = 1.0 + 0.1 * jnp.arange(rgb.size).reshape(rgb.shape) / rgb.size
            return (rgb * wgt).sum() + 0.3 * out["alpha"].sum()

        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
        val, g = f(scene["primpos"], scene["colors"], scene["opacity"],
                   scene["primscale"])
        return float(val), [np.asarray(x) for x in g]

    v_pl, g_pl = grads(True)
    v_xla, g_xla = grads(False)
    print(f"loss: pallas={v_pl:.6g} xla={v_xla:.6g} "
          f"rel={abs(v_pl - v_xla) / abs(v_xla):.2e}")
    names = ["primpos", "colors", "opacity", "primscale"]
    worst = 0.0
    for name, a, b in zip(names, g_pl, g_xla):
        scale = np.abs(b).max() + 1e-12
        rel = np.abs(a - b).max() / scale
        cos = float((a * b).sum() /
                    (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        print(f"  {name:10s} max|d|/max|g| = {rel:.3e}  cos = {cos:.6f}")
        worst = max(worst, rel)
    ok = worst < 2e-2
    print("PARITY OK" if ok else "PARITY FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
