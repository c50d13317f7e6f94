"""Pallas compositor parity vs the XLA-scan compositor (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from goliath_tpu.ops import gsplat
from goliath_tpu.ops.binning import bin_to_tiles
from goliath_tpu.ops.gsplat_pallas import rasterize_tiled_pallas_fwd


def test_pallas_matches_xla_compositor(rng):
    from tests.test_gsplat import _setup

    H, W = 48, 64
    xys, conics, radii, valid, op, col, depths = _setup(rng, H, W)
    ts = 16
    ntx, nty = -(-W // ts), -(-H // ts)
    t_min = jnp.stack(
        [jnp.floor((xys[:, 0] - radii) / ts),
         jnp.floor((xys[:, 1] - radii) / ts)], -1).astype(jnp.int32)
    t_max = jnp.stack(
        [jnp.floor((xys[:, 0] + radii) / ts) + 1,
         jnp.floor((xys[:, 1] + radii) / ts) + 1], -1).astype(jnp.int32)
    binning = bin_to_tiles(t_min, t_max, valid & (radii > 0), ntx, nty, 64)

    ref_out, ref_T = gsplat.rasterize_tiled(
        xys, conics, op, col,
        (binning.sorted_prim, binning.tile_start, binning.tile_end, valid),
        H, W, ts, 128, 16, ntx, nty,
    )
    out, T, _cnt = rasterize_tiled_pallas_fwd(
        xys, conics, op, col, valid.astype(jnp.float32),
        binning.sorted_prim, binning.tile_start, binning.tile_end,
        H, W, ts, ntx, nty, chunk=32, inner=16, max_pairs_per_tile=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(T), np.asarray(ref_T),
                               atol=2e-3, rtol=1e-3)

def test_pallas_vjp_matches_xla(rng):
    """Full custom-VJP Pallas path (fwd + bwd kernels, interpret mode) vs
    the XLA custom-VJP rasterizer: outputs and input grads must agree."""
    import jax
    from goliath_tpu.ops import gsplat_pallas

    from tests.test_gsplat import _setup

    H, W = 48, 64
    xys, conics, radii, valid, op, col, depths = _setup(rng, H, W)
    ts = 16
    ntx, nty = -(-W // ts), -(-H // ts)
    t_min = jnp.stack(
        [jnp.floor((xys[:, 0] - radii) / ts),
         jnp.floor((xys[:, 1] - radii) / ts)], -1).astype(jnp.int32)
    t_max = jnp.stack(
        [jnp.floor((xys[:, 0] + radii) / ts) + 1,
         jnp.floor((xys[:, 1] + radii) / ts) + 1], -1).astype(jnp.int32)
    binning = bin_to_tiles(t_min, t_max, valid & (radii > 0), ntx, nty, 64)
    barrays = (binning.sorted_prim, binning.tile_start, binning.tile_end,
               valid, binning.inv_perm, binning.prim_offsets,
               binning.prim_ends)

    def loss_xla(xys, conics, op, col):
        out, T = gsplat.rasterize_tiled(
            xys, conics, op, col, barrays, H, W, ts, 128, 16, ntx, nty)
        return (out * out).sum() + (T * 1.7).sum()

    def loss_pl(xys, conics, op, col):
        out, T = gsplat_pallas.rasterize_tiled_pl(
            xys, conics, op, col, barrays, H, W, ts, 128, 32, 16, ntx, nty)
        return (out * out).sum() + (T * 1.7).sum()

    gsplat_pallas.INTERPRET = True
    try:
        v_ref, g_ref = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3))(
            xys, conics, op, col)
        v_pl, g_pl = jax.value_and_grad(loss_pl, argnums=(0, 1, 2, 3))(
            xys, conics, op, col)
    finally:
        gsplat_pallas.INTERPRET = False

    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=1e-4)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)
