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
               valid, binning.perm, binning.prim_offsets,
               binning.prim_ends, binning.tile_of_pair)

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


def test_pallas_overflow_tile_grads(rng):
    """Tiles with more pairs than the kernel's block budget: overflow pairs
    were never composited, so their grads must be exactly zero, and they
    must not steal the NEXT tile's private-buffer gradients (ADVICE r1).
    Verified against autodiff of a jnp oracle with identical coverage
    (finite differences are unusable here: alphas near ALPHA_MIN cross the
    keep-mask discontinuity under perturbation)."""
    import jax
    from goliath_tpu.ops import gsplat_pallas

    H, W = 16, 32          # two 16px tiles side by side
    ts = 16
    ntx, nty = 2, 1
    N = 72                 # tile 0 gets 60 prims (> budget 32+16), tile 1 gets 12
    maxppt, chunk, inner = 32, 16, 8

    n0 = 60
    cx = np.concatenate([np.full(n0, 8.0), np.full(N - n0, 24.0)])
    cy = np.full(N, 8.0)
    xys = jnp.asarray(np.stack([cx + rng.uniform(-4, 4, N),
                                cy + rng.uniform(-6, 6, N)], -1),
                      jnp.float32)
    conics = jnp.asarray(np.tile(np.array([[0.25, 0.0, 0.25]]), (N, 1)),
                         jnp.float32)
    op = jnp.asarray(rng.uniform(0.02, 0.08, (N, 1)), jnp.float32)
    col = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    valid = jnp.ones((N,), bool)
    radii = jnp.full((N,), 3.0)

    from goliath_tpu.ops.binning import bin_to_tiles
    t_min = jnp.stack(
        [jnp.floor((xys[:, 0] - radii) / ts),
         jnp.floor((xys[:, 1] - radii) / ts)], -1).astype(jnp.int32)
    t_max = jnp.stack(
        [jnp.floor((xys[:, 0] + radii) / ts) + 1,
         jnp.floor((xys[:, 1] + radii) / ts) + 1], -1).astype(jnp.int32)
    binning = bin_to_tiles(t_min, t_max, valid, ntx, nty, 16, 4 * N)
    barrays = (binning.sorted_prim, binning.tile_start, binning.tile_end,
               valid, binning.perm, binning.prim_offsets,
               binning.prim_ends, binning.tile_of_pair)
    # confirm the scene actually overflows the block budget on tile 0
    npairs0 = int(binning.tile_end[0] - binning.tile_start[0])
    nblock_cap = (maxppt // chunk + 1) * chunk
    assert npairs0 > nblock_cap, (npairs0, nblock_cap)

    def loss(op):
        out, T = gsplat_pallas.rasterize_tiled_pl(
            xys, conics, op, col, barrays, H, W, ts, maxppt, chunk, inner,
            ntx, nty)
        return (out * out).sum() + (T * 1.7).sum()

    # jnp oracle with IDENTICAL coverage: per tile, rows
    # [align, align + nchunks*chunk) intersect [start, end)
    start_np = np.asarray(binning.tile_start)
    end_np = np.asarray(binning.tile_end)
    sp_np = np.asarray(binning.sorted_prim)
    ALPHA_CLIP, ALPHA_MIN = 0.999, 1.0 / 255.0

    def oracle(op):
        outs, Ts = [], []
        for t in range(ntx * nty):
            s0, e0 = int(start_np[t]), int(end_np[t])
            align = (s0 // chunk) * chunk
            idx = sp_np[s0:min(e0, align + nblock_cap)]
            txo = (t % ntx) * ts
            ys = jnp.arange(ts, dtype=jnp.float32) + 0.5
            xs = jnp.arange(ts, dtype=jnp.float32) + 0.5 + txo
            pxx, pyy = jnp.meshgrid(xs, ys, indexing="xy")
            pix = jnp.stack([pxx, pyy], -1).reshape(-1, 2)
            x = xys[idx]; cnc = conics[idx]
            o = op.reshape(-1)[idx]; cl = col[idx]
            d = x[:, None, :] - pix[None]
            a, b, c = cnc[:, 0:1], cnc[:, 1:2], cnc[:, 2:3]
            sig = (0.5 * (a * d[..., 0]**2 + c * d[..., 1]**2)
                   + b * d[..., 0] * d[..., 1])
            alpha = jnp.minimum(
                ALPHA_CLIP, o[:, None] * jnp.exp(-jnp.clip(sig, 0, 60)))
            alpha = jnp.where((sig >= 0) & (alpha >= ALPHA_MIN), alpha, 0.0)
            om = 1 - alpha
            w = alpha * jnp.cumprod(om, 0) / om
            outs.append(jnp.einsum("np,nc->cp", w, cl))
            Ts.append(jnp.prod(om, 0))
        return ((jnp.stack(outs)**2).sum()
                + (jnp.stack(Ts) * 1.7).sum())

    g_oracle = np.asarray(jax.grad(oracle)(op)).reshape(-1)
    gsplat_pallas.INTERPRET = True
    try:
        np.testing.assert_allclose(float(loss(op)), float(oracle(op)),
                                   rtol=1e-4)
        g = np.asarray(jax.grad(loss)(op)).reshape(-1)
    finally:
        gsplat_pallas.INTERPRET = False

    np.testing.assert_allclose(g, g_oracle, atol=2e-3, rtol=2e-3)
    # overflow pairs (beyond the composited blocks) contribute nothing
    # forward, so their prims must have exactly-zero analytic grads unless
    # they also appear within budget (they don't here: 1 tile per prim)
    sorted_prim = np.asarray(binning.sorted_prim)
    start0 = int(binning.tile_start[0])
    align0 = (start0 // chunk) * chunk
    over = sorted_prim[align0 + nblock_cap:int(binning.tile_end[0])]
    assert len(over) > 0
    np.testing.assert_allclose(g[over], 0.0, atol=1e-7)


def test_cumsum_kernels_interpret(rng):
    """Pallas carry-cumsum kernels match numpy (interpret mode)."""
    from goliath_tpu.ops import gsplat_pallas as gp

    x = rng.standard_normal((1000, 10)).astype(np.float32)
    out = gp.cumsum_rows_pl(jnp.asarray(x), block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.cumsum(x, 0),
                               rtol=1e-5, atol=1e-3)

    v = rng.randint(0, 7, size=5000).astype(np.int32)
    out1 = gp.cumsum1d_pl(jnp.asarray(v), rows=16, lanes=128,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out1).astype(np.int64),
                                  np.cumsum(v))

    # batched lane-dense variant: per-column cumsums off payload columns
    cols = [jnp.asarray(rng.standard_normal(3000).astype(np.float32))
            for _ in range(5)]
    outc = gp.cumsum_cols_pl(cols, rows=4, lanes=128, interpret=True)
    assert outc.shape == (5, 3000)
    for f in range(5):
        np.testing.assert_allclose(np.asarray(outc[f]),
                                   np.cumsum(np.asarray(cols[f])),
                                   rtol=1e-5, atol=1e-3)


def test_reduce_sorted_pair_grads_tpu_branch(rng, monkeypatch):
    """The TPU lane-dense reduce branch (sort -> cumsum_cols_pl -> boundary
    diff) must match the generic presort reduction. Forced on CPU by
    monkeypatching the backend gate + interpret mode."""
    import jax

    import goliath_tpu.ops.gsplat as gs
    from goliath_tpu.ops import gsplat_pallas as gp

    budget, F, N = 4096, 10, 300
    sorted_g = jnp.asarray(rng.standard_normal((budget, F)).astype(
        np.float32))
    perm = jnp.asarray(rng.permutation(budget).astype(np.int32))
    counts = rng.randint(0, 9, N).astype(np.int32)
    total = int(counts.sum())
    assert total < budget
    ends = np.cumsum(counts).astype(np.int32)
    offsets = (ends - counts).astype(np.int32)

    ref = gs.reduce_presort_pair_grads(
        jnp.stack(jax.lax.sort(
            (perm,) + tuple(sorted_g[:, i] for i in range(F)),
            num_keys=1, is_stable=False)[1:], axis=1),
        jnp.asarray(offsets), jnp.asarray(ends))

    real_ccp = gp.cumsum_cols_pl
    monkeypatch.setattr(gs, "target_backend", lambda: "tpu")
    monkeypatch.setattr(
        gp, "cumsum_cols_pl",
        lambda cols, **kw: real_ccp(cols, rows=8, interpret=True))
    out = gs.reduce_sorted_pair_grads(
        sorted_g, perm, jnp.asarray(offsets), jnp.asarray(ends))
    # channel-first contract: [F, N]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref).T,
                               rtol=1e-4, atol=1e-3)
