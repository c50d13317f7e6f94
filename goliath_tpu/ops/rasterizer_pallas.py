"""Pallas TPU kernel for the mesh-rasterizer z-buffer scan.

The XLA-scan z-buffer (ops/rasterizer.py rasterize) streams every tile's
face chunks through HBM each step; this kernel keeps the per-pixel best
(z, pair) in VMEM scratch across grid steps with the same scalar-prefetched
block indexing as the gsplat compositor (ops/gsplat_pallas.py). The
reduction is an associative min, so no replay/cutoff machinery is needed
and the op stays non-differentiable (it returns indices), like drtk's
rasterize.

urhand renders B*L shadow-map depth passes per step on this op
(reference ca_code/models/urhand.py:404-417), so it multiplies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_DEPTH = 3.0e38


def _zbuffer_kernel(
    start_ref, end_ref,        # scalar prefetch [T]
    rows_ref,                  # [chunk, 16] face rows (auto-pipelined)
    out_ref,                   # [1, 2, P]: best z, best pair index (f32)
    z_scr, s_scr,              # VMEM [1, P] scratch
    *, chunk: int, inner: int, tile_size: int, ntx: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    start = start_ref[t]
    end = end_ref[t]
    P = tile_size * tile_size

    @pl.when(j == 0)
    def _():
        z_scr[:] = jnp.full((1, P), BIG_DEPTH, jnp.float32)
        s_scr[:] = jnp.full((1, P), -1.0, jnp.float32)

    base = (start // chunk + j) * chunk
    have_work = (base < end) & (base + chunk > start)

    @pl.when(have_work)
    def _():
        tx = (t % ntx) * tile_size
        ty = (t // ntx) * tile_size
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px = (pix_i % tile_size + tx).astype(jnp.float32) + 0.5
        py = (pix_i // tile_size + ty).astype(jnp.float32) + 0.5

        def sub(si, _):
            off = si * inner
            data = rows_ref[pl.ds(off, inner), :]     # [IN, 16]
            ridx = (base + off + jax.lax.broadcasted_iota(
                jnp.int32, (inner, 1), 0))
            m = (ridx >= start) & (ridx < end)

            # edge functions E_k = a_k px + b_k py + c_k (normalized to
            # positive-inside); rows layout: a(3) b(3) c(3) |inv_area| iz(3)
            E0 = data[:, 0:1] * px + data[:, 3:4] * py + data[:, 6:7]
            E1 = data[:, 1:2] * px + data[:, 4:5] * py + data[:, 7:8]
            E2 = data[:, 2:3] * px + data[:, 5:6] * py + data[:, 8:9]
            inside = (E0 >= 0.0) & (E1 >= 0.0) & (E2 >= 0.0) & m
            izp = (E0 * data[:, 10:11] + E1 * data[:, 11:12]
                   + E2 * data[:, 12:13]) * data[:, 9:10]
            zp = 1.0 / jnp.maximum(izp, 1e-12)
            zp = jnp.where(inside & (izp > 0.0), zp, BIG_DEPTH)  # [IN, P]

            zmin = jnp.min(zp, axis=0, keepdims=True)          # [1, P]
            rix = jnp.broadcast_to(ridx.astype(jnp.float32), zp.shape)
            smin = jnp.min(jnp.where(zp == zmin, rix, 3.0e38),
                           axis=0, keepdims=True)
            upd = zmin < z_scr[:]
            s_scr[:] = jnp.where(upd, smin, s_scr[:])
            z_scr[:] = jnp.where(upd, zmin, z_scr[:])
            return 0

        lax.fori_loop(0, chunk // inner, sub, 0)

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, 0:1] = z_scr[:]
        out_ref[0, 1:2] = s_scr[:]


def rasterize_zbuffer_pallas(
    an, bn, cn,            # [F, 3] normalized edge coefficients
    inv_area_abs,          # [F]
    inv_z,                 # [F, 3]
    valid,                 # [F] float (0 masks the face out)
    sorted_prim, tile_start, tile_end,
    img_h: int, img_w: int, tile_size: int, ntx: int, nty: int,
    chunk: int = 32,
    inner: int = 32,
    max_faces_per_tile: int = 256,
    interpret: bool = False,
):
    """Per-pixel (face index, depth) via the Pallas z-buffer kernel.

    Returns (index_img [H, W] int32 with -1 empty, z_img [H, W])."""
    F = an.shape[0]
    budget = sorted_prim.shape[0]
    P = tile_size * tile_size
    nchunks = max_faces_per_tile // chunk + 1  # +1 for the alignment shift

    # the op is non-differentiable (returns indices; drtk semantics) but
    # pallas_call has no JVP rule — cut tangents BEFORE the kernel so
    # jax.grad through callers skips it entirely
    an, bn, cn, inv_area_abs, inv_z, valid = map(
        lax.stop_gradient, (an, bn, cn, inv_area_abs, inv_z, valid))

    gi = jnp.clip(sorted_prim, 0, F - 1)
    # invalid faces get inv_area 0 -> izp 0 -> zp BIG (never wins)
    ia = (inv_area_abs * valid)[gi][:, None]
    rows = jnp.concatenate(
        [an[gi], bn[gi], cn[gi], ia, inv_z[gi],
         jnp.zeros((budget, 3), an.dtype)], axis=1,
    )  # [budget, 16]
    # pad to the deepest block the index_map can request (see
    # gsplat_pallas.rasterize_tiled_pallas_fwd)
    rows = jnp.pad(rows, ((0, nchunks * chunk), (0, 0)))

    T_tiles = ntx * nty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles, nchunks),
        in_specs=[pl.BlockSpec(
            (chunk, 16),
            lambda t, j, start, end: (start[t] // chunk + j, 0),
        )],
        out_specs=pl.BlockSpec(
            (1, 2, P), lambda t, j, start, end: (t, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _zbuffer_kernel, chunk=chunk, inner=inner, tile_size=tile_size,
        ntx=ntx,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_tiles, 2, P), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_end, rows)

    def untile(x):
        x = x.reshape(nty, ntx, tile_size, tile_size)
        return x.transpose(0, 2, 1, 3).reshape(
            nty * tile_size, ntx * tile_size)[:img_h, :img_w]

    z_img = untile(out[:, 0])
    s_img = untile(out[:, 1]).astype(jnp.int32)
    hit = (z_img < BIG_DEPTH) & (s_img >= 0)
    face = sorted_prim[jnp.clip(s_img, 0, budget - 1)]
    index_img = jnp.where(hit, face, -1).astype(jnp.int32)
    return lax.stop_gradient(index_img), lax.stop_gradient(z_img)
