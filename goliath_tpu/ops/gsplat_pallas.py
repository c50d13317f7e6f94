"""Pallas TPU kernel for the gaussian-splat tile compositor.

The XLA-scan compositor (ops/gsplat.py) computes a *fixed* chunk budget per
tile and cannot terminate early. This kernel processes each 16px tile as one
grid step, reading pair-ordered gaussian data (pre-gathered, so DMAs are
contiguous), with:

  * scalar-prefetched per-tile [start, end) bounds driving a dynamic
    while_loop trip count (empty tiles cost ~nothing);
  * early termination when every pixel's transmittance falls below the
    saturation threshold (the gsplat CUDA kernel's T < 1e-4 break);
  * the within-chunk ordering handled by a cumprod over the chunk axis.

The custom-VJP backward stays on the XLA path (ops/gsplat.py) — it is a
re-march with scatter accumulation that XLA already pipelines well; fusing
it into Pallas is a later optimization.

Data layout: pairs [budget, 8+C] rows = (x, y, a, b, c, opac, pad, pad,
colors...) pre-gathered by `sorted_prim`, padded to a lane-friendly width.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_CLIP = 0.999
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _compositor_kernel(
    start_ref, end_ref,            # scalar prefetch [T]
    pairs_ref,                     # [budget_pad, F] in ANY/HBM
    out_ref,                       # [1, F_out, P] block per tile
    scratch_ref, sem_ref,          # VMEM scratch [2, CH, F], DMA sems
    *, chunk: int, tile_size: int, ntx: int, n_chan: int, feat: int,
):
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    P = tile_size * tile_size

    tx = (t % ntx) * tile_size
    ty = (t // ntx) * tile_size
    pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (pix_i % tile_size + tx).astype(jnp.float32) + 0.5
    py = (pix_i // tile_size + ty).astype(jnp.float32) + 0.5

    n_chunks = (end - start + chunk - 1) // chunk

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            pairs_ref.at[pl.ds(start + ci * chunk, chunk)],
            scratch_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        ci, T, _ = state
        return (ci < n_chunks) & (jnp.max(T) > T_EPS)

    def body(state):
        ci, T, acc = state
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        data = scratch_ref[slot]                     # [CH, F]
        m = (start + ci * chunk
             + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)) < end

        xy_x = data[:, 0:1]
        xy_y = data[:, 1:2]
        ca = data[:, 2:3]
        cb = data[:, 3:4]
        cc = data[:, 4:5]
        op = data[:, 5:6]
        d0 = xy_x - px                                # [CH, P]
        d1 = xy_y - py
        sigma = 0.5 * (ca * d0 * d0 + cc * d1 * d1) + cb * d0 * d1
        sigma_safe = jnp.clip(sigma, 0.0, 60.0)
        raw = op * jnp.exp(-sigma_safe)
        alpha = jnp.minimum(ALPHA_CLIP, raw)
        keep = (sigma >= 0) & (alpha >= ALPHA_MIN) & m
        alpha = jnp.where(keep, alpha, 0.0)

        # cumprod/cumsum have no Pallas TPU lowering; compute the inclusive
        # log-space prefix product as a lower-triangular matmul on the MXU
        # (alpha <= 0.999 keeps the log finite)
        one_m = 1.0 - alpha
        row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        colx = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        tri = (colx <= row).astype(jnp.float32)
        log_cum = jax.lax.dot_general(
            tri, jnp.log(one_m), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cum = jnp.exp(log_cum)
        T_excl = T * cum / one_m                      # [CH, P]
        w = alpha * T_excl
        cols = data[:, 8:8 + n_chan]                  # [CH, C]
        acc = acc + jax.lax.dot_general(
            cols, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # [C, P]
        T = T * cum[-1:]
        return ci + 1, T, acc

    T0 = jnp.ones((1, P), jnp.float32)
    acc0 = jnp.zeros((n_chan, P), jnp.float32)
    _, T, acc = lax.while_loop(cond, body, (0, T0, acc0))
    out_ref[0, :n_chan] = acc
    out_ref[0, n_chan:n_chan + 1] = T


def rasterize_tiled_pallas_fwd(
    xys: jnp.ndarray,       # [N, 2] depth-sorted
    conics: jnp.ndarray,    # [N, 3]
    opacities: jnp.ndarray,  # [N, 1]
    colors: jnp.ndarray,    # [N, C]
    valid: jnp.ndarray,     # [N]
    sorted_prim: jnp.ndarray,  # [budget]
    tile_start: jnp.ndarray,   # [T]
    tile_end: jnp.ndarray,     # [T]
    img_h: int, img_w: int, tile_size: int, ntx: int, nty: int,
    chunk: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-only Pallas compositor. Returns ([C, H, W], T [H, W])."""
    N, C = colors.shape
    budget = sorted_prim.shape[0]
    P = tile_size * tile_size
    feat = 8 + C  # x, y, a, b, c, opac, pad, pad, colors
    feat_pad = -(-feat // 8) * 8

    gi = jnp.clip(sorted_prim, 0, N - 1)
    op = (opacities.reshape(-1) * valid)[gi][:, None]
    rows = jnp.concatenate(
        [xys[gi], conics[gi], op,
         jnp.zeros((budget, 2), xys.dtype), colors[gi]], axis=1,
    )
    rows = jnp.pad(rows, ((0, chunk), (0, feat_pad - rows.shape[1])))

    T_tiles = ntx * nty
    out_feat = C + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, out_feat, P), lambda t, s, e: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, feat_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _compositor_kernel, chunk=chunk, tile_size=tile_size, ntx=ntx,
        n_chan=C, feat=feat_pad,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_tiles, out_feat, P), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_end, rows)

    img = out[:, :C].reshape(nty, ntx, C, tile_size, tile_size)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        C, nty * tile_size, ntx * tile_size)[:, :img_h, :img_w]
    T_img = out[:, C].reshape(nty, ntx, tile_size, tile_size)
    T_img = T_img.transpose(0, 2, 1, 3).reshape(
        nty * tile_size, ntx * tile_size)[:img_h, :img_w]
    return img, T_img
