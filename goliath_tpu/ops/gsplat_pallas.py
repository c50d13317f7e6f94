"""Pallas TPU kernel for the gaussian-splat tile compositor.

The XLA-scan compositor (ops/gsplat.py) streams every tile through a fixed
chunk budget with no early-out and materializes [tiles, chunk, pixels]
intermediates in HBM each step. This kernel keeps the running transmittance
and color accumulators in VMEM scratch across grid steps and lets the Pallas
pipeline prefetch pair rows via a scalar-prefetched index_map — no manual
DMA (this environment's remote Mosaic compiler rejects `make_async_copy`).

Grid = (tiles, nchunks): the chunk axis revisits the same output block, the
canonical Pallas reduction pattern. Per-tile chunk indices come from the
prefetched tile_start array: block j of tile t covers rows
[align(start_t) + j*chunk, ...), masked against [start_t, end_t).

The prefix transmittance inside a chunk is computed in log space with a
lower-triangular matmul on the MXU (cumprod/cumsum have no Mosaic lowering).

`rasterize_tiled_pl` is the full custom-VJP rasterizer: both the forward
compositor and the backward per-pair gradient march run as Pallas kernels
(the per-prim reduction reuses gsplat.reduce_sorted_pair_grads). The bwd
marches FRONT-TO-BACK like the fwd (suffix terms recovered as
total-minus-prefix from the fwd's rendered image), writing pair grads
directly into sorted-pair order; the fwd early-out is replayed exactly via
a per-tile processed-block count.
Reference parity: gsplat/renderers CUDA fwd/bwd rasterization
(reference gsplat rasterize kernels); the XLA path in ops/gsplat.py is the
oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_CLIP = 0.999
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4

# set True to run the kernels in interpret mode (CPU tests)
INTERPRET = False

# precision of the log-space prefix matmuls. HIGHEST (6-pass f32) is the
# safe default; HIGH (bf16x3, ~f32 accuracy for the <=46-magnitude logs
# involved) halves MXU passes — switchable for perf experiments.
import os as _os  # noqa: E402

PREFIX_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[_os.environ.get("GOLIATH_PALLAS_PREC", "highest").lower()]


# ---------------------------------------------------------------------------
# sequential-carry cumsum kernels
# ---------------------------------------------------------------------------
#
# XLA's cumsum at multi-million scale on TPU decomposes into O(log n) full
# passes over HBM and measures ~250ms on the [4M, 16] pair-grad reduction;
# a single Pallas pass with a [1, F] carry in VMEM scratch does it in one
# read+write of the data (grid steps run sequentially on TPU, so the carry
# is well-defined).


def _cumsum_rows_kernel(x_ref, out_ref, carry_scr, *, block: int, F: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_scr[:] = jnp.zeros((1, F), jnp.float32)

    x = x_ref[...]                                       # [block, F]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri = (col_i <= row_i).astype(jnp.float32)
    cs = jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + carry_scr[:]
    out_ref[...] = cs
    carry_scr[:] = cs[block - 1:block]


def cumsum_rows_pl(x: jnp.ndarray, block: int = 512,
                   interpret: bool = False) -> jnp.ndarray:
    """Cumulative sum along axis 0 of a [M, F] f32 array, one HBM pass."""
    M, F = x.shape
    pad = (-M) % block
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0)))
    nb = (M + pad) // block
    out = pl.pallas_call(
        functools.partial(_cumsum_rows_kernel, block=block, F=F),
        grid=(nb,),
        in_specs=[pl.BlockSpec((block, F), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M + pad, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, F), jnp.float32)],
        interpret=interpret,
    )(xp)
    return out[:M]


def _cumsum1d_kernel(x_ref, out_ref, carry_scr, *, rows: int, lanes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_scr[:] = jnp.zeros((1, 1), jnp.float32)

    x = x_ref[...]                                       # [rows, lanes]
    ones = jnp.ones((lanes, 1), jnp.float32)
    rowsum = jax.lax.dot_general(                        # [rows, 1]
        x, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    r_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tri_excl = (c_i < r_i).astype(jnp.float32)
    row_pre = jax.lax.dot_general(                       # [rows, 1] excl.
        tri_excl, rowsum, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    l_i = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    m_i = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    triR = (l_i <= m_i).astype(jnp.float32)              # inclusive in-row
    in_row = jax.lax.dot_general(
        x, triR, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[...] = in_row + row_pre + carry_scr[:]
    carry_scr[:] = carry_scr[:] + row_pre[rows - 1:rows] \
        + rowsum[rows - 1:rows]


def cumsum1d_pl(x: jnp.ndarray, rows: int = 512, lanes: int = 128,
                interpret: bool = False) -> jnp.ndarray:
    """Inclusive 1-D cumsum of an [M] array in one HBM pass (f32 carry).

    Exact for int32 inputs as long as the total stays below 2^24 (f32
    mantissa), which holds for pair budgets < 16M.
    """
    (M,) = x.shape
    blk = rows * lanes
    pad = (-M) % blk
    xp = jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(-1, lanes)
    nb = xp.shape[0] // rows
    out = pl.pallas_call(
        functools.partial(_cumsum1d_kernel, rows=rows, lanes=lanes),
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32)],
        interpret=interpret,
    )(xp)
    return out.reshape(-1)[:M]


def _cumsum1d_batched_kernel(x_ref, out_ref, carry_scr, *, F: int,
                             rows: int, lanes: int):
    """Grid (nb,): F independent 1-D carry-cumsums per block, block layout
    [F, 1, rows, lanes] (lane-dense — a [M, F] array with F ~ 10 pads its
    minor dim to 128, inflating every HBM pass ~13x). All F columns ride
    in ONE block: grid steps run sequentially on TPU and each step is
    DMA-latency-bound, so an (F, nb) grid paid that latency F times
    (measured 18 ms at F=10, M=2M — ~9 GB/s effective)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_scr[:] = jnp.zeros((F, 1), jnp.float32)

    x = x_ref[:, 0]                                      # [F, rows, lanes]
    x2 = x.reshape(F * rows, lanes)
    ones = jnp.ones((lanes, 1), jnp.float32)
    rowsum = jax.lax.dot_general(                        # [F, rows]
        x2, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(F, rows)
    s_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tri_lt = (s_i < r_i).astype(jnp.float32)             # [s, r]: s < r
    row_pre = jax.lax.dot_general(                       # [F, rows] excl.
        rowsum, tri_lt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    l_i = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    m_i = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    triR = (l_i <= m_i).astype(jnp.float32)              # inclusive in-row
    in_row = jax.lax.dot_general(                        # [F*rows, lanes]
        x2, triR, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(F, rows, lanes)
    out_ref[:, 0] = in_row + row_pre[:, :, None] + carry_scr[:][:, :, None]
    carry_scr[:] = (carry_scr[:] + row_pre[:, rows - 1:rows]
                    + rowsum[:, rows - 1:rows])


def cumsum_cols_pl(cols, rows: int = 256, lanes: int = 128,
                   interpret: bool = False) -> jnp.ndarray:
    # rows=512 at F=10 needs ~23 MB scoped VMEM (> the 16 MB limit):
    # block in+out (2x F*rows*lanes*4) plus the reshaped x2/in_row temps.
    """Per-operand inclusive 1-D cumsums: cols is a sequence of F [M]
    arrays (e.g. lax.sort payload outputs); returns csum [F, M] f32.

    Lane-dense alternative to cumsum_rows_pl for narrow F: the [M, F]
    layout pads F up to 128 lanes, so every HBM pass moves ~13x the data
    at F = 10."""
    F = len(cols)
    (M,) = cols[0].shape
    blk = rows * lanes
    pad = (-M) % blk
    x = jnp.stack([c.astype(jnp.float32) for c in cols], axis=0)  # [F, M]
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    nb = (M + pad) // blk
    xr = xp.reshape(F, nb, rows, lanes)
    out = pl.pallas_call(
        functools.partial(_cumsum1d_batched_kernel, F=F, rows=rows,
                          lanes=lanes),
        grid=(nb,),
        in_specs=[pl.BlockSpec((F, 1, rows, lanes),
                               lambda b: (0, b, 0, 0))],
        out_specs=pl.BlockSpec((F, 1, rows, lanes),
                               lambda b: (0, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xr.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((F, 1), jnp.float32)],
        interpret=interpret,
    )(xr)
    return out.reshape(F, M + pad)[:, :M]


def _compositor_kernel(
    start_ref, end_ref,        # scalar prefetch [T]
    rows_ref,                  # [chunk, F] VMEM block (auto-pipelined)
    out_ref,                   # [1, C+1, P] block per tile
    T_scr, acc_scr, cnt_scr,   # VMEM [1,P], [C,P]; SMEM [1] block cutoff
    *, chunk: int, inner: int, tile_size: int, ntx: int, n_chan: int,
    tiles_per_img: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    start = start_ref[t]
    end = end_ref[t]
    P = tile_size * tile_size
    # batch-folded grids run B images' tiles back to back; tile coords are
    # image-local (scalar mod, free; == t for a single image)
    tl = t % tiles_per_img

    @pl.when(j == 0)
    def _():
        T_scr[:] = jnp.ones((1, P), jnp.float32)
        acc_scr[:] = jnp.zeros((n_chan, P), jnp.float32)
        cnt_scr[0] = 0

    base = (start // chunk + j) * chunk
    have_work = (base < end) & (base + chunk > start) \
        & (jnp.max(T_scr[:]) > T_EPS)

    @pl.when(have_work)
    def _():
        cnt_scr[0] = j + 1  # bwd replays exactly the blocks fwd composited
        tx = (tl % ntx) * tile_size
        ty = (tl // ntx) * tile_size
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px = (pix_i % tile_size + tx).astype(jnp.float32) + 0.5
        py = (pix_i // tile_size + ty).astype(jnp.float32) + 0.5

        # inner sub-chunks amortize the (small) per-grid-step DMA: the DMA
        # block is `chunk` rows, the sequential compositing unit is `inner`
        # rows so the triangular prefix matmul stays O(inner^2)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 1)
        tri = (col_i <= row_i).astype(jnp.float32)

        def sub(si, _):
            off = si * inner
            data = rows_ref[pl.ds(off, inner), :]     # [IN, F]
            ridx = base + off + jax.lax.broadcasted_iota(
                jnp.int32, (inner, 1), 0)
            m = (ridx >= start) & (ridx < end)

            d0 = data[:, 0:1] - px
            d1 = data[:, 1:2] - py
            a = data[:, 2:3]
            b = data[:, 3:4]
            c = data[:, 4:5]
            sigma = 0.5 * (a * d0 * d0 + c * d1 * d1) + b * d0 * d1
            raw = data[:, 5:6] * jnp.exp(-jnp.clip(sigma, 0.0, 60.0))
            alpha = jnp.minimum(ALPHA_CLIP, raw)
            keep = (sigma >= 0) & (alpha >= ALPHA_MIN) & m
            alpha = jnp.where(keep, alpha, 0.0)

            one_m = 1.0 - alpha
            cum = jnp.exp(jax.lax.dot_general(
                tri, jnp.log(one_m), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=PREFIX_PRECISION,
            ))
            T = T_scr[:]
            T_excl = T * cum / one_m                   # [IN, P]
            w = alpha * T_excl
            cols = data[:, 8:8 + n_chan]               # [IN, C]
            acc_scr[:] += jax.lax.dot_general(
                cols, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            T_scr[:] = T * cum[inner - 1:inner]
            return 0

        # only visit sub-chunks that intersect [start, end): with large DMA
        # blocks (chunk >> inner) most tiles fill a fraction of their last
        # block, and full-block loops would burn VPU time on masked rows
        lo = jnp.maximum(start - base, 0) // inner
        hi = (jnp.minimum(end - base, chunk) + inner - 1) // inner
        lax.fori_loop(lo, hi, sub, 0)

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, :n_chan] = acc_scr[:]
        out_ref[0, n_chan:n_chan + 1] = T_scr[:]
        out_ref[0, n_chan + 1:n_chan + 2] = jnp.full(
            (1, P), cnt_scr[0], jnp.float32)


def pack_pair_rows(xys, conics, opacities, colors, valid, sorted_prim,
                   pad_rows: int) -> jnp.ndarray:
    """Gather pair rows [budget + pad_rows, 8 + C] in sorted-pair order.

    One row gather shared by the fwd and bwd kernels (saved in the vjp
    residuals — row gathers at this scale cost ~25ns/row on TPU, so
    regathering in the bwd would double a major cost). The pad must cover
    the deepest block the BlockSpec index_map can request: block
    start[t]//chunk + nchunks - 1 extends up to nchunks*chunk rows past the
    aligned start, and start can reach `budget` — shorter padding is an
    out-of-bounds block DMA on hardware (interpret mode silently clamps,
    masking the bug in CPU tests).
    """
    N = xys.shape[0]
    gi = jnp.clip(sorted_prim, 0, N - 1)
    src = jnp.concatenate(
        [xys, conics, (opacities.reshape(-1) * valid)[:, None],
         jnp.zeros((N, 2), xys.dtype), colors], axis=1,
    )
    rows = src[gi]  # ONE row gather instead of four
    return jnp.pad(rows, ((0, pad_rows), (0, 0)))


def rasterize_tiled_pallas_fwd(
    xys: jnp.ndarray,        # [N, 2] depth-sorted
    conics: jnp.ndarray,     # [N, 3]
    opacities: jnp.ndarray,  # [N, 1]
    colors: jnp.ndarray,     # [N, C]
    valid: jnp.ndarray,      # [N] float
    sorted_prim: jnp.ndarray,  # [budget]
    tile_start: jnp.ndarray,   # [T]
    tile_end: jnp.ndarray,     # [T]
    img_h: int, img_w: int, tile_size: int, ntx: int, nty: int,
    chunk: int = 512,
    inner: int = 64,
    max_pairs_per_tile: int = 512,
    interpret: bool = False,
    rows_packed: jnp.ndarray | None = None,
    n_imgs: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-only Pallas compositor. Returns ([C, H, W], T [H, W]).

    n_imgs > 1 = BATCH-FOLDED mode: the grid runs n_imgs images' tiles back
    to back in ONE kernel launch. tile_start/tile_end are [n_imgs * T] with
    pair indices offset by img * R (R = per-image packed-row count, must be
    chunk-aligned), rows_packed is the [n_imgs * R, feat] concatenation, and
    the returns gain a leading n_imgs axis. One launch instead of B unrolled
    subgraphs: ~B x smaller HLO (compile time) and no per-launch ramp.
    """
    inner = min(inner, chunk)
    if n_imgs > 1:
        assert rows_packed is not None, "folded mode requires packed rows"
        C = rows_packed.shape[1] - 8
    else:
        N, C = colors.shape
    P = tile_size * tile_size
    feat = 8 + C

    nchunks = max_pairs_per_tile // chunk + 1  # +1 for the alignment shift

    if rows_packed is not None:
        rows = rows_packed
    else:
        rows = pack_pair_rows(xys, conics, opacities, colors, valid,
                              sorted_prim, nchunks * chunk)

    T_tiles = ntx * nty
    out_feat = C + 2  # color rows, final T, processed-block cutoff

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_imgs * T_tiles, nchunks),
        in_specs=[pl.BlockSpec(
            (chunk, feat),
            lambda t, j, start, end: (start[t] // chunk + j, 0),
        )],
        out_specs=pl.BlockSpec(
            (1, out_feat, P), lambda t, j, start, end: (t, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((C, P), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _compositor_kernel, chunk=chunk, inner=inner, tile_size=tile_size,
        ntx=ntx, n_chan=C, tiles_per_img=T_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_imgs * T_tiles, out_feat, P), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_end, rows)

    img = out[:, :C].reshape(n_imgs, nty, ntx, C, tile_size, tile_size)
    img = img.transpose(0, 3, 1, 4, 2, 5).reshape(
        n_imgs, C, nty * tile_size, ntx * tile_size)[..., :img_h, :img_w]
    T_img = out[:, C].reshape(n_imgs, nty, ntx, tile_size, tile_size)
    T_img = T_img.transpose(0, 1, 3, 2, 4).reshape(
        n_imgs, nty * tile_size, ntx * tile_size)[..., :img_h, :img_w]
    cnt = out[:, C + 1, 0].astype(jnp.int32)  # [n_imgs * T_tiles]
    if n_imgs == 1:
        return img[0], T_img[0], cnt
    return img, T_img, cnt


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------
#
# Marches FRONT-TO-BACK exactly like the forward (same grid order, same
# early-out cutoff), using the identity
#     R_i := dT*Tf + sum_{j>i} w_j q_j  =  dT*Tf + dout.out - prefix_i(wq)
# (out is the forward's rendered tile, so the suffix becomes total-minus-
# prefix). Forward marching means every grid step's output block index is
# monotone non-decreasing with only CONSECUTIVE revisits, so pair grads are
# written DIRECTLY into sorted-pair order in shared chunk-aligned blocks —
# no private per-(tile, block) buffer (which cost ~nchunks x budget x 64B
# of HBM), no buffer-row index bookkeeping, and no 2M-row gather afterward.
# Adjacent tiles sharing a boundary block accumulate into it (+=) after a
# zero-init on first visit (tracked via an SMEM previous-block scratch).
#
# Per-pair spatial grads use direct [IN, P] multiply+reduce chains — see
# the in-kernel note for why a moment-matmul reformulation is numerically
# unsound for the first moments (position grads).

_LOG_CLIP = 46.05  # log(1e20); matches clip(rev_cum, 1e-20) in the XLA bwd


def _compositor_bwd_kernel(
    start_ref, end_ref, cnt_ref,  # scalar prefetch [T]; cnt = fwd cutoff
    rows_ref,                  # [chunk, F] pair rows (fwd block order)
    g_ref,                     # [1, 2C+2, P]: dout rows, dT, Tf, out rows
    out_ref,                   # [chunk, 16] pair grads, sorted-pair order
    T_scr, Pq_scr, prev_scr,   # VMEM [1, P] x2; SMEM [1] previous block id
    *, chunk: int, inner: int, tile_size: int, ntx: int, n_chan: int,
    tiles_per_img: int,
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    start = start_ref[t]
    end = end_ref[t]
    P = tile_size * tile_size
    C = n_chan
    tl = t % tiles_per_img  # image-local tile id under batch folding

    @pl.when((t == 0) & (j == 0))
    def _():
        prev_scr[0] = -1

    ob = start // chunk + j  # absolute sorted-space block this step owns
    # steps past the tile's LAST real block are clamped onto it by the out
    # index_map (so the out-block sequence stays monotone with only
    # consecutive revisits — an unclamped idle step would flush the shared
    # boundary block early and the next tile's zero-init would destroy it)
    obc = jnp.minimum(ob, jnp.maximum(end - 1, start) // chunk)

    # zero-init each block on FIRST visit; must run even for no-work steps
    # so blocks the fwd early-out skipped hold zeros, not garbage
    @pl.when(obc != prev_scr[0])
    def _():
        out_ref[...] = jnp.zeros((chunk, 16), jnp.float32)
        prev_scr[0] = obc

    dout = g_ref[0, :C]                      # [C, P]
    dT = g_ref[0, C:C + 1]                   # [1, P]
    Tf = g_ref[0, C + 1:C + 2]               # [1, P]
    out_img = g_ref[0, C + 2:2 * C + 2]      # [C, P] fwd-rendered tile

    @pl.when(j == 0)
    def _():
        T_scr[:] = jnp.ones((1, P), jnp.float32)
        # running prefix of wq; R_i = dT*Tf + dout.out - prefix_i(wq)
        Pq_scr[:] = jnp.zeros((1, P), jnp.float32)

    base = ob * chunk
    # replay ONLY blocks the fwd composited (identical cutoff, identical
    # marching direction => identical T trajectory)
    have_work = (base < end) & (base + chunk > start) & (j < cnt_ref[t])

    @pl.when(have_work)
    def _():
        tx = (tl % ntx) * tile_size
        ty = (tl // ntx) * tile_size
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        px = (pix_i % tile_size + tx).astype(jnp.float32) + 0.5
        py = (pix_i // tile_size + ty).astype(jnp.float32) + 0.5

        row_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 1)
        tri_exc = (col_i < row_i).astype(jnp.float32)    # strict prefix
        tri_inc = (col_i <= row_i).astype(jnp.float32)   # prefix incl. self

        R0 = dT * Tf + jax.lax.dot_general(              # [1, P] constant
            jnp.ones((1, C), jnp.float32), dout * out_img,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        lo = jnp.maximum(start - base, 0) // inner
        hi = (jnp.minimum(end - base, chunk) + inner - 1) // inner

        def sub(si, _):
            off = si * inner                             # near-to-far
            data = rows_ref[pl.ds(off, inner), :]        # [IN, F]
            ridx = base + off + jax.lax.broadcasted_iota(
                jnp.int32, (inner, 1), 0)
            m = (ridx >= start) & (ridx < end)

            d0 = data[:, 0:1] - px                       # [IN, P]
            d1 = data[:, 1:2] - py
            a = data[:, 2:3]
            b = data[:, 3:4]
            c = data[:, 4:5]
            op = data[:, 5:6]
            sigma = 0.5 * (a * d0 * d0 + c * d1 * d1) + b * d0 * d1
            sigma_safe = jnp.clip(sigma, 0.0, 60.0)
            raw = op * jnp.exp(-sigma_safe)
            alpha = jnp.minimum(ALPHA_CLIP, raw)
            keep = (sigma >= 0) & (alpha >= ALPHA_MIN) & m
            alpha = jnp.where(keep, alpha, 0.0)
            one_m = 1.0 - alpha
            cols = data[:, 8:8 + C]                      # [IN, C]

            lg = jnp.log(one_m)                          # <= 0
            pre_exc = jax.lax.dot_general(               # strict prefix
                tri_exc, lg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=PREFIX_PRECISION,
            )                                            # [IN, P]
            T_i = T_scr[:] * jnp.exp(
                jnp.maximum(pre_exc, -_LOG_CLIP))        # T before elem i
            w = alpha * T_i                              # [IN, P]
            q = jax.lax.dot_general(                     # dout . col_i
                cols, dout, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [IN, P]
            wq = w * q
            pref_inc = Pq_scr[:] + jax.lax.dot_general(  # prefix incl. i
                tri_inc, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=PREFIX_PRECISION,
            )                                            # [IN, P]
            R_i = R0 - pref_inc                          # suffix after i
            inv_one_m = 1.0 / jnp.maximum(one_m, 1e-3)
            dalpha = jnp.where(keep, q * T_i - R_i * inv_one_m, 0.0)
            draw = jnp.where(raw < ALPHA_CLIP, dalpha, 0.0)
            dsigma = jnp.where(keep, -raw * draw, 0.0)   # [IN, P]
            # Direct per-row reductions. A "moments @ monomial basis" MXU
            # reformulation (dsigma @ phi^T, grads recovered as moment
            # combinations) is numerically unsound for the FIRST moments:
            # position grads are tiny differences of large terms
            # (u = xr*m5 - m3), so basis-expansion rounding is amplified
            # by |m3| / |u| (unbounded). Keep the sums in direct form.
            t0 = d0 * dsigma                             # [IN, P]
            t1 = d1 * dsigma
            ga = 0.5 * jnp.sum(d0 * t0, axis=1, keepdims=True)
            gb = jnp.sum(d1 * t0, axis=1, keepdims=True)
            gc = 0.5 * jnp.sum(d1 * t1, axis=1, keepdims=True)
            u = jnp.sum(t0, axis=1, keepdims=True)       # sum d0 dsigma
            v = jnp.sum(t1, axis=1, keepdims=True)
            gx = a * u + b * v
            gy = b * u + c * v
            # draw * exp(-sigma) == -dsigma / op
            dop = jnp.where(
                op > 0,
                -jnp.sum(dsigma, axis=1, keepdims=True)
                / jnp.maximum(op, 1e-20), 0.0)
            dcol = jax.lax.dot_general(                  # [IN, C]
                w, dout, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            # ACCUMULATE: a boundary block's rows are split between two
            # adjacent tiles; each adds its (masked-to-zero elsewhere) part
            out_ref[pl.ds(off, inner), :] = (
                out_ref[pl.ds(off, inner), :]
                + jnp.concatenate(
                    [gx, gy, ga, gb, gc, dop, dcol,
                     jnp.zeros((inner, 16 - 6 - C), jnp.float32)], axis=1))

            Pq_scr[:] += jnp.sum(wq, axis=0, keepdims=True)
            T_scr[:] = T_scr[:] * jnp.exp(jnp.maximum(
                jnp.sum(lg, axis=0, keepdims=True), -_LOG_CLIP))
            return 0

        lax.fori_loop(lo, hi, sub, 0)


def pair_grads_pallas(
    xys, conics, opacities, colors, valid,
    sorted_prim, tile_start, tile_end, tile_of_pair,
    dL_dout,                   # [C, H, W]
    dL_dT,                     # [H, W]
    T_final,                   # [H, W]
    cnt,                       # [T_tiles] fwd processed-block cutoff
    img_h: int, img_w: int, tile_size: int, ntx: int, nty: int,
    chunk: int = 512,
    inner: int = 64,
    max_pairs_per_tile: int = 512,
    interpret: bool = False,
    rows_packed: jnp.ndarray | None = None,
    out_img: jnp.ndarray | None = None,   # [C, H, W] fwd render (required)
    n_imgs: int = 1,
) -> jnp.ndarray:
    """Per-pair gradients in SORTED-PAIR order [budget, 16].

    The kernel marches front-to-back (same direction and cutoff as the fwd)
    and writes grads straight into sorted-pair-space chunk blocks — columns
    are (dx, dy, d_conic(3), d_opacity, d_color(C), 0-pad).

    n_imgs > 1 = batch-folded (see rasterize_tiled_pallas_fwd): image
    tensors carry a leading n_imgs axis, tile/pair arrays are globalized,
    and the return is [n_imgs * R, 16] in global sorted-pair order."""
    inner = min(inner, chunk)
    if n_imgs > 1:
        assert rows_packed is not None
        C = rows_packed.shape[1] - 8
    else:
        N, C = colors.shape
        budget = sorted_prim.shape[0]
    P = tile_size * tile_size
    feat = 8 + C

    nchunks = max_pairs_per_tile // chunk + 1

    if rows_packed is not None:
        rows = rows_packed  # reuse the fwd's gather (saved in vjp residuals)
    else:
        rows = pack_pair_rows(xys, conics, opacities, colors, valid,
                              sorted_prim, nchunks * chunk)
    if rows.shape[0] % chunk:
        rows = jnp.pad(rows, ((0, (-rows.shape[0]) % chunk), (0, 0)))

    # per-tile gradient/state planes packed as one [T, 2C+2, P] operand:
    # dout rows, dT, Tf, and the fwd-rendered tile (for suffix-from-total)
    pad_h = nty * tile_size - img_h
    pad_w = ntx * tile_size - img_w
    if n_imgs > 1:
        g = jnp.concatenate(
            [dL_dout, dL_dT[:, None], T_final[:, None], out_img], axis=1)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
        g = g.reshape(n_imgs, 2 * C + 2, nty, tile_size, ntx, tile_size)
        g = g.transpose(0, 2, 4, 1, 3, 5).reshape(
            n_imgs * nty * ntx, 2 * C + 2, P)
    else:
        g = jnp.concatenate(
            [dL_dout, dL_dT[None], T_final[None], out_img], axis=0)
        g = jnp.pad(g, ((0, 0), (0, pad_h), (0, pad_w)))
        g = g.reshape(2 * C + 2, nty, tile_size, ntx, tile_size)
        g = g.transpose(1, 3, 0, 2, 4).reshape(nty * ntx, 2 * C + 2, P)

    T_tiles = ntx * nty
    nblocks = rows.shape[0] // chunk  # budget + pad, chunk-aligned

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_imgs * T_tiles, nchunks),
        in_specs=[
            pl.BlockSpec(
                (chunk, feat),
                lambda t, j, start, end, cnt: (start[t] // chunk + j, 0),
            ),
            pl.BlockSpec((1, 2 * C + 2, P),
                         lambda t, j, start, end, cnt: (t, 0, 0)),
        ],
        # clamp idle steps onto the tile's last real block so the block
        # sequence is monotone with only consecutive revisits (see kernel)
        out_specs=pl.BlockSpec(
            (chunk, 16),
            lambda t, j, start, end, cnt: (jnp.minimum(
                start[t] // chunk + j,
                jnp.maximum(end[t] - 1, start[t]) // chunk), 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _compositor_bwd_kernel, chunk=chunk, inner=inner,
        tile_size=tile_size, ntx=ntx, n_chan=C, tiles_per_img=T_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * chunk, 16), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_end, cnt, rows, g)
    if n_imgs > 1:
        return out  # [n_imgs * R, 16] global sorted-pair order
    return out[:budget]


# ---------------------------------------------------------------------------
# full custom-VJP rasterizer (Pallas fwd + Pallas bwd)
# ---------------------------------------------------------------------------

import jax.experimental  # noqa: E402 (kept grouped with the vjp definition)
from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def rasterize_tiled_pl(
    xys, conics, opacities, colors, binning_arrays,
    img_h: int, img_w: int, tile_size: int, max_pairs_per_tile: int,
    chunk: int, inner: int, ntx: int, nty: int,
):
    """Drop-in Pallas variant of gsplat.rasterize_tiled (same binning
    arrays / reduction; fwd and per-pair bwd run as TPU kernels)."""
    sorted_prim, tile_start, tile_end, valid = binning_arrays[:4]
    out, T_final, _cnt = rasterize_tiled_pallas_fwd(
        xys, conics, opacities, colors, valid.astype(xys.dtype),
        sorted_prim, tile_start, tile_end,
        img_h, img_w, tile_size, ntx, nty,
        chunk=chunk, inner=inner, max_pairs_per_tile=max_pairs_per_tile,
        interpret=INTERPRET,
    )
    return out, T_final


def _pl_fwd(xys, conics, opacities, colors, binning_arrays,
            img_h, img_w, tile_size, max_pairs_per_tile, chunk, inner,
            ntx, nty):
    sorted_prim, tile_start, tile_end, valid = binning_arrays[:4]
    nchunks = max_pairs_per_tile // chunk + 1
    rows = pack_pair_rows(
        xys, conics, opacities, colors, valid.astype(xys.dtype),
        sorted_prim, nchunks * chunk)
    out, T_final, cnt = rasterize_tiled_pallas_fwd(
        xys, conics, opacities, colors, valid.astype(xys.dtype),
        sorted_prim, tile_start, tile_end,
        img_h, img_w, tile_size, ntx, nty,
        chunk=chunk, inner=inner, max_pairs_per_tile=max_pairs_per_tile,
        interpret=INTERPRET, rows_packed=rows,
    )
    return (out, T_final), (rows, opacities, colors, binning_arrays,
                            out, T_final, cnt)


def _pl_bwd(img_h, img_w, tile_size, max_pairs_per_tile, chunk, inner,
            ntx, nty, res, grads):
    rows, opacities, colors, binning_arrays, out_img, T_final, cnt = res
    C = colors.shape[1]
    op_shape = opacities.shape
    dL_dout, dL_dT = grads
    (sorted_prim, tile_start, tile_end, valid,
     perm, prim_offsets, prim_ends, tile_of_pair) = binning_arrays
    sorted_g = pair_grads_pallas(
        None, None, opacities, colors, None,
        sorted_prim, tile_start, tile_end, tile_of_pair,
        dL_dout, dL_dT, T_final, cnt,
        img_h, img_w, tile_size, ntx, nty,
        chunk=chunk, inner=inner, max_pairs_per_tile=max_pairs_per_tile,
        interpret=INTERPRET, rows_packed=rows, out_img=out_img,
    )
    from goliath_tpu.ops.gsplat import reduce_sorted_pair_grads

    acc = reduce_sorted_pair_grads(sorted_g[:, :6 + C], perm,
                                   prim_offsets, prim_ends)  # [F, N]
    dxys = acc[0:2].T
    dconics = acc[2:5].T
    dopacities = acc[5].reshape(op_shape)
    dcolors = acc[6:].T
    return (dxys, dconics, dopacities, dcolors, None)


rasterize_tiled_pl.defvjp(_pl_fwd, _pl_bwd)


# ---------------------------------------------------------------------------
# batch-folded rasterizer: B images in ONE kernel launch
# ---------------------------------------------------------------------------
#
# The caller (gsplat._render_folded) stacks the B images VERTICALLY in tile
# space and runs ONE global binning over all B*N prims (tile grid ntx x
# B*nty, one composite-key sort, one global pair budget). Tile ids are then
# contiguous per image (tile (x, y + b*nty) has id b*T + local), so the
# kernels recover image-local pixel coords with a scalar mod (tiles_per_img)
# and everything else — block index maps, boundary-block accumulation, the
# per-prim reduce — works unchanged on the global arrays. Result: the whole
# render+backward is ONE fwd kernel, ONE bwd kernel, ONE sort, ONE reduce
# regardless of B, instead of B unrolled subgraphs (B x smaller HLO).

@_partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def rasterize_tiled_pl_fold(xys, conics, opacities, colors, binning_arrays,
                            img_h: int, img_w: int, tile_size: int,
                            max_pairs_per_tile: int, chunk: int, inner: int,
                            ntx: int, nty: int, n_imgs: int):
    """Batch-folded Pallas rasterizer.

    Args are FLAT over the fold: xys [B*N, 2], conics [B*N, 3], opacities
    [B*N, 1], colors [B*N, C]; binning_arrays from ONE global bin_to_tiles
    over the vertically-stacked tile grid (tile_start/end [B*T], pair
    arrays [B*budget]). Returns (out [B, C, H, W], T_final [B, H, W])."""
    out, _res = _plf_fwd(
        xys, conics, opacities, colors, binning_arrays,
        img_h, img_w, tile_size, max_pairs_per_tile, chunk, inner,
        ntx, nty, n_imgs)
    return out


def _plf_fwd(xys, conics, opacities, colors, binning_arrays,
             img_h, img_w, tile_size, max_pairs_per_tile, chunk, inner,
             ntx, nty, n_imgs):
    sorted_prim, tile_start, tile_end, valid = binning_arrays[:4]
    nchunks = max_pairs_per_tile // chunk + 1
    rows = pack_pair_rows(
        xys, conics, opacities, colors, valid.astype(xys.dtype),
        sorted_prim, nchunks * chunk)
    out, T_final, cnt = rasterize_tiled_pallas_fwd(
        None, None, None, None, None, None, tile_start, tile_end,
        img_h, img_w, tile_size, ntx, nty,
        chunk=chunk, inner=inner, max_pairs_per_tile=max_pairs_per_tile,
        interpret=INTERPRET, rows_packed=rows, n_imgs=n_imgs,
    )
    return (out, T_final), (rows, opacities, colors, binning_arrays,
                            out, T_final, cnt)


def _plf_bwd(img_h, img_w, tile_size, max_pairs_per_tile, chunk, inner,
             ntx, nty, n_imgs, res, grads):
    rows, opacities, colors, binning_arrays, out_img, T_final, cnt = res
    C = colors.shape[1]
    op_shape = opacities.shape
    dL_dout, dL_dT = grads
    (sorted_prim, tile_start, tile_end, valid,
     perm, prim_offsets, prim_ends, tile_of_pair) = binning_arrays
    budget_total = sorted_prim.shape[0]
    sorted_g = pair_grads_pallas(
        None, None, opacities, colors, None,
        sorted_prim, tile_start, tile_end, tile_of_pair,
        dL_dout, dL_dT, T_final, cnt,
        img_h, img_w, tile_size, ntx, nty,
        chunk=chunk, inner=inner, max_pairs_per_tile=max_pairs_per_tile,
        interpret=INTERPRET, rows_packed=rows, out_img=out_img,
        n_imgs=n_imgs,
    )[:budget_total]
    from goliath_tpu.ops.gsplat import reduce_sorted_pair_grads

    # prim_offsets/prim_ends are GLOBAL over the fold, so the per-prim
    # prefix-sum reduce works unchanged; acc is [F, B*N]
    acc = reduce_sorted_pair_grads(sorted_g[:, :6 + C], perm,
                                   prim_offsets, prim_ends)
    dxys = acc[0:2].T
    dconics = acc[2:5].T
    dopacities = acc[5].reshape(op_shape)
    dcolors = acc[6:].T
    return (dxys, dconics, dopacities, dcolors, None)


rasterize_tiled_pl_fold.defvjp(_plf_fwd, _plf_bwd)
