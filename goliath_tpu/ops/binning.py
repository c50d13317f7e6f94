"""Shared screen-tile binning engine for TPU renderers.

Replaces the per-thread CUDA machinery of the reference's renderers (gsplat's
tile binning + mvpraymarch's BVH traversal) with a sort-based, static-shape
formulation that XLA handles well:

  1. primitives come in depth order (caller pre-sorts);
  2. each primitive's screen AABB is expanded into (tile_id, prim) pairs via
     ONE scatter into a fixed-size pair buffer (static budget);
  3. one stable sort by tile_id groups pairs per tile while preserving depth
     order inside each tile;
  4. searchsorted yields per-tile [start, end) segments.

Static budgets (max tiles per primitive, total pair budget, max pairs read
per tile) replace dynamic allocation; overflow drops the farthest
primitives, which are occluded in practice. All budgets are configurable.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from goliath_tpu.ops.backend import target_backend


def _cumsum1d(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive int cumsum; single-pass Pallas kernel on TPU (XLA's 1-D
    integer cumsum costs ~130ms at 4M elements), jnp elsewhere. Exact while
    the running total stays under 2^24 (f32 carry)."""
    if target_backend() == "tpu":
        from goliath_tpu.ops.gsplat_pallas import cumsum1d_pl

        return cumsum1d_pl(x).astype(jnp.int32)
    return jnp.cumsum(x)


class TileBinning(NamedTuple):
    sorted_prim: jnp.ndarray   # [budget] prim index per pair (depth order/tile)
    tile_start: jnp.ndarray    # [num_tiles]
    tile_end: jnp.ndarray      # [num_tiles]
    perm: jnp.ndarray          # [budget] sorted position -> pre-sort slot
                               # (consumers invert with ONE at[perm].set
                               # scatter where needed — cheaper than
                               # materializing inv_perm here AND gathering
                               # through it there)
    prim_offsets: jnp.ndarray  # [N] first pre-sort slot of each prim
    prim_ends: jnp.ndarray     # [N] one-past-last pre-sort slot of each prim
    tile_of_pair: jnp.ndarray  # [budget] owning tile id per sorted pair
                               # (== num_tiles for unused slots)
    num_tiles_x: int
    num_tiles_y: int


def bin_to_tiles(
    tile_min: jnp.ndarray,   # [N, 2] inclusive tile coords (x, y)
    tile_max: jnp.ndarray,   # [N, 2] exclusive tile coords (x, y)
    valid: jnp.ndarray,      # [N] bool
    num_tiles_x: int,
    num_tiles_y: int,
    max_tiles_per_prim: int = 64,
    pair_budget: int | None = None,
    depth_keys: jnp.ndarray | None = None,   # [N] int32 quantized depth
) -> TileBinning:
    """Bin primitive AABBs into per-tile depth-ordered pair lists.

    Depth ordering within a tile comes from ONE of two modes:
      * depth_keys=None — primitives must already be sorted by depth
        (ascending); the stable tile sort preserves that order per tile.
      * depth_keys given — primitives may be in ANY order; the sort key is
        (tile_id << depth_bits) | depth_key (the CUDA gsplat composite-key
        design). This removes the global depth argsort AND the [N]-row
        reorder gather from the caller's critical path; ties in the
        quantized depth break by primitive index.

    If a primitive spans more than max_tiles_per_prim tiles, its span is
    center-cropped (area-proportionally) to fit.
    """
    N = tile_min.shape[0]
    if pair_budget is None:
        pair_budget = 4 * N
    num_tiles = num_tiles_x * num_tiles_y
    K = max_tiles_per_prim

    x0 = jnp.clip(tile_min[:, 0], 0, num_tiles_x)
    y0 = jnp.clip(tile_min[:, 1], 0, num_tiles_y)
    x1 = jnp.clip(tile_max[:, 0], 0, num_tiles_x)
    y1 = jnp.clip(tile_max[:, 1], 0, num_tiles_y)

    w = jnp.maximum(x1 - x0, 0)
    h = jnp.maximum(y1 - y0, 0)
    # center-crop spans whose AREA exceeds the per-prim budget, preserving
    # aspect (footprints may be strongly rectangular with per-axis radii):
    # w' = w*sqrt(K/area) rounded down, h' = min(h, K // w') => w'*h' <= K
    area = w * h
    over = area > K
    ratio = jnp.sqrt(K / jnp.clip(area.astype(jnp.float32), min=1.0))
    w_c = jnp.clip((w.astype(jnp.float32) * ratio).astype(jnp.int32), 1, K)
    w_new = jnp.where(over, jnp.minimum(w_c, w), w)
    h_new = jnp.minimum(h, K // jnp.maximum(w_new, 1))
    cx = (x0 + x1) // 2
    cy = (y0 + y1) // 2
    x0 = jnp.where(w_new < w,
                   jnp.clip(cx - w_new // 2, 0, num_tiles_x), x0)
    y0 = jnp.where(h_new < h,
                   jnp.clip(cy - h_new // 2, 0, num_tiles_y), y0)
    w = w_new
    h = h_new

    counts = jnp.where(valid, w * h, 0)  # [N]
    ends = _cumsum1d(counts)             # inclusive
    offsets = ends - counts              # exclusive

    # Scatter-free pair expansion: TPU scatters serialize, so instead of
    # scattering (tile, prim) entries to their offsets, each SLOT of the
    # pair buffer looks up its owning prim with a vectorized binary search
    # (slot s belongs to the prim whose [offset, end) range contains s).
    slots = jnp.arange(pair_budget, dtype=jnp.int32)
    # prim_of_slot[s] = #{i : ends[i] <= s} (== searchsorted(ends, s,
    # 'right')). Because the queries are the iota, this is a bincount of the
    # ends + an inclusive cumsum — one [N] scatter-add and one [budget]
    # cumsum instead of the 5M-element merge sort searchsorted costs on TPU.
    marks = jnp.zeros(pair_budget, jnp.int32).at[
        jnp.clip(ends, 0, pair_budget - 1).astype(jnp.int32)
    ].add(jnp.where(ends < pair_budget, 1, 0).astype(jnp.int32),
          mode="drop")
    prim_of_slot = _cumsum1d(marks)  # [budget]; == N for slots past the end
    in_range = prim_of_slot < N
    p = jnp.clip(prim_of_slot, 0, N - 1)
    # ONE row-gather for all per-prim fields (gathers on TPU are
    # latency-bound, not bandwidth-bound; a separate qd[p] point gather
    # measured as expensive as the whole row gather)
    if depth_keys is None:
        shift = 0
        qd = jnp.zeros_like(offsets)
    else:
        shift = 31 - int(num_tiles + 1).bit_length()
        assert shift >= 12, (
            f"too many tiles ({num_tiles}) for a composite int32 sort key "
            "with a useful depth resolution")
        qd = jnp.clip(depth_keys, 0, (1 << shift) - 1).astype(jnp.int32)
    table = jnp.stack(
        [offsets.astype(jnp.int32), jnp.maximum(w, 1).astype(jnp.int32),
         x0.astype(jnp.int32), y0.astype(jnp.int32), qd], axis=1,
    )  # [N, 5]
    rows = table[p]  # [budget, 5]
    k = slots - rows[:, 0]
    wk = rows[:, 1]
    # int div/mod have no TPU hardware path (VPU emulates them with long
    # multi-op sequences — measured ~60ms at 2M slots); k < K <= 2^24 and
    # wk <= K, so float division + floor is exact and ~free
    kd = jnp.floor(k.astype(jnp.float32) / wk.astype(jnp.float32)
                   ).astype(jnp.int32)
    tx = rows[:, 2] + (k - kd * wk)
    ty = rows[:, 3] + kd
    tile_of_slot = (ty * num_tiles_x + tx).astype(jnp.int32)
    if depth_keys is None:
        keys = jnp.where(in_range, tile_of_slot, num_tiles)
    else:
        # composite (tile, depth) key in one int32
        keys = jnp.where(
            in_range, (tile_of_slot << shift) | rows[:, 4],
            num_tiles << shift
        )
    vals = jnp.where(in_range, p, 0).astype(jnp.int32)

    # stable sort groups pairs per tile in depth order (carried in the key,
    # or inherited from pre-sorted prims); carry BOTH the prim id and the
    # originating slot as sort payloads — an extra payload operand costs
    # ~0.7ms at 2M while the vals[perm] gather it replaces costs ~15ms
    # (in-graph lax.sort is far cheaper than its standalone micro-benchmark
    # suggests; random gathers are not)
    keys_sorted, vals_sorted, perm = jax.lax.sort(
        (keys, vals, slots), num_keys=1, is_stable=True)

    # both segment bounds from ONE searchsorted: tile_end[t] ==
    # tile_start[t+1] for integer keys (unused slots carry the sentinel
    # key == num_tiles, which lands past every real tile)
    # few queries against many sorted keys: vectorized binary search
    # ('scan_unrolled') is ~6x cheaper than the merge-sort method here
    tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32) << shift
    bounds = jnp.searchsorted(
        keys_sorted, tile_ids, side="left",
        method="scan_unrolled").astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_end = bounds[1:]
    tile_of_pair = (keys_sorted >> shift) if shift else keys_sorted
    # Enforce the documented <2^24 exactness invariant on the returned
    # per-prim bounds: the raw running total can exceed 2^24 (1M prims x
    # 64 tiles = 64M) where the f32-carry Pallas cumsum is inexact, but
    # every consumer indexes a pair_budget-sized buffer, so saturating at
    # the budget is both semantically right and keeps values exact.
    offsets_c = jnp.minimum(offsets, pair_budget)
    ends_c = jnp.minimum(ends, pair_budget)
    return TileBinning(vals_sorted, tile_start, tile_end, perm,
                       offsets_c.astype(jnp.int32), ends_c.astype(jnp.int32),
                       tile_of_pair, num_tiles_x, num_tiles_y)


class CellBinning(NamedTuple):
    sorted_prim: jnp.ndarray  # [budget] prim index per (cell, prim) pair
    cell_start: jnp.ndarray   # [num_cells]
    cell_end: jnp.ndarray     # [num_cells]


def bin_boxes_to_cells(
    cell_min: jnp.ndarray,   # [N, 3] inclusive cell coords (x, y, z)
    cell_max: jnp.ndarray,   # [N, 3] exclusive
    valid: jnp.ndarray,      # [N] bool
    ncells: Tuple[int, int, int],   # (ncx, ncy, ncz)
    max_cells_per_prim: int = 64,
    pair_budget: int | None = None,
) -> CellBinning:
    """3D analogue of bin_to_tiles: expand each primitive's cell-box into
    (cell_id, prim) pairs with the same scatter-free slot-searchsorted
    pattern. Spans exceeding max_cells_per_prim are center-cropped per axis
    (kspan = floor(cbrt(max_cells_per_prim)))."""
    N = cell_min.shape[0]
    ncx, ncy, ncz = ncells
    if pair_budget is None:
        pair_budget = 8 * N
    num_cells = ncx * ncy * ncz
    kspan = max(int(round(max_cells_per_prim ** (1.0 / 3.0))), 1)

    lo = jnp.stack([jnp.clip(cell_min[:, 0], 0, ncx),
                    jnp.clip(cell_min[:, 1], 0, ncy),
                    jnp.clip(cell_min[:, 2], 0, ncz)], -1)
    hi = jnp.stack([jnp.clip(cell_max[:, 0], 0, ncx),
                    jnp.clip(cell_max[:, 1], 0, ncy),
                    jnp.clip(cell_max[:, 2], 0, ncz)], -1)
    span = jnp.maximum(hi - lo, 0)
    center = (lo + hi) // 2
    crop = span > kspan
    lim = jnp.asarray([ncx, ncy, ncz], lo.dtype)
    lo = jnp.where(crop, jnp.clip(center - kspan // 2, 0, lim[None]), lo)
    span = jnp.minimum(span, kspan)
    w, h, d = span[:, 0], span[:, 1], span[:, 2]

    counts = jnp.where(valid, w * h * d, 0)
    ends = jnp.cumsum(counts)
    offsets = ends - counts

    slots = jnp.arange(pair_budget, dtype=jnp.int32)
    prim_of_slot = jnp.searchsorted(
        ends, slots, side="right", method="sort").astype(jnp.int32)
    in_range = prim_of_slot < N
    p = jnp.clip(prim_of_slot, 0, N - 1)
    table = jnp.stack(
        [offsets.astype(jnp.int32),
         jnp.maximum(w, 1).astype(jnp.int32),
         jnp.maximum(h, 1).astype(jnp.int32),
         lo[:, 0].astype(jnp.int32), lo[:, 1].astype(jnp.int32),
         lo[:, 2].astype(jnp.int32)], axis=1)
    rows = table[p]
    k = slots - rows[:, 0]
    wk, hk = rows[:, 1], rows[:, 2]
    # float division instead of emulated int div/mod (see bin_to_tiles);
    # k < kspan^3 <= max_cells_per_prim and wk, hk <= kspan keep it exact
    kf = k.astype(jnp.float32)
    wf = wk.astype(jnp.float32)
    kw_ = jnp.floor(kf / wf).astype(jnp.int32)              # k // wk
    kwh = jnp.floor(kf / (wf * hk.astype(jnp.float32))).astype(jnp.int32)
    cx = rows[:, 3] + (k - kw_ * wk)
    cy = rows[:, 4] + (kw_ - kwh * hk)
    cz = rows[:, 5] + kwh
    keys = jnp.where(
        in_range, ((cz * ncy + cy) * ncx + cx).astype(jnp.int32), num_cells)
    vals = jnp.where(in_range, p, 0).astype(jnp.int32)

    keys_sorted, vals_sorted = jax.lax.sort((keys, vals), num_keys=1,
                                            is_stable=True)
    cell_ids = jnp.arange(num_cells, dtype=jnp.int32)
    cell_start = jnp.searchsorted(keys_sorted, cell_ids, side="left").astype(
        jnp.int32)
    cell_end = jnp.searchsorted(keys_sorted, cell_ids, side="right").astype(
        jnp.int32)
    return CellBinning(vals_sorted, cell_start, cell_end)
