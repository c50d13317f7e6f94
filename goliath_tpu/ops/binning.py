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


class TileBinning(NamedTuple):
    sorted_prim: jnp.ndarray   # [budget] prim index per pair (depth order/tile)
    tile_start: jnp.ndarray    # [num_tiles]
    tile_end: jnp.ndarray      # [num_tiles]
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
) -> TileBinning:
    """Primitives must already be sorted by depth (ascending).

    If a primitive spans more than max_tiles_per_prim tiles, its span is
    center-cropped to fit (a documented approximation for huge primitives).
    """
    N = tile_min.shape[0]
    if pair_budget is None:
        pair_budget = 4 * N
    num_tiles = num_tiles_x * num_tiles_y
    K = max_tiles_per_prim
    kspan = max(int(K**0.5), 1)

    x0 = jnp.clip(tile_min[:, 0], 0, num_tiles_x)
    y0 = jnp.clip(tile_min[:, 1], 0, num_tiles_y)
    x1 = jnp.clip(tile_max[:, 0], 0, num_tiles_x)
    y1 = jnp.clip(tile_max[:, 1], 0, num_tiles_y)

    w = jnp.maximum(x1 - x0, 0)
    h = jnp.maximum(y1 - y0, 0)
    # center-crop spans that exceed the per-prim budget
    cx = (x0 + x1) // 2
    cy = (y0 + y1) // 2
    x0 = jnp.where(w > kspan, jnp.clip(cx - kspan // 2, 0, num_tiles_x), x0)
    y0 = jnp.where(h > kspan, jnp.clip(cy - kspan // 2, 0, num_tiles_y), y0)
    w = jnp.minimum(w, kspan)
    h = jnp.minimum(h, kspan)

    counts = jnp.where(valid, w * h, 0)  # [N]
    offsets = jnp.cumsum(counts) - counts  # exclusive

    # expand: entry k of prim n covers tile (x0 + k%w, y0 + k//w)
    k = jnp.arange(K, dtype=jnp.int32)[None, :]  # [1, K]
    wk = jnp.maximum(w[:, None], 1)
    tx = x0[:, None] + k % wk
    ty = y0[:, None] + k // wk
    tile_id = (ty * num_tiles_x + tx).astype(jnp.int32)  # [N, K]
    entry_valid = (k < counts[:, None])
    dst = jnp.where(entry_valid, offsets[:, None] + k, pair_budget)  # drop OOB

    keys = jnp.full((pair_budget,), num_tiles, dtype=jnp.int32)
    vals = jnp.zeros((pair_budget,), dtype=jnp.int32)
    keys = keys.at[dst.reshape(-1)].set(
        jnp.where(entry_valid, tile_id, num_tiles).reshape(-1), mode="drop"
    )
    prim_ids = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, K)
    )
    vals = vals.at[dst.reshape(-1)].set(prim_ids.reshape(-1), mode="drop")

    # stable sort by tile id keeps depth order within a tile
    keys_sorted, vals_sorted = jax.lax.sort_key_val(keys, vals, is_stable=True)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(keys_sorted, tile_ids, side="left").astype(
        jnp.int32
    )
    tile_end = jnp.searchsorted(keys_sorted, tile_ids, side="right").astype(
        jnp.int32
    )
    return TileBinning(vals_sorted, tile_start, tile_end, num_tiles_x, num_tiles_y)
