"""Fast scatter-add replacement for TPU gather backwards.

TPU scatter-add serializes on duplicate indices: the adjoint of a 2M-point
texture gather measured ~370ms in-graph. The sort-based formulation here
(sort by target index with value columns as sort payloads, then per-target
sums as prefix-sum differences at bincount boundaries) uses only primitives
measured fast in-graph on this chip: lax.sort (~2ms + ~2.6ms per payload
column at 2M), a width-1 int scatter-add (~10ms), the single-pass Pallas
carry cumsums, and monotone-index gathers.

`take_cols` is a drop-in gather whose custom VJP routes the adjoint
through `indexed_add_cf`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from goliath_tpu.ops.backend import target_backend


def indexed_add(indices: jnp.ndarray, values: jnp.ndarray,
                num_segments: int, _force_sorted: bool = False
                ) -> jnp.ndarray:
    """sum values[i] into out[indices[i]]: [P] int32, [P, C] -> [N, C].

    Row-major wrapper over indexed_add_cf — prefer the channel-first form
    in new code: [P, C]/[N, C] arrays with small C pad their minor dim up
    to 128 lanes on TPU (a [2.75M, 1] temp tiles to 1.4 GB), which is
    exactly the OOM that killed the full-res mesh_vae rung in round 3."""
    return indexed_add_cf(indices, values.T, num_segments,
                          _force_sorted=_force_sorted).T


def indexed_add_cf(indices: jnp.ndarray, values_cf: jnp.ndarray,
                   num_segments: int, _force_sorted: bool = False
                   ) -> jnp.ndarray:
    """sum values_cf[:, i] into out[:, indices[i]]: [P] int32, [C, P] ->
    [C, N] (out-of-range indices are dropped).

    Channel-FIRST throughout: every intermediate is [P]-minor or [N]-minor
    so nothing tile-pads by 128x. Sort-based on TPU WHEN the duplicate
    density is low. Measured (v5e, 2.75M updates): into 1M texels the
    native scatter-add costs ~370ms vs ~90ms sorted; into 7k vertices
    (~140x duplicates) the native scatter is cheap and the sort-based path
    LOSES ~100ms — dup-dense scatters apparently batch well on TPU.
    Heuristic: sorted path only when each target receives < ~8 updates on
    average."""
    C, P = values_cf.shape
    ok = (indices >= 0) & (indices < num_segments)
    use_sorted = (_force_sorted
                  or (target_backend() == "tpu"
                      and num_segments * 8 >= P))
    if not use_sorted:
        idx = jnp.where(ok, indices, 0)
        vals = jnp.where(ok[None, :], values_cf, 0.0)
        return jnp.zeros((C, num_segments), values_cf.dtype).at[:, idx].add(
            vals, mode="drop")

    from goliath_tpu.ops.binning import _cumsum1d
    from goliath_tpu.ops.gsplat_pallas import cumsum_cols_pl

    interp = target_backend() != "tpu"
    key = jnp.where(ok, indices, num_segments).astype(jnp.int32)
    vals = jnp.where(ok[None, :], values_cf, 0.0).astype(jnp.float32)
    ops = tuple(vals[i] for i in range(C))
    out = jax.lax.sort((key,) + ops, num_keys=1, is_stable=False)
    key_s = out[0]
    # lane-dense per-column cumsums straight off the sort payloads: [C, P]
    csum = cumsum_cols_pl(out[1:], interpret=interp)
    # ends[n] = #{i : key_s[i] <= n} via width-1 bincount + cumsum
    marks = jnp.zeros((num_segments,), jnp.int32).at[key_s].add(
        1, mode="drop")
    ends = _cumsum1d(marks)                                 # [N]
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), ends.astype(jnp.int32)])
    # ONE lane-axis gather of the channel-first csum ([C, P] taken along
    # axis=1 -> [C, N+1]): lane-dense AND single-pass. A ROW gather of a
    # [P, C] csum materializes [N+1, C] padded C -> 128 lanes (42.7x /
    # 8 GB at N = 2048^2, C = 3 — the r3 mesh_vae OOM), while C separate
    # 1-D gathers are each latency-bound (~16ms apiece at N=1M — the
    # BENCH_r04 RGCA regression; scripts/probe_reduce_r5.py).
    bidx = jnp.clip(bounds - 1, 0, P - 1)
    bvals = jnp.where((bounds > 0)[None, :],
                      jnp.take(csum, bidx, axis=1), 0.0)       # [C, N+1]
    return (bvals[:, 1:] - bvals[:, :-1]).astype(values_cf.dtype)  # [C, N]


@partial(jax.custom_vjp, nondiff_argnums=())
def take_cols(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [C, N] gathered at idx [...] -> [C, ...]; adjoint wrt table
    runs through indexed_add instead of a TPU scatter-add."""
    return table[:, idx]


def _take_cols_fwd(table, idx):
    return table[:, idx], (idx, table.shape)


def _take_cols_bwd(res, g):
    idx, shape = res
    C, N = shape
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(C, -1)                               # [C, P]
    d_table = indexed_add_cf(flat_idx, flat_g, N)           # [C, N]
    return d_table, None


take_cols.defvjp(_take_cols_fwd, _take_cols_bwd)
