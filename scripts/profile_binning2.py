"""Staged in-graph timing of bin_to_tiles internals at bench scale.

Each stage re-runs everything before it (separate jitted programs), so the
marginal cost of a stage is the difference between consecutive rows —
standalone micro-benchmarks of sort/gather/scatter are layout-poisoned on
this TPU, only in-graph numbers are trustworthy.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import goliath_tpu

goliath_tpu.enable_compilation_cache()

from goliath_tpu.ops import gsplat  # noqa: E402
from goliath_tpu.ops.binning import _cumsum1d  # noqa: E402
from probe_renderer import make_scene  # noqa: E402


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    n = int(os.environ.get("N", 1024 * 1024))
    h = int(os.environ.get("H", 2048))
    w = int(os.environ.get("W", 1344))
    ts = int(os.environ.get("TS", 32))
    budget = int(float(os.environ.get("PBM", 2)) * n)
    ntx, nty = -(-w // ts), -(-h // ts)
    num_tiles = ntx * nty
    K = 64
    scene = make_scene(n, h, w)

    def front(pos, quat, scale, op):
        proj = gsplat.project_gaussians(
            pos, scale, quat, scene["Rt"][0],
            scene["K"][0, 0, 0], scene["K"][0, 1, 1],
            scene["K"][0, 0, 2], scene["K"][0, 1, 2], h, w)
        xys = proj["xys"]
        rx = proj["radii_xy"][:, 0]
        ry = proj["radii_xy"][:, 1]
        valid = proj["valid"] & (proj["radii"] > 0)
        dbits = 31 - int(num_tiles + 1).bit_length()
        d = proj["depths"]
        dmin = jnp.min(jnp.where(valid, d, jnp.inf))
        dmax = jnp.max(jnp.where(valid, d, -jnp.inf))
        qd = jnp.clip((d - dmin) / jnp.maximum(dmax - dmin, 1e-9)
                      * ((1 << dbits) - 1), 0, (1 << dbits) - 1).astype(
            jnp.int32)
        x0 = jnp.clip(jnp.floor((xys[:, 0] - rx) / ts), 0, ntx).astype(
            jnp.int32)
        y0 = jnp.clip(jnp.floor((xys[:, 1] - ry) / ts), 0, nty).astype(
            jnp.int32)
        x1 = jnp.clip(jnp.floor((xys[:, 0] + rx) / ts) + 1, 0, ntx).astype(
            jnp.int32)
        y1 = jnp.clip(jnp.floor((xys[:, 1] + ry) / ts) + 1, 0, nty).astype(
            jnp.int32)
        wd = jnp.maximum(x1 - x0, 0)
        ht = jnp.maximum(y1 - y0, 0)
        area = wd * ht
        over = area > K
        ratio = jnp.sqrt(K / jnp.clip(area.astype(jnp.float32), min=1.0))
        w_c = jnp.clip((wd.astype(jnp.float32) * ratio).astype(jnp.int32),
                       1, K)
        w_new = jnp.where(over, jnp.minimum(w_c, wd), wd)
        h_new = jnp.minimum(ht, K // jnp.maximum(w_new, 1))
        counts = jnp.where(valid, w_new * h_new, 0)
        return counts, x0, y0, w_new, qd, dbits

    stages = {}

    def s1(pos, quat, scale, op):
        counts, x0, y0, wk, qd, dbits = front(pos, quat, scale, op)
        ends = _cumsum1d(counts)
        return ends.sum()

    def s2(pos, quat, scale, op):
        counts, x0, y0, wk, qd, dbits = front(pos, quat, scale, op)
        ends = _cumsum1d(counts)
        marks = jnp.zeros(budget, jnp.int32).at[
            jnp.clip(ends, 0, budget - 1).astype(jnp.int32)
        ].add(jnp.where(ends < budget, 1, 0).astype(jnp.int32), mode="drop")
        prim_of_slot = _cumsum1d(marks)
        return prim_of_slot.sum()

    def keys_vals(pos, quat, scale, op):
        counts, x0, y0, wk, qd, dbits = front(pos, quat, scale, op)
        ends = _cumsum1d(counts)
        offsets = ends - counts
        marks = jnp.zeros(budget, jnp.int32).at[
            jnp.clip(ends, 0, budget - 1).astype(jnp.int32)
        ].add(jnp.where(ends < budget, 1, 0).astype(jnp.int32), mode="drop")
        prim_of_slot = _cumsum1d(marks)
        slots = jnp.arange(budget, dtype=jnp.int32)
        in_range = prim_of_slot < n
        p = jnp.clip(prim_of_slot, 0, n - 1)
        table = jnp.stack(
            [offsets.astype(jnp.int32), jnp.maximum(wk, 1), x0, y0,
             qd], axis=1)
        rows = table[p]
        k = slots - rows[:, 0]
        tx = rows[:, 2] + k % rows[:, 1]
        ty = rows[:, 3] + k // rows[:, 1]
        tid = ty * ntx + tx
        keys = jnp.where(in_range, (tid << dbits) | rows[:, 4],
                         num_tiles << dbits)
        vals = jnp.where(in_range, p, 0)
        return keys, vals, slots

    def s3(pos, quat, scale, op):
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        return keys.sum() + vals.sum()

    def s4(pos, quat, scale, op):
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        ks, perm = jax.lax.sort((keys, slots), num_keys=1, is_stable=True)
        return ks.sum() + perm.sum()

    def s5(pos, quat, scale, op):
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        ks, perm = jax.lax.sort((keys, slots), num_keys=1, is_stable=True)
        return ks.sum() + perm.sum() + vals[perm].sum()

    def s5b(pos, quat, scale, op):
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        ks, vs, perm = jax.lax.sort((keys, vals, slots), num_keys=1,
                                    is_stable=True)
        return ks.sum() + perm.sum() + vs.sum()

    def s6(pos, quat, scale, op):
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        ks, perm = jax.lax.sort((keys, slots), num_keys=1, is_stable=True)
        tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32) << (
            31 - int(num_tiles + 1).bit_length())
        bounds = jnp.searchsorted(ks, tile_ids, side="left",
                                  method="scan_unrolled")
        return ks.sum() + perm.sum() + vals[perm].sum() + bounds.sum()

    def s7(pos, quat, scale, op):
        # pack the pair ROWS by sorting them along as 12 f32 payloads
        # (replaces pack_pair_rows' random row gather): build rows in
        # PRESORT order with a monotone gather, then let the sort carry them
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        proj = gsplat.project_gaussians(
            pos, scale, quat, scene["Rt"][0],
            scene["K"][0, 0, 0], scene["K"][0, 1, 1],
            scene["K"][0, 0, 2], scene["K"][0, 1, 2], h, w)
        src = jnp.concatenate(
            [proj["xys"], proj["conics"],
             (op.reshape(-1) * proj["compensation"])[:, None],
             proj["depths"][:, None],
             jnp.zeros((n, 5), jnp.float32)], axis=1)  # [N, 12]
        rows_pre = src[jnp.clip(vals, 0, n - 1)]       # monotone-ish gather
        ops_ = tuple(rows_pre[:, i] for i in range(12))
        sorted_all = jax.lax.sort((keys, slots) + ops_, num_keys=1,
                                  is_stable=True)
        return sum(x.sum() for x in sorted_all)

    def s7b(pos, quat, scale, op):
        # presort-row build only (monotone gather cost)
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        proj = gsplat.project_gaussians(
            pos, scale, quat, scene["Rt"][0],
            scene["K"][0, 0, 0], scene["K"][0, 1, 1],
            scene["K"][0, 0, 2], scene["K"][0, 1, 2], h, w)
        src = jnp.concatenate(
            [proj["xys"], proj["conics"],
             (op.reshape(-1) * proj["compensation"])[:, None],
             proj["depths"][:, None],
             jnp.zeros((n, 5), jnp.float32)], axis=1)  # [N, 12]
        rows_pre = src[jnp.clip(vals, 0, n - 1)]
        return keys.sum() + rows_pre.sum()

    def s8(pos, quat, scale, op):
        # current production shape: 3-op sort + random pack gather
        keys, vals, slots = keys_vals(pos, quat, scale, op)
        proj = gsplat.project_gaussians(
            pos, scale, quat, scene["Rt"][0],
            scene["K"][0, 0, 0], scene["K"][0, 1, 1],
            scene["K"][0, 0, 2], scene["K"][0, 1, 2], h, w)
        src = jnp.concatenate(
            [proj["xys"], proj["conics"],
             (op.reshape(-1) * proj["compensation"])[:, None],
             proj["depths"][:, None],
             jnp.zeros((n, 5), jnp.float32)], axis=1)  # [N, 12]
        ks, vs, perm = jax.lax.sort((keys, vals, slots), num_keys=1,
                                    is_stable=True)
        rows = src[jnp.clip(vs, 0, n - 1)]             # random gather
        return ks.sum() + perm.sum() + rows.sum()

    args = (scene["primpos"][0], scene["primqvec"][0],
            scene["primscale"][0], scene["opacity"][0])
    for name, fn in [("proj+counts+ends", s1), ("+prim_of_slot", s2),
                     ("+keys/vals", s3), ("+sort2", s4),
                     ("+vals[perm]", s5), ("3op-sort instead", s5b),
                     ("+bounds (full)", s6),
                     ("presort rows build", s7b),
                     ("rows as sort payload", s7),
                     ("3op sort + pack gather", s8)]:
        t = timeit(jax.jit(fn), *args)
        print(f"{name:22s} {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
