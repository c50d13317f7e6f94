"""Cumulative-stage timings of the REAL bin_to_tiles body on realistic
projected data (in-graph; standalone micros of sort/gather are
layout-poisoned on this TPU). Each stage jits the binning front-end up to a
cut point, so stage deltas give the true in-graph cost of each sub-op.

Usage: PYTHONHASHSEED=0 python scripts/profile_binning3.py
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

from goliath_tpu.ops import gsplat
from goliath_tpu.ops.binning import _cumsum1d


def timeit(fn, *args, n=6):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def main():
    N = 1 << 20
    H, W, ts = 2048, 1344, 32
    ntx, nty = -(-W // ts), -(-H // ts)
    num_tiles = ntx * nty
    pair_budget = 2 * N
    K_mat = jnp.asarray([[2000.0, 0, W / 2], [0, 2000.0, H / 2], [0, 0, 1]])
    Rt = jnp.eye(4)[:3].at[2, 3].set(900.0)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jax.random.normal(k1, (N, 3)) * 100.0
    quat = jax.random.normal(k2, (N, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    scale = jnp.exp(jax.random.normal(k3, (N, 3)) * 0.3) * 2.0
    op = jax.nn.sigmoid(jax.random.normal(k4, (N, 1)))

    def front(pos, quat, scale, op, stage: int):
        proj = gsplat.project_gaussians(
            pos, scale, quat, Rt, K_mat[0, 0], K_mat[1, 1], K_mat[0, 2],
            K_mat[1, 2], H, W, 0.1, 1.0)
        xys = proj["xys"]
        op_s = (op.reshape(-1) * proj["compensation"])[:, None]
        depth_s = proj["depths"]
        valid = proj["valid"]
        fac = jnp.sqrt(jnp.clip(
            2.0 * jnp.log(jnp.maximum(255.0 * op_s[:, 0], 1e-12)), 0.0, 9.0)
        ) * (1.0 / 3.0)
        rx = proj["radii_xy"][:, 0] * fac
        ry = proj["radii_xy"][:, 1] * fac
        valid = valid & (fac > 0)
        if stage == 0:
            return xys, rx, ry
        dbits = 31 - int(num_tiles + 1).bit_length()
        dmask = jnp.where(valid, depth_s, jnp.inf)
        dmin = jnp.min(dmask)
        dmax = jnp.max(jnp.where(valid, depth_s, -jnp.inf))
        dspan = jnp.maximum(dmax - dmin, 1e-9)
        qd = jnp.clip(((depth_s - dmin) / dspan * ((1 << dbits) - 1)),
                      0, (1 << dbits) - 1).astype(jnp.int32)
        t_min = jnp.stack(
            [jnp.floor((xys[:, 0] - rx) / ts),
             jnp.floor((xys[:, 1] - ry) / ts)], -1).astype(jnp.int32)
        t_max = jnp.stack(
            [jnp.floor((xys[:, 0] + rx) / ts) + 1,
             jnp.floor((xys[:, 1] + ry) / ts) + 1], -1).astype(jnp.int32)
        if stage == 1:
            return t_min, t_max, qd
        # --- bin_to_tiles body, staged ---
        valid2 = valid & (proj["radii"] > 0)
        x0 = jnp.clip(t_min[:, 0], 0, ntx)
        y0 = jnp.clip(t_min[:, 1], 0, nty)
        x1 = jnp.clip(t_max[:, 0], 0, ntx)
        y1 = jnp.clip(t_max[:, 1], 0, nty)
        w = jnp.maximum(x1 - x0, 0)
        h = jnp.maximum(y1 - y0, 0)
        Kc = 64
        area = w * h
        over = area > Kc
        ratio = jnp.sqrt(Kc / jnp.clip(area.astype(jnp.float32), min=1.0))
        w_c = jnp.clip((w.astype(jnp.float32) * ratio).astype(jnp.int32),
                       1, Kc)
        w_new = jnp.where(over, jnp.minimum(w_c, w), w)
        h_new = jnp.minimum(h, Kc // jnp.maximum(w_new, 1))
        cx = (x0 + x1) // 2
        cy = (y0 + y1) // 2
        x0 = jnp.where(w_new < w, jnp.clip(cx - w_new // 2, 0, ntx), x0)
        y0 = jnp.where(h_new < h, jnp.clip(cy - h_new // 2, 0, nty), y0)
        w = w_new
        h = h_new
        counts = jnp.where(valid2, w * h, 0)
        ends = _cumsum1d(counts)
        offsets = ends - counts
        if stage == 2:
            return ends, offsets
        marks = jnp.zeros(pair_budget, jnp.int32).at[
            jnp.clip(ends, 0, pair_budget - 1).astype(jnp.int32)
        ].add(jnp.where(ends < pair_budget, 1, 0).astype(jnp.int32),
              mode="drop")
        if stage == 3:
            return marks
        prim_of_slot = _cumsum1d(marks)
        if stage == 4:
            return prim_of_slot
        slots = jnp.arange(pair_budget, dtype=jnp.int32)
        in_range = prim_of_slot < N
        p = jnp.clip(prim_of_slot, 0, N - 1)
        shift = 31 - int(num_tiles + 1).bit_length()
        qdc = jnp.clip(qd, 0, (1 << shift) - 1).astype(jnp.int32)
        table = jnp.stack(
            [offsets.astype(jnp.int32), jnp.maximum(w, 1).astype(jnp.int32),
             x0.astype(jnp.int32), y0.astype(jnp.int32), qdc], axis=1)
        rows = table[p]
        k = slots - rows[:, 0]
        wk = rows[:, 1]
        kd = jnp.floor(k.astype(jnp.float32) / wk.astype(jnp.float32)
                       ).astype(jnp.int32)
        tx = rows[:, 2] + (k - kd * wk)
        ty = rows[:, 3] + kd
        tile_of_slot = (ty * ntx + tx).astype(jnp.int32)
        keys = jnp.where(in_range, (tile_of_slot << shift) | rows[:, 4],
                         num_tiles << shift)
        vals = jnp.where(in_range, p, 0).astype(jnp.int32)
        if stage == 5:
            return keys, vals
        keys_sorted, vals_sorted, perm = jax.lax.sort(
            (keys, vals, slots), num_keys=1, is_stable=True)
        if stage == 6:
            return keys_sorted, vals_sorted, perm
        tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32) << shift
        bounds = jnp.searchsorted(
            keys_sorted, tile_ids, side="left",
            method="scan_unrolled").astype(jnp.int32)
        return keys_sorted, vals_sorted, perm, bounds

    names = ["project+radii", "+keys/aabb", "+counts cumsum",
             "+marks scatter", "+prim_of_slot cumsum", "+rows gather/keys",
             "+3-op sort", "+searchsorted"]
    prev = 0.0
    for stage in range(8):
        # reduce every output to ONE scalar in-graph: returning arrays makes
        # the host fetch transfer MBs over the axon tunnel, which dominates
        # and scrambles the stage deltas
        fn = jax.jit(
            lambda p, q, s, o, st=stage: sum(
                jnp.sum(x.astype(jnp.float32)) for x in
                jax.tree_util.tree_leaves(front(p, q, s, o, st))))
        t = timeit(fn, pos, quat, scale, op)
        print(f"stage {stage} ({names[stage]:24s}): {t*1e3:7.1f} ms "
              f"(+{(t - prev)*1e3:5.1f})")
        prev = t


if __name__ == "__main__":
    main()
