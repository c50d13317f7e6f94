"""Ablation probe for the Pallas compositor forward kernel.

Times kernel variants with parts of the math removed, at the full bench
scale (1M gaussians, 2048x1344), to locate the cost center:
  full      — the production kernel
  noexp     — polynomial alpha, no exp/log transcendentals
  nomm      — no triangular prefix matmuls (wrong result, right traffic)
  dmaonly   — just accumulate raw rows (DMA + trivial VPU floor)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import goliath_tpu

goliath_tpu.enable_compilation_cache()

from goliath_tpu.ops import gsplat
from goliath_tpu.ops.binning import bin_to_tiles

H, W = 2048, 1344
TS = 16
NTX, NTY = -(-W // TS), -(-H // TS)
P = TS * TS


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / n


def make_kernel(mode: str, chunk: int, inner: int, n_chan: int):
    def kernel(start_ref, end_ref, rows_ref, out_ref, T_scr, acc_scr,
               cnt_scr):
        t = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        start = start_ref[t]
        end = end_ref[t]

        @pl.when(j == 0)
        def _():
            T_scr[:] = jnp.ones((1, P), jnp.float32)
            acc_scr[:] = jnp.zeros((n_chan, P), jnp.float32)
            cnt_scr[0] = 0

        base = (start // chunk + j) * chunk
        have_work = (base < end) & (base + chunk > start) \
            & (jnp.max(T_scr[:]) > 1e-4)

        @pl.when(have_work)
        def _():
            tx = (t % NTX) * TS
            ty = (t // NTX) * TS
            pix_i = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            px = (pix_i % TS + tx).astype(jnp.float32) + 0.5
            py = (pix_i // TS + ty).astype(jnp.float32) + 0.5
            row_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 0)
            col_i = jax.lax.broadcasted_iota(jnp.int32, (inner, inner), 1)
            tri = (col_i <= row_i).astype(jnp.float32)

            def sub(si, _):
                off = si * inner
                data = rows_ref[pl.ds(off, inner), :]
                ridx = base + off + jax.lax.broadcasted_iota(
                    jnp.int32, (inner, 1), 0)
                m = (ridx >= start) & (ridx < end)
                cols = data[:, 8:8 + n_chan]

                if mode == "dmaonly":
                    acc_scr[:] += jax.lax.dot_general(
                        cols, data[:, 0:1] * m + px * 0.0,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return 0

                d0 = data[:, 0:1] - px
                d1 = data[:, 1:2] - py
                a = data[:, 2:3]
                b = data[:, 3:4]
                c = data[:, 4:5]
                sigma = 0.5 * (a * d0 * d0 + c * d1 * d1) + b * d0 * d1
                if mode == "noexp":
                    raw = data[:, 5:6] * jnp.maximum(1.0 - sigma, 0.0)
                else:
                    raw = data[:, 5:6] * jnp.exp(-jnp.clip(sigma, 0.0, 60.0))
                alpha = jnp.minimum(0.999, raw)
                keep = (sigma >= 0) & (alpha >= 1.0 / 255) & m
                alpha = jnp.where(keep, alpha, 0.0)
                one_m = 1.0 - alpha

                if mode == "nomm":
                    T = T_scr[:]
                    w = alpha * T
                    acc_scr[:] += jax.lax.dot_general(
                        cols, w, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    T_scr[:] = T * one_m[inner - 1:inner]
                    return 0

                if mode == "noexp":
                    cum = jax.lax.dot_general(
                        tri, one_m, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) / inner
                else:
                    cum = jnp.exp(jax.lax.dot_general(
                        tri, jnp.log(one_m), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))
                T = T_scr[:]
                T_excl = T * cum / one_m
                w = alpha * T_excl
                acc_scr[:] += jax.lax.dot_general(
                    cols, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                T_scr[:] = T * cum[inner - 1:inner]
                return 0

            lo = jnp.maximum(start - base, 0) // inner
            hi = (jnp.minimum(end - base, chunk) + inner - 1) // inner
            lax.fori_loop(lo, hi, sub, 0)

        @pl.when(j == nj - 1)
        def _():
            out_ref[0, :n_chan] = acc_scr[:]
            out_ref[0, n_chan:n_chan + 1] = T_scr[:]
            out_ref[0, n_chan + 1:n_chan + 2] = jnp.full(
                (1, P), cnt_scr[0], jnp.float32)

    return kernel


def run_variant(mode, chunk, inner, mppt, rows, tile_start, tile_end,
                n_chan):
    nchunks = mppt // chunk + 1
    T_tiles = NTX * NTY
    out_feat = n_chan + 2
    feat = rows.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T_tiles, nchunks),
        in_specs=[pl.BlockSpec(
            (chunk, feat),
            lambda t, j, start, end: (start[t] // chunk + j, 0))],
        out_specs=pl.BlockSpec(
            (1, out_feat, P), lambda t, j, start, end: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, P), jnp.float32),
            pltpu.VMEM((n_chan, P), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    f = pl.pallas_call(
        make_kernel(mode, chunk, inner, n_chan),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_tiles, out_feat, P), jnp.float32),
    )

    @jax.jit
    def go(tile_start, tile_end, rows):
        return f(tile_start, tile_end, rows).sum()

    return timeit(go, tile_start, tile_end, rows)


def main():
    N = 1 << 20
    C = 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    pos = jax.random.normal(ks[0], (N, 3)) * 100.0
    quat = jax.random.normal(ks[1], (N, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    scale = jnp.exp(jax.random.normal(ks[2], (N, 3)) * 0.3) * 2.0
    op = jax.nn.sigmoid(jax.random.normal(ks[3], (N, 1)))
    col = jax.nn.sigmoid(jax.random.normal(ks[4], (N, C)))
    Rt = jnp.asarray(
        [[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 400.0]])
    fx = fy = 2000.0
    cx, cy = W / 2, H / 2

    @jax.jit
    def build():
        proj = gsplat.project_gaussians(pos, scale, quat, Rt, fx, fy, cx,
                                        cy, H, W)
        order = jnp.argsort(proj["depths"])
        xys = proj["xys"][order]
        conics = proj["conics"][order]
        radii = proj["radii"][order]
        valid = proj["valid"][order]
        op_s = (op.reshape(-1))[order][:, None]
        chan = col[order]
        t_min = jnp.stack(
            [jnp.floor((xys[:, 0] - radii) / TS),
             jnp.floor((xys[:, 1] - radii) / TS)], -1).astype(jnp.int32)
        t_max = jnp.stack(
            [jnp.floor((xys[:, 0] + radii) / TS) + 1,
             jnp.floor((xys[:, 1] + radii) / TS) + 1], -1).astype(jnp.int32)
        b = bin_to_tiles(t_min, t_max, valid & (radii > 0), NTX, NTY, 64,
                         4 * N)
        gi = jnp.clip(b.sorted_prim, 0, N - 1)
        rows = jnp.concatenate(
            [xys[gi], conics[gi], (op_s.reshape(-1) * valid)[gi][:, None],
             jnp.zeros((4 * N, 2)), chan[gi]], axis=1)
        return rows, b.tile_start, b.tile_end, b.tile_end - b.tile_start

    rows, tile_start, tile_end, cnts = jax.device_get(build())
    import numpy as np
    print(f"pairs: total={int(np.sum(np.minimum(cnts, 10**9)))} "
          f"nonempty_tiles={int((cnts > 0).sum())} "
          f"max/tile={int(cnts.max())} mean/tile={float(cnts.mean()):.1f}")
    rows = jnp.asarray(rows)
    tile_start = jnp.asarray(tile_start)
    tile_end = jnp.asarray(tile_end)

    configs = [(256, 256), (256, 64), (64, 64), (512, 128)]
    for mode in ["full", "noexp", "nomm", "dmaonly"]:
        for chunk, inner in configs:
            mppt = 512
            rows_p = jnp.pad(
                rows, ((0, (mppt // chunk + 1) * chunk), (0, 0)))
            t = run_variant(mode, chunk, inner, mppt, rows_p, tile_start,
                            tile_end, C)
            print(f"{mode:8s} chunk={chunk:4d} inner={inner:4d}: "
                  f"{t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
