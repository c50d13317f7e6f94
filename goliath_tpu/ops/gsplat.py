"""3D Gaussian splatting for TPU (replaces the external CUDA `gsplat==0.1.11`,
reference wrapper ca_code/utils/render_gsplat.py:13-108).

Pipeline (all static shapes, jit/pjit-safe):
  * `project_gaussians` — EWA projection: quat/scale -> cov3d -> perspective
    Jacobian -> cov2d (+0.3px AA blur with gsplat's det-ratio compensation),
    conics, 3-sigma screen radii. Pure jnp; AD differentiates it.
  * depth argsort (XLA sort) + `bin_to_tiles` (ops/binning.py) group
    gaussians per 16px screen tile in depth order.
  * `rasterize_tiled` — per-tile front-to-back alpha compositing as a
    chunked `lax.scan` (within-chunk ordering via cumprod), wrapped in a
    **custom VJP** whose backward re-marches back-to-front reconstructing
    transmittance from the saved final T — O(1) residual memory per pixel,
    the same trick as gsplat's CUDA backward but vectorized for the VPU.
  * `rasterize_reference` — exact O(pixels x gaussians) compositing used as
    the parity/gradcheck oracle (the mvpraymarch-gradcheck pattern,
    reference extensions/mvpraymarch/mvpraymarch.py:446-803).

Depth is composited as an extra channel in the same pass (the reference
rasterizes twice).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from goliath_tpu.ops.backend import target_backend
from jax import lax

from goliath_tpu.ops.binning import TileBinning, bin_to_tiles
from goliath_tpu.utils.quaternion import quat_to_matrix

ALPHA_CLIP = 0.999
ALPHA_MIN = 1.0 / 255.0


# ---------------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------------


def project_gaussians(
    means3d: jnp.ndarray,   # [N, 3]
    scales: jnp.ndarray,    # [N, 3]
    quats: jnp.ndarray,     # [N, 4] (x, y, z, w)
    Rt: jnp.ndarray,        # [3or4, 4] world->cam
    fx: jnp.ndarray, fy: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
    img_h: int, img_w: int,
    z_near: float = 0.1,
    global_scale: float = 1.0,
    blur: float = 0.3,
) -> Dict[str, jnp.ndarray]:
    # All math below is written channel-wise (no [N, 3, 3] matmuls): XLA on
    # TPU pads tiny trailing dims to (8, 128) tiles, so batched 3x3 algebra
    # wastes >100x FLOPs; explicit components stay pure VPU work.
    R_wc = Rt[:3, :3]
    t_wc = Rt[:3, 3]
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    px = R_wc[0, 0] * mx + R_wc[0, 1] * my + R_wc[0, 2] * mz + t_wc[0]
    py = R_wc[1, 0] * mx + R_wc[1, 1] * my + R_wc[1, 2] * mz + t_wc[1]
    z = R_wc[2, 0] * mx + R_wc[2, 1] * my + R_wc[2, 2] * mz + t_wc[2]
    depths = z

    # rotation matrix entries from the quaternion (x, y, z, w)
    qx, qy, qz, qw = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0 = (scales[:, 0] * global_scale) ** 2
    s1 = (scales[:, 1] * global_scale) ** 2
    s2 = (scales[:, 2] * global_scale) ** 2
    # cov3d = R diag(s^2) R^T, 6 unique entries
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2

    zc = jnp.clip(z, min=1e-6)
    # limit the EWA Jacobian evaluation point like gsplat (tan fov * 1.3)
    lim_x = 1.3 * (0.5 * img_w / fx)
    lim_y = 1.3 * (0.5 * img_h / fy)
    tx = zc * jnp.clip(px / zc, -lim_x, lim_x)
    ty = zc * jnp.clip(py / zc, -lim_y, lim_y)
    # rows of T = J @ R_wc, J = [[fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]]
    j00 = fx / zc
    j02 = -fx * tx / zc**2
    j11 = fy / zc
    j12 = -fy * ty / zc**2
    t0x = j00 * R_wc[0, 0] + j02 * R_wc[2, 0]
    t0y = j00 * R_wc[0, 1] + j02 * R_wc[2, 1]
    t0z = j00 * R_wc[0, 2] + j02 * R_wc[2, 2]
    t1x = j11 * R_wc[1, 0] + j12 * R_wc[2, 0]
    t1y = j11 * R_wc[1, 1] + j12 * R_wc[2, 1]
    t1z = j11 * R_wc[1, 2] + j12 * R_wc[2, 2]
    # cov2d = T cov3d T^T
    u0x = t0x * c00 + t0y * c01 + t0z * c02
    u0y = t0x * c01 + t0y * c11 + t0z * c12
    u0z = t0x * c02 + t0y * c12 + t0z * c22
    u1x = t1x * c00 + t1y * c01 + t1z * c02
    u1y = t1x * c01 + t1y * c11 + t1z * c12
    u1z = t1x * c02 + t1y * c12 + t1z * c22
    v00 = u0x * t0x + u0y * t0y + u0z * t0z
    v01 = u0x * t1x + u0y * t1y + u0z * t1z
    v11 = u1x * t1x + u1y * t1y + u1z * t1z

    det_raw = v00 * v11 - v01 * v01
    v00 = v00 + blur
    v11 = v11 + blur
    det = v00 * v11 - v01 * v01
    compensation = jnp.sqrt(jnp.clip(det_raw / jnp.clip(det, min=1e-12),
                                     min=0.0))

    inv_det = 1.0 / jnp.clip(det, min=1e-12)
    conics = jnp.stack([v11 * inv_det, -v01 * inv_det, v00 * inv_det], -1)

    # 3-sigma radius from the larger eigenvalue (kept for callers that want
    # a scalar footprint, e.g. visualization)
    b_ = 0.5 * (v00 + v11)
    v1 = b_ + jnp.sqrt(jnp.clip(b_**2 - det, min=0.1))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(v1, min=0.0)))
    # Per-axis extents of the 3-sigma ellipse: the tight bounding box of
    # {d : d^T cov2d^-1 d = 9} is +-3*sqrt(cov2d_ii). Strictly tighter than
    # the circle of radius 3*sqrt(lambda_max) with the SAME sigma<=4.5 cut
    # criterion — anisotropic gaussians bin to far fewer tiles, and every
    # downstream cost (pair sort, kernels, grad reduce) scales with pairs.
    radii_x = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(v00, min=0.0)))
    radii_y = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(v11, min=0.0)))

    xys = jnp.stack([fx * px / zc + cx, fy * py / zc + cy], axis=-1)

    valid = (z > z_near) & (det > 0)
    radii = jnp.where(valid, radii, 0.0)
    radii_xy = jnp.stack([jnp.where(valid, radii_x, 0.0),
                          jnp.where(valid, radii_y, 0.0)], axis=-1)
    cov3d = jnp.stack([c00, c01, c02, c11, c12, c22], -1)
    return dict(
        xys=xys, depths=depths, radii=radii, radii_xy=radii_xy,
        conics=conics, compensation=compensation, valid=valid, cov3d=cov3d,
    )


# ---------------------------------------------------------------------------
# exact reference compositing (parity oracle)
# ---------------------------------------------------------------------------


def rasterize_reference(
    xys, conics, opacities, colors, depths, valid, img_h: int, img_w: int,
    bg_color: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(H*W*N) exact front-to-back compositing. Use only on small inputs."""
    order = jnp.argsort(depths)
    xys = xys[order]
    conics = conics[order]
    op = opacities[order].reshape(-1)
    col = colors[order]
    val = valid[order]

    ys = jnp.arange(img_h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(img_w, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys, indexing="xy")
    pix = jnp.stack([px, py], -1).reshape(-1, 2)  # [P, 2]

    d = xys[:, None, :] - pix[None, :, :]  # [N, P, 2]
    a, b, c = conics[:, 0:1], conics[:, 1:2], conics[:, 2:3]
    sigma = 0.5 * (a * d[..., 0] ** 2 + c * d[..., 1] ** 2) + b * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(ALPHA_CLIP, op[:, None] * jnp.exp(-sigma))
    alpha = jnp.where(
        (sigma >= 0) & (alpha >= ALPHA_MIN) & val[:, None], alpha, 0.0
    )
    one_m = 1.0 - alpha
    T_excl = jnp.cumprod(one_m, axis=0) / one_m  # T before each gaussian
    w = alpha * T_excl  # [N, P]
    out = jnp.einsum("np,nc->cp", w, col)
    T_final = jnp.prod(one_m, axis=0)
    if bg_color is not None:
        out = out + T_final[None] * bg_color[:, None]
    C = colors.shape[-1]
    return out.reshape(C, img_h, img_w), T_final.reshape(img_h, img_w)


# ---------------------------------------------------------------------------
# tiled rasterizer with custom VJP
# ---------------------------------------------------------------------------


def _tile_pixels(tile_size: int, num_tiles_x: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center offsets within a tile [P, 2] and helper for tile origin."""
    ty, tx = jnp.meshgrid(
        jnp.arange(tile_size, dtype=jnp.float32),
        jnp.arange(tile_size, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([tx, ty], -1).reshape(-1, 2) + 0.5


def _pack_rows(xys, conics, opacities, colors, valid, sorted_prim):
    """Pre-gather pair-ordered rows CHANNEL-FIRST [6 + C, budget] so the
    per-tile scan reads CONTIGUOUS slices (random gathers on TPU are
    latency-bound; one bulk gather here replaces ~16 per-chunk gathers).

    Channel-first is load-bearing: a [budget, 9] table puts the 9-wide
    field axis in the 128-lane minor dimension, which XLA pads 14x — and
    under vmap the batched gather materialized 128x-padded [1, budget, 1]
    broadcast temps (20GB+ at full res, the round-2 insurance-rung OOM).
    With budget minor, padding is negligible.
    """
    N = xys.shape[0]
    gi = jnp.clip(sorted_prim, 0, N - 1)
    op = opacities.reshape(-1) * valid
    table = jnp.concatenate(
        [xys.T, conics.T, op[None], colors.T], axis=0
    )  # [6+C, N]
    return table[:, gi]


def _chunk_alpha_rows(data, m, pix):
    """alpha for a chunk of pre-gathered channel-first rows [6+C, CH] at
    pixels [P, 2].

    sigma is clamped to >= 0 before the exp so masked/invalid gaussians
    (garbage conics) can't overflow into inf/NaN in fwd or bwd.
    """
    dx = data[0][:, None] - pix[None, :, 0]  # [CH, P]
    dy = data[1][:, None] - pix[None, :, 1]
    a, b, c = data[2][:, None], data[3][:, None], data[4][:, None]
    sigma = 0.5 * (a * dx ** 2 + c * dy ** 2) + b * dx * dy
    sigma_safe = jnp.clip(sigma, 0.0, 60.0)
    raw = data[5][:, None] * jnp.exp(-sigma_safe)
    alpha = jnp.minimum(ALPHA_CLIP, raw)
    keep = (sigma >= 0) & (alpha >= ALPHA_MIN) & m[:, None]
    return jnp.where(keep, alpha, 0.0), (dx, dy, sigma_safe, raw, keep)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def rasterize_tiled(
    xys, conics, opacities, colors, binning_arrays,
    img_h: int, img_w: int, tile_size: int, max_pairs_per_tile: int,
    chunk: int, ntx: int, nty: int,
):
    """binning_arrays: (sorted_prim, tile_start, tile_end, valid,
    perm, prim_offsets, prim_ends, tile_of_pair) — arrays only; static tile-grid dims
    travel as nondiff args so they stay Python ints under jit (custom_vjp
    lifts every pytree leaf to a tracer)."""
    out, T_final = _rasterize_fwd_impl(
        xys, conics, opacities, colors, binning_arrays,
        img_h, img_w, tile_size, max_pairs_per_tile, chunk, ntx, nty,
    )
    return out, T_final


def _rasterize_fwd_impl(
    xys, conics, opacities, colors, binning_arrays,
    img_h, img_w, tile_size, max_pairs_per_tile, chunk, ntx, nty,
):
    sorted_prim, tile_start, tile_end, valid = binning_arrays[:4]
    P = tile_size * tile_size
    C = colors.shape[-1]
    nchunks = max_pairs_per_tile // chunk
    pix_local = _tile_pixels(tile_size, ntx)  # [P, 2]
    rows = _pack_rows(xys, conics, opacities, colors, valid, sorted_prim)
    rows = jnp.pad(rows, ((0, 0), (0, max_pairs_per_tile)))

    def render_tile(tile_idx, start, end):
        tx = tile_idx % ntx
        ty = tile_idx // ntx
        origin = jnp.stack([tx * tile_size, ty * tile_size]).astype(jnp.float32)
        pix = pix_local + origin[None]

        def step(carry, ci):
            T, acc = carry
            base = start + ci * chunk
            data = lax.dynamic_slice(rows, (0, base), (6 + C, chunk))
            m = (base + jnp.arange(chunk, dtype=jnp.int32)) < end
            alpha, _ = _chunk_alpha_rows(data, m, pix)
            one_m = 1.0 - alpha                      # [CH, P]
            cum = jnp.cumprod(one_m, axis=0)
            T_excl = T[None] * cum / one_m           # T before each element
            w = alpha * T_excl                       # [CH, P]
            acc = acc + jnp.einsum("kp,ck->cp", w, data[6:])
            T = T * cum[-1]
            return (T, acc), None

        init = (jnp.ones((P,)), jnp.zeros((C, P)))
        (T, acc), _ = lax.scan(step, init, jnp.arange(nchunks, dtype=jnp.int32))
        return acc, T

    tiles = jnp.arange(ntx * nty, dtype=jnp.int32)
    accs, Ts = jax.vmap(render_tile)(tiles, tile_start, tile_end)
    # accs [T, C, P] -> [C, H, W]
    out = _tiles_to_image(accs, ntx, nty, tile_size, img_h, img_w)
    T_img = _tiles_to_image(Ts[:, None], ntx, nty, tile_size, img_h, img_w)[0]
    return out, T_img


def _tiles_to_image(tiles_cp, ntx, nty, ts, img_h, img_w):
    """[T, C, P] -> [C, H, W] (crop to image size)."""
    T, C, P = tiles_cp.shape
    x = tiles_cp.reshape(nty, ntx, C, ts, ts)
    x = x.transpose(2, 0, 3, 1, 4).reshape(C, nty * ts, ntx * ts)
    return x[:, :img_h, :img_w]


def _image_to_tiles(img, ntx, nty, ts):
    """[C, H, W] -> [T, C, P] with zero padding."""
    C, H, W = img.shape
    pad_h = nty * ts - H
    pad_w = ntx * ts - W
    x = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w)))
    x = x.reshape(C, nty, ts, ntx, ts).transpose(1, 3, 0, 2, 4)
    return x.reshape(nty * ntx, C, ts * ts)


def _rasterize_fwd(xys, conics, opacities, colors, binning_arrays,
                   img_h, img_w, tile_size, max_pairs_per_tile, chunk,
                   ntx, nty):
    out, T_final = _rasterize_fwd_impl(
        xys, conics, opacities, colors, binning_arrays,
        img_h, img_w, tile_size, max_pairs_per_tile, chunk, ntx, nty,
    )
    res = (xys, conics, opacities, colors, binning_arrays, T_final)
    return (out, T_final), res


def reduce_sorted_pair_grads(sorted_g, perm, prim_offsets, prim_ends):
    """Reduce per-pair grads (sorted-pair order [budget, F]) to per-prim sums
    returned CHANNEL-FIRST [F, N] (lane-dense; callers slice rows) without
    scatter-add: permute into pre-sort order where each prim's
    pairs are contiguous (ONE unique-index row scatter at perm — the binning
    no longer materializes an inverse permutation), then per-prim sums are
    prefix-sum differences.

    The prefix sum runs as a single-pass Pallas kernel on TPU (XLA's cumsum
    at 4M x 16 costs ~250ms; the carry kernel is ~10x cheaper)."""
    # Apply the inverse permutation by SORTING with the grad columns as
    # payloads: perm is exactly the presort slot of each sorted row, so
    # sorting by it lands rows in presort order. Measured 17.6ms at 2M vs
    # 61.7ms for int-scatter + row-gather (and ~150ms for a row scatter) —
    # in-graph lax.sort payload movement is far cheaper than random
    # row-indexed memory ops on this TPU.
    F = sorted_g.shape[1]
    ops = tuple(sorted_g[:, i] for i in range(F))
    out = jax.lax.sort((perm,) + ops, num_keys=1, is_stable=False)
    if target_backend() == "tpu":
        # lane-dense batched cumsum straight off the sort payload columns:
        # stacking to [budget, F] first would pad F up to 128 lanes and
        # make the cumsum kernel move ~13x the data (measured 18ms vs ~4)
        from goliath_tpu.ops.gsplat_pallas import cumsum_cols_pl

        budget = sorted_g.shape[0]
        csum = cumsum_cols_pl(out[1:])                       # [F, budget]
        bounds = jnp.concatenate([prim_offsets, prim_ends[-1:]])
        bidx = jnp.clip(bounds - 1, 0, budget - 1)
        # ONE lane-axis gather of the channel-first csum: [F, budget]
        # taken along axis=1 stays lane-dense AND single-pass. Measured at
        # budget=2M/F=10/N=1M (scripts/probe_reduce_r5.py): 18ms, vs 161ms
        # for F separate 1-D gathers (each is latency-bound on its own —
        # the r4 form that caused the BENCH_r04 RGCA regression) and 18ms
        # for the r3 row-gather of [N+1, F] (12.8x lane-padded).
        bvals = jnp.where((bounds > 0)[None, :],
                          jnp.take(csum, bidx, axis=1), 0.0)  # [F, N+1]
        return bvals[:, 1:] - bvals[:, :-1]                  # [F, N]
    presort_g = jnp.stack(out[1:], axis=1)                          # [budget, F]
    return reduce_presort_pair_grads(presort_g, prim_offsets, prim_ends).T


def reduce_presort_pair_grads(presort_g, prim_offsets, prim_ends):
    """Per-prim sums from PRESORT-ordered pair grads (prims contiguous).

    prim_ends[i] == prim_offsets[i+1] (both come from one cumsum of counts),
    so the two per-prim boundary lookups collapse into ONE gather of N+1
    rows at concat(offsets, total)-1 — row gathers are latency-bound
    (~25ns/row) on TPU, so halving the row count halves this stage."""
    budget = presort_g.shape[0]
    if target_backend() == "tpu":
        from goliath_tpu.ops.gsplat_pallas import cumsum_rows_pl

        csum = cumsum_rows_pl(presort_g.astype(jnp.float32))
    else:
        csum = jnp.cumsum(presort_g.astype(jnp.float32), axis=0)
    bounds = jnp.concatenate([prim_offsets, prim_ends[-1:]])        # [N+1]
    bvals = jnp.where(
        (bounds > 0)[:, None],
        csum[jnp.clip(bounds - 1, 0, budget - 1)], 0.0)             # [N+1, F]
    return bvals[1:] - bvals[:-1]                                   # [N, F]


def _rasterize_bwd(img_h, img_w, tile_size, max_pairs_per_tile, chunk,
                   ntx, nty, res, grads):
    xys, conics, opacities, colors, binning_arrays, T_final = res
    dL_dout, dL_dT = grads
    (sorted_prim, tile_start, tile_end, valid,
     perm, prim_offsets, prim_ends) = binning_arrays[:7]
    P = tile_size * tile_size
    rows = _pack_rows(xys, conics, opacities, colors, valid, sorted_prim)
    rows = jnp.pad(rows, ((0, 0), (0, max_pairs_per_tile)))
    C = colors.shape[-1]
    nchunks = max_pairs_per_tile // chunk
    pix_local = _tile_pixels(tile_size, ntx)
    budget = sorted_prim.shape[0]
    N = xys.shape[0]

    dout_tiles = _image_to_tiles(dL_dout, ntx, nty, tile_size)      # [T, C, P]
    dT_tiles = _image_to_tiles(dL_dT[None], ntx, nty, tile_size)[:, 0]  # [T, P]
    Tf_tiles = _image_to_tiles(T_final[None], ntx, nty, tile_size)[:, 0]

    def grad_tile(tile_idx, start, end, dout, dT, Tf):
        tx = tile_idx % ntx
        ty = tile_idx // ntx
        origin = jnp.stack([tx * tile_size, ty * tile_size]).astype(jnp.float32)
        pix = pix_local + origin[None]

        def step(carry, ci_rev):
            T_run, S = carry  # T after remaining chunk(s); suffix color [C, P]
            ci = nchunks - 1 - ci_rev
            base = start + ci * chunk
            data = lax.dynamic_slice(rows, (0, base), (6 + C, chunk))
            m = (base + jnp.arange(chunk, dtype=jnp.int32)) < end
            alpha, (d0, d1, sigma, raw, keep) = _chunk_alpha_rows(data, m, pix)
            col = data[6:].T                          # [CH, C] (tiny)
            one_m = 1.0 - alpha
            # suffix products including element i (within chunk)
            rev_cum = jnp.cumprod(one_m[::-1], axis=0)[::-1]   # [CH, P]
            T_i = T_run[None] / jnp.clip(rev_cum, min=1e-20)   # T before elem i
            w_i = alpha * T_i                                   # [CH, P]
            cw = jnp.einsum("kp,kc->kcp", w_i, col)             # [CH, C, P]
            # suffix color after element i: S + sum_{j>i} cw_j
            suff = jnp.cumsum(cw[::-1], axis=0)[::-1] - cw      # [CH, C, P]
            S_i = S[None] + suff

            inv_one_m = 1.0 / jnp.clip(one_m, min=1e-3)
            # sum_c dout_c * (col_c T_i - S_i_c / (1-a)) unrolled over the
            # few channels: the einsum form lowers to P-batched 1xC @ C xCH
            # matmuls whose [P, 1, CH] output pads 16x under TPU (8, 128)
            # tiling (~10GB at full res); elementwise FMAs stay dense
            dalpha = -(dT * Tf)[None] * inv_one_m
            for c_i in range(C):
                dalpha = dalpha + dout[c_i][None] * (
                    col[:, c_i][:, None] * T_i - S_i[:, c_i] * inv_one_m)
            dalpha = jnp.where(keep, dalpha, 0.0)
            # d alpha / d raw: 1 where not clipped
            not_clipped = raw < ALPHA_CLIP
            draw = jnp.where(not_clipped, dalpha, 0.0)
            dop = jnp.sum(draw * jnp.exp(-sigma) * keep, axis=1)       # [CH]
            dsigma = -raw * draw                                        # [CH, P]
            dsigma = jnp.where(keep, dsigma, 0.0)
            dcon = jnp.stack(
                [jnp.sum(0.5 * d0 * d0 * dsigma, 1),
                 jnp.sum(d0 * d1 * dsigma, 1),
                 jnp.sum(0.5 * d1 * d1 * dsigma, 1)], axis=-1)          # [CH,3]
            ca, cb, cc = data[2][:, None], data[3][:, None], data[4][:, None]
            dxy = jnp.stack(
                [jnp.sum((ca * d0 + cb * d1) * dsigma, 1),
                 jnp.sum((cb * d0 + cc * d1) * dsigma, 1)],
                axis=-1)                                                # [CH,2]
            dcol = jnp.einsum("kp,cp->kc", w_i, dout)                   # [CH,C]

            S = S + jnp.sum(cw, axis=0)
            T_run = T_run / jnp.clip(rev_cum[0], min=1e-20)
            pair_grads = jnp.concatenate(
                [dxy, dcon, dop[:, None], dcol], axis=-1)               # [CH, 6+C]
            return (T_run, S), pair_grads

        init = (Tf, jnp.zeros((C, P)))
        (_, _), pair_grads = lax.scan(
            step, init, jnp.arange(nchunks, dtype=jnp.int32)
        )
        # scan stacked in reverse order; restore depth order
        return pair_grads[::-1].reshape(nchunks * chunk, -1)

    tiles = jnp.arange(ntx * nty, dtype=jnp.int32)
    pair_grads = jax.vmap(grad_tile)(
        tiles, tile_start, tile_end, dout_tiles, dT_tiles, Tf_tiles,
    )  # [T, maxpp, 6+C]

    # Reduce pair grads to gaussians WITHOUT scatter-add (TPU scatters
    # serialize): (1) place each tile's grads into the sorted pair buffer —
    # tile segments are disjoint so this is a unique-index set with
    # near-monotone indices; (2) invert the sort permutation so each prim's
    # pairs are contiguous; (3) per-prim sums are prefix-sum differences.
    maxpp = max_pairs_per_tile
    F = pair_grads.shape[-1]
    local = jnp.arange(maxpp, dtype=jnp.int32)[None]
    pair_pos = tile_start[:, None] + local                          # [T, maxpp]
    pair_ok = (pair_pos < tile_end[:, None])
    pair_pos = jnp.where(pair_ok, pair_pos, budget)
    flat_g = jnp.where(pair_ok[..., None], pair_grads, 0.0).reshape(-1, F)
    sorted_g = jnp.zeros((budget, F)).at[pair_pos.reshape(-1)].set(
        flat_g, mode="drop", unique_indices=True)
    acc = reduce_sorted_pair_grads(sorted_g, perm, prim_offsets, prim_ends)

    dxys = acc[0:2].T
    dconics = acc[2:5].T
    dopacities = acc[5].reshape(opacities.shape)
    dcolors = acc[6:].T
    return (dxys, dconics, dopacities, dcolors, None)


rasterize_tiled.defvjp(_rasterize_fwd, _rasterize_bwd)


# ---------------------------------------------------------------------------
# full render (batched)
# ---------------------------------------------------------------------------


def prepare_sample(
    K_b, Rt_b, pos, quat, scale, op, col,
    cam_img_h: int, cam_img_w: int, tile_size: int,
    z_near: float = 0.1, global_scale: float = 1.0,
    max_tiles_per_prim: int = 64, pair_budget: int | None = None,
    return_depth: bool = True,
    y_offset_px=0.0,
    bin_img_h: int | None = None,
):
    """Project one sample's gaussians and bin them to screen tiles.

    Returns (xys, conics, op_s, chan, valid, radii, binning). No global
    depth sort: per-tile depth order comes from a composite
    (tile << bits | quantized-depth) sort key inside the binning (the CUDA
    gsplat key design) — this removes an [N] argsort AND the [N]-row
    reorder gather from every render.

    y_offset_px shifts projected centers down-screen by -y_offset (after
    projection; conics are translation-invariant) and bin_img_h restricts
    the tile grid to that band height, so a caller can render a horizontal
    BAND of the full image as if it were a small image — the cross-chip
    tile-sharding axis (parallel/tile_shard.py). Projection (Jacobian
    limits, validity, depth range) always uses the FULL cam_img_h, so
    per-prim quantities are identical across bands."""
    ntx = -(-cam_img_w // tile_size)
    nty = -(-(bin_img_h if bin_img_h is not None else cam_img_h)
            // tile_size)
    N = pos.shape[0]
    if pair_budget is None:
        pair_budget = 4 * N
    (xys, conics, op_s, chan, valid, radii, ld,
     t_min, t_max) = _project_sample(
        K_b, Rt_b, pos, quat, scale, op, col, cam_img_h, cam_img_w,
        tile_size, z_near, global_scale, return_depth, y_offset_px)

    num_tiles = ntx * nty
    dbits = 31 - int(num_tiles + 1).bit_length()
    qd = _quantize_log_depth(ld, valid, dbits)
    binning = bin_to_tiles(
        t_min, t_max, valid & (radii > 0), ntx, nty,
        max_tiles_per_prim, pair_budget, depth_keys=qd,
    )
    return xys, conics, op_s, chan, valid, radii, binning


def _project_sample(K_b, Rt_b, pos, quat, scale, op, col, cam_img_h,
                    cam_img_w, tile_size, z_near, global_scale,
                    return_depth, y_offset_px=0.0):
    """Per-prim projection half of prepare_sample (pure XLA, vmappable).

    Returns (xys, conics, op_s, chan, valid, radii, log_depth, t_min,
    t_max) — the tile AABBs are UNclipped; bin_to_tiles clips."""
    proj = project_gaussians(
        pos, scale, quat, Rt_b,
        K_b[0, 0], K_b[1, 1], K_b[0, 2], K_b[1, 2],
        cam_img_h, cam_img_w, z_near, global_scale,
    )
    xys = proj["xys"] - jnp.stack(
        [jnp.zeros_like(jnp.asarray(y_offset_px, jnp.float32)),
         jnp.asarray(y_offset_px, jnp.float32)])
    conics = proj["conics"]
    radii = proj["radii"]
    op_s = (op.reshape(-1) * proj["compensation"])[:, None]
    depth_s = proj["depths"]
    valid = proj["valid"]
    # Opacity-aware footprint: the compositor zeroes alpha < 1/255, and
    # alpha = op*exp(-sigma) >= 1/255 iff sigma <= ln(255*op) — so the
    # EXACT support radius is sqrt(2*ln(255*op))*sqrt(cov_ii), capped at
    # the 3-sigma box (equality at op≈0.35). Low-opacity gaussians bin to
    # far fewer tiles with ZERO image change; every budget-scaled cost
    # (pair sort, pack/reduce gathers, kernels) shrinks with demand.
    fac = jnp.sqrt(jnp.clip(
        2.0 * jnp.log(jnp.maximum(255.0 * op_s[:, 0], 1e-12)), 0.0, 9.0)
    ) * (1.0 / 3.0)
    rx = proj["radii_xy"][:, 0] * fac
    ry = proj["radii_xy"][:, 1] * fac
    valid = valid & (fac > 0)
    chan = col
    if return_depth:
        chan = jnp.concatenate([chan, depth_s[:, None]], axis=-1)

    ld = jnp.log(jnp.maximum(depth_s, z_near))
    t_min = jnp.stack(
        [jnp.floor((xys[:, 0] - rx) / tile_size),
         jnp.floor((xys[:, 1] - ry) / tile_size)], -1
    ).astype(jnp.int32)
    t_max = jnp.stack(
        [jnp.floor((xys[:, 0] + rx) / tile_size) + 1,
         jnp.floor((xys[:, 1] + ry) / tile_size) + 1], -1
    ).astype(jnp.int32)
    return xys, conics, op_s, chan, valid, radii, ld, t_min, t_max


def _quantize_log_depth(ld, valid, dbits):
    """Quantize log depth to dbits levels over the VALID range.

    Log space keeps RELATIVE resolution when one far outlier stretches
    [dmin, dmax] (advisor finding, round 2); compositing order only cares
    about relative depth. Valid prims have depth > z_near > 0."""
    dmask = jnp.where(valid, ld, jnp.inf)
    dmin = jnp.min(dmask)
    dmax = jnp.max(jnp.where(valid, ld, -jnp.inf))
    dspan = jnp.maximum(dmax - dmin, 1e-9)
    return jnp.clip(
        ((ld - dmin) / dspan * ((1 << dbits) - 1)),
        0, (1 << dbits) - 1,
    ).astype(jnp.int32)


def _render_folded(cam_img_w, cam_img_h, K, Rt, primpos, primqvec,
                   primscale, opacity, colors, return_depth, tile_size,
                   global_scale, z_near, max_tiles_per_prim,
                   max_pairs_per_tile, chunk, pair_budget_mult,
                   pallas_inner, ntx, nty):
    """Batch-folded Pallas render: stack the B images VERTICALLY in tile
    space, bin all B*N prims in ONE bin_to_tiles over the ntx x (B*nty)
    grid, and run ONE fwd/bwd kernel pair + ONE reduce for the whole batch
    (gsplat_pallas.rasterize_tiled_pl_fold). B x smaller HLO and no
    per-sample launch ramp vs the unrolled loop.

    Semantics note: the pair budget is GLOBAL (B * pair_budget_mult * N):
    under overflow pressure the later-stacked samples lose pairs first,
    where the per-sample form dropped each sample's own farthest pairs.
    At the configured 2-4x multipliers overflow does not occur in
    practice."""
    B, N = primpos.shape[:2]
    budget_total = int(round(pair_budget_mult * N)) * B

    proj = jax.vmap(
        lambda Kb, Rtb, pos, quat, scale, op, col: _project_sample(
            Kb, Rtb, pos, quat, scale, op, col, cam_img_h, cam_img_w,
            tile_size, z_near, global_scale, return_depth)
    )(K, Rt, primpos, primqvec, primscale, opacity, colors)
    xys, conics, op_s, chan, valid, radii, ld, t_min, t_max = proj

    num_tiles_g = ntx * nty * B
    dbits = 31 - int(num_tiles_g + 1).bit_length()
    qd = jax.vmap(lambda l, v: _quantize_log_depth(l, v, dbits))(ld, valid)

    # per-sample clip, then offset each sample's tile rows by b*nty
    yoff = (jnp.arange(B, dtype=jnp.int32) * nty)[:, None]
    tmin_f = jnp.stack(
        [jnp.clip(t_min[..., 0], 0, ntx).reshape(-1),
         (jnp.clip(t_min[..., 1], 0, nty) + yoff).reshape(-1)], -1)
    tmax_f = jnp.stack(
        [jnp.clip(t_max[..., 0], 0, ntx).reshape(-1),
         (jnp.clip(t_max[..., 1], 0, nty) + yoff).reshape(-1)], -1)
    valid_f = (valid & (radii > 0)).reshape(-1)

    binning = bin_to_tiles(
        tmin_f, tmax_f, valid_f, ntx, nty * B,
        max_tiles_per_prim, budget_total, depth_keys=qd.reshape(-1))

    from goliath_tpu.ops.gsplat_pallas import rasterize_tiled_pl_fold

    out, T_final = rasterize_tiled_pl_fold(
        xys.reshape(B * N, 2), conics.reshape(B * N, 3),
        op_s.reshape(B * N, 1), chan.reshape(B * N, chan.shape[-1]),
        (binning.sorted_prim, binning.tile_start, binning.tile_end,
         valid_f, binning.perm, binning.prim_offsets, binning.prim_ends,
         binning.tile_of_pair),
        cam_img_h, cam_img_w, tile_size, max_pairs_per_tile, chunk,
        pallas_inner, ntx, nty, B,
    )
    return out, T_final


def render(
    cam_img_w: int,
    cam_img_h: int,
    K: jnp.ndarray,           # [B, 3, 3]
    Rt: jnp.ndarray,          # [B, 3or4, 4]
    primpos: jnp.ndarray,     # [B, N, 3]
    primqvec: jnp.ndarray,    # [B, N, 4]
    primscale: jnp.ndarray,   # [B, N, 3]
    opacity: jnp.ndarray,     # [B, N, 1]
    colors: jnp.ndarray,      # [B, N, 3]
    return_depth: bool = True,
    bg_color: Optional[jnp.ndarray] = None,
    tile_size: int = 16,
    global_scale: float = 1.0,
    z_near: float = 0.1,
    max_tiles_per_prim: int = 64,
    max_pairs_per_tile: int = 512,
    chunk: int = 64,
    pair_budget_mult: float = 4,
    use_pallas: bool = False,
    pallas_inner: int = 256,
    return_radii: bool = False,
    tile_shard_mesh=None,
    tile_shard_axis: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Batched gaussian-splat render (reference render_gsplat.py:13-108).

    Returns dict(render [B,3,H,W], final_T [B,1,H,W], alpha [B,1,H,W],
    depth [B,1,H,W], radii [B,N]).

    With tile_shard_mesh/tile_shard_axis set, the screen's tile rows are
    sharded over that mesh axis via shard_map (parallel/tile_shard.py) —
    the SURVEY 2.8 pixels-axis scale-out for full-res batches that
    pressure a single chip's HBM. return_radii is unsupported there.
    """
    if tile_shard_axis is not None:
        from goliath_tpu.parallel.tile_shard import render_tile_sharded

        assert not return_radii, "radii not plumbed through the tile shard"
        return render_tile_sharded(
            tile_shard_mesh, tile_shard_axis, cam_img_w, cam_img_h,
            K, Rt, primpos, primqvec, primscale, opacity, colors,
            return_depth=return_depth, bg_color=bg_color,
            tile_size=tile_size, global_scale=global_scale, z_near=z_near,
            max_tiles_per_prim=max_tiles_per_prim,
            max_pairs_per_tile=max_pairs_per_tile, chunk=chunk,
            pair_budget_mult=pair_budget_mult, use_pallas=use_pallas,
            pallas_inner=pallas_inner,
        )
    ntx = -(-cam_img_w // tile_size)
    nty = -(-cam_img_h // tile_size)
    N = primpos.shape[1]

    def one(K_b, Rt_b, pos, quat, scale, op, col):
        xys, conics, op_s, chan, valid, radii, binning = prepare_sample(
            K_b, Rt_b, pos, quat, scale, op, col,
            cam_img_h, cam_img_w, tile_size, z_near, global_scale,
            max_tiles_per_prim, int(round(pair_budget_mult * N)),
            return_depth,
        )
        barrays = (
            binning.sorted_prim, binning.tile_start, binning.tile_end, valid,
            binning.perm, binning.prim_offsets, binning.prim_ends,
            binning.tile_of_pair,
        )
        if use_pallas:
            from goliath_tpu.ops.gsplat_pallas import rasterize_tiled_pl
            out, T_final = rasterize_tiled_pl(
                xys, conics, op_s, chan, barrays,
                cam_img_h, cam_img_w, tile_size, max_pairs_per_tile, chunk,
                pallas_inner, ntx, nty,
            )
        else:
            out, T_final = rasterize_tiled(
                xys, conics, op_s, chan, barrays,
                cam_img_h, cam_img_w, tile_size, max_pairs_per_tile, chunk,
                ntx, nty,
            )
        if return_radii:
            radii_orig = radii  # already in caller order (no depth pre-sort)
        else:
            radii_orig = jnp.zeros((1,), radii.dtype)
        return out, T_final, radii_orig

    if use_pallas:
        B = K.shape[0]
        fold = (os.environ.get("GOLIATH_GSPLAT_FOLD", "0") == "1"
                and B > 1 and not return_radii)
        if fold:
            # batch-folded: ONE binning/kernel/reduce for all B samples
            # (B x smaller HLO than the unrolled loop below; see
            # gsplat_pallas.rasterize_tiled_pl_fold)
            out, T_final = _render_folded(
                cam_img_w, cam_img_h, K, Rt, primpos, primqvec, primscale,
                opacity, colors, return_depth, tile_size, global_scale,
                z_near, max_tiles_per_prim, max_pairs_per_tile, chunk,
                pair_budget_mult, pallas_inner, ntx, nty)
            radii = jnp.zeros((B, 1), jnp.float32)
        else:
            # pallas_call has no batching rule for the prefetch grid spec;
            # the batch is small (1-4) so unroll it
            outs = [one(K[b], Rt[b], primpos[b], primqvec[b], primscale[b],
                        opacity[b], colors[b]) for b in range(B)]
            out, T_final, radii = (jnp.stack(x) for x in zip(*outs))
    else:
        out, T_final, radii = jax.vmap(one)(
            K, Rt, primpos, primqvec, primscale, opacity, colors
        )
    rgb = out[:, :3]
    alpha = (1.0 - T_final)[:, None]
    if bg_color is not None:
        rgb = rgb + T_final[:, None] * bg_color[None, :, None, None]
    result = {
        "render": rgb,
        "final_T": T_final[:, None],
        "alpha": alpha,
    }
    if return_radii:
        # only present when requested: stale consumers (densification /
        # pruning heuristics) should fail loudly rather than read zeros
        result["radii"] = radii
    if return_depth:
        result["depth"] = out[:, 3:4]
    return result
