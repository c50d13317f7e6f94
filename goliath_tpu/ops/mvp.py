"""Mixture-of-Volumetric-Primitives raymarcher for TPU (replaces the CUDA
extensions/mvpraymarch BVH raymarcher).

Semantics (reference extensions/mvpraymarch):
  * K rigid box primitives, each an RGBA voxel grid `template[K, 4, TD, TH, TW]`
    with an SRT transform (primpos, primrot, primscale); sample position in
    prim coords y = primscale * (primrot^T (x - primpos)), valid iff
    |y|_inf < 1 (primtransf.h:69-130).
  * trilinear template sample; alpha faded at borders by
    exp(-fadescale * sum_i |y_i|^fadeexp) (primsampler.h:17-60).
  * additive accumulation with saturation: A += alpha * stepsize, each
    sample contributes (min(A_new, 1) - A_old) * (rgb, 1)
    (primaccum.h:63-78).

TPU-first redesign — no per-ray BVH stacks:
  * prims are culled to 16x16 ray tiles by projecting their world AABBs to
    the screen (the camera is available at the call site) and reusing the
    sort-based binning engine (ops/binning.py);
  * each tile marches a **fixed step budget** inside the per-ray
    [enter, exit] span of its prim set; per-step work is dense VPU math;
  * additive-saturation accumulation is a *parallel* cumsum + clamp (no
    sequential dependence), so plain AD works; `jax.checkpoint` over the
    prim-chunk scan keeps backward memory flat by recomputing samples.
  * shadow mode scatter-splats accumulated alpha into prim grids with
    stop_gradient (used by the OLAT teacher to build deep shadow maps).

`march_reference` is the exact oracle (every prim, every ray).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from goliath_tpu.ops.backend import target_backend
from goliath_tpu.ops.binning import bin_to_tiles
from goliath_tpu.utils.sampling import grid_sample_3d

# Remat ablation knobs, read ONCE at import (they are baked into the traced
# graph anyway — reading os.environ inside the op made flipping them after
# the first trace a silent no-op; ADVICE r4 #4). Both default ON: without
# checkpointing, AD stacks every march chunk / tile group as lax residuals
# (22 GB at hand scale — the round-3 hand_mvp OOM).
CKPT_CHUNK = os.environ.get("GOLIATH_MVP_NO_CKPT", "0") != "1"
CKPT_GROUP = os.environ.get("GOLIATH_MVP_NO_GRP_CKPT", "0") != "1"


def prim_world_aabb(primpos: jnp.ndarray, primrot: jnp.ndarray,
                    primscale: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABB of each prim's [-1,1]^3 box in world space.

    primscale is the *inverse* half-extent (y = scale * R^T (x - p)), so the
    world half-extents along the rotated axes are 1/scale.
    """
    # y = primscale * R^T (x - p)  =>  x = p + R @ (y / primscale); the
    # world half-extent along axis i is sum_j |R[i, j]| / scale_j.
    half = (jnp.abs(primrot) * (1.0 / primscale)[:, None, :]).sum(-1)  # [K, 3]
    return primpos - half, primpos + half


class PackedVolume(NamedTuple):
    """CHANNEL-FIRST x-pair-packed voxel columns for batched trilinear.

    rows_cf[c,        ((k*D + z)*H + y)*W + x] = vol[k, c, z, y, x]
    rows_cf[C + c,    ((k*D + z)*H + y)*W + x] = vol[k, c, z, y, min(x+1,
                                                                     W-1)]
    so one column gather (2C lane-dense 1-D gathers) fetches both
    x-corners of a trilinear tap: 4 column gathers serve the 8 corners.

    Channel-first is load-bearing for the BACKWARD: a [K*D*H*W, 2C] table
    (2C = 8 at hand scale) tile-pads its minor dim 16x -> 128 lanes, so
    the table COTANGENT the march bwd accumulates became a ~4.3 GB buffer
    at 4096x2048-voxel scale — which crashed the TPU worker outright
    (both with the native scatter-add adjoint and with the sort-based
    one). [2C, N] keeps the primal, the cotangent, and every gather
    output lane-dense."""

    rows_cf: jnp.ndarray  # [2C, K*D*H*W]
    shape: Tuple[int, int, int, int, int]  # (K, C, D, H, W)


def pack_volume(vol: jnp.ndarray) -> PackedVolume:
    """[K, C, D, H, W] -> PackedVolume (2x memory, built once per call)."""
    K, C, D, H, W = vol.shape
    nxt = jnp.concatenate([vol[..., 1:], vol[..., -1:]], axis=-1)
    rows_cf = jnp.concatenate([vol, nxt], axis=1)        # [K, 2C, D, H, W]
    rows_cf = rows_cf.transpose(1, 0, 2, 3, 4).reshape(2 * C, -1)
    return PackedVolume(rows_cf, (K, C, D, H, W))


def sample_packed(pv: PackedVolume, prim_ids: jnp.ndarray,
                  y: jnp.ndarray) -> jnp.ndarray:
    """Trilinear samples of packed per-prim volumes: y [..., 3] (x, y, z in
    [-1, 1], torch grid_sample align_corners=False semantics, zeros
    padding) -> [..., C]. prim_ids broadcasts against y's leading axes."""
    K, C, D, H, W = pv.shape
    x = (y[..., 0] + 1.0) * (W / 2.0) - 0.5
    yy = (y[..., 1] + 1.0) * (H / 2.0) - 0.5
    z = (y[..., 2] + 1.0) * (D / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(yy)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = yy - y0
    wz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    xin0 = (x0i >= 0) & (x0i < W)
    xin1 = (x0i + 1 >= 0) & (x0i + 1 < W)
    xc = jnp.clip(x0i, 0, W - 1)
    # broadcast prim ids against the coord grid [..., S] (y drops its
    # trailing xyz axis when indexed)
    base = prim_ids.reshape(
        prim_ids.shape + (1,) * (y.ndim - 1 - prim_ids.ndim))

    # Channel-first column gather: the native adjoint is a scatter-add
    # into the SAME lane-dense [2C, N] layout. (A row-major [N, 2C] table
    # pads its cotangent 16x -> ~4.3 GB at hand scale and crashed the TPU
    # worker; the sort-based take_cols adjoint is crash-safe standalone
    # but takes >15 min to COMPILE when instantiated per prim-chunk under
    # the march's map/scan/cond/remat nesting.)
    def fetch(ridx):
        return pv.rows_cf[:, ridx.reshape(-1)]

    out = 0.0
    flat_n = x.size
    for dz in (0, 1):
        zi = z0i + dz
        zv = (zi >= 0) & (zi < D)
        zc = jnp.clip(zi, 0, D - 1)
        wzz = wz if dz else 1 - wz
        for dy in (0, 1):
            yi = y0i + dy
            yv = (yi >= 0) & (yi < H)
            yc = jnp.clip(yi, 0, H - 1)
            ridx = ((base * D + zc) * H + yc) * W + xc
            r = fetch(ridx)                                  # [2C, n]
            wyy = ((wy if dy else 1 - wy) * wzz
                   * (zv & yv)).reshape(flat_n)
            v = (r[:C] * ((1 - wx) * xin0).reshape(flat_n)[None]
                 + r[C:] * (wx * xin1).reshape(flat_n)[None])
            out = out + v * wyy[None]
    # [C, n] -> [..., C] for the caller (fused transpose, not a
    # materialized channel-last buffer on TPU)
    return jnp.moveaxis(out.reshape((C,) + x.shape), 0, -1)


def _pow_abs(y: jnp.ndarray, fadeexp: float) -> jnp.ndarray:
    """|y|^fadeexp via repeated squaring for integer exponents: the generic
    pow lowers to ln+exp per element on the VPU — at T*M*P*S march taps
    that is billions of transcendentals (reference primsampler.h:44 uses
    powf, but CUDA SFUs make it ~free; the TPU VPU does not)."""
    fe = float(fadeexp)
    if fe == int(fe) and int(fe) >= 1:
        n = int(fe)
        acc = None
        bit = jnp.abs(y)
        while n:
            if n & 1:
                acc = bit if acc is None else acc * bit
            n >>= 1
            if n:
                bit = bit * bit
        return acc
    return jnp.abs(y) ** fadeexp


def sample_packed_cf(pv: PackedVolume, prim_ids: jnp.ndarray,
                     yx: jnp.ndarray, yy: jnp.ndarray, yz: jnp.ndarray
                     ) -> jnp.ndarray:
    """Channel-first trilinear sampling: coords as three SEPARATE dense
    arrays [...] (lane-dense minor dim preserved end to end — a stacked
    [..., 3] coordinate tensor tile-pads its minor dim 3 -> 128 lanes,
    which made every boundary tensor of the march ~42x larger than its
    payload). Returns [C, ...]. prim_ids broadcasts against leading axes.
    """
    K, C, D, H, W = pv.shape
    x = (yx + 1.0) * (W / 2.0) - 0.5
    v = (yy + 1.0) * (H / 2.0) - 0.5
    z = (yz + 1.0) * (D / 2.0) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(v)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = v - y0
    wz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    xin0 = (x0i >= 0) & (x0i < W)
    xin1 = (x0i + 1 >= 0) & (x0i + 1 < W)
    xc = jnp.clip(x0i, 0, W - 1)
    base = prim_ids.reshape(
        prim_ids.shape + (1,) * (yx.ndim - prim_ids.ndim))
    flat_n = x.size
    w0 = ((1 - wx) * xin0).reshape(flat_n)
    w1 = (wx * xin1).reshape(flat_n)
    out = 0.0
    for dz in (0, 1):
        zi = z0i + dz
        zv = (zi >= 0) & (zi < D)
        zc = jnp.clip(zi, 0, D - 1)
        wzz = wz if dz else 1 - wz
        for dy in (0, 1):
            yi = y0i + dy
            yv = (yi >= 0) & (yi < H)
            yc = jnp.clip(yi, 0, H - 1)
            ridx = ((base * D + zc) * H + yc) * W + xc
            r = pv.rows_cf[:, ridx.reshape(-1)]              # [2C, n]
            wyy = ((wy if dy else 1 - wy) * wzz
                   * (zv & yv)).reshape(flat_n)
            out = out + (r[:C] * w0[None] + r[C:] * w1[None]) * wyy[None]
    return out.reshape((C,) + x.shape)


def sample_prims_cf(template, prim_ids, yx, yy, yz,
                    fadescale: float, fadeexp: float, warp=None
                    ) -> jnp.ndarray:
    """Channel-first trilinear RGBA with border fade: [4, ...] (rgb in
    0:3, faded+validity-masked alpha in 3). Coordinates are three dense
    arrays; see sample_prims for the channel-last twin and the warp
    semantics (fade/validity from pre-warp coords, primsampler.h:44-67)."""
    fade = jnp.exp(-fadescale * (_pow_abs(yx, fadeexp)
                                 + _pow_abs(yy, fadeexp)
                                 + _pow_abs(yz, fadeexp)))
    valid = ((jnp.abs(yx) < 1.0) & (jnp.abs(yy) < 1.0)
             & (jnp.abs(yz) < 1.0))
    if warp is not None:
        wpv = warp if isinstance(warp, PackedVolume) else pack_volume(warp)
        w3 = sample_packed_cf(wpv, prim_ids, yx, yy, yz)   # [3, ...]
        yx, yy, yz = w3[0], w3[1], w3[2]
    tpv = (template if isinstance(template, PackedVolume)
           else pack_volume(template))
    rgba = sample_packed_cf(tpv, prim_ids, yx, yy, yz)     # [4, ...]
    alpha = rgba[3] * fade * valid
    return jnp.concatenate([rgba[:3], alpha[None]], axis=0)


def sample_prims(
    template: jnp.ndarray,   # [K, 4, TD, TH, TW] or PackedVolume
    prim_ids: jnp.ndarray,   # [CH]
    y: jnp.ndarray,          # [CH, S, 3] prim-local coords
    fadescale: float,
    fadeexp: float,
    warp=None,               # [K, 3, WD, WH, WW] or PackedVolume
) -> jnp.ndarray:
    """Trilinear RGBA samples with border fade: [CH, S, 4].

    With a warp field, the template is sampled at the warped coordinate
    while the border fade and validity use the pre-warp coordinate
    (reference primsampler.h:44-67: fade from y0, template at yy1)."""
    powed = _pow_abs(y, fadeexp)
    fade = jnp.exp(-fadescale * jnp.sum(powed, axis=-1))
    valid = jnp.all(jnp.abs(y) < 1.0, axis=-1)
    if warp is not None:
        wpv = warp if isinstance(warp, PackedVolume) else pack_volume(warp)
        y = sample_packed(wpv, prim_ids, y)  # [CH, S, 3] warped coords
    tpv = (template if isinstance(template, PackedVolume)
           else pack_volume(template))
    rgba = sample_packed(tpv, prim_ids, y)  # [CH, S, 4]
    alpha = rgba[..., 3] * fade * valid
    return jnp.concatenate([rgba[..., :3], alpha[..., None]], axis=-1)


def accumulate_additive(
    rgb: jnp.ndarray,    # [S, 3] per-sample rgb (flattened steps in order)
    alpha: jnp.ndarray,  # [S]
    stepsize: float,
) -> jnp.ndarray:
    """Additive-with-saturation compositing via cumsum + clamp: [4]."""
    A = jnp.cumsum(alpha * stepsize)
    A_clip = jnp.minimum(A, 1.0)
    contrib = jnp.diff(A_clip, prepend=0.0)  # [S]
    rgb_out = jnp.sum(rgb * contrib[:, None], axis=0)
    a_out = A_clip[-1] if A_clip.shape[0] else jnp.asarray(0.0)
    return jnp.concatenate([rgb_out, a_out[None]])


def march_reference(
    raypos: jnp.ndarray,     # [R, 3]
    raydir: jnp.ndarray,     # [R, 3]
    stepsize: float,
    tminmax: jnp.ndarray,    # [R, 2]
    primpos: jnp.ndarray,    # [K, 3]
    primrot: jnp.ndarray,    # [K, 3, 3]
    primscale: jnp.ndarray,  # [K, 3]
    template: jnp.ndarray,   # [K, 4, TD, TH, TW]
    max_steps: int,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
    warp: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact oracle: all prims, fixed global steps. Returns [R, 4]."""
    R = raypos.shape[0]
    K = primpos.shape[0]
    t = tminmax[:, 0:1] + stepsize * jnp.arange(max_steps)[None]  # [R, S]
    live = t <= tminmax[:, 1:2]
    pos = raypos[:, None] + raydir[:, None] * t[..., None]  # [R, S, 3]

    # prim-local coords for all prims: [K, R, S, 3]
    rel = pos[None] - primpos[:, None, None]
    y = jnp.einsum("kij,krsi->krsj", primrot, rel) * primscale[:, None, None]
    samples = sample_prims(
        template, jnp.arange(K), y.reshape(K, -1, 3), fadescale, fadeexp,
        warp=warp,
    ).reshape(K, R, max_steps, 4)
    # Multiple prims at one sample point: CUDA accumulates each prim's
    # sample as a separate event (hitbox order). Below saturation the order
    # doesn't matter and contributions sum; at saturation the clamp handles
    # the partial step, so summing alphas with alpha-weighted mean rgb is
    # equivalent.
    alpha = samples[..., 3].sum(0) * live  # [R, S]
    rgb_w = (samples[..., :3] * samples[..., 3:4]).sum(0)  # [R, S, 3]
    safe_a = jnp.where(alpha > 0, alpha, 1.0)
    rgb_mean = rgb_w / safe_a[..., None]
    out = jax.vmap(lambda r, a: accumulate_additive(r, a, stepsize))(
        rgb_mean, alpha
    )
    return out


class MVPRenderOut(NamedTuple):
    rgba: jnp.ndarray  # [R, 4]


def _ray_box_span(raypos, raydir, pmin, pmax):
    """Entry/exit of rays [P,3] against boxes [CH,3]: ([CH,P], [CH,P])."""
    inv = 1.0 / jnp.where(jnp.abs(raydir) < 1e-12, 1e-12, raydir)
    t1 = (pmin[:, None] - raypos[None]) * inv[None]
    t2 = (pmax[:, None] - raypos[None]) * inv[None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return tmin, tmax


def _ray_box_span_g(raypos, raydir, pmin, pmax):
    """Grouped spans: rays [g,P,3] x boxes [g,M,3] -> ([g,M,P], [g,M,P])."""
    inv = 1.0 / jnp.where(jnp.abs(raydir) < 1e-12, 1e-12, raydir)
    t1 = (pmin[:, :, None] - raypos[:, None]) * inv[:, None]
    t2 = (pmax[:, :, None] - raypos[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return tmin, tmax


def mvp_raymarch_tiled(
    raypos: jnp.ndarray,      # [H, W, 3]
    raydir: jnp.ndarray,      # [H, W, 3]
    stepsize: float,
    tminmax: jnp.ndarray,     # [H, W, 2]
    primpos: jnp.ndarray,     # [K, 3]
    primrot: jnp.ndarray,     # [K, 3, 3]
    primscale: jnp.ndarray,   # [K, 3]
    template: jnp.ndarray,    # [K, 4, TD, TH, TW]
    K_cam: jnp.ndarray,       # [3, 3] camera intrinsics (for tile culling)
    Rt_cam: jnp.ndarray,      # [3, 4]
    max_steps: int = 128,
    tile_size: int = 16,
    max_prims_per_tile: int = 64,
    chunk: int = 16,
    max_tiles_per_prim: int = 64,
    pair_budget_mult: int = 8,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
    termthresh: float = 0.99,
    warp: Optional[jnp.ndarray] = None,  # [K, 3, WD, WH, WW]
    tile_group: int = 64,
    window_steps: Optional[int] = None,
    max_prims_per_ray: int = 16,
) -> jnp.ndarray:
    """Tile-culled fixed-step MVP march. Returns rgba image [4, H, W].

    Rays and prims are in the *normalized* volume frame (the Raymarcher
    facade divides by volradius); K_cam/Rt_cam only drive screen-tile
    culling and must correspond to the rays.

    `window_steps` (Sp): per-(prim, ray) sampling window. A prim only
    contributes on grid steps inside its ORIENTED-slab span (`valid`
    zeroes taps outside the oriented box, reference primsampler.h:44-67),
    so sampling the Sp steps from the span entry is EXACT when the span
    fits, i.e. when the oriented diagonal <= Sp * stepsize (hand-scale
    prims span ~4-8 steps; the default None = max_steps is always exact).
    Contributions land on the same global step grid as the dense form via
    a one-hot deposit einsum — per-tap gathers are ~all of the march's
    runtime on TPU, and the window cuts taps by S/Sp. When the span
    overflows Sp the tail is dropped (documented deviation, like
    max_tiles_per_prim).

    `max_prims_per_ray` (R): each ray marches only the R nearest (by
    entry depth) tile prims whose AABB it actually hits, in chunks of
    `chunk` rays-list slots; rays hitting more than R prims drop the
    FARTHEST ones (documented deviation — front-to-back additive
    saturation makes far prims least visible, and the reference CUDA
    kernel truncates at saturation for the same reason,
    mvpraymarch_subset_kernel.h early-exit).
    """
    H, W = raypos.shape[:2]
    ntx = -(-W // tile_size)
    nty = -(-H // tile_size)
    K = primpos.shape[0]

    pmin, pmax = prim_world_aabb(primpos, primrot, primscale)
    # project the 8 AABB corners to screen for tile rects
    cs = []
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                cs.append(jnp.stack([
                    jnp.where(cx, pmax[:, 0], pmin[:, 0]),
                    jnp.where(cy, pmax[:, 1], pmin[:, 1]),
                    jnp.where(cz, pmax[:, 2], pmin[:, 2]),
                ], -1))
    corners = jnp.stack(cs, 1)  # [K, 8, 3]
    cam = jnp.einsum("ij,knj->kni", Rt_cam[:3, :3], corners) + Rt_cam[:3, 3]
    z = jnp.clip(cam[..., 2], min=1e-4)
    pix = jnp.einsum("ij,knj->kni", K_cam[:2, :2], cam[..., :2] / z[..., None]) \
        + K_cam[:2, 2]
    behind = jnp.any(cam[..., 2] <= 1e-4, axis=1)
    xy_min = jnp.min(pix, axis=1)
    xy_max = jnp.max(pix, axis=1)
    # prims partially behind the camera get conservative full-screen rects
    xy_min = jnp.where(behind[:, None], jnp.zeros_like(xy_min), xy_min)
    xy_max = jnp.where(
        behind[:, None],
        jnp.asarray([[W, H]], dtype=xy_max.dtype), xy_max,
    )
    t_min = jnp.floor(xy_min / tile_size).astype(jnp.int32)
    t_max = (jnp.floor(xy_max / tile_size) + 1).astype(jnp.int32)
    binning = bin_to_tiles(
        t_min, t_max, jnp.ones((K,), bool), ntx, nty,
        max_tiles_per_prim, pair_budget_mult * K,
    )
    budget = binning.sorted_prim.shape[0]

    P = tile_size * tile_size
    M = max_prims_per_tile
    R = min(max_prims_per_ray, M)
    rchunk = min(chunk, R)
    nchunks = -(-R // rchunk)
    rp_tiles = _to_tiles(raypos, ntx, nty, tile_size)     # [T, P, 3]
    rd_tiles = _to_tiles(raydir, ntx, nty, tile_size)
    tm_tiles = _to_tiles(tminmax, ntx, nty, tile_size)    # [T, P, 2]

    S = max_steps
    Sp = S if window_steps is None else min(window_steps, S)
    iota_S = jnp.arange(S, dtype=jnp.int32)
    iota_Sp = jnp.arange(Sp, dtype=jnp.int32)

    # ---- occupancy order: ascending pair count (one ~free in-graph sort).
    # Empty tiles cluster into all-empty groups whose chunk lax.cond skips
    # every tap; heavy tiles share groups with similarly-heavy tiles so the
    # per-group chunk count matches the actual occupancy instead of the
    # worst-case max_prims_per_tile. (The CUDA kernel gets the same effect
    # from per-thread-block early exits, mvpraymarch_subset_kernel.h.)
    counts = binning.tile_end - binning.tile_start            # [T]
    T_tiles = counts.shape[0]
    order = jnp.argsort(counts)
    starts_s = binning.tile_start[order]
    ends_s = binning.tile_end[order]
    rp_s = jnp.take(rp_tiles, order, axis=0)
    rd_s = jnp.take(rd_tiles, order, axis=0)
    tm_s = jnp.take(tm_tiles, order, axis=0)

    tpv = (template if isinstance(template, PackedVolume)
           else pack_volume(template))
    tKK, tC, tD, tH, tW = tpv.shape
    cells = tD * tH * tW
    rows3 = tpv.rows_cf.reshape(2 * tC, tKK, cells)
    wpv = wrows3 = None
    if warp is not None:
        wpv = warp if isinstance(warp, PackedVolume) else pack_volume(warp)
        wK, wC, wD, wH, wW = wpv.shape
        wcells = wD * wH * wW
        wrows3 = wpv.rows_cf.reshape(2 * wC, wK, wcells)

    def march_group(starts, ends, rp_g, rd_g, tm_g):
        # starts/ends [g]; rp_g/rd_g [g,P,3]; tm_g [g,P,2]
        g_sz = starts.shape[0]
        idxs = starts[:, None] + jnp.arange(M, dtype=jnp.int32)  # [g,M]
        pm = idxs < ends[:, None]
        pids = binning.sorted_prim[jnp.clip(idxs, 0, budget - 1)]

        # per-ray span across each tile's prims (arithmetic only)
        tmin_pk, tmax_pk = _ray_box_span_g(
            rp_g, rd_g, pmin[pids], pmax[pids])                  # [g,M,P]
        hit = (tmax_pk > tmin_pk) & pm[..., None]
        t_enter = jnp.min(jnp.where(hit, tmin_pk, jnp.inf), axis=1)  # [g,P]
        t_exit = jnp.max(jnp.where(hit, tmax_pk, -jnp.inf), axis=1)
        t_enter = jnp.maximum(t_enter, tm_g[..., 0])
        t_exit = jnp.minimum(t_exit, tm_g[..., 1])
        any_hit = jnp.isfinite(t_enter) & (t_exit > t_enter)
        t_enter = jnp.where(any_hit, t_enter, 0.0)
        t_exit = jnp.where(any_hit, t_exit, -1.0)

        # ---- per-RAY top-R prim selection (r5): a ray typically hits only
        # a handful of the tile's up-to-M prims, yet the tile-list march
        # sampled EVERY (tile prim, ray) pair — at MPPT 64 vs ~4-8 true
        # hits per ray that is ~8x wasted taps, and taps are the march's
        # entire cost (VMEM-gather-bound, ~5 ns/index). Sort each ray's
        # hit prims by entry depth and march only the nearest R. Rays
        # hitting more than R prims lose the FARTHEST ones (front-to-back
        # additive saturation makes far prims the least visible; the CUDA
        # kernel truncates at saturation for the same reason).
        keyT = jnp.where(hit, tmin_pk, jnp.inf).transpose(0, 2, 1)  # [g,P,M]
        slotM = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None, None], keyT.shape)
        key_s, slot_s = lax.sort((keyT, slotM), num_keys=1,
                                 is_stable=False)
        slotR = slot_s[..., :R]                                  # [g,P,R]
        hitR = jnp.isfinite(key_s[..., :R])                      # [g,P,R]
        n_hits = jnp.sum(hitR, axis=2)                           # [g,P]

        # align steps to the global tmin grid like the CUDA kernel
        # (mvpraymarch_subset_kernel.h:76-79) so sample positions match the
        # all-prims oracle exactly
        t0 = tm_g[..., 0] + jnp.floor(
            jnp.maximum(t_enter - tm_g[..., 0], 0.0) / stepsize
        ) * stepsize                                             # [g,P]

        # Group-local template table: gather this group's g*M prim volumes
        # out of the global [2C, K*cells] table (contiguous cell-block
        # DMAs) and point the random tap gathers at the SMALL table. The
        # global table scales with K (268 MB at uv1024) and falls out of
        # VMEM, where the same gather measured 4x slower (42 vs 10 ms per
        # 2M taps; r5 trace: the small-scale table carried S(1)=VMEM, the
        # at-scale one did not). The local table is scale-independent:
        # 2C * g*M*cells floats — size tile_group/max_prims_per_tile to
        # keep it well under VMEM.
        pf = pids.reshape(-1)                                    # [g*M]
        loc_pv = PackedVolume(
            rows3[:, pf].reshape(2 * tC, g_sz * M * cells),
            (g_sz * M, tC, tD, tH, tW))
        loc_warp = None
        if wrows3 is not None:
            loc_warp = PackedVolume(
                wrows3[:, pf].reshape(2 * wC, g_sz * M * wcells),
                (g_sz * M, wC, wD, wH, wW))
        gM_base = (jnp.arange(g_sz, dtype=jnp.int32) * M)[:, None, None]
        # group-local prim params: the per-RAY selection gathers params per
        # (g, rc, P) — against the global [K, ...] arrays that is 131k
        # rows/chunk-step whose ADJOINT is a 131k-row scatter into K rows;
        # against these [g, M, ...] copies both sides stay in a ~100 KB
        # table and the global-array adjoint is one cheap g*M-row scatter.
        rot_g = primrot[pids]                                    # [g,M,3,3]
        psc_g = primscale[pids]                                  # [g,M,3]
        pos_g = primpos[pids]                                    # [g,M,3]
        g_iota = jnp.arange(g_sz, dtype=jnp.int32)[:, None, None]

        def chunk_body(carry, ci):
            def do(acc):
                # acc [g, 4, S, P] — channel-first step-grid accumulator
                sl = lax.dynamic_slice_in_dim(
                    slotR, ci * rchunk, rchunk, axis=2
                ).transpose(0, 2, 1)                             # [g,rc,P]
                hm = lax.dynamic_slice_in_dim(
                    hitR, ci * rchunk, rchunk, axis=2
                ).transpose(0, 2, 1)                             # [g,rc,P]
                # prim-local coords linearized along the ray:
                # y_j(t) = ps_j * (R^T rd)_j * t + ps_j * (R^T (rp - pp))_j
                # — the matvec leaves the tap axis entirely.
                Rr = rot_g[g_iota, sl]                           # [g,rc,P,3,3]
                psc = psc_g[g_iota, sl]                          # [g,rc,P,3]
                Ac = (jnp.einsum("gkpij,gpi->gkpj", Rr, rd_g)
                      * psc).transpose(0, 1, 3, 2)               # [g,rc,3,P]
                rel0 = rp_g[:, None] - pos_g[g_iota, sl]         # [g,rc,P,3]
                Bc = (jnp.einsum("gkpij,gkpi->gkpj", Rr, rel0)
                      * psc).transpose(0, 1, 3, 2)               # [g,rc,3,P]
                # spans from the ORIENTED slabs |y_j(t)| < 1 (exact support
                # of the sample validity mask — tighter than the world
                # AABB, so the Sp window needs to cover only the true
                # oriented span, ~diagonal/stepsize steps worst case)
                invA = 1.0 / jnp.where(jnp.abs(Ac) < 1e-12, 1e-12, Ac)
                t1 = (-1.0 - Bc) * invA                          # [g,rc,3,P]
                t2 = (1.0 - Bc) * invA
                tmin_c = jnp.max(jnp.minimum(t1, t2), axis=2)    # [g,rc,P]
                tmax_c = jnp.min(jnp.maximum(t1, t2), axis=2)
                ok = (tmax_c > tmin_c) & hm
                # first grid step inside the span; taps outside the slab
                # volume are exactly zero (valid mask), so the Sp window
                # from here covers every contributing step when the
                # oriented span fits
                s_lo = jnp.ceil(
                    (tmin_c - t0[:, None, :]) / stepsize - 1e-5
                ).astype(jnp.int32)
                s_lo = jnp.clip(s_lo, 0, S - 1)                  # [g,rc,P]
                sidx = s_lo[:, :, None, :] \
                    + iota_Sp[None, None, :, None]               # [g,rc,Sp,P]
                tj = t0[:, None, None, :] + sidx * stepsize
                msk = (ok[:, :, None, :]
                       & (tj <= tmax_c[:, :, None, :] + 1e-5)
                       & (sidx < S))
                yx = Ac[:, :, 0, None, :] * tj + Bc[:, :, 0, None, :]
                yy = Ac[:, :, 1, None, :] * tj + Bc[:, :, 1, None, :]
                yz = Ac[:, :, 2, None, :] * tj + Bc[:, :, 2, None, :]
                _ablate = os.environ.get("GOLIATH_MVP_ABLATE", "")
                if _ablate == "nosample":
                    # deposit-only cost: cheap arithmetic stand-in for the
                    # trilinear row gathers (same shapes, no gather traffic)
                    smp = jnp.tanh(yx + yy + yz)[None] * jnp.ones(
                        (4, 1, 1, 1, 1), yx.dtype)
                else:
                    loc_ids = (gM_base + sl)[:, :, None, :]      # [g,rc,1,P]
                    smp = sample_prims_cf(
                        loc_pv, loc_ids, yx, yy, yz, fadescale, fadeexp,
                        warp=loc_warp)                       # [4,g,rc,Sp,P]
                a = smp[3] * msk
                # [g,rc,4,Sp,P]: alpha-weighted rgb + alpha, P minor
                vals = jnp.stack(
                    [smp[0] * a, smp[1] * a, smp[2] * a, a], axis=2)
                if _ablate == "nodeposit":
                    # sampling-only cost: sum windows at a fixed offset
                    # (wrong image, no one-hot deposit)
                    return acc + jnp.pad(
                        vals.sum(1), ((0, 0), (0, 0), (0, S - Sp), (0, 0)))
                # deposit windows onto the step grid: one-hot at s_lo
                # (contracted over the ray-chunk axis), then Sp static
                # shift-adds place offset j at step s_lo + j. No scatters.
                Z = (s_lo[:, :, None, :] == iota_S[None, None, :, None]
                     ).astype(vals.dtype)                        # [g,rc,S,P]
                for j in range(Sp):
                    dj = jnp.einsum(
                        "gksp,gkcp->gcsp", Z, vals[:, :, :, j, :],
                        precision=jax.lax.Precision.HIGHEST)     # [g,4,S,P]
                    if j:
                        dj = jnp.pad(
                            dj[:, :, : S - j],
                            ((0, 0), (0, 0), (j, 0), (0, 0)))
                    acc = acc + dj
                return acc

            # chunk i needed iff some ray has > i*rchunk hits (hit slots
            # are sorted to the front of each ray's list)
            needed = jnp.any(n_hits > ci * rchunk)
            carry = lax.cond(needed, do, lambda c: c, carry)
            return carry, None

        init = jnp.zeros((g_sz, 4, S, P))
        acc, _ = lax.scan(
            jax.checkpoint(chunk_body) if CKPT_CHUNK else chunk_body,
            init, jnp.arange(nchunks, dtype=jnp.int32),
        )
        iota_Sf = jnp.arange(S, dtype=jnp.float32)
        steps_t = t0[:, None, :] + stepsize * iota_Sf[None, :, None]
        live = ((steps_t <= t_exit[:, None, :] + 1e-5)
                & any_hit[:, None, :])                           # [g,S,P]
        alpha = acc[:, 3] * live
        safe = jnp.where(alpha > 0, alpha, 1.0)
        rgb_mean = acc[:, :3] / safe[:, None]
        # accumulate_additive, channel-first over the step axis
        A = jnp.cumsum(alpha * stepsize, axis=1)
        A_clip = jnp.minimum(A, 1.0)
        contrib = jnp.diff(A_clip, prepend=0.0, axis=1)          # [g,S_pad,P]
        rgb_out = jnp.einsum("gcsp,gsp->gcp", rgb_mean, contrib)
        a_out = A_clip[:, -1]                                    # [g,P]
        # channel-first so the stacked lax.map output (and its cotangent)
        # is [..., 4, P] — a [..., P, 4] stack tile-pads 4 -> 128 lanes
        # (5.25 GB at hand scale, part of the round-3 hand_mvp rung OOM)
        return jnp.concatenate([rgb_out, a_out[:, None]], axis=1)  # [g,4,P]

    # march tile groups via lax.map (sequential scan): a flat vmap over all
    # T tiles materializes the per-chunk sample tensor at once, while a
    # group bounds live intermediates at tile_group x chunk x P x Sp x 4.
    # The group body is additionally rematerialized: without it AD saves
    # each group's march state as stacked lax.map residuals (22 GB at hand
    # scale b=4, the round-3 hand_mvp rung OOM). Recomputing the march in
    # the bwd trades ~2x march FLOPs for O(T*P*4) residuals.
    g = min(tile_group, T_tiles)
    t_pad = (-T_tiles) % g
    def _padt(x):
        return jnp.pad(x, ((0, t_pad),) + ((0, 0),) * (x.ndim - 1))
    grouped = tuple(
        _padt(x).reshape((T_tiles + t_pad) // g, g, *x.shape[1:])
        for x in (starts_s, ends_s, rp_s, rd_s, tm_s))
    out_sorted = lax.map(
        (lambda a: jax.checkpoint(march_group)(*a)) if CKPT_GROUP
        else (lambda a: march_group(*a)), grouped
    ).reshape(-1, 4, tile_size * tile_size)[:T_tiles]  # [T, 4, P]
    out_tiles = jnp.take(out_sorted, jnp.argsort(order), axis=0)
    img = out_tiles.reshape(nty, ntx, 4, tile_size, tile_size)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        4, nty * tile_size, ntx * tile_size
    )
    return img[:, :H, :W]  # [4, H, W]


def _to_tiles(img_hw: jnp.ndarray, ntx: int, nty: int, ts: int) -> jnp.ndarray:
    """[H, W, C] -> [T, P, C] with edge padding."""
    H, W, C = img_hw.shape
    x = jnp.pad(img_hw, ((0, nty * ts - H), (0, ntx * ts - W), (0, 0)),
                mode="edge")
    x = x.reshape(nty, ts, ntx, ts, C).transpose(0, 2, 1, 3, 4)
    return x.reshape(nty * ntx, ts * ts, C)


# ---------------------------------------------------------------------------
# deep shadow volumes (replaces mvpraymarch's with_shadow splatting mode,
# reference extensions/mvpraymarch primsplatter.h:14-38)
# ---------------------------------------------------------------------------


def splat_density_grid(
    primpos: jnp.ndarray,     # [K, 3] (normalized volume frame)
    primrot: jnp.ndarray,     # [K, 3, 3]
    primscale: jnp.ndarray,   # [K, 3]
    primalpha: jnp.ndarray,   # [K, Z, Y, X] per-voxel alpha density
    grid_res: int = 64,
    block: int = 8,
    max_prims_per_block: int = 64,
    chunk: int = 16,
    max_cells_per_prim: int = 512,
    pair_budget_mult: int = 128,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
) -> jnp.ndarray:
    """Resample prim alpha fields onto a global [-1,1]^3 grid [G, G, G]
    (indexed z, y, x) with D(x) = sum_k alpha_k(x) * fade_k(x).

    TPU-first replacement for the CUDA per-ray shadow splatting
    (primsplatter.h:14-38): instead of scattering transmittance during a
    shadow-camera march, we build the density field the march integrates —
    by GATHER, not scatter: prims are 3D-binned to grid blocks
    (ops/binning.bin_boxes_to_cells) and each block evaluates its prims'
    trilinear alpha at its cell centers. Overlapping prims sum (matching
    the march's additive accumulation), and no cell is skipped — the
    earlier point-splat approximation both averaged overlaps and left gaps
    wherever grid cells were smaller than prim voxel spacing.
    """
    from goliath_tpu.ops.binning import bin_boxes_to_cells

    K = primalpha.shape[0]
    G = grid_res
    assert G % block == 0, (G, block)
    NB = G // block
    P3 = block ** 3

    pmin, pmax = prim_world_aabb(primpos, primrot, primscale)
    to_cell = lambda p: (p + 1.0) * 0.5 * G / block
    bmin = jnp.floor(to_cell(pmin)).astype(jnp.int32)
    bmax = jnp.floor(to_cell(pmax)).astype(jnp.int32) + 1
    binning = bin_boxes_to_cells(
        bmin, bmax, jnp.ones((K,), bool), (NB, NB, NB),
        max_cells_per_prim, pair_budget_mult * K,
    )
    budget = binning.sorted_prim.shape[0]
    nchunks = max(max_prims_per_block // chunk, 1)

    # cell centers per block: [NB^3, P3, 3] in (x, y, z) world order
    bi = jnp.arange(NB, dtype=jnp.int32)
    bz, by, bx = jnp.meshgrid(bi, bi, bi, indexing="ij")
    borig = jnp.stack([bx, by, bz], -1).reshape(-1, 1, 3) * block  # [NB^3,1,3]
    li = jnp.arange(block, dtype=jnp.int32)
    lz, ly, lx = jnp.meshgrid(li, li, li, indexing="ij")
    local = jnp.stack([lx, ly, lz], -1).reshape(1, -1, 3)          # [1,P3,3]
    pos = ((borig + local).astype(jnp.float32) + 0.5) / G * 2.0 - 1.0

    alpha_pv = pack_volume(primalpha[:, None])  # [K, 1, Z, Y, X] rows

    def block_density(start, end, pos_b):
        def prim_chunk(acc, ci):
            cidx = start + ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
            cm = cidx < end
            cp = binning.sorted_prim[jnp.clip(cidx, 0, budget - 1)]
            rel = pos_b[None] - primpos[cp][:, None]
            y = jnp.einsum("kij,kpi->kpj", primrot[cp], rel) \
                * primscale[cp][:, None]
            a = sample_packed(alpha_pv, cp, y)[..., 0]  # [CH, P3]
            fade = jnp.exp(-fadescale * jnp.sum(jnp.abs(y) ** fadeexp, -1))
            valid = jnp.all(jnp.abs(y) < 1.0, axis=-1)
            a = a * fade * valid * cm[:, None]
            return acc + jnp.sum(a, axis=0), None

        acc, _ = lax.scan(prim_chunk, jnp.zeros((P3,)),
                          jnp.arange(nchunks, dtype=jnp.int32))
        return acc

    dens = jax.vmap(block_density)(
        binning.cell_start, binning.cell_end, pos)       # [NB^3, P3]
    dens = dens.reshape(NB, NB, NB, block, block, block)  # (bz,by,bx,lz,ly,lx)
    dens = dens.transpose(0, 3, 1, 4, 2, 5).reshape(G, G, G)
    return dens  # indexed [z, y, x]


def shadow_at_points(
    density: jnp.ndarray,     # [G, G, G] (z, y, x)
    points: jnp.ndarray,      # [M, 3] (normalized frame)
    light_pos: jnp.ndarray,   # [3]
    n_steps: int = 32,
    point_chunk: int = 131072,
) -> jnp.ndarray:
    """Accumulated alpha (clamped to 1) from the light to each point: [M].

    Chunked over points via lax.map when M > point_chunk: at hand scale the
    teacher queries every prim voxel (4096 prims x 16x16x8 = 8.4M points) x
    5 lights, and the unchunked [M, S, 3] sample/gather temps alone were a
    21 GB allocation (the round-3 hand_teacher rung OOM). 128k-point chunks
    bound the live set at ~50 MB while each chunk still fills the chip."""
    M = points.shape[0]
    if M > point_chunk:
        pad = (-M) % point_chunk
        pts = jnp.pad(points, ((0, pad), (0, 0)))
        out = lax.map(
            lambda p: _shadow_at_points_impl(density, p, light_pos, n_steps),
            pts.reshape(-1, point_chunk, 3))
        return out.reshape(-1)[:M]
    return _shadow_at_points_impl(density, points, light_pos, n_steps)


def _shadow_at_points_impl(density, points, light_pos, n_steps):
    from goliath_tpu.utils.sampling import grid_sample_3d

    d = points - light_pos[None]
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirn = d / jnp.clip(dist, min=1e-8)
    # clip the segment to the [-1,1] volume
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12, 1e-12, dirn)
    t1 = (-1.0 - light_pos[None]) * inv
    t2 = (1.0 - light_pos[None]) * inv
    t_enter = jnp.clip(jnp.max(jnp.minimum(t1, t2), -1, keepdims=True),
                       min=0.0)
    t_exit = jnp.minimum(dist[:, 0], dist[:, 0])  # to the point itself
    seg = jnp.clip(t_exit[:, None] - t_enter, min=0.0)  # [M, 1]
    ts = t_enter + seg * (
        (jnp.arange(n_steps, dtype=jnp.float32)[None] + 0.5) / n_steps
    )  # [M, S]
    pos = light_pos[None, None] + dirn[:, None] * ts[..., None]  # [M, S, 3]
    dens = grid_sample_3d(density[None], pos, padding_mode="zeros")[0]  # [M,S]
    acc = jnp.sum(dens, axis=-1) * (seg[:, 0] / n_steps)
    return jnp.clip(acc, 0.0, 1.0)


def shadow_at_points_exact(
    primpos: jnp.ndarray,     # [K, 3] (normalized volume frame)
    primrot: jnp.ndarray,     # [K, 3, 3]
    primscale: jnp.ndarray,   # [K, 3]
    primalpha: jnp.ndarray,   # [K, Z, Y, X]
    points: jnp.ndarray,      # [M, 3] (normalized frame)
    light_pos: jnp.ndarray,   # [3]
    n_steps: int = 64,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
    point_chunk: int = 1024,
) -> jnp.ndarray:
    """Brute-force deep shadow: integrate the TRUE per-prim trilinear alpha
    fields from the light to each point — the exact quantity the reference's
    per-ray shadow-splat march accumulates
    (reference extensions/mvpraymarch/primsplatter.h:14-38, clamped additive
    accumulation as in primaccum.h:63-78) with no density-grid resampling.

    O(K * M * n_steps) — a parity/validation oracle for the grid path
    (splat_density_grid + shadow_at_points), usable only at study scale;
    the production path amortizes the K-sum into one density grid.
    Returns accumulated alpha clamped to 1, [M].
    """
    from goliath_tpu.utils.sampling import grid_sample_3d

    M = points.shape[0]
    pad = (-M) % point_chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))

    def chunk_fn(p):  # [C, 3] -> [C]
        d = p - light_pos[None]
        dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
        dirn = d / jnp.clip(dist, min=1e-8)
        ts = dist * ((jnp.arange(n_steps, dtype=jnp.float32)[None] + 0.5)
                     / n_steps)                               # [C, S]
        pos = light_pos[None, None] + dirn[:, None] * ts[..., None]

        def one_prim(acc, args):
            pp, pr, ps, vol = args
            y = jnp.einsum("ij,csi->csj", pr, pos - pp[None, None]) \
                * ps[None, None]
            a = grid_sample_3d(vol[None], y)[0]               # [C, S]
            fade = jnp.exp(-fadescale * jnp.sum(jnp.abs(y) ** fadeexp, -1))
            valid = jnp.all(jnp.abs(y) < 1.0, axis=-1)
            return acc + a * fade * valid, None

        dens, _ = lax.scan(one_prim, jnp.zeros(pos.shape[:2]),
                           (primpos, primrot, primscale, primalpha))
        acc = jnp.sum(dens, axis=-1) * (dist[:, 0] / n_steps)
        return jnp.clip(acc, 0.0, 1.0)

    out = lax.map(chunk_fn, pts.reshape(-1, point_chunk, 3))
    return out.reshape(-1)[:M]
