"""Cross-chip sharding of the pixels(tiles) x primitives axes (SURVEY 2.8).

Data parallelism over the batch (sharding.py) is the first mesh axis; this
module adds the second, TPU-native axis: splitting a SINGLE image's render
across chips when the full-res backward pressures HBM (the regime where
full-res b=4 RGCA dies on one chip).

Two decompositions, both built on jax.shard_map over a named mesh axis:

* ``render_tile_sharded`` — each chip renders a horizontal BAND of screen
  tiles (gaussians replicated, band binned locally via
  ``prepare_sample(y_offset_px=..., bin_img_h=...)``). The image is produced
  already sharded over the mesh axis; gradients w.r.t. the replicated
  gaussian parameters are partial per band, and shard_map's AD inserts the
  psum over ICI automatically. Every budget-scaled cost (pair sort, pack
  gather, kernel pair rows, bwd reduction) shrinks by ~the band count.

* ``composite_over`` — the associative over-operator used for a depth-slab
  (primitive-axis) split: (C1, T1) over (C2, T2) = (C1 + T1*C2, T1*T2).
  Chips render depth-ordered gaussian SLABS over the full image and the
  per-chip (color, transmittance) pairs fold exactly with one all_gather.

The reference has no counterpart (single-GPU jobs; CUDA gsplat binning is
intra-GPU) — this is the scale-out design from SURVEY.md 2.8/5.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        # the new top-level API renamed check_rep to check_vma; the body
        # mixes axis-invariant scan carries with varying data, so keep the
        # varying-manual-axes check off (same semantics as check_rep=False)
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def composite_over(a, b):
    """Associative 'over' combine of (color [..., C, H, W],
    transmittance [..., H, W]) pairs: front slab a over back slab b."""
    ca, ta = a
    cb, tb = b
    return ca + ta[..., None, :, :] * cb, ta * tb


def render_prim_sharded(
    mesh: Mesh,
    axis: str,
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
    bg_color: jnp.ndarray | None = None,
    **render_kwargs,
) -> Dict[str, jnp.ndarray]:
    """render() with the PRIMITIVE axis sharded as depth slabs (SURVEY 2.8
    axis 4): each chip composites a contiguous depth slab of the gaussians
    over the full image; per-chip (color+depth, transmittance) pairs fold
    exactly with the associative over-operator after one all_gather.

    Scales the primitive SET beyond one chip's HBM: every N-proportional
    cost (projection, binning, pair budget, backward reduction) shrinks by
    the slab count. The full image is composited per chip, so per-PIXEL
    costs do not shrink — combine with the tile axis on a 2-D mesh when
    both axes are the bottleneck. Slab order uses exact f32 depths (a
    stable [N] argsort), a strict refinement of the single-chip quantized
    per-tile ordering."""
    from goliath_tpu.ops import gsplat

    nslabs = mesh.shape[axis]
    B, N = primpos.shape[:2]
    n_pad = (-N) % nslabs
    slab = (N + n_pad) // nslabs

    def body(K, Rt, pos, quat, scale, op, col):
        s = jax.lax.axis_index(axis)

        def one(K_b, Rt_b, pos_b, quat_b, scale_b, op_b, col_b):
            # depth-sort the prims and take this chip's contiguous slab
            Rz = Rt_b[2, :3]
            depth = pos_b @ Rz + Rt_b[2, 3]
            order = jnp.argsort(depth)  # stable
            take = jax.lax.dynamic_slice_in_dim(
                jnp.pad(order, (0, n_pad), constant_values=N - 1),
                s * slab, slab)
            # padded tail slots replicate the farthest prim with opacity 0
            pad_live = jax.lax.dynamic_slice_in_dim(
                jnp.pad(jnp.ones((N,), op_b.dtype), (0, n_pad)),
                s * slab, slab)
            return (pos_b[take], quat_b[take], scale_b[take],
                    op_b[take] * pad_live[:, None], col_b[take])

        sl = [jnp.stack(x) for x in zip(*[
            one(K[b], Rt[b], pos[b], quat[b], scale[b], op[b], col[b])
            for b in range(B)])]
        out = gsplat.render(
            cam_img_w, cam_img_h, K, Rt, *sl,
            return_depth=return_depth, bg_color=None, **render_kwargs)
        C = jnp.concatenate(
            [out["render"]] + ([out["depth"]] if return_depth else []),
            axis=1)                                   # [B, C', H, W]
        T = out["final_T"][:, 0]                      # [B, H, W]
        # fold slabs front-to-back: gather every chip's pair and reduce
        # with the associative over-operator in slab order (exact)
        Cs = jax.lax.all_gather(C, axis)              # [nslabs, B, C', H, W]
        Ts = jax.lax.all_gather(T, axis)
        acc = (Cs[0], Ts[0])
        for i in range(1, nslabs):
            acc = composite_over(acc, (Cs[i], Ts[i]))
        return acc

    C, T_final = shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * 7,
        out_specs=(P(), P()),
        check_rep=False,
    )(K, Rt, primpos, primqvec, primscale, opacity, colors)

    rgb = C[:, :3]
    alpha = (1.0 - T_final)[:, None]
    if bg_color is not None:
        rgb = rgb + T_final[:, None] * bg_color[None, :, None, None]
    result = {"render": rgb, "final_T": T_final[:, None], "alpha": alpha}
    if return_depth:
        result["depth"] = C[:, 3:4]
    return result


def render_tile_sharded(
    mesh: Mesh,
    axis: str,
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
    bg_color: jnp.ndarray | None = None,
    tile_size: int = 32,
    global_scale: float = 1.0,
    z_near: float = 0.1,
    max_tiles_per_prim: int = 64,
    max_pairs_per_tile: int = 1024,
    chunk: int = 256,
    pair_budget_mult: float = 2,
    use_pallas: bool = False,
    pallas_inner: int = 64,
) -> Dict[str, jnp.ndarray]:
    """render() with the screen's tile rows sharded over ``mesh[axis]``.

    Inputs are replicated (P()); the returned render/alpha/depth images are
    sharded over their H axis with PartitionSpec(axis). Differentiable: the
    adjoint of the replicated gaussian inputs is psum'd over the axis by
    shard_map's AD. The per-band pair budget is the full budget divided by
    the band count (bands see ~1/nbands of the pairs), keeping total HBM for
    binning arrays constant as the mesh grows.
    """
    from goliath_tpu.ops import gsplat

    nbands = mesh.shape[axis]
    ts = tile_size
    ntx = -(-cam_img_w // ts)
    nty = -(-cam_img_h // ts)
    nty_pad = -(-nty // nbands) * nbands
    band_nty = nty_pad // nbands
    band_h = band_nty * ts
    N = primpos.shape[1]
    pair_budget = max(
        int(round(pair_budget_mult * N / nbands)), 8 * max_tiles_per_prim)
    B = K.shape[0]

    def one_band(K_b, Rt_b, pos, quat, scale, op, col, y0):
        xys, conics, op_s, chan, valid, radii, binning = \
            gsplat.prepare_sample(
                K_b, Rt_b, pos, quat, scale, op, col,
                cam_img_h, cam_img_w, ts, z_near, global_scale,
                max_tiles_per_prim, pair_budget, return_depth,
                y_offset_px=y0, bin_img_h=band_h,
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
                band_h, cam_img_w, ts, max_pairs_per_tile, chunk,
                pallas_inner, ntx, band_nty,
            )
        else:
            out, T_final = gsplat.rasterize_tiled(
                xys, conics, op_s, chan, barrays,
                band_h, cam_img_w, ts, max_pairs_per_tile, chunk,
                ntx, band_nty,
            )
        return out, T_final

    def body(K, Rt, pos, quat, scale, op, col):
        y0 = (jax.lax.axis_index(axis) * band_h).astype(jnp.float32)
        outs = [one_band(K[b], Rt[b], pos[b], quat[b], scale[b], op[b],
                         col[b], y0) for b in range(B)]
        out = jnp.stack([o[0] for o in outs])      # [B, C, band_h, W]
        T_final = jnp.stack([o[1] for o in outs])  # [B, band_h, W]
        return out, T_final

    out, T_final = shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * 7,
        out_specs=(P(None, None, axis, None), P(None, axis, None)),
        check_rep=False,
    )(K, Rt, primpos, primqvec, primscale, opacity, colors)

    out = out[:, :, :cam_img_h]
    T_final = T_final[:, :cam_img_h]
    rgb = out[:, :3]
    alpha = (1.0 - T_final)[:, None]
    if bg_color is not None:
        rgb = rgb + T_final[:, None] * bg_color[None, :, None, None]
    result = {"render": rgb, "final_T": T_final[:, None], "alpha": alpha}
    if return_depth:
        result["depth"] = out[:, 3:4]
    return result
