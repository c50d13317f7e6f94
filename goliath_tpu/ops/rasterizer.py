"""Differentiable mesh rasterizer for TPU (replaces the external CUDA `drtk`,
reference wrapper ca_code/utils/render_drtk.py:30-82).

Components:
  * `transform` — world -> pixel-space verts (x_pix, y_pix, z_cam).
  * `rasterize` — per-pixel face index via the shared tile-binning engine
    (ops/binning.py) + a per-tile chunked z-buffer scan. Non-differentiable
    by construction (it returns indices), like drtk's rasterize.
  * `render_barys` — differentiable per-pixel screen-space barycentrics and
    perspective-correct depth, recomputed from v_pix at the rasterized
    indices (gradients flow to vertices through the bary math, matching
    drtk's `render`).
  * `interpolate` — bary-blend per-vertex attributes into image space.
  * `edge_grad_estimator` — custom-VJP identity on the image whose backward
    adds silhouette gradients to v_pix: at neighboring pixel pairs with
    different face ids, the color jump times the upstream gradient gives the
    loss derivative w.r.t. the occluding edge's screen position, distributed
    to the front face's vertices by barycentric weight (first-order scheme of
    drtk's edge_grad_estimator).
  * `rasterize_reference` — exact per-pixel-all-faces oracle for tests.

Everything is static-shape and jit/vmap-safe; the z-buffer scan and binning
reuse the splatting machinery, so future Pallas work accelerates both.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from goliath_tpu.ops.backend import target_backend
from jax import lax

from goliath_tpu.ops.binning import bin_to_tiles

BIG_DEPTH = 3.0e38


def transform(verts: jnp.ndarray, K: jnp.ndarray, Rt: jnp.ndarray
              ) -> jnp.ndarray:
    """[B, V, 3] world verts -> [B, V, 3] (x_pix, y_pix, z_cam)."""
    v_cam = jnp.einsum("bij,bnj->bni", Rt[:, :3, :3], verts) \
        + Rt[:, None, :3, 3]
    z = v_cam[..., 2:3]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xy = jnp.einsum("bij,bnj->bni", K[:, :2, :2], v_cam[..., :2] / zs) \
        + K[:, None, :2, 2]
    return jnp.concatenate([xy, v_cam[..., 2:3]], axis=-1)


def _face_screen(v_pix: jnp.ndarray, vi: jnp.ndarray):
    """Gather per-face screen verts: [F, 3(corners), 3(xyz)]."""
    return v_pix[vi]


def _edge_coeffs(tri: jnp.ndarray):
    """Edge-function coefficients for one batch of faces.

    tri: [F, 3, 2] screen xy. Returns (a, b, c) each [F, 3] such that
    E_k(p) = a_k px + b_k py + c_k, positive inside for CCW faces; we
    normalize by the signed area so both winding orders rasterize.
    """
    x = tri[..., 0]
    y = tri[..., 1]
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    y0, y1, y2 = y[..., 0], y[..., 1], y[..., 2]
    a = jnp.stack([y1 - y2, y2 - y0, y0 - y1], -1)
    b = jnp.stack([x2 - x1, x0 - x2, x1 - x0], -1)
    c = jnp.stack(
        [x1 * y2 - x2 * y1, x2 * y0 - x0 * y2, x0 * y1 - x1 * y0], -1
    )
    area = x1 * y2 - x2 * y1 - (x0 * y2 - x2 * y0) + x0 * y1 - x1 * y0
    return a, b, c, area


def rasterize(
    v_pix: jnp.ndarray,   # [V, 3] single image (vmap for batches)
    vi: jnp.ndarray,      # [F, 3]
    img_h: int,
    img_w: int,
    tile_size: int = 16,
    max_tiles_per_face: int = 64,
    max_faces_per_tile: int = 256,
    chunk: int = 32,
    pair_budget_mult: int = 8,
    z_near: float = 1e-4,
    use_pallas: bool | None = None,
    pallas_inner: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pixel face index image [H, W], -1 where empty (z-buffered).

    use_pallas=None auto-selects: the Pallas kernel on TPU (the XLA scan
    z-buffer measured ~1s for a full-res pass), the XLA scan elsewhere."""
    if use_pallas is None:
        use_pallas = target_backend() == "tpu"
    ntx = -(-img_w // tile_size)
    nty = -(-img_h // tile_size)
    F = vi.shape[0]

    tri = _face_screen(v_pix, vi)  # [F, 3, 3]
    z = tri[..., 2]
    valid = jnp.all(z > z_near, axis=-1)
    a, b, c, area = _edge_coeffs(tri[..., :2])
    valid = valid & (jnp.abs(area) > 1e-12)

    xy_min = jnp.min(tri[..., :2], axis=1)
    xy_max = jnp.max(tri[..., :2], axis=1)
    t_min = jnp.floor(xy_min / tile_size).astype(jnp.int32)
    t_max = (jnp.floor(xy_max / tile_size) + 1).astype(jnp.int32)

    binning = bin_to_tiles(
        t_min, t_max, valid, ntx, nty, max_tiles_per_face,
        pair_budget_mult * F,
    )
    budget = binning.sorted_prim.shape[0]

    # normalize edge functions to "positive inside" regardless of winding
    sgn = jnp.sign(area)[:, None]
    an, bn, cn = a * sgn, b * sgn, c * sgn
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    # perspective: interpolate 1/z with screen barys
    inv_z = 1.0 / jnp.clip(z, min=z_near)  # [F, 3]

    if use_pallas:
        from goliath_tpu.ops.rasterizer_pallas import rasterize_zbuffer_pallas

        index_img, _ = rasterize_zbuffer_pallas(
            an, bn, cn, jnp.abs(inv_area), inv_z,
            valid.astype(an.dtype),
            binning.sorted_prim, binning.tile_start, binning.tile_end,
            img_h, img_w, tile_size, ntx, nty,
            chunk=chunk, inner=pallas_inner,
            max_faces_per_tile=max_faces_per_tile, interpret=interpret,
        )
        return index_img

    ty_, tx_ = jnp.meshgrid(
        jnp.arange(tile_size, dtype=jnp.float32),
        jnp.arange(tile_size, dtype=jnp.float32), indexing="ij",
    )
    pix_local = jnp.stack([tx_, ty_], -1).reshape(-1, 2) + 0.5  # [P, 2]
    P = tile_size * tile_size
    nchunks = max_faces_per_tile // chunk

    def raster_tile(tile_idx, start, end):
        tx = tile_idx % ntx
        ty = tile_idx // ntx
        origin = jnp.stack([tx * tile_size, ty * tile_size]).astype(jnp.float32)
        pix = pix_local + origin[None]  # [P, 2]

        def step(carry, ci):
            best_z, best_f = carry
            idxs = start + ci * chunk + jnp.arange(chunk, dtype=jnp.int32)
            m = idxs < end
            fi = binning.sorted_prim[jnp.clip(idxs, 0, budget - 1)]  # [CH]
            E = (an[fi][:, :, None] * pix[None, None, :, 0]
                 + bn[fi][:, :, None] * pix[None, None, :, 1]
                 + cn[fi][:, :, None])  # [CH, 3, P]
            inside = jnp.all(E >= 0.0, axis=1) & m[:, None]  # [CH, P]
            bary = E * jnp.abs(inv_area[fi])[:, None, None]  # [CH, 3, P]
            izp = jnp.einsum("kcp,kc->kp", bary, inv_z[fi])
            zp = 1.0 / jnp.clip(izp, min=1e-12)               # [CH, P]
            zp = jnp.where(inside, zp, BIG_DEPTH)
            # arg-min over the chunk
            k_best = jnp.argmin(zp, axis=0)                   # [P]
            z_best = jnp.take_along_axis(zp, k_best[None], axis=0)[0]
            f_best = fi[k_best]
            upd = z_best < best_z
            best_f = jnp.where(upd, f_best, best_f)
            best_z = jnp.where(upd, z_best, best_z)
            return (best_z, best_f), None

        init = (jnp.full((P,), BIG_DEPTH), jnp.full((P,), -1, jnp.int32))
        (best_z, best_f), _ = lax.scan(
            step, init, jnp.arange(nchunks, dtype=jnp.int32)
        )
        return best_f

    tiles = jnp.arange(ntx * nty, dtype=jnp.int32)
    faces = jax.vmap(raster_tile)(tiles, binning.tile_start, binning.tile_end)
    # [T, P] -> [H, W]
    img = faces.reshape(nty, ntx, tile_size, tile_size)
    img = img.transpose(0, 2, 1, 3).reshape(nty * tile_size, ntx * tile_size)
    return lax.stop_gradient(img[:img_h, :img_w])


def render_barys(
    v_pix: jnp.ndarray, vi: jnp.ndarray, index_img: jnp.ndarray,
    z_near: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(depth_img [H, W], bary_img [3, H, W]), differentiable wrt v_pix.

    Screen-space barycentrics at pixel centers of the rasterized faces;
    depth is perspective-correct (1 / interp(1/z)).
    """
    H, W = index_img.shape
    fi = jnp.clip(index_img, 0, vi.shape[0] - 1)
    # per-corner, per-coordinate gathers keep (H, W) as every tensor's
    # minor dims — a fused v_pix[vi[fi]] [H, W, 3, 3] gather gets its tiny
    # trailing dims tile-padded ~42x on TPU (same pathology as
    # geom.values_to_uv; see that docstring)
    vt3 = v_pix.T                                # [3, V]
    c0 = vi[:, 0][fi]
    c1 = vi[:, 1][fi]
    c2 = vi[:, 2][fi]
    # plain indexing: verts adjoints are dup-dense (native scatter wins)
    p0 = vt3[:, c0]                              # [3, H, W]
    p1 = vt3[:, c1]
    p2 = vt3[:, c2]
    x0, x1, x2 = p0[0], p1[0], p2[0]             # [H, W] each
    y0, y1, y2 = p0[1], p1[1], p2[1]
    py, px = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5, indexing="ij",
    )
    e0 = (y1 - y2) * px + (x2 - x1) * py + (x1 * y2 - x2 * y1)
    e1 = (y2 - y0) * px + (x0 - x2) * py + (x2 * y0 - x0 * y2)
    e2 = (y0 - y1) * px + (x1 - x0) * py + (x0 * y1 - x1 * y0)
    area = x1 * y2 - x2 * y1 - (x0 * y2 - x2 * y0) + x0 * y1 - x1 * y0
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    bary = jnp.stack([e0, e1, e2], axis=0) * inv_area[None]  # [3, H, W]
    mask = (index_img != -1)
    bary = bary * mask[None]
    izp = (bary[0] / jnp.clip(p0[2], min=z_near)
           + bary[1] / jnp.clip(p1[2], min=z_near)
           + bary[2] / jnp.clip(p2[2], min=z_near))
    depth = jnp.where(mask, 1.0 / jnp.clip(izp, min=1e-12), 0.0)
    return depth, bary


def interpolate(
    vert_attrs: jnp.ndarray,  # [V, C]
    vi: jnp.ndarray,
    index_img: jnp.ndarray,   # [H, W]
    bary_img: jnp.ndarray,    # [3, H, W]
) -> jnp.ndarray:
    """[C, H, W] bary-blended attributes (zeros at empty pixels).

    Per-corner channel-first gathers — a fused [H, W, 3, C] gather gets
    its (3, C) trailing dims tile-padded ~42x on TPU."""
    fi = jnp.clip(index_img, 0, vi.shape[0] - 1)
    at = jnp.moveaxis(vert_attrs, -1, 0)         # [C, V]
    out = None
    for k in range(3):
        term = at[:, vi[:, k][fi]] * bary_img[k][None]   # [C, H, W]
        out = term if out is None else out + term
    return out * (index_img != -1)[None]


# ---------------------------------------------------------------------------
# edge gradients
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=())
def edge_grad_estimator(v_pix, vi, bary_img, img, index_img, depth_img):
    return img


def _eg_fwd(v_pix, vi, bary_img, img, index_img, depth_img):
    return img, (v_pix, vi, bary_img, img, index_img, depth_img)


def _eg_bwd(res, g):
    v_pix, vi, bary_img, img, index_img, depth_img = res
    V = v_pix.shape[0]
    C, H, W = img.shape

    depth_or_big = jnp.where(index_img != -1, depth_img, BIG_DEPTH)

    def pair_grads(axis: int):
        """Silhouette gradient for neighbor pairs along x (axis=1) or y."""
        if axis == 1:
            ia, ib = (slice(None), slice(None, -1)), (slice(None), slice(1, None))
        else:
            ia, ib = (slice(None, -1), slice(None)), (slice(1, None), slice(None))
        fa = index_img[ia]
        fb = index_img[ib]
        boundary = fa != fb
        da = depth_or_big[ia]
        db = depth_or_big[ib]
        a_front = da < db  # pixel a's face occludes

        img_a = img[(slice(None),) + ia]
        img_b = img[(slice(None),) + ib]
        g_a = g[(slice(None),) + ia]
        g_b = g[(slice(None),) + ib]
        # moving the boundary toward the back pixel replaces back color with
        # front color there: dL/dpos = <g_back, img_front - img_back>
        dL_front = jnp.where(
            a_front,
            jnp.sum(g_b * (img_a - img_b), axis=0),
            -jnp.sum(g_a * (img_b - img_a), axis=0),
        )
        dL_front = jnp.where(boundary, dL_front, 0.0)

        front_face = jnp.where(a_front, fa, fb)
        bary_a = bary_img[(slice(None),) + ia]
        bary_b = bary_img[(slice(None),) + ib]
        front_bary = jnp.where(a_front[None], bary_a, bary_b)

        vids = vi[jnp.clip(front_face, 0, vi.shape[0] - 1)]  # [..., 3]
        contrib = front_bary * dL_front[None]                # [3, h', w']
        ok = boundary & (front_face >= 0)
        vid_flat = jnp.where(ok[None], vids.transpose(2, 0, 1), V).reshape(-1)
        val_flat = contrib.reshape(-1)
        acc = jnp.zeros((V,)).at[vid_flat].add(val_flat, mode="drop")
        return acc

    gx = pair_grads(axis=1)
    gy = pair_grads(axis=0)
    g_v_pix = jnp.stack([gx, gy, jnp.zeros_like(gx)], axis=-1)
    return (g_v_pix, None, None, g, None, None)


edge_grad_estimator.defvjp(_eg_fwd, _eg_bwd)


# ---------------------------------------------------------------------------
# exact reference rasterizer (oracle for tests)
# ---------------------------------------------------------------------------


def rasterize_reference(v_pix: jnp.ndarray, vi: jnp.ndarray, img_h: int,
                        img_w: int, z_near: float = 1e-4) -> jnp.ndarray:
    """O(H*W*F) z-buffer; small inputs only."""
    tri = v_pix[vi]
    z = tri[..., 2]
    valid = jnp.all(z > z_near, axis=-1)
    a, b, c, area = _edge_coeffs(tri[..., :2])
    valid = valid & (jnp.abs(area) > 1e-12)
    sgn = jnp.sign(area)[:, None]
    an, bn, cn = a * sgn, b * sgn, c * sgn
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    inv_z = 1.0 / jnp.clip(z, min=z_near)

    py, px = jnp.meshgrid(
        jnp.arange(img_h, dtype=jnp.float32) + 0.5,
        jnp.arange(img_w, dtype=jnp.float32) + 0.5, indexing="ij",
    )
    pix = jnp.stack([px, py], -1).reshape(-1, 2)  # [P, 2]
    E = (an[:, :, None] * pix[None, None, :, 0]
         + bn[:, :, None] * pix[None, None, :, 1]
         + cn[:, :, None])  # [F, 3, P]
    inside = jnp.all(E >= 0, axis=1) & valid[:, None]
    bary = E * jnp.abs(inv_area)[:, None, None]
    izp = jnp.einsum("fcp,fc->fp", bary, inv_z)
    zp = jnp.where(inside, 1.0 / jnp.clip(izp, min=1e-12), BIG_DEPTH)
    best = jnp.argmin(zp, axis=0)  # [P]
    hit = jnp.take_along_axis(zp, best[None], axis=0)[0] < BIG_DEPTH
    idx = jnp.where(hit, best, -1).reshape(img_h, img_w)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# RenderLayer facade (reference ca_code/utils/render_drtk.py:30-82)
# ---------------------------------------------------------------------------


class RenderLayer:
    def __init__(self, h: int, w: int, vi, vt, vti, flip_uvs: bool = False,
                 **raster_kwargs):
        import numpy as np

        self.h, self.w = h, w
        self.vi = jnp.asarray(np.asarray(vi), jnp.int32)
        vt = np.asarray(vt, np.float32).copy()
        if flip_uvs:
            vt[:, 1] = 1.0 - vt[:, 1]
        self.vt = jnp.asarray(vt)
        self.vti = jnp.asarray(np.asarray(vti), jnp.int32)
        self.raster_kwargs = raster_kwargs

    def __call__(
        self,
        verts: jnp.ndarray,  # [B, V, 3]
        tex: jnp.ndarray,    # [B, C, Ht, Wt]
        K: jnp.ndarray,
        Rt: jnp.ndarray,
        background: Optional[jnp.ndarray] = None,
        output_filters=None,
        edge_grad: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        from goliath_tpu.utils.sampling import grid_sample

        v_pix = transform(verts, K, Rt)

        def raster_one(vp):
            return rasterize(vp, self.vi, self.h, self.w, **self.raster_kwargs)

        index_img = jax.vmap(raster_one)(v_pix)                 # [B, H, W]
        depth_img, bary_img = jax.vmap(
            lambda vp, ii: render_barys(vp, self.vi, ii)
        )(v_pix, index_img)

        B = verts.shape[0]
        vt_attr = jnp.broadcast_to(
            (self.vt * 2.0 - 1.0)[None], (B,) + self.vt.shape
        )
        vt_img = jax.vmap(
            lambda a, ii, bb: interpolate(a, self.vti, ii, bb)
        )(vt_attr, index_img, bary_img)                          # [B, 2, H, W]

        mask = (index_img != -1)[:, None].astype(tex.dtype)
        img = grid_sample(
            tex, vt_img.transpose(0, 2, 3, 1), mode="bilinear",
            align_corners=False,
        ) * mask

        if edge_grad:
            img = jax.vmap(
                lambda vp, bb, im, ii, dd: edge_grad_estimator(
                    vp, self.vi, bb, im, ii, dd
                )
            )(v_pix, bary_img, img, index_img, depth_img)

        return {
            "render": img,
            "depth_img": depth_img,
            "v_pix": v_pix,
            "vt_img": vt_img,
            "index_img": index_img,
            "bary_img": bary_img,
            "mask": mask,
        }
