"""UV-domain geometry core (reference: ca_code/utils/geom.py).

Two halves:

* **Host-side precompute (numpy)** — rasterize the UV layout into per-texel
  face/vertex-index and barycentric images, with optional nearest-valid
  impainting. The reference does this with a CUDA rasterizer (pytorch3d);
  here it is a one-time numpy scanline pass at module construction, so no
  device kernel is needed for a static preprocessing step.

* **Device-side ops (jnp)** — vertex<->UV transfer (`values_to_uv` is a pure
  gather + bary lerp; its transpose under AD becomes an XLA scatter-add),
  normals/TBN, projections, depth->normals. All shape-static and jit-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.utils.sampling import grid_sample

# ---------------------------------------------------------------------------
# host-side UV rasterization
# ---------------------------------------------------------------------------


def rasterize_uv_face_index(
    vt: np.ndarray, vti: np.ndarray, uv_size: Union[int, Tuple[int, int]],
    flip_uv: bool = True,
) -> np.ndarray:
    """Rasterize UV triangles -> per-texel face index ([-1] where empty).

    Texel (i, j) center is at uv = ((j+0.5)/W, (i+0.5)/H); `flip_uv` flips the
    V axis for OpenGL-convention topologies (reference geom.py:31-66).
    """
    if isinstance(uv_size, int):
        uv_size = (uv_size, uv_size)
    H, W = uv_size
    vt = np.asarray(vt, dtype=np.float64).copy()
    vti = np.asarray(vti, dtype=np.int64)
    if flip_uv:
        vt[:, 1] = 1.0 - vt[:, 1]

    # to pixel space
    px = vt[:, 0] * W - 0.5
    py = vt[:, 1] * H - 0.5
    tx = px[vti]  # [F, 3]
    ty = py[vti]

    face_index = np.full((H, W), -1, dtype=np.int32)

    x0 = np.maximum(np.ceil(tx.min(1)).astype(np.int64), 0)
    x1 = np.minimum(np.floor(tx.max(1)).astype(np.int64), W - 1)
    y0 = np.maximum(np.ceil(ty.min(1)).astype(np.int64), 0)
    y1 = np.minimum(np.floor(ty.max(1)).astype(np.int64), H - 1)
    valid = (x1 >= x0) & (y1 >= y0)

    order = np.argsort((x1 - x0 + 1) * (y1 - y0 + 1))
    for f in order:
        if not valid[f]:
            continue
        xs = np.arange(x0[f], x1[f] + 1)
        ys = np.arange(y0[f], y1[f] + 1)
        gx, gy = np.meshgrid(xs, ys)
        b = _bary_2d(gx.ravel(), gy.ravel(), tx[f], ty[f])
        inside = (b >= -1e-9).all(axis=1)
        if inside.any():
            face_index[gy.ravel()[inside], gx.ravel()[inside]] = f
    return face_index


def _bary_2d(px: np.ndarray, py: np.ndarray, tx: np.ndarray, ty: np.ndarray,
             eps: float = 1e-12) -> np.ndarray:
    """Barycentric coords of points (px, py) wrt a single triangle."""
    x = px - tx[2]
    y = py - ty[2]
    x1, x2 = tx[0] - tx[2], tx[1] - tx[2]
    y1, y2 = ty[0] - ty[2], ty[1] - ty[2]
    denom = y2 * x1 - y1 * x2
    denom = np.where(denom >= 0, max(denom, eps), min(denom, -eps))
    b0 = (y2 * x - x2 * y) / denom
    b1 = (x1 * y - y1 * x) / denom
    return np.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def make_uv_vert_index(
    vt: np.ndarray, vi: np.ndarray, vti: np.ndarray,
    uv_size: Union[int, Tuple[int, int]], flip_uv: bool = True,
) -> np.ndarray:
    """[H, W, 3] mesh-vertex indices per texel; -1 where empty."""
    face_index = rasterize_uv_face_index(vt, vti, uv_size, flip_uv)
    vert_index = np.asarray(vi, dtype=np.int64)[face_index.clip(min=0)]
    vert_index[face_index < 0] = -1
    return vert_index.astype(np.int64)


def make_uv_barys(
    vt: np.ndarray, vti: np.ndarray,
    uv_size: Union[int, Tuple[int, int]], flip_uv: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """(face_index [H,W], bary [H,W,3]) per texel; zeros where empty."""
    if isinstance(uv_size, int):
        uv_size = (uv_size, uv_size)
    H, W = uv_size
    vt = np.asarray(vt, dtype=np.float64).copy()
    if flip_uv:
        vt[:, 1] = 1.0 - vt[:, 1]
    face_index = rasterize_uv_face_index(vt, np.asarray(vti), uv_size, flip_uv=False)

    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    vti_map = np.asarray(vti, dtype=np.int64)[face_index.clip(min=0)]  # [H,W,3]
    tx = (vt[:, 0] * W - 0.5)[vti_map]  # [H,W,3]
    ty = (vt[:, 1] * H - 0.5)[vti_map]

    x = gx - tx[..., 2]
    y = gy - ty[..., 2]
    x1, x2 = tx[..., 0] - tx[..., 2], tx[..., 1] - tx[..., 2]
    y1, y2 = ty[..., 0] - ty[..., 2], ty[..., 1] - ty[..., 2]
    denom = y2 * x1 - y1 * x2
    denom = np.where(denom >= 0, np.maximum(denom, 1e-12), np.minimum(denom, -1e-12))
    b0 = (y2 * x - x2 * y) / denom
    b1 = (x1 * y - y1 * x) / denom
    bary = np.stack([b0, b1, 1.0 - b0 - b1], axis=-1)
    bary[face_index < 0] = 0.0
    return face_index, bary.astype(np.float32)


def index_image_impaint(
    index_image: np.ndarray,
    bary_image: Optional[np.ndarray] = None,
    distance_threshold: float = 100.0,
):
    """Fill empty texels from their nearest valid texel (reference :145-194).

    Uses a euclidean distance transform (nearest-valid-index) instead of the
    reference's KDTree — same result, no sklearn dependency.
    """
    from scipy import ndimage

    if index_image.ndim == 3:
        valid = (index_image != -1).any(axis=-1)
    else:
        valid = index_image != -1
    dist, (src_i, src_j) = ndimage.distance_transform_edt(
        ~valid, return_indices=True
    )
    fill = (~valid) & (dist < distance_threshold)
    out = index_image.copy()
    out[fill] = index_image[src_i[fill], src_j[fill]]
    if bary_image is not None:
        bout = bary_image.copy()
        bout[fill] = bary_image[src_i[fill], src_j[fill]]
        return out, bout
    return out


def compute_v2uv(n_verts: int, vi: np.ndarray, vti: np.ndarray, n_max: int = 4
                 ) -> np.ndarray:
    """Vertex index -> up to n_max texture-coordinate indices."""
    v2uv_dict: Dict[int, set] = {}
    for i_v, i_uv in zip(np.asarray(vi).reshape(-1), np.asarray(vti).reshape(-1)):
        v2uv_dict.setdefault(int(i_v), set()).add(int(i_uv))
    v2uv = np.zeros((n_verts, n_max), dtype=np.int32)
    for i in range(n_verts):
        vals = sorted(v2uv_dict.get(i, {0}))
        v2uv[i, :] = vals[0]
        v2uv[i, : min(len(vals), n_max)] = np.array(vals)[:n_max]
    return v2uv


def compute_neighbours(n_verts: int, vi: np.ndarray, n_max_values: int = 10
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """First-ring neighbour indices/weights for Laplacian losses."""
    vi = np.asarray(vi)
    adj: Dict[int, set] = {i: set() for i in range(n_verts)}
    for face in vi:
        for idx in face:
            adj[int(idx)] |= set(int(x) for x in face) - {int(idx)}
    nbs_idxs = np.tile(np.arange(n_verts)[:, None], (1, n_max_values))
    nbs_weights = np.zeros((n_verts, n_max_values), dtype=np.float32)
    for idx in range(n_verts):
        n = min(len(adj[idx]), n_max_values)
        if n:
            nbs_idxs[idx, :n] = np.array(sorted(adj[idx]))[:n]
            nbs_weights[idx, :n] = -1.0 / n
    return nbs_idxs, nbs_weights


# ---------------------------------------------------------------------------
# device-side ops
# ---------------------------------------------------------------------------


def values_to_uv(values: jnp.ndarray, index_img: jnp.ndarray,
                 bary_img: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex values [B, V, C] -> UV map [B, C, H, W] via bary blending.

    Gathers the three barycentric corners SEPARATELY so every tensor keeps
    [..., H, W] as its minor dims: a fused [B, H, W, 3, C] gather leaves
    (3, C) as the tiled dims and TPU pads each to the (8, 128) register
    tile — a measured 42.7x memory expansion (6GB of padding per gather at
    uv 1024) that OOMs the un-rematerialized train step."""
    # channel-first constants fold to clean [3, H, W] layouts (a [H, W, 3]
    # f32 constant is stored with (W, 3) tiled to (8, 128): 512MB of pad)
    idx_cf = jnp.clip(jnp.moveaxis(index_img, -1, 0),
                      0, values.shape[1] - 1)          # [3, H, W]
    bary_cf = jnp.moveaxis(bary_img, -1, 0)            # [3, H, W]
    mask = jnp.all(index_img != -1, axis=-1)           # [H, W]
    vt = jnp.moveaxis(values, -1, 1)                   # [B, C, V]
    blended = None
    for k in range(3):
        # plain indexing: the adjoint targets only V vertices (dup-dense),
        # where the native scatter-add is the fast path (see ops/scatter.py)
        term = vt[:, :, idx_cf[k]] * bary_cf[k][None, None]
        blended = term if blended is None else blended + term
    return blended * mask[None, None]                  # [B, C, H, W]


def sample_uv(
    values_uv: jnp.ndarray,
    uv_coords: jnp.ndarray,
    v2uv: Optional[jnp.ndarray] = None,
    mode: str = "bilinear",
    align_corners: bool = True,
    flip_uvs: bool = False,
) -> jnp.ndarray:
    """UV map [B, C, H, W] sampled at texcoords [T, 2] -> [B, T, C]."""
    B = values_uv.shape[0]
    if flip_uvs:
        uv_coords = uv_coords.at[:, 1].set(1.0 - uv_coords[:, 1])
    grid = (uv_coords * 2.0 - 1.0)[None, :, None, :]  # [1, T, 1, 2]
    grid = jnp.broadcast_to(grid, (B,) + grid.shape[1:])
    values = grid_sample(values_uv, grid, mode=mode, align_corners=align_corners)
    values = values[..., 0].transpose(0, 2, 1)  # [B, T, C]
    if v2uv is not None:
        values = values[:, v2uv].mean(axis=2)
    return values


def face_normals(v: jnp.ndarray, vi: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    pts = v[:, vi]
    v0 = pts[:, :, 1] - pts[:, :, 0]
    v1 = pts[:, :, 2] - pts[:, :, 0]
    n = jnp.cross(v0, v1)
    # eps inside the sqrt keeps gradients finite for degenerate faces
    return n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + eps * eps)


def vert_normals(v: jnp.ndarray, vi: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Area-weighted-by-duplication vertex normals (scatter-add over faces)."""
    fn = face_normals(v, vi)  # [B, F, 3]
    fn3 = jnp.repeat(fn[:, :, None], 3, axis=2).reshape(fn.shape[0], -1, 3)
    flat_vi = vi.reshape(-1)
    vn = jnp.zeros_like(v).at[:, flat_vi].add(fn3)
    return vn / jnp.sqrt(jnp.sum(vn * vn, axis=-1, keepdims=True) + eps * eps)


def compute_view_cos(verts: jnp.ndarray, faces: jnp.ndarray,
                     camera_pos: jnp.ndarray) -> jnp.ndarray:
    vn = vert_normals(verts, faces)
    v2c = verts - camera_pos[:, None]
    v2c = v2c / jnp.clip(jnp.linalg.norm(v2c, axis=-1, keepdims=True), min=1e-12)
    return jnp.einsum("bnd,bnd->bn", vn, v2c)


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def compute_tbn(geom: jnp.ndarray, vt: jnp.ndarray, vi: jnp.ndarray,
                vti: jnp.ndarray):
    """Per-face tangent/bitangent/normal from mesh + texcoords."""
    v0, v1, v2 = geom[:, vi[..., 0]], geom[:, vi[..., 1]], geom[:, vi[..., 2]]
    vt0, vt1, vt2 = vt[vti[..., 0]], vt[vti[..., 1]], vt[vti[..., 2]]
    v01, v02 = v1 - v0, v2 - v0
    vt01, vt02 = vt1 - vt0, vt2 - vt0
    f = 1.0 / (vt01[None, ..., 0] * vt02[None, ..., 1]
               - vt01[None, ..., 1] * vt02[None, ..., 0])
    tangent = f[..., None] * (
        v01 * vt02[None, ..., 1, None] - v02 * vt01[None, ..., 1, None]
    )
    tangent = _normalize(tangent)
    normal = _normalize(jnp.cross(v01, v02))
    bitangent = _normalize(jnp.cross(tangent, normal))
    return tangent, bitangent, normal


def compute_tbn_uv(tri_xyz: jnp.ndarray, tri_uv: jnp.ndarray, eps: float = 1e-5):
    """TBN per texel from gathered triangle corners.

    tri_xyz: [B, N, 3, 3]; tri_uv: [N, 3, 2].
    """
    tri_uv = tri_uv[None]
    v01 = tri_xyz[:, :, 1] - tri_xyz[:, :, 0]
    v02 = tri_xyz[:, :, 2] - tri_xyz[:, :, 0]
    normal = _normalize(jnp.cross(v01, v02))
    vt01 = tri_uv[:, :, 1] - tri_uv[:, :, 0]
    vt02 = tri_uv[:, :, 2] - tri_uv[:, :, 0]
    f = 1.0 / (vt01[..., 0] * vt02[..., 1] - vt01[..., 1] * vt02[..., 0])
    tangent = f[..., None] * (
        v01 * vt02[..., 1][..., None] - v02 * vt01[..., 1][..., None]
    )
    tangent = _normalize(tangent)
    bitangent = _normalize(jnp.cross(normal, tangent))
    return tangent, bitangent, normal


def compute_tbn_uv_given_normal(tri_xyz: jnp.ndarray, tri_uv: jnp.ndarray,
                                normals: jnp.ndarray, eps: float = 1e-5):
    """Tangent frame orthogonalized against externally supplied normals."""
    tri_uv = tri_uv[None]
    v01 = tri_xyz[:, :, 1] - tri_xyz[:, :, 0]
    v02 = tri_xyz[:, :, 2] - tri_xyz[:, :, 0]
    vt01 = tri_uv[:, :, 1] - tri_uv[:, :, 0]
    vt02 = tri_uv[:, :, 2] - tri_uv[:, :, 0]
    fin = vt01[..., 0] * vt02[..., 1] - vt01[..., 1] * vt02[..., 0]
    fin = jnp.where(jnp.abs(fin) < 1e-8, 1e-8, fin)
    f = 1.0 / fin
    tangents = f[..., None] * (
        v01 * vt02[..., 1][..., None] - v02 * vt01[..., 1][..., None]
    )
    tangents = tangents / jnp.clip(
        jnp.linalg.norm(tangents, axis=-1, keepdims=True), min=eps)
    bitangents = jnp.cross(normals, tangents)
    bitangents = bitangents / jnp.clip(
        jnp.linalg.norm(bitangents, axis=-1, keepdims=True), min=eps)
    tangents = jnp.cross(bitangents, normals)
    tangents = tangents / jnp.clip(
        jnp.linalg.norm(tangents, axis=-1, keepdims=True), min=eps)
    return tangents, bitangents, normals


def make_postex(v: jnp.ndarray, idxim: jnp.ndarray, barim: jnp.ndarray
                ) -> jnp.ndarray:
    """Bary-blend vertex positions into a UV position map [B, 3, H, W]."""
    out = (
        barim[None, :, :, 0, None] * v[:, idxim[:, :, 0]]
        + barim[None, :, :, 1, None] * v[:, idxim[:, :, 1]]
        + barim[None, :, :, 2, None] * v[:, idxim[:, :, 2]]
    )
    return jnp.moveaxis(out, -1, 1)


def convert_camera_parameters(Rt: jnp.ndarray, K: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    R = Rt[:, :3, :3]
    t = -jnp.einsum("bji,bj->bi", R, Rt[:, :3, 3])
    return dict(campos=t, camrot=R, focal=K[:, :2, :2], princpt=K[:, :2, 2])


def project_points(p: jnp.ndarray, Rt: jnp.ndarray, K: jnp.ndarray,
                   normalize: bool = False,
                   size: Optional[Tuple[int, int]] = None):
    """Pinhole projection. p [B, N, 3], Rt [B, 3, 4], K [B, 3, 3]."""
    p_cam = jnp.einsum("bij,bnj->bni", Rt[:, :3, :3], p) + Rt[:, None, :3, 3]
    p_pix = jnp.einsum("bij,bnj->bni", K, p_cam)
    depth = p_pix[..., 2:]
    pix = p_pix[..., :2] / jnp.clip(jnp.abs(depth), min=1e-8) * jnp.sign(depth)
    if normalize:
        h, w = size
        pix = 2.0 * pix / jnp.asarray([w, h], dtype=p.dtype) - 1.0
    return pix, depth[..., 0]


def project_points_multi(p: jnp.ndarray, Rt: jnp.ndarray, K: jnp.ndarray,
                         normalize: bool = False,
                         size: Optional[Tuple[int, int]] = None):
    """Multi-camera projection. p [B,N,3], Rt [B,NC,3,4], K [B,NC,3,3]."""
    p_cam = jnp.einsum("bcij,bnj->bcni", Rt[..., :3, :3], p) + Rt[:, :, None, :3, 3]
    p_pix = jnp.einsum("bcij,bcnj->bcni", K, p_cam)
    depth = p_pix[..., 2:]
    pix = p_pix[..., :2] / jnp.clip(jnp.abs(depth), min=1e-8) * jnp.sign(depth)
    if normalize:
        h, w = size
        pix = 2.0 * pix / jnp.asarray([w, h], dtype=p.dtype) - 1.0
    return pix, depth[..., 0]


def xyz2normals(xyz: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[B, 3, H, W] XYZ image -> normals via central differences."""
    pad = jnp.pad(xyz, ((0, 0), (0, 0), (1, 1), (1, 1)))
    U = (pad[:, :, 2:, 1:-1] - pad[:, :, :-2, 1:-1]) / -2
    V = (pad[:, :, 1:-1, 2:] - pad[:, :, 1:-1, :-2]) / -2
    n = jnp.cross(jnp.moveaxis(U, 1, -1), jnp.moveaxis(V, 1, -1))
    n = jnp.moveaxis(n, -1, 1)
    return n / jnp.clip(jnp.linalg.norm(n, axis=1, keepdims=True), min=eps)


def depth2xyz(depth: jnp.ndarray, focal: jnp.ndarray, princpt: jnp.ndarray
              ) -> jnp.ndarray:
    """[B, 1, H, W] depth + intrinsics -> camera-space XYZ [B, 3, H, W]."""
    b, _, h, w = depth.shape
    ix = (jnp.arange(w, dtype=depth.dtype)[None, None] - princpt[:, None, None, 0]
          ) / focal[:, None, None, 0, 0]
    iy = (jnp.arange(h, dtype=depth.dtype)[None, :, None] - princpt[:, None, None, 1]
          ) / focal[:, None, None, 1, 1]
    x = depth[:, 0] * ix
    y = depth[:, 0] * iy
    return jnp.stack([x, y, depth[:, 0]], axis=1)


def depth2normals(depth, focal, princpt) -> jnp.ndarray:
    return xyz2normals(depth2xyz(depth, focal, princpt))


def depth_discontinuity_mask(
    depth: jnp.ndarray, threshold: float = 40.0, pool_ksize: int = 3
) -> jnp.ndarray:
    """Sobel-magnitude depth discontinuities, dilated by avg-pool > 0."""
    from jax import lax

    kernel = jnp.asarray(
        [
            [[[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]],
            [[[-1, -2, -1], [0, 0, 0], [1, 2, 1]]],
        ],
        dtype=depth.dtype,
    )
    g = lax.conv_general_dilated(
        depth, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    disc = (jnp.linalg.norm(g, axis=1, keepdims=True) > threshold).astype(depth.dtype)
    pad = pool_ksize // 2
    pooled = lax.reduce_window(
        disc, 0.0, lax.add, (1, 1, pool_ksize, pool_ksize), (1, 1, 1, 1),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)],
    )
    return pooled > 0.0


# ---------------------------------------------------------------------------
# GeometryModule
# ---------------------------------------------------------------------------


@dataclass
class GeometryModule:
    """Holds UV<->vertex transfer tables (reference geom.py:197-275).

    Heavy index/bary images are computed once on host (numpy) and captured as
    jit constants by the methods below.
    """

    vi: np.ndarray
    vt: np.ndarray
    vti: np.ndarray
    v2uv: Optional[np.ndarray]
    uv_size: int
    flip_uv: bool = False
    impaint: bool = False
    impaint_threshold: float = 100.0

    index_image: np.ndarray = field(init=False)
    bary_image: np.ndarray = field(init=False)
    face_index_image: np.ndarray = field(init=False)
    valid_mask: np.ndarray = field(init=False)

    def __post_init__(self):
        self.vi = np.asarray(self.vi, dtype=np.int64)
        self.vt = np.asarray(self.vt, dtype=np.float32)
        self.vti = np.asarray(self.vti, dtype=np.int64)
        if self.v2uv is not None:
            self.v2uv = np.asarray(self.v2uv, dtype=np.int64)

        index_image = make_uv_vert_index(
            self.vt, self.vi, self.vti, uv_size=self.uv_size, flip_uv=self.flip_uv
        )
        self.valid_mask = (index_image[..., :1] != -1)
        face_index, bary_image = make_uv_barys(
            self.vt, self.vti, uv_size=self.uv_size, flip_uv=self.flip_uv
        )
        if self.impaint:
            index_image, bary_image = index_image_impaint(
                index_image, bary_image, self.impaint_threshold
            )
            face_index = index_image_impaint(
                face_index, distance_threshold=self.impaint_threshold
            )
        self.index_image = index_image
        self.bary_image = bary_image
        self.face_index_image = face_index

    def vn(self, verts: jnp.ndarray) -> jnp.ndarray:
        return vert_normals(verts, jnp.asarray(self.vi))

    def to_uv(self, values: jnp.ndarray) -> jnp.ndarray:
        return values_to_uv(values, jnp.asarray(self.index_image),
                            jnp.asarray(self.bary_image))

    def from_uv(self, values_uv: jnp.ndarray) -> jnp.ndarray:
        return sample_uv(values_uv, jnp.asarray(self.vt),
                         jnp.asarray(self.v2uv))


# ---------------------------------------------------------------------------
# view-texture unprojection (reference geom.py:797-909)
# ---------------------------------------------------------------------------


def compute_face_visibility(index_img: jnp.ndarray, n_faces: int) -> jnp.ndarray:
    """[B, H, W] rasterized face ids -> [B, F] visibility (scatter-max)."""
    B = index_img.shape[0]
    flat = index_img.reshape(B, -1)
    valid = (flat != -1).astype(jnp.float32)
    fi = jnp.clip(flat, 0, n_faces - 1)
    mask = jnp.zeros((B, n_faces))
    mask = mask.at[jnp.arange(B)[:, None], fi].max(valid)
    return mask > 0


def compute_uv_visibility_face(face_index_image: jnp.ndarray,
                               n_faces: int,
                               face_index_uv: jnp.ndarray) -> jnp.ndarray:
    """Per-texel visibility from per-pixel rasterized face ids."""
    face_mask = compute_face_visibility(face_index_image, n_faces)  # [B, F]
    fi = jnp.clip(face_index_uv, 0, n_faces - 1)
    vis = face_mask[:, fi]  # [B, H, W]
    return vis & (face_index_uv != -1)[None]


def compute_view_texture(
    verts: jnp.ndarray,            # [B, V, 3]
    faces: jnp.ndarray,            # [F, 3]
    image: jnp.ndarray,            # [B, 3, H, W]
    face_index_image: jnp.ndarray,  # [B, H, W] rasterized face ids
    normal_image,                   # unused (parity with reference)
    K: jnp.ndarray,                 # [B, 3, 3]
    Rt: jnp.ndarray,                # [B, 3, 4]
    index_image_uv: jnp.ndarray,    # [T, T, 3]
    bary_image_uv: jnp.ndarray,     # [T, T, 3]
    face_index_uv: jnp.ndarray,     # [T, T]
    intensity_threshold=None,
    normal_threshold=None,
):
    """Unproject a camera image into UV space with face-visibility masking.

    Returns (tex [B, 3, T, T], visibility [B, 1, T, T]).
    """
    from goliath_tpu.utils.sampling import grid_sample

    B = verts.shape[0]
    T = index_image_uv.shape[0]
    H, W = image.shape[2:4]

    uv_mask = index_image_uv[..., 0] != -1
    idx = jnp.clip(index_image_uv, 0, verts.shape[1] - 1)  # [T, T, 3]
    xyz_w = jnp.sum(
        verts[:, idx] * bary_image_uv[None, ..., None], axis=3
    )  # [B, T, T, 3]
    v_pix, _ = project_points(
        xyz_w.reshape(B, -1, 3), Rt, K
    )
    yxs = 2.0 * jnp.stack(
        [v_pix[..., 0] / W, v_pix[..., 1] / H], axis=-1) - 1.0
    verts_rgb = grid_sample(
        image, yxs.reshape(B, T, T, 2), mode="nearest",
        align_corners=False, padding_mode="border",
    )  # [B, 3, T, T]
    tex = verts_rgb * uv_mask[None, None]

    visibility = compute_uv_visibility_face(
        face_index_image, faces.shape[0], face_index_uv
    )
    tex = tex * visibility[:, None]
    if intensity_threshold:
        tex = tex * jnp.all(tex <= intensity_threshold, axis=1, keepdims=True)
    return tex, visibility[:, None]
