"""Batched quaternion / rotation algebra in jnp.

Covers the surface the reference uses (ca_code/utils/quaternion.py:13-652):
quaternion multiply / rotate / invert / from-euler / to-matrix, Rodrigues
axis-angle <-> matrix, and SVD rigid registration. Everything is pure
elementwise math (VPU-friendly) and shape-polymorphic over leading dims.

Quaternions are stored (x, y, z, w), matching the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.clip(jnp.linalg.norm(v, axis=axis, keepdims=True), min=eps)


def quat_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (x,y,z,w) quaternions, broadcasting over batch."""
    qx, qy, qz, qw = jnp.moveaxis(q, -1, 0)
    rx, ry, rz, rw = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
            qw * rw - qx * rx - qy * ry - qz * rz,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_invert(q: jnp.ndarray) -> jnp.ndarray:
    return quat_conj(q) / jnp.clip(jnp.sum(q * q, axis=-1, keepdims=True), min=1e-20)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v [..., 3] by unit quaternions q [..., 4]."""
    qvec = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + qw * t + jnp.cross(qvec, t)


def quat_from_xyz(xyz: jnp.ndarray) -> jnp.ndarray:
    """Euler XYZ (intrinsic, radians) -> quaternion (x,y,z,w)."""
    half = 0.5 * xyz
    cx, cy, cz = jnp.moveaxis(jnp.cos(half), -1, 0)
    sx, sy, sz = jnp.moveaxis(jnp.sin(half), -1, 0)
    # q = qz * qy * qx (apply x first)
    return jnp.stack(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ],
        axis=-1,
    )


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x,y,z,w) [..., 4] -> rotation matrix [..., 3, 3]."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion (x,y,z,w).

    Branch-free (jnp.where over the four classic cases) so it jits cleanly.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.clip(x, min=1e-12))

    # case 0: trace positive
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    # case 1: m00 largest
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    # case 2: m11 largest
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    # case 3: m22 largest
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    c1 = (m00 > m11) & (m00 > m22)
    c2 = m11 > m22
    q_rest = jnp.where(c1[..., None], q1, jnp.where(c2[..., None], q2, q3))
    q = jnp.where((tr > 0.0)[..., None], q0, q_rest)
    return normalize(q)


def axisangle_to_matrix(rvec: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Rodrigues: axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    eps goes INSIDE the sqrt (repo convention; matches the reference's
    theta = sqrt(1e-5 + sum(rvec**2))): jnp.linalg.norm has NaN gradients at
    exactly-zero rvec, which hand_mvp produces for every primitive during
    the delta-rotation warmup (primposstart iterations).
    """
    theta = jnp.sqrt(jnp.sum(rvec * rvec, axis=-1, keepdims=True) + eps)
    axis = rvec / theta
    x, y, z = jnp.moveaxis(axis, -1, 0)
    zero = jnp.zeros_like(x)
    K = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], -1)
    K = K.reshape(K.shape[:-1] + (3, 3))
    th_ = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(th_) * K + (1.0 - jnp.cos(th_)) * (K @ K)
    # small-angle: R -> I + K*theta (captured by the formula already; just
    # guard the axis division which we clipped above)
    return R


def matrix_to_axisangle(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse Rodrigues via the quaternion path (stable near theta = pi)."""
    q = matrix_to_quat(R)
    qvec = q[..., :3]
    qw = q[..., 3]
    n = jnp.linalg.norm(qvec, axis=-1)
    theta = 2.0 * jnp.arctan2(n, qw)
    axis = qvec / jnp.clip(n, min=eps)[..., None]
    return axis * theta[..., None]


def rigid_align(
    src: jnp.ndarray, tgt: jnp.ndarray, weights: jnp.ndarray | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted Kabsch: (R, t) minimizing |R @ src + t - tgt|^2.

    src, tgt: [..., N, 3]. Returns R [..., 3, 3], t [..., 3].
    (reference: ca_code/utils/quaternion.py:563-652)
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None] / jnp.clip(
        jnp.sum(weights, axis=-1, keepdims=True)[..., None], min=1e-12
    )
    mu_s = jnp.sum(w * src, axis=-2, keepdims=True)
    mu_t = jnp.sum(w * tgt, axis=-2, keepdims=True)
    sc = src - mu_s
    tc = tgt - mu_t
    cov = jnp.einsum("...ni,...nj->...ij", w * tc, sc)
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.zeros_like(U).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = U @ D @ Vt
    t = mu_t[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_s[..., 0, :])
    return R, t
