"""Body-capture geometry helpers (reference: ca_code/utils/geom_body.py).

The reference file is an older body-specific copy of geom.py used by
notebooks; this module re-exports the unified implementations and adds the
few body-only helpers (closest-point UV barys, Rodrigues inverses, Euler
conversions) on top of goliath_tpu.utils.geom.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from goliath_tpu.utils.geom import (  # noqa: F401 — re-exported API
    GeometryModule,
    compute_tbn,
    compute_v2uv,
    face_normals,
    index_image_impaint,
    make_postex,
    make_uv_barys,
    make_uv_vert_index,
    sample_uv,
    values_to_uv,
    vert_normals,
)
from goliath_tpu.utils.quaternion import (
    axisangle_to_matrix,
    matrix_to_axisangle,
    quat_from_xyz,
    quat_to_matrix,
)


def inv_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle (reference geom_body.py:518)."""
    return matrix_to_axisangle(R)


def euler_xyz_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic XYZ euler angles -> rotation matrix
    (reference geom_body.py:575)."""
    return quat_to_matrix(quat_from_xyz(euler))


def make_closest_uv_barys(
    vt: np.ndarray,
    vti: np.ndarray,
    uv_size: Union[int, Tuple[int, int]],
    flip_uv: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Barycentric map assigning EVERY texel to its closest UV triangle
    (reference geom_body.py:385-447, pytorch3d closest-point variant).

    Implemented as rasterization + nearest-valid impainting, which assigns
    off-island texels the bary coords of the closest covered texel.
    """
    face_index, bary = make_uv_barys(vt, vti, uv_size, flip_uv=flip_uv)
    face_index, bary = index_image_impaint(
        face_index, bary, distance_threshold=float("inf")
    )
    return face_index, bary
