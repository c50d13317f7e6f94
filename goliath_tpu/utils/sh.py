"""Real spherical harmonics, vectorized jnp.

Matches the reference convention (ca_code/utils/sh.py:13-143): basis ordered
(l, m) for l=0..deg, m=-l..l, with Condon-Shortley phase folded into the
associated-Legendre recurrence and sqrt(2) K cos/sin for m != 0.

TPU notes: the (deg+1)^2 basis functions are computed with an unrolled
(static-deg) recurrence of pure elementwise VPU ops, so `dir2sh` fuses into
whatever consumes it under jit.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp


def _factratio(n: int, d: int) -> float:
    if n >= d:
        p = 1.0
        for i in range(d + 1, n + 1):
            p *= i
        return p
    p = 1.0
    for i in range(n + 1, d + 1):
        p *= i
    return 1.0 / p


@lru_cache(maxsize=None)
def _kval(m: int, l: int) -> float:
    return math.sqrt(((2 * l + 1) / (4 * math.pi)) * _factratio(l - m, l + m))


def _assoc_legendre(m: int, l: int, x: jnp.ndarray) -> jnp.ndarray:
    """P_l^m(x) with Condon-Shortley phase; unrolled for static (m, l)."""
    pmm = jnp.ones_like(x)
    if m > 0:
        somx2 = jnp.sqrt(jnp.clip((1.0 + x) * (1.0 - x), min=1e-8))
        fact = 1.0
        for _ in range(1, m + 1):
            pmm = -pmm * fact * somx2
            fact += 2.0
    if l == m:
        return pmm
    pmmp1 = x * (2 * m + 1) * pmm
    if l == m + 1:
        return pmmp1
    pll = pmmp1
    for i in range(m + 2, l + 1):
        pll = (x * (2 * i - 1) * pmmp1 - (i + m - 1) * pmm) / (i - m)
        pmm = pmmp1
        pmmp1 = pll
    return pll


def _sh_basis_one(m: int, l: int, ct: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    if m > 0:
        return math.sqrt(2.0) * _kval(m, l) * jnp.cos(m * phi) * _assoc_legendre(m, l, ct)
    if m < 0:
        return math.sqrt(2.0) * _kval(-m, l) * jnp.sin(-m * phi) * _assoc_legendre(-m, l, ct)
    return _kval(0, l) * _assoc_legendre(0, l, ct)


def dir2angle(dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit dirs [..., 3] -> (cos(theta), phi). theta from +z, phi in xy."""
    ct = jnp.clip(dirs[..., 2], -1.0, 1.0)
    phi = jnp.arctan2(dirs[..., 1], dirs[..., 0])
    return ct, phi


def dir2sh(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values at unit directions: [..., (deg+1)^2]."""
    ct, phi = dir2angle(dirs)
    shs = [
        _sh_basis_one(m, l, ct, phi)
        for l in range(deg + 1)
        for m in range(-l, l + 1)
    ]
    return jnp.stack(shs, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH coefficients sh [..., C, (deg+1)^2] at dirs [..., 3]."""
    basis = dir2sh(deg, dirs)  # [..., K]
    return jnp.einsum("...ck,...k->...c", sh, basis)
