"""Deep-shadow fidelity: the TPU global-density-grid shadow path
(splat_density_grid + shadow_at_points) vs a per-ray oracle that integrates
the TRUE per-prim alpha fields from the light to each query point — the
quantity the reference's shadow-splat march accumulates
(extensions/mvpraymarch/primsplatter.h:14-38: each prim voxel receives
1 - accumulated_alpha from the light's viewpoint)."""

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.ops.mvp import shadow_at_points, splat_density_grid
from goliath_tpu.utils.quaternion import quat_to_matrix
from goliath_tpu.utils.sampling import grid_sample_3d


def _scene(rng, K=24, TD=4):
    primpos = (rng.rand(K, 3).astype(np.float32) - 0.5) * 1.0
    q = rng.randn(K, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    primrot = np.asarray(quat_to_matrix(jnp.asarray(q)))
    primscale = (3.0 + 3.0 * rng.rand(K, 3)).astype(np.float32)
    alpha = (rng.rand(K, TD, TD, TD) * 8.0).astype(np.float32)
    return (jnp.asarray(primpos), jnp.asarray(primrot),
            jnp.asarray(primscale), jnp.asarray(alpha))


def _oracle_acc_alpha(primpos, primrot, primscale, alpha, points, light_pos,
                      n_steps=256):
    """Accumulated alpha light->point by integrating the true per-prim
    trilinear alpha fields with fine steps (clamped additive accumulation,
    the saturating march of primaccum.h:63-78)."""
    d = points - light_pos[None]
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dirn = d / jnp.clip(dist, min=1e-8)
    ts = dist * ((jnp.arange(n_steps, dtype=jnp.float32)[None] + 0.5)
                 / n_steps)  # [M, S]
    pos = light_pos[None, None] + dirn[:, None] * ts[..., None]  # [M, S, 3]
    # per-prim local coords -> trilinear alpha, summed over prims
    rel = pos[None] - primpos[:, None, None]
    y = jnp.einsum("kij,kmsi->kmsj", primrot, rel) * primscale[:, None, None]
    K = alpha.shape[0]
    a = jax.vmap(lambda vol, c: grid_sample_3d(vol[None], c)[0])(
        alpha, y.reshape(K, -1, 3)
    ).reshape(K, *pos.shape[:2])  # [K, M, S]
    fade = jnp.exp(-8.0 * jnp.sum(jnp.abs(y) ** 8.0, axis=-1))
    valid = jnp.all(jnp.abs(y) < 1.0, axis=-1)
    dens = jnp.sum(a * fade * valid, axis=0)  # [M, S]
    acc = jnp.cumsum(dens * (dist / n_steps), axis=-1)
    return jnp.minimum(acc[:, -1], 1.0)


def _voxel_centers(primpos, primrot, primscale, TD):
    ax = (jnp.arange(TD, dtype=jnp.float32) + 0.5) / TD * 2 - 1
    zz, yy, xx = jnp.meshgrid(ax, ax, ax, indexing="ij")
    y = jnp.stack([xx, yy, zz], -1).reshape(-1, 3)
    world = primpos[:, None] + jnp.einsum(
        "kij,vj->kvi", primrot, y) / primscale[:, None]
    return world.reshape(-1, 3)


def test_shadow_grid_matches_per_ray_oracle(rng):
    TD = 4
    primpos, primrot, primscale, alpha = _scene(rng, K=24, TD=TD)
    light = jnp.asarray([0.0, 0.0, -0.9])
    pts = _voxel_centers(primpos, primrot, primscale, TD)

    ref = np.asarray(_oracle_acc_alpha(
        primpos, primrot, primscale, alpha, pts, light))

    errs = {}
    for G in (32, 64):
        density = splat_density_grid(primpos, primrot, primscale, alpha,
                                     grid_res=G)
        got = np.asarray(shadow_at_points(density, pts, light, n_steps=64))
        errs[G] = np.abs(got - ref)

    # the default teacher settings (G=64, 32+ steps) must track the oracle
    # (measured: mean 0.0044, q95 0.026, max 0.092 on this scene)
    assert errs[64].mean() < 0.01, errs[64].mean()
    assert np.quantile(errs[64], 0.95) < 0.05, np.quantile(errs[64], 0.95)
    assert errs[64].max() < 0.2, errs[64].max()
    # refining the grid reduces error (sanity that G is the right knob)
    assert errs[64].mean() <= errs[32].mean() + 1e-3
