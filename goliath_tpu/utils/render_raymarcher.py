"""Raymarcher facade over the TPU MVP raymarcher
(reference: ca_code/utils/render_raymarcher.py:17-72).

Normalizes prim positions by volradius, dispatches the tile-culled march
(ops/mvp.py), returns NCHW rgb/alpha. `valid_prims` masking is handled by
zeroing invalid prims' alphas (static shapes) rather than slicing.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from goliath_tpu.ops.mvp import mvp_raymarch_tiled


class Raymarcher:
    def __init__(self, volradius: float, dt: float = 1.0, **march_kwargs):
        self.volume_radius = volradius
        self.dt = dt / volradius
        self.march_kwargs = march_kwargs

    def __call__(
        self,
        raypos: jnp.ndarray,     # [B, H, W, 3] (normalized volume frame)
        raydir: jnp.ndarray,     # [B, H, W, 3]
        tminmax: jnp.ndarray,    # [B, H, W, 2]
        decout: Dict[str, jnp.ndarray],
        K: jnp.ndarray,          # [B, 3, 3] for tile culling
        Rt: jnp.ndarray,         # [B, 3, 4]
        renderoptions: Optional[Dict] = None,
        with_shadow: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        primpos = decout["primpos"] / self.volume_radius
        primrot = decout["primrot"]
        primscale = decout["primscale"]
        template = decout["primrgba"]  # [B, K, 4, TD, TH, TW]

        if decout.get("valid_prims", None) is not None:
            vp = decout["valid_prims"].astype(template.dtype)  # [K]
            template = template.at[:, :, 3].multiply(
                vp[None, :, None, None, None]
            )

        # the culling camera works in the normalized frame: scale
        # translation by 1/volradius (rotation/intrinsics unchanged)
        Rt_n = Rt.at[:, :3, 3].divide(self.volume_radius)

        # optional per-prim warp field [B, K, 3, WD, WH, WW] (reference
        # mvpraymarch.py:313-418 `warp`, consumed render_raymarcher.py:56)
        warp = decout.get("warp", None)

        def one(rp, rd, tm, pp, pr, ps, tpl, K_b, Rt_b, *w):
            return mvp_raymarch_tiled(
                rp, rd, self.dt, tm, pp, pr, ps, tpl, K_b, Rt_b,
                warp=w[0] if w else None,
                **self.march_kwargs,
            )

        args = [raypos, raydir, tminmax, primpos, primrot, primscale,
                template, K, Rt_n]
        if warp is not None:
            args.append(warp)
        if raypos.shape[0] > 1:
            # lax.map (not vmap) over the batch: the march's tile-group
            # scan keeps ~GBs of live per-group sample temps, and vmap
            # multiplies every one of them by B (b=4 at hand scale pushed
            # the round-3 hand_mvp rung 11G over HBM even with the
            # per-group remat). Each sample's march saturates the chip on
            # its own, so serializing the batch costs ~nothing.
            rayrgba = jax.lax.map(lambda a: one(*a), tuple(args))
        else:
            rayrgba = jax.vmap(one)(*args)  # [B, 4, H, W]
        rayrgb = rayrgba[:, :3]
        rayalpha = rayrgba[:, 3:4]
        return rayrgb, rayalpha, rayrgba, None

    def window_overflow(self, decout: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Fraction of prims whose AABB diagonal exceeds the Sp-step
        sampling window (window_steps * dt) — the march's exactness bound.

        primscale is LEARNED, so prims can outgrow the window during
        training with no visual signal except silently dropped tail
        contributions (ADVICE r4 #3); models log this scalar so overflow
        is observable. 0.0 when no window is configured (always exact)."""
        Sp = self.march_kwargs.get("window_steps", None)
        if Sp is None:
            return jnp.zeros(())
        pscale = decout["primscale"]                  # [B, K, 3] (1/extent)
        # oriented box half-extents are 1/primscale in the normalized
        # frame (ops/mvp.py prim coords y = primscale * R^T (x - p),
        # valid iff |y|_inf < 1) -> diagonal = 2 * ||1/primscale||_2
        diam = 2.0 * jnp.linalg.norm(
            1.0 / jnp.maximum(jnp.abs(pscale), 1e-12), axis=-1)
        return jnp.mean((diam > Sp * self.dt).astype(jnp.float32))
