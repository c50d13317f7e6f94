"""MVP raymarcher parity tests: tiled vs all-prims oracle, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from goliath_tpu.ops import mvp
from goliath_tpu.ops.raygen import compute_raydirs, make_pixelcoords


def _scene(rng, K=12, TD=4):
    primpos = (rng.rand(K, 3).astype(np.float32) - 0.5) * 1.2
    # random rotations
    from goliath_tpu.utils.quaternion import quat_to_matrix

    q = rng.randn(K, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    primrot = np.asarray(quat_to_matrix(jnp.asarray(q)))
    primscale = (2.0 + 3.0 * rng.rand(K, 3)).astype(np.float32)
    template = rng.rand(K, 4, TD, TD, TD).astype(np.float32)
    template[:, 3] *= 30.0  # enough alpha to saturate some rays
    return primpos, primrot, primscale, template


def _rays(H=32, W=32):
    viewpos = np.asarray([[0.0, 0.0, -3.0]], np.float32)
    viewrot = np.eye(3, dtype=np.float32)[None]
    focal = np.asarray([[30.0, 30.0]], np.float32)
    princpt = np.asarray([[W / 2, H / 2]], np.float32)
    pix = make_pixelcoords(1, H, W)
    rp, rd, tminmax = compute_raydirs(
        jnp.asarray(viewpos), jnp.asarray(viewrot), jnp.asarray(focal),
        jnp.asarray(princpt), pix, volradius=1.0,
    )
    K_cam = np.asarray(
        [[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32
    )
    Rt = np.concatenate([viewrot[0], -viewrot[0] @ viewpos[0][:, None]], 1)
    return rp[0], rd[0], tminmax[0], K_cam, Rt.astype(np.float32)


def test_tiled_matches_oracle(rng):
    primpos, primrot, primscale, template = _scene(rng)
    rp, rd, tminmax, K_cam, Rt = _rays()
    H, W = rp.shape[:2]
    stepsize = 0.05
    max_steps = 100

    ref = mvp.march_reference(
        rp.reshape(-1, 3), rd.reshape(-1, 3), stepsize,
        tminmax.reshape(-1, 2),
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), max_steps,
    ).reshape(H, W, 4)

    out = mvp.mvp_raymarch_tiled(
        rp, rd, stepsize, tminmax,
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), jnp.asarray(K_cam), jnp.asarray(Rt),
        max_steps=max_steps, max_prims_per_tile=16, chunk=8,
    )
    ref_np = np.asarray(ref)
    out_np = np.asarray(out).transpose(1, 2, 0)  # [4,H,W] -> [H,W,4]
    assert np.abs(ref_np[..., 3] - out_np[..., 3]).max() < 2e-3
    np.testing.assert_allclose(out_np, ref_np, atol=5e-3)
    assert ref_np[..., 3].max() > 0.5  # scene visible


def test_tiled_window_matches_oracle(rng):
    """window_steps (Sp) sampling is exact when every prim's AABB span
    fits in Sp grid steps: taps outside the oriented box are zeroed by the
    valid mask, so the window only skips exact zeros."""
    primpos, primrot, primscale, template = _scene(rng)
    rp, rd, tminmax, K_cam, Rt = _rays()
    H, W = rp.shape[:2]
    stepsize = 0.05
    # span bound: prim extent 2/scale_min = 1.0 per axis, diag sqrt(3)
    # => <= ~35 steps; Sp=48 covers it
    ref = mvp.march_reference(
        rp.reshape(-1, 3), rd.reshape(-1, 3), stepsize,
        tminmax.reshape(-1, 2),
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), 100,
    ).reshape(H, W, 4)
    out = mvp.mvp_raymarch_tiled(
        rp, rd, stepsize, tminmax,
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), jnp.asarray(K_cam), jnp.asarray(Rt),
        max_steps=100, max_prims_per_tile=16, chunk=8, window_steps=48,
    )
    np.testing.assert_allclose(np.asarray(out).transpose(1, 2, 0),
                               np.asarray(ref), atol=5e-3)

    # windowed gradients against the oracle
    w = jnp.asarray(rng.rand(H, W, 4).astype(np.float32))

    def loss_win(tpl):
        o = mvp.mvp_raymarch_tiled(
            rp, rd, stepsize, tminmax, jnp.asarray(primpos),
            jnp.asarray(primrot), jnp.asarray(primscale), tpl,
            jnp.asarray(K_cam), jnp.asarray(Rt),
            max_steps=100, max_prims_per_tile=16, chunk=8, window_steps=48,
        )
        return jnp.sum(o * w.transpose(2, 0, 1))

    def loss_ref(tpl):
        o = mvp.march_reference(
            rp.reshape(-1, 3), rd.reshape(-1, 3), stepsize,
            tminmax.reshape(-1, 2), jnp.asarray(primpos),
            jnp.asarray(primrot), jnp.asarray(primscale), tpl, 100,
        ).reshape(H, W, 4)
        return jnp.sum(o * w)

    tpl = jnp.asarray(template)
    gw = np.asarray(jax.grad(loss_win)(tpl))
    gr = np.asarray(jax.grad(loss_ref)(tpl))
    scale = np.abs(gr).max() + 1e-6
    np.testing.assert_allclose(gw / scale, gr / scale, atol=2e-3)


def test_tiled_gradients(rng):
    primpos, primrot, primscale, template = _scene(rng, K=6)
    rp, rd, tminmax, K_cam, Rt = _rays(16, 16)
    stepsize = 0.1
    w = jnp.asarray(rng.rand(16, 16, 4).astype(np.float32))

    def loss_tiled(pp, ps, tpl):
        out = mvp.mvp_raymarch_tiled(
            rp, rd, stepsize, tminmax, pp, jnp.asarray(primrot), ps, tpl,
            jnp.asarray(K_cam), jnp.asarray(Rt),
            max_steps=60, max_prims_per_tile=8, chunk=4,
        )
        return jnp.sum(out * w.transpose(2, 0, 1))

    def loss_ref(pp, ps, tpl):
        out = mvp.march_reference(
            rp.reshape(-1, 3), rd.reshape(-1, 3), stepsize,
            tminmax.reshape(-1, 2), pp, jnp.asarray(primrot), ps, tpl, 60,
        ).reshape(16, 16, 4)
        return jnp.sum(out * w)

    args = (jnp.asarray(primpos), jnp.asarray(primscale),
            jnp.asarray(template))
    gt = jax.grad(loss_tiled, argnums=(0, 1, 2))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(["primpos", "primscale", "template"], gt, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_raymarcher_facade(rng):
    from goliath_tpu.utils.render_raymarcher import Raymarcher

    primpos, primrot, primscale, template = _scene(rng, K=8)
    rp, rd, tminmax, K_cam, Rt = _rays(16, 16)
    rm = Raymarcher(volradius=1.0, dt=0.1, max_steps=60,
                    max_prims_per_tile=8, chunk=4)
    decout = {
        "primpos": jnp.asarray(primpos[None]),
        "primrot": jnp.asarray(primrot[None]),
        "primscale": jnp.asarray(primscale[None]),
        "primrgba": jnp.asarray(template[None]),
    }
    rgb, alpha, rgba, shadow = rm(
        rp[None], rd[None], tminmax[None], decout,
        jnp.asarray(K_cam[None]), jnp.asarray(Rt[None]),
    )
    assert rgb.shape == (1, 3, 16, 16)
    assert alpha.shape == (1, 1, 16, 16)
    assert float(alpha.max()) > 0.3

    # B > 1 takes the lax.map-over-batch path (HBM fix at hand scale);
    # identical inputs must give identical outputs to the vmap/B=1 path
    def rep(x):
        return jnp.repeat(x, 2, axis=0)

    rgb2, alpha2, _, _ = rm(
        rep(rp[None]), rep(rd[None]), rep(tminmax[None]),
        {k: rep(v) for k, v in decout.items()},
        rep(jnp.asarray(K_cam[None])), rep(jnp.asarray(Rt[None])),
    )
    assert rgb2.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(rgb2[0]), np.asarray(rgb[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb2[1]), np.asarray(rgb[0]),
                               atol=1e-5)


def test_tiled_warp_matches_oracle(rng):
    """Warp-field sampling (reference mvpraymarch.py:313-418 `warp`):
    tiled march with a smooth warp must match the all-prims oracle, and
    warp gradients must flow."""
    primpos, primrot, primscale, template = _scene(rng, K=8)
    rp, rd, tminmax, K_cam, Rt = _rays(16, 16)
    stepsize = 0.1
    K, _, TD = template.shape[:3]
    # smooth warp: identity grid plus a small random offset
    ax = np.linspace(-1, 1, TD, dtype=np.float32)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    ident = np.stack([xx, yy, zz], 0)[None].repeat(K, 0)  # [K,3,D,H,W]
    warp = ident + 0.15 * rng.randn(K, 3, TD, TD, TD).astype(np.float32)
    warp = jnp.asarray(warp)

    ref = mvp.march_reference(
        rp.reshape(-1, 3), rd.reshape(-1, 3), stepsize,
        tminmax.reshape(-1, 2),
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), 60, warp=warp,
    ).reshape(16, 16, 4)
    out = mvp.mvp_raymarch_tiled(
        rp, rd, stepsize, tminmax,
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), jnp.asarray(K_cam), jnp.asarray(Rt),
        max_steps=60, max_prims_per_tile=8, chunk=4, warp=warp,
    )
    np.testing.assert_allclose(np.asarray(out).transpose(1, 2, 0),
                               np.asarray(ref), atol=5e-3)
    # warp changes the image (vs no warp) and receives gradients
    out_nw = mvp.mvp_raymarch_tiled(
        rp, rd, stepsize, tminmax,
        jnp.asarray(primpos), jnp.asarray(primrot), jnp.asarray(primscale),
        jnp.asarray(template), jnp.asarray(K_cam), jnp.asarray(Rt),
        max_steps=60, max_prims_per_tile=8, chunk=4,
    )
    assert float(jnp.abs(out - out_nw).max()) > 1e-3

    def loss(w):
        o = mvp.mvp_raymarch_tiled(
            rp, rd, stepsize, tminmax,
            jnp.asarray(primpos), jnp.asarray(primrot),
            jnp.asarray(primscale), jnp.asarray(template),
            jnp.asarray(K_cam), jnp.asarray(Rt),
            max_steps=60, max_prims_per_tile=8, chunk=4, warp=w,
        )
        return jnp.sum(o * o)

    g = jax.grad(loss)(warp)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0
