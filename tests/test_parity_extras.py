"""Tests for the parity-completeness components: shadow-net variants,
CalV3/CalV6, ConcatPyramid, and the geom_body fill-out (closest-point
barycentrics, view-cond TBN/reflection, safe acos)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from goliath_tpu.nn import color_cal as cc
from goliath_tpu.nn import shadow as gshadow
from goliath_tpu.utils import geom_body as gb


# ------------------------------------------------------------------ color cal

def _img(rs, b=3):
    return jnp.asarray(rs.uniform(0, 1, (b, 3, 4, 5)).astype(np.float32))


@pytest.mark.parametrize("ver", ["v3", "v6"])
def test_cal_variants_identity_and_affine(ver):
    rs = np.random.RandomState(0)
    cams = ["c0", "c1", "c2"]
    m = cc.make_cal(ver, cameras=cams, identity_camera="c1")
    img = _img(rs)
    idxs = jnp.asarray([0, 1, 2])
    params = m.init(jax.random.PRNGKey(0), img, idxs)

    # at init all cameras are the identity affine
    out = m.apply(params, img, idxs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    # perturbed params: non-identity cameras get w*img + b, identity cam
    # stays a passthrough (frozen/lerped to the identity affine)
    tab = np.asarray(params["params"]["cal_params"]).copy()
    tab[:] = np.asarray([[2, 3, 4, 0.1, 0.2, 0.3]] * 3, np.float32)
    p2 = {"params": {"cal_params": jnp.asarray(tab)}}
    out2 = np.asarray(m.apply(p2, img, idxs))
    w = tab[0, :3][None, :, None, None]
    b = tab[0, 3:][None, :, None, None]
    expected = np.asarray(img) * w + b
    np.testing.assert_allclose(out2[0], expected[0], rtol=1e-5)
    np.testing.assert_allclose(out2[2], expected[2], rtol=1e-5)
    if ver == "v6":
        # v6 lerps the identity camera's row to the constant identity affine
        np.testing.assert_allclose(out2[1], np.asarray(img)[1], atol=1e-6)
    else:
        # v3 applies its (frozen) row values — identical to the reference,
        # where requires_grad=False pins them at the identity only via init
        np.testing.assert_allclose(out2[1], expected[1], rtol=1e-5)

    # identity camera's params receive zero gradient
    def loss(p):
        return (m.apply(p, img, idxs) ** 2).sum()

    g = np.asarray(jax.grad(loss)(p2)["params"]["cal_params"])
    np.testing.assert_allclose(g[1], 0.0, atol=1e-7)
    assert np.abs(g[0]).max() > 0 and np.abs(g[2]).max() > 0


def test_cal_v6_rejects_gray_cameras():
    with pytest.raises(ValueError):
        m = cc.make_cal("v6", cameras=["41aaa", "c1"], identity_camera="c1")
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 2)),
               jnp.asarray([0]))


# ------------------------------------------------------------------- shadows

def test_shadow_unet_posecond_shapes():
    m = gshadow.ShadowUNet_PoseCond(
        uv_size=64, ao_mean=np.zeros((1, 32, 32), np.float32),
        shadow_size=32, n_dims=8, n_pose_dims=6, n_pose_enc_dims=4,
    )
    ao = jnp.ones((2, 1, 32, 32))
    pose = jnp.ones((2, 6))
    params = m.init(jax.random.PRNGKey(0), ao, pose)
    out = m.apply(params, ao, pose)
    assert out["shadow_map"].shape == (2, 1, 64, 64)
    s = np.asarray(out["shadow_map"])
    assert np.all(s >= 0) and np.all(s <= 1)


def test_dist_map_shadow_unet_shapes():
    m = gshadow.DistMapShadowUNet(
        uv_size=64, shadow_size=32, n_dist_joints=5, n_dims=8,
    )
    dist = jnp.ones((2, 5, 32, 32))
    params = m.init(jax.random.PRNGKey(0), dist)
    out = m.apply(params, dist)
    assert out["shadow_map"].shape == (2, 1, 64, 64)
    assert out["shadow_map_lowres"].shape == (2, 1, 32, 32)


@pytest.mark.slow
def test_floor_shadow_decoder_shapes():
    m = gshadow.FloorShadowDecoder(uv_size=512)
    ao = jnp.ones((1, 1, 256, 256)) * 0.3
    params = m.init(jax.random.PRNGKey(0), ao)
    out = m.apply(params, ao)
    assert out["shadow_map"].shape == (1, 1, 512, 512)
    s = np.asarray(out["shadow_map"])
    assert np.all(s >= 0) and np.all(s <= 1)


# -------------------------------------------------------------- ConcatPyramid

def test_concat_pyramid_upsampling_branches():
    """The pyramid is consumed coarse-to-fine (the reference wraps
    upsampling decoder branches); transposed=True prepends one extra
    blur-decimation so level 0 sits one octave below y."""
    from goliath_tpu.nn.layers import (
        ConcatPyramid, ConvTranspose2dWN, LeakyReLU,
    )

    branch = [
        ConvTranspose2dWN(8 + 2, 8, 4, 2, 1), LeakyReLU(0.2),
        ConvTranspose2dWN(8 + 2, 8, 4, 2, 1), LeakyReLU(0.2),
    ]
    # non-transposed: y's native res aligns with the LAST layer's input
    m = ConcatPyramid(branch=branch, n_concat_in=2, every_other=True)
    x = jnp.ones((1, 8, 8, 8))
    y = jnp.ones((1, 2, 16, 16))
    params = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(params, x, y)
    assert out.shape == (1, 8, 32, 32)

    # transposed: pyramid starts one blur-decimation down
    mt = ConcatPyramid(branch=branch, n_concat_in=2, every_other=True,
                       transposed=True)
    xt = jnp.ones((1, 8, 4, 4))
    yt = jnp.ones((1, 2, 16, 16))
    pt = mt.init(jax.random.PRNGKey(0), xt, yt)
    outt = mt.apply(pt, xt, yt)
    assert outt.shape == (1, 8, 16, 16)


# ------------------------------------------------------------------ geom_body

def test_closest_point_barycentrics_on_and_off_mesh():
    rs = np.random.RandomState(3)
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
    vi = np.array([[0, 1, 2], [0, 2, 3]], np.int64)

    # points ON the mesh reconstruct exactly
    b = rs.dirichlet([1, 1, 1], size=16)
    fidx = rs.randint(0, 2, 16)
    pts = np.einsum("mk,mkd->md", b, v[vi[fidx]])
    approx, barys, interp_idxs, face_idxs = gb.closest_point_barycentrics(
        v, vi, pts)
    np.testing.assert_allclose(approx, pts, atol=1e-9)
    np.testing.assert_allclose(
        np.einsum("mk,mkd->md", barys, v[interp_idxs]), pts, atol=1e-9)

    # points lifted off the plane project back onto it
    pts3 = pts + np.array([0, 0, 1.0])
    approx3, _, _, _ = gb.closest_point_barycentrics(v, vi, pts3)
    np.testing.assert_allclose(approx3, pts, atol=1e-9)

    # a point beyond a corner clamps to the corner
    far = np.array([[2.0, -1.0, 0.5]])
    a, _, _, _ = gb.closest_point_barycentrics(v, vi, far)
    np.testing.assert_allclose(a[0], [1, 0, 0], atol=1e-9)


def test_get_barys_for_uvs_roundtrip():
    v, vi, vt, vti = (
        np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int64),
        np.array([[0.05, 0.05], [0.95, 0.05], [0.95, 0.95], [0.05, 0.95]],
                 np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int64),
    )
    uvs = np.array([[0.5, 0.3], [0.2, 0.8]], np.float64)
    barys, kp_verts = gb.get_barys_for_uvs(
        {"vi": vi, "vt": vt, "vti": vti}, uvs)
    # blending the uv coords of the returned face by the barys recovers uvs
    for k in range(len(uvs)):
        uv_rec = (barys[k][:, None] * vt[vti[
            np.where((vi == kp_verts[k]).all(1))[0][0]]]).sum(0)
        np.testing.assert_allclose(uv_rec, uvs[k], atol=1e-6)


def test_interpolate_values_mesh():
    vals = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    faces = jnp.asarray([[0, 1, 2], [1, 2, 3]])
    idxs = jnp.asarray([0, 1])
    w = jnp.asarray([[1.0, 0, 0], [0, 0.5, 0.5]])
    out = np.asarray(gb.interpolate_values_mesh(vals, faces, idxs, w))
    np.testing.assert_allclose(out[0], np.asarray(vals)[0])
    np.testing.assert_allclose(
        out[1], 0.5 * (np.asarray(vals)[2] + np.asarray(vals)[3]))
    # batched variant
    bvals = jnp.stack([vals, 2 * vals])
    outb = np.asarray(gb.interpolate_values_mesh(bvals, faces, idxs, w))
    np.testing.assert_allclose(outb[1], 2 * out)


def test_acos_safe_matches_and_finite_grad():
    x = jnp.linspace(-0.999, 0.999, 41)
    np.testing.assert_allclose(
        np.asarray(gb.acos_safe(x)), np.arccos(np.asarray(x)), atol=1e-3)
    g = jax.grad(lambda t: gb.acos_safe(t).sum())(jnp.asarray([1.0, -1.0]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_compute_view_cond_tbnrefl():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    vi = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    vt = np.array([[0.05, 0.05], [0.95, 0.05], [0.95, 0.95], [0.05, 0.95]],
                  np.float32)
    vti = vi.copy()
    from goliath_tpu.utils.geom import GeometryModule, compute_v2uv

    v2uv = compute_v2uv(len(v), vi, vti)
    gm = GeometryModule(vi, vt, vti, v2uv, uv_size=16, flip_uv=False)
    geom = jnp.asarray(v)[None]
    campos = jnp.asarray([[0.5, 0.5, 2.0]])
    out = gb.compute_view_cond_tbnrefl(geom, campos, gm)
    assert out.shape == (1, 6, 16, 16)
    arr = np.asarray(out)
    mask = np.asarray(gm.valid_mask)[..., 0]
    # the view vector expressed in TBN space and the reflection vector are
    # both unit length on covered texels
    # the view vector is normalized per-VERTEX then barycentrically
    # interpolated to UV (as in the reference), so texel norms sit slightly
    # below 1; the TBN rotation and reflection must preserve that norm
    tbn_norm = np.linalg.norm(arr[0, :3], axis=0)[mask]
    r_norm = np.linalg.norm(arr[0, 3:], axis=0)[mask]
    np.testing.assert_allclose(tbn_norm, 1.0, atol=0.08)
    np.testing.assert_allclose(r_norm, tbn_norm, atol=1e-3)
