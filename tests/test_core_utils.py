"""Tests for config, SH, quaternion, sampling, and geom core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch as th
import torch.nn.functional as thf

from goliath_tpu.config import Config, load_config, load_class
from goliath_tpu.utils import sh as gsh
from goliath_tpu.utils import quaternion as gq
from goliath_tpu.utils.sampling import grid_sample, interpolate_bilinear
from goliath_tpu.utils import geom as ggeom


# ---------------------------------------------------------------------- config

def test_config_interpolation(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        """
root: /data
model_name: rgca
data:
  path: ${root}/x
model:
  class_name: ca_code.models.${model_name}.AutoEncoder
  lr: 1e-4
train:
  tag: ${model_name}.A
  run_dir: runs/${.tag}
"""
    )
    cfg = load_config(str(p), overrides=["model.lr=5e-3", "new.key=3"])
    assert cfg.data.path == "/data/x"
    assert cfg.model.class_name == "ca_code.models.rgca.AutoEncoder"
    assert cfg.model.lr == 5e-3
    assert cfg.new.key == 3
    assert cfg.train.run_dir == "runs/rgca.A"


def test_load_class_remap():
    cls = load_class("ca_code.utils.geom.GeometryModule")
    assert cls is ggeom.GeometryModule


# -------------------------------------------------------------------------- sh

def test_sh_orthonormality():
    # numerically integrate <Y_i, Y_j> over the sphere with uniform samples
    rs = np.random.RandomState(1)
    v = rs.randn(200000, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    basis = np.asarray(gsh.dir2sh(2, jnp.asarray(v, jnp.float32)))
    gram = basis.T @ basis * (4 * np.pi / len(v))
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_eval_sh_matches_basis():
    rs = np.random.RandomState(2)
    dirs = rs.randn(5, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = rs.randn(5, 3, 81).astype(np.float32)
    out = gsh.eval_sh(8, jnp.asarray(coeffs), jnp.asarray(dirs))
    basis = gsh.dir2sh(8, jnp.asarray(dirs))
    ref = np.einsum("nck,nk->nc", coeffs, np.asarray(basis))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ quaternion

def test_quat_roundtrip():
    rs = np.random.RandomState(3)
    q = rs.randn(100, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = gq.quat_to_matrix(jnp.asarray(q))
    q2 = gq.matrix_to_quat(R)
    # q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rs = np.random.RandomState(4)
    q = rs.randn(10, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rs.randn(10, 3).astype(np.float32)
    out = gq.quat_rotate(jnp.asarray(q), jnp.asarray(v))
    R = np.asarray(gq.quat_to_matrix(jnp.asarray(q)))
    ref = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_axisangle_roundtrip():
    rs = np.random.RandomState(5)
    rvec = rs.randn(50, 3).astype(np.float32)
    R = gq.axisangle_to_matrix(jnp.asarray(rvec))
    r2 = gq.matrix_to_axisangle(R)
    R2 = gq.axisangle_to_matrix(r2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_axisangle_grad_at_zero():
    """hand_mvp drives delta_rvec to exactly zero during warmup; the
    gradient there must be finite (ADVICE r1: NaN via jnp.linalg.norm)."""
    import jax

    def f(rvec):
        return gq.axisangle_to_matrix(rvec).sum()

    g0 = jax.grad(f)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g0))), g0
    # the analytic derivative of sum(R) at rvec=0 is sum over the skew
    # basis: dR/dv_k = skew(e_k), so d(sum R)/dv = 0 for each component
    np.testing.assert_allclose(np.asarray(g0), 0.0, atol=1e-4)
    # and slightly away from zero it matches finite differences
    rv = jnp.asarray([1e-3, -2e-3, 5e-4])
    g = np.asarray(jax.grad(f)(rv))
    eps = 1e-3
    for k in range(3):
        e = np.zeros(3); e[k] = eps
        fd = (float(f(rv + e)) - float(f(rv - e))) / (2 * eps)
        np.testing.assert_allclose(g[k], fd, atol=1e-3)


def test_rigid_align():
    rs = np.random.RandomState(6)
    src = rs.randn(2, 30, 3).astype(np.float32)
    rvec = rs.randn(2, 3).astype(np.float32)
    R_true = np.asarray(gq.axisangle_to_matrix(jnp.asarray(rvec)))
    t_true = rs.randn(2, 3).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R_true, src) + t_true[:, None]
    R, t = gq.rigid_align(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)


# -------------------------------------------------------------------- sampling

@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode):
    rs = np.random.RandomState(7)
    img = rs.randn(2, 3, 8, 10).astype(np.float32)
    grid = (rs.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)
    ours = grid_sample(
        jnp.asarray(img), jnp.asarray(grid),
        padding_mode=padding_mode, align_corners=align_corners,
    )
    ref = thf.grid_sample(
        th.from_numpy(img), th.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_interpolate_matches_torch():
    rs = np.random.RandomState(8)
    img = rs.randn(1, 2, 7, 9).astype(np.float32)
    ours = interpolate_bilinear(jnp.asarray(img), size=(14, 18))
    ref = thf.interpolate(th.from_numpy(img), size=(14, 18), mode="bilinear",
                          align_corners=False)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


# ------------------------------------------------------------------------ geom

def _quad_mesh():
    """Two triangles covering most of UV space."""
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32
    )
    vi = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int64)
    vt = np.array([[0.05, 0.05], [0.95, 0.05], [0.95, 0.95], [0.05, 0.95]],
                  dtype=np.float32)
    vti = vi.copy()
    return v, vi, vt, vti


def test_uv_rasterization_and_transfer():
    v, vi, vt, vti = _quad_mesh()
    gm = ggeom.GeometryModule(vi, vt, vti, None, uv_size=32, flip_uv=False)
    # most texels should be covered
    assert (gm.face_index_image >= 0).mean() > 0.7
    # bary should reconstruct uv coordinates: blend vt by bary == texel uv
    fi = gm.face_index_image
    cov = fi >= 0
    vti_map = vti[fi.clip(min=0)]
    uv_blend = (vt[vti_map] * gm.bary_image[..., None]).sum(-2)
    jj, ii = np.meshgrid(np.arange(32), np.arange(32), indexing="xy")
    uv_true = np.stack([(jj + 0.5) / 32, (ii + 0.5) / 32], -1)
    err = np.abs(uv_blend - uv_true)[cov]
    assert err.max() < 1e-4

    # values_to_uv: transfer per-vertex xyz; since mesh == uv layout (x=u, y=v)
    verts = jnp.asarray(v[None])
    posmap = gm.to_uv(verts)  # [1, 3, H, W]
    pos = np.asarray(posmap)[0]
    # x channel should track u
    scale = (vt[1, 0] - vt[0, 0]) / (v[1, 0] - v[0, 0])  # uv span / xyz span
    u_expected = (uv_true[..., 0] - vt[0, 0]) / scale
    assert np.abs(pos[0][cov] - u_expected[cov]).max() < 0.05


def test_vert_normals_flat_quad():
    v, vi, vt, vti = _quad_mesh()
    vn = ggeom.vert_normals(jnp.asarray(v[None]), jnp.asarray(vi))
    np.testing.assert_allclose(
        np.asarray(vn)[0], np.tile([0, 0, 1.0], (4, 1)), atol=1e-5
    )


def test_project_points_simple():
    K = jnp.asarray(np.array([[[100.0, 0, 50], [0, 100, 50], [0, 0, 1]]],
                             dtype=np.float32))
    Rt = jnp.asarray(np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None]
                     .astype(np.float32))
    p = jnp.asarray(np.array([[[0.0, 0, 2], [0.5, 0, 2]]], dtype=np.float32))
    pix, depth = ggeom.project_points(p, Rt, K)
    np.testing.assert_allclose(np.asarray(pix)[0, 0], [50, 50], atol=1e-5)
    np.testing.assert_allclose(np.asarray(pix)[0, 1], [75, 50], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth)[0], [2, 2], atol=1e-6)


def test_depth2normals_plane():
    depth = jnp.ones((1, 1, 16, 16), jnp.float32) * 2.0
    focal = jnp.asarray(np.array([[[100.0, 0], [0, 100.0]]], np.float32))
    princpt = jnp.asarray(np.array([[8.0, 8.0]], np.float32))
    n = ggeom.depth2normals(depth, focal, princpt)
    inner = np.asarray(n)[0, :, 4:-4, 4:-4]
    # flat depth plane -> normal points along -z
    assert np.abs(inner[2] + 1.0).max() < 1e-4


def test_seam_sampler_sparse_matches_dense():
    """SeamSampler.resample (sparse nonzero-weight formulation) vs the
    dense full-map grid_sample blend."""
    import numpy as np

    from goliath_tpu.utils import seams as sm

    rng = np.random.RandomState(0)
    H = 16
    uvs = rng.rand(H, H, 2).astype(np.float32)
    weights = np.zeros((1, H, H), np.float32)
    band = rng.rand(H, H) < 0.15
    weights[0, band] = rng.rand(band.sum()).astype(np.float32)
    data = {
        "dst_ij": np.zeros((1, 2), np.int64),
        "src_ij": np.zeros((1, 2), np.int64),
        "uvs": uvs,
        "weights": weights,
    }
    s = sm.SeamSampler(data)
    tex = jnp.asarray(rng.randn(2, 3, H, H).astype(np.float32))
    got = np.asarray(s.resample(tex))
    ref = np.asarray(sm.resample_tex(tex, jnp.asarray(uvs),
                                     jnp.asarray(weights)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _seam_fixture(rng, H=16, n_copy=6):
    """Seam data with a nonzero-weight band AND dst<-src copies, including
    DUPLICATE dst entries (scatter-set keeps the last occurrence)."""
    uvs = rng.rand(H, H, 2).astype(np.float32)
    weights = np.zeros((1, H, H), np.float32)
    band = rng.rand(H, H) < 0.15
    weights[0, band] = rng.rand(band.sum()).astype(np.float32)
    dst = rng.randint(0, H, (n_copy, 2)).astype(np.int64)
    dst[1] = dst[0]  # duplicate dst: last write wins
    src = rng.randint(0, H, (n_copy, 2)).astype(np.int64)
    return {"dst_ij": dst, "src_ij": src, "uvs": uvs, "weights": weights}


def test_seam_impaint_sparse_matches_dense():
    from goliath_tpu.utils import seams as sm

    rng = np.random.RandomState(1)
    data = _seam_fixture(rng)
    s = sm.SeamSampler(data)
    tex = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    got = np.asarray(s.impaint(tex))
    ref = np.asarray(sm.impaint_batch(
        tex, jnp.asarray(data["dst_ij"]), jnp.asarray(data["src_ij"])))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_seam_stage_grads_match_dense():
    """The hand-written ELL custom_vjp transposes (resample + impaint)
    vs jax.grad through the dense oracles (ADVICE r4 #1)."""
    from goliath_tpu.utils import seams as sm

    rng = np.random.RandomState(2)
    data = _seam_fixture(rng)
    s = sm.SeamSampler(data)
    tex = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32))
    uvs_j, w_j = jnp.asarray(data["uvs"]), jnp.asarray(data["weights"])
    dst_j, src_j = jnp.asarray(data["dst_ij"]), jnp.asarray(data["src_ij"])

    pairs = [
        (s.resample, lambda t: sm.resample_tex(t, uvs_j, w_j)),
        (s.impaint, lambda t: sm.impaint_batch(t, dst_j, src_j)),
        (lambda t: s(t),
         lambda t: sm.resample_tex(sm.impaint_batch(t, dst_j, src_j),
                                   uvs_j, w_j)),
    ]
    for sparse_fn, dense_fn in pairs:
        g_sp = jax.grad(lambda t: jnp.vdot(sparse_fn(t), cot))(tex)
        g_dn = jax.grad(lambda t: jnp.vdot(dense_fn(t), cot))(tex)
        np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_dn),
                                   rtol=1e-4, atol=1e-4)
