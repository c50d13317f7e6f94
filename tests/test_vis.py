"""Viz-tail helpers (utils/vis.py) vs reference semantics
(ca_code/utils/image.py:435-1030)."""

import numpy as np
import jax.numpy as jnp

from goliath_tpu.utils import vis


def test_kpts2heatmap_peaks_at_keypoint():
    kpts = jnp.asarray([[[5.0, 9.0], [2.0, 3.0]]])  # [1, 2, 2] (x, y)
    hm = np.asarray(vis.kpts2heatmap(kpts, (16, 12), sigma=2))
    assert hm.shape == (1, 2, 16, 12)
    # peak at (y, x) = (9, 5) for kpt 0 and (3, 2) for kpt 1
    assert np.unravel_index(hm[0, 0].argmax(), hm[0, 0].shape) == (9, 5)
    assert np.unravel_index(hm[0, 1].argmax(), hm[0, 1].shape) == (3, 2)
    np.testing.assert_allclose(hm[0, 0, 9, 5], 1.0, atol=1e-6)
    # exact gaussian falloff one texel away
    np.testing.assert_allclose(hm[0, 0, 9, 6], np.exp(-1 / 8), atol=1e-6)


def test_kpts2delta_vectors():
    kpts = jnp.asarray([[[3.0, 1.0]]])
    d = np.asarray(vis.kpts2delta(kpts, (4, 6)))  # [1, 1, 4, 6, 2]
    np.testing.assert_allclose(d[0, 0, 0, 0], [3.0, 1.0])
    np.testing.assert_allclose(d[0, 0, 1, 3], [0.0, 0.0])


def test_jet_colormap_endpoints():
    cm = vis.get_color_map()
    assert cm.shape == (256, 3)
    assert cm[0, 2] > 127 and cm[0, 0] == 0      # low end: blue
    assert cm[255, 0] > 127 and cm[255, 2] == 0  # high end: red
    assert cm[128, 1] > 200                      # middle: green


def test_tensor2rgbjet_range():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    rgb = vis.tensor2rgbjet(x)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8


def test_draw_keypoints_additive_disc():
    img = np.zeros((32, 32, 3), np.float32)
    kpt = np.array([[10.0, 12.0, 1.0]])
    out = vis.draw_keypoints(img, kpt, kpt_w=1.0)
    assert out[12, 10, 1] == 255.0  # green center
    assert out[12, 10, 0] == 0.0    # clipped negative red
    assert out[12, 12, 1] == 255.0  # radius-2 disc extent
    assert out[12, 13, 1] == 0.0    # outside the disc


def test_draw_keypoints_with_color_overlap():
    img = np.full((16, 16, 3), 10, np.uint8)
    kpts = np.array([[5.0, 5.0, 1.0], [5.0, 5.0, 1.0]])  # overlapping
    out = vis.draw_keypoints_with_color(img, kpts, (0.0, 200.0, 0.0))
    assert out.dtype == np.uint8
    assert out[5, 5, 1] == 210  # overlay set (not doubled), then added once


def test_draw_contour_and_line_bounds():
    img = np.zeros((20, 20, 3), np.float32)
    corrs = np.array([[0.0, 4.0, 4.0, 15.0, 15.0]])
    out = vis.draw_contour(img, corrs)
    # line overwrites the disc center (cv2 set semantics); the disc's
    # radius-1 extent survives
    assert out[4, 5, 0] == 255.0          # mesh point red (disc extent)
    assert out[4, 4, 2] == 255.0          # line start overwrote the center
    assert out[10, 10, 2] == 255.0        # line passes the diagonal (blue)
    # out-of-bounds line endpoints must not crash
    vis._draw_line(img, (-5, -5), (40, 3), (0, 0, 255.0))


def test_process_depth_and_scalar_viz():
    d = np.array([[0.5, 2.0], [-1.0, 0.0]], np.float32)
    clean, err = vis.process_depth_image(d, depth_max=1.0, depth_err_range=2.0)
    np.testing.assert_allclose(clean, [[0.5, 0.0], [0.0, 0.0]])
    np.testing.assert_allclose(err, [[0.0, 1.0], [0.5, 0.0]])
    rgb = vis.visualize_scalar_image(d, 0.0, 1.0)
    assert rgb.shape == (2, 2, 3)


def test_feature2rgb_and_resize():
    x = np.random.RandomState(0).rand(1, 8, 6, 6).astype(np.float32)
    rgb = vis.feature2rgb(x, scale=2)
    assert rgb.shape == (12, 12, 3)
    r = vis.resize_to_match(rgb, (6, 18))
    assert r.shape == (6, 18, 3)
