"""BodyDataset tests against a generated fake HEAD capture."""

import json
import os
import zipfile
from io import BytesIO

import numpy as np
import pytest

from goliath_tpu.utils.ply import load_ply, save_ply


def test_ply_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    v = rs.randn(17, 3).astype(np.float32)
    f = rs.randint(0, 17, (9, 3)).astype(np.int64)
    p = str(tmp_path / "m.ply")
    save_ply(p, v, f)
    v2, f2 = load_ply(p)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def _png_bytes(arr_chw: np.ndarray) -> bytes:
    from PIL import Image

    buf = BytesIO()
    Image.fromarray(arr_chw.transpose(1, 2, 0)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """Fake m--...--Head capture with 2 cameras x 4 frames."""
    import torch

    root = tmp_path_factory.mktemp("data") / "m--test--Head"
    root.mkdir()
    rs = np.random.RandomState(0)
    cams = ["400001", "400002"]
    frames = [10, 11, 12, 13]
    H = W = 32

    krt = {"KRT": [
        {"cameraId": c,
         "K": np.asarray([[100.0, 0, 0], [0, 100, 0], [16, 16, 1]]).tolist(),
         "T": np.eye(4).T.tolist()}
        for c in cams
    ]}
    with open(root / "camera_calibration.json", "w") as f:
        json.dump(krt, f)

    with open(root / "frame_splits_list.csv", "w") as f:
        f.write("frame,split\n")
        for fr in frames[:3]:
            f.write(f"{fr},train\n")
        f.write(f"{frames[3]},test\n")

    (root / "image").mkdir()
    (root / "segmentation_parts").mkdir()
    for c in cams:
        with zipfile.ZipFile(root / "image" / f"cam{c}.zip", "w") as zf:
            for fr in frames:
                img = rs.randint(0, 255, (3, H, W), np.uint8)
                # store png bytes under .avif name (PIL sniffs content)
                zf.writestr(f"cam{c}/{fr:06d}.avif", _png_bytes(img))
        with zipfile.ZipFile(
            root / "segmentation_parts" / f"cam{c}.zip", "w"
        ) as zf:
            for fr in frames:
                seg = rs.randint(0, 3, (1, H, W), np.uint8)[0]
                from PIL import Image

                buf = BytesIO()
                Image.fromarray(seg).save(buf, format="PNG")
                zf.writestr(f"cam{c}/{fr:06d}.png", buf.getvalue())

    kt = root / "kinematic_tracking"
    kt.mkdir()
    V = 12
    verts = rs.randn(V, 3).astype(np.float32)
    with zipfile.ZipFile(kt / "registration_vertices.zip", "w") as zf:
        for fr in frames:
            import tempfile

            tmp = tempfile.mktemp(suffix=".ply")
            save_ply(tmp, verts + 0.01 * fr)
            zf.write(tmp, f"registration_vertices/{fr:06d}.ply")
            os.unlink(tmp)
    np.save(kt / "registration_vertices_mean.npy", verts)
    (kt / "registration_vertices_variance.txt").write_text("2.5")

    hp = root / "head_pose"
    hp.mkdir()
    with zipfile.ZipFile(hp / "head_pose.zip", "w") as zf:
        pose34 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
        txt = "\n".join(" ".join(str(x) for x in row) for row in pose34)
        for fr in frames:
            zf.writestr(f"{fr:06d}.txt", txt)

    uv = root / "uv_image"
    uv.mkdir()
    from PIL import Image

    Image.fromarray(
        rs.randint(0, 255, (16, 16, 3), np.uint8)
    ).save(uv / "color_mean.png")
    (uv / "color_variance.txt").write_text("64.0")
    with zipfile.ZipFile(uv / "color.zip", "w") as zf:
        for fr in frames:
            zf.writestr(f"color/{fr:06d}.png", _png_bytes(
                rs.randint(0, 255, (3, 16, 16), np.uint8)))

    lights = root / "lights"
    lights.mkdir()
    # frames alternate fully lit (pattern 0) and 5-light OLAT (pattern 1)
    with open(lights / "light_pattern_per_frame.json", "w") as f:
        json.dump([[fr, fr % 2] for fr in frames], f)
    with open(lights / "light_pattern_metadata.json", "w") as f:
        json.dump({
            "light_positions": rs.randn(8, 3).tolist(),
            "light_patterns": [
                {"light_index_durations": [[0, 5555]]},
                {"light_index_durations": [[i, 5555] for i in range(1, 6)]},
            ],
        }, f)

    pvb = root / "per_view_background"
    pvb.mkdir()
    with zipfile.ZipFile(pvb / "per_view_background.zip", "w") as zf:
        for c in cams:
            zf.writestr(f"{c}.png", _png_bytes(
                rs.randint(0, 255, (3, H, W), np.uint8)))

    shared = tmp_path_factory.mktemp("shared") / "static_assets_head.pt"
    torch.save({
        "topology": {
            "v": torch.from_numpy(verts),
            "vi": torch.zeros(4, 3, dtype=torch.long),
            "vt": torch.rand(V, 2),
            "vti": torch.zeros(4, 3, dtype=torch.long),
        },
    }, shared)
    return str(root), str(shared)


def test_body_dataset_head(capture):
    from goliath_tpu.data.dataloader import BodyDataset
    from goliath_tpu.data.pipeline import collate

    root, shared = capture
    ds = BodyDataset(root_path=root, shared_assets_path=shared,
                     split="train", fully_lit_only=True)
    assert len(ds.get_camera_list()) == 2
    # fully lit frames in train split: frames 10 and 12 (pattern 0)
    assert set(ds.get_frame_list(fully_lit_only=True)) == {10, 12}
    # partially lit: frame 11 (5-light pattern)
    assert set(ds.get_frame_list(partially_lit_only=True)) == {11}

    sample = ds[0]
    assert sample is not None
    assert sample["image"].shape == (3, 32, 32)
    assert sample["registration_vertices"].shape == (12, 3)
    assert sample["head_pose"].shape == (3, 4)
    assert sample["n_lights"] == 1
    assert sample["light_pos"].shape == (8, 3)
    assert "camera_idx" in sample

    # ds=2 intrinsics downscale (reference dataloader.py:149-169)
    K = sample["K"]
    assert abs(K[0, 0] - 50.0) < 1e-5

    assets = ds.static_assets
    assert "topology" in assets and assets.color_mean.shape[0] == 3
    assert assets.verts_var == 2.5

    batch = collate([ds[0], ds[1]])
    out = ds.batch_filter(batch)
    assert out["image"].max() <= 1.0 and out["image"].dtype == np.float32

    # test split has only frame 13 (not fully lit -> empty under the filter)
    ds_test = BodyDataset(root_path=root, shared_assets_path=shared,
                          split="test", fully_lit_only=False)
    assert set(ds_test.get_frame_list()) == {13}
