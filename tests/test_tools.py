"""Tools tests: bucket selection, resize transforms, PLY round-trip."""

import numpy as np
import pytest

from must3r_tpu.tools.image import (
    RATIOS_RESOLUTIONS,
    denormalize_image,
    get_hw_resolution,
    get_resize_function,
    normalize_image,
    preprocess_frame,
    preprocess_image,
    to_landscape,
)
from must3r_tpu.tools.ply import load_ply, save_ply


def test_bucket_table_matches_reference():
    assert get_hw_resolution(480, 640, 512) == (384, 512)     # 4:3
    assert get_hw_resolution(640, 480, 512) == (512, 384)     # portrait
    assert get_hw_resolution(1080, 1920, 512) == (288, 512)   # 16:9
    assert get_hw_resolution(224, 224, 224) == (224, 224)
    assert get_hw_resolution(100, 320, 512) == (160, 512)     # 16:5
    for maxdim, tbl in RATIOS_RESOLUTIONS.items():
        for long_side, short_side in tbl.values():
            assert long_side == maxdim
            assert long_side % 16 == 0 and short_side % 16 == 0


def test_resize_transform_roundtrip(rng):
    h, w = 480, 640
    fn, to_rescaled, to_orig = get_resize_function(512, 16, h, w)
    # matrices are inverse maps of each other
    np.testing.assert_allclose(to_rescaled @ to_orig, np.eye(3), atol=1e-9)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    out = fn(img)
    assert out.shape == (384, 512, 3)
    # center pixel maps to center pixel
    c = to_orig @ np.array([256.0, 192.0, 1.0])
    np.testing.assert_allclose(c[:2], [320.0, 240.0], atol=1.0)


def test_preprocess_image_portrait(rng):
    img = (rng.random((640, 480, 3)) * 255).astype(np.uint8)
    v = preprocess_image(img, 512)
    assert v["portrait"] is True
    assert v["true_shape"] == (512, 384)     # bucketed portrait shape
    assert v["img"].shape == (384, 512, 3)   # stored landscape
    assert v["img"].dtype == np.float32


def test_preprocess_frame_slam(rng):
    img = (rng.random((720, 1280, 3)) * 255).astype(np.uint8)
    v = preprocess_frame(img, 512)
    ch, cw = v["true_shape"]
    assert cw == 512 and ch % 16 == 0
    assert v["img"].shape == (ch, cw, 3)
    v2 = preprocess_frame(img, 224, square=True)
    assert v2["true_shape"][0] == v2["true_shape"][1]


def test_normalize_roundtrip(rng):
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    back = denormalize_image(normalize_image(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    col = (rng.random((100, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    save_ply(p, pts, col)
    pts2, col2 = load_ply(p)
    np.testing.assert_array_equal(pts2, pts)
    np.testing.assert_array_equal(col2, col)


def test_ply_no_colors(tmp_path, rng):
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    save_ply(p, pts)
    pts2, col2 = load_ply(p)
    np.testing.assert_array_equal(pts2, pts)
    assert col2 is None


def test_load_image_truncated_jpeg(tmp_path, rng):
    """A JPEG with its tail cut off must still load (intact prefix) instead
    of raising -- crawled-dataset robustness (load_image OSError retry)."""
    from PIL import Image

    from must3r_tpu.tools.image import load_image

    arr = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    p = tmp_path / "full.jpg"
    Image.fromarray(arr).save(p, quality=92)
    data = p.read_bytes()
    q = tmp_path / "trunc.jpg"
    q.write_bytes(data[: int(len(data) * 0.7)])

    out = load_image(str(q))
    assert out.shape == (96, 128, 3)
    assert out.dtype == np.uint8
    # the intact prefix should decode to (roughly) the same upper rows
    full = load_image(str(p))
    top_err = np.abs(out[:32].astype(int) - full[:32].astype(int)).mean()
    assert top_err < 16.0
