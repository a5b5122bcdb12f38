"""Real-data-arrival robustness for the host image/depth loaders.

The dust3r-layout readers (reference must3r/datasets/co3d.py:15-86,
scannetpp.py:15-57) and the dust3r `utils.image` surface will face crawled
and camera-produced files: EXIF-rotated JPEGs, grayscale/CMYK color
spaces, palette PNGs, 16-bit depth PNGs, zero-byte and truncated files.
These property tests run the loaders over each of those shapes so the
first real Co3d/ScanNet++/TUM download does not become the first test.
"""

import numpy as np
import pytest
from PIL import Image

from must3r_tpu.tools.image import load_image, preprocess_image


def _gradient(hw=(96, 128)):
    """An asymmetric uint8 test card: any unintended rotation/transpose
    changes it detectably (unlike random noise under JPEG loss)."""
    h, w = hw
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    img = np.stack([np.broadcast_to(y, (h, w)),
                    np.broadcast_to(x, (h, w)),
                    np.full((h, w), 128, np.float32)], axis=-1)
    img[: h // 4, : w // 4] = 255.0   # corner marker
    return img.astype(np.uint8)


@pytest.mark.parametrize("orientation,rot", [(3, 2), (6, 3), (8, 1)])
def test_load_image_exif_rotation(tmp_path, orientation, rot):
    """EXIF orientation tags must be applied: the camera writes the sensor
    array + a tag, load_image must return upright pixels (else portrait
    phone captures reconstruct sideways)."""
    upright = _gradient()
    # what the camera stores: upright rotated *backwards* by the tag
    stored = np.rot90(upright, k=4 - rot)
    exif = Image.Exif()
    exif[0x0112] = orientation
    p = tmp_path / f"exif{orientation}.jpg"
    Image.fromarray(stored).save(p, quality=95, exif=exif)

    out = load_image(str(p))
    assert out.shape == upright.shape
    err = np.abs(out.astype(int) - upright.astype(int)).mean()
    assert err < 8.0, f"orientation {orientation} not undone (err {err})"


@pytest.mark.parametrize("mode,fmt", [("L", "jpg"), ("P", "png"),
                                      ("LA", "png"), ("I;16", "png"),
                                      ("CMYK", "jpg")])
def test_load_image_color_modes(tmp_path, mode, fmt):
    """Grayscale / palette / gray+alpha / 16-bit / CMYK files must all come
    back as (H, W, 3) uint8 RGB."""
    h, w = 40, 56
    if mode == "I;16":
        pil = Image.fromarray((np.linspace(0, 65535, h * w)
                               .reshape(h, w)).astype(np.uint16))
    else:
        pil = Image.fromarray(_gradient((h, w))).convert(mode)
    p = tmp_path / f"m.{fmt}"
    pil.save(p)

    out = load_image(str(p))
    assert out.shape == (h, w, 3)
    assert out.dtype == np.uint8
    assert out.std() > 0   # not a constant image


def test_load_image_zero_byte_and_garbage(tmp_path):
    """Unreadable files must raise a clean OSError (callers skip the view)
    and must NOT leave PIL's process-global truncated mode flipped on."""
    from PIL import ImageFile

    empty = tmp_path / "zero.jpg"
    empty.write_bytes(b"")
    garbage = tmp_path / "garbage.jpg"
    garbage.write_bytes(b"not an image at all" * 10)

    for p in (empty, garbage):
        with pytest.raises(OSError):
            load_image(str(p))
        assert ImageFile.LOAD_TRUNCATED_IMAGES is False


def test_load_image_header_only_jpeg(tmp_path):
    """A JPEG cut inside the entropy stream right after the header: the
    truncated-mode retry must return an image of the declared size rather
    than raising."""
    full = tmp_path / "full.jpg"
    Image.fromarray(_gradient()).save(full, quality=92)
    data = full.read_bytes()
    cut = tmp_path / "cut.jpg"
    cut.write_bytes(data[: 700])   # header + a sliver of scan data

    out = load_image(str(cut))
    assert out.shape == (96, 128, 3)


def test_preprocess_portrait_all_buckets():
    """Portrait inputs through every bucket table: stored landscape, true
    shape ×16-aligned, portrait flag set (head transpose relies on it)."""
    for maxdim in (224, 512):
        for h, w in [(640, 480), (1920, 1080), (500, 300), (224, 100)]:
            v = preprocess_image(_gradient((h, w)), maxdim)
            ch, cw = v["true_shape"]
            assert v["portrait"] is (ch > cw)
            assert ch % 16 == 0 and cw % 16 == 0
            sh, sw = v["img"].shape[:2]
            assert (sh, sw) == ((cw, ch) if v["portrait"] else (ch, cw))


def test_depth_png_16bit_roundtrip(tmp_path):
    """16-bit depth PNGs (the Co3d/ScanNet++ on-disk format) must preserve
    the full uint16 range through _read_depth_png."""
    cv2 = pytest.importorskip("cv2")
    from must3r_tpu.datasets.dust3r_layout import _read_depth_png

    d = np.asarray([[0, 1, 255], [256, 30000, 65535]], np.uint16)
    p = tmp_path / "d.png"
    assert cv2.imwrite(str(p), d)
    out = _read_depth_png(str(p))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, d.astype(np.float32))


def test_depth_png_corrupt_returns_none(tmp_path):
    """Zero-byte / garbage depth files: reader must signal 'skip view'
    (None), not crash (the Co3d invalid-view cache consumes this)."""
    pytest.importorskip("cv2")
    from must3r_tpu.datasets.dust3r_layout import _read_depth_png

    p = tmp_path / "bad.png"
    p.write_bytes(b"")
    assert _read_depth_png(str(p)) is None
    p.write_bytes(b"\x89PNG\r\n\x1a\nbroken")
    assert _read_depth_png(str(p)) is None


def test_co3d_skips_corrupt_views(tmp_path, rng):
    """A Co3d instance with one unreadable image and one corrupt depth must
    still yield full tuples (the tuple maker falls back to valid frames and
    the invalid cache remembers)."""
    cv2 = pytest.importorskip("cv2")
    import json

    from must3r_tpu.datasets import Co3dPreprocessed

    root = tmp_path / "co3d"
    root.mkdir()
    ids = list(range(5))
    with open(root / "selected_seqs_train.json", "w") as f:
        json.dump({"chair": {"c1": ids}}, f)
    base = root / "chair" / "c1"
    for sub in ("images", "depths", "masks"):
        (base / sub).mkdir(parents=True)
    k = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    for i in ids:
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(base / "images" / f"frame{i:06d}.jpg"),
                    img[..., ::-1])
        np.savez(str(base / "images" / f"frame{i:06d}.npz"),
                 camera_pose=np.eye(4, dtype=np.float32),
                 camera_intrinsics=k, maximum_depth=np.float32(4.0))
        d = (rng.random((48, 64)) * 30000 + 2000).astype(np.uint16)
        cv2.imwrite(str(base / "depths" / f"frame{i:06d}.jpg.geometric.png"),
                    d)
        cv2.imwrite(str(base / "masks" / f"frame{i:06d}.png"),
                    np.full((48, 64), 255, np.uint8))
    # corrupt frame 1's image and frame 2's depth
    (base / "images" / "frame000001.jpg").write_bytes(b"")
    (base / "depths" / "frame000002.jpg.geometric.png").write_bytes(b"junk")

    ds = Co3dPreprocessed(str(root), num_views=3, resolutions=((64, 48),),
                          epoch_size=4)
    for idx in range(4):
        views = ds[(idx, 0, 2)]
        assert len(views) == 3
        for v in views:
            assert v["img"].shape == (48, 64, 3)
            assert np.isfinite(v["pts3d"]).all()
