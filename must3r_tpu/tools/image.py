"""Host-side image preprocessing: aspect buckets, resize transforms, loading.

Parity target: reference `must3r/tools/image.py` (bucket table
`ratios_resolutions`, `get_HW_resolution`, `get_resize_function` with its
forward/backward 3x3 pixel-coordinate transforms) and the dust3r helpers the
reference imports (`load_images`-style bucketed loading, `ImgNorm` 0.5/0.5
normalization, `slam/model.py:99-120` frame preprocessing).

This is host code (numpy + PIL/cv2); the static bucket table is what bounds
the number of compiled TPU executables -- every image maps to one of these
shapes before it ever reaches the device.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import threading

import numpy as np
import PIL.Image
import PIL.ImageOps

_TRUNCATED_RETRY_LOCK = threading.Lock()

# reference tools/image.py:17-24 -- one dict per max dimension; keys are
# landscape aspect ratios, values are [long, short] resolutions
RATIOS_RESOLUTIONS: Dict[int, Dict[float, Tuple[int, int]]] = {
    224: {1.0: (224, 224)},
    336: {1.0: (336, 336)},
    384: {4 / 3: (384, 288), 3 / 2: (384, 256), 2 / 1: (384, 192),
          3 / 1: (384, 128)},
    448: {1.0: (448, 448)},
    512: {4 / 3: (512, 384), 32 / 21: (512, 336), 16 / 9: (512, 288),
          2 / 1: (512, 256), 16 / 5: (512, 160)},
    768: {4 / 3: (768, 576), 3 / 2: (768, 512), 16 / 9: (768, 432),
          2 / 1: (768, 384), 16 / 5: (768, 240)},
}

IMG_MEAN = 0.5
IMG_STD = 0.5


def resolution_table(maxdim, patch_size: int = 16):
    """Bucket table for a max dimension; falls back to buckets derived from
    the 512-table ratios for sizes outside the reference table."""
    if isinstance(maxdim, dict):
        return maxdim
    if maxdim in RATIOS_RESOLUTIONS:
        return RATIOS_RESOLUTIONS[maxdim]
    assert maxdim % patch_size == 0, maxdim
    out = {}
    for r in (1.0, *RATIOS_RESOLUTIONS[512].keys()):
        short = round(maxdim / r / patch_size) * patch_size
        if short >= patch_size:
            out[maxdim / short] = (maxdim, short)
    return out


def get_hw_resolution(h: int, w: int, maxdim, patch_size: int = 16
                      ) -> Tuple[int, int]:
    """Pick the bucket resolution for an image: nearest aspect ratio in the
    maxdim table; portrait images use the transposed buckets. Returns (H, W).
    """
    table = resolution_table(maxdim, patch_size)
    ratio = w / h
    keys = np.array(list(table.keys()))
    landscape = w >= h
    diff = np.abs(ratio - keys) if landscape else np.abs(ratio - 1.0 / keys)
    long_side, short_side = table[float(keys[np.argmin(diff)])]
    assert long_side % patch_size == 0 and short_side % patch_size == 0
    return (short_side, long_side) if landscape else (long_side, short_side)


def get_resize_function(maxdim, patch_size: int, h: int, w: int,
                        is_mask: bool = False):
    """Center-crop to the target aspect then resize to the bucket.

    Returns (fn, to_rescaled, to_orig): fn maps an [H, W, C] numpy image to
    the bucket shape; the 3x3 matrices map homogeneous pixel coordinates
    original->rescaled and back (reference tools/image.py:56-93).
    """
    table = resolution_table(maxdim, patch_size)
    if (max(h, w), min(h, w)) in {tuple(v) for v in table.values()}:
        return (lambda x: x), np.eye(3), np.eye(3)

    th, tw = get_hw_resolution(h, w, maxdim, patch_size)
    ratio = w / h
    target_ratio = tw / th
    to_orig_crop = np.eye(3)
    to_rescaled_crop = np.eye(3)
    if abs(ratio - target_ratio) < np.finfo(np.float32).eps:
        crop_w, crop_h = w, h
    elif ratio < target_ratio:
        crop_w = w
        crop_h = int(w / target_ratio)
        to_orig_crop[1, 2] = (h - crop_h) / 2.0
        to_rescaled_crop[1, 2] = -(h - crop_h) / 2.0
    else:
        crop_w = int(h * target_ratio)
        crop_h = h
        to_orig_crop[0, 2] = (w - crop_w) / 2.0
        to_rescaled_crop[0, 2] = -(w - crop_w) / 2.0

    to_orig_resize = np.diag([crop_w / tw, crop_h / th, 1.0])
    to_rescaled_resize = np.diag([tw / crop_w, th / crop_h, 1.0])

    def fn(img: np.ndarray) -> np.ndarray:
        ih, iw = img.shape[:2]
        y0 = (ih - crop_h) // 2
        x0 = (iw - crop_w) // 2
        img = img[y0:y0 + crop_h, x0:x0 + crop_w]
        return resize_image(img, (th, tw), nearest=is_mask)

    return fn, to_rescaled_resize @ to_rescaled_crop, \
        to_orig_crop @ to_orig_resize


def resize_image(img: np.ndarray, hw: Tuple[int, int],
                 nearest: bool = False) -> np.ndarray:
    """Resize an [H, W, C] (or [H, W]) numpy image; antialiased bilinear for
    photos, nearest for masks."""
    import cv2

    th, tw = hw
    if img.shape[:2] == (th, tw):
        return img
    if nearest:
        interp = cv2.INTER_NEAREST
    elif th < img.shape[0]:
        interp = cv2.INTER_AREA
    else:
        interp = cv2.INTER_LINEAR
    return cv2.resize(img, (tw, th), interpolation=interp)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] -> float32 normalized (dust3r ImgNorm: mean=std=0.5)."""
    return (img.astype(np.float32) / 255.0 - IMG_MEAN) / IMG_STD


def denormalize_image(img: np.ndarray) -> np.ndarray:
    return np.clip((img * IMG_STD + IMG_MEAN) * 255.0, 0, 255
                   ).astype(np.uint8)


def _rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    """float [..., 3] in [0, 1] -> HSV with h in [0, 1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    rng = maxc - minc
    s = np.where(maxc > 0, rng / np.maximum(maxc, 1e-12), 0.0)
    safe = np.maximum(rng, 1e-12)
    rc, gc, bc = (maxc - r) / safe, (maxc - g) / safe, (maxc - b) / safe
    h = np.where(maxc == r, bc - gc,
                 np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return np.stack([h, s, v], -1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    choices = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1),
        np.stack([p, v, t], -1), np.stack([p, q, v], -1),
        np.stack([t, p, v], -1), np.stack([v, p, q], -1)])
    return np.take_along_axis(choices, i[None, ..., None],
                              axis=0)[0]


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.5, contrast: float = 0.5,
                 saturation: float = 0.5, hue: float = 0.1) -> np.ndarray:
    """torchvision `ColorJitter(0.5, 0.5, 0.5, 0.1)` equivalent, numpy.

    The reference training transform is `ColorJitter + ImgNorm`
    (reference must3r/datasets/__init__.py:3, recipe README.md:242).
    Factors are drawn uniformly (brightness/contrast/saturation from
    [max(0, 1-x), 1+x], hue shift from [-hue, hue]) and applied in a
    random order, matching torchvision semantics. uint8 in, uint8 out.
    """
    x = img.astype(np.float32) / 255.0

    def adj_brightness(x, f):
        return x * f

    def adj_contrast(x, f):
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        mean = gray.mean()
        return f * x + (1.0 - f) * mean

    def adj_saturation(x, f):
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]
        return f * x + (1.0 - f) * gray

    def adj_hue(x, d):
        hsv = _rgb_to_hsv(np.clip(x, 0.0, 1.0))
        hsv[..., 0] = (hsv[..., 0] + d) % 1.0
        return _hsv_to_rgb(hsv)

    ops = []
    if brightness > 0:
        ops.append((adj_brightness,
                    rng.uniform(max(0.0, 1 - brightness), 1 + brightness)))
    if contrast > 0:
        ops.append((adj_contrast,
                    rng.uniform(max(0.0, 1 - contrast), 1 + contrast)))
    if saturation > 0:
        ops.append((adj_saturation,
                    rng.uniform(max(0.0, 1 - saturation), 1 + saturation)))
    if hue > 0:
        ops.append((adj_hue, rng.uniform(-hue, hue)))
    for k in rng.permutation(len(ops)):
        fn, f = ops[k]
        x = np.clip(fn(x, f), 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8)


def resolve_transform(name):
    """Map a reference transform spec to a callable
    `(uint8 img, np.random.Generator) -> uint8 img` applied before
    ImgNorm; None = ImgNorm only (the reference default)."""
    if name is None or callable(name):
        return name
    key = str(name).lower().replace("+imgnorm", "")
    if key in ("", "imgnorm"):
        return None
    if key == "colorjitter":
        return color_jitter
    raise ValueError(f"unknown transform {name!r}")


def to_landscape(img: np.ndarray) -> Tuple[np.ndarray, bool]:
    """Store portrait images transposed (the network always sees W >= H;
    the head transposes predictions back)."""
    h, w = img.shape[:2]
    if h > w:
        return np.swapaxes(img, 0, 1), True
    return img, False


def preprocess_image(img: np.ndarray, maxdim, patch_size: int = 16):
    """Full pipeline for one image: bucket resize + normalize + landscape
    storage.

    Returns dict: 'img' float32 [Hb, Wb, 3] (landscape), 'true_shape'
    (H, W) of the *bucketed* image before transposition, 'portrait' bool,
    'to_orig' 3x3 (bucket pixel -> original pixel).
    """
    h, w = img.shape[:2]
    fn, to_rescaled, to_orig = get_resize_function(maxdim, patch_size, h, w)
    out = fn(img)
    out = normalize_image(out)
    true_shape = out.shape[:2]
    out, portrait = to_landscape(out)
    return {"img": out, "true_shape": true_shape, "portrait": portrait,
            "to_orig": to_orig, "to_rescaled": to_rescaled}


def preprocess_frame(img: np.ndarray, res: int, patch_size: int = 16,
                     square: bool = False, normalize: bool = True):
    """SLAM-style preprocessing (reference slam/model.py:99-120): resize the
    long side to `res`, center-crop each side down to a multiple of the
    patch size (or to a square for 224-class models).

    normalize=False keeps uint8 pixels: streaming loops upload the frame
    4x smaller and normalize on-device (ImgNorm is trivially fused)."""
    h, w = img.shape[:2]
    scale = res / max(h, w)
    nh, nw = round(h * scale), round(w * scale)
    img = resize_image(img, (nh, nw))
    if square:
        s = min(nh, nw) // patch_size * patch_size
        ch, cw = s, s
    else:
        ch = nh // patch_size * patch_size
        cw = nw // patch_size * patch_size
    y0 = (nh - ch) // 2
    x0 = (nw - cw) // 2
    img = img[y0:y0 + ch, x0:x0 + cw]
    if normalize and img.dtype == np.uint8:
        img = normalize_image(img)
    stored, portrait = to_landscape(img)
    return {"img": stored, "true_shape": (ch, cw), "portrait": portrait}


def load_image(path: str) -> np.ndarray:
    """Read an image file to RGB uint8 (EXIF-transposed).

    Tolerates truncated files (common in crawled datasets): on a decode
    OSError, retries once with PIL's truncated-image mode so the intact
    prefix still loads instead of killing a whole reconstruction run.
    """
    try:
        with PIL.Image.open(path) as pil:
            pil = PIL.ImageOps.exif_transpose(pil)
            return np.asarray(pil.convert("RGB"))
    except OSError:
        from PIL import ImageFile

        # LOAD_TRUNCATED_IMAGES is process-global; dataset __getitem__
        # runs on loader threads, so serialize the flip (two concurrent
        # retries would otherwise race the restore and either re-raise or
        # leave truncated mode on for every later load)
        with _TRUNCATED_RETRY_LOCK:
            prev = ImageFile.LOAD_TRUNCATED_IMAGES
            ImageFile.LOAD_TRUNCATED_IMAGES = True
            try:
                with PIL.Image.open(path) as pil:
                    pil = PIL.ImageOps.exif_transpose(pil)
                    return np.asarray(pil.convert("RGB"))
            finally:
                ImageFile.LOAD_TRUNCATED_IMAGES = prev


def load_images(paths: Sequence[str], maxdim, patch_size: int = 16,
                verbose: bool = False) -> List[dict]:
    """Load + preprocess an image collection (dust3r `load_images` parity).

    Each entry carries 'img', 'true_shape', 'portrait', 'to_orig', 'path'.
    """
    views = []
    for p in paths:
        img = load_image(p)
        view = preprocess_image(img, maxdim, patch_size)
        view["path"] = p
        views.append(view)
        if verbose:
            print(f"loaded {p} -> {view['img'].shape}")
    return views


def list_images(folder: str) -> List[str]:
    """Sorted list of loadable image files in a folder (PIL-extension
    check, reference tools/image.py:96-118)."""
    exts = PIL.Image.registered_extensions()
    out = []
    for name in sorted(os.listdir(folder)):
        if os.path.splitext(name)[1].lower() in exts:
            out.append(os.path.join(folder, name))
    return out

