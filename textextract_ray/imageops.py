"""Vectorized pixel-level image preprocessing (pure numpy, no PIL).

The reference preprocesses every image before OCR with PIL's
ImageEnhance ladder — contrast 1.5, sharpness 1.2, brightness 1.1
(reference src/ocr.py:43-60). This module reimplements those public
PIL semantics as numpy kernels so the actor-pool stage
(stages.multimodal.PreprocessImage) can decode → enhance → re-encode
real PNG payloads with only the stdlib codec (textextract_ray.png).

Semantics (documented; PIL-equivalent up to rounding mode, which is
pinned here as round-half-to-even via np.rint and clip to [0, 255]):

- ``to_rgb``: grayscale replicates to 3 channels; alpha channels are
  dropped (PIL's ``convert("RGB")`` on RGBA/LA discards alpha).
- ``enhance_contrast(px, f)``: degenerate image = solid grey at the
  rounded mean of the ITU-R 601-2 luma transform
  L = (299 R + 587 G + 114 B) / 1000 (what PIL's ``convert("L")`` +
  ``ImageStat.mean`` computes); output = degenerate + f·(px − degenerate).
- ``enhance_sharpness(px, f)``: degenerate = PIL ``ImageFilter.SMOOTH``
  (3×3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13) applied to the interior,
  border rows/columns left unchanged (PIL leaves the 1-pixel border
  unfiltered); output = degenerate + f·(px − degenerate).
- ``enhance_brightness(px, f)``: output = f·px (degenerate = black).

Every kernel is whole-array numpy — no per-pixel Python loops; the
3×3 smooth is a sum of 9 shifted views.
"""

from __future__ import annotations

import numpy as np

# the reference's enhancement ladder, reference src/ocr.py:43-60
PREPROCESS_CONTRAST = 1.5
PREPROCESS_SHARPNESS = 1.2
PREPROCESS_BRIGHTNESS = 1.1


def to_rgb(px: np.ndarray) -> np.ndarray:
    """(h, w) gray / (h, w, 2) gray+alpha / (h, w, 3) RGB /
    (h, w, 4) RGBA → (h, w, 3) uint8 RGB."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        return np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim == 3 and px.shape[2] == 2:  # LA: replicate luma, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    if px.ndim == 3 and px.shape[2] == 3:
        return px
    if px.ndim == 3 and px.shape[2] == 4:  # RGBA: drop alpha
        return np.ascontiguousarray(px[:, :, :3])
    raise ValueError(f"unsupported pixel shape {px.shape}")


def _blend(degenerate: np.ndarray, image: np.ndarray, factor: float) -> np.ndarray:
    """out = degenerate + factor · (image − degenerate), rounded and
    clipped to uint8 — PIL's Image.blend contract."""
    out = degenerate + factor * (image.astype(np.float64) - degenerate)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def luma(px: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 luma (PIL convert("L") transform) as float64."""
    rgb = to_rgb(px).astype(np.float64)
    return (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) / 1000.0


def enhance_contrast(px: np.ndarray, factor: float) -> np.ndarray:
    rgb = to_rgb(px)
    mean = float(np.rint(luma(rgb).mean())) if rgb.size else 0.0
    return _blend(np.float64(mean), rgb, factor)


def _smooth(rgb: np.ndarray) -> np.ndarray:
    """PIL ImageFilter.SMOOTH: 3×3 [[1,1,1],[1,5,1],[1,1,1]]/13 over
    the interior; the 1-pixel border stays the original (PIL does not
    filter pixels where the kernel falls off the image)."""
    f = rgb.astype(np.float64)
    out = f.copy()
    if rgb.shape[0] < 3 or rgb.shape[1] < 3:
        return out
    acc = 5.0 * f[1:-1, 1:-1]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc += f[1 + dy : f.shape[0] - 1 + dy, 1 + dx : f.shape[1] - 1 + dx]
    out[1:-1, 1:-1] = acc / 13.0
    return out


def enhance_sharpness(px: np.ndarray, factor: float) -> np.ndarray:
    rgb = to_rgb(px)
    return _blend(_smooth(rgb), rgb, factor)


def enhance_brightness(px: np.ndarray, factor: float) -> np.ndarray:
    return _blend(np.float64(0.0), to_rgb(px), factor)


def preprocess_pixels(px: np.ndarray) -> np.ndarray:
    """The reference's full OCR preprocessing ladder (in its order:
    contrast, then sharpness, then brightness — src/ocr.py:43-60) over
    any supported uint8 pixel layout; returns (h, w, 3) RGB uint8."""
    out = enhance_contrast(px, PREPROCESS_CONTRAST)
    out = enhance_sharpness(out, PREPROCESS_SHARPNESS)
    return enhance_brightness(out, PREPROCESS_BRIGHTNESS)


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with half-pixel-center sampling and edge clamp
    (the torchvision/OpenCV ``align_corners=False`` convention):
    src = (dst + 0.5) * (in/out) - 0.5. Whole-image numpy — four
    corner gathers and two lerps, no Python loops."""
    rgb = to_rgb(px)
    in_h, in_w = rgb.shape[:2]
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"bad target size {(out_h, out_w)}")
    if (in_h, in_w) == (out_h, out_w):
        return rgb.copy()

    sy = (np.arange(out_h, dtype=np.float64) + 0.5) * (in_h / out_h) - 0.5
    sx = (np.arange(out_w, dtype=np.float64) + 0.5) * (in_w / out_w) - 0.5
    y0 = np.clip(np.floor(sy), 0, in_h - 1).astype(np.int64)
    x0 = np.clip(np.floor(sx), 0, in_w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]

    f = rgb.astype(np.float64)
    top = f[y0[:, None], x0[None, :]] * (1 - wx) + f[y0[:, None], x1[None, :]] * wx
    bot = f[y1[:, None], x0[None, :]] * (1 - wx) + f[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def center_crop(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Center crop to (out_h, out_w); images smaller than the target
    are edge-padded first (replicate), so output shape is exact."""
    rgb = to_rgb(px)
    in_h, in_w = rgb.shape[:2]
    pad_h, pad_w = max(0, out_h - in_h), max(0, out_w - in_w)
    if pad_h or pad_w:
        rgb = np.pad(
            rgb,
            (
                (pad_h // 2, pad_h - pad_h // 2),
                (pad_w // 2, pad_w - pad_w // 2),
                (0, 0),
            ),
            mode="edge",
        )
        in_h, in_w = rgb.shape[:2]
    y = (in_h - out_h) // 2
    x = (in_w - out_w) // 2
    return np.ascontiguousarray(rgb[y : y + out_h, x : x + out_w])


# ImageNet statistics — the de-facto default for vision model inputs
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_chw(
    px: np.ndarray,
    mean: tuple = IMAGENET_MEAN,
    std: tuple = IMAGENET_STD,
) -> np.ndarray:
    """uint8 HWC -> float32 CHW model-input tensor:
    (px/255 - mean) / std per channel (torchvision Normalize)."""
    rgb = to_rgb(px).astype(np.float32) / 255.0
    m = np.asarray(mean, dtype=np.float32)[None, None, :]
    s = np.asarray(std, dtype=np.float32)[None, None, :]
    return np.ascontiguousarray(((rgb - m) / s).transpose(2, 0, 1))


def dhash64(px: np.ndarray) -> int:
    """64-bit perceptual difference hash (dHash, Krawetz 2013): luma
    of the bilinear 8x9 thumbnail, bit[r*8+c] = L[r,c] > L[r,c+1]
    (row-major, MSB first). Brightness/contrast shifts and re-encodes
    move few bits, so near-identical images land within a small
    Hamming radius — the standard image near-dup sketch (LAION-style
    dedup). Deterministic: same pixels, same hash, any layout."""
    thumb = luma(resize_bilinear(px, 8, 9))
    bits = (thumb[:, :-1] > thumb[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])
