"""Train-time image augmentation for the mPLUG pipeline.

Re-design of `mPLUG/dataset/__init__.py:16-35` (the torchvision
RandomResizedCrop/HFlip stack) + `mPLUG/dataset/randaugment.py`
(RandomAugment(N=2, M=7) over the shipped 10-op list: Identity,
AutoContrast, Equalize, Brightness, Sharpness, ShearX, ShearY, TranslateX,
TranslateY, Rotate). All randomness flows through an explicit
`np.random.Generator`, so every transform is deterministic given a seed —
the host data pipeline stays reproducible and the device only ever sees
fixed-shape float batches.

Pixel-level notes: geometric ops use an inverse-mapped bilinear affine warp
with the reference's (128,128,128) fill and ITS exact conventions (forward
cv2 shear matrices, rotation about (w/2, h/2)); Sharpness reproduces the
reference's interior-only blend including its uint8 wraparound. Magnitude
scaling matches the reference's level_to_args tables (randaugment.py:
195-307): enhance factor = level/10*1.8+0.1, shear = level/10*0.3,
translate = level/10*10 px, rotate = level/10*30 deg, each sign-flipped
with p=0.5, each op applied with p=0.5. The full reference op menu
(FULL_AUGS: + Solarize/Color/Contrast/Posterize) is available even though
no shipped config selects it. Every op is verified against the reference
implementation run side by side (tests/test_augment_oracle.py):
elementwise ops byte-identical, warps within 1 fixed-point LSB on
source-valid pixels.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

MAX_LEVEL = 10.0
TRANSLATE_CONST = 10.0
FILL = np.array([128, 128, 128], np.float32)

# the list every mPLUG train config ships (dataset/__init__.py:22-24)
SHIPPED_AUGS = ("Identity", "AutoContrast", "Equalize", "Brightness",
                "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY",
                "Rotate")
# the reference's full op menu (randaugment.py:func_dict) — Solarize/Color/
# Contrast/Posterize are selectable but absent from every shipped config
FULL_AUGS = SHIPPED_AUGS + ("Solarize", "Color", "Contrast", "Posterize")


# --------------------------------------------------------------- primitives
_NATIVE = None


def _native():
    """native/augment_native.py hot ops (warp + normalize), or None — the
    numpy path below is the fallback and the byte-parity oracle."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from ..native.augment_native import load

            _NATIVE = load() or False
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def _u8rgb(img: np.ndarray) -> bool:
    """Native eligibility: the ops are compiled for uint8 [H, W, 3] only;
    anything else takes the generic numpy path (value-correct for floats)."""
    return img.dtype == np.uint8 and img.ndim == 3 and img.shape[-1] == 3


def _affine_inverse_warp(img: np.ndarray, inv: np.ndarray) -> np.ndarray:
    """Bilinear warp: out[y, x] = img[inv @ (x, y, 1)] with constant fill."""
    if _u8rgb(img):
        n = _native()
        if n is not None:  # byte-identical (test_augment_native.py)
            return n.warp(img, np.asarray(inv, np.float32), float(FILL[0]))
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    x0 = np.floor(sx)
    y0 = np.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    x0i = np.clip(x0, 0, w - 1).astype(np.int32)
    y0i = np.clip(y0, 0, h - 1).astype(np.int32)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)
    f = img.astype(np.float32)
    out = (f[y0i, x0i] * (1 - fx) * (1 - fy) + f[y0i, x1i] * fx * (1 - fy)
           + f[y1i, x0i] * (1 - fx) * fy + f[y1i, x1i] * fx * fy)
    out = np.where(valid[..., None], out, FILL)
    return np.clip(out, 0, 255).astype(img.dtype)


def identity(img: np.ndarray) -> np.ndarray:
    return img


def autocontrast(img: np.ndarray) -> np.ndarray:
    """Per-channel min/max stretch to the full [0, 255] range."""
    if _u8rgb(img):
        n = _native()
        if n is not None:
            return n.autocontrast(img)
    f = img.astype(np.float32)
    lo = f.reshape(-1, 3).min(axis=0)
    hi = f.reshape(-1, 3).max(axis=0)
    scale = np.where(hi > lo, 255.0 / np.maximum(hi - lo, 1e-6), 1.0)
    off = np.where(hi > lo, lo, 0.0)
    return np.clip((f - off) * scale, 0, 255).astype(img.dtype)


def equalize(img: np.ndarray) -> np.ndarray:
    """PIL-style per-channel histogram equalization."""
    if _u8rgb(img):
        n = _native()
        if n is not None:
            return n.equalize(img)
    out = img.copy()
    for c in range(3):
        ch = img[..., c]
        histo = np.bincount(ch.ravel(), minlength=256)
        nonzero = histo[histo != 0]
        if nonzero.size <= 1:
            continue
        step = (histo.sum() - nonzero[-1]) // 255
        if step == 0:
            continue
        cum = np.concatenate([[0], np.cumsum(histo)[:-1]])
        lut = np.minimum((cum + step // 2) // step, 255).astype(img.dtype)
        out[..., c] = lut[ch]
    return out


def brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend toward black (PIL ImageEnhance.Brightness)."""
    return np.clip(img.astype(np.float32) * factor, 0, 255).astype(img.dtype)


def _smooth3x3(img: np.ndarray) -> np.ndarray:
    """3x3 PIL smoothing kernel [[1,1,1],[1,5,1],[1,1,1]]/13 with
    reflect-101 borders, rounded to uint8 like cv2.filter2D."""
    f = img.astype(np.float32)
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    pad = np.pad(f, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    smooth = np.zeros_like(f)
    for dy in range(3):
        for dx in range(3):
            smooth += k[dy, dx] * pad[dy:dy + f.shape[0], dx:dx + f.shape[1]]
    return np.clip(np.rint(smooth), 0, 255).astype(np.uint8)


def sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend between a 3x3-smoothed copy and the original on the INTERIOR
    only — the 1-px border keeps the original pixels, exactly like the
    reference's sharpness_func (randaugment.py:131-149; oracle-tested)."""
    if factor == 1.0:
        return img
    if _u8rgb(img) and img.shape[0] >= 3 and img.shape[1] >= 3:
        n = _native()
        if n is not None:
            return n.sharpness(img, float(factor))
    smooth = _smooth3x3(img)
    if factor == 0.0:
        return smooth
    out = img.astype(np.float32)
    deg = smooth.astype(np.float32)[1:-1, 1:-1]
    out[1:-1, 1:-1] = deg + factor * (out[1:-1, 1:-1] - deg)
    # deliberately NO clip: the reference casts the raw float straight to
    # uint8 (sharpness_func:148), wrapping over/undershoot around 256 —
    # reproduced for distribution parity
    return out.astype(np.uint8)


def solarize(img: np.ndarray, thresh: int = 128) -> np.ndarray:
    """Invert pixels >= thresh (PIL ImageOps.solarize; solarize_func)."""
    lut = np.arange(256)
    lut = np.where(lut < thresh, lut, 255 - lut).clip(0, 255).astype(np.uint8)
    return lut[img]


def posterize(img: np.ndarray, bits: int) -> np.ndarray:
    """Keep the top `bits` bits per channel (posterize_func; the shift is
    masked to 8 bits — numpy 2 rejects the reference's overflowing
    np.uint8(255 << 7))."""
    return np.bitwise_and(img, np.uint8((255 << (8 - bits)) & 0xFF))


# PIL's ITU-R 601-2 luma weights in the BGR order the reference's cv2-based
# funcs assume; the mPLUG pipeline feeds RGB arrays, so channel 0 gets the
# blue weight — reproduced as-is for parity (color/contrast are on the
# reference's op menu but NOT in any shipped mPLUG aug list).
_LUMA_BGR = np.array([0.114, 0.587, 0.299], np.float32)


def color(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend toward the per-pixel luma gray (PIL ImageEnhance.Color).

    Uses the same fused-matrix float arithmetic as color_func:
    out = x @ ((I - 1*w^T)*factor + 1*w^T) — the algebraically equal
    gray + factor*(x - gray) form truncates differently on ~1e-4 of
    pixels, so the matrix form is kept for byte parity."""
    m = ((np.eye(3, dtype=np.float32) - _LUMA_BGR[:, None]) * factor
         + _LUMA_BGR[:, None])
    return np.matmul(img, m).clip(0, 255).astype(img.dtype)


def contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """Blend toward the global mean luma (PIL ImageEnhance.Contrast;
    contrast_func's LUT form — float64 like the reference's python-list
    LUT, so truncation boundaries agree)."""
    # float64 literals, NOT _LUMA_BGR.astype: the float32-rounded weights no
    # longer sum to exactly 1.0, which shifts truncation boundaries (e.g. a
    # uniform-77 image would map to 76)
    mean = float(np.sum(np.mean(img, axis=(0, 1))
                        * np.array([0.114, 0.587, 0.299], np.float64)))
    lut = ((np.arange(256, dtype=np.float64) - mean) * factor
           + mean).clip(0, 255).astype(np.uint8)
    return lut[img]


def shear_x(img: np.ndarray, mag: float) -> np.ndarray:
    """Forward shear dst_x = src_x + mag*y (shear_x_func's cv2 forward
    matrix — the inverse warp samples at x - mag*y; oracle-tested)."""
    return _affine_inverse_warp(img, np.array([[1.0, -mag, 0.0],
                                               [0.0, 1.0, 0.0]], np.float32))


def shear_y(img: np.ndarray, mag: float) -> np.ndarray:
    return _affine_inverse_warp(img, np.array([[1.0, 0.0, 0.0],
                                               [-mag, 1.0, 0.0]], np.float32))


def translate_x(img: np.ndarray, px: float) -> np.ndarray:
    return _affine_inverse_warp(img, np.array([[1.0, 0.0, px],
                                               [0.0, 1.0, 0.0]], np.float32))


def translate_y(img: np.ndarray, px: float) -> np.ndarray:
    return _affine_inverse_warp(img, np.array([[1.0, 0.0, 0.0],
                                               [0.0, 1.0, px]], np.float32))


def rotate(img: np.ndarray, degrees: float) -> np.ndarray:
    """Counter-clockwise rotation about (w/2, h/2) — rotate_func's
    cv2.getRotationMatrix2D convention (center at w/2, NOT (w-1)/2, and
    positive degrees CCW in image coordinates; oracle-tested)."""
    h, w = img.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    t = np.deg2rad(degrees)
    cos, sin = np.cos(t), np.sin(t)
    # inverse of rotation-by-degrees about the center = rotation by -degrees
    inv = np.array([
        [cos, -sin, cx - cos * cx + sin * cy],
        [sin, cos, cy - sin * cx - cos * cy],
    ], np.float32)
    return _affine_inverse_warp(img, inv)


def _enhance_factor(level: float) -> float:
    return level / MAX_LEVEL * 1.8 + 0.1


# ----------------------------------------------------------- RandomAugment
def random_augment(img: np.ndarray, rng: np.random.Generator, n: int = 2,
                   m: float = 7.0,
                   augs: Sequence[str] = SHIPPED_AUGS) -> np.ndarray:
    """Sample `n` ops (with replacement), apply each with p=0.5 at level `m`
    (`RandomAugment.__call__`, randaugment.py:311-334)."""
    ops = rng.choice(len(augs), size=n)
    for oi in ops:
        if rng.random() > 0.5:
            continue
        name = augs[int(oi)]
        if name == "Identity":
            img = identity(img)
        elif name == "AutoContrast":
            img = autocontrast(img)
        elif name == "Equalize":
            img = equalize(img)
        elif name == "Brightness":
            img = brightness(img, _enhance_factor(m))
        elif name == "Sharpness":
            img = sharpness(img, _enhance_factor(m))
        elif name == "ShearX":
            mag = m / MAX_LEVEL * 0.3 * (-1 if rng.random() < 0.5 else 1)
            img = shear_x(img, mag)
        elif name == "ShearY":
            mag = m / MAX_LEVEL * 0.3 * (-1 if rng.random() < 0.5 else 1)
            img = shear_y(img, mag)
        elif name == "TranslateX":
            px = m / MAX_LEVEL * TRANSLATE_CONST * (
                -1 if rng.random() < 0.5 else 1)
            img = translate_x(img, px)
        elif name == "TranslateY":
            px = m / MAX_LEVEL * TRANSLATE_CONST * (
                -1 if rng.random() < 0.5 else 1)
            img = translate_y(img, px)
        elif name == "Rotate":
            deg = m / MAX_LEVEL * 30.0 * (-1 if rng.random() < 0.5 else 1)
            img = rotate(img, deg)
        elif name == "Solarize":
            img = solarize(img, int(m / MAX_LEVEL * 256))
        elif name == "Color":
            img = color(img, _enhance_factor(m))
        elif name == "Contrast":
            img = contrast(img, _enhance_factor(m))
        elif name == "Posterize":
            img = posterize(img, int(m / MAX_LEVEL * 4))
        else:
            raise ValueError(f"unknown aug {name!r}")
    return img


# ------------------------------------------------------------ full pipeline
def random_resized_crop(img, rng: np.random.Generator, size: int,
                        scale: tuple[float, float] = (0.5, 1.0),
                        ratio: tuple[float, float] = (3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics (10 attempts then center
    fallback), bicubic resize via PIL. Takes/returns a PIL image."""
    from PIL import Image

    w, h = img.size
    area = w * h
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = float(np.exp(log_r))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = int(rng.integers(0, w - cw + 1))
            y = int(rng.integers(0, h - ch + 1))
            box = (x, y, x + cw, y + ch)
            break
    else:  # center-crop fallback at the clamped aspect ratio
        ar = min(max(w / h, ratio[0]), ratio[1])
        cw = min(w, int(round(h * ar)))
        ch = min(h, int(round(cw / ar)))
        x, y = (w - cw) // 2, (h - ch) // 2
        box = (x, y, x + cw, y + ch)
    return img.resize((size, size), Image.BICUBIC, box=box)


def train_transform(img, rng: np.random.Generator, image_res: int,
                    n: int = 2, m: float = 7.0,
                    raw: bool = False) -> np.ndarray:
    """RandomResizedCrop(scale 0.5-1.0) -> HFlip(0.5) -> RandomAugment(2,7)
    -> /255 -> CLIP normalize (`train_transform`, dataset/__init__.py:28-35).
    `img` is a PIL image; returns float32 [H, W, 3].

    raw=True skips the normalize and returns the augmented uint8 pixels —
    the device-normalize path (models/mplug/vit.py applies the identical
    fp32 arithmetic on chip): every augment op is uint8-to-uint8, so raw
    loses nothing, and the host->device transfer shrinks 4x."""
    img = random_resized_crop(img, rng, image_res)
    arr = np.asarray(img, np.uint8)
    if rng.random() < 0.5:
        arr = arr[:, ::-1]
    arr = random_augment(np.ascontiguousarray(arr), rng, n=n, m=m)
    return np.ascontiguousarray(arr) if raw else _normalize_u8(arr)


def test_transform(img, image_res: int, raw: bool = False) -> np.ndarray:
    """Resize(bicubic) -> /255 -> normalize (dataset/__init__.py:37-41)."""
    from PIL import Image

    # no forced uint8 cast: RGB-converted images arrive uint8 (native
    # normalize); exotic PIL modes (I/I;16/F) keep their true sample values
    # through the generic numpy path
    arr = np.asarray(img.resize((image_res, image_res), Image.BICUBIC))
    if raw:
        # raw callers (load_images) always .convert("RGB") first -> uint8
        return np.ascontiguousarray(arr.astype(np.uint8, copy=False))
    return _normalize_u8(arr)


def _normalize_u8(arr: np.ndarray) -> np.ndarray:
    """((arr/255) - CLIP_MEAN) / CLIP_STD -> float32; native single pass
    for uint8 [H, W, 3] (bit-exact — the fp32 value of a uint8 is exact, so
    float-then-divide == divide-in-C); generic numpy otherwise."""
    if _u8rgb(arr):
        n = _native()
        if n is not None:
            return n.normalize(np.ascontiguousarray(arr), CLIP_MEAN,
                               CLIP_STD)
    return ((arr.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
