"""RandAugment oracle: every op in `crvqa_tpu/data/augment.py` vs the
ACTUAL reference implementation (`mPLUG/dataset/randaugment.py`, cv2-based),
run side by side on random images.

Elementwise ops (autocontrast, equalize, brightness, sharpness incl. its
uint8 wraparound, solarize, color, contrast) must be byte-identical.
Geometric warps (shear/translate/rotate) must agree within 1 LSB on every
pixel whose SOURCE sample lies >=1px inside the image — cv2's INTER_LINEAR
is 5-bit fixed point vs our float bilinear, and the two border models
differ by design (cv2 blends the constant border into edge pixels; we hard
fill) — integer translations are byte-identical everywhere.
"""
import importlib.util

import numpy as np
import pytest

from crvqa_tpu.data import augment as A

REF = "/root/reference/mPLUG/dataset/randaugment.py"
FILL = (128, 128, 128)


@pytest.fixture(scope="module")
def ref():
    cv2 = pytest.importorskip("cv2")  # noqa: F841 — the reference needs it
    spec = importlib.util.spec_from_file_location("ref_randaugment", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (48, 64, 3), np.uint8)
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    grad = np.stack([(xx * 3 + yy * 2) % 256, (xx * 5) % 256,
                     (yy * 4) % 256], -1).astype(np.uint8)
    flat = np.full((48, 64, 3), 77, np.uint8)  # degenerate-histogram case
    return [noise, grad, flat]


def _exact(ours, theirs):
    np.testing.assert_array_equal(ours, theirs)


def test_elementwise_ops_byte_identical(ref, imgs):
    for img in imgs:
        _exact(A.identity(img), ref.identity_func(img))
        _exact(A.autocontrast(img), ref.autocontrast_func(img))
        _exact(A.equalize(img), ref.equalize_func(img))
        for f in (0.1, 0.55, 1.0, 1.36, 1.9):
            _exact(A.brightness(img, f), ref.brightness_func(img, f))
            _exact(A.sharpness(img, f), ref.sharpness_func(img, f))
            _exact(A.color(img, f), ref.color_func(img, f))
            _exact(A.contrast(img, f), ref.contrast_func(img, f))
        _exact(A.sharpness(img, 0.0), ref.sharpness_func(img, 0.0))
        for thresh in (0, 128, 179, 256):
            _exact(A.solarize(img, thresh), ref.solarize_func(img, thresh))


def test_posterize_semantics(imgs):
    """The reference's posterize_func overflows np.uint8(255 << 7) under
    numpy>=2 (it relied on 1.x wrapping), so the oracle is the op's
    definition: keep the top `bits` bits."""
    for img in imgs:
        for bits in (1, 2, 3, 4):
            expect = img & np.uint8((255 << (8 - bits)) % 256)
            _exact(A.posterize(img, bits), expect)


def _src_valid(h, w, inv, margin=1.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return ((sx >= margin) & (sx <= w - 1 - margin)
            & (sy >= margin) & (sy <= h - 1 - margin))


def _warp_close(ours, theirs, inv):
    m = _src_valid(*ours.shape[:2], inv)
    assert m.sum() > 500  # the comparison must not be vacuous
    d = np.abs(ours.astype(int) - theirs.astype(int))[m]
    assert d.max() <= 1, f"warp mismatch beyond fixed-point LSB: {d.max()}"


def test_geometric_ops_match_reference(ref, imgs):
    """Sign conventions, warp direction, and the rotation center all match
    the reference's cv2 forward matrices (shear_x_func/rotate_func)."""
    for img in imgs[:2]:
        h, w = img.shape[:2]
        for mag in (0.21, -0.21):
            _warp_close(A.shear_x(img, mag),
                        ref.shear_x_func(img, mag, FILL),
                        np.array([[1, -mag, 0], [0, 1, 0]], np.float32))
            _warp_close(A.shear_y(img, mag),
                        ref.shear_y_func(img, mag, FILL),
                        np.array([[1, 0, 0], [-mag, 1, 0]], np.float32))
        for off in (7, -7):  # integer translate: byte-exact everywhere
            _exact(A.translate_x(img, off),
                   ref.translate_x_func(img, off, FILL))
            _exact(A.translate_y(img, off),
                   ref.translate_y_func(img, off, FILL))
        _warp_close(A.translate_x(img, 4.9),
                    ref.translate_x_func(img, 4.9, FILL),
                    np.array([[1, 0, 4.9], [0, 1, 0]], np.float32))
        for deg in (21.0, -21.0):
            t = np.deg2rad(deg)
            c, s = np.cos(t), np.sin(t)
            cx, cy = w / 2, h / 2
            inv = np.array([[c, -s, cx - c * cx + s * cy],
                            [s, c, cy - s * cx - c * cy]], np.float32)
            _warp_close(A.rotate(img, deg), ref.rotate_func(img, deg, FILL),
                        inv)


def test_full_menu_dispatch(imgs):
    """random_augment accepts the reference's full op menu (FULL_AUGS) and
    every op is reachable."""
    rng = np.random.default_rng(3)
    out = A.random_augment(imgs[0], rng, n=20, m=7.0, augs=A.FULL_AUGS)
    assert out.shape == imgs[0].shape and out.dtype == np.uint8
