"""Native augment ops (native/augment.cpp): BYTE-IDENTICAL to the numpy
path — the numpy implementation is itself oracle-matched to the reference
(test_augment_oracle.py), so byte-parity here transfers that evidence to
the C++ path the pipeline actually runs."""
import numpy as np
import pytest

from crvqa_tpu.data import augment as ag

native = ag._native()
pytestmark = pytest.mark.skipif(native is None,
                                reason="native augment unavailable")


def _imgs(shapes=((384, 384, 3), (37, 53, 3), (64, 64, 3))):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 256, size=s).astype(np.uint8) for s in shapes]


WARPS = [
    np.array([[1.0, -0.21, 0.0], [0.0, 1.0, 0.0]], np.float32),   # shear x
    np.array([[1.0, 0.0, 0.0], [0.17, 1.0, 0.0]], np.float32),    # shear y
    np.array([[1.0, 0.0, 7.0], [0.0, 1.0, 0.0]], np.float32),     # translate
    np.array([[1.0, 0.0, 0.0], [0.0, 1.0, -900.0]], np.float32),  # all-fill
    np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32),     # identity
]


def _rot_inv(h, w, degrees):
    cx, cy = w / 2.0, h / 2.0
    t = np.deg2rad(degrees)
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, cx - c * cx + s * cy],
                     [s, c, cy - s * cx - c * cy]], np.float32)


def test_warp_byte_identical_vs_numpy(monkeypatch):
    import crvqa_tpu.data.augment as m

    for img in _imgs():
        rot = _rot_inv(img.shape[0], img.shape[1], 17.3)
        for inv in WARPS + [rot]:
            got = native.warp(img, inv, 128.0)
            monkeypatch.setattr(m, "_NATIVE", False)  # force numpy
            want = m._affine_inverse_warp(img, inv)
            monkeypatch.setattr(m, "_NATIVE", native)
            np.testing.assert_array_equal(got, want)


def test_public_warp_ops_route_native_and_match(monkeypatch):
    """rotate/shear/translate through the PUBLIC ops: native vs numpy."""
    import crvqa_tpu.data.augment as m

    img = _imgs()[1]
    for op, arg in [(m.rotate, 23.0), (m.shear_x, 0.11), (m.shear_y, -0.2),
                    (m.translate_x, 4.0), (m.translate_y, -6.0)]:
        got = op(img, arg)
        monkeypatch.setattr(m, "_NATIVE", False)
        want = op(img, arg)
        monkeypatch.setattr(m, "_NATIVE", native)
        np.testing.assert_array_equal(got, want, err_msg=op.__name__)


def test_chanops_byte_identical(monkeypatch):
    """autocontrast / equalize / sharpness: native vs numpy, incl. the
    sharpness uint8-WRAP overshoot case the numpy path deliberately
    reproduces from the reference, and degenerate constant channels."""
    import crvqa_tpu.data.augment as m

    rng = np.random.default_rng(2)
    imgs = _imgs() + [
        np.full((16, 16, 3), 7, np.uint8),                  # constant
        np.where(rng.random((32, 32, 3)) < 0.5, 0, 255).astype(np.uint8),
    ]
    cases = [(m.autocontrast, ()), (m.equalize, ()),
             (m.sharpness, (0.0,)), (m.sharpness, (1.9,)),  # wrap overshoot
             (m.sharpness, (0.3,))]
    for img in imgs:
        for op, a in cases:
            got = op(img, *a)
            monkeypatch.setattr(m, "_NATIVE", False)
            want = op(img, *a)
            monkeypatch.setattr(m, "_NATIVE", native)
            np.testing.assert_array_equal(
                got, want, err_msg=f"{op.__name__}{a} {img.shape}")


def test_sharpness_wrap_actually_exercised():
    """The 1.9-factor case must actually overshoot somewhere, or the wrap
    parity above is vacuous."""
    import crvqa_tpu.data.augment as m

    rng = np.random.default_rng(3)
    img = np.where(rng.random((32, 32, 3)) < 0.5, 0, 255).astype(np.uint8)
    sm = m._smooth3x3(img).astype(np.float32)[1:-1, 1:-1]
    raw = sm + 1.9 * (img[1:-1, 1:-1].astype(np.float32) - sm)
    assert (raw < 0).any() or (raw > 255).any()


def test_normalize_byte_identical(monkeypatch):
    import crvqa_tpu.data.augment as m

    for img in _imgs():
        got = m._normalize_u8(img)
        monkeypatch.setattr(m, "_NATIVE", False)
        want = m._normalize_u8(img)
        monkeypatch.setattr(m, "_NATIVE", native)
        assert got.dtype == want.dtype == np.float32
        np.testing.assert_array_equal(got, want)


def test_non_uint8_and_noncontiguous_fall_back():
    import crvqa_tpu.data.augment as m

    f32 = np.random.default_rng(1).random((16, 16, 3)).astype(np.float32)
    out = m._affine_inverse_warp(f32, WARPS[0])  # must not crash (numpy)
    assert out.dtype == np.float32
    img = _imgs()[2]
    sliced = img[::2]  # non-contiguous uint8: wrapper ascontiguousarray's
    got = native.warp(sliced, WARPS[0], 128.0)
    want = native.warp(np.ascontiguousarray(sliced), WARPS[0], 128.0)
    np.testing.assert_array_equal(got, want)


def test_full_train_transform_matches_numpy(monkeypatch):
    """End-to-end train_transform: same seed, native vs numpy — identical
    float32 output (the dispatch changes machinery, never pixels)."""
    from PIL import Image

    import crvqa_tpu.data.augment as m

    rng0 = np.random.default_rng(7)
    pil = Image.fromarray(
        np.random.default_rng(3).integers(0, 256, (90, 70, 3))
        .astype(np.uint8))
    got = m.train_transform(pil, np.random.default_rng(11), 64)
    monkeypatch.setattr(m, "_NATIVE", False)
    want = m.train_transform(pil, np.random.default_rng(11), 64)
    monkeypatch.setattr(m, "_NATIVE", native)
    np.testing.assert_array_equal(got, want)
    del rng0
