"""Native host library vs numpy fallback parity (skipped if not built)."""

import numpy as np
import pytest

from emox.data import native


def _both(fn, *args):
    """Run with library and with forced fallback, return (native, fallback)."""
    out_native = fn(*args)
    lib = native._LIB
    native._LIB = None
    try:
        out_fallback = fn(*args)
    finally:
        native._LIB = lib
    return out_native, out_fallback


needs_lib = pytest.mark.skipif(not native.available(), reason="libemoxhost.so not built")


@needs_lib
def test_resample_parity():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=44100).astype(np.float32)
    a, b = _both(native.resample_linear, wav, 44100.0, 16000.0)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)


@needs_lib
def test_wav_window_parity():
    wav = np.arange(100, dtype=np.float32)
    for start in (-10, 0, 50, 95):
        a, b = _both(native.wav_window, wav, start, 20)
        np.testing.assert_array_equal(a, b)


@needs_lib
def test_u8_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    a, b = _both(native.u8_to_unit, img)
    np.testing.assert_allclose(a, b, atol=1e-6)
    back = native.unit_to_u8(a)
    np.testing.assert_array_equal(back, img)


@needs_lib
def test_resize_parity():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(17, 23, 3)).astype(np.float32)
    a, b = _both(native.resize_bilinear, img, 8, 12)
    np.testing.assert_allclose(a, b, atol=1e-5)


@needs_lib
def test_rms_envelope_parity():
    rng = np.random.default_rng(0)
    wav = rng.normal(size=6400).astype(np.float32)
    a, b = _both(native.rms_envelope, wav, 640.0, 10)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fallbacks_work_without_lib():
    lib = native._LIB
    native._LIB = None
    try:
        wav = np.ones(100, np.float32)
        assert native.resample_linear(wav, 100, 50).shape == (50,)
        assert native.wav_window(wav, -5, 10)[0] == 0.0
        assert native.u8_to_unit(np.full((2, 2, 3), 255, np.uint8)).max() <= 1.0
    finally:
        native._LIB = lib


class TestAugmentKernel:
    def test_native_matches_numpy(self):
        from emox.data import native
        from emox.data.augment import AugmentParams, apply_color, apply_geometry

        if not native.available() or native.augment_frame(
            np.zeros((4, 4, 1), np.float32), 0, 0, 4, 4, False, 0.0, 1.0, 4, 4
        ) is None:
            import pytest

            pytest.skip("native library not built")
        rng = np.random.default_rng(0)
        img = rng.normal(size=(24, 20, 3)).astype(np.float32) * 0.4
        p = AugmentParams(flip=True, y0=2, x0=3, crop_h=18, crop_w=15, brightness=0.05, contrast=1.1)
        nat = native.augment_frame(img, p.y0, p.x0, p.crop_h, p.crop_w, p.flip,
                                   p.brightness, p.contrast, 24, 20)
        geo = apply_geometry(img, p, 24, 20)
        pivot = float(img[p.y0 : p.y0 + p.crop_h, p.x0 : p.x0 + p.crop_w].mean())
        ref = apply_color(geo, p, pivot=pivot)
        np.testing.assert_allclose(nat, ref, atol=2e-6)

    def test_geometry_only_mask_path(self):
        from emox.data import native
        from emox.data.augment import AugmentParams, apply_geometry

        out = native.augment_frame(np.ones((8, 8, 1), np.float32), 1, 1, 6, 6, True, 0.0, 1.0, 8, 8)
        if out is None:
            import pytest

            pytest.skip("native library not built")
        ref = apply_geometry(np.ones((8, 8, 1), np.float32), AugmentParams(True, 1, 1, 6, 6, 0.0, 1.0), 8, 8)
        np.testing.assert_allclose(out, ref, atol=1e-6)
