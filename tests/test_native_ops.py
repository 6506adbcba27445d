"""C++ image ops vs cv2 golden semantics."""

import numpy as np
import pytest

from groma_tpu.data import native_ops

cv2 = pytest.importorskip('cv2')


@pytest.mark.skipif(not native_ops.available(),
                    reason='native lib not built')
def test_resize_matches_cv2(rng):
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    for out_hw in [(448, 448), (20, 30), (64, 17)]:
        got = native_ops.resize_bilinear(img, out_hw)
        want = cv2.resize(img, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
        # cv2 uses fixed-point arithmetic; allow off-by-one quantization
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.skipif(not native_ops.available(),
                    reason='native lib not built')
def test_resize_normalize_fused(rng):
    img = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    got = native_ops.resize_normalize(img, (32, 32), mean, std)
    base = native_ops.resize_bilinear(img, (32, 32)).astype(np.float32)
    want = (base - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fallback_path(rng, monkeypatch):
    img = rng.integers(0, 255, (30, 30, 3), dtype=np.uint8)
    monkeypatch.setattr(native_ops, '_LIB', None)
    monkeypatch.setattr(native_ops, '_TRIED', True)
    out = native_ops.resize_bilinear(img, (15, 15))
    assert out.shape == (15, 15, 3)
