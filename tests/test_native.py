"""C++ native kernels vs numpy references (and that the build works here)."""

import numpy as np

from mrfp_tpu.data import _native
from mrfp_tpu.data import label_maps as lm
from mrfp_tpu.ops.hist import fast_hist as np_hist


def test_native_builds():
    assert _native.available(), "g++ build of native.cpp failed"


def test_remap_matches_numpy():
    rng = np.random.default_rng(0)
    mask = rng.integers(0, 256, (128, 64)).astype(np.uint8)
    lut = lm.sequential_lut(lm.CITYSCAPES_VOID, lm.CITYSCAPES_VALID)
    np.testing.assert_array_equal(_native.remap_u8(mask, lut), lut[mask])


def test_native_hist_matches_numpy():
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 19, (513, 257))
    label = rng.integers(0, 25, (513, 257))
    label[label >= 19] = 255
    ref = np_hist(pred, label, 19)
    got = _native.fast_hist(pred, label, 19, num_threads=3)
    np.testing.assert_array_equal(got, ref)


def test_u8_to_f32():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (33, 44, 3)).astype(np.uint8)
    got = _native.u8_to_f32(img)
    np.testing.assert_allclose(got, img.astype(np.float32))


def test_copy_remap():
    rng = np.random.default_rng(3)
    mask = rng.integers(0, 66, (64, 64)).astype(np.uint8)
    got = _native.copy_remap_u8(mask, lm.MAPILLARY_MAP, fill=255)
    ref = np.full(mask.shape, 255, np.uint8)
    for k, v in lm.MAPILLARY_MAP.items():
        ref[mask == k] = v
    np.testing.assert_array_equal(got, ref)
