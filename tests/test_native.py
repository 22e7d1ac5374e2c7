"""Native framepipe library tests (C++ via ctypes, with numpy fallbacks)."""

import numpy as np
import pytest

from playground3d_tpu.data import native as N
from playground3d_tpu.data.timestamps import encode_timestamp
from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture(scope="module")
def frame4k(rng=None):
    return np.random.default_rng(0).integers(0, 255, (432, 768, 3), dtype=np.uint8)


def test_resize_half_matches_numpy(frame4k):
    half = N.resize_half(frame4k)
    f = frame4k.astype(np.uint16)
    ref = ((f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2] + 2) >> 2).astype(np.uint8)
    np.testing.assert_array_equal(half, ref)


def test_normalize_matches_numpy(frame4k):
    half = N.resize_half(frame4k)
    got = N.normalize(half)
    ref = (half.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_preprocess(frame4k):
    got = N.preprocess(frame4k)
    half = N.resize_half(frame4k)
    ref = (half.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    # the fused path averages before quantization: more accurate, differs by
    # at most the 0.5 LSB rounding of the two-step path
    np.testing.assert_allclose(got, ref, atol=0.5 / 255.0 / IMAGENET_STD.min() + 1e-5)


@pytest.mark.skipif(not N.native_available(), reason="no native toolchain")
def test_native_timestamp_decode():
    burned = encode_timestamp(np.zeros((256, 512, 3), np.uint8), 1623877088.77)
    got = N.parse_timestamp_native(burned)
    assert got == pytest.approx(1623877088.77, abs=0.005)
    # corrupted digit -> None
    burned[16:44, 48:64] = 170
    assert N.parse_timestamp_native(burned) is None
