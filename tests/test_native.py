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


# ---- uint8 feed path + fused y4m decode tail (round 3) ---------------------


def test_s2d_u8_matches_pack(frame4k):
    from playground3d_tpu.data.video import pack_s2d

    # any [H,W,3] with H,W % 4 == 0
    f = frame4k[:432, :768]
    np.testing.assert_array_equal(N.s2d_u8(f), pack_s2d(f))


def test_preprocess_s2d_u8_exact(frame4k):
    from playground3d_tpu.data.video import pack_s2d

    got = N.preprocess_s2d_u8(frame4k)
    ref = pack_s2d(N.resize_half(frame4k))
    np.testing.assert_array_equal(got, ref)


def _yuv_rgb_float(Y, U, V):
    h, w = Y.shape
    if U.shape[1] != w:
        U = U.repeat(2, 0).repeat(2, 1)[:h, :w]
        V = V.repeat(2, 0).repeat(2, 1)[:h, :w]
    y = (Y.astype(np.float32) - 16.0) * (255.0 / 219.0)
    u = (U.astype(np.float32) - 128.0) * (255.0 / 224.0)
    v = (V.astype(np.float32) - 128.0) * (255.0 / 224.0)
    rgb = np.stack([y + 1.402 * v, y - 0.344136 * u - 0.714136 * v, y + 1.772 * u], -1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


@pytest.mark.skipif(not N.native_available(), reason="no native toolchain")
def test_yuv420_to_rgb_matches_float_decoder():
    rng = np.random.default_rng(3)
    h, w = 216, 384
    Y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    U = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    V = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    got = N.yuv420_to_rgb(Y, U, V)
    ref = _yuv_rgb_float(Y, U, V)
    # 16.16 fixed point vs float32: at most 1 LSB apart
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
    # odd width exercises the scalar tail; must agree with the SIMD body
    got2 = N.yuv420_to_rgb(Y[:, : w - 10], U[:, : (w - 10) // 2], V[:, : (w - 10) // 2])
    np.testing.assert_array_equal(got2, got[:, : w - 10])


@pytest.mark.skipif(not N.native_available(), reason="no native toolchain")
def test_yuv420_to_s2d_u8_fused_equals_two_step():
    from playground3d_tpu.data.video import pack_s2d

    rng = np.random.default_rng(4)
    h, w = 216, 384
    Y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    U = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    V = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    fused = N.yuv420_to_s2d_u8(Y, U, V)
    np.testing.assert_array_equal(fused, pack_s2d(N.yuv420_to_rgb(Y, U, V)))


def _box2(p):
    p = p.astype(np.uint16)
    return ((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2).astype(
        np.uint8
    )


@pytest.mark.skipif(not N.native_available(), reason="no native toolchain")
def test_yuv420_half_to_s2d_u8_equals_downsampled_planes():
    """The fused 4K tail (downsample in YUV space, then convert+pack) is
    bit-exact against composing the existing primitives on pre-downsampled
    planes — including non-SIMD-multiple widths (scalar tails)."""
    rng = np.random.default_rng(6)
    # even sizes plus odd luma extents: 4:2:0 chroma planes are
    # ceil(h/2) x ceil(w/2), so an odd-width source exercises the ceil
    # chroma row stride (a floor stride misaligns every chroma row and
    # reads past the last one)
    for h, w in [(432, 768), (216, 368), (104, 200), (104, 201), (105, 201)]:
        ch, cw = (h + 1) // 2, (w + 1) // 2
        Y = rng.integers(0, 256, (h, w), dtype=np.uint8)
        U = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        V = rng.integers(0, 256, (ch, cw), dtype=np.uint8)
        got = N.yuv420_half_to_s2d_u8(Y, U, V)
        ref = N.yuv420_to_s2d_u8(N.box2_plane(Y), N.box2_plane(U), N.box2_plane(V))
        np.testing.assert_array_equal(got, ref)


def test_plane_half_matches_numpy_twin():
    """fp_plane_half (single-plane 2x2 box, SIMD + scalar tails) is
    bit-exact against box2_plane at SIMD-multiple and odd sizes; the
    wrapper also serves the numpy twin when the lib is absent."""
    rng = np.random.default_rng(8)
    for h, w in [(256, 512), (216, 368), (34, 66), (7, 9)]:
        p = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = N.plane_half(p)
        assert got.shape == (h // 2, w // 2)
        np.testing.assert_array_equal(got, N.box2_plane(p))


def test_video_source_4k_yuv420_emit_ships_quarter_planes(tmp_path):
    """emit='yuv420' from a y4m stored at 2x the requested size: the host
    box-downsamples each plane (fp_plane_half) and ships quarter-size flat
    bytes; the planes must equal downsampling the stored planes directly."""
    from playground3d_tpu.data.video import VideoFrameSource, _Y4MReader, write_y4m

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (128, 192, 3), dtype=np.uint8) for _ in range(2)]
    path = str(tmp_path / "t4k_yuv.y4m")
    write_y4m(path, frames)

    th, tw = 64, 96
    out = list(VideoFrameSource(path, resize_hw=(th, tw), parse_ts=False, emit="yuv420"))
    assert len(out) == 2
    rd = _Y4MReader(path)
    for flat, _t in out:
        assert flat.shape == (th * tw * 3 // 2,) and flat.dtype == np.uint8
        Y, U, V = rd.read_planes()
        ref = np.concatenate(
            [N.box2_plane(Y).ravel(), N.box2_plane(U).ravel(), N.box2_plane(V).ravel()]
        )
        np.testing.assert_array_equal(flat, ref)


@pytest.mark.skipif(not N.native_available(), reason="no native toolchain")
def test_video_source_4k_y4m_uses_fused_half_tail(tmp_path):
    """A y4m stored at 2x the requested size goes through the fused
    half-res tail: plane-domain downsample, then convert+pack."""
    from playground3d_tpu.data.video import VideoFrameSource, write_y4m

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (128, 192, 3), dtype=np.uint8) for _ in range(2)]
    path = str(tmp_path / "t4k.y4m")
    write_y4m(path, frames)

    src = VideoFrameSource(path, resize_hw=(64, 96), parse_ts=False, emit="s2d_u8")
    out = [f for f, _ in src]
    assert len(out) == 2 and out[0].shape == (16, 24, 48) and out[0].dtype == np.uint8
    # reference: decode the stored planes, box-downsample them, fused tail
    from playground3d_tpu.data.video import _Y4MReader

    rd = _Y4MReader(path)
    for f in out:
        Y, U, V = rd.read_planes()
        ref = N.yuv420_to_s2d_u8(_box2(Y), _box2(U), _box2(V))
        np.testing.assert_array_equal(f, ref)


def test_video_source_emit_s2d_u8(tmp_path):
    """VideoFrameSource(emit='s2d_u8') yields uint8 s2d frames equivalent
    (+-1 LSB from the fixed-point decode) to packing the f32 path's frame."""
    from playground3d_tpu.data.video import VideoFrameSource, pack_s2d, write_y4m
    from playground3d_tpu.utils.constants import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (64, 96, 3), dtype=np.uint8) for _ in range(3)]
    path = str(tmp_path / "t.y4m")
    write_y4m(path, frames)

    fast = list(VideoFrameSource(path, resize_hw=(64, 96), parse_ts=False, emit="s2d_u8"))
    slow = list(VideoFrameSource(path, resize_hw=(64, 96), parse_ts=False))
    assert len(fast) == len(slow) == 3
    for (fs, tf), (ss, ts) in zip(fast, slow):
        assert fs.dtype == np.uint8 and fs.shape == (16, 24, 48)
        assert tf == ts
        # de-normalize the f32 frame back to uint8 and pack it
        u8 = np.clip((ss * IMAGENET_STD + IMAGENET_MEAN) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        ref = pack_s2d(u8)
        assert np.abs(fs.astype(int) - ref.astype(int)).max() <= 1


def test_device_yuv420_flat_to_s2d_matches_native():
    """The on-device YUV420 converter (ships 1.5 B/px over the link) matches
    the native fused host tail within +-1 LSB, s2d layout included."""
    from playground3d_tpu.pipeline.multi_cam import yuv420_flat_to_s2d

    rng = np.random.default_rng(6)
    h, w = 64, 96
    Y = rng.integers(0, 256, (h, w), dtype=np.uint8)
    U = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    V = rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
    flat = np.concatenate([Y.ravel(), U.ravel(), V.ravel()])
    got = np.asarray(yuv420_flat_to_s2d(flat[None, None], (h, w)))[0, 0]
    from playground3d_tpu.data.video import pack_s2d

    ref = pack_s2d(_yuv_rgb_float(Y, U, V))
    assert got.shape == ref.shape == (h // 4, w // 4, 48)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_video_source_emit_yuv420_roundtrip(tmp_path):
    """emit='yuv420' yields flat planar bytes that reconstruct the same s2d
    frame as emit='s2d_u8' (via the device converter), same timestamps."""
    from playground3d_tpu.data.video import VideoFrameSource, write_y4m
    from playground3d_tpu.pipeline.multi_cam import yuv420_flat_to_s2d

    rng = np.random.default_rng(8)
    frames = [rng.integers(0, 256, (64, 96, 3), dtype=np.uint8) for _ in range(3)]
    path = str(tmp_path / "t.y4m")
    write_y4m(path, frames)

    raw = list(VideoFrameSource(path, resize_hw=(64, 96), parse_ts=False, emit="yuv420"))
    fast = list(VideoFrameSource(path, resize_hw=(64, 96), parse_ts=False, emit="s2d_u8"))
    assert len(raw) == 3
    for (buf, tr), (fs, tf) in zip(raw, fast):
        assert buf.dtype == np.uint8 and buf.shape == (64 * 96 * 3 // 2,)
        assert tr == tf
        dev = np.asarray(yuv420_flat_to_s2d(buf[None, None], (64, 96)))[0, 0]
        assert np.abs(dev.astype(int) - fs.astype(int)).max() <= 1
    # exactly-2x requests now box-downsample per plane on the host
    half, _t = next(iter(VideoFrameSource(path, resize_hw=(32, 48), parse_ts=False, emit="yuv420")))
    assert half.shape == (32 * 48 * 3 // 2,)
    # any other ratio through the yuv420 path must still fail loudly
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        next(iter(VideoFrameSource(path, resize_hw=(16, 24), parse_ts=False, emit="yuv420")))
