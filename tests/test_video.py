"""Video container decoders: Y4M and MJPEG-AVI (pipeline/video.py).

The reference has no video surface; these validate the task's
multimodal pipeline the same way test_jpeg.py does for images:
fixture-encode -> decode must be exact, seeks must equal linear reads,
corrupt input must raise (never crash)."""

import numpy as np
import pytest

from orc_haskell_spark.pipeline import video as V


def _rgb_frames(n, h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def _yuv_frames(n, h, w, colorspace, seed=3):
    rng = np.random.RandomState(seed)
    ch, cw = {"C444": (h, w), "C420jpeg": (h // 2, w // 2),
              "C422": (h, w // 2)}[colorspace]
    return [(rng.randint(0, 256, (h, w), dtype=np.uint8).astype(np.uint8),
             rng.randint(0, 256, (ch, cw), dtype=np.uint8),
             rng.randint(0, 256, (ch, cw), dtype=np.uint8))
            for _ in range(n)]


@pytest.mark.parametrize("colorspace", ["C444", "C420jpeg", "C422"])
def test_y4m_plane_roundtrip_exact(colorspace):
    frames = _yuv_frames(5, 12, 16, colorspace)
    blob = V.encode_y4m(frames, fps=(30, 1), colorspace=colorspace)
    info = V.parse_y4m(blob)
    assert (info.width, info.height) == (16, 12)
    assert (info.fps_num, info.fps_den) == (30, 1)
    assert info.frame_count == 5 and info.seekable
    for k, (y, cb, cr) in enumerate(frames):
        dy, dcb, dcr = V.y4m_frame_planes(blob, k, info)
        np.testing.assert_array_equal(dy, y)
        np.testing.assert_array_equal(dcb, cb)
        np.testing.assert_array_equal(dcr, cr)


def test_y4m_mono_roundtrip():
    rng = np.random.RandomState(1)
    frames = [(rng.randint(0, 256, (9, 11), dtype=np.uint8), None, None)
              for _ in range(3)]
    blob = V.encode_y4m(frames, colorspace="Cmono")
    info = V.parse_y4m(blob)
    assert info.frame_count == 3
    for k in range(3):
        y, cb, cr = V.y4m_frame_planes(blob, k, info)
        assert cb is None and cr is None
        np.testing.assert_array_equal(y, frames[k][0])
        rgb = V.decode_y4m_frame(blob, k, info)
        np.testing.assert_array_equal(rgb, np.repeat(
            frames[k][0][:, :, None], 3, axis=2))


def test_y4m_seek_equals_linear_scan():
    """O(1) seek offsets must agree with a forced linear walk (the
    fallback used when frame records carry parameters)."""
    frames = _yuv_frames(7, 8, 8, "C444")
    blob = V.encode_y4m(frames, colorspace="C444")
    info = V.parse_y4m(blob)
    assert info.seekable
    forced = V.Y4MInfo(**{**info.__dict__, "seekable": False})
    for k in (0, 3, 6):
        a = V.y4m_frame_planes(blob, k, info)
        b = V.y4m_frame_planes(blob, k, forced)
        for pa_, pb in zip(a, b):
            np.testing.assert_array_equal(pa_, pb)


def test_y4m_frame_params_degrade_to_linear():
    """A stream with per-frame parameters (FRAME I...) must still parse,
    report seekable=False, and read the right planes."""
    frames = _yuv_frames(3, 6, 6, "C444")
    blob = V.encode_y4m(frames, colorspace="C444")
    # rewrite frame 1's marker with an interlacing parameter
    info = V.parse_y4m(blob)
    rec = 6 + info.frame_size
    p1 = info.data_start + rec
    mutated = blob[:p1] + b"FRAME Ip\n" + blob[p1 + 6:]
    info2 = V.parse_y4m(mutated)
    assert not info2.seekable and info2.frame_count == 3
    for k in range(3):
        dy, _, _ = V.y4m_frame_planes(mutated, k, info2)
        np.testing.assert_array_equal(dy, frames[k][0])


def test_y4m_truncation_and_garbage_raise():
    frames = _yuv_frames(2, 6, 6, "C444")
    blob = V.encode_y4m(frames, colorspace="C444")
    with pytest.raises(ValueError):
        V.parse_y4m(blob[:-5])
    with pytest.raises(ValueError):
        V.parse_y4m(b"JUNK" + blob)
    with pytest.raises(ValueError):
        V.parse_y4m(blob[:len(blob) // 2 + 3])
    with pytest.raises(IndexError):
        V.y4m_frame_planes(blob, 2)


def test_y4m_420_rgb_roundtrip_tolerance():
    """RGB -> C420jpeg -> RGB stays within chroma-subsampling error."""
    rgb = _rgb_frames(2, 16, 16)
    # smooth the source so 2x2 chroma box-mean loss is small
    rgb = (rgb // 4 + 96).astype(np.uint8)
    blob = V.encode_y4m(V.rgb_to_y4m_frames(rgb, "C420jpeg"),
                        colorspace="C420jpeg")
    for k in range(2):
        out = V.decode_y4m_frame(blob, k)
        assert out.shape == (16, 16, 3)
        assert np.abs(out.astype(int) - rgb[k].astype(int)).mean() < 12


def _mjpeg_blob(n=4, h=16, w=16, write_index=True):
    from orc_haskell_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    # gradient frames: q100 grayscale roundtrips pixel-exact on these
    # (test_jpeg.py::test_roundtrip_gray_quality100_exact)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = [((xx * 3 + yy * 5 + 17 * k) % 256).astype(np.uint8)
              for k in range(n)]
    jpegs = [encode_jpeg(f, quality=100) for f in frames]
    # container-path decode must equal decoding the raw JPEG directly
    exact = [np.repeat(decode_jpeg(j)[:, :, None], 3, axis=2)
             for j in jpegs]
    for f, e in zip(frames, exact):
        np.testing.assert_array_equal(e[:, :, 0], f)
    return V.encode_avi_mjpeg(jpegs, w, h, fps=10.0,
                              write_index=write_index), jpegs, exact


def test_avi_parse_and_index_seek():
    blob, jpegs, exact = _mjpeg_blob()
    info = V.parse_avi(blob)
    assert (info.width, info.height) == (16, 16)
    assert info.frame_count == 4
    assert info.usec_per_frame == 100000
    assert info.index is not None
    for k in range(4):
        assert bytes(V.avi_frame_bytes(blob, k, info)) == jpegs[k]
        np.testing.assert_array_equal(V.decode_avi_frame(blob, k, info),
                                      exact[k])


def test_avi_no_index_linear_walk():
    blob, jpegs, exact = _mjpeg_blob(write_index=False)
    info = V.parse_avi(blob)
    assert info.index is None and info.frame_count == 4
    for k in (0, 2, 3):
        assert bytes(V.avi_frame_bytes(blob, k, info)) == jpegs[k]
        np.testing.assert_array_equal(V.decode_avi_frame(blob, k, info),
                                      exact[k])


def test_avi_corrupt_index_discarded():
    """An idx1 whose offsets match neither convention must be dropped
    (decode falls back to the movi walk, not garbage reads)."""
    blob, jpegs, _ = _mjpeg_blob()
    pos = blob.rfind(b"idx1")
    body = pos + 8
    bad = bytearray(blob)
    # corrupt the first entry's offset field
    bad[body + 8:body + 12] = (2 ** 31 - 5).to_bytes(4, "little")
    info = V.parse_avi(bytes(bad))
    assert info.index is None
    assert bytes(V.avi_frame_bytes(bytes(bad), 1, info)) == jpegs[1]


def test_avi_truncation_raises():
    blob, _, _ = _mjpeg_blob()
    with pytest.raises(ValueError):
        V.parse_avi(blob[:40])
    with pytest.raises(ValueError):
        V.parse_avi(b"RIFX" + blob[4:])
    info = V.parse_avi(blob)
    with pytest.raises(IndexError):
        V.avi_frame_bytes(blob, 99, info)


def test_dispatch_and_timing():
    frames = _yuv_frames(4, 8, 8, "C444")
    y4m = V.encode_y4m(frames, fps=(20, 1), colorspace="C444")
    avi, _, exact = _mjpeg_blob(n=3)
    assert V.video_frame_count(y4m) == 4
    assert V.video_frame_count(avi) == 3
    assert V.video_timing(y4m) == (4, 50000)
    assert V.video_timing(avi) == (3, 100000)
    np.testing.assert_array_equal(V.decode_video_frame(avi, 1), exact[1])
    assert V.decode_video_frame(y4m, 0).shape == (8, 8, 3)
    with pytest.raises(NotImplementedError):
        V.video_frame_count(b"\x00" * 32)
