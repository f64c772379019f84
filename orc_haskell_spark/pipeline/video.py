"""Video containers: pure-numpy Y4M (YUV4MPEG2) and MJPEG-in-AVI decode.

Closes the last declared media stub: video frame sampling now DECODES
real frames with no external library, the same way the image path got
BMP/PNG/JPEG. Two public container formats, both chosen because their
frame access is seekable — the property that matters at 100 TB, where a
sampler must touch only the frames it keeps:

- Y4M (YUV4MPEG2, the mjpegtools interchange format): one ASCII header,
  then fixed-size raw planar frames each prefixed by a ``FRAME`` line.
  When every frame record is the bare 6-byte ``FRAME\\n`` (the common
  case, and what our fixture encoder emits), frame *k* lives at a
  closed-form byte offset — an O(1) seek, verified against the marker
  bytes before trusting it, with a linear-scan fallback for files that
  attach per-frame parameters.
- MJPEG-in-AVI (RIFF): ``movi`` list of ``00dc`` chunks, each a whole
  baseline JPEG decoded by ``pipeline/jpeg.py``; the optional ``idx1``
  index gives direct chunk offsets (both offset conventions in the wild
  — movi-relative and absolute — are validated and handled), linear
  chunk walk when the index is absent.

The reference repo has no video surface (it is an ORC codec library);
this module is part of the task's multimodal-pipeline requirement.
Color convention matches pipeline/jpeg.py: full-range JFIF YCbCr,
nearest-neighbor chroma upsampling, so Y4M C420jpeg and MJPEG frames
convert identically.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_FRAME_MARK = b"FRAME"


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-range JFIF YCbCr -> RGB, same constants as pipeline/jpeg.py."""
    y, cb, cr = (p.astype(np.float64) for p in (y, cb, cr))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.rint(np.stack([r, g, b], axis=-1)).clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Y4M


@dataclass(frozen=True)
class Y4MInfo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str          # C420jpeg / C420 / C420mpeg2 / C422 / C444 / Cmono
    data_start: int          # byte offset of the first FRAME marker
    frame_size: int          # raw plane bytes per frame (marker excluded)
    seekable: bool           # every frame record is the bare b"FRAME\n"
    frame_count: int


def _chroma_shape(colorspace: str, w: int, h: int) -> tuple[int, int] | None:
    if colorspace.startswith("C420"):
        return (h + 1) // 2, (w + 1) // 2
    if colorspace.startswith("C422"):
        return h, (w + 1) // 2
    if colorspace.startswith("C444"):
        return h, w
    if colorspace == "Cmono":
        return None
    raise NotImplementedError(f"Y4M colorspace {colorspace!r}")


def parse_y4m(payload: bytes) -> Y4MInfo:
    """Parse the stream header and index the frame layout.

    Seekability is probed, not assumed: frame 0's record length is
    taken as canonical only if the byte right after it is another bare
    marker (or EOF); otherwise seeks degrade to a linear walk.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = 0
    fps_num, fps_den = 25, 1
    colorspace = "C420jpeg"  # spec default
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            colorspace = tok.decode("ascii")
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    cshape = _chroma_shape(colorspace, w, h)
    frame_size = w * h + (2 * cshape[0] * cshape[1] if cshape else 0)
    data_start = nl + 1
    # probe frame records: bare marker => closed-form offsets
    seekable = True
    count = 0
    pos = data_start
    n = len(payload)
    bare = len(_FRAME_MARK) + 1  # b"FRAME\n"
    while pos < n:
        if payload[pos:pos + len(_FRAME_MARK)] != _FRAME_MARK:
            raise ValueError(f"Y4M frame marker missing at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated Y4M frame header")
        if fnl - pos + 1 != bare:
            seekable = False
        body = fnl + 1
        if body + frame_size > n:
            raise ValueError("truncated Y4M frame payload")
        count += 1
        pos = body + frame_size
    return Y4MInfo(w, h, fps_num, fps_den, colorspace, data_start,
                   frame_size, seekable, count)


def _y4m_frame_offset(info: Y4MInfo, payload: bytes, idx: int) -> int:
    """Byte offset of frame ``idx``'s plane data. O(1) for bare-marker
    streams (verified against the marker bytes), linear otherwise."""
    if not 0 <= idx < info.frame_count:
        raise IndexError(f"frame {idx} out of range 0..{info.frame_count - 1}")
    bare = len(_FRAME_MARK) + 1
    if info.seekable:
        off = info.data_start + idx * (bare + info.frame_size)
        if payload[off:off + bare] != _FRAME_MARK + b"\n":
            raise ValueError(f"Y4M seek landed off-marker at byte {off}")
        return off + bare
    pos = info.data_start
    for _ in range(idx):
        fnl = payload.find(b"\n", pos)
        pos = fnl + 1 + info.frame_size
    return payload.find(b"\n", pos) + 1


def y4m_frame_planes(payload: bytes, idx: int,
                     info: Y4MInfo | None = None
                     ) -> tuple[np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Raw (y, cb, cr) planes of frame ``idx`` (cb/cr None for Cmono).

    Only the requested frame's bytes are materialized — the sampler's
    cost is O(frames kept), not O(frames stored)."""
    info = info or parse_y4m(payload)
    off = _y4m_frame_offset(info, payload, idx)
    w, h = info.width, info.height
    y = np.frombuffer(payload, np.uint8, w * h, off).reshape(h, w)
    cshape = _chroma_shape(info.colorspace, w, h)
    if cshape is None:
        return y, None, None
    csz = cshape[0] * cshape[1]
    cb = np.frombuffer(payload, np.uint8, csz, off + w * h).reshape(cshape)
    cr = np.frombuffer(payload, np.uint8, csz, off + w * h + csz).reshape(cshape)
    return y, cb, cr


def decode_y4m_frame(payload: bytes, idx: int,
                     info: Y4MInfo | None = None) -> np.ndarray:
    """Frame ``idx`` as (h, w, 3) uint8 RGB (gray replicated for Cmono)."""
    info = info or parse_y4m(payload)
    y, cb, cr = y4m_frame_planes(payload, idx, info)
    if cb is None:
        return np.repeat(y[:, :, None], 3, axis=2)
    h, w = y.shape
    cb = np.repeat(np.repeat(cb, -(-h // cb.shape[0]), axis=0),
                   -(-w // cb.shape[1]), axis=1)[:h, :w]
    cr = np.repeat(np.repeat(cr, -(-h // cr.shape[0]), axis=0),
                   -(-w // cr.shape[1]), axis=1)[:h, :w]
    return _ycbcr_to_rgb(y, cb, cr)


def encode_y4m(frames: list[tuple[np.ndarray, np.ndarray | None, np.ndarray | None]],
               fps: tuple[int, int] = (25, 1),
               colorspace: str = "C420jpeg") -> bytes:
    """Fixture encoder: planar YUV frames -> a bare-marker Y4M stream.

    ``frames`` is a list of (y, cb, cr) uint8 plane tuples matching
    ``colorspace`` geometry (cb/cr None for Cmono)."""
    if not frames:
        raise ValueError("need at least one frame")
    y0 = frames[0][0]
    h, w = y0.shape
    cshape = _chroma_shape(colorspace, w, h)
    head = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
            f"{colorspace}\n").encode("ascii")
    parts = [head]
    for y, cb, cr in frames:
        if y.shape != (h, w):
            raise ValueError("inconsistent frame geometry")
        parts.append(_FRAME_MARK + b"\n")
        parts.append(np.ascontiguousarray(y, np.uint8).tobytes())
        if cshape is not None:
            for pl in (cb, cr):
                if pl is None or pl.shape != cshape:
                    raise ValueError(f"chroma plane must be {cshape}")
                parts.append(np.ascontiguousarray(pl, np.uint8).tobytes())
    return b"".join(parts)


def rgb_to_y4m_frames(rgb_frames: np.ndarray, colorspace: str = "C420jpeg"
                      ) -> list[tuple[np.ndarray, np.ndarray | None, np.ndarray | None]]:
    """(n, h, w, 3) uint8 RGB -> planar YUV tuples (JFIF matrix; chroma
    box-mean subsampled for C420*, matching encode_jpeg's '420')."""
    out = []
    for img in rgb_frames:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        y, cb, cr = (np.rint(p).clip(0, 255).astype(np.uint8)
                     for p in (y, cb, cr))
        if colorspace.startswith("C420"):
            h, w = y.shape
            if h % 2 or w % 2:
                raise ValueError("C420 fixtures need even dimensions")
            cb = np.rint(cb.reshape(h // 2, 2, w // 2, 2)
                         .mean(axis=(1, 3))).astype(np.uint8)
            cr = np.rint(cr.reshape(h // 2, 2, w // 2, 2)
                         .mean(axis=(1, 3))).astype(np.uint8)
        elif not colorspace.startswith("C444"):
            raise NotImplementedError(colorspace)
        out.append((y, cb, cr))
    return out


# ---------------------------------------------------------------------------
# MJPEG-in-AVI (RIFF)


@dataclass(frozen=True)
class AviInfo:
    width: int
    height: int
    usec_per_frame: int
    frame_count: int
    movi_start: int                      # offset of the b"movi" fourcc
    movi_end: int
    index: list[tuple[int, int]] | None  # (abs chunk offset, size) per frame


def _riff_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > len(payload):
            raise ValueError(f"truncated RIFF chunk {fourcc!r} at {pos}")
        yield fourcc, body, size
        pos = body + size + (size & 1)    # chunks are word-aligned


def parse_avi(payload: bytes) -> AviInfo:
    """Parse an AVI container far enough to locate video frames.

    Only what the sampler needs: avih geometry/timing, the ``movi``
    run, and the ``idx1`` index when present. Index offsets are
    validated against the actual chunk bytes in both conventions
    (movi-relative per spec, absolute as written by some muxers);
    a corrupt index is discarded rather than trusted."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') file")
    w = h = uspf = total = 0
    movi_start = movi_end = -1
    raw_index: list[tuple[bytes, int, int]] = []
    for fourcc, body, size in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST":
            kind = payload[body:body + 4]
            if kind == b"hdrl":
                for f2, b2, s2 in _riff_chunks(payload, body + 4, body + size):
                    if f2 == b"avih" and s2 >= 40:
                        (uspf, _, _, _, total, _, _, _, w, h) = \
                            struct.unpack_from("<10I", payload, b2)
            elif kind == b"movi":
                movi_start, movi_end = body, body + size
        elif fourcc == b"idx1":
            for off in range(body, body + size - 15, 16):
                ckid = payload[off:off + 4]
                _, coff, csz = struct.unpack_from("<3I", payload, off + 4)
                raw_index.append((ckid, coff, csz))
    if movi_start < 0:
        raise ValueError("AVI has no movi list")
    index: list[tuple[int, int]] | None = None
    vids = [(coff, csz) for ckid, coff, csz in raw_index
            if ckid.endswith(b"dc") or ckid.endswith(b"db")]
    if vids:
        # resolve the offset convention against the first entry
        for base in (movi_start, 0):
            coff, csz = vids[0]
            p = base + coff
            ck = payload[p:p + 4]
            if (ck.endswith(b"dc") or ck.endswith(b"db")) and \
                    struct.unpack_from("<I", payload, p + 4)[0] == csz:
                index = [(base + o + 8, s) for o, s in vids]
                break
    frame_count = len(index) if index is not None else sum(
        1 for fc, _, _ in _riff_chunks(payload, movi_start + 4, movi_end)
        if fc.endswith(b"dc") or fc.endswith(b"db"))
    return AviInfo(w, h, uspf or 40000, frame_count,
                   movi_start, movi_end, index)


def avi_frame_bytes(payload: bytes, idx: int,
                    info: AviInfo | None = None) -> bytes:
    """Raw chunk bytes (a whole JPEG for MJPEG) of video frame ``idx``.
    Index seek when idx1 validated; linear movi walk otherwise."""
    info = info or parse_avi(payload)
    if not 0 <= idx < info.frame_count:
        raise IndexError(f"frame {idx} out of range 0..{info.frame_count - 1}")
    if info.index is not None:
        off, size = info.index[idx]
        return payload[off:off + size]
    k = 0
    for fc, body, size in _riff_chunks(payload, info.movi_start + 4,
                                       info.movi_end):
        if fc.endswith(b"dc") or fc.endswith(b"db"):
            if k == idx:
                return payload[body:body + size]
            k += 1
    raise ValueError("frame chunk not found")   # pragma: no cover


def decode_avi_frame(payload: bytes, idx: int,
                     info: AviInfo | None = None) -> np.ndarray:
    """MJPEG frame ``idx`` as (h, w, 3) uint8 RGB via pipeline/jpeg.py."""
    from .jpeg import decode_jpeg

    img = decode_jpeg(bytes(avi_frame_bytes(payload, idx, info)))
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return img


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: float = 25.0, write_index: bool = True) -> bytes:
    """Fixture muxer: pre-encoded JPEG frames -> a minimal valid AVI
    (hdrl with avih+strl, movi of 00dc chunks, optional idx1)."""
    uspf = int(round(1_000_000 / fps))
    n = len(jpeg_frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack("<14I", uspf, 0, 0, 0x10, n, 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<2H", 0, 0)
            + struct.pack("<8I", 0, 1, int(round(fps)), 0, n, 0, 0, 0)
            + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<I2i2H2I2i2I", 40, width, height, 1, 24,
                       0x47504A4D, width * height * 3, 0, 0, 0, 0)  # 'MJPG'
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    offsets = []                       # movi-relative offsets per spec
    for jp in jpeg_frames:
        offsets.append(len(movi_body))
        movi_body += chunk(b"00dc", jp)
    movi = chunk(b"LIST", movi_body)
    idx1 = b""
    if write_index:
        ents = b"".join(
            b"00dc" + struct.pack("<3I", 0x10, off, len(jp))
            for off, jp in zip(offsets, jpeg_frames))
        idx1 = chunk(b"idx1", ents)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# dispatch


def video_frame_count(payload: bytes) -> int:
    if payload.startswith(b"YUV4MPEG2"):
        return parse_y4m(payload).frame_count
    if payload[:4] == b"RIFF":
        return parse_avi(payload).frame_count
    raise NotImplementedError("unsupported video container "
                              "(Y4M and MJPEG-AVI decode natively)")


def decode_video_frame(payload: bytes, idx: int) -> np.ndarray:
    """Container-dispatched single-frame decode -> (h, w, 3) uint8."""
    if payload.startswith(b"YUV4MPEG2"):
        return decode_y4m_frame(payload, idx)
    if payload[:4] == b"RIFF":
        return decode_avi_frame(payload, idx)
    raise NotImplementedError("unsupported video container "
                              "(Y4M and MJPEG-AVI decode natively)")


def video_timing(payload: bytes) -> tuple[int, int]:
    """(frame_count, usec_per_frame) for samplers."""
    if payload.startswith(b"YUV4MPEG2"):
        i = parse_y4m(payload)
        return i.frame_count, int(round(1_000_000 * i.fps_den / i.fps_num))
    if payload[:4] == b"RIFF":
        i = parse_avi(payload)
        return i.frame_count, i.usec_per_frame
    raise NotImplementedError("unsupported video container "
                              "(Y4M and MJPEG-AVI decode natively)")
