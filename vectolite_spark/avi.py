"""Minimal AVI (RIFF) container codec for MJPEG video — stdlib only.

Closes the video leg of the multimodal decode seam (SURVEY §2.9
north-star; no reference counterpart — the reference engine has no media
handling at all): an AVI whose video stream is Motion-JPEG is just a
RIFF tree with one JPEG per ``00dc`` chunk, so the repo's own baseline
JPEG codec (``vectolite_spark.jpeg``) turns container parsing into REAL
frame decode with zero native dependencies. Codecs that need external
libraries (H.264 etc.) still raise NotImplementedError at the
``multimodal.decode_real`` seam — the honest line stays where it was,
it just moved past MJPEG.

Layout notes (public spec: Microsoft "AVI RIFF File Reference"):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader: 14 u32-le>)
        LIST('strl' strh(<AVIStreamHeader>) strf(<BITMAPINFOHEADER>)))
      LIST('movi' 00dc(<jpeg bytes>) 00dc(...) ...)
      [idx1(...)])

Every chunk is ``fourcc u32le-size payload`` padded to even length.
Frame chunks are named ``SSxx`` where SS is the 2-digit stream number
and xx is ``dc`` (compressed) / ``db`` (uncompressed bitmap).
"""

from __future__ import annotations

import struct

AVI_FRAME_SUFFIXES = (b"dc", b"db")


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for the RIFF chunks in
    [start, end); tolerates truncated tails by stopping (garbage
    tolerance mirrors media_meta's MP4 walker)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = pos + 8
        if payload + size > end:
            return
        yield fourcc, payload, size
        pos = payload + size + (size & 1)  # word alignment


def _find_list(data: bytes, start: int, end: int, list_type: bytes):
    """Locate the first LIST chunk of ``list_type``; returns the
    (payload_start, payload_end) of its contents (after the type tag)."""
    for fourcc, payload, size in _iter_chunks(data, start, end):
        if fourcc == b"LIST" and data[payload : payload + 4] == list_type:
            return payload + 4, payload + size
    return None


def decode_avi_meta(data: bytes) -> dict:
    """True container metadata from the ``avih`` main header:
    width/height, frame count, frame interval, duration."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF signature)")
    hdrl = _find_list(data, 12, len(data), b"hdrl")
    if hdrl is None:
        raise ValueError("AVI missing hdrl LIST")
    for fourcc, payload, size in _iter_chunks(data, hdrl[0], hdrl[1]):
        if fourcc == b"avih" and size >= 40:
            v = struct.unpack("<10I", data[payload : payload + 40])
            usec_pf, total_frames, width, height = v[0], v[4], v[8], v[9]
            return {
                "width": width,
                "height": height,
                "n_frames": total_frames,
                "usec_per_frame": usec_pf,
                "duration_s": round(usec_pf * total_frames / 1e6, 6),
            }
    raise ValueError("AVI missing avih header")


def iter_video_frames(data: bytes):
    """Yield (frame_index, raw_bytes) for the stream-00 video frame
    chunks in the ``movi`` list, container order."""
    movi = _find_list(data, 12, len(data), b"movi")
    if movi is None:
        raise ValueError("AVI missing movi LIST")
    idx = 0
    for fourcc, payload, size in _iter_chunks(data, movi[0], movi[1]):
        if fourcc[:2] == b"00" and fourcc[2:] in AVI_FRAME_SUFFIXES:
            yield idx, data[payload : payload + size]
            idx += 1


def sample_mjpeg_frames(data: bytes, every_k: int = 1) -> list[dict]:
    """REAL frame sampling: decode every k-th stream-00 frame with the
    repo's baseline JPEG codec. Returns one dict per sampled frame:
    (frame_index, width, height, px_mean). Non-JPEG frame payloads
    raise NotImplementedError (that codec needs external libraries).

    This is the per-row kernel the ``multimodal.sample_frames_real``
    mapInPandas stage calls — driver-free, numpy-only, deterministic."""
    from vectolite_spark.jpeg import JPEG_SOI, decode_jpeg

    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    if not is_avi(data):
        # same seam as every other codec gap (multimodal.decode_real):
        # non-AVI video needs external libraries, not a container error
        raise NotImplementedError(
            "video payload is not an AVI container — decoding it "
            "requires codec libraries not present in this environment"
        )
    out = []
    for idx, frame in iter_video_frames(data):
        if idx % every_k:
            continue
        if frame[:2] != JPEG_SOI:
            raise NotImplementedError(
                "AVI video stream is not MJPEG — decoding it requires "
                "codec libraries not present in this environment"
            )
        img = decode_jpeg(frame)
        px = img["pixels"]
        out.append(
            {
                "frame_index": idx,
                "width": img["width"],
                "height": img["height"],
                "px_mean": round(float(px.mean()), 6),
            }
        )
    return out


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Assemble already-encoded JPEG frames into a minimal MJPEG AVI —
    the write half of the round-trip (tests synthesize corpora with it;
    a real pipeline would use it to re-shard video after frame-level
    filtering)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    n = len(jpeg_frames)
    usec_pf = int(1e6 // fps)
    max_bytes = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack(
        "<14I",
        usec_pf, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<I", 0)          # flags
        + struct.pack("<HH", 0, 0)      # priority, language
        + struct.pack("<IIIII", 0, 1, fps, 0, n)  # init, scale, rate, start, len
        + struct.pack("<IiI", max_bytes, -1, 0)   # bufsize, quality, samplesize
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
