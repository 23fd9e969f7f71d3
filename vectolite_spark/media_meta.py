"""Container-level metadata decoders for compressed media — stdlib only.

JPEG got a full pixel decoder (``vectolite_spark.jpeg``); for MP3 and
MP4 the honest container-metadata line is drawn here: frame-header /
box-structure parsing gives TRUE duration, sample rate, bitrate, and
video dimensions without any codec DSP. Actual PCM/pixel decode of
MPEG audio/video stays gated behind external libraries — but a training
-data pipeline's multimodal columns mostly need exactly this metadata
(duration for sampling budgets, dimensions for resize planning, bitrate
for quality filters), and it is pure public-spec arithmetic:

- MP3: ISO 11172-3 / 13818-3 frame headers — sync walk with the
  bitrate/samplerate tables, ID3v2 skip, per-frame duration sum.
- MP4: ISO 14496-12 box tree — moov/mvhd for timescale+duration,
  trak/tkhd for the video track's 16.16 fixed-point width/height.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio) frame-header walk
# ---------------------------------------------------------------------------

# bitrate kbps tables, indexed [version_group][layer][bitrate_index];
# version_group 0 = MPEG-1, 1 = MPEG-2/2.5; layer index 1..3
_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1  (version bits 11)
    2: [22050, 24000, 16000],  # MPEG-2  (version bits 10)
    0: [11025, 12000, 8000],   # MPEG-2.5 (version bits 00)
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    b = data[6:10]
    return 10 + ((b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14 | (b[2] & 0x7F) << 7 | (b[3] & 0x7F))


def parse_mp3_frame_header(data: bytes, pos: int):
    """Parse one frame header at ``pos``; returns
    (frame_bytes, samples, sample_rate, bitrate_bps) or None if invalid."""
    if pos + 4 > len(data):
        return None
    h = struct.unpack(">I", data[pos : pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 0x3  # 1=III, 2=II, 3=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    if version == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    vgroup = 0 if version == 3 else 1
    kbps = _BITRATES[(vgroup, layer)][br_idx]
    sr = _SAMPLE_RATES[version][sr_idx]
    if layer == 1:
        samples = 384
        frame_len = (12 * kbps * 1000 // sr + padding) * 4
    elif layer == 2:
        samples = 1152
        frame_len = 144 * kbps * 1000 // sr + padding
    else:  # layer III
        samples = 1152 if version == 3 else 576
        per = 144 if version == 3 else 72
        frame_len = per * kbps * 1000 // sr + padding
    if frame_len <= 4:
        return None
    return frame_len, samples, sr, kbps * 1000


def decode_mp3_meta(data: bytes) -> dict:
    """Walk every MPEG audio frame: true duration, dominant sample rate,
    average bitrate. Raises ValueError when no valid frame is found."""
    pos = _id3v2_size(data)
    n_frames = 0
    total_samples = 0
    total_bits = 0
    sr_seen: dict[int, int] = {}
    while pos + 4 <= len(data):
        parsed = parse_mp3_frame_header(data, pos)
        if parsed is None:
            if n_frames == 0:
                pos += 1  # resync until the first real frame
                continue
            break  # trailing garbage / ID3v1 after valid frames
        frame_len, samples, sr, bps = parsed
        n_frames += 1
        total_samples += samples / sr
        total_bits += bps * samples / sr
        sr_seen[sr] = sr_seen.get(sr, 0) + 1
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frame found")
    duration = total_samples
    return {
        "n_frames": n_frames,
        "sample_rate": max(sr_seen, key=lambda k: (sr_seen[k], k)),
        "duration_s": round(duration, 6),
        "bitrate_bps": int(round(total_bits / duration)) if duration else 0,
    }


def is_mp3(data: bytes) -> bool:
    if data[:3] == b"ID3":
        return True
    pos = 0
    while pos + 4 <= min(len(data), 4096):
        if parse_mp3_frame_header(data, pos) is not None:
            return True
        pos += 1
    return False


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format box tree
# ---------------------------------------------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    for btype, bstart, bend in _iter_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return bstart, bend
            return _find_box(data, bstart, bend, path[1:])
    return None


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def decode_mp4_meta(data: bytes) -> dict:
    """Parse the moov box tree: duration from mvhd, video dimensions from
    the first trak whose tkhd has non-zero width/height (16.16 fixed
    point). Raises ValueError when moov/mvhd is absent."""
    span = _find_box(data, 0, len(data), [b"moov"])
    if span is None:
        raise ValueError("MP4 has no moov box")
    mstart, mend = span
    mv = _find_box(data, mstart, mend, [b"mvhd"])
    if mv is None:
        raise ValueError("MP4 moov has no mvhd")
    vstart, _vend = mv
    version = data[vstart]
    if version == 1:
        timescale, duration = struct.unpack(
            ">IQ", data[vstart + 20 : vstart + 32]
        )
    else:
        timescale, duration = struct.unpack(
            ">II", data[vstart + 12 : vstart + 20]
        )
    width = height = None
    for btype, bstart, bend in _iter_boxes(data, mstart, mend):
        if btype != b"trak":
            continue
        tk = _find_box(data, bstart, bend, [b"tkhd"])
        if tk is None:
            continue
        tstart, tend = tk
        # width/height are the LAST 8 bytes of tkhd regardless of version
        w_fp, h_fp = struct.unpack(">II", data[tend - 8 : tend])
        if w_fp and h_fp:
            width, height = w_fp >> 16, h_fp >> 16
            break
    return {
        "timescale": timescale,
        "duration_s": round(duration / timescale, 6) if timescale else 0.0,
        "width": width,
        "height": height,
    }
