"""MP3 frame-header and MP4 box-tree metadata decoders.

Fixtures are synthesized from the public specs: MP3 frames are valid
headers + zero payload of the exact computed frame length (a header
walker never looks at the audio payload), MP4 is a hand-packed
ftyp + moov{mvhd, trak{tkhd}} tree.
"""

from __future__ import annotations

import struct

import pytest

from vectolite_spark.media_meta import (
    decode_mp3_meta,
    decode_mp4_meta,
    is_mp3,
    is_mp4,
    parse_mp3_frame_header,
)


def _mp3_frame(kbps_idx=9, sr_idx=0, padding=0):
    """One MPEG-1 Layer III frame: 0xFFFB header, given bitrate/samplerate
    index, zero payload."""
    h = (
        (0x7FF << 21)
        | (3 << 19)      # MPEG-1
        | (1 << 17)      # Layer III
        | (1 << 16)      # no CRC
        | (kbps_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
    )
    hdr = struct.pack(">I", h)
    parsed = parse_mp3_frame_header(hdr, 0)
    assert parsed is not None
    frame_len = parsed[0]
    return hdr + b"\x00" * (frame_len - 4)


def test_mp3_frame_header_math():
    # MPEG-1 L3, idx 9 = 128 kbps, idx 0 = 44100 Hz:
    # 144 * 128000 / 44100 = 417 bytes, 1152 samples
    frame_len, samples, sr, bps = parse_mp3_frame_header(_mp3_frame(), 0)
    assert (frame_len, samples, sr, bps) == (417, 1152, 44100, 128000)


def test_mp3_duration_over_many_frames():
    # 100 frames of 1152 samples @ 44100 Hz = 2.612245 s
    data = _mp3_frame() * 100
    meta = decode_mp3_meta(data)
    assert meta["n_frames"] == 100
    assert meta["sample_rate"] == 44100
    assert meta["duration_s"] == pytest.approx(100 * 1152 / 44100, abs=1e-6)
    assert meta["bitrate_bps"] == 128000


def test_mp3_id3v2_skip_and_trailing_garbage():
    # syncsafe size 0x00 0x00 0x02 0x01 = 257 payload bytes
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 2, 1]) + b"\xff" * 257
    data = id3 + _mp3_frame(kbps_idx=11, sr_idx=1) * 7 + b"TAGgarbage"
    meta = decode_mp3_meta(data)
    assert meta["n_frames"] == 7
    assert meta["sample_rate"] == 48000
    assert is_mp3(data)


def test_mp3_rejects_non_audio():
    with pytest.raises(ValueError, match="no MPEG audio frame"):
        decode_mp3_meta(b"\x00" * 512)
    assert not is_mp3(b"\x00" * 512)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _minimal_mp4(timescale=1000, duration=12_345, w=640, h=360) -> bytes:
    mvhd = (
        b"\x00\x00\x00\x00"          # version 0 + flags
        + struct.pack(">II", 0, 0)    # creation/modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80                # rate..matrix..next_track_id
    )
    tkhd = (
        b"\x00\x00\x00\x07"
        + b"\x00" * 16                # times + track id + reserved
        + b"\x00" * 56                # duration..matrix
        + struct.pack(">II", w << 16, h << 16)
    )
    trak = _box(b"trak", _box(b"tkhd", tkhd))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov + _box(b"mdat", b"\x00" * 32)


def test_mp4_moov_metadata():
    data = _minimal_mp4()
    assert is_mp4(data)
    meta = decode_mp4_meta(data)
    assert meta["timescale"] == 1000
    assert meta["duration_s"] == pytest.approx(12.345)
    assert (meta["width"], meta["height"]) == (640, 360)


def test_mp4_no_moov_raises():
    data = _box(b"ftyp", b"isom") + _box(b"mdat", b"\x00" * 8)
    assert is_mp4(data)
    with pytest.raises(ValueError, match="no moov"):
        decode_mp4_meta(data)


def test_decode_real_mp3_and_mp4():
    from vectolite_spark.multimodal import decode_real

    mp3 = _mp3_frame() * 50
    meta = decode_real("audio", mp3)
    assert meta["duration_s"] == pytest.approx(50 * 1152 / 44100, abs=1e-6)

    mp4 = _minimal_mp4(timescale=600, duration=3000, w=1280, h=720)
    meta = decode_real("video", mp4)
    assert meta["duration_s"] == pytest.approx(5.0)
    assert (meta["width"], meta["height"]) == (1280, 720)


def test_extract_features_real_media_kinds_in_spark(spark):
    from vectolite_spark.multimodal import extract_features

    rows = [
        (1, "audio", bytearray(_mp3_frame() * 25)),
        (2, "video", bytearray(_minimal_mp4(timescale=100, duration=250, w=320, h=240))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, data binary"
    )
    feats = {r["media_id"]: r for r in extract_features(media, use_real=True).collect()}
    assert feats[1]["duration_s"] == pytest.approx(25 * 1152 / 44100, abs=1e-6)
    assert feats[2]["duration_s"] == pytest.approx(2.5)
    assert (feats[2]["width"], feats[2]["height"]) == (320, 240)


def _frame_header(version_bits, layer_bits, kbps_idx, sr_idx, padding=0):
    h = (
        (0x7FF << 21)
        | (version_bits << 19)
        | (layer_bits << 17)
        | (1 << 16)
        | (kbps_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
    )
    return struct.pack(">I", h)


def test_mp3_header_tables_across_versions_and_layers():
    """Spot-check the bitrate/samplerate/length tables beyond MPEG-1 L3:
    Layer I's 4-byte slot math, Layer II, MPEG-2's halved Layer III
    frame, and the padding byte."""
    # MPEG-1 Layer I, idx 4 = 128 kbps, 44100: (12*128000/44100 + 0)*4
    fl, samples, sr, bps = parse_mp3_frame_header(_frame_header(3, 3, 4, 0), 0)
    assert (fl, samples, sr, bps) == ((12 * 128000 // 44100) * 4, 384, 44100, 128000)
    # MPEG-1 Layer II, idx 8 = 128 kbps, 32000 Hz: 144*128000/32000 = 576
    fl, samples, sr, bps = parse_mp3_frame_header(_frame_header(3, 2, 8, 2), 0)
    assert (fl, samples, sr, bps) == (576, 1152, 32000, 128000)
    # MPEG-2 Layer III, idx 8 = 64 kbps, 22050 Hz: 72*64000/22050 = 235,
    # 576 samples per frame
    fl, samples, sr, bps = parse_mp3_frame_header(_frame_header(2, 1, 8, 0), 0)
    assert (fl, samples, sr, bps) == (72 * 64000 // 22050, 576, 22050, 64000)
    # padding adds one byte (Layer III) / one slot = 4 bytes (Layer I)
    base = parse_mp3_frame_header(_frame_header(3, 1, 9, 0), 0)[0]
    padded = parse_mp3_frame_header(_frame_header(3, 1, 9, 0, padding=1), 0)[0]
    assert padded == base + 1
    base1 = parse_mp3_frame_header(_frame_header(3, 3, 4, 0), 0)[0]
    padded1 = parse_mp3_frame_header(_frame_header(3, 3, 4, 0, padding=1), 0)[0]
    assert padded1 == base1 + 4
    # reserved version / bad bitrate / bad samplerate -> rejected
    assert parse_mp3_frame_header(_frame_header(1, 1, 9, 0), 0) is None
    assert parse_mp3_frame_header(_frame_header(3, 1, 15, 0), 0) is None
    assert parse_mp3_frame_header(_frame_header(3, 1, 9, 3), 0) is None


def test_media_meta_never_crashes_on_garbage():
    """Robustness: arbitrary byte soup must yield clean rejections
    (False / ValueError), never an unhandled IndexError/struct.error —
    a 100 TB corpus WILL contain truncated and corrupt media."""
    import random

    rnd = random.Random(3)
    payloads = [
        b"",
        b"\xff",
        b"\xff\xfb",                       # bare sync, truncated header
        b"ID3",                            # truncated ID3 header
        b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f",  # ID3 size > payload
        bytes([0]) * 3,
        struct.pack(">I", 0xFFFB9000),     # header only, no frame body
        b"\x00\x00\x00\x08ftyp",           # ftyp with no content
        b"\x00\x00\x00\xffmoov" + b"\x00" * 4,  # box size beyond buffer
    ] + [bytes(rnd.getrandbits(8) for _ in range(rnd.randrange(0, 200))) for _ in range(30)]
    for p in payloads:
        try:
            if is_mp3(p):
                decode_mp3_meta(p)
        except ValueError:
            pass
        try:
            if is_mp4(p):
                decode_mp4_meta(p)
        except ValueError:
            pass
