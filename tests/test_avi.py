"""MJPEG-AVI container codec: round-trip with the repo's own JPEG
codec, metadata truth, frame sampling, and the Spark mapInPandas stage
(real pixels end-to-end, zero native dependencies)."""

from __future__ import annotations

import numpy as np
import pytest

from vectolite_spark.avi import (
    decode_avi_meta,
    encode_mjpeg_avi,
    is_avi,
    iter_video_frames,
    sample_mjpeg_frames,
)
from vectolite_spark.jpeg import encode_jpeg


def _gradient_frame(w, h, shift):
    x = np.arange(w, dtype=np.float64)[None, :]
    y = np.arange(h, dtype=np.float64)[:, None]
    return np.clip((x * 2 + y + shift * 16) % 256, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def mjpeg_avi():
    w, h = 32, 16
    frames = [
        encode_jpeg(_gradient_frame(w, h, i), quality_q=2) for i in range(5)
    ]
    return encode_mjpeg_avi(frames, width=w, height=h, fps=10), frames


def test_signature_and_meta(mjpeg_avi):
    data, frames = mjpeg_avi
    assert is_avi(data)
    assert not is_avi(b"RIFF\x00\x00\x00\x00WAVE")
    m = decode_avi_meta(data)
    assert (m["width"], m["height"], m["n_frames"]) == (32, 16, 5)
    assert m["duration_s"] == pytest.approx(0.5)  # 5 frames @ 10 fps


def test_frame_chunks_round_trip(mjpeg_avi):
    data, frames = mjpeg_avi
    got = list(iter_video_frames(data))
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    # payloads survive container round-trip byte-for-byte (odd sizes
    # exercise the RIFF word-alignment padding)
    assert [f for _, f in got] == frames


def test_sample_every_k_decodes_real_pixels(mjpeg_avi):
    data, _ = mjpeg_avi
    out = sample_mjpeg_frames(data, every_k=2)
    assert [f["frame_index"] for f in out] == [0, 2, 4]
    for i, f in zip([0, 2, 4], out):
        assert (f["width"], f["height"]) == (32, 16)
        # decoded pixel mean tracks the source gradient (quality_q=2 is
        # near-lossless; 3.0 absorbs DCT quantization error)
        want = float(_gradient_frame(32, 16, i).mean())
        assert f["px_mean"] == pytest.approx(want, abs=3.0)


def test_non_mjpeg_stream_raises(mjpeg_avi):
    _, frames = mjpeg_avi
    bogus = encode_mjpeg_avi([b"\x00\x01notjpeg"], width=4, height=4)
    with pytest.raises(NotImplementedError, match="MJPEG"):
        sample_mjpeg_frames(bogus)
    with pytest.raises(ValueError):
        decode_avi_meta(b"not a riff at all")


def test_decode_real_video_avi_meta(mjpeg_avi):
    from vectolite_spark.multimodal import decode_real

    data, _ = mjpeg_avi
    meta = decode_real("video", data)
    assert (meta["width"], meta["height"]) == (32, 16)
    assert meta["duration_s"] == pytest.approx(0.5)


def test_spark_sample_frames_real(spark, mjpeg_avi):
    from vectolite_spark.multimodal import sample_frames_real

    data, _ = mjpeg_avi
    media = spark.createDataFrame(
        [(1, "video", bytearray(data)), (2, "image", bytearray(b"px"))],
        "media_id long, kind string, data binary",
    )
    rows = sample_frames_real(media, every_k=2).collect()
    assert [(r["media_id"], r["frame_index"]) for r in rows] == [
        (1, 0),
        (1, 2),
        (1, 4),
    ]
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)


def test_non_avi_video_payload_hits_codec_seam():
    # an MP4-ish or empty payload must raise the NotImplementedError
    # codec seam, not a misleading container ValueError
    for payload in (b"", b"\x00\x00\x00\x18ftypisom....", b"garbage"):
        with pytest.raises(NotImplementedError, match="AVI"):
            sample_mjpeg_frames(payload)
