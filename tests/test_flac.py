"""FLAC codec: exact-roundtrip suite (FLAC is lossless, so the oracle
is array equality, not approximate closeness)."""

from __future__ import annotations

import numpy as np
import pytest

from vectolite_spark.flac import decode_flac, encode_flac, is_flac


def _tone(n=5000, rate=16000, amp=3000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        amp * np.sin(2 * np.pi * 440 * t / rate) + rng.normal(0, 200, n)
    ).astype(np.int16)


def test_mono_roundtrip_exact():
    sig = _tone()
    fb = encode_flac(sig, sample_rate=16000)
    assert is_flac(fb)
    d = decode_flac(fb)
    assert d["sample_rate"] == 16000
    assert d["n_channels"] == 1
    assert d["n_frames"] == len(sig)
    assert d["duration_s"] == pytest.approx(len(sig) / 16000)
    assert np.array_equal(d["samples"][:, 0], sig.astype(np.int32))
    expect_rms = float(np.sqrt((sig.astype(np.float64) ** 2).mean()))
    assert d["rms"] == pytest.approx(expect_rms)
    # compression is real on tonal content (rice + fixed predictors)
    assert len(fb) < 2 * len(sig)  # < raw int16 size


def test_stereo_all_decorrelation_modes_exact():
    sig = _tone()
    stereo = np.stack([sig, (sig * 0.7).astype(np.int16)], axis=1)
    for mode in ("independent", "left-side", "mid-side"):
        fb = encode_flac(stereo, sample_rate=16000, stereo_mode=mode)
        d = decode_flac(fb)
        assert d["n_channels"] == 2
        assert np.array_equal(d["samples"], stereo.astype(np.int32)), mode


def test_lpc_subframe_path_exact():
    # the lpc_test encoder mode emits LPC subframes (order-2 coefs
    # [2, -1], arithmetically the fixed-2 predictor) so the LPC decode
    # path is proven by exact roundtrip too
    sig = _tone()
    fb = encode_flac(sig, sample_rate=16000, lpc_test=True)
    d = decode_flac(fb)
    assert np.array_equal(d["samples"][:, 0], sig.astype(np.int32))


def test_constant_and_odd_tail_blocks():
    const = np.full(3000, 123, dtype=np.int16)
    d = decode_flac(encode_flac(const, sample_rate=8000))
    assert np.array_equal(d["samples"][:, 0], const.astype(np.int32))
    # constant subframes compress to almost nothing
    assert len(encode_flac(const, sample_rate=8000)) < 200
    tail = _tone()[:2500]  # 2500 = 2*1024 + 452: final short frame
    d2 = decode_flac(encode_flac(tail, sample_rate=16000, block_size=1024))
    assert np.array_equal(d2["samples"][:, 0], tail.astype(np.int32))


def test_extreme_amplitudes_exact():
    # full int16 range, alternating sign — worst case for the fixed
    # predictors (huge residuals exercise long unary runs / high params)
    sig = np.array([32767, -32768, 32767, -32768] * 300, dtype=np.int16)
    d = decode_flac(encode_flac(sig, sample_rate=8000))
    assert np.array_equal(d["samples"][:, 0], sig.astype(np.int32))


def test_crc_verification_catches_corruption():
    fb = bytearray(encode_flac(_tone(), sample_rate=16000))
    # flip a bit well inside the first frame's entropy data
    fb[len(fb) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(fb))


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"RIFF definitely not flac")


def test_decode_real_audio_flac_duration():
    from vectolite_spark.multimodal import decode_real

    sig = _tone(n=8000, rate=16000)
    meta = decode_real("audio", encode_flac(sig, sample_rate=16000))
    assert meta["duration_s"] == pytest.approx(0.5)


def test_stream_info_matches_full_decode():
    from vectolite_spark.flac import flac_stream_info

    sig = _tone()
    fb = encode_flac(sig, sample_rate=16000)
    info = flac_stream_info(fb)
    full = decode_flac(fb)
    assert info["sample_rate"] == full["sample_rate"]
    assert info["n_channels"] == full["n_channels"]
    assert info["n_frames"] == full["n_frames"]
    assert info["duration_s"] == full["duration_s"]


def test_fill_byte_before_marker_progressive_jpeg():
    # T.81 B.1.1.2 allows 0xFF fill bytes before any marker; the
    # inter-scan marker walk must skip them, not misparse marker 0xFF
    import numpy as np

    from vectolite_spark.jpeg import decode_jpeg, encode_jpeg

    arr = (np.add.outer(np.arange(16), np.arange(16)) * 5 % 256).astype(
        np.uint8
    )
    jp = bytearray(encode_jpeg(arr, quality_q=2, progressive=True))
    # insert a fill byte before the SECOND DHT (first inter-scan marker)
    i = jp.find(b"\xff\xc4", jp.find(b"\xff\xc4") + 2)
    assert i > 0
    padded = bytes(jp[:i]) + b"\xff" + bytes(jp[i:])
    assert np.array_equal(
        decode_jpeg(padded)["pixels"], decode_jpeg(bytes(jp))["pixels"]
    )
