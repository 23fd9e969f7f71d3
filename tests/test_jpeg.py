"""Baseline JPEG codec tests (VERDICT r4 item 5).

The container has no image library, so the encoder in
``vectolite_spark.jpeg`` produces the fixtures: every stream it emits is
a spec-conformant baseline JPEG (flat quant table, valid canonical
fixed-length Huffman tables), which the decoder must reproduce within
quantization error. Subsampling and restart-marker variants exercise the
decoder's upsampling and resync paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from vectolite_spark.jpeg import _ZIGZAG, JPEG_SOI, decode_jpeg, encode_jpeg


def _smooth_rgb(h=32, w=48):
    yy, xx = np.indices((h, w))
    return np.stack(
        [
            100 + 40 * np.sin(xx / 20),
            120 + 30 * np.cos(yy / 15),
            90 + 20 * np.sin((xx + yy) / 25),
        ],
        axis=2,
    ).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    # first and last entries of the T.81 zigzag scan
    assert _ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(_ZIGZAG)) == 64


def test_gray_roundtrip_non_multiple_of_8():
    g = (50 + 30 * np.sin(np.arange(24 * 41).reshape(24, 41) / 60)).astype(
        np.uint8
    )
    d = decode_jpeg(encode_jpeg(g, quality_q=2))
    assert (d["width"], d["height"], d["channels"]) == (41, 24, 1)
    err = np.abs(d["pixels"][:, :, 0].astype(float) - g.astype(float))
    assert err.max() <= 3


def test_rgb_444_roundtrip():
    rgb = _smooth_rgb()
    d = decode_jpeg(encode_jpeg(rgb, quality_q=2))
    assert (d["width"], d["height"], d["channels"]) == (48, 32, 3)
    err = np.abs(d["pixels"].astype(float) - rgb.astype(float))
    assert err.max() <= 3 and err.mean() < 1


def test_rgb_420_subsampled_roundtrip():
    rgb = _smooth_rgb(h=30, w=42)  # not a multiple of the 16x16 MCU
    jb = encode_jpeg(rgb, quality_q=2, subsample=True)
    d = decode_jpeg(jb)
    assert (d["width"], d["height"]) == (42, 30)
    err = np.abs(d["pixels"].astype(float) - rgb.astype(float))
    # chroma is box-averaged 2x2 then replicated: small extra error
    assert err.max() <= 6 and err.mean() < 1.5


def test_restart_markers_resync():
    rgb = _smooth_rgb(h=24, w=40)
    for interval in (1, 2, 3):
        plain = decode_jpeg(encode_jpeg(rgb, quality_q=2))["pixels"]
        rst = decode_jpeg(
            encode_jpeg(rgb, quality_q=2, restart_interval=interval)
        )["pixels"]
        # restart markers change the byte stream, never the pixels
        assert np.array_equal(plain, rst)


def test_progressive_roundtrip_pixel_exact():
    # the full progressive scan script transmits every quantized
    # coefficient exactly, so progressive decode must equal baseline
    # decode ARRAY-EXACTLY — one bad EOB run, correction bit, or point
    # transform anywhere breaks equality
    rng = np.random.default_rng(7)
    for shape, sub in [
        ((16, 16, 3), False),   # 4:4:4 color
        ((16, 24, 1), False),   # grayscale (Ns=1 DC scan path)
        ((20, 36, 3), True),    # 4:2:0 (non-interleaved AC grid < MCU grid)
        ((17, 13, 3), False),   # non-multiple-of-8 dims
    ]:
        h, w = shape[0], shape[1]
        base = (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(
            np.float64
        )
        arr = np.stack([base + 10 * i for i in range(shape[2])], axis=2)
        arr = np.clip(arr + rng.normal(0, 8, arr.shape), 0, 255).astype(
            np.uint8
        )
        if shape[2] == 1:
            arr = arr[:, :, 0]
        db = decode_jpeg(encode_jpeg(arr, quality_q=2, subsample=sub))
        dp = decode_jpeg(
            encode_jpeg(arr, quality_q=2, subsample=sub, progressive=True)
        )
        assert db["width"] == dp["width"] and db["height"] == dp["height"]
        assert np.array_equal(db["pixels"], dp["pixels"]), (shape, sub)


def test_progressive_flat_image_eob_runs():
    # a constant image makes every AC band all-zero: the AC scans are
    # pure EOB runs (eobrun accumulation across every block) and the
    # refinement scans are pure run-end buffered paths
    arr = np.full((24, 40, 3), 137, dtype=np.uint8)
    db = decode_jpeg(encode_jpeg(arr, quality_q=2))
    dp = decode_jpeg(encode_jpeg(arr, quality_q=2, progressive=True))
    assert np.array_equal(db["pixels"], dp["pixels"])


def test_progressive_invalid_scan_script_rejected():
    # a baseline-style scan header (Ss=0, Se=63) inside a SOF2 frame is
    # not a legal progressive scan — reject loudly instead of guessing
    jb = bytearray(encode_jpeg(_smooth_rgb(8, 8)))
    i = jb.find(b"\xff\xc0")
    jb[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="scan script"):
        decode_jpeg(bytes(jb))


def test_decode_real_jpeg_dimensions():
    from vectolite_spark.multimodal import decode_real

    jb = encode_jpeg(_smooth_rgb(h=20, w=36), subsample=True)
    assert jb[:2] == JPEG_SOI
    meta = decode_real("image", jb)
    assert (meta["width"], meta["height"]) == (36, 20)
    assert meta["n_bytes"] == len(jb)


def test_extract_features_real_jpeg_in_spark(spark):
    from vectolite_spark.multimodal import extract_features

    jb = encode_jpeg(_smooth_rgb(h=16, w=24))
    media = spark.createDataFrame(
        [(7, "image", bytearray(jb))], "media_id long, kind string, data binary"
    )
    feats = extract_features(media, use_real=True).collect()
    assert (feats[0]["width"], feats[0]["height"]) == (24, 16)


def test_resize_images_real_jpeg(spark):
    from vectolite_spark.multimodal import decode_png, resize_images

    jb = encode_jpeg(_smooth_rgb(h=16, w=16), quality_q=2)
    media = spark.createDataFrame(
        [(1, "image", bytearray(jb))], "media_id long, kind string, data binary"
    )
    out = resize_images(media, target_w=8, target_h=8, use_real=True).collect()
    assert (out[0]["width"], out[0]["height"]) == (8, 8)
    # output container is PNG (lossless re-encode of the resampled pixels)
    img = decode_png(bytes(out[0]["data"]))
    src = decode_jpeg(jb)["pixels"]
    assert np.array_equal(img["pixels"], src[::2, ::2])


def test_jpeg_roundtrip_property():
    """Property sweep: random smooth images of awkward sizes, all three
    encoder modes — decode must reproduce within quantization error
    (flat q=2 table: per-coefficient error <= 1, spatial error bounded
    by the IDCT's l1 gain; chroma subsampling adds its box-average
    error only to chroma-heavy pixels)."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        ch = int(rng.choice([1, 3]))
        # smooth random field: random low-freq cosines (JPEG's home turf)
        yy, xx = np.indices((h, w))
        img = np.zeros((h, w, ch))
        for c in range(ch):
            fx, fy = rng.uniform(0.02, 0.2, 2)
            img[:, :, c] = 128 + 80 * np.cos(fx * xx + rng.uniform(0, 7)) * np.cos(
                fy * yy + rng.uniform(0, 7)
            )
        img = img.astype(np.uint8)
        sub = bool(rng.integers(0, 2)) and ch == 3
        ri = int(rng.integers(0, 4))
        d = decode_jpeg(
            encode_jpeg(img if ch == 3 else img[:, :, 0], quality_q=2,
                        subsample=sub, restart_interval=ri)
        )
        assert (d["width"], d["height"]) == (w, h)
        err = np.abs(d["pixels"].astype(float) - img.astype(float))
        # 4:2:0's box-average loses up to ~half a 2x2 block's chroma
        # gradient (amplitude 80 x freq 0.2 -> ~dozen counts worst-case);
        # a decoder FAULT (wrong filter, desynced Huffman) shows 100+
        limit = 16 if sub else 4
        assert err.max() <= limit, (trial, h, w, ch, sub, ri, err.max())


def test_16bit_quant_table_roundtrip():
    # pq=1 DQT entries are 16-bit big-endian; same flat values, so the
    # decode must equal the 8-bit-table encoding of the same input
    arr = _smooth_rgb(16, 24)
    d8 = decode_jpeg(encode_jpeg(arr, quality_q=2))
    d16 = decode_jpeg(encode_jpeg(arr, quality_q=2, quant_16bit=True))
    assert np.array_equal(d8["pixels"], d16["pixels"])
