"""Multimodal binary-column plumbing (decode stubbed, pipeline real)."""

from __future__ import annotations

import pytest

from vectolite_spark.multimodal import (
    attach_fake_media,
    decode_fake,
    decode_real,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, f"payload {'x' * (i * 100)}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return attach_fake_media(df)


def test_media_schema_and_kinds(media):
    assert dict(media.dtypes)["data"] == "binary"
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert kinds[0] == "image" and kinds[1] == "audio" and kinds[2] == "video"


def test_decode_real_is_gated():
    with pytest.raises(NotImplementedError, match="media libraries"):
        decode_real("image", b"\x89PNG")


def test_extract_features_matches_local_decode(media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    for r in media.collect():
        expected = decode_fake(r["kind"], bytes(r["data"]))
        got = feats[r["media_id"]]
        assert got["n_bytes"] == expected["n_bytes"]
        assert got["width"] == expected["width"]
        assert got["duration_s"] == expected["duration_s"]
        assert got["byte_mean"] == pytest.approx(expected["byte_mean"])
    # typed nulls: images have no duration, audio has no width
    assert feats[0]["duration_s"] is None and feats[0]["width"] is not None
    assert feats[1]["width"] is None and feats[1]["duration_s"] is not None


def test_sample_frames_explodes_video_only(media):
    frames = sample_frames(media, every_n_bytes=100).collect()
    assert frames and all(r["byte_offset"] % 100 == 0 for r in frames)
    vids = {r["media_id"] for r in frames}
    assert vids == {2, 5}  # only kind == video


def test_resize_images_plumbing(spark, sf_dir):
    from vectolite_spark.multimodal import (
        attach_fake_media,
        decode_fake,
        resize_images,
    )
    from vectolite_spark.schema import load_table

    media = attach_fake_media(load_table(spark, sf_dir, "documents").limit(30))
    out = resize_images(media, target_w=32, target_h=32).collect()
    src = {r["media_id"]: (r["kind"], bytes(r["data"])) for r in media.collect()}
    assert len(out) == len(src)
    for r in out:
        kind, data = src[r["media_id"]]
        if kind != "image":
            assert r["width"] is None and bytes(r["data"]) == data  # passthrough
            continue
        assert (r["width"], r["height"]) == (32, 32)
        meta = decode_fake("image", data)
        expect_n = max(1, int(len(data) * 32 * 32 / (meta["width"] * meta["height"])))
        assert len(bytes(r["data"])) == expect_n
