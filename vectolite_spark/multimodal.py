"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (north-star extension): media travels as ``binary`` columns with a
``kind`` discriminator and JSON metadata — the schema, partitioning and UDF
plumbing are real and tested; the actual pixel/sample decoding is STUBBED
(this container has no image/audio libraries). Every stub is clearly marked:
``decode_real`` raises NotImplementedError until Pillow/torchaudio/decord
are importable; ``decode_fake`` is a deterministic byte-level stand-in so
pipelines and oracles can run end-to-end.

Scale notes: decode/feature-extract run via ``mapInPandas`` — one Arrow
batch of binary blobs per call, zero shuffles; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (lower it for video).
Media bytes should live in their own parquet column so column pruning skips
them unless the decode stage actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "duration_s double, byte_sum long, byte_mean double"
)


def decode_real(kind: str, data: bytes):  # pragma: no cover - env-gated
    """REAL decoder — STUB. Wire Pillow / soundfile / decord here when the
    runtime has them; the Spark-side plumbing does not change."""
    raise NotImplementedError(
        f"real {kind} decoding requires media libraries not present in this "
        "environment; use decode_fake (deterministic) or install deps"
    )


def decode_fake(kind: str, data: bytes) -> dict:
    """Deterministic byte-level stand-in for decode: derives typed metadata
    purely from the payload (stable across engines/processes)."""
    n = len(data)
    return {
        "n_bytes": n,
        "width": 16 + n % 640 if kind == "image" else None,
        "height": 16 + (n * 7) % 480 if kind == "image" else None,
        "duration_s": round(n / 1000.0, 6) if kind in ("audio", "video") else None,
        # byte_sum is the EXACT integer; byte_mean is display-only. Cross-
        # engine comparisons must use the integer: round(sum/n, 6) sits
        # exactly on a rounding boundary whenever n has a 2^7 factor and
        # the sum is odd, where python (half-even) and SQL (half-away)
        # disagree (e.g. a 128-byte doc with remainder ≡ 1 mod 4).
        "byte_sum": sum(data),
        "byte_mean": round(sum(data) / n, 6) if n else 0.0,
    }


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo source: wrap a text column as binary media rows (UTF-8 payload)
    with a deterministic kind assignment — exercises the real binary-column
    plumbing without media files."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
    )


def extract_features(media: DataFrame, use_real: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media rows."""

    def mapper(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["data"]) if r["data"] is not None else b""
                meta = (
                    decode_real(r["kind"], data)
                    if use_real
                    else decode_fake(r["kind"], data)
                )
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "n_bytes": meta["n_bytes"],
                        "width": meta["width"],
                        "height": meta["height"],
                        "duration_s": meta["duration_s"],
                        "byte_sum": meta["byte_sum"],
                        "byte_mean": meta["byte_mean"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(mapper, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """Frame-sampling plumbing (video -> frame rows). REAL frame decode is
    stubbed; frames here are byte-offset markers, one per ``every_n_bytes``
    — the explode/partitioning shape is what matters."""
    video = media.filter(F.col("kind") == "video")
    offsets = F.sequence(
        F.lit(0),
        F.greatest(
            (F.octet_length("data") - 1) / every_n_bytes, F.lit(0)
        ).cast("int"),
    )
    return video.select(
        "media_id",
        F.explode(offsets).alias("frame_index"),
    ).withColumn("byte_offset", F.col("frame_index") * every_n_bytes)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224, use_real: bool = False
) -> DataFrame:
    """Image-resize plumbing (the preprocessing step before any vision
    encoder): REAL resampling is stubbed with the rest of decode; the
    deterministic stand-in re-derives the fake source dims and emits a
    payload truncated/padded proportionally to the pixel-count change —
    stable bytes both engines could verify. The Spark-side contract is
    the real one: binary in, binary out, one Arrow batch per call, zero
    shuffle, non-image rows pass through untouched.
    """

    def mapper(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["data"]) if r["data"] is not None else b""
                if r["kind"] != "image":
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "kind": r["kind"],
                            "data": data,
                            "width": None,
                            "height": None,
                        }
                    )
                    continue
                if use_real:  # pragma: no cover - env-gated
                    decode_real("image", data)
                meta = decode_fake("image", data)
                src_px = meta["width"] * meta["height"]
                tgt_px = target_w * target_h
                n = max(1, int(len(data) * tgt_px / src_px)) if src_px else 1
                out = (data * (n // max(1, len(data)) + 1))[:n] if data else b"\x00" * n
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": "image",
                        "data": out,
                        "width": target_w,
                        "height": target_h,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        mapper,
        schema="media_id long, kind string, data binary, width int, height int",
    )
