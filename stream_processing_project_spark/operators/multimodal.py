"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / frame-sample as Arrow-batched Pandas UDFs.

Beyond the reference's surface (BASELINE.json north star). The container
has no image/audio codecs, so the DECODE STEP IS STUBBED with a
deterministic fake (clearly marked below); everything Spark-side — the
binary column, metadata struct, mapInPandas batch shape, partitioning —
is real and tested. Swap `_fake_decode` for a real codec (PIL/ffmpeg)
and nothing else changes.

Scale notes: binary payloads ride in parquet as byte arrays; decode is
mapInPandas so each task streams Arrow batches (bounded memory however
large the table); never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, kind string, n_bytes int, width int, height int, "
    "n_frames int, sample_rate int"
)

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal table shape from the documents fixture: an
    opaque binary payload (utf-8 bytes stand in for media bytes) plus a
    typed metadata struct — the schema a real ingest would produce."""
    kind = (
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, "image")
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            kind.alias("kind"),
            F.octet_length(payload).alias("n_bytes"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("media_meta"),
    )


def _fake_decode(kind: str, n_bytes: int) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE decode (STUB — replace with PIL/ffmpeg).
    Derives plausible media dimensions purely from byte length so the
    pipeline is testable and oracle-checkable end to end."""
    width = 16 + (n_bytes % 64) * 8
    height = 16 + (n_bytes % 48) * 8
    n_frames = 1 if kind == "image" else 1 + n_bytes % 24
    sample_rate = 16000 if kind == "audio" else 0
    return width, height, n_frames, sample_rate


def decode_media(media: DataFrame, use_real_decoders: bool = False) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow batches in, fixed
    DECODED_SCHEMA out. The Spark plumbing (batch iteration, schema,
    binary handling) is the real article; only the codec is stubbed."""
    if use_real_decoders and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError(
            "real media decoders (PIL/ffmpeg) are not installed in this "
            "environment; run with use_real_decoders=False for the "
            "deterministic stub"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            kind = pdf["kind"]
            decoded = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": kind,
                    "n_bytes": n_bytes.astype("int32"),
                    "width": (16 + (n_bytes % 64) * 8).astype("int32"),
                    "height": (16 + (n_bytes % 48) * 8).astype("int32"),
                    "n_frames": (
                        (kind == "image").astype("int32")
                        + (kind != "image").astype("int32") * (1 + n_bytes % 24)
                    ).astype("int32"),
                    "sample_rate": ((kind == "audio").astype("int32") * 16000),
                }
            )
            yield decoded

    flat = media.select(
        "doc_id", F.col("media_meta.kind").alias("kind"), "payload"
    )
    return flat.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame sampling plan for video rows: which frame indices a real
    extractor would pull — pure column expressions (sequence + filter)."""
    return (
        decoded.filter(F.col("kind") == "video")
        .select(
            "doc_id",
            "n_frames",
            F.expr(
                f"filter(sequence(0, n_frames - 1), i -> i % {every_nth} = 0)"
            ).alias("sampled_frames"),
        )
        .withColumn("n_sampled", F.size("sampled_frames"))
    )


def resize_plan(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize planning for image/video rows: aspect-preserving letterbox
    into target_w×target_h — output dims, uniform scale factor, and
    padding. Pure column arithmetic over the decoded metadata (the pixel
    work itself belongs in the decode UDF; planning stays JVM-side so a
    100 TB catalog can be resize-planned without touching payload
    bytes). scale = min(tw/w, th/h); out = floor(dim × scale); pad =
    target − out."""
    scale = F.least(
        F.lit(target_w) / F.col("width"), F.lit(target_h) / F.col("height")
    )
    out_w = F.floor(F.col("width") * scale).cast("int")
    out_h = F.floor(F.col("height") * scale).cast("int")
    return decoded.filter(F.col("kind").isin("image", "video")).select(
        "doc_id",
        "kind",
        "width",
        "height",
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        (F.lit(target_w) - out_w).alias("pad_w"),
        (F.lit(target_h) - out_h).alias("pad_h"),
    )


def feature_embedding(media: DataFrame, dim: int = 16) -> DataFrame:
    """Pseudo feature-embedding from the binary payload: byte i of the
    payload scaled to [0, 1) for the first `dim` bytes — the
    deterministic stand-in for a real vision/audio encoder (same
    STUB-the-codec contract as decode_media: the column plumbing,
    normalization, and downstream retrieval are real; swap in a model
    UDF and nothing else changes). Payloads shorter than dim are
    dropped (a real encoder has a minimum input size too)."""
    return (
        media.filter(F.octet_length("payload") >= dim)
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, {dim}),"
                f" i -> cast(ascii(substring(cast(payload AS string), i, 1)) AS double)"
                f"      / 256.0)"
            ).alias("embedding"),
        )
    )
