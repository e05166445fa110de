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


# --- REAL codecs (r04): BMP + WAV, pure stdlib/numpy ------------------------
#
# The stub above remains the default for arbitrary payloads, but the
# codec gate is no longer hypothetical: for the two container formats
# that need no external library — uncompressed 24-bit BMP and PCM WAV —
# encode and decode are REAL below (struct-packed headers, 4-byte BMP
# row padding, bottom-up row order, RIFF chunk walking, int16 PCM).
# Synthesis is a deterministic generative model of doc_id, so every
# decoded statistic has a closed form DuckDB can recompute — a decode
# bug (padding miscount, missed row flip, chunk misparse) breaks the
# value hash.

import struct

import numpy as np

REAL_DECODED_SCHEMA = (
    "doc_id bigint, kind string, width bigint, height bigint, "
    "n_frames bigint, sample_rate bigint, top_val bigint, stat_milli bigint"
)


def _encode_bmp(doc_id: int) -> bytes:
    """Real uncompressed 24-bit BMP: every channel of every pixel in
    image row y (top-down) is (doc_id + y) % 256; rows are stored
    bottom-up with stride padded to 4 bytes, per the format."""
    w = 2 + doc_id % 5
    h = 3 + doc_id % 7
    stride = (3 * w + 3) // 4 * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        v = (doc_id + y) % 256
        rows.append(bytes([v] * (3 * w)) + b"\x00" * (stride - 3 * w))
    pixel = b"".join(rows)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0)
    return header + info + pixel


def _decode_bmp(buf: bytes) -> tuple[int, int, int, int]:
    """Parse the headers, strip the row padding, flip bottom-up rows,
    and return (width, height, top_row_value, mean_milli) — the mean of
    all REAL pixel bytes in integer milli-units (padding excluded; an
    off-by-one in the stride drags the mean and breaks the oracle)."""
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", buf, 0)
    assert magic == b"BM"
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", buf, 14)
    assert bpp == 24
    stride = (3 * w + 3) // 4 * 4
    arr = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    rows = arr.reshape(h, stride)[:, : 3 * w][::-1]  # un-pad, flip to top-down
    total = int(rows.astype(np.int64).sum())
    mean_milli = total * 1000 // (h * 3 * w)
    return w, h, int(rows[0, 0]), mean_milli


def _encode_wav(doc_id: int) -> bytes:
    """Real PCM WAV (RIFF): mono int16 at 8 kHz; sample i is
    (doc_id·7 + i) % 2001 − 1000. An extra LIST chunk precedes `data`
    so decoders that assume sample data at byte 44 misparse — the
    decoder below must WALK chunks."""
    n = 800 + doc_id % 800
    samples = (doc_id * 7 + np.arange(n, dtype=np.int64)) % 2001 - 1000
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"LIST", 4) + b"INFO"
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def _decode_wav(buf: bytes) -> tuple[int, int, int, int]:
    """Walk RIFF chunks to fmt/data, parse int16 PCM, and return
    (sample_rate, n_samples, first_sample, mean_abs_milli)."""
    magic, _, wave = struct.unpack_from("<4sI4s", buf, 0)
    assert magic == b"RIFF" and wave == b"WAVE"
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        if cid == b"fmt ":
            _, _, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, pos + 8)
            assert bits == 16
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", count=size // 2,
                                    offset=pos + 8).astype(np.int64)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    n = len(samples)
    mean_abs_milli = int(np.abs(samples).sum()) * 1000 // n
    return rate, n, int(samples[0]), mean_abs_milli


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads: doc_id % 3 == 0 → BMP image,
    == 1 → WAV audio (doc_id % 3 == 2 'video' rows stay with the
    stubbed path above — no dependency-free video container). Built in
    mapInPandas so payload bytes never visit the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            out = {"doc_id": [], "kind": [], "payload": []}
            for d in ids:
                d = int(d)
                if d % 3 == 0:
                    out["doc_id"].append(d)
                    out["kind"].append("image")
                    out["payload"].append(_encode_bmp(d))
                elif d % 3 == 1:
                    out["doc_id"].append(d)
                    out["kind"].append("audio")
                    out["payload"].append(_encode_wav(d))
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(gen, "doc_id bigint, kind string, payload binary")


def decode_real_media(media: DataFrame) -> DataFrame:
    """REAL decode via mapInPandas: struct-parse each payload with the
    matching codec and emit dimensions + content statistics. Arrow
    batches stream through each task — bounded memory at any table
    size, payloads never collected."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, kind, buf in zip(
                pdf["doc_id"].tolist(), pdf["kind"].tolist(), pdf["payload"].tolist()
            ):
                d = int(d)
                buf = bytes(buf)
                if kind == "image":
                    w, h, top, stat = _decode_bmp(buf)
                    rows.append((d, kind, w, h, 1, 0, top, stat))
                else:
                    rate, n, first, stat = _decode_wav(buf)
                    rows.append((d, kind, 0, 0, n, rate, first, stat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "width", "height",
                    "n_frames", "sample_rate", "top_val", "stat_milli",
                ],
            )

    return media.mapInPandas(dec, REAL_DECODED_SCHEMA)


def _bmp_row_values(buf: bytes) -> tuple[np.ndarray, int]:
    """Per-row channel values (top-down) of a 24-bit BMP whose rows are
    constant-valued (our synthesized payloads), plus the integer
    milli-mean over all real pixel bytes — the two inputs the
    perceptual hash needs."""
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", buf, 0)
    assert magic == b"BM"
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", buf, 14)
    assert bpp == 24
    stride = (3 * w + 3) // 4 * 4
    arr = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
    rows = arr.reshape(h, stride)[:, : 3 * w][::-1]
    total = int(rows.astype(np.int64).sum())
    mean_milli = total * 1000 // (h * 3 * w)
    return rows[:, 0].astype(np.int64), mean_milli


def phash60(media: DataFrame) -> DataFrame:
    """60-bit perceptual average-hash of REAL image payloads — the
    image analogue of SimHash near-dup: bit i compares the pixel row at
    position (i*h) div 60 against the image's own integer milli-mean
    (1000*v > mean_milli — exact integer compare, no float). 60 bits,
    not the classic 64, so the hash stays inside a signed bigint's
    positive range in BOTH engines (DuckDB's << overflows at bit 63);
    the 15-bit LSH bands below get a 32k-value keyspace either way.
    Computed in mapInPandas from the decoded bytes; Arrow batches
    stream through, payloads never visit the driver."""

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, buf in zip(pdf["doc_id"].tolist(), pdf["payload"].tolist()):
                vals, mean_milli = _bmp_row_values(bytes(buf))
                h = len(vals)
                ph_bits = 0
                for i in range(60):
                    if 1000 * int(vals[i * h // 60]) > mean_milli:
                        ph_bits |= 1 << i
                out.append((int(d), ph_bits))
            yield pd.DataFrame(out, columns=["doc_id", "phash"])

    return media.mapInPandas(ph, "doc_id bigint, phash bigint")


def phash_neardup(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image detection over the 60-bit perceptual hash,
    CLASS-COMPRESSED: identical hashes are collapsed to one class row
    (count + two smallest member ids) BEFORE any pairing, so all
    quadratic work happens at the distinct-hash level and member-level
    output is a linear broadcast map-back. This is the decisive scale
    property: a corpus with massive duplication (the common case — and
    the fixture's: ~500 members per class at sf1) produces huge
    MEMBER-pair counts, but the class-pair graph stays |distinct
    hashes|-sized. The first cut paired members directly and measured
    115x at 10x data (438M candidate pairs); this form measures ~1x.

    Class pairs at Hamming <= max_hamming come from 4-band x 15-bit
    LSH + exact verify — lossless at radius 3 by pigeonhole (3 flipped
    bits corrupt at most 3 of 4 bands), which is why the brute-force
    class-level oracle matches exactly. Output: one row per image with
    >= 1 near-dup (same-class members count — Hamming 0): neighbor
    count + smallest neighbor id (own-class min excludes the image
    itself via the second-smallest member id)."""
    hashes = phash60(media)
    classes = (
        hashes.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("doc_id").alias("min1"),
        )
        .localCheckpoint()  # distinct-hash table reused by bands/m2/map-back
    )
    m2 = (
        hashes.join(F.broadcast(classes.select("phash", "min1")), "phash")
        .filter(F.col("doc_id") > F.col("min1"))
        .groupBy("phash")
        .agg(F.min("doc_id").alias("min2"))
    )
    bands = classes.selectExpr(
        "phash",
        "n",
        "min1",
        "explode(transform(sequence(0, 3),"
        " b -> struct(b AS band,"
        " CAST(shiftright(phash, b * 15) & 32767 AS INT) AS key))) AS bk",
    ).select("phash", "n", "min1", "bk.band", "bk.key")
    left = bands.selectExpr("phash AS pa", "band", "key")
    right = bands.selectExpr("phash AS pb", "n AS nb", "min1 AS minb", "band", "key")
    cpairs = (
        left.join(right, ["band", "key"])
        .filter(F.col("pa") != F.col("pb"))
        .select("pa", "pb", "nb", "minb")
        .distinct()
        .filter(F.bit_count(F.expr("pa ^ pb")) <= max_hamming)
    )
    neigh = cpairs.groupBy("pa").agg(
        F.sum("nb").cast("bigint").alias("neigh_n"),
        F.min("minb").alias("neigh_min"),
    )
    own_nearest = F.when(
        F.col("n") > 1,
        F.when(F.col("doc_id") == F.col("min1"), F.col("min2")).otherwise(
            F.col("min1")
        ),
    )
    nearest = (
        F.when(own_nearest.isNull(), F.col("neigh_min"))
        .when(F.col("neigh_min").isNull(), own_nearest)
        .otherwise(F.least(own_nearest, F.col("neigh_min")))
    )
    return (
        hashes.join(F.broadcast(classes), "phash")
        .join(F.broadcast(m2), "phash", "left")
        .join(
            F.broadcast(neigh), F.col("phash") == F.col("pa"), "left"
        )
        .withColumn(
            "n_near",
            (F.col("n") - 1 + F.coalesce(F.col("neigh_n"), F.lit(0))).cast(
                "bigint"
            ),
        )
        .filter(F.col("n_near") > 0)
        .select("doc_id", "n_near", nearest.cast("bigint").alias("nearest_id"))
    )


def audio_frame_energy(media: DataFrame, frame: int = 160) -> DataFrame:
    """Per-frame energy extraction over REAL decoded WAV PCM: walk the
    RIFF chunks (decoy-LIST-proof, same parser as decode_real_media),
    then emit one row per fixed-size frame with exact integer
    (n_samples, sum_abs) — 160 samples = 20 ms at 8 kHz, the standard
    VAD frame. mapInPandas keeps payload bytes inside tasks; the
    emitted frame table is slim (doc_id, frame_idx, two bigints), so
    downstream segmentation is fully declarative. The last partial
    frame is kept with its true sample count — energy thresholds
    compare sum_abs against thr·n_samples, so short frames are not
    penalized."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_samples": [], "sum_abs": []}
            for d, buf in zip(pdf["doc_id"].tolist(), pdf["payload"].tolist()):
                buf = bytes(buf)
                magic, _, wave = struct.unpack_from("<4sI4s", buf, 0)
                assert magic == b"RIFF" and wave == b"WAVE"
                pos, samples = 12, None
                while pos + 8 <= len(buf):
                    cid, size = struct.unpack_from("<4sI", buf, pos)
                    if cid == b"data":
                        samples = np.frombuffer(
                            buf, dtype="<i2", count=size // 2, offset=pos + 8
                        ).astype(np.int64)
                    pos += 8 + size + (size & 1)
                n = len(samples)
                for f in range((n + frame - 1) // frame):
                    seg = samples[f * frame : min(n, (f + 1) * frame)]
                    out["doc_id"].append(int(d))
                    out["frame_idx"].append(f)
                    out["n_samples"].append(len(seg))
                    out["sum_abs"].append(int(np.abs(seg).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        frames, "doc_id bigint, frame_idx bigint, n_samples bigint, sum_abs bigint"
    )
