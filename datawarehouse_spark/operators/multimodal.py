"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star requirement).

The Spark-side plumbing is real and tested: binary payload columns,
typed metadata structs, Arrow-batched ``mapInPandas`` decode/feature
operators with explicit output schemas, and batch-shape control via
``spark.sql.execution.arrow.maxRecordsPerBatch``. The codec step
itself is STUBBED (`decode_media` raises NotImplementedError for real
codecs; `fake_decode_features` is the deterministic stand-in) because
the container ships no image/audio libraries — swapping in PIL/ffmpeg
changes only the inside of the pandas function, not the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor — fixed width, so downstream
#: operators (similarity, dedup) can treat it like any embedding column
FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "byte_mean double, byte_entropy_proxy double, features array<double>"
)


def attach_media(df: DataFrame, id_col: str = "doc_id",
                 text: str = "text") -> DataFrame:
    """Derive a deterministic binary payload column from the fixture
    (md5-chained bytes of the text) + typed metadata struct — the shape
    a real ingest would produce from image/audio files via
    ``spark.read.format('binaryFile')``."""
    payload = F.unhex(
        F.concat(F.md5(F.col(text)), F.md5(F.concat(F.lit("2:"), F.col(text))))
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.lit("fixture/deterministic").alias("codec"),
            F.lit(1).cast("int").alias("version"),
        ).alias("meta"),
    )


def decode_media(kind: str, payload: bytes):  # pragma: no cover - stub
    """Real codec hook. The container has no PIL/ffmpeg/librosa; on a
    production cluster this dispatches per `kind`."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use "
        "fake_decode_features for the deterministic test path"
    )


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame with
    raw bytes; we emit fixed-width numeric features. Deterministic fake
    decode (byte statistics + strided means) stands in for a real
    model/codec — the partitioning, schema and batch shape are exactly
    what a GPU-backed extractor would use.
    """

    def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_mean = payloads.map(lambda b: sum(b) / len(b) if len(b) else 0.0)
            distinct_ratio = payloads.map(
                lambda b: len(set(b)) / len(b) if len(b) else 0.0
            )
            feats = payloads.map(
                lambda b: [
                    (sum(b[i::n_features]) % 256) / 255.0 for i in range(n_features)
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "byte_mean": byte_mean,
                    "byte_entropy_proxy": distinct_ratio,
                    "features": feats,
                }
            )

    return media.mapInPandas(fake_decode_features, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' stub: slice the payload at a fixed stride —
    structurally identical to video frame extraction (one row in, many
    frame rows out) via posexplode. A payload shorter than the stride
    yields ONE partial frame; an empty payload yields none. (The naive
    `sequence(0, n-1)` is a trap here: for n = 0 Spark defaults the
    step to -1 and returns [0, -1] — two fabricated frames.)"""
    frames = F.expr(
        f"CASE WHEN payload IS NULL OR length(payload) = 0 "
        f"THEN array() "
        f"ELSE transform("
        f"sequence(0, CAST(ceil(length(payload) / {every_n_bytes}) AS INT) - 1), "
        f"i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes})) END"
    )
    return media.select(
        "media_id",
        "kind",
        F.posexplode(frames).alias("frame_idx", "frame_bytes"),
    )


def resize_media(media: DataFrame, target_bytes: int = 16) -> DataFrame:
    """'Resize' stub: downsample each payload to ``target_bytes`` by
    strided byte selection — structurally identical to image resize /
    audio resample (payload in → smaller payload out, metadata updated).
    Real codecs plug into the same Arrow batch path (see
    :func:`decode_media`); partitioning, schema, and batch shape are
    production-real, the byte math is the deterministic stand-in.
    """

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def pick(b: bytes) -> bytes:
                if len(b) <= target_bytes:
                    return bytes(b)
                stride = len(b) / target_bytes
                return bytes(b[int(i * stride)] for i in range(target_bytes))

            shrunk = pdf["payload"].map(pick)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": shrunk,
                    "n_bytes": shrunk.map(len),
                }
            )

    return media.mapInPandas(
        shrink, schema="media_id bigint, kind string, payload binary, n_bytes bigint"
    )


def shard_pack(media: DataFrame, size_col: str = "est_bytes",
               id_col: str = "media_id",
               shard_bytes: int = 4 * 1024 * 1024,
               n_blocks: int | None = None) -> DataFrame:
    """WebDataset-style shard packing: assign each media item to a
    sequential tar-shard of ~``shard_bytes`` by running byte total,
    after a deterministic md5 shuffle of the ids (the WebDataset
    recipe — a sorted crawl would otherwise put one domain per shard
    and kill training-time IO randomness). An item starts a new shard
    exactly when the running total before it crosses a shard_bytes
    boundary: shard = (cum_bytes − size) div shard_bytes — greedy
    sequential packing, bit-deterministic, and invariant to where the
    range-partition boundaries fall (the sort key (md5, id) is
    unique).

    Numbering is MONOTONE, not dense: an item larger than
    ``shard_bytes`` occupies several budget windows by itself, so the
    next item's start-offset shard id skips the swallowed indices
    (e.g. a 3×-budget item in shard 4 is followed by shard 7). Tar
    writers must key on the shard VALUE, not assume ids are
    contiguous. Sizes are validated in the data path: a NULL, zero or
    negative ``size_col`` raises at execution rather than silently
    corrupting every downstream running total.

    Scale shape — the shared global-order primitive
    (operators/rank.py::global_cumsum), accumulating BYTES instead of
    rank: repartitionByRange gives a partition-wise total order, each
    block computes its local running sum with a window, and a
    broadcast block-total prefix table (n_blocks rows, the only
    driver-sized object) lifts local sums to the GLOBAL running
    total. n_blocks auto-sizes to the session's shuffle parallelism
    when omitted. No single-partition window anywhere; integer
    arithmetic throughout (no doubles, no libm), so the oracle is
    exact at any scale.
    """
    from datawarehouse_spark.operators.rank import global_cumsum

    # validate in the live size expression (not a prunable side column):
    # every downstream sum reads _sz, so a bad size always raises.
    checked = F.when(
        F.col(size_col) > 0, F.col(size_col).cast("bigint")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"shard_pack: {size_col} must be > 0, got "),
                F.coalesce(F.col(size_col).cast("string"), F.lit("NULL")),
                F.lit(f" for {id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("bigint")
    )
    base = media.withColumn("_sz", checked).withColumn(
        "_k", F.md5(F.col(id_col).cast("string"))
    )
    return (
        global_cumsum(
            base, [F.asc("_k"), F.asc(id_col)], "_sz",
            n_blocks=n_blocks, cum_col="cum_bytes",
        )
        .withColumn(
            "shard",
            F.expr(
                f"(cum_bytes - _sz) div {int(shard_bytes)}"
            ).cast("bigint"),
        )
        .drop("_k", "_sz")
    )
