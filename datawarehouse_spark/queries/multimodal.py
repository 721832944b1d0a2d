"""Multimodal column queries (north star): binary payloads + typed
metadata + Arrow-batched decode/feature plumbing, over a media table
derived deterministically from the documents fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.operators import multimodal as mm
from datawarehouse_spark.queries.registry import query


@query(
    "mm_media_catalog",
    oracle="""
    SELECT doc_id AS media_id,
           CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
           CAST(32 AS BIGINT) AS n_bytes,
           'fixture/deterministic' AS codec
    FROM documents
    """,
)
def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media table: opaque payload + typed metadata struct —
    catalog projection (struct field access)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return _catalog_from_media(mm.attach_media(t["documents"]))


def _catalog_from_media(media: DataFrame) -> DataFrame:
    return media.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.codec").alias("codec"),
    )


def _feature_oracle() -> str:
    """DuckDB recomputation of the deterministic fake decode: the payload
    is unhex(md5(text) || md5('2:'||text)) — 32 bytes recoverable from the
    hex digits — so byte stats and strided features are plain SQL."""
    feats = ",\n           ".join(
        f"CAST(((bytes[{i + 1}] + bytes[{i + 9}] + bytes[{i + 17}] + bytes[{i + 25}])"
        f" % 256) AS DOUBLE) / 255.0 AS f{i}"
        for i in range(8)
    )
    return f"""
    WITH h AS (
      SELECT doc_id, md5(text) || md5(concat('2:', text)) AS hx FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(range(32), i ->
               16 * (strpos('0123456789abcdef', substr(hx, 2*i + 1, 1)) - 1)
                  + (strpos('0123456789abcdef', substr(hx, 2*i + 2, 1)) - 1)
             ) AS bytes
      FROM h
    )
    SELECT doc_id AS media_id,
           CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
           CAST(32 AS BIGINT) AS n_bytes,
           CAST(list_sum(bytes) AS DOUBLE) / 32 AS byte_mean,
           CAST(len(list_distinct(bytes)) AS DOUBLE) / 32 AS byte_entropy_proxy,
           {feats}
    FROM b
    """


@query("mm_feature_extraction", oracle=_feature_oracle())
def mm_feature_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (deterministic fake decode; real codecs are a stub — see
    operators/multimodal.py). The internal operator emits an
    ``array<double>`` embedding; the registered query flattens it to
    scalar f0..f7 so the driver canonicalizer can hash it."""
    t = load_tables(spark, sf_dir, ("documents",))
    return _features_from_media(mm.attach_media(t["documents"]))


def _features_from_media(media: DataFrame) -> DataFrame:
    df = mm.extract_features(media)
    return df.select(
        "media_id", "kind", "n_bytes", "byte_mean", "byte_entropy_proxy",
        *[F.col("features")[i].alias(f"f{i}") for i in range(8)],
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
           CAST(unnest([0, 1]) AS BIGINT) AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one payload row → N frame rows via posexplode
    (32-byte payload, 16-byte stride → 2 frames). The oracle checks the
    row multiplication; frame bytes are exercised in tests."""
    t = load_tables(spark, sf_dir, ("documents",))
    return _frames_from_media(mm.attach_media(t["documents"]))


def _frames_from_media(media: DataFrame) -> DataFrame:
    frames = mm.frame_sample(media, every_n_bytes=16)
    return frames.select(
        "media_id", "kind", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )


#: the fixture payload is unhex(md5(text) || md5('2:'||text)) = exactly
#: 32 bytes, so resize_media(target=16) picks bytes 0,2,4,…,30
#: (stride = 32/16 = 2.0, int(i*2.0) = 2i) — in hex-string space, the
#: 2-char pair at 1-indexed position 4k+1 for k = 0..15. Fixed
#: positions ⇒ the oracle is a flat concat, no lateral/unnest needed.
_RESIZE_HEX = " || ".join(f"substr(h, {4 * k + 1}, 2)" for k in range(16))


@query(
    "mm_resize",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
             md5(text) || md5('2:' || text) AS h
      FROM documents
    )
    SELECT media_id, kind, CAST(16 AS BIGINT) AS n_bytes,
           {_RESIZE_HEX} AS payload_hex
    FROM m
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/resample over binary payloads (strided-byte stand-in for
    image resize; the Arrow ``mapInPandas`` batch path is
    production-real — a real codec swaps into the same pandas
    function). Driver-gated since r13 (VERDICT r12 ask #7, the last
    TESTS_ONLY op): the mapInPandas output bytes are projected to hex
    and hash-compared against a DuckDB replay of the strided byte
    pick, so the actual Arrow-path byte math — not just shape and
    determinism — is oracle-verified. Determinism and exact output
    size remain asserted in tests."""
    t = load_tables(spark, sf_dir, ("documents",))
    return _resize_from_media(mm.attach_media(t["documents"]))


def _resize_from_media(media: DataFrame) -> DataFrame:
    small = mm.resize_media(media, target_bytes=16)
    return small.select(
        "media_id", "kind", "n_bytes",
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


@query(
    "mm_shard_packing",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
             CAST(n_chars * CASE (doc_id % 3) WHEN 0 THEN 64
                                              WHEN 1 THEN 256
                                              ELSE 1024 END
                  AS BIGINT) AS est_bytes,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ), c AS (
      SELECT media_id, kind, est_bytes,
             SUM(est_bytes) OVER (
               ORDER BY k, media_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_bytes
      FROM m
    )
    SELECT media_id, kind, est_bytes, cum_bytes,
           CAST((cum_bytes - est_bytes) // 4194304 AS BIGINT) AS shard
    FROM c
    """,
)
def mm_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard packing: media items (size ledger =
    n_chars × a per-kind byte multiplier, the catalog-driven shape a
    real shard planner uses — it packs from metadata, not by reading
    blobs) are md5-shuffled and greedily packed into sequential
    ~4 MiB shards by GLOBAL running byte total — computed with the
    distributed block-offset pattern, never a single-partition
    window. See operators/multimodal.py::shard_pack."""
    t = load_tables(spark, sf_dir, ("documents",))
    mult = (
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(64))
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, F.lit(256))
        .otherwise(F.lit(1024))
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    ledger = t["documents"].select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        (F.col("n_chars") * mult).cast("bigint").alias("est_bytes"),
    )
    return mm.shard_pack(ledger)
