#!/usr/bin/env python
"""Generate the r10 sf1 scale-rehearsal slice (VERDICT r9 ask #8).

The scalecheck sweeps (SCALE.md) PREDICT linear/near-linear growth for
the heavy suites by blowing fixtures up 8x/64x per-operator; this
script manufactures one REAL 10x point: an sf1-scale directory whose
``documents`` (50k rows) and ``embeddings`` (20k rows) are ten
deterministic replicas of the sf0.1 tables, with the other eight
tables copied through unchanged (the five heaviest suites are
documents/embeddings-bound; TPC-H growth is covered by the driver's
own sf ladder).

Replica construction keeps the WORK linear in the blow-up — the
property the rehearsal measures — by keeping replicas mutually
invisible to every similarity/dedup operator:

* documents: replica k>0 suffixes every token with ``_k`` (one
  map-side transform). Within a replica, every dup/near-dup
  relationship of sf0.1 survives verbatim (both members transform
  identically), so pair counts scale exactly 10x; across replicas the
  vocabularies are disjoint, so no cross-replica candidate pairs (a
  naive "copy the text 10x" would instead square the per-family pair
  counts and measure output blow-up, not scale). doc_id shifts by
  k * 1_000_000; n_chars is recomputed from the transformed text.
* embeddings: replica k circularly shifts the vector by k positions —
  norm-preserving, pairwise sims within a replica unchanged (both
  members shift identically), cross-replica neighborhoods scrambled.
  vec_id shifts by k * 1_000_000; label unchanged.

Deterministic (no RNG anywhere), so the slice is reproducible
byte-for-byte. Output defaults to /tmp/sf1slice; run the rehearsal:

    python scripts/gen_sf1_slice.py
    SPARK_GRAFT_SF_DIR=/tmp/sf1slice python bench.py \
        --only suite_dedup_blocking,suite_text_quality,suite_corpus_mix,suite_corpus_ops,suite_embeddings,suite_dedup_pairs
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
ID_STRIDE = 1_000_000
SRC = "/root/testdata/sf0.1"
OTHER_TABLES = (
    "region nation customer supplier part orders lineitem events".split()
)


def main(out_dir: str = "/tmp/sf1slice") -> None:
    from pyspark.sql import functions as F

    from datawarehouse_spark.session import get_spark

    spark = get_spark(app_name="gen-sf1-slice")
    os.makedirs(out_dir, exist_ok=True)
    for t in OTHER_TABLES:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("k"))

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    big_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("k").cast("bigint") * ID_STRIDE)
            .alias("doc_id"),
            F.when(F.col("k") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(
                            x, F.lit("_"), F.col("k").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    # single file per table, like the driver fixtures
    big_docs.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_docs")
    _promote_single_file(f"{out_dir}/_docs", f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    big_emb = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("k").cast("bigint") * ID_STRIDE)
        .alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            f"i -> element_at(embedding, ((i + k) % {dim}) + 1))"
        ).alias("embedding"),
        "label",
    )
    big_emb.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_emb")
    _promote_single_file(f"{out_dir}/_emb", f"{out_dir}/embeddings.parquet")

    for t in ("documents", "embeddings"):
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


def _promote_single_file(tmp_dir: str, dest: str) -> None:
    parts = [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")]
    assert len(parts) == 1, parts
    shutil.move(os.path.join(tmp_dir, parts[0]), dest)
    shutil.rmtree(tmp_dir)


if __name__ == "__main__":
    main(*sys.argv[1:])
