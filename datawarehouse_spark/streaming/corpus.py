"""End-to-end STREAMING corpus preparation — the ingestion-time form
of the batch training-data gate chain (queries/llm.py::llm_corpus_prep
is the audit-table batch form; docs/实时数仓.md's Kappa stance is that
every batch pipeline needs a streaming twin with identical results).

One micro-batch step = ``corpus_prep_increment``: exact dedup against
everything seen in strictly-earlier epochs (a fingerprint registry —
the SnapshotTable recipe from paragraph dedup) composed with the
STATELESS per-document gates (Gopher repetition, benchmark
contamination, quality band). The batch twin ``corpus_prep_replay``
computes the same decisions in one pass; replaying a corpus in id
order through the increment batch-by-batch reproduces it EXACTLY
(differential-tested with a kill-restart in tests/test_streaming.py).

Incremental-safe gate choices (documented, deliberate):

* exact dedup is keep-FIRST in (epoch, doc_id) order — the only gate
  that needs state, and its state is an 16-byte-keyed fingerprint set
  (at 100 TB: a SnapshotTable/state-store anti-join keyed on md5,
  touched once per batch; cost is linear in the BATCH).
* the quality gate uses FIXED thresholds, not the batch pipeline's
  per-domain percentile — a percentile over an unbounded stream is
  not well-defined until the stream ends; production recalibrates
  thresholds offline (quality_calibration) and ships constants. This
  is the semantic difference between llm_corpus_prep's q-gate and the
  streaming form, and it is why the parity oracle here is
  corpus_prep_replay, not llm_corpus_prep.
* contamination screens against a STATIC benchmark set (broadcast
  shingle hashes — the same contamination_check used in batch).

Scale shape per batch: every gate is one pass over the batch (explode
+ map-combined agg or broadcast join); the registry anti-join is the
only state touch. No global windows, no corpus×corpus joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed quality band (see module docstring): token count floor and a
#: plausible-prose average-token-length ceiling. Chosen to split the
#: synthetic fixture corpus non-trivially in both directions (fixture
#: n_tokens spans 10-99, avg token length ~3.7-5.1).
MIN_TOKENS = 12
MAX_AVG_TOKEN_LEN = 5.0


def _stateless_gates(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    contamination_threshold: float = 0.5,
) -> DataFrame:
    """The per-document (stateless) gate columns shared verbatim by
    the increment and its batch twin: gopher_ok, clean, quality_ok."""
    from datawarehouse_spark.operators.text import (
        contamination_check,
        quality_stats,
        repetition_stats,
    )

    rep = repetition_stats(df, id_col, text).select(id_col, "gopher_fail")
    cont = contamination_check(df, eval_df, id_col, text, n=3).select(
        id_col, "contaminated_frac"
    )
    qual = quality_stats(df, id_col, text).select(
        id_col, "n_tokens", "avg_token_len"
    )
    return (
        df.select(id_col)
        .join(rep, id_col, "left")
        .join(cont, id_col, "left")
        .join(qual, id_col, "left")
        .select(
            F.col(id_col),
            (~F.coalesce(F.col("gopher_fail"), F.lit(False)))
            .alias("gopher_ok"),
            (
                F.col("contaminated_frac").isNull()
                | (F.col("contaminated_frac") < contamination_threshold)
            ).alias("clean"),
            (
                (F.col("n_tokens") >= MIN_TOKENS)
                & (F.col("avg_token_len") <= MAX_AVG_TOKEN_LEN)
            ).alias("quality_ok"),
        )
    )


def corpus_prep_increment(
    new: DataFrame,
    seen_fps: DataFrame | None,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of the streaming gate chain. ``seen_fps`` is
    the fingerprint registry from strictly-earlier epochs (one ``fp``
    string column) or None on the first batch; ``eval_df`` is the
    static benchmark corpus. Returns ``(decisions, new_fps)``:
    per-document (id, dup_exact, gopher_ok, clean, quality_ok, keep)
    for THIS batch, and the distinct not-previously-seen fingerprints
    the caller appends to the registry."""
    fp = new.select(
        F.col(id_col), F.md5(F.col(text)).alias("fp")
    )
    # keep-first WITHIN the batch (min id per fingerprint)...
    first = fp.groupBy("fp").agg(F.min(id_col).alias("_first"))
    dup = fp.join(first, "fp").withColumn(
        "_dup", F.col(id_col) != F.col("_first")
    )
    # ...and against every strictly-earlier epoch
    if seen_fps is not None:
        dup = dup.join(
            seen_fps.select("fp").distinct().withColumn("_seen", F.lit(1)),
            "fp",
            "left",
        ).withColumn("_dup", F.col("_dup") | F.col("_seen").isNotNull())
    gates = _stateless_gates(new, eval_df, id_col, text)
    decisions = (
        dup.select(id_col, F.col("_dup").alias("dup_exact"))
        .join(gates, id_col)
        .select(
            id_col,
            "dup_exact",
            "gopher_ok",
            "clean",
            "quality_ok",
            (
                ~F.col("dup_exact") & F.col("gopher_ok") & F.col("clean")
                & F.col("quality_ok")
            ).alias("keep"),
        )
    )
    new_fps = fp.select("fp").distinct()
    if seen_fps is not None:
        new_fps = new_fps.join(
            seen_fps.select("fp").distinct(), "fp", "left_anti"
        )
    return decisions, new_fps


def corpus_prep_replay(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """The batch twin: the decisions ``corpus_prep_increment``
    accumulates over any id-ordered replay of ``docs``, computed in
    one pass — keep-first exact dedup by global id order plus the
    same stateless gates. Literally ONE increment step over the whole
    corpus with an empty registry — the keep-first rule lives in
    exactly one place, so the stream and its differential oracle
    cannot desynchronize."""
    decisions, _ = corpus_prep_increment(
        docs, None, eval_df, id_col, text
    )
    return decisions
