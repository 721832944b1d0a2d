"""LLM training-data pipeline operators — SURVEY.md §7.1 M7 / north star.

Dedup (exact, MinHash, n-gram Jaccard, SimHash), text analysis
(quality, lang-ID, token counting, fingerprints), and similarity
search over the `documents` / `embeddings` fixtures. Implementations
live in datawarehouse_spark.operators; this module registers them with
DuckDB oracles where the op is deterministic and SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datawarehouse_spark.catalog import load_tables
from datawarehouse_spark.operators import dedup, graph, similarity, text
from datawarehouse_spark.operators import multimodal as mm_ops
from datawarehouse_spark.queries.registry import query

# DuckDB rendering of the word-3-shingle list (shared by minhash/jaccard
# oracles); list_transform is 1-based like Spark's slice. The short-doc
# branch mirrors operators/dedup.shingles_col exactly: documents with
# fewer than 3 tokens shingle to [text] (latent at current fixtures —
# every doc has ≥3 tokens — but the two sides must agree by construction).
_DUCK_SHINGLES = """
  CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
  ELSE list_distinct(list_transform(
    range(1, len(string_split(text, ' ')) - 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         || ' ' || string_split(text, ' ')[i+2])) END
"""

# sliced-md5 MinHash signature (k=8) as a reusable CTE chain — shared
# by the signature query, the LSH banding oracle, and anything
# downstream. Mirrors operators/dedup.minhash_signature(hash="md5mix")
# exactly: hash function j = hex digits [1+10·(j%3), 10·(j%3+1)] of
# md5 salted with j//3 (salt 0 = unsalted) — disjoint slices, so the
# 8 functions are as independent as 8 md5s; lexicographic min over
# fixed-length lowercase hex is the numeric min.


def _duck_mh(j: int) -> str:
    salt, sl = j // 3, j % 3
    inner = "x" if salt == 0 else f"'{salt}|' || x"
    return (f"list_aggregate(list_transform(s, x -> "
            f"substr(md5({inner}), {1 + 10 * sl}, 10)), 'min') AS mh{j}")


_DUCK_SIG_CTES = f"""
    sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM documents),
    sig AS (SELECT doc_id, {",".join(_duck_mh(j) for j in range(8))}
    FROM sh)
"""

#: shingle document-frequency cap for the exact near-dup self-join: a
#: shingle appearing in more docs than this is dropped before the join
#: (stopword-run shingles otherwise cause O(df²) fan-out — the classic
#: hot-key bound, mirrored identically in the oracle).
NGRAM_MAX_SHINGLE_FREQ = 100

# capped shingle self-join → near-dup pairs, as a reusable CTE chain
# ending in `pairs` (shared by llm_ngram_near_dup and the cluster
# resolution oracle; threshold-parametrized for llm_lsh_scurve).
def _duck_ngram_ctes(threshold: float = 0.3) -> str:
    # MATERIALIZED on the multiply-referenced relations (sh0 2x,
    # shc 3x, sizes 2x, pairs 2x+ in the graph oracles): DuckDB
    # inlines plain CTEs, re-running the shingle explode/self-join
    # per reference — at the sf1 slice the inlined pagerank chain
    # spilled >79 GB and died (r12); one evaluation each, like the
    # kcore/lpa oracles
    return f"""
    sh0 AS MATERIALIZED (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
    ), capped AS (
      SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= {NGRAM_MAX_SHINGLE_FREQ}
    ), shc AS MATERIALIZED (
      SELECT sh0.doc_id, sh0.s FROM sh0 JOIN capped USING (s)
    ), sizes AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT doc_a, doc_b, (i * 1.0 / (sa.n + sb.n - i)) AS jaccard
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE (i * 1.0 / (sa.n + sb.n - i)) >= {threshold!r}
    )
"""


_DUCK_NGRAM_CTES = _duck_ngram_ctes(0.3)

# SimHash recomputation in SQL: parse the first 16 md5 hex digits into
# two 32-bit halves, bit-vote over all token occurrences, reassemble the
# 63-bit sign vector — mirrors operators/dedup.simhash64 exactly.
_DUCK_SIMHASH_CTES = """
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), hx AS (
      SELECT doc_id, md5(tok) AS h FROM toks
    ), hv AS (
      SELECT doc_id,
        CAST(list_sum(list_transform(range(8), j ->
          (strpos('0123456789abcdef', substr(h, j + 1, 1)) - 1)
            * (CAST(1 AS BIGINT) << (4 * (7 - j))))) AS BIGINT) AS hi,
        CAST(list_sum(list_transform(range(8), j ->
          (strpos('0123456789abcdef', substr(h, j + 9, 1)) - 1)
            * (CAST(1 AS BIGINT) << (4 * (7 - j))))) AS BIGINT) AS lo
      FROM hx
    ), bits AS (
      SELECT doc_id, u.i,
             CASE WHEN u.i < 32 THEN (lo >> u.i) & 1
                  ELSE (hi >> (u.i - 32)) & 1 END AS bit
      FROM hv CROSS JOIN (SELECT unnest(range(63)) AS i) u
    ), votes AS (
      SELECT doc_id, i, SUM(2 * bit - 1) AS v FROM bits GROUP BY 1, 2
    ), simsig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << i
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY 1
    )
"""


@query(
    "llm_exact_dedup",
    oracle="""
    SELECT md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint, keep min doc_id —
    the distributed form of the reference's ROWID dedupe (docs/sql规范.md:21-24).
    One shuffle on a 32-byte key regardless of document size."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .groupBy(F.md5("text").alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
    )


@query(
    "llm_fingerprints",
    oracle="""
    SELECT doc_id, md5(text) AS fp_exact,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_norm
    FROM documents
    """,
)
def llm_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: exact + whitespace/case-normalized md5."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.fingerprint(t["documents"])


@query(
    "llm_text_quality",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ((length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
              / len(string_split(text, ' '))) AS avg_token_len,
           (len(list_filter(string_split(text, ' '),
                x -> list_contains(['the','a','of','and','to','in','is'], x))) * 1.0
              / len(string_split(text, ' '))) AS stopword_ratio
    FROM documents
    """,
)
def llm_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/token/stopword-ratio features, all
    JVM-side expressions (no UDF)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.quality_stats(t["documents"])


@query(
    "llm_bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def llm_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs /
    digit runs / single punctuation)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id", text.bpe_token_count().alias("n_bpe_tokens")
    )


@query(
    "llm_minhash_signature",
    oracle=f"""
    WITH {_DUCK_SIG_CTES}
    SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM sig
    """,
)
def llm_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, disjoint 40-bit slices of 3 salted md5s
    — deterministic, engine-portable, independent-as-8-md5s statistics
    at ceil(k/3) hashes per shingle; the oracle recomputes them in
    SQL)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.minhash_signature(t["documents"], k=8)


@query(
    "llm_ngram_near_dup",
    oracle=f"""
    WITH {_DUCK_NGRAM_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
)
def llm_ngram_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: word-3-gram Jaccard ≥ 0.3 via shingle
    self-join (the exact verifier downstream of MinHash-LSH candidates),
    with hot shingles capped at document frequency ≤ 100 so one
    ubiquitous shingle can't blow up the join fan-out.
    ~25 planted near-dup pairs exist at sf0.01."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.ngram_jaccard_pairs(
        t["documents"], threshold=0.3, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )


@query(
    "llm_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_DUCK_NGRAM_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(doc_id, lbl) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.lbl
    )
    SELECT doc_id, CAST(LEAST(doc_id, MIN(lbl)) AS BIGINT) AS canonical_id
    FROM reach GROUP BY doc_id
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster resolution: connected components over the exact
    near-dup pairs → (doc_id, canonical_id), keep-min-per-cluster — an
    LLM pipeline dedups documents, not pairs. Iterative min-label
    propagation in Spark; transitive-closure recursive CTE as oracle."""
    t = load_tables(spark, sf_dir, ("documents",))
    pairs = dedup.ngram_jaccard_pairs(
        t["documents"], threshold=0.3, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )
    return dedup.dedup_clusters(pairs)


@query(
    "llm_dedup_keep",
    oracle=f"""
    WITH RECURSIVE {_DUCK_NGRAM_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(doc_id, lbl) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.lbl
    ),
    near_drop AS (
      SELECT doc_id FROM reach GROUP BY doc_id
      HAVING LEAST(doc_id, MIN(lbl)) < doc_id
    ),
    exact_drop AS (
      SELECT doc_id FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM documents
      ) WHERE doc_id <> keep_id
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM exact_drop)
      AND doc_id NOT IN (SELECT doc_id FROM near_drop)
    """,
)
def llm_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline end to end — the corpus a training run would
    actually consume: drop exact duplicates (keep min doc_id per md5
    group) AND near-duplicates (keep only each fuzzy cluster's
    canonical doc), return the surviving doc ids. Composes
    exact-dedup → near-dup pairs → connected components → anti-joins."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    keepers = docs.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keep_id")
    )
    exact_drop = (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .join(keepers, "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=0.3, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )
    near_drop = (
        dedup.dedup_clusters(pairs)
        .filter(F.col("canonical_id") < F.col("doc_id"))
        .select("doc_id")
    )
    return (
        docs.select("doc_id")
        .join(exact_drop, "doc_id", "left_anti")
        .join(near_drop, "doc_id", "left_anti")
    )


@query(
    "llm_incremental_dedup",
    oracle=f"""
    WITH newd AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 9
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 3
    ),
    corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 9),
    shn0 AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM newd),
    shc0 AS (SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM corp),
    hot AS (SELECT s FROM shc0 GROUP BY s
            HAVING COUNT(*) > {NGRAM_MAX_SHINGLE_FREQ}),
    shn AS (SELECT * FROM shn0 WHERE s NOT IN (SELECT s FROM hot)),
    shc AS (SELECT * FROM shc0 WHERE s NOT IN (SELECT s FROM hot)),
    sn AS (SELECT doc_id, COUNT(*) AS na FROM shn GROUP BY 1),
    sc AS (SELECT doc_id, COUNT(*) AS nb FROM shc GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, COUNT(*) AS i
      FROM shn a JOIN shc b ON a.s = b.s GROUP BY 1, 2
    ),
    near AS (
      SELECT new_id AS doc_id, COUNT(*) AS n_near
      FROM inter
      JOIN sn ON inter.new_id = sn.doc_id
      JOIN sc ON inter.corpus_id = sc.doc_id
      WHERE i * 1.0 / (na + nb - i) >= 0.3
      GROUP BY 1
    ),
    exact AS (
      SELECT doc_id FROM newd WHERE md5(text) IN (SELECT md5(text) FROM corp)
    )
    SELECT nd.doc_id,
           (nd.doc_id IN (SELECT doc_id FROM exact)) AS dup_exact,
           (near.n_near IS NOT NULL) AS dup_near,
           (nd.doc_id NOT IN (SELECT doc_id FROM exact)
            AND near.n_near IS NULL) AS keep
    FROM newd nd LEFT JOIN near ON near.doc_id = nd.doc_id
    """,
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: the doc_id%10==9 slice plays the
    nightly batch, the rest the existing corpus — each new doc is
    flagged exact-dup (fingerprint semi-join) and near-dup (shingle
    join against corpus shingles ONLY, Jaccard ≥ 0.3). The fixture has
    no cross-split exact duplicates, so the batch is augmented with
    re-id'd copies of a deterministic corpus slice (doc_id%97==3 →
    +1000000) on BOTH engines — the exact-dup path is verified for
    real, never vacuously. Work scales with the increment, never
    corpus², which is what makes continuous corpus refresh viable at
    100 TB (see operators/dedup.py::incremental_dedup)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"]
    new_batch = (
        d.filter(F.col("doc_id") % 10 == 9)
        .select("doc_id", "text")
        .unionByName(
            d.filter(F.col("doc_id") % 97 == 3).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return dedup.incremental_dedup(
        new_batch,
        d.filter(F.col("doc_id") % 10 != 9),
        threshold=0.3,
        max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ,
    )


@query(
    "llm_minhash_lsh_candidates",
    oracle=f"""
    WITH {_DUCK_SIG_CTES},
    bands AS (
      SELECT doc_id, 0 AS bi,
             CAST(mh0 AS VARCHAR) || '|' || CAST(mh1 AS VARCHAR) AS bk FROM sig
      UNION ALL SELECT doc_id, 1,
             CAST(mh2 AS VARCHAR) || '|' || CAST(mh3 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 2,
             CAST(mh4 AS VARCHAR) || '|' || CAST(mh5 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 3,
             CAST(mh6 AS VARCHAR) || '|' || CAST(mh7 AS VARCHAR) FROM sig
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    """,
)
def llm_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (4 bands × 2 hashes): the O(n·bucket)
    scale path for near-dup discovery at 100 TB. The banding self-join is
    deterministic given the signature, so the md5mix signature is
    fully oracle-checkable at full speed (recall additionally asserted
    in tests/test_llm_ops.py)."""
    t = load_tables(spark, sf_dir, ("documents",))
    sig = dedup.minhash_signature(t["documents"], k=8, hash="md5mix")
    return dedup.lsh_candidates(sig, k=8, band_size=2)


@query(
    "llm_simhash_pairs",
    oracle=f"""
    WITH {_DUCK_SIMHASH_CTES}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM simsig a JOIN simsig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    """,
)
def llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 9 bit-slices bucket-join (pigeonhole
    guarantees full recall at Hamming ≤ 8), exact bit_count(xor)
    verify — the constant-state alternative to MinHash-LSH. The bucketed
    join finds exactly the Hamming-ball pairs, so the oracle is the
    brute-force pair scan over the recomputed signatures."""
    t = load_tables(spark, sf_dir, ("documents",))
    sim = dedup.simhash64(t["documents"])
    return dedup.simhash_near_dup(sim, max_hamming=8)


@query(
    "llm_simhash",
    oracle=f"""
    WITH {_DUCK_SIMHASH_CTES}
    SELECT doc_id, simhash FROM simsig
    """,
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints via Arrow-vectorized pandas UDF (the
    sanctioned slow path, SURVEY §2.10): md5 the tokens, bit-vote
    weighted by occurrence, sign vector = 63-bit fingerprint. Fully
    deterministic, recomputed hex-digit-by-hex-digit in the oracle."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.simhash64(t["documents"])


@query(
    "llm_winnow_fingerprints",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), grams AS (
      SELECT doc_id, u.i AS pos,
             CAST('0x' || substr(md5(
               array_to_string(t[u.i : u.i + 2], ' ')), 1, 15) AS BIGINT) AS h,
             greatest(len(t) - 2, 1) AS n
      FROM toks, LATERAL (
        SELECT unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS i
      ) u
    )
    SELECT DISTINCT doc_id, fp FROM (
      SELECT doc_id, pos, n,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM grams
    ) WHERE pos <= n - 3  -- 1-based: full windows start at 1..n-(w-1)
    """,
)
def llm_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprinting via winnowing (k=3 word-grams, w=4
    windows): shift-robust document signatures with guaranteed density,
    the classic plagiarism/near-dup fingerprint set (see
    operators/text.py::winnow_fingerprints)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.winnow_fingerprints(t["documents"], k=3, w=4)


@query(
    "llm_train_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 100 < 5
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)
def llm_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash train/val split (95/5): md5-bucketed so
    membership is stable across runs, engines and repartitioning —
    never rand()."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.train_split(t["documents"], val_pct=5)


@query(
    "llm_global_shuffle",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             md5('s0-' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ),
    s AS (
      SELECT doc_id, k,
             CAST('0x' || substr(k, 1, 4) AS INTEGER) % 8 AS shard
      FROM t
    )
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
    FROM s
    """,
)
def llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 8 training shards: md5-keyed
    permutation gives every doc a stable (shard, pos) address — seeded
    ORDER BY random() without the rand(). No global sort: shard hash is
    embarrassingly parallel, positions sort within shards only (see
    operators/text.py::global_shuffle for the 100 TB sharding math)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.global_shuffle(t["documents"], n_shards=8, seed="s0")


@query(
    "llm_dup_span_coverage",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
    ),
    freq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
    per AS (
      SELECT sh.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup
      FROM sh JOIN freq ON sh.s = freq.s
      GROUP BY sh.doc_id
    )
    SELECT doc_id, n_shingles, n_dup,
           ROUND(n_dup * 1.0 / n_shingles, 6) AS dup_frac
    FROM per
    """,
)
def llm_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a doc's
    distinct 3-shingles that occur anywhere else in the corpus — the
    span-level boilerplate signal pairwise near-dup misses (commonplace
    text with no single similar partner). Linear cost: one frequency
    agg + one hash join, never a self-join, so it needs no hot-shingle
    cap at 100 TB (operators/dedup.py::dup_span_coverage)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.dup_span_coverage(t["documents"], n=3)


@query(
    "llm_dup_span_remove",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    possh AS (
      SELECT doc_id, i - 1 AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM toks, LATERAL unnest(range(1, len(t) - 1)) AS r(i)
      WHERE len(t) >= 3
    ),
    freq AS (
      SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM possh)
      GROUP BY sh HAVING COUNT(*) >= 2
    ),
    duppos AS (
      SELECT DISTINCT p.doc_id, p.pos + o.o AS tpos
      FROM possh p
      JOIN freq f ON p.sh = f.sh,
      LATERAL unnest(range(0, 3)) AS o(o)
    ),
    allpos AS (
      SELECT doc_id, i - 1 AS tpos
      FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS r(i)
    ),
    kept AS (
      SELECT a.doc_id, a.tpos FROM allpos a
      WHERE NOT EXISTS (SELECT 1 FROM duppos d
                        WHERE d.doc_id = a.doc_id AND d.tpos = a.tpos)
    ),
    grp AS (
      SELECT doc_id, tpos,
             tpos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tpos)
               AS g
      FROM kept
    )
    SELECT doc_id,
           CAST(MIN(tpos) AS BIGINT) AS span_start,
           CAST(MAX(tpos) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM grp GROUP BY doc_id, g
    """,
)
def llm_dup_span_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring removal: per-document maximal kept token
    ranges after dropping every span covered by a corpus-frequent
    3-shingle (document frequency ≥ 2) — the cleaning companion to
    llm_dup_span_coverage's diagnostic. Strictly linear (positional
    shingle explode, one frequency agg, ≤3× span fan-out, one
    gaps-and-islands window), never a self-join
    (operators/dedup.py::dup_span_kept_ranges)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.dup_span_kept_ranges(t["documents"], n=3, min_df=2)


_EXACT_SPAN_L = 20  # fixture docs are 10-99 tokens; production = 50

# shared by llm_exact_dup_spans and its rolling-hash impl twin: the
# oracle is deliberately the md5-window form for BOTH — the rolling
# Spark path must reproduce the md5 path's spans exactly (fingerprint
# values never reach the output), so one SQL verifies both impls
_EXACT_SPAN_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sites AS MATERIALIZED (
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             md5(array_to_string(t[u.i:u.i + {_EXACT_SPAN_L - 1}], ' '))
               AS h
      FROM toks, UNNEST(range(1, len(t) - {_EXACT_SPAN_L} + 2)) AS u(i)
      WHERE len(t) >= {_EXACT_SPAN_L}
    ),
    dup AS (
      SELECT h FROM sites GROUP BY h HAVING COUNT(*) >= 2
    ),
    st AS (
      SELECT s.doc_id, s.pos,
             CASE WHEN s.pos - lag(s.pos) OVER (
                    PARTITION BY s.doc_id ORDER BY s.pos)
                  <= {_EXACT_SPAN_L} THEN 0 ELSE 1 END AS nw
      FROM sites s JOIN dup USING (h)
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS g
      FROM st
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_EXACT_SPAN_L - 1} AS span_end,
           MAX(pos) + {_EXACT_SPAN_L - 1} - MIN(pos) + 1 AS span_len
    FROM isl GROUP BY doc_id, g
    """


@query("llm_exact_dup_spans", oracle=_EXACT_SPAN_ORACLE)
def llm_exact_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-substring spans (Lee et al. 2021's
    suffix-array dedup, Spark-native): maximal token ranges covered by
    a verbatim ≥20-token substring occurring at ≥2 (doc, pos) sites
    corpus-wide — the exact counterpart of llm_dup_span_remove's
    shingle-approximate cleaning (which flags corpus-frequent PHRASES;
    this flags only whole verbatim repeats). The suffix array is
    replaced by the distributed identity "duplicated span ⟺ union of
    duplicated fixed-L windows": positional L-window md5 fingerprints,
    one frequency agg, join-back, per-doc interval merge — strictly
    linear, no self-join; window length 20 here (fixture docs are
    10-99 tokens), 50 in the paper's setting.
    See operators/dedup.py::exact_dup_spans."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.exact_dup_spans(t["documents"], min_len=_EXACT_SPAN_L)


@query("llm_exact_dup_spans_rolling", oracle=_EXACT_SPAN_ORACLE)
def llm_exact_dup_spans_rolling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The rolling-hash impl of exact-substring dedup (r14, VERDICT
    r13 ask #4): identical spans to llm_exact_dup_spans, but the
    window-fingerprint stage is a Rabin-Karp rolling hash over FNV-1a
    token hashes in one Arrow mapInPandas pass — O(1) per window
    instead of md5's O(L) concatenate+digest, the constant that
    dominates at 100 TB (L=50 in Lee et al. 2021's setting). The
    oracle is deliberately the md5-window SQL: fingerprints never
    reach the output, so hash-verifying the rolling path against the
    md5 replay proves the impls span-identical every round (the
    byte-equality is additionally property-tested in pytest).
    See operators/dedup.py::_window_sites_rolling."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.exact_dup_spans(
        t["documents"], min_len=_EXACT_SPAN_L, impl="rolling"
    )


@query(
    "t24_exact_span_gate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sites AS MATERIALIZED (
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos,
             md5(array_to_string(t[u.i:u.i + {_EXACT_SPAN_L - 1}], ' '))
               AS h
      FROM toks, UNNEST(range(1, len(t) - {_EXACT_SPAN_L} + 2)) AS u(i)
      WHERE len(t) >= {_EXACT_SPAN_L}
    ),
    fst AS MATERIALIZED (
      SELECT h, doc_id AS fi, pos AS fp FROM (
        SELECT h, doc_id, pos,
               row_number() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos) AS rn
        FROM sites
      ) WHERE rn = 1
    ),
    flagged AS (
      SELECT s.doc_id, s.pos
      FROM sites s JOIN fst f USING (h)
      WHERE s.doc_id > f.fi OR (s.doc_id = f.fi AND s.pos > f.fp)
    ),
    st AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos)
                  <= {_EXACT_SPAN_L} THEN 0 ELSE 1 END AS nw
      FROM flagged
    ),
    isl AS (
      SELECT doc_id, pos,
             SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS g
      FROM st
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {_EXACT_SPAN_L - 1} AS span_end,
           MAX(pos) + {_EXACT_SPAN_L - 1} - MIN(pos) + 1 AS span_len
    FROM isl GROUP BY doc_id, g
    """,
)
def t24_exact_span_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24 — batch twin of the STREAMING exact-substring dedup gate
    (operators/dedup.py::exact_span_increment): the Lee et al. 2021
    cleaning rule as an ingestion stream — a token position is flagged
    when some ≥20-token window through it was already seen at a
    strictly-earlier (epoch, doc, pos) site, so the FIRST occurrence
    of every duplicated substring survives and later verbatim copies
    emit removal spans. Completes the streaming gate family: exact doc
    (fingerprint registry), near-dup doc (band registry, t22),
    verified near-dup (t23), exact SUBSTRING (window-hash registry,
    this gate) — llm_exact_dup_spans is the symmetric all-occurrences
    report, this is what the cleaner deletes. Multi-batch registry
    parity is differential-tested in tests/test_streaming.py.

    Scale shape: identical to llm_exact_dup_spans (linear window pass,
    min-site agg, registry anti-join, per-doc interval merge) — the
    keep-first decision adds one lexicographic (doc, pos) comparison,
    never a pair set."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.exact_dup_spans_keep_first(
        t["documents"], min_len=_EXACT_SPAN_L
    )


@query(
    "llm_stratified_sample",
    oracle="""
    SELECT doc_id, lang,
           (CAST('0x' || substr(md5(lang || '|' || CAST(doc_id AS VARCHAR)),
                                1, 8) AS BIGINT) % 10000)
             < (CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 8000
                ELSE 10000 END) AS keep
    FROM documents
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing / stratified sampling: per-language deterministic
    md5-bucket keep decisions at target rates (en→30%, zh→80%, rest
    100%) — the corpus-mixing step of a training-data pipeline. Pure
    per-row JVM expressions: zero shuffle at any corpus size."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.stratified_sample(
        t["documents"], rates={"en": 0.30, "zh": 0.80}
    )


@query(
    "llm_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
                  || CAST(doc_id % 7 AS VARCHAR) || '.net at 10.'
                  || CAST(doc_id % 250 AS VARCHAR) || '.0.'
                  || CAST(doc_id % 200 AS VARCHAR) || ' call +1 555 0'
                  || CAST(doc_id % 900 + 100 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{text.PII_PATTERNS["email"]}'))
                AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{text.PII_PATTERNS["ip"]}'))
                AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(t, '{text.PII_PATTERNS["phone"]}'))
                AS BIGINT) AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(t,
             '{text.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
             '{text.PII_PATTERNS["ip"]}', '<IP>', 'g'),
             '{text.PII_PATTERNS["phone"]}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus. The fixture text is clean, so the
    query first augments each doc with synthetic doc_id-derived PII
    (an email, an IPv4, a phone) — both engines build the identical
    augmented text, so the oracle verifies the actual regex redaction
    behavior row-level instead of passing vacuously on clean input."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = F.col("doc_id")
    aug = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), d.cast("string"),
            F.lit("@mail"), (d % 7).cast("string"), F.lit(".net at 10."),
            (d % 250).cast("string"), F.lit(".0."), (d % 200).cast("string"),
            F.lit(" call +1 555 0"), (d % 900 + 100).cast("string"),
        ).alias("text"),
    )
    return text.pii_redact(aug)


@query(
    "llm_seq_packing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS n_tokens
      FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) / 4096)
             AS BIGINT) AS pack_id
    FROM tok
    """,
)
def llm_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: bin documents into 4096-token packs, greedy by
    id within id-mod-8 shards (the parallelism unit at any scale) — the
    trainer-side context-length batching step."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.sequence_packing(t["documents"], budget=4096, n_shards=8)


def _ffd_oracle(group_size: int, budget: int,
                tok_cte: str | None = None) -> str:
    """Unrolled first-fit-decreasing oracle (the BPE/PageRank/HNSW
    unrolled-CTE convention): slot s of every packing group is
    assigned by joining the previous assignment state's per-group bin
    loads — first bin that fits, else a new bin. AS MATERIALIZED is
    load-bearing on every multiply-referenced CTE (the r12 pagerank
    lesson: DuckDB inlines plain CTEs per reference).

    ``tok_cte`` (r14) replaces the default BPE-token item source with
    any SQL body producing (doc_id, n_tokens) — the composition hook
    mirroring ffd_packing's ``tokens_col`` (llm_batch_prep feeds
    chunked pieces through it)."""
    tok_body = tok_cte or """
      SELECT doc_id,
             CAST(len(regexp_extract_all(
               text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_tokens
      FROM documents
    """
    blocks = [f"""
    tok AS MATERIALIZED (
    {tok_body}
    ), items AS MATERIALIZED (
      SELECT doc_id, n_tokens,
             CAST((row_number() OVER (ORDER BY n_tokens DESC, doc_id)
                   - 1) // {group_size} AS BIGINT) AS grp,
             CAST((row_number() OVER (ORDER BY n_tokens DESC, doc_id)
                   - 1) % {group_size} AS BIGINT) AS slot
      FROM tok
    ), a0 AS MATERIALIZED (
      SELECT grp, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin
      FROM items WHERE slot = 0
    )"""]
    for s in range(1, group_size):
        blocks.append(f""", l{s} AS MATERIALIZED (
      SELECT grp, bin, SUM(n_tokens) AS load FROM a{s - 1} GROUP BY 1, 2
    ), f{s} AS MATERIALIZED (
      SELECT i.grp, i.doc_id, MIN(l.bin) AS fbin
      FROM items i JOIN l{s} l
        ON i.grp = l.grp AND l.load + i.n_tokens <= {budget}
      WHERE i.slot = {s}
      GROUP BY 1, 2
    ), a{s} AS MATERIALIZED (
      SELECT grp, doc_id, n_tokens, bin FROM a{s - 1}
      UNION ALL
      SELECT i.grp, i.doc_id, i.n_tokens,
             COALESCE(f.fbin, n.nb) AS bin
      FROM items i
      LEFT JOIN f{s} f ON f.grp = i.grp AND f.doc_id = i.doc_id
      JOIN (SELECT grp, MAX(bin) + 1 AS nb FROM l{s} GROUP BY 1) n
        ON n.grp = i.grp
      WHERE i.slot = {s}
    )""")
    last = group_size - 1
    blocks.append(f""", occ AS MATERIALIZED (
      SELECT grp, bin, SUM(n_tokens) AS bin_load,
             COUNT(*) AS n_in_bin
      FROM a{last} GROUP BY 1, 2
    )
    SELECT a.doc_id, a.n_tokens,
           a.grp AS pack_grp,
           CAST(a.grp * {group_size} + a.bin AS BIGINT) AS bin_id,
           CAST(o.bin_load AS BIGINT) AS bin_load,
           CAST(o.n_in_bin AS BIGINT) AS n_in_bin,
           ROUND(o.bin_load * 1.0 / {budget}, 6) AS bin_fill
    FROM a{last} a JOIN occ o ON a.grp = o.grp AND a.bin = o.bin""")
    return "WITH " + "".join(blocks)


@query("llm_ffd_packing", oracle=_ffd_oracle(group_size=8, budget=128))
def llm_ffd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware first-fit-decreasing packing (r13, VERDICT r12
    ask #8): hard 128-token bins, items longest-first within
    rank-contiguous groups of 8 — the padding-waste-minimizing twin of
    llm_seq_packing's wrap-around cumsum. The global order comes from
    the shared block-offset rank (no single-partition sort); the
    first-fit recurrence is a fixed 7-stage DataFrame unroll, oracle-
    replayed stage for stage. Output is the per-doc bin-occupancy
    ledger (bin id, load, fill ratio, docs per bin).
    See operators/text.py::ffd_packing."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.ffd_packing(t["documents"], budget=128, group_size=8)


# chunk ∘ FFD composition (r14, VERDICT r13 ask #8): fixture docs are
# 10-99 whitespace tokens, so budget 48 makes the composition
# non-vacuous — over-budget docs split into ≤48-token pieces, short
# docs pass through whole, and the packer mixes both. Item ids encode
# (doc, chunk) as doc_id·64 + chunk_id (≤3 chunks per fixture doc;
# the factor leaves room to 64).
_BATCH_PREP_BUDGET = 48
_BATCH_PREP_ITEMS_CTE = f"""
      SELECT doc_id * 64 + (ts // {_BATCH_PREP_BUDGET}) AS doc_id,
             CAST(least(ts + {_BATCH_PREP_BUDGET}, n) - ts AS BIGINT)
               AS n_tokens
      FROM (
        SELECT doc_id, len(toks) AS n,
               unnest(range(0, len(toks), {_BATCH_PREP_BUDGET})) AS ts
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
      )
"""


@query(
    "llm_batch_prep",
    oracle=f"""
    SELECT doc_id // 64 AS doc_id,
           doc_id % 64 AS chunk_id,
           n_tokens, pack_grp, bin_id, bin_load, n_in_bin, bin_fill
    FROM (
    {_ffd_oracle(group_size=8, budget=_BATCH_PREP_BUDGET,
                 tok_cte=_BATCH_PREP_ITEMS_CTE)}
    ) AS _packed
    """,
)
def llm_batch_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-batch prep (r14, VERDICT r13 ask #8): the
    full "docs → fixed-context training batches" pipeline in one
    verified query — chunk_documents splits every document into
    non-overlapping ≤48-token pieces (stride = chunk size, so the
    whole corpus is covered exactly once), then ffd_packing
    (tokens_col composition hook) packs the pieces longest-first into
    hard 48-token bins. The emitted ledger traces every training
    batch back to its (doc, chunk) source with bin occupancy — what a
    trainer needs to build attention-masked packed sequences. Both
    stages reuse their standalone operators and the oracle unions
    their existing CTE forms (chunk grid + 7-stage FFD unroll).
    See operators/text.py::chunk_documents, ffd_packing."""
    t = load_tables(spark, sf_dir, ("documents",))
    chunks = text.chunk_documents(
        t["documents"], chunk_tokens=_BATCH_PREP_BUDGET,
        stride=_BATCH_PREP_BUDGET,
    )
    items = chunks.select(
        (F.col("doc_id") * 64 + F.col("chunk_id")).alias("item_id"),
        "n_chunk_tokens",
    )
    packed = text.ffd_packing(
        items, id_col="item_id", tokens_col="n_chunk_tokens",
        budget=_BATCH_PREP_BUDGET, group_size=8,
    )
    return packed.select(
        F.expr("item_id div 64").cast("bigint").alias("doc_id"),
        (F.col("item_id") % 64).cast("bigint").alias("chunk_id"),
        "n_tokens", "pack_grp", "bin_id", "bin_load", "n_in_bin",
        "bin_fill",
    )


@query(
    "llm_lang_id",
    oracle="""
    WITH hits AS (
      SELECT doc_id, lang AS lang_label,
        len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','von','ist'], x))) AS h_de,
        len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in','is'], x))) AS h_en,
        len(list_filter(string_split(text,' '), x -> list_contains(['el','la','de','y','que','en'], x))) AS h_es,
        len(list_filter(string_split(text,' '), x -> list_contains(['le','la','de','et','que','les'], x))) AS h_fr
      FROM documents
    )
    SELECT doc_id, lang_label,
           CASE WHEN greatest(h_de,h_en,h_es,h_fr) <= 0 THEN 'und'
                WHEN h_de = greatest(h_de,h_en,h_es,h_fr) THEN 'de'
                WHEN h_en = greatest(h_de,h_en,h_es,h_fr) THEN 'en'
                WHEN h_es = greatest(h_de,h_en,h_es,h_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM hits
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: stopword-vote heuristic with deterministic
    alphabetical tie-break (synthetic fixture text is vocabulary-uniform,
    so the value is the deterministic plumbing, not real accuracy)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.language_id(t["documents"])


#: exact brute-force cosine top-5 — shared by llm_cosine_topk and, as
#: the ground-truth CTE, by the llm_ann_quality metrics oracle
_COSINE_TOPK_ORACLE = """
    SELECT q_id, n_id, cos, rank FROM (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(c.embedding AS DOUBLE[])), 6) DESC,
                        c.vec_id) AS BIGINT) AS rank
      FROM embeddings q CROSS JOIN embeddings c
      WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
    ) WHERE rank <= 5
    """


def _mrl_oracle(dims=(8, 16, 32), k: int = 5) -> str:
    """Matryoshka truncation-quality oracle: per query, top-k overlap
    between full-dim exact cosine and PREFIX-dim exact cosine, per
    truncation width — the same rerank replay as the full-dim oracle
    with list slices."""
    def topk(alias, sl):
        e = f"CAST(q.embedding{sl} AS DOUBLE[])"
        c = f"CAST(c.embedding{sl} AS DOUBLE[])"
        return f"""{alias} AS (
      SELECT q_id, n_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               CAST(row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity({e}, {c}), 6) DESC,
                          c.vec_id) AS BIGINT) AS rank
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
      ) WHERE rank <= {k}
    )"""
    parts = [topk("full5", "")]
    sels = []
    for d in dims:
        parts.append(topk(f"t{d}", f"[1:{d}]"))
        sels.append(f"""
    SELECT f.q_id, CAST({d} AS BIGINT) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_full,
           CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           round(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS overlap_frac
    FROM full5 f LEFT JOIN t{d} t ON f.q_id = t.q_id AND f.n_id = t.n_id
    GROUP BY 1""")
    return ("WITH " + ",\n    ".join(parts)
            + "\n    UNION ALL\n".join(sels))


@query("llm_mrl_quality", oracle=_mrl_oracle())
def llm_mrl_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval quality (r9): per query vector,
    the top-5 overlap between full-dim exact cosine and PREFIX-dim
    exact cosine at d in {8, 16, 32} — the measurement behind the
    MRL-style "truncate stored embeddings to d dims" memory/quality
    trade (a 64-to-16 truncation is a 4x index-memory cut; this op
    says what it costs on YOUR corpus — the same evidence-based-tuning
    role as llm_ann_quality). Scale: the searches dominate; the
    overlap join is q*k rows."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    return _mrl_quality_from(
        emb, similarity.cosine_topk(emb, q, k=5).localCheckpoint(eager=True)
    )


def _mrl_quality_from(emb: DataFrame, exact: DataFrame) -> DataFrame:
    """llm_mrl_quality body over a (possibly prebuilt) full-dim exact
    top-5 table — the same ``cosine_topk(emb, vec_id<5, k=5)`` result
    llm_ann_quality grounds on, so suite fusion computes it once."""
    full = exact.select("q_id", "n_id")
    base = full.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_full"))
    outs = []
    for d in (8, 16, 32):
        embd = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        tr = similarity.cosine_topk(
            embd, embd.filter(F.col("vec_id") < 5), k=5
        ).select(
            F.col("q_id").alias("_tq"), F.col("n_id").alias("_tn")
        )
        ov = (
            full.join(
                tr,
                (full["q_id"] == tr["_tq"]) & (full["n_id"] == tr["_tn"]),
                "left",
            )
            .groupBy(full["q_id"].alias("q_id"))
            .agg(
                F.sum(
                    F.when(F.col("_tn").isNotNull(), 1).otherwise(0)
                ).alias("n_overlap"),
            )
        )
        outs.append(
            base.join(ov, "q_id")
            .select(
                "q_id",
                F.lit(d).cast("bigint").alias("d"),
                F.col("n_full").cast("bigint").alias("n_full"),
                F.col("n_overlap").cast("bigint").alias("n_overlap"),
                F.round(
                    F.col("n_overlap") * F.lit(1.0) / F.col("n_full"), 6
                ).alias("overlap_frac"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query("llm_cosine_topk", oracle=_COSINE_TOPK_ORACLE)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id<5 —
    the exact ANN baseline. Broadcast cross join + JVM fold dot product;
    at scale the corpus side stays partitioned and only queries ship."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


def _lsh_ann_oracle(n_planes: int = 4, dim: int = 64, k: int = 5) -> str:
    """Unrolled DuckDB oracle for the LSH ANN path (VERDICT r7 ask #4).

    The hyperplanes are md5-derived and fully deterministic
    (operators/similarity.py::hyperplane_lsh_buckets), so the bucket
    bit is pure arithmetic both engines can replay: the Spark side
    folds ``((0.0 + x0*p0) + x1*p1) + ...`` left-to-right, and SQL's
    left-associative ``x0*p0 + x1*p1 + ...`` performs the IDENTICAL
    float64 addition sequence (``0.0 + v`` is bit-exact, and a -0.0
    projection still satisfies ``>= 0``), so the sign bits — and
    therefore the buckets, the candidate set, and the re-rank — match
    bit-for-bit. ``dim`` is pinned to the fixture's 64 and guarded by
    a pytest that fails loudly on fixture drift."""
    import hashlib

    def pc(j: int, i: int) -> float:
        h = hashlib.md5(f"{j}|{i}".encode()).hexdigest()
        return int(h[:8], 16) / float(1 << 32) - 0.5

    def bucket(alias: str) -> str:
        bits = []
        for j in range(n_planes):
            terms = " + ".join(
                f"CAST({alias}.embedding[{i + 1}] AS DOUBLE) * {pc(j, i)!r}"
                for i in range(dim)
            )
            bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
        return " || ".join(bits)

    return f"""
    WITH qb AS (
      SELECT vec_id, embedding, {bucket('q')} AS bucket
      FROM embeddings q WHERE vec_id < 5
    ), cb AS (
      SELECT vec_id, embedding, {bucket('c')} AS bucket
      FROM embeddings c
    )
    SELECT q_id, n_id, cos, rank FROM (
      SELECT qb.vec_id AS q_id, cb.vec_id AS n_id,
             round(list_cosine_similarity(CAST(qb.embedding AS DOUBLE[]),
                                          CAST(cb.embedding AS DOUBLE[])), 6) AS cos,
             CAST(row_number() OVER (
               PARTITION BY qb.vec_id
               ORDER BY round(list_cosine_similarity(CAST(qb.embedding AS DOUBLE[]),
                                                     CAST(cb.embedding AS DOUBLE[])), 6) DESC,
                        cb.vec_id) AS BIGINT) AS rank
      FROM qb JOIN cb USING (bucket)
      WHERE qb.vec_id <> cb.vec_id
    ) WHERE rank <= {k}
    """


@query("llm_ann_lsh_topk", oracle=_lsh_ann_oracle())
def llm_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets + exact
    re-rank within bucket — the 100 TB path (bucket id becomes the
    shuffle key). Recall vs llm_cosine_topk asserted in tests; since
    r8 ALSO driver-oracle-checked (the md5-derived hyperplanes make
    the whole bucket+rerank path deterministic — see
    :func:`_lsh_ann_oracle`)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=4)


@query(
    "llm_ann_quality",
    oracle=f"""
    WITH exact AS ({_COSINE_TOPK_ORACLE}),
    ann AS ({{LSH}}),
    exq AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM exact GROUP BY 1),
    anq AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_ann
            FROM ann GROUP BY 1),
    ov AS (SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
           FROM exact e JOIN ann a ON e.q_id = a.q_id AND e.n_id = a.n_id
           GROUP BY 1),
    rr AS (SELECT e.q_id, COALESCE(1.0 / a.rank, 0.0) AS rr
           FROM exact e LEFT JOIN ann a
             ON e.q_id = a.q_id AND e.n_id = a.n_id
           WHERE e.rank = 1)
    SELECT exq.q_id, n_exact,
           COALESCE(n_ann, 0) AS n_ann,
           COALESCE(n_overlap, 0) AS n_overlap,
           COALESCE(n_overlap, 0) * 1.0 / n_exact AS recall,
           rr.rr AS rr
    FROM exq LEFT JOIN anq USING (q_id) LEFT JOIN ov USING (q_id)
    JOIN rr USING (q_id)
    """.replace("{LSH}", _lsh_ann_oracle()),
)
def llm_ann_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN retrieval-quality metrics AS A QUERY: per query vector,
    recall@5 and the reciprocal rank of the true nearest neighbor for
    the LSH path against the exact cosine ground truth. Both inputs
    are deterministic (md5 hyperplanes; exact rerank), so the recall
    measurement itself is oracle-checked — the eval harness a corpus
    team runs whenever the index parameters change, not a one-off
    pytest property. Scale: both sides are top-k tables (q·k rows);
    the metrics join is broadcast-trivial next to the searches."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    return _ann_quality_from(
        emb, q, similarity.cosine_topk(emb, q, k=5).localCheckpoint(eager=True)
    )


def _ann_quality_from(
    emb: DataFrame, q: DataFrame, exact: DataFrame
) -> DataFrame:
    """llm_ann_quality body over a (possibly prebuilt) exact top-5
    ground-truth table — shared with llm_mrl_quality under suite
    fusion (both measure against the identical cosine_topk result).

    ``exact`` is expected materialized (q·k rows) and the LSH result
    is checkpointed here: each is referenced three times below, and
    un-materialized the plan inlines the full search subtree per
    reference (measured across the two quality members: 88 -> 52
    parquet scans for suite_corpus_ops once shared/materialized)."""
    ann = similarity.ann_topk_lsh(
        emb, q, k=5, n_planes=4
    ).localCheckpoint(eager=True)
    exq = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    anq = ann.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_ann"))
    ov = (
        exact.join(ann.select("q_id", "n_id"), ["q_id", "n_id"])
        .groupBy("q_id").agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    rr = (
        exact.filter(F.col("rank") == 1)
        .select("q_id", "n_id")
        .join(
            ann.select("q_id", "n_id", F.col("rank").alias("_ar")),
            ["q_id", "n_id"], "left",
        )
        .select(
            "q_id",
            F.coalesce(F.lit(1.0) / F.col("_ar"), F.lit(0.0)).alias("rr"),
        )
    )
    return (
        exq.join(anq, "q_id", "left")
        .join(ov, "q_id", "left")
        .join(rr, "q_id")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_overlap", F.lit(0)).cast("bigint")
            .alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) / F.col("n_exact"))
            .alias("recall"),
            "rr",
        )
    )


@query(
    "llm_sq8_quantize",
    oracle="""
    WITH comp AS (
      SELECT vec_id AS vid, u.i AS pos,
             CAST(round(round(CAST(embedding[u.i] AS DOUBLE), 6)
                        * 1000000, 0) AS BIGINT) AS xi
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u
    ), rng AS (
      SELECT pos, MIN(xi) AS mn, MAX(xi) AS mx FROM comp GROUP BY 1
    ), coded AS (
      SELECT vid, xi, mn, mx,
             CASE WHEN mx = mn THEN 0
                  ELSE ((xi - mn) * 255) // (mx - mn) END AS code
      FROM comp JOIN rng USING (pos)
    ), recon AS (
      SELECT vid, xi, code,
             CASE WHEN mx = mn THEN mn
                  ELSE mn + (code * (mx - mn)) // 255 END AS rx
      FROM coded
    )
    SELECT vid AS vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(ABS(xi - rx)) AS BIGINT) AS total_abs_err,
           CAST(MAX(ABS(xi - rx)) AS BIGINT) AS max_abs_err,
           SUM(code) * 1.0 / COUNT(*) AS avg_code
    FROM recon GROUP BY 1
    """,
)
def llm_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 int8 scalar-quantization audit over the embeddings table:
    per-dim min/max codes, integer-exact reconstruction error per
    vector (1e-6 units) — the go/no-go measurement before switching an
    ANN index to int8 storage. Pure integer arithmetic end to end, so
    the error numbers are oracle-EXACT; see
    operators/similarity.py::sq8_quantize."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.sq8_quantize(t["embeddings"])


@query(
    "llm_embed_near_dup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.42
    """,
)
def llm_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.42 — same-cluster pairs
    in the fixture): exact all-pairs scoring, the verifier downstream of
    an LSH prefilter at scale (see operators/similarity.py docstring)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.cosine_pairs(t["embeddings"], threshold=0.42)


@query(
    "llm_semantic_dedup",
    oracle="""
    SELECT a.vec_id AS vec_id,
           CAST(a.label AS BIGINT) AS cluster,
           COALESCE(MAX(round(list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])), 6)) < 0.42,
                    TRUE) AS keep,
           MAX(round(list_cosine_similarity(
                 CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])), 6)) AS max_prior_sim
    FROM embeddings a
    LEFT JOIN embeddings b ON b.label = a.label AND b.vec_id < a.vec_id
    GROUP BY a.vec_id, a.label
    """,
)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within-cluster semantic dedup — keep a vector iff no
    lower-id vector in its cluster has cos ≥ 0.42. Cluster = the
    fixture's `label` column here (oracle-checkable); the k-means-cell
    path (cluster_col=None) is the production form, property-tested in
    tests/test_llm_ops.py. One GEMM per cluster, never O(n²) pair rows."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.semantic_dedup(
        t["embeddings"], threshold=0.42, cluster_col="label"
    )


def _kmeans_cte_blocks(k: int, iters: int) -> str:
    """The shared unrolled Lloyd's-k-means CTE body (WITH-prefix,
    no final SELECT): md5-ordered deterministic init, exact-decimal
    distances and centroid means, double comparison for assignment
    with cid tiebreak — bit-exact against
    operators/similarity.py::kmeans_assign. Consumed by
    :func:`_kmeans_oracle` (assignment output) and
    :func:`_ivf_ann_oracle` (cells + probes + rerank)."""
    blocks = [f"""
    ve AS (
      SELECT vec_id AS vid, u.i AS pos,
             round(CAST(embedding[u.i] AS DOUBLE), 6) AS v
      FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) u
    ), init AS (
      SELECT vid,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vid AS VARCHAR)), vid) AS INT) - 1 AS cid
      FROM (SELECT vec_id AS vid FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
    ), c0 AS (
      SELECT init.cid, ve.pos, ve.v AS q
      FROM ve JOIN init USING (vid)
    )"""]
    for i in range(1, iters + 1):
        blocks.append(f""", d{i} AS (
      SELECT ve.vid, c.cid,
             CAST(SUM(CAST(round((ve.v - c.q) * (ve.v - c.q), 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS dist2
      FROM ve JOIN c{i - 1} c ON ve.pos = c.pos
      GROUP BY 1, 2
    ), a{i} AS (
      SELECT vid, cid, dist2 FROM d{i}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vid ORDER BY dist2, cid) = 1
    ), c{i} AS (
      SELECT a.cid, ve.pos,
             round(CAST(SUM(CAST(ve.v AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*), 6) AS q
      FROM ve JOIN a{i} a USING (vid)
      GROUP BY 1, 2
    )""")
    return "WITH " + "".join(blocks)


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd's k-means oracle (the PageRank/BPE unrolled-CTE
    convention) — see :func:`_kmeans_cte_blocks`."""
    return (
        _kmeans_cte_blocks(k, iters)
        + f"""
    SELECT vid AS vec_id, CAST(cid AS BIGINT) AS cluster,
           round(dist2, 6) AS dist2
    FROM a{iters}"""
    )


def _ivf_ann_oracle(n_cells: int = 8, iters: int = 2, n_probe: int = 4,
                    topk: int = 5) -> str:
    """Unrolled DuckDB oracle for the grid-exact IVF ANN path (VERDICT
    r8 ask #3 — the SQ8 integer-micro-domain trick applied to index
    training): the coarse quantizer replays as the shared k-means CTEs
    (:func:`_kmeans_cte_blocks`); corpus cells are the final
    assignment a{{iters}}; query probes rank the SAME d{{iters}}
    distance table (vs c_{{iters-1}} centroids — exactly what
    operators/similarity.py::ivf_topk_grid probes with) by
    (dist2, cid); candidates re-rank with round-6
    list_cosine_similarity, the contract :func:`_lsh_ann_oracle`
    already proved hash-exact against exact_rerank."""
    return (
        _kmeans_cte_blocks(n_cells, iters)
        + f""", cells AS (
      SELECT vid AS n_id, cid AS cell FROM a{iters}
    ), probes AS (
      SELECT vid AS q_id, cid AS cell FROM d{iters}
      WHERE vid < 5
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vid ORDER BY dist2, cid) <= {n_probe}
    )
    SELECT q_id, n_id, cos, rank FROM (
      SELECT p.q_id, c.n_id,
             round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                          CAST(ce.embedding AS DOUBLE[])), 6) AS cos,
             CAST(row_number() OVER (
               PARTITION BY p.q_id
               ORDER BY round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                                     CAST(ce.embedding AS DOUBLE[])), 6) DESC,
                        c.n_id) AS BIGINT) AS rank
      FROM probes p
      JOIN cells c USING (cell)
      JOIN embeddings qe ON qe.vec_id = p.q_id
      JOIN embeddings ce ON ce.vec_id = c.n_id
      WHERE p.q_id <> c.n_id
    ) WHERE rank <= {topk}"""
    )


@query("llm_kmeans", oracle=_kmeans_oracle(4, 2))
def llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=4, 2 fixed iterations) over the
    embeddings table — the clustering primitive under SemDeDup-style
    semantic dedup and cluster-balanced sampling. The fixed iteration
    count + exact decimal arithmetic make the full iterative
    computation SQL-oracle-able as unrolled CTEs (the PageRank/BPE
    convention). See operators/similarity.py::kmeans_assign for the
    MLlib-shaped scale analysis."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.kmeans_assign(t["embeddings"], k=4, iters=2)


@query("llm_ann_ivf_topk", oracle=_ivf_ann_oracle())
def llm_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k, driver-oracle-checked since r9: the
    grid-exact variant (operators/similarity.py::ivf_topk_grid) trains
    its coarse quantizer with the decimal-exact Lloyd k-means, so
    index build AND search replay as unrolled CTEs
    (:func:`_ivf_ann_oracle`) — the same graduation path LSH took in
    r8. The cell id is the shuffle key — candidate generation touches
    ~n_probe/n_cells of the corpus. Recall vs llm_cosine_topk stays
    asserted in tests (alongside the spherical ivf_topk variant, which
    remains the pure-speed path). n_probe=4 of 8 cells is the
    evidence-picked default: the sf0.1 sweep (SCALE.md "ANN index
    tuning") measures recall@5 0.74 vs 0.48 at n_probe=2 for the same
    search wall-time."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.ivf_topk_grid(
        emb, emb.filter(F.col("vec_id") < 5),
        k=5, n_cells=8, n_probe=4, iters=2,
    )


#: IVF-PQ index cache: centroids + codebooks are the OFFLINE
#: index-build artifact (deterministic, so caching is semantics-free);
#: repeated calls then measure the search path — the serving shape an
#: ANN system actually runs. Keyed by (sf_dir, dataset fingerprint) —
#: mtime+size of every embeddings parquet file — so a fixture
#: regenerated IN PLACE (the driver does this between rounds) gets a
#: fresh index instead of a silently stale one.
_IVFPQ_INDEX: dict[tuple, tuple[list[list[float]], object]] = {}


def _dataset_fingerprint(sf_dir: str, table: str = "embeddings") -> tuple:
    """(path, mtime_ns, size) of each parquet part of ``table`` — a
    cheap stat-only change detector for in-place rewrites."""
    import glob as _glob
    import os as _os

    p = _os.path.join(sf_dir, f"{table}.parquet")
    parts = (
        [p] if _os.path.isfile(p)
        else sorted(_glob.glob(_os.path.join(p, "*.parquet"))) or [p]
    )
    out = []
    for part in parts:
        st = _os.stat(part)
        out.append((part, st.st_mtime_ns, st.st_size))
    return tuple(out)


def _ivfpq_ann_oracle(n_cells: int = 8, iters: int = 2, n_probe: int = 4,
                      m: int = 8, ksub: int = 16, shortlist: int = 8,
                      topk: int = 5, dim: int = 64) -> str:
    """Unrolled DuckDB oracle for the grid-exact IVF-PQ path — the
    full FAISS IVFPQ pipeline (coarse routing → PQ codebook training →
    encoding → asymmetric-distance shortlist → exact re-rank) as CTEs.
    The trick that keeps this ONE set of CTEs instead of m unrolled
    subspace trainings: the subspace id is a DATA dimension
    (``(pos-1) // dsub`` over the shared exploded component table), so
    per-subspace Lloyd is the k-means recipe with ``sub`` added to
    every grouping — see operators/similarity.py::ivfpq_topk_grid.
    ``dim`` pinned to the fixture's 64 (guarded like the LSH oracle).

    PQ codebooks/ADC run on GRID-NORMALIZED components — round-6 of
    x/||x||, where ||x|| is the left-associative float64 sum the LSH
    oracle already replays bit-for-bit, and sqrt/division are IEEE
    correctly-rounded identically in both engines."""
    dsub = dim // m
    n2 = " + ".join(
        f"CAST(e.embedding[{i + 1}] AS DOUBLE)"
        f" * CAST(e.embedding[{i + 1}] AS DOUBLE)"
        for i in range(dim)
    )
    parts = [_kmeans_cte_blocks(n_cells, iters)]
    parts.append(f""", cells AS (
      SELECT vid AS n_id, cid AS cell FROM a{iters}
    ), probes AS (
      SELECT vid AS q_id, cid AS cell FROM d{iters}
      WHERE vid < 5
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vid ORDER BY dist2, cid) <= {n_probe}
    ), pinit AS (
      SELECT vid,
             CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vid AS VARCHAR)), vid) AS INT) - 1 AS code
      FROM (SELECT vec_id AS vid FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {ksub})
    ), nrm AS (
      SELECT e.vec_id AS vid, sqrt({n2}) AS nn FROM embeddings e
    ), nve AS (
      SELECT e.vec_id AS vid, u.i AS pos,
             CASE WHEN nrm.nn = 0 THEN 0.0
                  ELSE round(CAST(e.embedding[u.i] AS DOUBLE) / nrm.nn, 6)
             END AS v
      FROM embeddings e JOIN nrm ON nrm.vid = e.vec_id,
           LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) u
    ), b0 AS (
      SELECT pinit.code, nve.pos, nve.v AS q
      FROM nve JOIN pinit USING (vid)
    )""".replace("{n2}", n2))
    for i in range(1, iters + 1):
        parts.append(f""", pd{i} AS (
      SELECT ve.vid, (ve.pos - 1) // {dsub} AS sub, b.code,
             CAST(SUM(CAST(round((ve.v - b.q) * (ve.v - b.q), 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS d2
      FROM nve ve JOIN b{i - 1} b ON ve.pos = b.pos
      GROUP BY 1, 2, 3
    ), pa{i} AS (
      SELECT vid, sub, code FROM pd{i}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vid, sub ORDER BY d2, code) = 1
    ), b{i} AS (
      SELECT a.code, ve.pos,
             round(CAST(SUM(CAST(ve.v AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*), 6) AS q
      FROM nve ve JOIN pa{i} a
        ON ve.vid = a.vid AND (ve.pos - 1) // {dsub} = a.sub
      GROUP BY 1, 2
    )""")
    parts.append(f""", pdE AS (
      SELECT ve.vid, (ve.pos - 1) // {dsub} AS sub, b.code,
             CAST(SUM(CAST(round((ve.v - b.q) * (ve.v - b.q), 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS d2
      FROM nve ve JOIN b{iters} b ON ve.pos = b.pos
      GROUP BY 1, 2, 3
    ), pcode AS (
      SELECT vid, sub, code FROM pdE
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY vid, sub ORDER BY d2, code) = 1
    ), qd AS (
      SELECT vid AS q_id, sub, code, d2 FROM pdE WHERE vid < 5
    ), cand AS (
      SELECT p.q_id, c.n_id
      FROM probes p JOIN cells c USING (cell)
      WHERE p.q_id <> c.n_id
    ), adc AS (
      SELECT cand.q_id, cand.n_id,
             CAST(SUM(CAST(qd.d2 AS DECIMAL(38,6))) AS DOUBLE) AS adc
      FROM cand
      JOIN pcode nc ON nc.vid = cand.n_id
      JOIN qd ON qd.q_id = cand.q_id
            AND qd.sub = nc.sub AND qd.code = nc.code
      GROUP BY 1, 2
    ), short AS (
      SELECT q_id, n_id FROM adc
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY adc, n_id) <= {shortlist * topk}
    )
    SELECT q_id, n_id, cos, rank FROM (
      SELECT s.q_id, s.n_id,
             round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                          CAST(ce.embedding AS DOUBLE[])), 6) AS cos,
             CAST(row_number() OVER (
               PARTITION BY s.q_id
               ORDER BY round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                                     CAST(ce.embedding AS DOUBLE[])), 6) DESC,
                        s.n_id) AS BIGINT) AS rank
      FROM short s
      JOIN embeddings qe ON qe.vec_id = s.q_id
      JOIN embeddings ce ON ce.vec_id = s.n_id
    ) WHERE rank <= {topk}""")
    return "".join(parts)


@query("llm_ann_ivfpq_grid", oracle=_ivfpq_ann_oracle())
def llm_ann_ivfpq_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k, driver-oracle-checked (r9): the
    grid-exact variant — coarse routing, distributed subspace-k-means
    codebook training, PQ encoding, asymmetric-distance shortlist and
    exact re-rank all on the decimal grid, replayed end-to-end by
    :func:`_ivfpq_ann_oracle`. The FAISS-shaped normalized variant
    (llm_ann_ivfpq_topk, cached index, driver-sample training) stays
    the pure-speed path with pytest recall properties."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.ivfpq_topk_grid(
        emb, emb.filter(F.col("vec_id") < 5),
        k=5, n_cells=8, n_probe=4, m=8, ksub=16, iters=2, shortlist=8,
    )


def llm_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k (FAISS IVFPQ shape): coarse IVF routing,
    product-quantized asymmetric-distance scoring inside probed cells
    (corpus travels as m uint8 codes — 32× smaller than float32
    vectors), exact re-rank of the PQ shortlist only. Recall vs
    llm_cosine_topk asserted in tests.

    NOT a registry query (r10): the IVF-PQ *family's* verdict comes
    from llm_ann_ivfpq_grid, whose grid-exact training is replayed
    end-to-end by the DuckDB oracle — one op, one verdict. This
    variant demonstrates the production speed path (cached index,
    driver-sample float training, uint8 codes) and keeps its recall +
    index-cache-invalidation properties in tests/test_llm_ops.py."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    key = (sf_dir, _dataset_fingerprint(sf_dir))
    if key not in _IVFPQ_INDEX:
        # evict superseded indexes of the same path (in-place rewrite)
        for stale in [k for k in _IVFPQ_INDEX if k[0] == sf_dir]:
            del _IVFPQ_INDEX[stale]
        _IVFPQ_INDEX[key] = (
            similarity.kmeans_centroids(emb, n_cells=16),
            similarity.pq_train_codebooks(emb, m=8, ksub=16),
        )
    cents, books = _IVFPQ_INDEX[key]
    return similarity.ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5),
        k=5, n_cells=16, n_probe=4, m=8, ksub=16,
        centroids=cents, codebooks=books,
    )


@query(
    "llm_tfidf_top_terms",
    oracle="""
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM terms GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT doc_id, tf.term,
             round(tf * ln((1 + (SELECT COUNT(*) FROM documents)) / (df + 1.0)), 6)
               AS tfidf
      FROM tf JOIN dfreq ON tf.term = dfreq.term
    )
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — corpus-level term statistics
    (two map-combined shuffles + a term join; see
    operators/text.py::tfidf_top_terms for the scale notes)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.tfidf_top_terms(t["documents"], k=3)


@query(
    "llm_repetition",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), wc AS (
      SELECT doc_id, t, COUNT(*) AS c FROM words GROUP BY 1, 2
    ), wstats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
             MAX(c) AS top_w
      FROM wc GROUP BY 1
    ), bg AS (
      SELECT doc_id, s[i] || ' ' || s[i + 1] AS t
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) d,
           UNNEST(generate_series(1, len(s) - 1)) AS u(i)
    ), bc AS (
      SELECT doc_id, t, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ), bstats AS (
      SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS n_distinct_bigrams,
             MAX(c) AS top_b
      FROM bc GROUP BY 1
    )
    SELECT w.doc_id, w.n_words, w.n_distinct_words,
           w.top_w * 1.0 / w.n_words AS top_word_ratio,
           (w.n_words - w.n_distinct_words) * 1.0 / w.n_words AS dup_word_ratio,
           CASE WHEN b.n_bigrams > 0
                THEN (b.n_bigrams - b.n_distinct_bigrams) * 1.0 / b.n_bigrams
                ELSE 0.0 END AS dup_bigram_ratio,
           CASE WHEN b.n_bigrams > 0
                THEN b.top_b * 1.0 / b.n_bigrams ELSE 0.0 END AS top_bigram_ratio,
           (w.top_w * 1.0 / w.n_words > 0.2) AS gopher_fail
    FROM wstats w LEFT JOIN bstats b USING (doc_id)
    """,
)
def llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (dup-word / dup-bigram /
    top-token fractions) — see operators/text.py::repetition_stats for
    the scale notes (in-row bigram build, map-combined counts)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.repetition_stats(t["documents"])


# eval split for the contamination scan: a deterministic tenth of the
# corpus stands in for the held-out benchmark suite
_CONTAM_SHINGLES = """
  CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
  ELSE list_distinct(list_transform(
    range(1, len(string_split(text, ' ')) - 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         || ' ' || string_split(text, ' ')[i+2])) END
"""


@query(
    "llm_contamination",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT unnest({_CONTAM_SHINGLES}) AS s
      FROM documents WHERE doc_id % 10 = 0
    ), tr AS (
      SELECT doc_id, unnest({_CONTAM_SHINGLES}) AS s
      FROM documents WHERE doc_id % 10 <> 0
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM tr GROUP BY 1
    ), hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      FROM tr JOIN ev USING (s) GROUP BY 1
    )
    SELECT sizes.doc_id, n_sh, COALESCE(n_hit, 0) AS n_hit,
           COALESCE(n_hit, 0) * 1.0 / n_sh AS contaminated_frac
    FROM sizes LEFT JOIN hits USING (doc_id)
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: per train doc, the fraction of its
    distinct 3-gram shingles found anywhere in the eval tenth of the
    corpus (doc_id % 10 == 0). The eval shingle set broadcasts — see
    operators/text.py::contamination_check."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"]
    return text.contamination_check(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        n=3,
    )


_BLOOM_BIT = (
    "CAST('0x' || substr(md5(CAST(u.j AS VARCHAR) || '|' || s), 1, 8) "
    "AS BIGINT) % 4096"
)


@query(
    "llm_bloom_contamination",
    oracle=f"""
    WITH ev AS (
      SELECT DISTINCT unnest({_CONTAM_SHINGLES}) AS s
      FROM documents WHERE doc_id % 10 = 0
    ), bits AS (
      SELECT DISTINCT {_BLOOM_BIT} AS b
      FROM ev, UNNEST(generate_series(0, 2)) AS u(j)
    ), tr AS (
      SELECT doc_id, unnest({_CONTAM_SHINGLES}) AS s
      FROM documents WHERE doc_id % 10 <> 0
    ), probes AS (
      SELECT doc_id, s, {_BLOOM_BIT} AS b
      FROM tr, UNNEST(generate_series(0, 2)) AS u(j)
    ), per_sh AS (
      SELECT p.doc_id, p.s, (COUNT(bits.b) = 3) AS bloom_hit
      FROM probes p LEFT JOIN bits ON p.b = bits.b
      GROUP BY 1, 2
    ), marked AS (
      SELECT per_sh.doc_id, per_sh.bloom_hit, (ev.s IS NOT NULL) AS ex
      FROM per_sh LEFT JOIN ev ON per_sh.s = ev.s
    )
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_sh,
      CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom,
      CAST(SUM(CASE WHEN ex THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      CAST(SUM(CASE WHEN bloom_hit AND NOT ex THEN 1 ELSE 0 END)
           AS BIGINT) AS n_fp,
      SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
        AS bloom_frac
    FROM marked GROUP BY 1
    """,
)
def llm_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination: the eval tenth's shingles folded
    into a 4096-bit / 3-hash filter (md5 bits — bit-identical in both
    engines), probed by every train shingle; per doc the Bloom hits,
    exact hits, and the REALIZED false-positive count. See
    operators/text.py::bloom_contamination for why the mergeable
    constant-size filter is the 100 TB membership artifact."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"]
    return text.bloom_contamination(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        n=3, m=4096, k=3,
    )


@query(
    "llm_corpus_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS old_fp FROM documents
    ), new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' updated'
                      ELSE text END) AS new_fp
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 1000000, md5(text || ' new')
      FROM documents WHERE doc_id % 13 = 0
    )
    SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN old_fp = new_fp THEN 'unchanged'
                ELSE 'changed' END AS status,
           old_fp, new_fp
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
)
def llm_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version diff against a simulated crawl refresh (every
    11th doc dropped, every 7th edited, every 13th re-added under a
    new id) — the added/removed/changed/unchanged audit between
    dataset versions. Fingerprints join, text never shuffles; see
    operators/dedup.py::corpus_diff."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 11 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.col("text"), F.lit(" updated")),
            ).otherwise(F.col("text")),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" new")).alias("text"),
            )
        )
    )
    return dedup.corpus_diff(d, new)


@query(
    "llm_reservoir_sample",
    oracle="""
    SELECT doc_id, pri, pick FROM (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS pri,
             CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS pick
      FROM documents
    ) WHERE pick <= 100
    """,
)
def llm_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N uniform sample (the reservoir-sampling contract, made
    deterministic): the 100 docs with smallest md5(id) — an unbiased
    without-replacement sample that every engine and every re-run
    reproduces. Scale shape: orderBy+limit plans as TakeOrdered
    (per-partition top-N, merge on the driver — no global sort, no
    single-partition window); the rank is then a window over the
    100-row result, bounded by construction. At 100 TB the same
    md5-threshold trick as stratified_sample replaces even the top-N
    merge: sample ≈2N by a priority cutoff, then rank exactly."""
    t = load_tables(spark, sf_dir, ("documents",))
    from pyspark.sql import Window as W

    top = (
        t["documents"]
        .select(
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("pri"),
        )
        .orderBy("pri", "doc_id")
        .limit(100)
    )
    w = W.orderBy("pri", "doc_id")
    return top.withColumn(
        "pick", F.row_number().over(w).cast("bigint")
    )


@query(
    "llm_importance_weights",
    oracle="""
    WITH tok AS (
      SELECT doc_id, is_t, substr(md5(w), 1, 2) AS b
      FROM (SELECT doc_id, (lang = 'en') AS is_t,
                   unnest(string_split(text, ' ')) AS w
            FROM documents)
    ), stats AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t
      FROM tok GROUP BY b
    ), tot AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS cap_n_c,
             CAST(SUM(n_t) AS BIGINT) AS cap_n_t
      FROM stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           CAST(SUM(n_t) + COUNT(*) AS BIGINT) AS s_target,
           CAST(SUM(n_c) + COUNT(*) AS BIGINT) AS s_corpus,
           (CAST(SUM(n_t) + COUNT(*) AS DOUBLE)
              * CAST(MAX(cap_n_c) + 256 AS DOUBLE))
             / (CAST(SUM(n_c) + COUNT(*) AS DOUBLE)
                * CAST(MAX(cap_n_t) + 256 AS DOUBLE))
             AS weight
    FROM tok JOIN stats USING (b) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def llm_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-resampling weights toward the English
    slice of the corpus (target = ``lang = 'en'``): hashed-token
    likelihood ratio p_target/q_corpus per document, exact-integer
    formulation — see operators/text.py::importance_weights for the
    scale shape (256-row bucket table broadcasts; two shuffles total)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.importance_weights(
        t["documents"], F.col("lang") == "en"
    )


# ---------------------------------------------------------------------------
# End-to-end corpus materialization: the per-document keep decision a
# training run consumes, composing every quality gate above. The oracle
# is composed from the member oracles verbatim (registry.ORACLES), so
# the two sides can never drift apart.
from datawarehouse_spark.queries.registry import ORACLES as _ORACLES  # noqa: E402

@query(
    "llm_domain_cap",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY k, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM d
    )
    SELECT doc_id, source, n_tokens, cum_before,
           cum_before < 100 AS keep
    FROM c
    """,
)
def llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget capping (100-token budget per source,
    md5-shuffled admission order) — the corpus-balancing step that
    keeps high-volume domains from dominating the training mix; see
    operators/text.py::domain_token_cap for the one-shuffle plan and
    the hot-domain salting note."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.domain_token_cap(t["documents"], cap_tokens=100)


@query(
    "llm_quality_filter",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             (len(list_filter(string_split(text, ' '),
                  x -> list_contains(['the','a','of','and','to','in','is'], x))) * 1.0
                / len(string_split(text, ' '))) AS score
      FROM documents
    )
    SELECT doc_id, source, score,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS pr,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) < 0.8 AS keep
    FROM s
    """,
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality-percentile gate (keep each source's top 80%
    by stopword-ratio score) — see
    operators/text.py::quality_percentile_filter for the one-shuffle
    plan and the per-source-band rationale."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.quality_percentile_filter(t["documents"], keep_frac=0.8)


#: The domain token cap inside corpus prep deliberately re-states the
#: domain_token_cap window (same md5 admission order, same 100-token
#: budget) restricted to documents that survive every upstream gate:
#: budgeting over ALL documents would let eval-split/dedup-rejected/
#: low-quality docs consume a domain's budget and under-fill its
#: contribution to the final corpus. Non-survivors contribute 0 tokens
#: to the cumulative sum, so the survivors' admission order is
#: identical to capping the filtered set — in ONE window pass, no
#: second scan. The standalone llm_domain_cap row still verifies the
#: operator itself over the raw corpus.
_PREP_ORACLE = f"""
    WITH pre AS (
      SELECT d.doc_id, d.source,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(d.doc_id AS VARCHAR)) AS k,
             (d.doc_id % 10 = 0) AS is_eval,
             (dk.doc_id IS NOT NULL) AS dedup_keep,
             NOT COALESCE(rep.gopher_fail, FALSE) AS gopher_ok,
             (cont.contaminated_frac IS NULL OR cont.contaminated_frac < 0.5)
               AS clean,
             q.keep AS quality_ok,
             samp.keep AS sampled,
             (d.doc_id % 10 <> 0 AND dk.doc_id IS NOT NULL
              AND NOT COALESCE(rep.gopher_fail, FALSE)
              AND (cont.contaminated_frac IS NULL
                   OR cont.contaminated_frac < 0.5)
              AND q.keep AND samp.keep) AS pre_keep,
             iw.weight AS weight
      FROM documents d
      LEFT JOIN ({_ORACLES["llm_dedup_keep"]}) dk ON dk.doc_id = d.doc_id
      LEFT JOIN ({_ORACLES["llm_repetition"]}) rep ON rep.doc_id = d.doc_id
      LEFT JOIN ({_ORACLES["llm_contamination"]}) cont
        ON cont.doc_id = d.doc_id
      LEFT JOIN ({_ORACLES["llm_quality_filter"]}) q ON q.doc_id = d.doc_id
      LEFT JOIN ({_ORACLES["llm_stratified_sample"]}) samp
        ON samp.doc_id = d.doc_id
      LEFT JOIN ({_ORACLES["llm_importance_weights"]}) iw
        ON iw.doc_id = d.doc_id
    ), capped AS (
      SELECT *,
             COALESCE(SUM(CASE WHEN pre_keep THEN n_tokens ELSE 0 END)
               OVER (PARTITION BY source ORDER BY k, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
      FROM pre
    )
    SELECT doc_id, is_eval, dedup_keep, gopher_ok, clean, quality_ok,
           CASE WHEN pre_keep THEN cum_before < 100 END AS within_cap,
           sampled,
           (pre_keep AND COALESCE(
              CASE WHEN pre_keep THEN cum_before < 100 END, FALSE)) AS keep,
           weight
    FROM capped
"""


@query("llm_corpus_prep", oracle=_PREP_ORACLE)
def llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus materialization — one keep decision per document
    with per-gate audit flags: eval-split exclusion, exact+near dedup
    (llm_dedup_keep), Gopher repetition cut, benchmark-contamination cut
    (frac ≥ 0.5 — the fixture's contaminated tail sits at ≥ 0.96, the
    clean mass ≤ 0.30), per-domain quality-percentile gate, per-domain
    token-budget cap, stratified domain-mix sampling. Emitting flags
    for ALL docs (not the filtered set) keeps every gate row-level
    verifiable and gives the pipeline its audit table for free.

    The token cap runs LAST, over the documents that survive every
    other gate (see the note above _PREP_ORACLE): rejected documents
    contribute zero tokens to the conditional window cumsum, so the
    budget fills with actual training tokens — and the whole cap is
    one window pass, no second corpus scan. within_cap is NULL for
    docs the upstream gates rejected (never considered)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    dk = llm_dedup_keep(spark, sf_dir).withColumn("dk", F.lit(True))
    iw = llm_importance_weights(spark, sf_dir).select("doc_id", "weight")
    rep = llm_repetition(spark, sf_dir).select("doc_id", "gopher_fail")
    cont = llm_contamination(spark, sf_dir).select(
        "doc_id", "contaminated_frac"
    )
    qual = llm_quality_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("quality_ok")
    )
    samp = llm_stratified_sample(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("samp_keep")
    )
    pre = (
        docs.select(
            "doc_id", "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
            F.md5(F.col("doc_id").cast("string")).alias("k"),
            (F.col("doc_id") % 10 == 0).alias("is_eval"),
        )
        .join(dk, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(qual, "doc_id", "left")
        .join(samp, "doc_id", "left")
        .select(
            "doc_id", "source", "n_tokens", "k",
            "is_eval",
            F.coalesce(F.col("dk"), F.lit(False)).alias("dedup_keep"),
            (~F.coalesce(F.col("gopher_fail"), F.lit(False))).alias("gopher_ok"),
            (
                F.col("contaminated_frac").isNull()
                | (F.col("contaminated_frac") < 0.5)
            ).alias("clean"),
            "quality_ok",
            F.col("samp_keep").alias("sampled"),
        )
        .withColumn(
            "pre_keep",
            ~F.col("is_eval") & F.col("dedup_keep") & F.col("gopher_ok")
            & F.col("clean") & F.col("quality_ok") & F.col("sampled"),
        )
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("source")
        .orderBy("k", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(
            F.when(F.col("pre_keep"), F.col("n_tokens")).otherwise(0)
        ).over(w),
        F.lit(0),
    )
    within_cap = F.when(F.col("pre_keep"), F.col("cum_before") < 100)
    return (
        pre.withColumn("cum_before", cum_before)
        .select(
            "doc_id", "is_eval", "dedup_keep", "gopher_ok", "clean",
            "quality_ok",
            within_cap.alias("within_cap"),
            "sampled",
            (
                F.col("pre_keep")
                & F.coalesce(
                    F.when(F.col("pre_keep"), F.col("cum_before") < 100),
                    F.lit(False),
                )
            ).alias("keep"),
        )
        .join(iw, "doc_id", "left")
    )


@query(
    "llm_corpus_gates",
    oracle=f"""
    WITH tr AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
    ), dup AS (
      SELECT doc_id,
             doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
               AS dup_exact
      FROM tr
    ), words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM tr
    ), wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2
    ), gop AS (
      SELECT doc_id, (max(c) * 1.0 / sum(c) > 0.2) AS gopher_fail
      FROM wc GROUP BY 1
    ), ev AS (
      SELECT DISTINCT unnest({_CONTAM_SHINGLES}) AS s
      FROM documents WHERE doc_id % 10 = 0
    ), trs AS (
      SELECT doc_id, unnest({_CONTAM_SHINGLES}) AS s FROM tr
    ), cont AS (
      SELECT trs.doc_id,
             (COUNT(ev.s) * 1.0 / COUNT(*) < 0.5) AS clean
      FROM trs LEFT JOIN ev USING (s) GROUP BY 1
    ), qual AS (
      SELECT doc_id,
             (len(string_split(text, ' ')) >= 12
              AND (length(text) - (len(string_split(text, ' ')) - 1)) * 1.0
                  / len(string_split(text, ' ')) <= 5.0) AS quality_ok
      FROM tr
    )
    SELECT dup.doc_id, dup.dup_exact,
           NOT gop.gopher_fail AS gopher_ok,
           cont.clean, qual.quality_ok,
           (NOT dup.dup_exact AND NOT gop.gopher_fail AND cont.clean
            AND qual.quality_ok) AS keep
    FROM dup
    JOIN gop USING (doc_id)
    JOIN cont USING (doc_id)
    JOIN qual USING (doc_id)
    """,
)
def llm_corpus_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming corpus-prep gate chain's batch twin
    (streaming/corpus.py::corpus_prep_replay): keep-first exact dedup
    by global id order composed with the stateless per-document gates
    (Gopher repetition, benchmark contamination, fixed-threshold
    quality band). This is the DETERMINISTIC oracle surface of the
    r11 incremental foreachBatch pipeline — the streaming form itself
    is verified by differential replay with a kill-restart
    (tests/test_streaming.py::
    test_streaming_corpus_prep_gate_chain_matches_batch_replay)."""
    from datawarehouse_spark.streaming.corpus import corpus_prep_replay

    d = load_tables(spark, sf_dir, ("documents",))["documents"]
    return corpus_prep_replay(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
    )


@query(
    "llm_chunk",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(list_filter(range(0, len(toks), 24),
                                s -> s = 0 OR s + 8 < len(toks)))
               AS tok_start
      FROM t
    )
    SELECT doc_id,
           CAST(tok_start // 24 AS BIGINT) AS chunk_id,
           CAST(tok_start AS BIGINT) AS tok_start,
           CAST(least(tok_start + 32, len(toks)) AS BIGINT) AS tok_end,
           array_to_string(list_slice(toks, tok_start + 1, tok_start + 32), ' ')
             AS chunk_text,
           CAST(least(tok_start + 32, len(toks)) - tok_start AS BIGINT)
             AS n_chunk_tokens
    FROM s
    """,
)
def llm_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (32-token chunks every 24
    tokens) — the RAG-index / long-doc pretraining prep step; see
    operators/text.py::chunk_documents for the zero-shuffle plan."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.chunk_documents(t["documents"], chunk_tokens=32, stride=24)



@query(
    "llm_lm_perplexity",
    oracle="""
    WITH bg AS (
      SELECT doc_id, s[i] AS w1, s[i + 1] AS w2
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) d,
           UNNEST(generate_series(1, len(s) - 1)) AS u(i)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT w2) AS v FROM c2
    ), model AS (
      SELECT c2.w1, c2.w2,
             ROUND(log2(CAST(c2.c2 + 1 AS DOUBLE))
                   - log2(CAST(c1.c1 + v.v AS DOUBLE)), 6) AS logp
      FROM c2 JOIN c1 USING (w1) CROSS JOIN v
    ), scored AS (
      SELECT bg.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(CAST(model.logp AS DECIMAL(38,6))) * -1000000
                  AS BIGINT) AS m
      FROM bg JOIN model USING (w1, w2) GROUP BY 1
    ), avgd AS (
      -- exact integer-micro HALF-UP average: ROUND(sum/n, 6) over a
      -- double straddles double-rounding boundaries the engines
      -- resolve differently (r11 sf1 sweep catch)
      SELECT doc_id, n_bigrams,
             -((2 * m + n_bigrams) // (2 * n_bigrams)) / 1000000.0
               AS avg_logp
      FROM scored
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           s.avg_logp,
           ROUND(POW(2.0, -s.avg_logp), 6) AS ppl
    FROM documents d LEFT JOIN avgd s USING (doc_id)
    """,
)
def llm_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM perplexity per document — the
    CCNet/KenLM quality-filter shape (low-probability docs are noise).
    Model marginals are window aggregates over one map-combined bigram
    count (single lineage, no per-branch corpus re-scan); see
    operators/text.py::lm_score for the 100 TB notes."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.lm_score(t["documents"])


@query(
    "llm_kn_perplexity",
    oracle="""
    WITH bg AS (
      SELECT doc_id, s[i] AS w1, s[i + 1] AS w2
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) d,
           UNNEST(generate_series(1, len(s) - 1)) AS u(i)
    ), c AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), m AS (
      SELECT w1, w2, c12,
             SUM(c12) OVER (PARTITION BY w1) AS c1,
             COUNT(*) OVER (PARTITION BY w1) AS n1a,
             COUNT(*) OVER (PARTITION BY w2) AS n1b,
             COUNT(*) OVER () AS b
      FROM c
    ), model AS (
      SELECT w1, w2,
             ROUND(log2(
               (c12 - CAST(0.75 AS DOUBLE)) / c1
               + (CAST(0.75 AS DOUBLE) * n1a / c1)
                 * (n1b / CAST(b AS DOUBLE))
             ), 6) AS logp
      FROM m
    ), scored AS (
      SELECT bg.doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(CAST(model.logp AS DECIMAL(38,6))) * -1000000
                  AS BIGINT) AS m
      FROM bg JOIN model USING (w1, w2) GROUP BY 1
    ), avgd AS (
      -- exact integer-micro HALF-UP average (see llm_lm_perplexity)
      SELECT doc_id, n_bigrams,
             -((2 * m + n_bigrams) // (2 * n_bigrams)) / 1000000.0
               AS avg_logp
      FROM scored
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           s.avg_logp AS kn_avg_logp,
           ROUND(POW(2.0, -s.avg_logp), 6) AS kn_ppl
    FROM documents d LEFT JOIN avgd s USING (doc_id)
    """,
)
def llm_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram perplexity per document (r9) —
    the smoothing the production KenLM quality filter actually uses
    (continuation-count backoff demotes "frequent only in one
    context" words). Same one-count-one-lineage shape as the add-one
    baseline; see operators/text.py::kn_lm_score."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.kn_lm_score(t["documents"])


@query(
    "llm_domain_kl",
    oracle="""
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ), sc AS (
      SELECT source, t, COUNT(*) AS c_s FROM w GROUP BY 1, 2
    ), ns AS (
      SELECT source, SUM(c_s) AS n_s FROM sc GROUP BY 1
    ), ct AS (
      SELECT t, SUM(c_s) AS c_t FROM sc GROUP BY 1
    ), tot AS (
      SELECT SUM(n_s) AS n FROM ns
    )
    SELECT sc.source,
           CAST(SUM(sc.c_s) AS BIGINT) AS n_tok,
           CAST(COUNT(*) AS BIGINT) AS n_vocab,
           ROUND(CAST(SUM(CAST(ROUND((sc.c_s * 1.0 / ns.n_s)
                     * (log2(sc.c_s * 1.0 / ns.n_s)
                        - log2(ct.c_t * 1.0 / tot.n)), 9)
                   AS DECIMAL(38,9))) AS DOUBLE), 6) AS kl_bits
    FROM sc JOIN ct USING (t) JOIN ns USING (source) CROSS JOIN tot
    GROUP BY 1
    """,
)
def llm_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain unigram KL divergence vs the corpus mix (bits) — the
    distribution-shift number a mixture tuner reads; companion to DSIR
    (which reweights documents; this scores whole domains). One token
    pass, then vocab-sized arithmetic; see
    operators/text.py::domain_divergence."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.domain_divergence(t["documents"])


@query(
    "llm_domain_overlap",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT source AS src,
             s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS sh
      FROM (SELECT source, string_split(text, ' ') AS s
            FROM documents
            WHERE len(string_split(text, ' ')) >= 3) d,
           UNNEST(generate_series(1, len(s) - 2)) AS u(i)
    ), sizes AS (
      SELECT src, COUNT(*) AS n_sh FROM sh GROUP BY 1
    ), inter AS (
      SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT sa.src AS source_a, sb.src AS source_b,
           CAST(sa.n_sh AS BIGINT) AS n_a,
           CAST(sb.n_sh AS BIGINT) AS n_b,
           CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
           ROUND(COALESCE(i.n_common, 0) * 1.0
                 / (sa.n_sh + sb.n_sh - COALESCE(i.n_common, 0)), 6)
             AS jaccard
    FROM sizes sa
    JOIN sizes sb ON sa.src < sb.src
    LEFT JOIN inter i ON i.source_a = sa.src AND i.source_b = sb.src
    """,
)
def llm_domain_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-pair shingle-set Jaccard matrix — which SOURCES share
    content (mirrors, syndication, acquisition-level leakage); the
    corpus-level counterpart of per-doc near-dup detection. See
    operators/text.py::domain_overlap for the 100 TB notes."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.domain_overlap(t["documents"])


def _bm25_cand_sql(k: int) -> str:
    """Okapi BM25 ranking CTE ending in ``cand`` (qid, doc_id, score,
    rank ≤ k) — shared by the standalone BM25 oracle (k=5) and the
    hybrid-retrieval oracle's candidate stage (k=20)."""
    return f"""
    WITH q(qid, qtext) AS (
      VALUES ('q1', 'spark join table'),
             ('q2', 'stream window agg'),
             ('q3', 'customer order data')
    ), qt AS (
      SELECT qid, unnest(string_split(qtext, ' ')) AS term FROM q
    ), words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2
    ), enr AS (
      SELECT doc_id, term, tf,
             SUM(tf) OVER (PARTITION BY doc_id) AS dl,
             COUNT(*) OVER (PARTITION BY term) AS df_t
      FROM tf
    ), stats AS (
      SELECT COUNT(*) AS n,
             SUM(len(string_split(text, ' '))) * 1.0 / COUNT(*) AS avgdl
      FROM documents
    ), sc AS (
      SELECT qt.qid, enr.doc_id,
             ROUND(ln(1 + (stats.n - enr.df_t + 0.5) / (enr.df_t + 0.5))
                   * enr.tf * (1.2 + 1.0)
                   / (enr.tf + 1.2 * (1.0 - 0.75
                                      + 0.75 * enr.dl / stats.avgdl)),
                   6) AS s
      FROM enr JOIN qt USING (term) CROSS JOIN stats
    ), agg AS (
      SELECT qid, doc_id,
             ROUND(CAST(SUM(CAST(s AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS score
      FROM sc GROUP BY 1, 2
    ), cand AS (
      SELECT qid, doc_id, score,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT)
               AS rank
      FROM agg
      QUALIFY rank <= {k}
    )"""


@query(
    "llm_bm25_topk",
    oracle=_bm25_cand_sql(5)
    + "\n    SELECT qid, doc_id, score, rank FROM cand",
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical top-5 per query — the retrieval counterpart
    of the embedding ANN family, over a fixed 3-query workload on the
    fixture vocabulary. See operators/text.py::bm25_topk for the
    100 TB notes (tf exchange reuse, broadcast df/stats)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.bm25_topk(
        t["documents"],
        [("q1", "spark join table"),
         ("q2", "stream window agg"),
         ("q3", "customer order data")],
        k=5,
    )


@query(
    "llm_hybrid_retrieval",
    oracle=_bm25_cand_sql(20)
    + """
    , ce AS (
      SELECT c.qid, c.doc_id, c.score AS bm25_score, c.rank AS bm25_rank,
             u.i AS pos, round(CAST(e.embedding[u.i] AS DOUBLE), 6) AS v
      FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id,
           LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) u
    ), cen AS (
      SELECT qid, pos,
             round(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*), 6) AS qv
      FROM ce WHERE bm25_rank <= 3 GROUP BY 1, 2
    ), qn AS (
      SELECT qid,
             CAST(SUM(CAST(round(qv * qv, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS nq
      FROM cen GROUP BY 1
    ), sc2 AS (
      SELECT ce.qid, ce.doc_id, ce.bm25_score, ce.bm25_rank,
             CAST(SUM(CAST(round(ce.v * cen.qv, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS dot,
             CAST(SUM(CAST(round(ce.v * ce.v, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS nc
      FROM ce JOIN cen ON ce.qid = cen.qid AND ce.pos = cen.pos
      GROUP BY 1, 2, 3, 4
    ), fin AS (
      SELECT sc2.qid, sc2.doc_id, sc2.bm25_score,
             CAST(sc2.bm25_rank AS BIGINT) AS bm25_rank,
             round(sc2.dot / (sqrt(sc2.nc) * sqrt(qn.nq)), 6) AS cos_prf
      FROM sc2 JOIN qn ON sc2.qid = qn.qid
    )
    SELECT qid, doc_id, bm25_score, bm25_rank, cos_prf,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY qid
             ORDER BY cos_prf DESC, bm25_score DESC, doc_id) AS BIGINT)
             AS rank
    FROM fin
    QUALIFY rank <= 5
    """,
)
def llm_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval cascade (VERDICT r6 stretch ask #8):
    BM25 recalls 20 lexical candidates per query, then each candidate
    is rescored by embedding cosine against the pseudo-relevance
    centroid of the query's top-3 BM25 documents (Rocchio PRF — the
    query string has no embedding, so its best documents stand in for
    it); final top-5 by (cos_prf, bm25 score, doc_id). The lexical
    index and the semantic rerank compose the reference's search story
    (docs/建设方法论.md retrieval layer) out of two existing stages.
    See operators/similarity.py::prf_hybrid_topk for the 100 TB shape
    (broadcast-gated single embedding pass)."""
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    cands = text.bm25_topk(
        t["documents"],
        [("q1", "spark join table"),
         ("q2", "stream window agg"),
         ("q3", "customer order data")],
        k=20,
    )
    return similarity.prf_hybrid_topk(
        cands, t["embeddings"], k=5, prf_depth=3
    )


@query(
    "llm_cms_heavy_hitters",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents
    ), hashes AS (
      SELECT w.t, u.r,
             CAST('0x' || substr(
               md5(CAST(u.r AS VARCHAR) || '|' || w.t), 1, 8)
               AS BIGINT) % 256 AS b
      FROM words w, UNNEST(generate_series(0, 3)) AS u(r)
    ), sketch AS (
      SELECT r, b, COUNT(*) AS c FROM hashes GROUP BY 1, 2
    ), exact AS (
      SELECT t, COUNT(*) AS exact_c FROM words GROUP BY 1
    ), probes AS (
      SELECT DISTINCT t, r, b FROM hashes
    ), est AS (
      SELECT p.t, MIN(s.c) AS cms_est
      FROM probes p JOIN sketch s USING (r, b) GROUP BY 1
    ), ranked AS (
      SELECT e.t AS token,
             CAST(e.exact_c AS BIGINT) AS exact_c,
             CAST(est.cms_est AS BIGINT) AS cms_est,
             CAST(est.cms_est - e.exact_c AS BIGINT) AS overcount,
             CAST(ROW_NUMBER() OVER (ORDER BY e.exact_c DESC, e.t)
                  AS BIGINT) AS rank
      FROM exact e JOIN est ON est.t = e.t
    )
    SELECT token, exact_c, cms_est, overcount, rank
    FROM ranked WHERE rank <= 20
    """,
)
def llm_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (top-20 corpus tokens, exact vs
    CMS estimate). md5-derived buckets make the sketch bit-identical
    across engines, so the estimates are oracle-EXACT; see
    operators/text.py::cms_heavy_hitters for why the mergeable sketch
    is the 100 TB / streaming artifact and exact is the diagnostic."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.cms_heavy_hitters(t["documents"], d=4, w=256, k=20)


@query(
    "llm_pagerank",
    oracle=graph.pagerank_oracle_sql(_DUCK_NGRAM_CTES, n_iters=10),
)
def llm_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the exact near-dup pair graph — ranks documents
    by duplication-cluster centrality (the "keep the hub, drop the
    mirrors" authority signal). 10 fixed iterations; EXACT cross-engine
    parity with no rounding (PageRank needs no libm — IEEE ops plus
    decimal-summed contributions only); the oracle unrolls the
    iterations as chained CTEs. See operators/graph.py::pagerank."""
    t = load_tables(spark, sf_dir, ("documents",))
    pairs = dedup.ngram_jaccard_pairs(
        t["documents"], threshold=0.3, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )
    return graph.pagerank(pairs, n_iters=10)


@query(
    "llm_graph_triangles",
    oracle=graph.triangle_oracle_sql(_DUCK_NGRAM_CTES),
)
def llm_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per node over the
    exact near-dup pair graph — the density audit on the duplication
    graph (cliques = template/mirror families worth one keeper;
    high-degree zero-triangle hubs = boilerplate-shingle artifacts
    that inflate candidate volume). Degree-ordered compact-forward
    enumeration, EXACT cross-engine (integer counts, one IEEE division
    for the coefficient). See operators/graph.py::triangle_stats."""
    t = load_tables(spark, sf_dir, ("documents",))
    pairs = dedup.ngram_jaccard_pairs(
        t["documents"], threshold=0.3, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )
    return graph.triangle_stats(pairs)


@query(
    "llm_graph_kcore",
    oracle=graph.kcore_oracle_sql(_DUCK_NGRAM_CTES, k=2, rounds=8),
)
def llm_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core decomposition of the exact near-dup pair graph — peel
    degree-<2 nodes until stable; what survives is the dense nucleus
    of the duplication graph (mirror/template families), what peels is
    chain/star periphery one keeper handles. Completes the graph-audit
    trio (PageRank centrality, triangle density, k-core nucleus), all
    on the same candidate graph with exact integer oracles. See
    operators/graph.py::kcore_stats (bounded peel rounds; the oracle
    unrolls the same count — a green row proves the bound held)."""
    t = load_tables(spark, sf_dir, ("documents",))
    pairs = dedup.ngram_jaccard_pairs(
        t["documents"], threshold=0.3, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )
    return graph.kcore_stats(pairs, k=2, max_rounds=8)


@query(
    "llm_pmi_collocations",
    oracle="""
    WITH bg AS (
      SELECT s[i] AS w1, s[i + 1] AS w2
      FROM (SELECT string_split(text, ' ') AS s FROM documents) d,
           UNNEST(generate_series(1, len(s) - 1)) AS u(i)
    ), c12 AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), marked AS (
      SELECT w1, w2, c12,
             SUM(c12) OVER (PARTITION BY w1) AS c1,
             SUM(c12) OVER (PARTITION BY w2) AS c2,
             SUM(c12) OVER () AS n
      FROM c12
    ), scored AS (
      SELECT w1, w2,
             CAST(c12 AS BIGINT) AS c12,
             CAST(c1 AS BIGINT) AS c1,
             CAST(c2 AS BIGINT) AS c2,
             ROUND(log2((CAST(n AS DOUBLE) * CAST(c12 AS DOUBLE))
                        / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))),
                   6) AS pmi
      FROM marked WHERE c12 >= 5
    )
    SELECT w1, w2, c12, c1, c2, pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT)
             AS rank
    FROM scored
    QUALIFY rank <= 20
    """,
)
def llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent word pairs by PMI (min-count 5) — collocation /
    phrase mining for tokenizer merges and dictionary units. Single
    corpus scan; all marginals are window aggregates over the bigram
    count table. See operators/text.py::pmi_collocations."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.pmi_collocations(t["documents"], min_count=5, k=20)


@query(
    "llm_batch_by_length",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens, n_tokens // 16 AS bucket FROM d
    ), ba AS (
      SELECT doc_id, n_tokens, bucket,
             CAST((ROW_NUMBER() OVER (
                PARTITION BY bucket ORDER BY n_tokens, doc_id) - 1) // 8
               AS BIGINT) AS batch_id
      FROM b
    )
    SELECT doc_id, n_tokens, bucket, batch_id,
           MAX(n_tokens) OVER (PARTITION BY bucket, batch_id)
             AS batch_max,
           CAST(MAX(n_tokens) OVER (PARTITION BY bucket, batch_id)
                - n_tokens AS BIGINT) AS padding
    FROM ba
    """,
)
def llm_batch_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching (width 16, batch 8) — the
    serving-side padding minimizer; all-integer arithmetic, so the
    check is oracle-EXACT. See operators/text.py::batch_by_length."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.batch_by_length(t["documents"], bucket_width=16,
                                batch_size=8)


@query(
    "llm_token_entropy",
    oracle="""
    WITH wc AS (
      SELECT doc_id, t, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents)
      GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM wc
    ), agg AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             ROUND(CAST(SUM(CAST(ROUND(
                 -(c * 1.0 / n) * log2(c * 1.0 / n), 9)
               AS DECIMAL(38,9))) AS DOUBLE), 6) AS entropy_bits
      FROM tot GROUP BY 1
    )
    SELECT doc_id, n_tok, n_distinct, entropy_bits,
           CASE WHEN n_distinct > 1
                THEN ROUND(entropy_bits
                           / ROUND(log2(CAST(n_distinct AS DOUBLE)), 9), 6)
                ELSE 0.0 END AS norm_entropy
    FROM agg
    """,
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy per document (bits + uniformity-normalized)
    — the information-density quality dial. Per-term round-9 +
    exact-decimal sum keeps libm log2 cross-engine skew out of the
    hash. See operators/text.py::token_entropy."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.token_entropy(t["documents"])


@query(
    "llm_prefix_filter_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(i AS BIGINT) AS inter,
           i * 1.0 / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    """,
)
def llm_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs shingle Jaccard ≥ 0.5 via LOSSLESS prefix
    filtering (PPJoin family). The oracle is the NAIVE all-pairs join —
    the check therefore proves the losslessness claim end-to-end, not
    just the arithmetic. See operators/dedup.py::prefix_filter_pairs."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.prefix_filter_pairs(t["documents"], threshold=0.5)


@query(
    "llm_sorted_neighborhood",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, {_DUCK_SHINGLES} AS s FROM documents
    ), ord AS (
      SELECT doc_id, text, s,
             ROW_NUMBER() OVER (ORDER BY text, doc_id) AS rn
      FROM d
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(b.rn - a.rn AS BIGINT) AS gap,
           CAST(len(a.s) AS BIGINT) AS n_a,
           CAST(len(b.s) AS BIGINT) AS n_b,
           CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
           len(list_intersect(a.s, b.s)) * 1.0
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
             AS jaccard
    FROM ord a JOIN ord b ON b.rn > a.rn AND b.rn <= a.rn + 3
    """,
)
def llm_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking (merge/purge): window-4 neighbor
    pairs in text order with exact in-row shingle Jaccard. The Spark
    side computes the global rank distributively (range partitions +
    broadcast offsets); the oracle's single ROW_NUMBER proves the
    distributed rank reproduces the total order exactly.
    See operators/dedup.py::sorted_neighborhood_pairs."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.sorted_neighborhood_pairs(t["documents"], window=4)


@query(
    "llm_pps_sample",
    oracle="""
    WITH nt AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), mx AS (SELECT MAX(n_tokens) AS max_nt FROM nt)
    SELECT doc_id, n_tokens, max_nt,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             AS BIGINT) AS u,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             AS BIGINT) * max_nt < n_tokens * 4294967296 AS accept
    FROM nt CROSS JOIN mx
    """,
)
def llm_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS Bernoulli sampling: include docs with probability
    n_tokens/max(n_tokens), making each TOKEN equally likely to
    survive a corpus subsample. Pure int64 arithmetic — oracle-EXACT,
    no division or libm anywhere. See operators/text.py::pps_sample."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.pps_sample(t["documents"])


# synthetic quote corpus for containment: every 100th document also
# contributes a 12-token prefix "quote" doc (id + 5,000,000) — fully
# contained in its source but with tiny Jaccard, so the containment
# relation is exercised non-vacuously (the pii_redact convention:
# inject the phenomenon identically on both engines).
_DUCK_QUOTE_CORPUS = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 5000000 AS doc_id,
             array_to_string(string_split(text, ' ')[1:12], ' ') AS text
      FROM documents WHERE doc_id % 100 = 0
"""


@query(
    "llm_containment_pairs",
    oracle=f"""
    WITH corpus AS (
{_DUCK_QUOTE_CORPUS}
    ), toks0 AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM corpus
    ), capped AS (
      SELECT s FROM toks0
      GROUP BY s HAVING COUNT(*) <= {NGRAM_MAX_SHINGLE_FREQ}
    ), toks AS (
      SELECT toks0.doc_id, toks0.s FROM toks0 JOIN capped USING (s)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(i AS BIGINT) AS inter,
           i * 1.0 / sa.n AS containment
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i * 1.0 / sa.n >= 0.8
    """,
)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment ≥ 0.8 — the asymmetric quote/subset
    relation Jaccard dedup cannot see. Runs over the corpus plus
    synthetic 12-token prefix quotes of every 100th document so
    containment-only pairs exist at fixture scale. Hot shingles are
    capped at df 100 (NGRAM_MAX_SHINGLE_FREQ) exactly like the Jaccard
    verifier (mirrored in the oracle) — without the cap the self-join
    fan-out tracks df² and the 8x scalecheck measured at-linear 8.3;
    capped it drops to the sub-linear envelope.
    See operators/dedup.py::containment_pairs."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    quotes = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + F.lit(5000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, 12)
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(quotes)
    return dedup.containment_pairs(
        corpus, threshold=0.8, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )


@query(
    "llm_edit_distance_pairs",
    # r13 (VERDICT r12 ask #5): the oracle now replays the SAME
    # lossless Pass-Join segment identity the Spark operator uses
    # (Li, Deng & Feng, PVLDB'11) instead of the naive all-pairs
    # levenshtein join — candidates from the d+1-segment pigeonhole,
    # then the exact levenshtein verify — so it runs at FULL sf1
    # (the naive form extrapolated to ≈2.3 h at 50k keys; this one is
    # seconds). Losslessness of the rewrite is itself oracle-proven:
    # tests/test_oracle_parity.py::
    # test_edit_distance_passjoin_oracle_equals_naive compares this
    # SQL against the retired naive join row-for-row in DuckDB.
    # AS MATERIALIZED on the multiply-referenced CTEs is load-bearing
    # (the r12 pagerank lesson: DuckDB inlines plain CTEs per
    # reference).
    # r14 (VERDICT r13 ask #3): the corpus additionally injects a
    # deterministic SHORT-KEY family (lengths 3-7, variant picked by
    # doc_id) on BOTH engines, so the short-key fallback branch —
    # where the r13 (len 4, len 5-6) hole hid, structurally
    # unreachable from the uniform 40-char fixture keys — is
    # hash-verified by the driver gate every round, not only in
    # pytest (the llm_pii_redact injection precedent). The family
    # yields dist 1-2 pairs at the exact (klen < cut, klen < cut+d)
    # boundary: (4,5) (4,6) (3,4) (4,4) fallback pairs, (5,6) (6,7)
    # pigeonhole pairs at the cut, and Δlen>2 negatives; 40-char real
    # keys cannot reach any of them through the |Δlen| <= 2 filter.
    oracle="""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 6000000,
             substr(text, 1, 4) || 'Z' || substr(text, 6)
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      SELECT doc_id + 7000000,
             (['abcd','abcde','abcdef','axcd','abc','abcdefg'])
               [CAST((doc_id // 50) % 6 AS INT) + 1]
      FROM documents WHERE doc_id % 50 = 0
    ), ids AS MATERIALIZED (
      SELECT doc_id AS _id, substr(text, 1, 40) AS key FROM corpus
    ), keys AS MATERIALIZED (
      SELECT key, MIN(_id) AS kid, length(key) AS klen
      FROM ids GROUP BY 1
    ),
    -- index side: the d+1 = 3 even segments of every distinct long
    -- key (cut = 2d+1 = 5), keyed by (index length, slot, piece)
    idx AS (
      SELECT kid AS kb, klen AS m, slot,
             substr(key,
                    CAST(floor(slot * klen / 3) + 1 AS INT),
                    CAST(floor((slot + 1) * klen / 3)
                         - floor(slot * klen / 3) AS INT)) AS piece
      FROM keys, UNNEST([0, 1, 2]) AS t(slot)
      WHERE klen >= 5
    ),
    -- probe side: for every candidate index length m = klen+dm and
    -- slot, the substrings at the slot's home position +-d
    probe AS (
      SELECT ka, m, slot,
             substr(key, CAST(st AS INT), CAST(sl AS INT)) AS piece
      FROM (
        SELECT kid AS ka, key, klen, slot, klen + dm AS m,
               floor(slot * (klen + dm) / 3) + 1 + sh AS st,
               floor((slot + 1) * (klen + dm) / 3)
                 - floor(slot * (klen + dm) / 3) AS sl
        FROM keys,
             UNNEST([-2, -1, 0, 1, 2]) AS t1(dm),
             UNNEST([0, 1, 2]) AS t2(slot),
             UNNEST([-2, -1, 0, 1, 2]) AS t3(sh)
        WHERE klen >= 5
      )
      WHERE m >= 5 AND st >= 1 AND st + sl - 1 <= klen
    ),
    cand AS (
      SELECT DISTINCT least(p.ka, i.kb) AS ka,
                      greatest(p.ka, i.kb) AS kb
      FROM probe p JOIN idx i
        ON p.m = i.m AND p.slot = i.slot AND p.piece = i.piece
      WHERE p.ka <> i.kb
      UNION
      -- short-key fallback: a short key's qualifying partner is at
      -- most (cut-1)+d = 6 chars, so join short × (len < cut+d) —
      -- covering the mixed (4, 5..6) pairs neither pigeonhole branch
      -- reaches (mirrors the Spark operator's r13 fix)
      SELECT least(a.kid, b.kid) AS ka, greatest(a.kid, b.kid) AS kb
      FROM keys a JOIN keys b
        ON a.kid <> b.kid AND abs(a.klen - b.klen) <= 2
      WHERE a.klen < 5 AND b.klen < 7
    ),
    kp AS MATERIALIZED (
      SELECT a.key AS key_a, b.key AS key_b, a.klen AS la, b.klen AS lb,
             levenshtein(a.key, b.key) AS dist
      FROM cand c
      JOIN keys a ON a.kid = c.ka
      JOIN keys b ON b.kid = c.kb
      WHERE levenshtein(a.key, b.key) <= 2
    )
    -- distinct-key matches expanded over duplicate-key groups, lens
    -- traveling with their ids through the (doc_a, doc_b) order
    SELECT CASE WHEN ma._id <= mb._id THEN ma._id ELSE mb._id END AS doc_a,
           CASE WHEN ma._id <= mb._id THEN mb._id ELSE ma._id END AS doc_b,
           CAST(CASE WHEN ma._id <= mb._id THEN kp.la ELSE kp.lb END
                AS BIGINT) AS len_a,
           CAST(CASE WHEN ma._id <= mb._id THEN kp.lb ELSE kp.la END
                AS BIGINT) AS len_b,
           CAST(kp.dist AS BIGINT) AS dist
    FROM kp
    JOIN ids ma ON ma.key = kp.key_a
    JOIN ids mb ON mb.key = kp.key_b
    UNION ALL
    -- identical-key pairs (distance 0): within-group expansion
    SELECT x._id AS doc_a, y._id AS doc_b,
           CAST(length(x.key) AS BIGINT) AS len_a,
           CAST(length(y.key) AS BIGINT) AS len_b,
           CAST(0 AS BIGINT) AS dist
    FROM ids x JOIN ids y ON x.key = y.key AND x._id < y._id
    """,
)
def llm_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant key matching: all pairs within Levenshtein
    distance 2 on the 40-char match key, via LOSSLESS q-gram prefix +
    length filtering (Ed-Join). The oracle is the NAIVE all-pairs
    DuckDB join, so the hash check proves the filter's losslessness
    end-to-end — the same bar llm_prefix_filter_pairs sets for PPJoin.
    Runs over the corpus plus one-char-substituted copies of every
    50th document so nonzero-distance matches exist at fixture scale
    (the fixture's own near-dups differ by word edits, distance >= 14
    — exactly the regime where set similarity, not edit distance, is
    the right metric; the dist-0 rows are the planted exact dups).
    See operators/dedup.py::edit_distance_pairs."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    typo = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(6000000)).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 4), F.lit("Z"),
            F.expr("substring(text, 6)"),
        ).alias("text"),
    )
    # deterministic short-key family (r14): keeps the short-key
    # fallback branch non-vacuous under the driver gate — the oracle
    # injects the identical rows
    shorts = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(7000000)).alias("doc_id"),
        F.expr(
            "element_at(array('abcd','abcde','abcdef','axcd','abc',"
            "'abcdefg'), cast((doc_id div 50) % 6 as int) + 1)"
        ).alias("text"),
    )
    corpus = (
        docs.select("doc_id", "text").unionByName(typo).unionByName(shorts)
    )
    return dedup.edit_distance_pairs(corpus, max_dist=2)


def _bpe_oracle(k: int, emit: str = "merges") -> str:
    """Unrolled k-round BPE oracle (the PageRank unrolled-CTE
    convention): each round re-derives pair counts from the previous
    word table, takes the deterministic argmax, and applies the merge
    with the same two-pass replace as the Spark operator."""
    blocks = ["""
    w0 AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY 1
    ), s0 AS (
      SELECT w, f,
             ' ' || array_to_string(string_split(w, ''), ' ') || ' </w> '
               AS s
      FROM w0
    )"""]
    for i in range(1, k + 1):
        blocks.append(f""", p{i} AS (
      SELECT a[j] AS l, a[j + 1] AS r, SUM(f) AS c
      FROM (SELECT f, string_split(trim(s), ' ') AS a FROM s{i - 1}),
           UNNEST(generate_series(1, len(a) - 1)) AS u(j)
      GROUP BY 1, 2
    ), b{i} AS (
      SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1
    ), s{i} AS (
      -- LEFT JOIN ON TRUE: when pair counts exhaust before round k,
      -- b{i} is empty and the word table passes through unchanged,
      -- matching bpe_train's early break (a CROSS JOIN would
      -- annihilate the table and return 0 rows for emit='vocab').
      SELECT w, f,
             CASE WHEN b.l IS NULL THEN s
                  ELSE replace(replace(s, ' ' || b.l || ' ' || b.r || ' ',
                                          ' ' || b.l || b.r || ' '),
                               ' ' || b.l || ' ' || b.r || ' ',
                               ' ' || b.l || b.r || ' ')
             END AS s
      FROM s{i - 1} LEFT JOIN b{i} b ON TRUE
    )""")
    if emit == "vocab":
        tail = f"""SELECT w, f,
       CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_syms,
       trim(s) AS seg
    FROM s{k}"""
    elif emit == "fertility":
        # per-document average symbols-per-word under the trained
        # tokenizer: join the corpus token stream back to the final
        # word table (train-then-measure verified as ONE computation)
        tail = f""", words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    )
    SELECT words.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(string_split(trim(v.s), ' '))) AS BIGINT) AS n_syms,
           ROUND(SUM(len(string_split(trim(v.s), ' '))) * 1.0 / COUNT(*), 6)
             AS fertility
    FROM words JOIN s{k} v ON words.w = v.w
    GROUP BY 1"""
    else:
        tail = "\nUNION ALL\n".join(
            f"SELECT {i} AS merge_rank, l AS lhs, r AS rhs, "
            f"CAST(c AS BIGINT) AS pair_count FROM b{i}"
            for i in range(1, k + 1)
        )
    return "WITH " + "".join(blocks) + "\n" + tail


@query("llm_bpe_merges", oracle=_bpe_oracle(6))
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 6 BPE merges on the corpus — the tokenizer-training
    artifact. The oracle unrolls all 6 rounds as CTEs (argmax +
    two-pass replace per round), so the check verifies the full
    iterative computation, not just the first pair count.
    See operators/text.py::bpe_train."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.bpe_train(t["documents"], k=6)


@query("llm_bpe_segment", oracle=_bpe_oracle(6, emit="vocab"))
def llm_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained 6-merge BPE tokenizer APPLIED to the corpus
    vocabulary: per distinct word, its frequency, symbol count and
    space-joined segmentation — the encoding-stage artifact. The
    oracle reuses the unrolled training CTEs and reads the final word
    table, so train-then-apply is verified as one computation.
    See operators/text.py::bpe_train(emit='vocab')."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.bpe_train(t["documents"], k=6, emit="vocab")


@query("llm_tokenizer_fertility", oracle=_bpe_oracle(6, emit="fertility"))
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tokenizer fertility (avg BPE symbols per word) under
    the corpus-trained 6-merge tokenizer — the tokenizer-quality dial
    that flags domains fragmenting into characters. The oracle unrolls
    the full training + segmentation + per-doc rollup, so the entire
    train-then-measure pipeline is one verified computation.
    See operators/text.py::tokenizer_fertility."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.tokenizer_fertility(t["documents"], k=6)


@query(
    "llm_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
    ),
    first_seen AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sh,
           CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS novelty
    FROM sh JOIN first_seen ON sh.s = first_seen.s
    GROUP BY sh.doc_id
    """,
)
def llm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal novelty: the fraction of a doc's distinct 3-shingles
    first seen (min doc_id = ingestion order) in THIS doc — the
    forward-looking twin of dup-span coverage, catching late re-crawls
    and syndicated copy with no single pairwise near-dup partner.
    Strictly linear: one shingle min-agg + one hash join back
    (operators/dedup.py::novelty_scores)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.novelty_scores(t["documents"])


@query(
    "llm_zipf_slope",
    oracle="""
    WITH words AS (
      SELECT lang AS grp, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), wc AS (
      SELECT grp, w, COUNT(*) AS c FROM words GROUP BY 1, 2
    ), ranked AS (
      SELECT grp, c, r FROM (
        SELECT grp, w, c,
               ROW_NUMBER() OVER (
                 PARTITION BY grp ORDER BY c DESC, w ASC) AS r
        FROM wc
      ) WHERE r <= 100
    ), t2 AS (
      SELECT grp,
             round(ln(CAST(r AS DOUBLE)), 9) AS x,
             round(ln(CAST(c AS DOUBLE)), 9) AS y
      FROM ranked
    ), t3 AS (
      SELECT grp, x, y, round(x * y, 6) AS xy, round(x * x, 6) AS xx
      FROM t2
    ), ag AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xy AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xx AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM t3 GROUP BY 1
    )
    SELECT grp AS lang, n_terms,
           round((n_terms * sxy - sx * sy)
                 / (n_terms * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - ((n_terms * sxy - sx * sy)
                        / (n_terms * sxx - sx * sx)) * sx)
                 / n_terms, 6) AS zipf_intercept
    FROM ag WHERE n_terms >= 2
    """,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope per language slice — the vocabulary
    health diagnostic that flags template farms (flat curve) and
    OCR/spam noise (steep curve) before a slice enters a training
    mix. OLS over the top-100 words' (ln rank, ln freq); decimal-
    summed normal equations make the iterative-free regression
    oracle-exact. See operators/text.py::zipf_slope."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.zipf_slope(t["documents"])


@query(
    "llm_source_mix",
    oracle="""
    WITH counts AS (
      SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS c_grp
      FROM documents GROUP BY 1
    ), weights AS (
      SELECT grp, c_grp,
             round(pow(CAST(c_grp AS DOUBLE), 0.5), 6) AS w_grp
      FROM counts
    ), tot AS (
      SELECT CAST(SUM(CAST(w_grp AS DECIMAL(38,6))) AS DOUBLE) AS w_tot,
             SUM(c_grp) AS n_docs
      FROM weights
    ), per AS (
      SELECT grp, c_grp, w_grp,
             round(least(1.0,
                   (0.5 * CAST(n_docs AS DOUBLE) * w_grp)
                   / (w_tot * CAST(c_grp AS DOUBLE))), 9) AS q
      FROM weights CROSS JOIN tot
    )
    SELECT d.doc_id, p.grp AS lang, p.c_grp, p.w_grp, p.q,
           CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) AS DOUBLE)
             < p.q * 4294967296.0 AS accept
    FROM documents d JOIN per p ON d.lang = p.grp
    """,
)
def llm_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multinomial source mixing (mT5/XLM-R
    recipe, alpha=0.5): slice sampling probability proportional to
    count^alpha upweights low-resource languages; per-doc acceptance
    is the md5-uniform convention, so the expected sample hits the
    temperature mixture exactly and the whole computation is
    oracle-exact. See operators/text.py::source_mix_sample."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.source_mix_sample(
        t["documents"], group_col="lang", alpha=0.5, target_frac=0.5
    )


@query(
    "llm_quality_calibration",
    oracle="""
    WITH feats AS (
      SELECT doc_id, lang AS grp,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             round(ln(CAST(len(string_split(text, ' ')) AS DOUBLE)), 9)
               AS x,
             round(len(list_filter(string_split(text, ' '),
                   t -> list_contains(
                     ['the','a','of','and','to','in','is'], t))) * 1.0
                   / len(string_split(text, ' ')), 9) AS y
      FROM documents
    ), ft AS (
      SELECT x, y, round(x * y, 6) AS xy, round(x * x, 6) AS xx
      FROM feats WHERE grp = 'en'
    ), fit AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_fit,
             CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xy AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xx AS DECIMAL(38,6))) AS DOUBLE) AS sxx
      FROM ft
    ), ab AS (
      SELECT n_fit, sx, sy,
             (n_fit * sxy - sx * sy) / (n_fit * sxx - sx * sx) AS b
      FROM fit
    ), ab2 AS (
      SELECT n_fit, b, (sy - b * sx) / n_fit AS a FROM ab
    )
    SELECT f.doc_id, f.grp AS lang, f.n_tok, f.y AS stop_ratio,
           round(b, 6) AS slope, round(a, 6) AS intercept,
           round(f.y - (a + b * f.x), 6) AS resid,
           abs(round(f.y - (a + b * f.x), 6)) > 0.05 AS is_outlier
    FROM feats f CROSS JOIN ab2
    """,
)
def llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-on-slice / score-corpus quality calibration: closed-form
    OLS of stopword_ratio on ln(n_tokens) over the trusted 'en'
    slice, coefficients broadcast, every document scored by residual
    in one corpus pass — the distributed serving shape of a
    fastText-style quality filter, with the fit itself verified by
    the oracle (decimal-summed normal equations).
    See operators/text.py::quality_calibration."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.quality_calibration(t["documents"], tau=0.05)


@query(
    "llm_cluster_balanced_sample",
    oracle=f"""
    SELECT vec_id, cluster, dist2, CAST(pick AS BIGINT) AS pick
    FROM (
      SELECT vec_id, cluster, dist2,
             ROW_NUMBER() OVER (
               PARTITION BY cluster
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick
      FROM ({_kmeans_oracle(4, 2)}) AS base
    ) AS ranked
    WHERE pick <= 100
    """,
)
def llm_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling: equal per-cluster quotas
    (100) drawn in deterministic md5 order from the 4-way k-means
    partition of the embedding space — the SemDeDup-style selection
    that covers every mode instead of over-drawing the densest
    region. The full pipeline (unrolled 2-iteration k-means + quota
    window) is verified bit-exactly by the oracle.
    See operators/similarity.py::cluster_balanced_sample."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return similarity.cluster_balanced_sample(
        t["embeddings"], k=4, iters=2, per_cluster=100
    )


@query(
    "llm_exact_dedup_keep_best",
    oracle="""
    SELECT doc_id, fp, n_chars, keep_id, doc_id = keep_id AS keep
    FROM (
      SELECT doc_id, md5(text) AS fp, CAST(length(text) AS BIGINT)
               AS n_chars,
             FIRST_VALUE(doc_id) OVER (
               PARTITION BY md5(text)
               ORDER BY length(text) DESC, doc_id ASC) AS keep_id
      FROM documents
    )
    """,
)
def llm_exact_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection within exact-duplicate
    groups: real pipelines keep the BEST copy (here: longest text —
    trailing truncations are the common corruption — with min-id
    tiebreak), not the arbitrary min-id one. One md5-keyed window,
    same shuffle as exact dedup; the quality criterion is a sort key
    swap, which is the point — canonical choice is policy, not
    plumbing."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("documents",))
    w = W.partitionBy("fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        t["documents"]
        .select(
            "doc_id",
            F.md5("text").alias("fp"),
            F.length("text").cast("bigint").alias("n_chars"),
        )
        .withColumn("keep_id", F.first("doc_id").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("keep_id"))
    )


@query(
    "llm_curriculum",
    oracle="""
    WITH bg AS (
      SELECT doc_id, s[i] AS w1, s[i + 1] AS w2
      FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents) d,
           UNNEST(generate_series(1, len(s) - 1)) AS u(i)
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY 1
    ), v AS (
      SELECT COUNT(DISTINCT w2) AS v FROM c2
    ), model AS (
      SELECT c2.w1, c2.w2,
             ROUND(log2(CAST(c2.c2 + 1 AS DOUBLE))
                   - log2(CAST(c1.c1 + v.v AS DOUBLE)), 6) AS logp
      FROM c2 JOIN c1 USING (w1) CROSS JOIN v
    ), scored AS (
      SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(model.logp AS DECIMAL(38,6))) * -1000000
                  AS BIGINT) AS m
      FROM bg JOIN model USING (w1, w2) GROUP BY 1
    ), ranked AS (
      -- exact integer-micro HALF-UP average (see llm_lm_perplexity)
      SELECT doc_id, n_bigrams,
             ROUND(POW(2.0,
               ((2 * m + n_bigrams) // (2 * n_bigrams)) / 1000000.0
             ), 6) AS ppl,
             CAST(n_bigrams + 1 AS BIGINT) AS n_tok
      FROM scored
    ), rr AS (
      SELECT doc_id, n_bigrams, ppl, n_tok,
             CAST(ROW_NUMBER() OVER (ORDER BY ppl, doc_id) AS BIGINT)
               AS rank,
             COUNT(*) OVER () AS n
      FROM ranked
    )
    SELECT doc_id, n_bigrams, ppl, n_tok, rank,
           CAST((rank - 1) * 4 // n + 1 AS BIGINT) AS phase
    FROM rr
    """,
)
def llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-ordered curriculum phasing: global easy→hard rank by
    corpus-trained bigram-LM perplexity, cut into 4 contiguous phases
    with exact integer arithmetic — the curriculum-learning data
    schedule, with the global rank computed by the block-offset
    pattern (no single-partition window).
    See operators/text.py::curriculum_phases."""
    t = load_tables(spark, sf_dir, ("documents",))
    return text.curriculum_phases(t["documents"], n_phases=4)


# consecutive non-overlapping 8-word blocks, one row per (doc, block) —
# the DuckDB rendering of operators/dedup._block_table(block_words=8):
# list_slice is 1-based-inclusive like Spark's slice, and the tail
# block is included (len//8 rounded up), so both engines produce the
# identical (b, btxt) table by construction.
_DUCK_BLOCKS = """
  SELECT doc_id, source, i AS b,
         array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' ')
           AS btxt
  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents) t,
       UNNEST(generate_series(
         0, CAST(ceil(len(toks) / 8.0) AS BIGINT) - 1)) AS u(i)
"""


@query(
    "llm_paragraph_dedup",
    oracle=f"""
    WITH b AS ({_DUCK_BLOCKS}
    ), canon AS (
      SELECT doc_id, b, btxt,
             ROW_NUMBER() OVER (PARTITION BY btxt ORDER BY doc_id, b)
               AS rn
      FROM b
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(btxt, ' ' ORDER BY b) AS clean_text
      FROM canon WHERE rn = 1 GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(ceil(len(string_split(d.text, ' ')) / 8.0) AS BIGINT)
             AS n_blocks,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(agg.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
)
def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granular exact dedup with reassembly (CCNet/Dolma
    style): every duplicated 8-word block is dropped except its first
    corpus-order occurrence, then documents are stitched back
    together. The block-level middle ground between document-level
    exact dedup and span removal; see
    operators/dedup.py::paragraph_dedup for the 100 TB shape (one
    min-struct agg on 8-byte block hashes + one id rollup, no pair
    join)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.paragraph_dedup(t["documents"], block_words=8)


@query(
    "llm_boilerplate_blocks",
    oracle=f"""
    WITH b AS ({_DUCK_BLOCKS}
    ), freq AS (
      SELECT source, btxt
      FROM (SELECT DISTINCT source, btxt, doc_id FROM b)
      GROUP BY source, btxt HAVING COUNT(*) >= 2
    ), kept AS (
      SELECT b.doc_id, b.b, b.btxt FROM b
      WHERE NOT EXISTS (SELECT 1 FROM freq f
                        WHERE f.source = b.source
                          AND f.btxt = b.btxt)
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(btxt, ' ' ORDER BY b) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, d.source,
           CAST(ceil(len(string_split(d.text, ' ')) / 8.0) AS BIGINT)
             AS n_blocks,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(agg.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
)
def llm_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate removal (CCNet/FineWeb line-dedup): an
    8-word block appearing in ≥2 distinct documents of the same source
    is template text and every occurrence is dropped (no canonical
    copy survives — unlike llm_paragraph_dedup). See
    operators/dedup.py::boilerplate_block_removal for the 100 TB
    shape (distinct+count on (source, hash) + broadcast-sized anti
    join)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.boilerplate_block_removal(
        t["documents"], group_col="source", block_words=8, min_df=2
    )


@query(
    "llm_incremental_paragraph_dedup",
    oracle=f"""
    WITH b AS ({_DUCK_BLOCKS}
    ), nb AS (
      SELECT doc_id, b, btxt FROM b WHERE doc_id % 10 = 9
    ), seen AS (
      SELECT DISTINCT btxt FROM b WHERE doc_id % 10 != 9
    ), canon AS (
      SELECT doc_id, b, btxt,
             ROW_NUMBER() OVER (PARTITION BY btxt ORDER BY doc_id, b)
               AS rn
      FROM nb
    ), kept AS (
      SELECT doc_id, b, btxt FROM canon
      WHERE rn = 1
        AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.btxt = canon.btxt)
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(btxt, ' ' ORDER BY b) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(ceil(len(string_split(d.text, ' ')) / 8.0) AS BIGINT)
             AS n_blocks,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           COALESCE(agg.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN agg USING (doc_id)
    WHERE d.doc_id % 10 = 9
    """,
)
def llm_incremental_paragraph_dedup(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """One ingestion step of STREAMING paragraph dedup as a batch
    query: the doc_id%10==9 slice plays the nightly batch, the rest
    the existing corpus whose block registry has already been
    accumulated — new documents lose every block the corpus has seen
    plus intra-batch repeats, then reassemble. The replayed-stream
    parity with the batch operator is differential-tested in
    tests/test_streaming.py; this entry puts the per-increment
    transform itself under the SQL oracle gate. Work scales with the
    increment (one explode of the BATCH + an anti join against the
    registry on 8-byte keys), never corpus size — see
    operators/dedup.py::paragraph_dedup_increment."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"]
    new_batch = d.filter(F.col("doc_id") % 10 == 9).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 10 != 9).select("doc_id", "text")
    seen = dedup.block_registry(corpus, block_words=8)
    cleaned, _ = dedup.paragraph_dedup_increment(
        new_batch, seen, block_words=8
    )
    return cleaned


@query(
    "llm_textrank_keywords",
    oracle=(
        "SELECT term, pr, rank FROM ("
        "  SELECT node AS term, pr,"
        "         CAST(row_number() OVER (ORDER BY pr DESC, node)"
        "              AS BIGINT) AS rank"
        "  FROM (" + graph.pagerank_oracle_sql(
            """tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT unnest(t[1:len(t)-1]) AS w1,
                  unnest(t[2:len(t)]) AS w2 FROM tok),
    pairs AS (SELECT DISTINCT w1 AS doc_a, w2 AS doc_b FROM bg
              WHERE w1 <> w2)""",
            n_iters=3,
        ) + ")"
        ") WHERE rank <= 20"
    ),
)
def llm_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph (distinct adjacent-token pairs),
    top-20 terms by centrality — the unsupervised keyword/keyphrase
    seeding pass of a corpus indexing pipeline, and a composition
    proof: the graph op (llm_pagerank's exact fixed-iteration engine)
    re-targeted from the doc near-dup graph to the token graph with
    the SAME unrolled-CTE oracle machinery.

    Exactness: inherits pagerank's bit-identical doubles (decimal
    contribution sums, injected literals); top-k orders on (pr desc,
    term) — total, engine-identical. Scale shape: the co-occurrence
    graph is vocab²-bounded (931 edges on the fixture; stopword-capped
    at web scale), so three exact iterations are trivial; top-k plans
    as TakeOrdered with the rank window over 20 rows.
    """
    t = load_tables(spark, sf_dir, ("documents",))
    return textrank_from_pairs(word_cooc_pairs(t["documents"]))


def word_cooc_pairs(docs: DataFrame) -> DataFrame:
    """The word co-occurrence graph both graph-suite term members walk:
    distinct adjacent-token pairs with self-loops dropped. Shared so
    the suite fusion path builds it (and its corpus scan + distinct
    shuffle) once for TextRank AND the LPA communities (r14, §2.4)."""
    toks = F.split(F.col("text"), " ")
    bgs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return (
        docs.select(F.explode(bgs).alias("b"))
        .select(F.col("b.w1").alias("doc_a"), F.col("b.w2").alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )


def textrank_from_pairs(pairs: DataFrame) -> DataFrame:
    """llm_textrank_keywords' ranking half over a prebuilt pair graph."""
    from pyspark.sql import Window as W

    pr = graph.pagerank(pairs, n_iters=3)
    top = pr.orderBy(F.desc("pr"), F.asc("node")).limit(20)
    return top.select(
        F.col("node").alias("term"),
        "pr",
        F.row_number()
        .over(W.orderBy(F.desc("pr"), F.asc("node")))
        .cast("bigint")
        .alias("rank"),
    )


@query(
    "llm_minhash_accuracy",
    oracle=f"""
    WITH {_DUCK_SIG_CTES},
    bands AS (
      SELECT doc_id, 0 AS bi,
             CAST(mh0 AS VARCHAR) || '|' || CAST(mh1 AS VARCHAR) AS bk FROM sig
      UNION ALL SELECT doc_id, 1,
             CAST(mh2 AS VARCHAR) || '|' || CAST(mh3 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 2,
             CAST(mh4 AS VARCHAR) || '|' || CAST(mh5 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 3,
             CAST(mh6 AS VARCHAR) || '|' || CAST(mh7 AS VARCHAR) FROM sig
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    ), matched AS (
      SELECT c.doc_a, c.doc_b,
             CAST({" + ".join(f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(8))}
                  AS BIGINT) AS n_match
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b
    )
    SELECT m.doc_a, m.doc_b, m.n_match,
           CAST(m.n_match AS DOUBLE) / 8 AS est_jaccard,
           len(list_intersect(a.s, b.s)) * 1.0
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
             AS jaccard,
           round(abs(CAST(m.n_match AS DOUBLE) / 8
                 - len(list_intersect(a.s, b.s)) * 1.0
                   / (len(a.s) + len(b.s)
                      - len(list_intersect(a.s, b.s)))), 6) AS abs_err
    FROM matched m
    JOIN sh a ON a.doc_id = m.doc_a
    JOIN sh b ON b.doc_id = m.doc_b
    """,
)
def llm_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit for the MinHash family: over every LSH
    candidate pair, the signature-based Jaccard ESTIMATE (matching
    components / k) next to the exact shingle Jaccard and the absolute
    error — the dial an operator reads before trusting banded dedup at
    a new threshold (estimate bias/variance is the k-vs-cost trade).
    Because the md5mix signatures are deterministic in BOTH engines,
    even the "estimate" is oracle-EXACT — the audit itself is
    hash-verified, not band-checked.

    Exactness: n_match is an integer; est = n_match/8 is an exact
    binary fraction; exact Jaccard is one IEEE division of identical
    integers; abs_err rounds the difference of two identical doubles.

    Scale shape: banding bounds candidates (never all pairs); the
    signature join is two broadcast-or-shuffle equi-joins on doc ids;
    the exact verify carries the two shingle arrays in-row
    (array_intersect — no exploded self-join). One corpus scan for
    signatures + one for the arrays.
    """
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    # the signature table has THREE consumers (banding + both join
    # sides) — materialize it once so the md5 shingle pass never
    # recomputes (the rank.py one-materialization hygiene)
    sig = dedup.minhash_signature(
        docs, k=8, hash="md5mix"
    ).localCheckpoint(eager=True)
    cand = dedup.lsh_candidates(sig, k=8, band_size=2)
    return minhash_accuracy_from(docs, sig, cand)


def minhash_accuracy_from(docs: DataFrame, sig: DataFrame,
                          cand: DataFrame) -> DataFrame:
    """The llm_minhash_accuracy metric computed from a prebuilt
    (materialized) signature table and candidate-pair table — shared
    with the suite fusion path, where the same sig/cand feed the
    signature and candidate member rows too (r14: one signature pass
    per suite run instead of three)."""
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(8)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(8)],
    )
    n_match = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(8)
    ).cast("bigint")
    arr = docs.select(
        "doc_id", dedup.shingles_col("text", 3).alias("arr")
    )
    aa = arr.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    ab = arr.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    inter = F.size(F.array_intersect("arr_a", "arr_b"))
    exact = inter / (
        F.size("arr_a") + F.size("arr_b") - inter
    )
    est = F.col("n_match").cast("double") / F.lit(8)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_match", n_match)
        .join(aa, "doc_a")
        .join(ab, "doc_b")
        .select(
            "doc_a", "doc_b", "n_match",
            est.alias("est_jaccard"),
            exact.alias("jaccard"),
            F.round(F.abs(est - exact), 6).alias("abs_err"),
        )
    )


_DUCK_WORDGRAPH_CTE = """tok AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT unnest(t[1:len(t)-1]) AS w1,
                  unnest(t[2:len(t)]) AS w2 FROM tok),
    pairs AS (SELECT DISTINCT w1 AS doc_a, w2 AS doc_b FROM bg
              WHERE w1 <> w2)"""


@query(
    "llm_word_communities",
    oracle=(
        "SELECT node AS term, community, comm_size FROM ("
        + graph.lpa_oracle_sql(_DUCK_WORDGRAPH_CTE, n_iters=4)
        + ")"
    ),
)
def llm_word_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the word co-occurrence graph
    — the unsupervised topic-/term-cluster pass of a corpus indexing
    pipeline (which terms travel together), completing the graph-audit
    quartet (PageRank centrality, triangle density, k-core nucleus,
    LPA communities) on corpus-derived graphs. Same vocab²-bounded
    graph as llm_textrank_keywords; 4 fixed synchronous rounds with
    the deterministic min-label tie-break. Integer/string-exact — the
    one graph op with NO floating point at all. On the doc near-dup
    graph the identical operator refines connected components (which
    merge through any single spurious edge) into density-based
    communities. See operators/graph.py::label_propagation.
    """
    t = load_tables(spark, sf_dir, ("documents",))
    return communities_from_pairs(word_cooc_pairs(t["documents"]))


def communities_from_pairs(pairs: DataFrame) -> DataFrame:
    """llm_word_communities' LPA half over a prebuilt pair graph."""
    comm = graph.label_propagation(pairs, n_iters=4)
    return comm.select(F.col("node").alias("term"), "community", "comm_size")


def _hnsw_build_ctes(m: int = 6, max_level: int = 3) -> str:
    """The shared build half of the HNSW oracles: replay the
    deterministic build — trailing-zero level draw on vec_id (plain
    modular arithmetic), then per layer the m highest-cosine neighbors
    among layer peers (cos rounded 6, ties by dst) via a dense
    within-layer join (every fixture layer is under hnsw_build's
    dense_layer_cap, and the gated Spark side pins require_dense=True,
    so both engines provably take the same dense branch). Returns the
    CTE body text defining ``lv`` (vec_id, embedding, lvl) and
    ``a0..a{max_level}`` per-layer adjacency."""
    tz = " ".join(
        f"WHEN vec_id % {2 ** (l + 1)} = {2 ** l} THEN {l}"
        for l in range(max_level)
    )
    cos = ("round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
           "CAST(b.embedding AS DOUBLE[])), 6)")
    layers = []
    for l in range(max_level + 1):
        layers.append(f"""a{l} AS MATERIALIZED (
      SELECT CAST({l} AS INT) AS lvl, src, dst FROM (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {cos} DESC, b.vec_id) AS rn
        FROM lv a JOIN lv b
          ON a.vec_id <> b.vec_id AND a.lvl >= {l} AND b.lvl >= {l}
      ) WHERE rn <= {m}
    )""")
    body = ",\n    ".join(layers)
    return f"""lv AS MATERIALIZED (
      SELECT vec_id, embedding,
             CASE {tz} ELSE {max_level} END AS lvl
      FROM embeddings
    ),
    {body}"""


def _hnsw_graph_oracle(m: int = 6, max_level: int = 3) -> str:
    """DuckDB oracle for llm_hnsw_graph: the shared build CTEs
    (:func:`_hnsw_build_ctes`), all layers unioned."""
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM a{l}" for l in range(max_level + 1))
    return f"""
    WITH {_hnsw_build_ctes(m, max_level)}
    SELECT lvl, src, dst FROM ({union})
    """


def _hnsw_search_oracle(
    m: int = 6,
    max_level: int = 3,
    ef: int = 8,
    steps: int = 2,
    k: int = 3,
    n_queries: int = 8,
) -> str:
    """DuckDB oracle for llm_hnsw_search: the HNSW BEAM SEARCH,
    unrolled. The search phase is a FIXED (max_level+1)·steps-stage
    program once the entry point, beam width and tie order are pinned
    (greedy descent: at each level, 'steps' rounds of frontier ∪
    out-neighbors → keep the ef best by (cos DESC, id ASC)), so —
    like the LPA / PageRank / BPE unrolls — it IS deterministic
    SQL-expressible; 'data-dependent' only ever meant the VISITED set,
    which the fixed unroll replays exactly. Entry = smallest id on the
    highest populated level; final = exact_rerank contract (top-k by
    rounded cosine, ties by id, self-pairs excluded)."""
    cos_g = ("round(list_cosine_similarity(qt.qv, "
             "CAST(c.embedding AS DOUBLE[])), 6)")
    stages = []
    s = 0
    for l in range(max_level, -1, -1):
        for _ in range(steps):
            s += 1
            stages.append(f"""g{s} AS (
      SELECT q_id, n_id FROM f{s - 1}
      UNION
      SELECT f.q_id, a.dst AS n_id
      FROM f{s - 1} f JOIN a{l} a ON a.src = f.n_id
    ),
    f{s} AS MATERIALIZED (
      SELECT q_id, n_id FROM (
        SELECT g.q_id, g.n_id,
               row_number() OVER (PARTITION BY g.q_id
                                  ORDER BY {cos_g} DESC, g.n_id) AS rn
        FROM g{s} g
        JOIN lv c ON c.vec_id = g.n_id
        JOIN qt ON qt.q_id = g.q_id
      ) WHERE rn <= {ef}
    )""")
    n_stages = s
    body = ",\n    ".join(stages)
    return f"""
    WITH {_hnsw_build_ctes(m, max_level)},
    qt AS MATERIALIZED (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {n_queries}
    ),
    ent AS (
      SELECT vec_id FROM lv ORDER BY lvl DESC, vec_id LIMIT 1
    ),
    f0 AS (
      SELECT qt.q_id, e.vec_id AS n_id FROM qt CROSS JOIN ent e
    ),
    {body},
    scored AS (
      SELECT f.q_id, f.n_id, {cos_g} AS cos
      FROM f{n_stages} f
      JOIN lv c ON c.vec_id = f.n_id
      JOIN qt ON qt.q_id = f.q_id
      WHERE f.q_id <> f.n_id
    )
    SELECT q_id, n_id, cos, rank FROM (
      SELECT q_id, n_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


@query("llm_hnsw_graph", oracle=_hnsw_graph_oracle())
def llm_hnsw_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW layered neighbor graph (Malkov & Yashunin 2016) over the
    embedding corpus — the build half of the industry-default ANN
    family, driver-gated: the deterministic trailing-zero level draw
    (geometric(1/2) layer shape on sequential ids, plain modular
    arithmetic so the oracle replays it verbatim) plus each node's m=6
    highest-cosine layer peers (cos rounded 6, ties by dst id). The
    beam-search half is driver-gated too since r12 (llm_hnsw_search —
    the fixed unroll dissolved the r11 'no bounded SQL form' boundary).
    See operators/similarity.py::hnsw_build.
    """
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    # dense_layer_cap pinned ABOVE the fixture ladder (sf1 = 20k
    # vectors): the oracle replays the dense branch, and
    # require_dense=True ENFORCES the pin — a driver sf whose layer 0
    # outgrows the cap fails loudly instead of silently switching to
    # the LSH branch while the oracle still replays dense. Production
    # callers keep the 4096 default, and the LSH branch has its own
    # 8x-sweep + lsh-branch tests (SCALE.md).
    _, adj = similarity.hnsw_build(
        emb, m=6, max_level=3, level_src=F.col("vec_id"),
        dense_layer_cap=similarity.MAX_DENSE_LAYER_CAP,
        require_dense=True)
    return adj.select(F.col("lvl").cast("int").alias("lvl"), "src", "dst")


@query("llm_hnsw_search", oracle=_hnsw_search_oracle())
def llm_hnsw_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW layered BEAM SEARCH (the r11 verdict's last TESTS_ONLY
    ANN piece, now driver-gated): greedy descent over the oracle-
    verified llm_hnsw_graph structure — entry at the smallest id on
    the highest level, then per level two rounds of frontier ∪
    out-neighbors → keep the ef=8 best by (rounded cosine DESC, id
    ASC), finishing with the shared exact_rerank top-k contract. The
    r11 boundary ('a layered greedy traversal has no bounded SQL
    unroll') dissolved on inspection: with the beam width, step count
    and tie order pinned, the traversal is a FIXED 8-stage program —
    the same unroll trick as LPA/PageRank/BPE — so the DuckDB oracle
    replays the whole search row-for-row, visited set and all.

    Scale shape: each beam step is one join of the |queries|·ef
    frontier against the layer's edge list plus a broadcast embedding
    lookup — (max_level+1)·steps bounded joins, localCheckpoint'ed so
    lineage stays flat; no stage touches more than frontier·m
    candidate rows per query. See operators/similarity.py::hnsw_topk.
    """
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    out = similarity.hnsw_topk(
        emb, emb.filter(F.col("vec_id") < 8),
        k=3, m=6, ef=8, steps=2, max_level=3,
        level_src=F.col("vec_id"),
        dense_layer_cap=similarity.MAX_DENSE_LAYER_CAP,
        require_dense=True,
    )
    return out.select("q_id", "n_id", "cos", "rank")


@query(
    "t22_near_dup_gate",
    oracle=f"""
    WITH {_DUCK_SIG_CTES},
    bands AS (
      SELECT doc_id, 0 AS bi,
             CAST(mh0 AS VARCHAR) || '|' || CAST(mh1 AS VARCHAR) AS bk FROM sig
      UNION ALL SELECT doc_id, 1,
             CAST(mh2 AS VARCHAR) || '|' || CAST(mh3 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 2,
             CAST(mh4 AS VARCHAR) || '|' || CAST(mh5 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 3,
             CAST(mh6 AS VARCHAR) || '|' || CAST(mh7 AS VARCHAR) FROM sig
    ),
    firstb AS (
      SELECT bi, bk, MIN(doc_id) AS first_id FROM bands GROUP BY 1, 2
    ),
    d AS (
      SELECT b.doc_id,
             MAX(CASE WHEN b.doc_id > f.first_id THEN 1 ELSE 0 END) AS du
      FROM bands b JOIN firstb f ON f.bi = b.bi AND f.bk = b.bk
      GROUP BY 1
    )
    SELECT doc_id, du = 1 AS dup_near, du = 0 AS keep FROM d
    """,
)
def t22_near_dup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22 — batch twin of the STREAMING MinHash near-dup gate
    (operators/dedup.py::near_dup_increment): keep-first-by-id at the
    LSH-band level — a document is dropped when any of its 4 bands is
    already claimed by a smaller id. This is the incremental-safe
    decision rule an ingestion stream can apply with a band registry
    as its only state (same discipline as the exact-fingerprint gate
    in streaming/corpus.py, lifted from exact to NEAR duplicates);
    stream≡batch replay parity incl. kill-restart is differential-
    tested in tests/test_streaming.py. The md5mix signatures are
    deterministic in both engines, so the gate hash-verifies exactly.

    Scale shape: one signature pass (explode shingles → map-combined
    min-agg), one band groupBy, one join back — no candidate pair
    materialization at all (the gate needs band FIRST-OWNERSHIP, not
    pairs), so it is strictly cheaper than the LSH candidate path."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.near_dup_replay(t["documents"])


@query(
    "t23_near_dup_gate_verified",
    oracle=f"""
    WITH {_DUCK_SIG_CTES},
    bands AS (
      SELECT doc_id, 0 AS bi,
             CAST(mh0 AS VARCHAR) || '|' || CAST(mh1 AS VARCHAR) AS bk FROM sig
      UNION ALL SELECT doc_id, 1,
             CAST(mh2 AS VARCHAR) || '|' || CAST(mh3 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 2,
             CAST(mh4 AS VARCHAR) || '|' || CAST(mh5 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 3,
             CAST(mh6 AS VARCHAR) || '|' || CAST(mh7 AS VARCHAR) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT DISTINCT c.doc_b AS doc_id
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b
      WHERE len(list_intersect(a.s, b.s)) * 1.0
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= 0.5
    )
    SELECT d.doc_id, v.doc_id IS NOT NULL AS dup_near,
           v.doc_id IS NULL AS keep
    FROM documents d LEFT JOIN verified v USING (doc_id)
    """,
)
def t23_near_dup_gate_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23 — batch twin of the VERIFY-THEN-DROP streaming near-dup
    gate (operators/dedup.py::near_dup_increment_verified): a document
    is dropped only when some band-sharing smaller-id partner ALSO
    passes an exact shingle-Jaccard ≥ 0.5 check, so LSH band
    collisions nominate but never decide — closing t22's measured 20%
    band-level false-drop rate (near_dup_gate_precision, COVERAGE.md)
    at the cost of carrying doc shingles as gate state. Multi-batch
    registry parity is differential-tested in tests/test_streaming.py.

    Scale shape: banding bounds the candidate pairs (never all-pairs);
    the verify is an in-row array_intersect over shingle arrays joined
    by id — one extra shuffle-by-id vs t22, still linear. At fixture
    scale AQE broadcasts the checkpointed band/shingle relations
    (runtime-sized: their actual bytes are under the threshold — at a
    real corpus size the same runtime stats exceed it and the joins
    plan as shuffle joins automatically); three concurrent broadcasts
    do need a non-toy driver (the sf1 verification used 16g — a 1g
    default-driver session OOMs building them)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.near_dup_replay_verified(t["documents"], tau=0.5)


#: theoretical LSH candidate probability for 4 bands × 2 rows at true
#: Jaccard s: P = 1 − (1 − s²)⁴ — computed ONCE in Python and injected
#: verbatim into both engines at each decile-band boundary
_SCURVE_P = {
    bi: (
        round(1.0 - (1.0 - (bi / 10.0) ** 2) ** 4, 6),
        round(1.0 - (1.0 - ((bi + 1) / 10.0) ** 2) ** 4, 6),
    )
    for bi in range(0, 10)
}


@query(
    "llm_lsh_scurve",
    oracle=f"""
    WITH {_DUCK_SIG_CTES}, {_duck_ngram_ctes(0.05)},
    bands AS (
      SELECT doc_id, 0 AS bi,
             CAST(mh0 AS VARCHAR) || '|' || CAST(mh1 AS VARCHAR) AS bk FROM sig
      UNION ALL SELECT doc_id, 1,
             CAST(mh2 AS VARCHAR) || '|' || CAST(mh3 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 2,
             CAST(mh4 AS VARCHAR) || '|' || CAST(mh5 AS VARCHAR) FROM sig
      UNION ALL SELECT doc_id, 3,
             CAST(mh6 AS VARCHAR) || '|' || CAST(mh7 AS VARCHAR) FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    tagged AS (
      SELECT LEAST(CAST(FLOOR(p.jaccard * 10) AS INT), 9) AS bi,
             CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM pairs p LEFT JOIN cand c
        ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
    )
    SELECT '0.' || CAST(bi AS VARCHAR) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(hit) AS BIGINT) AS n_hit,
           ROUND(SUM(hit) * 1.0 / COUNT(*), 6) AS recall,
           CASE bi {" ".join(f"WHEN {bi} THEN {lo!r}" for bi, (lo, _) in _SCURVE_P.items())} END AS expect_lo,
           CASE bi {" ".join(f"WHEN {bi} THEN {hi!r}" for bi, (_, hi) in _SCURVE_P.items())} END AS expect_hi
    FROM tagged GROUP BY bi
    """,
)
def llm_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve evaluation — the dedup-pipeline QA measurement:
    recall of the MinHash-LSH candidate generator (4 bands × 2 rows)
    against the EXACT near-dup pair set, per true-Jaccard decile band,
    next to the theoretical candidate probability 1−(1−s²)⁴ at the
    band edges (Python-computed literals injected into both engines).
    This is the empirical probability curve behind every banding
    parameter choice in the dedup family — measured on the corpus
    itself and hash-verified exactly (the md5mix signatures are
    deterministic in both engines, llm_minhash_accuracy's convention).

    Scale shape: composes two already-linear pipelines (capped shingle
    pair join; signature → banding) plus one pair-keyed left join and
    a ≤7-row rollup — no new join shapes, no pair² anywhere."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    # threshold 0.05, NOT the dedup family's 0.3: the curve's
    # informative region is where recall is LOW — the fixture's only
    # sub-threshold pairs live in the 0.0x decile
    exact = dedup.ngram_jaccard_pairs(
        docs, threshold=0.05, max_shingle_freq=NGRAM_MAX_SHINGLE_FREQ
    )
    sig = dedup.minhash_signature(docs)
    cand = dedup.lsh_candidates(sig).withColumn("_hit", F.lit(1))
    bi = F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int")
    tagged = (
        exact.select("doc_a", "doc_b", bi.alias("bi"))
        .join(cand, ["doc_a", "doc_b"], "left")
    )
    lo_case = F.lit(None).cast("double")
    hi_case = F.lit(None).cast("double")
    for b, (lo, hi) in _SCURVE_P.items():
        lo_case = F.when(F.col("bi") == b, F.lit(lo)).otherwise(lo_case)
        hi_case = F.when(F.col("bi") == b, F.lit(hi)).otherwise(hi_case)
    return (
        tagged.groupBy("bi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint")
            .alias("n_hit"),
        )
        .select(
            F.concat(F.lit("0."), F.col("bi").cast("string")).alias("band"),
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") * 1.0 / F.col("n_exact"), 6)
            .alias("recall"),
            lo_case.alias("expect_lo"),
            hi_case.alias("expect_hi"),
            F.col("bi"),
        )
        .drop("bi")
    )


# ---------------------------------------------------------------------------
# Suite fusion builders (r14, guide §2.4: shuffle/scan the shared work
# once). Each builder returns {member tag: DataFrame} overrides for one
# driver suite; the suites layer substitutes them for the standalone
# QUERIES_RAW member calls. Every override is built from the SAME
# operator code paths as the standalone member (prebuilt intermediates
# are injected through the operators' ``counts=`` / ``vocab=`` /
# ``lm_scored=`` / prebuilt-table parameters, never through changed
# arithmetic), so member outputs are row-identical — pinned by
# tests/test_oracle_parity.py::test_fused_suites_match_members and the driver
# oracle, which verifies the fused rows against the UNCHANGED per-member
# SQL every round. Shared intermediates are eagerly localCheckpoint-ed
# inside the (timed) query call — nothing persists across runs.
# ---------------------------------------------------------------------------


def fused_text_quality(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """suite_text_quality: ONE bigram-count build (corpus scan +
    map-combined count shuffle) feeds the add-one LM, the Kneser–Ney
    LM and the curriculum, and the scored table feeds both its
    verifying member and the curriculum rank — previously each of the
    three members re-scanned the corpus and re-shuffled the token
    stream to rebuild identical (w1, w2, COUNT(*)) counts."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    counts = text.bigram_counts(docs).localCheckpoint(eager=True)
    scored = text.lm_score(docs, counts=counts).localCheckpoint(eager=True)
    return {
        "llm_lm_perplexity": scored,
        "llm_kn_perplexity": text.kn_lm_score(docs, counts=counts),
        "llm_curriculum": text.curriculum_phases(
            docs, n_phases=4, lm_scored=scored
        ),
    }


def fused_corpus_stats(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """suite_corpus_stats: ONE BPE training chain (head checkpoint +
    6 merge rounds) serves train / apply / measure — previously the
    merges, segmentation and fertility members each re-trained the
    identical tokenizer (three full chains of eager-checkpoint jobs
    per suite run)."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    merges, vocab = text.bpe_train_artifacts(docs, k=6)
    return {
        "llm_bpe_merges": merges.localCheckpoint(eager=True),
        "llm_bpe_segment": vocab,
        "llm_tokenizer_fertility": text.tokenizer_fertility(
            docs, k=6, vocab=vocab
        ),
    }


def fused_graph(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """suite_graph: the word co-occurrence graph (corpus scan +
    distinct shuffle) is built and materialized once for TextRank and
    the LPA communities — previously each member regenerated it."""
    t = load_tables(spark, sf_dir, ("documents",))
    pairs = word_cooc_pairs(t["documents"]).localCheckpoint(eager=True)
    return {
        "llm_textrank_keywords": textrank_from_pairs(pairs),
        "llm_word_communities": communities_from_pairs(pairs),
    }


def fused_minhash_lsh(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """suite_minhash_lsh: ONE MinHash signature pass (corpus scan +
    shingle explode + ceil(k/3) md5s per shingle + min-agg) and ONE
    banding join serve the signature, candidate and accuracy members —
    previously the signature was computed three times and the banding
    twice per suite run."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    sig = dedup.minhash_signature(
        docs, k=8, hash="md5mix"
    ).localCheckpoint(eager=True)
    cand = dedup.lsh_candidates(
        sig, k=8, band_size=2
    ).localCheckpoint(eager=True)
    return {
        "llm_minhash_signature": sig,
        "llm_minhash_lsh_candidates": cand,
        "llm_minhash_accuracy": minhash_accuracy_from(docs, sig, cand),
    }

def fused_multimodal(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """suite_multimodal: (1) ONE HNSW build serves both the graph
    member and the beam search — previously llm_hnsw_search re-ran the
    identical per-layer GEMM top-m build llm_hnsw_graph had just done
    (same m/max_level/level_src/cap ⇒ bit-identical adjacency);
    (2) ONE attach_media pass (two md5s over every document's text)
    feeds catalog / frames / features / resize — previously each of
    the four re-scanned the corpus to derive the same 32-byte
    payloads. media and the adjacency are per-doc/edge-list sized.
    (mm_shard_packing packs from the documents size ledger, not from
    payloads — it keeps its standalone path.)"""
    from datawarehouse_spark.queries.multimodal import (
        _catalog_from_media,
        _features_from_media,
        _frames_from_media,
        _resize_from_media,
    )

    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    media = mm_ops.attach_media(t["documents"]).localCheckpoint(eager=True)
    emb = t["embeddings"]
    levels, adj = similarity.hnsw_build(
        emb, m=6, max_level=3, level_src=F.col("vec_id"),
        dense_layer_cap=similarity.MAX_DENSE_LAYER_CAP,
        require_dense=True,
    )
    adj = adj.localCheckpoint(eager=True)
    return {
        "mm_media_catalog": _catalog_from_media(media),
        "mm_frame_sample": _frames_from_media(media),
        "mm_feature_extraction": _features_from_media(media),
        "mm_resize": _resize_from_media(media),
        "llm_hnsw_graph": adj.select(
            F.col("lvl").cast("int").alias("lvl"), "src", "dst"
        ),
        "llm_hnsw_search": similarity.hnsw_topk(
            emb, emb.filter(F.col("vec_id") < 8),
            k=3, m=6, ef=8, steps=2, max_level=3,
            level_src=F.col("vec_id"),
            dense_layer_cap=similarity.MAX_DENSE_LAYER_CAP,
            require_dense=True, graph=(levels, adj),
        ).select("q_id", "n_id", "cos", "rank"),
    }

def fused_corpus_ops(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """suite_corpus_ops: llm_ann_quality and llm_mrl_quality both
    ground on the IDENTICAL exact ground truth —
    ``cosine_topk(embeddings, vec_id < 5, k = 5)`` — previously each
    re-ran the full-corpus exact scoring pass per suite run. Compute
    it once (q·k = 25 rows after one corpus scoring scan) and inject
    it into both members' unchanged bodies."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, q, k=5).localCheckpoint(eager=True)
    return {
        "llm_ann_quality": _ann_quality_from(emb, q, exact),
        "llm_mrl_quality": _mrl_quality_from(emb, exact),
    }
