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
from datawarehouse_spark.operators import dedup, similarity, text
from datawarehouse_spark.queries.registry import query

# DuckDB rendering of the word-3-shingle list (shared by minhash/jaccard
# oracles); list_transform is 1-based like Spark's slice.
_DUCK_SHINGLES = """
  list_distinct(list_transform(
    range(1, len(string_split(text, ' ')) - 1),
    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
         || ' ' || string_split(text, ' ')[i+2]))
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
    WITH sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS s FROM documents)
    SELECT doc_id,
           list_aggregate(list_transform(s, x -> md5('0|' || x)), 'min') AS mh0,
           list_aggregate(list_transform(s, x -> md5('1|' || x)), 'min') AS mh1,
           list_aggregate(list_transform(s, x -> md5('2|' || x)), 'min') AS mh2,
           list_aggregate(list_transform(s, x -> md5('3|' || x)), 'min') AS mh3,
           list_aggregate(list_transform(s, x -> md5('4|' || x)), 'min') AS mh4,
           list_aggregate(list_transform(s, x -> md5('5|' || x)), 'min') AS mh5,
           list_aggregate(list_transform(s, x -> md5('6|' || x)), 'min') AS mh6,
           list_aggregate(list_transform(s, x -> md5('7|' || x)), 'min') AS mh7
    FROM sh
    """,
)
def llm_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8, md5-based — deterministic, engine-portable;
    the oracle recomputes them in SQL)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.minhash_signature(t["documents"], k=8)


@query(
    "llm_ngram_near_dup",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, (i * 1.0 / (sa.n + sb.n - i)) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE (i * 1.0 / (sa.n + sb.n - i)) >= 0.3
    """,
)
def llm_ngram_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: word-3-gram Jaccard ≥ 0.3 via shingle
    self-join (the exact verifier downstream of MinHash-LSH candidates).
    ~25 planted near-dup pairs exist at sf0.01."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.ngram_jaccard_pairs(t["documents"], threshold=0.3)


@query("llm_minhash_lsh_candidates")  # probabilistic — rows-only check
def llm_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (4 bands × 2 hashes): the O(n·bucket)
    scale path for near-dup discovery at 100 TB, on the 2×-faster
    xxhash64 signature (band collisions don't need oracle-portable
    hashes). Probabilistic recall → no SQL oracle; recall vs the exact
    pairs is asserted in tests/test_llm_ops.py."""
    t = load_tables(spark, sf_dir, ("documents",))
    sig = dedup.minhash_signature(t["documents"], k=8, hash="xxhash64")
    return dedup.lsh_candidates(sig, k=8, band_size=2)


@query("llm_simhash_pairs")  # bucketed candidates — rows-only check
def llm_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 9 bit-slices bucket-join (pigeonhole
    guarantees full recall at Hamming ≤ 8), exact bit_count(xor)
    verify — the constant-state alternative to MinHash-LSH. Containment
    vs the exact n-gram pairs asserted in tests."""
    t = load_tables(spark, sf_dir, ("documents",))
    sim = dedup.simhash64(t["documents"])
    return dedup.simhash_near_dup(sim, max_hamming=8)


@query("llm_simhash")  # pandas-UDF path — rows-only check
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints via Arrow-vectorized pandas UDF (the
    sanctioned slow path, SURVEY §2.10)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return dedup.simhash64(t["documents"])


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


@query(
    "llm_cosine_topk",
    oracle="""
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
    """,
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id<5 —
    the exact ANN baseline. Broadcast cross join + JVM fold dot product;
    at scale the corpus side stays partitioned and only queries ship."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


@query("llm_ann_lsh_topk")  # approximate — rows-only check
def llm_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets + exact
    re-rank within bucket — the 100 TB path (bucket id becomes the
    shuffle key). Recall vs llm_cosine_topk asserted in tests."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=4)


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


@query("llm_ann_ivf_topk")  # approximate — rows-only check
def llm_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: deterministic coarse centroids, cell
    assignment as a JVM argmax expression, n_probe cells re-ranked
    exactly. The cell id is the shuffle key — candidate generation
    touches ~n_probe/n_cells of the corpus. Recall vs llm_cosine_topk
    asserted in tests."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_cells=16, n_probe=4
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
