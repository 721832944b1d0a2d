"""The correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (mirrors the driver's t2 check)."""

from __future__ import annotations

import os

import pytest

from datawarehouse_spark.queries import ORACLES, QUERIES, QUERIES_RAW, TESTS_ONLY
from tests.conftest import SF_ORACLE
from tests.oracle_compare import compare_query


#: the driver's correctness gate runs at sf0.01 — non-emptiness is
#: asserted THERE (SF_ORACLE defaults to sf0.001 for local speed, where
#: a handful of selective members are legitimately empty)
SF_DRIVER = os.environ.get("SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01")


def test_registry_fits_driver_gate():
    """The driver verifies only the first DRIVER_GATE_CAP registry
    entries (CORRECTNESS_r08 recorded exactly 50 of 53 rows — the three
    trailing entries silently lost their hard evidence). Overflow must
    never recur, and every entry must carry an oracle so a green round
    means ALL of them were hash-verified."""
    from datawarehouse_spark.queries.suites import (
        DRIVER_GATE_CAP,
        FINAL_ORDER,
    )

    assert len(FINAL_ORDER) <= DRIVER_GATE_CAP, (
        f"registry has {len(FINAL_ORDER)} entries; the driver gate "
        f"verifies only the first {DRIVER_GATE_CAP} — fold the overflow "
        "into a suite (see queries/suites.py)"
    )
    assert list(QUERIES) == FINAL_ORDER
    assert set(ORACLES) == set(FINAL_ORDER), (
        "driver entries without an oracle get only a rows-only check: "
        f"{sorted(set(FINAL_ORDER) - set(ORACLES))}"
    )


def test_coverage_header_matches_registry():
    """COVERAGE.md's generated-map header drifted twice (r7 said 172
    while the registry had 173; r8's '53 driver entries all checked'
    overstated a 50-row gate) — pin the numbers to the live registry so
    doc drift fails CI instead of waiting for the judge."""
    import re

    from datawarehouse_spark.queries.suites import FINAL_ORDER

    text = open("COVERAGE.md").read()
    m = re.search(
        r"(\d+) fine-grained operator queries .*?"
        r"driver-facing registry = (\d+) entries", text, re.S
    )
    assert m, "COVERAGE.md generated header missing — run scripts/gen_coverage_map.py"
    assert int(m.group(1)) == len(QUERIES_RAW), (
        f"COVERAGE.md says {m.group(1)} raw queries, registry has "
        f"{len(QUERIES_RAW)} — rerun scripts/gen_coverage_map.py"
    )
    assert int(m.group(2)) == len(FINAL_ORDER), (
        f"COVERAGE.md says {m.group(2)} driver entries, registry has "
        f"{len(FINAL_ORDER)} — rerun scripts/gen_coverage_map.py"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    ok, msg = compare_query(spark, duck, QUERIES[name], ORACLES[name], SF_ORACLE)
    assert ok, f"{name}: {msg}"


def test_no_rows_only_or_tests_only_queries():
    """r14 (VERDICT r13 ask #5): since mm_resize graduated (r13) every
    registry query has a DuckDB oracle and no raw query sits outside
    the driver registry without one. Through r13 this was expressed as
    two parametrized run-only tests whose parameter sets were EMPTY —
    the good outcome, but it surfaced as a perpetual '2 skipped' in
    every round's report. Assert the emptiness directly instead: a
    future oracle-less query now fails loudly here (add the oracle, or
    document the exception in COVERAGE.md and amend this guard),
    and the suite reports zero skips."""
    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert not rows_only, (
        f"registry queries without a DuckDB oracle: {rows_only} — "
        "every driver entry must be hash-verifiable (oracle_sql)"
    )
    assert not sorted(TESTS_ONLY), (
        f"raw queries outside the driver registry: {sorted(TESTS_ONLY)}"
        " — graduate them into a registry entry with an oracle"
    )


@pytest.mark.parametrize(
    "suite_name", sorted(__import__(
        "datawarehouse_spark.queries.suites", fromlist=["SUITES"]
    ).SUITES)
)
def test_suite_members_nonempty(spark, suite_name):
    """A suite row stays green if ONE member silently goes empty (its
    siblings keep the union non-empty and the oracle matches
    vacuously). Every member must contribute at least one row AT THE
    DRIVER'S sf0.01 — emptiness there means fixture drift killed a
    filter and the member verifies nothing."""
    from pyspark.sql import functions as F

    from datawarehouse_spark.queries.suites import SUITES

    df = QUERIES[suite_name](spark, SF_DRIVER)
    counts = {
        r["op"]: r["n"]
        for r in df.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = [t for t, _, _ in SUITES[suite_name] if not counts.get(t)]
    assert not missing, f"{suite_name}: empty members {missing}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(__import__(
        "datawarehouse_spark.queries.suites", fromlist=["SUITES"]
    ).SUITES))
)
def test_standalone_entries_nonempty(spark, name):
    """Standalone driver entries must return rows at the driver's
    sf0.01 — an empty result hash-matches an empty oracle vacuously
    (the known fixture-regeneration failure mode)."""
    assert QUERIES[name](spark, SF_DRIVER).head(1), (
        f"{name} empty at sf0.01 — fixture drift?"
    )


NAIVE_EDIT_DISTANCE_ORACLE = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 6000000,
             substr(text, 1, 4) || 'Z' || substr(text, 6)
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      -- r14: the registry oracle injects a deterministic short-key
      -- family so the fallback branch is driver-verified; the naive
      -- twin must mirror it for the equality tests to compare the
      -- same corpus
      SELECT doc_id + 7000000,
             (['abcd','abcde','abcdef','axcd','abc','abcdefg'])
               [CAST((doc_id // 50) % 6 AS INT) + 1]
      FROM documents WHERE doc_id % 50 = 0
    ), k AS (
      SELECT doc_id, substr(text, 1, 40) AS key FROM corpus
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(length(a.key) AS BIGINT) AS len_a,
           CAST(length(b.key) AS BIGINT) AS len_b,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
    FROM k a JOIN k b ON a.doc_id < b.doc_id
      AND abs(length(a.key) - length(b.key)) <= 2
    WHERE levenshtein(a.key, b.key) <= 2
"""


def test_edit_distance_passjoin_oracle_equals_naive(duck):
    """r13 (VERDICT r12 ask #5): llm_edit_distance_pairs' registry
    oracle was rewritten from the naive all-pairs levenshtein join
    (~2.3 h at sf1) to the same lossless Pass-Join segment identity
    the Spark operator uses, so the full-registry sf1 sweep can run it
    at full scale. This pins the rewrite: both SQL forms, executed by
    DuckDB on the same corpus (with the same typo injection), must
    produce the identical row multiset — the pigeonhole filter is
    lossless, so the rewritten oracle is still EXACT."""
    from datawarehouse_spark.queries import ORACLES_RAW

    naive = duck.execute(
        f"SELECT * FROM ({NAIVE_EDIT_DISTANCE_ORACLE}) "
        "ORDER BY doc_a, doc_b"
    ).fetchall()
    passjoin = duck.execute(
        f"SELECT * FROM ({ORACLES_RAW['llm_edit_distance_pairs']}) "
        "ORDER BY doc_a, doc_b"
    ).fetchall()
    assert naive, "fixture must produce edit-distance pairs"
    assert passjoin == naive


def test_edit_distance_short_long_boundary_pairs(spark):
    """r13 review finding: a (len 4, len 5) key pair within distance d
    is produced by NEITHER Pass-Join pigeonhole branch (short keys
    can't form d+1 non-empty segments; the probe/index sides carry
    only len >= 2d+1 keys), and the original both-short fallback
    dropped it silently — latent on the 40-char fixture keys. The
    fallback now joins short × (len < 3d+1). Toy corpus with keys
    'abcd'/'abcde'/'abcdef'/'abcdefgh': expected pairs are every
    combination within levenshtein 2 across the 4/5/6-length keys,
    plus none to the 8-length key (distance filter), computed here by
    brute force as the in-test oracle."""
    import itertools

    # brute-force levenshtein (tiny inputs)
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    from datawarehouse_spark.operators import dedup

    rows = [(1, "abcd"), (2, "abcde"), (3, "abcdef"), (4, "abcdefgh")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dedup.edit_distance_pairs(docs, max_dist=2).collect()
    }
    texts = dict(rows)
    want = {
        (a, b, lev(texts[a], texts[b]))
        for a, b in itertools.combinations(sorted(texts), 2)
        if abs(len(texts[a]) - len(texts[b])) <= 2
        and lev(texts[a], texts[b]) <= 2
    }
    assert (1, 2, 1) in want  # the boundary pair that was dropped
    assert got == want


def test_edit_distance_passjoin_oracle_short_keys():
    """Oracle-side twin of the boundary fix: the Pass-Join SQL must
    equal the naive SQL on a corpus CONTAINING short texts (the
    committed fixture's keys are all 40 chars, so the registry parity
    test can never exercise the short bucket)."""
    import duckdb

    from datawarehouse_spark.queries import ORACLES_RAW

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE documents AS SELECT * FROM (VALUES
          (1, 'abcd'), (2, 'abcde'), (3, 'abcdef'), (4, 'abcdefgh'),
          (50, 'abc'), (100, 'xyzw'),
          (5, 'a much longer document text that exceeds forty characters easily for key tests'),
          (6, 'a much longer document text that exceeds forty characters easilx for key tests')
        ) AS t(doc_id, text)
    """)
    naive = con.execute(
        f"SELECT * FROM ({NAIVE_EDIT_DISTANCE_ORACLE}) ORDER BY 1, 2"
    ).fetchall()
    passjoin = con.execute(
        f"SELECT * FROM ({ORACLES_RAW['llm_edit_distance_pairs']}) "
        "ORDER BY 1, 2"
    ).fetchall()
    assert any(r[2] < 5 or r[3] < 5 for r in naive), \
        "corpus must exercise the short-key bucket"
    assert passjoin == naive


@pytest.mark.parametrize(
    "suite_name", sorted(__import__(
        "datawarehouse_spark.queries.suites", fromlist=["FUSED_BUILDERS"]
    ).FUSED_BUILDERS)
)
def test_fused_suites_match_members(spark, suite_name):
    """r14 suite fusion: a fused suite computes shared intermediates
    once and injects them into the same operator code paths, so its
    union must be ROW-IDENTICAL to the one built from the standalone
    QUERIES_RAW members (which is what the unchanged per-member oracle
    SQL verifies). Build both forms and compare the full sorted row
    multisets at SF_ORACLE."""
    from datawarehouse_spark.queries.suites import (
        FUSED_BUILDERS,
        SUITES,
        _canon_spark,
    )

    members = SUITES[suite_name]
    over = FUSED_BUILDERS[suite_name](spark, SF_ORACLE)
    unknown = sorted(set(over) - {t for t, _, _ in members})
    assert not unknown, f"{suite_name}: overrides for non-members {unknown}"
    assert over, f"{suite_name}: fused builder returned no overrides"
    kw = max(len(k) for _, k, _ in members)
    vw = max(len(v) for _, _, v in members)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    for tag, keys, vals in members:
        if tag not in over:
            continue
        fused = rows(_canon_spark(over[tag], tag, keys, vals, kw, vw))
        solo = rows(_canon_spark(
            QUERIES_RAW[tag](spark, SF_ORACLE), tag, keys, vals, kw, vw
        ))
        assert fused == solo, (
            f"{suite_name}/{tag}: fused member rows differ from the "
            "standalone query"
        )
