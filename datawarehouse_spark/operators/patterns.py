"""Row-pattern matching — the MATCH_RECOGNIZE query class (SQL:2016,
shipped by Flink/Trino/Snowflake; part of the "支持标准SQL" capability
bar the reference sets for an MPP engine, docs/olap.md:82,97) over
Spark, which has no MATCH_RECOGNIZE parser.

The re-expression: DEFINE's boolean conditions classify every row into
a single-character SYMBOL; each partition's rows collapse — ordered —
into one symbol string; PATTERN becomes an ordinary regular expression
over that string, evaluated with leftmost-greedy semantics (identical
in Java's regex and RE2 for the concatenation/alternation/quantifier
pattern class MATCH_RECOGNIZE allows — no backreferences, no
lookaround). This is exactly how w12_match_recognize
(queries/warehouse.py) is driver-hash-verified against DuckDB; this
module is the generic, user-facing form behind
``DataWarehouse.sql_match_recognize``.

Scale shape: ONE shuffle on the partition key builds each ordered
symbol string map-side-combined (collect_list of (order, symbol)
structs, array_sort in-row); the regex pass is a map-side projection.
Per-partition state is O(rows in partition) single characters — the
same bounded-session assumption every streaming MATCH_RECOGNIZE engine
makes; an unbounded key needs a session split upstream (t5's session
windows) first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Per-partition row-pattern match statistics.

    ``symbol`` must evaluate to a single character per row (the
    DEFINE-classified symbol); ``order_by`` must be a total order
    within each partition (include a unique tiebreak column — same
    contract as every window op in this repo); ``pattern`` is a regex
    over symbol characters.

    Returns one row per partition: the symbol sequence ``seq``,
    ``n_rows``, the number of non-overlapping leftmost-greedy matches
    ``n_matches``, and the total row-span of all matches
    ``matched_len`` (the SQL ONE ROW PER MATCH ... AFTER MATCH SKIP
    PAST LAST ROW accounting).
    """
    seqs = (
        df.select(
            *partition_by,
            F.struct(
                *[F.col(o) for o in order_by], symbol.alias("_sym")
            ).alias("_s"),
        )
        .groupBy(*partition_by)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_s")), lambda x: x["_sym"]
                ),
                "",
            ).alias("seq")
        )
    )
    # Column-form regex (no SQL-string interpolation): n_matches and
    # matched_len share ONE un-mangled pattern literal, so a pattern
    # containing \ or ' cannot produce inconsistent measures or a
    # parse error (ADVICE r10).
    pat = F.lit(pattern)
    return seqs.select(
        *partition_by,
        "seq",
        F.length("seq").cast("bigint").alias("n_rows"),
        F.size(F.regexp_extract_all(F.col("seq"), pat, F.lit(0)))
        .cast("bigint").alias("n_matches"),
        (
            F.length("seq")
            - F.length(F.regexp_replace(F.col("seq"), pat, F.lit("")))
        ).cast("bigint").alias("matched_len"),
    )


def compile_define(define: dict[str, str]) -> tuple[Column, dict[str, str]]:
    """Map MATCH_RECOGNIZE's DEFINE clause — symbol name → boolean SQL
    condition — onto a single-character classifier Column. Conditions
    are tested in DEFINE order (first match wins); rows matching
    nothing classify as '0', which no assigned symbol can collide with
    (assignments are 'a'..'z'). Returns (classifier, name → char map).

    CONTRACT: DEFINE conditions must be MUTUALLY EXCLUSIVE for
    SQL:2016-identical results. A real MR engine assigns symbols per
    pattern position with backtracking, so a row satisfying two
    DEFINEs can match as either symbol depending on the pattern
    (PATTERN (A B) with A AS v>10, B AS v>5 matches rows [20, 20]);
    this shim's one-symbol-per-row classification cannot. Overlap is
    a property of the data × conditions, not the SQL text — validate
    with :func:`exclusive_violations` (engine.sql_match_recognize's
    ``validate_exclusive=True`` runs it for you)."""
    if not define:
        raise ValueError("DEFINE needs at least one symbol")
    if len(define) > 26:
        raise ValueError(f"at most 26 symbols supported, got {len(define)}")
    chars = {name: chr(ord("a") + i) for i, name in enumerate(define)}
    cases = " ".join(
        f"WHEN ({cond}) THEN '{chars[name]}'"
        for name, cond in define.items()
    )
    return F.expr(f"CASE {cases} ELSE '0' END"), chars


def exclusive_violations(df: DataFrame, define: dict[str, str]) -> int:
    """Detect rows satisfying MORE THAN ONE DEFINE condition — the
    mutual-exclusivity check behind :func:`compile_define`'s contract.
    A map-side pass (a sum of boolean casts per row, no shuffle) with
    a LIMIT 1 early exit: returns 0 (exclusive on this data — the
    shim's first-match-wins classification is SQL:2016-identical) or
    1 (at least one overlapping row exists). Each cast is coalesced to
    0: a condition evaluating to NULL means "did not match" exactly as
    in compile_define's CASE, and an un-coalesced NULL would poison
    the whole sum and hide a real overlap on the same row."""
    if not define:
        raise ValueError("DEFINE needs at least one symbol")
    hits = sum(
        F.coalesce(F.expr(f"({cond})").cast("int"), F.lit(0))
        for cond in define.values()
    )
    return df.filter(hits >= 2).limit(1).count()


def compile_pattern(pattern: str, chars: dict[str, str]) -> str:
    """Translate a MATCH_RECOGNIZE PATTERN body — symbol names with
    regex quantifiers/grouping/alternation, e.g. ``V+ P`` or
    ``(A B+){2,} | C?`` — into the regex over classifier characters.
    Unknown names raise (a silent passthrough would quietly match
    nothing)."""
    import re

    def sub(m: "re.Match[str]") -> str:
        name = m.group(0)
        if name not in chars:
            raise ValueError(
                f"PATTERN symbol {name!r} not in DEFINE {sorted(chars)}"
            )
        return chars[name]

    out = re.sub(r"[A-Za-z_]\w*", sub, pattern)
    return re.sub(r"\s+", "", out)
