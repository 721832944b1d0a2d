"""Graph operators over similarity/link structures.

The dedup pipeline already resolves connected components
(operators/dedup.py::dedup_clusters); this module adds iterative
numeric graph algorithms. PageRank over the near-dup candidate graph
ranks documents by how centrally they sit in a duplication cluster —
the canonical "pick the authoritative copy" signal (keep the hub,
drop the mirrors), and the standard demonstration that an iterative
fixed-iteration algorithm can be held to EXACT cross-engine parity:
PageRank uses no transcendental functions, so with per-iteration
contributions cast to decimal before the sum (reduction-order
independence) every intermediate double is bit-identical between
Spark and the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: damping factor and its complement — computed ONCE in Python and
#: injected verbatim into both engines so the doubles agree bit-for-bit
#: (writing `1 - 0.85` in one engine and `0.15` in the other yields two
#: DIFFERENT doubles).
DAMPING = 0.85
BASE = 1.0 - DAMPING


def pagerank(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b",
             n_iters: int = 10) -> DataFrame:
    """Fixed-iteration PageRank on the undirected pair graph.

    Nodes are ids appearing in at least one pair (an isolated document
    has no duplication signal and is excluded by construction — this
    also guarantees out-degree ≥ 1, so there is no dangling-mass
    term). r0 = 1/N; r_{i+1}(v) = (1-d)/N + d·Σ_{u→v} r_i(u)/deg(u).

    Exactness: contributions r/deg are IEEE divisions (deterministic),
    cast to DECIMAL(38,15) before the per-node sum so reduction order
    cannot move the total, then one multiply+add per node — no libm
    anywhere, so the emitted doubles are bit-identical across engines
    with NO rounding step.

    Scale shape: edges and degrees persist once (they drive all
    iterations); each iteration is one shuffle join of ranks against
    edges on the source key plus a map-combined per-destination sum —
    O(E) per iteration, O(log-diameter-independent) fixed 10 rounds.
    Lineage is cut with an eager localCheckpoint every third iteration
    (the standard Spark iterative-algorithm hygiene; without it the
    plan doubles per round). The graph-size scalar N is the one number
    the driver must know (it parameterizes every iteration's
    literals), hence a single count() of the node set — vocab-sized,
    not corpus-sized.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"),
                            F.col(id_a).alias("dst")))
        .persist()
    )
    try:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")) \
            .withColumnRenamed("src", "node").persist()
        nodes = deg.select("node")
        n_g = nodes.count()
        ranks = nodes.select("node", F.lit(1.0 / n_g).alias("r"))
        for i in range(n_iters):
            contrib = (
                ranks.join(deg, "node")
                .join(edges, F.col("node") == F.col("src"))
                .select(
                    F.col("dst").alias("node"),
                    (F.col("r") / F.col("deg"))
                    .cast("decimal(38,15)").alias("c"),
                )
            )
            sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
            ranks = nodes.join(sums, "node", "left").select(
                "node",
                (
                    F.lit(BASE / n_g)
                    + F.lit(DAMPING)
                    * F.coalesce(F.col("s"), F.lit(0)).cast("double")
                ).alias("r"),
            )
            if i % 3 == 2:
                ranks = ranks.localCheckpoint(eager=True)
        out = ranks.select(F.col("node"), F.col("r").alias("pr"))
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
        deg.unpersist()


def pagerank_oracle_sql(pairs_cte: str, n_iters: int = 10) -> str:
    """Unrolled-iteration DuckDB oracle for :func:`pagerank`.

    ``pairs_cte`` must be the text of CTE definitions ending in a
    relation ``pairs(doc_a, doc_b)``. Ten chained CTEs (not a
    recursive CTE: standard SQL forbids aggregation in the recursive
    term) replay the identical arithmetic: same decimal casts, same
    injected double literals.
    """
    blocks = [
        pairs_cte,
        """edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        )""",
        """deg AS (
          SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY 1
        )""",
        "g AS (SELECT COUNT(*) AS n FROM deg)",
        # CAST(... AS DOUBLE) everywhere: DuckDB types bare numeric
        # literals as DECIMAL, and decimal division would diverge from
        # Spark's IEEE double arithmetic
        """r0 AS (
          SELECT node, CAST(1.0 AS DOUBLE) / g.n AS r
          FROM deg CROSS JOIN g
        )""",
    ]
    for i in range(1, n_iters + 1):
        blocks.append(f"""r{i} AS (
          SELECT d.node,
                 (CAST({BASE!r} AS DOUBLE) / g.n)
                   + CAST({DAMPING!r} AS DOUBLE)
                     * CAST(COALESCE(c.s, 0) AS DOUBLE) AS r
          FROM deg d CROSS JOIN g
          LEFT JOIN (
            SELECT e.dst AS node,
                   SUM(CAST(p.r / dg.deg AS DECIMAL(38,15))) AS s
            FROM r{i - 1} p
            JOIN deg dg ON dg.node = p.node
            JOIN edges e ON e.src = p.node
            GROUP BY 1
          ) c ON c.node = d.node
        )""")
    body = ",\n    ".join(blocks)
    return f"""
    WITH RECURSIVE {body}
    SELECT node, r AS pr FROM r{n_iters}
    """
