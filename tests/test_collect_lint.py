"""Mechanized driver-side-materialization audit (r10 verdict ask #3):
no module under queries/ or operators/ may call .collect(),
.toPandas() or .toLocalIterator() outside an allowlist of documented
BOUNDED trainers — each allowlisted function collects an object whose
size is fixed by construction (k·dim centroids, ksub codebooks,
LIMIT-1 rows), never O(rows). A new unbounded collect anywhere in the
pipeline fails this test; extending the allowlist requires writing
down the bound here, which is the point.

This is the static sweep that replaces the hand audit the r10 verdict
called out ("the one lint-class still hand-audited"); the dynamic
plan lints (tests/test_plan_lints_sweep.py) cover the other three
scale-killer classes.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "datawarehouse_spark"

MATERIALIZERS = {"collect", "toPandas", "toLocalIterator"}

#: (module path relative to the package, enclosing function) → why the
#: collect is bounded by construction.
ALLOWED: dict[tuple[str, str], str] = {
    ("operators/similarity.py", "_kmeans_pp_init"):
        "k-means++ seeding: collects a 32·k-cell weighted SAMPLE, "
        "never the table (similarity.py docstring, r10 verdict audit)",
    ("operators/similarity.py", "kmeans_centroids"):
        "k·dim centroid stats per Lloyd round — model-sized",
    ("operators/similarity.py", "_kmeans_remean"):
        "k·dim per-cluster mean lift — model-sized",
    ("operators/similarity.py", "kmeans_assign"):
        "k·dim centroid table + k-row cluster-id map — model-sized",
    ("operators/similarity.py", "pq_train_codebooks"):
        "m·ksub·dsub PQ codebooks — model-sized (FAISS shape)",
    ("operators/similarity.py", "ivfpq_topk_grid"):
        "nlist coarse centroids + PQ codebooks + the k-row result "
        "grid — all index/model-sized, never corpus-sized",
    ("operators/similarity.py", "hnsw_build"):
        "dense-layer (id, vector) matrix, collected ONLY when the "
        "layer population ≤ dense_layer_cap (4096 default; "
        "MAX_DENSE_LAYER_CAP=32768 ENFORCED by a ValueError at the "
        "top of hnsw_build, so the largest possible collect is "
        "~34 MB) — the count() guard right above the collect IS the "
        "bound; over-cap layers take the distributed LSH-bucket "
        "branch",
}


def _materializing_calls() -> set[tuple[str, str]]:
    found: set[tuple[str, str]] = set()
    for sub in ("queries", "operators"):
        for path in sorted((PKG / sub).rglob("*.py")):
            rel = str(path.relative_to(PKG))
            tree = ast.parse(path.read_text())

            def walk(node: ast.AST, fn: str) -> None:
                for child in ast.iter_child_nodes(node):
                    name = fn
                    if isinstance(
                        child, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        name = child.name
                    if (
                        isinstance(child, ast.Call)
                        and isinstance(child.func, ast.Attribute)
                        and child.func.attr in MATERIALIZERS
                    ):
                        found.add((rel, fn))
                    walk(child, name)

            walk(tree, "<module>")
    return found


def test_no_unbounded_driver_materialization():
    calls = _materializing_calls()
    rogue = calls - set(ALLOWED)
    assert not rogue, (
        "driver-side materialization outside the documented bounded "
        f"allowlist: {sorted(rogue)} — either make the operator "
        "distributed or add it to ALLOWED with a written size bound"
    )


def test_collect_allowlist_is_not_stale():
    """Every allowlist entry must still exist — a renamed/removed
    trainer must shed its exemption rather than leave a dangling hole
    a future collect could silently reuse."""
    calls = _materializing_calls()
    stale = set(ALLOWED) - calls
    assert not stale, f"stale allowlist entries: {sorted(stale)}"
