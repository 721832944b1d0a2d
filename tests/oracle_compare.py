"""Canonical Spark-vs-DuckDB result comparison, mirroring the driver's
row-count + schema + order-insensitive value-hash gate."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def canonical(rows, colnames) -> list[tuple]:
    """Sort columns by name, normalize cell values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, bool):
            return ("b", int(v))
        if isinstance(v, Decimal):
            v = float(v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", repr(v))
        if isinstance(v, int):
            return ("i", v)
        if isinstance(v, datetime):
            return ("t", v.isoformat())
        if isinstance(v, date):
            return ("d", v.isoformat())
        if isinstance(v, (list, tuple)):
            return ("l", tuple(norm(x) for x in v))
        return ("s", str(v))

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, duck, fn, oracle_sql, sf_dir) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dres = duck.execute(oracle_sql)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    a = canonical(srows, scols)
    b = canonical(drows, dcols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(srows)} rows)"
