"""Local mirror of the driver's oracle comparison.

The driver runs each ``queries()[name]`` via Spark and the matching
``oracle_sql()[name]`` via DuckDB at sf=0.01 and compares row count +
schema + order-insensitive value hash with columns sorted by name.
This module reproduces that comparison exactly-but-stricter (exact
cell equality after canonicalization), so a green parity test here
implies a green driver correctness check.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def canon_cell(v):
    """Canonicalize one cell for cross-engine comparison.

    Decimal is deliberately NOT coerced to float: the driver's pandas
    canonicalization hashes a Spark ``Decimal`` and a DuckDB ``float64``
    differently whenever the fraction is not binary-representable
    (round-1 ``tpch_q7`` red row), so a query whose Spark side returns
    Decimal while its oracle returns float must FAIL here too. Decimal
    vs Decimal still compares scale-insensitively.
    """
    if v is None:
        return None
    if isinstance(v, Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return "dec:" + (s or "0")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        if v == 0:
            return "0"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    return v


def rows_to_canon(rows, colnames):
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda tup: tuple((x is None, str(x)) for x in tup))
    return out


def compare(spark_df, duck_con, oracle_sql: str):
    """Return (ok, message) comparing a Spark DataFrame against DuckDB."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = duck_con.execute(oracle_sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    s_canon = rows_to_canon(s_rows, [c.lower() for c in s_cols])
    d_canon = rows_to_canon(d_rows, [c.lower() for c in d_cols])
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return False, f"value mismatch at sorted-row {i}: spark={a!r} duck={b!r}"
    return True, "ok"
