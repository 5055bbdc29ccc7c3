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


def canon_cell(v, *, int_floats=False):
    """Canonicalize one cell for cross-engine comparison.

    Decimal is deliberately NOT coerced to float: the driver's pandas
    canonicalization hashes a Spark ``Decimal`` and a DuckDB ``float64``
    differently whenever the fraction is not binary-representable
    (round-1 ``tpch_q7`` red row), so a query whose Spark side returns
    Decimal while its oracle returns float must FAIL here too. Decimal
    vs Decimal still compares scale-insensitively.

    ``int_floats=True`` (poison-parity inventory ONLY — never the
    driver-faithful default) collapses integral floats to ints on both
    sides. A NULL anywhere in an integer column makes pandas deliver
    the whole DuckDB column as float64 (``1970.0`` vs Spark's
    ``1970``) — a compare-harness dtype artifact, not a semantic
    divergence. The default stays strict because the driver hashes
    that pairing as a MISMATCH (round-2 HUGEINT-sum red row), and a
    lenient local compare would go green where the driver goes red.
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
        # int_floats first: int(v) already collapses -0.0/0.0 to 0,
        # matching the raw-int canon of the other side — checking the
        # v == 0 string branch first would leave a spurious "0"-vs-0
        # dtype divergence at exactly zero under the lenient mode.
        if int_floats and v.is_integer() and abs(v) < 2**53:
            return int(v)  # equals the raw-int canon of the other side
        # collapse -0.0 / 0.0 and format stably
        if v == 0:
            return "0"
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        # DuckDB DATE arrives as a midnight pandas Timestamp via .df()
        # while Spark DateType collects as datetime.date; the driver
        # hashes that pairing as EQUAL (q2_a2_latest_date, a Spark-date
        # vs DuckDB-DATE query, was green in round 2's CORRECTNESS).
        # Canonicalize midnight datetimes to the date string to mirror.
        v = v.replace(tzinfo=None)
        if v.time() == dt.time(0, 0, 0) and v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x, int_floats=int_floats) for x in v)
    return v


def rows_to_canon(rows, colnames, *, int_floats=False):
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [
        tuple(canon_cell(r[i], int_floats=int_floats) for i in order) for r in rows
    ]
    out.sort(key=lambda tup: tuple((x is None, str(x)) for x in tup))
    return out


def _from_pandas(v):
    """Convert one pandas/numpy cell to the Python value the driver hashes.

    The driver fetches the DuckDB side through pandas (``rel.df()``), NOT
    ``fetchall()``. The difference is the round-2 red-row class: DuckDB
    ``sum(INTEGER)`` yields HUGEINT, which pandas renders float64
    (``99111.0``) while Spark's collect gives int (``99111``) — values
    equal, hash different. ``fetchall()`` hid the class locally by
    converting HUGEINT to Python int. So: keep numpy floats as floats
    (int-vs-float MUST mismatch), map NaN (pandas' NULL for numeric
    columns) to None, and unwrap numpy scalars / arrays / Timestamps.
    """
    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return [_from_pandas(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_from_pandas(x) for x in v]
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def fetch_duck_pandas(duck_con, oracle_sql: str):
    """Fetch a DuckDB result the way the driver does: through pandas.

    Returns (colnames, rows) with cells converted by :func:`_from_pandas`.
    """
    rel = duck_con.execute(oracle_sql)
    cols = [c[0] for c in rel.description]
    pdf = rel.df()
    rows = [
        tuple(_from_pandas(v) for v in tup)
        for tup in pdf.itertuples(index=False, name=None)
    ]
    return cols, rows


def fetch_duck_native(duck_con, oracle_sql: str):
    """Fetch a DuckDB result via ``fetchall()`` — NOT driver-faithful.

    Poison-parity inventory ONLY. The pandas fetch path cannot
    distinguish NULL from NaN in a float64 column (both arrive as NaN
    and ``_from_pandas`` maps them to None) and promotes nullable
    integer columns to float64 — two verifier-side artifact classes
    that exist in no engine: DuckDB propagates NaN through sum/avg/
    min/max exactly like Spark (measured: ``sum(1.0, NaN) = NaN`` in
    both), and the integers are integers until pandas touches them.
    A native fetch preserves NaN-vs-NULL and int-vs-float as DuckDB
    computed them, so the inventory's divergence list contains only
    genuine cross-engine semantic differences. The driver-faithful
    strict gate must keep :func:`fetch_duck_pandas` (the round-2
    HUGEINT class must keep failing locally — see ``_from_pandas``).
    """
    rel = duck_con.execute(oracle_sql)
    cols = [c[0] for c in rel.description]
    rows = [tuple(_from_native(v) for v in tup) for tup in rel.fetchall()]
    return cols, rows


def _from_native(v):
    """Unwrap a DuckDB ``fetchall`` cell (floats/NaN/ints arrive exact)."""
    if isinstance(v, (list, tuple)):
        return [_from_native(x) for x in v]
    return v


def compare(spark_df, duck_con, oracle_sql: str, *, int_floats=False,
            duck_fetch="pandas"):
    """Return (ok, message) comparing a Spark DataFrame against DuckDB.

    ``int_floats`` and ``duck_fetch="native"`` must stay off for
    anything mirroring the driver (see :func:`canon_cell` /
    :func:`fetch_duck_native`); poison-parity sets them to strip the
    two pandas fetch-path artifact classes (NULL-promotion dtype,
    NaN-collapsed-to-NULL) from its divergence inventory.
    """
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    fetch = fetch_duck_native if duck_fetch == "native" else fetch_duck_pandas
    d_cols, d_rows = fetch(duck_con, oracle_sql)

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    s_canon = rows_to_canon(s_rows, [c.lower() for c in s_cols], int_floats=int_floats)
    d_canon = rows_to_canon(d_rows, [c.lower() for c in d_cols], int_floats=int_floats)
    for i, (a, b) in enumerate(zip(s_canon, d_canon)):
        if a != b:
            return False, f"value mismatch at sorted-row {i}: spark={a!r} duck={b!r}"
    return True, "ok"
