"""The poison-parity-only ``int_floats`` leniency in tests/parity.py.

A NULL anywhere in an integer column makes pandas deliver DuckDB's
side as float64 (``1970.0`` vs Spark's ``1970``) — a compare-harness
dtype artifact, not a semantic divergence. ``int_floats=True`` strips
that class for the poison inventory; the DEFAULT must stay strict,
because the driver hashes int-vs-float as a mismatch (the round-2
HUGEINT-sum red-row class) and a lenient local default would go green
where the driver goes red.
"""

from __future__ import annotations

import math

from tests.parity import canon_cell, rows_to_canon


def test_strict_default_keeps_int_float_mismatch():
    # the round-2 HUGEINT class MUST stay visible under the default
    assert canon_cell(99111.0) != canon_cell(99111)
    assert canon_cell(1970.0) == repr(1970.0)


def test_lenient_collapses_integral_floats_to_ints():
    assert canon_cell(1970.0, int_floats=True) == canon_cell(1970)
    assert canon_cell(-3.0, int_floats=True) == -3
    # beyond 2^53 a float no longer identifies one integer — stay strict
    big = float(2**60)
    assert canon_cell(big, int_floats=True) == repr(round(big, 9))


def test_lenient_leaves_everything_else_alone():
    assert canon_cell(1.5, int_floats=True) == repr(1.5)
    assert canon_cell(float("nan"), int_floats=True) == "NaN"
    # ADVICE r06: the int_floats collapse runs BEFORE the zero-string
    # branch, so a float 0.0 meets a native int 0 as the same canon
    # (int(v) collapses -0.0/0.0 too); strict mode still yields "0".
    assert canon_cell(0.0, int_floats=True) == 0
    assert canon_cell(-0.0, int_floats=True) == 0
    assert canon_cell(0.0, int_floats=False) == "0"
    assert canon_cell(None, int_floats=True) is None
    assert canon_cell("1970.0", int_floats=True) == "1970.0"


def test_lenient_recurses_into_arrays():
    assert canon_cell([1.0, 2.5], int_floats=True) == (1, repr(2.5))
    assert canon_cell([1.0], int_floats=False) == (repr(1.0),)


def test_rows_to_canon_threads_the_flag():
    rows = [(1970.0, "a")]
    strict = rows_to_canon(rows, ["y", "s"])
    lenient = rows_to_canon(rows, ["y", "s"], int_floats=True)
    assert strict != lenient
    assert lenient == rows_to_canon([(1970, "a")], ["y", "s"])


def test_nan_is_not_integral():
    assert not math.isnan(1970.0) and canon_cell(float("nan"), int_floats=True) == "NaN"
