"""Property-based differential test: ``transform_covid`` vs a pure-
Python model of the reference's row loop (/root/reference/dags/
ETL.py:91-107) with the engine's documented divergences (SURVEY
§4.3.4: NULL dims coalesce to '' instead of crashing the row;
initcap instead of CPython .title()).

Hypothesis drives arbitrary mixes of valid/missing/empty/garbage cells
through both implementations; outputs must match as multisets."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from coviddatapipeline_spark.pipeline.silver import transform_covid

COLS = (
    "REPORT_DATE",
    "PROVINCE_STATE_NAME",
    "COUNTY_NAME",
    "PEOPLE_POSITIVE_NEW_CASES_COUNT",
    "PEOPLE_DEATH_NEW_COUNT",
)

_dates = st.one_of(
    st.dates(min_value=__import__("datetime").date(1990, 1, 1),
             max_value=__import__("datetime").date(2030, 12, 28)).map(str),
    st.sampled_from(["", "  ", "not-a-date", "2021-13-99", "2021/01/02", None]),
)
_dims = st.one_of(
    st.text(alphabet="abcXYZ' -", min_size=0, max_size=12),
    st.none(),
)
_measures = st.one_of(
    st.integers(min_value=-5, max_value=99999).map(str),
    st.sampled_from(["", "  ", "x", "1.5", "99oops", None, "  7 "]),
)

_row = st.fixed_dictionaries(
    {
        "REPORT_DATE": _dates,
        "PROVINCE_STATE_NAME": _dims,
        "COUNTY_NAME": _dims,
        "PEOPLE_POSITIVE_NEW_CASES_COUNT": _measures,
        "PEOPLE_DEATH_NEW_COUNT": _measures,
    }
)


def _initcap(s: str) -> str:
    """Spark F.initcap: first letter of each whitespace-delimited word
    uppercased, rest lowercased, spacing preserved."""
    return re.sub(r"\S+", lambda m: m.group()[0].upper() + m.group()[1:].lower(), s)


def _model_row(rec):
    """The reference transform with the engine's documented decisions."""
    import datetime as dt

    d = rec["REPORT_DATE"]
    if d is None:
        return None
    try:
        date = dt.datetime.strptime(d.strip(), "%Y-%m-%d").date()
    except ValueError:
        return None

    def dim(k):
        v = rec[k] or ""
        return _initcap(v.strip())

    def measure(k):
        v = rec[k]
        if v is None or v.strip() == "":
            return 0
        try:
            return int(v.strip())
        except ValueError:
            return None  # malformed -> row dropped

    cases, deaths = measure("PEOPLE_POSITIVE_NEW_CASES_COUNT"), measure(
        "PEOPLE_DEATH_NEW_COUNT"
    )
    if cases is None or deaths is None:
        return None
    return (str(date), dim("PROVINCE_STATE_NAME"), dim("COUNTY_NAME"), cases, deaths)


@given(rows=st.lists(_row, min_size=0, max_size=40))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_transform_matches_reference_model(spark, rows):
    expected = Counter(m for m in (_model_row(r) for r in rows) if m is not None)
    df = spark.createDataFrame(
        [tuple(r[c] for c in COLS) for r in rows] or [(None,) * 5],
        schema=", ".join(f"{c} string" for c in COLS),
    )
    if not rows:
        df = df.limit(0)
    got = Counter(
        (str(r["date"]), r["state"], r["county"], r["new_cases"], r["new_deaths"])
        for r in transform_covid(df).collect()
    )
    assert got == expected


# --- distributed exact global ranking vs the reference window -------------

_rank_rows = st.lists(
    st.tuples(
        st.one_of(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            st.sampled_from([0.0, 1.0, 1.0, -0.0, 42.5]),  # force heavy ties
        ),
    ),
    min_size=0,
    max_size=200,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=_rank_rows)
def test_global_row_number_property(spark, vals):
    """For arbitrary (ties-heavy) doubles, the distributed global row
    number equals row_number() OVER (ORDER BY v, k) exactly — including
    duplicate values straddling cutpoint boundaries."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from coviddatapipeline_spark.operators.ranking import with_global_row_number

    rows = [(float(v[0]), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v double, k long") if rows else (
        spark.range(0).select(F.col("id").cast("double").alias("v"),
                              F.col("id").alias("k"))
    )
    ranked, n = with_global_row_number(df, ["v", "k"], num_buckets=4)
    assert n == len(rows)
    if not rows:
        return
    ref = df.select(
        "k", F.row_number().over(W.orderBy("v", "k")).alias("rn_ref")
    )
    diff = ranked.join(ref, "k").filter(F.col("rn") != F.col("rn_ref")).count()
    assert diff == 0


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dau_wau_matches_bruteforce(spark, pairs):
    """dau_wau_from_daily_users vs a brute-force python model: for any
    (user, day-offset) activity set, WAU(day) must equal the distinct
    users active in [day-6, day], DAU the day's distinct users, and the
    output must cover exactly the observed day range."""
    import datetime

    from coviddatapipeline_spark.operators.events import dau_wau_from_daily_users

    base = datetime.date(2024, 1, 1)
    rows = [(u, base + datetime.timedelta(days=d)) for u, d in pairs]
    du = spark.createDataFrame(rows, "user_id long, day date").distinct()
    got = {
        r["day"]: (r["dau"], r["wau"], r["stickiness_e4"])
        for r in dau_wau_from_daily_users(du).collect()
    }
    days = sorted({d for _, d in rows})
    lo, hi = days[0], days[-1]
    acts = {(u, d) for u, d in rows}
    # a day emits a row iff its trailing window is non-empty (documented)
    expect_days = [
        day
        for day in (lo + datetime.timedelta(days=i) for i in range((hi - lo).days + 1))
        if any(0 <= (day - d).days <= 6 for (_, d) in acts)
    ]
    assert sorted(got) == expect_days
    for day in expect_days:
        dau = len({u for (u, d) in acts if d == day})
        wau = len(
            {
                u
                for (u, d) in acts
                if 0 <= (day - d).days <= 6
            }
        )
        assert got[day] == (dau, wau, dau * 10000 // wau)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_components_match_union_find(spark, edges):
    """Alternating-star connected components vs a driver-side
    union-find on arbitrary small graphs (duplicate and reversed edges
    included; self-loops are excluded — the LSH pair generators emit
    strictly a < b, which is the helper's input contract): identical
    node -> min-reachable-id labeling."""
    from coviddatapipeline_spark.operators.dedup import star_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["component"] for r in star_components(df).collect()
    }

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in edges:
        union(a, b)
    nodes = {n for e in edges for n in e}
    want = {}
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min.setdefault(r, []).append(n)
    for r, members in comp_min.items():
        m = min(members)
        for n in members:
            want[n] = m
    assert got == want


@given(
    sizes=st.lists(st.integers(0, 500), min_size=1, max_size=12),
    num=st.integers(0, 100),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_waterfill_conservation_and_fairness(spark, sizes, num):
    """Water-filling invariants for ANY sizes and budget: allocations
    never exceed size, sum to exactly min(B, total), and max-min
    fairness holds — no uncapped source gets 2+ tokens more than
    another uncapped one, and every capped source's size is <= every
    uncapped allocation + 1."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from coviddatapipeline_spark.operators.datapipe import mix_budget_waterfill  # noqa: F401 (same algebra below)

    total = sum(sizes)
    b = min(num * max(total, 1) // 100, total)  # budget as % of total
    per = spark.createDataFrame(
        [(f"s{j}", s) for j, s in enumerate(sizes)], "source string, s long"
    )
    w_ord = W.orderBy("s", "source")
    k = len(sizes)
    ordered = per.select(
        "source",
        "s",
        F.row_number().over(w_ord).cast("long").alias("i"),
        F.sum("s").over(w_ord.rowsBetween(W.unboundedPreceding, 0))
        .cast("long")
        .alias("pfx"),
    )
    cand = ordered.select(
        "i",
        "s",
        F.expr(f"CAST(({b} - (pfx - s)) DIV ({k} - i + 1) AS BIGINT)").alias("lvl"),
        F.expr(f"CAST(({b} - (pfx - s)) % ({k} - i + 1) AS BIGINT)").alias("rem"),
        F.coalesce(F.lag("s").over(W.orderBy("i")), F.lit(0))
        .cast("long")
        .alias("s_prev"),
    )
    split = cand.filter(
        (F.col("s_prev") <= F.col("lvl")) & (F.col("lvl") < F.col("s"))
    ).select(F.col("i").alias("si"), "lvl", "rem")
    rows = (
        ordered.join(F.broadcast(split), F.lit(True), "left")
        .select(
            "s",
            F.expr(
                "CAST(CASE WHEN si IS NULL OR i < si THEN s"
                " ELSE lvl + CASE WHEN i - si < rem THEN 1 ELSE 0 END"
                " END AS BIGINT)"
            ).alias("allocated"),
        )
        .collect()
    )
    allocs = [(r["s"], r["allocated"]) for r in rows]
    assert all(0 <= a <= s for s, a in allocs)
    assert sum(a for _, a in allocs) == b
    uncapped = [a for s, a in allocs if a < s]
    if uncapped:
        assert max(uncapped) - min(uncapped) <= 1
        for s, a in allocs:
            if a == s:  # capped
                assert s <= max(uncapped) + 1


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(
            # num magnitudes beyond int64 (the pattern exists precisely
            # because m*Sxy-style products overflow 2^63)
            st.integers(min_value=-(10**27), max_value=10**27),
            st.integers(min_value=1, max_value=10**27),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_decimal38_exact_division_property(spark, pairs):
    """The DECIMAL(38,0) exact-division pattern shared by
    graph_degree_assortativity and timeseries_acf_daily_orders —
    sign(num) * ((|num|*10000 - (|num|*10000) % den) / den) — must
    equal Python's exact sign-explicit truncating division
    sign * (|num|*10000 // den) for arbitrary wide integers, including
    magnitudes far beyond int64. Pins the pattern itself, not just the
    two entries' current data."""
    from pyspark.sql import functions as F

    # Clamp den so the e4 quotient fits BIGINT: the production uses of
    # this pattern emit bounded statistics (e4 correlations in [-1e4,
    # 1e4]), and ANSI mode rightly throws on a quotient > 2^63 — that
    # throw is itself the desired failure mode, not silent wrap.
    pairs = [
        (n, max(d, abs(n) * 10000 // (2**62) + 1)) for n, d in pairs
    ]
    rows = [(i, str(n), str(d)) for i, (n, d) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "i long, num_s string, den_s string").select(
        "i",
        F.col("num_s").cast("decimal(38,0)").alias("num"),
        F.col("den_s").cast("decimal(38,0)").alias("den"),
    )
    got = {
        r["i"]: r["q"]
        for r in df.select(
            "i",
            F.expr(
                "CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)"
                " * ((abs(num) * 10000 - (abs(num) * 10000) % den)"
                " / den) AS BIGINT)"
            ).alias("q"),
        ).collect()
    }
    for i, (n, d) in enumerate(pairs):
        sign = -1 if n < 0 else 1
        want = sign * (abs(n) * 10000 // d)
        assert got[i] == want, (n, d, got[i], want)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # source index
            st.integers(min_value=1, max_value=3000),   # n_tok (incl. > cap)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ffd_oracle_cte_matches_python_model(docs):
    """The pack_sequences_ffd DuckDB oracle (recursive-CTE replay of
    first-fit-decreasing) must agree with a direct Python FFD on
    ARBITRARY corpora — including docs larger than the context window
    (they open a bin with 0 remaining) and heavy tie groups (broken by
    doc_id). The registered three-SF sweep only exercises the driver
    testdata; this pins the fold itself, so regenerated testdata cannot
    surface a divergence the sweep would misattribute to the kernel."""
    import duckdb
    import pandas as pd

    from coviddatapipeline_spark.operators.datapipe import CONTEXT_TOKENS
    from coviddatapipeline_spark.queries import catalog

    oracle = catalog.get("pack_sequences_ffd").oracle

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "source": [f"src_{s}" for s, _ in docs],
            # tokenizer is whitespace-collapse + split: n single-char
            # words yield exactly n tokens
            "text": [" ".join(["w"] * n) for _, n in docs],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(oracle).fetchall()
    }

    want = {}
    by_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, (s, n) in enumerate(docs):
        by_src.setdefault(f"src_{s}", []).append((n, doc_id))
    for src, items in by_src.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        bins: list[int] = []
        for n, _ in items:
            for i, rem in enumerate(bins):
                if n <= rem:
                    bins[i] -= n
                    break
            else:
                bins.append(max(CONTEXT_TOKENS - n, 0))
        total = sum(n for n, _ in items)
        want[src] = (
            len(items),
            total,
            len(bins),
            total * 10000 // (len(bins) * CONTEXT_TOKENS),
        )
    assert got == want


# --- BMP parser: property-tested round trip (VERDICT r04 #5) ---------------
#
# The hand-enumerated edge cases (odd-width padding, top-down rows,
# header rejection) live in test_timeseries_simgraph.py; this closes
# the class: ANY (width, height, orientation, pixel seed) must survive
# encode -> the real parser -> closed-form stats, and any truncation of
# a valid blob must be rejected with None, never an exception.

@settings(max_examples=120, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=41),
    h=st.integers(min_value=1, max_value=29),
    top_down=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(w, h, top_down, seed):
    import struct

    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import (
        encode_bmp,
        make_bmp_decoder,
    )

    decode = make_bmp_decoder()
    n = w * h * 3
    flat = ((seed % 251) + 7 * np.arange(n, dtype=np.int64)) % 256
    px = flat.astype(np.uint8).tobytes()

    if top_down:
        # negative biHeight, rows stored first-row-first (no encoder
        # path for this by design — build the spec shape by hand)
        stride = (w * 3 + 3) // 4 * 4
        pad = b"\x00" * (stride - w * 3)
        rows = b"".join(
            px[r * w * 3 : (r + 1) * w * 3] + pad for r in range(h)
        )
        blob = (
            struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows), 0, 0, 0, 0
            )
            + rows
        )
    else:
        blob = encode_bmp(w, h, px)

    expect = (
        w, h, 3, n, int(flat[0]), int(flat.sum()) * 10000 // n,
    )
    assert decode(blob) == expect

    # any truncation of the pixel array must reject with None, never
    # raise (the documented malformed-but-'BM' contract, ADVICE r04)
    assert decode(blob[:-1]) is None
    assert decode(blob[: 54 + max(0, len(blob) - 54) // 2]) is None


def test_bmp_decoder_rejects_offset_past_end():
    """A 'BM' header whose pixel-array offset points past the buffer is
    rejected with None (used to ValueError inside np.frombuffer)."""
    import struct

    from coviddatapipeline_spark.operators.multimodal import make_bmp_decoder

    decode = make_bmp_decoder()
    blob = (
        struct.pack("<2sIHHI", b"BM", 54, 0, 0, 10_000)
        + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, 48, 0, 0, 0, 0)
        + b"\x00" * 64
    )
    assert decode(blob) is None


@settings(max_examples=120, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=41),
    h=st.integers(min_value=1, max_value=29),
    filter_cycle=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, filter_cycle, seed):
    """ANY (width, height, filter choice, pixel seed) must survive the
    full COMPRESSED round trip — five-filter encode, zlib deflate,
    CRC-stamped chunking, inflate, filter reconstruction — back to the
    closed-form stats; and any truncation or single-byte corruption of
    a valid blob must be rejected with None (CRC/size/zlib guards),
    never an exception."""
    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import (
        encode_png,
        make_png_decoder,
    )

    decode = make_png_decoder()
    n = w * h * 3
    flat = ((seed % 251) + 7 * np.arange(n, dtype=np.int64)) % 256
    px = flat.astype(np.uint8).tobytes()
    blob = encode_png(w, h, px, filter_cycle=filter_cycle)

    expect = (w, h, 3, n, int(flat[0]), int(flat.sum()) * 10000 // n)
    assert decode(blob) == expect

    assert decode(blob[:-1]) is None
    assert decode(blob[: len(blob) // 2]) is None
    # flip one byte inside the first IDAT chunk's data: CRC must catch it
    idat = blob.index(b"IDAT") + 4
    corrupt = blob[:idat] + bytes([blob[idat] ^ 0xFF]) + blob[idat + 1 :]
    assert decode(corrupt) is None


def test_png_decoder_rejects_unsupported_profiles():
    """Paletted / 16-bit / interlaced IHDRs are rejected with None —
    unsupported profiles must never be misdecoded as RGB8."""
    import struct
    import zlib

    from coviddatapipeline_spark.operators.multimodal import (
        encode_png,
        make_png_decoder,
    )

    decode = make_png_decoder()
    blob = encode_png(2, 2, bytes(12))

    def with_ihdr(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        i = blob.index(b"IHDR") - 4
        j = i + 12 + 13
        return blob[:i] + chunk + blob[j:]

    assert decode(with_ihdr(8, 3, 0)) is None   # paletted
    assert decode(with_ihdr(16, 2, 0)) is None  # 16-bit
    assert decode(with_ihdr(8, 2, 1)) is None   # interlaced
    assert decode(with_ihdr(8, 2, 0)) == decode(blob)  # control


def test_png_misfiltered_encode_fails_the_stats_oracle():
    """NEGATIVE CONTROL (VERDICT r07 #4): a blob with VALID framing
    (magic, CRCs, zlib, lengths) whose scanline data was NOT actually
    transformed by its declared filter must decode to DIFFERENT pixels
    — the closed-form stats must FAIL — proving the decoder implements
    the spec's filter inverses rather than whatever the in-repo encoder
    emits. An encoder/decoder pair with complementary filter bugs would
    still pass the round-trip property; this pins that class with a
    test instead of reasoning."""
    import struct
    import zlib

    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import make_png_decoder

    decode = make_png_decoder()
    w, h = 5, 3
    n = w * h * 3
    flat = (7 + 11 * np.arange(n, dtype=np.int64)) % 256
    px = flat.astype(np.uint8).tobytes()
    stride = w * 3

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def blob_declaring_filter(ft: int) -> bytes:
        # every row DECLARES filter `ft` but stores the RAW pixel bytes
        raw = b"".join(
            bytes([ft]) + px[r * stride : (r + 1) * stride] for r in range(h)
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    expect = (w, h, 3, n, int(flat[0]), int(flat.sum()) * 10000 // n)
    # control: filter 0 declared, raw stored == filter 0 applied -> pass
    assert decode(blob_declaring_filter(0)) == expect
    # Sub declared but never applied: a spec-correct decoder adds the
    # left neighbor back (per-row prefix sums) -> valid decode, wrong
    # pixels, stats oracle FAILS
    got = decode(blob_declaring_filter(1))
    assert got is not None  # framing is valid: it IS an RGB8 PNG
    assert got[:4] == (w, h, 3, n)  # geometry parses identically
    assert got[5] != expect[5]  # ...but the pixel mean moved
    # Up declared but never applied: column prefix sums from row 2 on
    got2 = decode(blob_declaring_filter(2))
    assert got2 is not None and got2[5] != expect[5]


@settings(max_examples=100, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=41),
    h=st.integers(min_value=1, max_value=29),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(w, h, seed):
    """ANY (width, height, index seed) must survive the full LZW round
    trip — variable-width codes, LSB-first packing, sub-block framing,
    palette mapping — back to the closed-form stats; and truncation or
    single-byte corruption of the code stream must be rejected with
    None, never an exception."""
    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import (
        GIF_PAL_ADD,
        GIF_PAL_MUL,
        encode_gif,
        make_gif_decoder,
    )

    decode = make_gif_decoder()
    n = w * h
    flat = ((seed % 251) + 7 * np.arange(n, dtype=np.int64)) % 256
    idx = flat.astype(np.uint8).tobytes()
    blob = encode_gif(w, h, idx)

    expect = (
        w, h, 1, n,
        (int(flat[0]) * GIF_PAL_MUL + GIF_PAL_ADD) % 256,
        int(flat.sum()) * 10000 // n,
    )
    assert decode(blob) == expect

    assert decode(blob[:-1]) is None  # missing trailer
    assert decode(blob[: len(blob) // 2]) is None
    # corrupt one byte inside the LZW data (after header+palette+
    # image descriptor + code size + first sub-block length byte)
    off = 13 + 768 + 10 + 2
    if off < len(blob) - 2:
        corrupt = blob[:off] + bytes([blob[off] ^ 0xFF]) + blob[off + 1 :]
        # a flipped code either decodes to DIFFERENT pixels/length or
        # is rejected — it must never crash and never match the stats
        got = decode(corrupt)
        assert got is None or got != expect


def test_gif_decoder_rejects_unsupported_profiles():
    """Interlaced / local-color-table / non-8-bit profiles must be
    rejected with None — never misdecoded."""
    from coviddatapipeline_spark.operators.multimodal import (
        encode_gif,
        make_gif_decoder,
    )

    decode = make_gif_decoder()
    blob = encode_gif(3, 2, bytes(6))
    assert decode(blob) is not None
    assert decode(b"JIF87a" + blob[6:]) is None  # magic
    desc = 13 + 768  # image-descriptor offset
    # interlace flag on
    inter = blob[: desc + 9] + bytes([blob[desc + 9] | 0x40]) + blob[desc + 10 :]
    assert decode(inter) is None
    # local color table flag on
    lct = blob[: desc + 9] + bytes([blob[desc + 9] | 0x80]) + blob[desc + 10 :]
    assert decode(lct) is None
    # minimum code size other than 8
    mcs = blob[: desc + 10] + b"\x07" + blob[desc + 11 :]
    assert decode(mcs) is None


def test_gif_lzw_dictionary_reset_path():
    """An image large enough to overflow the 12-bit code space must
    force a clear-code dictionary reset inside one stream and still
    round-trip exactly (the reset branch is otherwise never hit at
    testdata asset sizes)."""
    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import (
        GIF_PAL_ADD,
        GIF_PAL_MUL,
        encode_gif,
        make_gif_decoder,
    )

    decode = make_gif_decoder()
    w, h = 120, 90  # 10800 px: dict passes 4096 entries -> reset
    n = w * h
    flat = (np.arange(n, dtype=np.int64) * 13 + 5) % 256
    blob = encode_gif(w, h, flat.astype(np.uint8).tobytes())
    assert decode(blob) == (
        w, h, 1, n,
        (5 * GIF_PAL_MUL + GIF_PAL_ADD) % 256,
        int(flat.sum()) * 10000 // n,
    )


def test_gif_palette_is_actually_parsed():
    """NEGATIVE CONTROL (the PNG misfiltered-stats analog): the
    reported top-left value is the PALETTE-mapped red channel, so a
    blob whose color table was tampered with must decode to DIFFERENT
    stats — proving the decoder reads the table rather than echoing
    the index pattern."""
    from coviddatapipeline_spark.operators.multimodal import (
        encode_gif,
        make_gif_decoder,
    )

    decode = make_gif_decoder()
    idx = bytes([9, 9, 9, 9])
    blob = encode_gif(2, 2, idx)
    good = decode(blob)
    assert good is not None
    pal_off = 13 + 9 * 3  # entry for index 9, red channel
    tampered = blob[:pal_off] + bytes([blob[pal_off] ^ 0xFF]) + blob[pal_off + 1 :]
    bad = decode(tampered)
    assert bad is not None and bad[4] != good[4] and bad[:4] == good[:4]


@settings(max_examples=100, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=600),
    a=st.integers(min_value=0, max_value=4000),
    sr_exp=st.integers(min_value=0, max_value=2),
)
def test_wav_roundtrip_property(n, a, sr_exp):
    """ANY (clip length, seed, sample rate) must survive the RIFF
    round trip — chunk walk with the odd-LIST pad byte, PCM16 decode —
    back to the exact integer stats; truncation and magic corruption
    must reject with None, never an exception."""
    import numpy as np

    from coviddatapipeline_spark.operators.multimodal import (
        _WAV_SAMPLE_MOD,
        _WAV_SAMPLE_STEP,
        make_wav_decoder,
        make_wav_encoder,
    )

    encode = make_wav_encoder()
    decode = make_wav_decoder()
    sr = 8000 * (1 << sr_exp)
    v = (a + np.arange(n, dtype=np.int64) * _WAV_SAMPLE_STEP) % (
        _WAV_SAMPLE_MOD
    ) - 2000
    blob = encode(sr, v)

    av = np.abs(v)
    expect = (
        n, sr, n * 1_000_000 // sr, int(v[0]), int(av.max()),
        int(av.sum()), int(np.count_nonzero(v[1:] * v[:-1] < 0)),
    )
    assert decode(blob) == expect

    assert decode(blob[:-1]) is None  # RIFF length now overruns
    assert decode(blob[: len(blob) // 2]) is None
    assert decode(b"RIFX" + blob[4:]) is None  # big-endian form
    assert decode(blob[:8] + b"AVI " + blob[12:]) is None


def test_wav_decoder_rejects_unsupported_profiles_and_pad_rule():
    """Non-PCM / stereo / 24-bit fmt profiles must reject with None;
    and the odd-sized LIST chunk must be the thing that proves the
    pad-to-even walk (dropping the pad byte desynchronizes the chunk
    stream and the decoder must reject, not misparse)."""
    import struct

    from coviddatapipeline_spark.operators.multimodal import (
        make_wav_decoder,
        make_wav_encoder,
    )

    encode = make_wav_encoder()
    decode = make_wav_decoder()
    blob = encode(8000, [1, -2, 3])
    assert decode(blob) is not None

    fmt_off = 12 + 8  # RIFF header + 'fmt '+len
    def patch_fmt(field_off, fmt_char, value):
        b = bytearray(blob)
        struct.pack_into(fmt_char, b, fmt_off + field_off, value)
        return bytes(b)

    assert decode(patch_fmt(0, "<H", 3)) is None   # IEEE float fmt
    assert decode(patch_fmt(2, "<H", 2)) is None   # stereo
    assert decode(patch_fmt(14, "<H", 24)) is None # 24-bit

    # Remove the LIST pad byte (shortening RIFF size to stay
    # consistent): every subsequent chunk id is now read one byte
    # early -> the walk must fail, never return plausible stats.
    list_off = 12 + 8 + 16  # after fmt chunk
    assert blob[list_off:list_off + 4] == b"LIST"
    (list_len,) = struct.unpack_from("<I", blob, list_off + 4)
    pad_at = list_off + 8 + list_len
    unpadded = bytearray(blob[:pad_at] + blob[pad_at + 1:])
    struct.pack_into("<I", unpadded, 4, len(unpadded) - 8)
    assert decode(bytes(unpadded)) is None

    # Tamper negative control: flip one sample byte — decode SUCCEEDS
    # (framing intact) but the stats move, so the closed-form oracle
    # hash would catch a decoder that read the wrong bytes.
    data_payload = pad_at + 1 + 8  # pad byte + 'data'+len
    tampered = bytearray(blob)
    tampered[data_payload] ^= 0x40
    got = decode(bytes(tampered))
    assert got is not None and got != decode(blob)


def test_html_extract_recovers_ground_truth(spark, tmp_path):
    """Cross-engine parity alone can't catch a bug shared by both
    chains; this pins the extraction against GROUND TRUTH: the
    recovered main text must equal the whitespace-normalized original,
    entity decode must be spec-ordered (a decoded &lt;b&gt; must
    survive as literal '<b>', not get re-stripped), and the hostile
    chrome (script with < > operators, entity-encoded footer) must
    vanish entirely."""
    import hashlib

    docs = spark.createDataFrame(
        [
            (0, "plain  text   with\truns", "en", "s0", 22),
            (1, "entities stay: &lt;b&gt; and A &amp; B", "en", "s0", 38),
            (2, "", "en", "s0", 0),
            (3, None, "en", "s0", None),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")

    from coviddatapipeline_spark.operators.text import text_html_extract

    rows = {r["doc_id"]: r for r in text_html_extract(spark, sf).collect()}

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    # normalized original text recovered exactly
    assert rows[0]["main_md5"] == md5("plain text with runs")
    assert rows[0]["n_tokens"] == 4
    # entity decode AFTER tag strip: '<b>' survives as text
    assert rows[1]["main_md5"] == md5("entities stay: <b> and A & B")
    # empty doc: all chrome stripped -> empty main text, 0 tokens
    assert rows[2]["n_text_chars"] == 0 and rows[2]["n_tokens"] == 0
    # NULL text: NULL-propagating concat -> NULL page, NULL stats
    assert rows[3]["main_md5"] is None and rows[3]["content_ratio_e4"] is None


@settings(max_examples=100, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    doc_id=st.integers(min_value=0, max_value=2**40),
    body=st.binary(min_size=0, max_size=2000),
)
def test_warc_roundtrip_property(doc_id, body):
    """ANY (doc_id, payload bytes) must survive the container round
    trip — member split, WARC header parse, Content-Length slice,
    HTTP peel — and truncation / gzip corruption must reject with
    None, never an exception (gzip CRC makes compressed-stream
    tampering detectable by construction)."""
    import hashlib

    from coviddatapipeline_spark.operators.multimodal import (
        _WARC_HTTP_HDR,
        _WARC_URI_PRE,
        make_warc_decoder,
        make_warc_encoder,
    )

    encode = make_warc_encoder()
    decode = make_warc_decoder()
    blob = encode(doc_id, body)

    expect = (
        2,
        len(_WARC_HTTP_HDR) + len(body),
        hashlib.md5(body).hexdigest(),
        f"{_WARC_URI_PRE}{doc_id}",
    )
    assert decode(blob) == expect

    assert decode(blob[:-1]) is None          # truncated final member
    assert decode(blob[: len(blob) // 2]) is None
    assert decode(b"\x00\x00" + blob) is None  # not a gzip member
    # corrupt INSIDE member 1's deflate stream (the 10-byte gzip header
    # has don't-care fields — MTIME/XFL/OS — where a flip is a no-op)
    off = 12
    corrupt = blob[:off] + bytes([blob[off] ^ 0xFF]) + blob[off + 1 :]
    assert decode(corrupt) is None or decode(corrupt) != expect


def test_warc_decoder_record_level_rejections():
    """Record-level malformations that survive gzip must still reject:
    a missing response record, a Content-Length short of the body, a
    missing record terminator, a non-1.0 version line."""
    import gzip

    from coviddatapipeline_spark.operators.multimodal import (
        make_warc_decoder,
        make_warc_encoder,
    )

    decode = make_warc_decoder()
    encode = make_warc_encoder()
    blob = encode(7, b"hello")
    assert decode(blob) is not None

    def member(txt: bytes) -> bytes:
        return gzip.compress(txt, mtime=0)

    def rec(version=b"WARC/1.0", wtype=b"response", cl=None,
            body=b"HTTP/1.1 200 OK\r\n\r\nxyz", term=b"\r\n\r\n"):
        n = len(body) if cl is None else cl
        return (
            version + b"\r\n"
            + b"WARC-Type: " + wtype + b"\r\n"
            + b"WARC-Target-URI: http://example.org/doc/7\r\n"
            + b"Content-Length: " + str(n).encode() + b"\r\n\r\n"
            + body + term
        )

    assert decode(member(rec())) is not None          # control
    assert decode(member(rec(wtype=b"request"))) is None   # no response
    assert decode(member(rec(version=b"WARC/0.18"))) is None
    assert decode(member(rec(cl=2))) is None          # CL short: terminator misaligned
    assert decode(member(rec(term=b"\r\n"))) is None  # bad terminator
    # request member + response member: request's malformation poisons
    # the whole archive (a real reader must not skip silently)
    assert decode(member(rec(wtype=b"request", term=b"\r\n")) + member(rec())) is None
    # response-first member order is fine (order is not part of the spec)
    assert decode(member(rec()) + member(rec(wtype=b"request"))) is not None


def test_perceptron_fold_matches_python_model(spark, parity_sf_dir):
    """Both engines could share a mis-specified fold; this pins the
    distributed batch-perceptron against an independent pure-Python
    replay of the same contract (zero init, update on y*margin <= 0,
    batch sum of y*x) over the actual corpus."""
    import duckdb

    from coviddatapipeline_spark.operators.datapipe import (
        PCT_EPOCHS,
        quality_perceptron_train,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT COALESCE(n_chars, 0),
                   COALESCE(length(text) - length(replace(text, ' ', '')), 0),
                   COALESCE(length(text) - length(replace(text, 'e', '')), 0),
                   CASE WHEN lang = 'en' THEN 1 ELSE -1 END
            FROM read_parquet('{parity_sf_dir}/documents.parquet')"""
    ).fetchall()
    feats = [(1, int(a), int(b), int(c), int(y)) for a, b, c, y in rows]

    w = [0, 0, 0, 0]
    want = []
    for epoch in range(1, PCT_EPOCHS + 1):
        mis = [f for f in feats if f[4] * sum(w[i] * f[i] for i in range(4)) <= 0]
        for i in range(4):
            w[i] += sum(f[4] * f[i] for f in mis)
        want.append((epoch, w[0], w[1], w[2], w[3], len(mis)))

    got = [
        (r["epoch"], r["w0"], r["w1"], r["w2"], r["w3"], r["n_updates"])
        for r in quality_perceptron_train(spark, parity_sf_dir).collect()
    ]
    assert got == want
    # non-vacuous: the model actually trained (weights moved, updates
    # shrank below the full corpus after epoch 1)
    assert want[0][5] == len(feats) and want[1][5] < len(feats)


@settings(max_examples=100, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    doc_id=st.integers(min_value=0, max_value=2**40),
    body=st.binary(min_size=0, max_size=3000),
)
def test_tar_roundtrip_property_and_stdlib_cross_validation(doc_id, body):
    """ANY (doc_id, payload) must survive the ustar round trip — block
    framing, octal sizes, checksum, pad blocks, double-zero marker —
    AND the hand-rolled writer must be spec-valid per an INDEPENDENT
    reader: the stdlib tarfile module must see the identical members
    and bytes (cross-implementation validation, not self-consistency).
    Truncation / checksum damage / missing marker reject with None."""
    import hashlib
    import io
    import tarfile

    from coviddatapipeline_spark.operators.multimodal import (
        make_tar_decoder,
        make_tar_encoder,
    )

    encode = make_tar_encoder()
    decode = make_tar_decoder()
    meta = f'{{"doc_id":{doc_id}}}'.encode()
    blob = encode([("meta.json", meta), ("page.html", body)])

    expect = (
        2, len(meta) + len(body),
        hashlib.md5(body).hexdigest(), "meta.json,page.html",
    )
    assert decode(blob) == expect

    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert [(m.name, m.size) for m in tf.getmembers()] == [
            ("meta.json", len(meta)), ("page.html", len(body)),
        ]
        assert tf.extractfile("page.html").read() == body

    assert decode(blob[:-1]) is None            # block misalignment
    assert decode(blob[: len(blob) // 512 * 512 - 1024]) is None
    corrupt = bytearray(blob)
    corrupt[130] ^= 1                            # size digit -> checksum fails
    assert decode(bytes(corrupt)) is None
    assert decode(blob[:-1024]) is None          # marker removed
    assert decode(blob[:257] + b"XXXXXX" + blob[263:]) is None  # magic


@settings(max_examples=100, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    doc_id=st.integers(min_value=0, max_value=2**40),
    body=st.binary(min_size=0, max_size=3000),
)
def test_zip_roundtrip_property_and_stdlib_cross_validation(doc_id, body):
    """ANY (doc_id, payload) must survive the ZIP round trip — EOCD
    location, central-directory walk, local/central agreement, raw
    inflate terminating exactly at the recorded size, CRC-32 — AND the
    hand-rolled writer must be spec-valid per an INDEPENDENT reader
    (stdlib zipfile sees identical members and bytes) AND the decoder
    must read stdlib-WRITTEN archives, including one with an EOCD
    comment (the locate-from-the-end rule) — cross-implementation
    validation in BOTH directions, stronger than self-consistency.
    Stale prepended bytes (the classic forward-scan pitfall) and
    payload corruption reject with None."""
    import hashlib
    import io
    import zipfile

    from coviddatapipeline_spark.operators.multimodal import (
        make_zip_decoder,
        make_zip_encoder,
    )

    encode = make_zip_encoder()
    decode = make_zip_decoder()
    meta = f'{{"doc_id":{doc_id}}}'.encode()
    blob = encode([("meta.json", meta, False), ("page.html", body, True)])

    expect = (
        2, len(meta) + len(body),
        hashlib.md5(body).hexdigest(), "meta.json,page.html",
    )
    assert decode(blob) == expect

    # ours -> stdlib
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    assert [(i.filename, i.file_size) for i in zf.infolist()] == [
        ("meta.json", len(meta)), ("page.html", len(body)),
    ]
    assert zf.read("page.html") == body and zf.read("meta.json") == meta

    # stdlib -> ours (both methods + an EOCD comment)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("meta.json", meta, compress_type=zipfile.ZIP_STORED)
        z.writestr("page.html", body, compress_type=zipfile.ZIP_DEFLATED)
        z.comment = b"trailing archive comment"
    assert decode(buf.getvalue()) == expect

    # rejections: truncated EOCD, stale prefix (offsets off), payload flip
    assert decode(blob[:-1]) is None
    assert decode(b"JUNK" + blob) is None
    mi = blob.index(meta) if meta in blob else None
    if mi is not None:
        corrupt = bytearray(blob)
        corrupt[mi] ^= 1
        assert decode(bytes(corrupt)) is None  # crc catches it


def test_zip_single_byte_flips_never_misparse():
    """Exhaustive single-byte corruption over a representative archive:
    every flip either rejects (None) or leaves the report IDENTICAL
    (flips in non-load-bearing metadata: DOS timestamps, version/attr
    fields) — a corrupted archive can never misparse into a DIFFERENT
    successful report."""
    import hashlib

    from coviddatapipeline_spark.operators.multimodal import (
        make_zip_decoder,
        make_zip_encoder,
    )

    encode = make_zip_encoder()
    decode = make_zip_decoder()
    meta = b'{"doc_id":42}'
    page = b"<html>" + b"hello world " * 50 + b"</html>"
    blob = encode([("meta.json", meta, False), ("page.html", page, True)])
    want = (
        2, len(meta) + len(page),
        hashlib.md5(page).hexdigest(), "meta.json,page.html",
    )
    assert decode(blob) == want
    rejected = 0
    for i in range(len(blob)):
        b2 = bytearray(blob)
        b2[i] ^= 1
        got = decode(bytes(b2))
        assert got is None or got == want, (i, got)
        rejected += got is None
    # the vast majority of bytes ARE load-bearing
    assert rejected > len(blob) // 2
