"""Regenerate QUERIES.md (the registry index) from queries/catalog.py."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from coviddatapipeline_spark.queries import catalog

ALL = catalog.all_queries()
rows_only = sorted(n for n, q in ALL.items() if q.oracle is None)
lines = [
    "# QUERIES — the full registry (auto-generated from queries/catalog.py)",
    "",
    f"{len(ALL)} entries. Every one is exposed through `__spark_entry__.queries()`;",
    '"oracle" = DuckDB-differential checked at sf0.01 (the driver gate),',
    '"rows-only" = semantics not SQL-expressible (reason in the doc column).',
    "",
    "The driver's CORRECTNESS gate covers the first 50 entries of",
    "`queries()` iteration order; `catalog._PRIORITY` pins and ROTATES",
    "that window each round — a stable sentinel set plus every entry",
    "whose oracle or implementation changed, plus families not yet",
    "covered by a prior CORRECTNESS file — see catalog.py.",
    "",
    "| # | name | tags | check | what it does |",
    "|---|---|---|---|---|",
]
for i, name in enumerate(sorted(ALL), 1):
    q = ALL[name]
    doc = " ".join(q.doc.split())
    if len(doc) > 220:
        doc = doc[:220] + "..."
    check = "oracle" if q.oracle is not None else "rows-only"
    lines.append(f"| {i} | `{name}` | {', '.join(q.tags)} | {check} | {doc} |")
lines.append("")
pathlib.Path(__file__).resolve().parent.parent.joinpath("QUERIES.md").write_text("\n".join(lines))
print(f"wrote QUERIES.md: {len(ALL)} entries ({len(rows_only)} rows-only)")
