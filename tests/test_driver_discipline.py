"""Driver-discipline gate (SCALE.md §9 as a test, not prose).

No operator may materialize data-proportional results on the driver.
This statically enumerates every ``.collect()`` / ``.toPandas()`` /
``.toLocalIterator()`` call site in the package (AST walk — no Spark)
and pins the set to the documented metadata-sized allowlist. Adding a
driver-side materialization anywhere else turns this red, forcing the
author to either express it distributed (the broadcast-scalar /
crossJoin house pattern) or argue it onto the allowlist with a
bounded-cardinality justification.

Sites are keyed by (package-relative file path, dotted qualified name)
— NOT bare function name — so a new collect() inside a same-named
function in another module (or a nested helper shadowing an allowlisted
name) cannot silently inherit an existing budget (ADVICE r04).
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "coviddatapipeline_spark",
)

# (relative path, qualified name) -> (max sites, why metadata-sized)
ALLOWED = {
    ("operators/ranking.py", "with_global_row_number"): (
        1, "bucket cutpoint counts: num_buckets rows"),
    ("operators/ranking.py", "with_global_running_sum"): (
        1, "per-bucket prefix offsets: num_buckets rows"),
    ("operators/ranking.py", "with_global_running_max"): (
        1, "per-bucket prefix maxima: num_buckets rows"),
    ("operators/datapipe.py", "km_train_centroids"): (
        2, "Lloyd model state: K centroids x d dims per round"),
    ("operators/datapipe.py", "ivf_kmeans_one_step"): (
        1, "K centroid seeds"),
    ("operators/datapipe.py", "pct_train"): (
        1, "perceptron epoch state: 1 row x (4 weights + count) ints"),
    ("operators/linalg.py", "emb_pca_power_iteration"): (
        1, "one 64-dim direction vector per round"),
    ("operators/text.py", "bpe_train_rounds"): (
        1, "BPE train model state: 1 argmax (a, b, count) row per round"),
    ("operators/text.py", "unigram_train_rounds"): (
        2, "unigram-LM model state: seed vocab + per-round piece-usage "
           "counts, <= alphabet + UNI_SEED_MULTI rows each"),
    ("operators/dedup.py", "star_components._fingerprint"): (
        1, "2-value convergence fingerprint (count + xor-of-hashes) "
           "per round — replaces a full anti-join pass; the exact "
           "exceptAll check still decides convergence"),
    ("operators/graph.py", "_tri_count_dense"): (
        1, "dense-gate bitset rows: <= TRI_DENSE_MAX_NODES rows x n/8 "
           "bytes (<= 32 MiB at the cap) — gate-bounded broadcast-"
           "relation state; the m-row edge list stays on executors"),
    ("pipeline/watermark.py", "compute_watermark"): (
        1, "1-row watermark aggregate"),
    ("pipeline/streaming.py", "stream_binary_ingest.ingest"): (
        1, "arrival-listing file PATHS per micro-batch (names, not "
           "bytes — the same driver-side scale as the file-source's "
           "own discovered-files log; blobs are read executor-side)"),
}


def _sites() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = {}
    for dirpath, _, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, PKG).replace(os.sep, "/")
            with open(path) as f:
                tree = ast.parse(f.read())
            stack: list[str] = []

            class V(ast.NodeVisitor):
                def visit_FunctionDef(self, node):
                    stack.append(node.name)
                    self.generic_visit(node)
                    stack.pop()

                visit_AsyncFunctionDef = visit_FunctionDef

                def visit_ClassDef(self, node):
                    stack.append(node.name)
                    self.generic_visit(node)
                    stack.pop()

                def visit_Call(self, node):
                    f = node.func
                    if isinstance(f, ast.Attribute) and f.attr in (
                        "collect",
                        "toPandas",
                        "toLocalIterator",
                    ):
                        qual = ".".join(stack) if stack else "<module>"
                        key = (rel, qual)
                        found[key] = found.get(key, 0) + 1
                    self.generic_visit(node)

            V().visit(tree)
    return found


def test_every_driver_collect_is_allowlisted_metadata():
    sites = _sites()
    rogue = {k: n for k, n in sites.items() if k not in ALLOWED}
    assert not rogue, (
        f"undocumented driver-side materialization(s): {rogue} — express "
        f"distributed (crossJoin(broadcast(agg)) house pattern) or add to "
        f"the allowlist with a bounded-cardinality justification"
    )
    over = {
        k: n for k, n in sites.items() if k in ALLOWED and n > ALLOWED[k][0]
    }
    assert not over, f"allowlisted functions grew extra collect sites: {over}"


def test_allowlist_is_not_stale():
    """Every allowlisted site must still exist and still collect —
    a removed site should shrink the allowlist, not rot in it."""
    sites = _sites()
    stale = [k for k in ALLOWED if k not in sites]
    assert not stale, f"allowlist entries with no remaining collect site: {stale}"
