"""Operator library.

- ``relational``  joins, windows, set ops, rollup/cube, pivot, top-k
- ``covid``       the reference's operator inventory (SURVEY §2 S/P/F/Q/A
                  rows) role-mapped onto the driver testdata
- ``dedup``       exact + MinHash-LSH + SimHash + n-gram-Jaccard +
                  embedding-cosine dedup
- ``similarity``  ANN over embeddings (brute-force + IVF-by-partition)
- ``text``        language-ID, quality scoring, token counts, fingerprints
- ``events``      event-time windows, sessionization, as-of join
- ``multimodal``  opaque-binary column plumbing; real BMP decode, A/V probes
"""
