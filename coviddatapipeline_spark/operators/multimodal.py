"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the decode kernels are
STUBBED (clearly marked, import-gated) behind deterministic fakes — but
the Spark-side plumbing is real and tested: binary column construction,
metadata schema, ``mapInPandas`` batch iteration, output schema, and
partition-parallel execution are exactly what a real decoder would use;
only the bytes→pixels kernel body changes.

The testdata has no binary column, so ``documents.text`` is encoded to
UTF-8 bytes as the stand-in payload — byte-exact and engine-neutral.

Scale posture: decode is per-row and stateless → ``mapInPandas`` keeps
it embarrassingly parallel with Arrow-batch amortization; heavy assets
stay columnar-compressed until the batch that decodes them; metadata
(extracted once at ingest) carries the filter/join load so full payload
scans are rare.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coviddatapipeline_spark.queries.catalog import register
from coviddatapipeline_spark.operators.common import t

# Real decoders would be imported here; absent in this container.
try:  # pragma: no cover - the gate itself is the point
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary payload column + typed metadata —
    the canonical multimodal table shape: (id, blob, metadata...)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


@register(
    "mm_binary_metadata",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS digest,
               'text/plain' AS mime
        FROM documents
        ORDER BY doc_id
    """,
    doc=(
        "Binary payload metadata extraction: byte length + sha-256 digest "
        "computed on the binary column JVM-side (the ingest-time metadata "
        "pass that lets later queries avoid touching payloads)."
    ),
    tags=("multimodal",),
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.sha2("payload", 256).alias("digest"),
        F.col("meta.mime").alias("mime"),
    ).orderBy("doc_id")


# --- mapInPandas feature extraction ----------------------------------------

_FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, n_space_bytes int"

# NOTE: the Pandas kernels below are defined INSIDE their query functions
# on purpose: cloudpickle serializes nested functions by value, so the
# Python workers never need this package importable (a consumer running
# from any cwd — e.g. the external driver — would otherwise crash with an
# unpickling ImportError).


@register(
    "mm_decode_features_pandas",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               ascii(substr(text, 1, 1)) AS first_byte,
               octet_length(encode(text)) - octet_length(encode(replace(text, ' ', '')))
                   AS n_space_bytes
        FROM documents
        ORDER BY doc_id
    """,
    doc=(
        "mapInPandas feature extraction over the binary payload — the "
        "Arrow-batch decode path, oracle-checked byte-for-byte against "
        "SQL-computed equivalents."
    ),
    tags=("multimodal", "udf"),
)
def mm_decode_features_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Arrow-batched feature kernel. A real image pipeline would decode
        # ``payload`` here (PIL/libvips/ffmpeg) and emit width/height/etc.;
        # this deterministic byte-level fake keeps the identical batch
        # shape, schema contract, and per-partition parallelism.
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "n_space_bytes": payloads.map(lambda b: b.count(b" ")).astype("int32"),
                }
            )

    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(extract_features, schema=_FEATURE_SCHEMA).orderBy("doc_id")


# --- stubbed image decode (rows-only: fake semantics, real plumbing) -------

_IMAGE_SCHEMA = "doc_id long, width int, height int, channels int, decoded boolean"


@register(
    "mm_image_decode_stub",
    oracle=None,  # fake decode semantics — rows-only check by design
    doc=(
        "Stubbed image decode via mapInPandas: real Arrow plumbing and "
        "schema contract, deterministic fake kernel (no imaging libs in "
        "the container). The `decoded` flag is honest about it."
    ),
    tags=("multimodal", "udf", "stub"),
)
def mm_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    has_pil = _HAS_PIL

    def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if has_pil:  # pragma: no cover
                raise NotImplementedError(
                    "real decode: PIL.Image.open(io.BytesIO(b)) per payload — "
                    "container has no imaging libs; deterministic fake below"
                )
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # Deterministic fake dimensions derived from payload size —
                    # stable across runs/partitionings, so tests can assert them.
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "decoded": pd.Series([False] * len(pdf)),  # fake, not a real decode
                }
            )

    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(decode_image_batch, schema=_IMAGE_SCHEMA).orderBy("doc_id")


@register(
    "mm_frame_offsets",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               len(generate_series(0, octet_length(encode(text)) - 1, 32)) AS n_frames
        FROM documents
        ORDER BY doc_id
    """,
    doc=(
        "Frame sampling plan over a binary stream: fixed-stride chunk "
        "offsets computed as pure column math (sequence + size) — the "
        "planning half of video frame extraction, no UDF needed."
    ),
    tags=("multimodal",),
)
def mm_frame_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _payloads(spark, sf_dir)
    n_bytes = F.col("meta.n_bytes")
    # Zero-length payload: sequence(0, -1, 32) is rejected by Spark
    # (illegal boundaries with positive step) while DuckDB's
    # generate_series returns an empty list — guard to report 0 frames
    # instead of crashing (ADVICE r01).
    return p.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.when(
            n_bytes > 0, F.size(F.sequence(F.lit(0), n_bytes - 1, F.lit(32)))
        )
        .otherwise(F.lit(0))
        .alias("n_frames"),
    ).orderBy("doc_id")


_RESIZE_SCHEMA = "doc_id long, width int, height int, out_w int, out_h int"


@register(
    "mm_resize_plan_pandas",
    oracle="""
        WITH dims AS (
            SELECT doc_id,
                   (octet_length(encode(text)) % 640 + 1) AS w,
                   (octet_length(encode(text)) % 480 + 1) AS h
            FROM documents
        )
        SELECT doc_id, w AS width, h AS height,
               CASE WHEN greatest(w, h) <= 224 THEN w
                    ELSE CAST(floor(w * 224.0 / greatest(w, h)) AS INTEGER) END AS out_w,
               CASE WHEN greatest(w, h) <= 224 THEN h
                    ELSE CAST(floor(h * 224.0 / greatest(w, h)) AS INTEGER) END AS out_h
        FROM dims
        ORDER BY doc_id
    """,
    doc=(
        "Aspect-preserving resize planning (max side 224) as an Arrow-"
        "batched mapInPandas kernel over the stub-decoded dimensions — "
        "the resize half of an image pipeline with the same batch shape "
        "a real PIL/libvips kernel would use. Because the stub dims are "
        "a deterministic function of payload bytes, even this UDF path "
        "is oracle-checked."
    ),
    tags=("multimodal", "udf"),
)
def mm_resize_plan_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def resize_plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # A real kernel would `img.thumbnail((224, 224))`; the planning
        # math below is exactly what that performs internally.
        for pdf in batches:
            n = pdf["payload"].map(len)
            w = (n % 640 + 1).astype("int64")
            h = (n % 480 + 1).astype("int64")
            m = pd.concat([w, h], axis=1).max(axis=1)
            scale_needed = m > 224
            out_w = w.where(~scale_needed, (w * 224 // m)).astype("int32")
            out_h = h.where(~scale_needed, (h * 224 // m)).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(resize_plan, schema=_RESIZE_SCHEMA).orderBy("doc_id")


# Deterministic fake-container dispatch tables for the header probe.
# Indexed by cheap integer features of the payload header — real code
# would switch on magic bytes (ftyp/RIFF/EBML); the dispatch SHAPE and
# the downstream typed-struct plumbing are identical.
_CONTAINERS = ("mp4", "mkv", "wav")
_CODECS = ("h264", "aac", "opus", "vp9")


@register(
    "mm_av_header_probe",
    oracle=f"""
        WITH probe AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   ascii(substring(text, 1, 1)) AS b0
            FROM documents
        ),
        typed AS (
            SELECT doc_id, n_bytes,
                   ['{_CONTAINERS[0]}', '{_CONTAINERS[1]}', '{_CONTAINERS[2]}']
                       [1 + n_bytes % 3] AS container,
                   ['{_CODECS[0]}', '{_CODECS[1]}', '{_CODECS[2]}', '{_CODECS[3]}']
                       [1 + b0 % 4] AS codec,
                   n_bytes * 8.0 / (8 + b0 % 8) AS duration_ms
            FROM probe
        )
        SELECT container, codec, count(*) AS n_files,
               round(sum(duration_ms), 2) AS total_duration_ms,
               round(avg(n_bytes * 8.0 / (duration_ms / 1000.0) / 1000), 3)
                   AS avg_kbps
        FROM typed
        GROUP BY container, codec
        ORDER BY container, codec
    """,
    doc=(
        "A/V container header probe: parse cheap integer features of "
        "each binary payload's header into a TYPED metadata struct "
        "(container, codec, duration) without decoding the stream, "
        "then roll up the catalog per (container, codec). The parse "
        "is pure JVM column algebra over the first header bytes — at "
        "100 TB this is the pattern that builds the media-catalog "
        "dimension in one scan while full decode stays in the stubbed "
        "mapInPandas kernels (no media libs in this container; the "
        "dispatch here keys on byte-derived integers rather than real "
        "magic numbers, but the plumbing — byte slicing, struct "
        "typing, catalog rollup — is the production shape)."
    ),
    tags=("multimodal", "agg"),
)
def mm_av_header_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _payloads(spark, sf_dir).select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.ascii(F.col("payload").cast("string")).alias("b0"),
    )
    container = F.array(*[F.lit(c) for c in _CONTAINERS])[
        F.pmod(F.col("n_bytes"), F.lit(3)).cast("int")
    ]
    codec = F.array(*[F.lit(c) for c in _CODECS])[
        F.pmod(F.col("b0"), F.lit(4)).cast("int")
    ]
    typed = p.select(
        "doc_id",
        "n_bytes",
        F.struct(
            container.alias("container"),
            codec.alias("codec"),
            (F.col("n_bytes") * 8.0 / (8 + F.pmod(F.col("b0"), F.lit(8)))).alias("duration_ms"),
        ).alias("av"),
    )
    return (
        typed.groupBy(
            F.col("av.container").alias("container"), F.col("av.codec").alias("codec")
        )
        .agg(
            F.count("*").alias("n_files"),
            F.round(F.sum("av.duration_ms"), 2).alias("total_duration_ms"),
            F.round(
                F.avg(
                    F.col("n_bytes") * 8.0 / (F.col("av.duration_ms") / 1000.0) / 1000
                ),
                3,
            ).alias("avg_kbps"),
        )
        .orderBy("container", "codec")
    )
