"""Multimodal column plumbing (north star): media as opaque binary columns
with typed metadata; decode / feature-extract / frame-sample as Arrow-batched
Pandas operators over ``mapInPandas``.

The container has no image/audio libraries, so the actual media decode is a
STUB (clearly marked, import-gated); everything Spark-side — schema, binary
handling, batch iteration, partitioning — is real and oracle-tested via a
deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from limeqo_spark.io import scratch_dir, table
from limeqo_spark.relational.registry import query


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    """Decode a media payload into (width, height, channels).

    STUB: the runtime image/audio libs (PIL / soundfile / av) are not in
    this container. The Spark-side plumbing around this function is real;
    swap in the real decoder where the libs exist.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media decode requires PIL/soundfile/av — not available in this "
            "container; use fake_meta (deterministic) for plumbing tests"
        ) from e
    raise NotImplementedError("wire the real decoder here")


def fake_meta(n_bytes: int, doc_id: int) -> tuple[int, int, str]:
    """Deterministic fake decode: metadata derived arithmetically from the
    payload size + id, so the oracle can verify the plumbing end-to-end."""
    width = 16 + (n_bytes % 64)
    height = 16 + (doc_id % 32)
    kind = "image" if doc_id % 3 == 0 else ("audio" if doc_id % 3 == 1 else "video")
    return width, height, kind


@query(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + (octet_length(encode(text)) % 64) AS BIGINT) AS width,
           CAST(16 + (doc_id % 32) AS BIGINT) AS height,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind
    FROM documents ORDER BY doc_id
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + typed metadata extraction through mapInPandas:
    text payloads stand in for media bytes; the "decoder" runs per Arrow
    batch exactly as a real image decoder would (bytes in, struct out)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            meta = [
                fake_meta(nb, did) for nb, did in zip(n_bytes, pdf["doc_id"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "kind": [m[2] for m in meta],
                }
            )

    return d.mapInPandas(
        decode_batches,
        "doc_id bigint, n_bytes bigint, width bigint, height bigint, kind string",
    ).orderBy("doc_id")


@query(
    "mm_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id,
             CAST(FLOOR(n_chars / 10) AS BIGINT) AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ),
    sampled AS (
      SELECT doc_id, i AS frame_idx,
             CAST((doc_id * 31 + i) % 997 AS BIGINT) AS feat
      FROM (SELECT doc_id, UNNEST(range(0, n_frames, 5)) AS i FROM frames) z
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(feat) AS BIGINT) AS feat_sum
    FROM sampled GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for "video" docs (doc_id % 3 == 2): every 5th frame of
    n_chars/10 frames, with a deterministic per-frame feature — the shape of
    a real frame-sampler (one input row -> many frame rows -> re-aggregate),
    expressed with built-in sequence/explode (no Python needed here)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    # explicit FLOOR on both sides: DuckDB's double->int cast rounds while
    # Spark's truncates — a silent off-by-one without it
    frames = d.select(
        "doc_id", F.floor(F.col("n_chars") / 10).cast("bigint").alias("n_frames")
    ).filter(F.col("n_frames") > 0)
    sampled = frames.select(
        "doc_id",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), n_frames - 1, 5)")).alias("frame_idx"),
    ).withColumn("feat", (F.col("doc_id") * 31 + F.col("frame_idx")) % 997)
    return (
        sampled.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.sum("feat").cast("bigint").alias("feat_sum"),
        )
        .orderBy("doc_id")
    )


@query(
    "mm_resize",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             16 + (octet_length(encode(text)) % 64) AS width,
             16 + (doc_id % 32) AS height
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           CAST(224 AS BIGINT) AS out_w, CAST(224 AS BIGINT) AS out_h,
           CAST(LEAST(n_bytes, GREATEST(1, FLOOR(n_bytes * 224.0 * 224.0 / (width * height)))) AS BIGINT)
             AS out_bytes
    FROM meta ORDER BY doc_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing for "image" docs (doc_id % 3 == 0): binary in, binary
    out through an Arrow batch — the fake resizer scales the byte budget by
    the (224x224)/(w*h) area ratio and truncates the payload to it, standing
    in for a real thumbnail encoder. The output column IS binary (the plan
    carries BinaryType end-to-end); the oracle checks its length."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    d = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, _ = fake_meta(len(payload), did)
                budget = min(len(payload), max(1, int(len(payload) * 224.0 * 224.0 / (w * h))))
                rows.append((did, payload[:budget]))
            yield pd.DataFrame(rows, columns=["doc_id", "resized"])

    out = d.mapInPandas(resize_batches, "doc_id bigint, resized binary")
    return out.select(
        "doc_id",
        F.lit(224).cast("bigint").alias("out_w"),
        F.lit(224).cast("bigint").alias("out_h"),
        F.octet_length("resized").cast("bigint").alias("out_bytes"),
    ).orderBy("doc_id")


@query(
    "mm_feature_extract",
    oracle="""
    WITH base AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    dims AS (
      SELECT doc_id,
             CAST((n_bytes * (i + 1) + doc_id) % 1000 AS DOUBLE) / 1000.0 AS v
      FROM base, UNNEST(range(0, 8)) AS t(i)
    )
    SELECT doc_id,
           CAST(8 AS INTEGER) AS dim,
           ROUND(SQRT(SUM(v * v)), 4) AS feat_norm
    FROM dims GROUP BY doc_id ORDER BY doc_id
    """,
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction plumbing: bytes -> 8-dim embedding via an Arrow
    batch (the fake extractor derives each dim arithmetically from the byte
    count, standing in for a vision/audio encoder). The embedding column is
    a real array<double> — downstream ANN consumes the same shape — and the
    oracle verifies its L2 norm per document."""
    import numpy as np

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).to_numpy(dtype="int64")
            dids = pdf["doc_id"].to_numpy(dtype="int64")
            # (batch, 8) vectorized: dim i = ((n_bytes*(i+1) + id) % 1000)/1000
            mat = ((n_bytes[:, None] * (np.arange(8)[None, :] + 1) + dids[:, None]) % 1000) / 1000.0
            yield pd.DataFrame({"doc_id": dids, "embedding": list(mat)})

    out = d.mapInPandas(extract_batches, "doc_id bigint, embedding array<double>")
    sq = "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)"
    return out.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(F.expr(f"SQRT({sq})"), 4).alias("feat_norm"),
    ).orderBy("doc_id")


#: how many fixture docs become standalone media files for the ingest test
BINARYFILE_N = 40


@query(
    "mm_binaryfile_ingest",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id < {BINARYFILE_N} ORDER BY doc_id
    """,
)
def mm_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-lake ingest via Spark's ``binaryFile`` source — the real
    entry point for image/audio/video blobs: materialize the first
    {BINARYFILE_N} documents as standalone ``<doc_id>.bin`` files, read
    them back with ``format("binaryFile")`` (columns path /
    modificationTime / length / content), recover the id from the path
    and digest the raw bytes. Verifies the full blob round-trip: DuckDB
    computes the same md5 from the source column, so a single flipped
    byte anywhere in write→list→read fails the hash gate.

    Scale (100 TB): binaryFile lists and splits files across executors
    (one row per file, content never concatenated); pair it with
    ``pathGlobFilter`` and partitioned directory layouts for pruning, and
    keep per-file size under ``maxPartitionBytes`` — exactly how the
    mapInPandas decode stages downstream expect their batches."""
    import os

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < BINARYFILE_N)
        .select("doc_id", "text")
        .collect()  # BINARYFILE_N tiny rows, fixture materialization only:
        # a real lake already HAS the files; this step fakes the lake
    )
    out = scratch_dir(prefix="limeqo_binf_")
    for r in docs:
        with open(os.path.join(out, f"{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .orderBy("doc_id")
    )
