"""Multimodal columns: opaque binary media + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns beside typed metadata, decoding only inside
Arrow-batched Python workers.  The container has no media libraries,
so the *decode* step is a clearly marked deterministic stub — but all
the Spark-side plumbing is real and tested: binary column handling,
metadata extraction with built-in functions, fixed-size chunking
(frame sampling), and an Arrow-batched ``mapInPandas`` feature
extractor with an explicit output schema.

The driver's testdata has no binary tables, so each query synthesizes
a deterministic blob per document (md5-derived bytes) that DuckDB
reproduces — keeping these entries under the same oracle hash-check
as everything else.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from graphd_spark.inventory import q, _t
from graphd_spark.jexpr import _c, _l
from graphd_spark.inventory_pipeline import _spread


def _with_blob(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 32-byte media blob + media type.

    Stands in for a real binary payload column (image/audio bytes);
    everything downstream treats it as opaque bytes.
    """
    blob_hex = F.concat(
        F.md5(_c("text")), F.md5(F.concat(_c("text"), _l("#")))
    )
    return docs.select(
        "doc_id",
        F.unhex(blob_hex).alias("media"),
        F.element_at(
            F.array(_l("image"), _l("audio"), _l("video")),
            (_c("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


_BLOB_SQL = """
      SELECT doc_id,
             unhex(md5(text) || md5(text || '#')) AS media,
             ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type
      FROM documents
"""


@q(
    "media_metadata",
    f"""
    WITH blobs AS ({_BLOB_SQL})
    SELECT doc_id, media_type,
           CAST(octet_length(media) AS INTEGER) AS n_bytes,
           lower(substr(hex(media), 1, 8)) AS magic
    FROM blobs
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque media bytes — all JVM-side.

    The shape of a real media manifest: content length and leading
    magic bytes come from native binary functions; no Python touches
    the payload.  Scale: pure map-side projection, prunes to the
    binary column only when selected."""
    (docs,) = _t(spark, sf_dir, "documents")
    blobs = _with_blob(docs)
    return blobs.select(
        "doc_id",
        "media_type",
        F.length(_c("media")).cast("int").alias("n_bytes"),
        F.lower(F.hex(F.substring(_c("media"), 1, 4))).alias("magic"),
    )


@q(
    "media_frame_sample",
    f"""
    WITH blobs AS ({_BLOB_SQL})
    SELECT doc_id, frame,
           lower(substr(hex(media), frame * 16 + 1, 16)) AS chunk_hex
    FROM blobs CROSS JOIN (SELECT unnest(range(4)) AS frame) fr
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: fixed-stride slices of the payload.

    The video-pipeline shape — N evenly spaced samples per asset —
    expressed as posexplode over native binary slices.  Scale: output
    rows = N x assets, each carrying only its slice, so downstream
    per-frame work (decode, embed) parallelizes without reshuffling
    whole payloads."""
    (docs,) = _t(spark, sf_dir, "documents")
    blobs = _with_blob(docs)
    # slice per frame: bytes [1+f*8, 8] of the 32-byte payload
    out = blobs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(_l(0), _l(3)),
                lambda i: F.lower(
                    F.hex(F.expr("media").substr(i * 8 + 1, _l(8)))
                ),
            )
        ).alias("frame", "chunk_hex"),
    )
    return out.select(
        "doc_id", _c("frame").cast("bigint").alias("frame"), "chunk_hex"
    )


#: output schema of the stubbed feature extractor
MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
    ]
)


@q(
    "media_features",
    f"""
    WITH blobs AS ({_BLOB_SQL}),
    bytes_tbl AS (
      SELECT doc_id, unnest(range(1, octet_length(media) + 1)) AS pos,
             media
      FROM blobs)
    SELECT b.doc_id,
           CAST(octet_length(min(b.media)) AS INTEGER) AS n_bytes,
           sum(CAST(('0x' || substr(hex(b.media), (pos - 1) * 2 + 1, 2))
                    AS BIGINT)) / octet_length(min(b.media)) AS mean_byte
    FROM bytes_tbl b GROUP BY b.doc_id
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary media (stub decode).

    mapInPandas with an explicit schema: payload bytes stream to the
    Python worker in Arrow batches, features come back columnar.  The
    decode itself is STUBBED — a real deployment runs PIL/torchaudio
    here (not in this container); the batch flow, schema contract and
    per-partition memory shape are the real 100 TB path.  The function
    is a closure so workers need no repo import."""
    (docs,) = _t(spark, sf_dir, "documents")
    # mb_per_slot: the stub decode is cheap per row but pays a real
    # per-partition cost (one Arrow Python worker each), so width
    # follows input bytes — one full batch at toy scale, every core
    # at corpus scale (guide §4.2: keep Arrow batches large)
    blobs = _with_blob(_spread(docs, mb_per_slot=4))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # STUB decoder: deterministic byte statistics stand in for
        # pixel math (media libs absent).  len is a power of two, so
        # the mean is exact in doubles — bit-identical to the oracle.
        # Vectorized per batch (guide §4.2): one concatenated uint8
        # view + offset-sliced reduceat replaces the per-row Python
        # sum() loop; doubles stay exact (byte sums are small ints).
        import numpy as np

        for pdf in batches:
            blobs_col = pdf["media"]
            lens = np.fromiter(
                (len(b) for b in blobs_col), dtype=np.int64, count=len(pdf)
            )
            if len(pdf) and lens.sum():
                flat = np.frombuffer(b"".join(blobs_col), dtype=np.uint8)
                starts = np.zeros(len(lens), dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                sums = np.add.reduceat(flat.astype(np.int64), starts)
                # reduceat folds a zero-length slice into its neighbor;
                # the synthesized blobs are fixed 32 bytes, so guard
                # only for generality
                mean = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
            else:
                mean = np.zeros(len(lens), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": lens.astype("int32"),
                    "mean_byte": mean,
                }
            )

    return blobs.select("doc_id", "media").mapInPandas(
        extract, MEDIA_FEATURE_SCHEMA
    )
