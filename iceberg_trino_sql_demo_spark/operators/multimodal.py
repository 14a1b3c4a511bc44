"""Multimodal-column plumbing (SURVEY.md §7: image/audio/video as opaque
binary columns with typed metadata).

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features, or NotImplementedError for real codecs) — but
everything Spark-side is real and tested: the binary column schema, the
Arrow-batched ``mapInPandas`` pipeline shape, partition-sized batch flow,
and the typed feature output.  Swapping ``_fake_decode`` for PIL/librosa is
a one-function change; the distributed plan is unchanged.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), media
payloads stay opaque bytes end-to-end (never JVM-deserialized into objects),
and feature extraction is embarrassingly parallel over partitions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_trino_sql_demo_spark.operators import register
from iceberg_trino_sql_demo_spark.session import table_path

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "checksum string, width int, height int, feature_norm double"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque-binary media table from documents: payload =
    utf-8 bytes (stands in for jpeg/wav blobs), plus typed metadata — the
    shape a real ingest would produce."""
    d = spark.read.parquet(table_path(sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("content_length"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )


def _fake_decode(media_type: str, payload: bytes) -> dict:
    """STUB for the codec step.  Deterministic: derived from the payload
    bytes only.  A real deployment replaces this body with e.g.::

        if media_type.startswith("image/"):
            img = PIL.Image.open(io.BytesIO(payload))   # not in container
            ...
        raise NotImplementedError(media_type)
    """
    h = hashlib.sha256(payload).hexdigest()
    return {
        "checksum": h[:16],
        "width": int(h[:4], 16) % 1920,
        "height": int(h[4:8], 16) % 1080,
        "feature_norm": int(h[8:16], 16) / 0xFFFFFFFF,
    }


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [_fake_decode(t, bytes(b)) for t, b in zip(pdf["media_type"], pdf["media"])]
        out = pd.DataFrame(feats)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "media_type", pdf["media_type"].values)
        out.insert(2, "n_bytes", [len(bytes(b)) for b in pdf["media"]])
        yield out


@register("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media -> typed features via Arrow-batched mapInPandas.
    Rows-only driver check (the decode stub is engine-specific);
    determinism and schema are asserted in tests/test_extensions.py."""
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "media_type", "media").mapInPandas(
        extract_features, FEATURE_SCHEMA
    )
