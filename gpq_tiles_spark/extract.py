"""Span -> geometry feature extraction (Arrow-batched, mapInPandas).

Input per BASELINE.json ``input_hint``: (doc_id: string, spans:
array<struct<kind, text, media_ref, offset>>). Every span with kind='geo'
carries one OGC WKT geometry in ``text`` and yields one feature; all other
spans are payload that must survive untouched (per-row span-sequence
equality is the invariant checked in tests/test_extract.py).

feature_id modes:
* 'hash' (default, shuffle-free): fmix64(xxh64(doc_id) XOR offset) — stable
  across retries and partitionings; the right choice at 10^12 docs where a
  global row_number would force a full sort before any work starts.
* 'rownum': dense row_number over (doc_id, offset) — matches FIXTURES.md's
  oracle convention; costs one global sort, used for small-scale
  DuckDB-oracle comparisons.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .kernels import geom as G
from .kernels.hashes import fmix64_scalar, xxh64

FEATURES_SCHEMA = StructType(
    [
        StructField("feature_id", LongType(), False),
        StructField("doc_id", StringType(), False),
        StructField("span_offset", IntegerType(), False),
        StructField("wkb", BinaryType(), False),
        StructField("geom_type", IntegerType(), False),
        StructField("lng_min", DoubleType(), False),
        StructField("lat_min", DoubleType(), False),
        StructField("lng_max", DoubleType(), False),
        StructField("lat_max", DoubleType(), False),
    ]
)


def _hash_feature_id(doc_id: str, offset: int, part: int = 0) -> int:
    """part > 0 distinguishes the flattened parts of a GeometryCollection
    span; part=0 keeps pre-collection hash values byte-stable."""
    h = xxh64(doc_id.encode("utf-8")) ^ (offset & 0xFFFF_FFFF_FFFF_FFFF)
    if part:
        h ^= (part * 0x9E3779B97F4A7C15) & 0xFFFF_FFFF_FFFF_FFFF
    return fmix64_scalar(h) & 0x7FFF_FFFF_FFFF_FFFF  # Spark LongType range


def _span_field(span, name: str):
    # spans arrive as dicts (Arrow) or Row objects depending on codepath
    if isinstance(span, dict):
        return span[name]
    return getattr(span, name)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in (
            "feature_id", "doc_id", "span_offset", "wkb", "geom_type",
            "lng_min", "lat_min", "lng_max", "lat_max",
        )}
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            if spans is None:
                continue
            for span in spans:
                if _span_field(span, "kind") != "geo":
                    continue
                off = int(_span_field(span, "offset"))
                try:
                    g = G.from_wkt(_span_field(span, "text"))
                except (ValueError, IndexError):
                    continue  # malformed geometry span -> skipped, not fatal
                # GeometryCollection spans flatten to one feature per part
                # (MVT features are single-typed); others pass through as-is
                for part, pg in enumerate(G.flatten(g)):
                    x0, y0, x1, y1 = G.bbox(pg)
                    out["feature_id"].append(_hash_feature_id(doc_id, off, part))
                    out["doc_id"].append(doc_id)
                    out["span_offset"].append(off)
                    out["wkb"].append(G.to_wkb(pg))
                    out["geom_type"].append(pg[0])
                    out["lng_min"].append(x0)
                    out["lat_min"].append(y0)
                    out["lng_max"].append(x1)
                    out["lat_max"].append(y1)
        yield pd.DataFrame(out)


def extract_features(docs: DataFrame, feature_id_mode: str = "hash") -> DataFrame:
    """documents(doc_id, spans) -> features DataFrame (FEATURES_SCHEMA).

    The WKT parse + WKB encode runs once per geo span inside Arrow batches;
    downstream tiling never re-parses text.
    """
    feats = docs.select("doc_id", "spans").mapInPandas(
        _extract_batches, schema=FEATURES_SCHEMA
    )
    if feature_id_mode == "rownum":
        from pyspark.sql import Window

        w = Window.orderBy("doc_id", "span_offset")
        feats = feats.withColumn("feature_id", F.row_number().over(w).cast("long"))
    elif feature_id_mode != "hash":
        raise ValueError(f"unknown feature_id_mode {feature_id_mode!r}")
    return feats


def span_sequences(docs: DataFrame) -> DataFrame:
    """(doc_id, kind, text, media_ref, offset) exploded in offset order —
    used to assert the per-row span-sequence-equality invariant."""
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
        .orderBy("doc_id", "offset")
    )
