"""Extraction + span-sequence-equality invariant (BASELINE.json input_hint)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from gpq_tiles_spark.extract import extract_features, span_sequences
from gpq_tiles_spark.fixtures import generate_documents
from gpq_tiles_spark.kernels import geom as G


def test_fixture_deterministic():
    a = generate_documents(50, seed=42)
    b = generate_documents(50, seed=42)
    assert a.equals(b)
    c = generate_documents(50, seed=43)
    assert not a.equals(c)


def test_span_sequence_equality_through_spark(spark, docs_table):
    """Per-row invariant vs the reference: reading the table through Spark and
    exploding spans reproduces exactly the (kind, text, media_ref) sequence in
    offset order that the generator wrote."""
    raw = pq.read_table(docs_table)
    expected = {}
    for doc_id, spans in zip(raw["doc_id"].to_pylist(), raw["spans"].to_pylist()):
        expected[doc_id] = [
            (s["kind"], s["text"], s["media_ref"]) for s in sorted(spans, key=lambda s: s["offset"])
        ]

    df = spark.read.parquet(docs_table)
    got = {}
    for row in span_sequences(df).collect():
        got.setdefault(row.doc_id, []).append((row.kind, row.text, row.media_ref))

    assert got == expected


def test_extract_features_hash_mode(spark, docs_table):
    raw = pq.read_table(docs_table)
    n_geo = sum(
        1 for spans in raw["spans"].to_pylist() for s in spans if s["kind"] == "geo"
    )
    df = spark.read.parquet(docs_table)
    feats = extract_features(df).collect()
    assert len(feats) == n_geo
    # feature ids are unique + stable across runs
    ids1 = sorted(f.feature_id for f in feats)
    assert len(set(ids1)) == len(ids1)
    feats2 = extract_features(spark.read.parquet(docs_table)).collect()
    assert sorted(f.feature_id for f in feats2) == ids1
    # wkb decodes and bbox matches
    f = feats[0]
    g = G.from_wkb(bytes(f.wkb))
    x0, y0, x1, y1 = G.bbox(g)
    assert (x0, y0, x1, y1) == (f.lng_min, f.lat_min, f.lng_max, f.lat_max)


def test_extract_features_rownum_mode(spark, docs_table):
    df = spark.read.parquet(docs_table)
    feats = extract_features(df, feature_id_mode="rownum").collect()
    ids = sorted(f.feature_id for f in feats)
    assert ids == list(range(1, len(feats) + 1))
