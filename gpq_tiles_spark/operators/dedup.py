"""Deduplication operators for large-scale training-data pipelines.

North-star extensions (BASELINE.json): exact dedup, MinHash+LSH, SimHash,
n-gram Jaccard. All signature computation runs in Arrow-batched pandas UDFs
(numpy-vectorized per batch); the candidate generation is pure DataFrame
algebra (groupBy/join on band buckets), so the shuffle only ever carries
(bucket_key, doc_id) pairs — never document text — which is what keeps this
viable at 10^12 docs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MERSENNE = (1 << 61) - 1


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: (hash, n_copies, keeper, duplicate_ids).

    Map-side partial aggregation makes this one cheap shuffle of
    (hash, id) pairs.
    """
    h = F.md5(F.col(text_col)).alias("content_hash")
    return (
        df.select(h, F.col(id_col).alias("doc_id"))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper"),
            F.sort_array(F.collect_list("doc_id")).alias("all_ids"),
        )
        .where(F.col("n_copies") > 1)
    )


def _shingle_hashes(texts: pd.Series, k: int = 5) -> list[np.ndarray]:
    """Per doc: unique 64-bit hashes of k-word shingles (vectorized-ish:
    one python loop per doc, numpy for the hash mixing)."""
    from ..kernels.hashes import fmix64

    out = []
    for t in texts:
        words = (t or "").split()
        if len(words) < k:
            shingles = [" ".join(words)] if words else [""]
        else:
            shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        # builtin hash() is salted per-process -> NOT stable; FNV-1a instead
        hs = np.array([_stable_hash64(s) for s in shingles], dtype=np.uint64)
        out.append(np.unique(fmix64(hs)))
    return out


def _stable_hash64(s: str) -> int:
    """FNV-1a 64-bit — process-stable (unlike builtin hash)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFF_FFFF_FFFF_FFFF
    return h


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, shingle_k: int = 5,
                       seed: int = 42) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures."""
    a, b = _minhash_params(num_perm, seed)

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("sig", ArrayType(LongType())),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shingles = _shingle_hashes(pdf[text_col], shingle_k)
            sigs = []
            for hs in shingles:
                if len(hs) == 0:
                    sigs.append([0] * num_perm)
                    continue
                # (num_perm, n_shingles) universal hashing, min per row
                with np.errstate(over="ignore"):
                    vals = (a[:, None] * hs[None, :] + b[:, None]) % np.uint64(_MERSENNE)
                sigs.append(vals.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col].astype(str), "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(compute, schema=schema)


def minhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", num_perm: int = 64,
                            bands: int = 16, shingle_k: int = 5,
                            seed: int = 42) -> DataFrame:
    """LSH banding: docs sharing any band bucket are candidate near-dups.

    Returns (band, bucket_hash, n_docs, doc_ids) for buckets with >= 2 docs.
    The join key is the (band, hash-of-rows) pair; signature arrays never
    shuffle beyond the initial banding projection.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k, seed)
    band_cols = []
    for b in range(bands):
        seg = F.slice("sig", b * rows_per_band + 1, rows_per_band)
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.to_json(seg)).alias("bucket"))
        )
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        exploded.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"),
             F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       seed: int = 42) -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit weighted sums of token hashes."""
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("simhash", LongType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.hashes import fmix64

        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                words = (t or "").split()
                if not words:
                    out.append(0)
                    continue
                hs = fmix64(np.array([_stable_hash64(w) for w in words], dtype=np.uint64))
                bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                sh = int(((v > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
                out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"doc_id": pdf[id_col].astype(str), "simhash": out})

    return df.select(id_col, text_col).mapInPandas(compute, schema=schema)


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dups by SimHash: band the 64 bits into 4 x 16-bit chunks (any
    identical chunk -> candidate, guaranteed to catch hamming <= 3), verify
    pairs by exact hamming distance. Self-join happens only on chunk buckets.
    """
    sigs = simhash_signatures(df, text_col, id_col).cache()
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))

    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.withColumn("hamming", hamming).where(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Character-n-gram Jaccard near-dup: inverted index on rare n-grams ->
    candidate pairs -> exact Jaccard verify. DataFrame-algebra formulation
    (explode + join + agg); exact verify via set sizes."""
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1))),
                    lambda i: F.col(text_col).substr(i, F.lit(n)),
                )
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("n_common")),
        )
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .where(F.col("jaccard") >= threshold)
    )
    return out
