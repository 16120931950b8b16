"""Text analysis operators for training-data pipelines.

[north-star training-data ops]: language-ID (n-gram/stopword heuristic),
quality scoring, token counting (whitespace + BPE-ish regex), and rolling-
hash document fingerprinting. Everything cheap stays as Catalyst expressions
(codegen); only the rolling hash needs an Arrow batch UDF.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def _count_occurrences(col: Column, needle: str) -> Column:
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def whitespace_token_count(col: Column) -> Column:
    """Exact whitespace token count (single-space-delimited corpora)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(" "), F.lit(""))) + 1).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-style proxy: split on word boundaries/punctuation like a GPT-2-ish
    pre-tokenizer; counts regex tokens (letters runs, digit runs, punct)."""
    return F.size(
        F.filter(
            F.split(col, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
            lambda t: F.length(F.trim(t)) > 0,
        )
    ).cast("long")


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc stopword-hit score per language; argmax = predicted lang."""
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = []
    for lang, words in _STOPWORDS.items():
        s = None
        for w in words:
            c = _count_occurrences(padded, f" {w} ")
            s = c if s is None else s + c
        scores.append(F.struct(s.cast("double").alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn("lang_scores", F.array(*scores)).withColumn(
        "predicted_lang", best["lang"]
    ).withColumn("lang_score", best["score"])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-density features + composite score."""
    col = F.col(text_col)
    n_chars = F.length(col)
    n_tokens = whitespace_token_count(col)
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    stop_hits = None
    for w in _STOPWORDS["en"]:
        c = _count_occurrences(padded, f" {w} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    punct = (
        _count_occurrences(col, ".")
        + _count_occurrences(col, ",")
        + _count_occurrences(col, "!")
        + _count_occurrences(col, "?")
    )
    mean_token_len = (n_chars - n_tokens + 1) / n_tokens
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_hits / n_tokens * 5.0, F.lit(1.0)) * 0.4
        + F.when((mean_token_len >= 3) & (mean_token_len <= 10), 0.2).otherwise(0.0)
    )
    return (
        df.withColumn("n_chars_q", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens)
        .withColumn("stopword_hits", stop_hits.cast("double"))
        .withColumn("punct_count", punct.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


def rolling_fingerprints(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", window: int = 32,
                         keep_mod: int = 16) -> DataFrame:
    """Winnowing-style document fingerprints: Rabin-Karp rolling hash over
    byte windows, keep hashes == 0 (mod keep_mod) -> (doc_id, fingerprint).

    Vectorized: the rolling hash for all positions of a doc is computed with
    one cumulative numpy pass (no per-byte Python).
    """
    B = np.uint64(257)
    MOD_MASK = np.uint64(0xFFFF_FFFF_FFFF_FFFF)
    # precompute B^window
    bw = np.uint64(1)
    for _ in range(window):
        bw = np.uint64((int(bw) * int(B)) & 0xFFFF_FFFF_FFFF_FFFF)

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("fingerprint", LongType()),
        ]
    )

    # B is odd -> invertible mod 2^64; Newton iteration for the inverse
    binv = int(B)
    for _ in range(6):
        binv = (binv * (2 - int(B) * binv)) & 0xFFFF_FFFF_FFFF_FFFF
    BINV = np.uint64(binv)

    def _roll_hashes(arr: np.ndarray) -> np.ndarray:
        """All window hashes h_i = sum_j arr[i+j] * B^(w-1-j)  (mod 2^64),
        computed with two wrapping cumprods + one cumsum — zero per-byte
        Python. Derivation: h_i = B^(i+w-1) * (P_{i+w} - P_i) where
        P_k = sum_{j<k} arr[j] * B^-j."""
        n = len(arr)
        with np.errstate(over="ignore"):
            binv_pow = np.ones(n + 1, dtype=np.uint64)
            binv_pow[1:] = BINV
            binv_pow = np.cumprod(binv_pow)          # B^-j, wrapping
            terms = arr * binv_pow[:n]
            P = np.zeros(n + 1, dtype=np.uint64)
            np.cumsum(terms, out=P[1:])              # wrapping cumsum
            diffs = P[window:] - P[:-window]         # P_{i+w} - P_i
            b_pow = np.ones(n - window + 1, dtype=np.uint64)
            b_pow[0] = np.uint64(1)
            if len(b_pow) > 1:
                b_pow[1:] = B
                b_pow = np.cumprod(b_pow)
            # scale by B^(w-1) once, then by B^i per position
            scale0 = np.uint64(1)
            for _ in range(window - 1):
                scale0 = np.uint64((int(scale0) * int(B)) & 0xFFFF_FFFF_FFFF_FFFF)
            return diffs * b_pow * scale0

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, fps_out = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = (text or "").encode("utf-8")
                if len(data) < window:
                    continue
                arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
                hashes = _roll_hashes(arr)
                sel = hashes % np.uint64(keep_mod) == 0
                for v in np.unique(hashes[sel]):
                    ids_out.append(doc_id)
                    fps_out.append(int(v) - (1 << 64) if int(v) >= (1 << 63) else int(v))
            yield pd.DataFrame({"doc_id": ids_out, "fingerprint": fps_out})

    return df.select(id_col, text_col).mapInPandas(fp, schema=schema)
