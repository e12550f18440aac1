"""Text analysis over the documents table: language-ID, quality scoring,
token counting, fingerprinting.

Every function returns a Column (composable) or a DataFrame query. The
SQL-oracle-checked ones use only engine-portable primitives (literal
`replace`, `length`, `sha2`) so DuckDB reproduces them exactly; the
rolling-hash fingerprint is numpy-vectorized (pandas UDF) and checked by a
python oracle in tests instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# language marker words: counted via literal replace (no regex — identical
# semantics in Spark and DuckDB). Space-padded to approximate word matches.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is "],
    "de": [" der ", " und ", " die ", " ist "],
    "fr": [" le ", " et ", " les ", " est "],
    "es": [" el ", " que ", " los ", " es "],
}
CJK_MARKERS = ["的", "是", "在", "了"]


def occurrences(col: Column, needle: str) -> Column:
    """# of occurrences of a literal substring (portable: length/replace)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_scores(col: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    scores = {
        lang: sum(occurrences(padded, m) for m in markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    scores["zh"] = sum(occurrences(col, m) for m in CJK_MARKERS).alias("score_zh")
    return scores


def lang_id(col: Column) -> Column:
    """Marker-count language id with fixed tie-break order (en,de,fr,es,zh)."""
    s = lang_scores(col)
    order = ["en", "de", "fr", "es", "zh"]
    best = s[order[0]]
    for lang in order[1:]:
        best = F.greatest(best, s[lang])
    expr = F.when(best <= 0, F.lit("und"))
    for lang in order:
        expr = expr.when(s[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def token_count(col: Column) -> Column:
    """Whitespace token count; '' and all-space -> 0 (portable semantics)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


# punctuation counted one literal char at a time — locale/regex-free
_PUNCT = list(".,;:!?'\"()[]{}")


def quality_features(col: Column) -> dict[str, Column]:
    n = F.length(col)
    punct = sum(occurrences(col, p) for p in _PUNCT)
    spaces = occurrences(col, " ")
    return {
        "n_chars_q": n.cast("long").alias("n_chars_q"),
        "n_tokens": token_count(col).cast("long").alias("n_tokens"),
        "punct_ratio": (punct / F.greatest(n, F.lit(1))).alias("punct_ratio"),
        "space_ratio": (spaces / F.greatest(n, F.lit(1))).alias("space_ratio"),
    }


def quality_score(col: Column) -> Column:
    """Deterministic 0-100 heuristic: favors mid-length, punctuated,
    space-separated text (web-pipeline quality gate shape)."""
    f = quality_features(col)
    n = F.length(col).cast("double")
    len_score = F.least(n / 500.0, F.lit(1.0)) * 40.0
    punct_score = F.least(f["punct_ratio"] * 400.0, F.lit(30.0))
    space_score = F.least(f["space_ratio"] * 150.0, F.lit(30.0))
    return F.round(len_score + punct_score + space_score, 4)


def fingerprint_sha256(col: Column) -> Column:
    """Content fingerprint = sha256 hex of the UTF-8 bytes (oracle: DuckDB
    sha256(text))."""
    return F.sha2(col.cast("binary"), 256)


_MOD = np.uint64(0xFFFFFFFFFFFFFFC5)  # largest 64-bit prime
_BASE = np.uint64(1099511628211)


@F.pandas_udf(LongType())
def rolling_hash(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash of the whole document (vectorized per batch).

    FNV-ish base/modulus; stable across runs/partitions. Python oracle in
    tests (not SQL-expressible portably)."""
    from parquet_toolkit_spark.runtime import tune_malloc

    tune_malloc()
    out = np.zeros(len(texts), dtype=np.uint64)
    data = texts.fillna("").astype(str)
    offset = np.uint64(14695981039346656037)
    with np.errstate(over="ignore"):
        for i, t in enumerate(data):
            raw = t.encode("utf-8", "surrogatepass")
            seg = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
            n = len(seg)
            if n == 0:
                out[i] = offset
                continue
            # closed form of Horner: h = offset*B^n + sum b_j * B^(n-1-j),
            # all mod 2^64 (numpy uint64 wraparound)
            pw = np.full(n, _BASE, dtype=np.uint64)
            pw[0] = 1
            np.cumprod(pw, out=pw)  # B^0 .. B^(n-1)
            out[i] = offset * pw[-1] * _BASE + np.sum(seg * pw[::-1], dtype=np.uint64)
    return pd.Series(out.view(np.int64))
