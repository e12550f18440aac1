"""Deduplication family over the documents table.

  exact_dedup          sha256 hash-groupBy (SQL-oracle-checked)
  normalized_dedup     case/punct-normalized exact dedup (SQL-oracle-checked)
  minhash_lsh_pairs    shingle -> minhash -> band -> bucket-join candidates,
                       verified with exact Jaccard (rows-only check + python
                       oracle in tests: hash functions aren't portable SQL)
  simhash64            64-bit simhash via one vectorized pandas UDF
  ngram_jaccard_pairs  exact n-gram Jaccard on candidate pairs

Scale notes (100 TB): every step is a shuffle-bounded DataFrame op —
explode->groupBy for signatures (map-side combine applies), bucket-join for
candidates (no cross join), exact verify only on candidates. Signature
width k and band count are the recall/cost dials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# ----------------------------------------------------------- exact / norm


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: keeper id + group size."""
    h = F.sha2(F.col(text_col).cast("binary"), 256).alias("content_sha")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_sha")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
    )


def normalize_text(col: Column) -> Column:
    """Lower-case, collapse whitespace runs, strip common punctuation —
    the classic near-exact normalization pass."""
    x = F.lower(col)
    for p in list(".,;:!?'\"()"):
        x = F.replace(x, F.lit(p), F.lit(""))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def normalized_dedup(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    n = normalize_text(F.col(text_col)).alias("norm")
    return (
        df.select(n, F.col(id_col))
        .groupBy("norm")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dupes"))
        .select(F.sha2(F.col("norm").cast("binary"), 256).alias("norm_sha"),
                "keep_id", "n_dupes")
    )


# ----------------------------------------------------------- minhash LSH


def _shingles(text_col: str, n: int) -> Column:
    """Distinct word n-gram shingles (JVM-side: split + transform + concat)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    nw = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(nw - n, F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )
    return F.when(nw >= n, F.array_distinct(gram)).otherwise(F.array())


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 16,
                       shingle_n: int = 3) -> DataFrame:
    """k minhash values per doc: explode shingles, k seeded xxhash64 mins.

    One shuffle (groupBy id); partial aggregation (min) combines map-side.
    """
    sh = df.select(F.col(id_col), F.explode(_shingles(text_col, shingle_n)).alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh{i}") for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 16, bands: int = 4,
                      shingle_n: int = 3, threshold: float = 0.7) -> DataFrame:
    """Candidate pairs from LSH banding, verified with exact Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    sigs = minhash_signatures(df, text_col, id_col, k, shingle_n)
    r = k // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * r + j}") for j in range(r)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sigs.select(id_col, *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("h"))
            for b in range(bands)
        ])).alias("bh"),
    ).select(id_col, "bh.b", "bh.h")
    a = stacked.alias("a")
    b = stacked.alias("b")
    cand = (
        a.join(b, (F.col("a.b") == F.col("b.b")) & (F.col("a.h") == F.col("b.h"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    shing = df.select(F.col(id_col), _shingles(text_col, shingle_n).alias("sh"))
    cand = (
        cand.join(shing.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(shing.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter / F.greatest(union, F.lit(1))).alias("jaccard")
    return (
        cand.select("id_a", "id_b", jac)
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5,
                        prefix_chars: int = 32) -> DataFrame:
    """Exact word-n-gram Jaccard over prefix-blocked candidate pairs.

    Blocking on the first `prefix_chars` chars keeps the join equi-key
    (SQL-expressible; no quadratic blowup on distinct prefixes)."""
    shing = df.select(
        F.col(id_col),
        F.substring(F.col(text_col), 1, prefix_chars).alias("pfx"),
        _shingles(text_col, shingle_n).alias("sh"),
    )
    a, b = shing.alias("a"), shing.alias("b")
    pairs = a.join(
        b, (F.col("a.pfx") == F.col("b.pfx"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        ).where(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------- simhash

_FNV_BASE = np.uint64(1099511628211)
_FNV_OFF = np.uint64(14695981039346656037)


def _fnv1a_tokens(tokens: list[str]) -> np.ndarray:
    """Vectorized FNV-1a over a token list (padded byte matrix)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    bs = [t.encode("utf-8", "surrogatepass")[:32] for t in tokens]
    maxlen = max(len(x) for x in bs)
    mat = np.zeros((len(bs), max(1, maxlen)), dtype=np.uint8)
    lens = np.zeros(len(bs), dtype=np.int64)
    for i, x in enumerate(bs):
        mat[i, : len(x)] = np.frombuffer(x, dtype=np.uint8)
        lens[i] = len(x)
    h = np.full(len(bs), _FNV_OFF, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            active = lens > j
            h[active] = (h[active] ^ mat[active, j].astype(np.uint64)) * _FNV_BASE
    return h


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit simhash of whitespace tokens, one Arrow batch at a time."""
    from parquet_toolkit_spark.runtime import tune_malloc

    tune_malloc()
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts.fillna("")):
            toks = t.split()
            h = _fnv1a_tokens(toks)
            if len(h) == 0:
                out[i] = 0
                continue
            bits = ((h[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits(
                (votes > 0).astype(np.uint8), bitorder="little"
            ).view(np.uint64)[0]
    return pd.Series(out.view(np.int64))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on 16-bit chunks.

    A pair within hamming<=3 shares at least one of the four 16-bit chunks
    (pigeonhole) — the classic scalable simhash join: equi-join per chunk,
    never a cross join."""
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("sh"))
    chunks = sh.select(
        id_col, "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("c"),
                F.shiftright("sh", 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("ck"),
            )
            for c in range(4)
        ])).alias("x"),
    ).select(id_col, "sh", "x.c", "x.ck")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.ck") == F.col("b.ck"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return cand.select("id_a", "id_b", ham).where(F.col("hamming") <= max_hamming)
