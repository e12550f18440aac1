"""Benchmark decontamination: drop training documents that overlap an
evaluation/benchmark set by shared word n-grams — the standard
train-set hygiene pass (GPT-3 appendix C / PaLM-style n-gram overlap).

100 TB posture: the BENCHMARK side is small (eval sets are MBs), the
corpus side is the 100 TB one. The corpus explodes to distinct n-gram
hashes per document (one shuffle-free projection per row batch), the
benchmark's n-gram hash set rides a broadcast hash join — no shuffle of
the corpus beyond the final per-document hit aggregation, which is a
hash groupBy with map-side combine. Hashing (xxhash64) keeps the join
key 8 bytes regardless of n-gram width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_toolkit_spark.functions.dedup import normalize_text


def _ngram_hashes(col: Column, n: int) -> Column:
    """Distinct xxhash64 values of the normalized word n-grams of col.
    Documents shorter than n words produce an empty array (never null).

    The normalize+split chain is LET-BOUND via a single-element
    transform: a lambda variable is evaluated once per row, whereas an
    expression referenced inside a lambda body is RE-EVALUATED per
    element (and CollapseProject re-inlines any staging projection, so a
    two-step select doesn't help). The original element_at form re-ran
    the full text normalization 8x per gram — 50s -> 0.7s at sf0.1 for
    identical output (r6)."""
    def _body(w: Column) -> Column:
        k = F.size(w) - F.lit(n - 1)
        # sequence(1, 0) yields a DESCENDING [1, 0], not empty — guard
        # short documents explicitly
        idx = F.when(k >= 1, F.sequence(F.lit(1), k)) \
            .otherwise(F.array().cast("array<int>"))
        return F.array_distinct(F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, n)))))

    return F.flatten(F.transform(
        F.array(F.split(normalize_text(col), " ")), _body))


def contamination_report(docs: DataFrame, benchmark: DataFrame,
                         n: int = 8,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         bench_text_col: str | None = None) -> DataFrame:
    """(id_col, n_hits) per contaminated document: how many distinct
    benchmark n-grams the document contains. Documents with zero hits
    are absent from the result."""
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark
        .select(F.explode(_ngram_hashes(F.col(bench_text), n)).alias("_g"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(_ngram_hashes(F.col(text_col), n)).alias("_g"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 8, min_hits: int = 1,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  bench_text_col: str | None = None) -> DataFrame:
    """docs minus documents sharing >= min_hits distinct n-grams with the
    benchmark set (shuffled left_anti on the contamination report).

    The contaminated-id set is NOT broadcast-hinted: its cardinality
    scales with corpus contamination (1% of 10B docs is ~100M ids),
    which as a forced broadcast would be a driver/executor OOM. AQE
    converts the anti-join to a broadcast at runtime when the hit set
    turns out small; otherwise both sides shuffle on id_col only."""
    hits = contamination_report(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col,
        bench_text_col=bench_text_col,
    ).where(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(hits, id_col, "left_anti")
