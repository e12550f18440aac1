"""Deterministic sampling for training-data pipelines.

Random sampling (df.sample) is not reproducible across engines, runs or
partitionings — useless for dataset versioning. These operators derive
keep/split decisions from arithmetic HASHES of a key column, so the
same row lands in the same split everywhere: any engine (the DuckDB
oracle included) computes the identical sample from the identical rows.

All pure Column expressions (JVM-side, whole-stage codegen; zero UDF,
zero shuffle for hash_sample / split; one window shuffle for the
per-group cap — partitioned by the group key, the same shuffle any
per-group limit needs).

Hash: two multiply-mod rounds with an xor-shift between them, all
intermediates bounded below 2^62 — chosen because engines disagree on
int64 overflow (the JVM wraps, DuckDB raises), so a cross-engine-exact
hash must never overflow. The multipliers are odd primes < 2^30; the
mod ring is 2^32. Equidistributes sequential ids (odd multiplier is a
bijection mod 2^32) and mixes high bits into low via the xor-shift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P1 = 1_000_000_007   # odd primes < 2^30: products stay under 2^62
_P2 = 998_244_353
_RING = 1 << 32


def hash_bucket(key: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 2^32) from an integer key column.

    bucket = ((xor(h1, h1 >> 16) * P2) mod 2^32) where
    h1 = ((key mod 2^32) * P1 + salt) mod 2^32 — see module docstring
    for why this shape (cross-engine overflow-free).

    NULL keys hash as 0 (coalesce BEFORE the arithmetic): a null would
    otherwise propagate to a NULL bucket, and a NULL comparison drops
    the row from BOTH sides of a split — silent data loss in an
    'exhaustive' partition (code-review r4). All-null rows land together
    in bucket(0)'s split, deterministically."""
    h0 = F.pmod(F.coalesce(key.cast("long"), F.lit(0)), F.lit(_RING))
    h1 = F.pmod(h0 * F.lit(_P1) + F.lit(int(salt)), F.lit(_RING))
    mixed = h1.bitwiseXOR(F.shiftrightunsigned(h1, 16))
    return F.pmod(mixed * F.lit(_P2), F.lit(_RING))


_INT_TYPES = ("bigint", "int", "smallint", "tinyint")


def _require_int_key(df: DataFrame, key: str) -> None:
    """String keys would cast('long') -> NULL -> coalesce -> bucket 0
    for EVERY row — an all-or-nothing 'sample' with no error. Integral
    keys only; hash string identities upstream (e.g. a stable doc id),
    or xxhash-style them yourself — no string hash exists that this
    module could mirror exactly in the ANSI-SQL oracle.

    Lookup mirrors Spark's default case-insensitive resolution (F.col
    resolves 'DOC_ID' to doc_id; a case-exact dict check would reject
    names the expression itself accepts — code-review r4)."""
    dtypes = dict(df.dtypes)
    t = dtypes.get(key)
    if t is None:
        hits = [ty for name, ty in dtypes.items()
                if name.lower() == key.lower()]
        if len(hits) == 1:
            t = hits[0]
    if t is None:
        raise ValueError(f"key column {key!r} not in dataframe")
    if t not in _INT_TYPES:
        raise TypeError(
            f"sampling key {key!r} has type {t!r}; integral keys only "
            "(a string key would silently hash every row to bucket 0)")


def hash_sample(df: DataFrame, key: str, fraction: float,
                salt: int = 0) -> DataFrame:
    """Keep ~fraction of rows, decided by the key's hash bucket —
    reproducible across runs, engines and partitionings, and CONSISTENT:
    the sample at 10% is a subset of the sample at 20% (same salt)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    _require_int_key(df, key)
    cut = int(fraction * _RING)
    return df.where(hash_bucket(F.col(key), salt) < F.lit(cut))


def train_test_split(df: DataFrame, key: str, test_fraction: float,
                     salt: int = 0) -> tuple[DataFrame, DataFrame]:
    """(train, test) partition of df by key hash — disjoint, exhaustive,
    stable under appends: a row's split never changes as the dataset
    grows (the property random splits lack)."""
    if not 0.0 < test_fraction < 1.0:
        raise ValueError(
            f"test_fraction must be in (0, 1), got {test_fraction}")
    _require_int_key(df, key)
    cut = int(test_fraction * _RING)
    b = hash_bucket(F.col(key), salt)
    return df.where(b >= F.lit(cut)), df.where(b < F.lit(cut))


def mixture_plan(counts: dict, weights: dict[str, int]) -> dict:
    """Per-group hash-bucket cutoffs realizing a target domain mixture.

    Given per-group row counts and positive INTEGER target weights,
    returns {group: cut} such that keeping rows with
    hash_bucket(key) < cut yields the LARGEST corpus whose composition
    matches weights (down-sampling only — the binding group, the one
    with the smallest count/weight ratio, keeps everything; every other
    group keeps ~w_g/w_binding of the binding group's count, off by at
    most the floor rounding of the cut).

    All-integer arithmetic: cut = w_g * c_b * 2^32 // (w_b * c_g) — no
    float in the cut itself, so a SQL oracle computes the identical
    sample. The binding group is chosen by (count/weight, group) order;
    the float ratio appears ONLY in that argmin, where a rounding tie
    falls to the group-name tiebreak identically in every engine."""
    bad = [g for g, w in weights.items()
           if not isinstance(w, int) or isinstance(w, bool) or w <= 0]
    if bad:
        raise ValueError(
            f"weights must be positive ints (exact cross-engine "
            f"arithmetic), got {bad}")
    empty = [g for g in weights if counts.get(g, 0) <= 0]
    if empty:
        raise ValueError(
            f"mixture groups with no rows: {empty} — the target mixture "
            "is unreachable (remove them or fix the group column)")
    binding = min(weights, key=lambda g: (counts[g] / weights[g], g))
    cb, wb = counts[binding], weights[binding]
    return {g: (weights[g] * cb * _RING) // (wb * counts[g])
            for g in weights}


def mixture_sample(df: DataFrame, group: str, key: str,
                   weights: dict[str, int], salt: int = 0) -> DataFrame:
    """Down-sample each domain to a target mixture — the data-mixing
    step of pretraining corpus assembly (e.g. 5:3:2 web:code:books).
    Groups absent from `weights` are dropped (weight zero).

    Deterministic and append-stable per row (same hash discipline as
    hash_sample: a kept row stays kept as other groups grow, until the
    plan is recomputed). One map-side-combined groupBy count job sizes
    the plan (O(#groups) driver state — mixture weights are config,
    inherently driver-bounded); the sample itself is a pure codegen'd
    Column filter, zero extra shuffle."""
    _require_int_key(df, key)
    if group not in df.columns:
        raise ValueError(f"group column {group!r} not in dataframe")
    counts = {
        r["g"]: r["n"]
        for r in df.where(F.col(group).isin(list(weights)))
        .groupBy(F.col(group).alias("g")).agg(F.count("*").alias("n"))
        .collect()
    }
    cuts = mixture_plan(counts, weights)
    cut_expr = None
    for g, cut in cuts.items():
        w = F.when(F.col(group) == g, F.lit(cut))
        cut_expr = w if cut_expr is None else cut_expr.when(
            F.col(group) == g, F.lit(cut))
    # unweighted groups: cut_expr is NULL -> comparison NULL -> dropped
    return df.where(hash_bucket(F.col(key), salt) < cut_expr)


def cap_per_group(df: DataFrame, group: str, order: str, n: int) -> DataFrame:
    """At most n rows per group, keeping the FIRST n by `order` — the
    source-capping step of corpus curation (one mega-source must not
    dominate the training mix). One window shuffle on the group key;
    deterministic because the order column must be unique per group
    (enforce upstream: (source, doc_id) is)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    rn = "_rn"
    while rn in df.columns:  # never clobber a user column (code-review r4)
        rn += "_"
    w = Window.partitionBy(group).orderBy(F.col(order).asc())
    return (
        df.withColumn(rn, F.row_number().over(w))
        .where(F.col(rn) <= n)
        .drop(rn)
    )
