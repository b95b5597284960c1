"""Deterministic sampling operators for training-data curation.

Two primitives a 100 TB corpus pipeline needs between filtering and
packing (neither exists in the reference, which curates by hand at
data.frame scale — cf. the corpus assembly in /root/reference/R/dbpedia.R
where inputs arrive pre-selected):

- ``mixture_sample``: re-weight a crawl to a target domain mixture
  (e.g. 30% src-A, 5% src-B) by deterministic Bernoulli thinning.
  Membership is a pure integer predicate on an md5-derived hash — no
  shuffle, no RNG state, reproducible run-to-run and engine-to-engine,
  and the filter sits directly on the parquet scan.
- ``stratified_sample``: EXACTLY k uniformly-chosen docs per stratum.
  Naive row_number() over (partition by stratum) puts an entire stratum
  in one task — a 40%-of-the-crawl source would serialize on one
  executor. The two-level top-k below keeps every window partition
  bounded: per-(stratum, salt) top-k first (salts spread a stratum over
  ``n_salts`` tasks), then top-k of the k*n_salts survivors. The global
  top-k by hash is a subset of the union of per-salt top-ks, so the
  result is bit-identical to the naive single window.

Both use the md5-prefix hash (``dedup._hash64_expr``) so the DuckDB
oracle mirrors them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kgspark.dedup import _hash64_expr

# _hash64_expr yields 8 hex digits => uniform over [0, 2^32).
HASH_SPACE = 1 << 32

# Reference mixture used by the registered query + oracle + bench: a
# 3-tier domain reweighting over the synthetic crawl's 20 sources.
DEMO_WEIGHTS = {
    f"src{i}": (0.8 if i % 3 == 0 else 0.25 if i % 3 == 1 else 0.05)
    for i in range(20)
}


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Keep each row of ``source`` s with probability ``weights[s]``.

    Sources absent from ``weights`` are dropped (weight 0). The keep
    predicate compares the integer hash against a per-source integer
    threshold — no floats anywhere, so no cross-engine ulp risk.
    """
    thresholds = {s: int(w * HASH_SPACE) for s, w in weights.items()}
    thr = F.create_map(
        *[x for s, t in sorted(thresholds.items()) for x in (F.lit(s), F.lit(t))]
    )
    h = _hash64_expr(F.col(id_col).cast("string"))
    return (
        df.withColumn("_thr", thr[F.col(source_col)])
        .filter(F.col("_thr").isNotNull() & (h < F.col("_thr")))
        .drop("_thr")
    )


def uniform_sample(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(n, |df|) rows, uniform over the corpus, deterministic.

    Global top-n by md5 hash: compiles to TakeOrderedAndProject — each
    partition keeps its local top-n and the driver merges, so no global
    sort and no single-partition window. Scale-sane for n into the
    millions; beyond that, thin with ``mixture_sample``-style hash
    thresholds first. Returns (id, rank) with rank 1..n.
    """
    h = _hash64_expr(F.col(id_col).cast("string")).alias("_h")
    picked = df.select(F.col(id_col), h).orderBy("_h", id_col).limit(n)
    # rank assignment runs on <= n rows (one partition of the LIMIT result)
    w = Window.orderBy("_h", id_col)
    return picked.withColumn("rank", F.row_number().over(w)).select(id_col, "rank")


def assign_splits(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one extra column, no
    shuffle, no RNG state. Cumulative INTEGER hash thresholds in the
    dict's insertion order; any hash tail beyond the last threshold
    (fractions summing < 1) falls into the last split.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(fractions)
    h = _hash64_expr(F.col(id_col).cast("string"))
    cum = 0.0
    expr = F.lit(names[-1])
    # build the CASE from the right so earlier splits take precedence
    bounds = []
    for name, frac in fractions.items():
        cum += frac
        bounds.append((name, int(cum * HASH_SPACE)))
    for name, bound in reversed(bounds[:-1]):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    # first split owns [0, bound_0): the when-chain above already orders
    # them, since each earlier bound is smaller
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    stratum_col: str = "source",
    n_salts: int = 16,
) -> DataFrame:
    """Exactly min(k, |stratum|) docs per stratum, uniform + deterministic.

    Selection key is the md5 hash of the id (ties broken by id), so the
    sample is stable under reordering, re-partitioning and engine choice.
    Returns (id, stratum, rank) with rank 1..k within the stratum.
    """
    h = _hash64_expr(F.col(id_col).cast("string")).alias("_h")
    base = df.select(F.col(id_col), F.col(stratum_col), h)

    # level 1: bounded partitions (stratum x salt); a stratum of S rows
    # becomes n_salts partitions of ~S/n_salts rows each.
    salt = (F.col("_h") % n_salts).alias("_salt")
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy("_h", id_col)
    survivors = (
        base.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )

    # level 2: at most k * n_salts rows per stratum reach this window.
    w2 = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(id_col, stratum_col, "rank")
    )
