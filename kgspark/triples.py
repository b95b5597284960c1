"""Stage 8 — (subj, pred, obj) triple materialization.

The reference writes annotations back into XML/TEI (``R/xml.R:30-209``) or a
corpus view (``R/utils.R:129-167``); a KG-construction engine's terminal
artifact is the graph itself. From the canonicalized annotation table we
emit a deterministic triple set and write it partitioned by predicate,
repartitioned by a salted subject hash — predicates have few distinct
values (partition pruning on read) while subjects are the head-entity skew
axis (a handful of URIs dominate mentions), so the salt spreads writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRED_MENTIONED_IN = "kg:mentionedIn"
PRED_ANCHOR_OF = "kg:anchorOf"
PRED_TYPE = "rdf:type"
PRED_SAME_AS = "owl:sameAs"
PRED_CATEGORY = "kg:category"


def mentions_to_triples(m: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """Canonical mentions -> distinct (subj, pred, obj).

    The distinct is a shuffle on (subj, pred, obj) — the full key, so head
    subjects alone do not skew it badly, and AQE skew handling covers the
    rest. Partial aggregation (map-side combine) applies automatically.
    """
    subj = F.col("canonical_uri")
    doc = F.col(doc_col).cast("string")
    parts = [
        m.select(subj.alias("subj"), F.lit(PRED_MENTIONED_IN).alias("pred"), doc.alias("obj")),
        m.select(subj.alias("subj"), F.lit(PRED_ANCHOR_OF).alias("pred"), F.col("text").alias("obj")),
        m.filter(F.col("types").isNotNull()).select(
            subj.alias("subj"),
            F.lit(PRED_TYPE).alias("pred"),
            F.explode(F.coalesce(F.col("types")["DBpedia"], F.array())).alias("obj"),
        ).withColumn("obj", F.concat(F.lit("dbo:"), F.col("obj"))),
        m.filter(F.col("wikidata_uri").isNotNull()).select(
            subj.alias("subj"), F.lit(PRED_SAME_AS).alias("pred"), F.col("wikidata_uri").alias("obj")
        ),
    ]
    if "category" in m.columns:
        parts.append(
            m.filter(F.col("category").isNotNull()).select(
                subj.alias("subj"), F.lit(PRED_CATEGORY).alias("pred"), F.col("category").alias("obj")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def write_triples(
    triples: DataFrame, path: str, salt_buckets: int = 64, fmt: str = "parquet"
) -> None:
    """Partitioned graph-table write.

    Production target is Iceberg (``.writeTo(...).partitionedBy(pred,
    bucket(N, subj))``); this container has no Iceberg runtime jar, so we
    write directory-partitioned parquet with the same layout: partition by
    pred, bucket-salt by subj hash.
    """
    (
        triples.repartition(
            salt_buckets, F.col("pred"), F.pmod(F.xxhash64("subj"), F.lit(salt_buckets))
        )
        .write.mode("overwrite")
        .partitionBy("pred")
        .format(fmt)
        .save(path)
    )
