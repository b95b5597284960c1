"""End-to-end KG-construction pipeline (SURVEY.md §7 stage order).

documents(url, warc_ts, html, text, lang)
  -> extract (html -> text, byte-identical invariant)
  -> segment (overlap windows + precomputed stitch bounds; skew breaking)
  -> spot (vectorized flat matcher, batch pandas UDF)
  -> stitch (pure filter)
  -> link (candidates x broadcast lexicon; prior + context scoring; top-1)
  -> overlaps (detect/categorize/resolve — doc-local windows)
  -> entity types (T2 expression)
  -> canonicalize (broadcast redirect/sameAs dims)
  -> triples (distinct + partitioned write)

Shuffle census of the whole plan: ONE doc-keyed exchange shared by the
top-1 link aggregation and the entire overlap window family
(HashPartitioning(doc_id) satisfies both clustered distributions —
disambig.disambiguate(partition_by_doc=True)), one distinct for the
triple set, plus the final write repartition. Everything else is narrow.
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgspark import canonicalize as canon
from kgspark import disambig, entity_types, overlaps, segment, spot, triples
from kgspark.automaton import write_lexicon_artifact
from kgspark.extract import extract_text
from kgspark.lineage import StageRunner, _hadoop_fs


@dataclass
class PipelineConfig:
    max_len: int = 7990            # R/dbpedia.R:363 (escaped-length threshold)
    overlap: int = 500             # R/dbpedia.R:364
    confidence: float = 0.35       # R/dbpedia.R:366
    min_support: int = 20          # R/dbpedia.R:372
    types: list[str] | None = None # D6 restriction
    keep: list[str] = field(default_factory=lambda: ["longest", "shortest", "multiple"])
    omit: list[str] | None = None
    tiebreak: str = "first"
    mapping: list[tuple[str, str]] = field(
        default_factory=lambda: [
            ("PERSON", "DBpedia:Person"),
            ("ORGANIZATION", "DBpedia:Organisation"),
            ("LOCATION", "DBpedia:Place"),
        ]
    )
    checkpoint_root: str | None = None
    use_html: bool = True          # extract text from html (else trust text col)
    rebalance_segments: bool = False  # salted shuffle after explode: enable
                                      # when the crawl has giant documents
    lexicon_artifact: str | None = None  # where the surface-form artifact is
                                         # written (must be executor-reachable
                                         # — shared FS on a real cluster);
                                         # default: <checkpoint_root>/_lexicon
                                         # or a local tempdir
    redirects_preclosed: bool = False    # True when the redirects dim is the
                                         # output of write_closed_redirects
                                         # (the production setup — closure is
                                         # an offline dim-build step)
    partition_by_doc: bool = True        # explicit repartition(doc_id) before
                                         # the top-1 agg so ONE exchange serves
                                         # link + the overlap window family.
                                         # A/B'd at the driver bench yardstick
                                         # (local[32], 20k docs, warm pass +
                                         # min-of-2, scripts/
                                         # ab_partition_by_doc.py): one
                                         # exchange 9.19 s vs two exchanges
                                         # 11.56 s — the round-4 "regression"
                                         # was host contention + cold python
                                         # workers, not the plan (see
                                         # BENCH/BASELINE.md A/B table).


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    lexicon: DataFrame,
    redirects: DataFrame,
    sameas: DataFrame,
    cfg: PipelineConfig | None = None,
    doc_col: str = "url",
) -> dict[str, DataFrame]:
    cfg = cfg or PipelineConfig()
    runner = StageRunner(spark, cfg.checkpoint_root)

    # No driver collect, no pickled-automaton broadcast: the distinct
    # surface forms are written as a parquet artifact (distributed write)
    # and each python worker builds + caches the automaton locally
    # (kgspark.automaton.load_automaton_from_artifact). An explicitly
    # configured artifact that is already complete (_SUCCESS) is reused —
    # the production setup writes it once per lexicon refresh, like the
    # pre-closed redirects dim.
    if cfg.lexicon_artifact:
        artifact = cfg.lexicon_artifact
    elif cfg.checkpoint_root:
        artifact = cfg.checkpoint_root.rstrip("/") + "/_lexicon_forms"
    elif spark.sparkContext.master.startswith("local"):
        artifact = tempfile.mkdtemp(prefix="kgspark-lexicon-")
    else:
        # A driver-local tempdir is not executor-reachable on a real
        # cluster — spotting workers could never read the artifact.
        raise ValueError(
            "run_pipeline on a non-local master needs lexicon_artifact or "
            "checkpoint_root on a shared filesystem (HDFS/S3A/...)"
        )
    # Probe _SUCCESS through the Hadoop FileSystem API (not os.path), so
    # reuse works when the artifact lives on HDFS/S3A.
    fs, success = _hadoop_fs(spark, artifact.rstrip("/") + "/_SUCCESS")
    if cfg.lexicon_artifact and fs.exists(success):
        automaton_src = artifact
    else:
        automaton_src = write_lexicon_artifact(lexicon, artifact)

    # No cache on the extract stage: since the doc-token carry moved to
    # the segment stage (doc_tokens ride the segment rows), the extracted
    # docs have exactly ONE consumer — the segment UDF — so persisting
    # them only paid an InMemoryRelation write+read per action. The raw
    # html is dropped right after extraction: nothing downstream reads it.
    docs = runner.run(
        "extract",
        lambda: (
            extract_text(documents).drop("html") if cfg.use_html else documents
        ),
    )

    # doc_tokens ride along from here (narrow carry): the disambiguation
    # context join would otherwise re-shuffle the documents side. The carry
    # is 8-byte xxhash64 hashes, not strings (disambig.hashed_tokens), so a
    # long doc with many mentions holds fixed-width arrays in flight.
    segs = runner.run(
        "segment",
        lambda: segment.segment_documents(
            docs,
            max_len=cfg.max_len,
            overlap=cfg.overlap,
            rebalance=cfg.rebalance_segments,
        ).withColumn("doc_tokens", disambig.hashed_tokens(F.col("text"))),
    )

    spots = runner.run(
        "spot",
        lambda: segment.stitch_filter(
            spot.spot_segments(
                segs,
                automaton_src,
                doc_col=doc_col,
                keep_extra=("keep_from", "keep_to", "doc_tokens"),
            )
        ),
    )

    # No cache here either: the overlap family is a single-pass chain now
    # (no hit/miss split — see kgspark.overlaps), so `linked` has exactly
    # one consumer and persisting it only paid an InMemoryRelation
    # write+read per action. With a checkpoint_root the parquet
    # materialization still cuts the lineage per stage.
    linked = runner.run(
        "link",
        lambda: disambig.link_mentions(
            spots,
            lexicon,
            docs,
            doc_col=doc_col,
            min_support=cfg.min_support,
            confidence=cfg.confidence,
            types=cfg.types,
            # one doc-keyed exchange serves the top-1 agg AND the whole
            # downstream overlap window family; A/B-confirmed at the driver
            # yardstick — see PipelineConfig.partition_by_doc.
            partition_by_doc=cfg.partition_by_doc,
            # narrow rows through the cache + window family; the type
            # payload re-attaches once, post-resolution (attach_types) —
            # with a D6 type restriction the types must ride along for
            # the filter, so the narrow contract only applies without it.
            attach_type_cols=bool(cfg.types),
        ),
    )

    def _resolve():
        return overlaps.overlap_pipeline(
            linked,
            keep=cfg.keep,
            omit=cfg.omit,
            tiebreak=cfg.tiebreak,
            doc_col="doc_id",
        ).drop(*[c for c in overlaps.OVL_FLAGS])

    resolved = runner.run("overlaps", _resolve)

    typed = runner.run(
        "entity_types",
        lambda: entity_types.entity_types_map(
            resolved
            if "DBpedia_type" in resolved.columns
            else disambig.attach_types(resolved, lexicon),
            cfg.mapping,
        ),
    )

    redirects_closed = (
        redirects if cfg.redirects_preclosed else canon.close_redirects(redirects)
    )
    canonical = runner.run(
        "canonicalize",
        lambda: canon.canonicalize(typed, redirects_closed, sameas),
    )
    if runner.enabled and not cfg.redirects_preclosed:
        # canonicalize was materialized to parquet (lineage cut), so the
        # closure's cached rounds are no longer reachable — release them
        # instead of leaking a cached dim per pipeline run. In lazy mode
        # the cache must outlive this call; it is exposed as
        # out["redirects_closed"] and the caller owns the unpersist.
        redirects_closed.unpersist()

    triple_df = runner.run("triples", lambda: triples.mentions_to_triples(canonical))

    return {
        "documents": docs,
        "redirects_closed": redirects_closed,
        "segments": segs,
        "spots": spots,
        "mentions": linked,
        "resolved": resolved,
        "canonical": canonical,
        "triples": triple_df,
        "metrics": runner.metrics,
    }


def release_pipeline_caches(out: dict) -> None:
    """Unpersist any caches a ``run_pipeline`` invocation left behind.

    Round 6 removed the pipeline's own persists (every stage is
    single-consumer now), so this is normally a no-op — it stays because
    the bench harness calls it between passes, and because Spark's
    CacheManager substitutes a cached InMemoryRelation for ANY plan that
    canonically matches one: if a caller persisted these frames
    themselves, dropping them here keeps repeated passes honest."""
    for key in ("documents", "mentions"):
        df = out.get(key)
        if df is not None:
            df.unpersist()
