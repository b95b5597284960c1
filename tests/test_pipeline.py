"""End-to-end pipeline goldens + checkpoint resume."""

import json
import os

from kgspark import synth
from kgspark.pipeline import PipelineConfig, run_pipeline


def _run(spark, docs, cfg=None):
    return run_pipeline(
        spark,
        docs,
        synth.golden_lexicon_df(spark),
        synth.redirects_df(spark),
        synth.sameas_df(spark),
        cfg or PipelineConfig(),
    )


def test_golden_annotations_end_to_end(spark):
    out = _run(spark, synth.golden_documents(spark))
    got = {
        (r["doc_id"].removeprefix("golden://"), r["start"], r["text"], r["dbpedia_uri"], r["category"])
        for r in out["canonical"].collect()
    }
    assert got == {
        ("g1", 1, "Vice President Gore", "dbr:Al_Gore", "PERSON"),
        ("g1", 24, "Washington D.C.", "dbr:Washington,_D.C.", "LOCATION"),
        ("g2", 1, "Crude oil", "dbr:Petroleum", "MISC"),
        ("g3", 1, "Berlin", "dbr:Berlin", "LOCATION"),
        ("g3", 15, "capital", "dbr:Capital_city", "MISC"),
        ("g3", 26, "Germany", "dbr:Germany", "LOCATION"),
        ("g4", 5, "Deutsche Bundestag", "dbr:Bundestag", "ORGANIZATION"),
        ("g4", 32, "Berlin", "dbr:Berlin", "LOCATION"),
    }


def test_extraction_byte_identity_through_pipeline(spark):
    docs = synth.synth_documents(spark, n_docs=30)
    out = _run(spark, docs)
    mismatches = (
        out["documents"]
        .select("url", "text")
        .join(docs.select("url", docs["text"].alias("expected")), "url")
        .filter("text <> expected OR text IS NULL")
        .count()
    )
    assert mismatches == 0


def test_segmentation_invariance_through_pipeline(spark):
    """Mention set identical with and without forced segmentation
    (test-segment.R:38-64 contract, at pipeline level)."""
    docs = synth.synth_documents(spark, n_docs=24)
    lex = synth.lexicon_df(spark)
    rd, sa = synth.redirects_df(spark), synth.sameas_df(spark)
    big = run_pipeline(spark, docs, lex, rd, sa, PipelineConfig(max_len=100000))
    small = run_pipeline(spark, docs, lex, rd, sa, PipelineConfig(max_len=800, overlap=300))
    key = lambda df: {
        (r["doc_id"], r["start"], r["text"], r["dbpedia_uri"])
        for r in df.select("doc_id", "start", "text", "dbpedia_uri").collect()
    }
    assert key(big["mentions"]) == key(small["mentions"])


def test_checkpoint_resume(spark, tmp_path):
    docs = synth.golden_documents(spark)
    cfg = PipelineConfig(checkpoint_root=str(tmp_path))
    first = _run(spark, docs, cfg)
    n1 = first["triples"].count()
    again = _run(spark, docs, cfg)
    assert again["triples"].count() == n1
    assert all(m["resumed"] for m in again["metrics"])
    manifest = json.load(open(os.path.join(str(tmp_path), "spot", "_kg_manifest.json")))
    assert manifest["complete"]
    assert manifest["output_rows"] == sum(p["rows"] for p in manifest["partitions"])


def test_lexicon_artifact_reused_not_rewritten(spark, tmp_path):
    """An explicitly configured, already-complete lexicon artifact is
    reused (probed for _SUCCESS via the Hadoop FS API, so the check also
    works on HDFS/S3A roots) — not rewritten every run."""
    docs = synth.golden_documents(spark)
    art = str(tmp_path / "lex_artifact")
    cfg = PipelineConfig(lexicon_artifact=art)
    _run(spark, docs, cfg)["triples"].count()
    success = os.path.join(art, "_SUCCESS")
    assert os.path.exists(success)
    mtimes = {
        f: os.path.getmtime(os.path.join(art, f)) for f in os.listdir(art)
    }
    out2 = _run(spark, docs, cfg)
    assert out2["triples"].count() > 0
    assert {
        f: os.path.getmtime(os.path.join(art, f)) for f in os.listdir(art)
    } == mtimes


def test_release_pipeline_caches_empties_cache_manager(spark):
    """Benchmark contract: after release_pipeline_caches, no pipeline cache
    survives to be plan-matched by a later pass (redirects pre-closed so no
    closure cache is in play either)."""
    from kgspark.pipeline import release_pipeline_caches
    from kgspark.canonicalize import close_redirects

    spark.catalog.clearCache()
    docs = synth.golden_documents(spark)
    rd_closed = close_redirects(synth.redirects_df(spark))
    out = run_pipeline(
        spark, docs, synth.golden_lexicon_df(spark), rd_closed,
        synth.sameas_df(spark),
        PipelineConfig(redirects_preclosed=True),
    )
    out["triples"].count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty()  # docs + mentions caches are live mid-pass
    release_pipeline_caches(out)
    rd_closed.unpersist()  # close_redirects' fixpoint cache, caller-owned
    assert cm.isEmpty()


def test_triples_deterministic_across_runs(spark):
    docs = synth.synth_documents(spark, n_docs=20)
    lex = synth.lexicon_df(spark)
    rd, sa = synth.redirects_df(spark), synth.sameas_df(spark)

    def run():
        out = run_pipeline(spark, docs, lex, rd, sa, PipelineConfig())
        return {tuple(r) for r in out["triples"].collect()}

    t1, t2 = run(), run()
    assert t1 == t2 and len(t1) > 0


def test_write_triples_parquet_layout(spark, tmp_path):
    """The parquet sink materializes the Iceberg-equivalent layout:
    one pred=... directory per predicate (partition pruning on read)."""
    from kgspark.triples import mentions_to_triples, write_triples

    docs = synth.synth_documents(spark, n_docs=20)
    out = run_pipeline(spark, docs, synth.lexicon_df(spark),
                       synth.redirects_df(spark), synth.sameas_df(spark),
                       PipelineConfig())
    path = str(tmp_path / "triples")
    write_triples(out["triples"], path, salt_buckets=8)
    parts = {d for d in os.listdir(path) if d.startswith("pred=")}
    assert {"pred=kg%3AmentionedIn", "pred=kg%3AanchorOf"} <= parts
    back = spark.read.parquet(path)
    assert back.count() == out["triples"].count()
    assert set(back.columns) == {"subj", "pred", "obj"}


def test_write_triples_iceberg_requires_catalog(spark):
    """The V2 Iceberg path is real code: without an Iceberg catalog and
    runtime jar it must fail with Spark's catalog/provider error, not
    silently write something else."""
    import pytest
    from kgspark.triples import write_triples_iceberg

    df = spark.createDataFrame(
        [("s", "p", "o")], "subj string, pred string, obj string"
    )
    with pytest.raises(Exception) as ei:
        write_triples_iceberg(df, "icecat.db.triples", salt_buckets=4)
    msg = str(ei.value)
    assert "icecat" in msg or "iceberg" in msg.lower() or "catalog" in msg.lower()
