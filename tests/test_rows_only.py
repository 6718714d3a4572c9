"""Batch-equivalence pytest layer for the rows-only queries (SURVEY.md §5:
ops whose oracle is too weak get their own correctness assertion here)."""

from __future__ import annotations

from mongodb_mysql_cdc_spark.registry import queries

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_advertised_error(spark):
    """approx_count_distinct at rsd=0.01 must land within a conservative
    5× of the advertised relative error of the exact count it ships
    alongside (HLL guarantees are probabilistic; 5σ keeps this stable)."""
    rows = queries()["agg_approx_distinct"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_multimodal_decode_rowcount_matches_corpus(spark):
    """The Arrow decode path must emit exactly one feature row per
    document — no batch boundary duplication or loss."""
    n_docs = queries()["scan_parquet"](spark, SF).sparkSession.read.parquet(
        f"{SF}/documents.parquet"
    ).count()
    n_feat = queries()["multimodal_decode"](spark, SF).count()
    assert n_feat == n_docs


def test_multimodal_frames_bounded_per_doc(spark):
    """Frame sampling emits 1..max_frames rows per doc, never more."""
    from pyspark.sql import functions as F

    frames = queries()["multimodal_frames"](spark, SF)
    per_doc = frames.groupBy("doc_id").count()
    mx = per_doc.agg(F.max("count")).first()[0]
    mn = per_doc.agg(F.min("count")).first()[0]
    assert 1 <= mn and mx <= 4


def test_approx_quantile_within_tolerance_of_exact(spark):
    """approx_percentile at accuracy=10000 must sit within 1% relative
    error of the exact percentile it ships alongside."""
    rows = queries()["agg_approx_quantile"](spark, SF).collect()
    assert rows
    for r in rows:
        for approx, exact in ((r.p50_approx, r.p50_exact), (r.p95_approx, r.p95_exact)):
            assert exact > 0
            assert abs(approx - exact) / exact <= 0.01, (r.l_returnflag, approx, exact)


def test_avro_roundtrip_or_documented_gate(spark, sf_dir):
    """Avro is an external Spark module: where present the roundtrip must
    preserve rows; where absent (this container) the gate must raise the
    actionable deploy hint, not a datasource lookup error."""
    import pytest

    from mongodb_mysql_cdc_spark.suite.io import avro_available, sink_avro_roundtrip

    if avro_available(spark):
        out = sink_avro_roundtrip(spark, sf_dir)
        assert out.count() == 2000
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            sink_avro_roundtrip(spark, sf_dir)


def test_hll_sketch_merge_equals_direct(spark):
    """Sketch mergeability: unioning per-day partial HLL sketches must
    give EXACTLY the direct whole-stream sketch estimate (deterministic
    sketch, same data), and both must land within 5% of exact."""
    from mongodb_mysql_cdc_spark.registry import queries

    rows = queries()["agg_hll_sketch"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.merged_est == r.direct_est, (r.event_type, r.merged_est, r.direct_est)
        assert abs(r.direct_est - r.exact) / r.exact < 0.05
