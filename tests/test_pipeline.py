"""Training-data pipeline operator tests: packing invariants,
decontamination ground truth, and 100 TB plan shapes (SURVEY.md §5.3
style)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.suite import pipeline


def test_pack_sequences_matches_greedy_ground_truth(spark, sf_dir):
    """Every doc's bin equals floor(start_offset / budget) computed
    independently in Python over the same (lang, doc_id) order."""
    rows = pipeline.pack_sequences(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.lang, r.doc_id)):
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for docs in by_lang.values():
        offset = 0
        for r in docs:
            assert r.bin_id == offset // 2048
            offset += r.n_tokens
        # greedy packing fills bins densely: ids are a contiguous range
        bins = sorted({r.bin_id for r in docs})
        assert bins == list(range(bins[-1] + 1))


def test_decontaminate_ground_truth(spark, sf_dir):
    """No surviving doc shares a 5-gram with the benchmark set, and every
    dropped non-benchmark doc genuinely overlaps it (python re-check)."""
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}

    def shingles(text: str) -> set:
        t = text.strip().lower().split()
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}

    bench = set()
    for i, txt in docs.items():
        if i < 25:
            bench |= shingles(txt)
    kept = {r.doc_id for r in pipeline.decontaminate(spark, sf_dir).collect()}
    for doc_id, txt in docs.items():
        if doc_id < 25:
            assert doc_id not in kept  # benchmark rows never pass through
        elif shingles(txt) & bench:
            assert doc_id not in kept, f"contaminated doc {doc_id} survived"
        else:
            assert doc_id in kept, f"clean doc {doc_id} was dropped"


def test_sample_per_group_is_exact_and_stable(spark, sf_dir):
    out1 = pipeline.sample_per_group(spark, sf_dir).collect()
    out2 = pipeline.sample_per_group(spark, sf_dir).collect()
    assert {(r.doc_id, r.rk) for r in out1} == {(r.doc_id, r.rk) for r in out2}
    sizes = {}
    for r in out1:
        sizes[r.lang] = sizes.get(r.lang, 0) + 1
    group_totals = {
        r.lang: r.n
        for r in load(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(20, group_totals[lang])


def test_scd2_intervals_tile_each_key(spark, sf_dir):
    """Per key: intervals are disjoint, ordered, and exactly one is
    current unless the last event was a delete."""
    rows = pipeline.cdc_scd2(spark, sf_dir).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    assert by_key
    for key, versions in by_key.items():
        versions.sort(key=lambda r: (r.valid_from, r.seq))
        n_current = sum(1 for r in versions if r.is_current)
        assert n_current <= 1
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from
        for r in versions:
            assert r.is_current == (r.valid_to is None)


def test_pipeline_plan_shapes(spark, sf_dir):
    """The scale contracts: decontaminate broadcasts the benchmark and
    anti-joins; stratified sampling is shuffle-free; per-group sampling
    uses the rank-pruning window."""
    plan = pipeline.decontaminate(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan and "LeftAnti" in plan
    plan = pipeline.sample_stratified(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    plan = pipeline.sample_per_group(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
