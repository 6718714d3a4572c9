"""Regression bounds for dedup_ngram_jaccard's output on adversarial
all-duplicates corpora (VERDICT r2 item 4; pair budget VERDICT r4 item 4).

Two stacked guards:
- df-cap: a shingle in more docs than _NGRAM_DF_CAP is non-discriminative
  boilerplate and is dropped BEFORE the self-join — a duplicate group
  larger than the cap contributes zero candidate pairs.
- pair budget: surviving posting lists are truncated to their first
  _NGRAM_PAIR_BUDGET doc_ids, so one shingle emits ≤ K·(K-1)/2 pairs and
  the worst case is BOUNDED (61 s measured at 10× pre-budget), with
  affected pairs flagged `truncated`.
"""

from __future__ import annotations

import tempfile

import pandas as pd

from mongodb_mysql_cdc_spark.suite.llm_dedup import (
    _NGRAM_DF_CAP,
    _NGRAM_PAIR_BUDGET,
    dedup_ngram_jaccard,
)


def _write_docs(spark, rows):
    out = tempfile.mkdtemp(prefix="ngram_bound_")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def test_ngram_jaccard_output_bounded_by_df_cap(spark):
    big_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    small_text = "one two three four five six seven eight nine ten " * 3
    n_big = _NGRAM_DF_CAP * 4  # 200 identical docs — well over the cap
    n_small = 10  # identical group under the cap
    rows = [(i, big_text, "en", "dup", len(big_text)) for i in range(n_big)]
    rows += [
        (n_big + i, small_text, "en", "ok", len(small_text)) for i in range(n_small)
    ]
    # unique filler so the corpus is not 100% duplicates
    rows += [
        (n_big + n_small + i, f"unique words nr{i} only here once token{i}", "en", "u", 40)
        for i in range(20)
    ]
    sf_dir = _write_docs(spark, rows)

    pairs = dedup_ngram_jaccard(spark, sf_dir)
    got = pairs.collect()

    # Every shingle of the 200-group has df=200 > cap → dropped → that
    # group emits NO pairs at all; only the 10-group's C(10,2) survive.
    expected_small = n_small * (n_small - 1) // 2
    assert len(got) == expected_small
    assert all(r["doc_a"] >= n_big and r["doc_b"] >= n_big for r in got)
    # under-budget group: every pair exact, none flagged
    assert all(not r["truncated"] for r in got)
    # the un-capped worst case would be C(200,2) = 19900 pairs from the big
    # group alone — the bound this test exists to pin
    assert len(got) < 1000


def test_ngram_jaccard_pair_budget_truncates_midsize_groups(spark):
    """A duplicate group UNDER the df-cap but OVER the pair budget emits
    exactly C(K,2) pairs — among the K smallest doc_ids — all flagged
    truncated; members beyond the posting prefix emit nothing. This is
    the bounded worst case: pairs-per-shingle can never exceed C(K,2)."""
    text = "red orange yellow green blue indigo violet umber ochre teal " * 3
    n_mid = _NGRAM_DF_CAP - 10  # 40: survives df-cap, exceeds budget (20)
    rows = [(i, text, "en", "mid", len(text)) for i in range(n_mid)]
    rows += [
        (n_mid + i, f"distinct filler nr{i} once only token{i} here", "en", "u", 40)
        for i in range(20)
    ]
    sf_dir = _write_docs(spark, rows)

    got = dedup_ngram_jaccard(spark, sf_dir).collect()

    k = _NGRAM_PAIR_BUDGET
    assert len(got) == k * (k - 1) // 2
    assert all(r["doc_a"] < k and r["doc_b"] < k for r in got)
    assert all(r["truncated"] for r in got)
    # identical docs → jaccard is still exact 1.0 within the prefix
    assert all(r["jaccard"] == 1.0 for r in got)


def test_minhash_star_edges_match_clique_components(spark):
    """Round 8: dedup_clusters/survivors consume bucket-linear STAR edges
    (min-doc-per-band-bucket → member) instead of the all-pairs clique.
    Same connected components by construction; on a 40-copy dup group the
    star emits O(g) edges where the clique emits C(40,2)·bands. Assert
    (a) edge-count boundedness, (b) identical cluster assignments."""
    from mongodb_mysql_cdc_spark.operators.dedup import connected_components
    from mongodb_mysql_cdc_spark.suite import llm_dedup

    rows = []
    # one 40-copy duplicate group + 20 distinct docs
    for i in range(40):
        rows.append((i, "the same exact duplicated text body here okay", "en", "a", 46))
    for i in range(40, 60):
        rows.append((i, f"unique document number {i} with its own words {i*7}", "en", "a", 40))
    sf = _write_docs(spark, rows)
    llm_dedup._BANDS_MEMO.clear()

    bands = llm_dedup._minhash_bands(spark, sf)
    star = llm_dedup._minhash_star_edges(spark, sf)
    pairs = llm_dedup._minhash_pairs(spark, sf).select("doc_a", "doc_b")
    # boundedness: star edges ≤ |bands rows|; clique is quadratic
    assert star.count() <= bands.count()
    assert pairs.count() >= 4 * 39 / 2  # the clique really is quadratic here

    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    comp_star = {
        (r["node"], r["cluster"])
        for r in connected_components(
            docs, star, node_col="doc_id", edge_cols=("doc_a", "doc_b")
        ).collect()
    }
    comp_clique = {
        (r["node"], r["cluster"])
        for r in connected_components(
            docs, pairs, node_col="doc_id", edge_cols=("doc_a", "doc_b")
        ).collect()
    }
    assert comp_star == comp_clique
    llm_dedup._BANDS_MEMO.clear()
