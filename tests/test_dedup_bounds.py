"""Regression bound for dedup_ngram_jaccard's output on an adversarial
all-duplicates corpus (VERDICT r2 item 4).

The df-cap is the guard: a shingle appearing in more docs than
_NGRAM_DF_CAP is non-discriminative boilerplate and gets dropped BEFORE
the self-join, so a duplicate group larger than the cap contributes zero
candidate pairs — the O(dups²) blow-up (61 s measured pre-cap at 10×)
cannot regress. Groups at-or-under the cap still emit their true pairs.
"""

from __future__ import annotations

import tempfile

import pandas as pd

from mongodb_mysql_cdc_spark.suite.llm_dedup import _NGRAM_DF_CAP, dedup_ngram_jaccard


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
    # the un-capped worst case would be C(200,2) = 19900 pairs from the big
    # group alone — the bound this test exists to pin
    assert len(got) < 1000
