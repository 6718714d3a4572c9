"""M5 LLM-pipeline tests: LSH recall vs exact verifiers, multimodal
plumbing goldens, and scale-shape plan assertions (SURVEY.md §5.3)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.operators.multimodal import (
    decode_media,
    sample_frames,
    with_payload,
)
from mongodb_mysql_cdc_spark.suite import llm_dedup, llm_simsearch, llm_text


def test_hash60_matches_duckdb_spelling(spark):
    """The cross-engine hashing contract: Spark's conv/md5 spelling equals
    DuckDB's hex-literal cast (value pinned from DuckDB 1.0)."""
    from mongodb_mysql_cdc_spark.functions.hashing import hash60

    row = spark.range(1).select(hash60(F.lit("hello")).alias("h")).head()
    assert row.h == 419982666956583591
    # and equals a direct python md5-prefix interpretation
    assert row.h == int(hashlib.md5(b"hello").hexdigest()[:15], 16)


def test_minhash_candidates_catch_high_jaccard_pairs(spark, sf_dir):
    """LSH recall: every pair with exact 3-gram Jaccard ≥ 0.9 must appear
    among the MinHash band candidates (4 bands × 2 rows ⇒ miss prob
    (1-J²)⁴ < 2e-3 at J=0.9; this corpus's planted pairs are J≈0.99)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.9).collect()
    }
    candidates = {
        (r.doc_a, r.doc_b) for r in llm_dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert exact, "corpus should contain planted near-dup pairs"
    assert exact <= candidates


def test_lsh_ann_results_are_true_neighbors(spark, sf_dir):
    """Bucketed ANN returns a subset of the true scored pairs, with exact
    cosine values and correct per-bucket ranking."""
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in llm_simsearch._scored_pairs(load(spark, sf_dir, "embeddings")).collect()
    }
    ann = llm_simsearch.sim_search_lsh(spark, sf_dir).collect()
    assert ann
    for r in ann:
        assert (r.query_id, r.neighbor_id) in brute
        assert brute[(r.query_id, r.neighbor_id)] == pytest.approx(r.cos_sim, abs=0)
    # ranks within each query are 1..n without gaps
    by_q = {}
    for r in ann:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_simhash_near_dups_have_small_hamming_distance(spark, sf_dir):
    """Planted near-dup pairs (found by exact Jaccard) must sit within a
    small SimHash Hamming radius; random pairs should average much larger."""
    sim = {r.doc_id: r.simhash for r in llm_dedup.dedup_simhash(spark, sf_dir).collect()}
    near = llm_dedup.dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.9).collect()
    assert near

    def ham(a, b):
        return bin(a ^ b).count("1")

    near_d = [ham(sim[r.doc_a], sim[r.doc_b]) for r in near]
    assert max(near_d) <= 4
    ids = sorted(sim)
    rand_d = [ham(sim[ids[i]], sim[ids[i + 7]]) for i in range(0, len(ids) - 7, 11)]
    assert sum(rand_d) / len(rand_d) > max(near_d)


def test_connected_components_chain_graph(spark):
    """A 6-node chain (diameter 5) forces multiple propagation rounds;
    plus an isolated node and a separate pair."""
    from mongodb_mysql_cdc_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(9)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (7, 8)], "a long, b long"
    )
    got = {r.node: r.cluster for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 6: 6, 7: 7, 8: 7}


def test_multimodal_decode_golden(spark, sf_dir):
    """The REAL decoder's parsed fields must equal independent ground
    truth: the synthesized WAV payloads are re-read with the *stdlib*
    ``wave`` codec (a parser we did not write), and the analytic
    per-doc formulas pin every feature."""
    import io
    import wave

    from mongodb_mysql_cdc_spark.operators.multimodal import synth_media

    media = synth_media(load(spark, sf_dir, "documents")).filter(F.col("doc_id") < 20)
    payloads = {r.doc_id: bytes(r.payload) for r in media.collect()}
    feats = {
        r.doc_id: r
        for r in decode_media(media).collect()
    }
    assert set(feats) == set(payloads)
    for doc_id, f in feats.items():
        if doc_id % 2 == 0:  # WAV — cross-check with the stdlib codec
            wf = wave.open(io.BytesIO(payloads[doc_id]))
            assert f.media_type == "audio/wav"
            assert f.sample_rate == wf.getframerate() == 8000
            assert f.n_samples == wf.getnframes() == 64 + doc_id % 64
            assert f.duration_ms == pytest.approx(f.n_samples * 1000.0 / 8000)
            expect_mean = sum(
                abs(((doc_id * 31 + i * 17) % 2048) - 1024) for i in range(f.n_samples)
            ) / f.n_samples
            assert f.signal_mean == pytest.approx(expect_mean)
        else:  # BMP — analytic pixel mean
            w, h = 4 + doc_id % 8, 4
            assert f.media_type == "image/bmp"
            assert (f.width, f.height) == (w, h)
            vals = [(doc_id * 7 + x * 3 + y * 13) % 256 for y in range(h) for x in range(w)]
            assert f.signal_mean == pytest.approx(sum(vals) / len(vals))
            assert f.n_bytes == 54 + h * ((3 * w + 3) // 4 * 4)


def test_multimodal_decode_without_codecs_raises(spark, sf_dir):
    """Payloads with no shipped parser (e.g. compressed codecs) must fail
    loudly, not silently produce garbage."""
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        decode_media(with_payload(load(spark, sf_dir, "documents"))).collect()


def test_sample_frames_shape(spark, sf_dir):
    media = with_payload(load(spark, sf_dir, "documents"))
    frames = sample_frames(media, frame_bytes=16, stride=100, max_frames=3)
    rows = frames.filter(F.col("doc_id") == 0).collect()
    text = load(spark, sf_dir, "documents").filter(F.col("doc_id") == 0).head().text
    raw = text.encode("utf-8")
    expect = min(3, (len(raw) + 99) // 100)
    assert len(rows) == expect
    for r in rows:
        assert bytes(r.frame) == raw[r.frame_no * 100 : r.frame_no * 100 + 16]


def test_sim_search_plans_broadcast_the_query_side(spark, sf_dir):
    """Scale shape: the ANN joins must broadcast the (tiny) query side —
    a shuffled join here would be the 100 TB bottleneck."""
    plan = llm_simsearch.sim_search_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    plan = llm_simsearch.sim_search_lsh(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_tfidf_weights_match_manual_computation(spark, sf_dir):
    import math

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.select("doc_id").distinct().count()
    sample = llm_text.tfidf(spark, sf_dir).filter(F.col("doc_id") == 1).collect()
    assert sample
    for r in sample[:10]:
        expect = r.tf * (math.log((n_docs + 1.0) / (r.df + 1.0)) + 1.0)
        assert r.tfidf == pytest.approx(expect, rel=1e-5)


def test_tfidf_cutover_branches_agree(spark, sf_dir):
    """The broadcast→shuffle vocab cutover is a physical choice only:
    both branches must produce identical rows (the shuffle branch is the
    100 TB path, never exercised by the oracle since the registered
    query keeps the broadcast default)."""
    cols = ["doc_id", "token", "tf", "df", "tfidf"]
    broadcast = sorted(
        map(tuple, llm_text.tfidf_weights(spark, sf_dir).select(*cols).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            llm_text.tfidf_weights(spark, sf_dir, vocab_broadcast_limit=0)
            .select(*cols)
            .collect(),
        )
    )
    assert broadcast == shuffled


def test_resized_bmp_is_itself_decodable(spark, sf_dir):
    """resize_bmp must emit VALID BMPs: parsing a resized payload with the
    independent stdlib/struct path yields the declared dims and the
    declared byte size."""
    import struct

    from mongodb_mysql_cdc_spark.catalog import load
    from mongodb_mysql_cdc_spark.operators.multimodal import resize_bmp, synth_media

    rows = (
        resize_bmp(synth_media(load(spark, sf_dir, "documents")), factor=2)
        .limit(8)
        .collect()
    )
    assert rows
    for r in rows:
        b = bytes(r["resized"])
        assert b[:2] == b"BM"
        assert len(b) == r["rs_n_bytes"]
        (_hsz, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", b, 14)
        assert (w, h, bpp) == (r["rs_width"], r["rs_height"], 24)


def test_resampled_wav_is_itself_decodable(spark, sf_dir):
    """resample_wav must emit VALID RIFF containers: independent re-parse
    yields the halved rate and declared sample count/byte size."""
    import struct

    from mongodb_mysql_cdc_spark.catalog import load
    from mongodb_mysql_cdc_spark.operators.multimodal import resample_wav, synth_media

    rows = (
        resample_wav(synth_media(load(spark, sf_dir, "documents")), factor=2)
        .limit(8)
        .collect()
    )
    assert rows
    for r in rows:
        b = bytes(r["resampled"])
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        assert len(b) == r["rs_n_bytes"]
        (_sz, _afmt, ch, sr) = struct.unpack_from("<IHHI", b, 16)
        assert (ch, sr) == (1, r["rs_rate"])
        n_data = struct.unpack_from("<I", b, 40)[0]
        assert n_data == 2 * r["rs_n_samples"]


def test_udf_arrow_kernel_handles_empty_lists(spark, tmp_path):
    """ADVICE r12 pin: the n_pos segment sum must treat zero-length
    embeddings like the sq path does (0), including an empty list in the
    FINAL row — the np.add.reduceat spelling returned the neighboring
    element for idx[i]==idx[i+1] and raised IndexError on a trailing
    empty segment. The cumsum-difference form gives 0 for both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mongodb_mysql_cdc_spark.suite.llm_media import udf_arrow

    tbl = pa.table(
        {
            "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
            "embedding": pa.array(
                [[1.0, -2.0, 3.0], [], [0.5], []],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0, 0, 0], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = {
        r["vec_id"]: r
        for r in udf_arrow(spark, str(tmp_path)).collect()
    }
    assert {k: rows[k]["dim"] for k in rows} == {1: 3, 2: 0, 3: 1, 4: 0}
    assert {k: rows[k]["n_pos"] for k in rows} == {1: 2, 2: 0, 3: 1, 4: 0}
    assert rows[1]["sq_norm"] == 14.0
    assert rows[2]["sq_norm"] == 0.0 and rows[4]["sq_norm"] == 0.0
    assert rows[3]["sq_norm"] == 0.25
