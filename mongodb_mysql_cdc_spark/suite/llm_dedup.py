"""§2.10 deduplication family: exact, MinHash-LSH (+ clusters/survivors),
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Split from suite/llm.py in round 2 (same queries, same names, same
oracles — the determinism and 100 TB scale notes live in that module's
original docstring, now distributed per-query).

100 TB scale invariant for every member: candidate generation is an
equi-join on a derived key (fingerprint / band signature / shingle /
hamming bucket / GEMM block) — never an all-pairs product; only
candidates pay verification cost.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.functions import hashing as H
from mongodb_mysql_cdc_spark.functions import text as X
from mongodb_mysql_cdc_spark.functions import vectors as V
from mongodb_mysql_cdc_spark.functions.compat import hround, sql_round
from mongodb_mysql_cdc_spark.registry import register

# Shared DuckDB CTE: lowercased whitespace tokens (matches functions/text.py).
TOKS_CTE = X.sql_toks_cte()
from mongodb_mysql_cdc_spark.operators.dedup import connected_components
from mongodb_mysql_cdc_spark.operators.partitioning import spread
from mongodb_mysql_cdc_spark.operators.similarity import blocked_allpairs_cosine


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup: one row per distinct content, keeping the
    smallest doc_id. At 100 TB: a single hash-partitioned aggregation on a
    64-bit-wide key (the md5), with map-side partial aggregation — the
    cheapest possible full-corpus dedup."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("content_md5"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup candidates
# ---------------------------------------------------------------------------

_N_HASHES = 8  # 4 bands × 2 rows: catches J≳0.7 pairs w.h.p., few false bands
_N_BANDS = 4


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """Tokenize, THEN shingle across an exchange keyed on doc_id.

    The exchange is load-bearing twice over: (1) Catalyst collapses
    adjacent projections and HOF lambdas get no common-subexpression
    elimination, so without a barrier the split() regex re-runs once per
    shingle (~50×/doc — measured 8.4 s → 1.0 s at sf0.1 for the 5-gram
    variant); (2) hash-partitioning by doc_id is exactly what the
    downstream explode→groupBy(doc_id) minhash aggregation needs, so the
    exchange replaces, rather than adds to, a later shuffle."""
    tok_df = docs.select("doc_id", X.tokens(F.col("text")).alias("t")).repartition(
        F.col("doc_id")
    )
    return tok_df.select(
        "doc_id",
        F.array_distinct(X.word_shingles(F.col("t"), 3)).alias("sh"),
    ).filter(F.size(F.col("sh")) > 0)


_SH_CTE = (
    "sh AS (SELECT doc_id, list_distinct(list_transform("
    "generate_series(1, greatest(len(t)-2, 0)), i -> array_to_string(t[i:i+2], ' '))) AS s "
    "FROM toks WHERE greatest(len(t)-2, 0) > 0)"
)


def _minhash_ctes() -> str:
    """The shared oracle CTE chain ending in ``cand`` = candidate pairs."""
    ha, hb = H.sql_md5_halves("t")
    mins = ", ".join(
        f"list_min(list_transform(hp, p -> (p.a + {k} * p.b) % {H.MINHASH_P})) AS h{k}"
        for k in range(_N_HASHES)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat(CAST(h{2*b} AS VARCHAR), ':', CAST(h{2*b+1} AS VARCHAR)) AS band_key FROM mh"
        for b in range(_N_BANDS)
    )
    return f"""{TOKS_CTE},
{_SH_CTE},
hp AS (SELECT doc_id, list_transform(s, t -> {{'a': {ha}, 'b': {hb}}}) AS hp FROM sh),
mh AS (SELECT doc_id, {mins} FROM hp),
bands AS ({bands}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)"""


# One cached signature table per (session, sf_dir) — three queries
# (dedup_minhash_lsh / dedup_clusters / dedup_survivors) share it, so the
# shingle+hash pipeline runs once per dataset rather than once per query
# and the cache does not accumulate per-invocation copies.
_BANDS_MEMO: dict = {}

# Same lifecycle for dedup_ngram_jaccard's cached inverted index.
_POSTINGS_MEMO: dict = {}


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cached (doc_id, band_id, band_key) signature table shared by
    every minhash consumer: 3-word shingles → 8-member affine minhash
    family → 4 bands of 2.

    Explodes shingles ONCE and hashes in a projection, then takes the 8
    cheap affine mins as aggregates. The tempting alternative — 8
    array_min(transform) columns — re-derives the entire shingle pipeline
    per hash after Catalyst collapses projections (measured 8×). Map-side
    partial agg means the doc_id shuffle carries only 8 longs per doc."""
    # Keyed on applicationId, not id(spark): a stopped session's id() can be
    # reused by a new session, which would hand out a DataFrame bound to a
    # dead SparkContext.
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    bands = _BANDS_MEMO.get(memo_key)
    if bands is None:
        sh = _shingle_sets(load(spark, sf_dir, "documents"))
        ha, hb = H.md5_halves(F.col("g"))
        ex = sh.select("doc_id", F.explode("sh").alias("g")).select(
            "doc_id", ha.alias("ha"), hb.alias("hb")
        )
        mh = ex.groupBy("doc_id").agg(
            *[
                F.min((F.col("ha") + k * F.col("hb")) % H.MINHASH_P).alias(f"h{k}")
                for k in range(_N_HASHES)
            ]
        )
        bands = mh.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.concat_ws(":", f"h{2*b}", f"h{2*b+1}").alias("band_key"),
                        )
                        for b in range(_N_BANDS)
                    ]
                )
            ).alias("band"),
        ).select("doc_id", "band.band_id", "band.band_key")
        # Materialize the signature table before the self-join: without it
        # each join side re-runs the whole shingle+hash pipeline (no
        # exchange reuse across self-join aliases). The table is |docs| ×
        # ~3 small cols — at 100 TB corpus scale it is megabytes-per-
        # million-docs, the canonical thing TO cache, while the corpus
        # itself is never cached.
        bands = bands.cache()
        _BANDS_MEMO[memo_key] = bands
    return bands


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All candidate PAIRS with shared-band counts (dedup_minhash_lsh's
    exhibit output): self-equi-join of the band table on (band_id,
    band_key). Output is C(g, 2) per g-member bucket — quadratic in
    dup-group size BY CONTRACT (the oracle computes the same pairs);
    connectivity consumers use :func:`_minhash_star_edges` instead."""
    bands = _minhash_bands(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def _minhash_star_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-LINEAR candidate edges for connectivity consumers
    (dedup_clusters / dedup_survivors): per (band_id, band_key) bucket,
    connect every member to the bucket's min doc_id — a STAR instead of
    the pair join's clique. Within a bucket the star and the clique have
    identical connected components, so cluster/survivor outputs are
    bit-identical to the all-pairs spelling (the oracles still reach
    over the full `cand` pair set) — but the edge count is ≤ |bands
    table| = 4·|docs| BY CONSTRUCTION, where the clique is C(g, 2) per
    g-member bucket. At 100 TB a 1M-copy boilerplate doc makes the
    clique 5·10¹¹ pairs (round-8 100× fixture: 33M pairs from 50k docs)
    while the star stays corpus-linear. The per-bucket min and the
    join-back both shuffle on the high-cardinality band key; a hot
    bucket joins its 1-row min fan-out linearly."""
    bands = _minhash_bands(spark, sf_dir)
    roots = bands.groupBy("band_id", "band_key").agg(
        F.min("doc_id").alias("doc_a")
    )
    return (
        bands.join(roots, ["band_id", "band_key"])
        .filter(F.col("doc_id") != F.col("doc_a"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"WITH {_minhash_ctes()}\nSELECT doc_a, doc_b, n_shared_bands FROM cand",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (§2.10 dedup_fuzzy).

    The band join key is the whole point at 100 TB: candidate generation
    is a shuffle on a high-cardinality signature, NOT an O(n²) comparison;
    only banded collisions are ever paired. The family is Carter-Wegman
    h_k = (a + k·b) mod P with (a, b) the two 60-bit halves of ONE md5 per
    shingle — 8 hash functions, one digest; all constants are literals so
    signatures reproduce across engines and runs."""
    return _minhash_pairs(spark, sf_dir)


@register(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_minhash_ctes()},
sym AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION ALL SELECT doc_b, doc_a FROM cand),
reach(root, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.root, s.dst FROM reach r JOIN sym s ON s.src = r.node
)
SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (§2.10 dedup_fuzzy, final step): connected
    components over the MinHash candidate graph via iterative min-label
    propagation (operators/dedup.py) — an inherently iterative distributed
    algorithm, oracle-checked against DuckDB's recursive-CTE reachability.
    Each doc maps to its cluster's min doc_id; keep one row per cluster_id
    and the corpus is deduplicated. Candidate edges are the bucket-linear
    STAR spelling (round 8) — identical components to the all-pairs
    clique, corpus-linear edge count even when a dup group is huge."""
    pairs = _minhash_star_edges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    comp = connected_components(
        docs, pairs, node_col="doc_id", edge_cols=("doc_a", "doc_b")
    )
    return comp.select(
        F.col("node").alias("doc_id"), F.col("cluster").alias("cluster_id")
    )


@register(
    "dedup_survivors",
    oracle=f"""
WITH RECURSIVE {_minhash_ctes()},
sym AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        UNION ALL SELECT doc_b, doc_a FROM cand),
reach(root, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.root, s.dst FROM reach r JOIN sym s ON s.src = r.node
),
clusters AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       (SELECT count(*) FROM clusters c2 WHERE c2.cluster_id = c.cluster_id) AS cluster_size
FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
WHERE c.doc_id = c.cluster_id
""",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus (§2.10, the pipeline's actual product):
    keep exactly one survivor per near-dup cluster (the min doc_id) with
    its cluster size — what a pre-training data pipeline feeds downstream.
    Composition of candidate generation → connected components → keyed
    semi-join back to the corpus; at 100 TB the survivors join is a
    broadcast of the (tiny) cluster table against the corpus scan.
    Candidate edges are the bucket-linear STAR spelling (round 8) —
    identical components to the all-pairs clique at corpus-linear cost."""
    pairs = _minhash_star_edges(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    comp = connected_components(
        docs.select("doc_id"), pairs, node_col="doc_id", edge_cols=("doc_a", "doc_b")
    ).select(F.col("node").alias("doc_id"), F.col("cluster").alias("cluster_id"))
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    survivors = comp.filter(F.col("doc_id") == F.col("cluster_id")).join(
        F.broadcast(sizes), "cluster_id"
    )
    return docs.join(F.broadcast(survivors), "doc_id").select(
        "doc_id", "lang", "source", "n_chars", "cluster_size"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16


def _simhash_oracle() -> str:
    h = H.sql_hash60("t")
    bit_terms = " + ".join(
        f"(CASE WHEN list_reduce(list_transform(hs, h -> CASE WHEN ((h >> {i}) & 1) = 1 "
        f"THEN 1 ELSE -1 END), (a, b) -> a + b) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_SIMHASH_BITS)
    )
    return f"""
WITH {TOKS_CTE},
hashed AS (SELECT doc_id, list_transform(t, t -> {h}) AS hs FROM toks WHERE len(t) > 0)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM hashed
"""


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash fingerprint (§2.10 dedup_fuzzy).

    Each token votes ±1 on every bit of its hash60; the sign of each bit-sum
    becomes the fingerprint bit. Near-dup docs land at small Hamming
    distance, so at scale dedup is a self-join on the fingerprint (or on
    bit-masked sub-keys for distance>0) — never pairwise. Pure array folds:
    zero shuffle until the final (tiny) output."""
    docs = spread(load(spark, sf_dir, "documents"), "doc_id")
    toks = X.tokens(F.col("text"))
    hashed = docs.select(
        "doc_id", F.transform(toks, lambda t: H.hash60(t)).alias("hs")
    ).filter(F.size("hs") > 0)

    def bit_sum(i: int):
        return F.aggregate(
            "hs",
            F.lit(0),
            lambda a, h: a
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    simhash = None
    for i in range(_SIMHASH_BITS):
        term = F.when(bit_sum(i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return hashed.select("doc_id", simhash.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


_NGRAM_DF_CAP = 50  # shingles in more docs than this are non-discriminative
_NGRAM_PAIR_BUDGET = 20  # per-shingle posting prefix: ≤ K·(K-1)/2 pairs/shingle


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {TOKS_CTE},
{_SH_CTE},
ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
kept AS (
  SELECT doc_id, g, df FROM (
    SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM ex0
  ) WHERE df <= {_NGRAM_DF_CAP}
),
n_tbl AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
posting AS (
  SELECT doc_id, g, df FROM (
    SELECT doc_id, g, df,
           row_number() OVER (PARTITION BY g ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn <= {_NGRAM_PAIR_BUDGET}
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
         max(CASE WHEN a.df > {_NGRAM_PAIR_BUDGET} THEN 1 ELSE 0 END) AS ov
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, shared,
       shared / (na.n + nb.n - shared) AS jaccard,
       ov = 1 AS truncated
FROM pairs
JOIN n_tbl na ON na.doc_id = doc_a
JOIN n_tbl nb ON nb.doc_id = doc_b
WHERE shared / (na.n + nb.n - shared) >= 0.8
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over an inverted-index join (§2.10 dedup_fuzzy).

    Explode distinct shingles → drop shingles whose document frequency
    exceeds {cap} (a stop-shingle in more docs than that identifies
    nothing and fans out O(df²) pairs) → PAIR BUDGET: each surviving
    posting list is truncated to its first {K} doc_ids (deterministic
    row_number prefix), so one shingle can emit at most K·(K-1)/2
    candidate pairs no matter how adversarial the corpus — the worst case
    is now BOUNDED, not argued (round-4 verdict: the ×10 all-dups fixture
    went output-quadratic at 61 s; the budget makes it corpus-linear).
    Pairs that touched a truncated posting carry `truncated = true`
    (their `shared`, hence jaccard, is a lower bound); pairs of docs
    wholly inside every shared prefix are EXACT, and the denominator
    always counts the full kept-shingle space. The equi-join remains the
    candidate pruner: docs sharing zero kept shingles never meet."""
    # Memoized per (session, dataset) like _BANDS_MEMO — repeated calls in
    # one session reuse the cached posting list instead of accumulating a
    # fresh cached copy per invocation.
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _POSTINGS_MEMO.get(memo_key)
    if cached is None:
        sh = _shingle_sets(load(spark, sf_dir, "documents"))
        ex0 = sh.select("doc_id", F.explode("sh").alias("g"))
        # document frequency via groupBy+join, NOT count() OVER
        # (PARTITION BY g): the window form sorts-and-buffers each
        # shingle's ENTIRE posting in one task BEFORE the cap filter can
        # drop it — a stop-shingle in ~10% of a web corpus is a
        # corpus-scale single-task buffer. groupBy is map-side combined
        # (a hot shingle pre-aggregates to one row per input task), and
        # the join back streams posting rows through a hash probe whose
        # build side is the ≤cap-df shingle list — hot shingles simply
        # find no match and are dropped without ever being buffered.
        dfs = ex0.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= _NGRAM_DF_CAP
        )
        kept = ex0.join(dfs, "g")
        n_tbl = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        posting = kept.withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("doc_id"))
        ).filter(F.col("rn") <= _NGRAM_PAIR_BUDGET).drop("rn")
        # Materialize both once — the self-join reads posting twice and the
        # jaccard join reads n_tbl twice. (At 100 TB this is the inverted
        # index: cache MEMORY_AND_DISK or write it to a bucketed table;
        # recomputing tokenize+shingle twice is worse.)
        cached = (posting.cache(), n_tbl.cache())
        _POSTINGS_MEMO[memo_key] = cached
    posting, n_tbl = cached
    a, b = posting.alias("a"), posting.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.max(
                F.when(F.col("a.df") > _NGRAM_PAIR_BUDGET, 1).otherwise(0)
            ).alias("ov"),
        )
    )
    na = n_tbl.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = n_tbl.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(jac >= 0.8)
        .select(
            "doc_a", "doc_b", "shared",
            jac.alias("jaccard"),
            (F.col("ov") == 1).alias("truncated"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle=f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {V.sql_cosine('a.embedding', 'b.embedding')} AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {V.sql_norm('a.embedding')} > 0 AND {V.sql_norm('b.embedding')} > 0
  AND {V.sql_cosine('a.embedding', 'b.embedding')} >= 0.4
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold (§2.10): EXACT
    all-pairs, arranged as blocked-GEMM over applyInPandas (see
    operators/similarity.py — O(n·blocks) shuffle, vectorized numpy inner
    loop, threshold filter inside the kernel). The relational self-join
    form of the same computation evaluates a per-pair expression tree
    interpreted — measured 8 µs/pair vs ~0.1 µs here. Bit-exact vs the
    DuckDB oracle via sequential-fold (cumsum) summation."""
    emb = spread(load(spark, sf_dir, "embeddings"), "vec_id")
    return blocked_allpairs_cosine(emb, threshold=0.4, n_blocks=8)




@register(
    "dedup_levenshtein",
    oracle="""
SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 2
""",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance record matching (§2.10 dedup_fuzzy, the entity-
    resolution flavor): supplier names within Levenshtein distance 2,
    candidates BLOCKED by nation so the quadratic distance only runs
    inside blocks — the classic blocking-key discipline (at 100 TB the
    block key is a cheap canonical form: sorted name tokens, phonetic
    code, or an LSH bucket; never compare across blocks). levenshtein()
    is the same classic DP on both engines → exact integer parity."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    a = s.alias("a")
    b = s.alias("b")
    dist = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .filter(dist <= 2)
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )


@register(
    "dedup_chunk_sig",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
),
chunks AS (
  SELECT doc_id,
         md5(substring(text, s.start, 500)) AS sig
  FROM corpus
  CROSS JOIN LATERAL (SELECT unnest(generate_series(1, length(text), 400)) AS start) s
),
capped AS (
  SELECT sig FROM chunks GROUP BY sig HAVING count(*) <= 20
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM chunks a
  JOIN chunks b ON a.sig = b.sig AND a.doc_id < b.doc_id
  WHERE a.sig IN (SELECT sig FROM capped)
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 2
""",
)
def dedup_chunk_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-fingerprint near-dup detection — the dedup that chunking
    (doc_chunk_overlap) enables: re-crawled/copied documents share
    aligned chunk hashes even when doc ids differ. A deterministic
    re-crawl (every 5th doc cloned under a shifted id) is unioned in so
    the operator has true positives at every SF. Same scale discipline
    as dedup_ngram_jaccard: the join key is the chunk hash (equi-join,
    never corpus×corpus) and hot fingerprints are df-capped (≤20
    carriers) so boilerplate chunks cannot fan out quadratically; pairs
    need ≥2 shared chunks. md5() is the cross-engine fingerprint (bit-
    identical in Spark and DuckDB, unlike xxhash64)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    starts = X.chunk_starts(F.col("text"))  # empty doc → no chunks (pinned)
    chunks = corpus.select(
        "doc_id", F.explode(starts).alias("start"), F.col("text")
    ).select(
        "doc_id", F.md5(F.substring(F.col("text"), F.col("start"), 500)).alias("sig")
    )
    capped = (
        chunks.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("carriers"))
        .filter(F.col("carriers") <= 20)
        .select("sig")
    )
    # materialize the fingerprint stream across an exchange on the join
    # key: both self-join branches then hang off the SAME shuffle subtree
    # and Catalyst plans a ReusedExchange instead of exploding + md5-ing
    # the corpus twice (the r2 minhash lesson)
    safe = chunks.join(capped, "sig").repartition(F.col("sig"))
    a = safe.select(F.col("sig"), F.col("doc_id").alias("doc_a"))
    b = safe.select(F.col("sig"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "sig")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "er_match_score",
    oracle=f"""
WITH crm AS (
  SELECT c_custkey AS crm_id, c_nationkey, c_mktsegment, c_acctbal,
         CASE WHEN c_custkey % 4 = 0 THEN replace(c_name, '0', 'O')
              WHEN c_custkey % 4 = 1 THEN upper(c_name)
              ELSE c_name END AS dirty_name
  FROM customer WHERE c_custkey % 10 = 3
),
scored AS (
  SELECT m.crm_id, c.c_custkey AS master_id,
         CAST(floor((
           0.5 * (1.0 - levenshtein(lower(m.dirty_name), lower(c.c_name))
                  / CAST(greatest(length(m.dirty_name), length(c.c_name)) AS DOUBLE))
           + 0.3 * (CASE WHEN m.c_mktsegment = c.c_mktsegment THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN abs(m.c_acctbal - c.c_acctbal) < 0.005 THEN 1.0 ELSE 0.0 END)
         ) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS score
  FROM crm m JOIN customer c
    ON m.c_nationkey = c.c_nationkey
   AND right(replace(lower(m.dirty_name), 'o', '0'), 3)
       = right(replace(lower(c.c_name), 'o', '0'), 3)
)
SELECT crm_id, master_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY crm_id
                               ORDER BY score DESC, master_id) AS rnk
  FROM scored
) WHERE rnk <= 1
""",
)
def er_match_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution match scoring — the MDM linkage step that takes
    dedup from 'same bytes' to 'same entity': a synthetically-corrupted
    CRM import (char swaps, case damage) is matched back to the master
    table with a weighted score (normalized edit similarity + segment +
    balance agreement), best match per import row. The join is BLOCKED
    on (nation, CANONICALIZED name suffix) — normalize-then-block, the
    real MDM pattern: the canonical key inverts the known corruption
    classes so true matches always share a block, and block cardinality
    GROWS with the data (fixed nation-only blocks measured 10.7× wall at
    10× data — quadratic; with the canonical suffix key the pair space
    is linear). Scoring is pure JVM expressions; the rank prune is
    per-import-row (WindowGroupLimit). Score pre-rounded to 6dp before
    ranking so cross-engine division ulps can't flip an order."""
    c = load(spark, sf_dir, "customer")
    crm = c.where(F.col("c_custkey") % 10 == 3).select(
        F.col("c_custkey").alias("crm_id"),
        F.col("c_nationkey").alias("n_key"),
        F.col("c_mktsegment").alias("m_seg"),
        F.col("c_acctbal").alias("m_bal"),
        F.when(F.col("c_custkey") % 4 == 0, F.replace(F.col("c_name"), F.lit("0"), F.lit("O")))
        .when(F.col("c_custkey") % 4 == 1, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("dirty_name"),
    )
    lev = F.levenshtein(F.lower("dirty_name"), F.lower("c_name"))
    maxlen = F.greatest(F.length("dirty_name"), F.length("c_name")).cast("double")
    score = (
        0.5 * (1.0 - lev / maxlen)
        + 0.3 * (F.col("m_seg") == F.col("c_mktsegment")).cast("double")
        + 0.2 * (F.abs(F.col("m_bal") - F.col("c_acctbal")) < 0.005).cast("double")
    )
    canon = lambda col: F.substring(  # noqa: E731 — canonical block key
        F.replace(F.lower(col), F.lit("o"), F.lit("0")), -3, 3
    )
    scored = crm.join(
        c,
        (crm.n_key == c.c_nationkey)
        & (canon(F.col("dirty_name")) == canon(F.col("c_name"))),
    ).select(
        "crm_id",
        F.col("c_custkey").alias("master_id"),
        hround(score, 6).alias("score"),
    )
    w = Window.partitionBy("crm_id").orderBy(F.col("score").desc(), F.col("master_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 1)
    )


# --- SemDeDup-style semantic curation --------------------------------------

_SEM_CENT_LO, _SEM_CENT_HI = 20, 28  # 8 fixed corpus vectors as centroids
_SEM_TAU = 0.30  # cos-to-centroid above which a non-representative is a dup

_SEM_SQL_BASE = f"""
corp AS (SELECT vec_id, embedding FROM embeddings
         WHERE {V.sql_norm('embedding')} > 0),
cent AS (SELECT vec_id AS cid, embedding AS cvec FROM corp
         WHERE vec_id >= {_SEM_CENT_LO} AND vec_id < {_SEM_CENT_HI}),
sims AS (SELECT corp.vec_id, cent.cid,
                {V.sql_cosine('corp.embedding', 'cent.cvec')} AS cos
         FROM corp CROSS JOIN cent),
assign AS (
  SELECT vec_id, cid AS cell, cos AS cos_cent FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
    FROM sims
  ) WHERE rn = 1
),
rep AS (
  SELECT cell, vec_id AS rep_id FROM (
    SELECT *, row_number() OVER (PARTITION BY cell ORDER BY cos_cent DESC, vec_id) AS rn
    FROM assign
  ) WHERE rn = 1
)"""


@register(
    "dedup_semantic_keep",
    oracle=f"""
WITH {_SEM_SQL_BASE}
SELECT a.vec_id, a.cell,
       {sql_round('a.cos_cent', 6)} AS cos_cent,
       CASE WHEN a.vec_id = r.rep_id THEN 'keep'
            WHEN a.cos_cent >= {_SEM_TAU} THEN 'drop'
            ELSE 'unique' END AS role
FROM assign a JOIN rep r USING (cell)
""",
)
def dedup_semantic_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings into coarse cells, keep ONE representative per
    cell, and drop the non-representatives that sit close enough to the
    cell centroid to be semantic duplicates; far members stay as
    'unique'. Centroids are 8 fixed corpus vectors (the same
    deterministic-IVF discipline as sim_search_ivf — real pipelines
    train k-means first; the engine shape is identical and the oracle
    stays exact).

    Scale shape: assignment is corpus × 8 broadcast centroids — a
    broadcast nested product with a per-row argmax, never a corpus
    shuffle. The representative per cell is a groupBy(cell).max_by —
    partial-aggregated and skew-safe even though there are only 8 cells
    (each partition contributes ONE candidate per cell) — explicitly not
    a window over cell, which would drag every member of a cell onto a
    single reducer. The rep table (8 rows) broadcasts back. The cosine
    math is the shared fold in functions/vectors.py → bit-identical to
    the DuckDB oracle, so the >= tau comparison can't straddle engines."""
    emb = spread(load(spark, sf_dir, "embeddings"), "vec_id").filter(
        V.norm("embedding") > 0
    )
    cent = (
        emb.filter(
            (F.col("vec_id") >= _SEM_CENT_LO) & (F.col("vec_id") < _SEM_CENT_HI)
        )
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    sims = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        V.cosine("embedding", "cvec").alias("cos"),
    )
    # argmax cell per vector as a hash aggregate, not a window: the
    # broadcast product left the corpus hash-partitioned on vec_id, so
    # the groupBy plans with NO exchange and the map-side partial agg
    # collapses the 8× centroid fan-out in place (a window would add a
    # per-partition sort for the same answer).
    assign = sims.groupBy("vec_id").agg(
        F.expr("max_by(cid, struct(cos, -cid))").alias("cell"),
        F.max("cos").alias("cos_cent"),
    )
    rep = assign.groupBy("cell").agg(
        F.expr("max_by(vec_id, struct(cos_cent, -vec_id))").alias("rep_id")
    )
    return assign.join(F.broadcast(rep), "cell").select(
        "vec_id",
        "cell",
        hround(F.col("cos_cent"), 6).alias("cos_cent"),
        F.when(F.col("vec_id") == F.col("rep_id"), F.lit("keep"))
        .when(F.col("cos_cent") >= _SEM_TAU, F.lit("drop"))
        .otherwise(F.lit("unique"))
        .alias("role"),
    )
