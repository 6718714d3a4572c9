"""§2.10 text analysis: tokenize, stats, quality scoring, token counting,
lang-ID, document fingerprinting, PII redaction, repetition metrics,
TF-IDF. Split from suite/llm.py in round 2.

Everything is built-in higher-order functions / regexp over the token
array — zero Python in the hot path, no explode unless the output is
per-token.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.functions import hashing as H
from mongodb_mysql_cdc_spark.functions import text as X
from mongodb_mysql_cdc_spark.functions import vectors as V
from mongodb_mysql_cdc_spark.functions.compat import hround, sql_round
from mongodb_mysql_cdc_spark.operators.partitioning import spread
from mongodb_mysql_cdc_spark.registry import register

# Shared DuckDB CTE: lowercased whitespace tokens (matches functions/text.py).
TOKS_CTE = (
    "toks AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t "
    "FROM documents)"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_tokenize",
    oracle=f"""
WITH {TOKS_CTE}
SELECT doc_id, unnest(list_transform(t, (x, i) -> {{'pos': i - 1, 'token': x}}), recursive := true)
FROM toks
""",
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize to (doc_id, pos, token) rows (§2.10 text_tokenize).
    posexplode keeps token order observable; 0-based on both engines."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", F.posexplode(X.tokens(F.col("text"))).alias("pos", "token"))


@register(
    "text_stats",
    oracle=f"""
WITH {TOKS_CTE},
ex AS (SELECT doc_id, unnest(t) AS token FROM toks)
SELECT token, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
FROM ex GROUP BY token
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term statistics: total occurrences + document frequency per
    token (§2.10 text_stats). One explode + one agg; partial aggregation
    collapses each partition to its vocabulary before the shuffle, so
    shuffle volume is O(vocab), not O(tokens)."""
    docs = load(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    return ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )


_SW = ", ".join(f"'{w}'" for w in X.STOPWORDS)


@register(
    "text_quality",
    oracle=f"""
WITH {TOKS_CTE}
SELECT
  doc_id,
  len(t) AS n_tokens,
  len(list_distinct(t)) AS n_distinct,
  len(list_filter(t, x -> x IN ({_SW}))) / greatest(len(t), 1) AS stopword_ratio,
  list_reduce(list_transform(t, x -> CAST(length(x) AS BIGINT)), (a, b) -> a + b)
    / greatest(len(t), 1) AS avg_token_len,
  len(list_distinct(t)) / greatest(len(t), 1) AS type_token_ratio,
  CASE WHEN len(t) >= 40
        AND len(list_filter(t, x -> x IN ({_SW}))) / greatest(len(t), 1) <= 0.5
        AND len(list_distinct(t)) / greatest(len(t), 1) >= 0.2
       THEN 'keep' ELSE 'drop' END AS quality_band
FROM toks
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (§2.10): length, lexical diversity,
    stopword density, and a keep/drop band — the standard pre-training
    corpus filter. Pure array HOFs, no explode, fully codegen'd; ratios are
    exact int/int double divisions → bit-identical cross-engine."""
    docs = load(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t"))
    n = F.size("t")
    sw = X.stopword_ratio(F.col("t"))
    ttr = X.type_token_ratio(F.col("t"))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        sw.alias("stopword_ratio"),
        X.avg_token_len(F.col("t")).alias("avg_token_len"),
        ttr.alias("type_token_ratio"),
        F.when((n >= 40) & (sw <= 0.5) & (ttr >= 0.2), "keep")
        .otherwise("drop")
        .alias("quality_band"),
    )


@register(
    "token_count",
    oracle=f"""
WITH {TOKS_CTE}
SELECT
  doc_id,
  len(t) AS n_ws_tokens,
  list_reduce(list_transform(t, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)), (a, b) -> a + b)
    AS n_bpe_tokens
FROM toks
""",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (§2.10): whitespace tokens plus a deterministic
    BPE-like estimate (ceil(len/4) pieces per word — the ~4-chars/token
    heuristic; a real BPE vocab isn't in this container)."""
    docs = load(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t"))
    return d.select(
        "doc_id",
        F.size("t").alias("n_ws_tokens"),
        X.bpe_ish_token_count(F.col("t")).alias("n_bpe_tokens"),
    )


_PROFILES = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "les", "et", "des", "un"),
}
_CJK_RE = "[一-鿿]"
_CYR_RE = "[Ѐ-ӿ]"


def _lang_oracle() -> str:
    scores = {
        lang: f"len(list_filter(t, x -> x IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in _PROFILES.items()
    }
    return f"""
WITH {TOKS_CTE}
SELECT
  doc_id,
  lang AS labeled_lang,
  CASE WHEN regexp_matches(array_to_string(t, ' '), '{_CJK_RE}') THEN 'zh'
       WHEN regexp_matches(array_to_string(t, ' '), '{_CYR_RE}') THEN 'ru'
       WHEN {scores['es']} > {scores['en']} AND {scores['es']} >= {scores['fr']} THEN 'es'
       WHEN {scores['fr']} > {scores['en']} THEN 'fr'
       ELSE 'en' END AS predicted_lang,
  {scores['en']} AS score_en,
  {scores['es']} AS score_es,
  {scores['fr']} AS score_fr
FROM toks
"""


@register("lang_id", oracle=_lang_oracle())
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (§2.10): script detection (CJK/Cyrillic regex)
    first, then function-word profile scores with a deterministic argmax
    (es > en ≥ fr chain). Honest caveat: the harness corpus is English word
    soup for every label, so the heuristic output (mostly 'en') is compared
    as a deterministic computation, not as classifier accuracy."""
    docs = load(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    d = docs.select("doc_id", F.col("lang").alias("labeled_lang"), t.alias("t"))
    joined = F.concat_ws(" ", F.col("t"))

    def score(lang: str):
        return F.size(F.filter("t", lambda x: x.isin(*_PROFILES[lang])))

    s_en, s_es, s_fr = score("en"), score("es"), score("fr")
    return d.select(
        "doc_id",
        "labeled_lang",
        F.when(joined.rlike(_CJK_RE), "zh")
        .when(joined.rlike(_CYR_RE), "ru")
        .when((s_es > s_en) & (s_es >= s_fr), "es")
        .when(s_fr > s_en, "fr")
        .otherwise("en")
        .alias("predicted_lang"),
        s_en.alias("score_en"),
        s_es.alias("score_es"),
        s_fr.alias("score_fr"),
    )


@register(
    "doc_fingerprint",
    oracle=f"""
WITH {TOKS_CTE}
SELECT doc_id, len(t) AS n_tokens, {H.sql_rolling_fingerprint('t')} AS fingerprint
FROM toks WHERE len(t) > 0
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (§2.10): left fold
    acc = (acc*31 + hash60(tok) mod M) mod M. Unlike MinHash this
    distinguishes permuted content; used for exact-ish content identity in
    incremental re-crawls."""
    docs = load(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    d = docs.select("doc_id", t.alias("t")).filter(F.size("t") > 0)
    return d.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        H.rolling_fingerprint(F.col("t")).alias("fingerprint"),
    )


@register(
    "text_redact",
    oracle="""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           concat(substr(text, 1, 40), ' contact user', CAST(doc_id AS VARCHAR),
                  '@mail.example tel 555-', CAST(doc_id AS VARCHAR)),
           '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
         '[0-9][0-9-]+', '<NUM>', 'g') AS redacted
FROM documents
""",
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern redaction (§2.10 text analysis): mask email addresses
    and number runs before a corpus ships to training — pure JVM-side
    regexp_replace, no UDF. The harness text is clean word soup, so a
    deterministic synthetic contact suffix is appended first to prove the
    masking actually fires; patterns stay in the regex subset Java and RE2
    agree on (character classes only, no lookaround)."""
    docs = load(spark, sf_dir, "documents")
    dirty = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example tel 555-"),
        F.col("doc_id").cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(dirty, "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
        "[0-9][0-9-]+",
        "<NUM>",
    )
    return docs.select("doc_id", redacted.alias("redacted"))


@register(
    "text_repetition",
    oracle=f"""
WITH {TOKS_CTE},
sh AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                     i -> array_to_string(t[i:i+2], ' ')) AS s
       FROM toks WHERE greatest(len(t)-2, 0) > 0),
ex AS (SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g FROM sh),
counts AS (SELECT doc_id, g, max(n_shingles) AS n_shingles, count(*) AS c
           FROM ex GROUP BY doc_id, g)
SELECT doc_id, max(n_shingles) AS n_shingles, max(c) AS max_repeat,
       max(c) / greatest(max(n_shingles), 1) AS repetition_ratio
FROM counts GROUP BY doc_id
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality metric (§2.10, the Gopher duplicate-n-gram rule):
    the most frequent 3-gram's share of all 3-grams. Boilerplate and
    looping generations score high and get filtered before training.
    Explode + two aggregations; shuffle keyed on (doc, shingle) — scales
    like text_stats."""
    docs = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    sh = spread(docs, "doc_id").select(
        "doc_id", X.word_shingles(toks, 3).alias("s")
    ).filter(F.size("s") > 0)
    ex = sh.select("doc_id", F.size("s").alias("n_shingles"), F.explode("s").alias("g"))
    counts = ex.groupBy("doc_id", "g").agg(
        F.max("n_shingles").alias("n_shingles"), F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("doc_id").agg(
        F.max("n_shingles").alias("n_shingles"),
        F.max("c").alias("max_repeat"),
        (F.max("c") / F.greatest(F.max("n_shingles"), F.lit(1))).alias("repetition_ratio"),
    )


@register(
    "tfidf",
    oracle=f"""
WITH {TOKS_CTE},
ex AS (SELECT doc_id, unnest(t) AS token FROM toks),
tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM ex GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token, tf.tf, df.df,
       {sql_round('tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)', 6)} AS tfidf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
""",
)
def tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weighting (§2.10): smooth idf = ln((N+1)/(df+1)) + 1.
    Two aggregations + a broadcast join on the (vocab-sized) df table and
    the 1-row corpus count — no O(corpus) shuffle beyond the tf groupBy.
    ln() differs by ulps across libm implementations → rounded to 6dp on
    both sides (the only rounding this module needs)."""
    docs = load(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    tf = ex.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = ex.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "token", "tf", "df", hround(F.col("tf") * idf, 6).alias("tfidf"))
    )




@register(
    "text_ngram_freq",
    oracle=f"""
WITH {TOKS_CTE},
bi AS (
  SELECT unnest(list_transform(
    generate_series(1, greatest(len(t) - 1, 0)),
    i -> array_to_string(t[i:i+1], ' '))) AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, count(*) AS freq
FROM bi
GROUP BY bigram
HAVING count(*) >= 20
""",
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (the n-gram LM / collocation
    primitive): shingle(2) → explode → count, thresholded to the
    vocabulary head. Same exchange-keyed tokenize barrier as every
    shingle pipeline; the aggregate is map-side combined on the bigram,
    so shuffle volume is |distinct bigrams|, not |tokens|."""
    d = load(spark, sf_dir, "documents")
    tok_df = d.select("doc_id", X.tokens(F.col("text")).alias("t")).repartition(
        F.col("doc_id")
    )
    bi = tok_df.filter(F.size("t") >= 2).select(
        F.explode(X.word_shingles(F.col("t"), 2)).alias("bigram")
    )
    return (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 20)
    )


@register(
    "text_entropy",
    oracle=f"""
WITH {TOKS_CTE},
ex AS (SELECT doc_id, unnest(t) AS token FROM toks),
c AS (SELECT doc_id, token, count(*) AS cnt FROM ex GROUP BY doc_id, token)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       count(*)                 AS n_types,
       {sql_round('count(*) / CAST(sum(cnt) AS DOUBLE)', 6)} AS ttr,
       {sql_round('log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt)', 6)} AS entropy
FROM c
GROUP BY doc_id
""",
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram word-distribution entropy + type-token ratio per document —
    the information-density quality signals (low entropy ≈ repetitive
    boilerplate; low TTR ≈ keyword stuffing) a pretraining filter keys on.

    H = -Σ (c/n)·log2(c/n) is folded to log2(n) - Σ c·log2(c) / n so the
    whole thing is ONE two-phase hash aggregation pipeline (token counts,
    then per-doc moments) — no window, no second pass over tokens; shuffle
    volume is |distinct (doc, token)| then |docs|."""
    docs = load(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    c = ex.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt")
    return c.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        hround(F.count(F.lit(1)) / n.cast("double"), 6).alias("ttr"),
        hround(
            F.log2(n) - F.sum(F.col("cnt") * F.log2("cnt")) / n, 6
        ).alias("entropy"),
    )


@register(
    "token_oov_rate",
    oracle=f"""
WITH {TOKS_CTE},
ex AS (SELECT doc_id, unnest(t) AS token FROM toks),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS freq FROM ex GROUP BY token
  ) ORDER BY freq DESC, token LIMIT 10
)
SELECT ex.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       {sql_round('sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)', 6)} AS oov_rate
FROM ex LEFT JOIN vocab v ON ex.token = v.token
GROUP BY ex.doc_id
""",
)
def token_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own head
    vocabulary (top-10 tokens by frequency, ties broken by token) — the
    tokenizer-coverage metric a pretraining pipeline computes before
    committing to a vocab. Two-pass shape: the vocab fits the driver by
    construction (top-K of a frequency aggregate), so the membership test
    is a BROADCAST left join — the corpus-sized side never shuffles for
    the join, only for its own per-doc aggregate."""
    docs = load(spark, sf_dir, "documents")
    ex = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("token"))
    vocab = (
        ex.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(10)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    joined = ex.join(F.broadcast(vocab), "token", "left")
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.alias("n_oov"),
        hround(oov / F.count(F.lit(1)).cast("double"), 6).alias("oov_rate"),
    )


@register(
    "quality_ensemble",
    oracle=f"""
WITH {TOKS_CTE},
q AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         len(list_filter(t, x -> x IN ({_SW}))) / greatest(len(t), 1) AS sw_ratio,
         len(list_distinct(t)) / greatest(len(t), 1) AS ttr
  FROM toks
),
sh AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                     i -> array_to_string(t[i:i+2], ' ')) AS s
       FROM toks WHERE greatest(len(t)-2, 0) > 0),
ex AS (SELECT doc_id, len(s) AS n_shingles, unnest(s) AS g FROM sh),
rep AS (
  SELECT doc_id, max(c) / greatest(max(n_shingles), 1) AS rep_ratio FROM (
    SELECT doc_id, g, max(n_shingles) AS n_shingles, count(*) AS c
    FROM ex GROUP BY doc_id, g
  ) GROUP BY doc_id
)
SELECT q.doc_id, q.n_tokens, q.sw_ratio, q.ttr,
       coalesce(rep.rep_ratio, 0.0) AS rep_ratio,
       CASE WHEN q.n_tokens < 40 THEN 'too_short'
            WHEN q.sw_ratio > 0.5 THEN 'stopword_heavy'
            WHEN q.ttr < 0.2 THEN 'low_diversity'
            WHEN coalesce(rep.rep_ratio, 0.0) > 0.2 THEN 'repetitive'
            ELSE 'keep' END AS verdict
FROM q LEFT JOIN rep ON q.doc_id = rep.doc_id
""",
)
def quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-filter GATE: length, stopword density, lexical diversity
    and the Gopher repetition rule combined into one verdict, with the
    FIRST failing rule as the drop reason (the audit trail a curation
    pipeline reports per document). The cheap narrow signals compute in
    one projection; only the repetition signal needs its shingle
    aggregation, left-joined back on doc_id — at 100 TB the narrow rules
    prune first and the expensive signal runs on survivors."""
    docs = load(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    q = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        X.stopword_ratio(t).alias("sw_ratio"),
        X.type_token_ratio(t).alias("ttr"),
    )
    sh = spread(docs, "doc_id").select(
        "doc_id", X.word_shingles(t, 3).alias("s")
    ).filter(F.size("s") > 0)
    ex = sh.select("doc_id", F.size("s").alias("n_shingles"), F.explode("s").alias("g"))
    rep = (
        ex.groupBy("doc_id", "g")
        .agg(F.max("n_shingles").alias("n_shingles"), F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c") / F.greatest(F.max("n_shingles"), F.lit(1))).alias("rep_ratio")
        )
    )
    j = q.join(rep, "doc_id", "left").withColumn(
        "rep_ratio", F.coalesce(F.col("rep_ratio"), F.lit(0.0))
    )
    verdict = (
        F.when(F.col("n_tokens") < 40, "too_short")
        .when(F.col("sw_ratio") > 0.5, "stopword_heavy")
        .when(F.col("ttr") < 0.2, "low_diversity")
        .when(F.col("rep_ratio") > 0.2, "repetitive")
        .otherwise("keep")
    )
    return j.select(
        "doc_id", "n_tokens", "sw_ratio", "ttr", "rep_ratio", verdict.alias("verdict")
    )
