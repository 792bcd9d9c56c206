"""Text-analysis queries over ``documents`` (token counting, n-grams,
language-ID, quality scoring, fingerprinting) — SURVEY.md §7 step 8 /
north-star extensions, built on ``pygdf_spark.operators.text``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pygdf_spark.operators import text as X
from pygdf_spark.queries._util import T, spread


def text_token_stats(spark, sf_dir):
    d = spread(T(spark, sf_dir, "documents"))  # 1-task scan: guide §2.5
    toks = X.tokens("text")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        X.token_count("text").alias("n_tokens"),
        X.bpe_ish_count("text").alias("n_bpe_ish"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(X.normalize_spaces("text")).alias("n_chars_norm"),
    ).orderBy("doc_id")


TEXT_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       LENGTH(text) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_ish,
       CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS INT) AS n_distinct_tokens,
       LENGTH(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS n_chars_norm
FROM documents ORDER BY doc_id
"""


def text_ngrams_top(spark, sf_dir):
    """top word-bigrams corpus-wide (generate_ngrams.hpp:58): explode →
    count → deterministic top-25."""
    d = T(spark, sf_dir, "documents")
    return (
        d.select(F.explode(X.ngrams("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(25)
    )


TEXT_NGRAMS_SQL = r"""
WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
grams AS (
  SELECT UNNEST(list_transform(generate_series(1, greatest(len(w)-1, 0)),
                i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM words
)
SELECT bigram, COUNT(*) AS cnt FROM grams
GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 25
"""


def text_langid(spark, sf_dir):
    """heuristic language-ID vs the labeled lang column."""
    d = T(spark, sf_dir, "documents")
    pred = X.lang_id("text")
    return (
        d.select("lang", pred.alias("pred"))
        .groupBy("lang", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


def _langid_sql() -> str:
    score = {
        lg: f"len(regexp_extract_all(LOWER(text), '\\b({'|'.join(ws)})\\b'))"
        for lg, ws in X.LANG_MARKERS.items()
    }
    langs = list(X.LANG_MARKERS)
    best = "greatest(" + ", ".join(score[lg] for lg in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lg in langs:
        case += f"WHEN {score[lg]} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return f"""
SELECT lang, {case} AS pred, COUNT(*) AS n
FROM documents GROUP BY lang, pred ORDER BY lang, pred
"""


def text_quality(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return X.quality_features(d).orderBy("doc_id")


TEXT_QUALITY_SQL = r"""
SELECT doc_id,
       LENGTH(text) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
       ROUND(CAST(len(regexp_extract_all(text, '[^\p{L}\p{N}\s]')) AS DOUBLE) / greatest(LENGTH(text), 1), 8) AS punct_ratio,
       ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(LENGTH(text), 1), 8) AS digit_ratio,
       ROUND(CAST(len(regexp_extract_all(LOWER(text), '\b(the|a|of|and|to|is|in)\b')) AS DOUBLE)
             / greatest(len(string_split_regex(trim(text), '\s+')), 1), 8) AS stop_ratio,
       ROUND(
         0.3 * least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0)
       + 0.3 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^\p{L}\p{N}\s]')) AS DOUBLE) / greatest(LENGTH(text),1) * 10.0, 1.0))
       + 0.2 * (1.0 - least(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(LENGTH(text),1) * 10.0, 1.0))
       + 0.2 * least(CAST(len(regexp_extract_all(LOWER(text), '\b(the|a|of|and|to|is|in)\b')) AS DOUBLE)
                     / greatest(len(string_split_regex(trim(text), '\s+')), 1) * 5.0, 1.0)
       , 8) AS quality
FROM documents ORDER BY doc_id
"""


def text_fingerprint(spark, sf_dir):
    """doc fingerprint: md5 hex + u64-mod numeric bucket key."""
    from pygdf_spark.functions.hashing import MERSENNE_P

    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.doc_fingerprint("text").alias("fp"),
        (X.fingerprint_u64("text") % MERSENNE_P).cast("long").alias("fp_bucket"),
    ).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(LOWER(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
       CAST(md5_number_lower(LOWER(trim(regexp_replace(text, '\s+', ' ', 'g')))) % 2147483647 AS BIGINT) AS fp_bucket
FROM documents ORDER BY doc_id
"""


def text_pii_mask(spark, sf_dir):
    """PII scrubbing — the redaction stage of a curation pipeline.
    The synthetic corpus has no PII, so each doc is salted with a
    deterministic fake email + phone, then masked; the check proves
    the masks catch exactly the injected spans (zero residue) while
    the surrounding text survives. Pure regexp_replace chain — JVM
    expressions, no Python."""
    d = T(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9\-\s]{6,}[0-9]"
    masked = F.regexp_replace(
        F.regexp_replace(salted, email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.length(salted).alias("n_salted"),
        F.length(masked).alias("n_masked"),
        F.size(F.split(masked, r"\[EMAIL\]")).alias("n_email_hits_p1"),
        F.size(F.split(masked, r"\[PHONE\]")).alias("n_phone_hits_p1"),
        (~masked.rlike(email_re) & ~masked.rlike(phone_re)).alias("clean"),
    ).orderBy("doc_id")


TEXT_PII_SQL = r"""
WITH salted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
  FROM documents
),
masked AS (
  SELECT doc_id, s,
         regexp_replace(
           regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
           '\+?[0-9][0-9\-\s]{6,}[0-9]', '[PHONE]', 'g') AS m
  FROM salted
)
SELECT doc_id,
       LENGTH(s) AS n_salted,
       LENGTH(m) AS n_masked,
       CAST(len(string_split_regex(m, '\[EMAIL\]')) AS INT) AS n_email_hits_p1,
       CAST(len(string_split_regex(m, '\[PHONE\]')) AS INT) AS n_phone_hits_p1,
       NOT regexp_matches(m, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
       AND NOT regexp_matches(m, '\+?[0-9][0-9\-\s]{6,}[0-9]') AS clean
FROM masked ORDER BY doc_id
"""


def text_repetition(spark, sf_dir):
    """Intra-document repetition score — the n-gram repetition filter
    (Gopher/C4-style): fraction of word bigrams that are repeats of an
    earlier bigram in the SAME document. High ratio = boilerplate /
    degenerate text; a standard pretraining quality gate.

    All in-row array arithmetic (one staged n-gram evaluation per
    document — see the dup-HOF rule in tools/audit_plans.py), no
    shuffle until the final deterministic sort."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    staged = d.select("doc_id", X.ngrams("text", 2).alias("g"))
    n_total = F.size("g")
    n_distinct = F.size(F.array_distinct("g"))
    return staged.select(
        "doc_id",
        n_total.alias("n_bigrams"),
        n_distinct.alias("n_distinct"),
        F.when(n_total > 0,
               F.round(F.lit(1.0) - n_distinct.cast("double") / n_total, 8)
               ).otherwise(F.lit(0.0)).alias("rep_ratio"),
    ).orderBy("doc_id")


TEXT_REPETITION_SQL = r"""
WITH g AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                        i -> w[i] || ' ' || w[i+1]) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents WHERE doc_id < 300)
)
SELECT doc_id,
       CAST(len(grams) AS INT) AS n_bigrams,
       CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 8)
            ELSE 0.0 END AS rep_ratio
FROM g ORDER BY doc_id
"""


def text_lm_frequency(spark, sf_dir):
    """Corpus-statistics quality proxy (the CCNet-style LM-filter shape
    without the float log): score each document by the corpus-wide
    document frequency of its bigrams — garbled/unusual text scores
    low, boilerplate scores high. Two keyed shuffles: the corpus bigram
    count (vocabulary-bounded table) and the per-doc rollup; the join
    key is the short bigram string. Exact integer output
    (avg_df_x100 = sum_df*100 div n_bg) — no float accumulation."""
    d = T(spark, sf_dir, "documents")
    bg = d.select("doc_id", F.explode(X.ngrams("text", 2)).alias("g"))
    counts = bg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        bg.join(counts, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bg"), F.sum("df").cast("long").alias("sum_df"))
    )
    return (
        per_doc.filter(F.col("doc_id") < 300)
        .select(
            "doc_id", "n_bg", "sum_df",
            F.expr("sum_df * 100 div n_bg").alias("avg_df_x100"),
        )
        .orderBy("doc_id")
    )


TEXT_LM_FREQ_SQL = r"""
WITH bg AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)
),
counts AS (SELECT g, COUNT(*) AS df FROM bg GROUP BY g),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bg, CAST(SUM(df) AS BIGINT) AS sum_df
  FROM bg JOIN counts USING (g) GROUP BY doc_id
)
SELECT doc_id, n_bg, sum_df, sum_df * 100 // n_bg AS avg_df_x100
FROM per_doc WHERE doc_id < 300 ORDER BY doc_id
"""



#: shared BM25 parameters/terms (also used by search_hybrid_rrf)
BM25_TERMS = ["hash", "join", "window"]


def bm25_scores(spark, sf_dir, terms=None):
    """(doc_id, bm25) for every document — the shared scoring pipeline
    behind text_bm25_topk and search_hybrid_rrf: in-row tf per term,
    one global df/N/len agg broadcast back, Lucene-smoothed IDF,
    k1=1.2 / b=0.75, rounded to 6 dp."""
    terms = terms or BM25_TERMS
    d = T(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")

    def _tf(term):
        # NB: F.filter reads a 2-arg lambda as (element, index) — term
        # must be captured by closure, never by default arg
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)]
    per_doc = d.select("doc_id", F.size(toks).alias("dl"), *tf_cols)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    k1, b = F.lit(1.2), F.lit(0.75)
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        df_ = F.col(f"df{i}").cast("double")
        n = F.col("n_docs").cast("double")
        avg = F.col("total_len").cast("double") / n
        idf = F.log((n - df_ + 0.5) / (df_ + 0.5) + 1.0)
        part = idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / avg)
        )
        score = part if score is None else score + part
    return scored.select("doc_id", F.round(score, 6).alias("bm25"))


#: the matching oracle CTE block (per_doc/stats/bm) — single source of
#: truth for both BM25 oracles
BM25_CTES = r"""per_doc AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS dl,
         len(list_filter(string_split_regex(trim(text), '\s+'), x -> x = 'hash')) AS tf0,
         len(list_filter(string_split_regex(trim(text), '\s+'), x -> x = 'join')) AS tf1,
         len(list_filter(string_split_regex(trim(text), '\s+'), x -> x = 'window')) AS tf2
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len,
         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM per_doc
),
bm AS (
  SELECT doc_id,
         ROUND(
           ln((CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
             * CAST(tf0 AS DOUBLE) * (1.2 + 1.0)
             / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         + ln((CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
             * CAST(tf1 AS DOUBLE) * (1.2 + 1.0)
             / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         + ln((CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
             * CAST(tf2 AS DOUBLE) * (1.2 + 1.0)
             / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         , 6) AS bm25
  FROM per_doc CROSS JOIN stats
)"""


def text_bm25_topk(spark, sf_dir):
    """Distributed BM25 retrieval (k1=1.2, b=0.75; Lucene-style
    smoothed IDF) for a 3-term query — the lexical-search scoring a
    corpus pipeline pairs with the embedding ANN path. Scale shape (see
    bm25_scores): per-term tf comes from an IN-ROW filter over the
    token array (no explode, no (term, doc) shuffle); df/N/avg_len come
    from ONE global agg collapsed to a 1-row broadcast; scoring is a
    map-side expression; top-k is TakeOrderedAndProject. Two corpus
    scans, zero corpus-sized shuffles."""
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


TEXT_BM25_SQL = f"""
WITH {BM25_CTES}
SELECT doc_id, bm25 FROM bm
ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""


def text_vocab_coverage(spark, sf_dir):
    """Tokenizer-prep vocabulary coverage: build the top-64 corpus
    vocabulary (count desc, token asc — deterministic), then measure
    per-source token coverage and OOV rate against it. The vocab is a
    bounded broadcast (real tokenizers cap vocab at 32–256k); the
    corpus side is one explode + broadcast join + keyed agg — the same
    two-scan, no-corpus-shuffle shape as BM25's stats pass."""
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(64)
        .select("tok", F.lit(True).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__in_vocab").isNotNull().cast("long")).alias("n_in_vocab"),
            F.round(
                F.sum(F.col("__in_vocab").isNull().cast("long"))
                / F.count(F.lit(1)).cast("double"),
                8,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


TEXT_VOCAB_COVERAGE_SQL = r"""
WITH toks AS (
  SELECT source, UNNEST(string_split_regex(trim(text), '\s+')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ORDER BY cnt DESC, tok ASC LIMIT 64
  )
)
SELECT source, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
       ROUND(SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 0 ELSE 1 END)
             / CAST(COUNT(*) AS DOUBLE), 8) AS oov_rate
FROM toks GROUP BY source ORDER BY source
"""


def text_tfidf_top(spark, sf_dir):
    """TF-IDF term ranking, all-integer (top-3 terms per doc). idf is
    the scaled floor ratio (N*1000) div df — exact in both engines, no
    transcendental ln whose last bit could differ. Shape at scale:
    tf is one (doc,term) shuffle; df is a second agg over the SAME
    keys' distinct pairs; the df table is vocab-sized, so the score
    join broadcasts; top-3 is a partitioned WindowGroupLimit. No
    driver materialization anywhere."""
    from pyspark.sql import Window

    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks"))
    )
    tokens = d.select("doc_id", F.explode("toks").alias("term")).filter(
        F.col("term") != ""
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf",
            (F.col("tf") * F.expr("(n * 1000) div df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "score", "rk")
        .orderBy("doc_id", "rk")
    )


TEXT_TFIDF_SQL = r"""
WITH docs AS (
  SELECT doc_id, string_split_regex(trim(LOWER(text)), '\s+') AS toks
  FROM documents WHERE doc_id < 100
),
tokens AS (
  SELECT doc_id, unnest(toks) AS term FROM docs
),
toks2 AS (SELECT doc_id, term FROM tokens WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2 GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks2 GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM docs),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * ((n.n * 1000) // df.df) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score,
       CAST(rk AS INT) AS rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM scored)
WHERE rk <= 3 ORDER BY doc_id, rk
"""


def text_chunk_split(spark, sf_dir):
    """Training-data chunker: split each document into fixed-size token
    windows (size 50, stride 40 → 10-token overlap) — the standard
    pretraining chunk step between cleaning and packing. Map-side only:
    tokenize → per-row chunk-count arithmetic → explode(sequence) →
    slice; output volume is Σ ceil((n−size)/stride)+1 rows, linear in
    corpus tokens, zero shuffles before the fixture's orderBy. The
    chunk fingerprint (md5 of the joined window) feeds incremental
    dedup downstream."""
    size, stride = 50, 40
    d = (
        T(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select(
            "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
        )
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    # ceil((n-size)/stride): add stride-1 before the floor-div
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(F.col("n") - size, F.lit(0)) + stride - 1) / stride
    ).cast("int")
    chunks = d.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    start = F.col("chunk_id") * stride + 1
    # stage the window ONCE (dup-HOF rule, tools/audit_plans.py): three
    # direct slice() references tripled the generated code and cost
    # ~10 s of one-time codegen on the first run
    staged = chunks.select(
        "doc_id", "chunk_id", F.slice("toks", start, size).alias("w")
    )
    return (
        staged.select(
            "doc_id",
            "chunk_id",
            F.size("w").alias("chunk_tokens"),
            F.element_at("w", 1).alias("first_tok"),
            F.md5(F.array_join("w", " ")).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_id")
    )


TEXT_CHUNK_SQL = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(LOWER(text)), '\s+') AS toks,
         len(string_split_regex(trim(LOWER(text)), '\s+')) AS n
  FROM documents WHERE doc_id < 200
),
nz AS (SELECT * FROM d WHERE n > 0),
c AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, CAST(1 + FLOOR((GREATEST(n - 50, 0) + 39) / 40.0) AS INT) - 1)) AS chunk_id
  FROM nz
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(list_slice(toks, chunk_id * 40 + 1, chunk_id * 40 + 50)) AS INT) AS chunk_tokens,
       toks[chunk_id * 40 + 1] AS first_tok,
       md5(array_to_string(list_slice(toks, chunk_id * 40 + 1, chunk_id * 40 + 50), ' ')) AS chunk_fp
FROM c ORDER BY doc_id, chunk_id
"""


def text_pmi_bigrams(spark, sf_dir):
    """PMI collocation extraction (corpus-statistics op a curation
    pipeline runs for phrase mining / tokenizer seeding): lift =
    P(xy)/(P(x)P(y)) = c_xy·N/(c_x·c_y) for word bigrams with support
    ≥ 5, top 25 by lift. Ranking by lift is ranking by PMI (log is
    monotonic) without putting a libm call in the hash path; the lift
    itself is ONE double expression over exact int64 counts, identical
    in both engines. Two corpus shuffles (unigram + bigram counts);
    the unigram table is vocab-sized and broadcasts — at web scale
    swap the two marked broadcasts for shuffle joins."""
    d = spread(T(spark, sf_dir, "documents"))  # 1-task scan: guide §2.5
    # persisted: the vocab-sized unigram relation feeds THREE plan
    # branches (tot, ux, uy) — without the cache boundary each branch
    # re-runs the corpus explode+shuffle (opt r7, guide §5: reuse ≫
    # recompute for a small, thrice-read intermediate; the bench and
    # gates clear the cache between runs, so nothing survives a run)
    uni = (
        d.select(F.explode(X.tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .persist()
    )
    big = (
        d.select(F.explode(X.ngrams("text", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
        .withColumn("x", F.split("bigram", " ").getItem(0))
        .withColumn("y", F.split("bigram", " ").getItem(1))
    )
    tot = uni.agg(F.sum("c_w").alias("n_tokens"))  # 1 row
    ux = uni.select(F.col("w").alias("x"), F.col("c_w").alias("c_x"))
    uy = uni.select(F.col("w").alias("y"), F.col("c_w").alias("c_y"))
    scored = (
        big.join(F.broadcast(ux), "x")   # vocab-sized
        .join(F.broadcast(uy), "y")      # vocab-sized
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram", "c_xy", "c_x", "c_y",
            (
                F.col("c_xy").cast("double") * F.col("n_tokens")
                / (F.col("c_x") * F.col("c_y"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), F.asc("bigram")).limit(25)


TEXT_PMI_SQL = r"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS w FROM documents
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM toks
  WHERE w <> '' GROUP BY w
),
tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_tokens FROM uni),
words AS (SELECT string_split_regex(trim(text), '\s+') AS ws FROM documents),
big AS (
  SELECT UNNEST(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
                i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM words
),
bc AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_xy FROM big
  GROUP BY bigram HAVING COUNT(*) >= 5
)
SELECT b.bigram, b.c_xy, ux.c_w AS c_x, uy.c_w AS c_y,
       CAST(b.c_xy AS DOUBLE) * t.n_tokens / (ux.c_w * uy.c_w) AS lift
FROM bc b
JOIN uni ux ON ux.w = string_split(b.bigram, ' ')[1]
JOIN uni uy ON uy.w = string_split(b.bigram, ' ')[2]
CROSS JOIN tot t
ORDER BY lift DESC, bigram ASC LIMIT 25
"""


def text_heavy_hitters(spark, sf_dir):
    """EXACT top-20 corpus tokens through the Misra-Gries sketch-prune
    + exact-verify path (operators/sketch.py): per-partition ≤512-slot
    summaries (Arrow-batched), bounded candidate broadcast, exact
    counts for candidates only, certification that 512 slots suffice
    for this k. The oracle is the naive full-domain GROUP BY — the
    whole point is that the sketch path must return the IDENTICAL
    top-k while shuffling O(slots·P) instead of the token domain."""
    from pygdf_spark.operators.sketch import heavy_hitters_topk

    d = T(spark, sf_dir, "documents")
    toks = d.select(F.explode(X.tokens("text")).alias("token"))
    return heavy_hitters_topk(toks, "token", k=20, slots=512)


TEXT_HEAVY_HITTERS_SQL = r"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
)
SELECT token, COUNT(*) AS n FROM toks
GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
"""


def text_lm_perplexity(spark, sf_dir):
    """Bigram language-model PERPLEXITY scoring — the CCNet-style
    quality filter, self-trained on the corpus (no external model):
    add-one-smoothed p(y|x) = (c_xy + 1)/(c_x + V), and each document
    accumulates Σ −ln p over its bigrams. Determinism discipline:
    every term's log-prob is rounded to integer MICRO-NATS before any
    aggregation (the BM25 6-dp ln idiom), so the per-source sums are
    pure int64 — order-free at any partitioning. Plan: two count
    shuffles (unigram, bigram), one bigram-keyed scoring join, the
    vocab-sized unigram side broadcast; per-source final aggregate.
    The scoring join's key is zipfian (hot bigrams like "of the") —
    AQE skew-join splitting (on in the session config) splits hot
    reducers at runtime; operators/skew.salted_join is the explicit
    fallback shape."""
    d = spread(T(spark, sf_dir, "documents"))  # 1-task scan: guide §2.5
    # persisted: feeds two branches (vocab count + the broadcast
    # scoring join) — one corpus explode instead of two (opt r7)
    uni = (
        d.select(F.explode(X.tokens("text")).alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("c_x"))
        .persist()
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))  # 1 row
    # Occurrences pre-aggregate to (source, bigram, k) BEFORE anything
    # shuffles (opt r8, guide §2.3/§2.5): every occurrence of a bigram
    # contributes the IDENTICAL nll_micro (it depends only on the
    # corpus-global c_xy, c_x, V), so the per-occurrence stream never
    # needs to move — one partial-agg keyed shuffle (map-side combine
    # tames hot stop-bigrams; the r7 shape's count(*) OVER
    # (PARTITION BY bigram) put every occurrence of a hot bigram into
    # ONE window task with no combine — the 100 TB skew axis the r7
    # verdict flagged). c_xy then rides a window over the AGGREGATED
    # relation, where a hot bigram holds at most n_sources rows, and
    # the final per-source sums weight by k (exact integer algebra:
    # k·round(x) ≡ Σ_k round(x)).
    from pyspark.sql import Window

    wb = Window.partitionBy("bigram")
    sb = (
        d.select("source", F.explode(X.ngrams("text", 2)).alias("bigram"))
        .groupBy("source", "bigram")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    scored = (
        sb.withColumn("c_xy", F.sum("k").over(wb))
        .withColumn("x", F.split("bigram", " ").getItem(0))
        .join(F.broadcast(uni), "x")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            "k",
            F.round(
                -F.log(
                    (F.col("c_xy") + 1).cast("double")
                    / (F.col("c_x") + F.col("v")).cast("double")
                )
                * 1e6,
                0,
            ).cast("long").alias("nll_micro"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("nll_micro")).alias("nll_micro_sum"),
        )
        .orderBy("source")
    )


TEXT_LM_PERPLEXITY_SQL = r"""
WITH words AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS w
  FROM documents
),
u AS (SELECT x, COUNT(*) AS c_x FROM (SELECT UNNEST(w) AS x FROM words) GROUP BY x),
vocab AS (SELECT COUNT(*) AS v FROM u),
bigrams AS (
  SELECT doc_id, source,
         w[i] || ' ' || w[i+1] AS bigram, w[i] AS x
  FROM words, LATERAL UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
),
big AS (SELECT bigram, COUNT(*) AS c_xy FROM bigrams GROUP BY bigram),
scored AS (
  SELECT bt.source AS source,
         CAST(round(-ln(CAST(bg.c_xy + 1 AS DOUBLE)
                        / CAST(uu.c_x + (SELECT v FROM vocab) AS DOUBLE))
                    * 1e6, 0) AS BIGINT) AS nll_micro
  FROM bigrams bt JOIN big bg ON bt.bigram = bg.bigram
  JOIN u uu ON bt.x = uu.x
)
SELECT source, COUNT(*) AS n_bigrams,
       CAST(SUM(nll_micro) AS BIGINT) AS nll_micro_sum
FROM scored GROUP BY source ORDER BY source
"""


def text_readability(spark, sf_dir):
    """Readability raw counts (the Flesch/FK ingredients, kept integer
    so the hash is partition-proof): per source — words, sentences
    (terminal-punctuation runs), syllable proxy (vowel-group count per
    word, the standard heuristic), long words (≥7 chars), and
    characters. The float Flesch score is one expression over these
    sums downstream; map-side only."""
    d = T(spark, sf_dir, "documents")
    w = X.tokens("text")
    sents = F.filter(
        F.split(F.trim("text"), r"[.!?]+\s+"), lambda s: F.length(s) > 0
    )
    syll = F.aggregate(
        w, F.lit(0),
        lambda acc, x: acc
        + F.greatest(
            F.size(F.regexp_extract_all(F.lower(x), F.lit("[aeiouy]+"), 0)),
            F.lit(1),
        ),
    )
    per_doc = d.select(
        "source",
        F.size(w).alias("n_words"),
        F.size(sents).alias("n_sents"),
        syll.alias("n_syll"),
        F.size(F.filter(w, lambda x: F.length(x) >= 7)).alias("n_long"),
        F.length(F.trim("text")).alias("n_chars_t"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("n_words").alias("words"),
            F.sum("n_sents").alias("sentences"),
            F.sum("n_syll").alias("syllables"),
            F.sum("n_long").alias("long_words"),
            F.sum("n_chars_t").alias("chars"),
        )
        .orderBy("source")
    )


TEXT_READABILITY_SQL = r"""
WITH per_doc AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
         len(list_filter(string_split_regex(trim(text), '[.!?]+\s+'),
                         s -> length(s) > 0)) AS n_sents,
         CASE WHEN trim(text) = '' THEN 0 ELSE
           list_sum(list_transform(string_split_regex(trim(text), '\s+'),
             x -> greatest(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1)))
         END AS n_syll,
         CASE WHEN trim(text) = '' THEN 0 ELSE
           len(list_filter(string_split_regex(trim(text), '\s+'),
                           x -> length(x) >= 7))
         END AS n_long,
         length(trim(text)) AS n_chars_t
  FROM documents
)
SELECT source, CAST(SUM(n_words) AS BIGINT) AS words,
       CAST(SUM(n_sents) AS BIGINT) AS sentences,
       CAST(SUM(n_syll) AS BIGINT) AS syllables,
       CAST(SUM(n_long) AS BIGINT) AS long_words,
       CAST(SUM(n_chars_t) AS BIGINT) AS chars
FROM per_doc GROUP BY source ORDER BY source
"""


QUERIES = {
    "text_readability": text_readability,
    "text_lm_perplexity": text_lm_perplexity,
    "text_heavy_hitters": text_heavy_hitters,
    "text_pmi_bigrams": text_pmi_bigrams,
    "text_chunk_split": text_chunk_split,
    "text_tfidf_top": text_tfidf_top,
    "text_token_stats": text_token_stats,
    "text_vocab_coverage": text_vocab_coverage,
    "text_bm25_topk": text_bm25_topk,
    "text_lm_frequency": text_lm_frequency,
    "text_ngrams_top": text_ngrams_top,
    "text_langid": text_langid,
    "text_quality": text_quality,
    "text_fingerprint": text_fingerprint,
    "text_pii_mask": text_pii_mask,
    "text_repetition": text_repetition,
}

ORACLE = {
    "text_readability": TEXT_READABILITY_SQL,
    "text_lm_perplexity": TEXT_LM_PERPLEXITY_SQL,
    "text_heavy_hitters": TEXT_HEAVY_HITTERS_SQL,
    "text_pmi_bigrams": TEXT_PMI_SQL,
    "text_chunk_split": TEXT_CHUNK_SQL,
    "text_tfidf_top": TEXT_TFIDF_SQL,
    "text_token_stats": TEXT_TOKEN_STATS_SQL,
    "text_vocab_coverage": TEXT_VOCAB_COVERAGE_SQL,
    "text_bm25_topk": TEXT_BM25_SQL,
    "text_ngrams_top": TEXT_NGRAMS_SQL,
    "text_langid": _langid_sql(),
    "text_quality": TEXT_QUALITY_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_pii_mask": TEXT_PII_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "text_lm_frequency": TEXT_LM_FREQ_SQL,
}
