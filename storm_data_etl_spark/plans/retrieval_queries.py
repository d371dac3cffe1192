"""Hybrid retrieval and corpus-curation queries (round 4).

Extends the training-data-pipeline surface with the retrieval/filtering
operators a modern corpus build runs between crawl and training: hybrid
lexical+vector search fused with reciprocal-rank fusion (Cormack et al.
2009, the de-facto fusion rule in Elasticsearch/Vespa/OpenSearch), broadcast
blocklist filtering, model-based quality scoring (FineWeb/DCLM-style linear
classifier inference), and URL canonicalization dedup (the crawl-level dedup
that runs BEFORE any content hashing).

The reference (couchcryptid/storm-data-etl) has no retrieval surface; its
closest analogs are the validate/report scans (cmd/validate/main.go,
cmd/genmock/main.go:194-354). These queries follow the same engine rules as
the rest of the repo: JVM expressions only in the data path, every
aggregated double quantized with floor(x * 10^k) before emission, and no
transcendentals on any cross-engine COMPARISON path except the BM25 ln()
inside rrf_hybrid_search, which is fenced behind a floor-quantized integer
rank key (see its docstring for the accepted knife-edge risk); the quality
model uses a rational saturation n/(n+50) instead of ln(1+n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.functions import vectors as V
from storm_data_etl_spark.operators import sampling as SP
from storm_data_etl_spark.plans.ml_queries import _SQL_QUALITY_CTES, _sql_cosine
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t

# =====================================================================
# Hybrid search: BM25 lexical leg + exact-cosine vector leg, fused with
# reciprocal rank fusion  rrf(d) = Σ_legs 1/(K + rank_leg(d))
# =====================================================================

_RRF_K = 60          # Cormack et al. 2009 default
_RRF_TERMS = ("spark", "join", "window")  # same query as bm25_keyword_search
_RRF_PROBE_ID = 0    # vector query = embedding of vec_id 0 (doc_id-aligned)
_RRF_LEG_DEPTH = 50  # candidates per leg before fusion


@register(
    "rrf_hybrid_search",
    f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM d),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok AS term, count(*) AS tf
      FROM d, unnest(toks) AS u(tok)
      WHERE tok IN {repr(tuple(_RRF_TERMS))}
      GROUP BY doc_id, tok
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    lex AS (
      SELECT tf.doc_id,
             CAST(floor(1e6 * sum(
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             )) AS BIGINT) AS lex_q
      FROM tf
      JOIN df ON df.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    lexr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY lex_q DESC, doc_id) AS lex_rank
      FROM lex
      QUALIFY lex_rank <= {_RRF_LEG_DEPTH}
    ),
    probe AS (
      SELECT embedding::DOUBLE[] AS pv FROM embeddings
      WHERE vec_id = {_RRF_PROBE_ID}
    ),
    vec AS (
      SELECT e.vec_id AS doc_id,
             {_sql_cosine("(e.embedding::DOUBLE[])", "probe.pv")} AS cos_raw
      FROM embeddings e CROSS JOIN probe
      WHERE e.vec_id <> {_RRF_PROBE_ID}
    ),
    vecr AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos_raw DESC, doc_id) AS vec_rank
      FROM vec
      QUALIFY vec_rank <= {_RRF_LEG_DEPTH}
    ),
    fused AS (
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + l.lex_rank), CAST(0 AS DOUBLE))
             + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + v.vec_rank), CAST(0 AS DOUBLE))
               AS rrf
      FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank,
           CAST(floor(rrf * 1e9) AS BIGINT) AS rrf_e9
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 (lexical leg) and exact-cosine top-50
    against the vec_id-0 probe (vector leg), fused with reciprocal rank
    fusion 1/(60+rank) and re-ranked; top-10 emitted.

    Scale shape: the lexical leg is the proven bm25_keyword_search plan
    (posting-list TF shuffle, broadcast DF + corpus stats) truncated to 50
    candidates via TakeOrdered; the vector leg is one broadcast-probe scan
    (ann_cosine_topk's plan with one probe). Fusion then joins two ≤50-row
    sides — driver-trivial at any corpus size; at 100 TB the legs, not the
    fusion, carry all the cost, and each leg is independently the scale
    design already proven in its standalone query. Ranks are integers, so
    the fused score 1/(60+r) is bit-identical across engines; it is
    emitted floor-quantized at 1e9.

    Cross-engine determinism: the BM25 term weight uses ln(), whose libm
    rounding MAY differ between engines in the last ulp — so the lexical
    leg ranks on the floor-quantized integer floor(1e6·score), not the raw
    double (integers order identically once equal). The accepted residual
    risk is a raw score landing within ~1 ulp of an exact 1e-6 multiple
    where the floors themselves could disagree — quantization narrows the
    divergence window from "any rank-adjacent pair" to that knife edge; it
    cannot close it while ln() is in the formula. The vector leg needs no
    such guard: its cosine fold is bit-identical by construction
    (_sql_cosine docstring).
    """
    k1, b = 1.2, 0.75
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    )
    dl = docs.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_RRF_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    lex = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf") * (k1 + 1)
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        # rank key is the floor-quantized INTEGER score (see docstring: the
        # only ln() in the repo's oracle-backed surface hides behind it)
        .agg(F.floor(F.sum("term_score") * 1e6).cast("bigint").alias("lex_q"))
    )
    # TakeOrdered truncation first, then rank the ≤50 survivors (the window
    # runs on a driver-trivial row count, never the corpus).
    lex50 = lex.orderBy(F.col("lex_q").desc(), "doc_id").limit(_RRF_LEG_DEPTH)
    lexr = lex50.withColumn(
        "lex_rank",
        F.row_number().over(Window.orderBy(F.col("lex_q").desc(), "doc_id")),
    ).select("doc_id", "lex_rank")

    emb = t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == _RRF_PROBE_ID).select(
        F.col("embedding").alias("pv")
    )
    vec = (
        emb.filter(F.col("vec_id") != _RRF_PROBE_ID)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            V.cosine("embedding", "pv").alias("cos_raw"),
        )
    )
    vec50 = vec.orderBy(F.col("cos_raw").desc(), "doc_id").limit(_RRF_LEG_DEPTH)
    vecr = vec50.withColumn(
        "vec_rank",
        F.row_number().over(Window.orderBy(F.col("cos_raw").desc(), "doc_id")),
    ).select("doc_id", "vec_rank")

    zero = F.lit(0.0)
    fused = (
        lexr.join(vecr, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(F.lit(1.0) / (_RRF_K + F.col("lex_rank")), zero)
            + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("vec_rank")), zero),
        )
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
        .select(
            "doc_id", "lex_rank", "vec_rank",
            F.floor(F.col("rrf") * 1e9).cast("bigint").alias("rrf_e9"),
        )
    )


# =====================================================================
# Broadcast blocklist filtering (toxicity/profanity-style term lists)
# =====================================================================

_BLOCKLIST = ("slow", "drop", "fail")


@register(
    "blocklist_filter_stats",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w <> '') AS toks
      FROM documents
    ),
    hits AS (
      SELECT doc_id, source, len(toks) AS n_words,
             len(list_filter(toks, w -> w IN {repr(tuple(_BLOCKLIST))})) AS n_hits
      FROM d
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           CAST(max(n_hits) AS BIGINT) AS max_hits,
           CAST(sum(CASE WHEN n_words > 0
                          AND n_hits * 100 >= n_words THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM hits GROUP BY source
    """,
)
def blocklist_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-blocklist filtering pass: per-source counts of documents with
    any blocklisted token, total/max hit counts, and documents whose hit
    density crosses the drop threshold (≥1 hit per 100 words, evaluated in
    integer cross-multiplication so no float ever enters the verdict).

    Scale shape: the blocklist is a literal IN-list compiled into the scan
    (a real list is a broadcast join against a KB-size dimension — same
    plan class); one shuffle for the per-source aggregate. All-integer
    arithmetic end to end.
    """
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda w: w != "")
    hits = docs.select(
        "source",
        F.size(toks).alias("n_words"),
        F.size(F.filter(toks, lambda w: w.isin(*_BLOCKLIST))).alias("n_hits"),
    )
    return hits.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0)).alias("n_flagged"),
        F.sum("n_hits").alias("total_hits"),
        F.max("n_hits").cast("bigint").alias("max_hits"),
        F.sum(
            F.when(
                (F.col("n_words") > 0)
                & (F.col("n_hits") * 100 >= F.col("n_words")),
                1,
            ).otherwise(0)
        ).alias("n_dropped"),
    )


# =====================================================================
# Model-based quality scoring: linear classifier inference
# (FineWeb-Edu / DCLM-style quality filters run a learned scorer over
# every document; here the scorer is a fixed linear model over exact
# per-row features so inference stays in whole-stage codegen)
# =====================================================================

#: (bias, w_saturated_length, w_mean_word_len, w_uniq_ratio, w_stop_ratio,
#:  w_digit_ratio) — fixed public weights; the CONTRACT is the inference
#: plan, not the model fit.
_QW = (-1.5, 2.0, 0.3, 1.2, 0.8, -2.0)
_QSTOP = ("a", "the", "of", "and", "to")


@register(
    "quality_model_score",
    f"""
    WITH d AS (
      SELECT doc_id, source, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w <> '') AS toks
      FROM documents
    ),
    f AS (
      SELECT doc_id, source,
             len(toks) AS n_words,
             list_reduce(list_prepend(0, list_transform(toks, w -> length(w))),
                         (x, y) -> x + y) AS sum_wlen,
             len(list_distinct(toks)) AS n_uniq,
             len(list_filter(toks, w -> w IN {repr(tuple(_QSTOP))})) AS n_stop,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS n_digits
      FROM d
    ),
    s AS (
      SELECT doc_id, source,
             {_QW[0]}
             + {_QW[1]} * (CAST(n_words AS DOUBLE) / (n_words + 50))
             + {_QW[2]} * (CASE WHEN n_words > 0
                 THEN CAST(sum_wlen AS DOUBLE) / n_words ELSE 0 END)
             + {_QW[3]} * (CASE WHEN n_words > 0
                 THEN CAST(n_uniq AS DOUBLE) / n_words ELSE 0 END)
             + {_QW[4]} * (CASE WHEN n_words > 0
                 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0 END)
             + {_QW[5]} * (CASE WHEN n_chars > 0
                 THEN CAST(n_digits AS DOUBLE) / n_chars ELSE 0 END)
               AS logit
      FROM f
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CAST(floor(logit * 1e6) AS BIGINT)) AS BIGINT)
             AS sum_logit_e6
    FROM s GROUP BY source
    """,
)
def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference over every document: five exact
    per-row features (rational length saturation n/(n+50) — deliberately no
    ln(), whose libm rounding is engine-specific — mean word length, unique
    -token ratio, stopword ratio, digit-character ratio) dotted with fixed
    weights; per-source keep counts and the exact integer sum of
    floor-quantized logits.

    Scale shape: inference is pure whole-stage-codegen expressions on the
    scan (a real learned linear/fasttext-style model broadcasts a
    weight vector — same plan class, no Python in the path); the per-row
    logit is quantized to int64 BEFORE the sum, so the group aggregate is
    exact integer arithmetic with no summation-order noise.
    """
    w = _QW
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    f = docs.select(
        "source",
        F.size(toks).alias("n_words"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
        ).alias("sum_wlen"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.filter(toks, lambda x: x.isin(*_QSTOP))).alias("n_stop"),
        F.length("text").alias("n_chars"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).alias("n_digits"),
    )
    nw = F.col("n_words")
    logit = (
        F.lit(w[0])
        + w[1] * (nw.cast("double") / (nw + 50))
        + w[2] * F.when(nw > 0, F.col("sum_wlen").cast("double") / nw).otherwise(0.0)
        + w[3] * F.when(nw > 0, F.col("n_uniq").cast("double") / nw).otherwise(0.0)
        + w[4] * F.when(nw > 0, F.col("n_stop").cast("double") / nw).otherwise(0.0)
        + w[5]
        * F.when(
            F.col("n_chars") > 0,
            F.col("n_digits").cast("double") / F.col("n_chars"),
        ).otherwise(0.0)
    )
    s = f.select("source", logit.alias("logit"))
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("logit") > 0, 1).otherwise(0)).alias("n_keep"),
        F.sum(F.floor(F.col("logit") * 1e6).cast("bigint")).alias("sum_logit_e6"),
    )


# =====================================================================
# URL canonicalization dedup (crawl-level dedup before content hashing)
# =====================================================================

@register(
    "url_canonical_dedup",
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'https://CDN' ELSE 'https://cdn' END
             || CAST(doc_id % 5 AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 THEN '.Example.ORG' ELSE '.example.org' END
             || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
             || '/corpus/doc-' || CAST(doc_id % 250 AS VARCHAR) || '.txt'
             || '?rev=' || CAST(doc_id % 7 AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '&utm_source=feed' ELSE '' END
             || CASE WHEN doc_id % 2 = 1 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
                     ELSE '' END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)) AS host,
             'https://'
             || lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1))
             || regexp_extract(url, '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1)
             || '?' || regexp_extract(url, '[?&](rev=[0-9]+)', 1) AS curl
      FROM raw
    )
    SELECT host,
           count(*) AS n_urls,
           count(DISTINCT curl) AS n_canonical,
           count(*) - count(DISTINCT curl) AS n_dupes
    FROM canon GROUP BY host
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl URL canonicalization + dedup: raw URLs (synthesized with the
    real-world mess — mixed-case hosts, explicit default :443 port,
    utm_* tracking params, fragments; the path collides mod 250 so true
    duplicates exist) normalized to scheme+lower(host)+path+kept-params,
    then per-host unique/duplicate volumes.

    This is the dedup stage every crawl pipeline runs before any content
    hash: canonicalization is pure per-row string expressions (whole-stage
    codegen), and the dedup is one count(DISTINCT canonical) shuffle keyed
    by host — the natural partition key, since a host's URLs co-locate.
    Regex on BOTH engines (not parse_url) so the mixed-case extraction is
    character-identical; url_host_stats keeps the parse_url surface.
    """
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("https://CDN")).otherwise(F.lit("https://cdn")),
        (did % 5).cast("string"),
        F.when(did % 2 == 0, F.lit(".Example.ORG")).otherwise(F.lit(".example.org")),
        F.when(did % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/corpus/doc-"), (did % 250).cast("string"), F.lit(".txt"),
        F.lit("?rev="), (did % 7).cast("string"),
        F.when(did % 4 == 0, F.lit("&utm_source=feed")).otherwise(F.lit("")),
        F.when(did % 2 == 1, F.concat(F.lit("#sec"), (did % 3).cast("string")))
        .otherwise(F.lit("")),
    )
    raw = docs.select(url.alias("url"))
    host = F.lower(F.regexp_extract("url", r"^[a-zA-Z]+://([^/:?#]+)", 1))
    curl = F.concat(
        F.lit("https://"),
        host,
        F.regexp_extract("url", r"^[a-zA-Z]+://[^/?#]+(/[^?#]*)", 1),
        F.lit("?"),
        F.regexp_extract("url", r"[?&](rev=[0-9]+)", 1),
    )
    canon = raw.select(host.alias("host"), curl.alias("curl"))
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count_distinct("curl").alias("n_canonical"),
        (F.count(F.lit(1)) - F.count_distinct("curl")).alias("n_dupes"),
    )


# =====================================================================
# Rank-biased overlap between two rankers (Webber et al. 2010) — round 8
# =====================================================================

#: RBO truncation depth and persistence for rbo_rankers_overlap.
_RBO_K = 10
#: Embedded weight literals: WL[j] = (1-p) * Σ_{i=j..k} p^(i-1)/i for
#: p = 0.9, k = 10 — the swap-sum form of RBO_MIN@k (see docstring).
#: Constants are 17-significant-digit reprs so both engines parse the
#: identical double; they multiply exact integer counts in ONE fixed
#: left-associated expression, so no cross-engine float-order hazard.
_RBO_WL = (
    "0.23541639942571427",
    "0.13541639942571423",
    "0.09041639942571428",
    "0.06341639942571428",
    "0.04519139942571428",
    "0.03206939942571428",
    "0.022227899425714282",
    "0.01463588514",
    "0.00865717389",
    "0.00387420489",
)
_RBO_EXPR = " + ".join(
    f"c{j} * {w}" for j, w in enumerate(_RBO_WL, start=1)
)
_RBO_CJ_SQL = ",\n             ".join(
    f"CAST(sum(CASE WHEN m = {j} THEN 1 ELSE 0 END) AS BIGINT) AS c{j}"
    for j in range(1, _RBO_K + 1)
)


@register(
    "rbo_rankers_overlap",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source,
             CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_e4,
             length(coalesce(d.text, '')) AS n_chars
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY q_e4 DESC, doc_id) AS ra,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rb
      FROM base
    ),
    tops AS (
      SELECT source, greatest(ra, rb) AS m
      FROM ranked WHERE ra <= {_RBO_K} AND rb <= {_RBO_K}
    ),
    cj AS (
      SELECT source,
             {_RBO_CJ_SQL}
      FROM tops GROUP BY source
    )
    SELECT source,
           (c1 + c2 + c3 + c4 + c5 + c6 + c7 + c8 + c9 + c10) AS n_overlap,
           CAST(floor(1000000.0 * ({_RBO_EXPR})) AS BIGINT) AS rbo_min_e6
    FROM cj
    """,
)
def rbo_rankers_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) at depth k = 10, p = 0.9
    between two per-source document rankers — quality-score order vs
    raw-length order — the ranking-comparison readout used to decide
    whether a cheap ranker can replace an expensive one (here: does doc
    length proxy quality?). RBO_MIN truncated at k (the lower bound; no
    extrapolation term), the right variant for comparing two concrete
    top-k lists.

    Exactness: RBO = Σ_i (1−p)·p^(i−1)·X_i/i with X_i = |top-i ∩ top-i|.
    Swapping the sums over depth i and items (an item with
    m = max(rank_a, rank_b) enters every X_i with i ≥ m) gives
    RBO = Σ_j c_j·W_j with c_j = #items{{m = j}} (exact integers from
    one conditional aggregate) and W_j = (1−p)·Σ_{{i=j..k}} p^(i−1)/i —
    constants embedded as 17-digit literals, identical doubles in both
    engines. The whole float path is ONE fixed left-associated
    expression over the ten integer counts; no pow(), no float
    aggregation order.

    Scale: one documents scan → two keyed rank windows (source-
    partitioned) → a ≤ k-row-per-source aggregate. Ranks tie-break on
    doc_id so both engines order identically. Sources with fewer than k
    docs simply have shorter lists (smaller overlap counts) — RBO_MIN
    semantics, documented, not an edge case."""
    from storm_data_etl_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.floor(X.quality_score("text") * 10000 + 0.5).cast("bigint").alias("q_e4"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
    )
    wa = Window.partitionBy("source").orderBy(F.desc("q_e4"), "doc_id")
    wb = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    ranked = base.select(
        "source",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    tops = ranked.filter(
        (F.col("ra") <= _RBO_K) & (F.col("rb") <= _RBO_K)
    ).select("source", F.greatest("ra", "rb").alias("m"))
    cjs = [
        F.sum(F.when(F.col("m") == j, 1).otherwise(0))
        .cast("bigint")
        .alias(f"c{j}")
        for j in range(1, _RBO_K + 1)
    ]
    cj = tops.groupBy("source").agg(*cjs)
    overlap = sum(F.col(f"c{j}") for j in range(1, _RBO_K + 1))
    return cj.select(
        "source",
        overlap.alias("n_overlap"),
        F.floor(F.lit(1000000.0) * F.expr(_RBO_EXPR)).cast("bigint").alias(
            "rbo_min_e6"
        ),
    )


# =====================================================================
# nDCG@10 of the length ranker against quality-band relevance — round 8
# =====================================================================

#: 1/log2(i+1) discount literals for ranks 1..10 and their prefix sums
#: P[0..10] (P[m] = Σ_{i<=m} L_i), embedded as 17-digit reprs so both
#: engines parse identical doubles. log2 never executes inside either
#: engine — the constants are the only place it ever ran.
_NDCG_L = (
    "1.0", "0.6309297535714575", "0.5", "0.43067655807339306",
    "0.38685280723454163", "0.3562071871080222", "0.3333333333333333",
    "0.31546487678572877", "0.3010299956639812", "0.2890648263178879",
)
_NDCG_P = (
    "0.0", "1.0", "1.6309297535714575", "2.1309297535714578",
    "2.5616063116448506", "2.9484591188793923", "3.3046663059874146",
    "3.637999639320748", "3.953464516106477", "4.254494511770458",
    "4.543559338088346",
)
_NDCG_DCG_EXPR = " + ".join(f"d{i} * {w}" for i, w in enumerate(_NDCG_L, start=1))
_NDCG_DI_SQL = ",\n             ".join(
    f"CAST(sum(CASE WHEN rk = {i} THEN rel ELSE 0 END) AS BIGINT) AS d{i}"
    for i in range(1, 11)
)
_NDCG_P_SQL = "[" + ", ".join(_NDCG_P) + "]"


@register(
    "ndcg_at_10_length_ranker",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source,
             length(coalesce(d.text, '')) AS n_chars,
             CASE WHEN q.quality >= 0.8 THEN 2
                  WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS rel
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT source, rel,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM base
    ),
    g AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_ret,
             CAST(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
             CAST(sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
             {_NDCG_DI_SQL}
      FROM ranked WHERE rk <= 10 GROUP BY source
    )
    SELECT source, n_ret, g2, g1,
           CASE WHEN g2 = 0 AND g1 = 0 THEN NULL
                ELSE CAST(floor(1000000.0 * ({_NDCG_DCG_EXPR})
                       / (2.0 * {_NDCG_P_SQL}[CAST(g2 + 1 AS INT)]
                          + ({_NDCG_P_SQL}[CAST(g2 + g1 + 1 AS INT)]
                             - {_NDCG_P_SQL}[CAST(g2 + 1 AS INT)])))
                     AS BIGINT)
           END AS ndcg_e6
    FROM g
    """,
)
def ndcg_at_10_length_ranker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the cheap LENGTH ranker judged against quality-band
    relevance (rel ∈ {{0,1,2}} = the rq bands) per source — the standard
    graded-relevance ranking metric, answering the retrieval-eval
    question the RBO query poses structurally: HOW GOOD is the proxy
    ranking, not merely how similar. DCG = Σ rel_i/log2(i+1); nDCG
    divides by the ideal ordering of the same gains.

    Exactness without transcendentals in the engines: the ten discount
    values and their prefix sums are EMBEDDED literals (log2 ran once,
    here, generating the constants); per-rank gains d_i are exact
    integer conditional aggregates (rank is unique per source), so DCG
    is one fixed left-associated expression. IDCG exploits gains being
    banded: the ideal list is all 2s then all 1s, so
    IDCG = 2·P[g2] + (P[g2+g1] − P[g2]) — two array lookups into the
    prefix-sum literals by the integer counts. floor(1e6·DCG/IDCG) is
    engine-identical (IEEE divide, identical operands); NULL when every
    retrieved doc has gain 0 (IDCG = 0).

    Scale: one documents scan → one keyed rank window → a ≤ 10-row
    aggregate per source. Same window as rbo_rankers_overlap's length
    leg; an engine running both shares the shuffle."""
    from storm_data_etl_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    q = X.quality_score("text")
    base = docs.select(
        "doc_id",
        "source",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        F.when(q >= 0.8, 2).when(q >= 0.5, 1).otherwise(0).alias("rel"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    ranked = base.select(
        "source", "rel", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= 10)
    dis = [
        F.sum(F.when(F.col("rk") == i, F.col("rel")).otherwise(0))
        .cast("bigint")
        .alias(f"d{i}")
        for i in range(1, 11)
    ]
    g = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ret"),
        F.sum((F.col("rel") == 2).cast("int")).cast("bigint").alias("g2"),
        F.sum((F.col("rel") == 1).cast("int")).cast("bigint").alias("g1"),
        *dis,
    )
    parr = "array(" + ", ".join(_NDCG_P) + ")"
    idcg = F.expr(
        f"2.0 * element_at({parr}, CAST(g2 + 1 AS INT))"
        f" + (element_at({parr}, CAST(g2 + g1 + 1 AS INT))"
        f" - element_at({parr}, CAST(g2 + 1 AS INT)))"
    )
    ndcg = F.when(
        (F.col("g2") == 0) & (F.col("g1") == 0), F.lit(None).cast("bigint")
    ).otherwise(
        F.floor(F.lit(1000000.0) * F.expr(_NDCG_DCG_EXPR) / idcg).cast("bigint")
    )
    return g.select("source", "n_ret", "g2", "g1", ndcg.alias("ndcg_e6"))


# =====================================================================
# MRR@10 and MAP@10 of the length ranker — round 8 continuation
# =====================================================================

#: Queries-per-source fan for mrr/map: each document lands in query
#: bucket doc_id % 16, giving ~n/16 docs per ranked list — enough lists
#: that the means are real aggregates, few enough that every list is
#: non-trivial at sf0.001.
_IR_QBUCKETS = 16


@register(
    "mrr_at_10_ranker",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source, d.doc_id % {_IR_QBUCKETS} AS qid,
             length(coalesce(d.text, '')) AS n_chars,
             CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS rel
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT source, qid, rel,
             row_number() OVER (PARTITION BY source, qid
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM base
    ),
    perq AS (
      SELECT source, qid,
             min(CASE WHEN rel = 1 AND rk <= 10 THEN rk END) AS fr
      FROM ranked GROUP BY source, qid
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN fr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit,
           (1000000 * CAST(sum(coalesce(2520 // fr, 0)) AS BIGINT))
             // (2520 * count(*)) AS mrr_e6
    FROM perq GROUP BY source
    """,
)
def mrr_at_10_ranker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 (mean reciprocal rank) of the cheap LENGTH ranker against
    binary quality relevance (rel = quality ≥ 0.5), per source — the
    first-hit-position readout that complements nDCG's graded-gain view:
    retrieval stacks that feed a RAG or dedup-candidate stage care about
    "how deep until the first good document", not total gain. Queries
    are the doc_id % {_IR_QBUCKETS} buckets within each source; a query
    with no relevant doc in its top 10 contributes 0 (standard MRR).

    Exactness with NO floats anywhere: 1/r for r ≤ 10 is carried as the
    exact integer 2520/r (2520 = lcm(1..10) divides evenly for every
    rank), so Σ_q 1/r_q = S/2520 with S an exact integer sum, and
    MRR·1e6 = (1e6·S) tdiv (2520·Q) — every operand non-negative, so
    Spark div ≡ DuckDB //. The reciprocal never exists as a double.

    Scale: one documents scan → one (source, qid)-keyed rank window →
    two tiny aggregates. Same shuffle key family as the nDCG/RBO
    windows. Capacity: 1e6·S ≤ 1e6·2520·Q < 2⁶³ → Q < 3.6e9
    queries/source — unreachable (docs/LIMITS.md round-8 note)."""
    from storm_data_etl_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    q = X.quality_score("text")
    base = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % _IR_QBUCKETS).alias("qid"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        F.when(q >= 0.5, 1).otherwise(0).alias("rel"),
    )
    w = Window.partitionBy("source", "qid").orderBy(F.desc("n_chars"), "doc_id")
    ranked = base.select(
        "source", "qid", "rel", F.row_number().over(w).alias("rk")
    )
    perq = ranked.groupBy("source", "qid").agg(
        F.min(
            F.when((F.col("rel") == 1) & (F.col("rk") <= 10), F.col("rk"))
        ).alias("fr")
    )
    return perq.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.col("fr").isNotNull().cast("int")).cast("bigint").alias("n_hit"),
        F.expr(
            "(1000000 * sum(coalesce(2520 div fr, 0))) div (2520 * count(*))"
        )
        .cast("bigint")
        .alias("mrr_e6"),
    )


@register(
    "map_at_10_ranker",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source, d.doc_id % {_IR_QBUCKETS} AS qid,
             length(coalesce(d.text, '')) AS n_chars,
             CASE WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS rel
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT source, qid, rel,
             row_number() OVER (PARTITION BY source, qid
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM base
    ),
    cum AS (
      SELECT source, qid, rel, rk,
             CAST(sum(rel) OVER (PARTITION BY source, qid ORDER BY rk
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS h
      FROM ranked
    ),
    perq AS (
      SELECT source, qid,
             CAST(sum(CASE WHEN rel = 1 AND rk <= 10
                           THEN h * (2520 // rk) ELSE 0 END) AS BIGINT)
               AS apnum,
             least(CAST(sum(rel) AS BIGINT), 10) AS rq
      FROM cum GROUP BY source, qid
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rq >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
           CASE WHEN sum(CASE WHEN rq >= 1 THEN 1 ELSE 0 END) = 0 THEN NULL
                ELSE (1000000 * CAST(sum(CASE WHEN rq >= 1
                                              THEN apnum * (2520 // rq)
                                              ELSE 0 END) AS BIGINT))
                     // (6350400 * CAST(sum(CASE WHEN rq >= 1 THEN 1 ELSE 0 END)
                                        AS BIGINT))
           END AS map_e6
    FROM perq GROUP BY source
    """,
)
def map_at_10_ranker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP@10 (mean average precision) of the length ranker against
    binary quality relevance, per source, over the same
    doc_id % {_IR_QBUCKETS} query buckets as mrr_at_10_ranker —
    the area-under-PR summary that distinguishes a ranker that front-
    loads ALL its relevant docs from one that merely finds the first
    fast (MRR cannot tell those apart). AP@10 = (1/min(R,10)) ·
    Σ_{{i≤10, rel_i}} P@i with P@i = hits_i/i; queries with zero
    relevant docs are excluded from the mean (TREC convention).

    Exactness with NO floats: P@i = hits_i/i carried as the exact
    integer hits_i·(2520/i); AP·2520² = apnum·(2520/R) stays integer
    because R ≤ 10 divides 2520; MAP·1e6 = (1e6·Σ) tdiv (2520²·Q)
    with 2520² = 6350400 — all operands non-negative. The cumulative
    hit counter is an explicit ROWS UNBOUNDED PRECEDING running sum on
    the unique rank key, identical frame on both engines.

    Scale: one scan → one (source, qid) rank window + one running-sum
    window on the SAME key (single shuffle, two sorts) → tiny
    aggregates. Capacity: apnum ≤ 10·10·2520, ×(2520/R)·1e6 →
    6.4e14·Q < 2⁶³ → Q < 14k queries/source in BIGINT
    (docs/LIMITS.md round-8 note)."""
    from storm_data_etl_spark.functions import text as X

    docs = t(spark, sf_dir, "documents")
    q = X.quality_score("text")
    base = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % _IR_QBUCKETS).alias("qid"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        F.when(q >= 0.5, 1).otherwise(0).alias("rel"),
    )
    w = Window.partitionBy("source", "qid").orderBy(F.desc("n_chars"), "doc_id")
    ranked = base.select(
        "source", "qid", "rel", F.row_number().over(w).alias("rk")
    )
    wc = (
        Window.partitionBy("source", "qid")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranked.withColumn("h", F.sum("rel").over(wc).cast("bigint"))
    perq = cum.groupBy("source", "qid").agg(
        F.sum(
            F.when(
                (F.col("rel") == 1) & (F.col("rk") <= 10),
                F.col("h") * F.expr("2520 div rk"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("apnum"),
        F.least(F.sum("rel").cast("bigint"), F.lit(10)).alias("rq"),
    )
    evalq = F.sum((F.col("rq") >= 1).cast("int"))
    return perq.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        evalq.cast("bigint").alias("n_eval"),
        F.when(evalq == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(
                "(1000000 * sum(CASE WHEN rq >= 1"
                "                    THEN apnum * (2520 div rq)"
                "                    ELSE 0 END))"
                " div (6350400 * sum(CASE WHEN rq >= 1 THEN 1 ELSE 0 END))"
            )
        )
        .cast("bigint")
        .alias("map_e6"),
    )


# =====================================================================
# In-engine quality-classifier TRAINING (VERDICT r8 task 5)
# =====================================================================

#: Learning-rate numerator for quality_model_train's gradient step
#: (w -= lr * mean_grad with lr = _QMT_LR). Fixed and public: the
#: contract is the deterministic distributed training plan, not the fit.
_QMT_LR = 4
_QMT_EPOCHS = 3
#: Boundary-anchored features: each is an e4 fixed-point signal shifted so
#: the heuristic label's decision surface sits near 0 (stopword ratio at
#: 0.05, length at 200 chars, punct ratio at 0.2) — standardization a real
#: training pipeline would do, expressed as exact integer offsets so the
#: twin engines agree bit-for-bit. Centering is what lets 3 full-batch GD
#: epochs move past the majority-class predictor (measured: 389/500 train
#: accuracy vs 269/500 majority at sf0.001).
_QMT_FEATURES = ("bias", "stop_anchor", "len_anchor", "uniq_center", "punct_anchor")


def _qmt_fwd_sql(tag: str, w: str) -> str:
    """Per-row forward-pass CTE template: weights table ``w`` × features
    ``fi`` → z{tag} (raw logit), zb{tag} (e6 logit), pe{tag} (Elliott p6)."""
    return f"""
    z{tag} AS (
      SELECT x1, x2, x3, x4, y,
             w.w0 * 10000 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3 + w.w4 * x4
               AS z10
      FROM fi, {w} w
    ),
    zb{tag} AS (
      SELECT x1, x2, x3, x4, y,
             CASE WHEN z10 >= 0 THEN z10 // 10000
                  ELSE -((-z10) // 10000) END AS z6
      FROM z{tag}
    ),
    pe{tag} AS (
      SELECT x1, x2, x3, x4, y,
             500000 + CASE WHEN z6 >= 0
                  THEN (z6 * 1000000) // (2 * (1000000 + z6))
                  ELSE -(((-z6) * 1000000) // (2 * (1000000 - z6))) END AS p6
      FROM zb{tag}
    )"""


def _qmt_sql_chain() -> str:
    """Shared DuckDB CTE chain for the training family: features (fi),
    the {_QMT_EPOCHS} unrolled GD epochs (w0t … w{E}t), and the final
    forward pass (zA/zbA/peA). Generated by a loop so epoch arithmetic
    literally cannot drift between iterations; quality_model_train and
    quality_model_auc both build on this one string."""
    xs = ["10000", "x1", "x2", "x3", "x4"]
    epochs = []
    for k in range(1, _QMT_EPOCHS + 1):
        gsums = ",\n             ".join(
            f"CAST(coalesce(sum((p6 - y * 1000000) * {x}), 0) AS HUGEINT) AS g{j}"
            for j, x in enumerate(xs)
        )
        wups = ",\n             ".join(
            f"w.w{j} - CASE WHEN g.g{j} >= 0"
            f" THEN ({_QMT_LR} * g.g{j}) // (greatest(g.n, 1) * 10000)"
            f" ELSE -(({_QMT_LR} * (-g.g{j})) // (greatest(g.n, 1) * 10000)) END"
            f" AS w{j}"
            for j in range(5)
        )
        epochs.append(
            _qmt_fwd_sql(str(k), f"w{k - 1}t")
            + f""",
    g{k} AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             {gsums}
      FROM pe{k}
    ),
    w{k}t AS (
      SELECT {wups}
      FROM w{k - 1}t w, g{k} g
    )"""
        )
    zeros = ", ".join(f"CAST(0 AS HUGEINT) AS w{j}" for j in range(5))
    return f"""{_SQL_QUALITY_CTES},
    d AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         w -> w <> '') AS toks
      FROM documents
    ),
    fc AS (
      SELECT doc_id,
             len(toks) AS n_words,
             len(list_distinct(toks)) AS n_uniq,
             len(list_filter(toks, w -> w IN ('a','the','of','and','to')))
               AS n_stop,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^a-zA-Z0-9_\\s]')) AS n_punct
      FROM d
    ),
    fi AS (
      SELECT f.doc_id,
             CAST(least(CASE WHEN n_words > 0
                             THEN (n_stop * 10000) // n_words ELSE 0 END,
                        2000) - 500 AS HUGEINT) AS x1,
             CAST(least(n_chars, 400) * 50 - 10000 AS HUGEINT) AS x2,
             CAST(CASE WHEN n_words > 0 THEN (n_uniq * 10000) // n_words
                       ELSE 0 END - 5000 AS HUGEINT) AS x3,
             CAST(CASE WHEN n_chars > 0 THEN (n_punct * 10000) // n_chars
                       ELSE 0 END - 2000 AS HUGEINT) AS x4,
             CASE WHEN floor(q.quality * 10000 + 0.5) >= 9000
                  THEN 1 ELSE 0 END AS y
      FROM fc f JOIN qual q ON q.doc_id = f.doc_id
    ),
    w0t AS (SELECT {zeros}),{",".join(epochs)},{_qmt_fwd_sql("A", f"w{_QMT_EPOCHS}t")}"""


def _qmt_oracle_sql() -> str:
    """DuckDB twin of quality_model_train: the shared training chain plus
    the accuracy/stats readout unpivoted to one row per coefficient."""
    unions = "\n      UNION ALL ".join(
        f"SELECT '{nm}' AS feature, CAST(w{j} AS BIGINT) AS weight_e6,"
        f" CAST(s.n_train AS BIGINT) AS n_train,"
        f" CAST(s.n_pos AS BIGINT) AS n_pos,"
        f" CAST(a.n_correct AS BIGINT) AS n_correct"
        f" FROM w{_QMT_EPOCHS}t, stats s, acc a"
        for j, nm in enumerate(_QMT_FEATURES)
    )
    return f"""
    WITH {_qmt_sql_chain()},
    acc AS (
      SELECT coalesce(sum(CASE WHEN (p6 >= 500000) = (y = 1)
                                THEN 1 ELSE 0 END), 0) AS n_correct
      FROM peA
    ),
    stats AS (
      SELECT count(*) AS n_train, coalesce(sum(y), 0) AS n_pos FROM fi
    )
    {unions}
    """


def _qmt_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-anchored e4 integer features + heuristic-gate label,
    localCheckpointed ONCE (the quality regex + token pass must not
    re-execute per epoch). Shared by quality_model_train and
    quality_model_auc."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    counts = docs.select(
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(F.filter(toks, lambda x: x.isin("a", "the", "of", "and", "to"))).alias(
            "n_stop"
        ),
        F.length("text").alias("n_chars"),
        F.regexp_count("text", F.lit(r"[^a-zA-Z0-9_\s]")).alias("n_punct"),
        (
            F.floor(X.quality_score("text") * 10000 + 0.5) >= 9000
        ).cast("int").alias("y"),
    )
    return counts.selectExpr(
        "CAST(least(CASE WHEN n_words > 0"
        "                THEN (n_stop * 10000) div n_words ELSE 0 END,"
        "           2000) - 500 AS DECIMAL(38,0)) AS x1",
        "CAST(least(n_chars, 400) * 50 - 10000 AS DECIMAL(38,0)) AS x2",
        "CAST(CASE WHEN n_words > 0 THEN (n_uniq * 10000) div n_words"
        "          ELSE 0 END - 5000 AS DECIMAL(38,0)) AS x3",
        "CAST(CASE WHEN n_chars > 0 THEN (n_punct * 10000) div n_chars"
        "          ELSE 0 END - 2000 AS DECIMAL(38,0)) AS x4",
        "y",
    ).localCheckpoint(eager=True)


def _qmt_forward(df: DataFrame) -> DataFrame:
    """Per-row integer forward pass: expects x1..x4, y, w0..w4."""
    return (
        df.selectExpr(
            "x1", "x2", "x3", "x4", "y",
            "w0 * 10000 + w1 * x1 + w2 * x2 + w3 * x3 + w4 * x4 AS z10",
        )
        .selectExpr(
            "x1", "x2", "x3", "x4", "y", "z10",
            "CASE WHEN z10 >= 0 THEN z10 div 10000"
            "     ELSE -((-z10) div 10000) END AS z6",
        )
        .selectExpr(
            "x1", "x2", "x3", "x4", "y", "z10",
            "500000 + CASE WHEN z6 >= 0"
            "     THEN (z6 * 1000000) div (2 * (1000000 + z6))"
            "     ELSE -(((-z6) * 1000000) div (2 * (1000000 - z6))) END AS p6",
        )
    )


def _qmt_fit(spark: SparkSession, feats: DataFrame) -> DataFrame:
    """The _QMT_EPOCHS unrolled full-batch GD epochs; returns the final
    1-row weight DataFrame (w0..w4, DECIMAL(38,0)), checkpointed per
    epoch (the bradley_terry lineage discipline)."""
    xs = ["10000", "x1", "x2", "x3", "x4"]
    w = spark.range(1).selectExpr(
        *[f"CAST(0 AS DECIMAL(38,0)) AS w{j}" for j in range(5)]
    )
    for _ in range(_QMT_EPOCHS):
        g = _qmt_forward(feats.crossJoin(F.broadcast(w))).agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            *[
                F.coalesce(
                    F.sum(F.expr(f"(p6 - y * 1000000) * {x}")), F.lit(0)
                )
                .cast("decimal(38,0)")
                .alias(f"g{j}")
                for j, x in enumerate(xs)
            ],
        )
        w = w.crossJoin(g).selectExpr(
            *[
                f"CAST(w{j} - (CASE WHEN g{j} >= 0"
                f" THEN ({_QMT_LR} * g{j}) div (greatest(n, 1) * 10000)"
                f" ELSE -(({_QMT_LR} * (-g{j})) div (greatest(n, 1) * 10000))"
                f" END) AS DECIMAL(38,0)) AS w{j}"
                for j in range(5)
            ]
        ).localCheckpoint(eager=True)  # 1-row state: lineage cut per epoch
    return w


@register("quality_model_train", _qmt_oracle_sql())
def quality_model_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the quality classifier IN-ENGINE (VERDICT r8 task 5):
    full-batch logistic-regression gradient descent over every document,
    _QMT_EPOCHS unrolled epochs, labels from the repo's existing
    heuristic quality gate (functions/text.quality_score >= 0.9 — the
    FineWeb/DCLM-style distillation setup: train a cheap linear model to
    imitate a slower heuristic/judge; 0.9 splits the corpus ~54/46, so
    beating the majority class is a meaningful fit signal), features the
    scorer family's rational per-row signals, boundary-anchored (see
    _QMT_FEATURES).

    Every step is EXACT fixed-point integer arithmetic so the
    distributed gradient sums are order-free and both engines agree
    bit-for-bit: features x_j in e4 units, weights w_j in e6, logit
    z_e6 = (sum_j w_j*x_j) tdiv 1e4, and the logistic sigmoid replaced
    by the Elliott (1993) rational sigmoid p = 1/2 + z/(2*(1+|z|)) —
    algebraic, so it has an exact integer form (libm exp() rounding is
    engine-specific; exp-free training sidesteps it entirely), with the
    same saturating S-shape. Gradient step: w_j -= (lr * sum_i
    (p_i - y_i) * x_ij) tdiv (n * 1e4), lr = _QMT_LR, all tdivs
    sign-split so Spark `div` (truncate) and DuckDB `//` (floor) agree.
    Output: one row per coefficient (the bias + 4 signal weights),
    plus n_train/n_pos and the final-epoch training accuracy count —
    the trained vector is consumable by the quality_model_score plan
    shape (tests/test_round9_ops.py wires it through an inference pass).

    Scale shape (the bradley_terry MM discipline from day one): the
    feature derivation — the only corpus-scale work — is localCheckpointed
    ONCE and re-scanned per epoch (epochs+1 scans total: 3 training + 1
    accuracy); the iteration state is a SINGLE weight row, broadcast into
    each epoch's crossJoin (1-row broadcast aggregate, the documented
    acceptable crossJoin class) and checkpointed per epoch so lineage
    stays flat instead of 3^k. Gradient sums are DECIMAL(38,0)
    (HUGEINT in the twin); capacity in docs/LIMITS.md.

    Reference basis: the reference has no training surface; this extends
    cmd/validate's re-derive-and-compare discipline
    (cmd/validate/main.go:352-462) to model fitting, with the DuckDB twin
    unrolling identical epochs."""
    feats = _qmt_feats(spark, sf_dir)
    w = _qmt_fit(spark, feats)
    acc = _qmt_forward(feats.crossJoin(F.broadcast(w))).agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN (p6 >= 500000) = (y = 1) THEN 1 ELSE 0 END")),
            F.lit(0),
        ).alias("n_correct")
    )
    stats = feats.agg(
        F.count(F.lit(1)).alias("n_train"),
        F.coalesce(F.sum("y"), F.lit(0)).alias("n_pos"),
    )
    out = w.crossJoin(stats).crossJoin(acc).localCheckpoint(eager=True)
    parts = [
        out.selectExpr(
            f"'{nm}' AS feature",
            f"CAST(w{j} AS BIGINT) AS weight_e6",
            "CAST(n_train AS BIGINT) AS n_train",
            "CAST(n_pos AS BIGINT) AS n_pos",
            "CAST(n_correct AS BIGINT) AS n_correct",
        )
        for j, nm in enumerate(_QMT_FEATURES)
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res


def _qmt_auc_sql() -> str:
    """DuckDB twin of quality_model_auc: the shared training chain, then
    the tie-corrected Mann-Whitney AUC in exact integers over the final
    forward pass's raw logits (zA)."""
    return f"""
    WITH {_qmt_sql_chain()},
    sc AS (SELECT z10 AS s, y FROM zA),
    ag AS (
      SELECT s, CAST(count(*) AS HUGEINT) AS c,
             CAST(coalesce(sum(y), 0) AS HUGEINT) AS c1
      FROM sc GROUP BY s
    ),
    cm AS (
      SELECT s, c, c1,
             CAST(coalesce(sum(c) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS HUGEINT) AS cb
      FROM ag
    ),
    tt AS (
      SELECT CAST(coalesce(sum(c1), 0) AS HUGEINT) AS n1,
             CAST(coalesce(sum(c - c1), 0) AS HUGEINT) AS n0,
             CAST(coalesce(sum(c1 * (2 * cb + c + 1)), 0) AS HUGEINT) AS r2
      FROM cm
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
                ELSE CAST((1000000 * (r2 - n1 * (n1 + 1))) // (2 * n1 * n0)
                          AS BIGINT) END AS auc_e6
    FROM tt
    """


@register("quality_model_auc", _qmt_auc_sql())
def quality_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the in-engine-trained quality classifier IN-ENGINE:
    tie-corrected ROC AUC of the trained model's raw logits against the
    heuristic-gate labels, via the Mann-Whitney rank identity
    AUC = (R1 − n1(n1+1)/2) / (n1·n0) with MIDRANKS for tied scores —
    the standard eval a training pipeline runs right after the fit
    (train → score → AUC, all distributed, no collect). Exact integer
    arithmetic throughout: scores are the integer z10 logits; doubled
    midranks r2 = 2·cum_before + tied_count + 1 keep the .5 midranks in
    ℤ; AUC·1e6 = 1e6·(Σ_pos r2 − n1(n1+1)) tdiv (2·n1·n0), numerator
    provably ≥ 0. NULL when either class is empty (AUC undefined).

    Scale shape: reuses the shared training chain (_qmt_feats/_qmt_fit —
    checkpointed features, 1-row broadcast weight state), one scoring
    pass, a groupBy on the distinct logit value, and the two-phase
    distributed prefix sum (operators/sampling.global_prefix_sum: range
    shuffle + per-partition cumsum + broadcast #partitions-row offsets)
    for the cumulative rank base — NEVER a single-task global window
    over the score table. Capacity: r2 sums bounded by n² in
    DECIMAL(38,0)/HUGEINT → n ≤ 1e15 rows (docs/LIMITS.md).

    Reference basis: no training/eval surface exists in the reference;
    this extends cmd/validate's derive-and-compare discipline
    (cmd/validate/main.go:352-462) to model evaluation. The DuckDB twin
    unrolls the identical chain; its bounded cm window runs over
    distinct logits, and the driver's hash gate certifies the whole
    train→score→rank→AUC pipeline end to end."""
    feats = _qmt_feats(spark, sf_dir)
    w = _qmt_fit(spark, feats)
    scored = _qmt_forward(feats.crossJoin(F.broadcast(w))).select("z10", "y")
    ag = scored.groupBy(F.col("z10").alias("s")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c"),
        F.coalesce(F.sum("y"), F.lit(0)).cast("decimal(38,0)").alias("c1"),
    )
    cm = SP.global_prefix_sum(ag, "c", ["s"], out_col="cb")
    tt = cm.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).cast("decimal(38,0)").alias("n1"),
        F.coalesce(F.sum(F.col("c") - F.col("c1")), F.lit(0))
        .cast("decimal(38,0)")
        .alias("n0"),
        F.coalesce(
            F.sum(F.col("c1") * (2 * F.col("cb") + F.col("c") + 1)), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("r2"),
    )
    return tt.selectExpr(
        "CAST(n1 AS BIGINT) AS n_pos",
        "CAST(n0 AS BIGINT) AS n_neg",
        "CASE WHEN n1 = 0 OR n0 = 0 THEN NULL"
        "     ELSE CAST((1000000 * (r2 - n1 * (n1 + 1))) div (2 * n1 * n0)"
        "               AS BIGINT) END AS auc_e6",
    )


# =====================================================================
# Language-model retrieval: Dirichlet-smoothed query likelihood
# =====================================================================

_QL_TERMS = ("spark", "join", "window")  # same query as bm25_keyword_search
_QL_MU = 2000  # Zhai & Lafferty 2001's recommended prior mass


def _ql_sql() -> str:
    terms = _QL_TERMS
    cf_cols = ", ".join(
        f"CAST(sum(CASE WHEN tok = '{w}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS cf_{w}"
        for w in terms
    )
    tf_cols = ", ".join(
        f"CAST(sum(CASE WHEN tok = '{w}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS tf_{w}"
        for w in terms
    )
    mu = f"CAST({_QL_MU} AS DOUBLE)"
    lns = " + ".join(
        f"ln((CAST(tf_{w} AS DOUBLE) + {mu} * (CAST(cf_{w} AS DOUBLE)"
        f" / CAST(c_total AS DOUBLE))) / (CAST(dl AS DOUBLE) + {mu}))"
        for w in terms
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    tok AS (SELECT doc_id, unnest(w) AS tok FROM toks),
    g AS (SELECT CAST(count(*) AS BIGINT) AS c_total, {cf_cols} FROM tok),
    d AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl, {tf_cols}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, dl,
           CAST(floor(CAST(10000 AS DOUBLE) * ({lns})) AS BIGINT)
             AS ql_score_e4
    FROM d CROSS JOIN g
    ORDER BY ql_score_e4 DESC, doc_id
    LIMIT 10
    """


@register("query_likelihood_dirichlet", _ql_sql())
def query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2001, public literature) — the language-modeling ranker completing
    the lexical family next to BM25 (tf saturation) and TF-IDF (vector
    space): score(d) = sum_q ln((tf_qd + mu * cf_q / |C|) / (|d| + mu)),
    mu = 2000. Unlike BM25, every document scores (smoothing gives
    unseen terms collection-level mass), so the ranking discriminates
    even when no query term occurs.

    Exactness: tf/dl/cf/|C| are exact integer counts from ONE grouped
    pass over the exploded token stream; the score is a per-row sum of
    exactly three ln terms in fixed literal order — no ln ever crosses
    an aggregation boundary, strictly tighter than the proven
    bigram_lm_score envelope (which sums data-many ln terms); floored
    at e4 with doc_id tie-break, so a sub-quantum ulp divergence cannot
    reorder the emitted top-10.

    Scale shape: one token explode + groupBy(doc_id) partial+final
    aggregate (tf and dl in the same pass); the collection stats ride in
    as a 1-row broadcast; final top-10 is a TakeOrdered, never a global
    sort."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", X.tokens("text").alias("w"))
    )
    tok = toks.select("doc_id", F.explode("w").alias("tok"))
    g = tok.agg(
        F.count(F.lit(1)).cast("bigint").alias("c_total"),
        *[
            F.sum(F.when(F.col("tok") == w, 1).otherwise(0))
            .cast("bigint")
            .alias(f"cf_{w}")
            for w in _QL_TERMS
        ],
    )
    d = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == w, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf_{w}")
            for w in _QL_TERMS
        ],
    )
    mu = F.lit(_QL_MU).cast("double")
    dld = F.col("dl").cast("double")
    score = None
    for w in _QL_TERMS:
        term = F.log(
            (
                F.col(f"tf_{w}").cast("double")
                + mu * (F.col(f"cf_{w}").cast("double") / F.col("c_total").cast("double"))
            )
            / (dld + mu)
        )
        score = term if score is None else score + term
    return (
        d.crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            "dl",
            F.floor(F.lit(10000).cast("double") * score)
            .cast("bigint")
            .alias("ql_score_e4"),
        )
        .orderBy(F.desc("ql_score_e4"), "doc_id")
        .limit(10)
    )
