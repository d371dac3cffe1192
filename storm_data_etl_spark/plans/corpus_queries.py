"""Corpus-quality and signal-extraction queries: statistical language-model
scoring, markup cleaning, change-point detection, and EWMA smoothing.

These extend the reference's text-analysis surface (the genmock/validate
report queries, `cmd/genmock/main.go:194-354`) to the operations a
large-scale training-data pipeline runs over a document corpus and an event
stream. Everything is built-in Catalyst expressions — no Python in the data
path — with DuckDB oracles mirroring the exact arithmetic.

Float parity notes (see window_queries.moving_avg_7d): per-row doubles are
deterministic across engines (same IEEE ops on same inputs); only
*aggregated* doubles carry summation-order noise, so every aggregated float
is emitted as `floor(x * 10^k)` — never `round()`, whose half-way behavior
differs between Spark (shortest-decimal-string) and DuckDB (binary value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.operators import sampling as SP
from storm_data_etl_spark.operators.dedup import global_rank
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t
from storm_data_etl_spark.session import pin as _pin


# =====================================================================
# Bigram language-model quality score (CCNet-style perplexity proxy)
# =====================================================================

@register(
    "bigram_lm_score",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
      SELECT doc_id, w[r.i] AS prev, w[r.i + 1] AS cur
      FROM toks, unnest(range(1, len(w))) AS r(i)
    ),
    bigc AS (SELECT prev, cur, count(*) AS c_ab FROM bg GROUP BY prev, cur),
    ctxc AS (SELECT prev, sum(c_ab) AS c_ctx FROM bigc GROUP BY prev),
    v AS (SELECT count(DISTINCT tok) AS v_size
          FROM (SELECT unnest(w) AS tok FROM toks) u),
    scored AS (
      SELECT bg.doc_id,
             ln((bigc.c_ab + 1)::DOUBLE / (ctxc.c_ctx + v.v_size)) AS logp
      FROM bg JOIN bigc USING (prev, cur) JOIN ctxc USING (prev) CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(floor(10000 * sum(logp) / count(*)) AS BIGINT) AS lm_score_e4
    FROM scored GROUP BY doc_id
    """,
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one-smoothed bigram LM, scoring each document by
    its mean log P(w_i | w_{i-1}) — the cheap in-engine stand-in for the
    KenLM perplexity filter used in CCNet-style corpus curation (low score
    = unnatural/boilerplate text).

    Scale shape: the LM tables (bigram counts, context totals, vocabulary
    size) are corpus-global but vocabulary-bounded — orders of magnitude
    smaller than the corpus — so both joins broadcast and the only big
    shuffles are the two count aggregations, each map-side partial. At
    100 TB the bigram table may exceed the broadcast cap; dropping the
    explicit hint lets AQE pick shuffle-hash, with the plan otherwise
    unchanged.
    """
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", X.tokens("text").alias("w"))
    )
    n_pairs = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("w", 1, n_pairs),
        F.slice("w", 2, n_pairs),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    bg = toks.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.prev", "p.cur"
    )
    bigc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_ab"))
    ctxc = bigc.groupBy("prev").agg(F.sum("c_ab").alias("c_ctx"))
    vocab = toks.select(F.explode("w").alias("tok")).agg(
        F.count_distinct("tok").alias("v_size")
    )
    logp = F.log(
        (F.col("c_ab") + 1).cast("double") / (F.col("c_ctx") + F.col("v_size"))
    )
    return (
        bg.join(F.broadcast(bigc), ["prev", "cur"])
        .join(F.broadcast(ctxc), ["prev"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.floor(10000 * F.sum(logp) / F.count(F.lit(1)))
            .cast("bigint")
            .alias("lm_score_e4"),
        )
    )


# =====================================================================
# Stupid-backoff trigram LM, held-out scoring (perplexity filter)
# =====================================================================

@register(
    "stupid_backoff_trigram_score",
    rf"""
    WITH toks AS (
      SELECT doc_id, {SP.lcg_bucket_sql('doc_id')} < 80 AS is_train,
             regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    tri AS (
      SELECT doc_id, is_train, w[r.i] AS w1, w[r.i + 1] AS w2, w[r.i + 2] AS w3
      FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
    ),
    bg AS (
      SELECT is_train, w[r.i] AS prev, w[r.i + 1] AS cur
      FROM toks, unnest(range(1, len(w))) AS r(i)
    ),
    tric AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri WHERE is_train
             GROUP BY w1, w2, w3),
    bigc AS (SELECT prev, cur, count(*) AS cb FROM bg WHERE is_train
             GROUP BY prev, cur),
    unic AS (SELECT tok, count(*) AS cu
             FROM (SELECT unnest(w) AS tok FROM toks WHERE is_train) u
             GROUP BY tok),
    tot AS (SELECT count(*) AS n_tokens, count(DISTINCT tok) AS v_size
            FROM (SELECT unnest(w) AS tok FROM toks WHERE is_train) u),
    scored AS (
      SELECT t.doc_id,
             CASE WHEN tc.c123 IS NOT NULL THEN 0
                  WHEN b23.cb IS NOT NULL THEN 1 ELSE 2 END AS leg,
             CASE WHEN tc.c123 IS NOT NULL
                    THEN ln(CAST(tc.c123 AS DOUBLE) / b12.cb)
                  WHEN b23.cb IS NOT NULL
                    THEN ln((0.4 * b23.cb) / u2.cu)
                  ELSE ln((0.16 * (coalesce(u3.cu, 0) + 1))
                          / (tot.n_tokens + tot.v_size)) END AS logp
      FROM tri t
      LEFT JOIN tric tc ON tc.w1 = t.w1 AND tc.w2 = t.w2 AND tc.w3 = t.w3
      LEFT JOIN bigc b12 ON b12.prev = t.w1 AND b12.cur = t.w2
      LEFT JOIN bigc b23 ON b23.prev = t.w2 AND b23.cur = t.w3
      LEFT JOIN unic u2 ON u2.tok = t.w2
      LEFT JOIN unic u3 ON u3.tok = t.w3
      CROSS JOIN tot
      WHERE NOT t.is_train
    )
    SELECT doc_id,
           count(*) AS n_trigrams,
           CAST(sum(CASE WHEN leg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
           CAST(sum(CASE WHEN leg = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bigram_backoffs,
           CAST(sum(CASE WHEN leg = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unigram_backoffs,
           CAST(floor(10000 * sum(logp) / count(*)) AS BIGINT) AS sb_score_e4
    FROM scored GROUP BY doc_id
    """,
)
def stupid_backoff_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out stupid-backoff trigram LM scoring (Brants et al. 2007) —
    the KenLM-perplexity-filter shape at full fidelity: the LM trains on
    the 80% LCG split and scores the HELD-OUT 20%, so the backoff chain
    (trigram hit → ×0.4 bigram → ×0.16 add-one unigram, which also absorbs
    OOV words) genuinely fires — a self-scored corpus would never back
    off. Emits per eval doc: trigram count, per-leg hit counts (how deep
    the model had to back off — itself a fluency signal) and the mean
    log-score floor-quantized to e4.

    Float parity: every s is computed with an identical IEEE op sequence
    in both engines ((0.4 * c) / c' — multiply before divide), and only
    the final mean is quantized (module-docstring discipline; ln() noise
    is sub-quantum at e4, the same accepted envelope as bigram_lm_score).

    Scale shape: n-gram extraction is zip_with over shifted slices (no
    self-join); the backoff arithmetic is folded INTO the LM tables at
    build time (KenLM ships log-probs, not counts), so scoring is 3
    broadcast joins instead of 5 and ln() runs once per table entry, not
    once per corpus position — at held-out scale the scoring side
    dominates, which is where the join savings land (measured a wash at
    sf0.1: 1.46 s five-join vs 1.55 s folded, noise-level; the folded
    form wins as eval volume grows). At 100 TB drop the broadcast hints
    and AQE picks shuffle-hash joins on uniform n-gram keys; the per-doc
    aggregate shuffles on uniform doc_id."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            (SP.lcg_bucket("doc_id") < 80).alias("is_train"),
            X.tokens("text").alias("w"),
        )
    )
    # Optimization r12 (guide §2.3/§2.4): the trigram, bigram and unigram
    # relations each re-ran the tokenize + explode (five corpus passes
    # counting the two consumers of the token stream). ONE padded explode
    # now emits exactly size(w) rows per doc — (w1, w2, w3) with NULL
    # tails via zip_with's shorter-side padding — and is PINNED; every
    # n-gram table is a filter + map-side-combinable aggregate over the
    # same materialized rows: trigrams are the w3-non-null rows, bigrams
    # the w2-non-null rows, unigrams all rows, and the training totals
    # fold out of the unigram table (n_tokens = sum cu, v_size = row
    # count — identical integers). Same rows, same counts, same floats.
    n1 = F.size("w")
    pairs12 = F.zip_with(
        F.col("w"),
        F.slice("w", 2, F.greatest(n1 - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    tris = F.zip_with(
        pairs12,
        F.slice("w", 3, F.greatest(n1 - 2, F.lit(0))),
        lambda ab, c: F.struct(
            ab["w1"].alias("w1"), ab["w2"].alias("w2"), c.alias("w3")
        ),
    )
    ex = toks.select(
        "doc_id", "is_train", F.explode(tris).alias("g")
    ).select("doc_id", "is_train", "g.w1", "g.w2", "g.w3")
    ex = _pin(ex)
    tri = ex.filter(F.col("w3").isNotNull())

    tric = (
        tri.filter("is_train")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c123"))
    )
    bigc = (
        ex.filter(F.col("is_train") & F.col("w2").isNotNull())
        .groupBy(F.col("w1").alias("prev"), F.col("w2").alias("cur"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    unic = (
        ex.filter("is_train")
        .groupBy(F.col("w1").alias("tok"))
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = unic.agg(
        F.sum("cu").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("v_size"),
    )

    # Fold the backoff arithmetic INTO the LM tables (KenLM ships
    # log-probs, not counts): 3 scoring joins instead of 5, and ln() runs
    # once per vocabulary entry instead of once per corpus position. Each
    # stored double is produced by the same IEEE op sequence the oracle
    # evaluates inline, so parity is unchanged.
    tri_s = tric.join(
        bigc.select(
            F.col("prev").alias("w1"), F.col("cur").alias("w2"), "cb"
        ),
        ["w1", "w2"],
    ).select(
        "w1",
        "w2",
        "w3",
        F.log(F.col("c123").cast("double") / F.col("cb")).alias("lp0"),
    )
    big_s = bigc.join(
        F.broadcast(unic.select(F.col("tok").alias("prev"), "cu")), ["prev"]
    ).select(
        F.col("prev").alias("w2"),
        F.col("cur").alias("w3"),
        F.log((F.lit(0.4) * F.col("cb")) / F.col("cu")).alias("lp1"),
    )
    uni_s = unic.crossJoin(F.broadcast(tot)).select(
        F.col("tok").alias("w3"),
        F.log(
            (F.lit(0.16) * (F.col("cu") + 1))
            / (F.col("n_tokens") + F.col("v_size"))
        ).alias("lp2"),
    )
    ev = (
        tri.filter(~F.col("is_train"))
        .join(F.broadcast(tri_s), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(big_s), ["w2", "w3"], "left")
        .join(F.broadcast(uni_s), ["w3"], "left")
        .crossJoin(F.broadcast(tot))
    )
    leg = (
        F.when(F.col("lp0").isNotNull(), 0)
        .when(F.col("lp1").isNotNull(), 1)
        .otherwise(2)
    )
    # OOV w3 (absent from uni_s): the add-one unigram default, same op
    # order as the oracle's else-branch with coalesce(cu,0).
    lp_oov = F.log(
        (F.lit(0.16) * (F.lit(0) + 1)) / (F.col("n_tokens") + F.col("v_size"))
    )
    logp = F.coalesce(F.col("lp0"), F.col("lp1"), F.col("lp2"), lp_oov)
    return (
        ev.select("doc_id", leg.alias("leg"), logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.when(F.col("leg") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_tri_hits"),
            F.sum(F.when(F.col("leg") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bigram_backoffs"),
            F.sum(F.when(F.col("leg") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unigram_backoffs"),
            F.floor(10000 * F.sum("logp") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("sb_score_e4"),
        )
    )


# =====================================================================
# Markup stripping (crawl-cleaning pass)
# =====================================================================

@register(
    "markup_strip_stats",
    r"""
    WITH h AS (
      SELECT source,
             '<html><body><h1>' || substr(text, 1, 16) || '</h1><p>' || text ||
             '</p><a href="https://example.com/' || CAST(doc_id AS VARCHAR) ||
             '">&nbsp;src</a></body></html>' AS html
      FROM documents
    ),
    c AS (
      SELECT source, html,
             trim(regexp_replace(regexp_replace(regexp_replace(
                 html, '<[^>]*>', ' ', 'g'),
                 '&[A-Za-z#0-9]{1,8};', ' ', 'g'),
                 '\s+', ' ', 'g')) AS clean
      FROM h
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(length(html)) AS BIGINT) AS total_html_chars,
           CAST(sum(length(clean)) AS BIGINT) AS total_clean_chars,
           CAST(floor(10000 * sum(length(clean))::DOUBLE / sum(length(html)))
                AS BIGINT) AS keep_ratio_e4
    FROM c GROUP BY source
    """,
)
def markup_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-stripping cleaning pass with per-source retention stats. The
    testdata corpus carries no markup, so the query synthesizes a
    deterministic HTML wrapper (title + paragraph + entity-bearing anchor)
    around each document and then runs `text.strip_markup` — exercising
    the real cleaning operator end-to-end with a value-checked oracle.
    One scan, three JVM regex passes, tiny per-source aggregate; ratios
    are exact-integer sums divided once (no float-sum noise)."""
    docs = t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>"),
        F.substring("text", 1, 16),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><a href="https://example.com/'),
        F.col("doc_id").cast("string"),
        F.lit('">&nbsp;src</a></body></html>'),
    )
    staged = docs.withColumn("html", html).withColumn(
        "clean", X.strip_markup("html")
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("html")).alias("total_html_chars"),
        F.sum(F.length("clean")).alias("total_clean_chars"),
        F.floor(
            10000 * F.sum(F.length("clean")).cast("double") / F.sum(F.length("html"))
        )
        .cast("bigint")
        .alias("keep_ratio_e4"),
    )


# =====================================================================
# Change-point detection (lag-based jump flags)
# =====================================================================

@register(
    "value_change_points",
    """
    WITH steps AS (
      SELECT user_id,
             "value" - lag("value") OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS jump
      FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           count(jump) AS n_steps,
           CAST(sum(CASE WHEN abs(jump) > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_change_points,
           CAST(floor(100 * max(abs(jump))) AS BIGINT) AS max_jump_e2
    FROM steps GROUP BY user_id
    """,
)
def value_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user change-point detection: consecutive-event value deltas
    (lag window over ns-precision `ts` with event_id tiebreak — see
    sessionize) flagged where |Δ| > 100 (~2σ of the value distribution).
    One shuffle on user_id; max is order-independent so its floor is
    parity-safe."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    jump = F.col("value") - F.lag("value").over(w)
    staged = t(spark, sf_dir, "events").select("user_id", jump.alias("jump"))
    return staged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("jump").alias("n_steps"),
        F.sum(F.when(F.abs("jump") > 100, 1).otherwise(0)).alias("n_change_points"),
        F.floor(100 * F.max(F.abs("jump"))).cast("bigint").alias("max_jump_e2"),
    )


# =====================================================================
# EWMA smoothing (trailing exponentially-weighted average, ordered fold)
# =====================================================================

@register(
    "ewma_last",
    """
    WITH lists AS (
      SELECT user_id,
             list("value") OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
               AS lastv,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE "value" IS NOT NULL
    )
    SELECT user_id, len(lastv) AS n_window,
           CAST(floor(10000 * list_reduce(
                  lastv::DOUBLE[],
                  (acc, x) -> acc * 0.8::DOUBLE + x * 0.2::DOUBLE))
                AS BIGINT) AS ewma_e4
    FROM lists WHERE rn = 1
    """,
)
def ewma_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's current EWMA (α=0.2) over their trailing 20 events —
    the smoothed-state readout behind monitoring dashboards. The recursion
    s ← 0.8·s + 0.2·x is evaluated as an explicit LEFT FOLD over the
    frame-ordered value list (`collect_list` over a bounded window +
    `F.aggregate`): both engines fold the identical list in the identical
    order, so the resulting double is bit-identical — aggregation-order
    noise, the usual float-parity hazard, never arises. One shuffle on
    user_id; the collected frame is bounded (20 rows) so state is O(1)
    per row."""
    w20 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    wn = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    # drop null metric rows BEFORE the frame: Spark's collect_list silently
    # skips NULLs while DuckDB's list() keeps them — the window contents
    # would diverge (found by the null-injection audit).
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            F.collect_list("value").over(w20).alias("lastv"),
        )
    )
    last = (
        ev.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts", "event_id")
    )
    tail = F.slice("lastv", 2, F.greatest(F.size("lastv") - 1, F.lit(0)))
    ewma = F.aggregate(
        tail,
        F.element_at("lastv", 1).cast("double"),
        lambda acc, x: acc * F.lit(0.8) + x * F.lit(0.2),
    )
    return last.select(
        "user_id",
        F.size("lastv").alias("n_window"),
        F.floor(10000 * ewma).cast("bigint").alias("ewma_e4"),
    )


# =====================================================================
# TF-IDF characteristic phrases per source
# =====================================================================

@register(
    "tfidf_top_terms",
    r"""
    WITH toks AS (
      SELECT source, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    terms AS (
      SELECT source, w[r.i] || ' ' || w[r.i + 1] AS term
      FROM toks, unnest(range(1, len(w))) AS r(i)
    ),
    tf AS (SELECT source, term, count(*) AS tf FROM terms GROUP BY source, term),
    dfreq AS (SELECT term, count(DISTINCT source) AS df_s FROM tf GROUP BY term),
    nsrc AS (SELECT count(DISTINCT source) AS n_src FROM toks),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, dfreq.df_s,
             tf.tf * ln((1 + nsrc.n_src)::DOUBLE / (1 + dfreq.df_s)) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN nsrc
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY source ORDER BY score DESC, term) AS rnk
      FROM scored
    )
    SELECT source, rnk, term, tf, df_s,
           CAST(floor(10000 * score) AS BIGINT) AS score_e4
    FROM ranked WHERE rnk <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic phrases per source: TF-IDF over word bigrams
    (unigrams are degenerate on this corpus — every word appears in every
    source), smoothed idf = ln((1+N)/(1+df)), top-5 per source with a
    deterministic term tiebreak.

    Scale shape: term frequencies shuffle on (source, term) — both
    high-cardinality, skew-free; document frequency and corpus size are
    vocabulary-bounded side tables that ride broadcasts into the scoring
    join; the top-k is one window shuffle on source. Same three-table
    pattern as bm25_keyword_search, reading the corpus once."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("source", X.tokens("text").alias("w"))
    )
    n_pairs = F.greatest(F.size("w") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("w", 1, n_pairs),
        F.slice("w", 2, n_pairs),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    terms = toks.select("source", F.explode(bigrams).alias("term"))
    tf = terms.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    # (Optimization r12 note: pinning tf for its two consumers was
    # measured and is a WASH at sf0.1 — (source, bigram) counts are
    # near-positions-sized on this corpus, so materializing them costs
    # what the second explode saves. Kept unpinned.)
    dfreq = tf.groupBy("term").agg(F.count_distinct("source").alias("df_s"))
    nsrc = toks.agg(F.count_distinct("source").alias("n_src"))
    score = F.col("tf") * F.log(
        (1 + F.col("n_src")).cast("double") / (1 + F.col("df_s"))
    )
    w_rank = Window.partitionBy("source").orderBy(F.desc("score"), "term")
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nsrc))
        .withColumn("score", score)
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= 5)
        .select(
            "source",
            "rnk",
            "term",
            "tf",
            "df_s",
            F.floor(10000 * F.col("score")).cast("bigint").alias("score_e4"),
        )
    )


# =====================================================================
# Vocabulary coverage (tokenizer truncation planning)
# =====================================================================

@register(
    "vocab_coverage",
    r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    tot AS (SELECT count(*) AS n_total FROM toks),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    top AS (
      SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rank
      FROM cnt QUALIFY rank <= 100
    )
    SELECT rank, tok, c,
           CAST(floor(1000000.0 * sum(c) OVER (ORDER BY rank)
                      / n_total) AS BIGINT) AS cum_cov_e6
    FROM top CROSS JOIN tot
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 tokens by corpus frequency with cumulative token-stream
    coverage — the curve a tokenizer/vocabulary-size decision reads off
    ("how much of the stream do the top-N types cover?").

    Scale shape: the token count is one map-side-combined shuffle on
    uniform token keys; top-100 is a TakeOrdered (no global sort of the
    vocabulary); only the 100 survivors hit the single-partition
    cumulative window, and the scalar total broadcasts. The (count desc,
    token) order is total, so rank — and therefore the cumulative sum —
    is deterministic in both engines.
    """
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(F.explode(X.tokens("text")).alias("tok"))
    )
    toks = _pin(toks)  # counted twice: per-token and grand total
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(100)
    )
    w_rank = Window.orderBy(F.desc("c"), "tok")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w_rank))
        .select(
            "rank",
            "tok",
            "c",
            F.floor(1000000.0 * F.sum("c").over(w_cum) / F.col("n_total"))
            .cast("bigint")
            .alias("cum_cov_e6"),
        )
    )


# =====================================================================
# Per-source document cap (domain-balance retention)
# =====================================================================

@register(
    "per_source_cap",
    """
    SELECT source, rank, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
    ) ranked
    WHERE rank <= 10
    """,
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: keep at most 10 documents per source,
    preferring the largest (n_chars desc, doc_id tie-break) — the
    crawl-curation rule that stops any single domain from dominating the
    training mix. One shuffle on source; the rank window's (n_chars desc,
    doc_id) order is total, so the kept set is deterministic. At 100 TB
    a heavy-domain skew would make per-source partitions uneven — the
    same window runs after salting with skew.salted_top_values if a
    domain exceeds a task's memory; semantics unchanged."""
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        t(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 10)
        .select("source", "rank", "doc_id", "n_chars")
    )


# =====================================================================
# Python UDTF (Spark 4 user-defined table function — the one extension
# point where a row legitimately explodes into a variable-length set)
# =====================================================================

@register(
    "udtf_sentence_stats",
    """
    WITH sent AS (
      SELECT doc_id, trim(s.s) AS sentence
      FROM documents,
           unnest(regexp_extract_all(text, '[^.!?]+[.!?]?')) AS s(s)
      WHERE trim(s.s) <> ''
    )
    SELECT doc_id, count(*) AS n_sentences,
           max(length(sentence)) AS max_sentence_chars,
           CAST(sum(length(sentence)) AS BIGINT) AS total_sentence_chars
    FROM sent GROUP BY doc_id
    """,
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation via a Python UDTF (Spark 4's table-function
    API, Arrow-batched): one input document row yields N sentence rows —
    the lateral-join shape that a scalar UDF cannot express. The regex is
    lookaround-free so the DuckDB oracle replays it exactly.

    This is deliberately the ENGINE's UDTF-surface demo: everything else
    in the corpus family stays in JVM expressions (explode over split works
    for this particular regex too), but real segmenters (spaCy, pysbd,
    tiktoken) are Python libraries — this is the plumbing they plug into.
    Narrow: the UDTF runs map-side per partition; only the per-doc
    aggregate shuffles."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sentence string", useArrow=True)
    class SplitSentences:
        def eval(self, doc_id, text):  # noqa: ANN001
            for raw in re.findall(r"[^.!?]+[.!?]?", text or ""):
                # strip SPACES only: the oracle's trim() strips spaces, while
                # Python's bare .strip() also removes \n/\t — a latent parity
                # break for multi-line text.
                s = raw.strip(" ")
                if s:
                    yield doc_id, s

    spark.udtf.register("split_sentences", SplitSentences)
    docs = t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    sent = spark.sql(
        "SELECT s.doc_id, s.sentence FROM _udtf_docs d, "
        "LATERAL split_sentences(d.doc_id, d.text) s"
    )
    return sent.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.max(F.length("sentence")).alias("max_sentence_chars"),
        F.sum(F.length("sentence")).alias("total_sentence_chars"),
    )


# =====================================================================
# URL parsing (crawl-provenance analytics — parse_url JVM expressions)
# =====================================================================

@register(
    "url_host_stats",
    r"""
    WITH urls AS (
      SELECT doc_id,
             'https://cdn' || CAST(doc_id % 7 AS VARCHAR)
             || '.example.org/corpus/' || source || '/doc-'
             || CAST(doc_id AS VARCHAR) || '.txt?lang=' || lang
             || '&rev=' || CAST(doc_id % 13 AS VARCHAR) AS url,
             n_chars
      FROM documents
    ),
    parsed AS (
      SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
             regexp_extract(url, 'rev=([0-9]+)', 1) AS rev,
             n_chars
      FROM urls
    )
    SELECT host, count(*) AS n_docs,
           count(DISTINCT rev) AS n_revs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM parsed GROUP BY host
    """,
)
def url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-provenance analytics through Spark's URL expressions: document
    URLs (synthesized deterministically — the testdata has no real ones)
    parsed with parse_url(HOST) and parse_url(QUERY, key), then per-host
    doc counts, distinct revision params, and byte mass — the
    domain-grouping pass every crawl pipeline runs for robots/ToS buckets,
    per-domain caps (per_source_cap's upstream), and dedup scoping. JVM
    expressions end to end; the oracle reproduces the parse with regex
    (DuckDB has no URL parser), which hashes identically because the URLs
    are well-formed by construction."""
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://cdn"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org/corpus/"), F.col("source"), F.lit("/doc-"),
        F.col("doc_id").cast("string"), F.lit(".txt?lang="), F.col("lang"),
        F.lit("&rev="), (F.col("doc_id") % 13).cast("string"),
    )
    parsed = docs.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("QUERY"), F.lit("rev")).alias("rev"),
        "n_chars",
    )
    return parsed.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("rev").alias("n_revs"),
        F.sum("n_chars").alias("total_chars"),
    )


# =====================================================================
# Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
# Language Models: ... Gopher" §A1.1; C4 filtering, Raffel et al. 2020 —
# public literature). The reference has no repetition filter; this is
# part of the training-data extension surface.
# =====================================================================

@register(
    "doc_repetition_stats",
    """
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words
      FROM documents
    ),
    w AS (
      -- parallel unnests in the projection align positionally in DuckDB
      SELECT doc_id, unnest(words) AS word,
             unnest(range(1, len(words) + 1)) AS pos
      FROM d
    ),
    wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
    ws AS (
      SELECT doc_id, sum(c) AS n_words, count(*) AS distinct_words,
             max(c) AS top_word_count
      FROM wc GROUP BY 1
    ),
    bg AS (
      SELECT a.doc_id, a.word || ' ' || b.word AS g
      FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    bgc AS (
      SELECT doc_id, max(c) AS top_bigram_count
      FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
      GROUP BY 1
    ),
    tg AS (
      SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c3.word AS g
      FROM w a
      JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN w c3 ON a.doc_id = c3.doc_id AND c3.pos = a.pos + 2
    ),
    tgc AS (
      SELECT doc_id,
             sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_trigram_tokens
      FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2)
      GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(ws.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(ws.distinct_words, 0) AS BIGINT) AS distinct_words,
           CAST(coalesce(ws.top_word_count, 0) AS BIGINT) AS top_word_count,
           CAST(coalesce(bgc.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
           CAST(coalesce(tgc.dup_trigram_tokens, 0) AS BIGINT) AS dup_trigram_tokens
    FROM d
    LEFT JOIN ws USING (doc_id)
    LEFT JOIN bgc USING (doc_id)
    LEFT JOIN tgc USING (doc_id)
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document, as EXACT integers
    (consumers divide; no float in the hash): total/distinct word counts,
    the modal word's count, the modal bigram's count, and the number of
    trigram instances belonging to a repeated trigram. High
    top_*_count / n_words or dup_trigram_tokens / n_words marks the
    boilerplate/spam documents every LLM-corpus pipeline drops.

    Plan shape: n-gram arrays are built JVM-side from ONE split
    (zip_with over shifted slices — no self-join to form n-grams), then
    three explode→groupBy aggregates ALL keyed by doc_id, re-joined on
    doc_id. Every shuffle is on the uniform doc_id key, so the plan
    scales with corpus size and no key can hot-spot (a single giant doc
    bounds one task at O(doc words), not the stage)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_remove(F.split("text", " +"), "").alias("words")
    )
    n = F.size("words")
    docs = (
        docs.withColumn(
            "bigrams",
            F.zip_with(
                F.slice("words", 1, F.greatest(F.lit(0), n - 1)),
                F.slice("words", 2, F.greatest(F.lit(0), n - 1)),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        )
        .withColumn(
            "trigrams",
            F.zip_with(
                F.slice("words", 1, F.greatest(F.lit(0), n - 2)),
                F.zip_with(
                    F.slice("words", 2, F.greatest(F.lit(0), n - 2)),
                    F.slice("words", 3, F.greatest(F.lit(0), n - 2)),
                    lambda b, c: F.concat_ws(" ", b, c),
                ),
                lambda a, bc: F.concat_ws(" ", a, bc),
            ),
        )
    )
    # Optimization r12 (guide §2.4): every statistic is PER-DOC local
    # (multiplicities of a doc's own n-grams), so the three explode →
    # (doc, gram) → doc shuffle chains and the three-way join collapse to
    # in-row folds over sorted arrays — zero exchanges in the whole
    # query. Run lengths in array_sort(arr) are exactly the per-gram
    # multiplicities the groupBys counted: max run = modal count, and
    # summing runs that reach 2 (add 2 at the second element, 1 per
    # element after) = Σ count over groups with count ≥ 2. Identical
    # integers; docs with NULL/empty text coalesce to 0 as before.
    def _max_run(arr):
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )
        def step(acc, x):
            r = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                F.lit(1)
            )
            return F.struct(
                x.alias("prev"),
                r.alias("run"),
                F.greatest(acc["best"], r).alias("best"),
            )
        return F.aggregate(F.array_sort(arr), zero, step, lambda s: s["best"])

    def _dup_tokens(arr):
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("tot"),
        )
        def step(acc, x):
            r = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(
                F.lit(1)
            )
            add = F.when(r == 2, 2).when(r > 2, 1).otherwise(0)
            return F.struct(
                x.alias("prev"), r.alias("run"), (acc["tot"] + add).alias("tot")
            )
        return F.aggregate(F.array_sort(arr), zero, step, lambda s: s["tot"])

    return docs.select(
        "doc_id",
        F.coalesce(F.size("words"), F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce(F.size(F.array_distinct("words")), F.lit(0))
        .cast("bigint")
        .alias("distinct_words"),
        F.coalesce(_max_run(F.col("words")), F.lit(0))
        .cast("bigint")
        .alias("top_word_count"),
        F.coalesce(_max_run(F.col("bigrams")), F.lit(0))
        .cast("bigint")
        .alias("top_bigram_count"),
        F.coalesce(_dup_tokens(F.col("trigrams")), F.lit(0))
        .cast("bigint")
        .alias("dup_trigram_tokens"),
    )


# =====================================================================
# Holt linear-trend smoothing (double exponential; EWMA's trend-aware
# big sibling — same ordered-fold bit-parity discipline)
# =====================================================================

@register(
    "holt_trend_forecast",
    """
    WITH lists AS (
      SELECT event_type,
             list("value") OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 63 PRECEDING AND CURRENT ROW)
               AS lastv,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE "value" IS NOT NULL
    ),
    folded AS (
      SELECT event_type, len(lastv) AS n_window,
             list_reduce(
               list_prepend([lastv[1]::DOUBLE, 0.0::DOUBLE],
                            list_transform(lastv[2:]::DOUBLE[],
                                           v -> [v, 0.0::DOUBLE])),
               (acc, x) -> [
                 0.2::DOUBLE * x[1] + 0.8::DOUBLE * (acc[1] + acc[2]),
                 0.3::DOUBLE * ((0.2::DOUBLE * x[1]
                                 + 0.8::DOUBLE * (acc[1] + acc[2])) - acc[1])
                   + 0.7::DOUBLE * acc[2]
               ]) AS st
      FROM lists WHERE rn = 1
    )
    SELECT event_type, n_window,
           CAST(floor(10000 * st[1]) AS BIGINT) AS level_e4,
           CAST(floor(10000 * st[2]) AS BIGINT) AS trend_e4,
           CAST(floor(10000 * (st[1] + 3 * st[2])) AS BIGINT) AS forecast3_e4
    FROM folded
    """,
)
def holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α=0.2, β=0.3)
    over each event type's trailing 64 values, plus the 3-step-ahead
    linear forecast — the simplest real forecasting primitive above EWMA
    (Holt 1957, public literature). State is a 2-element double array
    folded left over the frame-ordered list with IDENTICAL per-step
    expressions on both engines (the new level subexpression is inlined
    twice rather than bound, so the op sequence matches exactly) —
    bit-identical doubles, no aggregation-order noise. One shuffle on
    event_type; the collected frame is bounded (64 rows)."""
    w64 = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-63, Window.currentRow)
    )
    wn = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            F.collect_list("value").over(w64).alias("lastv"),
        )
    )
    last = (
        ev.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts", "event_id")
    )
    tail = F.transform(
        F.slice("lastv", 2, F.greatest(F.size("lastv") - 1, F.lit(0))),
        lambda v: F.array(v.cast("double"), F.lit(0.0)),
    )
    init = F.array(F.element_at("lastv", 1).cast("double"), F.lit(0.0))
    newl = lambda acc, x: (  # noqa: E731
        F.lit(0.2) * F.element_at(x, 1)
        + F.lit(0.8) * (F.element_at(acc, 1) + F.element_at(acc, 2))
    )
    st = F.aggregate(
        tail,
        init,
        lambda acc, x: F.array(
            newl(acc, x),
            F.lit(0.3) * (newl(acc, x) - F.element_at(acc, 1))
            + F.lit(0.7) * F.element_at(acc, 2),
        ),
    )
    return last.select(
        "event_type",
        F.size("lastv").alias("n_window"),
        F.floor(10000 * F.element_at(st, 1)).cast("bigint").alias("level_e4"),
        F.floor(10000 * F.element_at(st, 2)).cast("bigint").alias("trend_e4"),
        F.floor(10000 * (F.element_at(st, 1) + 3 * F.element_at(st, 2)))
        .cast("bigint")
        .alias("forecast3_e4"),
    )


# =====================================================================
# Feature hashing (the "hashing trick", Weinberger et al. 2009 — public
# literature): text → fixed-width sparse vectors with NO vocabulary
# table, the stateless featurizer upstream of similarity / clustering
# =====================================================================

@register(
    "feature_hash_vectors",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
               AS tok
      FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                            list_transform(string_split(tok, ''),
                                           c -> ascii(c)::BIGINT)),
               (acc, c) -> (acc * 31 + c) % 2147483648
             ) % 64 AS feature
      FROM toks
    )
    SELECT doc_id, CAST(feature AS INTEGER) AS feature,
           count(*) AS n_tokens
    FROM hashed GROUP BY doc_id, feature
    """,
)
def feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every token maps to one of 64 feature slots via
    a polynomial rolling hash over its characters — a fixed-width sparse
    bag-of-words vector with no vocabulary table, no training, and no
    driver state (the featurizer that feeds clustering / similarity when
    embeddings are unavailable). Output is the exploded sparse form
    (doc, feature, count). The hash is a char-code fold with IDENTICAL
    integer ops on both engines (probed: 'spark' → 109638365 on Spark,
    DuckDB and Python alike), so the oracle pins every slot assignment.

    Scale shape: one narrow split/explode + one groupBy on (doc_id,
    feature) — uniform composite key, no vocabulary broadcast, nothing
    driver-side. Dim 64 is the gate-friendly width; production widths
    (2^18+) change one literal."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_remove(F.split("text", " +"), "")).alias("tok"),
    )
    h = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(acc * 31 + F.ascii(ch), F.lit(2147483648)),
    )
    hashed = toks.select("doc_id", F.pmod(h, F.lit(64)).cast("int").alias("feature"))
    return hashed.groupBy("doc_id", "feature").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )


@register("text_cluster_sizes", None)  # k-means training: no SQL twin
def text_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end unsupervised TEXT clustering with no external model:
    documents → 64-slot hashing-trick count vectors (one conditional-sum
    pass, no vocabulary) → deterministic k-means (the same bounded-sample
    trainer IVF uses) → every doc assigned to its nearest centroid via
    the broadcast-codebook JVM expressions. Emits per-cluster sizes and
    canonical (min) doc ids. Rows-only at the gate (iterative training
    has no SQL twin); pytest pins determinism and that the assignment is
    the true argmin.

    Scale shape: featurize = narrow + 1 groupBy(doc); training cost is
    constant (sample-bounded); assignment is a narrow map over the
    vectors; final count is a tiny aggregate on the 8-value cluster key."""
    from storm_data_etl_spark.operators import similarity as S

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_remove(F.split("text", " +"), "")).alias("tok"),
    )
    h = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: F.pmod(acc * 31 + F.ascii(ch), F.lit(2147483648)),
    )
    hashed = toks.select("doc_id", F.pmod(h, F.lit(64)).cast("int").alias("feature"))
    vecs = hashed.groupBy("doc_id").agg(
        F.array(
            *[
                F.sum(F.when(F.col("feature") == i, 1).otherwise(0)).cast("double")
                for i in range(64)
            ]
        ).alias("embedding")
    )
    vecs = vecs.withColumnRenamed("doc_id", "vec_id")
    # Optimization r12 (guide §2.4): vecs feeds the trainer's bounded
    # sample collect AND the assignment pass — each re-ran the featurize
    # (the per-token char-fold hash is the expensive narrow op). Pinned,
    # featurize runs once; ~0.5 KB per doc cached.
    vecs = _pin(vecs)
    # Empty-corpus guard on the NARROW token stream, not on `vecs`: vecs
    # is the groupBy output, so isEmpty() there would execute the whole
    # featurize shuffle once just to check — the token scan short-circuits
    # at the first row, and vecs is empty iff toks is (a doc with no
    # tokens contributes no rows). The trainer (rightly) refuses an empty
    # table, so return the empty result directly instead of crashing —
    # consistent with every other query's empty-input contract
    # (tools/empty_input_check.py).
    if toks.isEmpty():
        return spark.createDataFrame(
            [], "cluster int, n_docs bigint, canonical_doc bigint"
        )
    cents = S.train_ivf_centroids(vecs, dim=64, n_centroids=8, sample_n=512)
    assigned = vecs.withColumn(
        "cluster", S._nearest_cells("embedding", cents, 1)[0]["cell"]
    )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("vec_id").alias("canonical_doc"),
        )
        .orderBy("cluster")
    )


# =====================================================================
# Positional phrase search (the inverted-index phrase operator BM25's
# bag-of-words scoring cannot express)
# =====================================================================

_PHRASE = ("slow", "hash", "batch")


@register(
    "phrase_search_positional",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id, unnest(w) AS tok,
             unnest(range(1, len(w) + 1)) AS p
      FROM toks
    ),
    t0 AS (SELECT doc_id, p FROM pos WHERE tok = '{_PHRASE[0]}'),
    t1 AS (SELECT doc_id, p FROM pos WHERE tok = '{_PHRASE[1]}'),
    t2 AS (SELECT doc_id, p FROM pos WHERE tok = '{_PHRASE[2]}'),
    hits AS (
      SELECT t0.doc_id, t0.p AS start_pos
      FROM t0
      JOIN t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
      JOIN t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2
    )
    SELECT doc_id, count(*) AS n_occurrences,
           CAST(min(start_pos) AS BIGINT) AS first_pos
    FROM hits GROUP BY doc_id
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('slow hash batch') via positional posting
    intersection — the inverted-index operator behind quoted queries,
    which bag-of-words scoring (bm25_keyword_search) cannot express.
    Postings are built ONLY for the phrase's terms (the filter pushes to
    the token stream before any join — at 100 TB this is the difference
    between joining three term posting lists and joining the corpus), and
    adjacency is two equi-joins on (doc, position). Emits per-doc
    occurrence counts and the first match position; the oracle replays
    the identical positional algebra, and pytest cross-checks against the
    naive contains() scan."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.array_remove(F.split("text", " +"), "")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    t0 = toks.filter(F.col("tok") == _PHRASE[0]).select("doc_id", F.col("p").alias("pa"))
    t1 = toks.filter(F.col("tok") == _PHRASE[1]).select("doc_id", F.col("p").alias("pb"))
    t2 = toks.filter(F.col("tok") == _PHRASE[2]).select("doc_id", F.col("p").alias("pc"))
    hits = (
        t0.join(t1, "doc_id")
        .filter(F.col("pb") == F.col("pa") + 1)
        .join(t2, "doc_id")
        .filter(F.col("pc") == F.col("pa") + 2)
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("pa").alias("first_pos"),
    )


# =====================================================================
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public literature)
# =====================================================================

@register(
    "dsir_importance_weights",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    tok AS (SELECT doc_id, unnest(w) AS word FROM toks),
    dw AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
    rawc AS (SELECT word, count(*) AS cr FROM tok GROUP BY word),
    tgtc AS (
      SELECT tok.word, count(*) AS ct
      FROM tok JOIN documents d ON d.doc_id = tok.doc_id
      WHERE d.lang = 'en' GROUP BY tok.word
    ),
    tots AS (
      SELECT (SELECT sum(cr) FROM rawc) AS nr,
             (SELECT coalesce(sum(ct), 0) FROM tgtc) AS nt,
             (SELECT count(*) FROM rawc) AS v
    ),
    ratio AS (
      SELECT r.word,
             ln((coalesce(t.ct, 0) + 1)::DOUBLE / (tots.nt + tots.v))
             - ln((r.cr + 1)::DOUBLE / (tots.nr + tots.v)) AS lr
      FROM rawc r LEFT JOIN tgtc t ON t.word = r.word CROSS JOIN tots
    )
    SELECT dw.doc_id,
           CAST(sum(dw.c) AS BIGINT) AS n_tokens,
           CAST(floor(10000 * sum(dw.c * ratio.lr) / sum(dw.c)) AS BIGINT)
             AS dsir_e4
    FROM dw JOIN ratio ON ratio.word = dw.word
    GROUP BY dw.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight per document: mean per-token log-likelihood
    ratio ln(p_target/p_raw) under add-one-smoothed unigram LMs, with the
    English subcorpus as the target distribution — the data-selection
    score used to resample a raw crawl toward a target domain (Xie et al.
    2023). High = looks like the target; the resampling step itself is the
    existing weighted_corpus_pick operator.

    Scale shape: three word-keyed aggregations (per-doc·word counts, raw
    counts, target counts) — all map-side partial over uniform keys — then
    one join of the per-doc·word table against the vocabulary-bounded
    ratio table (broadcastable until the vocab outgrows the cap, then AQE
    shuffle-hash) and a doc-keyed final sum. No all-pairs anywhere; linear
    in corpus size. ln() appears only in per-word ratios; the aggregated
    double emits floor-quantized at 1e4 per the repo rule (same accepted
    libm knife-edge as bigram_lm_score)."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", "lang", X.tokens("text").alias("w"))
    )
    tok = toks.select("doc_id", "lang", F.explode("w").alias("word"))
    # Optimization r12 (guide §2.3/§2.4): the raw and target unigram
    # tables are RE-AGGREGATES of the per-doc word-count table (lang is
    # constant per doc, so grouping on (doc_id, lang, word) yields the
    # same groups and counts as (doc_id, word)) — previously both re-ran
    # the tokenize + explode and shuffled the token stream again. The
    # per-doc table is pinned: one explode, one corpus shuffle; the
    # unigram tables are map-side-combinable sums over it. Identical
    # integer counts, identical floats downstream. (Pinning the raw token
    # explode instead was measured and REGRESSED 1.2 -> 2.3 s — caching
    # position rows costs more than the explode it saves; the aggregate
    # is the right thing to materialize.)
    dw = tok.groupBy("doc_id", "lang", "word").agg(F.count(F.lit(1)).alias("c"))
    dw = _pin(dw)
    rawc = dw.groupBy("word").agg(F.sum("c").cast("bigint").alias("cr"))
    tgtc = (
        dw.filter(F.col("lang") == "en")
        .groupBy("word")
        .agg(F.sum("c").cast("bigint").alias("ct"))
    )
    tots = rawc.agg(
        F.sum("cr").alias("nr"), F.count(F.lit(1)).alias("v")
    ).crossJoin(
        F.broadcast(tgtc.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")))
    )
    ratio = (
        rawc.join(tgtc, "word", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "word",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("nt") + F.col("v"))
                )
                - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + F.col("v")))
            ).alias("lr"),
        )
    )
    return (
        dw.join(ratio, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.floor(10000 * F.sum(F.col("c") * F.col("lr")) / F.sum("c"))
            .cast("bigint")
            .alias("dsir_e4"),
        )
    )


# =====================================================================
# N-gram novelty (memorization / boilerplate inverse-signal)
# =====================================================================

@register(
    "ngram_novelty_scores",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    g AS (
      SELECT DISTINCT doc_id,
             w[r.i] || ' ' || w[r.i + 1] || ' ' || w[r.i + 2] AS ng
      FROM toks, unnest(range(1, len(w) - 1)) AS r(i)
    ),
    dc AS (SELECT ng, count(*) AS n_docs FROM g GROUP BY ng)
    SELECT g.doc_id,
           count(*) AS n_distinct_ngrams,
           CAST(sum(CASE WHEN dc.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(floor(10000.0 * sum(CASE WHEN dc.n_docs = 1 THEN 1 ELSE 0 END)
                      / count(*)) AS BIGINT) AS novelty_e4
    FROM g JOIN dc USING (ng)
    GROUP BY g.doc_id
    """,
)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the share of a doc's DISTINCT word
    trigrams that appear in no other document. Low novelty = boilerplate /
    near-duplicate / template text (the curation inverse of the Lee et al.
    substring-dup signal); high = unique content worth keeping.

    Integer arithmetic end to end — no transcendentals, exact cross-engine.
    Scale shape: trigrams build JVM-side from shifted-slice zip_with (no
    self-join), distinct on (doc_id, ngram) and the ngram doc-frequency
    count are the two shuffles, both keyed on uniformly-hashed text keys;
    the df table joins back ngram-keyed, then one doc-keyed sum. Linear in
    corpus size; docs with <3 tokens drop out identically on both engines
    (no trigrams to count)."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", X.tokens("text").alias("w"))
    )
    n3 = F.greatest(F.size("w") - 2, F.lit(0))
    tri = F.zip_with(
        F.slice("w", 1, n3),
        F.zip_with(
            F.slice("w", 2, n3), F.slice("w", 3, n3),
            lambda b, c: F.concat_ws(" ", b, c),
        ),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    g = (
        toks.select("doc_id", F.explode(tri).alias("ng"))
        .distinct()
    )
    # Optimization r12 (guide §2.4): g feeds the doc-frequency count AND
    # the join back — pinned so the tokenize + explode + distinct runs
    # once instead of twice; same rows, same counts.
    g = _pin(g)
    dc = g.groupBy("ng").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        g.join(dc, "ng")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_ngrams"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("n_novel"),
            F.floor(
                10000.0
                * F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
                / F.count(F.lit(1))
            ).cast("bigint").alias("novelty_e4"),
        )
    )


# =====================================================================
# Boilerplate chunk removal (CCNet/RefinedWeb line-wise dedup)
# =====================================================================

#: Pseudo-line width in tokens. The reference corpus stores documents as a
#: single line, so the CCNet unit ("line") is re-expressed as non-overlapping
#: 10-token chunks — the same granularity RefinedWeb uses for its line-wise
#: pass when lines are absent or pathological.
_BOILER_CHUNK = 10
#: A chunk is boilerplate when it appears verbatim in at least this many
#: distinct documents (CCNet removes lines duplicated across the corpus;
#: threshold > 2 keeps legitimate two-doc overlaps).
_BOILER_DF = 3


@register(
    "boilerplate_chunk_removal",
    f"""
    WITH docs AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    chunks AS (
      SELECT doc_id,
             r.i AS chunk_idx,
             w[r.i * {_BOILER_CHUNK} + 1 : r.i * {_BOILER_CHUNK} + {_BOILER_CHUNK}] AS chunk
      FROM docs, unnest(range(0, CAST(ceil(len(w) / {_BOILER_CHUNK}.0) AS BIGINT))) AS r(i)
    ),
    keyed AS (
      SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
             md5(array_to_string(chunk, ' ')) AS chunk_md5
      FROM chunks
    ),
    df AS (
      SELECT chunk_md5, count(DISTINCT doc_id) AS n_docs
      FROM keyed GROUP BY chunk_md5
    )
    SELECT k.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN df.n_docs >= {_BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(sum(CASE WHEN df.n_docs >= {_BOILER_DF} THEN 0 ELSE k.n_tokens END) AS BIGINT) AS tokens_kept,
           CAST(floor(1000000.0 * sum(CASE WHEN df.n_docs >= {_BOILER_DF} THEN 0 ELSE k.n_tokens END)
                / sum(k.n_tokens)) AS BIGINT) AS kept_frac_e6
    FROM keyed k JOIN df USING (chunk_md5)
    GROUP BY k.doc_id
    """,
)
def boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate REMOVAL (not just detection): segment each
    document into non-overlapping 10-token pseudo-lines, count each
    chunk's document frequency corpus-wide, drop chunks that recur in >= 3
    distinct docs, and report per-doc what survives (chunk counts, kept
    token mass, kept fraction). This is the applied counterpart of
    repeated_ngram_contamination — that query scores the signal; this one
    executes the curation step CCNet/RefinedWeb run on every crawl.

    Plan: explode is narrow (chunk boundaries computed per row with
    sequence+slice inside the scan stage); the chunk table is pinned since
    it feeds both the df aggregate and the join-back; the only shuffles
    are on chunk_md5 (uniform — md5 of content) and doc_id (uniform).
    At 100 TB the df table is the cross-corpus state; it is itself
    bounded by distinct-chunk cardinality and the join stays hash-keyed —
    no skew hazard because verbatim-duplicated chunks are exactly what the
    df threshold caps. md5 chunk keys pin cross-engine parity."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("words"))
    )
    n = F.size("words")
    n_chunks = F.ceil(n / float(_BOILER_CHUNK)).cast("bigint")
    keyed = (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            "words",
        )
        .select(
            "doc_id",
            F.slice(
                "words", F.col("chunk_idx") * _BOILER_CHUNK + 1, _BOILER_CHUNK
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            F.size("chunk").alias("n_tokens"),
            F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
        )
    )
    keyed = _pin(keyed)  # feeds both the df aggregate and the join-back
    df = keyed.groupBy("chunk_md5").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    boiler = F.col("n_docs") >= _BOILER_DF
    return (
        keyed.join(df, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(boiler, 1).otherwise(0)).alias("n_boiler"),
            F.sum(F.when(boiler, 0).otherwise(F.col("n_tokens"))).alias(
                "tokens_kept"
            ),
            F.floor(
                1000000.0
                * F.sum(F.when(boiler, 0).otherwise(F.col("n_tokens")))
                / F.sum("n_tokens")
            )
            .cast("bigint")
            .alias("kept_frac_e6"),
        )
    )


# =====================================================================
# Unicode NFC normalization audit
# =====================================================================

@register(
    "unicode_nfc_audit",
    """
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN nfc_normalize(text) <> text
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_non_nfc,
           CAST(sum(length(nfc_normalize(text))) AS BIGINT) AS nfc_chars
    FROM documents GROUP BY source
    """,
)
def unicode_nfc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit per source: how many documents are
    NOT in NFC form (decomposed accents, compatibility leftovers) and the
    corpus character count after normalization — the check every dedup
    pipeline runs BEFORE fingerprinting, since 'é' and 'e'+U+0301 hash
    differently while reading identically.

    Catalyst has no UAX#15 normalizer, so this is the documented
    Arrow-batch escape hatch (same pattern as the media decoders): one
    mapInPandas pass computes per-doc (changed, nfc_chars) JVM→Arrow→
    pandas, never row-at-a-time Python, and the aggregate shuffles on
    source. The oracle is DuckDB's native nfc_normalize — two independent
    UAX#15 implementations (Python unicodedata vs DuckDB/utf8proc) must
    agree on every document."""
    from collections.abc import Iterator

    import pandas as pd

    docs = t(spark, sf_dir, "documents").select("source", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in batches:
            txt = pdf["text"].fillna("")
            norm = txt.map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "changed": (norm != txt).astype("int32"),
                    "nfc_chars": norm.str.len().astype("int64"),
                }
            )

    per = docs.mapInPandas(run, "source string, changed int, nfc_chars long")
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("changed").cast("bigint").alias("n_non_nfc"),
        F.sum("nfc_chars").cast("bigint").alias("nfc_chars"),
    )


# =====================================================================
# Domain-suffix blocklist (crawl-level filtering with subdomain
# inheritance — the PSL suffix-set pattern)
# =====================================================================

#: A host is blocked iff it EQUALS a rule or ends with "." + rule — the
#: public-suffix-list matching convention crawl filters use, so a rule
#: "ads.net" takes every subdomain with it but never "badads.net".
_DOMAIN_RULES = ("ads.net", "tracker1.net")


_RULES_SQL = "[" + ", ".join(f"'{r}'" for r in _DOMAIN_RULES) + "]"


def _host_blocked(host) -> Column:
    """True iff the host equals a _DOMAIN_RULES entry or ends with
    '.' + one — the PSL suffix-inheritance check, as the shared
    expression the query AND its semantics test both run (so a regression
    in the production expression cannot hide behind a test-local copy)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    return F.arrays_overlap(
        suffixes, F.array(*[F.lit(r) for r in _DOMAIN_RULES])
    )


@register(
    "domain_blocklist_audit",
    f"""
    WITH urls AS (
      SELECT doc_id, source,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'cdn' || CAST(doc_id % 5 AS VARCHAR) || '.example.org'
               WHEN 1 THEN 'www.site' || CAST(doc_id % 5 AS VARCHAR) || '.ads.net'
               ELSE 'tracker' || CAST(doc_id % 5 AS VARCHAR) || '.net'
             END AS host
      FROM documents
    ),
    flagged AS (
      SELECT source,
             len(list_intersect(
               list_transform(range(1, len(string_split(host, '.')) + 1),
                 i -> array_to_string(string_split(host, '.')[i:], '.')),
               {_RULES_SQL})) > 0 AS blocked
      FROM urls
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked
    FROM flagged GROUP BY source
    """,
)
def domain_blocklist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-suffix blocklist filtering with subdomain inheritance (the
    public-suffix-list matching convention): a rule blocks the exact host
    AND every subdomain under it, never a lookalike suffix ('badads.net'
    survives 'ads.net'). Hosts are synthesized deterministically (the
    fixture has no URLs) to exercise all three branches: suffix-inherited
    blocks, exact-host blocks (tracker1.net only when doc_id%5 == 1), and
    clean hosts.

    Plan: each host expands to its <=4 dotted suffixes JVM-side
    (transform over a sequence + slice/array_join — narrow) and the rule
    check is arrays-overlap against the literal rule set, so the whole
    audit fuses into one codegen stage with a tiny per-source aggregate.
    With a million-rule list the same shape swaps the literal for a
    broadcast join on the exploded suffix — the blocklist_filter_stats
    pattern — without touching the suffix generation."""
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = (
        F.when(
            did % 3 == 0,
            F.concat(F.lit("cdn"), (did % 5).cast("string"), F.lit(".example.org")),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("www.site"), (did % 5).cast("string"), F.lit(".ads.net")
            ),
        )
        .otherwise(
            F.concat(F.lit("tracker"), (did % 5).cast("string"), F.lit(".net"))
        )
    )
    return (
        docs.select("source", _host_blocked(host).alias("blocked"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("blocked"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_blocked"),
        )
    )


# =====================================================================
# Mojibake / encoding-damage audit
# =====================================================================

@register(
    "mojibake_audit",
    """
    WITH corrupted AS (
      SELECT source,
             coalesce(text, '')
               || CASE WHEN doc_id % 11 = 0 THEN chr(65533) ELSE '' END
               || CASE WHEN doc_id % 13 = 0 THEN chr(195) || chr(169)
                       ELSE '' END
               || CASE WHEN doc_id % 17 = 0 THEN chr(7) ELSE '' END AS txt
      FROM documents
    ),
    flagged AS (
      SELECT source,
             contains(txt, chr(65533)) AS has_repl,
             contains(txt, chr(195) || chr(169)) AS has_double,
             regexp_matches(txt,
               '[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]') AS has_ctrl,
             length(txt) - length(replace(txt, chr(65533), ''))
               AS n_repl_chars
      FROM corrupted
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN has_repl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_replacement,
           CAST(sum(CASE WHEN has_double THEN 1 ELSE 0 END) AS BIGINT)
             AS n_double_encoded,
           CAST(sum(CASE WHEN has_ctrl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_control,
           CAST(sum(CASE WHEN NOT (has_repl OR has_double OR has_ctrl)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
           CAST(sum(n_repl_chars) AS BIGINT) AS total_repl_chars
    FROM flagged GROUP BY source
    """,
)
def mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage audit — the crawl-hygiene scan every web-corpus
    pipeline runs before training: U+FFFD replacement characters (a
    decoder already gave up), the 'Ã©'-class UTF-8-read-as-Latin-1
    double-encoding digraphs, and C0 control characters that survive in
    broken extractions. The corpus twin is corrupted DETERMINISTICALLY
    (doc_id % 11/13/17 append U+FFFD / 'Ã©' / BEL), so both engines build
    an identical damaged corpus and the detector's hit set is pinned
    exactly — the construction certifies the detector, the detector runs
    unchanged on real data.

    Scale shape: one scan, all detection in whole-stage-codegen string
    expressions (contains + one compiled character-class regex), one
    map-side-partial agg on source. No Python, no explode."""
    base = F.coalesce(F.col("text"), F.lit(""))
    txt = F.concat(
        base,
        F.when(F.col("doc_id") % 11 == 0, F.lit("�")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit("Ã©")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 17 == 0, F.lit("\x07")).otherwise(F.lit("")),
    )
    d = t(spark, sf_dir, "documents").select("source", txt.alias("txt"))
    flagged = d.select(
        "source",
        F.col("txt").contains("�").alias("has_repl"),
        F.col("txt").contains("Ã©").alias("has_double"),
        F.col("txt").rlike("[\\x01-\\x08\\x0b\\x0c\\x0e-\\x1f]").alias("has_ctrl"),
        (
            F.length("txt") - F.length(F.replace(F.col("txt"), F.lit("�")))
        ).alias("n_repl_chars"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("has_repl").cast("int")).cast("bigint").alias("n_replacement"),
        F.sum(F.col("has_double").cast("int"))
        .cast("bigint")
        .alias("n_double_encoded"),
        F.sum(F.col("has_ctrl").cast("int")).cast("bigint").alias("n_control"),
        F.sum(
            (~(F.col("has_repl") | F.col("has_double") | F.col("has_ctrl"))).cast(
                "int"
            )
        )
        .cast("bigint")
        .alias("n_clean"),
        F.sum("n_repl_chars").cast("bigint").alias("total_repl_chars"),
    )


# =====================================================================
# word2vec-style negative-sampling table (unigram^0.75)
# =====================================================================

@register(
    "unigram_sampling_table",
    r"""
    WITH tok AS (
      SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS w
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    freq AS (
      SELECT w, count(*) AS f FROM tok GROUP BY w HAVING count(*) >= 5
    ),
    weighted AS (
      SELECT w, f,
             CAST(floor(10000 * sqrt(sqrt(CAST(f * f * f AS DOUBLE))))
                  AS BIGINT) AS w_e4
      FROM freq
    ),
    tot AS (SELECT CAST(sum(w_e4) AS BIGINT) AS total_w FROM weighted)
    SELECT w AS token, f AS freq, w_e4,
           CAST((CAST(1000000000 AS HUGEINT) * w_e4) // total_w AS BIGINT)
             AS share_e9,
           CAST(rank() OVER (ORDER BY f DESC, w) AS BIGINT) AS freq_rank
    FROM weighted, tot
    """,
)
def unigram_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec-style negative-sampling table: the unigram distribution
    raised to the 3/4 power (Mikolov et al. 2013), the draw distribution
    every contrastive text objective uses for negatives. f^0.75 is
    computed as sqrt(sqrt(f³)) — f³ is exact in int64/double and IEEE
    sqrt is correctly rounded, so both engines produce the identical
    double and the floored e4 weight is deterministic (a pow(f, 0.75)
    libm call would not be). Shares are exact WIDE integer arithmetic:
    1e9·w_e4 overflows int64 once f exceeds ~9.1e7 (routine for common
    words at 100 TB), so Spark computes it in DECIMAL(31,0) with `div`
    (BigDecimal.divideToIntegralValue — exact) and DuckDB in HUGEINT —
    identical floors, no overflow below f ≈ 1e29.

    Scale shape: one token explode + map-side-partial count; everything
    after operates on the frequency-filtered VOCABULARY (>= 5
    occurrences), never the token stream. The rank is the TWO-PHASE
    distributed form (dedup.global_rank: range-partition on the rank
    key, per-partition row_number, broadcast per-partition offsets) —
    (f, w) is unique per vocab row so rank() == row_number() — because
    a web-scale vocab with f >= 5 is still O(1e8) rows: a bare
    Window.orderBy would pull all of it through ONE task. The >= 5
    floor is what bounds the table's junk tail at 100 TB."""
    tok = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w0")
        )
        .select(F.lower("w0").alias("w"))
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f")).filter(
        F.col("f") >= 5
    )
    weighted = freq.select(
        "w",
        "f",
        F.floor(
            10000
            * F.sqrt(F.sqrt((F.col("f") * F.col("f") * F.col("f")).cast("double")))
        )
        .cast("bigint")
        .alias("w_e4"),
    )
    tot = weighted.agg(F.sum("w_e4").cast("bigint").alias("total_w"))
    ranked = global_rank(weighted, [F.col("f").desc(), F.col("w").asc()])
    return ranked.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("token"),
        F.col("f").alias("freq"),
        "w_e4",
        F.expr("(CAST(w_e4 AS DECIMAL(20,0)) * 1000000000) div total_w")
        .cast("bigint")
        .alias("share_e9"),
        F.col("rnk").cast("bigint").alias("freq_rank"),
    )


# =====================================================================
# TextTiling-style topic-boundary detection
# =====================================================================

@register(
    "texttiling_boundaries",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
                            w -> regexp_replace(w, '[^a-z0-9]', '', 'g'))
               AS words
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    blocks AS (
      SELECT doc_id, b.b AS blk,
             words[b.b * 20 + 1 : b.b * 20 + 20] AS bw
      FROM toks, unnest(range(0, CAST(len(words) // 20 AS BIGINT))) AS b(b)
      WHERE len(words) >= 40
    ),
    sims AS (
      SELECT a.doc_id, a.blk,
             len(list_intersect(list_distinct(a.bw), list_distinct(b.bw)))
               AS overlap
      FROM blocks a JOIN blocks b
        ON b.doc_id = a.doc_id AND b.blk = a.blk + 1
    )
    SELECT doc_id,
           count(*) + 1 AS n_blocks,
           CAST(sum(CASE WHEN overlap < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boundaries,
           CAST(min(overlap) AS BIGINT) AS min_overlap,
           CAST((100 * sum(overlap)) // count(*) AS BIGINT)
             AS mean_overlap_e2
    FROM sims GROUP BY doc_id
    """,
)
def texttiling_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997, integer form):
    documents with >= 40 normalized tokens split into 20-token blocks;
    the cohesion signal between ADJACENT blocks is the distinct-word
    overlap count (exact integers — Hearst's cosine over term vectors
    reduces to this for binary weights), and a topic boundary fires
    where overlap dips below 3 shared words. Emits per doc the block
    count, boundary count, sharpest dip, and mean cohesion — the
    segmentation signal long-document chunkers use to cut on topic
    shifts instead of fixed strides (doc_chunking is the fixed-stride
    counterpart).

    Scale shape: block explode is len/20 rows per doc; the adjacent-block
    join is doc_id-keyed (shuffle on doc_id, join condition blk+1 —
    within-partition after the key shuffle); one doc_id agg. All
    integer arithmetic, no Python."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "doc_id",
            F.transform(
                F.split(F.lower(F.trim("text")), r"\s+"),
                lambda w: F.regexp_replace(w, "[^a-z0-9]", ""),
            ).alias("words"),
        )
        .filter(F.size("words") >= 40)
    )
    blocks = toks.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(0), (F.size("words") / 20).cast("long") - 1)
        ).alias("_p", "blk"),
        "words",
    ).select(
        "doc_id",
        "blk",
        F.array_distinct(F.expr("slice(words, blk * 20 + 1, 20)")).alias("bw"),
    )
    a = blocks.select(
        F.col("doc_id").alias("a_doc"), F.col("blk").alias("a_blk"), F.col("bw").alias("aw")
    )
    b = blocks.select(
        F.col("doc_id").alias("b_doc"), F.col("blk").alias("b_blk"), F.col("bw").alias("bw2")
    )
    sims = a.join(
        b,
        (F.col("a_doc") == F.col("b_doc")) & (F.col("b_blk") == F.col("a_blk") + 1),
    ).select(
        F.col("a_doc").alias("doc_id"),
        F.size(F.array_intersect("aw", "bw2")).alias("overlap"),
    )
    return sims.groupBy("doc_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_blocks"),
        F.sum((F.col("overlap") < 3).cast("int")).cast("bigint").alias(
            "n_boundaries"
        ),
        F.min("overlap").cast("bigint").alias("min_overlap"),
        F.expr("(100 * sum(overlap)) div count(1)").cast("bigint").alias(
            "mean_overlap_e2"
        ),
    )


# =====================================================================
# Prefix-sharing (KV-cache reuse) economics
# =====================================================================

@register(
    "prefix_sharing_stats",
    r"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS words
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    keyed AS (
      SELECT d.d AS depth, doc_id,
             array_to_string(words[1 : d.d], ' ') AS prefix
      FROM toks, unnest([4, 8, 16]) AS d(d)
      WHERE len(words) >= d.d
    ),
    groups AS (
      SELECT depth, prefix, count(*) AS n_docs
      FROM keyed GROUP BY depth, prefix
    )
    SELECT depth,
           count(*) AS n_prefixes,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT)
             AS n_docs_sharing,
           CAST(max(n_docs) AS BIGINT) AS max_group,
           CAST(sum(CASE WHEN n_docs > 1 THEN (n_docs - 1) * depth
                         ELSE 0 END) AS BIGINT) AS cacheable_tokens
    FROM groups GROUP BY depth
    """,
)
def prefix_sharing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-sharing audit — the KV-cache block-reuse economics of a
    serving/eval corpus: at prefix depths 4/8/16 tokens, how many
    documents share an exact token prefix, the largest shared group, and
    the cacheable token mass ((group-1)·depth per shared group — the
    prefill tokens a radix-tree KV cache would not recompute). The same
    numbers drive dataset diagnostics: heavy prefix sharing in training
    data signals templated/boilerplate openings.

    Scale shape: one scan, a 3x depth explode of only the prefix tokens,
    one (depth, prefix) hash agg (map-side partial; the prefix string is
    the shuffle key, bounded at 16 tokens), then a 3-row rollup. No
    windows, no joins."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("words")
        )
    )
    keyed = (
        toks.select(
            "doc_id",
            "words",
            F.explode(F.array(F.lit(4), F.lit(8), F.lit(16))).alias("depth"),
        )
        .filter(F.size("words") >= F.col("depth"))
        .select(
            "depth",
            "doc_id",
            F.array_join(F.expr("slice(words, 1, depth)"), " ").alias("prefix"),
        )
    )
    groups = keyed.groupBy("depth", "prefix").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return groups.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_prefixes"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_docs") > 1, F.col("n_docs")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_sharing"),
        F.max("n_docs").cast("bigint").alias("max_group"),
        F.sum(
            F.when(F.col("n_docs") > 1, (F.col("n_docs") - 1) * F.col("depth"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("cacheable_tokens"),
    )


# =====================================================================
# interpolated Kneser-Ney bigram model (exact rational arithmetic)
# =====================================================================

@register(
    "kneser_ney_bigram_score",
    r"""
    WITH toks AS (
      SELECT regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    bg AS (
      SELECT w[r.i] AS w1, w[r.i + 1] AS w2
      FROM toks, unnest(range(1, len(w))) AS r(i)
    ),
    bigc AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    left_c AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n_cont_w1
      FROM bigc GROUP BY w1
    ),
    right_c AS (SELECT w2, count(*) AS n_ctx_w2 FROM bigc GROUP BY w2),
    tt AS (SELECT count(*) AS bt FROM bigc)
    SELECT w1, w2, c12, c1, n_cont_w1, n_ctx_w2,
           CAST((CAST(1000000000 AS HUGEINT)
                 * (greatest(4 * CAST(c12 AS HUGEINT) - 3, 0) * bt
                    + 3 * CAST(n_cont_w1 AS HUGEINT) * n_ctx_w2))
                // (4 * CAST(c1 AS HUGEINT) * bt) AS BIGINT) AS p_kn_e9
    FROM bigc JOIN left_c USING (w1) JOIN right_c USING (w2) CROSS JOIN tt
    ORDER BY c12 DESC, w1, w2 LIMIT 100
    """,
)
def kneser_ney_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    Chen & Goodman 1999 eq. 4.25) for the corpus's top-100 bigrams — the
    smoothing family actual production LMs (KenLM) use, completing the
    in-engine LM tier above add-one (bigram_lm_score) and stupid backoff.
    With discount D = 3/4 the whole estimate is RATIONAL:

        P_KN(w2|w1) = max(c12 - D, 0)/c1 + (D·N1+(w1,·)/c1)·N1+(·,w2)/BT

    multiplied through by 4·c1·BT gives exact integers — p_kn_e9 is a
    single wide-integer division (Spark DECIMAL(38,0) `div`, DuckDB
    HUGEINT `//`), zero float ops, so the hash certifies the continuation
    -count plumbing (the part of KN everyone gets wrong) bit-for-bit.
    Overflow bound: 1e9·4·c12·BT < 1e38 holds through c12 ~ 1e12 bigram
    occurrences with BT ~ 1e10 types — comfortably past 100 TB.

    Scale shape: one n-gram explode (zip_with slices, no self-join); the
    continuation tables N1+(w1,·) and N1+(·,w2) are COUNT(*) re-aggregates
    of the bigram-type table, not the stream; the final join is
    type-table-sized, keyed on w1/w2 with a broadcast 1-row type total.
    Top-100 via TakeOrdered (deterministic c12/w1/w2 tie-break), never a
    global sort."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(X.tokens("text").alias("w"))
    )
    nb = F.greatest(F.size("w") - 1, F.lit(0))
    bgs = F.zip_with(
        F.slice("w", 1, nb),
        F.slice("w", 2, nb),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = toks.select(F.explode(bgs).alias("p")).select("p.w1", "p.w2")
    bigc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # Optimization r12 (guide §2.4): the bigram-type table feeds FOUR
    # consumers (both continuation-count re-aggregates, the type total,
    # and the final join base) — each re-ran the tokenize + explode +
    # count. Pinned, the corpus pass runs once and the re-aggregates read
    # the vocabulary-bounded type table; identical integers throughout.
    bigc = _pin(bigc)
    left_c = bigc.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).alias("n_cont_w1"),
    )
    right_c = bigc.groupBy("w2").agg(F.count(F.lit(1)).alias("n_ctx_w2"))
    tt = bigc.agg(F.count(F.lit(1)).alias("bt"))
    joined = (
        bigc.join(left_c, "w1")
        .join(right_c, "w2")
        .crossJoin(F.broadcast(tt))
    )
    return (
        joined.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n_cont_w1",
            "n_ctx_w2",
            F.expr(
                "(CAST(1000000000 AS DECIMAL(38,0))"
                " * (greatest(4 * CAST(c12 AS DECIMAL(38,0)) - 3, 0) * bt"
                "    + 3 * CAST(n_cont_w1 AS DECIMAL(38,0)) * n_ctx_w2))"
                " div (4 * CAST(c1 AS DECIMAL(38,0)) * bt)"
            )
            .cast("bigint")
            .alias("p_kn_e9"),
        )
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(100)
    )


# =====================================================================
# vocabulary-growth / tail diagnostics (Heaps- and Zipf-tail inputs)
# =====================================================================

@register(
    "vocab_growth_stats",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    cnt AS (
      SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
    )
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
           CAST((1000000 * count(*)) // sum(c) AS BIGINT) AS ttr_e6,
           CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS hapax_share_e6
    FROM cnt GROUP BY source
    """,
)
def vocab_growth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth diagnostics per source: type-token ratio, hapax
    and dis legomena counts, and the hapax share of the vocabulary — the
    raw inputs to Heaps'-law growth estimates and Good-Turing mass
    (P(unseen) ≈ V1/N), and the practical signals behind tokenizer vocab
    sizing and junk-source detection (OCR noise and boilerplate sit at
    the two hapax-share extremes). Complements vocab_coverage (the HEAD
    of the frequency distribution) with the TAIL.

    Scale shape: one token explode + one map-side-combinable (source,
    token) count; the stats are a second count-keyed aggregate emitting
    one row per source. No windows, no sorts, all integers."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "source",
            F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"),
        )
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("n_hapax"),
        F.sum((F.col("c") == 2).cast("int")).cast("bigint").alias("n_dis"),
        F.expr("(1000000 * count(*)) div sum(c)").cast("bigint").alias("ttr_e6"),
        F.expr(
            "(1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)) div count(*)"
        )
        .cast("bigint")
        .alias("hapax_share_e6"),
    )


@register(
    "chao1_vocab_richness",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    cnt AS (
      SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
    ),
    m AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2
      FROM cnt GROUP BY source
    )
    SELECT source, n_tokens, vocab_size, h1, h2,
           100 * vocab_size + (100 * h1 * (h1 - 1)) // (2 * (h2 + 1))
             AS chao1_x100,
           (1000000 * h1) // n_tokens AS gt_unseen_e6
    FROM m
    """,
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 total-vocabulary estimate per source (Chao 1984,
    bias-corrected form: V̂ = V + f₁(f₁−1)/(2(f₂+1)) — defined even when
    no dis legomena exist, unlike the classic f₁²/2f₂) plus the
    Good-Turing unseen-probability mass P₀ ≈ f₁/N — the "how much
    vocabulary haven't we crawled yet" readout that sits on top of
    vocab_growth_stats' raw hapax counts when sizing a tokenizer or
    deciding whether a source is exhausted. All integer arithmetic:
    chao1·100 and P₀·1e6 by truncating division (every operand
    non-negative, so Spark div ≡ DuckDB //).

    Scale: identical shape to vocab_growth_stats — one token explode,
    one map-side-combinable (source, token) count, one per-source
    aggregate. Capacity: 100·f₁² < 2⁶³ → f₁ < 3.0e8 hapaxes/source
    (docs/LIMITS.md round-8 note)."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "source",
            F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"),
        )
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    m = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("h1"),
        F.sum((F.col("c") == 2).cast("int")).cast("bigint").alias("h2"),
    )
    return m.select(
        "source",
        "n_tokens",
        "vocab_size",
        "h1",
        "h2",
        F.expr("100 * vocab_size + (100 * h1 * (h1 - 1)) div (2 * (h2 + 1))")
        .cast("bigint")
        .alias("chao1_x100"),
        F.expr("(1000000 * h1) div n_tokens").cast("bigint").alias("gt_unseen_e6"),
    )


@register(
    "gopher_quality_gate",
    r"""
    WITH sig2 AS (
      SELECT doc_id, source,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE list_sum(list_transform(
                         regexp_split_to_array(trim(text), '\s+'),
                         w -> length(w))) END AS tok_chars,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(list_filter(
                         regexp_split_to_array(trim(text), '\s+'),
                         w -> list_contains(['the','and','of','to','a','in','is','that','for','with'], lower(w)))) END AS sw_hits,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(list_filter(
                         regexp_split_to_array(trim(text), '\s+'),
                         w -> regexp_matches(w, '[A-Za-z]'))) END AS n_alpha,
             len(regexp_extract_all(coalesce(text, ''), '#')) AS n_hash,
             len(regexp_extract_all(coalesce(text, ''), '\.\.\.|…')) AS n_ell,
             len(string_split(coalesce(text, ''), chr(10))) AS n_lines,
             len(list_filter(string_split(coalesce(text, ''), chr(10)),
                             l -> regexp_matches(trim(l), '^[-*•]'))) AS n_bullet,
             len(list_filter(string_split(coalesce(text, ''), chr(10)),
                             l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS n_ell_end
      FROM documents
    ),
    flags AS (
      SELECT source,
             CASE WHEN n_tok >= 50 AND n_tok <= 100000 THEN 0 ELSE 1 END AS f_wordcount,
             CASE WHEN 3 * n_tok <= tok_chars AND tok_chars <= 10 * n_tok THEN 0 ELSE 1 END AS f_mwl,
             CASE WHEN 10 * (n_hash + n_ell) <= n_tok THEN 0 ELSE 1 END AS f_symbol,
             CASE WHEN 10 * n_alpha >= 8 * n_tok THEN 0 ELSE 1 END AS f_alpha,
             CASE WHEN sw_hits >= 2 THEN 0 ELSE 1 END AS f_stopword,
             CASE WHEN 10 * n_bullet <= 9 * n_lines THEN 0 ELSE 1 END AS f_bullet,
             CASE WHEN 10 * n_ell_end <= 3 * n_lines THEN 0 ELSE 1 END AS f_ellipsis
      FROM sig2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(f_wordcount) AS BIGINT) AS fail_wordcount,
           CAST(sum(f_mwl) AS BIGINT) AS fail_mean_word_len,
           CAST(sum(f_symbol) AS BIGINT) AS fail_symbol_ratio,
           CAST(sum(f_alpha) AS BIGINT) AS fail_alpha_words,
           CAST(sum(f_stopword) AS BIGINT) AS fail_stopwords,
           CAST(sum(f_bullet) AS BIGINT) AS fail_bullet_lines,
           CAST(sum(f_ellipsis) AS BIGINT) AS fail_ellipsis_lines,
           CAST(sum(CASE WHEN f_wordcount + f_mwl + f_symbol + f_alpha
                              + f_stopword + f_bullet + f_ellipsis = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
    FROM flags GROUP BY source
    """,
)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition-free quality gate (Rae et al. 2021 §A1.1,
    the rule set C4's successor pipelines actually deploy), per source:
    seven deterministic rules — word count ∈ [50, 100k], mean word
    length ∈ [3, 10], hash/ellipsis symbol ratio ≤ 0.1, ≥ 80% of words
    contain an alphabetic char, ≥ 2 stopwords, ≤ 90% bullet-started
    lines, ≤ 30% ellipsis-ended lines — each emitted as a per-source
    fail count plus the all-rules pass count. Every threshold is an
    integer CROSS-MULTIPLICATION (3·n_tok ≤ tok_chars, 10·n_alpha ≥
    8·n_tok, …): no ratio division ever happens, so there is no float
    anywhere and no rounding edge to disagree on.

    Scale: one documents scan, all JVM string/array expressions
    (split/filter/regexp_count), one groupBy(source). The per-doc
    signals reuse the established tokenizer parity (trim + \\s+ split ≡
    regexp_split_to_array) and add line-level splits on chr(10), which
    both engines define identically."""
    docs = t(spark, sf_dir, "documents")
    # Coalesce ONCE and feed the coalesced column everywhere: X.tokens(NULL)
    # is NULL (size -1/NULL), which would flip every token rule to "fail"
    # while the oracle's coalesce sees 0 tokens — found by the
    # null-injection audit the day this query landed.
    txt = F.coalesce(F.col("text"), F.lit(""))
    toks = X.tokens(txt)
    lines = F.split(txt, "\n")
    n_tok = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    sw = X.stopword_hits(txt)
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    n_hash = F.regexp_count(txt, F.lit("#"))
    n_ell = F.regexp_count(txt, F.lit(r"\.\.\.|…"))
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]")))
    n_ell_end = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    flags = docs.select(
        "source",
        F.when((n_tok >= 50) & (n_tok <= 100000), 0).otherwise(1).alias("f_wordcount"),
        F.when((3 * n_tok <= tok_chars) & (tok_chars <= 10 * n_tok), 0)
        .otherwise(1)
        .alias("f_mwl"),
        F.when(10 * (n_hash + n_ell) <= n_tok, 0).otherwise(1).alias("f_symbol"),
        F.when(10 * n_alpha >= 8 * n_tok, 0).otherwise(1).alias("f_alpha"),
        F.when(sw >= 2, 0).otherwise(1).alias("f_stopword"),
        F.when(10 * n_bullet <= 9 * n_lines, 0).otherwise(1).alias("f_bullet"),
        F.when(10 * n_ell_end <= 3 * n_lines, 0).otherwise(1).alias("f_ellipsis"),
    )
    allf = (
        F.col("f_wordcount")
        + F.col("f_mwl")
        + F.col("f_symbol")
        + F.col("f_alpha")
        + F.col("f_stopword")
        + F.col("f_bullet")
        + F.col("f_ellipsis")
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("f_wordcount").cast("bigint").alias("fail_wordcount"),
        F.sum("f_mwl").cast("bigint").alias("fail_mean_word_len"),
        F.sum("f_symbol").cast("bigint").alias("fail_symbol_ratio"),
        F.sum("f_alpha").cast("bigint").alias("fail_alpha_words"),
        F.sum("f_stopword").cast("bigint").alias("fail_stopwords"),
        F.sum("f_bullet").cast("bigint").alias("fail_bullet_lines"),
        F.sum("f_ellipsis").cast("bigint").alias("fail_ellipsis_lines"),
        F.sum(F.when(allf == 0, 1).otherwise(0)).cast("bigint").alias("n_pass_all"),
    )


@register(
    "simpson_diversity_index",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    cnt AS (
      SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
    ),
    m AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(sum(c * (c - 1)) AS BIGINT) AS s2,
             CAST(max(c) AS BIGINT) AS c_max
      FROM cnt GROUP BY source
    )
    SELECT source, n_tokens, vocab_size,
           CASE WHEN n_tokens < 2 THEN NULL
                ELSE (1000000 * s2) // (n_tokens * (n_tokens - 1)) END
             AS simpson_e6,
           CASE WHEN n_tokens < 2 THEN NULL
                ELSE 1000000 - (1000000 * s2) // (n_tokens * (n_tokens - 1)) END
             AS gini_simpson_e6,
           (1000000 * c_max) // n_tokens AS top_share_e6
    FROM m
    """,
)
def simpson_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration λ (Simpson 1949, unbiased no-replacement
    form λ = Σ_c f_c(f_c−1)/(N(N−1))) per source over whitespace token
    types, its complement 1−λ (the Gini–Simpson diversity), and the
    single-most-common-token share — the lexical-diversity readout that
    catches template/boilerplate-dominated sources which richness counts
    like Chao1 miss entirely: a source can have a huge vocabulary AND
    spend 60% of its mass on one token.

    All integer arithmetic: λ·1e6 = (1e6·Σf(f−1)) tdiv (N(N−1)), every
    operand non-negative (Spark div ≡ DuckDB //); the complement is
    derived from the SAME truncated value so the pair is consistent by
    construction; NULL when N < 2 (pair probability undefined).

    Scale: identical shape to chao1_vocab_richness — one token explode,
    one map-side-combinable (source, token) count, one per-source
    aggregate; an engine running both shares the whole plan. Capacity:
    1e6·Σf(f−1) ≤ 1e6·f_max·N < 2⁶³ → f_max·N < 9.2e12 (e.g. the top
    type at 3e6 occurrences in a 3e6-token source); recast the numerator
    to DECIMAL(38,0) past that (docs/LIMITS.md round-8 note)."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "source",
            F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"),
        )
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    m = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("s2"),
        F.max("c").cast("bigint").alias("c_max"),
    )
    lam = F.expr("(1000000 * s2) div (n_tokens * (n_tokens - 1))")
    return m.select(
        "source",
        "n_tokens",
        "vocab_size",
        F.when(F.col("n_tokens") < 2, F.lit(None).cast("bigint"))
        .otherwise(lam)
        .cast("bigint")
        .alias("simpson_e6"),
        F.when(F.col("n_tokens") < 2, F.lit(None).cast("bigint"))
        .otherwise(1000000 - lam)
        .cast("bigint")
        .alias("gini_simpson_e6"),
        F.expr("(1000000 * c_max) div n_tokens")
        .cast("bigint")
        .alias("top_share_e6"),
    )


@register(
    "gini_token_concentration",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    cnt AS (
      SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
    ),
    ranked AS (
      SELECT source, c,
             row_number() OVER (PARTITION BY source ORDER BY c, tok) AS i
      FROM cnt
    ),
    m AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(sum(i * c) AS BIGINT) AS s
      FROM ranked GROUP BY source
    )
    SELECT source, n_tokens, vocab_size,
           (1000000 * (2 * s - (vocab_size + 1) * n_tokens))
             // (vocab_size * n_tokens) AS gini_e6
    FROM m
    """,
)
def gini_token_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-source token-frequency distribution —
    the inequality summary of HOW the token mass is spread over the
    vocabulary (0 = perfectly even, →1 = one type owns everything),
    computed from frequencies sorted ascending via the rank identity
    G = (2·Σᵢ i·f₍ᵢ₎ − (V+1)·N)/(V·N). Together with Simpson (pairwise
    collision) and Chao1 (unseen richness) this completes the
    distributional triptych a corpus-mix audit reads per source.

    Exact integers throughout: ranks come from one source-keyed
    row_number over (count, token) — the token tie-break is for
    determinism only, since equal counts contribute the same Σi·f over
    any permutation of their rank block; the numerator 2S − (V+1)N is
    ≥ 0 exactly (Chebyshev sum inequality on the ascending order), so
    truncating division agrees across engines with no sign case.

    Scale: the (source, token) count is the same map-side-combinable
    aggregate as chao1/simpson; the rank window is source-keyed over
    VOCABULARY rows (types, not tokens — millions, not billions).
    Capacity: Σ i·f ≤ V·N → 1e6·2·V·N < 2⁶³ → V·N < 4.6e12 in BIGINT
    (docs/LIMITS.md round-8 note)."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "source",
            F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"),
        )
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy("c", "tok")
    ranked = cnt.select("source", "c", F.row_number().over(w).alias("i"))
    m = ranked.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.col("i") * F.col("c")).cast("bigint").alias("s"),
    )
    return m.select(
        "source",
        "n_tokens",
        "vocab_size",
        F.expr(
            "(1000000 * (2 * s - (vocab_size + 1) * n_tokens))"
            " div (vocab_size * n_tokens)"
        )
        .cast("bigint")
        .alias("gini_e6"),
    )


@register(
    "flesch_readability_by_lang",
    """
    WITH d AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '[^ \t\n\r]+')) AS BIGINT)
               AS w,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS s,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
               AS syl
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
    ),
    scored AS (
      SELECT lang,
             CAST(floor(CAST(10000 AS DOUBLE) * (
               CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
               - CAST(84.6 AS DOUBLE) * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
             )) AS BIGINT) AS fre_e4,
             CAST(floor(CAST(10000 AS DOUBLE) * (
               CAST(0.39 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
               + CAST(11.8 AS DOUBLE) * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
               - CAST(15.59 AS DOUBLE)
             )) AS BIGINT) AS fkg_e4
      FROM d WHERE w > 0
    ),
    g AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(fre_e4) AS BIGINT) AS sfre,
             CAST(min(fre_e4) AS BIGINT) AS min_fre_e4,
             CAST(max(fre_e4) AS BIGINT) AS max_fre_e4,
             CAST(sum(fkg_e4) AS BIGINT) AS sfkg
      FROM scored GROUP BY lang
    )
    SELECT lang, n_docs,
           CASE WHEN sfre >= 0 THEN sfre // n_docs
                ELSE -(((-sfre) + n_docs - 1) // n_docs) END AS mean_fre_e4,
           min_fre_e4, max_fre_e4,
           CASE WHEN sfkg >= 0 THEN sfkg // n_docs
                ELSE -(((-sfkg) + n_docs - 1) // n_docs) END AS mean_fkg_e4
    FROM g
    """,
)
def flesch_readability_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade level per language
    (Flesch 1948 / Kincaid et al. 1975, public literature) — the classic
    surface-readability scorer a corpus-quality pipeline runs next to
    gopher_quality_gate (rule thresholds) and quality_model_score
    (learned): FRE = 206.835 - 1.015*(words/sentences)
    - 84.6*(syllables/word), FKG = 0.39*(w/s) + 11.8*(syl/w) - 15.59.

    Counting conventions (deterministic, engine-mirrored): words are
    maximal non-whitespace runs; sentences are maximal [.!?]+ runs
    floored at 1 (unpunctuated text = one sentence); syllables are the
    standard vowel-run heuristic (maximal [aeiouy]+ runs — word
    boundaries break runs, so the text-global count equals the per-word
    sum). Each doc's scores are per-row IEEE doubles over three exact
    ints quantized to e4 BEFORE aggregation; the per-lang mean is then
    sign-split truncating integer division over the exact e4 sums
    (both branches keep the numerator positive, so Spark's `div` and
    DuckDB's `//` — both truncate-toward-zero — agree with floor
    semantics), never a float mean.

    Scale shape: one document scan with three JVM-side regexp counts and
    one groupBy(lang) partial+final aggregate — no shuffle beyond the
    lang-keyed rollup, no Python anywhere."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select(
            "lang",
            F.regexp_count(F.col("text"), F.lit("[^ \t\n\r]+"))
            .cast("bigint")
            .alias("w"),
            F.greatest(
                F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
            )
            .cast("bigint")
            .alias("s"),
            F.regexp_count(F.col("text"), F.lit(r"[aeiouy]+"))
            .cast("bigint")
            .alias("syl"),
        )
        .filter(F.col("w") > 0)
    )
    wd = F.col("w").cast("double")
    sd = F.col("s").cast("double")
    syld = F.col("syl").cast("double")
    e4 = F.lit(10000).cast("double")
    fre = e4 * (
        F.lit(206.835).cast("double")
        - F.lit(1.015).cast("double") * (wd / sd)
        - F.lit(84.6).cast("double") * (syld / wd)
    )
    fkg = e4 * (
        F.lit(0.39).cast("double") * (wd / sd)
        + F.lit(11.8).cast("double") * (syld / wd)
        - F.lit(15.59).cast("double")
    )
    scored = d.select(
        "lang",
        F.floor(fre).cast("bigint").alias("fre_e4"),
        F.floor(fkg).cast("bigint").alias("fkg_e4"),
    )
    sums = scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("fre_e4").cast("bigint").alias("sfre"),
        F.min("fre_e4").cast("bigint").alias("min_fre_e4"),
        F.max("fre_e4").cast("bigint").alias("max_fre_e4"),
        F.sum("fkg_e4").cast("bigint").alias("sfkg"),
    )
    return sums.select(
        "lang",
        "n_docs",
        F.expr(
            "CASE WHEN sfre >= 0 THEN sfre div n_docs "
            "ELSE -(((-sfre) + n_docs - 1) div n_docs) END"
        )
        .cast("bigint")
        .alias("mean_fre_e4"),
        "min_fre_e4",
        "max_fre_e4",
        F.expr(
            "CASE WHEN sfkg >= 0 THEN sfkg div n_docs "
            "ELSE -(((-sfkg) + n_docs - 1) div n_docs) END"
        )
        .cast("bigint")
        .alias("mean_fkg_e4"),
    )


# =====================================================================
# Corpus scaling-law fits: Zipf rank-frequency and Heaps vocab growth
# =====================================================================

@register(
    "zipf_law_fit",
    r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
      FROM cnt QUALIFY rank <= 200
    ),
    pts AS (
      SELECT CAST(floor(100000.0 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS x,
             CAST(floor(100000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
      FROM top
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pts
    )
    SELECT n,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(floor(1000000.0 * (n * sxy - sx * sy)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           END AS slope_e6,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(floor((1000000.0 / 100000.0)
                     * (sy - ((n * sxy - sx * sy)
                              / CAST(n * sxx - sx * sx AS DOUBLE)) * sx)
                     / CAST(n AS DOUBLE)) AS BIGINT)
           END AS intercept_e6,
           CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
                ELSE CAST(floor(1000000.0
                     * ((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE))
                     * ((n * sxy - sx * sy) / CAST(n * syy - sy * sy AS DOUBLE)))
                     AS BIGINT)
           END AS r2_e6
    FROM s
    """,
)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit (Zipf 1949): OLS of ln(frequency) on ln(rank) over
    the top-200 token types — slope ~ -1 is the canonical text
    signature, and deviation from it is a corpus-health signal (OCR
    noise flattens the head, boilerplate steepens it). Completes the
    frequency-distribution pair: vocab_coverage reads the head mass,
    vocab_growth_stats the hapax tail; this fits the LAW the two ends
    obey, with r^2 saying how Zipfian the corpus actually is.

    Exactness: ln(rank)/ln(count) are per-row doubles over exact
    integers, QUANTIZED at 1e5 into BIGINTs — all five OLS sums are then
    exact integer arithmetic (capacity: with x,y <= 1.5e6 at e5,
    sum(y*y) <= 200 * 2.2e12 ~ 4e14 — far under 2^63 at ANY corpus
    size, since only 200 quantized points ever enter the sums); the
    closed-form slope/intercept/r^2 are deterministic doubles over those
    six scalars. The slope is dimensionless (the e5 scales cancel);
    intercept is reported in ln-count units e6.

    Scale shape: one token explode -> map-side-combinable count -> the
    top-200 is TakeOrdered (never a global window over the vocabulary)
    -> the rank window and OLS run on 200 rows. At 100 TB the only
    corpus-sized stage is the token count."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"))
    )
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = cnt.orderBy(F.desc("c"), "tok").limit(200)
    w = Window.orderBy(F.desc("c"), "tok")  # bounded: 200 rows post-limit
    pts = top.withColumn("rank", F.row_number().over(w)).select(
        F.floor(100000.0 * F.log(F.col("rank").cast("double")))
        .cast("bigint")
        .alias("x"),
        F.floor(100000.0 * F.log(F.col("c").cast("double")))
        .cast("bigint")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_i = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny_i = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    den = den_i.cast("double")
    deny = deny_i.cast("double")
    slope_d = num / den
    # Degenerate guard (heaps_law_fit's NULL arm, ADVICE r9): a single
    # token type (den = 0) or a flat top-200 (deny = 0) would otherwise
    # make NaN/Inf — DuckDB raises on CAST(NaN AS BIGINT) while Spark's
    # floor+cast yields NULL, so the twins would diverge instead of both
    # emitting NULL.
    return s.select(
        "n",
        F.when(den_i == 0, F.lit(None).cast("bigint"))
        .otherwise(F.floor(1000000.0 * slope_d).cast("bigint"))
        .alias("slope_e6"),
        F.when(den_i == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                (1000000.0 / 100000.0)
                * (F.col("sy") - slope_d * F.col("sx"))
                / F.col("n").cast("double")
            ).cast("bigint")
        )
        .alias("intercept_e6"),
        F.when((den_i == 0) | (deny_i == 0), F.lit(None).cast("bigint"))
        .otherwise(F.floor(1000000.0 * slope_d * (num / deny)).cast("bigint"))
        .alias("r2_e6"),
    )


@register(
    "js_divergence_sources",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
            FROM toks GROUP BY 1, 2),
    g AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cg FROM cnt GROUP BY tok),
    head AS (
      SELECT tok, cg, row_number() OVER (ORDER BY cg DESC, tok) AS r
      FROM g QUALIFY r <= 200
    ),
    totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
               FROM cnt GROUP BY source),
    big_n AS (SELECT CAST(sum(cg) AS BIGINT) AS nn FROM g),
    src_head AS (
      SELECT t.source, h.cg, coalesce(c.c, 0) AS c
      FROM totals t CROSS JOIN head h
      LEFT JOIN cnt c ON c.source = t.source AND c.tok = h.tok
    ),
    head_tot AS (SELECT CAST(sum(cg) AS BIGINT) AS hcg FROM head),
    src_head_tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS hc
                     FROM src_head GROUP BY source),
    cats AS (
      SELECT source, cg, c FROM src_head
      UNION ALL
      SELECT t.source, b.nn - ht.hcg AS cg,
             t.ns - coalesce(sh.hc, 0) AS c
      FROM totals t CROSS JOIN big_n b CROSS JOIN head_tot ht
      LEFT JOIN src_head_tot sh USING (source)
    ),
    terms AS (
      SELECT k.source, t.ns,
             CASE WHEN k.c > 0
                  THEN CAST(floor(1000000.0 * (0.5
                       * (k.c / CAST(t.ns AS DOUBLE))
                       * ln((2.0 * (k.c / CAST(t.ns AS DOUBLE)))
                            / ((k.c / CAST(t.ns AS DOUBLE))
                               + (k.cg / CAST(b.nn AS DOUBLE)))))) AS BIGINT)
                  ELSE 0 END AS tp,
             CASE WHEN k.cg > 0
                  THEN CAST(floor(1000000.0 * (0.5
                       * (k.cg / CAST(b.nn AS DOUBLE))
                       * ln((2.0 * (k.cg / CAST(b.nn AS DOUBLE)))
                            / ((k.c / CAST(t.ns AS DOUBLE))
                               + (k.cg / CAST(b.nn AS DOUBLE)))))) AS BIGINT)
                  ELSE 0 END AS tq
      FROM cats k JOIN totals t USING (source) CROSS JOIN big_n b
    )
    SELECT source, CAST(min(ns) AS BIGINT) AS n_tokens,
           CAST(sum(tp + tq) AS BIGINT) AS jsd_e6
    FROM terms GROUP BY source
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (Lin 1991) of each source's unigram
    distribution against the whole corpus — the standing corpus-DRIFT
    audit: a source whose JSD jumps between snapshots changed register
    (spam influx, template shift, language drift) before any quality
    score moves. Completes the distribution-comparison family: ks/mann-
    whitney compare VALUE samples; this compares CATEGORICAL token
    distributions, symmetrically and bounded (<= ln 2 nats).

    Categories are the global top-200 token head PLUS a 'rest' bucket
    holding the aggregated tail mass, so both P (source) and Q (corpus)
    remain true distributions over 201 categories and the grid is
    vocabulary-INDEPENDENT — the zipf top-200 discipline applied to a
    divergence (a raw sources x vocab grid would be corpus-class at
    100 TB; sources x 201 is not).

    Exactness: all counts are exact BIGINTs; each category's two terms
    0.5*p*ln(2p/(p+q)) and 0.5*q*ln(2q/(p+q)) are closed-form doubles
    over those integers with the division/multiplication order mirrored
    verbatim (the welch discipline, ln agreement as in zipf/heaps),
    floor-quantized e6 BEFORE the per-source sum, so only integers cross
    the aggregate. x*ln(x)->0 arms are explicit CASE zeros.

    Scale shape: one corpus scan -> (source, tok) count (the only
    corpus-sized shuffle) -> the head is TakeOrdered(200), totals are
    source-bounded, and the term grid is sources x 201 with the head
    BROADCAST onto it. At 100 TB nothing downstream of the count scales
    with the corpus."""
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select("source", F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"))
    )
    cnt = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cnt = _pin(cnt)  # one count feeds g, totals, and the head join
    g = cnt.groupBy("tok").agg(F.sum("c").cast("bigint").alias("cg"))
    head = g.orderBy(F.desc("cg"), "tok").limit(200)
    totals = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    big_n = g.agg(F.sum("cg").cast("bigint").alias("nn"))
    src_head = (
        totals.crossJoin(F.broadcast(head.select("tok", "cg")))
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "cg",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
        )
    )
    head_tot = head.agg(F.sum("cg").cast("bigint").alias("hcg"))
    src_head_tot = src_head.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("hc")
    )
    rest = (
        totals.crossJoin(F.broadcast(big_n))
        .crossJoin(F.broadcast(head_tot))
        .join(src_head_tot, "source", "left")
        .select(
            "source",
            (F.col("nn") - F.col("hcg")).cast("bigint").alias("cg"),
            (F.col("ns") - F.coalesce(F.col("hc"), F.lit(0)))
            .cast("bigint")
            .alias("c"),
        )
    )
    cats = src_head.unionByName(rest)
    w = cats.join(totals, "source").crossJoin(F.broadcast(big_n))
    p = F.col("c") / F.col("ns").cast("double")
    q = F.col("cg") / F.col("nn").cast("double")
    tp = (
        F.when(
            F.col("c") > 0,
            F.floor(
                1000000.0 * (F.lit(0.5) * p * F.log((F.lit(2.0) * p) / (p + q)))
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("tp")
    )
    tq = (
        F.when(
            F.col("cg") > 0,
            F.floor(
                1000000.0 * (F.lit(0.5) * q * F.log((F.lit(2.0) * q) / (p + q)))
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("tq")
    )
    return (
        w.select("source", "ns", tp, tq)
        .groupBy("source")
        .agg(
            F.min("ns").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tp") + F.col("tq")).cast("bigint").alias("jsd_e6"),
        )
    )


@register(
    "heaps_law_fit",
    r"""
    WITH d AS (
      SELECT source,
             regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    pts AS (
      SELECT source,
             CAST(floor(100000.0 * ln(CAST(len(w) AS DOUBLE))) AS BIGINT) AS x,
             CAST(floor(100000.0 * ln(CAST(len(list_distinct(w)) AS DOUBLE)))
                  AS BIGINT) AS y
      FROM d WHERE len(w) >= 2
    ),
    s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY source
    )
    SELECT source, n_docs,
           CASE WHEN n_docs * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(floor(1000000.0
                     * (CAST(n_docs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n_docs AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
           END AS beta_e6,
           CASE WHEN n_docs * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(floor((1000000.0 / 100000.0)
                     * (sy - ((CAST(n_docs AS DOUBLE) * sxy
                               - CAST(sx AS DOUBLE) * sy)
                              / (CAST(n_docs AS DOUBLE) * sxx
                                 - CAST(sx AS DOUBLE) * sx)) * sx)
                     / CAST(n_docs AS DOUBLE)) AS BIGINT)
           END AS logk_e6
    FROM s
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit (Heaps 1978) per source: OLS of ln(distinct types)
    on ln(tokens) across documents — V = K * N^beta, the vocabulary-
    growth exponent (~0.4-0.8 for natural text) that sizes tokenizer
    vocabularies and predicts novel-type rates at corpus scale-up.
    vocab_growth_stats emits the raw inputs; this fits the law per
    source, and a source whose beta sits near 0 (template spam) or near
    1 (random noise/IDs) fails the corpus-health read.

    Exactness: per-document ln token/type counts are quantized at 1e5
    into BIGINTs; the per-source OLS sums are exact integer aggregates.
    Here n_docs is corpus-sized (unlike zipf_law_fit's 200 points), so
    the closed-form slope is evaluated in doubles over the five exact
    sums with every product written CAST-first (n * sxy up to ~1e22
    exceeds BIGINT; as doubles the expression is deterministic on both
    engines — same ops, same order, same scalar inputs). Degenerate
    sources (all docs the same length) -> NULL. Capacity of the integer
    sums: sum(x*x) <= n * 2.2e12 -> n < 4e6 docs/source in BIGINT;
    DECIMAL(38,0) past that (docs/LIMITS.md).

    Scale shape: ONE document scan computing two per-row array sizes
    (no explode — the tokens never leave the row), then a tiny
    groupBy(source). The distinct-type count is per-document local."""
    d = t(spark, sf_dir, "documents").filter(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
    )
    wtoks = X.tokens(F.lower(F.col("text")))
    pts = (
        d.select(
            "source",
            F.size(wtoks).alias("ntok"),
            F.size(F.array_distinct(wtoks)).alias("ntype"),
        )
        .filter(F.col("ntok") >= 2)
        .select(
            "source",
            F.floor(100000.0 * F.log(F.col("ntok").cast("double")))
            .cast("bigint")
            .alias("x"),
            F.floor(100000.0 * F.log(F.col("ntype").cast("double")))
            .cast("bigint")
            .alias("y"),
        )
    )
    s = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    nd = F.col("n_docs").cast("double")
    sxd = F.col("sx").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = nd * F.col("sxx") - sxd * F.col("sx")
    zero = F.col("n_docs") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_d = num / den
    return s.select(
        "source",
        "n_docs",
        F.when(zero == 0, F.lit(None).cast("bigint"))
        .otherwise(F.floor(1000000.0 * slope_d).cast("bigint"))
        .alias("beta_e6"),
        F.when(zero == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                (1000000.0 / 100000.0) * (F.col("sy") - slope_d * F.col("sx")) / nd
            ).cast("bigint")
        )
        .alias("logk_e6"),
    )


# =====================================================================
# High-entropy secret/credential audit (training-data safety scan)
# =====================================================================

@register(
    "secret_entropy_audit",
    r"""
    WITH cand AS (
      SELECT doc_id, source,
             regexp_extract_all(text, '[A-Za-z0-9+/=]{8,}') AS arr
      FROM documents WHERE text IS NOT NULL
    ),
    c AS (
      SELECT doc_id, source, r.i AS cand_idx, arr[r.i] AS s,
             CAST(length(arr[r.i]) AS BIGINT) AS n
      FROM cand, unnest(range(1, len(arr) + 1)) AS r(i)
    ),
    alpha AS (
      SELECT chr(CAST(cp AS INTEGER)) AS ch
      FROM unnest(range(43, 123)) AS a(cp)
      WHERE regexp_matches(chr(CAST(cp AS INTEGER)), '[A-Za-z0-9+/=]')
    ),
    freq AS (
      SELECT c.doc_id, c.source, c.cand_idx, c.n,
             CAST(length(c.s) - length(replace(c.s, alpha.ch, ''))
                  AS BIGINT) AS cnt
      FROM c CROSS JOIN alpha
    ),
    terms AS (
      SELECT doc_id, source, cand_idx, n,
             CAST(floor(1000000.0 * ((cnt / CAST(n AS DOUBLE))
                  * (ln(n / CAST(cnt AS DOUBLE)) / ln(2.0)))) AS BIGINT)
               AS term_e6
      FROM freq WHERE cnt > 0
    ),
    ent AS (
      SELECT doc_id, source, cand_idx, CAST(max(n) AS BIGINT) AS n,
             CAST(sum(term_e6) AS BIGINT) AS entropy_e6
      FROM terms GROUP BY doc_id, source, cand_idx
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN entropy_e6 >= 2750000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(sum(CASE WHEN entropy_e6 >= 2750000 THEN n ELSE 0 END)
                AS BIGINT) AS flagged_chars,
           CAST(max(entropy_e6) AS BIGINT) AS max_entropy_e6
    FROM ent GROUP BY source
    """,
)
def secret_entropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-entropy credential scan — the training-data safety pass that
    catches API keys / tokens / private-key blobs BEFORE they reach a
    model (the detect-secrets / trufflehog HighEntropyString heuristic,
    public tooling): every base64-alphabet run is a candidate; its
    per-char Shannon entropy in bits decides — random key material sits
    near log2(64) = 6 bits/char, natural-language words in the same
    alphabet near 3-4. The PRODUCTION setting is (min_len 24, threshold
    4.5 bits); the registered gate variant runs (min_len 8, threshold
    2.75 bits) because the synthetic fixture's longest base64-alphabet
    run is 8 chars — at production constants the gate would hash an
    always-empty result and prove nothing. Identical plan either way;
    the hand test pins BOTH configurations via the parametric form.
    Complements pii_luhn_audit (structured PII) with the
    unstructured-secret class.

    Exactness: per-candidate char counts are EXACT integers computed
    against the fixed 65-symbol alphabet (length-difference trick — no
    per-char explode of the corpus); each -p*log2(p) term is a per-row
    closed-form double over two integers, floored at 1e6 BEFORE the
    per-candidate sum (<= 65 integer terms), so entropy_e6 is exact and
    the flag threshold cuts identically on both engines.

    Scale shape: one scan + regexp_extract_all; the explode is over
    CANDIDATES (rare by construction), and the alphabet join is a
    constant 65-row broadcast — cost is O(candidates * 65 * len) string
    ops, never a corpus-wide char explode. One groupBy(candidate), one
    groupBy(source)."""
    return secret_entropy_scan(spark, sf_dir, min_len=8, thresh_e6=2750000)


def secret_entropy_scan(
    spark: SparkSession, sf_dir: str, *, min_len: int, thresh_e6: int
) -> DataFrame:
    """Parametric form of secret_entropy_audit: candidate run length and
    flag threshold as arguments (production: min_len=24,
    thresh_e6=4500000)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cand = docs.select(
        "doc_id",
        "source",
        F.expr(
            "regexp_extract_all(text, '[A-Za-z0-9+/=]{%d,}', 0)" % min_len
        ).alias("arr"),
    )
    c = cand.select(
        "doc_id",
        "source",
        F.posexplode("arr").alias("cand_idx", "s"),
    ).select(
        "doc_id", "source", "cand_idx", "s", F.length("s").cast("bigint").alias("n")
    )
    alpha = (
        spark.range(43, 123)
        .select(F.expr("char(id)").alias("ch"))
        .filter(F.col("ch").rlike("[A-Za-z0-9+/=]"))
    )
    freq = c.crossJoin(F.broadcast(alpha)).select(
        "doc_id",
        "source",
        "cand_idx",
        "n",
        (F.length("s") - F.length(F.expr("replace(s, ch, '')")))
        .cast("bigint")
        .alias("cnt"),
    )
    terms = freq.filter(F.col("cnt") > 0).select(
        "doc_id",
        "source",
        "cand_idx",
        "n",
        F.floor(
            1000000.0
            * (
                (F.col("cnt") / F.col("n").cast("double"))
                * (F.log(F.col("n") / F.col("cnt").cast("double")) / F.log(F.lit(2.0)))
            )
        )
        .cast("bigint")
        .alias("term_e6"),
    )
    ent = terms.groupBy("doc_id", "source", "cand_idx").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("term_e6").cast("bigint").alias("entropy_e6"),
    )
    return ent.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("entropy_e6") >= thresh_e6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum(F.when(F.col("entropy_e6") >= thresh_e6, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("flagged_chars"),
        F.max("entropy_e6").cast("bigint").alias("max_entropy_e6"),
    )
