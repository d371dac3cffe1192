"""Lake-maintenance / corpus-hygiene queries: CDC merge, benchmark
decontamination, PII scrubbing, Z-order layout curve, BM25 retrieval,
skew-salted aggregation, PageRank, weighted sampling, document chunking,
PMI collocations, chunk-level dedup, anomaly detection, and edit-distance
verification — the incremental-ingest, data-layout, and corpus-hygiene
half of a training-data pipeline, complementing plans.ml_queries'
dedup/similarity/text family.

Each query mirrors its DuckDB oracle exactly (same expressions, same
aliases). The reference's analogue of this family is its idempotent-replay
and validation design (docs/Architecture.md:98-102, cmd/validate phases);
everything beyond that is the 100 TB extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import pii as PII
from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.functions.zorder import (
    hilbert_index_sql,
    interleave_bits,
    interleave_bits_sql,
)
from storm_data_etl_spark.operators import merge as M
from storm_data_etl_spark.operators.sampling import lcg_bucket_sql
from storm_data_etl_spark.plans.ml_queries import _SQL_NORM, _sql_jaccard_pairs, _sql_shingles
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t
from storm_data_etl_spark.session import pin as _pin


# =====================================================================
# CDC upsert merge (last-writer-wins changelog collapse)
# =====================================================================

@register(
    "cdc_upsert_merge",
    """
    WITH snap AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             1 AS _version, 'I' AS _op
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2)
                  AS DECIMAL(18,2)),
             2 AS _version, 'U' AS _op
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    del AS (
      SELECT o_orderkey, 'X', CAST(0.0 AS DECIMAL(18,2)), 3 AS _version,
             'D' AS _op
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    log AS (
      SELECT * FROM snap UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del
    ),
    latest AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY _version DESC, _op DESC) AS rn
      FROM log
    )
    SELECT o_orderstatus, count(*) AS n_rows,
           CAST(sum(o_totalprice) AS DOUBLE) AS total_price
    FROM latest WHERE rn = 1 AND _op <> 'D'
    GROUP BY o_orderstatus
    """,
)
def cdc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest MERGE: collapse snapshot + update batch + delete
    tombstones to the latest surviving row per key (last-writer-wins — the
    complement of the reference's first-wins `ON CONFLICT DO NOTHING`
    replay design, docs/Architecture.md:98-102), then summarize. One
    shuffle on the merge key (operators.merge)."""
    orders = t(spark, sf_dir, "orders")
    # Exact decimal money arithmetic throughout (double round() diverges
    # across engines near .005 boundaries); ONE cast to double at the end.
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    snap = base.withColumns({"_version": F.lit(1), "_op": F.lit("I")})
    upd = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .withColumns(
            {
                "o_orderstatus": F.lit("U"),
                "o_totalprice": F.round(
                    F.col("o_totalprice") * F.lit("1.1").cast("decimal(2,1)"), 2
                ).cast("decimal(18,2)"),
                "_version": F.lit(2),
                "_op": F.lit("U"),
            }
        )
    )
    dele = (
        base.filter(F.col("o_orderkey") % 101 == 0)
        .withColumns(
            {
                "o_orderstatus": F.lit("X"),
                "o_totalprice": F.lit("0.00").cast("decimal(18,2)"),
                "_version": F.lit(3),
                "_op": F.lit("D"),
            }
        )
    )
    log = snap.unionByName(upd).unionByName(dele)
    merged = M.upsert_last_writer_wins(log, ["o_orderkey"], "_version", "_op")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").cast("double").alias("total_price"),
    )


@register(
    "incremental_agg_maintenance",
    """
    WITH final AS (
      SELECT o_custkey, o_totalprice FROM orders
      WHERE (o_orderkey % 10 = 0) OR (o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0)
    )
    SELECT o_custkey, count(*) AS n_orders,
           CAST(floor(100 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE)) AS BIGINT) AS total_e2
    FROM final GROUP BY o_custkey
    """,
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-customer (count, sum) aggregate
    kept current by MERGING a CDC delta into the materialized state —
    never recomputing from the base table. Base = orders with key%10≠0
    (the 'already ingested' snapshot, aggregated once); delta = new
    inserts (key%10=0) weighted +1 and deletes (key%7=0 of the base)
    weighted −1, aggregated into signed partial states; the merge is a
    union of the two state tables + one re-aggregate on the key, with
    fully-deleted keys (count→0) dropped.

    The oracle recomputes the same aggregate directly from the final row
    set — proving delta composition ≡ recompute. At 100 TB this is the
    difference between touching |delta| rows and touching the world: the
    base state is bucketed/partitioned by key, the delta shuffle is
    proportional to the changelog, and count/sum (and anything derivable:
    avg, ratios) compose losslessly; the same pattern underlies
    hypertable_rollup's hourly→daily composition."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    inserts = o.filter(F.col("o_orderkey") % 10 == 0)
    deletes = base.filter(F.col("o_orderkey") % 7 == 0)

    base_state = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("price").alias("s")
    )
    changelog = inserts.select(
        "o_custkey", F.lit(1).alias("w"), F.col("price").alias("sp")
    ).unionByName(
        deletes.select("o_custkey", F.lit(-1).alias("w"), (-F.col("price")).alias("sp"))
    )
    delta_state = changelog.groupBy("o_custkey").agg(
        F.sum("w").alias("n"), F.sum("sp").alias("s")
    )
    merged = (
        base_state.unionByName(delta_state)
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("s").alias("stot"))
        .filter(F.col("n_orders") > 0)
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.floor(100 * F.col("stot").cast("double")).cast("bigint").alias("total_e2"),
    )


# =====================================================================
# Benchmark decontamination (shared-n-gram semi-join)
# =====================================================================

@register(
    "decontaminate_benchmark",
    f"""
    WITH norm AS (
      SELECT doc_id, source, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source, unnest({_sql_shingles(8)}) AS gram FROM norm
    ),
    bench AS (SELECT DISTINCT gram FROM sh WHERE source = 'src0'),
    train AS (SELECT doc_id, gram FROM sh WHERE source <> 'src0')
    SELECT t.doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           round(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS contaminated_frac
    FROM train t LEFT JOIN bench b ON b.gram = t.gram
    GROUP BY t.doc_id
    HAVING sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
    """,
)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents (source ≠ src0)
    sharing any word-8-gram with the held-out benchmark set (source =
    src0). The benchmark gram set is tiny relative to the corpus →
    broadcast, so the contamination check is a map-side join + ONE
    shuffle for the per-doc aggregate. At 100 TB the benchmark side stays
    a broadcast (eval sets are MBs); the scan side is embarrassingly
    parallel."""
    docs = t(spark, sf_dir, "documents")
    # Optimization r13 (guide §2.3/§3.2, VERDICT r12 item 4): the bench and
    # train sides are two lineages of the same 8-gram regex explode — pin
    # the (doc_id, source, gh, gram) relation so the extraction runs once.
    # The probe key is the 8-byte xxhash64 of the gram, not the up-to-
    # ~90-char string: the benchmark set groups its grams per hash
    # (virtually always a 1-element array) and the probe is a long-keyed
    # hash lookup; the gram STRING is compared only on hash hits
    # (array_contains), so a hash collision can never flag a gram the
    # old string join would not have — exactness rests on the real text,
    # the dup_length_bracket discipline.
    grams = docs.select(
        "doc_id", "source", F.explode(X.shingles("text", 8)).alias("gram")
    ).withColumn("gh", F.xxhash64("gram"))
    grams = _pin(grams)
    bench = grams.filter(F.col("source") == "src0").groupBy("gh").agg(
        F.collect_set("gram").alias("_bgrams")
    )
    train = grams.filter(F.col("source") != "src0").select("doc_id", "gh", "gram")
    flagged = train.join(F.broadcast(bench), "gh", "left")
    hit = F.when(
        F.col("_bgrams").isNotNull() & F.array_contains("_bgrams", F.col("gram")),
        1,
    ).otherwise(0)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(hit).cast("bigint").alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_grams"), 6
            ).alias("contaminated_frac"),
        )
    )


# =====================================================================
# PII scrubbing (deterministic synthetic injection + redaction)
# =====================================================================

_SQL_PII_INJECT = """
    concat(text, CASE
      WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      WHEN doc_id % 4 = 1 THEN ' call 555-013-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      WHEN doc_id % 4 = 2 THEN ' node 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 250 + 1 AS VARCHAR)
      ELSE '' END)
"""

_SQL_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_SQL_PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
_SQL_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


@register(
    "pii_redaction_stats",
    f"""
    WITH injected AS (
      SELECT doc_id, source, {_SQL_PII_INJECT} AS txt
      FROM (SELECT doc_id, source, coalesce(text, '') AS text FROM documents)
    ),
    redacted AS (
      SELECT source,
             len(regexp_extract_all(txt, '{_SQL_EMAIL}')) AS n_email,
             len(regexp_extract_all(txt, '{_SQL_PHONE}')) AS n_phone,
             len(regexp_extract_all(txt, '{_SQL_IPV4}')) AS n_ip,
             length(regexp_replace(regexp_replace(regexp_replace(txt,
               '{_SQL_EMAIL}', '<EMAIL>', 'g'),
               '{_SQL_PHONE}', '<PHONE>', 'g'),
               '{_SQL_IPV4}', '<IP>', 'g')) AS clean_len
      FROM injected
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS emails_redacted,
           CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
           CAST(sum(n_ip) AS BIGINT) AS ips_redacted,
           CAST(sum(clean_len) AS BIGINT) AS total_clean_chars
    FROM redacted GROUP BY source
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII scrub: deterministically inject synthetic emails / phone
    numbers / IPv4s (the testdata corpus contains none), then count and
    redact them per source with pure JVM regex expressions
    (functions.pii). Narrow — one scan, one tiny aggregate; the redaction
    fuses into the document pipeline's codegen stage at any scale."""
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    # coalesce: Spark concat is NULL if ANY argument is NULL, while the
    # oracle's concat() skips NULLs — treat missing text as empty on both.
    inject = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(did % 4 == 0, F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")))
        .when(did % 4 == 1, F.concat(F.lit(" call 555-013-"), F.lpad((did % 10000).cast("string"), 4, "0")))
        .when(did % 4 == 2, F.concat(F.lit(" node 10.0."), (did % 256).cast("string"), F.lit("."), (did % 250 + 1).cast("string")))
        .otherwise(F.lit("")),
    )
    injected = docs.select("source", inject.alias("txt"))
    return injected.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(PII.pii_count("txt", "email")).alias("emails_redacted"),
        F.sum(PII.pii_count("txt", "phone")).alias("phones_redacted"),
        F.sum(PII.pii_count("txt", "ipv4")).alias("ips_redacted"),
        F.sum(F.length(PII.redact("txt"))).alias("total_clean_chars"),
    )


@register(
    "pii_luhn_audit",
    """
    WITH cand AS (
      SELECT source,
             lpad(CAST((doc_id * 48271 + 12345) % 10000000000000000
                       AS VARCHAR), 16, '0') AS c
      FROM documents
    ),
    r AS (SELECT source, reverse(c) AS rev FROM cand),
    scored AS (
      SELECT source,
             list_sum(list_transform(range(1, 17), i ->
               CASE WHEN (i - 1) % 2 = 1 THEN
                 CASE WHEN 2 * CAST(substring(rev, i, 1) AS INT) > 9
                      THEN 2 * CAST(substring(rev, i, 1) AS INT) - 9
                      ELSE 2 * CAST(substring(rev, i, 1) AS INT) END
               ELSE CAST(substring(rev, i, 1) AS INT) END)) % 10 = 0 AS ok
      FROM r
    )
    SELECT source, count(*) AS n_candidates,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid
    FROM scored GROUP BY source
    """,
)
def pii_luhn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation of card-number candidates — the
    false-positive gate real PII scrubbers apply after the 16-digit regex
    (a digit string failing Luhn is almost never a card, so it should not
    be redacted). The corpus carries no card numbers, so candidates are
    synthesized deterministically from doc_id (same injection pattern as
    pii_redaction_stats); ~10% pass Luhn, exercising both branches. The
    checksum (functions.pii.luhn_valid) is pure JVM array expressions —
    transform-with-index + aggregate — and the DuckDB twin computes the
    identical doubled-digit arithmetic via list_transform over an index
    range. Narrow: one scan, one per-source aggregate."""
    docs = t(spark, sf_dir, "documents")
    cand = F.lpad(
        F.pmod(F.col("doc_id") * 48271 + 12345, F.lit(10_000_000_000_000_000))
        .cast("string"),
        16,
        "0",
    )
    scored = docs.select("source", PII.luhn_valid(cand).alias("ok"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias(
            "n_luhn_valid"
        ),
    )


# =====================================================================
# Z-order curve (multi-dimensional layout key)
# =====================================================================

_Z_X = "CAST(floor(\"value\" * 100) AS BIGINT)"
_Z_Y = "(user_id % 65536)"


@register(
    "zorder_curve_stats",
    f"""
    WITH z AS (
      SELECT event_type,
             {interleave_bits_sql([_Z_X, _Z_Y], 16)} AS zval
      FROM events
    )
    SELECT event_type, count(*) AS n_rows,
           min(zval) AS z_min, max(zval) AS z_max,
           CAST(sum(zval) AS BIGINT) AS z_sum
    FROM z GROUP BY event_type
    """,
)
def zorder_curve_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parity check of the Morton-code expression behind the Z-ordered
    lake layout (functions.zorder / sources.parquet.write_zordered):
    interleave (value, user_id) into a 32-bit curve position and aggregate
    per event type. The layout itself (file-stat pruning) is proven in
    tests/test_lake.py; this query pins the curve's arithmetic against
    DuckDB bit-for-bit."""
    ev = t(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 100).cast("bigint")
    y = F.col("user_id") % 65536
    z = interleave_bits([x, y], 16)
    return (
        ev.select("event_type", z.alias("zval"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
            F.sum("zval").alias("z_sum"),
        )
    )


# =====================================================================
# BM25 keyword search (inverted-index scoring)
# =====================================================================

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "bm25_keyword_search",
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
      WHERE tok IN {repr(tuple(_BM25_TERMS))}
      GROUP BY doc_id, tok
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1)
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN df ON df.term = tf.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 keyword retrieval over the corpus (k1=1.2, b=0.75),
    built from relational pieces only: tokenize → posting-list term
    frequencies (one shuffle on (doc, term)) → document frequencies
    (broadcast back: |vocab ∩ query| rows) → per-doc score sum → global
    top-k (TakeOrdered, no full sort). Corpus stats (N, avgdl) ride a
    broadcast single-row cross join — at 100 TB every non-scan input to
    the score is KBs."""
    # Optimization r13 (guide §2.4/§2.3): the old plan tokenized the corpus
    # THREE times (dl, stats, tf lineages) and shuffled a (doc, term)
    # posting table through a groupBy + two joins. The query terms are a
    # FIXED 3-term literal set, so per-doc term frequencies are in-row
    # array counts on ONE tokenize scan; n_docs/avgdl/df all fold into ONE
    # single-row aggregate (df_t = count of docs with tf_t > 0 — exactly
    # the old posting-table row count per term), broadcast back via cross
    # join. Per-term scores sum in fixed term order; a term with tf = 0
    # contributes exactly +0.0, and all scores are positive finite, so the
    # 3-addend IEEE sum equals the old grouped sum of the 1-3 nonzero
    # term_score rows (addition with +0.0 is exact) — doc set pinned
    # identical by the tf_sum > 0 filter (docs appearing in the old tf
    # table ≡ docs with at least one matching term).
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
    )
    tf_cols = [
        F.size(F.filter("toks", lambda x: x == F.lit(term))).alias(f"tf_{i}")
        for i, term in enumerate(_BM25_TERMS)
    ]
    row = docs.select("doc_id", F.size("toks").alias("dl"), *tf_cols)
    stats = row.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    k1, b = _BM25_K1, _BM25_B

    def _term_score(i: int):
        tf = F.col(f"tf_{i}").cast("bigint")
        df = F.col(f"df_{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        return F.when(
            tf > 0,
            idf
            * tf
            * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))

    score = _term_score(0)
    for i in range(1, len(_BM25_TERMS)):
        score = score + _term_score(i)
    any_match = F.col("tf_0")
    for i in range(1, len(_BM25_TERMS)):
        any_match = any_match + F.col(f"tf_{i}")
    scored = (
        row.crossJoin(F.broadcast(stats))
        .filter(any_match > 0)
        .select("doc_id", score.alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )


# =====================================================================
# Skew-safe aggregation (salted two-stage distinct) — oracle is the
# PLAIN formulation, proving the salted plan computes identical results
# =====================================================================

@register(
    "skew_salted_distinct",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-users per event type via the two-stage salted plan
    (operators.skew.salted_distinct_count): stage 1 shuffles on
    (event_type, hash(user_id) % 16) so a hot event type spreads over 16
    reducers; stage 2 sums the disjoint partial distincts. The oracle is
    the PLAIN group-by-distinct SQL — the point of the query is that the
    skew-safe plan is semantically identical while no single reducer ever
    holds a whole hot key."""
    from storm_data_etl_spark.operators.skew import salted_distinct_count

    ev = t(spark, sf_dir, "events")
    return salted_distinct_count(ev, "event_type", "user_id", salt=16)


# =====================================================================
# PageRank (power iteration, 3 rounds) — unrolled-CTE oracle
# =====================================================================

def _sql_pagerank_iter(prev: str, out: str) -> str:
    return f"""
    c_{out} AS (
      SELECT e.dst AS node, sum(r.rank / e.outdeg) AS contrib
      FROM dedges e JOIN {prev} r ON r.node = e.src
      GROUP BY e.dst
    ),
    {out} AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(c.contrib, 0) AS rank
      FROM pnodes n LEFT JOIN c_{out} c ON c.node = n.node
    )"""


@register(
    "pagerank_topk",
    f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey + 1000000 AS c
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    edgelist AS (
      SELECT s AS src, c AS dst FROM pairs
      UNION ALL SELECT c, s FROM pairs
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edgelist GROUP BY src),
    dedges AS (
      SELECT e.src, e.dst, d.outdeg FROM edgelist e JOIN deg d ON d.src = e.src
    ),
    pnodes AS (SELECT DISTINCT src AS node FROM edgelist),
    r0 AS (SELECT node, 1.0 AS rank FROM pnodes),
    {_sql_pagerank_iter("r0", "r1")},
    {_sql_pagerank_iter("r1", "r2")},
    {_sql_pagerank_iter("r2", "r3")}
    SELECT node, round(rank, 6) AS pagerank
    FROM r3 ORDER BY rank DESC, node LIMIT 10
    """,
)
def pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier↔customer interaction graph (distinct
    (l_suppkey, o_custkey) pairs, both directions; customer ids offset to
    disjoin the node spaces), 3 power iterations, damping 0.85, top-10.
    The oracle unrolls the identical iterations as SQL CTEs — pinning the
    loop's join/aggregate semantics, not just one round. Per-iteration
    cost: 2 shuffles (rank⋈edges on src, contribution agg on dst)."""
    from storm_data_etl_spark.operators.graph import pagerank

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(10)
        .select("node", F.round("rank", 6).alias("pagerank"))
    )


# =====================================================================
# Skew-safe per-key top-k — oracle is the plain window formulation
# =====================================================================

@register(
    "skew_salted_topk",
    """
    WITH counts AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
      SELECT event_type, user_id, n,
             row_number() OVER (
               PARTITION BY event_type ORDER BY n DESC, user_id) AS rank
      FROM counts
    )
    SELECT event_type, user_id, n, rank FROM ranked WHERE rank <= 3
    """,
)
def skew_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per event type via the salted two-stage count
    (operators.skew.salted_top_values): partial counts on (key, value,
    salt) so a hot (event_type, user) pair never concentrates on one
    reducer, then merge + per-key window. Oracle is the plain
    count+row_number SQL — identical results, skew-safe plan."""
    from storm_data_etl_spark.operators.skew import salted_top_values

    ev = t(spark, sf_dir, "events")
    top = salted_top_values(ev, "event_type", "user_id", n=3, salt=16)
    return top.select(
        F.col("key").alias("event_type"),
        F.col("value").alias("user_id"),
        F.col("count").alias("n"),
        "rank",
    )


# =====================================================================
# Corpus after near-dup removal (end-to-end keep/drop decision)
# =====================================================================

@register(
    "corpus_after_dedup",
    f"""
    WITH RECURSIVE norm AS (
      SELECT doc_id AS id, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT id, unnest({_sql_shingles(3)}) AS shingle FROM norm
    ),
    sizes AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
    common AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    jacpairs AS (
      SELECT id_a, id_b
      FROM common
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE n_common::DOUBLE / (sa.n_shingles + sb.n_shingles - n_common) >= 0.5
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM jacpairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM jacpairs
    ),
    walk(id, reach) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ),
    comp AS (SELECT id, min(reach) AS component FROM walk GROUP BY id),
    labeled AS (
      SELECT d.doc_id, d.source, d.n_chars,
             coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id = component THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN doc_id = component THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM labeled GROUP BY source
    """,
)
def corpus_after_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end keep/drop decision: verified MinHash pairs (Jaccard ≥
    0.5) → connected components → keep only each cluster's canonical doc
    (min doc_id; singletons keep themselves), reported as per-source
    survivor counts and retained bytes. This is the full dedup pipeline a
    corpus build runs — candidate generation, verification, transitive
    closure, canonical selection — in one plan. Oracle recomputes the same
    decision from exact all-pairs Jaccard + recursive-CTE reachability."""
    from storm_data_etl_spark.operators import dedup as D

    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_verified_pairs(docs, num_hashes=64, bands=16, threshold=0.5)
    comp = D.connected_components(pairs)
    labeled = docs.join(comp, docs["doc_id"] == comp["id"], "left").select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )
    kept = F.when(F.col("doc_id") == F.col("component"), 1).otherwise(0)
    return labeled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        F.sum(F.col("n_chars") * kept).alias("kept_chars"),
    )


# =====================================================================
# Quality-weighted deterministic sampling (importance corpus mixing)
# =====================================================================

@register(
    "weighted_sample_mix",
    f"""
    WITH weighted AS (
      SELECT doc_id, source, n_chars,
             least(greatest(n_chars / 400.0, 0.0), 1.0) AS w,
             {lcg_bucket_sql('doc_id', 10_000)} AS b
      FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN b < w * 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN b < w * 10000 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM weighted GROUP BY source
    """,
)
def weighted_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: each doc survives with
    probability ≈ its weight (here min(n_chars/400, 1) — a stand-in for a
    quality score), decided row-locally by id-hash
    (operators.sampling.weighted_hash_sample) — reproducible on any
    cluster, no RNG state, narrow until the reporting aggregate. Oracle
    mirrors the LCG arithmetic exactly."""
    from storm_data_etl_spark.operators.sampling import weighted_hash_sample

    docs = t(spark, sf_dir, "documents")
    w = F.col("n_chars") / F.lit(400.0)
    kept = weighted_hash_sample(docs, "doc_id", w, granularity=10_000)
    kept_stats = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept_stats, "source", "left").select(
        "source",
        "n_total",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        F.coalesce(F.col("kept_chars"), F.lit(0)).alias("kept_chars"),
    )


# =====================================================================
# Document chunking (overlapping token windows — embedding/RAG prep)
# =====================================================================

_CHUNK_SIZE = 16
_CHUNK_STRIDE = 8


@register(
    "doc_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    counted AS (
      SELECT doc_id, words,
             CAST(floor(greatest(len(words) - {_CHUNK_SIZE}, 0) / {_CHUNK_STRIDE}) AS BIGINT) + 1
               AS n_chunks
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, ci.ci AS chunk_idx,
             words[ci.ci * {_CHUNK_STRIDE} + 1 : ci.ci * {_CHUNK_STRIDE} + {_CHUNK_SIZE}] AS chunk
      FROM counted, unnest(range(0, n_chunks)) AS ci(ci)
    )
    SELECT doc_id, chunk_idx, len(chunk) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM chunks
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 16, stride 8) — the
    embedding/RAG preparation step that turns documents into units a
    vector index can hold. Chunk boundaries are computed per row with
    sequence + slice (narrow; the explode multiplies rows inside the same
    scan stage, no shuffle at all), and each chunk carries an md5
    fingerprint so downstream chunk-level dedup can run exactly like
    doc-level (same md5 both engines pins cross-engine parity)."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("words"))
    )
    n = F.size("words")
    n_chunks = (
        F.floor(F.greatest(n - _CHUNK_SIZE, F.lit(0)) / _CHUNK_STRIDE).cast("bigint") + 1
    )
    chunks = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "words",
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(
            "words", F.col("chunk_idx") * _CHUNK_STRIDE + 1, _CHUNK_SIZE
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


# =====================================================================
# PMI collocations (bigram association mining)
# =====================================================================

@register(
    "pmi_collocations",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    uni AS (
      SELECT w.w AS word FROM toks, unnest(words) AS w(w)
    ),
    uni_counts AS (SELECT word, count(*) AS c FROM uni GROUP BY word),
    n_uni AS (SELECT sum(c) AS n FROM uni_counts),
    bi AS (
      SELECT words[i.i] AS w1, words[i.i + 1] AS w2
      FROM toks, unnest(range(1, len(words))) AS i(i)
    ),
    bi_counts AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
    n_bi AS (SELECT sum(c12) AS n FROM bi_counts),
    pmi AS (
      SELECT b.w1, b.w2, b.c12,
             round(ln(
               (b.c12::DOUBLE / nb.n)
               / ((u1.c::DOUBLE / nu.n) * (u2.c::DOUBLE / nu.n))
             ), 6) AS pmi
      FROM bi_counts b
      JOIN uni_counts u1 ON u1.word = b.w1
      JOIN uni_counts u2 ON u2.word = b.w2
      CROSS JOIN n_uni nu CROSS JOIN n_bi nb
      WHERE b.c12 >= 5
    )
    SELECT w1, w2, c12, pmi
    FROM pmi ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual information
    (min count 5) — the association signal behind phrase detection and
    tokenizer-merge candidates. Unigram/bigram counts are two hash
    aggregates with map-side partials; the corpus totals ride broadcast
    single-row cross joins; top-k is TakeOrdered. DuckDB oracle repeats
    the identical probability arithmetic."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("words"))
    )
    uni = docs.select(F.explode("words").alias("word"))
    uni_counts = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    # Optimization r12 (guide §2.4): the unigram table feeds the corpus
    # total and BOTH broadcast legs of the scoring join; the bigram table
    # feeds its total and the scoring base — each reference re-ran the
    # explode + count. Pinned, each corpus pass runs once; same counts.
    uni_counts = _pin(uni_counts)
    n_uni = uni_counts.agg(F.sum("c").alias("n_u"))
    # bigrams via index explode so the SQL mirror (range + slice) is exact
    bi = docs.select(
        F.explode(F.sequence(F.lit(1), F.size("words") - 1)).alias("i"), "words"
    ).select(
        F.element_at("words", F.col("i")).alias("w1"),
        F.element_at("words", F.col("i") + 1).alias("w2"),
    )
    bi_counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    bi_counts = _pin(bi_counts)
    n_bi = bi_counts.agg(F.sum("c12").alias("n_b"))
    scored = (
        bi_counts.filter(F.col("c12") >= 5)
        .join(F.broadcast(uni_counts.select(F.col("word").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni_counts.select(F.col("word").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c12").cast("double") / F.col("n_b"))
                    / (
                        (F.col("c1").cast("double") / F.col("n_u"))
                        * (F.col("c2").cast("double") / F.col("n_u"))
                    )
                ),
                6,
            ),
        )
    )
    return (
        scored.orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
        .select("w1", "w2", "c12", "pmi")
    )


# =====================================================================
# Chunk-level exact dedup (cross-document duplicated spans, by chunk md5)
# =====================================================================

@register(
    "chunk_dedup_groups",
    f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ),
    counted AS (
      SELECT doc_id, words,
             CAST(floor(greatest(len(words) - {_CHUNK_SIZE}, 0) / {_CHUNK_STRIDE}) AS BIGINT) + 1
               AS n_chunks
      FROM toks
    ),
    chunks AS (
      SELECT doc_id,
             md5(array_to_string(
               words[ci.ci * {_CHUNK_STRIDE} + 1 : ci.ci * {_CHUNK_STRIDE} + {_CHUNK_SIZE}], ' '))
               AS chunk_md5
      FROM counted, unnest(range(0, n_chunks)) AS ci(ci)
    )
    SELECT chunk_md5,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS canonical_doc
    FROM chunks
    GROUP BY chunk_md5
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def chunk_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: duplicate token-window fingerprints that
    appear in MORE THAN ONE document — the sub-document analogue of
    doc_fingerprint_dedup (C4-style span dedup keeps min-doc as canonical
    and strips repeats elsewhere). One shuffle on uniformly-distributed
    md5 keys; group state is O(dup factor)."""
    chunks = doc_chunking(spark, sf_dir)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


# =====================================================================
# Per-user anomaly detection (z-score outliers, exact-decimal moments)
# =====================================================================

@register(
    "anomaly_zscore_events",
    """
    WITH moments AS (
      SELECT user_id,
             count(*) AS n,
             CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST("value" AS DECIMAL(18,2)) * CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS s2
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT user_id, n, s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
      FROM moments WHERE n >= 30
    )
    SELECT e.event_id, e.user_id,
           round(("value" - s.mean) / s.std, 4) AS zscore
    FROM events e JOIN stats s ON s.user_id = e.user_id
    WHERE abs(("value" - s.mean) / s.std) > 3
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier detection: flag events beyond 3 sample standard
    deviations of that user's mean. Moments are computed from EXACT
    decimal sums (value has 2 decimals; value2 has 4 — both exact), then
    converted to double for one deterministic mean/std derivation —
    stddev-of-doubles is summation-order-dependent across engines and
    can flip both round(,4) and the >3 cut. Plan: one partial-aggregated
    shuffle for moments, broadcast join back (user stats are tiny),
    narrow filter."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    moments = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    stats = (
        moments.filter(F.col("n") >= 30)
        .withColumn("mean", F.col("s1") / F.col("n"))
        .withColumn(
            "std",
            F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)),
        )
        .select("user_id", "mean", "std")
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "user_id")
        .filter(F.abs(z) > 3)
        .select("event_id", "user_id", F.round(z, 4).alias("zscore"))
    )


# =====================================================================
# Edit-distance verification of near-dup candidate pairs
# =====================================================================

@register(
    "edit_distance_verify",
    f"""
    WITH {_sql_jaccard_pairs(0.2)}
    SELECT p.id_a, p.id_b, p.jaccard,
           levenshtein(a.text, b.text) AS edit_dist,
           round(1.0 - levenshtein(a.text, b.text)::DOUBLE
                 / greatest(length(a.text), length(b.text)), 6) AS edit_sim
    FROM jacpairs p
    JOIN documents a ON a.doc_id = p.id_a
    JOIN documents b ON b.doc_id = p.id_b
    """,
)
def edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level verification of shingle-Jaccard near-dup candidates:
    Levenshtein distance + normalized similarity for each candidate pair.
    Edit distance is O(len^2) per pair — never run all-pairs; here it runs
    only on the candidate set (the same restrict-then-verify shape as
    minhash_dedup_verified), joined back to the two texts by id. At corpus
    scale the candidate pair list is the small side and broadcasts."""
    from storm_data_etl_spark.operators.dedup import ngram_jaccard_pairs as _njp

    docs = t(spark, sf_dir, "documents")
    pairs = _njp(docs, k=3, threshold=0.2)
    texts = docs.select("doc_id", "text")
    a = texts.withColumnsRenamed({"doc_id": "id_a", "text": "text_a"})
    b = texts.withColumnsRenamed({"doc_id": "id_b", "text": "text_b"})
    dist = F.levenshtein("text_a", "text_b")
    return (
        F.broadcast(pairs)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            dist.alias("edit_dist"),
            F.round(
                1.0
                - dist.cast("double")
                / F.greatest(F.length("text_a"), F.length("text_b")),
                6,
            ).alias("edit_sim"),
        )
    )


# =====================================================================
# Triangle counting (co-supply graph)
# =====================================================================

@register(
    "triangle_count",
    """
    WITH su AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM su a JOIN su b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= 4
    ),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           (SELECT count(DISTINCT src) + count(DISTINCT dst)
              FROM edges) AS node_endpoint_kinds,
           n_triangles
    FROM tri
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the STRONG co-supply graph (suppliers joined
    when they co-serve >= 4 orders): the clustering-structure primitive
    behind community/cohesion analysis. Edges are oriented src < dst so
    each triangle counts exactly once via the two-hop + closing-edge join —
    the standard distributed formulation (2 shuffle joins on uniform
    supplier keys), never an all-triples enumeration.

    The weight floor matters for scale, not just signal: the UNWEIGHTED
    co-supply graph densifies toward a clique as SF grows (90% of all
    supplier pairs at sf0.1), and triangle counting on a near-clique is
    inherently Θ(n³) — no orientation trick saves it. Thresholding keeps
    the graph sparse (109k vs 453k edges at sf0.1) while the gate-SF
    result is unchanged (at sf0.01 every co-supply pair already clears the
    floor). Real deployments pick the weight floor the analysis wants;
    the plan shape is identical."""
    su = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = su.withColumnsRenamed({"l_suppkey": "src"})
    b = su.withColumnsRenamed({"l_suppkey": "dst"})
    edges = (
        a.join(b, (a.l_orderkey == b.l_orderkey) & (F.col("src") < F.col("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_w"))
        .filter(F.col("_w") >= 4)
        .select("src", "dst")
    )
    edges = _pin(edges)  # scanned three times by the triangle join + counts
    e1 = edges
    e2 = edges.withColumnsRenamed({"src": "mid", "dst": "dst2"})
    e3 = edges.withColumnsRenamed({"src": "src3", "dst": "dst3"})
    tri = (
        e1.join(e2, e1.dst == e2.mid)
        .join(e3, (F.col("src3") == e1.src) & (F.col("dst3") == F.col("dst2")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        (F.countDistinct("src") + F.countDistinct("dst")).alias(
            "node_endpoint_kinds"
        ),
    )
    return counts.crossJoin(tri)


def _sql_lpa_iter(prev: str, out: str) -> str:
    """One synchronous label-propagation round as SQL CTEs: neighbor-label
    counts, then per-node argmax with smallest-label tie-break."""
    return f"""
    c_{out} AS (
      SELECT e.src, l.label, count(*) AS c
      FROM edges e JOIN {prev} l ON l.node = e.dst
      GROUP BY e.src, l.label
    ),
    {out} AS (
      SELECT src AS node, label FROM (
        SELECT src, label,
               row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
        FROM c_{out}) ranked
      WHERE rn = 1
    )"""


@register(
    "label_propagation_communities",
    f"""
    WITH su AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    e0 AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM su a JOIN su b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {_sql_lpa_iter("l0", "l1")},
    {_sql_lpa_iter("l1", "l2")}
    SELECT node, label AS community FROM l2
    """,
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-supply graph by two rounds of
    deterministic synchronous label propagation (argmax neighbor label,
    min-label tie-break). The oracle unrolls both rounds as SQL CTEs —
    pinning the count/argmax semantics per round, not just the final
    partition. See operators/graph.label_propagation for the per-round
    shuffle shape."""
    from storm_data_etl_spark.operators.graph import label_propagation

    su = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    a = su.withColumnsRenamed({"l_suppkey": "src"})
    b = su.withColumnsRenamed({"l_suppkey": "dst"})
    edges = (
        a.join(b, (a.l_orderkey == b.l_orderkey) & (F.col("src") < F.col("dst")))
        .select("src", "dst")
        .distinct()
    )
    return label_propagation(edges, iterations=2).select(
        "node", F.col("label").alias("community")
    )


@register(
    "kcore_decomposition",
    """
    WITH slot AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
      FROM events
    ),
    w AS (
      SELECT a.user_id AS src, b.user_id AS dst
      FROM slot a JOIN slot b
        ON a.event_type = b.event_type AND a.h = b.h AND a.user_id < b.user_id
      GROUP BY 1, 2 HAVING count(*) >= 3
    ),
    e0 AS (SELECT src, dst FROM w UNION SELECT dst, src FROM w),
    d1 AS (SELECT src, count(*) AS c FROM e0 GROUP BY src),
    k1 AS (SELECT src FROM d1 WHERE c >= 15),
    e1 AS (SELECT e.src, e.dst FROM e0 e
           JOIN k1 a ON a.src = e.src JOIN k1 b ON b.src = e.dst),
    d2 AS (SELECT src, count(*) AS c FROM e1 GROUP BY src),
    k2 AS (SELECT src FROM d2 WHERE c >= 15),
    e2 AS (SELECT e.src, e.dst FROM e1 e
           JOIN k2 a ON a.src = e.src JOIN k2 b ON b.src = e.dst),
    d3 AS (SELECT src, count(*) AS c FROM e2 GROUP BY src)
    SELECT src AS node, c AS degree FROM d3 WHERE c >= 15
    """,
)
def kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-core of the user co-activity graph (users linked when they share
    ≥3 distinct (event_type, hour) activity slots): two rounds of degree
    peeling — the cohesion primitive behind dense-community extraction
    and bot-ring detection. The oracle unrolls the same two peeling
    rounds as CTEs, pinning per-round degree/restriction semantics. The
    slot projection keeps the pair join sparse (slots fan out ~users per
    slot, not all-pairs); see operators/graph.kcore for the per-round
    shuffle shape."""
    from storm_data_etl_spark.operators.graph import kcore

    ev = t(spark, sf_dir, "events")
    slot = ev.select(
        "user_id", "event_type", F.date_trunc("hour", "ts_utc").alias("h")
    ).distinct()
    a = slot.select(
        F.col("user_id").alias("src"), "event_type", F.col("h")
    )
    b = slot.select(
        F.col("user_id").alias("dst"),
        F.col("event_type").alias("et_b"),
        F.col("h").alias("h_b"),
    )
    edges = (
        a.join(
            b,
            (F.col("event_type") == F.col("et_b"))
            & (F.col("h") == F.col("h_b"))
            & (F.col("src") < F.col("dst")),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 3)
        .select("src", "dst")
    )
    return kcore(edges, k=15, rounds=2)


# =====================================================================
# Table profiling (per-column data-quality summary)
# =====================================================================

@register(
    "table_profile",
    """
    SELECT 'l_quantity' AS col, count(*) AS n,
           count(*) - count(l_quantity) AS n_null,
           count(DISTINCT l_quantity) AS n_distinct,
           printf('%.2f', min(l_quantity)) AS min_s,
           printf('%.2f', max(l_quantity)) AS max_s
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           count(*) - count(l_extendedprice),
           count(DISTINCT l_extendedprice),
           printf('%.2f', min(l_extendedprice)),
           printf('%.2f', max(l_extendedprice))
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           count(*) - count(l_discount),
           count(DISTINCT l_discount),
           printf('%.2f', min(l_discount)),
           printf('%.2f', max(l_discount))
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*),
           count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', count(*),
           count(*) - count(l_shipdate),
           count(DISTINCT l_shipdate),
           strftime(min(l_shipdate), '%Y-%m-%d'),
           strftime(max(l_shipdate), '%Y-%m-%d')
    FROM lineitem
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (row count, nulls, distincts,
    min/max) — the lake profiling pass every ingestion job runs. All five
    column summaries compute in ONE scan: Spark evaluates the aggregates
    together and the stack into (col, stats) rows happens after the
    aggregate, so profiling N columns costs one pass, not N (the
    UNION-ALL oracle shape would rescan per column)."""
    li = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nn"),
            F.countDistinct(c).alias(f"{c}_nd"),
            F.format_string("%.2f", F.min(c)).alias(f"{c}_mn"),
            F.format_string("%.2f", F.max(c)).alias(f"{c}_mx"),
        ]
    aggs += [
        (F.count(F.lit(1)) - F.count("l_returnflag")).alias("l_returnflag_nn"),
        F.countDistinct("l_returnflag").alias("l_returnflag_nd"),
        F.min("l_returnflag").alias("l_returnflag_mn"),
        F.max("l_returnflag").alias("l_returnflag_mx"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("l_shipdate_nn"),
        F.countDistinct("l_shipdate").alias("l_shipdate_nd"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("l_shipdate_mn"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("l_shipdate_mx"),
    ]
    wide = li.agg(*aggs)
    all_cols = cols + ["l_returnflag", "l_shipdate"]
    stack_args = ", ".join(
        f"'{c}', {c}_nn, {c}_nd, {c}_mn, {c}_mx" for c in all_cols
    )
    return wide.selectExpr(
        f"stack({len(all_cols)}, {stack_args}) AS (col, n_null, n_distinct, min_s, max_s)",
        "_n AS n",
    ).select("col", "n", "n_null", "n_distinct", "min_s", "max_s")


# =====================================================================
# Recursive CTE (Spark 4 WITH RECURSIVE — iterative closure inside ONE
# declarative query, no driver-side loop)
# =====================================================================

@register(
    "recursive_digit_hierarchy",
    """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS part, p_partkey AS node, 0 AS depth FROM part
      UNION ALL
      SELECT part, node // 10, depth + 1 FROM anc WHERE node >= 10
    )
    SELECT depth, count(*) AS n,
           CAST(sum(node) AS BIGINT) AS node_sum
    FROM anc GROUP BY depth
    """,
)
def recursive_digit_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy walk via Spark 4's native WITH RECURSIVE: every part key
    climbs its decimal-digit parent chain (part → part div 10 → … → root
    digit) — the BOM-explosion / org-chart / category-rollup shape that
    previously needed a driver-side loop (operators/graph.py unrolls fixed
    rounds; connected_components iterates in Python). The recursion is
    bounded by the key's digit count, executes as iterated DataFrame steps
    inside one plan, and aggregates per level. The DuckDB oracle is the
    SAME recursive SQL (`//` is integer division in both dialects here via
    explicit DIV on the Spark side)."""
    t(spark, sf_dir, "part").createOrReplaceTempView("_rec_part")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
          SELECT p_partkey AS part, p_partkey AS node, 0 AS depth
          FROM _rec_part
          UNION ALL
          SELECT part, node DIV 10, depth + 1 FROM anc WHERE node >= 10
        )
        SELECT depth, count(*) AS n,
               CAST(sum(node) AS BIGINT) AS node_sum
        FROM anc GROUP BY depth
        """
    )


# =====================================================================
# SQL UDF (CREATE FUNCTION ... RETURN expr — declarative scalar
# extension that inlines into codegen, unlike Python UDFs)
# =====================================================================

@register(
    "sql_udf_value_bands",
    """
    WITH banded AS (
      SELECT CASE WHEN "value" < 0 THEN 'negative'
                  WHEN "value" < 100 THEN 'low'
                  WHEN "value" < 500 THEN 'mid'
                  ELSE 'high' END AS band,
             event_type, "value"
      FROM events
    )
    SELECT band, event_type, count(*) AS n,
           CAST(floor(100 * CAST(sum(CAST("value" AS DECIMAL(18,2)))
                AS DOUBLE)) AS BIGINT) AS sum_value_e2
    FROM banded GROUP BY band, event_type
    """,
)
def sql_udf_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar extension via a SQL-defined UDF (Spark 4 CREATE FUNCTION ...
    RETURN <expr>): the banding rule is declared once as a reusable
    function, and — unlike a Python UDF — Catalyst inlines its body into
    the plan, so the query stays whole-stage-codegen with zero
    serialization boundary (tools/explain_check.py pins the absence of a
    Python eval node). The oracle states the inlined CASE directly."""
    ev = t(spark, sf_dir, "events")
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS value_band")
    spark.sql(
        """
        CREATE TEMPORARY FUNCTION value_band(v DOUBLE) RETURNS STRING
        RETURN CASE WHEN v < 0 THEN 'negative'
                    WHEN v < 100 THEN 'low'
                    WHEN v < 500 THEN 'mid'
                    ELSE 'high' END
        """
    )
    ev.createOrReplaceTempView("_udf_events")
    return spark.sql(
        """
        SELECT value_band(value) AS band, event_type, count(*) AS n,
               CAST(floor(100 * CAST(sum(CAST(value AS DECIMAL(18,2)))
                    AS DOUBLE)) AS BIGINT) AS sum_value_e2
        FROM _udf_events GROUP BY value_band(value), event_type
        """
    )


# =====================================================================
# Declarative data-quality constraint audit (expectation checks)
# =====================================================================

@register(
    "constraint_audit",
    """
    WITH checks AS (
      SELECT 'orders_totalprice_positive' AS check_name,
             count(*) FILTER (WHERE o_totalprice <= 0) AS n_violations,
             count(*) AS n_rows
      FROM orders
      UNION ALL
      SELECT 'lineitem_quantity_range',
             count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50),
             count(*)
      FROM lineitem
      UNION ALL
      SELECT 'customer_key_unique',
             count(*) - count(DISTINCT c_custkey),
             count(*)
      FROM customer
      UNION ALL
      SELECT 'events_value_null_rate_le_5pct',
             CASE WHEN 100 * count(*) FILTER (WHERE "value" IS NULL)
                       > 5 * count(*)
                  THEN count(*) FILTER (WHERE "value" IS NULL) ELSE 0 END,
             count(*)
      FROM events
      UNION ALL
      SELECT 'documents_text_nonempty',
             count(*) FILTER (WHERE text IS NULL OR length(text) = 0),
             count(*)
      FROM documents
    )
    SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_rows AS BIGINT) AS n_rows,
           n_violations = 0 AS passed
    FROM checks
    """,
)
def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation audit — the pre-publish gate every curated
    dataset release runs (the great-expectations / dbt-test pattern): each
    declared constraint (range, uniqueness, null-rate budget, non-empty
    payload) evaluates to one row of (violations, total, passed). All
    checks on one table fuse into a single conditional-aggregate scan —
    adding expectations costs columns, not passes; tables audit in
    parallel and the result is five rows regardless of input size.

    The null-rate check shows budgeted (threshold) form: it reports
    violations only when nulls exceed 5% of rows (clean testdata passes; the null-injected audit twin at ~8% trips it) — rate checks at 100 TB
    must stay aggregate-side, never per-row materialized."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")
    docs = t(spark, sf_dir, "documents")

    def one(df: DataFrame, name: str, violation: Column) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.when(violation, 1)).alias("n_violations"),
            F.count(F.lit(1)).alias("n_rows"),
        )

    nulls = F.count(F.when(F.col("value").isNull(), 1))
    total = F.count(F.lit(1))
    ev_check = ev.agg(
        F.lit("events_value_null_rate_le_5pct").alias("check_name"),
        F.when(100 * nulls > 5 * total, nulls).otherwise(F.lit(0)).alias(
            "n_violations"
        ),
        total.alias("n_rows"),
    )
    audits = (
        one(o, "orders_totalprice_positive", F.col("o_totalprice") <= 0)
        .unionByName(
            one(
                li,
                "lineitem_quantity_range",
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            )
        )
        .unionByName(
            c.agg(
                F.lit("customer_key_unique").alias("check_name"),
                (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias(
                    "n_violations"
                ),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        .unionByName(ev_check)
        .unionByName(
            one(
                docs,
                "documents_text_nonempty",
                F.col("text").isNull() | (F.length("text") == 0),
            )
        )
    )
    return audits.select(
        "check_name",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    )


# =====================================================================
# Record linkage (Fellegi-Sunter-style blocked match scoring)
# =====================================================================

@register(
    "entity_match_scores",
    """
    WITH crm AS (
      SELECT c_custkey + 1000000 AS crm_id, c_custkey AS src_key,
             CASE WHEN c_custkey % 4 = 0
                  THEN 'Cust' || substring(c_name, 9) ELSE c_name END AS name,
             c_nationkey AS nationkey,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.01
                  ELSE c_acctbal END AS acctbal,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE c_mktsegment END AS mktsegment
      FROM customer
    ),
    pairs AS (
      SELECT c.c_custkey, m.crm_id, m.src_key,
             (CASE WHEN c.c_name = m.name THEN 24 ELSE -8 END)
           + (CASE WHEN abs(c.c_acctbal - m.acctbal) <= 0.005 THEN 16
                   ELSE -4 END)
           + (CASE WHEN m.mktsegment IS NULL THEN 0
                   WHEN c.c_mktsegment = m.mktsegment THEN 12
                   ELSE -12 END) AS score
      FROM customer c JOIN crm m
        ON c.c_nationkey = m.nationkey
       AND substring(c.c_name, length(c.c_name) - 3) =
           substring(m.name, length(m.name) - 3)
    ),
    classified AS (
      SELECT *,
             CASE WHEN score >= 30 THEN 'match'
                  WHEN score >= 10 THEN 'possible'
                  ELSE 'non_match' END AS decision,
             (c_custkey = src_key) AS is_true_pair
      FROM pairs
    )
    SELECT decision, count(*) AS n_pairs,
           CAST(sum(CASE WHEN is_true_pair THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_entity,
           min(score) AS min_score, max(score) AS max_score
    FROM classified GROUP BY decision
    """,
)
def entity_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage — the entity-resolution capability class dedup does
    not cover (dedup asks "same text?", linkage asks "same real-world
    entity despite field-level corruption?"). Fellegi-Sunter shape:
    block candidate pairs (nation + name digit-suffix — never a cross
    join), score each pair as a sum of per-field agreement weights
    (integer log-odds: exact name +24/−8, balance within tolerance
    +16/−4, segment +12/−12 with missing-field neutrality), classify by
    two thresholds into match / possible / non_match. The "CRM" side is
    a deterministic corruption of customer (truncated names for key%4,
    drifted balances for key%5, missing segment for key%7), so the oracle
    predicts every score and the true-entity recall exactly.

    Scale shape: one equi-join on the blocking key (uniform buckets by
    construction — the digit suffix spreads keys), narrow integer
    scoring, tiny per-decision aggregate. Real deployments swap the
    corruption CTE for their second source and learn the weights; the
    plan is unchanged."""
    c = t(spark, sf_dir, "customer")
    crm = c.select(
        (F.col("c_custkey") + 1_000_000).alias("crm_id"),
        F.col("c_custkey").alias("src_key"),
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(F.lit("Cust"), F.expr("substring(c_name, 9)")),
        )
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 0.01)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("mktsegment"),
    )
    suffix = lambda col: F.expr(f"substring({col}, length({col}) - 3)")  # noqa: E731
    pairs = c.join(
        crm,
        (c["c_nationkey"] == crm["nationkey"])
        & (suffix("c_name") == suffix("name")),
    )
    score = (
        F.when(F.col("c_name") == F.col("name"), 24).otherwise(-8)
        + F.when(F.abs(F.col("c_acctbal") - F.col("acctbal")) <= 0.005, 16).otherwise(-4)
        + F.when(F.col("mktsegment").isNull(), 0)
        .when(F.col("c_mktsegment") == F.col("mktsegment"), 12)
        .otherwise(-12)
    )
    classified = pairs.select(
        score.alias("score"),
        (F.col("c_custkey") == F.col("src_key")).alias("is_true_pair"),
    ).withColumn(
        "decision",
        F.when(F.col("score") >= 30, "match")
        .when(F.col("score") >= 10, "possible")
        .otherwise("non_match"),
    )
    return classified.groupBy("decision").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("is_true_pair"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_entity"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


# =====================================================================
# Snapshot diff (what changed between two corpus/table versions)
# =====================================================================

@register(
    "corpus_snapshot_diff",
    """
    WITH base AS (SELECT doc_id, n_chars FROM documents),
    v1 AS (SELECT * FROM base WHERE doc_id % 7 <> 0),
    v2 AS (SELECT * FROM base WHERE doc_id % 13 <> 0),
    diff AS (
      SELECT coalesce(v2.doc_id, v1.doc_id) AS doc_id,
             coalesce(v2.n_chars, v1.n_chars) AS n_chars,
             CASE
               WHEN v1.doc_id IS NULL THEN 'added'
               WHEN v2.doc_id IS NULL THEN 'removed'
               WHEN coalesce(v2.doc_id, v1.doc_id) % 11 = 0 THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT status, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM diff GROUP BY status
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions — the audit every dataset
    release runs ("what changed since the last crawl?"): added / removed /
    changed / unchanged document counts with their char volumes. Versions
    are simulated deterministically from the one documents table (v1 drops
    multiples of 7, v2 drops multiples of 13, multiples of 11 count as
    content-changed), so the oracle is exact; a real deployment feeds two
    parquet snapshot paths into the same plan.

    Scale shape: ONE full-outer shuffle join on the primary key — both
    snapshot scans hash-partition on doc_id and co-locate, then the diff
    classification is a narrow projection into a tiny aggregate. With
    bucketed snapshots (sources/parquet.write_bucketed on doc_id) the
    exchange disappears entirely."""
    base = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    v1 = base.filter(F.col("doc_id") % 7 != 0).withColumnsRenamed(
        {"doc_id": "id1", "n_chars": "c1"}
    )
    v2 = base.filter(F.col("doc_id") % 13 != 0).withColumnsRenamed(
        {"doc_id": "id2", "n_chars": "c2"}
    )
    diff = v1.join(v2, v1.id1 == v2.id2, "full_outer").select(
        F.coalesce("id2", "id1").alias("doc_id"),
        F.coalesce("c2", "c1").alias("n_chars"),
        F.when(F.col("id1").isNull(), F.lit("added"))
        .when(F.col("id2").isNull(), F.lit("removed"))
        .when(F.coalesce("id2", "id1") % 11 == 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# =====================================================================
# SCD Type 2 (slowly-changing-dimension history from a changelog)
# =====================================================================

@register(
    "scd2_dimension_history",
    """
    WITH log AS (
      SELECT o_custkey, o_orderstatus AS status, o_orderdate AS ts, o_orderkey
      FROM orders WHERE o_custkey < 200
    ),
    changes AS (
      SELECT * FROM (
        SELECT o_custkey, status, ts, o_orderkey,
               lag(status) OVER w AS prev_status
        FROM log WINDOW w AS (PARTITION BY o_custkey ORDER BY ts, o_orderkey)
      ) WHERE prev_status IS NULL OR status <> prev_status
    ),
    versions AS (
      SELECT o_custkey, status, ts AS eff_from,
             lead(ts) OVER (PARTITION BY o_custkey
                            ORDER BY ts, o_orderkey) AS eff_to
      FROM changes
    )
    SELECT o_custkey,
           count(*) AS n_versions,
           CAST(sum(CASE WHEN eff_to IS NULL THEN 0
                         ELSE date_diff('day', eff_from, eff_to) END) AS BIGINT)
             AS closed_days,
           max(CASE WHEN eff_to IS NULL THEN status END) AS current_status
    FROM versions GROUP BY o_custkey
    """,
)
def scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build: collapse an order changelog
    into status VERSIONS — consecutive identical statuses merge, each
    surviving change opens an effective-dated row [eff_from, eff_to), the
    live version stays open-ended — then summarize per key (version count,
    closed-interval days, current status). This is the warehouse-dimension
    maintenance pattern the CDC family lacked: cdc_upsert_merge keeps only
    the LATEST row; SCD2 keeps the full effective-dated history.

    Plan: ONE shuffle on the dimension key serves both stacked windows
    (change detection lag + interval lead share key and order) and the
    final per-key aggregate. At 100 TB the changelog shuffle is
    proportional to changed rows, and the history table appends only
    closed/opened versions — the same touch-the-delta economics as
    incremental_agg_maintenance."""
    log = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("ts"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("ts", "o_orderkey")
    changes = log.withColumn("prev_status", F.lag("status").over(w)).filter(
        F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status"))
    )
    versions = changes.select(
        "o_custkey",
        "status",
        F.col("ts").alias("eff_from"),
        F.lead("ts").over(w).alias("eff_to"),
    )
    closed_days = F.when(F.col("eff_to").isNull(), 0).otherwise(
        F.datediff("eff_to", "eff_from")
    )
    return versions.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(closed_days).alias("closed_days"),
        F.max(F.when(F.col("eff_to").isNull(), F.col("status"))).alias(
            "current_status"
        ),
    )


# =====================================================================
# Key-skew profile (the diagnostic that decides salting / AQE strategy)
# =====================================================================

@register(
    "key_skew_profile",
    """
    WITH sizes AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_keys,
           CAST(sum(c) AS BIGINT) AS n_rows,
           max(c) AS max_rows,
           CAST(floor(100.0 * max(c) * count(*) / sum(c)) AS BIGINT)
             AS hotness_pct_of_uniform_e2,
           CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_rows,
           CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_rows,
           min(user_id) FILTER (WHERE c = (SELECT max(c) FROM sizes))
             AS hottest_key
    FROM sizes
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per-key row counts summarized as the
    distribution a partitioning decision actually needs — key count, max
    group size, the hottest key's share relative to uniform (100 = exactly
    uniform; 10_000 = one key holds 100 keys' worth), and discrete p50/p99
    group sizes. This is the report that decides between plain hash
    partitioning, AQE skew-join splitting, and explicit salting
    (operators/skew.py) BEFORE a 100 TB job burns a day discovering its
    hot key. Two tiny aggregates; the per-key count is map-side partial.

    quantile_disc (exact discrete quantile = element at ceil(q·n)) is used
    rather than interpolated percentiles so every output is an exact
    integer — hash-stable by construction."""
    ev = t(spark, sf_dir, "events")
    # Optimization r12 (guide §2.4): the per-key count table feeds three
    # consumers (hottest max, hot-key argmin, summary) — each re-ran the
    # events-wide grouping. pin() is query-scoped (released by the
    # harness's release_pinned), so the old "recompute beats a
    # session-lifetime cache" trade no longer applies.
    sizes = _pin(ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")))
    hottest = sizes.agg(F.max("c").alias("maxc"))
    hot_key = (
        sizes.join(F.broadcast(hottest), sizes["c"] == hottest["maxc"])
        .agg(F.min("user_id").alias("hottest_key"))
    )
    summary = sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_rows"),
        F.floor(100.0 * F.max("c") * F.count(F.lit(1)) / F.sum("c"))
        .cast("bigint")
        .alias("hotness_pct_of_uniform_e2"),
        # percentile_approx is EXACT (= the discrete quantile element) when
        # accuracy >= n; n_keys ≈ 150 — pinned by tests/test_operators.py::
        # test_percentile_approx_exact_at_high_accuracy.
        F.percentile_approx("c", F.lit(0.5), F.lit(1000000)).alias("p50_rows"),
        F.percentile_approx("c", F.lit(0.99), F.lit(1000000)).alias("p99_rows"),
    )
    return summary.crossJoin(F.broadcast(hot_key)).select(
        "n_keys", "n_rows", "max_rows", "hotness_pct_of_uniform_e2",
        F.col("p50_rows").cast("bigint").alias("p50_rows"),
        F.col("p99_rows").cast("bigint").alias("p99_rows"),
        "hottest_key",
    )


# =====================================================================
# Referential-integrity audit (multi-FK orphan counts in one pass)
# =====================================================================

@register(
    "fk_integrity_audit",
    """
    SELECT
      (SELECT count(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey))
        AS lineitem_orphans,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey))
        AS order_orphans,
      (SELECT count(*) FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_nationkey = c.c_nationkey))
        AS customer_orphans,
      (SELECT count(*) FROM supplier s
       WHERE NOT EXISTS (SELECT 1 FROM nation n
                         WHERE n.n_nationkey = s.s_nationkey))
        AS supplier_orphans
    """,
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema in one
    result row: orphan counts for every foreign-key edge (fact→orders→
    customer→nation, supplier→nation) via left-anti joins. The
    generalization of the reference's key-existence check (SURVEY §2.5 J1,
    cmd/validate/main.go:298-313) from one CSV↔JSON pair to an arbitrary
    schema graph — the data-quality gate a lake runs after every load.
    Each anti-join broadcasts its dimension side; counts compose into one
    row with no shuffle larger than the fact scan."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey")

    def orphans(child, key, parent, pkey, alias):
        return (
            child.join(
                F.broadcast(parent), child[key] == parent[pkey], "left_anti"
            )
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a = orphans(li, "l_orderkey", o.select("o_orderkey"), "o_orderkey", "lineitem_orphans")
    b = orphans(o, "o_custkey", c.select("c_custkey"), "c_custkey", "order_orphans")
    d = orphans(c, "c_nationkey", n, "n_nationkey", "customer_orphans")
    e = orphans(s, "s_nationkey", n, "n_nationkey", "supplier_orphans")
    return a.crossJoin(b).crossJoin(d).crossJoin(e)


# =====================================================================
# Bucketed co-located join (ZERO-exchange repeated joins — the layout
# investment a 100 TB lake makes for its dominant join key)
# =====================================================================

@register(
    "bucketed_colocated_join",
    """
    SELECT o.o_orderpriority, count(*) AS n_items,
           CAST(floor(100 * CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                AS DOUBLE)) AS BIGINT) AS revenue_e2
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact⋈orders join executed over BUCKETED table layouts: both
    sides materialized once with bucketBy(orderkey) into the session
    warehouse (lazily, per sf_dir), after which the sort-merge join runs
    with ZERO exchange on either side — the co-location investment a lake
    makes when one join key dominates its workload, converting every
    subsequent join on that key from a full shuffle into a local merge.
    The MERGE hint pins sort-merge (a broadcast would mask the
    demonstration at test scale); tools/explain_check.py asserts no
    Exchange feeds the join. Results are identical to the plain join —
    the oracle doesn't know or care about layout."""
    import shutil

    from storm_data_etl_spark.sources.parquet import read_bucketed, write_bucketed

    import hashlib

    # Key the cached tables on the RESOLVED directory, not its basename:
    # two different datasets named sf0.001 must not reuse each other's
    # buckets. (Cross-process races on the shared warehouse remain out of
    # scope — the harness runs its tools sequentially.)
    tag = hashlib.sha1(
        os.path.realpath(sf_dir).encode()
    ).hexdigest()[:12]
    li_tbl, o_tbl = f"li_bkt_{tag}", f"o_bkt_{tag}"

    def _clear_stale(table: str) -> None:
        # The warehouse directory outlives the session catalog: a previous
        # process may have left table files that the fresh in-memory catalog
        # doesn't know, and saveAsTable refuses the occupied location.
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "/tmp/spark-graft-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(wh, table), ignore_errors=True)

    if not spark.catalog.tableExists(li_tbl):
        _clear_stale(li_tbl)
        write_bucketed(
            t(spark, sf_dir, "lineitem").select(
                "l_orderkey", F.col("l_extendedprice").cast("decimal(18,2)").alias("price")
            ),
            li_tbl,
            ["l_orderkey"],
            n_buckets=8,
            sort_cols=["l_orderkey"],
        )
    if not spark.catalog.tableExists(o_tbl):
        _clear_stale(o_tbl)
        write_bucketed(
            t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            o_tbl,
            ["o_orderkey"],
            n_buckets=8,
            sort_cols=["o_orderkey"],
        )
    li = read_bucketed(spark, li_tbl)
    o = read_bucketed(spark, o_tbl).hint("merge")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.floor(100 * F.sum("price").cast("double"))
            .cast("bigint")
            .alias("revenue_e2"),
        )
    )


# =====================================================================
# Small-file compaction planning (Delta OPTIMIZE / Iceberg rewrite-style
# bin packing — public lakehouse maintenance pattern)
# =====================================================================

_COMPACT_TARGET = 64 * 1024  # target output size (bytes) per compacted file


@register(
    "compaction_plan",
    f"""
    WITH files AS (
      SELECT event_type,
             epoch(date_trunc('hour', ts)) // 3600 AS file_hour,
             count(*) * 128 AS size_bytes
      FROM events GROUP BY 1, 2
    ),
    planned AS (
      SELECT event_type, file_hour, size_bytes,
             coalesce(sum(size_bytes) OVER (
               PARTITION BY event_type ORDER BY file_hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // {_COMPACT_TARGET} AS bin_id
      FROM files
    )
    SELECT event_type, CAST(bin_id AS BIGINT) AS bin_id,
           count(*) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           CAST(min(file_hour) AS BIGINT) AS first_hour,
           CAST(max(file_hour) AS BIGINT) AS last_hour
    FROM planned GROUP BY event_type, bin_id
    """,
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan small-file compaction for a partitioned lake table: simulate
    the file listing (one file per (event_type, ingest hour), sized by its
    row count), then bin-pack files into ≈64 KiB output groups with the
    streaming next-fit rule every lakehouse optimizer uses — files sorted
    by hour within partition, exclusive running size // target = bin id.
    Emits the rewrite manifest: per (partition, bin) the file count, byte
    total, and covered hour range.

    Scale shape: compaction planning is METADATA-only — the input is one
    row per data file (millions of rows for a 100 TB table, not the table
    itself), the window and aggregate both shuffle on the partition
    column, and the bin assignment is a single pass. The actual rewrite
    would be issued per-bin from this manifest. Mirrors Delta OPTIMIZE /
    Iceberg RewriteDataFiles semantics (public docs), reference has no
    lake-maintenance surface (extension op)."""
    ev = t(spark, sf_dir, "events")
    files = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp(F.date_trunc("hour", F.col("ts_utc"))) / 3600)
        .alias("file_hour"),
    ).agg((F.count(F.lit(1)) * 128).alias("size_bytes"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("file_hour")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("size_bytes").over(w), F.lit(0)) / _COMPACT_TARGET),
    )
    return planned.groupBy("event_type", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
        F.min("file_hour").alias("first_hour"),
        F.max("file_hour").alias("last_hour"),
    )


_H_X = '((CAST(floor("value" * 100) AS BIGINT) % 65536 + 65536) % 65536)'
_H_Y = "(user_id % 65536)"


@register(
    "hilbert_curve_stats",
    f"""
    WITH h AS (
      SELECT event_type,
             {hilbert_index_sql(_H_X, _H_Y, 16)} AS hval
      FROM events WHERE "value" IS NOT NULL
    )
    SELECT event_type, count(*) AS n_rows,
           min(hval) AS h_min, max(hval) AS h_max,
           CAST(sum(hval) AS BIGINT) AS h_sum
    FROM h GROUP BY event_type
    """,
)
def hilbert_curve_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve positions for the (value, user) grid — the
    locality-better alternative to the Morton layout (zorder_curve_stats):
    adjacent curve positions are always adjacent cells, so a
    Hilbert-sorted lake's file envelopes are tighter for box queries.
    The curve is a pure-integer bit-level fold (functions/zorder.py
    hilbert_index); the oracle replays the identical fold via
    list_reduce, pinning every reflect/swap rotation bit-for-bit."""
    from storm_data_etl_spark.functions.zorder import hilbert_index

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.pmod(F.floor(F.col("value") * 100).cast("bigint"), F.lit(65536))
    y = F.col("user_id") % 65536
    h = hilbert_index(x, y, 16)
    return (
        ev.select("event_type", h.alias("hval"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("hval").alias("h_min"),
            F.max("hval").alias("h_max"),
            F.sum("hval").alias("h_sum"),
        )
    )


# =====================================================================
# Snapshot retention (time-travel expiry) planning
# =====================================================================

@register(
    "snapshot_retention_plan",
    """
    WITH v AS (
      SELECT event_id % 200 AS file_id,
             epoch_us(ts) * 1000 AS ts_ns,
             event_id,
             100 + event_id % 900 AS size_bytes
      FROM events
    ),
    cutoff AS (
      SELECT max(ts_ns) - CAST(604800 AS BIGINT) * 1000000000 AS keep_after FROM v
    ),
    marked AS (
      SELECT file_id, ts_ns, size_bytes,
             row_number() OVER (PARTITION BY file_id
                                ORDER BY ts_ns DESC, event_id DESC) AS rn,
             keep_after
      FROM v, cutoff
    )
    SELECT file_id,
           count(*) AS n_versions,
           CAST(sum(CASE WHEN rn = 1 OR ts_ns >= keep_after
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(CASE WHEN rn > 1 AND ts_ns < keep_after
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_expire,
           CAST(sum(CASE WHEN rn > 1 AND ts_ns < keep_after
                         THEN size_bytes ELSE 0 END) AS BIGINT)
             AS reclaimed_bytes,
           CAST(max(ts_ns) AS BIGINT) AS latest_ts_ns
    FROM marked GROUP BY file_id
    """,
)
def snapshot_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel snapshot expiry plan (the Iceberg expire_snapshots /
    Delta VACUUM decision): each event is a committed version of one of
    200 table files; a version is retained iff it is the file's CURRENT
    version (always kept, however old — dropping it would lose data, not
    history) or it committed within the 7-day time-travel window ending
    at the table's latest commit. Emits the per-file expiry plan: version
    counts, keep/expire split, reclaimable bytes, latest commit.

    Scale shape: one shuffle on file_id serves both the currency
    row_number window and the per-file aggregate (same key); the global
    cutoff is a 1-row broadcast. A real manifest listing is exactly this
    shape with file_id = partition path. Extends the lake family
    (compaction_plan, cdc_upsert_merge) with the retention leg."""
    v = t(spark, sf_dir, "events").select(
        (F.col("event_id") % 200).alias("file_id"),
        F.col("ts_ns"),
        "event_id",
        (100 + F.col("event_id") % 900).alias("size_bytes"),
    )
    cutoff = v.agg(
        (F.max("ts_ns") - F.lit(7 * 86400 * 1_000_000_000)).alias("keep_after")
    )
    w = Window.partitionBy("file_id").orderBy(
        F.desc("ts_ns"), F.desc("event_id")
    )
    marked = v.crossJoin(F.broadcast(cutoff)).withColumn(
        "rn", F.row_number().over(w)
    )
    keep = (F.col("rn") == 1) | (F.col("ts_ns") >= F.col("keep_after"))
    return marked.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_keep"),
        F.sum((~keep).cast("int")).cast("bigint").alias("n_expire"),
        F.sum(F.when(~keep, F.col("size_bytes")).otherwise(0))
        .cast("bigint")
        .alias("reclaimed_bytes"),
        F.max("ts_ns").cast("bigint").alias("latest_ts_ns"),
    )


# =====================================================================
# Column-encoding (dictionary vs plain) planning
# =====================================================================

@register(
    "encoding_dictionary_plan",
    """
    WITH s AS (
      SELECT count(*) AS n,
             count(DISTINCT event_type) AS d_type,
             CAST(sum(length(event_type)) AS BIGINT) AS len_type,
             count(DISTINCT props) AS d_props,
             CAST(sum(length(props)) AS BIGINT) AS len_props,
             count(DISTINCT user_id) AS d_user,
             count(DISTINCT "value") AS d_value
      FROM events
    ),
    cols AS (
      SELECT 'event_type' AS column_name, n, d_type AS n_distinct,
             (100 * len_type) // nullif(n, 0) AS avg_len_e2 FROM s
      UNION ALL
      SELECT 'props', n, d_props, (100 * len_props) // nullif(n, 0) FROM s
      UNION ALL
      SELECT 'user_id', n, d_user, 800 FROM s
      UNION ALL
      SELECT 'value', n, d_value, 800 FROM s
    )
    SELECT column_name, n AS n_values, n_distinct,
           CAST((1000 * n_distinct) // nullif(n, 0) AS BIGINT) AS distinct_permille,
           CASE WHEN 20 * n_distinct < n THEN 'dictionary' ELSE 'plain' END
             AS encoding
    FROM cols
    """,
)
def encoding_dictionary_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding planner — the Parquet writer's dictionary-vs-plain
    decision surfaced as a query: per column, exact cardinality and mean
    width, recommending dictionary encoding when the distinct ratio is
    under 5% (the point where a dictionary page beats plain pages).
    Numeric columns report their fixed 8-byte width. This is the profile
    a lake compaction service computes before rewriting files.

    Scale shape: ONE scan computes every column's count-distinct in a
    single multi-distinct aggregate (Catalyst expands to one
    shuffle-per-distinct over partial states — at 100 TB switch the exact
    counts to approx_count_distinct, same plan minus the expand; the
    exact form IS the oracle here), then a 4-row literal unpivot.
    Complements compaction_plan (file sizing) with encoding choice."""
    ev = t(spark, sf_dir, "events")
    s = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_type").alias("d_type"),
        F.sum(F.length("event_type")).cast("bigint").alias("len_type"),
        F.countDistinct("props").alias("d_props"),
        F.sum(F.length("props")).cast("bigint").alias("len_props"),
        F.countDistinct("user_id").alias("d_user"),
        F.countDistinct("value").alias("d_value"),
    )
    # Optimization r12 (guide §2.4): the four union legs each re-ran the
    # whole multi-distinct aggregate (the expensive expand) — a stack()
    # unpivot of the single aggregate row produces the same four rows
    # from ONE evaluation (the table_profile shape). Same integers.
    cols = s.selectExpr(
        "stack(4, 'event_type', d_type, 'props', d_props,"
        " 'user_id', d_user, 'value', d_value)"
        " AS (column_name, n_distinct)",
        "n",
    )
    return cols.select(
        "column_name",
        F.col("n").alias("n_values"),
        "n_distinct",
        # nullif guard: an empty table has n = 0 and no meaningful ratio
        F.expr("(1000 * n_distinct) div nullif(n, 0)").cast("bigint").alias(
            "distinct_permille"
        ),
        F.when(20 * F.col("n_distinct") < F.col("n"), "dictionary")
        .otherwise("plain")
        .alias("encoding"),
    )


# =====================================================================
# Partition-statistics pruning plan (data skipping audit)
# =====================================================================

@register(
    "partition_pruning_plan",
    """
    WITH keyed AS (
      SELECT 'time' AS layout,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS file_id,
             "value"
      FROM events
      UNION ALL
      SELECT 'value', least(19, CAST(floor("value" / 5) AS BIGINT)), "value"
      FROM events
    ),
    part_stats AS (
      SELECT layout, file_id,
             count(*) AS n_rows,
             CAST(min(floor("value" * 100)) AS BIGINT) AS vmin_cents,
             CAST(max(floor("value" * 100)) AS BIGINT) AS vmax_cents,
             CAST(sum(CASE WHEN "value" >= 95.0 AND "value" <= 99.5
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_match
      FROM keyed GROUP BY layout, file_id
    )
    SELECT layout, file_id, n_rows, vmin_cents, vmax_cents, n_match,
           NOT (vmax_cents < 9500 OR vmin_cents > 9950) AS scanned,
           CASE WHEN NOT (vmax_cents < 9500 OR vmin_cents > 9950)
                THEN n_rows ELSE 0 END AS rows_read
    FROM part_stats
    """,
)
def partition_pruning_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit — the min/max footer-statistics pruning decision
    (Parquet row groups / Iceberg manifests / Delta file stats) surfaced
    as a query, over TWO candidate layouts of the same table: time-
    partitioned files (one per day — every file's value range straddles
    the predicate, so min/max stats prune nothing) and value-clustered
    files (floor(value/5) buckets — stats are tight and the range
    predicate 95.00-99.50 scans only the intersecting buckets). Emits per
    (layout, file): exact integer-cent stats, the scan verdict, rows read
    if scanned, and the true match count — Σrows_read vs Σn_match per
    layout is the over-scan ratio that justifies re-clustering
    (zorder_curve_stats is the multi-column generalization).

    Scale shape: one scan feeds both layouts via a 2x row expansion (the
    layout key is arithmetic), one map-side-partial agg to ~50 stat rows
    — a real manifest is already this small; the verdict is pure
    arithmetic. Nothing shuffles wide."""
    ev = t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts_utc"), F.lit("1970-01-01")).alias("day_num"),
        "value",
    )
    keyed = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("time").alias("layout"),
                    F.col("day_num").cast("long").alias("file_id"),
                ),
                F.struct(
                    F.lit("value").alias("layout"),
                    F.least(
                        F.lit(19), F.floor(F.col("value") / 5).cast("long")
                    ).alias("file_id"),
                ),
            )
        ).alias("k"),
        "value",
    ).select("k.layout", "k.file_id", "value")
    stats = keyed.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.floor(F.col("value") * 100)).cast("bigint").alias("vmin_cents"),
        F.max(F.floor(F.col("value") * 100)).cast("bigint").alias("vmax_cents"),
        F.sum(
            ((F.col("value") >= 95.0) & (F.col("value") <= 99.5)).cast("int")
        )
        .cast("bigint")
        .alias("n_match"),
    )
    scanned = ~((F.col("vmax_cents") < 9500) | (F.col("vmin_cents") > 9950))
    return stats.select(
        "layout",
        "file_id",
        "n_rows",
        "vmin_cents",
        "vmax_cents",
        "n_match",
        scanned.alias("scanned"),
        F.when(scanned, F.col("n_rows")).otherwise(0).alias("rows_read"),
    )


# =====================================================================
# BFS hop-distance histogram
# =====================================================================

def _sql_bfs_iter(prev: str, out: str, h: int) -> str:
    return f"""{out} AS (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM {prev}
        UNION ALL
        SELECT e.dst AS node, {h} AS d
        FROM {prev} p JOIN edgelist e ON e.src = p.node AND p.d = {h - 1}
      ) GROUP BY node
    )"""


@register(
    "bfs_hop_histogram",
    f"""
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS s, o.o_custkey + 1000000 AS c
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    edgelist AS (
      SELECT s AS src, c AS dst FROM pairs
      UNION ALL SELECT c, s FROM pairs
    ),
    pnodes AS (
      SELECT DISTINCT src AS node FROM edgelist
    ),
    d0 AS (SELECT node, 0 AS d FROM pnodes WHERE node <= 3),
    {_sql_bfs_iter("d0", "d1", 1)},
    {_sql_bfs_iter("d1", "d2", 2)},
    {_sql_bfs_iter("d2", "d3", 3)},
    {_sql_bfs_iter("d3", "d4", 4)}
    SELECT d AS hop, count(*) AS n_nodes FROM d4 GROUP BY d
    UNION ALL
    SELECT -1, (SELECT count(*) FROM pnodes) - (SELECT count(*) FROM d4)
    """,
)
def bfs_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability profile over the supplier↔customer
    interaction graph (same edge derivation as pagerank_topk): hop
    distances 0-4 from the seed suppliers {1,2,3}, as a histogram of
    nodes first reached at each hop, plus a -1 row counting nodes not
    reached within 4 hops. The hop profile is the graph-health summary
    a feature pipeline computes before graph features (is the graph one
    giant component? how fast does a seed set saturate it?).

    The Spark plan is level-synchronous frontier BFS
    (operators/graph.bfs_layers): per round, FRONTIER⋈edges then
    anti-join visited — the oracle's unrolled min-union CTEs are the
    definitional form, proving the incremental frontier algorithm equals
    the naive full-relaxation semantics.

    Scale shape: edge list pinned once; per-round shuffles keyed on node
    id and bounded by the frontier's adjacency, not the full graph;
    localCheckpoint per round keeps the plan flat. The -1 row's global
    counts are two scalar aggregates of the pinned invariants."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 1000000).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    from storm_data_etl_spark.operators.graph import bfs_layers

    nodes = edges.select(F.col("src").alias("node")).distinct()
    nodes = _pin(nodes)
    seeds = nodes.filter(F.col("node") <= 3)
    layers = bfs_layers(edges, seeds, max_hops=4)
    hist = layers.groupBy(F.col("dist").alias("hop")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    reached = layers.agg(F.count(F.lit(1)).alias("r"))
    total = nodes.agg(F.count(F.lit(1)).alias("t"))
    unreached = (
        total.crossJoin(F.broadcast(reached))
        .select(
            F.lit(-1).alias("hop"),
            (F.col("t") - F.col("r")).cast("bigint").alias("n_nodes"),
        )
    )
    return hist.unionByName(unreached)


@register(
    "deletion_vector_read_stats",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderkey // 1000 AS file_id FROM orders
    ),
    dv AS (
      SELECT o_orderkey FROM base WHERE o_orderkey % 97 = 0
    )
    SELECT b.file_id,
           count(*) AS n_base,
           CAST(sum(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_deleted,
           CAST(sum(CASE WHEN d.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_live,
           CAST((10000 * sum(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS deleted_frac_e4,
           CASE WHEN 10 * sum(CASE WHEN d.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                     > count(*) THEN 1 ELSE 0 END AS rewrite_advised
    FROM base b LEFT JOIN dv d USING (o_orderkey)
    GROUP BY b.file_id
    """,
)
def deletion_vector_read_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read with deletion vectors (Delta Lake DV / Iceberg v2
    position deletes, public specs): reads reconcile a base file scan
    against a per-file deleted-position set WITHOUT rewriting data files.
    Simulated file layout: 1000 keys per file; the deletion vector marks
    every 97th key. Emits the table-maintenance decision row per file —
    live/deleted counts, deleted fraction, and the rewrite trigger every
    lakehouse compactor applies (rewrite once >10% of a file is dead,
    the documented Delta default family).

    Scale shape: deletion vectors are tiny relative to data (positions
    only) — the reconcile is a broadcast-able left join keyed on the
    file-local key, and the stats aggregate shuffles one row per FILE,
    not per row. The read path this models (scan minus DV anti-join) is
    exactly how the engine would serve MoR reads at 100 TB."""
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_orderkey") / 1000).cast("bigint").alias("file_id")
    )
    dv = base.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("_dk")
    ).withColumn("_deleted", F.lit(1))
    joined = base.join(
        F.broadcast(dv), base["o_orderkey"] == dv["_dk"], "left"
    )
    return joined.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_base"),
        F.sum(F.coalesce(F.col("_deleted"), F.lit(0)))
        .cast("bigint")
        .alias("n_deleted"),
        F.sum(F.when(F.col("_deleted").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_live"),
        F.expr(
            "(10000 * sum(CASE WHEN _deleted IS NOT NULL THEN 1 ELSE 0 END))"
            " div count(*)"
        )
        .cast("bigint")
        .alias("deleted_frac_e4"),
        F.when(
            10 * F.sum(F.coalesce(F.col("_deleted"), F.lit(0)))
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("rewrite_advised"),
    )


@register(
    "time_travel_read",
    """
    WITH snap AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             1 AS _version, 'I' AS _op
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2)
                  AS DECIMAL(18,2)),
             2 AS _version, 'U' AS _op
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    del AS (
      SELECT o_orderkey, 'X', CAST(0.0 AS DECIMAL(18,2)), 3 AS _version,
             'D' AS _op
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    log AS (
      SELECT * FROM snap UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM del
    ),
    versions AS (SELECT unnest([1, 2, 3]) AS as_of),
    pinned AS (
      SELECT v.as_of, l.*, row_number() OVER (
        PARTITION BY v.as_of, l.o_orderkey
        ORDER BY l._version DESC, l._op DESC) AS rn
      FROM log l JOIN versions v ON l._version <= v.as_of
    )
    SELECT as_of,
           count(*) AS n_live,
           CAST(sum(CASE WHEN o_orderstatus = 'U' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_updated,
           CAST(sum(o_totalprice) AS DOUBLE) AS total_price
    FROM pinned WHERE rn = 1 AND _op <> 'D'
    GROUP BY as_of
    """,
)
def time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over a CDC log (Delta `VERSION AS OF` / Iceberg
    snapshot reads, public specs): reconstruct the LIVE table state at
    every version — latest op per key among ops with _version ≤ as_of,
    dropping keys whose latest op is a delete — and emit the per-version
    audit row (live count, updated count, price total). The same synthetic
    insert/update/delete log as cdc_upsert_merge (which reads only the
    final state); the as-of sweep is what certifies the version-pinned
    semantics: v1 has no updates, v2 gains them, v3 loses the deleted
    keys.

    Scale shape: the log shuffles ONCE keyed by (as_of, key) for the
    latest-op window (parallel, no global sort); versions is a 3-row
    broadcast. A real reader resolves one as_of — this plan is that read
    repeated per version with the work shared in one pass."""
    # Optimization r12 (guide §2.4): all three CDC branches are
    # projections of the SAME orders row, so each key's op log builds
    # IN-ROW (an array of ≤3 op structs), the version sweep is a 3-way
    # explode, and "latest op with _version ≤ as_of" is array_max over
    # the filtered array (_version is unique per key, so the window's
    # (_version DESC, _op DESC) order reduces to max _version). The
    # union + 3× broadcast-join blowup + (as_of, key) window shuffle all
    # disappear; the only exchange left is the 3-row final aggregate.
    # Same live sets, same integers, same decimal sums.
    o = t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    ops = F.filter(
        F.array(
            F.struct(
                F.lit(1).alias("_version"),
                F.lit("I").alias("_op"),
                F.col("o_orderstatus").alias("status"),
                price.alias("price"),
            ),
            F.when(
                F.col("o_orderkey") % 7 == 0,
                F.struct(
                    F.lit(2).alias("_version"),
                    F.lit("U").alias("_op"),
                    F.lit("U").alias("status"),
                    F.round(price * 1.1, 2).cast("decimal(18,2)").alias("price"),
                ),
            ),
            F.when(
                F.col("o_orderkey") % 101 == 0,
                F.struct(
                    F.lit(3).alias("_version"),
                    F.lit("D").alias("_op"),
                    F.lit("X").alias("status"),
                    F.lit(0.0).cast("decimal(18,2)").alias("price"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    rows = o.select(
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("as_of"),
        ops.alias("ops"),
    )
    latest = F.array_max(
        F.filter(F.col("ops"), lambda s: s["_version"] <= F.col("as_of"))
    )
    asof = rows.select("as_of", latest.alias("op")).filter(
        F.col("op")["_op"] != "D"
    )
    return asof.groupBy("as_of").agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum((F.col("op")["status"] == "U").cast("int"))
        .cast("bigint")
        .alias("n_updated"),
        F.sum(F.col("op")["price"]).cast("double").alias("total_price"),
    )


@register(
    "link_prediction_scores",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
            FROM und GROUP BY 1),
    two AS (
      SELECT u1.src AS part_a, u2.dst AS part_b,
             CAST(floor(CAST(1000000 AS DOUBLE) / CAST(deg.d AS DOUBLE))
                  AS BIGINT) AS invd
      FROM und u1
      JOIN deg ON deg.node = u1.dst
      JOIN und u2 ON u2.src = u1.dst AND u1.src < u2.dst
    ),
    cand AS (
      SELECT part_a, part_b,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             CAST(sum(invd) AS BIGINT) AS ra_e6
      FROM two
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e
        WHERE e.src = two.part_a AND e.dst = two.part_b)
      GROUP BY part_a, part_b
    )
    SELECT part_a, part_b, common_neighbors, ra_e6
    FROM cand
    ORDER BY common_neighbors DESC, ra_e6 DESC, part_a, part_b
    LIMIT 20
    """,
)
def link_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph ("frequently bought
    together"): for every NON-adjacent part pair reachable in two hops,
    the common-neighbor count (Liben-Nowell & Kleinberg 2003) and the
    resource-allocation index RA = sum_z 1/deg(z) (Zhou, Lu & Zhang
    2009) — the recommendation primitive a curation pipeline runs over
    co-occurrence graphs. Top-20 with a full deterministic tie-break
    (cn desc, ra desc, pair asc).

    Graph: parts are linked when they co-occur in >= 2 DISTINCT orders —
    the weight floor drops the single-co-occurrence coincidence pairs
    that would otherwise densify the graph toward sum(deg^2) two-hop
    blowup (measured: the floor keeps the edge count near-CONSTANT
    (~3.5k) from sf0.001 to sf0.1 while raw co-occurrence grows 8.9k ->
    1.2M; the repeat-co-purchase signal, like any coincidence-vs-signal
    split, saturates). Same floor discipline as triangle_count's
    co-supply weight gate.

    Exactness: RA's per-neighbor term is floor(1e6/deg) — an integer
    both engines derive identically (the double quotient is > 1/deg
    away from the floor boundary for any deg < 1e9), summed exactly;
    no accumulation-order float risk.

    Scale shape: two-hop is ONE self-join keyed on the middle node with
    the degree table broadcast onto it; adjacency elimination is a
    LEFT ANTI against the (small, floor-bounded) edge list; the final
    top-20 is a TakeOrdered, never a global sort. Work is
    sum_z deg(z)^2 over the FLOORED graph — the quantity the weight
    gate bounds."""
    # Pair generation via per-order sorted part arrays (the proven
    # association_rules shape): ONE shuffle on l_orderkey builds the
    # basket, pairs explode INSIDE the array (baskets are a handful of
    # parts), and the second shuffle goes straight to the (src, dst)
    # count — no basket self-join materializing the raw co-occurrence
    # pair table (1.2M rows at sf0.1; measured 2.4 s self-join vs sub-1 s
    # array form).
    bsk = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda x, i: F.transform(
                F.slice(
                    F.col("parts"), i + 2, F.greatest(F.size("parts") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    edges = (
        bsk.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("_w"))
        .filter(F.col("_w") >= 2)
        .select("src", "dst")
    )
    edges = _pin(edges)  # und legs, anti-join adjacency
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    und = _pin(und)  # two-hop legs + degree
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    u1 = und.withColumnsRenamed({"src": "part_a", "dst": "mid"})
    u2 = und.withColumnsRenamed({"src": "mid2", "dst": "part_b"})
    two = (
        u1.join(F.broadcast(deg), F.col("mid") == F.col("node"))
        .join(u2, (F.col("mid2") == F.col("mid")) & (F.col("part_a") < F.col("part_b")))
        .select(
            "part_a",
            "part_b",
            F.floor(F.lit(1000000).cast("double") / F.col("d").cast("double"))
            .cast("bigint")
            .alias("invd"),
        )
    )
    cand = (
        two.join(
            edges,
            (two.part_a == edges.src) & (two.part_b == edges.dst),
            "left_anti",
        )
        .groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
            F.sum("invd").cast("bigint").alias("ra_e6"),
        )
    )
    return cand.orderBy(
        F.desc("common_neighbors"), F.desc("ra_e6"), "part_a", "part_b"
    ).limit(20)


# =====================================================================
# HITS hubs & authorities (integer power iteration) — unrolled oracle
# =====================================================================

@register(
    "hits_hub_authority",
    """
    WITH pairs AS (
      SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 1000000 AS dst
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS s FROM pairs GROUP BY dst),
    h1 AS (
      SELECT p.src AS node, CAST(sum(a.s) AS BIGINT) AS s
      FROM pairs p JOIN a1 a ON a.node = p.dst GROUP BY p.src
    ),
    a2 AS (
      SELECT p.dst AS node, CAST(sum(h.s) AS BIGINT) AS s
      FROM pairs p JOIN h1 h ON h.node = p.src GROUP BY p.dst
    ),
    h2 AS (
      SELECT p.src AS node, CAST(sum(a.s) AS BIGINT) AS s
      FROM pairs p JOIN a2 a ON a.node = p.dst GROUP BY p.src
    ),
    tops AS (
      SELECT 'authority' AS kind, node, s FROM
        (SELECT node, s, row_number() OVER (ORDER BY s DESC, node) AS rn FROM a2)
        WHERE rn <= 10
      UNION ALL
      SELECT 'hub' AS kind, node, s FROM
        (SELECT node, s, row_number() OVER (ORDER BY s DESC, node) AS rn FROM h2)
        WHERE rn <= 10
    ),
    mx AS (SELECT kind, max(s) AS mx FROM tops GROUP BY kind)
    SELECT t.kind, t.node, t.s AS score,
           (1000000 * t.s) // m.mx AS norm_e6
    FROM tops t JOIN mx m ON m.kind = t.kind
    """,
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities (Kleinberg 1999) over the DIRECTED
    supplier -> customer interaction graph (distinct (l_suppkey,
    o_custkey) pairs; customer ids offset as in pagerank_topk): two full
    mutual-reinforcement rounds a = A^T h, h = A a from h0 = 1, top-10
    of each side. Complements pagerank_topk — PageRank ranks by random-
    walk mass on the symmetrized graph; HITS separates the two roles a
    bipartite trade graph actually has (suppliers as hubs, customers as
    authorities).

    Exactness trick: iterating WITHOUT per-round normalization keeps
    every score an exact BIGINT (sums of integer degree products — a1
    is indegree, h1 = sum of neighbor indegrees, ...), so the
    distributed sums are order-free; scores are normalized ONCE at the
    end by each side's maximum via truncating division. Both engines
    run the identical unroll -> hash-exact. Overflow: |a2| <=
    maxdeg^2 * n_edges-ish — < 2^63 through maxdeg ~ 1e6 at 100 TB —
    and 2 rounds is the classic HITS demo depth; deeper runs renormalize
    per round (documented, docs/LIMITS.md).

    Scale shape: per round one join (rank ⋈ edges on the source side's
    key) + one map-side-combinable aggregate — the pagerank shuffle
    pattern; top-10s are TakeOrdered (no global sort); the per-kind max
    is a 20-row rollup."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1000000).alias("dst"),
        )
        .distinct()
    )
    # Optimization r12 (guide §2.4): the edge table feeds all four unrolled
    # rounds — pin it TWICE, pre-partitioned on each round's join key, so
    # no round ever re-shuffles the corpus-sized side; the rank tables
    # (already keyed by the groupBy that produced them) join co-partitioned
    # and each round's only exchange is its own aggregate re-key.
    # Optimization r13 (ADVICE r12): derive the src copy FROM the dst pin so
    # the distinct-edge lineage materializes once, not once per pin.
    pairs_dst = _pin(pairs.repartition("dst"))
    pairs_src = _pin(pairs_dst.repartition("src"))
    a1 = pairs_dst.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    h1 = (
        pairs_dst.join(
            a1.withColumnRenamed("dst", "jdst"), F.col("dst") == F.col("jdst")
        )
        .groupBy("src")
        .agg(F.sum("s").cast("bigint").alias("s"))
    )
    a2 = (
        pairs_src.join(
            h1.withColumnRenamed("src", "jsrc"), F.col("src") == F.col("jsrc")
        )
        .groupBy("dst")
        .agg(F.sum("s").cast("bigint").alias("s"))
    )
    # Optimization r13 (VERDICT r12 item 6, guide §2.4/§5): a2 feeds BOTH h2
    # and top_a, h2 feeds top_h, and `tops` is consumed twice (the per-kind
    # max + the join's left side) — unpinned, the a1→h1→a2 chain re-executed
    # up to 4x (~60 real exchanges; the plan was stage-latency-bound and
    # swung 1.4→2.9 s across host windows). Pinning the three tiny rank
    # tables (node, s) bounds the executed plan to one pass per round.
    a2 = _pin(a2)
    h2 = (
        pairs_dst.join(
            a2.withColumnRenamed("dst", "jdst"), F.col("dst") == F.col("jdst")
        )
        .groupBy("src")
        .agg(F.sum("s").cast("bigint").alias("s"))
    )
    h2 = _pin(h2)
    top_a = (
        a2.orderBy(F.desc("s"), "dst")
        .limit(10)
        .select(F.lit("authority").alias("kind"), F.col("dst").alias("node"), "s")
    )
    top_h = (
        h2.orderBy(F.desc("s"), "src")
        .limit(10)
        .select(F.lit("hub").alias("kind"), F.col("src").alias("node"), "s")
    )
    tops = _pin(top_a.unionByName(top_h))
    mx = tops.groupBy("kind").agg(F.max("s").alias("mx"))
    return (
        tops.join(F.broadcast(mx), "kind")
        .select(
            "kind",
            "node",
            F.col("s").alias("score"),
            F.expr("(1000000 * s) div mx").cast("bigint").alias("norm_e6"),
        )
    )
