"""Post-training / data-loading pipeline queries: SFT chat assembly, crawl
container ingestion, reproducible epoch sharding, tokenizer fertility, and
preference-pair auditing.

These extend the reference's analytics surface (SURVEY.md §2) with the
operations the fine-tuning end of a training-data pipeline needs, in the
same oracle-gated style as the rest of the registry: every computed column
aliased identically in the Spark plan and the DuckDB SQL, floats quantized
to integers per row before any cross-engine aggregate.

Deterministic constructions (threads, pairs, shards, files) derive from
doc_id arithmetic and the shared LCG (operators/sampling.py) so both
engines rebuild the identical structure from the raw `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.operators import sampling as SP
from storm_data_etl_spark.operators import warc as W
from storm_data_etl_spark.plans.ml_queries import _SQL_QUALITY_CTES
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t
from storm_data_etl_spark.session import pin as _pin

#: SQL twin of X.token_count (whitespace tokens of trimmed text, 0 for empty).
_SQL_NTOK = (
    "CASE WHEN trim(coalesce(text, '')) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)


# =====================================================================
# SFT chat-template assembly + audit
# =====================================================================

@register(
    "chat_template_render_stats",
    f"""
    WITH turns AS (
      SELECT doc_id // 4 AS thread_id,
             doc_id % 4 AS turn_idx,
             CASE WHEN {SP.lcg_bucket_sql('doc_id')} < 50
                  THEN 'user' ELSE 'assistant' END AS role,
             coalesce(text, '') AS body,
             {_SQL_NTOK} AS n_tok
      FROM documents
    ),
    pieces AS (
      SELECT thread_id, turn_idx, role, n_tok,
             '<|' || role || '|>' || body || '<|end|>' AS piece
      FROM turns
    )
    SELECT thread_id,
           count(*) AS n_turns,
           CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_user_turns,
           CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_asst_turns,
           arg_min(role, turn_idx) AS first_role,
           bool_and(role = CASE WHEN turn_idx % 2 = 0
                                THEN 'user' ELSE 'assistant' END)
             AS valid_alternation,
           CAST(sum(CASE WHEN role = 'user' THEN n_tok ELSE 0 END) AS BIGINT)
             AS prompt_tokens,
           CAST(sum(CASE WHEN role = 'assistant' THEN n_tok ELSE 0 END) AS BIGINT)
             AS completion_tokens,
           md5(string_agg(piece, '' ORDER BY turn_idx)) AS render_md5
    FROM pieces GROUP BY thread_id
    """,
)
def chat_template_render_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat assembly: group documents into 4-turn threads (thread_id =
    doc_id div 4), assign roles by the shared LCG (so alternation is NOT
    guaranteed and the audit has real signal), render the chat-template
    string <|role|>body<|end|> per turn in turn order, and emit per thread:
    turn/role counts, the first role, whether the thread is a VALID
    alternating user-first conversation, the loss-mask token accounting
    (prompt tokens = user turns, completion tokens = assistant turns — the
    mass the loss actually trains on), and the md5 of the fully rendered
    conversation (pins exact ordered assembly, not just counts).

    Scale shape: one scan, one shuffle on uniform thread_id; the rendered
    string is hashed inside the aggregate (array_sort over ≤4 collected
    turns), so no wide row ever crosses the shuffle un-hashed. At 100 TB
    thread grouping is the same single hash-agg; nothing is driver-side."""
    docs = t(spark, sf_dir, "documents")
    role = F.when(SP.lcg_bucket("doc_id") < 50, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    body = F.coalesce(F.col("text"), F.lit(""))
    turns = docs.select(
        F.expr("doc_id div 4").alias("thread_id"),
        (F.col("doc_id") % 4).alias("turn_idx"),
        role.alias("role"),
        F.concat(F.lit("<|"), role, F.lit("|>"), body, F.lit("<|end|>")).alias(
            "piece"
        ),
        X.token_count(body).alias("n_tok"),
    )
    expected = F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant")
    ordered_pieces = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("turn_idx").alias("i"), F.col("piece").alias("p")))
        ),
        lambda x: x["p"],
    )
    return turns.groupBy("thread_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("bigint")
        .alias("n_user_turns"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("bigint")
        .alias("n_asst_turns"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.bool_and(F.col("role") == expected).alias("valid_alternation"),
        F.sum(F.when(F.col("role") == "user", F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("prompt_tokens"),
        F.sum(F.when(F.col("role") == "assistant", F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("completion_tokens"),
        F.md5(F.array_join(ordered_pieces, "")).alias("render_md5"),
    )


# =====================================================================
# WARC-style crawl container ingest (build → parse → reconcile)
# =====================================================================

@register(
    "warc_ingest_stats",
    """
    WITH r AS (
      SELECT doc_id % 16 AS file_id, doc_id, source,
             strlen(coalesce(text, '')) AS payload_bytes,
             md5(coalesce(text, '')) AS pm
      FROM documents
    )
    SELECT file_id,
           count(*) AS n_records,
           CAST(sum(payload_bytes) AS BIGINT) AS total_payload_bytes,
           count(DISTINCT source) AS n_distinct_hosts,
           md5(string_agg(pm, '' ORDER BY doc_id)) AS payload_digest,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           CAST(0 AS BIGINT) AS n_parse_errors
    FROM r GROUP BY file_id
    """,
)
def warc_ingest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-container ingestion under oracle: build spec-conformant
    WARC/1.1-style record bytes per document (operators/warc.record_expr —
    pure Catalyst string expression), concatenate them in doc_id order into
    16 container files, then split the files back into records with the
    INDEPENDENT byte-level parser (warc.parse_records: header scan +
    Content-Length framing, no shared code with the builder) and reconcile
    per file: record count, payload byte mass, distinct hosts recovered
    from the URIs, an order-pinned digest of per-record payload md5s, the
    doc-id range recovered from record IDs, and the parse-error count. The
    oracle predicts every value closed-form from the construction, so a
    parser that misframes a single record (wrong Content-Length handling,
    payload-delimiter scanning, header-order assumptions) hash-mismatches.

    Scale shape: build is codegen'd; the only shuffles key on file_id
    (uniform by construction) — one to assemble containers, one to
    reconcile parsed records. The parse itself is a shuffle-free
    Arrow-batched map. On a real crawl the build stage is replaced by a
    binaryFile scan of .warc segments; parser and reconcile are unchanged."""
    docs = t(spark, sf_dir, "documents")
    rec = W.record_expr(F.col("doc_id"), F.col("source"), F.col("text"))
    blobs = (
        docs.select(
            (F.col("doc_id") % 16).alias("file_id"),
            F.col("doc_id"),
            rec.alias("rec"),
        )
        .groupBy("file_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("doc_id").alias("i"),
                                    F.col("rec").alias("r"),
                                )
                            )
                        ),
                        lambda x: x["r"],
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("blob")
        )
    )
    parsed = W.parse_records(blobs)
    ok = F.col("parse_ok")
    ordered_md5s = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    ok,
                    F.struct(
                        F.col("doc_id").alias("i"), F.col("payload_md5").alias("m")
                    ),
                )
            )
        ),
        lambda x: x["m"],
    )
    return parsed.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("payload_bytes").cast("bigint").alias("total_payload_bytes"),
        F.count_distinct(F.when(ok, F.col("host"))).alias("n_distinct_hosts"),
        F.md5(F.array_join(ordered_md5s, "")).alias("payload_digest"),
        F.min(F.when(ok, F.col("doc_id"))).alias("min_doc_id"),
        F.max(F.when(ok, F.col("doc_id"))).alias("max_doc_id"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("bigint").alias("n_parse_errors"),
    )


# =====================================================================
# Reproducible epoch shuffle / shard plan
# =====================================================================

@register(
    "epoch_shuffle_plan",
    f"""
    WITH keyed AS (
      SELECT doc_id,
             {SP.lcg_value_sql('doc_id')} AS k,
             {_SQL_NTOK} AS n_tok
      FROM documents
    )
    SELECT k % 16 AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           min(k) AS min_key,
           max(k) AS max_key,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k, doc_id))
             AS order_digest
    FROM keyed GROUP BY shard
    """,
)
def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible data-loader epoch plan: every document gets a
    deterministic shuffle key (full-range LCG of doc_id — same arithmetic
    in the oracle), is hash-assigned to one of 16 shards (key mod 16, the
    WebDataset convention), and is ordered within its shard by (key,
    doc_id). Emits per shard: document count and token mass (balance
    audit), the key range, and an md5 digest of the exact within-shard
    document order — the thing two independent runs (or two engines) must
    agree on for training to be reproducible.

    Scale shape: one scan + one shuffle on the 16 uniform shard keys; the
    order digest hashes inside the aggregate. In production the same plan
    becomes repartition(shard).sortWithinPartitions(key, doc_id) writing
    shard files — identical distribution, no new machinery; shard count
    scales with corpus size while this audit form stays the verification."""
    docs = t(spark, sf_dir, "documents")
    keyed = docs.select(
        F.col("doc_id"),
        SP.lcg_value("doc_id").alias("k"),
        X.token_count("text").alias("n_tok"),
    )
    ordered_ids = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("k").alias("k"), F.col("doc_id").alias("d")))
        ),
        lambda x: x["d"].cast("string"),
    )
    return keyed.groupBy((F.col("k") % 16).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
        F.md5(F.array_join(ordered_ids, ",")).alias("order_digest"),
    )


# =====================================================================
# Tokenizer fertility by language
# =====================================================================

@register(
    "tokenizer_fertility_by_lang",
    """
    WITH s AS (
      SELECT lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS words,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS subtoks,
             length(text) AS chars
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(words) AS BIGINT) AS total_words,
           CAST(sum(subtoks) AS BIGINT) AS total_subtokens,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           CAST(sum(subtoks) * 10000 // sum(words) AS BIGINT) AS fertility_e4,
           CAST(sum(chars) * 10000 // sum(subtoks) AS BIGINT)
             AS chars_per_subtoken_e4
    FROM s GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-evaluation fertility table: per language, how many
    BPE-ish subword units the pre-tokenizer produces per whitespace word
    (fertility — the metric a multilingual tokenizer is judged by) and how
    many characters each subword carries. High fertility on a language
    means its text costs disproportionate sequence length. Ratios are
    emitted as integer e4 floor-divisions of exact integer sums — never a
    cross-engine double division.

    Scale shape: one scan, all counting inside whole-stage codegen
    (regexp_count / regexp_split), one tiny hash-agg on lang."""
    docs = t(spark, sf_dir, "documents").filter(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
    )
    totals = (
        docs.select(
            "lang",
            X.token_count("text").alias("words"),
            X.bpe_ish_token_count("text").alias("subtoks"),
            F.length("text").alias("chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").cast("bigint").alias("total_words"),
            F.sum("subtoks").cast("bigint").alias("total_subtokens"),
            F.sum("chars").cast("bigint").alias("total_chars"),
        )
    )
    return totals.select(
        "lang",
        "n_docs",
        "total_words",
        "total_subtokens",
        "total_chars",
        F.expr("total_subtokens * 10000 div total_words").alias("fertility_e4"),
        F.expr("total_chars * 10000 div total_subtokens").alias(
            "chars_per_subtoken_e4"
        ),
    )


# =====================================================================
# Preference-pair (RLHF) construction audit
# =====================================================================

@register(
    "rlhf_preference_pair_stats",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source,
             CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_e4,
             {_SQL_NTOK} AS n_tok
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    pairs AS (
      SELECT a.source, a.q_e4 AS qa, b.q_e4 AS qb,
             a.n_tok AS ta, b.n_tok AS tb
      FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 2 = 0
    )
    SELECT source,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN qa = qb THEN 1 ELSE 0 END) AS BIGINT) AS n_ties,
           CAST(sum(CASE WHEN qa > qb THEN 1 ELSE 0 END) AS BIGINT) AS n_a_wins,
           CAST(sum(CASE WHEN qb > qa THEN 1 ELSE 0 END) AS BIGINT) AS n_b_wins,
           CAST(sum(abs(qa - qb)) // count(*) AS BIGINT) AS mean_margin_e4,
           CAST(sum(CASE WHEN (qa > qb AND ta > tb) OR (qb > qa AND tb > ta)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_winner_longer
    FROM pairs GROUP BY source
    """,
)
def rlhf_preference_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction audit: pair consecutive documents
    (chosen/rejected candidates for the same implicit prompt), score each
    side with the heuristic quality model (per-row integer e4), and report
    per prompt-side source: pair count, tie rate (unusable pairs), win
    balance between sides (position-bias check), mean quality margin, and
    how often the WINNER is also the LONGER side — the length-bias signal
    reward-model data audits look for before training.

    Formulation: instead of a self-join, one shuffle on pair_id with
    min_by/max_by(side) reconstructs both sides of each pair — half the
    scan cost of the SQL twin's a×b join and no join at all; incomplete
    trailing pairs are dropped on both engines (count = 2 filter ≡ inner
    join). Second tiny shuffle on source."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id"),
        F.col("source"),
        F.floor(X.quality_score("text") * 10000 + 0.5).cast("bigint").alias("q_e4"),
        X.token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"),
        F.expr("doc_id div 2").alias("pair"),
        (F.col("doc_id") % 2).alias("side"),
    )
    pairs = (
        base.groupBy("pair")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min_by("source", "side").alias("source"),
            F.min_by("q_e4", "side").alias("qa"),
            F.max_by("q_e4", "side").alias("qb"),
            F.min_by("n_tok", "side").alias("ta"),
            F.max_by("n_tok", "side").alias("tb"),
        )
        .filter(F.col("cnt") == 2)
    )
    qa, qb, ta, tb = (F.col(c) for c in ("qa", "qb", "ta", "tb"))
    agged = pairs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(qa == qb, 1).otherwise(0)).cast("bigint").alias("n_ties"),
        F.sum(F.when(qa > qb, 1).otherwise(0)).cast("bigint").alias("n_a_wins"),
        F.sum(F.when(qb > qa, 1).otherwise(0)).cast("bigint").alias("n_b_wins"),
        F.sum(F.abs(qa - qb)).cast("bigint").alias("sum_margin"),
        F.sum(
            F.when(((qa > qb) & (ta > tb)) | ((qb > qa) & (tb > ta)), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_winner_longer"),
    )
    # Integer `div`, never a cross-engine double division (DuckDB twin: //).
    return agged.select(
        "source",
        "n_pairs",
        "n_ties",
        "n_a_wins",
        "n_b_wins",
        F.expr("sum_margin div n_pairs").alias("mean_margin_e4"),
        "n_winner_longer",
    )


# =====================================================================
# XML feed ingestion (Spark 4 native from_xml, construction oracle)
# =====================================================================

#: First-3-words item title, shared by builder and oracle prediction.
_SQL_TITLE3 = (
    "array_to_string(list_slice("
    "regexp_split_to_array(trim(coalesce(text, '')), '\\s+'), 1, 3), ' ')"
)


@register(
    "xml_feed_parse_stats",
    f"""
    WITH items AS (
      SELECT source, doc_id, lang,
             length(coalesce(text, '')) AS len,
             {_SQL_TITLE3} AS title
      FROM documents
      WHERE source IS NOT NULL AND doc_id IS NOT NULL AND lang IS NOT NULL
    )
    SELECT source,
           count(*) AS n_items,
           CAST(sum(len) AS BIGINT) AS total_len,
           count(DISTINCT lang) AS n_langs,
           md5(string_agg(title, '|' ORDER BY doc_id)) AS title_digest
    FROM items GROUP BY source
    """,
)
def xml_feed_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed/sitemap ingestion under oracle: render each source's documents
    as an RSS-like XML channel (items in doc_id order, titles
    XML-escaped), then parse the channels back with Spark 4's NATIVE
    from_xml (schema-projected struct/array extraction, entity
    unescaping) and reconcile per source: item count, byte mass, distinct
    languages, and an order-pinned digest of the parsed titles. The
    oracle predicts every value closed-form from `documents`, so a parser
    that drops items, misorders arrays, or fails to unescape entities
    hash-mismatches — certifying the XML source path end-to-end without
    DuckDB needing any XML support. Rows with a NULL source, doc_id, or
    lang are dropped before rendering on both engines — a feed cannot
    carry a null identity, and concat's null-propagation would otherwise
    drop them implicitly and asymmetrically (whole channel vs single
    item; caught by the null-injection audit).

    Scale shape: build and parse are both per-channel row expressions
    (whole-stage codegen; from_xml is a JVM expression, not a UDF); the
    only shuffles key on source. On a real crawl the build stage is
    replaced by spark.read.format('xml') over feed files; the
    reconciliation is unchanged."""
    docs = t(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
        & F.col("doc_id").isNotNull()
        & F.col("lang").isNotNull()
    )
    title3 = F.array_join(
        F.slice(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"), 1, 3),
        " ",
    )
    esc = title3
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    item = F.concat(
        F.lit("<item><id>"),
        F.col("doc_id").cast("string"),
        F.lit("</id><lang>"),
        F.col("lang"),
        F.lit("</lang><len>"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("string"),
        F.lit("</len><title>"),
        esc,
        F.lit("</title></item>"),
    )
    channels = (
        docs.select(F.col("source"), F.col("doc_id"), item.alias("item"))
        .groupBy("source")
        .agg(
            F.concat(
                F.lit("<channel><src>"),
                F.col("source"),
                F.lit("</src>"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("doc_id").alias("i"),
                                    F.col("item").alias("x"),
                                )
                            )
                        ),
                        lambda s: s["x"],
                    ),
                    "",
                ),
                F.lit("</channel>"),
            ).alias("xml")
        )
    )
    parsed = channels.select(
        F.from_xml(
            "xml",
            "src string, item array<struct<id: bigint, lang: string, "
            "len: bigint, title: string>>",
        ).alias("p")
    ).select(F.col("p.src").alias("source"), F.explode("p.item").alias("it"))
    ordered_titles = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("it.id").alias("i"),
                    F.coalesce(F.col("it.title"), F.lit("")).alias("t"),
                )
            )
        ),
        lambda s: s["t"],
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("it.len").cast("bigint").alias("total_len"),
        F.count_distinct("it.lang").alias("n_langs"),
        F.md5(F.array_join(ordered_titles, "|")).alias("title_digest"),
    )


# =====================================================================
# T5-style span-corruption planning
# =====================================================================

@register(
    "span_corruption_plan",
    f"""
    WITH d AS (
      SELECT doc_id, {_SQL_NTOK} AS n_tok FROM documents
    ),
    eligible AS (
      SELECT doc_id, n_tok,
             greatest(1, n_tok * 15 // 100 // 3) AS n_spans
      FROM d WHERE n_tok >= 8
    ),
    spans AS (
      SELECT e.doc_id, e.n_tok, e.n_spans, k.k AS k,
             (k.k * e.n_tok) // e.n_spans AS seg_start,
             ((k.k + 1) * e.n_tok) // e.n_spans
               - (k.k * e.n_tok) // e.n_spans AS seg_len
      FROM eligible e, unnest(range(0, e.n_spans)) AS k(k)
    ),
    placed AS (
      SELECT doc_id, n_tok, n_spans, k,
             least(3, seg_len) AS span_len,
             seg_start
               + ({SP.lcg_value_sql('doc_id * 131 + k')})
                 % (seg_len - least(3, seg_len) + 1) AS start
      FROM spans
    )
    SELECT doc_id, n_tok, n_spans,
           CAST(sum(span_len) AS BIGINT) AS masked_tokens,
           CAST((10000 * sum(span_len)) // n_tok AS BIGINT) AS corruption_e4,
           md5(string_agg(start || ':' || span_len, ',' ORDER BY k))
             AS spans_md5
    FROM placed GROUP BY doc_id, n_tok, n_spans
    """,
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption plan (Raffel et al. 2020 §3.1.4): for each
    document with >= 8 whitespace tokens, place ~15% corruption mass as
    ~3-token mask spans. Spans are STRATIFIED — span k lives inside token
    segment [k*n/s, (k+1)*n/s), offset by the shared LCG — so spans are
    disjoint by construction and the masked mass is a closed form both
    engines rebuild identically (sampled-then-merged spans would need an
    interval-union pass; the stratified form is what production span
    corruption uses to bound per-doc variance anyway). Emits per doc the
    span count, exact masked-token mass, corruption rate in exact integer
    e4, and an md5 over the ordered (start:len) list — the digest pins
    every placement, not just the total.

    Scale shape: one scan; the explode factor is n_tok/20 (a 15%/3-token
    plan), far below the token count, and re-aggregates on doc_id — the
    shuffle carries one small row per span. No window, no driver work."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", X.token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok")
    ).filter(F.col("n_tok") >= 8)
    e = d.withColumn(
        "n_spans", F.greatest(F.lit(1), F.expr("n_tok * 15 div 100 div 3"))
    )
    spans = e.select(
        "doc_id",
        "n_tok",
        "n_spans",
        F.posexplode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("k", "_k2"),
    ).select(
        "doc_id",
        "n_tok",
        "n_spans",
        "k",
        F.expr("(k * n_tok) div n_spans").alias("seg_start"),
        F.expr("((k + 1) * n_tok) div n_spans - (k * n_tok) div n_spans").alias(
            "seg_len"
        ),
    )
    placed = spans.select(
        "doc_id",
        "n_tok",
        "n_spans",
        "k",
        F.least(F.lit(3), F.col("seg_len")).alias("span_len"),
        (
            F.col("seg_start")
            + F.pmod(
                SP.lcg_value(F.col("doc_id") * 131 + F.col("k")),
                F.col("seg_len") - F.least(F.lit(3), F.col("seg_len")) + 1,
            )
        ).alias("start"),
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("k").alias("k"),
                    F.concat_ws(
                        ":",
                        F.col("start").cast("string"),
                        F.col("span_len").cast("string"),
                    ).alias("s"),
                )
            )
        ),
        lambda x: x["s"],
    )
    return placed.groupBy("doc_id", "n_tok", "n_spans").agg(
        F.sum("span_len").cast("bigint").alias("masked_tokens"),
        F.expr("(10000 * sum(span_len)) div n_tok").cast("bigint").alias(
            "corruption_e4"
        ),
        F.md5(F.array_join(ordered, ",")).alias("spans_md5"),
    )


# =====================================================================
# Agentic tool-call trace validation
# =====================================================================

@register(
    "toolcall_trace_audit",
    """
    WITH tr AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'click' THEN 1
                             WHEN 'purchase' THEN -1 ELSE 0 END AS delta
      FROM events
    ),
    d AS (
      SELECT user_id, delta,
             sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS depth
      FROM tr
    )
    SELECT user_id,
           CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_calls,
           CAST(sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_results,
           CAST(max(depth) AS BIGINT) AS max_depth,
           CAST(min(depth) AS BIGINT) AS min_depth,
           CAST(sum(CASE WHEN delta = -1 AND depth < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphan_results,
           CAST(greatest(sum(delta), 0) AS BIGINT) AS unclosed_calls,
           (min(depth) >= 0 AND sum(delta) = 0) AS is_valid
    FROM d GROUP BY user_id
    """,
)
def toolcall_trace_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agentic-trace validation for tool-use SFT data: treating each user's
    event stream as a tool-call trace ('click' opens a call, 'purchase'
    closes one, everything else is narration), audit bracket balance the
    way a tool-call linter must before traces enter a training mix: a
    running depth (the classic parenthesis-matching scan as a window
    prefix sum), orphan results (a close with no open — depth dips below
    zero), unclosed calls at end-of-trace, and max nesting depth. A trace
    is valid iff depth never goes negative and ends at zero.

    Scale shape: ONE shuffle on user_id serves both the ordered prefix-sum
    window and the final per-user aggregate (same key, Spark reuses the
    partitioning); rows never leave their partition afterwards. Extends
    the sessionization family (window_queries.sessionize) to bracket
    semantics."""
    ev = t(spark, sf_dir, "events")
    delta = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "purchase", -1)
        .otherwise(0)
    )
    tr = ev.select("user_id", "ts_ns", "event_id", delta.alias("delta"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = tr.withColumn("depth", F.sum("delta").over(w))
    return d.groupBy("user_id").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_calls"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_results"),
        F.max("depth").cast("bigint").alias("max_depth"),
        F.min("depth").cast("bigint").alias("min_depth"),
        F.sum(F.when((F.col("delta") == -1) & (F.col("depth") < 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orphan_results"),
        F.greatest(F.sum("delta"), F.lit(0)).cast("bigint").alias("unclosed_calls"),
        ((F.min("depth") >= 0) & (F.sum("delta") == 0)).alias("is_valid"),
    )


# =====================================================================
# Parallel-corpus (bitext) length-ratio filtering
# =====================================================================

@register(
    "bitext_length_ratio_filter",
    f"""
    WITH d AS (
      SELECT doc_id, lang, {_SQL_NTOK} AS n_tok FROM documents
    ),
    pairs AS (
      SELECT doc_id // 2 AS pair_id,
             max(CASE WHEN doc_id % 2 = 0 THEN lang END) AS src_lang,
             max(CASE WHEN doc_id % 2 = 1 THEN lang END) AS tgt_lang,
             max(CASE WHEN doc_id % 2 = 0 THEN n_tok END) AS src_tok,
             max(CASE WHEN doc_id % 2 = 1 THEN n_tok END) AS tgt_tok,
             count(*) AS n_sides
      FROM d GROUP BY doc_id // 2
    ),
    flagged AS (
      SELECT src_lang, tgt_lang,
             CASE WHEN src_tok = 0 OR tgt_tok = 0 THEN 'empty'
                  WHEN src_tok > 2 * tgt_tok OR tgt_tok > 2 * src_tok
                    THEN 'ratio'
                  ELSE 'kept' END AS verdict,
             src_tok, tgt_tok
      FROM pairs WHERE n_sides = 2
    )
    SELECT src_lang, tgt_lang,
           count(*) AS n_pairs,
           CAST(sum(CASE WHEN verdict = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN verdict = 'empty' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty,
           CAST(sum(CASE WHEN verdict = 'ratio' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ratio_drop,
           CAST(sum(CASE WHEN verdict = 'kept' THEN src_tok ELSE 0 END)
                AS BIGINT) AS kept_src_tokens,
           CAST(sum(CASE WHEN verdict = 'kept' THEN tgt_tok ELSE 0 END)
                AS BIGINT) AS kept_tgt_tokens
    FROM flagged GROUP BY src_lang, tgt_lang
    """,
)
def bitext_length_ratio_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-translation bitext cleaning (the Moses clean-corpus-n rule):
    adjacent documents form a translation pair (even doc_id = source side,
    odd = target), and a pair survives iff both sides are non-empty and
    the token-length ratio is within 2:1 — the standard misalignment
    heuristic. Integer token counts make the ratio test exact (src <=
    2*tgt AND tgt <= 2*src), so no boundary pair can flip between
    engines. Emits the per-language-pair operating stats a bitext
    curation run reports: pair counts, kept/empty/ratio-dropped, and the
    surviving token mass per side.

    Scale shape: one shuffle keyed on pair_id (uniform by construction)
    builds the pairs via conditional min/max aggregation — never a
    self-join of the corpus against itself — then a tiny lang-pair agg.
    At 100 TB the pair agg carries two small ints per doc."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        X.token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"),
    )
    even = F.col("doc_id") % 2 == 0
    pairs = (
        d.groupBy(F.expr("doc_id div 2").alias("pair_id"))
        .agg(
            F.max(F.when(even, F.col("lang"))).alias("src_lang"),
            F.max(F.when(~even, F.col("lang"))).alias("tgt_lang"),
            F.max(F.when(even, F.col("n_tok"))).alias("src_tok"),
            F.max(F.when(~even, F.col("n_tok"))).alias("tgt_tok"),
            F.count(F.lit(1)).alias("n_sides"),
        )
        .filter(F.col("n_sides") == 2)
    )
    verdict = (
        F.when((F.col("src_tok") == 0) | (F.col("tgt_tok") == 0), "empty")
        .when(
            (F.col("src_tok") > 2 * F.col("tgt_tok"))
            | (F.col("tgt_tok") > 2 * F.col("src_tok")),
            "ratio",
        )
        .otherwise("kept")
    )
    flagged = pairs.select(
        "src_lang", "tgt_lang", verdict.alias("verdict"), "src_tok", "tgt_tok"
    )
    kept = F.col("verdict") == "kept"
    return flagged.groupBy("src_lang", "tgt_lang").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.sum((F.col("verdict") == "empty").cast("int"))
        .cast("bigint")
        .alias("n_empty"),
        F.sum((F.col("verdict") == "ratio").cast("int"))
        .cast("bigint")
        .alias("n_ratio_drop"),
        F.sum(F.when(kept, F.col("src_tok")).otherwise(0))
        .cast("bigint")
        .alias("kept_src_tokens"),
        F.sum(F.when(kept, F.col("tgt_tok")).otherwise(0))
        .cast("bigint")
        .alias("kept_tgt_tokens"),
    )


# =====================================================================
# Curriculum schedule planning
# =====================================================================

@register(
    "curriculum_schedule_plan",
    f"""
    WITH d AS (
      SELECT doc_id,
             least(3, n_chars // 150) AS phase,
             {_SQL_NTOK} AS n_tok,
             {SP.lcg_value_sql('doc_id')} AS shuffle_key
      FROM documents
    )
    SELECT phase,
           shuffle_key % 8 AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           md5(string_agg(doc_id, ',' ORDER BY shuffle_key, doc_id))
             AS order_md5
    FROM d GROUP BY phase, shuffle_key % 8
    """,
)
def curriculum_schedule_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning schedule: documents are banded into 4 difficulty
    phases by length (shortest first — the classic easy-to-hard length
    curriculum), then each phase is split into 8 loader shards by the
    shared LCG, with the exact within-shard order (LCG key, then doc_id)
    pinned by an md5 digest. A trainer consuming phase-by-phase,
    shard-by-shard reproduces byte-identical batch order from this plan.

    Scale shape: phase assignment is arithmetic (no global quantile sort —
    fixed length bands), and digests are per (phase, shard), so every
    ordered aggregation is bounded by corpus/32 and the shuffle key
    (phase, shard) is uniform by LCG construction. The same tree-digest
    trick as epoch_shuffle_plan; nothing global-sorts."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(F.lit(3), F.expr("n_chars div 150")).alias("phase"),
        X.token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"),
        SP.lcg_value("doc_id").alias("shuffle_key"),
    )
    ordered_ids = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("shuffle_key").alias("sk"),
                    F.col("doc_id").alias("id"),
                )
            )
        ),
        lambda x: x["id"].cast("string"),
    )
    return d.groupBy("phase", F.pmod(F.col("shuffle_key"), F.lit(8)).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.md5(F.array_join(ordered_ids, ",")).alias("order_md5"),
    )


# =====================================================================
# Recency-weighted sampling plan
# =====================================================================

@register(
    "recency_weighting_plan",
    """
    WITH ev AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
      FROM events
    ),
    latest AS (SELECT max(day_num) AS max_day FROM ev),
    wtd AS (
      SELECT event_type,
             1000 // (1 << ((latest.max_day - day_num) // 7)) AS w_e3
      FROM ev, latest
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(w_e3) AS BIGINT) AS total_weight_e3,
           CAST((10000 * sum(w_e3) * sum(w_e3))
                // sum(w_e3 * w_e3) AS BIGINT) AS ess_e4,
           CAST((10000 * sum(w_e3)) // (1000 * count(*)) AS BIGINT)
             AS mean_weight_e4
    FROM wtd GROUP BY event_type
    """,
)
def recency_weighting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted sampling plan — the freshness-decay weighting a
    continually-trained model applies to its event/data stream: weight
    halves every 7 days of age (exact integer: 1000 >> (age//7), so no
    exp() and no cross-engine libm), and per event type the plan reports
    total weight mass, Kish effective sample size
    ESS = (Σw)²/Σw² (how many uniform samples the weighted set is worth),
    and mean weight — all exact integer arithmetic in e3/e4 scale.

    Scale shape: the latest-day anchor is a 1-row broadcast; weights are
    per-row arithmetic; one map-side-partial agg per event type.
    Overflow bound: 10^4·(Σw)² must fit int64, i.e. Σw ≤ ~3·10^7 —
    ~3·10^7 full-weight rows per group. Beyond that, drop the e4 scale
    factor or emit the exact Σw/Σw² moments and divide in double at the
    consumer (the oracle's HUGEINT path has no such limit)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts_utc"), F.lit("1970-01-01")).alias("day_num"),
    )
    latest = ev.agg(F.max("day_num").alias("max_day"))
    wtd = ev.crossJoin(F.broadcast(latest)).select(
        "event_type",
        F.expr("1000 div shiftleft(1, (max_day - day_num) div 7)").alias("w_e3"),
    )
    return wtd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("w_e3").cast("bigint").alias("total_weight_e3"),
        F.expr("(10000 * sum(w_e3) * sum(w_e3)) div sum(w_e3 * w_e3)")
        .cast("bigint")
        .alias("ess_e4"),
        F.expr("(10000 * sum(w_e3)) div (1000 * count(1))")
        .cast("bigint")
        .alias("mean_weight_e4"),
    )


@register(
    "pass_at_k_estimates",
    """
    WITH samples AS (
      SELECT user_id AS problem_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ok,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ),
    per_problem AS (
      SELECT problem_id,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ok) AS BIGINT) AS c
      FROM samples WHERE rn <= 200 GROUP BY problem_id
    ),
    ks AS (SELECT unnest([1, 5, 10]) AS k),
    est AS (
      SELECT k, problem_id, n, c,
             CASE
               WHEN c = 0 THEN CAST(0 AS BIGINT)
               WHEN n - c < k THEN CAST(1000000000 AS BIGINT)
               ELSE 1000000000 - CAST(
                 (CAST(1000000000 AS HUGEINT)
                  * list_reduce(list_transform(generate_series(n - c - k + 1, n - c),
                                               i -> CAST(i AS HUGEINT)),
                                (x, y) -> x * y))
                 // list_reduce(list_transform(generate_series(n - k + 1, n),
                                               i -> CAST(i AS HUGEINT)),
                               (x, y) -> x * y) AS BIGINT)
             END AS pass_e9
      FROM per_problem JOIN ks ON k <= n
    )
    SELECT k,
           count(*) AS n_problems,
           CAST(sum(c) AS BIGINT) AS total_correct,
           CAST(sum(pass_e9) // count(*) AS BIGINT) AS mean_pass_at_k_e9
    FROM est GROUP BY k
    """,
)
def pass_at_k_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, arXiv:2107.03374 eq. 1) — THE
    aggregation every code/eval harness owes its users: per problem with
    n samples and c successes, pass@k = 1 − C(n−c,k)/C(n,k), estimated
    without the naive 1−(1−c/n)^k bias. The binomial ratio reduces to a
    falling-factorial quotient ffact(n−c,k)/ffact(n,k), computed in EXACT
    wide integers (HUGEINT / DECIMAL(38,0) left-to-right products — both
    engines fold ascending i over the same k terms), floored at e9; mean
    over problems is an integer div. Sample caps keep the products in
    range: n ≤ 200 per problem (deterministic first-200 by event_id), so
    ffact ≤ 200^10 ≈ 1e23 and 1e9·ffact ≈ 1e32 < 38 digits — and n ≫ 200
    samples per problem adds no estimator precision worth the width
    (documented cap, the harness convention).

    Problems are user_ids; a 'purchase' event is a passing sample —
    the same synthetic labeling the funnel queries use.

    Scale shape: one keyed window caps samples (parallel by problem);
    per-problem counts are one aggregate; k fan-out is a 3-row broadcast
    join; output is 3 rows. No global sorts, no floats anywhere."""
    samples = (
        t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("problem_id"),
            (F.col("event_type") == "purchase").cast("int").alias("ok"),
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("event_id"))
            .alias("rn"),
        )
        .filter(F.col("rn") <= 200)
    )
    per_problem = samples.groupBy("problem_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("c"),
    )
    ks = spark.range(0, 3).select(
        F.element_at(F.array(F.lit(1), F.lit(5), F.lit(10)), (F.col("id") + 1).cast("int"))
        .cast("bigint")
        .alias("k")
    )
    ffact = (
        "aggregate(sequence({lo}, {hi}), CAST(1 AS DECIMAL(38,0)),"
        " (acc, x) -> CAST(acc * x AS DECIMAL(38,0)))"
    )
    num = ffact.format(lo="n - c - k + 1", hi="n - c")
    den = ffact.format(lo="n - k + 1", hi="n")
    est = per_problem.join(
        F.broadcast(ks), F.col("k") <= F.col("n")
    ).select(
        "k",
        "n",
        "c",
        F.when(F.col("c") == 0, F.lit(0).cast("bigint"))
        .when(F.col("n") - F.col("c") < F.col("k"), F.lit(1000000000).cast("bigint"))
        .otherwise(
            F.lit(1000000000).cast("bigint")
            - F.expr(
                f"CAST((CAST(1000000000 AS DECIMAL(38,0)) * {num}) div {den}"
                " AS BIGINT)"
            )
        )
        .alias("pass_e9"),
    )
    return est.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_problems"),
        F.sum("c").cast("bigint").alias("total_correct"),
        F.expr("sum(pass_e9) div count(*)")
        .cast("bigint")
        .alias("mean_pass_at_k_e9"),
    )


# =====================================================================
# Inter-annotator agreement + pairwise-preference strength (round 7)
# =====================================================================

#: Two deterministic "annotators" over documents, shared by the
#: agreement queries: rater Q labels by the composite quality score
#: (functions/text.quality_score), rater H by the cheap length+punct
#: heuristic alone. Correlated but not identical — exactly the
#: imperfect-agreement regime κ/α are built to quantify. Produces CTE
#: `ratings(doc_id, source, rq, rh)` with labels in {0,1,2}; prepend
#: the quality CTEs.
_SQL_RATINGS_CTE = f"""
    ratings AS (
      SELECT d.doc_id, d.source,
             CASE WHEN q.quality >= 0.8 THEN 2
                  WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS rq,
             CASE WHEN s.n >= 200 AND s.n <= 20000 AND s.p <= 0.2 THEN 2
                  WHEN s.n >= 50 AND s.p <= 0.4 THEN 1 ELSE 0 END AS rh
      FROM documents d
      JOIN qual q ON q.doc_id = d.doc_id
      JOIN sig s ON s.doc_id = d.doc_id
    )"""


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SQL_RATINGS_CTE."""
    docs = t(spark, sf_dir, "documents")
    q = X.quality_score("text")
    n = X.char_count("text")
    p = X.punct_ratio("text")
    return docs.select(
        "doc_id",
        "source",
        F.when(q >= 0.8, 2).when(q >= 0.5, 1).otherwise(0).alias("rq"),
        F.when((n >= 200) & (n <= 20000) & (p <= 0.2), 2)
        .when((n >= 50) & (p <= 0.4), 1)
        .otherwise(0)
        .alias("rh"),
    )


@register(
    "cohen_kappa_agreement",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS_CTE},
    m AS (
      SELECT source,
             count(*) AS n,
             CAST(sum(CASE WHEN rq = rh THEN 1 ELSE 0 END) AS BIGINT) AS agree,
             CAST(sum(CASE WHEN rq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
             CAST(sum(CASE WHEN rq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
             CAST(sum(CASE WHEN rq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
             CAST(sum(CASE WHEN rh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             CAST(sum(CASE WHEN rh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             CAST(sum(CASE WHEN rh = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2
      FROM ratings GROUP BY source
    )
    SELECT source, n, agree,
           CASE WHEN n * n - (a0*b0 + a1*b1 + a2*b2) = 0 THEN NULL
                WHEN n * agree - (a0*b0 + a1*b1 + a2*b2) >= 0
                THEN (1000000 * (n * agree - (a0*b0 + a1*b1 + a2*b2)))
                     // (n * n - (a0*b0 + a1*b1 + a2*b2))
                ELSE -((1000000 * ((a0*b0 + a1*b1 + a2*b2) - n * agree))
                       // (n * n - (a0*b0 + a1*b1 + a2*b2)))
           END AS kappa_e6
    FROM m
    """,
)
def cohen_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ (Cohen 1960) per source between two deterministic
    annotators (quality-score bands vs a length+punct heuristic) — the
    inter-annotator agreement audit run before trusting a rating table
    as training signal. κ = (p_o − p_e)/(1 − p_e) with chance agreement
    p_e from the raters' marginals; emitted as exact integer
    κ·1e6 = (n·agree − Σ_k a_k·b_k) tdiv (n² − Σ_k a_k·b_k), truncated
    toward zero SYMMETRICALLY on both engines (κ < 0, agreement below
    chance, divides negatives — Spark div and DuckDB // disagree on
    floor-vs-trunc there, so both sides spell out the sign; the ADVICE
    r6 pmod lesson applied preemptively). NULL when p_e = 1 (degenerate
    one-class marginals).

    Scale: one narrow scan → one tiny groupBy(source) of conditional
    counts; capacity n < 3.0e6 docs/source — the binding term is
    1e6·(n·agree − Σ a_k·b_k) ≤ 1e6·n², which leaves BIGINT at
    n ≈ 3.0e6 (Spark non-ANSI would wrap silently there while DuckDB
    errors); recast to DECIMAL(38,0) past that
    (docs/LIMITS.md round-7 note)."""
    r = _ratings(spark, sf_dir)
    conds = [
        F.sum(F.when(F.col("rq") == k, 1).otherwise(0)).cast("bigint").alias(f"a{k}")
        for k in (0, 1, 2)
    ] + [
        F.sum(F.when(F.col("rh") == k, 1).otherwise(0)).cast("bigint").alias(f"b{k}")
        for k in (0, 1, 2)
    ]
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("rq") == F.col("rh"), 1).otherwise(0))
        .cast("bigint")
        .alias("agree"),
        *conds,
    )
    pe = F.col("a0") * F.col("b0") + F.col("a1") * F.col("b1") + F.col("a2") * F.col("b2")
    num = F.col("n") * F.col("agree") - pe
    den = F.col("n") * F.col("n") - pe
    kappa = (
        F.when(den == 0, F.lit(None).cast("bigint"))
        .when(num >= 0, F.expr("1000000 * num div den"))
        .otherwise(-F.expr("(1000000 * (-num)) div den"))
    )
    return m.withColumn("num", num).withColumn("den", den).select(
        "source",
        "n",
        "agree",
        kappa.cast("bigint").alias("kappa_e6"),
    )


@register(
    "krippendorff_alpha_nominal",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS_CTE},
    m AS (
      SELECT source,
             count(*) AS n,
             CAST(sum(CASE WHEN rq <> rh THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(sum(CASE WHEN rq = 0 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN rh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN rq = 1 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN rh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN rq = 2 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN rh = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM ratings GROUP BY source
    )
    SELECT source, n, d,
           CASE WHEN n * ((2*n) * (2*n - 1) - (c0*(c0-1) + c1*(c1-1) + c2*(c2-1))) = 0
                THEN NULL
                WHEN n * ((2*n) * (2*n - 1) - (c0*(c0-1) + c1*(c1-1) + c2*(c2-1)))
                     - d * (2*n) * (2*n - 1) >= 0
                THEN (1000000 * (n * ((2*n) * (2*n - 1) - (c0*(c0-1) + c1*(c1-1) + c2*(c2-1)))
                                 - d * (2*n) * (2*n - 1)))
                     // (n * ((2*n) * (2*n - 1) - (c0*(c0-1) + c1*(c1-1) + c2*(c2-1))))
                ELSE -((1000000 * (d * (2*n) * (2*n - 1)
                                   - n * ((2*n) * (2*n - 1) - (c0*(c0-1) + c1*(c1-1) + c2*(c2-1)))))
                       // (n * ((2*n) * (2*n - 1) - (c0*(c0-1) + c1*(c1-1) + c2*(c2-1)))))
           END AS alpha_e6
    FROM m
    """,
)
def krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's α (nominal metric, 2 raters, no missing values —
    Krippendorff 2004 §11) per source over the same rating table as
    cohen_kappa_agreement. α = 1 − D_o/D_e with D_o = d/n (disagreeing
    units) and D_e the no-replacement pooled disagreement
    (N(N−1) − Σ_c n_c(n_c−1)) / (N(N−1)), N = 2n pooled values. Exact
    integer form: α·1e6 = (A − B) tdiv A with
    A = n·(N(N−1) − Σ_c n_c(n_c−1)), B = d·N(N−1); sign-symmetric
    truncation and NULL-on-degenerate as in κ. α differs from κ
    exactly in its chance model (pooled marginals, finite-sample
    correction) — having both gated catches a wrong chance term that
    either alone might mask.

    Scale: identical single-aggregate shape; capacity 4n³·1e6 < 2^63 →
    n < 120k docs/source in BIGINT (docs/LIMITS.md; recast both sides
    to HUGEINT/DECIMAL(38,0) past that)."""
    r = _ratings(spark, sf_dir)
    conds = [
        (
            F.sum(F.when(F.col("rq") == k, 1).otherwise(0))
            + F.sum(F.when(F.col("rh") == k, 1).otherwise(0))
        )
        .cast("bigint")
        .alias(f"c{k}")
        for k in (0, 1, 2)
    ]
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("rq") != F.col("rh"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        *conds,
    )
    n, d = F.col("n"), F.col("d")
    pairs_all = (2 * n) * (2 * n - 1)
    same = sum(F.col(f"c{k}") * (F.col(f"c{k}") - 1) for k in (0, 1, 2))
    a_ = n * (pairs_all - same)
    b_ = d * pairs_all
    m2 = m.withColumn("A", a_).withColumn("B", b_)
    alpha = (
        F.when(F.col("A") == 0, F.lit(None).cast("bigint"))
        .when(F.col("A") - F.col("B") >= 0, F.expr("(1000000 * (A - B)) div A"))
        .otherwise(-F.expr("(1000000 * (B - A)) div A"))
    )
    return m2.select("source", "n", "d", alpha.cast("bigint").alias("alpha_e6"))


@register(
    "krippendorff_alpha_interval",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS_CTE},
    m AS (
      SELECT source,
             count(*) AS n,
             CAST(sum((rq - rh) * (rq - rh)) AS BIGINT) AS sd,
             CAST(sum(CASE WHEN rq = 0 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN rh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN rq = 1 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN rh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN rq = 2 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN rh = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM ratings GROUP BY source
    )
    SELECT source, n, sd,
           CASE WHEN 2 * (c0*c1 + c1*c2 + 4*c0*c2) = 0 THEN NULL
                WHEN 2 * (c0*c1 + c1*c2 + 4*c0*c2) - 2 * sd * (2*n - 1) >= 0
                THEN (1000000 * (2 * (c0*c1 + c1*c2 + 4*c0*c2)
                                 - 2 * sd * (2*n - 1)))
                     // (2 * (c0*c1 + c1*c2 + 4*c0*c2))
                ELSE -((1000000 * (2 * sd * (2*n - 1)
                                   - 2 * (c0*c1 + c1*c2 + 4*c0*c2)))
                       // (2 * (c0*c1 + c1*c2 + 4*c0*c2)))
           END AS alpha_e6
    FROM m
    """,
)
def krippendorff_alpha_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's α with the INTERVAL metric δ(c,c') = (c−c')²
    (Krippendorff 2004 §11.3) per source over the same 2-rater table as
    the nominal-metric twin above — the right agreement statistic when
    the labels {0,1,2} are ordered quality bands rather than unordered
    categories: a 0-vs-2 disagreement (δ = 4) should cost four times a
    0-vs-1 (δ = 1), which the nominal metric cannot express.

    Exact integer form, quadratic not cubic: with sd = Σ_i (rq_i−rh_i)²,
    pooled counts c_k over the N = 2n values, and pooled pair-weight sum
    S_e = Σ_{{c,c'}} n_c·n_c'·(c−c')² = 2(c0·c1 + c1·c2 + 4·c0·c2),
    α = 1 − (sd/n)·(N(N−1)/S_e); the n cancels against N = 2n, giving
    α·1e6 = 1e6·(S_e − 2·sd·(2n−1)) tdiv S_e — sign-symmetric
    truncation (α < 0 is agreement below chance), NULL when S_e = 0
    (all 2n pooled labels identical). Having nominal AND interval α
    gated together pins the δ-weighting itself: a wrong weight matrix
    moves one but not the other.

    Scale: identical one-scan / one-tiny-groupBy(source) shape as the κ
    family; capacity 1e6·S_e ≤ 1.6e7·n² < 2⁶³ → n < 7.6e5 docs/source
    in BIGINT (docs/LIMITS.md round-8 note); recast to DECIMAL(38,0)
    past that."""
    r = _ratings(spark, sf_dir)
    conds = [
        (
            F.sum(F.when(F.col("rq") == k, 1).otherwise(0))
            + F.sum(F.when(F.col("rh") == k, 1).otherwise(0))
        )
        .cast("bigint")
        .alias(f"c{k}")
        for k in (0, 1, 2)
    ]
    diff = F.col("rq") - F.col("rh")
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(diff * diff).cast("bigint").alias("sd"),
        *conds,
    )
    se = 2 * (
        F.col("c0") * F.col("c1")
        + F.col("c1") * F.col("c2")
        + 4 * F.col("c0") * F.col("c2")
    )
    num = se - 2 * F.col("sd") * (2 * F.col("n") - 1)
    m2 = m.withColumn("ase", se.cast("bigint")).withColumn(
        "anum", num.cast("bigint")
    )
    alpha = (
        F.when(F.col("ase") == 0, F.lit(None).cast("bigint"))
        .when(F.col("anum") >= 0, F.expr("(1000000 * anum) div ase"))
        .otherwise(-F.expr("(1000000 * (-anum)) div ase"))
    )
    return m2.select("source", "n", "sd", alpha.cast("bigint").alias("alpha_e6"))


@register(
    "bradley_terry_strength",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source,
             CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_e4
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    wl AS (
      SELECT CASE WHEN a.q_e4 > b.q_e4 THEN a.source ELSE b.source END AS w,
             CASE WHEN a.q_e4 > b.q_e4 THEN b.source ELSE a.source END AS l
      FROM base a JOIN base b ON b.doc_id = a.doc_id + 37
      WHERE a.source <> b.source AND a.q_e4 <> b.q_e4
    ),
    g AS (SELECT least(w, l) AS x, greatest(w, l) AS y, count(*) AS n
          FROM wl GROUP BY 1, 2),
    sym AS (SELECT x AS i, y AS j, n FROM g
            UNION ALL SELECT y AS i, x AS j, n FROM g),
    players AS (SELECT DISTINCT i FROM sym),
    wins AS (
      SELECT p.i, CAST(count(wl.w) AS BIGINT) AS w
      FROM players p LEFT JOIN wl ON wl.w = p.i GROUP BY p.i
    ),
    gtot AS (SELECT i, CAST(sum(n) AS BIGINT) AS n_games FROM sym GROUP BY i),
    p0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p FROM players),
    d1 AS (
      SELECT s.i, sum((CAST(s.n AS HUGEINT) * 1000000000000) // (pa.p + pb.p)) AS d
      FROM sym s JOIN p0 pa ON pa.i = s.i JOIN p0 pb ON pb.i = s.j
      GROUP BY s.i
    ),
    r1 AS (
      SELECT d1.i, (CAST(w.w + 1 AS HUGEINT) * 1000000000000000000) // d1.d AS praw
      FROM d1 JOIN wins w ON w.i = d1.i
    ),
    p1 AS (
      SELECT i, CAST(greatest(1, (praw * 1000000) // (SELECT sum(praw) FROM r1)) AS BIGINT) AS p
      FROM r1
    ),
    d2 AS (
      SELECT s.i, sum((CAST(s.n AS HUGEINT) * 1000000000000) // (pa.p + pb.p)) AS d
      FROM sym s JOIN p1 pa ON pa.i = s.i JOIN p1 pb ON pb.i = s.j
      GROUP BY s.i
    ),
    r2 AS (
      SELECT d2.i, (CAST(w.w + 1 AS HUGEINT) * 1000000000000000000) // d2.d AS praw
      FROM d2 JOIN wins w ON w.i = d2.i
    ),
    p2 AS (
      SELECT i, CAST(greatest(1, (praw * 1000000) // (SELECT sum(praw) FROM r2)) AS BIGINT) AS p
      FROM r2
    ),
    d3 AS (
      SELECT s.i, sum((CAST(s.n AS HUGEINT) * 1000000000000) // (pa.p + pb.p)) AS d
      FROM sym s JOIN p2 pa ON pa.i = s.i JOIN p2 pb ON pb.i = s.j
      GROUP BY s.i
    ),
    r3 AS (
      SELECT d3.i, (CAST(w.w + 1 AS HUGEINT) * 1000000000000000000) // d3.d AS praw
      FROM d3 JOIN wins w ON w.i = d3.i
    ),
    p3 AS (
      SELECT i, CAST(greatest(1, (praw * 1000000) // (SELECT sum(praw) FROM r3)) AS BIGINT) AS p
      FROM r3
    )
    SELECT p3.i AS source, gtot.n_games, wins.w AS n_wins,
           p3.p AS strength_e6
    FROM p3 JOIN gtot ON gtot.i = p3.i JOIN wins ON wins.i = p3.i
    """,
)
def bradley_terry_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry (1952) player strengths from pairwise preferences
    via THREE unrolled minorization-maximization iterations (Hunter 2004
    MM: p_i <- W_i / sum_j n_ij/(p_i + p_j)), the reward-model-adjacent
    strength fit over source-vs-source quality wins. Matches pair doc k
    against doc k+37 (offset coprime to the 25-doc source blocks, so the
    comparison graph CONNECTS all sources — consecutive pairing would
    give disjoint 2-cliques where only within-pair strengths are
    identified); winner = higher quality e4, ties and same-source pairs
    dropped.

    Every iteration is EXACT fixed-point integer arithmetic so the
    distributed sums are order-free and both engines agree bit-for-bit:
    p in e6 units, D_i = sum_j (n_ij*1e12 tdiv (p_i+p_j)) (per-term
    floor, exact integer sum), praw_i = (W_i+1)*1e18 tdiv D_i (the +1 is
    Laplace smoothing so zero-win players keep positive strength — MM is
    undefined at W=0), renormalized to sum ~1e6 with a >=1 floor. The
    DuckDB twin unrolls the same three iterations as chained CTEs in
    HUGEINT; Spark uses DECIMAL(38,0) products with div. Capacity
    bounds (docs/LIMITS.md): per-player wins < 4.6e6 and games < 1.8e7
    per iteration before praw/D leave BIGINT.

    Scale shape: the iteration state is ONE row per player (sources:
    tiny) — every join against `sym` is a broadcast; the only
    corpus-size work is the one-pass match derivation (self-join on
    doc_id+37, an equi-join) and its groupBys."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.floor(X.quality_score("text") * 10000 + 0.5).cast("bigint").alias("q_e4"),
    ).localCheckpoint(eager=True)  # quality regex pass runs ONCE, not per join side
    b = base.select(
        (F.col("doc_id") - 37).alias("doc_id"),
        F.col("source").alias("source_b"),
        F.col("q_e4").alias("q_b"),
    )
    wl = (
        base.join(b, "doc_id")
        .filter((F.col("source") != F.col("source_b")) & (F.col("q_e4") != F.col("q_b")))
        .select(
            F.when(F.col("q_e4") > F.col("q_b"), F.col("source"))
            .otherwise(F.col("source_b"))
            .alias("w"),
            F.when(F.col("q_e4") > F.col("q_b"), F.col("source_b"))
            .otherwise(F.col("source"))
            .alias("l"),
        )
    ).localCheckpoint(eager=True)  # feeds sym AND wins — one match pass
    g = wl.groupBy(
        F.least("w", "l").alias("x"), F.greatest("w", "l").alias("y")
    ).agg(F.count(F.lit(1)).alias("n"))
    sym = g.select(F.col("x").alias("i"), F.col("y").alias("j"), "n").unionByName(
        g.select(F.col("y").alias("i"), F.col("x").alias("j"), "n")
    )
    # Lineage cuts (the pagerank/suffix-array discipline): sym/wins feed
    # every MM iteration, and each iteration consumes p TWICE (pa, pb) and
    # praw twice (tot + renorm) — without cutting, the corpus-scale match
    # derivation re-executes ~3^k times across k unrolled iterations
    # (measured 129 s at sf0.1 the round this query first got a bench row;
    # 2.5 s after the cuts — the bench-on-land policy's first catch).
    # Every checkpointed table is one row per player/pair: tiny.
    sym = sym.localCheckpoint(eager=True)
    players = sym.select("i").distinct()
    wins = (
        players.join(wl.groupBy("w").agg(F.count(F.lit(1)).alias("_w")),
                     players["i"] == F.col("w"), "left")
        .select("i", F.coalesce("_w", F.lit(0)).cast("bigint").alias("w"))
    ).localCheckpoint(eager=True)
    gtot = sym.groupBy("i").agg(F.sum("n").cast("bigint").alias("n_games"))

    p = players.select("i", F.lit(1000000).cast("bigint").alias("p"))
    for _ in range(3):
        pa = p.select("i", F.col("p").alias("pa"))
        pb = p.select(F.col("i").alias("j"), F.col("p").alias("pb"))
        d = (
            sym.join(F.broadcast(pa), "i")
            .join(F.broadcast(pb), "j")
            .select(
                "i",
                F.expr(
                    "(CAST(n AS DECIMAL(38,0)) * 1000000000000) div (pa + pb)"
                ).alias("term"),
            )
            .groupBy("i")
            .agg(F.sum("term").cast("decimal(38,0)").alias("dsum"))
        )
        praw = d.join(wins, "i").select(
            "i",
            F.expr(
                "(CAST(w + 1 AS DECIMAL(38,0)) * 1000000000000000000) div dsum"
            ).alias("praw"),
        )
        praw = praw.localCheckpoint(eager=True)  # reused by tot AND renorm
        tot = praw.agg(F.sum("praw").cast("decimal(38,0)").alias("tot"))
        p = praw.crossJoin(F.broadcast(tot)).select(
            "i",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.expr("(CAST(praw AS DECIMAL(38,0)) * 1000000) div tot").cast(
                    "bigint"
                ),
            ).alias("p"),
        ).localCheckpoint(eager=True)  # consumed twice next round (pa, pb)
    return (
        p.join(gtot, "i")
        .join(wins, "i")
        .select(
            F.col("i").alias("source"),
            "n_games",
            F.col("w").alias("n_wins"),
            F.col("p").alias("strength_e6"),
        )
    )


# =====================================================================
# Multi-rater agreement + sequential rating updates (round 8)
# =====================================================================

#: THREE deterministic annotators over documents (the κ/α pair above is
#: 2-rater by construction; Fleiss needs m ≥ 3): rater 1 = quality-score
#: bands (rq above), rater 2 = length+punct heuristic (rh above),
#: rater 3 = token-volume + stopword-band heuristic — banded on INTEGER
#: comparisons (sw_hits·20 ≥ n_tok ⇔ ratio ≥ 0.05) so no float ratio
#: enters the label. Produces CTE ratings3(doc_id, source, r1, r2, r3),
#: labels in {0,1,2}; prepend the quality CTEs.
_SQL_RATINGS3_CTE = """
    ratings3 AS (
      SELECT d.doc_id, d.source,
             CASE WHEN q.quality >= 0.8 THEN 2
                  WHEN q.quality >= 0.5 THEN 1 ELSE 0 END AS r1,
             CASE WHEN s.n >= 200 AND s.n <= 20000 AND s.p <= 0.2 THEN 2
                  WHEN s.n >= 50 AND s.p <= 0.4 THEN 1 ELSE 0 END AS r2,
             CASE WHEN s.n_tok >= 40 AND s.sw_hits * 20 >= s.n_tok
                       AND s.sw_hits * 10 <= s.n_tok * 6 THEN 2
                  WHEN s.n_tok >= 10 THEN 1 ELSE 0 END AS r3
      FROM documents d
      JOIN qual q ON q.doc_id = d.doc_id
      JOIN sig s ON s.doc_id = d.doc_id
    )"""


def _ratings3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SQL_RATINGS3_CTE."""
    docs = t(spark, sf_dir, "documents")
    q = X.quality_score("text")
    n = X.char_count("text")
    p = X.punct_ratio("text")
    n_tok = X.token_count("text")
    sw = X.stopword_hits("text")
    return docs.select(
        "doc_id",
        "source",
        F.when(q >= 0.8, 2).when(q >= 0.5, 1).otherwise(0).alias("r1"),
        F.when((n >= 200) & (n <= 20000) & (p <= 0.2), 2)
        .when((n >= 50) & (p <= 0.4), 1)
        .otherwise(0)
        .alias("r2"),
        F.when((n_tok >= 40) & (sw * 20 >= n_tok) & (sw * 10 <= n_tok * 6), 2)
        .when(n_tok >= 10, 1)
        .otherwise(0)
        .alias("r3"),
    )


@register(
    "fleiss_kappa_agreement",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS3_CTE},
    m AS (
      SELECT source, count(*) AS n,
             CAST(sum((CASE WHEN r1 = r2 THEN 1 ELSE 0 END)
                    + (CASE WHEN r1 = r3 THEN 1 ELSE 0 END)
                    + (CASE WHEN r2 = r3 THEN 1 ELSE 0 END)) AS BIGINT) AS pairs,
             CAST(sum((CASE WHEN r1 = 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN r2 = 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN r3 = 0 THEN 1 ELSE 0 END)) AS BIGINT) AS c0,
             CAST(sum((CASE WHEN r1 = 1 THEN 1 ELSE 0 END)
                    + (CASE WHEN r2 = 1 THEN 1 ELSE 0 END)
                    + (CASE WHEN r3 = 1 THEN 1 ELSE 0 END)) AS BIGINT) AS c1,
             CAST(sum((CASE WHEN r1 = 2 THEN 1 ELSE 0 END)
                    + (CASE WHEN r2 = 2 THEN 1 ELSE 0 END)
                    + (CASE WHEN r3 = 2 THEN 1 ELSE 0 END)) AS BIGINT) AS c2
      FROM ratings3 GROUP BY source
    )
    SELECT source, n, pairs,
           CASE WHEN 9 * n * n - (c0*c0 + c1*c1 + c2*c2) = 0 THEN NULL
                WHEN 3 * n * pairs - (c0*c0 + c1*c1 + c2*c2) >= 0
                THEN (1000000 * (3 * n * pairs - (c0*c0 + c1*c1 + c2*c2)))
                     // (9 * n * n - (c0*c0 + c1*c1 + c2*c2))
                ELSE -((1000000 * ((c0*c0 + c1*c1 + c2*c2) - 3 * n * pairs))
                       // (9 * n * n - (c0*c0 + c1*c1 + c2*c2)))
           END AS kappa_e6
    FROM m
    """,
)
def fleiss_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ (Fleiss 1971) per source for m = 3 fixed raters, k = 3
    categories — the multi-rater generalization the 2-rater κ/α pair
    above can't express (VERDICT r7 task 6). For m = 3 the per-item
    category multiplicities satisfy Σ_j n_ij² = m + 2·(agreeing pairs),
    so the whole statistic reduces to ONE conditional-aggregate scan:
    with P = Σ_i pairs_i and c_j the pooled category counts,
    κ = (3n·P − Σ_j c_j²) / (9n² − Σ_j c_j²) exactly. Emitted as exact
    integer κ·1e6 with sign-symmetric truncation (Spark div vs DuckDB //
    disagree on floor-vs-trunc for negatives — both sides spell out the
    sign); NULL when the chance term is degenerate (all 3n labels in one
    category). Rater 3 bands on integer cross-multiplications, never a
    float ratio, so label parity is exact by construction.

    Scale: one narrow documents scan → one tiny groupBy(source);
    capacity 9e6·n² < 2⁶³ → n < 1.0e6 docs/source in BIGINT
    (docs/LIMITS.md round-8 note); recast to DECIMAL(38,0) past that."""
    r = _ratings3(spark, sf_dir)
    pairs = (
        F.when(F.col("r1") == F.col("r2"), 1).otherwise(0)
        + F.when(F.col("r1") == F.col("r3"), 1).otherwise(0)
        + F.when(F.col("r2") == F.col("r3"), 1).otherwise(0)
    )
    cs = [
        (
            F.sum(
                F.when(F.col("r1") == k, 1).otherwise(0)
                + F.when(F.col("r2") == k, 1).otherwise(0)
                + F.when(F.col("r3") == k, 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"c{k}")
        )
        for k in (0, 1, 2)
    ]
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pairs).cast("bigint").alias("pairs"),
        *cs,
    )
    csq = F.col("c0") * F.col("c0") + F.col("c1") * F.col("c1") + F.col("c2") * F.col("c2")
    num = 3 * F.col("n") * F.col("pairs") - csq
    den = 9 * F.col("n") * F.col("n") - csq
    kappa = (
        F.when(den == 0, F.lit(None).cast("bigint"))
        .when(num >= 0, F.expr("1000000 * knum div kden"))
        .otherwise(-F.expr("(1000000 * (-knum)) div kden"))
    )
    return (
        m.withColumn("knum", num.cast("bigint"))
        .withColumn("kden", den.cast("bigint"))
        .select("source", "n", "pairs", kappa.cast("bigint").alias("kappa_e6"))
    )


@register(
    "elo_sequential_ratings",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.source,
             CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_e4
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    wl AS (
      SELECT a.doc_id AS match_id,
             CASE WHEN a.q_e4 > b.q_e4 THEN a.source ELSE b.source END AS w,
             CASE WHEN a.q_e4 > b.q_e4 THEN b.source ELSE a.source END AS l
      FROM base a JOIN base b ON b.doc_id = a.doc_id + 37
      WHERE a.source <> b.source AND a.q_e4 <> b.q_e4
    ),
    pm AS (
      SELECT match_id, w AS player, l AS opp, 1.0::DOUBLE AS s FROM wl
      UNION ALL
      SELECT match_id, l AS player, w AS opp, 0.0::DOUBLE AS s FROM wl
    ),
    anchor AS (
      SELECT player AS src,
             (1000000 * CAST(sum(s) AS BIGINT)) // count(*) AS anchor_e6
      FROM pm GROUP BY player
    ),
    zt AS (
      SELECT pm.player, pm.match_id, pm.s,
             (a.anchor_e6 * 2)::DOUBLE + pm.s AS z
      FROM pm JOIN anchor a ON a.src = pm.opp
    ),
    folded AS (
      SELECT player,
             count(*) AS n_matches,
             CAST(sum(s) AS BIGINT) AS n_wins,
             list_reduce(
               list_prepend(500000.0::DOUBLE, list(z ORDER BY match_id)),
               (acc, zz) -> acc + 32000.0::DOUBLE * (
                   (zz - 2.0::DOUBLE * floor(zz * 0.5::DOUBLE))
                 - (0.5::DOUBLE
                    + (acc - floor(zz * 0.5::DOUBLE))
                      / (2.0::DOUBLE * (200000.0::DOUBLE
                                        + abs(acc - floor(zz * 0.5::DOUBLE)))))
               )
             ) AS r
      FROM zt GROUP BY player
    )
    SELECT player AS source, n_matches, n_wins,
           CAST(floor(r) AS BIGINT) AS elo_e6_floor
    FROM folded
    """,
)
def elo_sequential_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elo-style SEQUENTIAL rating updates — the order-dependent twin of
    bradley_terry_strength (VERDICT r7 task 6): same doc_id+37 match
    derivation, but each player's rating evolves match-by-match in
    match_id order, r ← r + K·(S − E), instead of converging to the
    order-free MM fixed point. Decoupled single-pass form (standard for
    large-scale one-pass rating): the opponent side of the expected
    score uses a FIXED per-player anchor (overall win rate in e6 units,
    integer-exact) rather than the opponent's running rating — full
    coupled Elo is a single global serial chain, which no engine can
    parallelize; per-player folds distribute.

    Float-parity design (the ewma_last/holt pattern): each player's
    (anchor_opp, outcome) sequence is packed into one exact double
    z = 2·anchor_e6 + S (both < 2⁵³), the match list is ordered by the
    unique match_id, and BOTH engines evaluate the identical left fold —
    Spark `F.aggregate` with seed 500000.0, DuckDB `list_reduce` with the
    seed prepended (its list_reduce takes no init) — with the identical
    expression tree: E = 0.5 + d/(2·(200000+|d|)), an algebraic S-curve
    built from +,−,×,÷,|·| only (IEEE-exact, bit-identical across
    engines; the classic 10^(d/400) logistic would hit libm-vs-JVM pow
    ULP skew). K = 32000 e6-units ≈ classic K=32.

    Scale shape: one equi-join match pass + two tiny groupBys; the fold
    state is one double per player and the collected per-player match
    list is O(matches/player) — bounded by the pairing density, and the
    same per-group-sequence capacity every ordered fold in this engine
    declares (ewma_last, holt); shard the match timeline past ~1e6
    matches/player."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.floor(X.quality_score("text") * 10000 + 0.5).cast("bigint").alias("q_e4"),
    )
    b = base.select(
        (F.col("doc_id") - 37).alias("doc_id"),
        F.col("source").alias("source_b"),
        F.col("q_e4").alias("q_b"),
    )
    wl = (
        base.join(b, "doc_id")
        .filter((F.col("source") != F.col("source_b")) & (F.col("q_e4") != F.col("q_b")))
        .select(
            F.col("doc_id").alias("match_id"),
            F.when(F.col("q_e4") > F.col("q_b"), F.col("source"))
            .otherwise(F.col("source_b"))
            .alias("w"),
            F.when(F.col("q_e4") > F.col("q_b"), F.col("source_b"))
            .otherwise(F.col("source"))
            .alias("l"),
        )
    )
    # Optimization r12 (guide §2.4): the player/opponent double-entry view
    # is an EXPLODE of each match into its two perspectives — the earlier
    # unionByName ran the quality pass + self-join once per leg, and the
    # explicit player-keyed exchange tried next never deduped (column
    # pruning gives the two consumers different exchange subtrees, so
    # ReuseExchange cannot fire — verified in the formatted plan). Pinning
    # pm materializes the single match pass once for both the anchor
    # aggregate and the scoring probe; identical rows throughout.
    pm = wl.select(
        "match_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("w").alias("player"),
                    F.col("l").alias("opp"),
                    F.lit(1.0).alias("s"),
                ),
                F.struct(
                    F.col("l").alias("player"),
                    F.col("w").alias("opp"),
                    F.lit(0.0).alias("s"),
                ),
            )
        ).alias("e"),
    ).select("match_id", "e.player", "e.opp", "e.s")
    pm = _pin(pm)
    anchor = pm.groupBy(F.col("player").alias("src")).agg(
        F.expr("(1000000 * CAST(sum(s) AS BIGINT)) div count(*)").alias("anchor_e6")
    )
    zt = pm.join(F.broadcast(anchor), pm["opp"] == F.col("src")).select(
        "player",
        "match_id",
        "s",
        ((F.col("anchor_e6") * 2).cast("double") + F.col("s")).alias("z"),
    )

    def _elo_step(acc, zz):
        o = F.floor(zz * F.lit(0.5)).cast("double")
        s = zz - F.lit(2.0) * o
        d = acc - o
        e = F.lit(0.5) + d / (F.lit(2.0) * (F.lit(200000.0) + F.abs(d)))
        return acc + F.lit(32000.0) * (s - e)

    folded = zt.groupBy("player").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.sum("s").cast("bigint").alias("n_wins"),
        F.sort_array(F.collect_list(F.struct("match_id", "z"))).alias("ms"),
    )
    r = F.aggregate(
        F.transform(F.col("ms"), lambda x: x["z"]),
        F.lit(500000.0),
        _elo_step,
    )
    return folded.select(
        F.col("player").alias("source"),
        "n_matches",
        "n_wins",
        F.floor(r).cast("bigint").alias("elo_e6_floor"),
    )


@register(
    "kendall_tau_b_raters",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS_CTE},
    cells AS (
      SELECT source, rq, rh, CAST(count(*) AS BIGINT) AS c
      FROM ratings GROUP BY source, rq, rh
    ),
    pairs AS (
      SELECT a.source,
             CAST(sum(CASE WHEN (a.rq - b.rq) * (a.rh - b.rh) > 0 THEN a.c * b.c
                           WHEN (a.rq - b.rq) * (a.rh - b.rh) < 0 THEN -(a.c * b.c)
                           ELSE 0 END) AS BIGINT) AS cd2
      FROM cells a JOIN cells b ON b.source = a.source
      GROUP BY a.source
    ),
    m AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c) * sum(c)
                  - (SELECT sum(rc * rc) FROM (
                       SELECT sum(c) AS rc FROM cells c2
                       WHERE c2.source = cells.source GROUP BY c2.rq))
               AS BIGINT) AS dx,
             CAST(sum(c) * sum(c)
                  - (SELECT sum(cc * cc) FROM (
                       SELECT sum(c) AS cc FROM cells c3
                       WHERE c3.source = cells.source GROUP BY c3.rh))
               AS BIGINT) AS dy
      FROM cells GROUP BY source
    )
    SELECT m.source, m.n, p.cd2, m.dx, m.dy,
           CASE WHEN m.dx = 0 OR m.dy = 0 THEN NULL
                ELSE CAST(floor((1000000.0 * p.cd2)
                                / sqrt(CAST(m.dx * m.dy AS DOUBLE))) AS BIGINT)
           END AS tau_b_e6
    FROM m JOIN pairs p ON p.source = m.source
    """,
)
def kendall_tau_b_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between the two deterministic raters per source —
    the ORDINAL member of the agreement family (κ/α treat labels as
    nominal; τ-b asks whether the raters ORDER documents the same way,
    which is what matters when bands feed a threshold). Computed from
    the 3×3 contingency table, never from n² document pairs: with cell
    counts c_ij, the ordered-pair concordance sum is
    cd2 = Σ_{{ab}} c_a·c_b·sign((rq_a−rq_b)(rh_a−rh_b)) = 2(C−D), and the
    tie-adjusted denominators are dx = n² − Σ_i r_i², dy = n² − Σ_j c_j²
    (ordered pairs differing in x resp. y), so
    τ_b = cd2 / sqrt(dx·dy) — the textbook (C−D)/√((n₀−Tx)(n₀−Ty)) with
    every term doubled. Emitted as floor(1e6·τ_b): IEEE sqrt and divide
    are correctly rounded (unlike pow/ln), so the double is bit-identical
    across engines given the identical integer inputs, and floor (true
    floor on both) needs no sign gymnastics.

    Scale: one documents scan → one groupBy(source, rq, rh) into ≤ 9
    cells/source; the cell self-join is 81 rows/source. Capacity:
    dx·dy ≤ n⁴ must stay in BIGINT → n < 55k docs/source
    (docs/LIMITS.md round-8 note); recast the product to DOUBLE earlier
    if sources exceed that."""
    r = _ratings(spark, sf_dir)
    cells = r.groupBy("source", "rq", "rh").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # Optimization r12 (guide §2.4): cells is referenced five times below
    # (pair join both sides, row/col marginals, n) — each reference re-ran
    # the ratings scan + aggregate. An explicit source-keyed exchange was
    # tried first and never deduped (column pruning gives each consumer a
    # different exchange subtree, so ReuseExchange cannot fire — verified
    # in the formatted plan: six scans survived). Pinning the ≤9-cells-
    # per-source table materializes the ratings pass once for all five.
    cells = _pin(cells)
    b = cells.select(
        F.col("source").alias("source_b"),
        F.col("rq").alias("rq_b"),
        F.col("rh").alias("rh_b"),
        F.col("c").alias("c_b"),
    )
    sgn = (F.col("rq") - F.col("rq_b")) * (F.col("rh") - F.col("rh_b"))
    pairs = (
        cells.join(b, cells["source"] == b["source_b"])
        .select(
            "source",
            F.when(sgn > 0, F.col("c") * F.col("c_b"))
            .when(sgn < 0, -(F.col("c") * F.col("c_b")))
            .otherwise(F.lit(0))
            .alias("term"),
        )
        .groupBy("source")
        .agg(F.sum("term").cast("bigint").alias("cd2"))
    )
    rows = cells.groupBy("source", "rq").agg(F.sum("c").alias("rc"))
    cols = cells.groupBy("source", "rh").agg(F.sum("c").alias("cc"))
    n = cells.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    dx = rows.groupBy("source").agg(
        F.sum(F.col("rc") * F.col("rc")).cast("bigint").alias("sr2")
    )
    dy = cols.groupBy("source").agg(
        F.sum(F.col("cc") * F.col("cc")).cast("bigint").alias("sc2")
    )
    m = (
        n.join(dx, "source")
        .join(dy, "source")
        .select(
            "source",
            "n",
            (F.col("n") * F.col("n") - F.col("sr2")).cast("bigint").alias("dx"),
            (F.col("n") * F.col("n") - F.col("sc2")).cast("bigint").alias("dy"),
        )
    )
    tau = F.when(
        (F.col("dx") == 0) | (F.col("dy") == 0), F.lit(None).cast("bigint")
    ).otherwise(
        F.floor(
            (F.lit(1000000.0) * F.col("cd2"))
            / F.sqrt((F.col("dx") * F.col("dy")).cast("double"))
        ).cast("bigint")
    )
    return (
        m.join(pairs, "source")
        .select("source", "n", "cd2", "dx", "dy", tau.alias("tau_b_e6"))
    )


@register(
    "quadratic_weighted_kappa",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS_CTE},
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum((rq - rh) * (rq - rh)) AS BIGINT) AS wo,
             CAST(sum(CASE WHEN rq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
             CAST(sum(CASE WHEN rq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
             CAST(sum(CASE WHEN rq = 2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
             CAST(sum(CASE WHEN rh = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             CAST(sum(CASE WHEN rh = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             CAST(sum(CASE WHEN rh = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2
      FROM ratings GROUP BY source
    )
    SELECT source, n, wo,
           (a0*b1 + a1*b0 + a1*b2 + a2*b1 + 4*(a0*b2 + a2*b0)) AS we_n,
           CASE WHEN a0*b1 + a1*b0 + a1*b2 + a2*b1 + 4*(a0*b2 + a2*b0) = 0
                THEN NULL
                WHEN (a0*b1 + a1*b0 + a1*b2 + a2*b1 + 4*(a0*b2 + a2*b0))
                     - n * wo >= 0
                THEN (1000000 * ((a0*b1 + a1*b0 + a1*b2 + a2*b1
                                  + 4*(a0*b2 + a2*b0)) - n * wo))
                     // (a0*b1 + a1*b0 + a1*b2 + a2*b1 + 4*(a0*b2 + a2*b0))
                ELSE -((1000000 * (n * wo - (a0*b1 + a1*b0 + a1*b2 + a2*b1
                                             + 4*(a0*b2 + a2*b0))))
                       // (a0*b1 + a1*b0 + a1*b2 + a2*b1 + 4*(a0*b2 + a2*b0)))
           END AS qwk_e6
    FROM m
    """,
)
def quadratic_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadratic-weighted Cohen's κ (Cohen 1968) per source — the
    ORDINAL-penalty member of the agreement family (plain κ counts a
    0-vs-2 disagreement the same as 1-vs-2; QWK weights it 4×, which is
    why it is the standard metric for graded/essay-style labels).
    κ_w = 1 − Σ w_ij·O_ij / Σ w_ij·E_ij with w_ij = (i−j)² and
    E_ij = a_i·b_j/n from the marginals; clearing the 1/n gives exact
    integers: qwk·1e6 = (W_E − n·W_O) tdiv W_E where
    W_O = Σ docs (rq−rh)² (one conditional sum) and
    W_E = Σ_ij (i−j)²·a_i·b_j = a0b1+a1b0+a1b2+a2b1+4(a0b2+a2b0)
    (the k = 3 expansion spelled out). Sign-symmetric truncation as in
    cohen_kappa_agreement; NULL when the raters' marginals make every
    expected disagreement zero (W_E = 0: both raters constant).

    Scale: ONE conditional-aggregate scan — identical shape to κ/α.
    Capacity: 1e6·W_E ≤ 4e6·n² < 2⁶³ → n < 1.5e6 docs/source
    (docs/LIMITS.md round-8 note)."""
    r = _ratings(spark, sf_dir)
    conds = [
        F.sum(F.when(F.col("rq") == k, 1).otherwise(0)).cast("bigint").alias(f"a{k}")
        for k in (0, 1, 2)
    ] + [
        F.sum(F.when(F.col("rh") == k, 1).otherwise(0)).cast("bigint").alias(f"b{k}")
        for k in (0, 1, 2)
    ]
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("rq") - F.col("rh")) * (F.col("rq") - F.col("rh")))
        .cast("bigint")
        .alias("wo"),
        *conds,
    )
    we = (
        F.col("a0") * F.col("b1")
        + F.col("a1") * F.col("b0")
        + F.col("a1") * F.col("b2")
        + F.col("a2") * F.col("b1")
        + 4 * (F.col("a0") * F.col("b2") + F.col("a2") * F.col("b0"))
    )
    num = we - F.col("n") * F.col("wo")
    qwk = (
        F.when(we == 0, F.lit(None).cast("bigint"))
        .when(num >= 0, F.expr("1000000 * qnum div qden"))
        .otherwise(-F.expr("(1000000 * (-qnum)) div qden"))
    )
    return (
        m.withColumn("qnum", num.cast("bigint"))
        .withColumn("qden", we.cast("bigint"))
        .select(
            "source",
            "n",
            "wo",
            F.col("qden").alias("we_n"),
            qwk.cast("bigint").alias("qwk_e6"),
        )
    )


@register(
    "mcc_binary_quality",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS_CTE},
    m AS (
      SELECT source,
             CAST(sum(CASE WHEN rq >= 1 AND rh >= 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN rq = 0 AND rh >= 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN rq >= 1 AND rh = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(sum(CASE WHEN rq = 0 AND rh = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS tn
      FROM ratings GROUP BY source
    )
    SELECT source, tp, fp, fn, tn,
           CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0 OR (tn+fn) = 0
                THEN NULL
                ELSE CAST(floor(1000000.0 * CAST(tp*tn - fp*fn AS DOUBLE)
                       / sqrt(CAST((tp+fp)*(tp+fn) AS DOUBLE)
                              * CAST((tn+fp)*(tn+fn) AS DOUBLE)))
                     AS BIGINT)
           END AS mcc_e6
    FROM m
    """,
)
def mcc_binary_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient (Matthews 1975) per source between
    the two deterministic raters BINARIZED at the keep/drop line
    (label ≥ 1) — the balanced-accuracy summary a quality-filter audit
    reports when the keep rate is skewed and raw agreement is inflated
    by the majority class (the exact failure mode κ corrects one way and
    MCC another; both gated pins the confusion-matrix plumbing).

    Exactness: the confusion counts are exact integers from one scan;
    MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) is evaluated
    as ONE fixed expression over those integers — the two pair-products
    are formed in BIGINT then cast to DOUBLE, and IEEE sqrt/divide are
    correctly rounded, so the emitted floor is engine-identical (the
    kendall_tau_b_raters discipline — sqrt is parity-safe, pow/ln are
    not). NULL when any marginal is empty (MCC undefined).

    Scale: one narrow scan → one tiny groupBy(source). Capacity: each
    pair-product ≤ n²/4 in BIGINT → n < 6.1e9 docs/source before the
    BIGINT product wraps; the double mantissa loses exactness past
    products of 2⁵³ (n ≈ 1.9e8) where the floor may differ by 1 ulp —
    recast both engines to DECIMAL/higher precision past that
    (docs/LIMITS.md round-8 note)."""
    r = _ratings(spark, sf_dir)
    m = r.groupBy("source").agg(
        F.sum(F.when((F.col("rq") >= 1) & (F.col("rh") >= 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when((F.col("rq") == 0) & (F.col("rh") >= 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("rq") >= 1) & (F.col("rh") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("rq") == 0) & (F.col("rh") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    degenerate = (
        ((F.col("tp") + F.col("fp")) == 0)
        | ((F.col("tp") + F.col("fn")) == 0)
        | ((F.col("tn") + F.col("fp")) == 0)
        | ((F.col("tn") + F.col("fn")) == 0)
    )
    mcc = F.floor(
        F.lit(1000000.0)
        * (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")).cast("double")
        / F.sqrt(
            ((F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn"))).cast("double")
            * ((F.col("tn") + F.col("fp")) * (F.col("tn") + F.col("fn"))).cast("double")
        )
    ).cast("bigint")
    return m.select(
        "source",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(degenerate, F.lit(None).cast("bigint")).otherwise(mcc).alias("mcc_e6"),
    )


@register(
    "cochran_q_test",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS3_CTE},
    b AS (
      SELECT source,
             CASE WHEN r1 >= 1 THEN 1 ELSE 0 END AS b1,
             CASE WHEN r2 >= 1 THEN 1 ELSE 0 END AS b2,
             CASE WHEN r3 >= 1 THEN 1 ELSE 0 END AS b3
      FROM ratings3
    ),
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(b1) AS BIGINT) AS c1,
             CAST(sum(b2) AS BIGINT) AS c2,
             CAST(sum(b3) AS BIGINT) AS c3,
             CAST(sum((b1 + b2 + b3) * (b1 + b2 + b3)) AS BIGINT) AS sr2
      FROM b GROUP BY source
    )
    SELECT source, n, c1, c2, c3,
           CASE WHEN 3 * (c1 + c2 + c3) - sr2 = 0 THEN NULL
                ELSE (1000000 * (2 * (3 * (c1*c1 + c2*c2 + c3*c3)
                                      - (c1 + c2 + c3) * (c1 + c2 + c3))))
                     // (3 * (c1 + c2 + c3) - sr2)
           END AS q_e6
    FROM m
    """,
)
def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (Cochran 1950) per source for the k = 3 raters
    BINARIZED at the keep/drop line — the significance-test member of
    the agreement family: Fleiss' κ says HOW MUCH the raters agree,
    Q says whether their keep RATES differ at all (the k-sample
    generalization of McNemar). Q = (k−1)(kΣC_j² − N²)/(kN − ΣR_i²)
    with column totals C_j, row totals R_i, N = ΣC.

    Exact integers end to end: both the numerator (non-negative by
    Cauchy-Schwarz) and the denominator ΣR_i(3−R_i) (non-negative
    termwise) are BIGINTs from one conditional-aggregate scan, so
    Q·1e6 is a truncating division identical on both engines; NULL
    when every document is unanimous (denominator 0 — Q undefined).

    Scale: one scan → one tiny groupBy(source). Capacity:
    1e6·6·N² < 2⁶³ → N = 3n < 1.2e9 ratings/source in BIGINT
    (docs/LIMITS.md round-8 note)."""
    r = _ratings3(spark, sf_dir)
    b = r.select(
        "source",
        *[
            F.when(F.col(f"r{j}") >= 1, 1).otherwise(0).alias(f"b{j}")
            for j in (1, 2, 3)
        ],
    )
    rsum = F.col("b1") + F.col("b2") + F.col("b3")
    m = b.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("b1").cast("bigint").alias("c1"),
        F.sum("b2").cast("bigint").alias("c2"),
        F.sum("b3").cast("bigint").alias("c3"),
        F.sum(rsum * rsum).cast("bigint").alias("sr2"),
    )
    ctot = F.col("c1") + F.col("c2") + F.col("c3")
    csq = F.col("c1") * F.col("c1") + F.col("c2") * F.col("c2") + F.col("c3") * F.col("c3")
    num = 2 * (3 * csq - ctot * ctot)
    den = 3 * ctot - F.col("sr2")
    m2 = m.withColumn("qnum", num.cast("bigint")).withColumn("qden", den.cast("bigint"))
    q = F.when(F.col("qden") == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr("(1000000 * qnum) div qden")
    )
    return m2.select("source", "n", "c1", "c2", "c3", q.cast("bigint").alias("q_e6"))


@register(
    "cronbach_alpha_raters",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS3_CTE},
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r1) AS BIGINT) AS s1,
             CAST(sum(r2) AS BIGINT) AS s2,
             CAST(sum(r3) AS BIGINT) AS s3,
             CAST(sum(r1*r1) AS BIGINT) AS q1,
             CAST(sum(r2*r2) AS BIGINT) AS q2,
             CAST(sum(r3*r3) AS BIGINT) AS q3,
             CAST(sum((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS qt
      FROM ratings3 GROUP BY source
    ),
    v AS (
      SELECT source, n,
             (n * q1 - s1*s1) + (n * q2 - s2*s2) + (n * q3 - s3*s3) AS sv,
             n * qt - (s1 + s2 + s3) * (s1 + s2 + s3) AS st
      FROM m
    )
    SELECT source, n, sv, st,
           CASE WHEN st = 0 THEN NULL
                WHEN st - sv >= 0
                THEN (1000000 * 3 * (st - sv)) // (2 * st)
                ELSE -((1000000 * 3 * (sv - st)) // (2 * st))
           END AS alpha_e6
    FROM v
    """,
)
def cronbach_alpha_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α (Cronbach 1951) per source treating the 3 raters as
    items of one instrument — the internal-consistency RELIABILITY view
    the agreement family lacks: κ asks "do raters give the same label",
    α asks "do their scores covary enough that the summed score is a
    reliable measurement" (the standard report line for any rubric).
    α = k/(k−1)·(1 − ΣV_j/V_T); with k = 3, α = (3/2)·(V_T − ΣV_j)/V_T.

    Exact integers: every variance appears only through the cleared
    form n·Σx² − (Σx)² (the 1/(n(n−1)) denominators cancel in the
    ratio), so α·1e6 = (3e6·(S_T − ΣS_j)) tdiv (2·S_T) over BIGINTs,
    sign-symmetric truncation (α < 0 = negative average covariance),
    NULL when the total score has zero variance. S_T − ΣS_j = 2·Σ of
    pairwise cleared covariances — α and the κ family disagreeing
    flags marginal-structure pathologies either alone would hide.

    Scale: one scan → one tiny groupBy(source). Capacity:
    3e6·S_T ≤ 3e6·36n² < 2⁶³ → n < 9.2e6 docs/source in BIGINT
    (docs/LIMITS.md round-8 note); recast to DECIMAL(38,0) past that."""
    r = _ratings3(spark, sf_dir)
    tot = F.col("r1") + F.col("r2") + F.col("r3")
    m = r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(f"r{j}").cast("bigint").alias(f"s{j}") for j in (1, 2, 3)],
        *[
            F.sum(F.col(f"r{j}") * F.col(f"r{j}")).cast("bigint").alias(f"q{j}")
            for j in (1, 2, 3)
        ],
        F.sum(tot * tot).cast("bigint").alias("qt"),
    )
    n = F.col("n")
    sv = sum(
        n * F.col(f"q{j}") - F.col(f"s{j}") * F.col(f"s{j}") for j in (1, 2, 3)
    )
    stot = F.col("s1") + F.col("s2") + F.col("s3")
    st = n * F.col("qt") - stot * stot
    v = m.withColumn("sv", sv.cast("bigint")).withColumn("st", st.cast("bigint"))
    alpha = (
        F.when(F.col("st") == 0, F.lit(None).cast("bigint"))
        .when(
            F.col("st") - F.col("sv") >= 0,
            F.expr("(1000000 * 3 * (st - sv)) div (2 * st)"),
        )
        .otherwise(-F.expr("(1000000 * 3 * (sv - st)) div (2 * st)"))
    )
    return v.select("source", "n", "sv", "st", alpha.cast("bigint").alias("alpha_e6"))


# =====================================================================
# Best-of-n reward curve: inference-time-scaling eval via exact order
# statistics over the empirical reward distribution.
# =====================================================================

_BON_NS = (1, 2, 4, 8)


def _bon_pow_sql(base: str) -> str:
    """CASE arm computing base^n for n in 1/2/4/8 by repeated squaring —
    HUGEINT-exact, no pow()."""
    b = f"CAST({base} AS HUGEINT)"
    return (
        f"CASE WHEN n = 1 THEN {b} WHEN n = 2 THEN {b} * {b} "
        f"WHEN n = 4 THEN ({b} * {b}) * ({b} * {b}) "
        f"ELSE (({b} * {b}) * ({b} * {b})) * (({b} * {b}) * ({b} * {b})) END"
    )


@register(
    "best_of_n_reward_curve",
    f"""
    WITH {_SQL_QUALITY_CTES},
    r AS (
      SELECT d.source, CAST(floor(q.quality * 10000) AS BIGINT) AS r
      FROM qual q JOIN documents d ON d.doc_id = q.doc_id
      WHERE d.source IS NOT NULL
    ),
    dist AS (
      SELECT source, r, CAST(count(*) AS BIGINT) AS cnt
      FROM r GROUP BY source, r
    ),
    cum AS (
      SELECT source, r, cnt,
             CAST(sum(cnt) OVER (PARTITION BY source ORDER BY r) AS BIGINT)
               AS cle
      FROM dist
    ),
    ns AS (SELECT unnest([1, 2, 4, 8]) AS n),
    terms AS (
      SELECT source, n,
             CAST(r AS HUGEINT)
               * ({_bon_pow_sql('cle')} - {_bon_pow_sql('cle - cnt')})
               AS term
      FROM cum CROSS JOIN ns
    ),
    nd AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs FROM dist
           GROUP BY source)
    SELECT t.source, CAST(t.n AS BIGINT) AS n, nd.n_docs,
           CAST(sum(t.term) // {_bon_pow_sql('nd.n_docs')} AS BIGINT)
             AS bon_emax_e4
    FROM terms t JOIN nd ON nd.source = t.source
    GROUP BY t.source, t.n, nd.n_docs
    """,
)
def best_of_n_reward_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n expected-maximum reward curve per source — the
    inference-time-scaling eval primitive (how much does quality improve
    when you sample n candidates and keep the best?): for n = 1/2/4/8,
    E[max of n i.i.d. draws from the source's empirical reward
    distribution] = sum_r r * (P(X<=r)^n - P(X<r)^n), computed EXACTLY
    from cumulative counts as sum_r r * (cle^n - clt^n) / N^n — the same
    closed-form-over-order-statistics family as pass_at_k_estimates
    (which answers the binary-success version; this one is
    real-valued). Rewards are the proven heuristic quality score
    (doc_quality_scores' bit-identical double), quantized to e4.

    Exactness: powers by repeated squaring in DECIMAL(38,0)/HUGEINT —
    the pass_at_k wide-integer discipline; every term and the final
    truncating division are exact integers on both engines (all
    positive, so div == floor). Capacity: r * N^8 < 10^38 holds to
    N ~ 5e3 docs per source (documented, enforced by data scale at test
    SFs); past that, pre-bin rewards to quantiles or cap n at 4 —
    the estimator's precision gain above that is nil.

    Scale shape: one documents scan -> groupBy(source, r) — the reward
    distribution is tiny (the band lattice yields <= 36 distinct
    rewards/source) -> a source-keyed cumulative window over those few
    rows -> a 4x fan-out over n values -> source-keyed rollup. Nothing
    row-scale after the first aggregate."""
    docs = t(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    r = docs.select(
        "source",
        F.floor(X.quality_score("text") * 10000).cast("bigint").alias("r"),
    )
    dist = r.groupBy("source", "r").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # dist feeds BOTH the cumulative lattice and the per-source totals —
    # pin it so the documents scan (quality scoring is the expensive
    # part) runs once, not twice (the t_closeness single-scan lesson).
    dist = _pin(dist)
    w = (
        Window.partitionBy("source")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dist.withColumn("cle", F.sum("cnt").over(w).cast("bigint"))
    ns = spark.createDataFrame([(n,) for n in _BON_NS], "n int")

    def _pow(base: str) -> str:
        b = f"CAST({base} AS DECIMAL(38,0))"
        return (
            f"CASE WHEN n = 1 THEN {b} WHEN n = 2 THEN {b} * {b} "
            f"WHEN n = 4 THEN ({b} * {b}) * ({b} * {b}) "
            f"ELSE (({b} * {b}) * ({b} * {b})) * (({b} * {b}) * ({b} * {b})) END"
        )

    terms = (
        cum.crossJoin(F.broadcast(ns))
        .withColumn("clt", F.col("cle") - F.col("cnt"))
        .select(
            "source",
            "n",
            F.expr(
                f"CAST(r AS DECIMAL(38,0)) * ({_pow('cle')} - ({_pow('clt')}))"
            ).alias("term"),
        )
    )
    nd = dist.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("n_docs"))
    return (
        terms.groupBy("source", "n")
        .agg(F.sum("term").alias("num"))
        .join(F.broadcast(nd), "source")
        .select(
            "source",
            F.col("n").cast("bigint").alias("n"),
            "n_docs",
            F.expr(f"CAST(num div ({_pow('n_docs')}) AS BIGINT)").alias(
                "bon_emax_e4"
            ),
        )
    )


# =====================================================================
# GRPO group-relative advantages (RL post-training data prep)
# =====================================================================

@register(
    "grpo_group_advantages",
    """
    WITH q AS (
      SELECT user_id, event_type,
             CAST(floor("value" * 100) AS BIGINT) AS r
      FROM events
      WHERE "value" IS NOT NULL AND user_id IS NOT NULL
        AND event_type IS NOT NULL
    ),
    w AS (
      SELECT event_type, r,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_g,
             CAST(sum(r) OVER (PARTITION BY user_id) AS BIGINT) AS s_g,
             CAST(sum(r * r) OVER (PARTITION BY user_id) AS BIGINT) AS q_g
      FROM q
    ),
    adv AS (
      SELECT event_type,
             CASE WHEN n_g >= 2
                       AND q_g / CAST(n_g AS DOUBLE)
                           - (s_g / CAST(n_g AS DOUBLE))
                             * (s_g / CAST(n_g AS DOUBLE)) > 0.0
                  THEN CAST(floor(10000.0
                       * ((r - s_g / CAST(n_g AS DOUBLE))
                          / sqrt(q_g / CAST(n_g AS DOUBLE)
                                 - (s_g / CAST(n_g AS DOUBLE))
                                   * (s_g / CAST(n_g AS DOUBLE)))))
                       AS BIGINT)
                  ELSE NULL
             END AS adv_e4
      FROM w
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN adv_e4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_degenerate,
           CAST(sum(CASE WHEN adv_e4 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(coalesce(adv_e4, 0)) AS BIGINT) AS sum_adv_e4,
           CAST(sum(abs(coalesce(adv_e4, 0))) AS BIGINT) AS sum_abs_adv_e4,
           CAST(sum(CASE WHEN abs(coalesce(adv_e4, 0)) >= 20000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_2sigma
    FROM adv GROUP BY event_type
    """,
)
def grpo_group_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage normalization (the GRPO estimator of Shao
    et al. 2024, "DeepSeekMath", public arXiv 2402.03300): rewards are
    standardized WITHIN their prompt group — advantage
    A_i = (r_i - mean_g) / std_g with the group's own population std —
    instead of against a learned value baseline. Groups are user_id
    (the repo's standing "n samples per prompt" analogue), rewards are
    value cents; the rollup audits the normalized advantage distribution
    per event type: share positive, mass, degenerate groups
    (singleton or zero-variance -> NULL advantage = zero gradient in
    GRPO), and the >2-sigma tail a reward-hacking sweep reads.

    Exactness: the per-group moment sums are exact BIGINT WINDOW sums
    keyed by user_id (no order -> whole-partition frame, one shuffle);
    each row's advantage is then a closed-form double over its three
    exact integers (mean/var/sqrt in the pinned expression order — the
    welch discipline), floored at 1e4 per row BEFORE the event-type
    aggregate, so only integers cross the final shuffle. Var > 0 is
    tested on the same double expression both engines evaluate.
    Capacity: q_g = sum r^2 < 2^63 -> ~9e8 rows per user at |value| <=
    1000 (docs/LIMITS.md).

    Scale shape: one scan -> keyed window on user_id (the group key —
    never a global window) -> map-side-combinable groupBy(event_type).
    At 100 TB the group cardinality is the prompt count: uniform keys,
    bounded group size (samples-per-prompt), no skew risk."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    q = ev.select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("r"),
    )
    wg = Window.partitionBy("user_id")
    w = q.select(
        "event_type",
        "r",
        F.count(F.lit(1)).over(wg).cast("bigint").alias("n_g"),
        F.sum("r").over(wg).cast("bigint").alias("s_g"),
        F.sum(F.col("r") * F.col("r")).over(wg).cast("bigint").alias("q_g"),
    )
    nd = F.col("n_g").cast("double")
    mean = F.col("s_g") / nd
    var = F.col("q_g") / nd - mean * mean
    adv_e4 = F.when(
        (F.col("n_g") >= 2) & (var > 0.0),
        F.floor(10000.0 * ((F.col("r") - mean) / F.sqrt(var))).cast("bigint"),
    ).otherwise(F.lit(None).cast("bigint"))
    adv = w.select("event_type", adv_e4.alias("adv_e4"))
    return adv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("adv_e4").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_degenerate"),
        F.sum(F.when(F.col("adv_e4") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.coalesce(F.col("adv_e4"), F.lit(0)))
        .cast("bigint")
        .alias("sum_adv_e4"),
        F.sum(F.abs(F.coalesce(F.col("adv_e4"), F.lit(0))))
        .cast("bigint")
        .alias("sum_abs_adv_e4"),
        F.sum(
            F.when(F.abs(F.coalesce(F.col("adv_e4"), F.lit(0))) >= 20000, 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_over_2sigma"),
    )


# =====================================================================
# DoReMi domain-weight iteration (training-mixture optimization)
# =====================================================================

def _sql_doremi_iter(prev: str, out: str) -> str:
    """One exponentiated-gradient step over the bounded domain table:
    u = floor(w * exp(excess)), then renormalize to 1e6 via truncating
    integer division — all cross-domain sums are exact integers."""
    return f"""
    u_{out} AS (
      SELECT source, excess_e6,
             CAST(floor(w_e6 * exp(excess_e6 / 1000000.0)) AS BIGINT) AS u
      FROM {prev}
    ),
    {out} AS (
      SELECT source, excess_e6,
             CAST((1000000 * u) // (SELECT sum(u) FROM u_{out}) AS BIGINT) AS w_e6
      FROM u_{out}
    )"""


@register(
    "doremi_domain_weights",
    f"""
    WITH d AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sc
      FROM documents GROUP BY source
    ),
    g AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot,
                 CAST(sum(sc) AS BIGINT) AS sc_tot FROM d),
    w0 AS (
      SELECT source, n_docs,
             CAST(floor(1000000.0 * greatest(
               ln(1.0 + sc / CAST(n_docs AS DOUBLE))
               - ln(1.0 + sc_tot / CAST(n_tot AS DOUBLE)), 0.0)) AS BIGINT)
               AS excess_e6,
             CAST(1000000 AS BIGINT) AS w_e6
      FROM d CROSS JOIN g
    ),
    {_sql_doremi_iter("w0", "w1")},
    {_sql_doremi_iter("w1", "w2")},
    {_sql_doremi_iter("w2", "w3")}
    SELECT w0.source, w0.n_docs, w0.excess_e6,
           w1.w_e6 AS w1_e6, w2.w_e6 AS w2_e6, w3.w_e6 AS w3_e6
    FROM w0 JOIN w1 ON w1.source = w0.source
            JOIN w2 ON w2.source = w0.source
            JOIN w3 ON w3.source = w0.source
    """,
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, public arXiv
    2305.10429): 3 unrolled exponentiated-gradient steps
    w <- normalize(w * exp(eta * excess_loss)) over the source domains,
    eta = 1. The excess-loss signal here is a deterministic stand-in
    (per-domain mean-length log gap over the global mean, clamped at 0 —
    DoReMi's clip of proxy-minus-reference loss), because the engine's
    job is the ITERATION MECHANISM: the real per-domain losses arrive as
    a table from the proxy-model run and drop into the same plan.

    Exactness: weights live as 1e6-scaled BIGINTs; each step multiplies
    by the per-domain double exp() (deterministic per row — excess is a
    frozen quantized integer) and floors back to integers, and the
    normalizer is an exact integer sum over the bounded domain table
    followed by truncating division. Both engines execute the identical
    3-step unroll, so the weights match hash-exact. Overflow: u <=
    1e6 * e^excess; excess <= ln(max/min mean length) — single-digit —
    so u stays far under 2^63 (docs/LIMITS.md).

    Scale shape: ONE corpus scan (the per-domain count/sum); everything
    after runs on the domain table (bounded by the source vocabulary),
    where the unbounded window is over provably bounded rows — the
    repo's tiny-rollup convention. At 100 TB: scan cost only."""
    d = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sc"),
        )
    )
    g = d.agg(
        F.sum("n_docs").cast("bigint").alias("n_tot"),
        F.sum("sc").cast("bigint").alias("sc_tot"),
    )
    excess = F.floor(
        1000000.0
        * F.greatest(
            F.log(1.0 + F.col("sc") / F.col("n_docs").cast("double"))
            - F.log(1.0 + F.col("sc_tot") / F.col("n_tot").cast("double")),
            F.lit(0.0),
        )
    ).cast("bigint")
    cur = (
        d.crossJoin(F.broadcast(g))
        .select(
            "source",
            "n_docs",
            excess.alias("excess_e6"),
            F.lit(1000000).cast("bigint").alias("w_e6"),
        )
    )
    cur = _pin(cur)  # the domain table feeds every unrolled step
    out = cur.select("source", "n_docs", "excess_e6")
    for i in (1, 2, 3):
        u = cur.select(
            "source",
            "n_docs",
            "excess_e6",
            F.floor(
                F.col("w_e6") * F.exp(F.col("excess_e6") / 1000000.0)
            )
            .cast("bigint")
            .alias("u"),
        )
        stepped = u.select(
            "source",
            "n_docs",
            "excess_e6",
            F.expr(f"(1000000 * u) div (sum(u) OVER ())").cast("bigint").alias("w_e6"),
        )
        out = out.join(
            stepped.select("source", F.col("w_e6").alias(f"w{i}_e6")), "source"
        )
        cur = stepped
    return out.select("source", "n_docs", "excess_e6", "w1_e6", "w2_e6", "w3_e6")


@register(
    "friedman_test",
    f"""
    WITH {_SQL_QUALITY_CTES},
    {_SQL_RATINGS3_CTE},
    dm AS (
      SELECT source,
             2 * ((CASE WHEN r2 < r1 THEN 1 ELSE 0 END)
                  + (CASE WHEN r3 < r1 THEN 1 ELSE 0 END))
               + 1 + (CASE WHEN r2 = r1 THEN 1 ELSE 0 END)
               + (CASE WHEN r3 = r1 THEN 1 ELSE 0 END) + 1 AS d1,
             2 * ((CASE WHEN r1 < r2 THEN 1 ELSE 0 END)
                  + (CASE WHEN r3 < r2 THEN 1 ELSE 0 END))
               + 1 + (CASE WHEN r1 = r2 THEN 1 ELSE 0 END)
               + (CASE WHEN r3 = r2 THEN 1 ELSE 0 END) + 1 AS d2,
             2 * ((CASE WHEN r1 < r3 THEN 1 ELSE 0 END)
                  + (CASE WHEN r2 < r3 THEN 1 ELSE 0 END))
               + 1 + (CASE WHEN r1 = r3 THEN 1 ELSE 0 END)
               + (CASE WHEN r2 = r3 THEN 1 ELSE 0 END) + 1 AS d3
      FROM ratings3
    ),
    m AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d1) AS BIGINT) AS rs1,
             CAST(sum(d2) AS BIGINT) AS rs2,
             CAST(sum(d3) AS BIGINT) AS rs3,
             CAST(sum(d1*d1 + d2*d2 + d3*d3) AS BIGINT) AS sd2
      FROM dm GROUP BY source
    )
    SELECT source, n, rs1, rs2, rs3,
           CASE WHEN sd2 - 48 * n = 0 THEN NULL
                ELSE (1000000 * 2 * ((rs1 - 4*n) * (rs1 - 4*n)
                                     + (rs2 - 4*n) * (rs2 - 4*n)
                                     + (rs3 - 4*n) * (rs3 - 4*n)))
                     // (sd2 - 48 * n)
           END AS chi2_e6
    FROM m
    """,
)
def friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (Friedman 1937) per source for the k = 3 raters
    over doc blocks — the repeated-measures member that completes the
    omnibus family: kruskal_wallis_h handles INDEPENDENT groups,
    cochran_q_test BINARY related outcomes, Friedman ORDINAL related
    outcomes (each document is a block; the raters are ranked within
    it). Conover's tie-corrected form:
    chi2 = (k-1) * sum_j (R_j - n(k+1)/2)^2 / (A - nk(k+1)^2/4).

    Exact integers end to end: within-block midranks need no window —
    for 3 values the DOUBLED midrank of v_j is 2*(#less) + (#equal
    incl self) + 1 (2/4/6 untied, halves become odd integers), pure
    CASE arithmetic on the row. In doubled units the statistic clears
    to chi2 = 2 * sum_j (R_j - 4n)^2 / (sum d^2 - 48n): one truncating
    e6 division, NULL when every block is fully tied (denominator 0 —
    no-ties sanity: sum d^2 = 56n gives the textbook
    sum(R_j - 4n)^2 / 4n). Capacity: 2e6*(R_j-4n)^2 <= 8e6*n^2 < 2^63
    -> n < 1.0e6 docs/source in BIGINT; DECIMAL(38,0) past that
    (docs/LIMITS.md).

    Scale shape: ONE scan, zero joins, zero windows — the rank CASEs
    are per-row expressions and the rollup is a tiny groupBy(source)."""
    r = _ratings3(spark, sf_dir)

    def dub(j: int, a: int, b: int):
        vj, va, vb = F.col(f"r{j}"), F.col(f"r{a}"), F.col(f"r{b}")
        less = (va < vj).cast("int") + (vb < vj).cast("int")
        eq = (va == vj).cast("int") + (vb == vj).cast("int")
        return (2 * less + eq + 2).alias(f"d{j}")

    dm = r.select("source", dub(1, 2, 3), dub(2, 1, 3), dub(3, 1, 2))
    m = dm.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d1").cast("bigint").alias("rs1"),
        F.sum("d2").cast("bigint").alias("rs2"),
        F.sum("d3").cast("bigint").alias("rs3"),
        F.sum(
            F.col("d1") * F.col("d1")
            + F.col("d2") * F.col("d2")
            + F.col("d3") * F.col("d3")
        )
        .cast("bigint")
        .alias("sd2"),
    )
    den = F.col("sd2") - 48 * F.col("n")
    chi2 = F.when(den == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr(
            "(1000000 * 2 * ((rs1 - 4*n) * (rs1 - 4*n)"
            " + (rs2 - 4*n) * (rs2 - 4*n)"
            " + (rs3 - 4*n) * (rs3 - 4*n))) div (sd2 - 48 * n)"
        )
    )
    return m.select(
        "source", "n", "rs1", "rs2", "rs3", chi2.cast("bigint").alias("chi2_e6")
    )
