"""Training-data pipeline queries (dedup / similarity / text analysis) over
the driver's `documents` and `embeddings` tables, with DuckDB oracles where
the semantics are SQL-expressible.

MinHash / SimHash signatures depend on xxhash64 (JVM-only), so their queries
have no SQL oracle (driver records rows-only checks) — but their *semantics*
are cross-checked in pytest against the exact n-gram-Jaccard operator, which
IS oracle-checked here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_data_etl_spark.functions import text as X
from storm_data_etl_spark.functions import vectors as V
from storm_data_etl_spark.operators import dedup as D
from storm_data_etl_spark.operators import multimodal as MM
from storm_data_etl_spark.operators import sampling as SP
from storm_data_etl_spark.operators import similarity as S
from storm_data_etl_spark.plans.queries import register
from storm_data_etl_spark.plans.tables import t
from storm_data_etl_spark.session import pin as _pin

# Shared normalization, duplicated in SQL: lower → non-alnum runs → ' ' → trim.
_SQL_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9À-ɏ一-鿿]+', ' ', 'g'))"


def _sql_cosine(a: str, b: str) -> str:
    """DuckDB cosine mirroring functions.vectors.cosine's exact IEEE op
    sequence: left-to-right fold for dot and squared norms over DOUBLE
    elements, sqrt of each norm, dot/(na*nb). list_reduce folds
    ((e1+e2)+e3)… which equals Spark's aggregate fold seeded with 0.0
    (0.0+e1 == e1), so the two engines produce bit-identical doubles —
    builtin list_cosine_similarity is NOT used because its internal
    accumulation order is unspecified."""
    return (
        f"(list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
        f" / (sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"
        f" * sqrt(list_reduce(list_transform({b}, x -> x * x), (x, y) -> x + y))))"
    )


@register(
    "doc_token_stats",
    f"""
    WITH toks AS (
      SELECT lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             length(text) AS n_chars
      FROM documents WHERE trim(text) <> ''
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(n_tokens), 4) AS avg_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM toks GROUP BY lang
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting at corpus scale: per-language doc counts, average
    token/char lengths, total token budget. One scan + tiny hash agg."""
    docs = t(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(X.token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.sum(X.token_count("text")).alias("total_tokens"),
    )


@register(
    "doc_quality_filter",
    f"""
    WITH q AS (
      SELECT doc_id, length(text) AS n_chars,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9_\\s]'))::DOUBLE / length(text)
             END AS punct_ratio
      FROM documents
    )
    SELECT doc_id, n_chars, round(punct_ratio, 6) AS punct_ratio
    FROM q WHERE n_chars >= 100 AND punct_ratio <= 0.1
    """,
)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal filter: keep docs by length band + punctuation ratio.
    (The composite quality_score is Spark-side; this query pins the shared
    primitive signals against SQL.) Note \\w in Java covers [A-Za-z0-9_]."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        )
        .filter((F.col("n_chars") >= 100) & (F.col("punct_ratio") <= 0.1))
    )


@register(
    "doc_fingerprint_dedup",
    f"""
    WITH fp AS (
      SELECT doc_id, md5({_SQL_NORM}) AS fingerprint FROM documents
    ),
    grouped AS (
      SELECT fingerprint, min(doc_id) AS keeper_id, count(*) AS dup_count
      FROM fp GROUP BY fingerprint
    )
    SELECT count(*) AS n_unique,
           CAST(sum(dup_count) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN dup_count > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups
    FROM grouped
    """,
)
def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 content fingerprint: unique count, total, dup
    groups. The keeper-selection window itself (first-wins) is exercised in
    operators.dedup.exact_dedup; this aggregates its effect."""
    docs = t(spark, sf_dir, "documents")
    kept = D.exact_dedup(docs)
    return kept.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("dup_count").alias("n_total"),
        F.count(F.when(F.col("dup_count") > 1, 1)).alias("n_dup_groups"),
    )


def _sql_shingles(k: int = 3) -> str:
    """DuckDB word-k-gram shingle list over the normalized text (distinct).
    Mirrors functions.text.shingles: short docs yield the whole text."""
    return f"""
      CASE WHEN len(words) >= {k}
           THEN list_distinct(list_transform(range(1, len(words) - {k} + 2),
                              i -> array_to_string(words[i:i+{k - 1}], ' ')))
           ELSE [array_to_string(words, ' ')] END"""


def _sql_jaccard_pairs(threshold: float, k: int = 3) -> str:
    """DuckDB CTE body producing exact shingle-Jaccard pairs ≥ threshold:
    (id_a, id_b, jaccard). Shared by the exact all-pairs oracle, the
    verified-MinHash oracle, and the cluster-assignment oracle."""
    return f"""
    norm AS (
      SELECT doc_id AS id, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT id, unnest({_sql_shingles(k)}) AS shingle FROM norm
    ),
    sizes AS (SELECT id, count(*) AS n_shingles FROM sh GROUP BY id),
    common AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    jacpairs AS (
      SELECT id_a, id_b,
             round(n_common::DOUBLE / (sa.n_shingles + sb.n_shingles - n_common), 6)
               AS jaccard
      FROM common
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
      WHERE n_common::DOUBLE / (sa.n_shingles + sb.n_shingles - n_common) >= {threshold}
    )"""


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH {_sql_jaccard_pairs(0.2)}
    SELECT id_a, id_b, jaccard FROM jacpairs
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (threshold 0.2) via shingle
    inverted index — the verification oracle for the MinHash scale path."""
    docs = t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, k=3, threshold=0.2)


@register(
    "jaccard_prefix_filtered",
    f"""
    WITH {_sql_jaccard_pairs(0.8)}
    SELECT id_a, id_b, jaccard FROM jacpairs
    """,
)
def jaccard_prefix_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style prefix-filtered exact Jaccard pairs (threshold 0.8 —
    the near-dup regime prefix filtering was built for): only each
    document's rarest n - floor(t·n) + 1 shingles are indexed, PLUS the
    exact length and positional prunes inside the candidate join and a
    doc-array codegen verify (operators/dedup.jaccard_prefix_pairs).
    Survivors get a full intersection count, so the result is IDENTICAL
    to the all-pairs inverted index at the same threshold — the oracle is
    the exact all-pairs SQL, pinning that equivalence at value level
    (tests pin it at t = 0.2 AND 0.8).

    Round-9 note (bench-on-land drain): this query originally ran at
    t = 0.2, where the prefix keeps ~83% of all shingles and the PPJoin
    machinery costs strictly more than the plain inverted index
    (measured 6.5 s vs 1.1 s at sf0.1) — prefix filtering mathematically
    cannot prune at low thresholds. The registered threshold moved to
    0.8 (prefix = 0.2·n + 1) where the operator demonstrates its actual
    contract; ngram_jaccard_pairs remains the low-threshold recall
    path."""
    docs = t(spark, sf_dir, "documents")
    return D.jaccard_prefix_pairs(docs, k=3, threshold=0.8)


@register(
    "containment_near_dup",
    f"""
    WITH norm AS (
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
    )
    SELECT id_a, id_b,
           round(n_common::DOUBLE / least(sa.n_shingles, sb.n_shingles), 6)
             AS containment
    FROM common
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE n_common::DOUBLE / least(sa.n_shingles, sb.n_shingles) >= 0.6
    """,
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (C = |A∩B| / min sizes ≥ 0.6):
    catches doc-in-doc inclusion that symmetric Jaccard under-scores (a
    page embedding a whole shorter doc). Same inverted-index plan as
    ngram_jaccard_pairs; only the scoring expression differs."""
    docs = t(spark, sf_dir, "documents")
    return D.containment_pairs(docs, k=3, threshold=0.6)


@register(
    "cross_source_overlap",
    f"""
    WITH norm AS (
      SELECT source, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT source, unnest({_sql_shingles(8)}) AS g FROM norm
    )
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS shared_8grams
    FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplication matrix: for every source pair, the number
    of distinct word-8-grams both emit — the diagnostic that surfaces
    mirror sites / syndicated boilerplate BETWEEN crawl domains (the
    per-doc twin is repeated_ngram_contamination). The distinct
    (source, shingle) projection collapses within-source repeats before
    the pair join, so join input is bounded by distinct-grams × sources,
    not corpus size; the join key is the 8-byte shingle hash in Spark
    (count per pair is hash-invariant: both engines count the same set)."""
    docs = t(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "source", F.explode(X.shingles("text", 8)).alias("g")
        )
        .select("source", F.xxhash64("g").alias("g"))
        .distinct()
    )
    sh = _pin(sh)
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_8grams"))
    )


@register("minhash_lsh_pairs", None)  # xxhash64 signatures: no SQL oracle
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16 bands) near-dup candidates, est. Jaccard ≥ 0.2.
    Probabilistic scale path; pytest cross-validates against exact Jaccard."""
    docs = t(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.2)


@register(
    "minhash_dedup_verified",
    f"""
    WITH {_sql_jaccard_pairs(0.5)}
    SELECT id_a, id_b, jaccard FROM jacpairs
    """,
)
def minhash_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generate + exact-verify fuzzy dedup (Jaccard ≥ 0.5):
    MinHash+LSH prunes to O(candidates), exact shingle Jaccard verifies —
    output is the exact pair set, plan cost is the LSH one. The oracle is
    the all-pairs exact SQL; they agree because banding recall at the
    planted-duplicate similarity (j ≥ 0.9) is 1 - ~4e-8 per pair."""
    docs = t(spark, sf_dir, "documents")
    return D.minhash_verified_pairs(docs, num_hashes=64, bands=16, threshold=0.5)


@register(
    "dedup_cluster_assign",
    f"""
    WITH RECURSIVE {_sql_jaccard_pairs(0.5)},
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
    comp AS (SELECT id, min(reach) AS component FROM walk GROUP BY id)
    SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
    FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    """,
)
def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: verified MinHash pairs (Jaccard ≥ 0.5)
    → connected components (iterative min-label propagation) → every doc
    labeled with its cluster representative (min reachable doc_id;
    singletons label themselves). The transitive-closure step is what turns
    pairwise near-dup detection into a usable keep/drop decision at corpus
    scale. Oracle: DuckDB recursive-CTE reachability over the same exact
    pair set."""
    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_verified_pairs(docs, num_hashes=64, bands=16, threshold=0.5)
    comp = D.connected_components(pairs)
    return docs.join(comp, docs["doc_id"] == comp["id"], "left").select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component")
    )


@register("simhash_candidates", None)  # xxhash64 sketch: no SQL oracle
def simhash_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64-bit) banded near-dup candidates, Hamming ≤ 3."""
    docs = t(spark, sf_dir, "documents")
    return D.simhash_candidates(docs, max_hamming=3)


@register("oph_lsh_pairs", None)  # xxhash64 sketch: no SQL oracle
def oph_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation MinHash (densified) + LSH candidates — same banding
    plan as minhash_lsh_pairs at 1/64 the signature-pass hash cost; pytest
    pins recall vs both classic MinHash and exact Jaccard."""
    docs = t(spark, sf_dir, "documents")
    return D.oph_lsh_pairs(docs, num_bins=64, bands=16, threshold=0.2)


@register(
    "oph_dedup_verified",
    f"""
    WITH {_sql_jaccard_pairs(0.5)}
    SELECT id_a, id_b, jaccard FROM jacpairs
    """,
)
def oph_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPH candidates + exact verify (Jaccard ≥ 0.5): output ≡ the
    all-pairs exact SQL whenever OPH banding recall at the planted
    similarity is 1 — the same certification contract as
    minhash_dedup_verified with the one-hash-per-shingle signature pass."""
    docs = t(spark, sf_dir, "documents")
    return D.oph_verified_pairs(docs, num_bins=64, bands=16, threshold=0.5)


def _sql_lang_scores_ctes(keep: str) -> str:
    """Faithful SQL model of functions/text.py lang_scores, shared by
    every lang-id-family oracle so the stopword lists exist in exactly
    ONE SQL string (plus the Python STOPWORDS source of truth):
    lowercased whitespace tokens, per-language stopword hit counts
    (zh: per-char substring counts over the raw text). Produces CTEs
    tk/s carrying ``keep`` alongside s_de..s_zh."""
    return f"""tk AS (
      SELECT {keep}, text,
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            w -> lower(w)) AS toks
      FROM documents WHERE text IS NOT NULL
    ), s AS (
      SELECT {keep.split(' AS ')[-1]},
        len(list_filter(toks, w -> list_contains(
          ['der','die','das','und','ist','von','mit','für','auf','ein'], w))) AS s_de,
        len(list_filter(toks, w -> list_contains(
          ['the','and','of','to','a','in','is','that','for','with'], w))) AS s_en,
        len(list_filter(toks, w -> list_contains(
          ['el','la','los','las','y','de','un','una','es','para'], w))) AS s_es,
        len(list_filter(toks, w -> list_contains(
          ['le','la','les','et','de','un','une','est','pour','dans'], w))) AS s_fr,
        (length(text) - length(replace(text, '的', '')))
          + (length(text) - length(replace(text, '是', '')))
          + (length(text) - length(replace(text, '在', '')))
          + (length(text) - length(replace(text, '了', '')))
          + (length(text) - length(replace(text, '和', '')))
          + (length(text) - length(replace(text, '有', '')))
          + (length(text) - length(replace(text, '我', '')))
          + (length(text) - length(replace(text, '不', '')))
          + (length(text) - length(replace(text, '人', '')))
          + (length(text) - length(replace(text, '这', ''))) AS s_zh
      FROM tk
    )"""


@register(
    "lang_id_distribution",
    # argmax over the shared lang-scores model with lexicographic
    # tie-break, 'und' when all scores are zero.
    f"""
    WITH {_sql_lang_scores_ctes("lang AS labeled")}
    SELECT labeled,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) <= 0 THEN 'und'
           WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
           WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
           WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
           WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
           ELSE 'zh' END AS predicted,
      count(*) AS n
    FROM s GROUP BY labeled, predicted
    """,
)
def lang_id_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID vs the table's labeled lang: confusion counts.
    (Accuracy is not the contract — determinism and plan shape are.)"""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return (
        docs.select(F.col("lang").alias("labeled"), X.lang_id("text").alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "ann_cosine_topk",
    f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS probe_vec
      FROM embeddings WHERE vec_id < 5
    ),
    pairs AS (
      SELECT p.probe_id, e.vec_id, e.embedding::DOUBLE[] AS ev, p.probe_vec
      FROM embeddings e, probes p
      WHERE e.vec_id <> p.probe_id
    ),
    scored AS (
      SELECT probe_id, vec_id, {_sql_cosine('ev', 'probe_vec')} AS cos_raw
      FROM pairs
    ),
    ranked AS (
      SELECT probe_id, vec_id, cos_raw,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_raw DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT probe_id, vec_id, round(cos_raw, 6) AS cosine, rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 probe vectors — the exact ANN
    baseline. Broadcast probes × full scan; per-probe top-k window."""
    emb = t(spark, sf_dir, "embeddings")
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    return S.brute_force_topk(emb, probes, k=10)


@register("ann_lsh_topk", None)  # approximate by design: no exact oracle
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-10 for the same probes — the scale path.
    pytest measures recall against brute force."""
    emb = t(spark, sf_dir, "embeddings")
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    return S.lsh_bucketed_topk(emb, probes, dim=64, k=10, n_planes=8)


# Exactness-regime oracle for the approximate-ANN machinery: identical to
# ann_cosine_topk's brute-force SQL (plus the NOT NULL guard the kernels
# need). In the full-probe / zero-plane configurations below, IVF and LSH
# provably degenerate to brute force, so the SAME exact oracle certifies the
# cell-assignment / bucket-join / window-rerank plumbing itself — not just
# its recall bounds.
_ANN_EXACT_ORACLE = f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS probe_vec
      FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL
    ),
    pairs AS (
      SELECT p.probe_id, e.vec_id, e.embedding::DOUBLE[] AS ev, p.probe_vec
      FROM embeddings e, probes p
      WHERE e.vec_id <> p.probe_id AND e.embedding IS NOT NULL
    ),
    scored AS (
      SELECT probe_id, vec_id, {_sql_cosine('ev', 'probe_vec')} AS cos_raw
      FROM pairs
    ),
    ranked AS (
      SELECT probe_id, vec_id, cos_raw,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_raw DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT probe_id, vec_id, round(cos_raw, 6) AS cosine, rank
    FROM ranked WHERE rank <= 10
    """


@register("ann_ivf_fullprobe_topk", _ANN_EXACT_ORACLE)
def ann_ivf_fullprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF run in its exactness regime: n_probe == n_centroids means every
    probe scans EVERY cell, and since cells partition the vectors and
    in-cell distances are exact cosines, the result is provably identical
    to brute force regardless of centroid quality. This hash-gates the
    whole IVF pipeline — sampled k-means training, literal-codebook cell
    assignment, probe explode, cell equality-join, per-probe window rerank
    — against the exact SQL oracle, complementing ann_ivf_topk whose
    pruned (n_probe=3) form is approximate by design and rows-only."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    centroids = S.train_ivf_centroids(emb, dim=64, n_centroids=8, sample_n=512)
    return S.ivf_topk(emb, probes, centroids, k=10, n_probe=len(centroids))


@register("ann_ivf_distributed_topk", _ANN_EXACT_ORACLE)
def ann_ivf_distributed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with FULLY DISTRIBUTED k-means training (no bounded-sample
    collect — the whole table trains; driver traffic is k rows per Lloyd
    iteration), then full-probe search so the result is provably brute
    force and the exact oracle hash-gates the entire distributed-training
    + assignment + join pipeline. The pruned production form reuses the
    same centroids with n_probe < k; its recall rides the same pytest as
    ann_ivf_topk."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    centroids = S.train_ivf_centroids_distributed(emb, dim=64, n_centroids=8, iters=3)
    return S.ivf_topk(emb, probes, centroids, k=10, n_probe=len(centroids))


@register("ann_lsh_fullcover_topk", _ANN_EXACT_ORACLE)
def ann_lsh_fullcover_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane LSH run in its exactness regime: zero planes puts every
    vector in bucket 0, so the bucket equality-join degenerates to the
    exact candidate set and the result is provably brute force. This
    hash-gates the LSH plumbing (sign packing, bucket join, in-bucket
    cosine, window rerank) against the exact SQL oracle, complementing
    ann_lsh_topk whose 8-plane form is approximate by design."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    return S.lsh_bucketed_topk(emb, probes, dim=64, k=10, n_planes=0)


@register("ann_pq_fullrerank_topk", _ANN_EXACT_ORACLE)
def ann_pq_fullrerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ run in its exactness regime (VERDICT r10 task 2): with re-rank
    depth >= the corpus (INT32_MAX — no count() action needed; row_number
    <= it is vacuously true), the ADC candidate cut keeps EVERY vector, so
    the exact-cosine re-rank provably reproduces brute force regardless of
    codebook quality — the ADC ordering only ever chooses WHICH candidates
    survive the cut, and here none are cut. This hash-gates the whole PQ
    pipeline against the exact SQL oracle — sampled per-subspace k-means
    training, unit-normalization, nearest-sub-centroid encoding
    (_pq_codes), per-probe LUT construction, the codes x LUTs ADC dot,
    and the two-stage window re-rank — complementing ann_pq_topk whose
    rerank=64 form is approximate by design and rows-only. Exactness
    twin at test scale: the full re-rank IS brute-force cost; production
    uses bounded rerank (+ IVF cells for sublinearity)."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    books = S.train_pq_codebooks(emb, dim=64, m=8, k=16, sample_n=512)
    return S.pq_topk(emb, probes, books, k=10, rerank=2**31 - 1)


@register("ann_ivfpq_fullscan_topk", _ANN_EXACT_ORACLE)
def ann_ivfpq_fullscan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ run in its exactness regime (VERDICT r10 task 2): n_probe ==
    n_centroids means every probe joins EVERY cell — and since each vector
    is assigned to exactly one cell, the candidate set per probe is
    exactly the full corpus, once — while re-rank depth = INT32_MAX keeps
    every ADC-scored candidate for the exact-cosine pass, so the composed
    result is provably brute force. One hash certifies BOTH prunings'
    plumbing at once: the coarse-cell assignment + explode + equality
    join (IVF side) and the code/LUT ADC scoring + re-rank windows (PQ
    side), complementing ann_ivfpq_topk (n_probe=2, rerank=64), which is
    approximate by design and rows-only."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    centroids = S.train_ivf_centroids(emb, dim=64, n_centroids=8, sample_n=512)
    books = S.train_pq_codebooks(emb, dim=64, m=8, k=16, sample_n=512)
    return S.ivfpq_topk(
        emb,
        probes,
        centroids,
        books,
        k=10,
        n_probe=len(centroids),
        rerank=2**31 - 1,
    )


@register("ann_ivf_topk", None)  # approximate by design: no exact oracle
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 for the same probes — the trained-codebook
    scale path (k-means cells instead of hyperplane buckets). Training is
    driver-side on a deterministic sample; pytest measures recall against
    brute force."""
    # NULL embeddings would reach the numpy training sample as None (the
    # asarray raises) and cannot be assigned to cells — drop them up front.
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        # Empty corpus: nothing to train on — degrade to an empty result
        # with the operator's schema instead of failing the query (the
        # training primitive itself correctly refuses). Emptiness is tested
        # explicitly: a broad except would swallow real kernel errors.
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    centroids = S.train_ivf_centroids(emb, dim=64, n_centroids=8, sample_n=512)
    return S.ivf_topk(emb, probes, centroids, k=10, n_probe=3)


@register("ann_pq_topk", None)  # approximate by design: no exact oracle
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-10 for the same probes — the
    memory-bandwidth scale path (each vector scanned as 8 byte-codes via
    per-probe lookup tables instead of 64 floats, then the best 64
    candidates re-ranked with exact cosine). Training is driver-side on a
    deterministic bounded sample; pytest measures recall against brute
    force and pins that emitted scores are true cosines."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        # Same empty-corpus degradation contract as ann_ivf_topk.
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    books = S.train_pq_codebooks(emb, dim=64, m=8, k=16, sample_n=512)
    return S.pq_topk(emb, probes, books, k=10, rerank=64)


@register(
    "embedding_norm_stats",
    """
    WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT label, count(*) AS n,
           round(avg(sqrt(list_reduce(list_transform(e, x -> x * x),
                                      (x, y) -> x + y))), 6) AS avg_norm
    FROM v GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math parity: per-label count + mean L2 norm through the
    zip_with/aggregate expression path."""
    emb = t(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(V.norm("embedding")), 6).alias("avg_norm"),
    )


@register(
    "embedding_quantize_error",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, label, v,
             list_min(v) AS vmin,
             (list_max(v) - list_min(v)) / 255.0 AS scale
      FROM e
    ),
    q AS (
      SELECT label,
             CASE WHEN scale = 0 THEN 0.0
                  ELSE list_max(list_transform(v, x ->
                    abs(x - (vmin + floor((x - vmin) / scale + 0.5) * scale))))
             END AS err
      FROM s
    )
    SELECT label, count(*) AS n_vecs,
           CAST(floor(1000000 * max(err)) AS BIGINT) AS max_err_e6,
           CAST(floor(1000000 * sum(err) / count(*)) AS BIGINT) AS avg_err_e6
    FROM q GROUP BY label
    """,
)
def embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization error analysis: each vector min-max
    quantized to 256 levels (floor(x+0.5), never round() — the
    engine-splitting half-up trap) and dequantized; per-label max and
    mean of the per-vector worst-dimension reconstruction error. The 4×
    compression (float32 → uint8 + 2 scalars) is what makes a 100 TB
    embedding store scannable; this query is the quality gate that
    precedes it. All higher-order array expressions — narrow pass + tiny
    label aggregate; the quantization bound err ≤ scale/2 is pinned in
    pytest."""
    emb = t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    staged = emb.withColumns(
        {
            "vmin": F.array_min("v"),
            "scale": (F.array_max("v") - F.array_min("v")) / 255.0,
        }
    )

    def dim_err(x):
        code = F.floor((x - F.col("vmin")) / F.col("scale") + F.lit(0.5))
        return F.abs(x - (F.col("vmin") + code * F.col("scale")))

    err = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.array_max(F.transform("v", dim_err))
    )
    return (
        staged.select("label", err.alias("err"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.floor(1000000 * F.max("err")).cast("bigint").alias("max_err_e6"),
            F.floor(1000000 * F.sum("err") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("avg_err_e6"),
        )
    )


@register(
    "embedding_near_dup_exact",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_sql_cosine('a.e', 'b.e')} AS cos_raw
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos_raw, 6) AS cosine
    FROM scored WHERE cos_raw >= 0.38
    """,
)
def embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding near-duplicates (cosine ≥ 0.38; the
    testdata embeddings are near-orthogonal random vectors, so the
    threshold sits at their upper tail to yield a non-trivial pair set) — the
    correctness baseline for the LSH-bucketed variant below. O(N²·D):
    test-scale only by design."""
    emb = t(spark, sf_dir, "embeddings")
    # Optimization r12 (guide §4.2/§8): triangular block partitioning + one
    # vectorized Arrow kernel per block pair replaces the crossJoin whose
    # per-pair cosine ran as interpreted HOF lambdas (9.3 s → sub-second at
    # sf0.1; bitwise-identical fold, see operators/vector_kernels.py).
    pairs = S.exact_allpairs_cosine(emb, threshold=0.38)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register("embedding_near_dup_lsh", None)  # recall<1 by design: rows-only
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup pairs — the linear-time scale path for the
    query above (pytest measures recall against the exact operator)."""
    emb = t(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(emb, dim=64, threshold=0.38, n_planes=4)


@register(
    "repetition_signals",
    f"""
    WITH norm AS (
      SELECT doc_id, lang, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             CASE WHEN len(words) >= 2
                  THEN list_transform(range(1, len(words)),
                                      i -> words[i] || ' ' || words[i+1])
                  ELSE [] END AS bigrams
      FROM norm
    ),
    frac AS (
      SELECT doc_id, lang,
             CASE WHEN len(bigrams) = 0 THEN 0.0
                  ELSE (len(bigrams) - len(list_distinct(bigrams)))::DOUBLE
                       / len(bigrams) END AS dup_frac
      FROM bg
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(dup_frac), 6) AS avg_dup_bigram_frac,
           round(max(dup_frac), 6) AS max_dup_bigram_frac,
           CAST(sum(CASE WHEN dup_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitious
    FROM frac GROUP BY lang
    """,
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signal: the fraction of token
    bigrams that are duplicates of an earlier bigram in the same document
    (1 - distinct/total). High values flag boilerplate / degenerate text.
    Narrow per-row array expressions + one tiny aggregate — scan-speed at
    any scale."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(X.normalize_for_fingerprint("text"), " ")
    docs = docs.withColumn("_words", words)
    n = F.size("_words")
    bigrams = F.zip_with(
        F.col("_words"),
        F.slice(F.col("_words"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # zip_with pads the shorter side with null; concat_ws skips the null, so
    # the padded tail element is a single word — real bigrams contain a space
    bigrams = F.filter(bigrams, lambda g: g.contains(" "))
    docs = docs.withColumn("_bigrams", F.when(n >= 2, bigrams).otherwise(F.array()))
    total = F.size("_bigrams")
    distinct_n = F.size(F.array_distinct("_bigrams"))
    dup_frac = F.when(total == 0, F.lit(0.0)).otherwise(
        (total - distinct_n).cast("double") / total
    )
    docs = docs.withColumn("_dup_frac", dup_frac)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_dup_frac"), 6).alias("avg_dup_bigram_frac"),
        F.round(F.max("_dup_frac"), 6).alias("max_dup_bigram_frac"),
        F.sum(F.when(F.col("_dup_frac") > 0.5, 1).otherwise(0)).alias("n_repetitious"),
    )


@register(
    "repeated_ngram_contamination",
    f"""
    WITH norm AS (
      SELECT doc_id AS id, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT id, unnest({_sql_shingles(8)}) AS gram FROM norm
    ),
    gram_docs AS (
      SELECT gram, count(*) AS n_docs FROM sh GROUP BY gram
    ),
    per_doc AS (
      SELECT sh.id, count(*) AS n_grams,
             sum(CASE WHEN gd.n_docs >= 2 THEN 1 ELSE 0 END) AS n_shared
      FROM sh JOIN gram_docs gd ON gd.gram = sh.gram
      GROUP BY sh.id
    )
    SELECT id AS doc_id, n_grams, CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared::DOUBLE / n_grams, 6) AS shared_frac
    FROM per_doc WHERE n_shared > 0
    """,
)
def repeated_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span detection (the exact-substring-dedup
    signal): for each doc, the fraction of its distinct word-8-grams that
    also appear in at least one other document. Docs with high shared_frac
    are near-copies or heavy boilerplate carriers — the unit of
    train/test-contamination checks. Plan: explode distinct 8-grams,
    aggregate doc-counts per gram (uniform shuffle keys), join back, one
    per-doc aggregate."""
    docs = t(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("id"), F.explode(X.shingles("text", 8)).alias("gram")
    )
    sh = _pin(sh)  # scanned by both the gram-count aggregate and the join-back
    gram_docs = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        sh.join(gram_docs, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        per_doc.filter(F.col("n_shared") > 0)
        .select(
            F.col("id").alias("doc_id"),
            "n_grams",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("n_grams"), 6).alias(
                "shared_frac"
            ),
        )
    )


_SQL_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"


#: SQL model of functions/text.quality_score (C4/Gopher-style bands),
#: shared by doc_quality_scores and cluster_quality_canonical. Produces
#: CTE `qual(doc_id, quality)`; prepend "WITH " or embed in a chain.
_SQL_QUALITY_CTES = f"""
    sig AS (
      SELECT doc_id,
             length(text) AS n,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9_\\s]'))::DOUBLE / length(text)
             END AS p,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len({_SQL_TOKENS}) END AS n_tok,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(list_filter({_SQL_TOKENS},
                       w -> list_contains(['the','and','of','to','a','in','is','that','for','with'], lower(w))))
             END AS sw_hits,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE list_sum(list_transform({_SQL_TOKENS}, w -> length(w))) END AS tok_chars
      FROM documents
    ),
    bands AS (
      SELECT doc_id,
             CASE WHEN n < 50 THEN 0.0 WHEN n < 200 THEN 0.5
                  WHEN n <= 20000 THEN 1.0 ELSE 0.5 END AS len_band,
             CASE WHEN p <= 0.2 THEN 1.0 WHEN p <= 0.4 THEN 0.5 ELSE 0.0 END AS punct_band,
             CASE WHEN n_tok = 0 THEN 0.3
                  WHEN sw_hits::DOUBLE / n_tok >= 0.05 AND sw_hits::DOUBLE / n_tok <= 0.6
                  THEN 1.0 ELSE 0.3 END AS sw_band,
             CASE WHEN n_tok = 0 THEN 0.2
                  WHEN tok_chars::DOUBLE / n_tok >= 2.5 AND tok_chars::DOUBLE / n_tok <= 12
                  THEN 1.0 ELSE 0.2 END AS mwl_band
      FROM sig
    ),
    qual AS (
      SELECT doc_id,
             round(0.3 * len_band + 0.2 * punct_band + 0.25 * sw_band + 0.25 * mwl_band, 4)
               AS quality
      FROM bands
    )"""


@register(
    "doc_quality_scores",
    f"""
    WITH {_SQL_QUALITY_CTES}
    SELECT doc_id, quality FROM qual
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score per document — the full C4/Gopher-style
    heuristic filter, independently re-derived in SQL for the oracle."""
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", X.quality_score("text").alias("quality"))


@register(
    "cluster_quality_canonical",
    f"""
    WITH RECURSIVE {_sql_jaccard_pairs(0.5)},
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
    {_SQL_QUALITY_CTES.strip()},
    ranked AS (
      SELECT c.component, q.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.quality DESC, q.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.component) AS n_members
      FROM qual q JOIN comp c ON c.id = q.doc_id
    )
    SELECT component, doc_id AS canonical_doc, quality,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1 AND n_members > 1
    """,
)
def cluster_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-aware canonical selection per near-dup cluster: verified
    MinHash pairs → connected components → within each multi-member
    cluster keep the HIGHEST-quality document (C4/Gopher composite score;
    doc_id breaks ties). Production corpus builds keep the best copy, not
    the lowest-keyed one — a boilerplate-stripped mirror should win over
    the ad-laden original even when its id is larger. Complements
    dedup_cluster_assign (min-id labeling) and corpus_after_dedup
    (min-id canonical). Oracle: recursive-CTE reachability over the exact
    pair set joined to the shared SQL quality model.

    Plan: the component labels are tiny (clustered docs only) and join
    back to the quality projection on doc_id; one window per component
    ranks members. Scale cost is the LSH candidate path, not this step."""
    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_verified_pairs(docs, num_hashes=64, bands=16, threshold=0.5)
    comp = D.connected_components(pairs)
    qual = docs.select("doc_id", X.quality_score("text").alias("quality"))
    labeled = qual.join(comp, qual["doc_id"] == comp["id"], "inner").select(
        "doc_id", "component", "quality"
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    wc = Window.partitionBy("component")
    return (
        labeled.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("n_members") > 1))
        .select(
            "component",
            F.col("doc_id").alias("canonical_doc"),
            "quality",
            F.col("n_members").cast("bigint").alias("n_members"),
        )
    )


@register(
    "bpe_token_budget",
    """
    SELECT source,
           CAST(sum(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))) AS BIGINT)
             AS bpe_ish_tokens,
           count(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-budget estimate per source using the GPT-2-ish pre-token
    regex (regexp_count, JVM-side)."""
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(X.bpe_ish_token_count("text")).alias("bpe_ish_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "binary_payload_stats",
    """
    SELECT source, count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           max(octet_length(encode(text))) AS max_bytes,
           count(DISTINCT md5(text)) AS n_distinct_payloads
    FROM documents GROUP BY source
    """,
)
def binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata pass over a `binary` column (the multimodal
    layout: bytes + typed metadata, operators/multimodal.py): byte sizes and
    distinct-content fingerprints per source, all JVM-side — the cheap
    pre-pass a media pipeline runs before deciding what to decode. Payload
    synthesized as UTF-8 bytes of `text` so the oracle can reproduce it;
    byte length ≠ char length on the non-ASCII rows, which is the point."""
    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        "source", F.col("text").cast("binary").alias("payload")
    )
    return media.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).alias("max_bytes"),
        F.count_distinct(F.md5("payload")).alias("n_distinct_payloads"),
    )


@register("approx_sketches", None)  # engine-specific sketches: rows-only
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB substitutes for exact distinct/percentile: HyperLogLog++
    distinct count and t-digest percentiles in one pass over lineitem.
    No oracle — sketch outputs are engine-specific by nature (the exact
    twins distinct_count / exact_percentiles are oracle-checked)."""
    li = t(spark, sf_dir, "lineitem")
    q = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10000
    )
    # Scalar columns only: the driver's canonicalizer sorts rows in pandas,
    # which cannot hash array-typed cells.
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.element_at(q, 1).alias("price_p50"),
        F.element_at(q, 2).alias("price_p95"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "train_val_test_split",
    f"""
    SELECT CASE WHEN {SP.lcg_bucket_sql('doc_id')} < 80 THEN 'train'
                WHEN {SP.lcg_bucket_sql('doc_id')} < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY split
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split by id-hash (operators/sampling.py):
    same doc_id lands in the same split on any cluster — the reproducibility
    contract randomSplit cannot give. Narrow (no shuffle before the
    aggregate)."""
    docs = SP.hash_split(t(spark, sf_dir, "documents"), "doc_id", 80, 10)
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_MIX_RATES = {"en": 25, "de": 75, "es": 10, "fr": 50, "zh": 100}


@register(
    "stratified_sample_mix",
    f"""
    WITH rated AS (
      SELECT lang, n_chars,
             CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 75 WHEN 'es' THEN 10
                       WHEN 'fr' THEN 50 WHEN 'zh' THEN 100 ELSE 0 END AS rate,
             {SP.lcg_bucket_sql('doc_id')} AS bucket
      FROM documents
    )
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM rated WHERE bucket < rate GROUP BY lang
    """,
)
def stratified_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing by per-language deterministic sampling rates
    (operators/sampling.stratified_hash_sample): up-weight low-resource
    languages, down-sample the dominant ones. Narrow — every executor
    decides membership locally from the id hash; rerun-stable and
    monotone in the rate (a higher rate strictly adds rows)."""
    docs = SP.stratified_hash_sample(
        t(spark, sf_dir, "documents"), "doc_id", "lang", _MIX_RATES
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"), F.sum("n_chars").alias("total_chars")
    )


@register(
    "token_shard_packing",
    """
    WITH packed AS (
      SELECT source,
             CAST(floor(coalesce(sum(n_chars) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / 100000) AS BIGINT) AS shard
      FROM documents
    )
    SELECT shard, count(*) AS n_docs
    FROM packed GROUP BY shard
    """,
)
def token_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (in doc_id order) into ~100k-char training shards via
    an exclusive prefix sum (operators/sampling.py). Global ordering is one
    window shuffle; at corpus scale the ordering key would be per-source."""
    docs = t(spark, sf_dir, "documents")
    packed = SP.pack_token_shards(docs, "n_chars", "doc_id", budget=100_000)
    return packed.groupBy("shard").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "sequence_packing_stats",
    r"""
    WITH toks AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    pref AS (
      SELECT doc_id, n_tok,
             CAST(coalesce(sum(n_tok) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS s
      FROM toks
    ),
    spans AS (
      SELECT doc_id, s, s + n_tok AS e,
             CAST(floor(s / 256.0) AS BIGINT) AS f,
             CAST(floor((s + n_tok - 1) / 256.0) AS BIGINT) AS l
      FROM pref
    ),
    x AS (
      SELECT doc_id, s, e, r.seq AS seq_id
      FROM spans, unnest(range(f, l + 1)) AS r(seq)
    )
    SELECT seq_id, count(*) AS n_docs,
           CAST(sum(least(e, (seq_id + 1) * 256)
                    - greatest(s, seq_id * 256)) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN s >= seq_id * 256 AND e <= (seq_id + 1) * 256
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_docs
    FROM x GROUP BY seq_id
    """,
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style pretraining sequence packing: concatenate the corpus in
    doc_id order and cut it into fixed 256-token sequences, reporting per
    sequence how many documents it spans, its token fill, and how many
    documents sit fully inside it (vs. crossing a boundary) — the
    packing-efficiency / attention-boundary audit run before training.

    The global token offset per document is the two-phase distributed
    prefix sum (operators/sampling.global_prefix_sum): range shuffle +
    parallel per-partition scan + broadcast #partitions-row offsets —
    NEVER the one-task global window. A document spanning k sequences
    explodes into k rows (k = n_tok/256 + 2, bounded), and the final
    aggregate shuffles on seq_id — uniform by construction."""
    SEQ_LEN = 256  # keep distinct from the module alias S (operators.similarity)
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
    )
    pref = SP.global_prefix_sum(docs, "n_tok", ["doc_id"], out_col="s")
    spans = pref.select(
        "doc_id",
        F.col("s").cast("bigint").alias("s"),
        (F.col("s") + F.col("n_tok")).cast("bigint").alias("e"),
        F.floor(F.col("s") / F.lit(float(SEQ_LEN))).cast("bigint").alias("f"),
        F.floor((F.col("s") + F.col("n_tok") - 1) / F.lit(float(SEQ_LEN)))
        .cast("bigint")
        .alias("l"),
    )
    x = spans.select(
        "doc_id", "s", "e", F.explode(F.sequence("f", "l")).alias("seq_id")
    )
    lo = F.col("seq_id") * SEQ_LEN
    hi = (F.col("seq_id") + 1) * SEQ_LEN
    return x.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.least("e", hi) - F.greatest("s", lo)).cast("bigint").alias(
            "n_tokens"
        ),
        F.sum(
            F.when((F.col("s") >= lo) & (F.col("e") <= hi), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_full_docs"),
    )


@register(
    "padding_efficiency_stats",
    r"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    banded AS (
      SELECT doc_id, n_tok,
             CASE WHEN n_tok < 64 THEN 0 WHEN n_tok < 128 THEN 1
                  WHEN n_tok < 256 THEN 2 ELSE 3 END AS band,
             doc_id % 8 AS sub
      FROM toks
    ),
    batched AS (
      SELECT band, sub, n_tok,
             CAST(floor((row_number() OVER (
               PARTITION BY band, sub ORDER BY doc_id
             ) - 1) / 32.0) AS BIGINT) AS batch_id
      FROM banded
    ),
    per_batch AS (
      SELECT band, sub, batch_id, count(*) AS n_rows,
             max(n_tok) AS mx, CAST(sum(n_tok) AS BIGINT) AS useful
      FROM batched GROUP BY band, sub, batch_id
    )
    SELECT band,
           CAST(sum(n_rows) AS BIGINT) AS n_docs,
           count(*) AS n_batches,
           CAST(sum(useful) AS BIGINT) AS useful_tokens,
           CAST(sum(mx * n_rows - useful) AS BIGINT) AS padded_tokens,
           CAST(floor(1000000.0 * sum(mx * n_rows - useful)
                / sum(mx * n_rows)) AS BIGINT) AS padding_frac_e6
    FROM per_batch GROUP BY band
    """,
)
def padding_efficiency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed dynamic-batching audit: group documents into four
    token-length bands, form deterministic 32-row batches inside each
    band, pad every batch to its own max length, and report per band the
    useful vs padded token mass — the before/after evidence for why
    inference and training loaders bucket by length.

    Skew-safe window shape: batch formation partitions by (band, sub)
    where sub = doc_id % 8, so no single band funnels into one task the
    way PARTITION BY band alone would — batches never needed global
    contiguity, only same-band membership, so sub-bucketing changes
    nothing semantically while keeping every window partition bounded.
    The final aggregate shuffles on the tiny (band, sub, batch) keys."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
    )
    banded = docs.select(
        "doc_id",
        "n_tok",
        F.when(F.col("n_tok") < 64, 0)
        .when(F.col("n_tok") < 128, 1)
        .when(F.col("n_tok") < 256, 2)
        .otherwise(3)
        .alias("band"),
        (F.col("doc_id") % 8).alias("sub"),
    )
    w = Window.partitionBy("band", "sub").orderBy("doc_id")
    batched = banded.select(
        "band",
        "sub",
        "n_tok",
        F.floor((F.row_number().over(w) - 1) / 32.0).cast("bigint").alias(
            "batch_id"
        ),
    )
    per_batch = batched.groupBy("band", "sub", "batch_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("n_tok").alias("mx"),
        F.sum("n_tok").cast("bigint").alias("useful"),
    )
    pad = F.col("mx") * F.col("n_rows") - F.col("useful")
    return per_batch.groupBy("band").agg(
        F.sum("n_rows").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("useful").cast("bigint").alias("useful_tokens"),
        F.sum(pad).cast("bigint").alias("padded_tokens"),
        F.floor(
            1000000.0 * F.sum(pad) / F.sum(F.col("mx") * F.col("n_rows"))
        )
        .cast("bigint")
        .alias("padding_frac_e6"),
    )


@register(
    "group_split_leakage_audit",
    f"""
    WITH schemes AS (
      SELECT user_id, event_id,
             CASE WHEN {SP.lcg_bucket_sql('user_id')} < 80 THEN 'train'
                  ELSE 'eval' END AS by_user,
             CASE WHEN {SP.lcg_bucket_sql('event_id')} < 80 THEN 'train'
                  ELSE 'eval' END AS by_row
      FROM events WHERE user_id IS NOT NULL
    ),
    per_user AS (
      SELECT user_id,
             count(DISTINCT by_user) AS n_splits_user,
             count(DISTINCT by_row) AS n_splits_row
      FROM schemes GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN n_splits_user > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS leaky_users_by_user,
           CAST(sum(CASE WHEN n_splits_row > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS leaky_users_by_row
    FROM per_user
    """,
)
def group_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval GROUP-leakage audit: split the event log two ways — by
    hashing the group key (user_id) and by hashing the row key
    (event_id) — and count users whose rows land in both splits. The
    user-keyed scheme is provably leak-free (every row of a user hashes
    identically), which the audit certifies as an exact zero, while the
    row-keyed scheme leaks nearly every multi-event user — the
    quantified argument for group-aware splitting before training a
    per-user model. Both schemes use the shared deterministic LCG
    (sampling.lcg_bucket — identical arithmetic in the oracle), so the
    result is engine- and partitioning-independent. One shuffle on
    user_id; everything else is narrow."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    by_user = F.when(SP.lcg_bucket("user_id") < 80, "train").otherwise("eval")
    by_row = F.when(SP.lcg_bucket("event_id") < 80, "train").otherwise("eval")
    per_user = (
        ev.select(
            "user_id", by_user.alias("by_user"), by_row.alias("by_row")
        )
        .groupBy("user_id")
        .agg(
            F.count_distinct("by_user").alias("n_splits_user"),
            F.count_distinct("by_row").alias("n_splits_row"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("n_splits_user") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("leaky_users_by_user"),
        F.sum(F.when(F.col("n_splits_row") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("leaky_users_by_row"),
    )


@register(
    "sorted_neighborhood_pairs",
    f"""
    WITH norm AS (
      SELECT doc_id AS id,
             substring({_SQL_NORM}, 1, 24) AS skey,
             list_distinct(regexp_split_to_array({_SQL_NORM}, ' ')) AS words
      FROM documents
    ),
    ranked AS (
      SELECT id, words, row_number() OVER (ORDER BY skey, id) AS rnk FROM norm
    ),
    cand AS (
      SELECT a.id AS ia, a.words AS wa, b.id AS ib, b.words AS wb
      FROM ranked a JOIN ranked b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + 4
    ),
    scored AS (
      SELECT ia, ib,
             len(list_intersect(wa, wb))::DOUBLE
               / (len(wa) + len(wb) - len(list_intersect(wa, wb))) AS j
      FROM cand
    )
    SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
           round(j, 6) AS jaccard
    FROM scored WHERE j >= 0.4
    """,
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood (merge/purge) near-dup blocking: global sort by a
    24-char content prefix, each doc compared to its next 4 neighbors only,
    word-set Jaccard >= 0.4 verified inline. The global rank is the scalable
    two-phase form (range shuffle + per-partition offsets) — never a
    single-task window — and the neighbor pairing is an equi-join on rank."""
    return D.sorted_neighborhood_pairs(
        t(spark, sf_dir, "documents"), prefix_len=24, window=4, threshold=0.4
    )


# =====================================================================
# Incremental corpus dedup (new crawl vs the standing fingerprint store)
# =====================================================================

@register(
    "incremental_corpus_dedup",
    f"""
    WITH d AS (
      SELECT doc_id, n_chars, md5(substring({_SQL_NORM}, 1, 40)) AS fp
      FROM documents WHERE text IS NOT NULL
    ),
    corpus AS (SELECT * FROM d WHERE doc_id % 10 < 8),
    batch AS (SELECT * FROM d WHERE doc_id % 10 >= 8),
    cls AS (
      SELECT b.doc_id, b.n_chars,
             CASE
               WHEN b.fp IN (SELECT DISTINCT fp FROM corpus)
                 THEN 'dup_of_corpus'
               WHEN row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id)
                    > 1 THEN 'dup_in_batch'
               ELSE 'accepted'
             END AS outcome
      FROM batch b
    )
    SELECT outcome, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM cls GROUP BY outcome
    """,
)
def incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the shape every RECURRING corpus build runs: a
    new crawl batch (doc_id%10 ∈ {{8,9}} here) checked against the standing
    corpus's fingerprint catalog (doc_id%10 < 8), then deduped within
    itself. The fingerprint is the md5 of the first 40 normalized chars —
    the "boilerplate head" key that catches templated re-crawls (the
    testdata's duplicates are near-dups, so a whole-document hash would
    never fire; a real pipeline picks the key per dedup policy, same
    plan). Each new document is classified dup_of_corpus (fingerprint
    already in the store), dup_in_batch (first-wins within the batch), or
    accepted; the readout aggregates chars per outcome — the numbers an
    ingestion report actually shows.

    Scale shape: at 100 TB the fingerprint store is a parquet table keyed
    by fingerprint; the check is one shuffle join on the uniformly
    distributed md5 (or a bucketed co-located join if the store is bucketed
    — sources/parquet.write_bucketed), and the in-batch window shuffles
    only the new batch. No broadcast assumption: the store is NOT small."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "n_chars",
            F.md5(
                F.substring(X.normalize_for_fingerprint("text"), 1, 40)
            ).alias("fp"),
        )
    )
    # Optimization r13 (guide §2.4): the corpus and batch sides are two
    # lineages of the same normalize+md5 regex pass — pin the narrow
    # (doc_id, n_chars, fp) relation so the scan-side fingerprinting runs
    # once, not per snapshot side.
    d = _pin(d)
    corpus_fps = d.filter(F.col("doc_id") % 10 < 8).select("fp").distinct()
    batch = d.filter(F.col("doc_id") % 10 >= 8)
    from pyspark.sql import Window

    flagged = batch.join(
        corpus_fps.withColumn("_in_corpus", F.lit(1)), "fp", "left"
    ).withColumn(
        "rn", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
    )
    cls = flagged.select(
        "n_chars",
        F.when(F.col("_in_corpus").isNotNull(), F.lit("dup_of_corpus"))
        .when(F.col("rn") > 1, F.lit("dup_in_batch"))
        .otherwise(F.lit("accepted"))
        .alias("outcome"),
    )
    return cls.groupBy("outcome").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# =====================================================================
# Temperature-based mixture reweighting (the multi-source sampling law
# used to balance training corpora: p_i ∝ n_i^α with α < 1 upweighting
# small sources)
# =====================================================================

@register(
    "temperature_sampling_mix",
    """
    WITH counts AS (
      SELECT lang, count(*) AS n_docs, sum(n_chars) AS n_chars
      FROM documents WHERE lang IS NOT NULL GROUP BY lang
    ),
    scored AS (
      SELECT lang, n_docs, n_chars,
             CAST(floor(sqrt(n_docs)) AS BIGINT) AS w_int
      FROM counts
    )
    SELECT lang, n_docs, CAST(n_chars AS BIGINT) AS n_chars, w_int,
           CAST((1000000 * w_int) // (SELECT sum(w_int) FROM scored)
                AS BIGINT) AS weight_e6,
           CAST((10000 * w_int) // (SELECT sum(w_int) FROM scored)
                AS BIGINT) AS epoch_docs
    FROM scored
    """,
)
def temperature_sampling_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source reweighting (α = 0.5): per-language sampling
    weights ∝ n^α, plus the integer document budget each source receives in
    a 10k-doc epoch — the mixture law multi-source training-corpus builds
    use to keep small languages/domains from washing out.

    All emitted numbers are INTEGER-exact by construction: w = floor(√n)
    (IEEE-correctly-rounded sqrt of an exact integer gives the same double
    in any engine), and weights/budgets are integer floor-divisions by the
    integer Σw — no float summation order can flip a hash bit. The same
    discipline as the repo's other e-scaled outputs, taken one step
    further because mixture weights feed WHICH DATA a model trains on.

    Scale shape: one partial-aggregated groupBy on lang (tiny result), a
    broadcast of the 1-row Σw, then pure projection — the mixture table
    for a 100 TB corpus costs one scan."""
    counts = (
        t(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .withColumn("w_int", F.floor(F.sqrt("n_docs")).cast("bigint"))
    )
    total = counts.agg(F.sum("w_int").alias("_tw"))
    return counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "n_chars",
        "w_int",
        F.expr("(1000000 * w_int) div _tw").alias("weight_e6"),
        F.expr("(10000 * w_int) div _tw").alias("epoch_docs"),
    )


# =====================================================================
# End-to-end corpus curation funnel (the full pipeline in ONE query)
# =====================================================================

_FUNNEL_PUNCT = (
    "(CASE WHEN length(text) = 0 THEN 0.0 "
    "ELSE len(regexp_extract_all(text, '[^a-zA-Z0-9_\\s]'))::DOUBLE"
    " / length(text) END)"
)


@register(
    "curation_funnel",
    f"""
    WITH q0 AS (SELECT doc_id, lang, n_chars, text FROM documents),
    q1 AS (SELECT * FROM q0 WHERE lang IN ('en', 'de', 'es')),
    q2 AS (SELECT * FROM q1 WHERE n_chars >= 100 AND {_FUNNEL_PUNCT} <= 0.1),
    q3 AS (
      SELECT doc_id, lang, n_chars, text FROM q2
      QUALIFY row_number() OVER (PARTITION BY md5({_SQL_NORM})
                                 ORDER BY doc_id) = 1
    ),
    norm3 AS (
      SELECT doc_id AS id, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM q3
    ),
    sh3 AS (SELECT id, unnest({_sql_shingles(3)}) AS shingle FROM norm3),
    sizes3 AS (SELECT id, count(*) AS n_shingles FROM sh3 GROUP BY id),
    common3 AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
      FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    dropped AS (
      SELECT DISTINCT id_b FROM common3
      JOIN sizes3 sa ON sa.id = id_a
      JOIN sizes3 sb ON sb.id = id_b
      WHERE n_common::DOUBLE / (sa.n_shingles + sb.n_shingles - n_common)
            >= 0.5
    ),
    q4 AS (SELECT * FROM q3 WHERE doc_id NOT IN (SELECT id_b FROM dropped)),
    q5 AS (SELECT * FROM q4 WHERE {SP.lcg_bucket_sql('doc_id')} < 80)
    SELECT stage, n_docs, total_chars FROM (
      SELECT '0_input' AS stage, count(*) AS n_docs,
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS total_chars FROM q0
      UNION ALL SELECT '1_lang', count(*),
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM q1
      UNION ALL SELECT '2_quality', count(*),
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM q2
      UNION ALL SELECT '3_exact_dedup', count(*),
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM q3
      UNION ALL SELECT '4_near_dedup', count(*),
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM q4
      UNION ALL SELECT '5_train', count(*),
             CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM q5
    )
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE corpus-curation pipeline as one plan, reported as a
    per-stage retention funnel: language allowlist → quality gate
    (length + punctuation ratio) → exact dedup (md5 fingerprint,
    first-wins) → near-dup drop (exact 3-gram Jaccard ≥ 0.5, greedy
    keep-lower-id) → deterministic train split. This is the composition a
    training-data build actually runs; every stage reuses the engine's
    audited primitive, and the oracle replays the identical chain in SQL —
    pinning not just each operator but their COMPOSITION.

    Scale shape: stages 1-2 are narrow filters; stage 3 shuffles on the
    content fingerprint; stage 4's pair generation is the inverted-index
    join (prefix-filter or MinHash swap in at corpus scale, same drop
    semantics); stage 5 is narrow. Funnel readout aggregates each stage's
    frame; the expensive stage-3/4 frames are persisted so the six
    aggregates don't recompute the dedup chain."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars", "text")
    q1 = docs.filter(F.col("lang").isin("en", "de", "es"))
    q2 = q1.filter(
        (F.col("n_chars") >= 100) & (X.punct_ratio("text") <= 0.1)
    )
    q3 = _pin(D.exact_dedup(q2).select("doc_id", "lang", "n_chars", "text"))
    pairs = D.ngram_jaccard_pairs(q3, k=3, threshold=0.5)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    q4 = _pin(q3.join(dropped, "doc_id", "left_anti"))
    q5 = q4.filter(SP.lcg_bucket("doc_id") < 80)

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("total_chars"),
        )

    funnel = (
        stage(docs, "0_input")
        .unionByName(stage(q1, "1_lang"))
        .unionByName(stage(q2, "2_quality"))
        .unionByName(stage(q3, "3_exact_dedup"))
        .unionByName(stage(q4, "4_near_dedup"))
        .unionByName(stage(q5, "5_train"))
    )
    return funnel.select("stage", "n_docs", "total_chars")


@register(
    "semantic_decontamination",
    f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    bench AS (SELECT vec_id, e FROM v WHERE vec_id < 50),
    train AS (SELECT vec_id, e FROM v WHERE vec_id >= 50),
    scored AS (
      SELECT t.vec_id AS train_id, b.vec_id AS bench_id,
             {_sql_cosine('t.e', 'b.e')} AS cos_raw
      FROM train t CROSS JOIN bench b
    ),
    hits AS (
      SELECT train_id, count(*) AS n_bench_hits,
             round(max(cos_raw), 6) AS max_cosine
      FROM scored WHERE cos_raw >= 0.35
      GROUP BY train_id
    )
    SELECT train_id, n_bench_hits, max_cosine FROM hits
    """,
)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-set decontamination — the semantic complement
    of decontaminate_benchmark's exact 8-gram check: training vectors whose
    cosine against ANY benchmark vector (vec_id < 50) clears the threshold
    are flagged with their hit count and worst offender score. Catches
    paraphrased/translated leakage that n-gram overlap misses.

    Plan: the benchmark side is tiny by construction (eval sets are KBs of
    vectors) → broadcast; the train side streams through one narrow scored
    pass + a per-train-id aggregate. At 100 TB this is a scan, not a join
    problem — the same shape as decontaminate_benchmark. Exact scoring at
    test scale doubles as the recall oracle for an LSH-prefiltered variant
    (embedding_near_dup_lsh's bucketing drops in unchanged when the
    benchmark outgrows a broadcast)."""
    emb = t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("bench_id"), F.col("embedding").alias("vb")
    )
    train = emb.filter(F.col("vec_id") >= 50).select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("vt")
    )
    scored = train.crossJoin(F.broadcast(bench)).withColumn(
        "cos_raw", V.cosine("vt", "vb")
    )
    return (
        scored.filter(F.col("cos_raw") >= 0.35)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.round(F.max("cos_raw"), 6).alias("max_cosine"),
        )
    )


@register(
    "media_frame_sample",
    """
    -- DuckDB cannot slice BLOBs, so frames are compared through their hex
    -- encoding (2 hex chars per byte; both engines emit uppercase hex).
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS ph FROM documents
      WHERE text IS NOT NULL
    ),
    f AS (
      SELECT media_id, i.i AS frame_index,
             substring(ph, i.i * 512 + 1, 512) AS fph
      FROM m, unnest(range(0, greatest(1, least(4, (length(ph) // 2) // 256))))
           AS i(i)
    )
    SELECT media_id, count(*) AS n_frames,
           max(CASE WHEN frame_index = 0 THEN md5(fph) END) AS first_frame_md5,
           CAST(sum(length(fph) // 2) AS BIGINT) AS frame_bytes
    FROM f GROUP BY media_id
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through the REAL multimodal plumbing
    (operators.multimodal.sample_frames — Arrow-batched mapInPandas, one
    input row exploding into N frame rows inside the Python worker), over
    payloads synthesized as UTF-8 bytes of `text` so the oracle can replay
    the byte slicing with blob arithmetic. Verifies the media path's batch
    iteration, binary slicing, and schema end-to-end at value level — the
    decode kernel itself stays the documented stub (the container has no
    codec libraries; a real sampler swaps one inner function).

    Scale shape: narrow map over the scan; frames are content-pruned to
    fingerprints before the per-media aggregate, so raw bytes never
    shuffle."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    frames = MM.sample_frames(media, every_n_bytes=256, max_frames=4)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(
            F.when(F.col("frame_index") == 0, F.md5(F.hex("frame_payload")))
        ).alias("first_frame_md5"),
        F.sum(F.length("frame_payload")).alias("frame_bytes"),
    )


@register(
    "payload_byte_profile",
    """
    WITH m AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS ph FROM documents
      WHERE text IS NOT NULL
    ),
    b AS (
      SELECT media_id,
             CAST(('0x' || substring(ph, i.i * 2 + 1, 2)) AS INTEGER) AS byte
      FROM m, unnest(range(0, length(ph) // 2)) AS i(i)
    ),
    counts AS (
      SELECT media_id, byte, count(*) AS c FROM b GROUP BY media_id, byte
    )
    SELECT media_id,
           count(*) AS n_distinct_bytes,
           CAST(max(c) AS BIGINT) AS max_byte_count,
           min(byte) FILTER (WHERE c = (
             SELECT max(c2.c) FROM counts c2 WHERE c2.media_id = counts.media_id
           )) AS most_common_byte
    FROM counts GROUP BY media_id
    """,
)
def payload_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level payload profiling via mapInArrow — the arrow-NATIVE batch
    API (pyarrow RecordBatches in and out, no pandas conversion), completing
    the Python-kernel family alongside mapInPandas / applyInPandas / UDTF.
    Per payload: distinct byte count, the modal byte's frequency, and the
    modal byte itself (smallest on ties — deterministic). All-integer
    output, so the hash compare is exact by construction.

    This is the pre-pass a media pipeline uses for cheap content sniffing
    (compression detection via byte-entropy proxies, magic-byte surveys)
    before any decode. Narrow map over the scan; the oracle replays the
    byte iteration through hex pairs (DuckDB cannot iterate BLOBs
    directly)."""
    import collections

    import pyarrow as pa

    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )

    out_schema = (
        "media_id long, n_distinct_bytes long, max_byte_count long, "
        "most_common_byte int"
    )
    # The declared output schema must match the arrow batch EXACTLY —
    # from_pydict would infer int64 for most_common_byte where Spark
    # expects int32, and the JVM-side accessor then fails.
    arrow_schema = pa.schema(
        [
            ("media_id", pa.int64()),
            ("n_distinct_bytes", pa.int64()),
            ("max_byte_count", pa.int64()),
            ("most_common_byte", pa.int32()),
        ]
    )

    def kernel(batches):  # noqa: ANN001
        for batch in batches:
            mids = batch.column("media_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            rows = {"media_id": [], "n_distinct_bytes": [],
                    "max_byte_count": [], "most_common_byte": []}
            for mid, payload in zip(mids, payloads):
                counts = collections.Counter(payload or b"")
                if not counts:
                    continue
                max_c = max(counts.values())
                modal = min(bv for bv, c in counts.items() if c == max_c)
                rows["media_id"].append(mid)
                rows["n_distinct_bytes"].append(len(counts))
                rows["max_byte_count"].append(max_c)
                rows["most_common_byte"].append(modal)
            yield pa.RecordBatch.from_pydict(rows, schema=arrow_schema)

    return media.mapInArrow(kernel, out_schema)


@register(
    "image_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 13 AS INTEGER) AS width,
             CAST(3 + doc_id % 7 AS INTEGER) AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, width, height, r.r AS r,
             (media_id * 3 + r.r) % 256 AS bb
      FROM m, unnest(range(0, height)) AS r(r)
    )
    SELECT media_id, width, height,
           CAST(54 + height * ((width * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes,
           CAST(max(CASE WHEN r = 0 THEN bb END) AS INTEGER) AS top_b,
           CAST((100 * sum(bb)) // height AS BIGINT) AS mean_b_e2
    FROM px GROUP BY media_id, width, height
    """,
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE image decode under oracle: per document, synthesize a real
    spec-conformant 24-bit BMP (multimodal.synth_bmp — file header, 40-byte
    info header, 4-byte stride padding, bottom-up rows), decode it with the
    REAL pure-Python BMP parser behind the injectable decoder registry
    (multimodal.decode_bmp — no shared code with the builder), and emit
    exact integer stats: header geometry, total bytes, top-left blue (pins
    bottom-up un-reversal) and the scaled blue mean (pins full-raster walk
    incl. stride skipping). The oracle predicts every statistic in closed
    form from the construction, so a decoder that misreads the header,
    stride, or row order hash-mismatches immediately.

    Scale shape: two narrow Arrow-batched maps over the scan (build,
    decode) + a final tiny aggregate-free projection; no shuffle at all.
    Real corpora swap the synthesize step for a binaryFile scan
    (sources/media.py) and PNG/JPEG decoders via register_image_decoder."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 13).cast("int").alias("w"),
        (3 + F.col("doc_id") % 7).cast("int").alias("h"),
    )

    def build(batches):  # noqa: ANN001
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        MM.synth_bmp(int(m), int(w), int(h))
                        for m, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"])
                    ],
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return MM.image_decode_stats(media)


@register(
    "png_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 9 AS INTEGER) AS width,
             CAST(3 + doc_id % 5 AS INTEGER) AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, width, height,
             (media_id + 7 * r.r + 3 * c.c) % 256 AS bb
      FROM m, unnest(range(0, height)) AS r(r), unnest(range(0, width)) AS c(c)
    )
    SELECT media_id, width, height,
           CAST(media_id % 256 AS INTEGER) AS top_b,
           CAST((100 * sum(bb)) // (width * height) AS BIGINT) AS mean_b_e2
    FROM px GROUP BY media_id, width, height
    """,
)
def png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE PNG decode under oracle — stdlib zlib, no codec library.

    Per document, synthesize a real spec-conformant 8-bit PNG
    (multimodal.synth_png — chunk CRCs, deflated scanlines, forward
    filtering) with the color type cycling gray/RGB/RGBA (doc_id % 3) and
    the scanline filter cycling None/Sub/Up/Average/Paeth (doc_id % 5), so
    every filter-reversal branch and channel layout executes under the
    gate. Decode through the registry's pure-Python PNG parser
    (multimodal.decode_png — inflate + per-spec unfiltering) and emit
    closed-form stats: IHDR geometry, top-left blue (pins row/col origin),
    exact scaled blue mean (pins full unfilter correctness — one wrong
    Paeth predictor corrupts every later pixel in the row).

    Scale shape: two narrow Arrow-batched maps over the scan, no shuffle.
    Real corpora swap the synthesize step for a binaryFile scan
    (sources/media.py); the decoder registry stays the same."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 9).cast("int").alias("w"),
        (3 + F.col("doc_id") % 5).cast("int").alias("h"),
        (F.col("doc_id") % 5).cast("int").alias("ft"),
        F.element_at(
            F.array(F.lit(0), F.lit(2), F.lit(6)),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("ct"),
    )

    out_cols = ["media_id", "width", "height", "top_b", "mean_b_e2"]

    def build_and_decode(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for mid, w, h, ft, ct in zip(
                pdf["media_id"], pdf["w"], pdf["h"], pdf["ft"], pdf["ct"]
            ):
                payload = MM.synth_png(
                    int(mid), int(w), int(h), color_type=int(ct), filter_type=int(ft)
                )
                img = MM.decode_image(payload)
                flat_b = [px[0] for row in img.rows for px in row]
                rows.append(
                    (
                        mid,
                        img.width,
                        img.height,
                        img.rows[0][0][0],
                        (100 * sum(flat_b)) // len(flat_b),
                    )
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return docs.mapInPandas(
        build_and_decode,
        "media_id long, width int, height int, top_b int, mean_b_e2 long",
    )


@register(
    "gif_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 11 AS INTEGER) AS width,
             CAST(3 + doc_id % 6 AS INTEGER) AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, width, height, r.r AS r, c.c AS c,
             ((media_id + 7 * r.r + 3 * c.c) % 256 * 7 + 3) % 256 AS bb
      FROM m, unnest(range(0, height)) AS r(r), unnest(range(0, width)) AS c(c)
    )
    SELECT media_id, width, height,
           CAST(((media_id % 256) * 7 + 3) % 256 AS INTEGER) AS top_b,
           CAST((100 * sum(bb)) // (width * height) AS BIGINT) AS mean_b_e2
    FROM px GROUP BY media_id, width, height
    """,
)
def gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE GIF decode under oracle — real LZW decompression, no codec
    library. Per document, synthesize a spec-conformant GIF89a
    (multimodal.synth_gif — global color table, valid variable-width LZW
    stream via the no-compression Clear-code technique, interlaced for odd
    doc_ids) and decode with multimodal.decode_gif (chunked sub-block
    reassembly, true LZW with dictionary/width handling, palette lookup,
    4-pass interlace re-ordering). Emitted stats are closed-form: geometry,
    top-left blue (pins interlace row targeting — pass 4 owns row 1, so a
    wrong pass order corrupts it), and the exact scaled blue mean through
    the palette indirection.

    Scale shape: two narrow Arrow-batched maps over the scan, no shuffle."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 11).cast("int").alias("w"),
        (3 + F.col("doc_id") % 6).cast("int").alias("h"),
        (F.col("doc_id") % 2 == 1).alias("il"),
    )

    out_cols = ["media_id", "width", "height", "top_b", "mean_b_e2"]

    def build_and_decode(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for mid, w, h, il in zip(pdf["media_id"], pdf["w"], pdf["h"], pdf["il"]):
                payload = MM.synth_gif(int(mid), int(w), int(h), interlaced=bool(il))
                img = MM.decode_image(payload)
                flat_b = [px[0] for row in img.rows for px in row]
                rows.append(
                    (
                        mid,
                        img.width,
                        img.height,
                        img.rows[0][0][0],
                        (100 * sum(flat_b)) // len(flat_b),
                    )
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return docs.mapInPandas(
        build_and_decode,
        "media_id long, width int, height int, top_b int, mean_b_e2 long",
    )


@register(
    "jpeg_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 13 AS INTEGER) AS width,
             CAST(3 + doc_id % 7 AS INTEGER) AS height
      FROM documents
    ),
    tiles AS (
      SELECT media_id, width, height, tr.tr AS tr, tc.tc AS tc,
             (media_id + 7 * tr.tr + 3 * tc.tc) % 256 AS i,
             least(8, width - 8 * tc.tc) * least(8, height - 8 * tr.tr) AS npix
      FROM m,
           unnest(range(0, (height + 7) // 8)) AS tr(tr),
           unnest(range(0, (width + 7) // 8)) AS tc(tc)
    ),
    dec AS (
      -- closed-form replica of the DC-only quantization roundtrip:
      -- RGB -> YCbCr (floats), DC quantize (luma /16, chroma /17),
      -- dequantize (qCb*17/8 = qCb*2.125, exact dyadic), YCbCr -> B,
      -- floor(x+0.5) rounding, clamp. Validated in pytest against the
      -- full codec for ALL 256 tile colors with >=1e-3 margin to every
      -- floor boundary (float noise is ~1e-12).
      SELECT media_id, width, height, tr, tc, npix,
             greatest(0.0, least(255.0, floor(
               floor(8.0 * ((0.299 * ((i * 5 + 1) % 256)
                             + 0.587 * ((i * 3 + 2) % 256)
                             + 0.114 * ((i * 7 + 3) % 256)) - 128.0) / 16.0
                     + 0.5) * 2.0 + 128.0
               + 1.772 * (floor(8.0 * ((-0.168736 * ((i * 5 + 1) % 256)
                                        - 0.331264 * ((i * 3 + 2) % 256)
                                        + 0.5 * ((i * 7 + 3) % 256)
                                        + 128.0) - 128.0) / 17.0
                                + 0.5) * 2.125)
               + 0.5))) AS b_dec
      FROM tiles
    )
    SELECT media_id, width, height,
           CAST(((width + 7) // 8) * ((height + 7) // 8) AS INTEGER) AS n_mcus,
           CAST(max(CASE WHEN tr = 0 AND tc = 0 THEN b_dec END) AS INTEGER) AS top_b,
           CAST((100 * CAST(sum(b_dec * npix) AS BIGINT)) // (width * height)
                AS BIGINT) AS mean_b_e2
    FROM dec GROUP BY media_id, width, height
    """,
)
def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE baseline JPEG decode under an EXACT oracle — despite JPEG
    being lossy. Per document, synthesize a real JFIF baseline JPEG
    (operators/jpeg.py synth_jpeg — Annex K quant/Huffman tables, float
    DCT, DPCM + run-length entropy coding) whose 8×8 tiles are constant
    colors, then decode with the full real pipeline (marker parse, Huffman
    decode, dequantize, IDCT, YCbCr→RGB). Constant tiles make the DCT
    energy pure DC, so the decoded value is a closed-form quantization
    roundtrip the oracle replicates in SQL — validated for all 256 tile
    colors with ≥1e-3 margin to every rounding boundary (pytest), nine
    orders above float noise. Emits SOF0 geometry, the actual MCU count
    walked by the entropy decoder, top-left blue, and the exact scaled
    blue mean over the raster.

    Scale shape: one narrow Arrow-batched map over the scan, no shuffle."""
    import pandas as _pd

    from storm_data_etl_spark.operators import jpeg as J

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 13).cast("int").alias("w"),
        (3 + F.col("doc_id") % 7).cast("int").alias("h"),
    )

    out_cols = ["media_id", "width", "height", "n_mcus", "top_b", "mean_b_e2"]

    def build_and_decode(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for mid, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"]):
                payload = J.synth_jpeg(int(mid), int(w), int(h))
                dec = J.decode_jpeg(payload)
                raster = J.jpeg_to_image_rows(dec)
                flat_b = [px[0] for row in raster for px in row]
                rows.append(
                    (
                        mid,
                        dec.width,
                        dec.height,
                        dec.mcus_x * dec.mcus_y,
                        raster[0][0][0],
                        (100 * sum(flat_b)) // len(flat_b),
                    )
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return docs.mapInPandas(
        build_and_decode,
        "media_id long, width int, height int, n_mcus int, top_b int, mean_b_e2 long",
    )


@register(
    "video_frame_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 13 AS INTEGER) AS width,
             CAST(3 + doc_id % 7 AS INTEGER) AS height,
             CAST(3 + doc_id % 4 AS INTEGER) AS n_frames
      FROM documents
    ),
    fr AS (
      SELECT media_id, width, height, f.f AS frame_index
      FROM m, unnest(range(0, n_frames)) AS f(f)
      WHERE f.f % 2 = 0
    ),
    tiles AS (
      SELECT media_id, width, height, frame_index,
             (media_id + frame_index + 7 * tr.tr + 3 * tc.tc) % 256 AS i,
             least(8, width - 8 * tc.tc) * least(8, height - 8 * tr.tr) AS npix,
             tr.tr AS tr, tc.tc AS tc
      FROM fr,
           unnest(range(0, (height + 7) // 8)) AS tr(tr),
           unnest(range(0, (width + 7) // 8)) AS tc(tc)
    ),
    dec AS (
      SELECT media_id, width, height, frame_index, tr, tc, npix,
             greatest(0.0, least(255.0, floor(
               floor(8.0 * ((0.299 * ((i * 5 + 1) % 256)
                             + 0.587 * ((i * 3 + 2) % 256)
                             + 0.114 * ((i * 7 + 3) % 256)) - 128.0) / 16.0
                     + 0.5) * 2.0 + 128.0
               + 1.772 * (floor(8.0 * ((-0.168736 * ((i * 5 + 1) % 256)
                                        - 0.331264 * ((i * 3 + 2) % 256)
                                        + 0.5 * ((i * 7 + 3) % 256)
                                        + 128.0) - 128.0) / 17.0
                                + 0.5) * 2.125)
               + 0.5))) AS b_dec
      FROM tiles
    )
    SELECT media_id, CAST(frame_index AS INTEGER) AS frame_index,
           width, height,
           CAST(max(CASE WHEN tr = 0 AND tc = 0 THEN b_dec END) AS INTEGER) AS top_b,
           CAST((100 * CAST(sum(b_dec * npix) AS BIGINT)) // (width * height)
                AS BIGINT) AS mean_b_e2
    FROM dec GROUP BY media_id, frame_index, width, height
    """,
)
def video_frame_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE video frame sampling under an exact oracle: per document,
    synthesize a real RIFF/AVI container holding an MJPEG stream
    (multimodal.synth_avi — avih/strl headers, word-aligned 00dc movi
    chunks, idx1) of 3–6 real baseline JPEG frames, demux it
    (multimodal.decode_avi_frames — recursive RIFF walk), sample every
    2nd frame, and FULLY decode only the sampled frames through the real
    JPEG pipeline. One doc row explodes into one row per sampled frame
    with the closed-form decode stats (same validated quantization
    roundtrip as jpeg_decode_stats, seeded by media_id + frame_index).

    Scale shape: one narrow Arrow-batched map, no shuffle; unsampled
    frames are demuxed but never entropy-decoded — the actual economics
    of keyframe sampling over 100 TB of video."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 13).cast("int").alias("w"),
        (3 + F.col("doc_id") % 7).cast("int").alias("h"),
        (3 + F.col("doc_id") % 4).cast("int").alias("nf"),
    )

    def build(batches):  # noqa: ANN001
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        MM.synth_avi(int(m), int(w), int(h), int(nf))
                        for m, w, h, nf in zip(
                            pdf["media_id"], pdf["w"], pdf["h"], pdf["nf"]
                        )
                    ],
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return MM.sample_video_frames(media, stride=2, max_frames=4)


@register(
    "audio_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             CAST(40 + doc_id % 23 AS BIGINT) AS n_frames
      FROM documents
    ),
    s AS (
      SELECT media_id, channels, n_frames, i.i AS i, ch.ch AS ch,
             (media_id * 31 + i.i * 7 + ch.ch * 13) % 201 - 100 AS v,
             CASE WHEN i.i > 0
                  THEN (media_id * 31 + (i.i - 1) * 7 + ch.ch * 13) % 201 - 100
             END AS vprev
      FROM m, unnest(range(0, n_frames)) AS i(i),
              unnest(range(0, channels)) AS ch(ch)
    )
    SELECT media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           channels,
           n_frames,
           CAST(n_frames * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(max(abs(v)) AS INTEGER) AS peak_abs,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN ch = 0 AND i > 0 AND v * vprev < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
    FROM s GROUP BY media_id, channels, n_frames
    """,
)
def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE WAV/PCM decode under oracle — stdlib struct, no codec library.

    Per document, synthesize a real RIFF/WAVE file (multimodal.synth_wav —
    fmt chunk, an odd-length LIST junk chunk that forces word-aligned
    chunk skipping, interleaved PCM data) with channel count cycling 1/2
    (doc_id % 2) and sample width cycling 8-bit unsigned / 16-bit signed
    (doc_id % 3 == 0 → 8-bit), then decode with multimodal.decode_wav and
    emit closed-form stats: fmt geometry, frame count, integer duration,
    peak |sample|, exact Σv² energy (pins every sample byte) and strict
    sign-change zero crossings on channel 0 (pins frame ORDER — a decoder
    that shuffles or de-interleaves frames wrongly keeps energy but breaks
    this). The 8-bit and 16-bit paths must land on identical sample values
    for the hash to match, pinning the unsigned-centering rule.

    Scale shape: one narrow Arrow-batched map over the scan, no shuffle."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (1 + F.col("doc_id") % 2).cast("int").alias("ch"),
        (40 + F.col("doc_id") % 23).cast("int").alias("nf"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(8)).otherwise(F.lit(16)).alias("bits"),
    )

    def build(batches):  # noqa: ANN001
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        MM.synth_wav(
                            int(m), int(nf), rate=8000, channels=int(ch), bits=int(b)
                        )
                        for m, ch, nf, b in zip(
                            pdf["media_id"], pdf["ch"], pdf["nf"], pdf["bits"]
                        )
                    ],
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return MM.audio_decode_stats(media)


@register("bpe_subword_stats", None)  # iterative training: no SQL twin
def bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a REAL byte-pair-encoding tokenizer on the corpus (operators/
    bpe.py — Sennrich et al. 2016) and report per-source subword economics.
    Distributed word counts → driver-side merge loop on the bounded top-K
    frequency table (constant cost, like IVF/PQ training) → distributed
    application over DISTINCT words only, broadcast-joined back. Rows-only
    at the gate (the merge loop is not SQL-expressible); pytest pins the
    learned merges against an independent reference implementation and the
    segmentation against the training vocab."""
    from storm_data_etl_spark.operators import bpe as B

    docs = t(spark, sf_dir, "documents")
    merges = B.train_bpe_merges(docs, n_merges=30, top_words=1000)
    return B.bpe_corpus_stats(docs, merges).orderBy("source")


def _bpe_train_apply_sql(n_merges: int = 12, top_words: int = 200) -> str:
    """DuckDB twin that RE-DERIVES the BPE merge list (unrolled rounds) and
    re-applies it — the train→apply→stats chain under one hash.

    The trick that makes iterative BPE SQL-expressible without recursion:
    every symbol is encoded as ONE character (initial chars map to
    themselves, '</w>' and each round's merged symbol get private-use
    codepoints), so a word's segmentation is a plain string,
    greedy-left-to-right pair merging is string replace() (non-overlapping,
    left-to-right — exactly the training re-segmentation loop), and
    n_subwords is length(). A decode table (char -> symbol string) carries
    the REAL symbol strings so the (count DESC, pair ASC) tie-break
    compares what Python compares. Applying merges in rank order equals
    the kernel's lowest-rank-first loop because a merge at rank r can only
    create pairs of rank > r (any pair containing symbol ab was learned
    after (a, b)). Assumes corpus text contains no U+E0FF..U+E1FF
    private-use chars (asserted: the synthetic corpus is ASCII).

    SECOND assumption (ADVICE r10): no two merge rounds may produce the
    same symbol STRING via different derivations (e.g. 'a'+'bc' and
    'ab'+'c' both yielding 'abc'). The Python kernel keys pair counts and
    re-segmentation by symbol string (duplicates would unify), while this
    twin gives each round a distinct private-use char (they'd stay
    distinct) — pair counts, tie-breaks, and applies could diverge on such
    a corpus. bpe_train_apply ASSERTS the learned merges yield n_merges
    distinct product strings and fails loudly otherwise, so a corpus that
    violates this surfaces as an error, never a silent hash divergence."""
    eow = 57599  # U+E0FF — the '</w>' sentinel as one char
    base = 57600  # U+E100 + k — round k's merged symbol
    parts = [
        f"""
    WITH docs AS MATERIALIZED (
      SELECT source, text FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    words AS MATERIALIZED (
      SELECT source, w FROM (
        SELECT source, unnest(regexp_split_to_array(text, ' +')) AS w FROM docs
      ) WHERE w <> ''
    ),
    wc AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY w
      ORDER BY c DESC, w ASC LIMIT {top_words}
    ),
    v0 AS MATERIALIZED (SELECT w || chr({eow}) AS s, c FROM wc),
    d0 AS MATERIALIZED (
      SELECT DISTINCT s[i] AS ch, s[i] AS sym FROM (
        SELECT s, unnest(range(1, length(s))) AS i FROM v0)
      UNION ALL SELECT chr({eow}), '</w>'
    )"""
    ]
    for k in range(n_merges):
        nc = base + k
        parts.append(
            f""",
    p{k} AS MATERIALIZED (
      SELECT s[i] AS ca, s[i + 1] AS cb, CAST(sum(c) AS BIGINT) AS pc
      FROM (SELECT s, c, unnest(range(1, length(s))) AS i FROM v{k})
      GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
      SELECT ca, cb, da.sym AS sa, db.sym AS sb
      FROM p{k} JOIN d{k} da ON da.ch = ca JOIN d{k} db ON db.ch = cb
      ORDER BY pc DESC, sa ASC, sb ASC LIMIT 1
    ),
    d{k + 1} AS MATERIALIZED (
      SELECT * FROM d{k}
      UNION ALL SELECT chr({nc}), sa || sb FROM b{k}
    ),
    v{k + 1} AS MATERIALIZED (
      SELECT replace(s, coalesce((SELECT ca || cb FROM b{k}),
                                 chr(2) || chr(3)), chr({nc})) AS s, c
      FROM v{k}
    )"""
        )
    merges_union = "\n      UNION ALL ".join(
        f"SELECT {k} AS r, sa, sb FROM b{k}" for k in range(n_merges)
    )
    applied = f"w || chr({eow})"
    for k in range(n_merges):
        applied = (
            f"replace({applied}, coalesce((SELECT ca || cb FROM b{k}), "
            f"chr(2) || chr(3)), chr({base + k}))"
        )
    parts.append(
        f""",
    m AS MATERIALIZED ({merges_union}),
    dw AS MATERIALIZED (SELECT DISTINCT w FROM words),
    segd AS MATERIALIZED (SELECT w, CAST(length({applied}) AS BIGINT) AS n_sub FROM dw),
    per AS MATERIALIZED (
      SELECT source, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(n_sub) AS BIGINT) AS n_subwords
      FROM words JOIN segd USING (w) GROUP BY source
    )
    SELECT source, n_words, n_subwords,
           (1000 * n_subwords) // n_words AS compression_e3,
           (SELECT string_agg(sa || chr(31) || sb, chr(30) ORDER BY r) FROM m)
             AS merges_str
    FROM per"""
    )
    return "".join(parts)


@register("bpe_train_apply", _bpe_train_apply_sql())
def bpe_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end BPE certificate (the quality_model_auc discipline applied
    to the tokenizer): ONE hash certifies train-merges → apply → stats.
    bpe_subword_stats proved the machinery rows-only; this gates it — the
    learned merge LIST itself travels in the result (merges_str, ordered,
    unit/record-separator framed), so a wrong pair count, a wrong
    (count DESC, pair ASC) tie-break, a wrong re-segmentation, or a wrong
    rank-order application each break the hash, not just the aggregate
    row counts.

    Spark side: the production kernel verbatim — distributed word counts,
    driver-side merge loop on the bounded top-200 table (constant cost
    w.r.t. corpus, the IVF/PQ-codebook pattern), Arrow-batched
    segmentation of DISTINCT words only, broadcast-joined back, exact
    integer compression ratio. Oracle side: _bpe_train_apply_sql re-derives
    all 12 rounds with symbols encoded as single private-use chars (see
    its docstring for why replace() is exactly the greedy merge and why
    rank-order application equals the lowest-rank-first kernel loop).

    Scale shape: identical to bpe_subword_stats — two corpus scans (word
    count + word explode), one driver loop over <=200 short rows, one
    broadcast join; Python touches |distinct words| (~Heaps' law), never
    the token stream."""
    from storm_data_etl_spark.operators import bpe as B

    docs = t(spark, sf_dir, "documents").filter(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
    )
    merges = B.train_bpe_merges(docs, n_merges=12, top_words=200)
    # Twin validity guard (ADVICE r10): the DuckDB twin keeps each round's
    # merged symbol distinct (one private-use char per round) while the
    # kernel keys by symbol STRING — if two rounds produced the same
    # product string via different derivations the two sides could
    # legitimately diverge. Cheap driver-side check; fail loudly rather
    # than hand the gate a hash mismatch with no explanation.
    products = [a + b for a, b in merges]
    if len(set(products)) != len(products):
        dupes = sorted({p for p in products if products.count(p) > 1})
        raise AssertionError(
            f"bpe_train_apply: duplicate merge product strings {dupes} — "
            f"the private-use-char oracle twin is not valid on this corpus "
            f"(see _bpe_train_apply_sql docstring)"
        )
    merges_str = chr(30).join(a + chr(31) + b for a, b in merges)
    words = docs.select(
        "source", F.explode(F.split(F.col("text"), " +")).alias("w")
    ).filter(F.col("w") != "")
    seg = B.segment_words_df(words.select("w").distinct(), merges)
    per = (
        words.join(F.broadcast(seg), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_subwords").cast("bigint").alias("n_subwords"),
        )
    )
    return per.select(
        "source",
        "n_words",
        "n_subwords",
        F.expr("(1000 * n_subwords) div n_words").alias("compression_e3"),
        F.lit(merges_str).alias("merges_str"),
    )


@register(
    "bpe_zero_merge_regime",
    """
    WITH words AS (
      SELECT source, w FROM (
        SELECT source, unnest(regexp_split_to_array(text, ' +')) AS w
        FROM documents
      ) WHERE w <> ''
    )
    SELECT source, count(*) AS n_words,
           CAST(sum(length(w) + 1) AS BIGINT) AS n_subwords,
           CAST(floor(1000.0 * sum(length(w) + 1) / count(*)) AS BIGINT)
             AS compression_e3
    FROM words GROUP BY source
    """,
)
def bpe_zero_merge_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE exactness regime: with ZERO merges, segmentation provably
    degenerates to characters + the end-of-word marker, so n_subwords =
    Σ(len(word) + 1) — a closed form DuckDB can compute. This hash-gates
    everything in the BPE dataflow EXCEPT the merge loop itself (the JVM
    word explode, the Arrow-batched segment_words_df pass — which really
    executes, char-splitting every distinct word in Python — the
    broadcast join-back, and the per-source aggregate); the merge loop
    carries pytest parity against an independent reference
    implementation. Same exactness-twin pattern as
    ann_ivf_fullprobe_topk / cms_exact_regime / bloom_exact_regime."""
    from storm_data_etl_spark.operators import bpe as B

    docs = t(spark, sf_dir, "documents")
    return B.bpe_corpus_stats(docs, merges=[])


@register(
    "substring_dup_spans",
    """
    WITH g AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, 24) AS gram
      FROM documents,
           unnest(range(1, greatest(len(text) - 24 + 1, 0) + 1)) AS p(p)
    ),
    d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    dp AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
    sp AS (
      SELECT doc_id, pos,
             max(pos + 24) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS pme
      FROM dp
    ),
    cov AS (
      SELECT doc_id,
             CASE WHEN pme IS NULL THEN 24
                  ELSE greatest(pos + 24 - greatest(pme, pos), 0) END AS nc
      FROM sp
    ),
    pd AS (
      SELECT doc_id, count(*) AS n_dup_positions,
             sum(nc) AS dup_coverage_chars
      FROM cov GROUP BY doc_id
    )
    SELECT d2.doc_id, CAST(len(d2.text) AS BIGINT) AS n_chars,
           CAST(coalesce(pd.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
           CAST(coalesce(pd.dup_coverage_chars, 0) AS BIGINT) AS dup_coverage_chars
    FROM documents d2 LEFT JOIN pd USING (doc_id)
    """,
)
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (operators/dedup.substring_dup_spans
    — the Lee-et-al-2022 substring-dedup core, Spark-decomposed): per
    document, how many 24-gram start positions are duplicated anywhere in
    the corpus and how many characters the merged duplicated spans cover.
    One linear gram explosion, one count aggregate and one semi join both
    keyed on the gram, one per-doc interval-union window — no suffix
    array, no all-pairs stage."""
    from storm_data_etl_spark.operators.dedup import substring_dup_spans as _op

    return _op(t(spark, sf_dir, "documents"), gram_len=24)


@register("ann_ivfpq_topk", None)  # approximate by design: no exact oracle
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed (FAISS IVFADC layout): coarse cells prune the
    candidate set, PQ codes + probe lookup tables score inside the probed
    cells, exact cosine re-ranks the survivors. Both training steps are
    bounded deterministic samples; pytest pins recall vs brute force and
    the every-cell/full-rerank == brute-force identity."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    if not emb.limit(1).count():
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cosine double, rank int"
        )
    probes = S.make_probes(emb, [0, 1, 2, 3, 4])
    cents = S.train_ivf_centroids(emb, dim=64, n_centroids=8, sample_n=512)
    books = S.train_pq_codebooks(emb, dim=64, m=8, k=16, sample_n=512)
    return S.ivfpq_topk(emb, probes, cents, books, k=10, n_probe=3, rerank=64)


@register(
    "mixed_media_decode_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id, doc_id % 4 AS fmt,
             CAST(4 + doc_id % 9 AS INTEGER) AS width,
             CAST(3 + doc_id % 5 AS INTEGER) AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, fmt, width, height, r.r AS r, c.c AS c,
             CASE fmt
               -- BMP: row-constant (b,g,r) = ((s*3+r), (s*5+r), (s*7+r))
               WHEN 0 THEN (media_id * 3 + r.r) % 256
               -- PNG: b = (s + 7r + 3c) % 256
               WHEN 1 THEN (media_id + 7 * r.r + 3 * c.c) % 256
               -- GIF: palette B of index (s + 7r + 3c) % 256
               WHEN 2 THEN ((media_id + 7 * r.r + 3 * c.c) % 256 * 7 + 3) % 256
               -- JPEG: DC quantization roundtrip of the tile color
               ELSE CAST(greatest(0.0, least(255.0, floor(
                 floor(8.0 * ((0.299 * (((media_id + 7 * (r.r // 8) + 3 * (c.c // 8)) % 256 * 5 + 1) % 256)
                               + 0.587 * (((media_id + 7 * (r.r // 8) + 3 * (c.c // 8)) % 256 * 3 + 2) % 256)
                               + 0.114 * (((media_id + 7 * (r.r // 8) + 3 * (c.c // 8)) % 256 * 7 + 3) % 256)) - 128.0) / 16.0
                       + 0.5) * 2.0 + 128.0
                 + 1.772 * (floor(8.0 * ((-0.168736 * (((media_id + 7 * (r.r // 8) + 3 * (c.c // 8)) % 256 * 5 + 1) % 256)
                                          - 0.331264 * (((media_id + 7 * (r.r // 8) + 3 * (c.c // 8)) % 256 * 3 + 2) % 256)
                                          + 0.5 * (((media_id + 7 * (r.r // 8) + 3 * (c.c // 8)) % 256 * 7 + 3) % 256)
                                          + 128.0) - 128.0) / 17.0
                                  + 0.5) * 2.125)
                 + 0.5))) AS BIGINT)
             END AS bb
      FROM m, unnest(range(0, height)) AS r(r), unnest(range(0, width)) AS c(c)
    )
    SELECT media_id,
           CASE fmt WHEN 0 THEN 'bmp' WHEN 1 THEN 'png'
                    WHEN 2 THEN 'gif' ELSE 'jpeg' END AS fmt,
           width, height,
           CAST(max(CASE WHEN r = 0 AND c = 0 THEN bb END) AS INTEGER) AS top_b,
           CAST((100 * sum(bb)) // (width * height) AS BIGINT) AS mean_b_e2
    FROM px GROUP BY media_id, fmt, width, height
    """,
)
def mixed_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-corpus decode — the shape a REAL crawled media corpus
    has: every document becomes a different container (doc_id % 4 cycles
    BMP / PNG / GIF / JPEG), and ONE pass through the sniff-dispatch
    registry must identify and correctly decode each format with no
    per-format branching in the plan. The oracle unifies all four
    closed-form pixel rules (including JPEG's validated lossy
    quantization roundtrip) in a single CASE — a wrong sniff, a decoder
    picking up the wrong payload, or any per-format regression
    hash-mismatches immediately.

    Scale shape: identical to the single-format decode queries — two
    narrow Arrow maps, no shuffle; the registry dispatch is per-row
    inside the kernel."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 4).cast("int").alias("fmt"),
        (4 + F.col("doc_id") % 9).cast("int").alias("w"),
        (3 + F.col("doc_id") % 5).cast("int").alias("h"),
    )

    fmt_names = {0: "bmp", 1: "png", 2: "gif", 3: "jpeg"}

    def build_and_decode(batches):  # noqa: ANN001
        from storm_data_etl_spark.operators import jpeg as J

        for pdf in batches:
            rows = []
            for mid, fmt, w, h in zip(pdf["media_id"], pdf["fmt"], pdf["w"], pdf["h"]):
                mid, fmt, w, h = int(mid), int(fmt), int(w), int(h)
                if fmt == 0:
                    payload = MM.synth_bmp(mid, w, h)
                elif fmt == 1:
                    payload = MM.synth_png(mid, w, h, color_type=2, filter_type=mid % 5)
                elif fmt == 2:
                    payload = MM.synth_gif(mid, w, h, interlaced=bool(mid % 2))
                else:
                    payload = J.synth_jpeg(mid, w, h)
                img = MM.decode_image(payload)  # sniff-dispatch, no fmt hint
                flat_b = [px[0] for row in img.rows for px in row]
                rows.append(
                    (
                        mid,
                        fmt_names[fmt],
                        img.width,
                        img.height,
                        img.rows[0][0][0],
                        (100 * sum(flat_b)) // len(flat_b),
                    )
                )
            yield _pd.DataFrame(
                rows, columns=["media_id", "fmt", "width", "height", "top_b", "mean_b_e2"]
            )

    return docs.mapInPandas(
        build_and_decode,
        "media_id long, fmt string, width int, height int, top_b int, mean_b_e2 long",
    )


@register(
    "image_dhash_groups",
    """
    WITH m AS (SELECT doc_id, 200 + 8 * (doc_id % 7) AS s FROM documents),
    cols AS (
      SELECT doc_id, s, c.c AS c,
             sum((s + 7 * r.r + 3 * c.c) % 256) AS colsum
      FROM m, unnest(range(0, 6)) AS r(r), unnest(range(0, 8)) AS c(c)
      GROUP BY doc_id, s, c.c
    ),
    bits AS (
      SELECT a.doc_id,
             sum(CASE WHEN a.colsum < b.colsum THEN 1 ELSE 0 END
                 * CAST(pow(2, a.c) AS BIGINT)) AS dhash
      FROM cols a JOIN cols b ON b.doc_id = a.doc_id AND b.c = a.c + 1
      GROUP BY a.doc_id
    )
    SELECT CAST(dhash AS BIGINT) AS dhash,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM bits GROUP BY dhash
    """,
)
def image_dhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup WITHOUT embeddings: difference-hash (dHash,
    the classic public perceptual-hash family) computed from REALLY
    decoded rasters. Every document renders one of 7 distinct images
    (seed = doc_id % 7) as a real PNG whose scanline FILTER still varies
    per doc (doc_id % 5) — so byte-identical payloads are NOT what groups
    docs; the pipeline must decode through the real unfilter path and
    hash the pixels. dHash = sign of adjacent column-brightness
    differences (sums, not means — same denominator, no division), packed
    into a BIGINT; grouping by it recovers the 7 duplicate classes with
    exact counts and canonical (min) doc ids.

    Scale shape: one narrow Arrow decode map, one groupBy on the 64-bit
    hash — the image twin of doc_fingerprint_dedup. Near-dup (Hamming ≤ k)
    variants reuse the SimHash banding already in operators/dedup.py."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        # seeds sit in the mod-256 wrap zone so the 7 images carry 7
        # DISTINCT dhashes (a wrap-free gradient hashes identically)
        (200 + 8 * (F.col("doc_id") % 7)).cast("int").alias("s"),
        (F.col("doc_id") % 5).cast("int").alias("ft"),
    )

    def decode_and_hash(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for did, s, ft in zip(pdf["doc_id"], pdf["s"], pdf["ft"]):
                payload = MM.synth_png(int(s), 8, 6, color_type=2, filter_type=int(ft))
                img = MM.decode_image(payload)
                colsums = [
                    sum(img.rows[r][c][0] for r in range(img.height))
                    for c in range(img.width)
                ]
                dhash = sum(
                    (1 << c) for c in range(img.width - 1) if colsums[c] < colsums[c + 1]
                )
                rows.append((did, dhash))
            yield _pd.DataFrame(rows, columns=["doc_id", "dhash"])

    hashed = docs.mapInPandas(decode_and_hash, "doc_id long, dhash long")
    return hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


@register(
    "audio_fingerprint_groups",
    """
    WITH m AS (SELECT doc_id, 100 + 9 * (doc_id % 5) AS s FROM documents),
    en AS (
      SELECT doc_id, s, i.i // 6 AS w,
             sum(((s * 31 + i.i * 7) % 201 - 100)
                 * ((s * 31 + i.i * 7) % 201 - 100)) AS energy
      FROM m, unnest(range(0, 48)) AS i(i)
      GROUP BY doc_id, s, i.i // 6
    ),
    bits AS (
      SELECT a.doc_id,
             sum(CASE WHEN a.energy < b.energy THEN 1 ELSE 0 END
                 * CAST(pow(2, a.w) AS BIGINT)) AS fp
      FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.w = a.w + 1
      GROUP BY a.doc_id
    )
    SELECT CAST(fp AS BIGINT) AS fp,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc
    FROM bits GROUP BY fp
    """,
)
def audio_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio dedup via an acoustic fingerprint over REALLY decoded PCM
    (the energy-contour sign pattern — the public Chromaprint/Shazam
    family's core idea at its simplest): every doc renders one of 5
    distinct 48-frame signals, stored as 16-bit PCM for even docs and
    8-BIT for odd docs — byte-level fingerprints CANNOT group them; the
    pipeline must decode both widths to identical centered samples and
    hash the windowed energy contour (8 windows of 6 frames, sign of
    adjacent diffs packed into a BIGINT). Grouping recovers the 5
    duplicate classes with exact counts and canonical ids.

    Scale shape: one narrow Arrow decode map + one groupBy on the packed
    fingerprint — the audio twin of image_dhash_groups."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id"),
        (100 + 9 * (F.col("doc_id") % 5)).cast("int").alias("s"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(16)).otherwise(F.lit(8)).alias("bits"),
    )

    def decode_and_hash(batches):  # noqa: ANN001
        for pdf in batches:
            rows = []
            for did, s, bits in zip(pdf["doc_id"], pdf["s"], pdf["bits"]):
                payload = MM.synth_wav(int(s), 48, channels=1, bits=int(bits))
                au = MM.decode_wav(payload)
                ch0 = [fr[0] for fr in au.frames]
                en = [sum(x * x for x in ch0[w : w + 6]) for w in range(0, 48, 6)]
                fp = sum((1 << i) for i in range(len(en) - 1) if en[i] < en[i + 1])
                rows.append((did, fp))
            yield _pd.DataFrame(rows, columns=["doc_id", "fp"])

    hashed = docs.mapInPandas(decode_and_hash, "doc_id long, fp long")
    return hashed.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


@register(
    "weighted_corpus_pick",
    """
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln((((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 + 1)
                / 2147483649.0) / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY es_key DESC, doc_id) AS sample_rank
      FROM keyed
    )
    SELECT source, CAST(sample_rank AS INTEGER) AS sample_rank,
           doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE sample_rank <= 3
    """,
)
def weighted_corpus_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted pick of 3 documents WITHOUT replacement
    (operators/sampling.weighted_sample_without_replacement — the
    Efraimidis–Spirakis scheme with the shared deterministic LCG as the
    uniform source), weighting by document length: the reproducible
    "show me k representative-by-weight docs per source" primitive a
    curation review uses. The oracle replays the identical LCG, log and
    ranking arithmetic, so selection parity is exact."""
    from storm_data_etl_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    picked = weighted_sample_without_replacement(
        docs, "doc_id", "n_chars", "source", k=3
    )
    return picked.select(
        "source",
        F.col("sample_rank").cast("int").alias("sample_rank"),
        "doc_id",
        "n_chars",
    )


# =====================================================================
# Bloom-filter cross-corpus membership (Bloom 1970)
# =====================================================================

@register("bloom_cross_dedup", None)  # xxhash64 positions: no SQL oracle
def bloom_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus dedup triage with a Bloom filter: insert the text of
    the src0/src1 documents, test everything else, and reconcile the flags
    against the exact semi-join in the SAME result — per source: doc count,
    bloom-flagged count, exact-duplicate count, and false positives
    (flagged − exact; never negative because Bloom has no false negatives,
    which this output makes auditable row by row).

    Scale shape: the filter is a ≤ m-row distinct-positions table built in
    one map-side-combinable aggregation and BROADCAST to the probe side —
    the 100 TB win over decontaminate-by-join is that the big probe corpus
    never shuffles; only distinct probe keys hash locally against the
    broadcast positions. Rows-only at the gate (xxhash64 positions);
    tests/test_bloom.py pins no-false-negatives and the FPR formula, and
    bloom_exact_regime hash-gates the same machinery exactly."""
    from storm_data_etl_spark.operators import bloom as B

    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    inserted = docs.filter(F.col("source").isin("src0", "src1"))
    probes = docs.filter(~F.col("source").isin("src0", "src1"))
    m, k = 1 << 14, 4
    positions = B.bloom_build(inserted, "text", m_bits=m, k_hashes=k)
    flagged = B.bloom_might_contain(
        probes, "text", positions, m_bits=m, k_hashes=k, flag_col="maybe_dup"
    )
    exact = inserted.select(F.col("text").alias("_t")).distinct()
    joined = flagged.join(
        F.broadcast(exact), flagged["text"] == exact["_t"], "left"
    ).withColumn("is_dup", F.col("_t").isNotNull())
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("maybe_dup").cast("int")).alias("n_flagged"),
            F.sum(F.col("is_dup").cast("int")).alias("n_exact_dup"),
            F.sum((F.col("maybe_dup") & ~F.col("is_dup")).cast("int")).alias(
                "n_false_pos"
            ),
        )
        .orderBy("source")
    )


@register(
    "bloom_exact_regime",
    """
    WITH d AS (
      SELECT doc_id, source, abs(doc_id) % 61 AS key61 FROM documents
      WHERE doc_id IS NOT NULL
    ),
    a AS (SELECT DISTINCT key61 FROM d WHERE source = 'src0')
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN a.key61 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_member
    FROM d LEFT JOIN a ON a.key61 = d.key61
    GROUP BY d.source
    """,
)
def bloom_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter run in its exactness regime, hash-gated against the
    plain semi-join oracle: keys fold to abs(doc_id) % 61 and the position
    map is the IDENTITY on that domain (m = 61, k = 1) — injective, so a
    probe key's position is set iff the key itself was inserted: zero
    false positives, and membership ≡ exact set membership. The SAME
    build/probe pipeline as bloom_cross_dedup executes end to end (distinct
    positions, broadcast join, all-positions-matched test); only the hash
    family differs, so a hash match certifies the Bloom machinery itself."""
    from storm_data_etl_spark.operators import bloom as B

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select(
            "source", F.pmod(F.abs(F.col("doc_id")), F.lit(61)).alias("key61")
        )
    )
    identity = lambda col, m, k: F.array(F.pmod(col, F.lit(m)))  # noqa: E731
    positions = B.bloom_build(
        d.filter(F.col("source") == "src0"), "key61", m_bits=61, k_hashes=1,
        position_fn=identity,
    )
    flagged = B.bloom_might_contain(
        d, "key61", positions, m_bits=61, k_hashes=1,
        flag_col="member", position_fn=identity,
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("member").cast("int")).cast("bigint").alias("n_member"),
    )


@register(
    "bloom_cross_exact_regime",
    """
    WITH d AS (
      SELECT source, abs(doc_id) % 61 AS key61 FROM documents
      WHERE doc_id IS NOT NULL
    ),
    ins AS (
      SELECT DISTINCT key61 FROM d WHERE source IN ('src0', 'src1')
    ),
    p AS (SELECT * FROM d WHERE source NOT IN ('src0', 'src1'))
    SELECT p.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN i.key61 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(sum(CASE WHEN i.key61 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dup,
           CAST(0 AS BIGINT) AS n_false_pos
    FROM p LEFT JOIN ins i ON i.key61 = p.key61
    GROUP BY p.source
    """,
)
def bloom_cross_exact_regime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bloom_cross_dedup's CROSS-CORPUS path in its exactness regime —
    the round-5 gate's one `no_oracle` entry, now hash-certified: the
    identical insert-src0/src1 → probe-the-rest → reconcile-vs-exact
    pipeline (build, broadcast probe, left-join reconciliation, per-source
    four-way aggregate) runs over keys folded to abs(doc_id) % 61 with the
    IDENTITY position map (m = 61, k = 1). Injective positions mean a
    probe flag ≡ exact membership: n_flagged provably equals n_exact_dup
    and n_false_pos is provably zero, and the DuckDB semi-join twin
    hash-gates all four columns. Together with bloom_exact_regime (the
    single-corpus build/probe arithmetic) this certifies every edge of
    the cross-corpus membership machinery; bloom_cross_dedup itself then
    differs only in the hash family (xxhash64, not SQL-expressible)."""
    from storm_data_etl_spark.operators import bloom as B

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select(
            "source", F.pmod(F.abs(F.col("doc_id")), F.lit(61)).alias("key61")
        )
    )
    inserted = d.filter(F.col("source").isin("src0", "src1"))
    probes = d.filter(~F.col("source").isin("src0", "src1"))
    identity = lambda col, m, k: F.array(F.pmod(col, F.lit(m)))  # noqa: E731
    positions = B.bloom_build(
        inserted, "key61", m_bits=61, k_hashes=1, position_fn=identity
    )
    flagged = B.bloom_might_contain(
        probes, "key61", positions, m_bits=61, k_hashes=1,
        flag_col="maybe_dup", position_fn=identity,
    )
    exact = inserted.select(F.col("key61").alias("_k")).distinct()
    joined = flagged.join(
        F.broadcast(exact), flagged["key61"] == exact["_k"], "left"
    ).withColumn("is_dup", F.col("_k").isNotNull())
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("maybe_dup").cast("int")).cast("bigint").alias("n_flagged"),
        F.sum(F.col("is_dup").cast("int")).cast("bigint").alias("n_exact_dup"),
        F.sum((F.col("maybe_dup") & ~F.col("is_dup")).cast("int"))
        .cast("bigint")
        .alias("n_false_pos"),
    )


@register(
    "max_dup_gram_bracket",
    """
    WITH h AS (
      SELECT doc_id, max(len) AS max_dup_len FROM (
        SELECT g.doc_id, 16 AS len
        FROM (SELECT doc_id, substr(text, p.p, 16) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 16 + 1, 0) + 1)) AS p(p)) g
        JOIN (SELECT gram FROM (SELECT substr(text, p.p, 16) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 16 + 1, 0) + 1)) AS p(p))
              GROUP BY gram HAVING count(*) >= 2) d USING (gram)
        GROUP BY g.doc_id
        UNION ALL
        SELECT g.doc_id, 32 AS len
        FROM (SELECT doc_id, substr(text, p.p, 32) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 32 + 1, 0) + 1)) AS p(p)) g
        JOIN (SELECT gram FROM (SELECT substr(text, p.p, 32) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 32 + 1, 0) + 1)) AS p(p))
              GROUP BY gram HAVING count(*) >= 2) d USING (gram)
        GROUP BY g.doc_id
        UNION ALL
        SELECT g.doc_id, 64 AS len
        FROM (SELECT doc_id, substr(text, p.p, 64) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 64 + 1, 0) + 1)) AS p(p)) g
        JOIN (SELECT gram FROM (SELECT substr(text, p.p, 64) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 64 + 1, 0) + 1)) AS p(p))
              GROUP BY gram HAVING count(*) >= 2) d USING (gram)
        GROUP BY g.doc_id
        UNION ALL
        SELECT g.doc_id, 128 AS len
        FROM (SELECT doc_id, substr(text, p.p, 128) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 128 + 1, 0) + 1)) AS p(p)) g
        JOIN (SELECT gram FROM (SELECT substr(text, p.p, 128) AS gram
              FROM documents,
                   unnest(range(1, greatest(len(text) - 128 + 1, 0) + 1)) AS p(p))
              GROUP BY gram HAVING count(*) >= 2) d USING (gram)
        GROUP BY g.doc_id
      ) u GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.max_dup_len, 0) AS INTEGER) AS max_dup_len
    FROM documents d LEFT JOIN h USING (doc_id)
    """,
)
def max_dup_gram_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest duplicated-substring length BRACKET per document (16/32/64/
    128 chars): the doubling-search companion to substring_dup_spans that
    answers "how long is the longest copied span?" without a suffix array.
    Four linear gram passes (dup presence is monotone in L, so the max
    hitting bracket lower-bounds the true maximum length); each pass is
    the proven gram-explode → count ≥ 2 → semi-join plan, gram keys
    near-uniform. Cites Lee et al. 2022 §4 (ExactSubstr) for the target
    semantics; reference repo has no text surface (extension op).

    Measured alternative (round 5): a prefix-pruned doubling chain — only
    start positions whose (L/2)-gram is duplicated generate L-grams, which
    provably yields the identical dup set — benchmarked 2.1× SLOWER here
    (5.65 s vs 2.70 s, sf0.1): this word-soup fixture duplicates most
    16-grams, so the prune retained nearly every position while
    serializing four otherwise-concurrent passes. The pruned form wins
    only when long duplication is rare (real crawl corpora); that is a
    data-statistics switch, not a plan defect, so the parallel 4-pass
    form stays."""
    docs = t(spark, sf_dir, "documents")
    return D.dup_length_bracket(docs, lengths=(16, 32, 64, 128)).withColumn(
        "max_dup_len", F.col("max_dup_len").cast("int")
    )


# =====================================================================
# Mixture epoch planning (pretraining data-mix budgeting)
# =====================================================================

#: Target mixture in integer PARTS per source family (exact arithmetic —
#: parts, not float weights): high-value sources get 3 parts, mid 2,
#: everything else 1. One epoch draws parts_i * T units from source i,
#: where T is capped by the scarcest source relative to its parts.
_MIX_PARTS = {"src0": 3, "src1": 3, "src2": 3, "src3": 2, "src4": 2}


@register(
    "mixture_epoch_plan",
    r"""
    WITH avail AS (
      SELECT source,
             CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
                  AS BIGINT) AS tokens_available,
             CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 3
                         WHEN 'src2' THEN 3 WHEN 'src3' THEN 2
                         WHEN 'src4' THEN 2 ELSE 1 END AS parts
      FROM documents WHERE trim(text) <> ''
      GROUP BY source
    ),
    cap AS (
      SELECT min(tokens_available // parts) AS t_units FROM avail
    )
    SELECT a.source, a.tokens_available, a.parts,
           CAST(a.parts * c.t_units AS BIGINT) AS tokens_at_cap,
           CAST(floor(1000000.0 * (a.parts * c.t_units)
                / a.tokens_available) AS BIGINT) AS sampling_rate_e6,
           a.tokens_available // a.parts = c.t_units AS binding
    FROM avail a CROSS JOIN cap c
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture planning: given integer target PARTS per source
    and the measured token mass of each, compute the largest single-epoch
    no-replacement draw honoring the mixture — T = min_i floor(avail_i /
    parts_i) units, tokens_at_cap_i = parts_i * T — plus each source's
    implied sampling rate and whether it is the BINDING constraint (the
    scarce source that caps the whole epoch; everything else gets
    down-sampled to stay on-mixture). The planner every multi-source
    pretraining run executes before temperature/stratified sampling
    draws the actual rows (those operators live in sampling.py).

    All-integer arithmetic (parts, floor division) so parity is exact.
    Plan: one per-source aggregate (uniform key), a 1-row min broadcast
    back over the 20-row source table — nothing scales with corpus size
    except the first aggregate, which is map-side partial."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
    )
    parts = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(p))
            for s, p in _MIX_PARTS.items()
        ],
        F.lit(1),
    )
    avail = docs.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("tokens_available")
    ).withColumn("parts", parts)
    cap = avail.agg(
        F.min(F.floor(F.col("tokens_available") / F.col("parts"))).alias(
            "t_units"
        )
    )
    joined = avail.crossJoin(F.broadcast(cap))
    tokens_at_cap = (F.col("parts") * F.col("t_units")).cast("bigint")
    return joined.select(
        "source",
        "tokens_available",
        "parts",
        tokens_at_cap.alias("tokens_at_cap"),
        F.floor(
            1000000.0 * (F.col("parts") * F.col("t_units"))
            / F.col("tokens_available")
        )
        .cast("bigint")
        .alias("sampling_rate_e6"),
        (
            F.floor(F.col("tokens_available") / F.col("parts"))
            == F.col("t_units")
        ).alias("binding"),
    )


# =====================================================================
# Corpus profile (one-row dataset card)
# =====================================================================

@register(
    "corpus_profile",
    f"""
    WITH {_SQL_QUALITY_CTES},
    base AS (
      SELECT d.doc_id, d.lang, d.source,
             length(coalesce(d.text, '')) AS n_chars_txt,
             CASE WHEN trim(coalesce(d.text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END
               AS n_tok,
             md5({_SQL_NORM}) AS fp,
             CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_e4
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars_txt) AS BIGINT) AS total_chars,
           count(DISTINCT fp) AS n_unique_fingerprints,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           CAST(sum(q_e4) // count(*) AS BIGINT) AS mean_quality_e4
    FROM base
    """,
)
def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card for the document corpus: doc/source/language
    counts, token and character mass, exact-dup rate (content
    fingerprints), and mean heuristic quality — the summary block a data
    release publishes and a pipeline asserts against between snapshots.

    Float discipline: quality is converted to an integer e4 PER ROW
    (identical doubles on both engines make any deterministic per-row
    function agree), then summed and floor-divided — never a double
    avg(), whose summation order differs across engines. One scan, one
    global aggregate; the distinct counts are the only shuffles and all
    key on uniform values (at 100 TB swap count(DISTINCT fp) for
    approx_count_distinct, the documented exact→approx trade)."""
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        "source",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars_txt"),
        F.when(F.trim(F.coalesce(F.col("text"), F.lit(""))) == "", 0)
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tok"),
        X.fingerprint("text").alias("fp"),
        F.floor(X.quality_score("text") * 10000 + 0.5)
        .cast("bigint")
        .alias("q_e4"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.sum("n_chars_txt").cast("bigint").alias("total_chars"),
        F.count_distinct("fp").alias("n_unique_fingerprints"),
        (F.count(F.lit(1)) - F.count_distinct("fp"))
        .cast("bigint")
        .alias("n_exact_dups"),
        F.floor(F.sum("q_e4") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_quality_e4"),
    )


# =====================================================================
# Quality-threshold sweep (curation operating-curve)
# =====================================================================

@register(
    "quality_threshold_sweep",
    f"""
    WITH {_SQL_QUALITY_CTES},
    qd AS (
      SELECT CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_e4,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok
      FROM documents d JOIN qual q ON q.doc_id = d.doc_id
    ),
    bk AS (SELECT q_e4 // 1000 AS b, count(*) AS nb,
                  CAST(sum(n_tok) AS BIGINT) AS tb
           FROM qd GROUP BY q_e4 // 1000),
    grid AS (SELECT r.r AS b FROM unnest(range(0, 11)) AS r(r)),
    cum AS (
      SELECT g.b,
             CAST(sum(coalesce(bk.nb, 0)) OVER (
               ORDER BY g.b DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_docs_kept,
             CAST(sum(coalesce(bk.tb, 0)) OVER (
               ORDER BY g.b DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS tokens_kept
      FROM grid g LEFT JOIN bk ON bk.b = g.b
    ),
    tot AS (SELECT count(*) AS td, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tt
            FROM qd)
    SELECT b * 1000 AS threshold_e4,
           n_docs_kept, tokens_kept,
           CASE WHEN td = 0 THEN 0 ELSE n_docs_kept * 10000 // td END
             AS pct_docs_e4,
           CASE WHEN tt = 0 THEN 0 ELSE tokens_kept * 10000 // tt END
             AS pct_tokens_e4
    FROM cum CROSS JOIN tot
    """,
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation operating curve: for every quality threshold 0.0 … 1.0
    (step 0.1, as integer e4), how many documents and how much token mass
    survive a `quality >= threshold` filter — the table a pipeline owner
    reads to pick the cut-off (FineWeb/DataComp-style classifier-score
    sweeps).

    Scale shape — the point of this formulation: the corpus is scanned
    ONCE into an 11-bucket histogram (uniform hash-agg), and the sweep is
    a cumulative window over those 11 bounded rows — NOT a thresholds ×
    corpus multiply, which would scan 11× at 100 TB. The single-partition
    window is over ≤11 rows, and the 1-row totals broadcast."""
    docs = t(spark, sf_dir, "documents")
    qd = docs.select(
        F.floor(X.quality_score("text") * 10000 + 0.5).cast("bigint").alias("q_e4"),
        X.token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n_tok"),
    )
    bk = (
        qd.select(F.expr("q_e4 div 1000").alias("b"), "n_tok")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("n_tok").cast("bigint").alias("tb"),
        )
    )
    grid = spark.range(0, 11).select(F.col("id").alias("b"))
    w = Window.orderBy(F.desc("b")).rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        grid.join(bk, "b", "left")
        .select(
            "b",
            F.sum(F.coalesce(F.col("nb"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("n_docs_kept"),
            F.sum(F.coalesce(F.col("tb"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )
    # Totals are the threshold-0 cumulative row — recovered with a second
    # bounded window over the same 11 rows, so the corpus is scanned
    # exactly once (a separate totals aggregate would re-scan: Spark does
    # not share subtrees across join branches without an explicit cache).
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = cum.select(
        "b",
        "n_docs_kept",
        "tokens_kept",
        F.max("n_docs_kept").over(w_all).alias("td"),
        F.max("tokens_kept").over(w_all).alias("tt"),
    )
    return tot.select(
        (F.col("b") * 1000).alias("threshold_e4"),
        "n_docs_kept",
        "tokens_kept",
        F.when(F.col("td") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("n_docs_kept * 10000 div td"))
        .alias("pct_docs_e4"),
        F.when(F.col("tt") == 0, F.lit(0).cast("bigint"))
        .otherwise(F.expr("tokens_kept * 10000 div tt"))
        .alias("pct_tokens_e4"),
    )


# =====================================================================
# Hard-negative mining for embedding/reranker training
# =====================================================================

@register(
    "hard_negative_mining",
    f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS probe_vec,
             label AS probe_label
      FROM embeddings
      WHERE vec_id < 8 AND embedding IS NOT NULL AND label IS NOT NULL
    ),
    pairs AS (
      SELECT p.probe_id, p.probe_label, e.vec_id, e.label AS neg_label,
             e.embedding::DOUBLE[] AS ev, p.probe_vec
      FROM embeddings e, probes p
      WHERE e.embedding IS NOT NULL AND e.label IS NOT NULL
        AND e.label <> p.probe_label
    ),
    scored AS (
      SELECT probe_id, probe_label, vec_id, neg_label,
             {{cos}} AS cos_raw
      FROM pairs
    ),
    ranked AS (
      SELECT probe_id, probe_label, vec_id, neg_label, cos_raw,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos_raw DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT probe_id, probe_label, vec_id, neg_label,
           round(cos_raw, 6) AS cosine, rank
    FROM ranked WHERE rank <= 5
    """.format(cos=_sql_cosine("ev", "probe_vec")),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding / reranker training:
    for each probe vector, the 5 most-similar vectors with a DIFFERENT
    label — maximally confusing wrong-class examples, the negatives that
    actually move a contrastive loss (easy random negatives teach
    nothing). Deterministic ties on vec_id.

    Scale shape: broadcast probes × one full scan (identical to the
    brute-force ANN baseline), label filter applied before scoring so
    same-class pairs never pay the dot product; per-probe top-5 via a
    window over the probe's candidate set. At 100 TB the scan path swaps
    for the IVF/LSH-bucketed variants (operators/similarity.py) with the
    same label-exclusion predicate pushed into the bucket join."""
    emb = t(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
        F.col("label").alias("probe_label"),
    )
    scored = (
        emb.select("vec_id", F.col("label").alias("neg_label"), "embedding")
        .crossJoin(F.broadcast(probes))
        .filter(F.col("neg_label") != F.col("probe_label"))
        .withColumn("cos_raw", V.cosine("embedding", "probe_vec"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "probe_id",
            "probe_label",
            "vec_id",
            "neg_label",
            F.round("cos_raw", 6).alias("cosine"),
            "rank",
        )
    )


# =====================================================================
# Differentially-private histogram release (deterministic Laplace)
# =====================================================================

@register(
    "dp_noise_histogram",
    f"""
    WITH c AS (
      SELECT event_type, count(*) AS true_count
      FROM events WHERE event_type IS NOT NULL
      GROUP BY event_type
    ),
    r AS (
      SELECT event_type, true_count,
             row_number() OVER (ORDER BY event_type) AS rk
      FROM c
    ),
    u AS (
      SELECT event_type, true_count,
             (({SP.lcg_value_sql('rk')}) + 1) / 2147483649.0 AS uu
      FROM r
    )
    SELECT event_type, true_count,
           CAST(floor((true_count
                       + CASE WHEN uu < 0.5 THEN ln(2 * uu)
                              ELSE -ln(2 * (1 - uu)) END) * 10000) AS BIGINT)
             AS noised_count_e4
    FROM u
    """,
)
def dp_noise_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: per-type event counts
    with Laplace(1/ε) noise at ε=1 — the mechanism a pipeline uses to
    publish usage statistics without exposing individual contribution.
    Noise is drawn by inverse-CDF from the shared deterministic LCG
    (seeded by the type's alphabetic rank), so the release is
    reproducible and the oracle replays it exactly; a production release
    swaps the LCG for a CSPRNG and drops true_count from the output —
    this audit form emits both so the noise magnitude is inspectable.

    Scale shape: one map-side-combined count shuffle; the rank window
    runs over the distinct types only (bounded), never the events."""
    c = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    w = Window.orderBy("event_type")
    r = c.select("event_type", "true_count", F.row_number().over(w).alias("rk"))
    uu = (SP.lcg_value("rk") + 1) / F.lit(2147483649.0)
    noise = F.when(uu < 0.5, F.log(2 * uu)).otherwise(-F.log(2 * (1 - uu)))
    return r.select(
        "event_type",
        "true_count",
        F.floor((F.col("true_count") + noise) * 10000)
        .cast("bigint")
        .alias("noised_count_e4"),
    )


@register(
    "audio_energy_segments",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             CAST(40 + doc_id % 23 AS BIGINT) AS n_frames
      FROM documents
    ),
    s AS (
      SELECT media_id, i.i // 10 AS w,
             (media_id * 31 + i.i * 7) % 201 - 100 AS v
      FROM m, unnest(range(0, n_frames)) AS i(i)
    ),
    wins AS (
      SELECT media_id, w, CAST(sum(v * v) AS BIGINT) AS energy
      FROM s GROUP BY media_id, w
    ),
    act AS (SELECT media_id, w FROM wins WHERE energy > 34000),
    isl AS (
      SELECT media_id,
             w - row_number() OVER (PARTITION BY media_id ORDER BY w) AS grp
      FROM act
    ),
    segs AS (
      SELECT media_id, grp, count(*) AS run FROM isl GROUP BY media_id, grp
    ),
    per_media AS (
      SELECT media_id, count(*) AS n_windows,
             CAST(sum(CASE WHEN energy > 34000 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_active
      FROM wins GROUP BY media_id
    )
    SELECT p.media_id, p.n_windows, p.n_active,
           CAST(coalesce(t.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(coalesce(t.longest_run, 0) AS BIGINT) AS longest_run
    FROM per_media p
    LEFT JOIN (
      SELECT media_id, count(*) AS n_segments, max(run) AS longest_run
      FROM segs GROUP BY media_id
    ) t USING (media_id)
    """,
)
def audio_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity segmentation over REAL decoded audio —
    the VAD front-end of a speech-data pipeline: per document, synthesize
    a real RIFF/WAVE file (multimodal.synth_wav, channel/sample-width
    cycling as in audio_decode_stats), decode it through the real chunk
    walker, window channel 0 into 10-sample frames, threshold exact Σv²
    energy at 34000, and merge contiguous active windows into segments
    with the gaps-and-islands pattern. Emits per media: window count,
    active count, segment count, and the longest active run. The oracle
    rebuilds everything from the closed-form sample rule — one shuffled
    de-interleaved sample and every segment boundary moves.

    Scale shape: the Arrow-batched decode emits one small row per window
    (frames/10), then ONE shuffle on media_id serves the window agg, the
    islands row_number, the segment agg, and the final join — all keyed
    on media_id. No driver collect; threshold logic is relational, so
    swapping the energy rule (e.g. dB floor) is a one-line change."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (1 + F.col("doc_id") % 2).cast("int").alias("ch"),
        (40 + F.col("doc_id") % 23).cast("int").alias("nf"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(8)).otherwise(F.lit(16)).alias("bits"),
    )

    def build(batches):  # noqa: ANN001
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        MM.synth_wav(
                            int(m), int(nf), rate=8000, channels=int(ch), bits=int(b)
                        )
                        for m, ch, nf, b in zip(
                            pdf["media_id"], pdf["ch"], pdf["nf"], pdf["bits"]
                        )
                    ],
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    wins = MM.audio_energy_windows(media, frame=10)
    # Optimization r12 (guide §2.4/§4): wins feeds BOTH the segment chain
    # and the per-media window aggregate — two lineage references that
    # each re-ran the Python WAV synth + decode pass. Pinned, the Arrow
    # decode runs once; the window rows are tiny (media_id, w, energy).
    wins = _pin(wins)
    active = wins.filter(F.col("energy") > 34000)
    grp = (
        F.col("w")
        - F.row_number().over(Window.partitionBy("media_id").orderBy("w"))
    ).alias("grp")
    segs = (
        active.select("media_id", grp)
        .groupBy("media_id", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    seg_stats = segs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_segments_raw"),
        F.max("run").alias("longest_run_raw"),
    )
    per_media = wins.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum((F.col("energy") > 34000).cast("int")).cast("bigint").alias("n_active"),
    )
    return per_media.join(seg_stats, "media_id", "left").select(
        "media_id",
        "n_windows",
        "n_active",
        F.coalesce(F.col("n_segments_raw"), F.lit(0)).cast("bigint").alias(
            "n_segments"
        ),
        F.coalesce(F.col("longest_run_raw"), F.lit(0)).cast("bigint").alias(
            "longest_run"
        ),
    )


@register(
    "chunk_boundary_overlap",
    """
    WITH chunked AS (
      SELECT doc_id * 2 AS chunk_id, source,
             substr(text, 1, length(text) // 2 + 12) AS text
      FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 96
      UNION ALL
      SELECT doc_id * 2 + 1, source,
             substr(text, length(text) // 2 - 11)
      FROM documents WHERE doc_id % 7 = 0 AND length(text) >= 96
      UNION ALL
      SELECT doc_id * 2, source, text
      FROM documents WHERE NOT (doc_id % 7 = 0 AND length(text) >= 96)
    ),
    keyed AS (
      SELECT chunk_id, source,
             substr(text, 1, 24) AS prefix24,
             substr(text, length(text) - 23, 24) AS suffix24
      FROM chunked WHERE length(text) >= 48
    ),
    pairs AS (
      SELECT a.source, a.chunk_id AS left_id, b.chunk_id AS right_id
      FROM keyed a JOIN keyed b
        ON a.source = b.source AND a.suffix24 = b.prefix24
       AND a.chunk_id <> b.chunk_id
    )
    SELECT source,
           count(*) AS n_pairs,
           count(DISTINCT left_id) AS n_left_docs,
           CAST(min(left_id) AS BIGINT) AS first_left_id
    FROM pairs GROUP BY source
    """,
)
def chunk_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-boundary artifact detection — the dedup case MinHash misses:
    when an upstream chunker splits documents with a fixed character
    overlap, consecutive chunks share an exact 24-char suffix→prefix seam
    even though whole-chunk similarity is low. The corpus twin is chunked
    DETERMINISTICALLY (every 7th long doc splits at midpoint with a
    24-char overlap), so the seam set is a closed form; the detector —
    equi-join of 24-char suffix keys against prefix keys within a source
    — must recover exactly those seams plus any natural collisions, and
    both engines agree on both.

    Scale shape: the seam join is a plain equi-join on (source, 24-char
    key): one shuffle per side on a short uniform key, output bounded by
    true seam pairs — NEVER an all-pairs similarity pass. At 100 TB this
    is the cheapest dedup signal in the repo (fixed-width keys, no
    shingling). Extends the dedup family (operators/dedup.py) with the
    boundary-artifact case."""
    docs = t(spark, sf_dir, "documents")
    is_split = (F.col("doc_id") % 7 == 0) & (F.length("text") >= 96)
    first = docs.filter(is_split).select(
        (F.col("doc_id") * 2).alias("chunk_id"),
        "source",
        F.expr("substring(text, 1, length(text) div 2 + 12)").alias("text"),
    )
    second = docs.filter(is_split).select(
        (F.col("doc_id") * 2 + 1).alias("chunk_id"),
        "source",
        F.expr("substring(text, length(text) div 2 - 11)").alias("text"),
    )
    whole = docs.filter(~is_split).select(
        (F.col("doc_id") * 2).alias("chunk_id"), "source", "text"
    )
    chunked = first.unionByName(second).unionByName(whole)
    keyed = chunked.filter(F.length("text") >= 48).select(
        "chunk_id",
        "source",
        F.expr("substring(text, 1, 24)").alias("prefix24"),
        F.expr("substring(text, length(text) - 23, 24)").alias("suffix24"),
    )
    a = keyed.select(
        F.col("source").alias("a_source"),
        F.col("chunk_id").alias("left_id"),
        "suffix24",
    )
    b = keyed.select(
        F.col("source").alias("b_source"),
        F.col("chunk_id").alias("right_id"),
        "prefix24",
    )
    pairs = a.join(
        b,
        (F.col("a_source") == F.col("b_source"))
        & (F.col("suffix24") == F.col("prefix24"))
        & (F.col("left_id") != F.col("right_id")),
    )
    return pairs.groupBy(F.col("a_source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("left_id").alias("n_left_docs"),
        F.min("left_id").cast("bigint").alias("first_left_id"),
    )


@register(
    "minhash_lcg_lsh_pairs",
    f"""
    WITH norm AS (
      SELECT doc_id AS id, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT id, unnest({_sql_shingles(3)}) AS shingle FROM norm
    ),
    ids AS (
      SELECT id,
             CASE WHEN shingle = '' THEN 0
                  ELSE list_reduce(
                         list_transform(regexp_split_to_array(shingle, ''),
                                        c -> CAST(unicode(c) AS BIGINT)),
                         (a, b) -> (a * 31 + b) % 2147483647)
             END AS sid
      FROM sh
    ),
    hashed AS (
      SELECT id, i.i AS i,
             ((CAST(1103515245 AS BIGINT) * (i.i + 1) + 12345) % 2147483647)
               * sid % 2147483647
               + (CAST(12345 AS BIGINT) * (i.i + 1) + 999331) % 2147483647
               AS raw
      FROM ids, unnest(range(0, 16)) AS i(i)
    ),
    sig AS (
      SELECT id, i, min(raw % 2147483647) AS minh
      FROM hashed GROUP BY id, i
    ),
    bands AS (
      SELECT id, i // 4 AS band,
             string_agg(minh, ':' ORDER BY i) AS band_key
      FROM sig GROUP BY id, i // 4
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    matches AS (
      SELECT c.id_a, c.id_b, c.n_shared_bands,
             CAST(sum(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_match
      FROM cand c
      JOIN sig sa ON sa.id = c.id_a
      JOIN sig sb ON sb.id = c.id_b AND sb.i = sa.i
      GROUP BY c.id_a, c.id_b, c.n_shared_bands
    )
    SELECT id_a, id_b, n_shared_bands,
           CAST((10000 * n_match) // 16 AS BIGINT) AS est_jaccard_e4
    FROM matches
    """,
)
def minhash_lcg_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH with FULLY ORACLE-BACKED hash arithmetic: the
    16 permutation hashes are LCG-family universal hashes
    h_i(x) = (a_i mod p)·x mod p + b_i (p = 2^31-1, a_i/b_i derived
    arithmetically from i), over a PORTABLE polynomial shingle hash
    (fold (acc·31 + codepoint) mod p — both engines split to identical
    codepoints, so the base hash itself is oracle-checked, no dictionary
    and no global sort). 4 bands × 4 rows; candidate pairs
    share at least one exact band; each pair carries its shared-band
    count and the signature-agreement Jaccard estimate in exact integer
    e4. This hash-gates the ENTIRE minhash dataflow — shingling,
    permutation minima, banding, bucket join, estimation — at hash-value
    granularity, which the production xxhash64 path (operators/dedup.py
    minhash_lsh_pairs, rows-only by design) cannot; that path stays the
    100 TB scale form (no dictionary), this one is its certification
    regime. Recall vs exact Jaccard is separately pinned in pytest for
    the xxhash64 path.

    Scale shape: fully scale-clean — shingle explode, per-shingle
    polynomial hash (narrow), (id, i) partial-agg minima, band-key
    equi-join, bounded pair agg; no dictionary, no global sort. The
    xxhash64 path stays the production form only because one built-in
    hash call beats a per-character fold; the dataflow is identical."""
    docs = t(spark, sf_dir, "documents")
    P = 2147483647
    sh = (
        docs.select(
            F.col("doc_id").alias("id"), X.shingles("text", 3).alias("shingles")
        )
        .select("id", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    ids = sh.select(
        "id",
        F.aggregate(
            F.split("shingle", ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(P).cast("long"),
        ).alias("sid"),
    )
    hashed = ids.select(
        "id",
        F.posexplode(F.sequence(F.lit(0), F.lit(15))).alias("i", "_i2"),
        "sid",
    ).select(
        "id",
        "i",
        (
            ((F.lit(1103515245).cast("long") * (F.col("i") + 1) + 12345) % P)
            * F.col("sid").cast("long") % P
            + (F.lit(12345).cast("long") * (F.col("i") + 1) + 999331) % P
        ).alias("raw"),
    )
    # The signature table feeds FOUR consumers (band sides a/b, match
    # legs sa/sb) — without a pin the whole shingle+fold+explode subtree
    # re-evaluates per consumer (measured 4x = ~8 s at sf0.1; pinned
    # ~3.4 s). 80k small rows; released via session.release_pinned().
    sig = _pin(hashed.groupBy("id", "i").agg((F.min(F.col("raw") % P)).alias("minh")))
    band_key = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("i").alias("i"), F.col("minh").alias("m")))
            ),
            lambda x: x["m"].cast("string"),
        ),
        ":",
    )
    bands = sig.groupBy("id", F.expr("i div 4").alias("band")).agg(
        band_key.alias("band_key")
    )
    # Optimization r12 (guide §2.4): both self-join sides re-ran the band
    # aggregate over the pinned signatures — pin the small band table too.
    bands = _pin(bands)
    a = bands.select(
        F.col("id").alias("id_a"),
        F.col("band").alias("band_a"),
        F.col("band_key").alias("k_a"),
    )
    b = bands.select(
        F.col("id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("band_key").alias("k_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("k_a") == F.col("k_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("i").alias("i"), F.col("minh").alias("ma"))
    sb = sig.select(F.col("id").alias("sb_id"), F.col("i").alias("ib"), F.col("minh").alias("mb"))
    matches = (
        cand.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("sb_id")) & (F.col("i") == F.col("ib")))
        .groupBy("id_a", "id_b", "n_shared_bands")
        .agg(
            F.sum((F.col("ma") == F.col("mb")).cast("int"))
            .cast("bigint")
            .alias("n_match")
        )
    )
    return matches.select(
        "id_a",
        "id_b",
        "n_shared_bands",
        F.expr("(10000 * n_match) div 16").cast("bigint").alias("est_jaccard_e4"),
    )


@register(
    "score_calibration_bins",
    f"""
    WITH {_SQL_QUALITY_CTES},
    labeled AS (
      SELECT q.doc_id,
             CAST(q.quality * 10000 AS BIGINT) AS score_e4,
             least(9, CAST(floor(q.quality * 10) AS BIGINT)) AS bin,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
      FROM qual q JOIN documents d USING (doc_id)
    )
    SELECT bin,
           count(*) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           CAST((10000 * sum(label)) // count(*) AS BIGINT) AS pos_rate_e4,
           CAST(sum(score_e4) // count(*) AS BIGINT) AS mean_score_e4
    FROM labeled GROUP BY bin
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration audit — the reliability-diagram table every
    model-based curation filter needs before its scores gate a corpus:
    documents bucketed into FIXED score decile bins (arithmetic bands, no
    global quantile sort), each bin reporting observed positive rate
    (label: document is English — the dominant signal the stopword-based
    quality heuristic actually keys on) against the bin's mean score, in
    exact integer e4. A well-calibrated score has pos_rate tracking the
    bin midpoint; divergence quantifies the filter's English bias — the
    known C4-heuristic failure mode multilingual pipelines correct for.

    Scale shape: the quality signal is one codegen pass (same expressions
    as doc_quality_scores); binning is arithmetic; one map-side-partial
    agg to <= 10 rows. Nothing sorts, nothing collects."""
    docs = t(spark, sf_dir, "documents")
    labeled = docs.select(
        (X.quality_score("text") * 10000).cast("bigint").alias("score_e4"),
        F.least(
            F.lit(9), F.floor(X.quality_score("text") * 10).cast("bigint")
        ).alias("bin"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return labeled.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.expr("(10000 * sum(label)) div count(*)").cast("bigint").alias(
            "pos_rate_e4"
        ),
        F.expr("sum(score_e4) div count(*)").cast("bigint").alias("mean_score_e4"),
    )


@register(
    "packing_context_sweep",
    r"""
    WITH toks AS (
      SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ),
    pref AS (
      SELECT doc_id, n_tok,
             CAST(coalesce(sum(n_tok) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS s
      FROM toks
    ),
    sweep AS (
      SELECT L.ctx AS ctx_len, doc_id, n_tok, s, s + n_tok AS e
      FROM pref, unnest([128, 256, 512, 1024]) AS L(ctx)
    )
    SELECT ctx_len,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST((max(e) + ctx_len - 1) // ctx_len AS BIGINT) AS n_sequences,
           CAST(sum(CASE WHEN s // ctx_len <> (e - 1) // ctx_len
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing_docs,
           CAST((max(e) + ctx_len - 1) // ctx_len * ctx_len - max(e)
                AS BIGINT) AS tail_waste_tokens,
           CAST((10000 * sum(CASE WHEN s // ctx_len <> (e - 1) // ctx_len
                                  THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS crossing_rate_e4
    FROM sweep GROUP BY ctx_len
    """,
)
def packing_context_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length sweep for sequence packing: the decision table for
    choosing a training context length. For each candidate L in {128,
    256, 512, 1024}, concatenating the corpus in doc_id order and cutting
    at L yields n_sequences, the count of documents whose span crosses a
    sequence boundary (attention-contamination sites under naive packing),
    the tail padding waste, and the crossing rate — all EXACT integer
    arithmetic over one shared prefix-sum pass (sequence_packing_stats is
    the per-sequence deep dive at L=256; this is the sweep that picks L).

    Scale shape: ONE two-phase distributed prefix sum
    (sampling.global_prefix_sum — range shuffle + parallel scan +
    broadcast offsets), then a 4x arithmetic explode and a 4-row agg.
    The sweep costs one extra narrow pass over doc offsets, not one
    packing pass per candidate length."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
    )
    pref = SP.global_prefix_sum(docs, "n_tok", ["doc_id"], out_col="s")
    sweep = pref.select(
        F.explode(F.array(*[F.lit(x) for x in (128, 256, 512, 1024)])).alias(
            "ctx_len"
        ),
        "doc_id",
        "n_tok",
        F.col("s").cast("bigint").alias("s"),
        (F.col("s") + F.col("n_tok")).cast("bigint").alias("e"),
    )
    crossing = (
        F.expr("s div ctx_len") != F.expr("(e - 1) div ctx_len")
    ).cast("int")
    return sweep.groupBy("ctx_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.expr("(max(e) + ctx_len - 1) div ctx_len").cast("bigint").alias(
            "n_sequences"
        ),
        F.sum(crossing).cast("bigint").alias("n_crossing_docs"),
        F.expr(
            "(max(e) + ctx_len - 1) div ctx_len * ctx_len - max(e)"
        ).cast("bigint").alias("tail_waste_tokens"),
        # integer div, not double /: a quotient rounding up to the next
        # representable double would truncate differently than floor
        F.expr(
            "(10000 * sum(CASE WHEN s div ctx_len <> (e - 1) div ctx_len "
            "THEN 1 ELSE 0 END)) div count(1)"
        ).cast("bigint").alias("crossing_rate_e4"),
    )


@register(
    "cdc_chunk_dedup",
    """
    WITH d AS (
      SELECT doc_id, source, text,
             regexp_split_to_array(text, '') AS chars,
             length(text) AS n
      FROM documents WHERE coalesce(text, '') <> ''
    ),
    cutlists AS (
      SELECT doc_id, source, text, n,
             list_append(
               CASE WHEN n >= 8 THEN
                 list_filter(
                   list_transform(range(8, n),
                     i -> CASE WHEN list_reduce(
                                 list_transform(range(i - 7, i + 1),
                                   j -> CAST(unicode(chars[j]) AS BIGINT)),
                                 (a, b) -> (a * 31 + b) % 2147483647
                               ) % 64 = 0
                          THEN i END),
                   x -> x IS NOT NULL)
               ELSE [] END,
               n) AS cuts
      FROM d
    ),
    spans AS (
      SELECT doc_id, source, text,
             unnest(list_zip(list_prepend(0, cuts[1:len(cuts) - 1]), cuts))
               AS z
      FROM cutlists
    ),
    chunks AS (
      SELECT doc_id, source,
             md5(substr(text, CAST(z[1] AS BIGINT) + 1,
                        CAST(z[2] AS BIGINT) - CAST(z[1] AS BIGINT))) AS h,
             CAST(z[2] AS BIGINT) - CAST(z[1] AS BIGINT) AS chunk_len
      FROM spans
    ),
    global_counts AS (
      SELECT h, count(*) AS n_occ FROM chunks GROUP BY h
    )
    SELECT c.source,
           count(*) AS n_chunks,
           CAST(sum(c.chunk_len) AS BIGINT) AS total_chars,
           CAST((100 * sum(c.chunk_len)) // count(*) AS BIGINT)
             AS mean_chunk_len_e2,
           CAST(sum(CASE WHEN g.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(sum(CASE WHEN g.n_occ > 1 THEN c.chunk_len ELSE 0 END)
                AS BIGINT) AS dup_chars
    FROM chunks c JOIN global_counts g USING (h)
    GROUP BY c.source
    """,
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup — the rsync/storage-dedup technique
    applied to corpus text: an 8-char polynomial rolling hash cuts each
    document where hash % 64 == 0 (expected ~64-char chunks whose
    boundaries FOLLOW CONTENT, so an insertion early in a document shifts
    only the chunk it lands in — fixed-width chunking would shift every
    subsequent boundary and destroy dedup). Chunks are md5-fingerprinted
    and counted globally; per source the audit reports chunk geometry and
    how much chunk mass is duplicated corpus-wide. Complements
    chunk_dedup_groups (fixed-width) with the shift-resistant form.

    Scale shape: boundary detection is one narrow O(8·len) pass of
    higher-order expressions (no Python, no explode until chunks);
    the only shuffles are the md5 count (uniform key) and the source
    agg. At 100 TB the md5 group-count is the classic dedup shuffle —
    partial-aggregated, small values."""
    # Optimization r12 (guide §4.2): the boundary detection was an O(8·len)
    # interpreted HOF chain per document, evaluated TWICE (the chunk rows
    # fed both the count aggregate and the join back). Now ONE Arrow kernel
    # pass computes the identical rolling polynomial hash vectorized
    # (windowed int64 dot product, congruent mod P to the per-step fold —
    # exact integer arithmetic), and the global occurrence count rides a
    # window over h (one shuffle) instead of aggregate + join (two).
    P = 2147483647
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.coalesce(F.col("text"), F.lit("")) != "")
        .select("doc_id", "source", "text")
    )

    def chunker(batches):  # noqa: ANN001
        import hashlib

        import numpy as np
        import pandas as pd

        pow31 = (31 ** np.arange(7, -1, -1, dtype=np.int64)).astype(np.int64)
        for pdf in batches:
            srcs: list = []
            hs: list = []
            lens: list = []
            for src, text in zip(pdf["source"], pdf["text"]):
                n = len(text)
                cuts: list[int] = []
                if n >= 9:
                    cp = np.frombuffer(
                        text.encode("utf-32-le"), dtype="<u4"
                    ).astype(np.int64)
                    # windows ending at 1-based i in [8, n-1] = 0-based
                    # starts j in [0, n-9]; H ≡ per-step fold mod P
                    wins = np.lib.stride_tricks.sliding_window_view(cp, 8)[
                        : n - 8
                    ]
                    H = (wins @ pow31) % P
                    cuts = (np.flatnonzero(H % 64 == 0) + 8).tolist()
                cuts.append(n)
                s = 0
                for e in cuts:
                    chunk = text[s:e]
                    srcs.append(src)
                    hs.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
                    lens.append(e - s)
                    s = e
            yield pd.DataFrame(
                {
                    "source": pd.Series(srcs, dtype="object"),
                    "h": pd.Series(hs, dtype="object"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                }
            )

    chunks = d.select("source", "text").mapInPandas(
        chunker, "source string, h string, chunk_len long"
    )
    occ_w = Window.partitionBy("h")
    joined = chunks.withColumn("n_occ", F.count(F.lit(1)).over(occ_w))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").cast("bigint").alias("total_chars"),
        F.expr("(100 * sum(chunk_len)) div count(1)").cast("bigint").alias(
            "mean_chunk_len_e2"
        ),
        F.sum((F.col("n_occ") > 1).cast("int")).cast("bigint").alias(
            "n_dup_chunks"
        ),
        F.sum(F.when(F.col("n_occ") > 1, F.col("chunk_len")).otherwise(0))
        .cast("bigint")
        .alias("dup_chars"),
    )


@register(
    "image_luminance_histogram",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(4 + doc_id % 13 AS INTEGER) AS width,
             CAST(3 + doc_id % 7 AS INTEGER) AS height
      FROM documents
    ),
    px AS (
      SELECT media_id, width,
             (77 * ((media_id * 7 + r.r) % 256)
              + 150 * ((media_id * 5 + r.r) % 256)
              + 29 * ((media_id * 3 + r.r) % 256)) // 256 AS lum
      FROM m, unnest(range(0, height)) AS r(r)
    )
    SELECT media_id, CAST(lum // 32 AS INTEGER) AS bin,
           CAST(sum(width) AS BIGINT) AS n_px
    FROM px GROUP BY media_id, lum // 32
    """,
)
def image_luminance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image luminance histogram over REAL BMP decode — the
    brightness-profile feature an image-curation pipeline computes (too
    dark / blown-out filtering, dedup pre-signal): synthesize the same
    spec-conformant BMPs as image_decode_stats, decode through the real
    parser, and bin integer BT.601 luma ((77R+150G+29B)>>8) into 8
    bands. The closed-form oracle predicts every (image, bin) count from
    the row color rule — a decoder that swaps the stored (b,g,r) channel
    order (the classic BMP bug) moves mass between bins and
    hash-mismatches, which the blue-only statistics of
    image_decode_stats could not detect.

    Scale shape: two narrow Arrow-batched maps (build, decode+bin), one
    tiny keyed agg inside the map output (≤ 8 rows per image), no wide
    shuffle."""
    import pandas as _pd

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (4 + F.col("doc_id") % 13).cast("int").alias("w"),
        (3 + F.col("doc_id") % 7).cast("int").alias("h"),
    )

    def build(batches):  # noqa: ANN001
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        MM.synth_bmp(int(m), int(w), int(h))
                        for m, w, h in zip(pdf["media_id"], pdf["w"], pdf["h"])
                    ],
                }
            )

    media = docs.mapInPandas(build, "media_id long, payload binary")
    return MM.image_luminance_histogram(media, bins=8)


def _sql_dot(a: str, b: str) -> str:
    """Left-to-right double dot fold (same IEEE sequence as vectors.dot)."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


@register(
    "maxsim_late_interaction_topk",
    f"""
    WITH tokens AS (
      SELECT vec_id, t.t AS tok,
             (embedding::DOUBLE[])[t.t * 16 + 1 : t.t * 16 + 16] AS tv
      FROM embeddings, unnest(range(0, 4)) AS t(t)
      WHERE embedding IS NOT NULL
    ),
    qt AS (SELECT vec_id AS probe_id, tok AS q_tok, tv AS qv
           FROM tokens WHERE vec_id < 3),
    dt AS (SELECT vec_id, tok, tv FROM tokens WHERE vec_id >= 3),
    sims AS (
      SELECT q.probe_id, d.vec_id, q.q_tok,
             max({_sql_dot('q.qv', 'd.tv')}) AS best
      FROM qt q JOIN dt d ON true
      GROUP BY q.probe_id, d.vec_id, q.q_tok
    ),
    scored AS (
      SELECT probe_id, vec_id, sum(best) AS maxsim_raw
      FROM sims GROUP BY probe_id, vec_id
    ),
    ranked AS (
      SELECT probe_id, vec_id, maxsim_raw,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY maxsim_raw DESC, vec_id) AS rank
      FROM scored
    )
    SELECT probe_id, vec_id, round(maxsim_raw, 6) AS maxsim, rank
    FROM ranked WHERE rank <= 10
    """,
)
def maxsim_late_interaction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval: each embedding is treated
    as 4 contiguous 16-dim token vectors (the multi-vector layout a
    late-interaction index stores); score(q, d) = Σ_{{query token}}
    max_{{doc token}} dot — MaxSim, which preserves per-token matching
    that single-vector cosine collapses. Top-10 per probe with
    deterministic tie-break. Dots are the repo's exact left-to-right
    double fold, so both engines rank identical IEEE values; the max/sum
    aggregation tree is order-free (max) + per-group pairwise-identical
    (sum over exactly 4 ordered token maxima — grouped, both engines sum
    4 values; ties in ordering cannot arise because the sum is over a
    4-row group keyed by q_tok... the sum accumulates the SAME 4 doubles
    in any order — addition order over 4 values is pinned by the round(6)
    emission plus the rank tie-break on vec_id).

    Scale shape: probes broadcast (3×4 token rows); the doc side explodes
    4 token rows per vector and aggregates max per (probe, doc, q_tok)
    then sum per (probe, doc) — both map-side partial on the same key
    prefix; TakeOrdered-style window per probe. At 100 TB the MaxSim
    join is the standard ColBERT scatter: bounded per-doc fan-out,
    no all-pairs token join ever materialized wider than probes×docs×4."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    tokens = emb.select(
        "vec_id",
        F.posexplode(F.array(*[F.lit(i) for i in range(4)])).alias("_p", "tok"),
        F.col("embedding").cast("array<double>").alias("ev"),
    ).select(
        "vec_id",
        "tok",
        F.expr("slice(ev, tok * 16 + 1, 16)").alias("tv"),
    )
    qt = tokens.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"),
        F.col("tok").alias("q_tok"),
        F.col("tv").alias("qv"),
    )
    dt = tokens.filter(F.col("vec_id") >= 3)
    sims = (
        dt.crossJoin(F.broadcast(qt))
        .select(
            "probe_id",
            "vec_id",
            "q_tok",
            V.dot("qv", "tv").alias("d"),
        )
        .groupBy("probe_id", "vec_id", "q_tok")
        .agg(F.max("d").alias("best"))
    )
    scored = sims.groupBy("probe_id", "vec_id").agg(
        F.sum("best").alias("maxsim_raw")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("maxsim_raw"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "probe_id",
            "vec_id",
            F.round("maxsim_raw", 6).alias("maxsim"),
            "rank",
        )
    )


@register(
    "matryoshka_truncation_recall",
    f"""
    WITH dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
    probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv
      FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL
    ),
    pairs AS (
      SELECT d.dim, p.probe_id, e.vec_id,
             (e.embedding::DOUBLE[])[1:d.dim] AS ev,
             p.pv[1:d.dim] AS qv
      FROM embeddings e, probes p, dims d
      WHERE e.vec_id <> p.probe_id AND e.embedding IS NOT NULL
    ),
    ranked AS (
      SELECT dim, probe_id, vec_id,
             row_number() OVER (
               PARTITION BY dim, probe_id
               ORDER BY {_sql_cosine('ev', 'qv')} DESC, vec_id) AS rank
      FROM pairs
    ),
    topk AS (SELECT dim, probe_id, vec_id FROM ranked WHERE rank <= 10),
    full_topk AS (SELECT probe_id, vec_id FROM topk WHERE dim = 64),
    overlap AS (
      -- LEFT join: a probe whose truncated top-10 shares NOTHING with the
      -- full top-10 must still contribute its zero to the average
      SELECT t.dim, t.probe_id, count(f.vec_id) AS n_common
      FROM topk t LEFT JOIN full_topk f
        ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
      GROUP BY t.dim, t.probe_id
    )
    SELECT dim,
           CAST(sum(n_common) AS BIGINT) AS total_common,
           count(*) AS n_probes,
           CAST((10000 * sum(n_common)) // (10 * count(*)) AS BIGINT)
             AS recall_e4
    FROM overlap GROUP BY dim
    """,
)
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-embedding truncation audit (Kusupati et al. 2022): for
    prefix dimensions {8, 16, 32, 64}, the exact recall@10 of
    truncated-vector cosine retrieval against the full-dimension top-10 —
    the table that picks the serving dimension / storage tier for an
    embedding index. Recall counts are exact integers; cosines are the
    shared IEEE fold, ranked with a deterministic tie-break, so the
    recall table is hash-exact across engines (the fixture's embeddings
    are not matryoshka-trained, so low dims show genuine degradation —
    the measurement machinery, not the model, is what's certified).

    Scale shape: probes broadcast; ONE pass computes all four dimension
    legs (the dims explode multiplies the probe side only 4x); per-leg
    per-probe windows run on pre-aggregated score rows. The full-dim leg
    doubles as the baseline — no second scan."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("pv"),
    )
    dims = F.array(*[F.lit(d) for d in (8, 16, 32, 64)])
    pairs = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("ev"))
        .crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "vec_id",
            "probe_id",
            F.explode(dims).alias("dim"),
            "ev",
            "pv",
        )
        .select(
            "dim",
            "probe_id",
            "vec_id",
            F.expr("slice(ev, 1, dim)").alias("evd"),
            F.expr("slice(pv, 1, dim)").alias("qvd"),
        )
    )
    w = Window.partitionBy("dim", "probe_id").orderBy(
        F.desc(V.cosine("evd", "qvd")), F.asc("vec_id")
    )
    topk = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("dim", "probe_id", "vec_id")
    )
    full_topk = topk.filter(F.col("dim") == 64).select(
        F.col("probe_id").alias("f_probe"), F.col("vec_id").alias("f_vec")
    )
    overlap = (
        topk.join(
            full_topk,
            (F.col("probe_id") == F.col("f_probe"))
            & (F.col("vec_id") == F.col("f_vec")),
            "left",
        )
        .groupBy("dim", "probe_id")
        .agg(F.count("f_vec").alias("n_common"))
    )
    return overlap.groupBy("dim").agg(
        F.sum("n_common").cast("bigint").alias("total_common"),
        F.count(F.lit(1)).alias("n_probes"),
        F.expr("(10000 * sum(n_common)) div (10 * count(1))")
        .cast("bigint")
        .alias("recall_e4"),
    )


@register(
    "simhash_lcg_candidates",
    r"""
    WITH base AS (
      SELECT doc_id, lower(trim(text)) AS t
      FROM documents
      WHERE trim(coalesce(text, '')) <> '' AND length(trim(text)) >= 4
    ),
    feats AS (
      SELECT DISTINCT doc_id,
             (((CAST(unicode(substr(t, CAST(i.i AS BIGINT), 1)) AS BIGINT) * 31
                + unicode(substr(t, CAST(i.i + 1 AS BIGINT), 1))) * 31
                + unicode(substr(t, CAST(i.i + 2 AS BIGINT), 1))) * 31
                + unicode(substr(t, CAST(i.i + 3 AS BIGINT), 1)))
               % 2147483647 AS h1,
             (((CAST(unicode(substr(t, CAST(i.i AS BIGINT), 1)) AS BIGINT) * 37
                + unicode(substr(t, CAST(i.i + 1 AS BIGINT), 1))) * 37
                + unicode(substr(t, CAST(i.i + 2 AS BIGINT), 1))) * 37
                + unicode(substr(t, CAST(i.i + 3 AS BIGINT), 1)))
               % 2147483629 AS h2
      FROM base, unnest(range(1, length(t) - 2)) AS i(i)
    ),
    votes AS (
      SELECT doc_id,
             sum(CASE WHEN (h1 >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS s0,
             sum(CASE WHEN (h1 >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS s1,
             sum(CASE WHEN (h1 >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS s2,
             sum(CASE WHEN (h1 >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS s3,
             sum(CASE WHEN (h1 >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS s4,
             sum(CASE WHEN (h1 >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS s5,
             sum(CASE WHEN (h1 >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS s6,
             sum(CASE WHEN (h1 >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS s7,
             sum(CASE WHEN (h1 >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS s8,
             sum(CASE WHEN (h1 >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS s9,
             sum(CASE WHEN (h1 >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS s10,
             sum(CASE WHEN (h1 >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS s11,
             sum(CASE WHEN (h1 >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS s12,
             sum(CASE WHEN (h1 >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS s13,
             sum(CASE WHEN (h1 >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS s14,
             sum(CASE WHEN (h1 >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS s15,
             sum(CASE WHEN (h1 >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS s16,
             sum(CASE WHEN (h1 >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS s17,
             sum(CASE WHEN (h1 >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS s18,
             sum(CASE WHEN (h1 >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS s19,
             sum(CASE WHEN (h1 >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS s20,
             sum(CASE WHEN (h1 >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS s21,
             sum(CASE WHEN (h1 >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS s22,
             sum(CASE WHEN (h1 >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS s23,
             sum(CASE WHEN (h1 >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS s24,
             sum(CASE WHEN (h1 >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS s25,
             sum(CASE WHEN (h1 >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS s26,
             sum(CASE WHEN (h1 >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS s27,
             sum(CASE WHEN (h1 >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS s28,
             sum(CASE WHEN (h1 >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS s29,
             sum(CASE WHEN (h2 >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS s30,
             sum(CASE WHEN (h2 >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS s31,
             sum(CASE WHEN (h2 >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS s32,
             sum(CASE WHEN (h2 >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS s33,
             sum(CASE WHEN (h2 >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS s34,
             sum(CASE WHEN (h2 >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS s35,
             sum(CASE WHEN (h2 >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS s36,
             sum(CASE WHEN (h2 >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS s37,
             sum(CASE WHEN (h2 >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS s38,
             sum(CASE WHEN (h2 >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS s39,
             sum(CASE WHEN (h2 >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS s40,
             sum(CASE WHEN (h2 >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS s41,
             sum(CASE WHEN (h2 >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS s42,
             sum(CASE WHEN (h2 >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS s43,
             sum(CASE WHEN (h2 >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS s44,
             sum(CASE WHEN (h2 >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS s45,
             sum(CASE WHEN (h2 >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS s46,
             sum(CASE WHEN (h2 >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS s47,
             sum(CASE WHEN (h2 >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS s48,
             sum(CASE WHEN (h2 >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS s49,
             sum(CASE WHEN (h2 >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS s50,
             sum(CASE WHEN (h2 >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS s51,
             sum(CASE WHEN (h2 >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS s52,
             sum(CASE WHEN (h2 >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS s53,
             sum(CASE WHEN (h2 >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS s54,
             sum(CASE WHEN (h2 >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS s55,
             sum(CASE WHEN (h2 >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS s56,
             sum(CASE WHEN (h2 >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS s57,
             sum(CASE WHEN (h2 >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS s58,
             sum(CASE WHEN (h2 >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS s59
      FROM feats GROUP BY doc_id
    ),
    fps AS (
      SELECT doc_id,
             CASE WHEN s0 > 0 THEN CAST(1 AS BIGINT) ELSE 0 END + CASE WHEN s1 > 0 THEN CAST(2 AS BIGINT) ELSE 0 END + CASE WHEN s2 > 0 THEN CAST(4 AS BIGINT) ELSE 0 END + CASE WHEN s3 > 0 THEN CAST(8 AS BIGINT) ELSE 0 END + CASE WHEN s4 > 0 THEN CAST(16 AS BIGINT) ELSE 0 END + CASE WHEN s5 > 0 THEN CAST(32 AS BIGINT) ELSE 0 END + CASE WHEN s6 > 0 THEN CAST(64 AS BIGINT) ELSE 0 END + CASE WHEN s7 > 0 THEN CAST(128 AS BIGINT) ELSE 0 END + CASE WHEN s8 > 0 THEN CAST(256 AS BIGINT) ELSE 0 END + CASE WHEN s9 > 0 THEN CAST(512 AS BIGINT) ELSE 0 END + CASE WHEN s10 > 0 THEN CAST(1024 AS BIGINT) ELSE 0 END + CASE WHEN s11 > 0 THEN CAST(2048 AS BIGINT) ELSE 0 END + CASE WHEN s12 > 0 THEN CAST(4096 AS BIGINT) ELSE 0 END + CASE WHEN s13 > 0 THEN CAST(8192 AS BIGINT) ELSE 0 END + CASE WHEN s14 > 0 THEN CAST(16384 AS BIGINT) ELSE 0 END + CASE WHEN s15 > 0 THEN CAST(32768 AS BIGINT) ELSE 0 END + CASE WHEN s16 > 0 THEN CAST(65536 AS BIGINT) ELSE 0 END + CASE WHEN s17 > 0 THEN CAST(131072 AS BIGINT) ELSE 0 END + CASE WHEN s18 > 0 THEN CAST(262144 AS BIGINT) ELSE 0 END + CASE WHEN s19 > 0 THEN CAST(524288 AS BIGINT) ELSE 0 END + CASE WHEN s20 > 0 THEN CAST(1048576 AS BIGINT) ELSE 0 END + CASE WHEN s21 > 0 THEN CAST(2097152 AS BIGINT) ELSE 0 END + CASE WHEN s22 > 0 THEN CAST(4194304 AS BIGINT) ELSE 0 END + CASE WHEN s23 > 0 THEN CAST(8388608 AS BIGINT) ELSE 0 END + CASE WHEN s24 > 0 THEN CAST(16777216 AS BIGINT) ELSE 0 END + CASE WHEN s25 > 0 THEN CAST(33554432 AS BIGINT) ELSE 0 END + CASE WHEN s26 > 0 THEN CAST(67108864 AS BIGINT) ELSE 0 END + CASE WHEN s27 > 0 THEN CAST(134217728 AS BIGINT) ELSE 0 END + CASE WHEN s28 > 0 THEN CAST(268435456 AS BIGINT) ELSE 0 END + CASE WHEN s29 > 0 THEN CAST(536870912 AS BIGINT) ELSE 0 END AS lo,
             CASE WHEN s30 > 0 THEN CAST(1 AS BIGINT) ELSE 0 END + CASE WHEN s31 > 0 THEN CAST(2 AS BIGINT) ELSE 0 END + CASE WHEN s32 > 0 THEN CAST(4 AS BIGINT) ELSE 0 END + CASE WHEN s33 > 0 THEN CAST(8 AS BIGINT) ELSE 0 END + CASE WHEN s34 > 0 THEN CAST(16 AS BIGINT) ELSE 0 END + CASE WHEN s35 > 0 THEN CAST(32 AS BIGINT) ELSE 0 END + CASE WHEN s36 > 0 THEN CAST(64 AS BIGINT) ELSE 0 END + CASE WHEN s37 > 0 THEN CAST(128 AS BIGINT) ELSE 0 END + CASE WHEN s38 > 0 THEN CAST(256 AS BIGINT) ELSE 0 END + CASE WHEN s39 > 0 THEN CAST(512 AS BIGINT) ELSE 0 END + CASE WHEN s40 > 0 THEN CAST(1024 AS BIGINT) ELSE 0 END + CASE WHEN s41 > 0 THEN CAST(2048 AS BIGINT) ELSE 0 END + CASE WHEN s42 > 0 THEN CAST(4096 AS BIGINT) ELSE 0 END + CASE WHEN s43 > 0 THEN CAST(8192 AS BIGINT) ELSE 0 END + CASE WHEN s44 > 0 THEN CAST(16384 AS BIGINT) ELSE 0 END + CASE WHEN s45 > 0 THEN CAST(32768 AS BIGINT) ELSE 0 END + CASE WHEN s46 > 0 THEN CAST(65536 AS BIGINT) ELSE 0 END + CASE WHEN s47 > 0 THEN CAST(131072 AS BIGINT) ELSE 0 END + CASE WHEN s48 > 0 THEN CAST(262144 AS BIGINT) ELSE 0 END + CASE WHEN s49 > 0 THEN CAST(524288 AS BIGINT) ELSE 0 END + CASE WHEN s50 > 0 THEN CAST(1048576 AS BIGINT) ELSE 0 END + CASE WHEN s51 > 0 THEN CAST(2097152 AS BIGINT) ELSE 0 END + CASE WHEN s52 > 0 THEN CAST(4194304 AS BIGINT) ELSE 0 END + CASE WHEN s53 > 0 THEN CAST(8388608 AS BIGINT) ELSE 0 END + CASE WHEN s54 > 0 THEN CAST(16777216 AS BIGINT) ELSE 0 END + CASE WHEN s55 > 0 THEN CAST(33554432 AS BIGINT) ELSE 0 END + CASE WHEN s56 > 0 THEN CAST(67108864 AS BIGINT) ELSE 0 END + CASE WHEN s57 > 0 THEN CAST(134217728 AS BIGINT) ELSE 0 END + CASE WHEN s58 > 0 THEN CAST(268435456 AS BIGINT) ELSE 0 END + CASE WHEN s59 > 0 THEN CAST(536870912 AS BIGINT) ELSE 0 END AS hi
      FROM votes
    ),
    bands AS (
      SELECT doc_id, lo, hi, band.band AS band,
             CASE band.band
               WHEN 0 THEN lo & 32767
               WHEN 1 THEN (lo >> 15) & 32767
               WHEN 2 THEN hi & 32767
               ELSE (hi >> 15) & 32767 END AS band_key
      FROM fps, unnest(range(0, 4)) AS band(band)
    ),
    ok_buckets AS (
      SELECT band, band_key FROM bands
      GROUP BY band, band_key HAVING count(*) <= 50
    ),
    kept AS (
      SELECT b.doc_id, b.lo, b.hi, b.band, b.band_key
      FROM bands b JOIN ok_buckets o
        ON o.band = b.band AND o.band_key = b.band_key
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b,
             count(*) AS n_shared_bands
      FROM kept a JOIN kept b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id, a.lo, a.hi, b.lo, b.hi
    )
    SELECT id_a, id_b, n_shared_bands,
           CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
                AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b)) <= 3
    """,
)
def simhash_lcg_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates with FULLY ORACLE-BACKED hash
    arithmetic — the simhash twin of minhash_lcg_lsh_pairs. Features are
    distinct character 4-grams identified BY THEIR HASH PAIR (two
    fixed-degree polynomials over the 4 codepoints, mod two distinct
    31-bit primes) — no gram strings, no arrays, no higher-order
    functions: the whole feature+vote pipeline is whole-stage codegen
    (the first HOF formulation measured 20+ s at sf0.1; this one ~2 s).
    The 60 bit votes are 60 conditional sums in one per-doc aggregate,
    packed into two 30-bit integers; banding keys are bit slices,
    buckets holding > 50 fingerprints are skipped (the standard
    boilerplate-bucket guard — correlated fingerprints otherwise
    degenerate a 15-bit band toward all-pairs), and Hamming distance is
    two XOR popcounts. Emission keeps Hamming <= 3, where the 4x15
    pigeonhole guarantees banding recall within non-skipped buckets.

    Scale shape: one scan → position explode (len-3 rows, all codegen) →
    distinct on (doc, h1, h2) → 60-sum aggregate → integer-key banding
    with the bucket cap → popcount verify on bounded candidates. The
    xxhash64 path (simhash_candidates, rows-only) stays the production
    form; this is its certification regime. Docs shorter than 4 chars
    carry no 4-gram and are excluded by definition."""
    P1, P2 = 2147483647, 2147483629
    base = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
            & (F.length(F.trim("text")) >= 4)
        )
        .select("doc_id", F.lower(F.trim("text")).alias("tx"))
    )
    # Optimization r12 (guide §4.2 / §2.4): fingerprints now come from ONE
    # Arrow kernel pass — the per-position polynomial hashes are windowed
    # int64 dot products (no intermediate mod in the original either, so
    # the arithmetic is identical), per-doc distinct features a local
    # np.unique, and the 60 bit votes vectorized popcounts. This deletes
    # the len-3 position explode, the corpus-wide (doc,h1,h2) DISTINCT
    # exchange and the 60-column aggregate exchange — the two
    # full-corpus shuffles of the old plan; only (doc_id, lo, hi) rows
    # ever shuffle now.
    def fingerprint(batches):  # noqa: ANN001
        import numpy as np
        import pandas as pd

        pw31 = (31 ** np.arange(3, -1, -1, dtype=np.int64)).astype(np.int64)
        pw37 = (37 ** np.arange(3, -1, -1, dtype=np.int64)).astype(np.int64)
        bits = np.arange(30, dtype=np.int64)
        for pdf in batches:
            ids, los, his = [], [], []
            for doc_id, tx in zip(pdf["doc_id"], pdf["tx"]):
                cp = np.frombuffer(
                    tx.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                wins = np.lib.stride_tricks.sliding_window_view(cp, 4)
                h1 = (wins @ pw31) % P1
                h2 = (wins @ pw37) % P2
                feats = np.unique(h1 * P2 + h2)
                f1 = feats // P2
                f2 = feats % P2
                n = feats.shape[0]
                # vote s_b = (# ones) - (# zeros) > 0  <=>  2*ones > n
                ones1 = ((f1[:, None] >> bits[None, :]) & 1).sum(axis=0)
                ones2 = ((f2[:, None] >> bits[None, :]) & 1).sum(axis=0)
                lo = int(((2 * ones1 > n).astype(np.int64) << bits).sum())
                hi = int(((2 * ones2 > n).astype(np.int64) << bits).sum())
                ids.append(doc_id)
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "lo": pd.Series(los, dtype="int64"),
                    "hi": pd.Series(his, dtype="int64"),
                }
            )

    fps = base.mapInPandas(fingerprint, "doc_id long, lo long, hi long")
    # Optimization r12 (guide §2.4/§4): the banded self-join references the
    # fingerprint table through four lineages (bucket count + join probe,
    # then both join sides) — each re-ran the Arrow fingerprint kernel
    # (four MapInPandas nodes in the plan). Pinned, the kernel runs once;
    # the cached rows are 24 bytes per doc.
    fps = _pin(fps)
    band_key = (
        F.when(F.col("band") == 0, F.expr("lo & 32767"))
        .when(F.col("band") == 1, F.expr("(lo >> 15) & 32767"))
        .when(F.col("band") == 2, F.expr("hi & 32767"))
        .otherwise(F.expr("(hi >> 15) & 32767"))
    )
    bands = fps.select(
        "doc_id",
        "lo",
        "hi",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("band_key", band_key)
    ok = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= 50)
        .drop("_n")
    )
    kept = bands.join(ok, ["band", "band_key"])
    a = kept.select(
        F.col("doc_id").alias("id_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
        F.col("band").alias("band_a"),
        F.col("band_key").alias("k_a"),
    )
    b2 = kept.select(
        F.col("doc_id").alias("id_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
        F.col("band").alias("band_b"),
        F.col("band_key").alias("k_b"),
    )
    cand = (
        a.join(
            b2,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("k_a") == F.col("k_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b", "lo_a", "hi_a", "lo_b", "hi_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    ham = F.bit_count(F.expr("lo_a ^ lo_b")) + F.bit_count(F.expr("hi_a ^ hi_b"))
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .filter(F.col("hamming") <= 3)
        .select("id_a", "id_b", "n_shared_bands", "hamming")
    )


@register(
    "oph_lcg_lsh_pairs",
    f"""
    WITH norm AS (
      SELECT doc_id AS id, regexp_split_to_array({_SQL_NORM}, ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT id, unnest({_sql_shingles(3)}) AS shingle FROM norm
    ),
    hashed AS (
      SELECT id,
             CASE WHEN shingle = '' THEN 0
                  ELSE list_reduce(
                         list_transform(regexp_split_to_array(shingle, ''),
                                        c -> CAST(unicode(c) AS BIGINT)),
                         (a, b) -> (a * 31 + b) % 2147483647)
             END AS h
      FROM sh
    ),
    mins AS (
      SELECT id, h % 16 AS bin, min(h) AS mh FROM hashed GROUP BY id, h % 16
    ),
    all_bins AS (
      SELECT d.id, b.b AS bin
      FROM (SELECT DISTINCT id FROM mins) d, unnest(range(0, 16)) AS b(b)
    ),
    slots AS (
      SELECT a.id, a.bin, m.mh
      FROM all_bins a LEFT JOIN mins m ON m.id = a.id AND m.bin = a.bin
    ),
    borrowed AS (
      SELECT e.id, e.bin,
             min((((f.bin - e.bin) % 16 + 16) % 16, f.mh)) AS pick
      FROM slots e JOIN mins f ON f.id = e.id
      WHERE e.mh IS NULL
      GROUP BY e.id, e.bin
    ),
    sig AS (
      SELECT id, bin, mh FROM slots WHERE mh IS NOT NULL
      UNION ALL
      SELECT id, bin,
             (pick[2] + pick[1] * (2654435761 % 2147483647)) % 2147483647
      FROM borrowed
    ),
    bands AS (
      SELECT id, bin // 4 AS band,
             string_agg(mh, ':' ORDER BY bin) AS band_key
      FROM sig GROUP BY id, bin // 4
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    matches AS (
      SELECT c.id_a, c.id_b, c.n_shared_bands,
             CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS n_match
      FROM cand c
      JOIN sig sa ON sa.id = c.id_a
      JOIN sig sb ON sb.id = c.id_b AND sb.bin = sa.bin
      GROUP BY c.id_a, c.id_b, c.n_shared_bands
    )
    SELECT id_a, id_b, n_shared_bands,
           CAST((10000 * n_match) // 16 AS BIGINT) AS est_jaccard_e4
    FROM matches
    """,
)
def oph_lcg_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation MinHash + rotation densification with FULLY
    ORACLE-BACKED arithmetic — the OPH twin of minhash_lcg_lsh_pairs and
    the certification regime for the trickiest rows-only machinery in
    the dedup family (operators/dedup.oph_signatures): every shingle
    hashes ONCE through the portable polynomial fold, scatters into 16
    bins (min per bin), and empty bins borrow from the nearest non-empty
    bin to the RIGHT (circular), offset by borrow-distance x the
    Knuth constant — exactly the densification rule of the production
    xxhash64 path, here expressed relationally (empty x filled per-doc
    join, <= 16x16 rows, argmin by circular distance via lexicographic
    pair-min) so DuckDB rebuilds the identical signatures hash-for-hash.
    4 bands x 4 rows; pairs carry shared-band counts and the
    signature-agreement estimate.

    Scale shape: one hash per shingle (the OPH selling point), bin
    minima partial-aggregate on (id, bin), densification joins are
    bounded 16x16 per doc, banding is the standard equi-join. The
    xxhash64 OPH path stays the production form; recall vs exact is
    pinned in pytest there, signature arithmetic is hash-gated here."""
    P = 2147483647
    C = 2654435761 % P
    docs = t(spark, sf_dir, "documents")
    sh = (
        docs.select(
            F.col("doc_id").alias("id"), X.shingles("text", 3).alias("shingles")
        )
        .select("id", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    hashed = sh.select(
        "id",
        F.aggregate(
            F.split("shingle", ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(P).cast("long"),
        ).alias("h"),
    )
    # mins feeds THREE consumers (slots, the borrow join, and the
    # all-bins id domain) — pin it or the whole shingle+fold pipeline
    # re-evaluates per consumer (measured 3x ≈ 9.6 s warm at sf0.1;
    # pinned ~3 s). Released via session.release_pinned().
    mins = _pin(
        hashed.groupBy("id", (F.col("h") % 16).alias("bin")).agg(
            F.min("h").alias("mh")
        )
    )
    all_bins = (
        mins.select("id")
        .distinct()
        .select("id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bin"))
    )
    slots = all_bins.join(mins, ["id", "bin"], "left")
    empty = slots.filter(F.col("mh").isNull()).select("id", "bin")
    filled = mins.select(
        F.col("id").alias("f_id"), F.col("bin").alias("f_bin"), F.col("mh").alias("f_mh")
    )
    borrowed = (
        empty.join(filled, F.col("id") == F.col("f_id"))
        .select(
            "id",
            "bin",
            F.struct(
                F.pmod(F.col("f_bin") - F.col("bin"), F.lit(16)).alias("d"),
                F.col("f_mh").alias("v"),
            ).alias("pick"),
        )
        .groupBy("id", "bin")
        .agg(F.min("pick").alias("pick"))
        .select(
            "id",
            "bin",
            ((F.col("pick.v") + F.col("pick.d") * F.lit(C)) % P).alias("mh"),
        )
    )
    sig = slots.filter(F.col("mh").isNotNull()).select("id", "bin", "mh").unionByName(
        borrowed
    )
    sig = _pin(sig)
    band_key = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("bin").alias("b"), F.col("mh").alias("m"))
                )
            ),
            lambda x: x["m"].cast("string"),
        ),
        ":",
    )
    bands = sig.groupBy("id", F.expr("bin div 4").alias("band")).agg(
        band_key.alias("band_key")
    )
    a = bands.select(
        F.col("id").alias("id_a"),
        F.col("band").alias("band_a"),
        F.col("band_key").alias("k_a"),
    )
    b = bands.select(
        F.col("id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("band_key").alias("k_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("k_a") == F.col("k_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    sa = sig.select(
        F.col("id").alias("id_a"), F.col("bin").alias("bin"), F.col("mh").alias("ma")
    )
    sb = sig.select(
        F.col("id").alias("sb_id"), F.col("bin").alias("binb"), F.col("mh").alias("mb")
    )
    matches = (
        cand.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("sb_id")) & (F.col("bin") == F.col("binb")))
        .groupBy("id_a", "id_b", "n_shared_bands")
        .agg(
            F.sum((F.col("ma") == F.col("mb")).cast("int"))
            .cast("bigint")
            .alias("n_match")
        )
    )
    return matches.select(
        "id_a",
        "id_b",
        "n_shared_bands",
        F.expr("(10000 * n_match) div 16").cast("bigint").alias("est_jaccard_e4"),
    )


@register(
    "kmeans_assign_fixed_centroids",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 61 = 0 AND embedding IS NOT NULL
    ),
    pts AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    dists AS (
      SELECT p.vec_id, c.cid,
             list_reduce(list_transform(generate_series(1, len(p.ev)),
                           i -> (p.ev[i] - c.cv[i]) * (p.ev[i] - c.cv[i])),
                         (x, y) -> x + y) AS d2
      FROM pts p, cents c
    ),
    assigned AS (
      SELECT vec_id, cid, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM dists
    )
    SELECT cid AS cluster_id,
           count(*) AS n_members,
           CAST(sum(CAST(floor(1000000 * d2) AS BIGINT)) AS BIGINT)
             AS inertia_e6
    FROM assigned WHERE rn = 1 GROUP BY cid
    """,
)
def kmeans_assign_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means ASSIGNMENT step under an exact oracle — the certification
    regime for the distance/argmin machinery the rows-only clustering
    path (text_cluster_sizes, trained via sampled numpy k-means) runs
    every iteration: centroids are FIXED arithmetically (every 61st
    vector), each embedding assigns to the nearest centroid by exact
    IEEE squared distance (identical left-to-right fold both engines,
    tie-break on centroid id), and per-cluster inertia is the exact
    integer sum of per-row floor(1e6*d2) — quantized per row BEFORE the
    aggregate, so summation order cannot diverge engines. A wrong
    distance kernel, a wrong argmin tie, or a dropped member changes the
    hash.

    Scale shape: centroids broadcast (k rows); one scan computes all k
    distances per vector and the argmin via a per-vector window over k
    rows; one k-row aggregate. This IS Lloyd's assignment data layout at
    any scale — the trainer's update step is the same aggregate keyed by
    cluster."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    cents = emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    d2 = F.aggregate(
        F.zip_with("ev", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    assigned = dists.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return assigned.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.floor(1000000 * F.col("d2")).cast("bigint"))
        .cast("bigint")
        .alias("inertia_e6"),
    )


@register(
    "semdedup_prune",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id % 61 = 0 AND embedding IS NOT NULL
    ),
    pts AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    dists AS (
      SELECT p.vec_id, c.cid,
             list_reduce(list_transform(generate_series(1, len(p.ev)),
                           i -> (p.ev[i] - c.cv[i]) * (p.ev[i] - c.cv[i])),
                         (x, y) -> x + y) AS d2
      FROM pts p, cents c
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    av AS (SELECT a.vec_id, a.cid, p.ev FROM assigned a JOIN pts p USING (vec_id)),
    pruned AS (
      SELECT DISTINCT b.vec_id
      FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE CAST(floor(1000000 * {_sql_cosine('a.ev', 'b.ev')}) AS BIGINT)
            >= 250000
    )
    SELECT av.cid AS cluster_id,
           count(*) AS n_members,
           CAST(sum(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned,
           CAST(sum(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM av LEFT JOIN pruned p USING (vec_id)
    GROUP BY av.cid
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    bounds the quadratic pair space by clustering FIRST and comparing only
    WITHIN clusters — the method's entire scale story. Vectors assign to
    fixed centroids (every 61st vector — the certified kmeans_assign
    recipe), then a vector is pruned iff a lower-id vector in the SAME
    cluster has cosine ≥ τ (first-wins, the house dedup tie-break; the
    paper keeps one representative per ε-similar group). τ = 0.25 is
    fixture-scaled: the synthetic embeddings are near-orthogonal (max
    pairwise cos ≈ 0.51, p99 ≈ 0.29), where the paper's 0.95+ applies to
    real encoder geometry. Per-row e6 floor-quantization of the cosine
    BEFORE the threshold keeps both engines' comparisons identical
    (left-to-right IEEE folds, see _sql_cosine).

    Scale shape: centroids broadcast; assignment is one scan + a
    per-vector argmin window; the pair join shuffles on cluster_id only —
    O(sum of cluster sizes squared), never corpus-squared, exactly the
    SemDeDup bound. Output is one row per cluster, so the gate certifies
    assignment, cluster-local pairing, thresholding, and the prune
    semantics in one hash."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    cents = emb.filter(F.col("vec_id") % 61 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    pts = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    d2 = F.aggregate(
        F.zip_with("ev", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    # Pinned: the assignment feeds three consumers (both pair sides and
    # the reconcile scan) — without the pin each re-runs the broadcast
    # distance pass. Callers release via session.release_pinned().
    assigned = _pin(
        pts.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", "ev", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "ev")
    )
    a = assigned.select(
        F.col("cid").alias("cid_a"),
        F.col("vec_id").alias("id_a"),
        F.col("ev").alias("ev_a"),
    )
    b = assigned.select(
        F.col("cid").alias("cid_b"),
        F.col("vec_id").alias("id_b"),
        F.col("ev").alias("ev_b"),
    )
    cos_e6 = F.floor(1000000 * V.cosine("ev_a", "ev_b")).cast("bigint")
    pruned = (
        a.join(
            b,
            (F.col("cid_a") == F.col("cid_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .filter(cos_e6 >= 250000)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_pruned", F.lit(1))
    )
    return (
        assigned.join(pruned, "vec_id", "left")
        .groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("_pruned"), F.lit(0)))
            .cast("bigint")
            .alias("n_pruned"),
            F.sum(
                F.when(F.col("_pruned").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@register(
    "embedding_dim_profile",
    """
    WITH pts AS (
      SELECT embedding::DOUBLE[] AS ev FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    cells AS (
      SELECT g.i - 1 AS dim,
             CAST(floor(1000000 * ev[g.i]) AS BIGINT) AS q1,
             CAST(floor(1000000000000 * ev[g.i] * ev[g.i]) AS BIGINT) AS q2
      FROM pts, unnest(generate_series(1, len(ev))) AS g(i)
    )
    SELECT dim,
           count(*) AS n_vecs,
           CAST(sum(q1) AS BIGINT) AS s1_e6,
           CAST(sum(q2) // count(*) AS BIGINT) AS ex2_e12,
           CAST(sum(q2) // count(*)
                - (sum(q1) // count(*)) * (sum(q1) // count(*))
                AS BIGINT) AS var_e12
    FROM cells GROUP BY dim
    """,
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension first/second moments of the embedding matrix — the
    one-pass profile behind whitening, dead-dimension detection, and
    quantizer calibration. Every cell is floor-quantized PER ROW (e6 for
    x, e12 for x²) before the integer sums, so the distributed aggregate
    is order-free and the hash certifies it exactly (the kmeans_assign
    discipline: quantization defines the metric, the gate proves the
    distributed arithmetic). var_e12 is the standard E[x²]−E[x]² on the
    quantized integers. Sum widths: Spark sums int64 into DECIMAL(38,0)
    internally; at 1e12 rows q2-sums reach ~1.6e22 — past int64, inside
    decimal38/HUGEINT on both engines.

    Scale shape: one posexplode (narrow, no shuffle) + one aggregate
    keyed by dimension — d keys, fully map-side-combinable; output is d
    rows regardless of corpus size."""
    pts = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(F.col("embedding").cast("array<double>").alias("ev"))
    )
    cells = pts.select(
        F.posexplode("ev").alias("dim", "x")
    ).select(
        "dim",
        F.floor(1000000 * F.col("x")).cast("bigint").alias("q1"),
        F.floor(1000000000000 * F.col("x") * F.col("x"))
        .cast("bigint")
        .alias("q2"),
    )
    return cells.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("q1").cast("bigint").alias("s1_e6"),
        F.expr("sum(q2) div count(*)").cast("bigint").alias("ex2_e12"),
        F.expr(
            "sum(q2) div count(*)"
            " - (sum(q1) div count(*)) * (sum(q1) div count(*))"
        )
        .cast("bigint")
        .alias("var_e12"),
    )


@register(
    "embedding_anisotropy",
    """
    WITH pts AS (
      SELECT embedding::DOUBLE[] AS ev FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    dims AS (
      SELECT g.i AS dim,
             CAST(sum(CAST(floor(1000000 * ev[g.i]) AS BIGINT)) AS HUGEINT)
               AS s1
      FROM pts, unnest(generate_series(1, len(ev))) AS g(i)
      GROUP BY g.i
    ),
    rows_q AS (
      SELECT CAST(floor(1000000000000 *
               list_reduce(list_transform(ev, x -> x * x), (x, y) -> x + y))
             AS BIGINT) AS dotq
      FROM pts
    ),
    mu AS (SELECT count(*) AS n_dims, sum(s1 * s1) AS mu_num FROM dims),
    xx AS (SELECT count(*) AS n_vecs, CAST(sum(dotq) AS HUGEINT) AS sx FROM rows_q)
    SELECT n_vecs,
           n_dims,
           CAST(sx // n_vecs AS BIGINT) AS mean_sq_norm_e12,
           CAST(mu_num // (CAST(n_vecs AS HUGEINT) * n_vecs) AS BIGINT)
             AS mu_norm_sq_e12,
           CAST((CAST(1000000 AS HUGEINT) * mu_num)
                // (CAST(n_vecs AS HUGEINT) * sx) AS BIGINT) AS anisotropy_e6
    FROM mu, xx
    """,
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding space (Ethayarajh 2019; Mu & Viswanath
    2018's common-mean diagnostic): the squared norm of the mean vector
    over the mean squared norm — ≈0 for a centered isotropic cloud, →1
    when all vectors share a dominant direction (the degenerate geometry
    that breaks cosine retrieval and motivates mean-subtraction).
    Computed entirely in quantized integers: per-dim e6 row floors sum to
    the mean numerator; per-row e12 self-dot floors (identical IEEE fold
    both engines) sum to the energy. anisotropy_e6 = (1e6·Σs1²) div
    (n·Σdotq) — exact wide-integer arithmetic (Σs1² can reach ~1e36 at
    1e12 rows: inside decimal38/HUGEINT, past int64; documented bound).

    Scale shape: two one-pass aggregates (d-key dim sums, 1-row energy
    sum) + a 1×1 broadcast combine. Nothing shuffles more than d rows."""
    pts = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(F.col("embedding").cast("array<double>").alias("ev"))
    )
    dims = (
        pts.select(F.posexplode("ev").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.sum(F.floor(1000000 * F.col("x")).cast("bigint"))
            .cast("decimal(38,0)")
            .alias("s1")
        )
    )
    self_dot = F.aggregate(
        F.transform("ev", lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows_q = pts.select(
        F.floor(1000000000000 * self_dot).cast("bigint").alias("dotq")
    )
    mu = dims.agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum(F.col("s1") * F.col("s1")).alias("mu_num"),
    )
    xx = rows_q.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("dotq").cast("decimal(38,0)").alias("sx"),
    )
    return mu.crossJoin(xx).select(
        "n_vecs",
        "n_dims",
        F.expr("sx div n_vecs").cast("bigint").alias("mean_sq_norm_e12"),
        F.expr("mu_num div (CAST(n_vecs AS DECIMAL(38,0)) * n_vecs)")
        .cast("bigint")
        .alias("mu_norm_sq_e12"),
        F.expr(
            "(CAST(1000000 AS DECIMAL(38,0)) * mu_num)"
            " div (CAST(n_vecs AS DECIMAL(38,0)) * sx)"
        )
        .cast("bigint")
        .alias("anisotropy_e6"),
    )


@register(
    "conformal_threshold",
    f"""
    WITH q AS (
      SELECT event_type, event_id,
             CAST(floor("value" * 100) AS BIGINT) AS score,
             CASE WHEN {SP.lcg_bucket_sql('event_id')} < 50 THEN 1 ELSE 0 END
               AS is_cal
      FROM events WHERE "value" IS NOT NULL
    ),
    cal AS (
      SELECT event_type, score,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY score, event_id) AS rnk,
             count(*) OVER (PARTITION BY event_type) AS n_cal
      FROM q WHERE is_cal = 1
    ),
    thr AS (
      SELECT event_type, n_cal,
             least((9 * n_cal + 18) // 10, n_cal) AS k,
             score AS threshold
      FROM cal WHERE rnk = least((9 * n_cal + 18) // 10, n_cal)
    ),
    ev AS (SELECT event_type, score FROM q WHERE is_cal = 0)
    SELECT t.event_type,
           CAST(t.n_cal AS BIGINT) AS n_cal,
           CAST(t.k AS BIGINT) AS k,
           t.threshold,
           count(*) AS n_eval,
           CAST((10000 * sum(CASE WHEN ev.score <= t.threshold THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS coverage_e4
    FROM thr t JOIN ev USING (event_type)
    GROUP BY t.event_type, t.n_cal, t.k, t.threshold
    """,
)
def conformal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction calibration (Vovk et al.; Angelopoulos &
    Bates 2021 §2): per group, the ⌈(n+1)(1−α)⌉-th smallest calibration
    nonconformity score becomes the prediction threshold, guaranteeing
    ≥ 1−α marginal coverage on exchangeable eval points. α = 0.1; the
    calibration/eval split is the deterministic LCG 50/50; scores
    quantize to integer hundredths so the order statistic is exact on
    both engines (ties broken by event_id). The output re-measures
    EMPIRICAL eval coverage per group against the chosen threshold — the
    gate certifies the order-statistic pick AND the coverage accounting
    (expected ≈ 9000 e4, the conformal guarantee made visible).

    Scale shape: the rank window is PARTITIONED by group (parallel); the
    threshold table is one row per group and broadcasts into the eval
    scan; no global sorts. At 100 TB the exact per-group order statistic
    is the only sort-bound step and shards by group."""
    q = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("score"),
            (SP.lcg_bucket("event_id") < 50).alias("is_cal"),
        )
    )
    wq = Window.partitionBy("event_type")
    cal = (
        q.filter("is_cal")
        .withColumn(
            "rnk",
            F.row_number().over(wq.orderBy("score", "event_id")),
        )
        .withColumn("n_cal", F.count(F.lit(1)).over(wq))
    )
    k = F.least(F.expr("(9 * n_cal + 18) div 10"), F.col("n_cal"))
    thr = cal.filter(F.col("rnk") == k).select(
        "event_type",
        F.col("n_cal").cast("bigint").alias("n_cal"),
        k.cast("bigint").alias("k"),
        F.col("score").alias("threshold"),
    )
    ev = q.filter(~F.col("is_cal")).select("event_type", "score")
    return (
        ev.join(F.broadcast(thr), "event_type")
        .groupBy("event_type", "n_cal", "k", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.expr(
                "(10000 * sum(CASE WHEN score <= threshold THEN 1 ELSE 0 END))"
                " div count(*)"
            )
            .cast("bigint")
            .alias("coverage_e4"),
        )
    )


@register(
    "ips_policy_value",
    """
    WITH q AS (
      SELECT user_id % 16 AS ctx, event_type AS action,
             CAST(floor("value" * 100) AS BIGINT) AS r
      FROM events WHERE "value" IS NOT NULL
    ),
    counts AS (
      SELECT ctx, action, CAST(count(*) AS BIGINT) AS c_ax
      FROM q GROUP BY ctx, action
    ),
    ctx_tot AS (SELECT ctx, CAST(sum(c_ax) AS BIGINT) AS c_x FROM counts GROUP BY ctx),
    scored AS (
      SELECT q.ctx, q.r, c.c_ax, x.c_x,
             CASE WHEN q.action = (CASE WHEN q.ctx < 8 THEN 'purchase'
                                        ELSE 'click' END)
                  THEN 1 ELSE 0 END AS matched
      FROM q JOIN counts c ON c.ctx = q.ctx AND c.action = q.action
             JOIN ctx_tot x ON x.ctx = q.ctx
    )
    SELECT count(*) AS n_logged,
           CAST(sum(matched) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN matched = 1
                         THEN (1000000 * r * c_x) // c_ax ELSE 0 END)
                // count(*) AS BIGINT) AS ips_value_e6,
           CAST(sum(CASE WHEN matched = 1 THEN (1000000 * c_x) // c_ax
                         ELSE 0 END) // count(*) AS BIGINT) AS mean_weight_e6
    FROM scored
    """,
)
def ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation with inverse propensity scoring (Horvitz &
    Thompson 1952; Dudík et al. 2011) — the RLHF-adjacent counterfactual
    estimate: value of a TARGET policy (purchase for contexts 0-7, click
    for 8-15) from logged behavior data, weighting each matching row by
    1/p̂(a|x) with propensities ESTIMATED from the log itself (empirical
    c_ax/c_x — the standard plug-in). Per-row weights are exact integer
    floors ((1e6·r·c_x) div c_ax) before the mean, so the distributed
    sum is order-free; mean_weight_e6 ≈ 1e6 diagnoses propensity health
    (self-normalization denominator).

    Scale shape: the propensity table is (contexts × actions) rows —
    broadcast; the scan joins it twice by key and aggregates to ONE row.
    No windows, no sorts; overflow bound 1e6·r·c_x < 1e18 holds to
    ~1e9 rows per context (document past that: shard contexts)."""
    q = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            # truncated %, not pmod: matches DuckDB's % for negative ids
            (F.col("user_id") % 16).alias("ctx"),
            F.col("event_type").alias("action"),
            F.floor(F.col("value") * 100).cast("bigint").alias("r"),
        )
    )
    counts = q.groupBy("ctx", "action").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ax")
    )
    ctx_tot = counts.groupBy("ctx").agg(
        F.sum("c_ax").cast("bigint").alias("c_x")
    )
    target = F.when(F.col("ctx") < 8, F.lit("purchase")).otherwise(
        F.lit("click")
    )
    scored = (
        q.join(F.broadcast(counts), ["ctx", "action"])
        .join(F.broadcast(ctx_tot), "ctx")
        .withColumn("matched", (F.col("action") == target).cast("int"))
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_logged"),
        F.sum("matched").cast("bigint").alias("n_matched"),
        F.expr(
            "sum(CASE WHEN matched = 1"
            " THEN (1000000 * r * c_x) div c_ax ELSE 0 END) div count(*)"
        )
        .cast("bigint")
        .alias("ips_value_e6"),
        F.expr(
            "sum(CASE WHEN matched = 1 THEN (1000000 * c_x) div c_ax"
            " ELSE 0 END) div count(*)"
        )
        .cast("bigint")
        .alias("mean_weight_e6"),
    )


@register(
    "moe_router_load_balance",
    r"""
    WITH feats AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS f1,
             CAST(length(text) AS BIGINT) AS f2,
             CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT)
               AS f3,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT)
               AS f4
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    ftot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(f1) AS BIGINT) AS s1, CAST(sum(f2) AS BIGINT) AS s2,
             CAST(sum(f3) AS BIGINT) AS s3, CAST(sum(f4) AS BIGINT) AS s4
      FROM feats
    ),
    scores AS (
      SELECT doc_id, k.k AS expert,
             ((1 - 2 * ((k.k // 1) % 2)) * (f1 * n_docs - s1)
              + (1 - 2 * ((k.k // 2) % 2)) * (f2 * n_docs - s2)
              + (1 - 2 * ((k.k // 4) % 2)) * (f3 * n_docs - s3)
              + (1 - 2 * ((k.k // 8) % 2)) * (f4 * n_docs - s4)) AS s
      FROM feats, ftot, unnest(range(0, 8)) AS k(k)
    ),
    routed AS (
      SELECT doc_id, expert, s FROM (
        SELECT doc_id, expert, s,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY s DESC, expert) AS rn
        FROM scores
      ) WHERE rn = 1
    ),
    loads AS (
      SELECT expert, CAST(count(*) AS BIGINT) AS n_routed,
             CAST(sum(s) AS BIGINT) AS score_mass
      FROM routed GROUP BY expert
    ),
    tot AS (SELECT CAST(sum(n_routed) AS BIGINT) AS n FROM loads)
    SELECT expert, n_routed,
           CAST((1000000 * n_routed) // n AS BIGINT) AS load_e6,
           score_mass,
           CAST((8 * 1000000 * sum(n_routed * n_routed) OVER ())
                // (n * n) AS BIGINT) AS balance_loss_e6
    FROM loads, tot
    """,
)
def moe_router_load_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-Experts router audit (Shazeer et al. 2017 §4; Fedus et
    al. Switch Transformer 2021 eq. 4): documents hard-route to the
    argmax of K = 8 expert scores — integer dots of 4 mean-CENTERED text
    features (scaled by N to stay integral: f_i·N − Σf_i) against the ±1
    sign pattern coded by expert k's bits, so the 8 experts own the 8
    sign orthants of the deviation space: routing is content-dependent,
    non-degenerate, and exactly reproducible on both engines (raw
    all-positive features would make the all-plus expert win every doc —
    centering is what makes the audit mean something). Emits
    per-expert load and the load-balancing loss K·Σf_i² (the f·P aux
    loss with hard routing, where P ≡ f) in e6 — 1e6 means perfectly
    balanced, K×1e6 means collapse onto one expert: THE number an MoE
    data pipeline watches when curating router training batches.

    Scale shape: features are one codegen scan; the K-way fan-out is an
    8-element explode; argmax is a doc-keyed window (parallel); loads
    aggregate to 8 rows, and the balance loss is a window over those 8.
    No joins with data-sized sides, no floats."""
    feats = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select(
            "doc_id",
            F.size(X.tokens("text")).cast("bigint").alias("f1"),
            F.length("text").cast("bigint").alias("f2"),
            F.length(F.regexp_replace("text", "[^aeiou]", ""))
            .cast("bigint")
            .alias("f3"),
            F.length(F.regexp_replace("text", "[^0-9]", ""))
            .cast("bigint")
            .alias("f4"),
        )
    )
    # Optimization r12 (guide §2.4 + §2.3): the feature scan (two regex
    # passes over full text) fed both the totals aggregate and the scoring
    # side — pinned, it runs once. The 8-way expert fan-out was an explode
    # + doc-keyed row_number window (a shuffle and sort of 8 rows per
    # doc); the argmax of 8 integer scores is instead computed map-side as
    # array_max over (s, -expert, expert, s) structs — struct ordering is
    # lexicographic, so max s wins and ties break to the SMALLEST expert,
    # exactly the window's (desc s, asc expert) order. Same integers, same
    # routing, zero per-doc shuffle.
    feats = _pin(feats)
    ftot = feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("f1").cast("bigint").alias("s1"),
        F.sum("f2").cast("bigint").alias("s2"),
        F.sum("f3").cast("bigint").alias("s3"),
        F.sum("f4").cast("bigint").alias("s4"),
    )
    def _score(k: int):
        sgn = lambda div: 1 if (k // div) % 2 == 0 else -1  # noqa: E731
        return (
            F.lit(sgn(1)) * (F.col("f1") * F.col("n_docs") - F.col("s1"))
            + F.lit(sgn(2)) * (F.col("f2") * F.col("n_docs") - F.col("s2"))
            + F.lit(sgn(4)) * (F.col("f3") * F.col("n_docs") - F.col("s3"))
            + F.lit(sgn(8)) * (F.col("f4") * F.col("n_docs") - F.col("s4"))
        )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _score(k).alias("s"),
                    F.lit(-k).alias("negk"),
                    F.lit(k).alias("expert"),
                )
                for k in range(8)
            ]
        )
    )
    routed = feats.crossJoin(F.broadcast(ftot)).select(
        "doc_id",
        best["expert"].alias("expert"),
        best["s"].alias("s"),
    )
    loads = routed.groupBy("expert").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_routed"),
        F.sum("s").cast("bigint").alias("score_mass"),
    )
    tot = loads.agg(F.sum("n_routed").cast("bigint").alias("n"))
    # 8 rows by construction: constant-key window single-task by design.
    one = F.spark_partition_id() * 0 + 1
    return (
        loads.crossJoin(F.broadcast(tot))
        .repartition(1)
        .withColumn(
            "balance_loss_e6",
            (
                F.lit(8000000).cast("decimal(38,0)")
                * F.sum(F.col("n_routed") * F.col("n_routed")).over(
                    Window.partitionBy(one)
                )
            ).cast("decimal(38,0)"),
        )
        .select(
            "expert",
            "n_routed",
            F.expr("(1000000 * n_routed) div n").cast("bigint").alias("load_e6"),
            "score_mass",
            F.expr(
                "CAST((balance_loss_e6 - balance_loss_e6 % (CAST(n AS DECIMAL(38,0)) * n))"
                " / (CAST(n AS DECIMAL(38,0)) * n) AS DECIMAL(38,0))"
            )
            .cast("bigint")
            .alias("balance_loss_e6"),
        )
    )


@register(
    "suffix_longest_repeat",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE length(coalesce(text, '')) > 0
    ),
    suf AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p) AS suf
      FROM d, unnest(range(1, length(text) + 1)) AS p(p)
    ),
    ordered AS (
      SELECT doc_id, pos, suf,
             row_number() OVER (ORDER BY suf, doc_id, pos) AS rn
      FROM suf
    ),
    adj AS (
      SELECT a.doc_id AS doc_a, a.pos AS pos_a, a.suf AS sa, b.suf AS sb
      FROM ordered a JOIN ordered b ON b.rn = a.rn + 1
    ),
    lcps AS (
      SELECT doc_a, pos_a,
             coalesce((SELECT min(i.i)
                       FROM unnest(range(1, least(len(sa), len(sb)) + 1)) AS i(i)
                       WHERE substr(sa, i.i, 1) <> substr(sb, i.i, 1)) - 1,
                      least(len(sa), len(sb))) AS lcp
      FROM adj
    ),
    mx AS (SELECT CAST(max(lcp) AS BIGINT) AS max_lcp FROM lcps)
    SELECT (SELECT count(*) FROM suf) AS n_suffixes,
           mx.max_lcp,
           (SELECT count(*) FROM lcps WHERE lcp = mx.max_lcp)
             AS n_pairs_at_max,
           (SELECT substr(d2.text, q.pos_a, CAST(mx.max_lcp AS INT))
            FROM lcps q JOIN d d2 ON d2.doc_id = q.doc_a
            WHERE q.lcp = mx.max_lcp
            ORDER BY q.doc_a, q.pos_a LIMIT 1) AS repeat_text
    FROM mx
    """,
)
def suffix_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT longest repeated substring over the whole corpus (within or
    across documents) via a DISTRIBUTED SUFFIX ARRAY — the Lee et al.
    2022 ExactSubstr primitive, and the capstone this repo's dedup tier
    has bracketed since round 3: substring_dup_spans proves fixed-length
    duplicated grams, max_dup_gram_bracket brackets the longest span in
    [16,256); this query names its exact length, count, and text.

    Construction is Manber-Myers prefix doubling (operators/suffix.py):
    ceil(log2(max doc len)) rounds of equi-join + TWO-PHASE dense rank
    (range partition → local row_number → broadcast offsets — no
    single-task windows over data; the only unkeyed windows are
    global_rank's ~#partitions-row offset scans). Adjacent-suffix LCP is
    chunked 128-char codegen folds over survivors. The DuckDB oracle is
    the LITERAL algorithm — materialize every suffix string, sort,
    first-mismatch scan — so a hash match certifies the entire doubling
    construction against the definition. The oracle's O(L²) suffix
    materialization is exactly what the Spark side exists to avoid: the
    engine never stores a suffix, only (doc, pos, rank) triples.

    Scale shape: each doubling round is one keyed self-join plus a
    dense rank of the distinct pair table; rounds grow with log(max doc
    length), not corpus size. Peak state: two (doc,pos,rank) tables.
    At 100 TB this is the known shuffle-heavy construction (log L global
    sorts) — the price of EXACT substring dedup, paid once per corpus
    snapshot; the sketch tier (minhash/simhash/CDC) remains the cheap
    screen in front of it."""
    from storm_data_etl_spark.operators.suffix import adjacent_lcp, suffix_array

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.coalesce(F.col("text"), F.lit(""))) > 0)
        .select("doc_id", "text")
    )
    sa = suffix_array(docs)
    lcp = adjacent_lcp(sa, docs)
    n_suffixes = docs.select(
        F.coalesce(F.sum(F.length("text")), F.lit(0))
        .cast("bigint")
        .alias("n_suffixes")
    )
    mx = lcp.agg(F.max("lcp").cast("bigint").alias("max_lcp"))
    at_max = lcp.join(
        F.broadcast(mx), F.col("lcp") == F.col("max_lcp")
    )
    n_at_max = at_max.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs_at_max"),
        F.min(F.struct("doc_a", "pos_a")).alias("_first"),
    ).select(
        "n_pairs_at_max",
        F.col("_first.doc_a").alias("_fdoc"),
        F.col("_first.pos_a").alias("_fpos"),
    )
    best = (
        # LEFT join: a degenerate corpus with zero adjacent suffix pairs
        # (exactly one non-empty suffix) leaves _fdoc NULL; the oracle
        # still emits its 1 row (NULL max_lcp / repeat_text, 0 pairs),
        # so keep the row instead of dropping it on the NULL key.
        n_at_max.join(
            docs.select(F.col("doc_id").alias("_fdoc"), "text"),
            "_fdoc",
            "left",
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "n_pairs_at_max",
            "max_lcp",
            F.expr("substr(text, _fpos, CAST(max_lcp AS INT))").alias(
                "repeat_text"
            ),
        )
    )
    return n_suffixes.crossJoin(F.broadcast(best)).select(
        "n_suffixes", "max_lcp", "n_pairs_at_max", "repeat_text"
    )


@register(
    "suffix_lcp_histogram",
    """
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE length(coalesce(text, '')) > 0
    ),
    suf AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p) AS suf
      FROM d, unnest(range(1, length(text) + 1)) AS p(p)
    ),
    ordered AS (
      SELECT doc_id, pos, suf,
             row_number() OVER (ORDER BY suf, doc_id, pos) AS rn
      FROM suf
    ),
    adj AS (
      SELECT a.suf AS sa, b.suf AS sb
      FROM ordered a JOIN ordered b ON b.rn = a.rn + 1
    ),
    lcps AS (
      SELECT coalesce((SELECT min(i.i)
                       FROM unnest(range(1, least(len(sa), len(sb)) + 1)) AS i(i)
                       WHERE substr(sa, i.i, 1) <> substr(sb, i.i, 1)) - 1,
                      least(len(sa), len(sb))) AS lcp
      FROM adj
    )
    SELECT CASE WHEN lcp = 0 THEN 0 WHEN lcp < 4 THEN 1 WHEN lcp < 16 THEN 2
                WHEN lcp < 64 THEN 3 WHEN lcp < 256 THEN 4 ELSE 5 END
             AS lcp_bucket,
           count(*) AS n_pairs,
           CAST(sum(lcp) AS BIGINT) AS total_lcp,
           CAST(max(lcp) AS BIGINT) AS max_lcp
    FROM lcps GROUP BY 1
    """,
)
def suffix_lcp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LCP ARRAY, certified distributionally — the sharpening
    LIMITS.md promised beyond suffix_longest_repeat's scalar readout:
    every adjacent-suffix LCP value in the corpus feeds this hash
    (bucketed counts + per-bucket LCP mass + per-bucket max), so a wrong
    LCP ANYWHERE in the array — not just at the maximum — breaks the
    gate. This is the repeated-substring SPECTRUM: bucket 0/1 mass is
    unique text, bucket 4-5 mass is the duplication the ExactSubstr
    dedup policy (Lee et al. 2022 use >= 50-token spans) would cut.

    Same machinery as suffix_longest_repeat (prefix-doubling array +
    chunked LCP folds, operators/suffix.py) against the same literal
    materialize-sort-scan oracle; only the readout widens."""
    from storm_data_etl_spark.operators.suffix import adjacent_lcp, suffix_array

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.coalesce(F.col("text"), F.lit(""))) > 0)
        .select("doc_id", "text")
    )
    lcp = adjacent_lcp(suffix_array(docs), docs)
    bucket = (
        F.when(F.col("lcp") == 0, 0)
        .when(F.col("lcp") < 4, 1)
        .when(F.col("lcp") < 16, 2)
        .when(F.col("lcp") < 64, 3)
        .when(F.col("lcp") < 256, 4)
        .otherwise(5)
    )
    return lcp.groupBy(bucket.alias("lcp_bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("lcp").cast("bigint").alias("total_lcp"),
        F.max("lcp").cast("bigint").alias("max_lcp"),
    )


_EXACT_SUBSTR_L = 32

#: Gram-window oracle for ExactSubstr removal semantics — shared verbatim
#: by the global and sharded registrations: the sharded path is proven
#: per-shard ∪ cross-shard ≡ global, so ONE SQL definition gating both is
#: itself part of the claim (a sharded-mode divergence breaks its gate).
_EXACT_SUBSTR_SQL = f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE length(coalesce(text, '')) > 0
    ),
    g AS (
      SELECT doc_id, p.p AS pos, substr(text, p.p, {_EXACT_SUBSTR_L}) AS g
      FROM d, unnest(range(1, length(text) - {_EXACT_SUBSTR_L} + 2)) AS p(p)
      WHERE length(text) >= {_EXACT_SUBSTR_L}
    ),
    o AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY g) AS cnt,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS occ
      FROM g
    ),
    cuts AS (
      SELECT doc_id, pos AS s, pos + {_EXACT_SUBSTR_L} - 1 AS e
      FROM o WHERE cnt >= 2 AND occ >= 2
    ),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
                  THEN 1 ELSE 0 END AS ni
      FROM cuts
    ),
    isl2 AS (
      SELECT doc_id, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS isl
      FROM isl
    ),
    merged AS (
      SELECT doc_id, isl, min(s) AS ms, max(e) AS me
      FROM isl2 GROUP BY doc_id, isl
    ),
    segs AS (
      SELECT doc_id,
             coalesce(lag(me) OVER (PARTITION BY doc_id ORDER BY ms), 0) + 1 AS ks,
             ms - 1 AS ke
      FROM merged
      UNION ALL
      SELECT m.doc_id, max(m.me) + 1 AS ks, max(length(d2.text)) AS ke
      FROM merged m JOIN d d2 USING (doc_id) GROUP BY m.doc_id
    ),
    seg_txt AS (
      SELECT s.doc_id, s.ks,
             substr(d2.text, CAST(s.ks AS INT),
                    CAST(greatest(0, s.ke - s.ks + 1) AS INT)) AS seg
      FROM segs s JOIN d d2 USING (doc_id)
    ),
    red AS (
      SELECT doc_id, string_agg(seg, '' ORDER BY ks) AS deduped_text
      FROM seg_txt GROUP BY doc_id
    )
    SELECT r.doc_id,
           length(d2.text) AS orig_len,
           length(coalesce(r.deduped_text, '')) AS deduped_len,
           length(d2.text) - length(coalesce(r.deduped_text, '')) AS n_cut_chars,
           coalesce(r.deduped_text, '') AS deduped_text
    FROM red r JOIN d d2 USING (doc_id)
    """


@register("exact_substr_dedup", _EXACT_SUBSTR_SQL)
def exact_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span-removal dedup (Lee et al. 2022 §4.1) — the
    PRODUCTION transform on the suffix array, closing the round-6 gap
    where the capstone was read-only diagnostics: every duplicated span
    of length >= {L} chars is cut from the corpus except its first
    occurrence (min (doc_id, pos) per duplicate class), and the emitted
    rows are the changed docs with their rebuilt text — the driver
    hashes the full deduped text, so a single mis-cut character anywhere
    breaks the gate.

    Removal semantics pinned in tests/test_round7_ops.py hand-computed
    cases: which copy survives (global first), boundary handling (cut
    intervals merge when overlapping OR adjacent; kept segments are the
    complement within [1, len], so cuts at position 1 / doc end / whole
    doc all rebuild correctly, a fully-duplicated doc emitting '').

    The oracle is the gram-window formulation of the SAME semantics:
    duplicated-L-gram positions via count()-over-gram, keep-first via
    row_number, then identical interval algebra in SQL — independent of
    the suffix-array machinery it certifies (a suffix's L-prefix is
    duplicated iff an adjacent suffix-array neighbor shares >= L chars).

    Scale shape (operators/suffix.py exact_substr_cut): the SA detects
    duplicated positions without materializing grams (the oracle's gram
    table is corpus_bytes x L — the quadratic-ish blowup the index
    avoids); grams are extracted only for the duplicated subset;
    interval merge + reassembly are per-doc keyed windows. Index-build
    cost class (see bench.py INDEX_BUILDS), not interactive."""
    from storm_data_etl_spark.operators.suffix import exact_substr_cut

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.coalesce(F.col("text"), F.lit(""))) > 0)
        .select("doc_id", "text")
    )
    return exact_substr_cut(docs, min_len=_EXACT_SUBSTR_L)


@register("exact_substr_sharded_dedup", _EXACT_SUBSTR_SQL)
def exact_substr_sharded_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARDED ExactSubstr — the claimed 100 TB deployment mode
    (operators/suffix.exact_substr_cut_sharded: per-shard suffix arrays +
    8-byte xxhash64 cross-shard fingerprint reconcile), registered with
    the IDENTICAL gram-window oracle as exact_substr_dedup: the sharded
    path's whole claim is per-shard ∪ cross-shard ≡ global, so it must
    hash-match the same SQL — the planted-duplicate equivalence test
    (tests/test_round7_ops.py) now has a corpus-scale driver-gate twin,
    and bench.py INDEX_BUILDS times it beside the global build (VERDICT
    r7 task 5: the reconcile overhead vs per-shard saving is a measured
    number, not an argument). n_shards = 4 at test scale — enough that
    most duplicate pairs land cross-shard (p = 3/4), exercising the
    reconcile as the main detection path."""
    from storm_data_etl_spark.operators.suffix import exact_substr_cut_sharded

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.coalesce(F.col("text"), F.lit(""))) > 0)
        .select("doc_id", "text")
    )
    return exact_substr_cut_sharded(docs, min_len=_EXACT_SUBSTR_L, n_shards=4)


_EXACT_SUBSTR_LT = 8

@register(
    "exact_substr_token_dedup",
    f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, '')) = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
      FROM documents
    ),
    dl AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
    g AS (
      SELECT doc_id, p.p AS pos,
             array_to_string(toks[p.p:p.p + {_EXACT_SUBSTR_LT - 1}], chr(31)) AS g
      FROM dl, unnest(range(1, n - {_EXACT_SUBSTR_LT} + 2)) AS p(p)
      WHERE n >= {_EXACT_SUBSTR_LT}
    ),
    o AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY g) AS cnt,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS occ
      FROM g
    ),
    cuts AS (
      SELECT doc_id, pos AS s, pos + {_EXACT_SUBSTR_LT} - 1 AS e
      FROM o WHERE cnt >= 2 AND occ >= 2
    ),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
                  THEN 1 ELSE 0 END AS ni
      FROM cuts
    ),
    isl2 AS (
      SELECT doc_id, s, e,
             sum(ni) OVER (PARTITION BY doc_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS isl
      FROM isl
    ),
    merged AS (
      SELECT doc_id, isl, min(s) AS ms, max(e) AS me
      FROM isl2 GROUP BY doc_id, isl
    ),
    segs AS (
      SELECT doc_id,
             coalesce(lag(me) OVER (PARTITION BY doc_id ORDER BY ms), 0) + 1 AS ks,
             ms - 1 AS ke
      FROM merged
      UNION ALL
      SELECT m.doc_id, max(m.me) + 1 AS ks, max(dl2.n) AS ke
      FROM merged m JOIN dl dl2 USING (doc_id) GROUP BY m.doc_id
    ),
    seg_toks AS (
      SELECT s.doc_id, s.ks,
             CASE WHEN s.ke >= s.ks
                  THEN dl2.toks[CAST(s.ks AS INT):CAST(s.ke AS INT)]
                  ELSE []::VARCHAR[] END AS seg
      FROM segs s JOIN dl dl2 USING (doc_id)
    ),
    red AS (
      SELECT doc_id, flatten(list(seg ORDER BY ks)) AS kept
      FROM seg_toks GROUP BY doc_id
    )
    SELECT r.doc_id,
           dl2.n AS orig_n_tokens,
           len(r.kept) AS deduped_n_tokens,
           dl2.n - len(r.kept) AS n_cut_tokens,
           coalesce(array_to_string(r.kept, ' '), '') AS deduped_text
    FROM red r JOIN dl dl2 USING (doc_id)
    """,
)
def exact_substr_token_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-mode ExactSubstr (Lee et al. 2022 dedup on 50-BPE-token
    windows; VERDICT r7 task 4): duplicated runs of >= {L}=8 whitespace
    tokens are cut except the global first occurrence, cuts land on
    token boundaries, and changed docs are re-emitted as canonical
    single-space text — the driver hashes the rebuilt text, so one
    mis-cut TOKEN anywhere breaks the gate. Same keep-first + interval
    union semantics as exact_substr_dedup, with token indices as the
    coordinate system (char-vs-token semantics contrast documented in
    docs/SCALE.md).

    The registry entry fixes the token model to whitespace tokens (the
    one tokenizer both engines share exactly); the OPERATOR
    (operators/suffix.exact_substr_cut_tokens) is tokenizer-agnostic
    over array<string> and is composed with the real BPE segmenter in
    tests/test_round8_ops.py — a trained-artifact token model can't be
    oracle-gated, a fixed deterministic one can.

    Scale shape: fixed-L window dedup detects duplicates with the 8-byte
    xxhash64 fingerprint pass (shuffle 8 B/position, never corpus x L
    token text) + gram-text verification — the exact reconcile shape
    proven in the sharded char path; the oracle is the direct gram-window
    formulation of the same semantics."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", X.tokens("text").alias("tokens")
    )
    from storm_data_etl_spark.operators.suffix import exact_substr_cut_tokens

    return exact_substr_cut_tokens(docs, min_tokens=_EXACT_SUBSTR_LT)


@register(
    "dup_aware_loss_weights",
    f"""
    WITH fp AS (
      SELECT doc_id, source, md5({_SQL_NORM}) AS fingerprint FROM documents
    ),
    grouped AS (
      SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_dups
      FROM fp GROUP BY fingerprint
    ),
    weighted AS (
      SELECT fp.source, g.n_dups,
             CAST(1000000 // g.n_dups AS BIGINT) AS w_e6
      FROM fp JOIN grouped g USING (fingerprint)
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_dups = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(max(n_dups) AS BIGINT) AS max_dup_count,
           CAST(sum(w_e6) AS BIGINT) AS effective_mass_e6
    FROM weighted GROUP BY source
    """,
)
def dup_aware_loss_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware example weighting — the SOFT alternative to hard
    dedup: instead of dropping duplicates, weight each document by
    1/n_dups so every CONTENT fingerprint contributes unit loss mass
    regardless of copy count (the convexity argument behind
    count-weighted sampling in dedup ablations; hard first-wins dedup is
    the w in {0,1} special case this generalizes). Emits the per-source
    accounting: effective unique mass Σ 1e6/n_dups vs raw doc count —
    the gap is exactly what duplicated boilerplate would have
    over-trained on.

    Scale shape: one fingerprint pass (md5 of normalized text, codegen),
    one map-side-combinable group count, one keyed join of the ≤-corpus
    fingerprint table back to the scan, one per-source aggregate. The
    weights are exact integer floors, so the distributed sum is
    order-free."""
    # NULL fingerprints (NULL text) never match the oracle's USING
    # (fingerprint) join, so they contribute no weighted rows — the window
    # form must drop them explicitly or it would retain them (ADVICE r12).
    # Filter on text, not on the derived md5: fingerprint IS NULL ⟺ text IS
    # NULL, and a filter on the derived column would be pushed below the
    # projection and re-evaluate the normalize+md5 pass (guide §4.4 shape).
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source", X.fingerprint("text").alias("fingerprint"))
    )
    # Optimization r12 (guide §2.4): the group count joined back to the
    # scan re-ran the fingerprint pass and shuffled both sides — a
    # fingerprint-keyed window count computes the same n_dups per row in
    # ONE pass over one exchange. Same counts, same weights.
    weighted = docs.select(
        "source",
        F.count(F.lit(1))
        .over(Window.partitionBy("fingerprint"))
        .cast("bigint")
        .alias("n_dups"),
    ).select(
        "source",
        "n_dups",
        F.expr("1000000 div n_dups").cast("bigint").alias("w_e6"),
    )
    return weighted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_dups") == 1).cast("int"))
        .cast("bigint")
        .alias("n_singletons"),
        F.max("n_dups").cast("bigint").alias("max_dup_count"),
        F.sum("w_e6").cast("bigint").alias("effective_mass_e6"),
    )


@register(
    "lsh_s_curve",
    r"""
    WITH norm AS (
      SELECT doc_id AS id, regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9À-ɏ一-鿿]+', ' ', 'g')), ' ') AS words
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT id, unnest(
      CASE WHEN len(words) >= 3
           THEN list_distinct(list_transform(range(1, len(words) - 3 + 2),
                              i -> array_to_string(words[i:i+2], ' ')))
           ELSE [array_to_string(words, ' ')] END) AS shingle FROM norm
    ),
    ids AS (
      SELECT id,
             CASE WHEN shingle = '' THEN 0
                  ELSE list_reduce(
                         list_transform(regexp_split_to_array(shingle, ''),
                                        c -> CAST(unicode(c) AS BIGINT)),
                         (a, b) -> (a * 31 + b) % 2147483647)
             END AS sid
      FROM sh
    ),
    hashed AS (
      SELECT id, i.i AS i,
             ((CAST(1103515245 AS BIGINT) * (i.i + 1) + 12345) % 2147483647)
               * sid % 2147483647
               + (CAST(12345 AS BIGINT) * (i.i + 1) + 999331) % 2147483647
               AS raw
      FROM ids, unnest(range(0, 16)) AS i(i)
    ),
    sig AS (
      SELECT id, i, min(raw % 2147483647) AS minh
      FROM hashed GROUP BY id, i
    ),
    configs AS (SELECT unnest([1, 2, 4, 8]) AS r),
    bands AS (
      SELECT c.r, s.id, s.i // c.r AS band,
             string_agg(s.minh, ':' ORDER BY s.i) AS band_key
      FROM sig s, configs c GROUP BY c.r, s.id, s.i // c.r
    ),
    cand AS (
      SELECT DISTINCT a.r, a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.r = b.r AND a.band = b.band AND a.band_key = b.band_key
       AND a.id < b.id
    ),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i JOIN sizes sa ON sa.id = i.id_a
                   JOIN sizes sb ON sb.id = i.id_b
      WHERE 5 * i.n_inter >= 2 * (sa.n_sh + sb.n_sh - i.n_inter)
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
    hits AS (
      SELECT c.r, CAST(count(*) AS BIGINT) AS n_hits
      FROM cand c JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b
      GROUP BY c.r
    ),
    per AS (
      SELECT c.r, CAST(count(*) AS BIGINT) AS n_candidates
      FROM cand c GROUP BY c.r
    )
    SELECT per.r AS rows_per_band,
           CAST(16 // per.r AS BIGINT) AS n_bands,
           per.n_candidates,
           nt.n_truth,
           coalesce(h.n_hits, 0) AS n_hits,
           CASE WHEN nt.n_truth = 0 THEN 0
                ELSE CAST((10000 * coalesce(h.n_hits, 0)) // nt.n_truth
                          AS BIGINT) END AS recall_e4,
           CASE WHEN per.n_candidates = 0 THEN 0
                ELSE CAST((10000 * coalesce(h.n_hits, 0)) // per.n_candidates
                          AS BIGINT) END AS precision_e4
    FROM per LEFT JOIN hits h ON h.r = per.r CROSS JOIN nt
    """,
)
def lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH S-CURVE, measured and hash-certified end to end: for band
    configurations (b, r) in {(16,1), (8,2), (4,4), (2,8)} over the SAME
    16 certified LCG minhashes as minhash_lcg_lsh_pairs, the candidate
    recall and precision against EXACT shingle Jaccard >= 0.4 (the
    threshold compare is rational — 5·|∩| >= 2·|∪| — no division).
    This is the table an engineer reads to pick (b, r): theory says
    P(candidate) = 1 − (1 − s^r)^b, monotone in bands — small r floods
    candidates at high recall, large r starves them. Every quantity
    (candidate counts per config, truth-set size, hits, e4 ratios)
    feeds the oracle hash, so the banding/bucketing machinery is
    certified at every operating point, not just the production (4,4).

    Scale shape: the minhash pipeline is the certified scale-clean one;
    the config fan-out multiplies only the BAND table (16 rows per doc
    regardless of r). The exact-Jaccard truth side is the definitional
    all-pairs-by-shingle oracle — a measurement harness run at gate
    scale; production keeps (4,4) and never materializes truth. The r=1
    config is deliberately included as the flood case the curve warns
    about."""
    docs = t(spark, sf_dir, "documents")
    P = 2147483647
    sh = (
        docs.select(
            F.col("doc_id").alias("id"), X.shingles("text", 3).alias("shingles")
        )
        .select("id", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    sh = _pin(sh)  # feeds signature + sizes + intersection legs
    ids = sh.select(
        "id",
        F.aggregate(
            F.split("shingle", ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(P).cast("long"),
        ).alias("sid"),
    )
    hashed = ids.select(
        "id",
        F.posexplode(F.sequence(F.lit(0), F.lit(15))).alias("i", "_i2"),
        "sid",
    ).select(
        "id",
        "i",
        (
            ((F.lit(1103515245).cast("long") * (F.col("i") + 1) + 12345) % P)
            * F.col("sid").cast("long") % P
            + (F.lit(12345).cast("long") * (F.col("i") + 1) + 999331) % P
        ).alias("raw"),
    )
    sig = hashed.groupBy("id", "i").agg((F.min(F.col("raw") % P)).alias("minh"))
    configs = spark.createDataFrame([(1,), (2,), (4,), (8,)], "r int")
    band_key = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("i").alias("i"), F.col("minh").alias("m")))
            ),
            lambda x: x["m"].cast("string"),
        ),
        ":",
    )
    bands = (
        sig.crossJoin(F.broadcast(configs))
        .groupBy("r", "id", F.expr("i div r").alias("band"))
        .agg(band_key.alias("band_key"))
    )
    bands = _pin(bands)  # both self-join legs
    a = bands.select(
        "r", F.col("band").alias("band"), F.col("band_key").alias("bk"),
        F.col("id").alias("id_a"),
    )
    b = bands.select(
        F.col("r").alias("rb"), F.col("band").alias("band_b"),
        F.col("band_key").alias("bk_b"), F.col("id").alias("id_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("r") == F.col("rb"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("bk") == F.col("bk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("r", "id_a", "id_b")
        .distinct()
    )
    cand = _pin(cand)  # per-config counts + hit join
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    s2 = sh.select(F.col("id").alias("id_b2"), F.col("shingle").alias("sh2"))
    inter = (
        sh.join(
            s2,
            (F.col("shingle") == F.col("sh2")) & (F.col("id") < F.col("id_b2")),
        )
        .groupBy(F.col("id").alias("id_a"), F.col("id_b2").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    truth = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .filter(
            5 * F.col("n_inter") >= 2 * (F.col("na") + F.col("nb") - F.col("n_inter"))
        )
        .select("id_a", "id_b")
    )
    truth = _pin(truth)
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    hits = cand.join(truth, ["id_a", "id_b"]).groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    per = cand.groupBy("r").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    return (
        per.join(hits, "r", "left")
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("r").cast("int").alias("rows_per_band"),
            F.expr("16 div r").cast("bigint").alias("n_bands"),
            "n_candidates",
            "n_truth",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.when(F.col("n_truth") == 0, F.lit(0))
            .otherwise(F.expr("(10000 * coalesce(n_hits, 0)) div n_truth"))
            .cast("bigint")
            .alias("recall_e4"),
            F.when(F.col("n_candidates") == 0, F.lit(0))
            .otherwise(
                F.expr("(10000 * coalesce(n_hits, 0)) div n_candidates")
            )
            .cast("bigint")
            .alias("precision_e4"),
        )
    )


# =====================================================================
# ECE + token-distribution drift (round 8)
# =====================================================================

@register(
    "ece_calibration_error",
    f"""
    WITH {_SQL_QUALITY_CTES},
    labeled AS (
      SELECT d.source,
             CAST(q.quality * 10000 AS BIGINT) AS score_e4,
             least(9, CAST(floor(q.quality * 10) AS BIGINT)) AS bin,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label
      FROM qual q JOIN documents d USING (doc_id)
    ),
    bins AS (
      SELECT source, bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS sl,
             CAST(sum(score_e4) AS BIGINT) AS ss
      FROM labeled GROUP BY source, bin
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(abs(10000 * sl - ss)) AS BIGINT) AS t_abs,
           CAST((100 * CAST(sum(abs(10000 * sl - ss)) AS BIGINT)) // sum(n)
                AS BIGINT) AS ece_e6
    FROM bins GROUP BY source
    """,
)
def ece_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error per source — the SCALAR the
    score_calibration_bins reliability table summarizes to, and the
    number a curation pipeline actually thresholds on before trusting a
    filter's probabilities. ECE = Σ_b (n_b/N)·|acc_b − conf_b| over the
    same fixed decile bins; substituting the per-bin integer sums turns
    every term into |1e4·Σlabel_b − Σscore_e4_b| / (1e4·N), so
    ECE·1e6 = (100·Σ_b |1e4·sl_b − ss_b|) tdiv N — PURE integer
    arithmetic end to end (the weighted absolute sum telescopes the n_b
    denominators away; numerator and each |·| term are non-negative so
    div ≡ //). No floats anywhere, hence nothing to quantize or
    order-pin.

    Scale: one quality-expression scan → groupBy(source, bin) (≤ 10
    bins/source) → per-source aggregate. Capacity:
    100·Σ|·| ≤ 1e6·N < 2⁶³ → N < 9.2e12 docs — unbounded in practice."""
    docs = t(spark, sf_dir, "documents")
    q = X.quality_score("text")
    labeled = docs.select(
        "source",
        (q * 10000).cast("bigint").alias("score_e4"),
        F.least(F.lit(9), F.floor(q * 10).cast("bigint")).alias("bin"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    bins = labeled.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("sl"),
        F.sum("score_e4").cast("bigint").alias("ss"),
    )
    return bins.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.abs(10000 * F.col("sl") - F.col("ss"))).cast("bigint").alias("t_abs"),
        F.expr("(100 * sum(abs(10000 * sl - ss))) div sum(n)")
        .cast("bigint")
        .alias("ece_e6"),
    )


@register(
    "tv_token_drift",
    r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents WHERE trim(coalesce(text, '')) <> ''
    ),
    sc AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY source, tok
    ),
    gc AS (
      SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM sc GROUP BY tok
    ),
    ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sc GROUP BY source),
    ng AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gc),
    joined AS (
      SELECT s.source,
             CAST(sum(abs(s.c * ng.n - g.g * ns.n_s)) AS HUGEINT) AS t_in,
             CAST(sum(g.g) AS BIGINT) AS g_seen
      FROM sc s JOIN gc g USING (tok) JOIN ns ON ns.source = s.source
      CROSS JOIN ng
      GROUP BY s.source, ns.n_s, ng.n
    )
    SELECT j.source, ns.n_s AS n_tokens,
           CAST((1000000 * (j.t_in + CAST(ns.n_s AS HUGEINT) * (ng.n - j.g_seen)))
                // (2 * CAST(ns.n_s AS HUGEINT) * ng.n) AS BIGINT) AS tv_e6
    FROM joined j JOIN ns ON ns.source = j.source CROSS JOIN ng
    """,
)
def tv_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each source's token distribution
    and the pooled corpus distribution — the exact, bounded-in-[0,1]
    drift readout that PSI (psi_drift_bins) approximates with log-ratio
    bins, and the token-level companion to DSIR's importance weights: a
    source with high TV is the one whose inclusion shifts the training
    distribution most. TV(P_s, P) = ½·Σ_i |p_i − q_i| over the GLOBAL
    vocabulary; clearing denominators makes every term an exact integer:
    Σ_i |c_i·N − g_i·N_s|, split as (tokens present in the source: one
    equi-join on the source's own vocab) + (tokens absent from the
    source: Σ g_i·N_s telescopes to N_s·(N − G_seen), no join against
    the full vocabulary per source — the missing-mass trick that keeps
    the plan source-vocab-sized instead of |vocab|×|sources|).
    tv_e6 = (1e6·T) tdiv (2·N_s·N), computed in DECIMAL(38,0)/HUGEINT
    (T ≤ 2·N_s·N ≈ 1e14 at sf0.1 and 1e6·T would leave BIGINT; all
    operands non-negative so div ≡ //).

    Scale: the (source, token) count is the vocab_growth shuffle; the
    global count reuses it (one extra tok-keyed aggregate); the join is
    per-source-vocab-sized. One narrow high-cardinality shuffle total."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
        .select("source", F.explode(X.tokens(F.lower(F.col("text")))).alias("tok"))
    )
    sc = docs.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    sc = _pin(sc)  # feeds the global count, the per-source totals, and the join
    gc = sc.groupBy("tok").agg(F.sum("c").cast("bigint").alias("g"))
    ns = sc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    ng = gc.agg(F.sum("g").cast("bigint").alias("n"))
    joined = (
        sc.join(gc, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            F.expr("abs(CAST(c AS DECIMAL(38,0)) * n - CAST(g AS DECIMAL(38,0)) * n_s)").alias(
                "term"
            ),
            "g",
        )
        .groupBy("source")
        .agg(
            F.sum("term").cast("decimal(38,0)").alias("t_in"),
            F.sum("g").cast("bigint").alias("g_seen"),
        )
    )
    return (
        joined.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.expr(
                "CAST((1000000 * (t_in + CAST(n_s AS DECIMAL(38,0)) * (n - g_seen)))"
                " div (2 * CAST(n_s AS DECIMAL(38,0)) * n) AS BIGINT)"
            ).alias("tv_e6"),
        )
    )


# =====================================================================
# Edit-distance verification of near-dup candidate pairs — round 8
# =====================================================================

@register(
    "edit_distance_near_dup",
    r"""
    WITH norm AS (
      SELECT doc_id, source,
             substr(regexp_replace(lower(coalesce(text, '')),
                                   '[^a-z0-9 ]+', '', 'g'),
                    1, 120) AS ntext
      FROM documents
    ),
    pairs AS (
      SELECT a.source,
             levenshtein(a.ntext, b.ntext) AS dist,
             greatest(length(a.ntext), length(b.ntext)) AS max_len
      FROM norm a JOIN norm b ON b.doc_id = a.doc_id + 37
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(sum(CASE WHEN 10 * dist <= max_len
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           CAST(sum(dist) AS BIGINT) AS sum_dist
    FROM pairs GROUP BY source
    """,
)
def edit_distance_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification pass over near-dup CANDIDATE pairs —
    the exact-but-expensive confirm stage a fuzzy-dedup pipeline runs
    after cheap candidate generation (MinHash/SimHash bands), here over
    the deterministic doc_id → doc_id+37 pair construction the other
    pairwise audits share. Levenshtein distance on both engines over a
    canonicalized prefix: lowercase → strip to [a-z0-9 ] → first 120
    chars. The canonicalization is load-bearing for BOTH correctness and
    cost: pure-ASCII input sidesteps the engines' differing unicode
    unit counting (JVM UTF-16 vs DuckDB codepoints), and the 120-char
    cap bounds the O(len²) DP at 14.4k cells/pair — the knob a real
    deployment sets by its candidate-pair budget. Near = dist ≤ 10% of
    the longer string (integer cross-multiplication, no ratio), a
    SUPERSET of exact — dist = 0 satisfies 10·dist ≤ max_len for every
    length including two empty-normalizing texts, so n_near − n_exact
    is always the non-trivial near count.

    Scale: one narrow scan (doc_id, source, 120-char prefix) → ONE
    equi-join on the shifted id (shuffle or broadcast by size) → exact
    integer aggregate. Pair count = corpus size, never corpus²: the
    operator verifies candidates, it does not generate them — chaining
    after minhash_lsh_pairs replaces the id-shift join with the band
    join's output. All counts/sums are BIGINTs; no capacity edge below
    ~1e18 total edit operations per source."""
    norm = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.substring(
            F.regexp_replace(
                F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9 ]+", ""
            ),
            1,
            120,
        ).alias("ntext"),
    )
    a = norm.alias("a")
    b = norm.select((F.col("doc_id") - 37).alias("jid"), F.col("ntext").alias("btext"))
    pairs = a.join(b, F.col("a.doc_id") == F.col("jid")).select(
        F.col("a.source").alias("source"),
        F.levenshtein(F.col("a.ntext"), F.col("btext")).alias("dist"),
        F.greatest(F.length("a.ntext"), F.length("btext")).alias("max_len"),
    )
    return pairs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum((F.col("dist") == 0).cast("int")).cast("bigint").alias("n_exact"),
        F.sum((10 * F.col("dist") <= F.col("max_len")).cast("int"))
        .cast("bigint")
        .alias("n_near"),
        F.sum("dist").cast("bigint").alias("sum_dist"),
    )


@register(
    "langid_confidence_margin",
    # The SAME shared lang-scores SQL model as lang_id_distribution,
    # read for CONFIDENCE: top-minus-second margin.
    f"""
    WITH {_sql_lang_scores_ctes("source")}, ranked AS (
      SELECT source,
             list_sort([s_de, s_en, s_es, s_fr, s_zh], 'DESC') AS sc
      FROM s
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN sc[1] <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_und,
           CAST(sum(CASE WHEN sc[1] > 0 AND sc[1] = sc[2] THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tied,
           CAST(sum(CASE WHEN sc[1] - sc[2] >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_margin_ge3,
           CAST(sum(sc[1] - sc[2]) AS BIGINT) AS sum_margin
    FROM ranked GROUP BY source
    """,
)
def langid_confidence_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID CONFIDENCE audit per source: the margin between the
    top and second-best per-language stopword scores of the lang_id
    heuristic (lang_id_distribution reports WHAT was predicted; this
    reports how decisively). A corpus-mix pipeline uses exactly this
    readout to route ambiguous documents (tied or thin-margin scores)
    to a heavier classifier instead of trusting the cheap one —
    the CCNet/fastText-threshold pattern with the engine's own scores.

    Exactness: scores are integer hit counts; top and runner-up come
    from sorting the fixed 5-element score array DESC inside the row
    (Spark sort_array ≡ DuckDB list_sort on integers), so margins,
    tie flags, and the und gate are all pure-integer — no float exists.

    Scale: one documents scan, per-row array ops in whole-stage codegen,
    one tiny groupBy(source). No capacity edge: margins are bounded by
    token counts."""
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scores = X.lang_scores("text")
    arr = F.sort_array(
        F.array(*[scores[lang] for lang in ("de", "en", "es", "fr", "zh")]),
        asc=False,
    )
    ranked = docs.select(
        "source",
        F.element_at(arr, 1).alias("top"),
        F.element_at(arr, 2).alias("second"),
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("top") <= 0).cast("int")).cast("bigint").alias("n_und"),
        F.sum(((F.col("top") > 0) & (F.col("top") == F.col("second"))).cast("int"))
        .cast("bigint")
        .alias("n_tied"),
        F.sum(((F.col("top") - F.col("second")) >= 3).cast("int"))
        .cast("bigint")
        .alias("n_margin_ge3"),
        F.sum(F.col("top") - F.col("second")).cast("bigint").alias("sum_margin"),
    )


# =====================================================================
# Off-policy evaluation, part 2: SNIPS + doubly-robust estimators
# =====================================================================

@register(
    "snips_dr_policy_value",
    """
    WITH q AS (
      SELECT user_id % 16 AS ctx, event_type AS action,
             CAST(floor("value" * 100) AS BIGINT) AS r
      FROM events WHERE "value" IS NOT NULL
    ),
    counts AS (
      SELECT ctx, action,
             CAST(count(*) AS BIGINT) AS c_ax,
             CAST(sum(r) AS BIGINT) AS sr_ax
      FROM q GROUP BY ctx, action
    ),
    ctx_tot AS (SELECT ctx, CAST(sum(c_ax) AS BIGINT) AS c_x
                FROM counts GROUP BY ctx),
    tgt AS (
      SELECT x.ctx, x.c_x,
             coalesce(c.c_ax, 0) AS c_t, coalesce(c.sr_ax, 0) AS sr_t
      FROM ctx_tot x LEFT JOIN counts c
        ON c.ctx = x.ctx
       AND c.action = (CASE WHEN x.ctx < 8 THEN 'purchase' ELSE 'click' END)
    ),
    scored AS (
      SELECT q.r, c.c_ax, c.sr_ax, g.c_x, g.c_t, g.sr_t,
             CASE WHEN q.action = (CASE WHEN q.ctx < 8 THEN 'purchase'
                                        ELSE 'click' END)
                  THEN 1 ELSE 0 END AS matched
      FROM q JOIN counts c ON c.ctx = q.ctx AND c.action = q.action
             JOIN tgt g ON g.ctx = q.ctx
    ),
    rows_q AS (
      SELECT matched,
             CASE WHEN matched = 1
                  THEN CAST(floor(10000.0 * (c_x / CAST(c_ax AS DOUBLE))) AS BIGINT)
                  ELSE 0 END AS w_e4,
             CASE WHEN matched = 1
                  THEN CAST(floor(10000.0 * r * (c_x / CAST(c_ax AS DOUBLE)))
                       AS BIGINT)
                  ELSE 0 END AS wr_e4,
             CAST(floor(10000.0 * (
               CASE WHEN c_t = 0 THEN 0.0
                    ELSE sr_t / CAST(c_t AS DOUBLE) END
               + matched * ((r - sr_ax / CAST(c_ax AS DOUBLE))
                            * (c_x / CAST(c_ax AS DOUBLE))))) AS BIGINT) AS dr_e4
      FROM scored
    )
    SELECT CAST(count(*) AS BIGINT) AS n_logged,
           CAST(sum(matched) AS BIGINT) AS n_matched,
           CASE WHEN sum(w_e4) = 0 THEN NULL
                ELSE (10000 * CAST(sum(wr_e4) AS BIGINT))
                     // CAST(sum(w_e4) AS BIGINT)
           END AS snips_value_e4,
           CASE WHEN sum(dr_e4) >= 0
                THEN CAST(sum(dr_e4) // count(*) AS BIGINT)
                ELSE -CAST((-sum(dr_e4)) // count(*) AS BIGINT)
           END AS dr_value_e4,
           CASE WHEN sum((w_e4 * w_e4) // 10000) = 0 THEN NULL
                ELSE CAST(floor(100.0 * (CAST(sum(w_e4) AS DOUBLE)
                                    * CAST(sum(w_e4) AS DOUBLE))
                     / (10000.0 * CAST(sum((w_e4 * w_e4) // 10000) AS DOUBLE)))
                     AS BIGINT)
           END AS ess_e2
    FROM rows_q
    """,
)
def snips_dr_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-normalized IPS (Swaminathan & Joachims 2015) and the
    doubly-robust estimator (Dudík, Langford & Li 2011) for the same
    logged-bandit setup as ips_policy_value (target: purchase for
    contexts 0-7, click for 8-15; propensities = empirical c_ax/c_x).
    SNIPS divides the weighted reward by the realized weight mass
    (killing IPS's scale sensitivity); DR adds the plug-in value model
    q_hat(x,a) = mean logged reward per (ctx, action) and corrects it
    with the importance-weighted residual — unbiased if EITHER the
    propensities or q_hat are right. ess_e2 = (sum w)^2 / sum w^2, the
    effective-sample-size health check every off-policy report carries
    (Kong 1992).

    Exactness: per-row weight / weighted-reward / DR terms are
    closed-form doubles over exact BIGINT count sums (deterministic per
    row — the welch discipline), floored at 1e4 per row BEFORE the
    global sums, so only integers cross the aggregate; SNIPS and the
    mean are then truncating integer divisions, and ESS is one
    closed-form double over three exact sums. dr_e4 carries the
    importance-weighted residual and CAN go negative, so dr_value_e4
    spells truncation-toward-zero out sign-symmetrically on both
    engines. On the pinned DuckDB (1.0.0, re-verified this round:
    SELECT -7 // 2 → -3) `//` already truncates toward zero exactly
    like Spark's div, so the CASE arms are DEFENSIVE against
    floor-division DuckDB versions, not a live divergence — ADVICE r10
    corrected an earlier claim here that DuckDB floors. Capacity:
    wr_e4 <= 1e4 * r * c_x -> past ~1e9 rows/context recast
    (docs/LIMITS.md).

    Scale shape: identical to ips_policy_value — the (ctx x action)
    propensity/value table broadcasts twice onto one scan, then a
    one-row aggregate. The ONLY additions are the left-join target-arm
    value row (still broadcast-sized) and three more integer sums."""
    q = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 16).alias("ctx"),
            F.col("event_type").alias("action"),
            F.floor(F.col("value") * 100).cast("bigint").alias("r"),
        )
    )
    counts = q.groupBy("ctx", "action").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ax"),
        F.sum("r").cast("bigint").alias("sr_ax"),
    )
    # (ctx x action) rows feed ctx_tot, the target-arm left join AND the
    # scoring broadcast — pin so the corpus is scanned exactly twice
    # (propensity pass + scoring pass), never four times.
    counts = _pin(counts)
    ctx_tot = counts.groupBy("ctx").agg(F.sum("c_ax").cast("bigint").alias("c_x"))
    target_of = lambda ctx: F.when(ctx < 8, F.lit("purchase")).otherwise(F.lit("click"))
    tgt = (
        ctx_tot.alias("x")
        .join(
            counts.alias("c"),
            (F.col("c.ctx") == F.col("x.ctx"))
            & (F.col("c.action") == target_of(F.col("x.ctx"))),
            "left",
        )
        .select(
            F.col("x.ctx").alias("ctx"),
            F.col("x.c_x").alias("c_x"),
            F.coalesce(F.col("c.c_ax"), F.lit(0)).cast("bigint").alias("c_t"),
            F.coalesce(F.col("c.sr_ax"), F.lit(0)).cast("bigint").alias("sr_t"),
        )
    )
    scored = (
        q.join(F.broadcast(counts), ["ctx", "action"])
        .join(F.broadcast(tgt), "ctx")
        .withColumn("matched", (F.col("action") == target_of(F.col("ctx"))).cast("int"))
    )
    w_d = F.col("c_x") / F.col("c_ax").cast("double")
    qhat_t = F.when(F.col("c_t") == 0, F.lit(0.0)).otherwise(
        F.col("sr_t") / F.col("c_t").cast("double")
    )
    qhat_ax = F.col("sr_ax") / F.col("c_ax").cast("double")
    rows_q = scored.select(
        "matched",
        F.when(F.col("matched") == 1, F.floor(10000.0 * w_d).cast("bigint"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("w_e4"),
        F.when(
            F.col("matched") == 1,
            F.floor(10000.0 * F.col("r") * w_d).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("wr_e4"),
        F.floor(
            10000.0
            * (qhat_t + F.col("matched") * ((F.col("r") - qhat_ax) * w_d))
        )
        .cast("bigint")
        .alias("dr_e4"),
    )
    agg = rows_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_logged"),
        F.sum("matched").cast("bigint").alias("n_matched"),
        F.sum("w_e4").cast("bigint").alias("sw"),
        F.sum("wr_e4").cast("bigint").alias("swr"),
        F.sum("dr_e4").cast("bigint").alias("sdr"),
        F.expr("sum((w_e4 * w_e4) div 10000)").cast("bigint").alias("sww"),
    )
    snips = F.when(F.col("sw") == 0, F.lit(None).cast("bigint")).otherwise(
        F.expr("(10000 * swr) div sw")
    )
    ess = F.when(F.col("sww") == 0, F.lit(None).cast("bigint")).otherwise(
        F.floor(
            100.0
            * (F.col("sw").cast("double") * F.col("sw").cast("double"))
            / (10000.0 * F.col("sww").cast("double"))
        ).cast("bigint")
    )
    return agg.select(
        "n_logged",
        "n_matched",
        snips.cast("bigint").alias("snips_value_e4"),
        F.when(F.col("sdr") >= 0, F.expr("sdr div n_logged"))
        .otherwise(-F.expr("(-sdr) div n_logged"))
        .cast("bigint")
        .alias("dr_value_e4"),
        ess.alias("ess_e2"),
    )
