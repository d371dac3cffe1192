"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-data-pipeline extensions), (spark, sf_dir) → DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query (same column aliases; the
                 driver hash-compares values order-insensitively). Queries
                 whose semantics aren't SQL-expressible (xxhash64 sketches,
                 approximate ANN) are intentionally absent → rows-only check.

Query implementations live in storm_data_etl_spark/plans/ — this module is
just the registry façade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plans modules populates the registry.
from storm_data_etl_spark.plans import queries as _q
from storm_data_etl_spark.plans import enrich_queries as _eq  # noqa: F401
from storm_data_etl_spark.plans import ml_queries as _mq  # noqa: F401
from storm_data_etl_spark.plans import window_queries as _wq  # noqa: F401
from storm_data_etl_spark.plans import lake_queries as _lq  # noqa: F401
from storm_data_etl_spark.plans import corpus_queries as _cq  # noqa: F401
from storm_data_etl_spark.plans import geo_queries as _gq  # noqa: F401
from storm_data_etl_spark.plans import retrieval_queries as _rq  # noqa: F401
from storm_data_etl_spark.plans import sft_queries as _sft  # noqa: F401

SF_SMOKE_DIR = "/root/testdata/sf0.001"

#: Curated head of the registry: the driver's correctness gate samples the
#: first entries of queries() in order, so each round front-loads queries
#: that have NOT yet been through the gate (never_gated() below tracks the
#: set explicitly from the CORRECTNESS_r*.json records). Rounds 1-4
#: hash-proved all 174 oracle-backed queries and recorded the 13
#: rows-only-by-design entries' weaker evidence tier once each, so
#: never_gated() was empty entering round 5. The round-5 head is EXACTLY
#: the 50 never-gated round-5 additions (49 oracle-backed + the rows-only
#: bloom_cross_dedup): the exactness-regime sketch/ANN twins, the
#: data-selection and privacy batch, the SFT/data-loading family, the
#: decorrelated-subquery join patterns (TPC-H Q2/Q17/Q11 shapes),
#: time-series diagnostics (ACF, weekday seasonality), the
#: training-pipeline batch (span corruption, tool-call traces, bitext
#: ratio filter, curriculum plan, mojibake audit), lake maintenance
#: (snapshot retention, encoding planner), audio VAD segmentation, the
#: watermark lag histogram, and chunk-boundary seam detection — every
#: one verified by the local gate replica tools/pandas_parity_check.py
#: at sf0.001 AND sf0.01 (plus a non-UTC session TZ) before rotation.
#: The re-verification backlog (round-1 then round-2 vintage) follows
#: beyond the head so gate evidence keeps refreshing in later rounds.
PRIORITY = [
    # round-5 additions: exactness-regime oracle twins for the sketch/ANN
    # machinery, plus DSIR importance weights and n-gram novelty (never
    # gated yet)
    "boilerplate_chunk_removal",
    "asof_join_tolerance",
    "sequence_packing_stats",
    "padding_efficiency_stats",
    "unicode_nfc_audit",
    "bpe_zero_merge_regime",
    "mann_whitney_u",
    "approx_percentile_regime",
    "l_diversity_audit",
    "pii_luhn_audit",
    "domain_blocklist_audit",
    "rolling_median_7d",
    "group_split_leakage_audit",
    "mixture_epoch_plan",
    "corpus_profile",
    "ann_ivf_fullprobe_topk",
    "ann_ivf_distributed_topk",
    "ann_lsh_fullcover_topk",
    "cms_exact_regime",
    "bloom_exact_regime",
    "dsir_importance_weights",
    "ngram_novelty_scores",
    "max_dup_gram_bracket",
    "skewed_agg_salted",
    # round-5 continuation: SFT / data-loading pipeline family (never gated)
    "chat_template_render_stats",
    "warc_ingest_stats",
    "epoch_shuffle_plan",
    "tokenizer_fertility_by_lang",
    "rlhf_preference_pair_stats",
    "stupid_backoff_trigram_score",
    "quality_threshold_sweep",
    "hard_negative_mining",
    "xml_feed_parse_stats",
    "dp_noise_histogram",
    # round-5 continuation: decorrelated-subquery join patterns (TPC-H
    # Q2/Q17/Q11 shapes — never gated)
    "min_cost_supplier",
    "correlated_avg_filter",
    "having_global_share",
    # round-5 continuation: time-series diagnostics (never gated)
    "acf_lag_profile",
    "weekday_seasonality_index",
    # round-5 continuation: training-pipeline batch (never gated)
    "span_corruption_plan",
    "toolcall_trace_audit",
    "bitext_length_ratio_filter",
    "curriculum_schedule_plan",
    "mojibake_audit",
    "snapshot_retention_plan",
    "encoding_dictionary_plan",
    "audio_energy_segments",
    "watermark_lag_histogram",
    "chunk_boundary_overlap",
    # rows-only by design (xxhash64 Bloom positions): records its one-time
    # weaker evidence tier, then never_gated() rotates it out
    "bloom_cross_dedup",
    # ---- 50-slot head boundary ----
    # round-6 gate backlog: added after this round's head filled — all
    # oracle-backed, audit-battery-verified, never gated. Round 6 MUST
    # front-load these (never_gated() will list them).
    "minhash_lcg_lsh_pairs",
    "score_calibration_bins",
    "partition_pruning_plan",
    "packing_context_sweep",
    "unigram_sampling_table",
    "recency_weighting_plan",
    "skyline_2d",
    "cdc_chunk_dedup",
    "bfs_hop_histogram",
    "image_luminance_histogram",
    "maxsim_late_interaction_topk",
    "matryoshka_truncation_recall",
    "texttiling_boundaries",
    "prefix_sharing_stats",
    "spearman_quality_length",
    "multiset_except_all",
    "multiset_intersect_all",
    "simhash_lcg_candidates",
    "oph_lcg_lsh_pairs",
    "kmeans_assign_fixed_centroids",
    # re-verification backlog: hash-passed in round 1 only — refresh their
    # records (oldest-first, then alphabetical; computed from
    # CORRECTNESS_r*.json)
    "ann_cosine_topk",
    "anti_join_missing",
    "bounding_box",
    "conditional_counts",
    "containment_near_dup",
    "count_parity",
    "cross_source_overlap",
    "dedup_cluster_assign",
    "dedup_first_wins",
    "distinct_count",
    "doc_quality_filter",
    "doc_quality_scores",
    "embedding_near_dup_exact",
    "embedding_norm_stats",
    "embedding_quantize_error",
    "enum_membership",
    "filter_compound",
    "filter_disjunctive",
    "first_per_group",
    "global_max",
    "jaccard_prefix_filtered",
    "join_field_compare",
    "join_multiway",
    "lang_id_distribution",
    "minhash_dedup_verified",
    "ngram_jaccard_pairs",
    "null_presence",
    "semi_join",
    "set_except",
    "set_intersect",
    "top_groups",
    "top_unshipped",
    "union_by_name",
    # re-verification continued: round-2 vintage
    "asof_join",
    "bigram_lm_score",
    "binary_payload_stats",
    "bm25_keyword_search",
    "bpe_token_budget",
    "cdc_upsert_merge",
    "corpus_after_dedup",
    "cube_counts",
    "curation_funnel",
    "decontaminate_benchmark",
    "doc_chunking",
    "doc_fingerprint_dedup",
]


def never_gated() -> list[str]:
    """Registry queries with no PASSING driver-gate record in any
    CORRECTNESS_r*.json.

    The external gate samples only the first 50 of queries(), so coverage
    accumulates across rounds by rotating this set into PRIORITY. Explicit
    tracking (vs re-deriving by hand) keeps the rotation convergent —
    convergent on PASSES, not attempts: a record whose hash mismatched or
    errored does not count as gated, so a broken query rotates back into
    the head until it actually proves out. Rows-only-by-design queries
    (err == "no_oracle") count as gated by their weaker rows check.
    """
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    gated: set[str] = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                records = json.load(f)
        except Exception:
            continue
        if isinstance(records, list):  # older plain-list-of-names shape
            gated.update(records)
            continue
        if not isinstance(records, dict):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                gated.add(name)  # unknown record shape: assume gated
            elif rec.get("hash_match") is True or rec.get("err") == "no_oracle":
                gated.add(name)
    return [n for n in queries() if n not in gated]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the TPC-H-Q1-style pricing summary at sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _q.REGISTRY["pricing_summary"].runner(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = [n for n in PRIORITY if n in _q.REGISTRY]
    ordered += [n for n in _q.REGISTRY if n not in set(ordered)]
    return {name: _q.REGISTRY[name].runner for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in _q.REGISTRY.items() if qd.oracle is not None
    }
