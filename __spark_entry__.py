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
#: set explicitly from the CORRECTNESS_r*.json records). Rounds 1-5
#: hash-proved 243 oracle-backed queries and recorded the 14
#: rows-only-by-design entries' weaker evidence tier once each. The
#: round-6 head is: the 20 round-5 tail additions that missed the
#: round-5 gate window (all pre-verified by the gate replica
#: tools/pandas_parity_check.py at sf0.01 — and independently re-run by
#: the round-5 judge, all match), then any queries added during round 6,
#: then round-1-vintage re-verifications to refresh the oldest gate
#: evidence (the driver samples the first 50; VERDICT r5 item 6 asks for
#: ≥10 round-1 refreshes this round). The rest of the re-verification
#: backlog (round-1 then round-2 vintage) follows beyond the head so
#: evidence keeps rotating in later rounds.
PRIORITY = [
    # round-5 tail additions — never gated; locally parity-verified and
    # judge-re-verified at sf0.01 (VERDICT r5 "What's missing" item 2)
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
    # ---- round-6 additions (never-gated block stays contiguous at the
    # front; fillers below shift past the 50 boundary automatically) ----
    "bloom_cross_exact_regime",
    "semdedup_prune",
    "misra_gries_heavy_hitters",
    "kneser_ney_bigram_score",
    "embedding_dim_profile",
    "embedding_anisotropy",
    "deletion_vector_read_stats",
    "time_travel_read",
    "kruskal_wallis_h",
    "pass_at_k_estimates",
    "conformal_threshold",
    "ips_policy_value",
    "anova_oneway_f",
    "poisson_bootstrap_means",
    "vocab_growth_stats",
    "moe_router_load_balance",
    "suffix_longest_repeat",
    "suffix_lcp_histogram",
    "dup_aware_loss_weights",
    "lsh_s_curve",
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
