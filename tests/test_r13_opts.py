"""Round-13 optimization regression tests.

dup_aware_loss_weights: the r12 window rewrite must keep the oracle's
USING (fingerprint) join semantics — documents with NULL text (hence NULL
fingerprint) never match the join and must not be counted. ADVICE r12
reproduced the divergence on the null-injected dataset; this pins the fix.
"""

from __future__ import annotations

from pyspark.sql import Row

from storm_data_etl_spark.plans import ml_queries as ML


def test_dup_aware_loss_weights_drops_null_text(spark, tmp_path):
    rows = [
        Row(doc_id=1, lang="en", source="a", text="same text", n_chars=9),
        Row(doc_id=2, lang="en", source="a", text="same text", n_chars=9),
        # NULL text → NULL fingerprint → excluded (oracle join semantics)
        Row(doc_id=3, lang="en", source="a", text=None, n_chars=0),
        Row(doc_id=4, lang="en", source="b", text=None, n_chars=0),
        Row(doc_id=5, lang="en", source="b", text="unique", n_chars=6),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in ML.dup_aware_loss_weights(spark, str(tmp_path)).collect()
    }
    # source a: the two duplicate docs only — the NULL-text doc is dropped,
    # so n_docs is 2 (not 3) and there is no singleton NULL group.
    assert out["a"]["n_docs"] == 2
    assert out["a"]["n_singletons"] == 0
    assert out["a"]["max_dup_count"] == 2
    assert out["a"]["effective_mass_e6"] == 2 * (1_000_000 // 2)
    # source b: only the non-null doc survives.
    assert out["b"]["n_docs"] == 1
    assert out["b"]["n_singletons"] == 1
    assert out["b"]["max_dup_count"] == 1
    assert out["b"]["effective_mass_e6"] == 1_000_000
