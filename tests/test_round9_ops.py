"""Round-9 operators: in-engine quality-classifier training
(quality_model_train), checked against an INDEPENDENT pure-Python
re-implementation of the exact integer gradient-descent fold over
hand-derived feature values.

The fixture texts reuse the round-8 corpus (tests/test_round8_ops.py)
whose token/char/stopword counts are hand-derivable; every feature value
below is computed by hand in the comments, not by running engine code.
"""

from __future__ import annotations

from storm_data_etl_spark.plans import retrieval_queries as RQ
from storm_data_etl_spark.plans import queries as REG

#: See tests/test_round8_ops.py for the band math of these texts.
T_HIGH = "the quick brown fox jumps over the lazy dog " * 5
T_LOW = "!!!"
T_MIX = "the fox runs far away " * 4

#: Hand-derived boundary-anchored features (x1..x4, y) — the arithmetic
#: is spelled out per text; any engine change that shifts a feature
#: definition breaks these rows first.
#
# T_HIGH: 45 tokens (9 per rep x 5), 8 unique, 'the' x10 stopwords,
#         220 chars, 0 punct, quality 1.0 -> y=1.
#   x1 = min((10*10000)//45, 2000) - 500 = 2000 - 500        = 1500
#   x2 = min(220, 400)*50 - 10000 = 11000 - 10000            = 1000
#   x3 = (8*10000)//45 - 5000 = 1777 - 5000                  = -3223
#   x4 = (0*10000)//220 - 2000                               = -2000
# T_LOW: 1 token '!!!', 1 unique, 0 stopwords, 3 chars, 3 punct,
#        quality 0.325 -> y=0.
#   x1 = min((0*10000)//1, 2000) - 500                       = -500
#   x2 = min(3, 400)*50 - 10000 = 150 - 10000                = -9850
#   x3 = (1*10000)//1 - 5000                                 = 5000
#   x4 = (3*10000)//3 - 2000 = 10000 - 2000                  = 8000
# T_MIX: 20 tokens (5 x 4), 5 unique, 'the' x4 stopwords, 88 chars,
#        0 punct, quality 0.85 -> y=0.
#   x1 = min((4*10000)//20, 2000) - 500 = 2000 - 500         = 1500
#   x2 = min(88, 400)*50 - 10000 = 4400 - 10000              = -5600
#   x3 = (5*10000)//20 - 5000 = 2500 - 5000                  = -2500
#   x4 = (0*10000)//88 - 2000                                = -2000
HAND_FEATURES = {
    T_HIGH: (1500, 1000, -3223, -2000, 1),
    T_LOW: (-500, -9850, 5000, 8000, 0),
    T_MIX: (1500, -5600, -2500, -2000, 0),
}


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _tdiv(a: int, b: int) -> int:
    """Sign-split truncating division — the identity both engines use."""
    assert b > 0
    return a // b if a >= 0 else -((-a) // b)


def _train_reference(rows, lr=RQ._QMT_LR, epochs=RQ._QMT_EPOCHS):
    """Independent pure-Python fold of the exact integer GD the query
    specifies: e4 features, e6 weights, Elliott rational sigmoid."""
    w = [0] * 5
    n = len(rows)
    for _ in range(epochs):
        g = [0] * 5
        for (x1, x2, x3, x4, y) in rows:
            xs = (10000, x1, x2, x3, x4)
            z10 = sum(wj * xj for wj, xj in zip(w, xs))
            z6 = _tdiv(z10, 10000)
            p6 = 500000 + _tdiv(z6 * 1000000, 2 * (1000000 + abs(z6)))
            err = p6 - y * 1000000
            for j, xj in enumerate(xs):
                g[j] += err * xj
        w = [wj - _tdiv(lr * gj, max(n, 1) * 10000) for wj, gj in zip(w, g)]
    n_correct = 0
    for (x1, x2, x3, x4, y) in rows:
        xs = (10000, x1, x2, x3, x4)
        z10 = sum(wj * xj for wj, xj in zip(w, xs))
        z6 = _tdiv(z10, 10000)
        p6 = 500000 + _tdiv(z6 * 1000000, 2 * (1000000 + abs(z6)))
        n_correct += int((p6 >= 500000) == (y == 1))
    return w, n_correct


def test_quality_model_train_hand_computed(spark, tmp_path):
    """Trained weights over the 3-text fixture equal the independent
    integer-GD fold over the hand-derived feature rows."""
    texts = [T_HIGH, T_LOW, T_MIX, T_HIGH, T_LOW]
    sf = _write_docs(
        spark,
        tmp_path,
        [(i + 1, t, "en", "s1", len(t)) for i, t in enumerate(texts)],
    )
    out = {
        r.feature: r
        for r in REG.REGISTRY["quality_model_train"].runner(spark, sf).collect()
    }
    assert set(out) == set(RQ._QMT_FEATURES)
    rows = [HAND_FEATURES[t] for t in texts]
    w_exp, acc_exp = _train_reference(rows)
    got = [out[f].weight_e6 for f in RQ._QMT_FEATURES]
    assert got == w_exp, f"weights {got} != reference fold {w_exp}"
    any_row = out["bias"]
    assert any_row.n_train == 5
    assert any_row.n_pos == 2  # the two T_HIGH copies
    assert any_row.n_correct == acc_exp
    # training moved off the all-zero initialization
    assert any(w != 0 for w in got)


def test_quality_model_train_empty_input(spark, tmp_path):
    """Empty corpus: weights stay at the zero init (greatest(n,1) guard),
    counts all zero — 5 deterministic rows, no division-by-zero error."""
    sf = _write_docs(spark, tmp_path, [])
    rows = REG.REGISTRY["quality_model_train"].runner(spark, sf).collect()
    assert len(rows) == 5
    for r in rows:
        assert (r.weight_e6, r.n_train, r.n_pos, r.n_correct) == (0, 0, 0, 0)


def test_trained_coefficients_feed_scorer(spark, tmp_path):
    """The trained vector is consumable by the scorer plan shape
    (VERDICT r8 task 5 'coefficients feeding the existing scorer'):
    re-running the forward pass as a quality_model_score-style inference
    select with the trained weights reproduces the query's own
    n_correct — proving the coefficients round-trip into inference."""
    from pyspark.sql import functions as F
    from storm_data_etl_spark.functions import text as X
    from storm_data_etl_spark.plans.tables import t

    texts = [T_HIGH, T_LOW, T_MIX] * 3
    sf = _write_docs(
        spark,
        tmp_path,
        [(i + 1, tx, "en", "s1", len(tx)) for i, tx in enumerate(texts)],
    )
    out = {
        r.feature: r.weight_e6
        for r in REG.REGISTRY["quality_model_train"].runner(spark, sf).collect()
    }
    w = [out[f] for f in RQ._QMT_FEATURES]

    docs = t(spark, sf, "documents")
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    counts = docs.select(
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.size(
            F.filter(toks, lambda x: x.isin("a", "the", "of", "and", "to"))
        ).alias("n_stop"),
        F.length("text").alias("n_chars"),
        F.regexp_count("text", F.lit(r"[^a-zA-Z0-9_\s]")).alias("n_punct"),
        (F.floor(X.quality_score("text") * 10000 + 0.5) >= 9000)
        .cast("int")
        .alias("y"),
    )
    # scorer-style inference: one codegen select dotting the trained
    # weights (broadcast constants) with the same anchored features.
    inf = counts.selectExpr(
        "y",
        "least(CASE WHEN n_words > 0 THEN (n_stop * 10000) div n_words"
        "           ELSE 0 END, 2000) - 500 AS x1",
        "least(n_chars, 400) * 50 - 10000 AS x2",
        "CASE WHEN n_words > 0 THEN (n_uniq * 10000) div n_words"
        "     ELSE 0 END - 5000 AS x3",
        "CASE WHEN n_chars > 0 THEN (n_punct * 10000) div n_chars"
        "     ELSE 0 END - 2000 AS x4",
    ).selectExpr(
        "y",
        f"CAST({w[0]} AS DECIMAL(38,0)) * 10000"
        f" + CAST({w[1]} AS DECIMAL(38,0)) * x1"
        f" + CAST({w[2]} AS DECIMAL(38,0)) * x2"
        f" + CAST({w[3]} AS DECIMAL(38,0)) * x3"
        f" + CAST({w[4]} AS DECIMAL(38,0)) * x4 AS z10",
    )
    pred = inf.selectExpr(
        "y",
        "CASE WHEN z10 >= 0 THEN z10 div 10000"
        "     ELSE -((-z10) div 10000) END AS z6",
    ).selectExpr(
        "y",
        "CASE WHEN 500000 + (CASE WHEN z6 >= 0"
        "     THEN (z6 * 1000000) div (2 * (1000000 + z6))"
        "     ELSE -(((-z6) * 1000000) div (2 * (1000000 - z6))) END)"
        "     >= 500000 THEN 1 ELSE 0 END AS keep",
    )
    n_correct = pred.filter("keep = CAST(y AS INT)").count()
    q_row = REG.REGISTRY["quality_model_train"].runner(spark, sf).collect()[0]
    assert q_row.n_correct == n_correct
