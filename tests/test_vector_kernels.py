"""Bit-identity pins for operators/vector_kernels (optimization round 12).

The kernels claim BITWISE equality with the JVM higher-order-function
expressions they replace (V.dot / V.norm / V.cosine / _pq_codes). These
tests prove it two ways: against a pure-Python strict left fold on
adversarial float data, and end-to-end against the live JVM expressions on
a Spark session.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from storm_data_etl_spark.functions import vectors as V
from storm_data_etl_spark.operators import vector_kernels as K


def _py_fold(vals) -> float:
    acc = 0.0
    for v in vals:
        acc = acc + v
    return acc


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260817)


def test_seq_fold_sum_bitwise_vs_python_fold(rng):
    # Adversarial magnitudes: pairwise summation (np.sum) rounds these
    # differently from the strict fold; the kernel must match the FOLD.
    for _ in range(50):
        vals = (rng.standard_normal(64) * 10.0 ** rng.integers(-12, 12, 64)).astype(
            np.float64
        )
        got = K.seq_fold_sum(vals.reshape(1, -1))[0]
        want = _py_fold(vals)
        assert _bits(got) == _bits(want)
        # sanity: the naive np.sum genuinely differs on some draws, so the
        # assertion above is not vacuous (checked in aggregate below).


def test_seq_fold_differs_from_pairwise_on_some_input(rng):
    diffs = 0
    for _ in range(200):
        vals = (rng.standard_normal(64) * 10.0 ** rng.integers(-12, 12, 64)).astype(
            np.float64
        )
        if _bits(K.seq_fold_sum(vals.reshape(1, -1))[0]) != _bits(float(np.sum(vals))):
            diffs += 1
    assert diffs > 0  # the fold-vs-pairwise distinction is real on this data


def test_signed_zero_first_step(rng):
    # F.aggregate starts at +0.0: a leading -0.0 product must yield +0.0.
    vals = np.array([-0.0, -0.0, -0.0], dtype=np.float64)
    got = K.seq_fold_sum(vals.reshape(1, -1))[0]
    assert math.copysign(1.0, got) == 1.0


def test_cosine_block_bitwise_vs_jvm(spark, rng):
    a32 = (rng.standard_normal((40, 16)) * 3).astype(np.float32)
    b32 = (rng.standard_normal((30, 16)) * 3).astype(np.float32)
    b32[7] = 0.0  # zero-norm row -> NULL in JVM, masked in kernel
    rows_a = [(i, [float(v) for v in a32[i]]) for i in range(a32.shape[0])]
    rows_b = [(j, [float(v) for v in b32[j]]) for j in range(b32.shape[0])]
    dfa = spark.createDataFrame(rows_a, "ia int, va array<float>")
    dfb = spark.createDataFrame(rows_b, "ib int, vb array<float>")
    jvm = {
        (r.ia, r.ib): r.c
        for r in dfa.crossJoin(dfb)
        .select("ia", "ib", V.cosine("va", "vb").alias("c"))
        .collect()
    }
    a64 = a32.astype(np.float64)
    b64 = b32.astype(np.float64)
    na, nb = K.fold_norms(a64), K.fold_norms(b64)
    cos = K.cosine_block(a64, na, b64, nb)
    for i in range(a32.shape[0]):
        for j in range(b32.shape[0]):
            want = jvm[(i, j)]
            if nb[j] == 0.0 or na[i] == 0.0:
                assert want is None
            else:
                assert _bits(cos[i, j]) == _bits(want), (i, j)


def test_pq_encode_block_bitwise_vs_jvm(spark, rng):
    # Compare against the ORIGINAL JVM HOF expression (_pq_codes over the
    # unit-normalized vector), which the Arrow kernel replaced in
    # _encode_pq — the bit-identity claim is kernel == JVM expressions.
    from storm_data_etl_spark.operators.similarity import _pq_codes

    dim, m, k = 16, 4, 5
    books = [
        [[float(v) for v in rng.standard_normal(dim // m)] for _ in range(k)]
        for _ in range(m)
    ]
    x32 = (rng.standard_normal((50, dim)) * 2).astype(np.float32)
    x32[3] = 0.0  # zero norm -> norm treated as 1.0 in both paths
    rows = [(i, [float(v) for v in x32[i]]) for i in range(x32.shape[0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    nrm = V.norm("embedding")
    df2 = df.withColumn(
        "_nrm", F.when(nrm == 0.0, F.lit(1.0)).otherwise(nrm)
    )
    unit = F.transform(F.col("embedding"), lambda x: x / F.col("_nrm"))
    jvm = {
        r.vec_id: list(r._codes)
        for r in df2.withColumn("_codes", _pq_codes(unit, books))
        .select("vec_id", "_codes")
        .collect()
    }
    codes, _unit = K.pq_encode_block(
        x32.astype(np.float64), np.asarray(books, dtype=np.float64)
    )
    for i in range(x32.shape[0]):
        assert list(codes[i]) == jvm[i], i


def test_encode_pq_and_assign_cell_match_jvm_expressions(spark, rng):
    # The live _encode_pq (+fused cell) and _assign_cell kernels against
    # the original _nearest_cells JVM expression and the _pq_codes test
    # above, on one DataFrame end to end.
    from storm_data_etl_spark.operators.similarity import (
        _assign_cell,
        _encode_pq,
        _nearest_cells,
    )

    dim, m, k = 16, 4, 5
    books = [
        [[float(v) for v in rng.standard_normal(dim // m)] for _ in range(k)]
        for _ in range(m)
    ]
    cents = [[float(v) for v in rng.standard_normal(dim)] for _ in range(6)]
    x32 = (rng.standard_normal((40, dim)) * 2).astype(np.float32)
    rows = [(i, [float(v) for v in x32[i]]) for i in range(x32.shape[0])]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    jvm_cell = {
        r.vec_id: r.cell
        for r in df.withColumn(
            "cell", _nearest_cells("embedding", cents, 1)[0]["cell"]
        ).collect()
    }
    got_cell = {r.vec_id: r.cell for r in _assign_cell(df, cents, "embedding").collect()}
    assert got_cell == jvm_cell
    fused = {
        r.vec_id: (list(r._codes), r.cell)
        for r in _encode_pq(df, books, "embedding", centroids=cents).collect()
    }
    for i, (codes, cell) in fused.items():
        assert cell == jvm_cell[i]
        assert len(codes) == m
