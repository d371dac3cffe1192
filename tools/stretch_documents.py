"""Suffix-family scale stretch: replicate the sf0.1 documents table N×
into /tmp/spark-graft-stretch/N{n}/documents.parquet, with each replica's
text passed through a PER-REPLICA ALPHABET ROTATION (a bijective char map
over [a-z] and [A-Z], digits/punct unchanged).

Why a bijection instead of scale_probe.py's raw replication: ExactSubstr
works at the substring level, so unperturbed replicas make EVERY document
fully duplicated (N identical worlds) — the cut set degenerates to
"delete all but the first world", which measures an output regime no real
corpus has. A per-replica alphabet rotation preserves each replica's
INTERNAL duplicate structure exactly (the suffix array does identical
work per replica) while making cross-replica text share no letter
substrings — so duplicate density stays constant as the corpus grows,
which is the honest way to grow a dedup workload (VERDICT r8 task 2).

Residual caveat: substrings of >= min_len chars containing NO letters
(long digit/space runs) can still match across replicas; in this corpus
they are negligible.

Usage: python tools/stretch_documents.py [N ...]   (default: 3 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storm_data_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT_ROOT = "/tmp/spark-graft-stretch"


def rotate_expr(col, r: int):
    """translate() through the alphabet rotated by r — bijective, JVM-side."""
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    rot = lo[r % 26 :] + lo[: r % 26]
    return F.translate(col, lo + up, rot + rot.upper())


def build(spark, n: int) -> str:
    out = f"{OUT_ROOT}/N{n}"
    dest = f"{out}/documents.parquet"
    if os.path.exists(dest):
        return out
    base = spark.read.parquet(SRC)
    n_docs = base.count()
    parts = []
    for r in range(n):
        parts.append(
            base.select(
                (F.col("doc_id") + r * n_docs * 10).alias("doc_id"),
                rotate_expr(F.col("text"), r).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(32).write.mode("overwrite").parquet(dest)
    return out


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [3, 10]
    spark = get_spark("stretch", master="local[32]")
    for n in ns:
        out = build(spark, n)
        rows = spark.read.parquet(f"{out}/documents.parquet").count()
        print(f"built {out}: {rows} docs")


if __name__ == "__main__":
    main()
