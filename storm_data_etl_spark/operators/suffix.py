"""Distributed suffix array via prefix doubling, and the exact
longest-repeated-substring readout built on it.

The reference repo has no text-indexing surface; this is the extension
tier's capstone (flagged "worth doing" in docs/LIMITS.md since round 4):
`substring_dup_spans` proves duplicated FIXED-length grams and
`max_dup_gram_bracket` brackets the longest duplicated span between
doubling gram lengths — the suffix array sharpens that to the EXACT
length, the Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better", §4.1 ExactSubstr) primitive.

Algorithm (Manber & Myers 1990 prefix doubling, the classic
sort-based distributed formulation):

  rank_0(pos)  = code point of the character at pos (UTF-8 byte order ==
                 code-point order, so this matches binary string sort)
  rank_{k+1}   = dense rank of the pair (rank_k(pos), rank_k(pos + 2^k))
                 with -1 for positions past the suffix's end (a shorter
                 suffix that is a prefix of a longer one sorts FIRST,
                 the standard convention both engines' string sort uses)

After ceil(log2(max suffix length)) rounds, rank orders every suffix by
its full text. Each round is: one self-equi-join on (doc, pos+2^k) + one
dense rank of the distinct pairs. The dense rank is the TWO-PHASE
global_rank (range partition → local row_number → broadcast offsets) on
the distinct-pair table — no single-task windows anywhere, which is the
entire point of building this on Spark: the textbook construction is a
sequence of sorts, and sorts are what a cluster does well.

Suffixes never cross document boundaries (they are suffixes of each doc,
compared globally), so repeats are found both within and across
documents.

LCP of ADJACENT suffixes in the array (whose max is the longest repeated
substring) is computed by chunked comparison: 128-character slices are
compared with a codegen fold, survivors (full-chunk matches) loop for
another chunk. Rounds are bounded by maxLCP/128; a guard raises rather
than looping silently past the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from storm_data_etl_spark.operators.dedup import global_rank

#: characters compared per LCP round (fold size; bounds per-row work)
_LCP_CHUNK = 128


def _common_prefix_len(a: str, b: str, chunk: int = _LCP_CHUNK):
    """Codegen fold: length of the common prefix of two <= chunk-char
    strings. The accumulator only advances while contiguous from 1."""
    return F.expr(
        f"aggregate(sequence(1, {chunk}), 0, (acc, i) -> "
        f"IF(acc = i - 1 AND i <= least(length({a}), length({b})) "
        f"AND substr({a}, i, 1) = substr({b}, i, 1), i, acc))"
    )


def suffix_array(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Global suffix array of every document's every suffix.

    Returns (doc_id, pos, sa_rank): sa_rank is the 1-based position of
    the suffix docs[text][pos:] in the sorted order of ALL suffixes
    (ties between byte-identical suffixes broken by (doc_id, pos), so
    the order is total and deterministic).

    Costs ceil(log2(max doc length)) rounds of (equi-join + two-phase
    dense rank); each round's rank table is localCheckpoint'ed (lineage
    cut — see the in-loop comment), so peak storage is two
    (doc, pos, rank) tables and the logical plan stays round-sized.
    """
    spark = docs.sparkSession
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).filter(F.length("text") > 0)
    maxlen = d.agg(F.max(F.length("text"))).collect()[0][0] or 0
    if maxlen == 0:
        return spark.createDataFrame([], "doc_id long, pos int, sa_rank long")

    # Seed rank_0 from 16-char slices instead of single characters: the
    # dense rank of substr(text, pos, 16) orders suffixes by their first
    # 16 chars with the exact suffix tie semantics (binary string sort
    # puts a shorter slice that is a prefix of a longer one first), and
    # skips the first four doubling rounds. In practice most suffixes are
    # already unique at 16 chars, so the loop early-exits after one or
    # two rounds on natural text.
    seed_w = 16
    pos = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
        "text",
    ).select(
        "doc_id",
        "pos",
        F.expr(f"substr(text, pos, {seed_w})").alias("_slice"),
    )
    seed = global_rank(
        pos.select("_slice").distinct(), ["_slice"]
    ).select("_slice", F.col("rnk").alias("_seed_rnk"))
    pos = pos.join(seed, "_slice").select(
        "doc_id", "pos", F.col("_seed_rnk").alias("rnk")
    )
    # localCheckpoint (not persist): each doubling round roughly doubles
    # the logical plan; after ~10 rounds an uncut lineage OOMs the driver
    # just STRINGIFYING the tree (observed via CachedRDDBuilder.cachedName
    # during persist). Checkpointing truncates lineage every round — the
    # pagerank/graph discipline.
    rank = pos.localCheckpoint(eager=True)
    n_pos = rank.count()

    w = seed_w
    while w < maxlen:
        right = rank.select(
            F.col("doc_id").alias("r_doc"),
            (F.col("pos") - F.lit(w)).alias("r_pos"),
            F.col("rnk").alias("r2"),
        )
        paired = rank.join(
            right,
            (F.col("doc_id") == F.col("r_doc")) & (F.col("pos") == F.col("r_pos")),
            "left",
        ).select(
            "doc_id", "pos", F.col("rnk").alias("r1"),
            F.coalesce("r2", F.lit(-1)).alias("r2"),
        )
        distinct_pairs = paired.select("r1", "r2").distinct()
        dense = global_rank(distinct_pairs, ["r1", "r2"]).select(
            "r1", "r2", F.col("rnk").alias("new_rnk")
        )
        new_rank = paired.join(dense, ["r1", "r2"]).select(
            "doc_id", "pos", F.col("new_rnk").alias("rnk")
        ).localCheckpoint(eager=True)
        n_distinct = new_rank.agg(F.max("rnk")).collect()[0][0]
        rank = new_rank
        w *= 2
        if n_distinct == n_pos:
            break  # every suffix already uniquely ranked

    # Total order: identical suffixes tie on rnk; break by (doc_id, pos).
    return global_rank(rank, ["rnk", "doc_id", "pos"]).select(
        "doc_id", "pos", F.col("rnk").alias("sa_rank")
    )


def adjacent_lcp(sa: DataFrame, docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", max_rounds: int = 64) -> DataFrame:
    """LCP between each adjacent suffix pair in suffix-array order.

    Returns (doc_a, pos_a, doc_b, pos_b, lcp) for sa_rank r vs r+1.
    Chunked comparison: survivors of a full-chunk match loop for the next
    128 characters; raises past max_rounds (LCP > 128*max_rounds means
    the corpus needs a bigger chunk budget — loud, never silent)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    a = sa.select(
        F.col("sa_rank").alias("r"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = sa.select(
        (F.col("sa_rank") - 1).alias("r"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    pairs = a.join(b, "r").select("doc_a", "pos_a", "doc_b", "pos_b")

    done = None
    active = pairs.withColumn("lcp", F.lit(0))
    for _ in range(max_rounds):
        slices = (
            active.join(
                d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta")),
                "doc_a",
            )
            .join(
                d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb")),
                "doc_b",
            )
            .select(
                "doc_a", "pos_a", "doc_b", "pos_b", "lcp",
                F.expr(f"substr(_ta, pos_a + lcp, {_LCP_CHUNK})").alias("_sa"),
                F.expr(f"substr(_tb, pos_b + lcp, {_LCP_CHUNK})").alias("_sb"),
            )
            .withColumn("_m", _common_prefix_len("_sa", "_sb"))
        )
        stepped = slices.select(
            "doc_a", "pos_a", "doc_b", "pos_b",
            (F.col("lcp") + F.col("_m")).alias("lcp"),
            (
                (F.col("_m") == _LCP_CHUNK)
                & (F.length("_sa") == _LCP_CHUNK)
                & (F.length("_sb") == _LCP_CHUNK)
            ).alias("_again"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        finished = stepped.filter(~F.col("_again")).drop("_again")
        done = finished if done is None else done.unionByName(finished)
        active = stepped.filter(F.col("_again")).drop("_again")
        if active.isEmpty():
            return done
    raise RuntimeError(
        f"adjacent_lcp: LCP exceeds {_LCP_CHUNK * max_rounds} chars; "
        "raise max_rounds for this corpus"
    )
