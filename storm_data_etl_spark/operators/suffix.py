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
from storm_data_etl_spark.session import pin as _pin

#: characters compared per LCP round (fold size; bounds per-row work)
_LCP_CHUNK = 128

#: Corpus size (total char / token positions) above which the corpus-
#: derived joins are forced to SortMergeJoin. Below it, AQE's choice
#: (broadcast at test scale) is both safe and ~40% faster (the blanket
#: hints cost +43% at sf0.01 — VERDICT r9 task 3); above it, the N30
#: stretch probe showed AQE broadcasting a corpus-sized,
#: checkpoint-descended (stats-less) join side and OOMing at 44.7M chars.
#: 4M positions ≈ a >100 MB (doc, pos, rank) table — far past any sane
#: broadcast, with ~10× margin below the observed failure point. The
#: fixtures sit at 0.15M (sf0.01) / 1.5M (sf0.1); the stretch probes at
#: 4.5M (N3) / 44.7M (N30).
_MERGE_HINT_MIN_POSITIONS = 4_000_000


def _mh(df: DataFrame, big: bool) -> DataFrame:
    """Merge-hint a corpus-derived join side only at big-corpus scale."""
    return df.hint("merge") if big else df


def _is_big_corpus(d: DataFrame, size_col) -> bool:
    """One cheap aggregate deciding the hint regime for a build. Runs
    once per index build (these are log(L)-sort jobs; a sum scan is
    noise) so both engines of the same build share one decision."""
    total = d.agg(F.sum(size_col)).collect()[0][0] or 0
    return int(total) >= _MERGE_HINT_MIN_POSITIONS


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
    maxlen, total = d.agg(
        F.max(F.length("text")), F.sum(F.length("text"))
    ).collect()[0]
    maxlen = maxlen or 0
    big = int(total or 0) >= _MERGE_HINT_MIN_POSITIONS
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
    pos = pos.join(_mh(seed, big), "_slice").select(
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
            _mh(right, big),
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
        new_rank = paired.join(_mh(dense, big), ["r1", "r2"]).select(
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


def exact_substr_cut(
    docs: DataFrame,
    min_len: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr span-removal dedup (Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" §4.1) — the production
    transform the suffix array exists to power: every duplicated span of
    length >= min_len is removed from the corpus EXCEPT its first
    occurrence (global (doc_id, pos) order per duplicate class).

    Precise semantics (deterministic, oracle-expressible):
      - position p in doc d is a DUPLICATE-START if the min_len-gram at p
        occurs >= 2 times corpus-wide AND (d, p) is not the first
        occurrence of that gram (first = min (doc_id, pos));
      - the cut set of a doc is the union of [p, p+min_len-1] over its
        duplicate-starts; covering a span of any length M >= min_len this
        way cuts exactly the union of its non-first copies, because every
        min_len-window inside a duplicated M-span is itself duplicated;
      - output rows are the docs with a non-empty cut set: the text with
        cut characters removed, plus audit counts.

    Returns (doc_id, orig_len, deduped_len, n_cut_chars, deduped_text).

    Scale shape: duplicate detection rides the suffix array — a suffix's
    longest repeated prefix is max(LCP with its two suffix-order
    neighbors), so "gram at p duplicated" == "adjacent LCP >= min_len"
    WITHOUT materializing the corpus's grams (the naive gram groupBy
    shuffles corpus_bytes x min_len; the SA path shuffles (doc,pos,rank)
    triples). Grams are extracted only for the duplicated subset (to
    identify classes and keep the first copy) — on natural corpora a
    small fraction. Interval merge and segment reassembly are per-doc
    keyed windows + one keyed aggregate; per-doc state is bounded by the
    doc's own cut count (<= doc length)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).filter(F.length("text") > 0)
    big = _is_big_corpus(d, F.length("text"))
    dup_pos = _dup_positions(d, min_len, big=big)
    return _cut_from_dup_positions(d, dup_pos, min_len, big=big)


def _dup_positions(d: DataFrame, min_len: int, big: bool | None = None) -> DataFrame:
    """(doc_id, pos) of every position whose min_len-gram occurs >= 2
    times in d, via the suffix array: a suffix's L-prefix occurs
    elsewhere iff an adjacent suffix-order neighbor shares >= L chars."""
    if big is None:
        big = _is_big_corpus(d, F.length("text"))
    sa = suffix_array(d)
    lcp = adjacent_lcp(sa, d, big=big)
    hits = lcp.filter(F.col("lcp") >= min_len)
    return (
        hits.select(F.col("doc_a").alias("doc_id"), F.col("pos_a").alias("pos"))
        .unionByName(
            hits.select(F.col("doc_b").alias("doc_id"), F.col("pos_b").alias("pos"))
        )
        .distinct()
    )


def _cut_from_dup_positions(
    d: DataFrame, dup_pos: DataFrame, min_len: int, big: bool = False
) -> DataFrame:
    """Keep-first + interval algebra + rebuild, given the duplicated
    positions (shared by the global and sharded detection paths)."""
    # Keep-first per gram class: extract the gram text only for the
    # duplicated subset, rank occurrences by (doc_id, pos).
    from pyspark.sql import Window

    grams = _mh(dup_pos, big).join(d, "doc_id").select(
        "doc_id", "pos", F.expr(f"substr(text, pos, {min_len})").alias("g")
    )
    occ_w = Window.partitionBy("g").orderBy("doc_id", "pos")
    cuts = (
        grams.withColumn("occ", F.row_number().over(occ_w))
        .filter(F.col("occ") >= 2)
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + F.lit(min_len - 1)).alias("e"),
        )
    )

    # Merge overlapping/adjacent cut intervals per doc (gaps-and-islands:
    # new island iff s > running max(e) + 1; first row's NULL running max
    # coalesces to 0 so s=1 starts island 0 — mirrored in the SQL twin).
    doc_w = Window.partitionBy("doc_id").orderBy("s", "e")
    run_max = F.max("e").over(doc_w.rowsBetween(Window.unboundedPreceding, -1))
    isl = cuts.withColumn(
        "ni", F.when(F.col("s") > F.coalesce(run_max, F.lit(0)) + 1, 1).otherwise(0)
    ).withColumn(
        "isl", F.sum("ni").over(doc_w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = isl.groupBy("doc_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )

    # Kept segments = complement of the merged cuts within [1, len]:
    # the gap before each cut plus one tail segment after the last cut.
    seg_w = Window.partitionBy("doc_id").orderBy("ms")
    gaps = merged.select(
        "doc_id",
        (F.coalesce(F.lag("me").over(seg_w), F.lit(0)) + 1).alias("ks"),
        (F.col("ms") - 1).alias("ke"),
    )
    lens = d.select("doc_id", F.length("text").alias("orig_len"))
    tail = (
        merged.groupBy("doc_id")
        .agg(F.max("me").alias("last_e"))
        .join(lens, "doc_id")
        .select(
            "doc_id",
            (F.col("last_e") + 1).alias("ks"),
            F.col("orig_len").alias("ke"),
        )
    )
    segs = gaps.unionByName(tail)

    seg_txt = segs.join(d, "doc_id").select(
        "doc_id",
        "ks",
        F.expr("substr(text, ks, greatest(0, ke - ks + 1))").alias("seg"),
    )
    rebuilt = seg_txt.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ks", "seg"))),
                lambda x: x["seg"],
            ),
            "",
        ).alias("deduped_text")
    )
    return rebuilt.join(lens, "doc_id").select(
        "doc_id",
        "orig_len",
        F.length("deduped_text").alias("deduped_len"),
        (F.col("orig_len") - F.length("deduped_text")).alias("n_cut_chars"),
        "deduped_text",
    )


def exact_substr_cut_tokens(
    docs: DataFrame,
    min_tokens: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """TOKEN-mode ExactSubstr span-removal dedup — Lee et al. 2022 run
    their dedup over 50-BPE-token windows, not characters (VERDICT r7
    task 4); this is the same keep-first removal semantics as
    exact_substr_cut with every boundary landing on a token boundary:

      - token position p in doc d is a DUPLICATE-START if the
        min_tokens-gram of TOKENS at p occurs >= 2 times corpus-wide and
        (d, p) is not the class's first occurrence (min (doc_id, pos));
      - cut intervals [p, p+min_tokens-1] are unioned per doc over TOKEN
        indices, the kept token segments are the complement, and the doc
        is rebuilt by flattening the kept segments in order;
      - output rows are docs with a non-empty cut set.

    Input is (id_col, tokens_col: array<string>) — tokenizer-agnostic,
    so the caller picks the token model: whitespace tokens for the
    oracle-gated registry query, operators/bpe.segment_words_df output
    for real BPE boundaries (composed in tests/test_round8_ops.py).
    Precondition: tokens must not contain U+001F (the gram separator);
    whitespace/BPE tokenizers can't produce it.

    Returns (doc_id, orig_n_tokens, deduped_n_tokens, n_cut_tokens,
    deduped_text) with deduped_text the kept tokens joined by ' '
    (canonical single-space form — char offsets are not preserved, token
    boundaries are the unit here; the char-vs-token semantic difference
    is documented in docs/SCALE.md).

    Scale shape: fixed-L duplicate detection uses the 8-byte xxhash64
    window-FINGERPRINT pass proven in exact_substr_cut_sharded's
    reconcile — shuffle is 8 B/token-position, never corpus x L token
    text; gram text is materialized only for fingerprint-duplicated
    candidates and then VERIFIED (count >= 2 on the real gram), so a
    hash collision can only add a verified-away candidate, never a
    wrong cut. (The suffix array earns its log(L)-sorts build cost when
    you need EXACT variable-length spans / the LCP spectrum; for a
    fixed min_tokens transform the narrow fingerprint pass is the
    cheaper corpus-linear plan.) Interval merge and reassembly are
    per-doc keyed windows, state bounded by per-doc cut counts."""
    from pyspark.sql import Window

    L = min_tokens
    sep = "\x1f"  # unit-separator: precondition above bars it from tokens
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("toks")
    ).filter(F.size("toks") > 0)
    big = _is_big_corpus(d, F.size("toks"))
    lens = d.select("doc_id", F.size("toks").alias("orig_n_tokens"))

    # Window fingerprints: one 8-byte hash per token position (guard the
    # sequence stop — see exact_substr_cut_sharded's descending-sequence
    # note).
    fp = d.filter(F.size("toks") >= L).select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - F.lit(L - 1))).alias("tpos"),
        F.col("toks"),
    ).select(
        "doc_id",
        "tpos",
        F.xxhash64(
            F.array_join(F.slice(F.col("toks"), F.col("tpos"), F.lit(L)), sep)
        ).alias("_fp"),
    )
    # (Optimization r12 note: a fingerprint-keyed window count was measured
    # here and REGRESSED 1.55 -> 2.36 s at sf0.1 — the window forces a full
    # sort-shuffle of every position row, while this aggregate gets
    # map-side partial combining and the join back is small.)
    # Optimization r12 (guide §2.4): fp feeds BOTH the duplicate-count
    # aggregate and the join probe — two lineage references that each
    # re-ran the tokenize + slice + hash explode (an explicit shared
    # repartition was measured first and REGRESSED: column pruning gives
    # the two consumers different exchange subtrees, so ReuseExchange
    # never fires and the repartition just added a full position-row
    # shuffle the broadcast semi join never needed). Pinning the compact
    # 20 B/position fingerprint relation instead runs the explode once;
    # both consumers read the materialized rows, and the probe keeps its
    # zero-shuffle broadcast join.
    fp = _pin(fp)
    dupfp = (
        fp.groupBy("_fp").agg(F.count(F.lit(1)).alias("_n")).filter(F.col("_n") >= 2)
    ).select("_fp")
    candidates = fp.join(_mh(dupfp, big), "_fp").select("doc_id", "tpos")

    # Verify on the real gram text + keep-first per verified class.
    cand_grams = _mh(candidates, big).join(d, "doc_id").select(
        "doc_id",
        "tpos",
        F.array_join(F.slice(F.col("toks"), F.col("tpos"), F.lit(L)), sep).alias("g"),
    )
    gw = Window.partitionBy("g")
    occ_w = Window.partitionBy("g").orderBy("doc_id", "tpos")
    cuts = (
        cand_grams.withColumn("_cnt", F.count(F.lit(1)).over(gw))
        .withColumn("occ", F.row_number().over(occ_w))
        .filter((F.col("_cnt") >= 2) & (F.col("occ") >= 2))
        .select(
            "doc_id",
            F.col("tpos").alias("s"),
            (F.col("tpos") + F.lit(L - 1)).alias("e"),
        )
    )

    # Interval union over token indices (same gaps-and-islands as the
    # char path), then rebuild from kept token segments.
    doc_w = Window.partitionBy("doc_id").orderBy("s", "e")
    run_max = F.max("e").over(doc_w.rowsBetween(Window.unboundedPreceding, -1))
    isl = cuts.withColumn(
        "ni", F.when(F.col("s") > F.coalesce(run_max, F.lit(0)) + 1, 1).otherwise(0)
    ).withColumn(
        "isl", F.sum("ni").over(doc_w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = isl.groupBy("doc_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    seg_w = Window.partitionBy("doc_id").orderBy("ms")
    gaps = merged.select(
        "doc_id",
        (F.coalesce(F.lag("me").over(seg_w), F.lit(0)) + 1).alias("ks"),
        (F.col("ms") - 1).alias("ke"),
    )
    tail = (
        merged.groupBy("doc_id")
        .agg(F.max("me").alias("last_e"))
        .join(lens, "doc_id")
        .select(
            "doc_id",
            (F.col("last_e") + 1).alias("ks"),
            F.col("orig_n_tokens").alias("ke"),
        )
    )
    segs = gaps.unionByName(tail)
    seg_toks = segs.join(d, "doc_id").select(
        "doc_id",
        "ks",
        F.slice(
            F.col("toks"), F.col("ks"), F.greatest(F.lit(0), F.col("ke") - F.col("ks") + 1)
        ).alias("seg"),
    )
    rebuilt = seg_toks.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ks", "seg"))),
                lambda x: x["seg"],
            )
        ).alias("kept")
    )
    return rebuilt.join(lens, "doc_id").select(
        "doc_id",
        "orig_n_tokens",
        F.size("kept").alias("deduped_n_tokens"),
        (F.col("orig_n_tokens") - F.size("kept")).alias("n_cut_tokens"),
        F.array_join(F.col("kept"), " ").alias("deduped_text"),
    )


def exact_substr_cut_sharded(
    docs: DataFrame,
    min_len: int = 32,
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sharded ExactSubstr — the 100 TB deployment mode (docs/SCALE.md
    "Suffix-array family"): Lee et al. 2022 build per-shard suffix
    arrays and reconcile across shards; one global prefix-doubling build
    over 100 TB is log(L) corpus-wide sorts, while per-shard builds are
    independent jobs whose shuffle width is bounded by the shard.

    EXACT by construction — per-shard ∪ cross-shard ≡ global:
      - WITHIN-shard duplicated positions come from each shard's own
        suffix array (_dup_positions on the shard's docs);
      - CROSS-shard duplicates (gram unique inside every shard it
        touches, duplicated only across) are reconciled with 8-byte
        xxhash64 gram FINGERPRINTS: positions whose fingerprint spans
        >= 2 shards are candidates, then candidates are VERIFIED on the
        actual gram text (count >= 2 per gram), so a hash collision can
        only add a verified-away candidate, never a wrong cut.
    Every occurrence of a globally-duplicated gram lands in the union:
    if it has a same-shard twin the shard SA finds it; otherwise all its
    twins are in other shards and the fingerprint join finds it. The
    keep-first ranking then runs on the union with the same global
    (doc_id, pos) order as the unsharded path — identical output
    (pinned in tests/test_round7_ops.py on planted cross-shard dups).

    Scale shape: the fingerprint pass shuffles 8 bytes/position instead
    of L chars (the reconcile is corpus-linear but narrow); gram text is
    materialized only for spanning candidates; the per-shard SA builds
    are embarrassingly parallel across jobs. What sharding alone would
    MISS without the reconcile is exactly the spanning-fingerprint set
    this pass recovers — see SCALE.md for the bound discussion."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).filter(F.length("text") > 0)
    big = _is_big_corpus(d, F.length("text"))
    shard_of = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards))

    # Phase 1 — within-shard duplicates via per-shard suffix arrays.
    within = None
    for s in range(n_shards):
        part = d.filter(shard_of == s)
        dp = _dup_positions(part, min_len)
        within = dp if within is None else within.unionByName(dp)

    # Phase 2 — cross-shard reconcile on gram fingerprints.
    cross = _cross_shard_positions(d, shard_of, min_len, big)

    dup_pos = within.unionByName(cross).distinct()
    return _cut_from_dup_positions(d, dup_pos, min_len, big=big)


def _cross_shard_positions(
    d: DataFrame, shard_of, min_len: int, big: bool
) -> DataFrame:
    """The cross-shard reconcile: (doc_id, pos) of grams whose xxhash64
    FINGERPRINT spans >= 2 shards, verified on the real gram text (count
    >= 2) so a hash collision can only add a verified-away candidate.
    Shared by exact_substr_cut_sharded and the parallel-shard deployment
    harness (tools/parallel_shards.py) — one code path, two run shapes."""
    fp = d.filter(F.length("text") >= min_len).select(
        "doc_id",
        shard_of.alias("_shard"),
        # guard above matters: sequence(1, stop) with stop < 1 would emit a
        # DESCENDING [1, 0] sequence, not an empty one
        F.explode(
            F.sequence(F.lit(1), F.length("text") - F.lit(min_len - 1))
        ).alias("pos"),
        "text",
    ).select(
        "doc_id",
        "_shard",
        "pos",
        F.xxhash64(F.expr(f"substr(text, pos, {min_len})")).alias("_fp"),
    )
    spanning = (
        fp.groupBy("_fp")
        .agg(F.countDistinct("_shard").alias("_ns"))
        .filter(F.col("_ns") >= 2)
        .select("_fp")
    )
    candidates = fp.join(_mh(spanning, big), "_fp").select("doc_id", "pos")
    # Verify candidates on the actual gram (collision safety): only grams
    # with a true count >= 2 survive.
    cand_grams = _mh(candidates, big).join(d, "doc_id").select(
        "doc_id", "pos", F.expr(f"substr(text, pos, {min_len})").alias("g")
    )
    from pyspark.sql import Window

    gw = Window.partitionBy("g")
    return (
        cand_grams.withColumn("_n", F.count(F.lit(1)).over(gw))
        .filter(F.col("_n") >= 2)
        .select("doc_id", "pos")
    )


def adjacent_lcp(sa: DataFrame, docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", max_rounds: int = 64,
                 big: bool | None = None) -> DataFrame:
    """LCP between each adjacent suffix pair in suffix-array order.

    Returns (doc_a, pos_a, doc_b, pos_b, lcp) for sa_rank r vs r+1.
    Chunked comparison: survivors of a full-chunk match loop for the next
    128 characters; raises past max_rounds (LCP > 128*max_rounds means
    the corpus needs a bigger chunk budget — loud, never silent)."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    if big is None:
        big = _is_big_corpus(d, F.length("text"))
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
    pairs = a.join(_mh(b, big), "r").select("doc_a", "pos_a", "doc_b", "pos_b")

    done = None
    active = pairs.withColumn("lcp", F.lit(0))
    for _ in range(max_rounds):
        slices = (
            _mh(active, big).join(
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
