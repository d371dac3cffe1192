"""Custom stateful streaming operators (applyInPandasWithState).

The reference delegates cross-batch dedup to its downstream DB
(ON CONFLICT (id) DO NOTHING over deterministic IDs —
docs/Architecture.md:98-102). `streaming_first_wins_dedup` moves that
semantics into the stream itself: the first record per ID is emitted,
replays/duplicates are swallowed, state expires after a TTL so the store
stays bounded.

State shape: one tiny row per id (count), grouped by id — the state store
shuffles on id exactly like the batch D1 window, but incrementally.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Running-stats zero state: (n, total, vmin, vmax, ewma).
RUNNING_STATS_ZERO = (0, 0.0, float("inf"), float("-inf"), 0.0)


def running_stats_fold(state: tuple, values, alpha: float = 0.2) -> tuple:
    """The EXACT per-value fold streaming_running_stats applies, extracted
    so the batch replay certificate (plans/window_queries.py
    stream_replay_running_stats) executes the identical code path the
    stream does — one function, two harnesses. ``values`` must already be
    null-free floats in fold order; returns the updated state tuple."""
    n, total, vmin, vmax, ewma = state
    for x in values:
        total += x
        vmin = min(vmin, x)
        vmax = max(vmax, x)
        ewma = x if n == 0 else alpha * x + (1.0 - alpha) * ewma
        n += 1
    return (n, total, vmin, vmax, ewma)


#: First-wins dedup zero state: (seen,) — rows observed for the key so far.
DEDUP_ZERO = (0,)


def dedup_fold(state: tuple, n_batch: int) -> tuple:
    """The EXACT seen-counter fold streaming_first_wins_dedup applies,
    extracted so the batch replay certificate (plans/window_queries.py
    stream_replay_dedup) executes the identical code path the stream does
    — one function, two harnesses (the running_stats_fold discipline).
    ``n_batch`` is the key's row count in this micro-batch; returns
    (new_state, emit_first): emit the batch's FIRST row iff no prior
    micro-batch had seen the key."""
    (seen,) = state
    emit = seen == 0 and n_batch > 0
    return ((seen + n_batch,), emit)


#: Sessionize zero state: (last_ts, n_sessions, n_events).
SESSIONIZE_ZERO = (0, 0, 0)


def sessionize_fold(state: tuple, ts_values, gap_ns: int) -> tuple:
    """The EXACT per-timestamp fold streaming_sessionize applies, extracted
    so the batch replay certificate (plans/window_queries.py
    stream_replay_sessionize) executes the identical code path the stream
    does — one function, two harnesses (the running_stats_fold
    discipline). ``ts_values`` must already be null-free int epoch-ns in
    fold order; returns the updated (last_ts, n_sessions, n_events)."""
    last_ts, n_sessions, n_events = state
    for ts in ts_values:
        if n_events == 0 or ts - last_ts > gap_ns:
            n_sessions += 1
        n_events += 1
        last_ts = int(ts)
    return (last_ts, n_sessions, n_events)


#: Attribution-join zero state: (buffered impressions, buffered
#: conversions) — each a tuple of (ts_ns, id) in arrival order.
ATTRIBUTION_ZERO: tuple[tuple, tuple] = ((), ())


def attribution_fold(
    state: tuple, new_imps, new_convs, horizon_ns: int
) -> tuple:
    """The two-sided match fold of the stream-stream attribution join
    (streaming/joins.attribution_join), extracted so the batch replay
    certificate (plans/window_queries.py stream_replay_attribution)
    executes it per micro-batch — the running_stats_fold discipline
    applied to Spark's built-in stream-stream join contract, which this
    fold MODELS (tests/test_streaming.py pins the model against the real
    streaming join on crafted cross-batch arrivals; the driver gate then
    hash-pins the model against a DuckDB twin at scale).

    Contract modeled (inner join, both sides within watermark): a match
    (imp, conv) with conv_ts in [imp_ts, imp_ts + horizon] EMITS IN THE
    MICRO-BATCH WHERE THE LATER SIDE ARRIVES — the earlier side must
    still be buffered in the join state, so a per-batch state reset (the
    r8 chunk-boundary bug class) silently loses every cross-batch match.
    Eviction is not modeled: Spark guarantees no match loss for rows
    inside the watermark, and the replay declares all rows in-watermark.

    ``new_imps`` / ``new_convs``: this batch's arrivals for one key, each
    an iterable of (ts_ns, id) in arrival order. Returns
    (new_state, matches) where matches lists (imp_id, conv_id) pairs
    emitted this batch — new impressions against ALL conversions seen
    (buffered + this batch), plus new conversions against buffered
    impressions (new x new counted once)."""
    b_imps, b_convs = state
    new_imps = tuple(new_imps)
    new_convs = tuple(new_convs)
    matches = []
    all_convs = b_convs + new_convs
    for its, iid in new_imps:
        for cts, cid in all_convs:
            if its <= cts <= its + horizon_ns:
                matches.append((iid, cid))
    for cts, cid in new_convs:
        for its, iid in b_imps:
            if its <= cts <= its + horizon_ns:
                matches.append((iid, cid))
    return (b_imps + new_imps, b_convs + new_convs), matches


def streaming_first_wins_dedup(
    stream: DataFrame,
    id_col: str = "id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the first occurrence of each id across micro-batches.

    Within one micro-batch, "first" follows the group's arrival order (pass
    a pre-sorted stream for a total order, mirroring batch D1's explicit
    order key). State: a single seen-flag per id.

    ``ttl_ms``: optional processing-time TTL that expires an id's state so
    the store stays bounded (replays older than the TTL re-emit — the same
    horizon a DB retention window gives the reference's upsert). With a TTL
    the engine schedules timeout-cleanup micro-batches continuously, so
    `processAllAvailable()` never drains — use it only with real
    (production) triggers; tests and finite replays run with ttl_ms=None.
    """
    schema = stream.schema
    out_schema = schema  # pass-through of the first row
    state_schema = "seen long"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        prev = (state.get[0],) if state.exists else DEDUP_ZERO
        first = None
        n_new = 0
        for pdf in batches:
            if first is None and len(pdf) > 0:
                first = pdf.iloc[[0]]
            n_new += len(pdf)
        # the exact fold the replay certificate re-executes in batch mode
        new_state, emit = dedup_fold(prev, n_new)
        state.update(new_state)
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if emit and first is not None:
            yield first

    return stream.groupBy(id_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def streaming_running_stats(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    alpha: float = 0.2,
    ttl_ms: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Cross-batch per-key running aggregates: count, sum, min, max and an
    EWMA (s ← α·x + (1−α)·s in arrival order) maintained in the state
    store; each micro-batch emits one updated snapshot row per touched
    key — the streaming twin of the batch `ewma_last` /
    `value_change_points` readouts.

    State is O(1) per key (five scalars) regardless of stream length —
    the composable-aggregate discipline from incremental_agg_maintenance
    applied to streams. Decomposable stats (count/sum/min/max) would also
    fit `agg` over a watermarked window; the EWMA's order-dependent
    recursion is what needs applyInPandasWithState. ``ttl_ms`` bounds the
    store for keys gone cold (same caveat as streaming_first_wins_dedup:
    only with real triggers).

    ``order_col`` (optional) applies the sessionize/cusum within-batch
    ordering discipline: rows are sorted by it inside each micro-batch
    before folding, making the EWMA reproducible when the source's
    intra-batch row order isn't (multi-partition sources). The
    count/sum/min/max legs are order-free either way; default None keeps
    the historical arrival-order behavior for single-partition replays.
    """
    ktype = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {ktype}, n long, total double, vmin double, "
        "vmax double, ewma double"
    )
    state_schema = "n long, total double, vmin double, vmax double, ewma double"
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total, vmin, vmax, ewma = (
            state.get if state.exists else (0, 0.0, float("inf"), float("-inf"), 0.0)
        )
        touched = False
        if order_col is not None:
            # One concat + stable sort over the WHOLE micro-batch: chunk-
            # local sorts would fold in the wrong global order whenever a
            # key spans Arrow chunks (> maxRecordsPerBatch rows), and an
            # unstable sort would reorder duplicate order_col values.
            chunks = list(batches)
            batches = iter(
                [
                    pd.concat(chunks, ignore_index=True).sort_values(
                        order_col, kind="stable"
                    )
                ]
                if chunks
                else []
            )
        for pdf in batches:
            # Null/NaN values would contaminate total/ewma for the key's whole
            # lifetime (NaN propagates through every later update) — dropna
            # removes both (pandas treats None and float NaN alike here).
            xs = list(pdf[value_col].dropna().astype(float))
            if xs:
                touched = True
                n, total, vmin, vmax, ewma = running_stats_fold(
                    (n, total, vmin, vmax, ewma), xs, alpha
                )
        if not touched:
            return
        state.update((n, total, vmin, vmax, ewma))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    "n": n,
                    "total": total,
                    "vmin": vmin,
                    "vmax": vmax,
                    "ewma": ewma,
                }
            ]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def watermarked_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts_utc",
    watermark: str = "1 hour",
):
    """Built-in streaming dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until the
    watermark passes, so duplicates arriving within the watermark horizon
    collapse while state stays finite at any stream length — the
    deterministic-ID replay guard (reference ST2/P6 idempotency) expressed
    as a native Spark 4 operator instead of custom applyInPandasWithState.

    Use `streaming_first_wins_dedup` when the dedup horizon must be
    unbounded (its state never expires); use this when duplicates only
    arrive near each other in event time (Kafka replays, at-least-once
    redelivery) and state size matters.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


#: Change-detector zero state: no last-seen value yet.
CHANGE_DETECT_ZERO = None


def change_detect_fold(last, values, threshold: float):
    """The EXACT per-value fold make_change_detector applies, extracted so
    the batch replay certificate (plans/window_queries.py
    stream_replay_change_detect) executes the identical code path the
    stream does — one function, two harnesses (the running_stats_fold
    discipline). ``values`` must already be null/NaN-free floats in fold
    order; returns (new_last, emits) with emits = [(prev, cur, jump)] for
    every step where |cur - last| > threshold."""
    out = []
    for v in values:
        v = float(v)
        if last is not None and abs(v - last) > threshold:
            out.append((last, v, v - last))
        last = v
    return last, out


#: CUSUM zero state: (s_pos, s_neg, n).
CUSUM_ZERO = (0, 0, 0)


def cusum_fold(state: tuple, devs) -> tuple:
    """The EXACT per-deviation fold streaming_cusum applies (Page's
    one-sided clamps over exact int deviations), extracted for the
    stream_replay_cusum certificate — one function, two harnesses.
    ``devs`` are already-quantized int deviations in fold order."""
    s_pos, s_neg, n = state
    for dev in devs:
        s_pos = max(0, s_pos + dev)
        s_neg = max(0, s_neg - dev)
        n += 1
    return (s_pos, s_neg, n)


def make_change_detector(
    key_col: str,
    value_col: str,
    threshold: float,
    state_ttl_ms: int | None = None,
    order_col: str | None = "ts_utc",
):
    """Build the ChangeDetector StatefulProcessor used by
    streaming_change_detector.

    Module-level factory (not a closure inside the query builder) so the
    processor's state/diff logic is directly unit-testable with a fake
    StatefulProcessorHandle in environments where the transformWithState
    protobuf transport can't start. The fake needs only getValueState()
    returning an object with exists/get/update.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ChangeDetector(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState(
                "last", "last double", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            last = self._last.get()[0] if self._last.exists() else None
            chunks = [pdf for pdf in rows if len(pdf)]
            if not chunks:
                return
            batch = pd.concat(chunks, ignore_index=True)
            # Null/NaN values would poison the stored last-value (abs(v-last)
            # with NaN is always False, silencing the key forever) — drop them
            # before diffing, matching the batch twin value_change_points.
            batch = batch.dropna(subset=[value_col])
            if batch.empty:
                return
            if order_col is not None:
                batch = batch.sort_values(order_col, kind="stable")
            # the exact fold the replay certificate re-executes in batch mode
            last, emits = change_detect_fold(
                last, batch[value_col].tolist(), threshold
            )
            self._last.update((last,))
            if emits:
                yield pd.DataFrame(
                    [(key[0], p, c, j) for p, c, j in emits],
                    columns=[key_col, "prev", "cur", "jump"],
                )

        def close(self) -> None:
            pass

    return ChangeDetector()


def streaming_change_detector(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    threshold: float = 100.0,
    state_ttl_ms: int | None = None,
    order_col: str | None = "ts_utc",
) -> DataFrame:
    """Per-key change-point emitter on the MODERN stateful API
    (transformWithStateInPandas, Spark 4 StatefulProcessor): a row is
    emitted only when a key's new value differs from its last-seen value
    by more than ``threshold`` — the streaming twin of the batch
    `value_change_points` query, producing the sparse "something moved"
    feed downstream alerting actually wants instead of every tick.

    Why transformWithState and not applyInPandasWithState: typed named
    state variables (a one-double ValueState here) with per-state TTL
    (``state_ttl_ms``), a lifecycle hook model (init/close), timers, and
    initial-state bootstrap — the API Structured Streaming is
    standardizing on. State is O(1) per key; the shuffle is the same
    groupBy(key) exchange every stateful operator pays.

    ``order_col``: event-time column used to sort each key's rows WITHIN a
    micro-batch before diffing (None → arrival order). Without it,
    multi-partition batches reach the detector in shuffle order and both
    the emitted jumps and the stored last-value become nondeterministic —
    the same reason the batch twin orders by (ts, event_id). Pass None
    only for single-partition, pre-ordered sources.

    ``state_ttl_ms``: per-state TTL; requires processing-time semantics, so
    the operator switches timeMode to ProcessingTime when set (Spark
    rejects TTL under TimeMode.None with
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL).

    Runtime requirement: the transformWithState state-server protocol
    runs over protobuf — environments without ``google.protobuf`` (like
    this test container) fail at query start; the pytest coverage
    auto-skips the live-query path there and instead drives the processor
    class directly (make_change_detector) through a fake handle — same
    diff/state logic, minus the protobuf transport.
    """
    ktype = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {ktype}, prev double, cur double, jump double"
    )
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=make_change_detector(
            key_col, value_col, threshold, state_ttl_ms, order_col
        ),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="ProcessingTime" if state_ttl_ms is not None else "None",
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    key_col: str,
    k: int = 64,
    num_shards: int = 16,
) -> DataFrame:
    """Cross-batch Misra-Gries heavy hitters in the state store — the
    streaming twin of `operators.heavy_hitters.misra_gries_summary`,
    built on the same mergeability result (Agarwal et al. PODS 2012
    §3.1): each of ``num_shards`` state keys owns the MG(k) summary of
    ITS deterministic hash-shard of the key space, updated per
    micro-batch by pointwise-add + trim. Because a key always hashes to
    the same shard, the union of shard summaries is a valid global
    MG(num_shards·k) summary at any moment — exact while every shard
    stays within capacity, and never undercounting a key by more than
    its shard's stream-length/(k+1) past it.

    State is O(k) per shard (two arrays), bounded for the stream's
    lifetime; each micro-batch emits the touched shards' full summaries
    (append mode — downstream keeps the latest per (shard, key)).

    Scale shape: the only shuffle is the groupBy on the shard id —
    num_shards parallel state partitions, each a tiny dict merge per
    batch. At 100 TB/day streams raise num_shards, not k."""
    from pyspark.sql import functions as F

    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(num_shards))
    keyed = stream.select(
        shard.alias("_shard"), F.col(key_col).cast("string").alias("hh_key")
    )
    out_schema = "shard int, hh_key string, est_count long"
    state_schema = "keys array<string>, counts array<long>"

    # NULL keys are counted as a regular key — same semantics as the batch
    # twin misra_gries_summary (a plain groupBy counts NULL as a group).
    # Internally every key is escape-encoded ("v"+key for values, "n" for
    # NULL) so the summary dict sorts uniformly and the array<string>
    # state never stores a null element; emit decodes back to NULL.
    # STATE-FORMAT BREAK (round 7): checkpoints written by the pre-encoding
    # code stored plain keys; restoring one here would decode each as
    # s[1:] — and a legacy key may itself start with "v", so the formats
    # are not reliably distinguishable at restore time. Old checkpoints
    # must be discarded (fresh checkpointLocation); see docs/LIMITS.md
    # "round 7" preconditions.
    def _enc(hk) -> str:
        return "n" if hk is None else "v" + hk

    def _dec(s: str):
        return None if s == "n" else s[1:]

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts = state.get
            summary = dict(zip(keys, counts))
        else:
            summary = {}
        touched = False
        for pdf in batches:
            # dropna=False: keep NULL keys (pandas excludes NaN by default,
            # which would silently drop every null-key row — ADVICE r6).
            for hk, c in pdf["hh_key"].value_counts(dropna=False).items():
                touched = True
                ek = _enc(hk if isinstance(hk, str) else None)
                summary[ek] = summary.get(ek, 0) + int(c)
        if not touched:
            return
        if len(summary) > k:
            # MG trim: subtract the (k+1)-th largest, drop non-positive.
            # Deterministic tie-break on (encoded) key so replays converge.
            ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
            thr = ordered[k][1]
            summary = {hk: c - thr for hk, c in ordered[:k] if c - thr > 0}
        items = sorted(summary.items())
        state.update(([hk for hk, _ in items], [c for _, c in items]))
        yield pd.DataFrame(
            [
                {"shard": int(key[0]), "hh_key": _dec(hk), "est_count": c}
                for hk, c in items
            ]
        )

    return keyed.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ns",
    order_col: str = "event_id",
    gap_ns: int = 30 * 60 * 1_000_000_000,
) -> DataFrame:
    """Cross-batch gap sessionization — the stateful-streaming twin of the
    oracle-gated batch `sessionize` query (plans/window_queries.py): a
    session break is a per-key event-time gap > ``gap_ns``; each
    micro-batch emits an updated (key, n_sessions, n_events, last_ts)
    snapshot per touched key. State is O(1) per key (three scalars) —
    the same composable-state discipline as streaming_running_stats;
    Spark's native session_window covers windowed AGGREGATES, but a
    running session COUNTER with cross-batch carry is exactly the
    order-dependent recursion applyInPandasWithState exists for.

    Ordering contract (documented, test-pinned): rows are sorted by
    (ts, order_col) WITHIN each batch; across batches the fold follows
    arrival order. The result is exactly the batch twin whenever each
    key's event time is non-decreasing across batch boundaries (true for
    replayed logs and watermarked sources); a genuinely late row joins
    the CURRENT session (its negative gap can never exceed gap_ns) —
    sessions are never double-counted, the late row's session attribution
    is the only divergence. NULL timestamps are dropped (they carry no
    event-time and would poison the gap arithmetic)."""
    ktype = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {ktype}, n_sessions long, n_events long, last_ts long"
    )
    state_schema = "last_ts long, n_sessions long, n_events long"

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, n_sessions, n_events = (
            state.get if state.exists else (0, 0, 0)
        )
        # Concat then ONE stable sort: chunk-local sorts would interleave
        # wrongly when a key's micro-batch spans Arrow chunks
        # (> maxRecordsPerBatch rows) — the gap recursion is order-
        # sensitive (the make_change_detector discipline).
        chunks = [pdf.dropna(subset=[ts_col]) for pdf in batches]
        chunks = [c for c in chunks if not c.empty]
        if not chunks:
            return
        whole = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, order_col], kind="stable"
        )
        last_ts, n_sessions, n_events = sessionize_fold(
            (last_ts, n_sessions, n_events),
            whole[ts_col].astype("int64"),
            gap_ns,
        )
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    "n_sessions": n_sessions,
                    "n_events": n_events,
                    "last_ts": last_ts,
                }
            ]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum(
    stream: DataFrame,
    k_e4: int,
    key_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
    scale: int = 10000,
) -> DataFrame:
    """Cross-batch CUSUM drift detection — the stateful-streaming twin of
    the oracle-gated batch `cusum_drift_scores` (plans/window_queries.py):
    one-sided Page statistics S⁺ ← max(0, S⁺ + (x − k)) and
    S⁻ ← max(0, S⁻ + (k − x)) folded per key, with the reference level
    ``k_e4`` FROZEN by the caller (a baseline-window mean) — the actual
    monitoring deployment shape, where the batch query's retrospective
    own-mean k is unavailable mid-stream. Each micro-batch emits an
    updated (key, n_events, cusum_pos_e4, cusum_neg_e4) snapshot per
    touched key.

    Exactness discipline: values are quantized to integers
    (floor(x·scale + 0.5) — the identical IEEE double expression the
    batch query evaluates) BEFORE differencing, and the whole fold is
    exact Python int arithmetic, so the final snapshot equals the batch
    twin to the bit whenever rows arrive in ``order_col`` order across
    batches (within a batch they are sorted; the test pins this).
    State is O(1) per key (three BIGINTs); NULL values are dropped
    (they carry no measurement — same rule as the batch query's
    value-IS-NOT-NULL gate)."""
    ktype = stream.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {ktype}, n_events long, cusum_pos_e4 long, cusum_neg_e4 long"
    )
    state_schema = "s_pos long, s_neg long, n long"

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        s_pos, s_neg, n = state.get if state.exists else (0, 0, 0)
        # Arrow delivers a key's micro-batch as an ITERATOR of chunks;
        # sorting each chunk locally would fold in the wrong global order
        # whenever a key spans chunks (> maxRecordsPerBatch rows) — and
        # the max-clamp is non-commutative. Concat first, ONE stable sort
        # (the make_change_detector discipline).
        chunks = [pdf.dropna(subset=[value_col]) for pdf in batches]
        chunks = [c for c in chunks if not c.empty]
        if not chunks:
            return
        whole = pd.concat(chunks, ignore_index=True).sort_values(
            order_col, kind="stable"
        )
        devs = [
            int(math.floor(x * scale + 0.5)) - k_e4
            for x in whole[value_col].astype(float)
        ]
        # the exact fold the replay certificate re-executes in batch mode
        s_pos, s_neg, n = cusum_fold((s_pos, s_neg, n), devs)
        state.update((s_pos, s_neg, n))
        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    "n_events": n,
                    "cusum_pos_e4": s_pos,
                    "cusum_neg_e4": s_neg,
                }
            ]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
