"""Bucketized time-range join: pairs of rows whose timestamps fall
within a fixed window of each other.

Why this operator exists: Spark plans a pure inequality join
(``abs(a.ts - b.ts) <= w``) as BroadcastNestedLoopJoin — O(n*m)
comparisons, a guaranteed scale-killer (DuckDB, by contrast, runs the
same predicate as an IEJoin, which is exactly why it can serve as the
oracle here). The standard distributed rewrite buckets time into
window-sized cells and turns the range predicate into an equi-join:
a row in bucket b can only be within ``w`` of rows in buckets
{b-1, b, b+1}, so one side explodes into its 3 candidate buckets and
the join key becomes the bucket id — hash-partitioned, AQE-skew-
splittable, no nested loop. The residual exact predicate filters the
3x candidate superset. This is the same block->verify discipline as
the LSH joins in operators/linking.py, with time as the blocking key.

Reference analogue: the corrections-timeline proximity views
(/root/reference/src/streamlit/app/utils/dashboard.py timeline tab)
computed pandas-side; generalized to a distributed two-stream window
match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_window_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    ts_col: str = "ts",
    window_sec: int = 1800,
) -> DataFrame:
    """All (left, right) pairs with |ts_left - ts_right| <= window_sec.

    The LEFT side explodes into its 3 candidate buckets (3x row fan-out
    on the smaller / filtered stream by convention — pass the smaller
    relation as ``left``); the RIGHT side keeps exactly one bucket row.
    Returns (left_id, right_id, dt_sec) with dt_sec = ts_right -
    ts_left in seconds (signed).
    """
    # ts columns are NTZ in the testdata; cast through LTZ for epoch
    l_epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    r_epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    lb = left.select(
        F.col(left_id).alias("_lid"), l_epoch.alias("_lts")
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                (F.col("_lts") / window_sec).cast("long") - 1,
                (F.col("_lts") / window_sec).cast("long"),
                (F.col("_lts") / window_sec).cast("long") + 1,
            )
        ),
    )
    rb = right.select(
        F.col(right_id).alias("_rid"),
        r_epoch.alias("_rts"),
        (r_epoch / window_sec).cast("long").alias("_bucket"),
    )
    return (
        lb.join(rb, "_bucket")
        .filter(F.abs(F.col("_rts") - F.col("_lts")) <= window_sec)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            (F.col("_rts") - F.col("_lts")).alias("dt_sec"),
        )
        # no distinct needed: the left row's 3 candidate buckets are 3
        # DISTINCT keys and the right row carries exactly one bucket,
        # so any (left, right) pair can join at most once
    )


def state_intervals(
    df: DataFrame,
    key: str,
    state: str,
    ts: str,
    tie: str | None = None,
    weight: str | None = None,
) -> DataFrame:
    """SCD2-style temporal state table: collapse an event stream into
    per-key validity intervals — consecutive rows with the SAME state
    merge into one interval (gaps-and-islands), each interval closed
    by the next one's start (the last stays open, valid_to NULL).

    This is the per-entity history materialization a KG needs when
    assertions change over time (extractor-version transitions,
    corrections timelines — the interval form of last_writer_wins):
    "which state held at time T" becomes a plain range predicate on
    the interval table.

    Determinism: ordering is (ts, tie) — pass a unique tiebreaker when
    timestamps can collide, exactly like last_writer_wins. Plan shape:
    two window passes over the SAME (key, ts, tie) sort order —
    Catalyst reuses one Exchange+Sort for the lag/run-sum and the
    interval-close lead runs on the (already smaller) interval rows.
    Output is interval-sized, never event-sized, when states repeat.

    Returns (key, state, valid_from, valid_to, n_events).

    ``weight`` makes each input row count as that many events in
    n_events (sum instead of count) — the splice hook scd2_apply uses
    to carry an open interval's accumulated count through the
    re-collapse as ONE pseudo-event.
    """
    order = [F.col(ts).asc()] + ([F.col(tie).asc()] if tie else [])
    w = Window.partitionBy(key).orderBy(*order)
    # null-safe (IS DISTINCT FROM): consecutive NULL states merge into
    # one run, and the first row of a group always opens one
    changed = (
        ~F.col(state).eqNullSafe(F.lag(F.col(state)).over(w))
    ).cast("long")
    runs = df.select(
        F.col(key).alias("key"),
        F.col(state).alias("state"),
        F.col(ts).alias("ts"),
        *([F.col(tie).alias("_tie")] if tie else []),
        *([F.col(weight).alias("_w")] if weight else []),
        F.sum(changed).over(w).alias("_run"),
    )
    n_agg = (
        F.sum("_w").cast("long") if weight else F.count("*")
    ).alias("n_events")
    iv = runs.groupBy("key", "_run", "state").agg(
        F.min("ts").alias("valid_from"),
        n_agg,
        *([F.min("_tie").alias("_tie0")] if tie else []),
    )
    # close intervals in the SAME total order the runs were built in —
    # equal valid_from (same-timestamp events) falls back to the tie
    order2 = [F.col("valid_from").asc()] + (
        [F.col("_tie0").asc()] if tie else []
    )
    w2 = Window.partitionBy("key").orderBy(*order2)
    return iv.select(
        "key",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def asof_state(
    intervals: DataFrame,
    at,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (AS OF) slice of an SCD2 interval table: the rows
    whose validity interval covers ``at`` — one row per key, the state
    that HELD at that instant (half-open intervals
    ``[valid_from, valid_to)``; an open interval, valid_to NULL,
    covers everything from valid_from on).

    This is the KG time-travel primitive over state_intervals output:
    "the graph as of T" is the asof_state slice of the per-assertion
    interval table — the query-side analogue of an Iceberg snapshot
    read, but at ASSERTION granularity rather than file granularity
    (the reference's corrections timeline answers the same question
    per-document in pandas, corrections_manager.py latest_state).

    Plan shape: two range predicates on the interval table — no join,
    no window; with the interval snapshot partitioned/sorted on
    valid_from, the lower bound prunes files. ``at`` may be a Column
    or a literal (strings are cast to timestamp).
    """
    at_col = at if isinstance(at, Column) else F.lit(at).cast("timestamp")
    return intervals.filter(
        (F.col(valid_from) <= at_col)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > at_col))
    )


def funnel_steps(
    events: DataFrame,
    steps,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel matching over an event stream -> one row per
    user who reached step 1: (user_col, t_1, ..., t_k), where t_i is
    the EARLIEST timestamp of a step-i event strictly after t_{i-1}
    (NULL from the first unreached step on). The classic conversion
    funnel ("view -> click -> purchase"): step counts are
    count(t_i IS NOT NULL).

    Greedy earliest matching is exact for the unbounded funnel: an
    increasing event subsequence exists iff the greedy one does
    (taking the earliest feasible event at each step only enlarges
    the feasible set downstream). A per-funnel time budget would
    break that optimality (a later start can beat an earlier one);
    bounded-window funnels need per-start enumeration and are out of
    scope here — temporal_reachable covers the bounded-propagation
    question on the graph side.

    Distributed shape: one filtered min-agg per step, each a join
    keyed on the user id (k-1 hash joins for a k-step funnel, no
    windows, no per-user sort); every aggregate combines map-side.
    Ties inside a step collapse via min(); results are exact
    timestamps, parallelism-invariant, restated by the oracle as
    chained LEFT JOIN + min() CTEs."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    u = F.col(user_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(u.alias(user_col))
        .agg(F.min(ts_col).alias("t_1"))
    )
    for i, st in enumerate(steps[1:], start=2):
        e_i = events.filter(F.col(type_col) == st).select(
            u.alias("_u"), F.col(ts_col).alias("_ts")
        )
        prev_cols = cur.columns
        cur = (
            cur.join(
                e_i,
                (cur[user_col] == e_i["_u"])
                & (e_i["_ts"] > cur[f"t_{i-1}"]),
                "left",
            )
            .groupBy(*[cur[c] for c in prev_cols])
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
    return cur


def scd2_apply(
    intervals: DataFrame,
    new_events: DataFrame,
    key: str,
    state: str,
    ts: str,
    tie: str | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance — apply a batch of NEW events to
    an existing interval table (the MERGE-INTO / CDC-upsert analogue
    for :func:`state_intervals` output) WITHOUT touching history:

    - keys absent from the batch pass through untouched;
    - an affected key's CLOSED intervals pass through untouched;
    - its OPEN interval re-enters the run collapse as ONE
      pseudo-event (ts = valid_from, weight = its accumulated
      n_events), spliced with the batch — so if the first new state
      equals the open state the interval EXTENDS (counts merge,
      valid_from preserved), else it closes at the first new run's
      start, exactly as a full rebuild would;
    - the result is row-identical to
      ``state_intervals(history ∪ batch)`` — the contract oracle IS
      that full rebuild, making the equivalence a checked property,
      not a claim.

    Contract: this is the APPEND-ONLY CDC case — every batch event
    must be strictly later than every prior event of its key
    (standard for log-structured ingestion); interleaving a batch
    into the middle of history needs the full rebuild.

    Distributed shape at a 10^12-row history: the batch keys are a
    semi-join filter, so only the AFFECTED keys' open intervals (one
    row per key) and the batch itself enter the window — history is
    never re-sorted, and with the interval snapshot partitioned by
    key the pass-through is a metadata-only union."""
    aff = new_events.select(F.col(key).alias("key")).distinct()
    is_open = F.col("valid_to").isNull()
    open_aff = (
        intervals.filter(is_open)
        .join(aff, "key", "left_semi")
    )
    keep = intervals.join(
        open_aff.select("key").withColumn("_o", F.lit(1)), "key", "left"
    ).filter(~(is_open & F.col("_o").isNotNull())).drop("_o")
    pseudo = open_aff.select(
        F.col("key").alias(key),
        F.col("state").alias(state),
        F.col("valid_from").alias(ts),
        *([F.lit(None).cast(new_events.schema[tie].dataType).alias(tie)]
          if tie else []),
        F.col("n_events").alias("_w"),
    )
    batch = new_events.select(
        F.col(key), F.col(state), F.col(ts),
        *([F.col(tie)] if tie else []),
        F.lit(1).cast("long").alias("_w"),
    )
    recomputed = state_intervals(
        pseudo.unionByName(batch), key, state, ts, tie=tie, weight="_w"
    )
    return keep.unionByName(recomputed)


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    timeout_sec: int = 1800,
    tie: str | None = None,
) -> DataFrame:
    """Inactivity-gap sessionization: assign every event a 1-based
    ``session_no`` per key, where a new session starts whenever the
    gap to the key's previous event exceeds ``timeout_sec``.

    The canonical distributed form: ONE hash exchange on ``key``, one
    per-partition sort shared by both window expressions (lag for the
    gap flag, running sum for the session number — same partitioning
    and ordering, so Catalyst plans them over a single exchange; the
    two Window nodes differ only in frame). No self-join, no
    iteration: at 10^12 events this is exactly one shuffle keyed on
    the session entity, AQE-splittable on skewed keys.

    Gap arithmetic is on floor-epoch seconds (engine-portable longs);
    ORDERING is on the full-precision timestamp plus the ``tie``
    column, so sub-second event storms sessionize deterministically.

    Reference analogue: the corrections timeline groups edit events
    into review sittings pandas-side
    (/root/reference/src/streamlit/app/utils/dashboard.py timeline
    tab); generalized to the standard web-analytics session operator.
    Returns df's columns + ``epoch_sec`` + ``session_no``.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tie).asc()] if tie else [])
    w = Window.partitionBy(key).orderBy(*order)
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    prev = F.lag(epoch).over(w)
    # window functions can't nest: materialize the gap flag as its own
    # projection, then run-sum it over the SAME window spec (one
    # exchange + one sort feed both Window nodes)
    flagged = df.withColumn("epoch_sec", epoch).withColumn(
        "_new_sess",
        F.when(
            prev.isNull() | ((F.col("epoch_sec") - prev) > timeout_sec),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_no", F.sum("_new_sess").over(run).cast("long")
    ).drop("_new_sess")


def interval_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    l_id: str,
    r_id: str,
    start_col: str = "s",
    end_col: str = "e",
    bucket_width: int = 86400,
) -> DataFrame:
    """All (left, right) pairs of HALF-OPEN intervals [s, e) that
    overlap: s_l < e_r AND s_r < e_l. Returns (l_id, r_id,
    overlap_sec = least(e) - greatest(s)).

    Why not the direct predicate: Spark plans a pure inequality join
    as BroadcastNestedLoopJoin — O(n*m). The standard distributed
    rewrite: explode BOTH sides into the width-W buckets each
    interval covers, equi-join on the bucket id, then keep each pair
    exactly once in its CANONICAL bucket — the bucket containing
    greatest(s_l, s_r), i.e. the overlap's start — so no distinct
    pass is needed (same one-match discipline as
    time_window_pairs' 3-bucket scheme). Fan-out per row =
    ceil(span / W): pick W near the median interval span; intervals
    spanning thousands of buckets should be split upstream (the
    SCD2 producer emits bounded runs). One hash-partitioned
    equi-join, AQE-splittable, no nested loop; DuckDB serves as the
    oracle precisely because it plans the same predicate as an
    IEJoin natively.
    """
    def buckets(s: Column, e: Column) -> Column:
        return F.sequence(
            F.floor(s / bucket_width).cast("long"),
            F.floor((e - 1) / bucket_width).cast("long"),
        )

    lb = left.select(
        F.col(l_id).alias("_lid"),
        F.col(start_col).cast("long").alias("_ls"),
        F.col(end_col).cast("long").alias("_le"),
    ).filter(F.col("_ls") < F.col("_le")).withColumn(
        "_b", F.explode(buckets(F.col("_ls"), F.col("_le")))
    )
    rb = right.select(
        F.col(r_id).alias("_rid"),
        F.col(start_col).cast("long").alias("_rs"),
        F.col(end_col).cast("long").alias("_re"),
    ).filter(F.col("_rs") < F.col("_re")).withColumn(
        "_b", F.explode(buckets(F.col("_rs"), F.col("_re")))
    )
    canon = F.floor(
        F.greatest(F.col("_ls"), F.col("_rs")) / bucket_width
    ).cast("long")
    return (
        lb.join(rb, "_b")
        .filter(
            (F.col("_ls") < F.col("_re"))
            & (F.col("_rs") < F.col("_le"))
            & (F.col("_b") == canon)
        )
        .select(
            F.col("_lid").alias(l_id),
            F.col("_rid").alias(r_id),
            (
                F.least(F.col("_le"), F.col("_re"))
                - F.greatest(F.col("_ls"), F.col("_rs"))
            ).alias("overlap_sec"),
        )
    )


def session_ngrams(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    timeout_sec: int = 1800,
    n: int = 2,
    tie: str | None = None,
    sep: str = ";",
) -> DataFrame:
    """Frequent within-session event-type sequences: counts of every
    CONTIGUOUS length-n event-type n-gram occurring inside one
    session (sessionize's inactivity-gap sessions). The
    sequential-pattern staple for behavioral analysis ("view;click"
    counts) — the n-gram analogue of textstats' shingle counts, on
    the event stream.

    Plan shape: sessionize's single hash exchange on ``key`` is
    REUSED — the n-gram window partitions by ``key`` (not by
    (key, session)) and instead guards that all n events share the
    session via lead(session_no, n-1): hashpartitioning(key) would
    not satisfy a (key, session_no) window and Catalyst would insert
    a second exchange. One shuffle end-to-end before the count agg.

    Returns (gram, n_occurrences), gram = sep-joined event types.
    """
    if n < 2:
        raise ValueError("session_ngrams: n must be >= 2")
    s = sessionize(df, key, ts_col, timeout_sec=timeout_sec, tie=tie)
    order = [F.col(ts_col).asc()] + ([F.col(tie).asc()] if tie else [])
    w = Window.partitionBy(key).orderBy(*order)
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    same_sess = F.lead("session_no", n - 1).over(w) == F.col("session_no")
    grams = s.withColumn(
        "_gram",
        F.when(
            same_sess, F.concat_ws(sep, *parts)
        ),
    ).filter(F.col("_gram").isNotNull())
    return grams.groupBy(F.col("_gram").alias("gram")).agg(
        F.count("*").alias("n_occurrences")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Distributed AS-OF join: every left row picks the LATEST right
    row of the same key with right_ts <= left_ts (the trade-to-quote
    / event-to-state join; asof_state is its single-literal slice).

    Spark has no asof operator, and the naive formulation (theta
    join on ts + per-pair max) is a nested loop plus a shuffle per
    side. The canonical distributed rewrite: UNION the two streams
    tagged by side, ONE window partitioned by key ordered by
    (ts, side) with right rows sorting BEFORE coincident left rows
    (ties: a state stamped at exactly t applies to an event at t),
    and last(value, ignorenulls=True) over the running frame fills
    each left row with the most recent right values. One hash
    exchange total, no explode, no join node at all — DuckDB's
    native ASOF JOIN serves as the oracle precisely because it owns
    the operator we're restating.

    ``tolerance_sec``: if set, matches older than the tolerance are
    nulled out (the pandas merge_asof semantics) — carried via the
    matched right timestamp, so it's a post-filter, not a join
    change. Returns left's columns + value_cols (+ ``asof_ts``, the
    matched right timestamp as floor-epoch seconds, NULL when no
    match).

    Contracts: ``value_cols`` must not collide with left's column
    names, and ``right`` must be unique per (key, right_ts) —
    pre-aggregate coincident rows (last-writer-wins) first, or the
    pick among exact-timestamp duplicates is nondeterministic in ANY
    asof engine, DuckDB included. Ordering compares the
    FULL-PRECISION timestamp (sub-second quotes must not tie with
    later events in the same second); tolerance arithmetic is on
    floor-epoch seconds.
    """
    lcols = left.columns
    # the match is ATOMIC: _rts plus every value column travel in ONE
    # struct, and a single last(struct, ignorenulls=True) picks the
    # latest right ROW. Filling each value column with its own
    # last(col, ignorenulls=True) would skip a legitimately-NULL value
    # in the latest right row and read it from an OLDER row (and
    # different value_cols could come from different rows) — diverging
    # from the stated "latest right row" semantics and from any native
    # ASOF engine whenever right values contain NULLs. The struct is
    # non-NULL exactly on right rows, so ignorenulls skips left rows
    # only; NULL members inside the picked struct carry through.
    from pyspark.sql.types import LongType, StructField, StructType

    vstruct = StructType(
        [StructField("_rts", LongType())]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    ltag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.col(left_ts).cast("timestamp_ltz").cast("long").alias("_te"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        F.lit(None).cast(vstruct).alias("_vs"),
    )
    rtag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.col(right_ts).cast("timestamp_ltz").cast("long").alias("_te"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
        F.struct(
            F.col(right_ts).cast("timestamp_ltz").cast("long").alias("_rts"),
            *[F.col(c) for c in value_cols],
        ).alias("_vs"),
    )
    # right rows order BEFORE left rows at equal ts: side desc
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ltag.unionByName(rtag).select(
        "_k",
        "_te",
        "_side",
        *[F.col(f"_l_{c}") for c in lcols],
        F.last("_vs", ignorenulls=True).over(w).alias("_fs"),
    ).filter(F.col("_side") == 0)
    matched = F.col("_fs")
    if tolerance_sec is not None:
        stale = matched.isNull() | (
            (F.col("_te") - matched.getField("_rts")) > tolerance_sec
        )
        matched = F.when(stale, F.lit(None).cast(vstruct)).otherwise(matched)
    return filled.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[matched.getField(c).alias(c) for c in value_cols],
        matched.getField("_rts").alias("asof_ts"),
    )
