"""Event-stream analytics operators: windowed counts, trailing-window rate
anomalies, windowed heavy hitters, ordered funnels.

The reference's users build these by hand from windowed aggregates (its DSL
stops at Count/Aggregate/Reduce per window — SURVEY §2.4); here they are
first-class, expression-only, and exactly SQL-checkable.  Design rules match
llmops: integer-exact comparisons wherever a threshold decision is made (the
anomaly rule is rearranged to avoid division and sqrt entirely), epoch-ms
projections via the NTZ-safe runtime helpers, one shuffle per stateful step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .runtime import ensure_min_parallelism, epoch_ms


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    size_ms: int,
) -> DataFrame:
    """Tumbling-window counts per key: (key, w_start_ms, cnt).  Window start
    is the epoch-ms floor — integer arithmetic, engine-portable.

    Scale: one map-side-combinable aggregation keyed by (key, window)."""
    # integer window floor: e − (e mod size).  Never a double division —
    # DuckDB's CAST(double AS BIGINT) rounds while Spark's truncates, so the
    # arithmetic must stay integral end to end.
    e = epoch_ms(F.col(ts_col))
    start = e - F.pmod(e, F.lit(size_ms))
    return (
        ensure_min_parallelism(events)
        .filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), start.alias("w_start_ms"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def rate_anomaly(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    size_ms: int,
    trail: int = 6,
    k: int = 3,
) -> DataFrame:
    """Per-key rate-spike detection: a window is anomalous when its count
    exceeds the trailing ``trail``-window mean by more than ``k`` trailing
    standard deviations.  The decision is INTEGER-exact: with n = trailing
    window count, S = Σcnt, Q = Σcnt², the rule

        cnt − S/n > k·σ,  σ² = (nQ − S²)/n²

    rearranges to  dev = n·cnt − S > 0  AND  dev² > k²·(nQ − S²)  — no
    division, no sqrt, no float threshold, so Spark and any SQL oracle agree
    bit-for-bit.  Windows with fewer than ``trail`` predecessors are never
    flagged (cold start).  Returns (key, w_start_ms, cnt, n_trail, dev,
    var_n, is_anomaly).

    Baseline definition (deliberate): the trailing frame is the last
    ``trail`` NON-EMPTY windows of the key — windows with zero events are
    not materialized and do not dilute the mean, and for a sparse key the
    frame may span arbitrary wall-clock gaps.  That is the right behavior
    for "is this burst big relative to this key's typical ACTIVE rate";
    for a strictly time-based baseline (zero windows count as zeros),
    use :func:`rate_anomaly_time` (RANGE frame on ``w_start_ms``, empty
    windows count as zeros).  The q141 oracle pins the non-empty-window
    definition; q150 pins the time-based one.

    Scale: windowed counts (one shuffle) + a per-key ordered window over the
    COUNTS table (rows = windows × keys, not events) — the trailing scan
    costs nothing at corpus scale."""
    return rate_anomaly_over_counts(
        windowed_counts(events, ts_col, key_col, size_ms), key_col, trail=trail, k=k
    )


def rate_anomaly_over_counts(
    counts: DataFrame, key_col: str, trail: int = 6, k: int = 3
) -> DataFrame:
    """The rate_anomaly decision rule applied to an EXISTING (key,
    w_start_ms, cnt) counts table — the continuous-operation entry point:
    a streaming job upserts the counts store per microbatch (map-side
    partials summed in, bounded by keys × windows, never event volume)
    and this rule runs over the store; batch rate_anomaly is exactly
    windowed_counts ∘ this (pinned by test_rate_anomaly_streaming_parity)."""
    w = Window.partitionBy(key_col).orderBy("w_start_ms").rowsBetween(-trail, -1)
    n = F.count(F.lit(1)).over(w)
    s = F.coalesce(F.sum("cnt").over(w), F.lit(0))          # empty frame -> 0, not null
    q = F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(w), F.lit(0))
    dev = n * F.col("cnt") - s
    var_n = n * q - s * s
    return counts.select(
        F.col(key_col),
        "w_start_ms",
        "cnt",
        n.cast("long").alias("n_trail"),
        dev.cast("long").alias("dev"),
        var_n.cast("long").alias("var_n"),
        (
            (n == F.lit(trail)) & (dev > 0) & (dev * dev > F.lit(k * k) * var_n)
        ).alias("is_anomaly"),
    )


def windowed_distinct(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    size_ms: int,
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct-id counts per (key, tumbling window) — "unique users per
    hour per event type", the canonical streaming cardinality metric —
    using the HyperLogLog++ sketch, because the exact version is the
    classic 100 TB trap: exact count(DISTINCT user) per window shuffles
    every (key, window, user) triple, while the sketch shuffles one
    fixed-size register set per (key, window), map-side combinable, and at
    the default rsd=2% is indistinguishable for dashboarding.  Returns
    (key, w_start_ms, n_events, ids_approx).

    Exactness contract: q152 pins |approx − exact| ≤ 3·rsd·exact per group
    against a DuckDB exact oracle (same bound-check pattern as q105);
    swap ``F.count_distinct`` back in where a billing-grade count is
    required and the shuffle is affordable."""
    e = epoch_ms(F.col(ts_col))
    start = e - F.pmod(e, F.lit(size_ms))
    return (
        ensure_min_parallelism(events)
        .filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), start.alias("w_start_ms"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.approx_count_distinct(F.col(id_col), rsd=rsd).alias("ids_approx"),
        )
    )


def windowed_distinct_audit(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    size_ms: int,
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch-vs-exact audit of :func:`windowed_distinct` in ONE scan:
    (key, w_start_ms, n_events, users_exact, ids_approx).

    r13 optimization of the original q152 composition (sketch groupBy ⋈
    exact count-distinct groupBy): both sides reduce over the SAME distinct
    (key, window, id) triples, so a two-stage aggregation serves both —
    stage 1 dedups ids per window carrying the row count, stage 2 counts
    rows for the exact ndv, sums counts for n_events, and feeds the SAME
    values into the HLL sketch.  HyperLogLog registers are a pure function
    of the distinct VALUE SET (duplicates rehash to the same register), so
    ``ids_approx`` is bit-identical to sketching the raw stream; n_events /
    users_exact are plain integer algebra.  One scan and two shuffles
    (second one per-(key, window)) replace two scans, three shuffles and a
    join (guide §2.4)."""
    e = epoch_ms(F.col(ts_col))
    start = e - F.pmod(e, F.lit(size_ms))
    tri = (
        ensure_min_parallelism(events)
        .filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), start.alias("w_start_ms"), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return tri.groupBy(F.col(key_col), "w_start_ms").agg(
        F.sum("__n").cast("long").alias("n_events"),
        F.count(F.col(id_col)).cast("long").alias("users_exact"),
        F.approx_count_distinct(F.col(id_col), rsd=rsd).alias("ids_approx"),
    )


def windowed_distinct_sketches(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    id_col: str,
    size_ms: int,
    lg_k: int = 12,
) -> DataFrame:
    """Per-batch PARTIALS for the incremental store realization of
    :func:`windowed_distinct`: (key, w_start_ms, n_events, ids_sketch) where
    ids_sketch is a MERGEABLE Apache DataSketches HLL sketch
    (``hll_sketch_agg``) instead of a finished estimate — the sufficient
    statistic a foreachBatch loop can union into a store whose size is
    fixed per (key, window) regardless of event volume.  The union is
    deterministic: incrementally merged microbatch partials estimate
    IDENTICALLY to one sketch over the whole stream (pinned by
    test_windowed_distinct_store_parity), which is exactly why the sketch —
    and not the distinct-id SET — is the store schema; the exact version
    would grow the store by events, the classic 100 TB trap
    windowed_distinct's docstring describes."""
    e = epoch_ms(F.col(ts_col))
    start = e - F.pmod(e, F.lit(size_ms))
    return (
        ensure_min_parallelism(events)
        .filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), start.alias("w_start_ms"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.hll_sketch_agg(F.col(id_col), F.lit(lg_k)).alias("ids_sketch"),
        )
    )


def merge_distinct_sketches(store: DataFrame, part: DataFrame, key_col: str) -> DataFrame:
    """Store-merge rule of the incremental windowed-distinct loop: union the
    previous store with a batch's partials and re-reduce — sum the event
    counts, ``hll_union_agg`` the sketches.  Associative, so any microbatch
    slicing converges to the same store."""
    return (
        store.unionByName(part)
        .groupBy(key_col, "w_start_ms")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.hll_union_agg("ids_sketch").alias("ids_sketch"),
        )
    )


def windowed_distinct_over_sketches(store: DataFrame) -> DataFrame:
    """Finalize the sketch store into the :func:`windowed_distinct` output
    shape: (key, w_start_ms, n_events, ids_approx).  ``hll_sketch_estimate``
    is a pure projection — the store stays queryable and mergeable."""
    return store.withColumn(
        "ids_approx", F.hll_sketch_estimate(F.col("ids_sketch"))
    ).drop("ids_sketch")


def rate_anomaly_time(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    size_ms: int,
    trail: int = 6,
    k: int = 3,
) -> DataFrame:
    """Time-based sibling of :func:`rate_anomaly`: the baseline is the
    trailing ``trail`` WALL-CLOCK window slots — a slot with zero events
    contributes cnt = 0, so long gaps dilute a sparse key's baseline
    instead of being skipped.  Right for "is this rate high vs this key's
    recent calendar", where rate_anomaly answers "vs its typical burst".

    Mechanics: a RANGE frame on ``w_start_ms`` spanning
    [cur − trail·size_ms, cur − size_ms] sums only the materialized
    (non-empty) slots — the missing slots' zeros change no sum — while the
    denominator is FIXED at ``trail``:

        mean = S/trail,  var = (trail·Q − S²)/trail²
        anomaly ⇔ dev = trail·cnt − S > 0  ∧  dev² > k²·(trail·Q − S²)

    — same integer-exact no-division rearrangement as rate_anomaly, so any
    SQL engine agrees bit-for-bit.  Cold start: windows that open less than
    ``trail`` slots after the key's FIRST window are never flagged (the
    calendar baseline isn't fully defined yet).  Returns (key, w_start_ms,
    cnt, dev, var_n, is_anomaly).

    Scale: same shape as rate_anomaly — windowed counts (one shuffle) plus
    per-key ordered windows over the COUNTS table; no densify explode is
    ever materialized (the fixed-``trail`` algebra absorbs the zeros), so
    sparse keys with year-long gaps cost nothing extra."""
    return rate_anomaly_time_over_counts(
        windowed_counts(events, ts_col, key_col, size_ms),
        key_col,
        size_ms,
        trail=trail,
        k=k,
    )


def rate_anomaly_time_over_counts(
    counts: DataFrame, key_col: str, size_ms: int, trail: int = 6, k: int = 3
) -> DataFrame:
    """rate_anomaly_time's decision rule over an existing counts table —
    see rate_anomaly_over_counts for the continuous-operation shape."""
    wr = (
        Window.partitionBy(key_col)
        .orderBy(F.col("w_start_ms").cast("long"))
        .rangeBetween(-trail * size_ms, -size_ms)
    )
    wk = Window.partitionBy(key_col)
    s = F.coalesce(F.sum("cnt").over(wr), F.lit(0))
    q = F.coalesce(F.sum(F.col("cnt") * F.col("cnt")).over(wr), F.lit(0))
    first_w = F.min("w_start_ms").over(wk)
    dev = F.lit(trail) * F.col("cnt") - s
    var_n = F.lit(trail) * q - s * s
    return counts.select(
        F.col(key_col),
        "w_start_ms",
        "cnt",
        dev.cast("long").alias("dev"),
        var_n.cast("long").alias("var_n"),
        (
            (F.col("w_start_ms") - first_w >= F.lit(trail * size_ms))
            & (dev > 0)
            & (dev * dev > F.lit(k * k) * var_n)
        ).alias("is_anomaly"),
    )


def windowed_topk(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    size_ms: int,
    k: int = 3,
) -> DataFrame:
    """Windowed heavy hitters: the top ``k`` keys by count inside every
    tumbling window, rank 1-based, ties → key order.  (key, w_start_ms,
    cnt, rank).

    Scale: counts shuffle once on (key, window); the rank window re-shuffles
    only the counts table on the window start."""
    return windowed_topk_over_counts(
        windowed_counts(events, ts_col, key_col, size_ms), key_col, k=k
    )


def windowed_topk_over_counts(counts: DataFrame, key_col: str, k: int = 3) -> DataFrame:
    """The heavy-hitter rank rule over an EXISTING (key, w_start_ms, cnt)
    counts table — the continuous-operation entry point, sharing the SAME
    incrementally-maintained store the anomaly rules read (see
    rate_anomaly_over_counts); batch windowed_topk ≡ windowed_counts ∘ this
    (pinned by test_analytics_over_streaming_stores_parity)."""
    w = Window.partitionBy("w_start_ms").orderBy(F.col("cnt").desc(), F.col(key_col))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def funnel_step_times(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    step_col: str,
    steps: tuple[str, ...],
) -> DataFrame:
    """Distinct (user, step, ts) triples restricted to the funnel's steps —
    the SUFFICIENT STATISTIC for :func:`funnel`, and the bounded store a
    continuous deployment maintains (per microbatch: union + re-distinct;
    the funnel only ever takes conditional minimums, so min over the
    distinct triples == min over raw events and ``funnel(store, ...)``
    equals the batch funnel over all events — pinned by
    test_analytics_over_streaming_stores_parity).  State is bounded by each
    user's distinct step-event times; a production deployment additionally
    evicts triples older than the conversion window (``within_ms``) the way
    a watermark bounds any event-time state."""
    base = ensure_min_parallelism(events).filter(F.col(user_col).isNotNull())
    return (
        base.filter(F.col(step_col).isin(list(steps)))
        .select(F.col(user_col), F.col(step_col), F.col(ts_col))
        .distinct()
    )


def funnel(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    step_col: str,
    steps: tuple[str, ...],
    within_ms: int | None = None,
) -> DataFrame:
    """Ordered funnel: per user, the earliest time each step could complete
    given the previous step had happened (s₁ = min ts of step 1; sᵢ = min ts
    of step i with ts ≥ sᵢ₋₁ — the standard strictly-ordered funnel).
    Returns one row per user that reached step 1: steps_reached (1..len),
    t_first_ms, t_last_ms (completion time of the deepest step), converted
    (all steps, and within ``within_ms`` of s₁ when given).  For continuous
    operation, apply this SAME function to an incrementally-maintained
    :func:`funnel_step_times` store instead of raw events.

    Scale: len(steps) keyed equi-joins on the user id — each input scan is
    filtered to ONE step's events before the shuffle, and every join key is
    the same user id, so AQE coalesces the stages; no window over raw
    events."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    base = ensure_min_parallelism(events).filter(F.col(user_col).isNotNull())
    cur = (
        base.filter(F.col(step_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__s1"))
    )
    prev_col = "__s1"
    for i, st in enumerate(steps[1:], start=2):
        nxt = base.filter(F.col(step_col) == st).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__t")
        )
        # the ts >= prev condition must be IN the join: a left join keyed on
        # the user alone, filtered afterwards, would drop users whose step-i
        # events all precede step i-1 instead of null-extending them
        cond = (F.col(user_col) == F.col("__u")) & (F.col("__t") >= F.col(prev_col))
        keep = list(cur.columns)
        cur = (
            cur.join(nxt, cond, "left")
            .groupBy(*keep)
            .agg(F.min("__t").alias(f"__s{i}"))
        )
        prev_col = f"__s{i}"
    n = len(steps)
    reached = F.lit(1)
    for i in range(2, n + 1):
        reached = reached + F.col(f"__s{i}").isNotNull().cast("int")
    last = F.coalesce(*[F.col(f"__s{i}") for i in range(n, 0, -1)])
    conv = F.col(f"__s{n}").isNotNull()
    if within_ms is not None:
        conv = conv & (
            epoch_ms(F.col(f"__s{n}")) - epoch_ms(F.col("__s1")) <= F.lit(int(within_ms))
        )
    return cur.select(
        F.col(user_col),
        reached.cast("long").alias("steps_reached"),
        epoch_ms(F.col("__s1")).alias("t_first_ms"),
        epoch_ms(last).alias("t_last_ms"),
        conv.alias("converted"),
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    bucket_ms: int,
) -> DataFrame:
    """Cohort retention: users grouped by the time bucket of their FIRST
    event (the cohort), counted in every later bucket they were active —
    (cohort_ms, k, n_users) where k is buckets-since-cohort (k = 0 is the
    cohort size itself).  The standard activation/retention triangle,
    entirely integer arithmetic.

    Scale: one groupBy(user) for first-seen, one distinct over
    (user, bucket) pairs, one user-keyed join (both sides already hash-
    partitioned on the user), one final small aggregation keyed by
    (cohort, k)."""
    return cohort_retention_over_activity(
        cohort_activity(events, ts_col, user_col, bucket_ms), user_col, bucket_ms
    )


def cohort_activity(
    events: DataFrame, ts_col: str, user_col: str, bucket_ms: int
) -> DataFrame:
    """Distinct (user, b_ms) activity pairs — the SUFFICIENT STATISTIC for
    cohort retention, and the table a continuous deployment maintains
    incrementally (per microbatch: union the batch's pairs, re-distinct;
    state bounded by users × active buckets, never event volume)."""
    base = ensure_min_parallelism(events).filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    e = epoch_ms(F.col(ts_col))
    return base.select(
        F.col(user_col), (e - F.pmod(e, F.lit(bucket_ms))).alias("b_ms")
    ).distinct()


def cohort_retention_over_activity(
    active: DataFrame, user_col: str, bucket_ms: int
) -> DataFrame:
    """The retention-triangle rule over an EXISTING distinct (user, b_ms)
    activity table — the continuous-operation entry point; batch
    cohort_retention ≡ cohort_activity ∘ this (first-seen is re-derived as
    min(b_ms), so the store needs no separate cohort table).

    r13: first-seen is a window min over the user partitioning instead of a
    groupBy + self-join — the join duplicated the activity subtree in the
    plan and paid an extra exchange; the window runs on the same user-keyed
    shuffle the join needed anyway (guide §2.4 "window functions partitioned
    by the same key as a preceding aggregation").  r14 (ADVICE item):
    null users are dropped explicitly — the pre-r13 inner join silently
    excluded them, and this is the documented continuous-operation entry
    point over an externally maintained store, where a null user must not
    become its own cohort."""
    return (
        active.filter(F.col(user_col).isNotNull())
        .withColumn(
            "__cohort", F.min("b_ms").over(Window.partitionBy(user_col))
        )
        .select(
            F.col("__cohort").alias("cohort_ms"),
            ((F.col("b_ms") - F.col("__cohort")) / F.lit(bucket_ms)).cast("long").alias("k"),
        )
        .groupBy("cohort_ms", "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def sessionize_events(
    events: DataFrame, ts_col: str, user_col: str, order_col: str
) -> DataFrame:
    """Distinct (user, order, ts) triples — the SUFFICIENT STATISTIC for
    :func:`sessionize`, which re-derives t_ms and all three window passes
    from them, and the bounded store a continuous deployment maintains (per
    microbatch: union + re-distinct).  ``order_col`` must be a unique event
    id so the distinct projection is lossless — then
    ``sessionize(store, ...)`` equals the batch sessionize over all events
    (pinned by test_analytics_over_streaming_stores_parity).  Production
    deployments evict triples older than the session-gap horizon the way a
    watermark bounds any event-time state."""
    base = ensure_min_parallelism(events).filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    return base.select(F.col(user_col), F.col(order_col), F.col(ts_col)).distinct()


def sessionize(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    order_col: str,
    gap_ms: int,
) -> DataFrame:
    """Assign a session id to EVERY event (the event-level dual of session-
    window aggregation): a gap > ``gap_ms`` since the previous event starts
    a new session; output (user, order, t_ms, session_idx 1-based, pos
    1-based within the session).  Ordering inside a user is (ts, order) so
    ties are deterministic.  All integer arithmetic (epoch-ms diffs).

    Scale: ONE shuffle keyed on the user; the break-flag cumsum, the
    session ordinal, and the in-session position are window passes over
    the same hash partitioning (Catalyst reuses the exchange — partition
    (user, session) is a refinement of (user))."""
    base = ensure_min_parallelism(events).filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    e = epoch_ms(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy("t_ms", order_col)
    # two selects: window functions can't nest, so the break flag (lag) is
    # materialized as a column before the running sum over it
    flagged = base.select(F.col(user_col), F.col(order_col), e.alias("t_ms")).withColumn(
        "__lag", F.lag("t_ms").over(w)
    ).withColumn(
        "__brk",
        F.when(F.col("__lag").isNull() | (F.col("t_ms") - F.col("__lag") > F.lit(gap_ms)), 1)
        .otherwise(0),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.select(
        F.col(user_col),
        F.col(order_col),
        F.col("t_ms"),
        F.sum("__brk").over(wc).cast("long").alias("session_idx"),
    )
    wp = Window.partitionBy(user_col, "session_idx").orderBy(F.col("t_ms"), F.col(order_col))
    return sess.withColumn("pos", F.row_number().over(wp).cast("long"))
